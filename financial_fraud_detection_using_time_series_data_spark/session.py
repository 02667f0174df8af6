"""SparkSession factory tuned for both local testing and cluster scale.

Local mode (``local[N]``) is a single JVM; the same configs are what we'd
ship to a 1000-executor cluster job except for master/memory:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting —
  the main defense for Zipf-skewed user/device keys at 100 TB.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE's coalesce makes the initial number mostly a ceiling.
- Arrow enabled for every pandas interop (Pandas UDFs, toPandas).
- Session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark-fraud-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Whole-stage codegen emits one unique class per query shape; a
        # long-lived session running many distinct queries (bench, the
        # driver's correctness sweep) fills the JVM's default 240 MB JIT
        # code cache, after which the compiler shuts off and EVERYTHING
        # runs interpreted (~10x: measured 60s vs 5s on the same query
        # late vs early in a bench session). Only effective when this
        # builder launches the JVM (pyspark passes it to spark-submit);
        # a pre-existing gateway keeps its own flags.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        # long single-JVM sessions (bench: 200+ distinct queries × 3
        # executions) accumulate broadcast blocks and shuffle state whose
        # cleanup piggybacks on driver GC; the default periodicGC of 30min
        # never fires inside a 15-min session, so late queries run against
        # a bloated old-gen (measured: same query 0.5s fresh vs 4.4s late).
        # A 2-min periodic GC keeps the ContextCleaner draining.
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # driver testdata writes TIMESTAMP(NANOS) parquet, which Spark
        # rejects by default; read as long then convert (tables.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # bucketed tables (write_bucketed) live under the warehouse dir;
        # keep it out of the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-fraud-warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
