"""Parquet table loaders for the driver-generated test schema.

Mirrors the reference's scan surface (``src/data/loader.py:41-66`` — CSV
scan + optional identity scan) on the engine's canonical columnar format:
parquet with schema preserved, so Catalyst gets column pruning + predicate
pushdown for free. CSV remains available via :func:`read_csv`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# columns stored as TIMESTAMP(NANOS) in the driver parquet; Spark reads
# them as long (spark.sql.legacy.parquet.nanosAsLong) and we convert to
# microsecond timestamps. Integer `div` (not /) — nanos ~1.7e18 exceed
# double's 53-bit exact range. Truncation matches DuckDB's nanos->micros.
_NANO_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Self-sufficient on TIMESTAMP(NANOS) parquet: the driver (or any
    # embedding app) may hand us a vanilla SparkSession without the
    # legacy nanos config, and the scan then dies with
    # PARQUET_TYPE_ILLEGAL. Setting the conf at read time is safe — it
    # is a runtime-settable SQL conf — and idempotent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANO_TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_csv(spark: SparkSession, path: str, schema=None, infer: bool = True) -> DataFrame:
    """CSV scan (reference: ``loader.py:41,46`` pd.read_csv with inference).

    Prefer an explicit schema — inference costs an extra pass and yields
    unstable types at scale.
    """
    reader = spark.read.option("header", True)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", infer).csv(path)


def read_csv_optional(spark: SparkSession, path: str, schema) -> DataFrame:
    """Conditional scan (reference ``loader.py:44-50``): empty typed frame
    when the file is absent, so downstream left joins still resolve."""
    if os.path.exists(path):
        return read_csv(spark, path, schema=schema)
    return spark.createDataFrame([], schema)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink (reference ``loader.py:186-195``)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed-table sink: pre-shuffle the data ONCE at write time so
    every later equi-join/agg on ``bucket_col`` between same-bucketed
    tables runs with ZERO exchanges — the decisive join strategy at
    100 TB, where re-shuffling the fact table per query is the dominant
    cost. Optional per-bucket sort makes the join a pure merge.
    ``test_sources.py::test_bucketed_join_no_shuffle`` pins the plan
    property (no Exchange under SortMergeJoin)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Expose the catalog to the Spark SQL surface: one temp view per
    table, so every engine operation is equally reachable via
    ``spark.sql(...)`` (the reference has no SQL surface at all)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
