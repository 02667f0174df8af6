"""Focused per-query micro-benchmark: same session posture for every
query (one warm-up execution, then min of N timed runs with the bench's
sum(hash(*)) sink) so before/after comparisons share JVM state.

Usage: python tools_microbench.py <name>[,<name>...] [n_timed]
Prints one line per query: name, warm, min, all runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from financial_fraud_detection_using_time_series_data_spark.session import get_spark


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    n_timed = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="microbench")
    queries = entrymod.queries()
    # shared warm-up: parquet footers + codegen stack
    import os.path as osp
    spark.read.parquet(osp.join(sf_dir, "lineitem.parquet")).count()
    for name in names:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).selectExpr("sum(hash(*)) as h").collect()
        warm = time.perf_counter() - t0
        runs = []
        for _ in range(n_timed):
            t0 = time.perf_counter()
            fn(spark, sf_dir).selectExpr("sum(hash(*)) as h").collect()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name:34s} warm={warm:6.2f} min={min(runs):6.2f} "
            f"runs={[round(r, 2) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
