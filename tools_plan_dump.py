"""Dump `.explain("formatted")` for named registry queries to
plans/<round>/<name>_<tag>.txt — the optimization round's plan evidence.

Usage: python tools_plan_dump.py <tag> <name>[,<name>...]
  tag   "before" or "after"
  names comma-separated queries() entry names
Round dir defaults to r13; override with $SPARK_GRAFT_PLANS_ROUND.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from financial_fraud_detection_using_time_series_data_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plan-dump-{tag}")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}")


if __name__ == "__main__":
    main()
