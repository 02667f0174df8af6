"""Per-query fixed-overhead breakdown (round 13, VERDICT #7 / guide §7.3).

At sf0.1 most bench entries cost ~1-1.5s of which compute is a small
fraction; this tool splits the per-query wall clock into:

  build  — Python-side DataFrame construction (py4j round trips + lazy
           analysis scheduling); time for queries[name](spark, sf_dir)
  plan   — analysis + optimization + physical planning of the SINK query
           (selectExpr("sum(hash(*))")), i.e. queryExecution().executedPlan()
  exec   — job submission + execution + AQE replanning (collect minus the
           already-forced planning)

Median of ``reps`` timed runs after one warm-up execution, printed per
query and summed. Usage:

  python tools_overhead_profile.py [name,name,...] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from financial_fraud_detection_using_time_series_data_spark.session import get_spark

DEFAULT = (
    "groupby_agg,revenue_by_nation,lorenz_deciles,two_hop_reach,"
    "repetition_stats,gini,time_decay_sum,croston_forecast,"
    "supplier_concentration,theil_sen_trend"
)


def main() -> None:
    names = (sys.argv[1] if len(sys.argv) > 1 else DEFAULT).split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="overhead-profile")
    queries = entrymod.queries()

    # session warm-up (parquet footers + codegen), untimed
    for name in names:
        queries[name](spark, sf_dir).selectExpr("sum(hash(*)) as h").collect()

    tot = {"build": 0.0, "plan": 0.0, "exec": 0.0}
    print(f"{'query':30s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    for name in names:
        samples = {"build": [], "plan": [], "exec": []}
        for _ in range(reps):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            sink = df.selectExpr("sum(hash(*)) as h")
            t1 = time.perf_counter()
            sink._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            sink.collect()
            t3 = time.perf_counter()
            samples["build"].append(t1 - t0)
            samples["plan"].append(t2 - t1)
            samples["exec"].append(t3 - t2)
        med = {k: statistics.median(v) for k, v in samples.items()}
        for k in tot:
            tot[k] += med[k]
        print(
            f"{name:30s} {med['build']:7.3f} {med['plan']:7.3f} "
            f"{med['exec']:7.3f} {sum(med.values()):7.3f}"
        )
    print(
        f"{'TOTAL':30s} {tot['build']:7.3f} {tot['plan']:7.3f} "
        f"{tot['exec']:7.3f} {sum(tot.values()):7.3f}"
    )


if __name__ == "__main__":
    main()
