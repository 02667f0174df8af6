"""Results must not depend on the physical planner's choices: AQE on
(the session default) vs off must produce identical canonical hashes
for representative entries of each determinism class — decimal-exact
sums, chunked parallel ranks, window suites, and join compositions.

This is the plan-independence half of the oracle-parity story: DuckDB
parity pins Spark-vs-oracle; this pins Spark-vs-itself across physical
strategies (coalesced shuffles, runtime join swaps, skew splits).
"""

import pandas as pd
import pytest

import __spark_entry__ as entrymod

ENTRIES = [
    "behavioral_features",   # window engine
    "gini",                  # chunked parallel ranks
    "behavior_mart",         # multi-branch join composition
    "twap",                  # explode + decimal folds
    "revenue_by_nation",     # multi-table join/agg
    "interval_overlap",      # bucketized non-equi join (explode + dedupe)
    "ndcg_eval",             # salted two-phase top-k + micro-unit folds
]


def _canon(df) -> int:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return int(pd.util.hash_pandas_object(pdf, index=False).sum())


@pytest.mark.parametrize("name", ENTRIES)
def test_results_identical_with_aqe_off(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    on = _canon(fn(spark, sf_dir))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        off = _canon(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert on == off, f"{name}: result depends on AQE physical planning"
