"""Statistical-rigor family (round 9): Mann-Whitney U, split-conformal
intervals, HBOS anomaly scores, IPF raking weights."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import (
    behavior,
    drift,
    evaluation,
    screens,
)


def _two_samples(spark):
    # ref: 1..8 ; cur: shifted up, with ties across groups at 4 and 5
    ref = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4, 4, 5, 6, 8)], "value double")
    cur = spark.createDataFrame([(float(v),) for v in (4, 5, 7, 9, 10, 11)], "value double")
    return ref, cur


def test_mann_whitney_exact_u_and_tie_correction(spark):
    ref, cur = _two_samples(spark)
    row = drift.mann_whitney(ref, cur, "value").collect()[0]
    # scipy-free hand check: U_cur = sum over cur of (#ref < v) + 0.5*(#ref == v)
    refv = [1, 2, 3, 4, 4, 5, 6, 8]
    curv = [4, 5, 7, 9, 10, 11]
    u = sum(
        sum(1 for r in refv if r < c) + 0.5 * sum(1 for r in refv if r == c)
        for c in curv
    )
    assert row["n_ref"] == 8 and row["n_cur"] == 6
    assert row["u_cur"] == u
    # z from the tie-corrected normal approximation
    nr, nc = 8.0, 6.0
    n = nr + nc
    ties = {}
    for v in refv + curv:
        ties[v] = ties.get(v, 0) + 1
    tie_term = sum(t**3 - t for t in ties.values())
    var = nr * nc / 12.0 * ((n + 1) - tie_term / (n * (n - 1)))
    z = (u - nr * nc / 2.0) / math.sqrt(var)
    assert row["z"] == pytest.approx(z, rel=1e-12)


def test_mann_whitney_all_tied_gives_null_z(spark):
    ref = spark.createDataFrame([(1.0,), (1.0,)], "value double")
    cur = spark.createDataFrame([(1.0,), (1.0,), (1.0,)], "value double")
    row = drift.mann_whitney(ref, cur, "value").collect()[0]
    assert row["z"] is None and row["u_cur"] == 3.0  # all midpoint ties


def _conformal_frames(spark):
    base = dt.datetime(2024, 1, 1)
    # group 'a': calibration values 0..99 (center 49.5), test 0..19
    cal = [( "a", float(v), base) for v in range(100)]
    tst = [("a", float(v), base + dt.timedelta(days=30)) for v in range(20)]
    return (
        spark.createDataFrame(cal, "g string, value double, ts timestamp"),
        spark.createDataFrame(tst, "g string, value double, ts timestamp"),
    )


def test_conformal_intervals_order_statistic_and_coverage(spark):
    cal, tst = _conformal_frames(spark)
    row = evaluation.conformal_intervals(cal, tst, "value", "g", alpha=0.1).collect()[0]
    # residuals |v - 49.5| over 0..99: pairs {0.5, 1.5, ..., 49.5} each twice
    # k = ceil(101 * 0.9) = 91 -> q_hat = 46th smallest distinct pair value
    # cumulative counts: residual r_i = i + 0.5 has cum 2(i+1); need cum >= 91
    # -> i = 45 -> q_hat = 45.5
    assert row["n_cal"] == 100 and row["center"] == 49.5
    assert row["q_hat"] == 45.5
    assert row["lo"] == 4.0 and row["hi"] == 95.0
    # test values 0..19: covered iff |v - 49.5| <= 45.5 -> v >= 4 -> 16 of 20
    assert row["n_test"] == 20 and row["coverage"] == pytest.approx(0.8)


def test_conformal_k_clamps_to_n_cal(spark):
    cal = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, value double")
    tst = spark.createDataFrame([("a", 5.0)], "g string, value double")
    row = evaluation.conformal_intervals(cal, tst, "value", "g", alpha=0.01).collect()[0]
    # ceil(3 * 0.99) = 3 > n_cal=2 -> k clamps to 2 -> q_hat = max residual
    assert row["q_hat"] == 0.5


def test_hbos_top_scores_rarest_combo(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, 10.0, base) for i in range(99)]
    # one extreme value in a unique hour -> rarest bins on both axes
    rows.append((999, 1000.0, dt.datetime(2024, 1, 6, 3, 0, 0)))
    df = spark.createDataFrame(rows, "event_id long, value double, ts timestamp")
    out = screens.hbos_scores(df, "value", "ts", "event_id", n_bins=10, top_n=3).collect()
    assert out[0]["event_id"] == 999
    assert out[0]["hbos_score"] > out[-1]["hbos_score"]
    # the outlier's value lands in the clamped top bin
    assert out[0]["value_bin"] == 9


def test_ipf_weights_hits_uniform_margins(spark):
    rows = []
    base = dt.datetime(2024, 1, 1)
    # skewed 2x3 mixture
    counts = {("a", 0): 10, ("a", 1): 30, ("a", 2): 20, ("b", 0): 5, ("b", 1): 5, ("b", 2): 30}
    i = 0
    for (g, h), n in counts.items():
        for _ in range(n):
            rows.append((g, h, i)); i += 1
    df = spark.createDataFrame(rows, "g string, hour_bin long, event_id long")
    out = behavior.ipf_weights(df, "g", "hour_bin", iters=10).collect()
    total = sum(counts.values())
    rowsum = {}
    colsum = {}
    for r in out:
        rowsum[r["g"]] = rowsum.get(r["g"], 0.0) + r["weight"]
        colsum[r["hour_bin"]] = colsum.get(r["hour_bin"], 0.0) + r["weight"]
    for v in rowsum.values():
        assert v == pytest.approx(total / 2, rel=1e-4)
    for v in colsum.values():
        assert v == pytest.approx(total / 3, rel=1e-4)
    # weights stay positive and total mass is preserved by raking
    assert all(r["weight"] > 0 for r in out)
    assert sum(rowsum.values()) == pytest.approx(total, rel=1e-6)


def test_ipf_weights_cell_cap_raises(spark):
    df = spark.createDataFrame([("a", 1, 1)], "g string, hour_bin long, event_id long")
    with pytest.raises(ValueError):
        behavior.ipf_weights(df, "g", "hour_bin", max_cells=0)


def test_stats_family_plans_are_python_free(spark, sf_dir):
    """Plan pins: no row-Python, no cartesian blowups; hbos top-k is a
    TakeOrderedAndProject, not a global sort."""
    import __spark_entry__ as entrymod

    for name in ("mann_whitney", "conformal_intervals", "hbos_scores"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    hbos_plan = (
        entrymod.queries()["hbos_scores"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in hbos_plan
