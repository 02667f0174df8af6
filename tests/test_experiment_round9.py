"""Experimentation suite (round 9b): SRM chi-square check and CUPED
variance reduction."""

import datetime as dt

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import evaluation


def test_srm_balanced_assignment_small_chi2(spark):
    rows = [(i, str(i % 2)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, arm string")
    row = evaluation.srm_check(df, "arm", {"0": 0.5, "1": 0.5}).collect()[0]
    assert row["n_total"] == 100 and row["k"] == 2 and row["dof"] == 1
    assert row["chi2"] == pytest.approx(0.0, abs=1e-6)
    assert not row["has_unknown_arm"]


def test_srm_hand_chi2(spark):
    # 70/30 observed vs 50/50 designed over 100 units
    rows = [(i, "a") for i in range(70)] + [(i + 70, "b") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, arm string")
    row = evaluation.srm_check(df, "arm", {"a": 0.5, "b": 0.5}).collect()[0]
    expect = (70 - 50) ** 2 / 50 + (30 - 50) ** 2 / 50  # = 16
    assert row["chi2"] == pytest.approx(expect, abs=1e-6)
    assert row["max_abs_share_diff"] == pytest.approx(0.2, abs=1e-9)


def test_srm_dead_arm_contributes(spark):
    df = spark.createDataFrame([(i, "a") for i in range(10)], "id long, arm string")
    row = evaluation.srm_check(df, "arm", {"a": 0.5, "b": 0.5}).collect()[0]
    # arm b: o=0, e=5 -> term 5; arm a: o=10, e=5 -> term 5
    assert row["k"] == 2
    assert row["chi2"] == pytest.approx(10.0, abs=1e-6)


def test_srm_unknown_arm_flagged(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zzz")], "id long, arm string"
    )
    row = evaluation.srm_check(df, "arm", {"a": 0.5, "b": 0.5}).collect()[0]
    assert row["has_unknown_arm"] and row["n_unexpected"] == 1
    assert row["n_total"] == 2  # declared arms only


def test_srm_rejects_bad_shares(spark):
    df = spark.createDataFrame([(1, "a")], "id long, arm string")
    with pytest.raises(ValueError):
        evaluation.srm_check(df, "arm", {"a": 0.7, "b": 0.7})
    with pytest.raises(ValueError):
        evaluation.srm_check(df, "arm", {})


def _pre_post(spark, pairs):
    base = dt.datetime(2024, 1, 1)
    post = dt.datetime(2024, 2, 1)
    rows = []
    for i, (x, y) in enumerate(pairs):
        rows.append((i, float(x), base))
        rows.append((i, float(y), post))
    return spark.createDataFrame(rows, "user_id long, value double, ts timestamp")


def test_cuped_hand_check(spark):
    pairs = [(10, 12), (20, 25), (30, 31), (40, 48), (50, 47)]
    df = _pre_post(spark, pairs)
    row = evaluation.cuped(df, "user_id", "value", "ts", "2024-01-16").collect()[0]
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    n = len(pairs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((a - mx) * (b - my) for a, b in pairs) / (n - 1)
    vx = sum((a - mx) ** 2 for a in xs) / (n - 1)
    vy = sum((b - my) ** 2 for b in ys) / (n - 1)
    theta = cov / vx
    assert row["n_entities"] == n
    assert row["theta"] == pytest.approx(theta, abs=1e-5)
    assert row["var_y"] == pytest.approx(vy, abs=1e-5)
    assert row["var_adj"] == pytest.approx(vy - theta * cov, abs=1e-5)
    assert row["corr_xy"] == pytest.approx(cov / (vx * vy) ** 0.5, abs=1e-5)


def test_cuped_perfect_correlation_kills_variance(spark):
    pairs = [(x, 2 * x + 3) for x in (10, 20, 30, 40)]
    df = _pre_post(spark, pairs)
    row = evaluation.cuped(df, "user_id", "value", "ts", "2024-01-16").collect()[0]
    assert row["variance_reduction_pct"] == pytest.approx(100.0, abs=1e-3)
    assert row["corr_xy"] == pytest.approx(1.0, abs=1e-6)


def test_cuped_users_missing_a_period_count_as_zero(spark):
    base = dt.datetime(2024, 1, 1)
    post = dt.datetime(2024, 2, 1)
    rows = [
        (1, 10.0, base), (1, 12.0, post),
        (2, 20.0, base),            # no post activity
        (3, 30.0, post),            # no pre activity
    ]
    df = spark.createDataFrame(rows, "user_id long, value double, ts timestamp")
    row = evaluation.cuped(df, "user_id", "value", "ts", "2024-01-16").collect()[0]
    assert row["n_entities"] == 3


def test_experiment_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in ("srm_check", "cuped"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
