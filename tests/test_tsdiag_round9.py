"""Time-series diagnostics III (round 9b): Ljung-Box Q, runs test,
pinball loss, Theil/Atkinson inequality."""

import datetime as dt
import math

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import (
    behavior,
    drift,
    forecast,
)


def _hourly_events(spark, totals):
    base = dt.datetime(2024, 1, 1, 0, 30, 0)
    rows = [
        (i, base + dt.timedelta(hours=h), g, float(v))
        for i, (g, h, v) in enumerate(
            (g, h, v) for g, vs in totals.items() for h, v in enumerate(vs)
        )
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def _acf(vals, k):
    n = len(vals)
    m = sum(vals) / n
    den = sum((v - m) ** 2 for v in vals)
    num = sum((vals[t] - m) * (vals[t - k] - m) for t in range(k, n))
    return num / den


def test_ljung_box_hand_check(spark):
    vals = [10.0, 12.0, 9.0, 15.0, 11.0, 16.0, 8.0, 14.0, 13.0, 10.0]
    df = _hourly_events(spark, {"a": vals})
    row = drift.ljung_box(df, max_lag=3).collect()[0]
    n = len(vals)
    terms = []
    for k in (1, 2, 3):
        r = _acf(vals, k)
        terms.append(math.floor(r * r / (n - k) * 1e9 + 0.5) / 1e9)
    q = n * (n + 2) * sum(terms)
    assert row["n_buckets"] == n and row["h"] == 3
    assert row["q_stat"] == pytest.approx(q, abs=1e-5)


def test_ljung_box_short_series_null(spark):
    df = _hourly_events(spark, {"a": [1.0, 2.0, 3.0]})
    row = drift.ljung_box(df, max_lag=5).collect()[0]
    assert row["q_stat"] is None  # n <= h


def test_runs_test_hand_check(spark):
    # alternating above/below the median -> maximum runs
    vals = [1.0, 9.0, 2.0, 8.0, 3.0, 7.0, 1.5, 9.5]
    df = _hourly_events(spark, {"a": vals})
    row = drift.runs_test(df).collect()[0]
    # median = (3+7)/2 = 5: signs - + - + - + - + -> 8 runs
    assert row["n_pos"] == 4 and row["n_neg"] == 4
    assert row["n_runs"] == 8
    mu = 2.0 * 4 * 4 / 8 + 1  # = 5
    var = (mu - 1) * (mu - 2) / 7
    z = (8 - mu) / math.sqrt(var)
    assert row["z"] == pytest.approx(z, abs=1e-6)


def test_runs_test_median_ties_dropped(spark):
    vals = [5.0, 1.0, 5.0, 9.0, 5.0]  # median 5 -> three ties dropped
    df = _hourly_events(spark, {"a": vals})
    row = drift.runs_test(df).collect()[0]
    assert row["n_pos"] == 1 and row["n_neg"] == 1 and row["n_runs"] == 2


def test_runs_test_one_sided_null_z(spark):
    vals = [1.0, 2.0, 3.0, 10.0]  # median 2.5: below below above above
    df = _hourly_events(spark, {"a": vals})
    row = drift.runs_test(df).collect()[0]
    assert row["z"] is not None  # both signs present
    allpos = _hourly_events(spark, {"a": [1.0, 1.0, 5.0]})
    row2 = drift.runs_test(allpos).collect()[0]
    # median 1.0 -> the two 1.0s tie out, only '+' remains
    assert row2["n_neg"] == 0 and row2["z"] is None


def _daily_events(spark, totals):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + dt.timedelta(days=d), g, float(v))
        for i, (g, d, v) in enumerate(
            (g, d, v) for g, vs in totals.items() for d, v in enumerate(vs)
        )
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_pinball_loss_hand_check(spark):
    vals = [10.0, 20.0, 30.0, 15.0, 25.0]  # season 2: yhat = y[t-2]
    df = _daily_events(spark, {"a": vals})
    out = {
        r["tau"]: r
        for r in forecast.pinball_loss(
            df, season_lag=2, quantiles=(0.1, 0.9)
        ).collect()
    }
    pairs = [(vals[t], vals[t - 2]) for t in range(2, len(vals))]
    for tau in (0.1, 0.9):
        losses = [
            tau * (y - yh) if y >= yh else (1 - tau) * (yh - y)
            for y, yh in pairs
        ]
        expect = sum(losses) / len(losses)
        assert out[tau]["n_evals"] == 3
        assert out[tau]["pinball"] == pytest.approx(expect, abs=1e-6)


def test_pinball_asymmetry(spark):
    # under-forecast (y > yhat) costs more at high tau
    vals = [10.0, 10.0, 20.0, 20.0]
    df = _daily_events(spark, {"a": vals})
    out = {
        r["tau"]: r["pinball"]
        for r in forecast.pinball_loss(
            df, season_lag=2, quantiles=(0.1, 0.9)
        ).collect()
    }
    assert out[0.9] > out[0.1]


def test_pinball_rejects_bad_bucket(spark):
    df = _daily_events(spark, {"a": [1.0, 2.0]})
    with pytest.raises(ValueError):
        forecast.pinball_loss(df, bucket="fortnight")


def test_theil_atkinson_uniform_is_zero(spark):
    rows = [(i, 100.0) for i in range(10)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    row = behavior.theil_atkinson(df, "user_id", "value").collect()[0]
    assert row["n_entities"] == 10
    assert row["theil_t"] == pytest.approx(0.0, abs=1e-6)
    assert row["atkinson"] == pytest.approx(0.0, abs=1e-6)


def test_theil_atkinson_hand_check(spark):
    totals = [10.0, 20.0, 30.0, 140.0]
    rows = [(i, v) for i, v in enumerate(totals)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    row = behavior.theil_atkinson(df, "user_id", "value", epsilon=0.5).collect()[0]
    n = len(totals)
    mu = sum(totals) / n
    theil = sum(
        math.floor((x / mu) * math.log(x / mu) * 1e9 + 0.5) / 1e9
        for x in totals
    ) / n
    atk = 1.0 - (
        sum(math.floor(math.sqrt(x / mu) * 1e9 + 0.5) / 1e9 for x in totals)
        / n
    ) ** 2
    assert row["theil_t"] == pytest.approx(theil, abs=1e-6)
    assert row["atkinson"] == pytest.approx(atk, abs=1e-6)


def test_theil_atkinson_drops_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, 20.0)], "user_id long, value double"
    )
    row = behavior.theil_atkinson(df, "user_id", "value").collect()[0]
    assert row["n_entities"] == 2 and row["n_dropped"] == 1


def test_theil_epsilon_one_raises(spark):
    df = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
    with pytest.raises(ValueError):
        behavior.theil_atkinson(df, epsilon=1.0)


def test_tsdiag_round9_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in ("ljung_box", "runs_test", "pinball_loss", "theil_atkinson"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
