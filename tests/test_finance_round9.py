"""Finance-II family (round 9b): VWAP bars, rolling beta, Sharpe/
Sortino, Kyle's lambda, GARCH(1,1) filter — hand-computed parity and
plan/scan pins."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import finance


def _q(r):
    return math.floor(r * 1e9 + 0.5)


def _daily_events(spark, totals):
    """One event per (type, day) with the given value -> the daily
    rollup IS the value list."""
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


def test_vwap_bar_and_anchored(spark):
    rows = [
        # flag, shipdate, extendedprice, quantity
        ("A", "1994-01-05", 100.0, 10.0),
        ("A", "1994-01-20", 300.0, 10.0),
        ("A", "1994-02-10", 100.0, 30.0),
        ("B", "1994-01-10", 50.0, 5.0),
    ]
    df = spark.createDataFrame(
        rows,
        "l_returnflag string, l_shipdate string, l_extendedprice double, "
        "l_quantity double",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("date"))
    out = {
        (r["l_returnflag"], r["bucket"].month): r
        for r in finance.vwap_bars(df).collect()
    }
    jan_a = out[("A", 1)]
    assert jan_a["bar_vwap"] == pytest.approx(400.0 / 20.0)
    assert jan_a["cum_vwap"] == pytest.approx(400.0 / 20.0)
    feb_a = out[("A", 2)]
    assert feb_a["bar_vwap"] == pytest.approx(100.0 / 30.0)
    assert feb_a["cum_vwap"] == pytest.approx(500.0 / 50.0)  # anchored
    assert out[("B", 1)]["bar_vwap"] == pytest.approx(10.0)
    assert jan_a["n_fills"] == 2


def test_rolling_beta_single_series_is_one(spark):
    # one series -> the market IS the series -> beta = 1 wherever defined
    df = _daily_events(spark, {"a": [10.0, 12.0, 11.0, 15.0, 14.0, 18.0]})
    rows = finance.rolling_beta(df, window=3, min_obs=2).collect()
    assert len(rows) == 5  # first day has no return
    for r in rows:
        assert r["log_return"] == pytest.approx(r["market_return"])
        if r["n_obs"] >= 2:
            assert r["beta"] == pytest.approx(1.0, abs=1e-9)
    assert rows[0]["beta"] is None  # n_obs = 1 < min_obs


def test_rolling_beta_hand_check_two_series(spark):
    totals = {
        "a": [10.0, 12.0, 9.0, 15.0, 11.0],
        "b": [20.0, 18.0, 25.0, 21.0, 30.0],
    }
    df = _daily_events(spark, totals)
    out = finance.rolling_beta(df, window=7, min_obs=3).collect()
    # hand: market = per-day sums
    mkt = [sum(v) for v in zip(*totals.values())]
    qm = [_q(math.log(mkt[i] / mkt[i - 1])) for i in range(1, len(mkt))]
    qa = [
        _q(math.log(totals["a"][i] / totals["a"][i - 1]))
        for i in range(1, 5)
    ]
    # beta for series a at the final day (4 obs in window)
    xs, ys = qm, qa
    n = 4.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    expect = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    last_a = [r for r in out if r["event_type"] == "a"][-1]
    assert last_a["n_obs"] == 4
    assert last_a["beta"] == pytest.approx(expect, rel=1e-9)


def test_rolling_beta_scans_corpus_once(spark, sf_dir):
    """The market curve must fold off the SAME rollup — one events scan."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        finance.rolling_beta(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1


def test_sharpe_sortino_hand_check(spark):
    vals = [10.0, 12.0, 9.0, 15.0, 11.0, 16.0]
    df = _daily_events(spark, {"a": vals})
    row = finance.sharpe_sortino(df).collect()[0]
    qs = [_q(math.log(vals[i] / vals[i - 1])) for i in range(1, len(vals))]
    rs = [q / 1e9 for q in qs]
    n = len(rs)
    mean = sum(q for q in qs) / 1e9 / n
    var = (
        sum(q * q for q in qs) / 1e18 - (sum(qs) / 1e9) ** 2 / n
    ) / (n - 1)
    dstd = math.sqrt(sum(q * q for q in qs if q < 0) / 1e18 / n)
    assert row["n_returns"] == n
    assert row["mean_return"] == pytest.approx(mean, rel=1e-12)
    assert row["vol"] == pytest.approx(math.sqrt(var), rel=1e-9)
    assert row["sharpe"] == pytest.approx(mean / math.sqrt(var), rel=1e-9)
    assert row["downside_dev"] == pytest.approx(dstd, rel=1e-9)
    assert row["sortino"] == pytest.approx(mean / dstd, rel=1e-9)


def test_sharpe_sortino_no_negative_returns(spark):
    df = _daily_events(spark, {"up": [1.0, 2.0, 8.0, 16.0]})
    row = finance.sharpe_sortino(df).collect()[0]
    assert row["sortino"] is None and row["downside_dev"] is None
    assert row["sharpe"] is not None


def test_kyle_lambda_recovers_planted_slope(spark):
    # plant |r| ~ lam * volume by varying volume and constructing totals
    base = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    total_prev = 100.0
    totals = [100.0]
    vols = [1, 5, 2, 8, 3, 6, 4]
    lam_true = 0.01
    for d, vol in enumerate(vols, start=1):
        r = lam_true * vol
        total = total_prev * math.exp(r)
        totals.append(total)
        total_prev = total
    # emit `vol` rows per day summing to the planted total
    for d, tot in enumerate(totals):
        vol = 1 if d == 0 else vols[d - 1]
        for j in range(vol):
            rows.append((i, base + dt.timedelta(days=d), "a", tot / vol))
            i += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    row = finance.kyle_lambda(df, min_buckets=5).collect()[0]
    # decimal(25,2) rounding of per-row values perturbs totals slightly
    assert row["kyle_lambda"] == pytest.approx(lam_true, rel=0.05)
    assert row["r2"] > 0.95
    assert row["n_buckets"] == len(vols)


def test_kyle_lambda_min_buckets_drops(spark):
    df = _daily_events(spark, {"a": [1.0, 2.0, 3.0]})
    assert finance.kyle_lambda(df, min_buckets=5).count() == 0


def test_garch_variance_hand_recursion(spark):
    vals = [10.0, 12.0, 9.0, 15.0, 11.0]
    om, al, be = 1e-5, 0.2, 0.7
    df = _daily_events(spark, {"a": vals})
    out = sorted(
        finance.garch_variance(df, omega=om, alpha=al, beta=be).collect(),
        key=lambda r: r["bucket"],
    )
    qs = [_q(math.log(vals[i] / vals[i - 1])) for i in range(1, len(vals))]
    v = om / (1.0 - al - be)
    expect = []
    prev = None
    for q in qs:
        if prev is not None:
            v = om + al * (prev * prev) + be * v
        r = q / 1e9
        expect.append((r, v))
        prev = r
    assert len(out) == len(expect)
    for row, (r, ev) in zip(out, expect):
        assert row["log_return"] == pytest.approx(r, rel=1e-12)
        assert row["cond_var"] == pytest.approx(ev, rel=1e-12)
        assert row["std_resid"] == pytest.approx(r / math.sqrt(ev), rel=1e-9)


def test_garch_rejects_nonstationary_params(spark):
    df = _daily_events(spark, {"a": [1.0, 2.0]})
    with pytest.raises(ValueError):
        finance.garch_variance(df, alpha=0.5, beta=0.6)


def test_finance_round9_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in (
        "vwap_bars",
        "rolling_beta",
        "sharpe_sortino",
        "kyle_lambda",
    ):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "No Partition Defined" not in plan, name
