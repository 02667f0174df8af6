"""Financial time-series primitives: bar semantics, return/volatility
guards, drawdown path dependence (oracle parity lives in the
attestation sweep)."""

import math
from datetime import datetime, timedelta

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import finance


def _ev(spark, rows):
    """rows: (event_id, second_offset, event_type, value)"""
    t0 = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(i, t0 + timedelta(seconds=s), 1, t, v) for i, s, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_ohlc_open_close_ordering(spark):
    # same hour, ts ties broken by event_id: open = id 0's value, close = id 3's
    rows = [
        (0, 10, "a", 5.0),
        (1, 10, "a", 9.0),   # ts tie with id 0 -> still after it
        (2, 20, "a", 1.0),
        (3, 30, "a", 7.0),
    ]
    r = finance.ohlc_bars(_ev(spark, rows)).collect()[0]
    assert r.open == 5.0 and r.close == 7.0
    assert r.high == 9.0 and r.low == 1.0
    assert r.n == 4 and r.total == 22.0


def test_ohlc_buckets_split(spark):
    rows = [(0, 0, "a", 1.0), (1, 3600, "a", 2.0), (2, 7200, "a", 3.0)]
    out = finance.ohlc_bars(_ev(spark, rows)).collect()
    assert len(out) == 3
    assert all(r.open == r.close == r.high == r.low for r in out)


def test_realized_vol_constant_growth(spark):
    # hourly totals double every hour: log_return = ln 2 exactly, vol = 0
    rows = [(i, 3600 * i, "a", float(2**i)) for i in range(8)]
    out = sorted(
        finance.realized_volatility(_ev(spark, rows)).collect(),
        key=lambda r: r.bucket,
    )
    assert out[0].log_return is None and out[0].realized_vol is None
    assert out[1].log_return == pytest.approx(math.log(2), abs=1e-12)
    assert out[1].realized_vol is None  # only one return so far
    for r in out[2:]:
        assert r.log_return == pytest.approx(math.log(2), abs=1e-12)
        assert r.realized_vol == pytest.approx(0.0, abs=1e-12)


def test_realized_vol_nonpositive_guard(spark):
    # a zero-total bucket yields NULL return on both sides of the gap
    rows = [(0, 0, "a", 4.0), (1, 3600, "a", 0.0), (2, 7200, "a", 4.0)]
    out = sorted(
        finance.realized_volatility(_ev(spark, rows)).collect(),
        key=lambda r: r.bucket,
    )
    assert out[1].log_return is None  # current total 0
    assert out[2].log_return is None  # previous total 0


def test_max_drawdown_planted_collapse(spark):
    # equity: 10, 30, 15, 40 -> peak 30 at t1, trough 15 -> dd = 0.5
    vals = [10.0, 20.0, -15.0, 25.0]
    rows = [(i, 3600 * i, "a", v) for i, v in enumerate(vals)]
    r = finance.max_drawdown(_ev(spark, rows)).collect()[0]
    assert r.max_drawdown == pytest.approx(0.5, abs=1e-12)
    assert r.trough_bucket == datetime(2024, 1, 1, 2)
    assert r.peak_value == 30.0 and r.final_value == 40.0


def test_max_drawdown_monotone_is_zero(spark):
    rows = [(i, 3600 * i, "a", 5.0) for i in range(5)]
    r = finance.max_drawdown(_ev(spark, rows)).collect()[0]
    assert r.max_drawdown == 0.0
    # every bucket has dd=0; the earliest wins the tie, and peak_value is
    # the running peak AT the trough bucket (first bucket -> 5)
    assert r.trough_bucket == datetime(2024, 1, 1, 0)
    assert r.peak_value == 5.0 and r.final_value == 25.0


def test_streaming_ohlc_equals_batch(spark, sf_dir, tmp_path):
    """Replaying the events table through the file micro-batch source and
    aggregating with streaming_ohlc (complete mode) must reproduce the
    batch ohlc_bars frame EXACTLY — the one-plan-three-planes contract."""
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table
    from financial_fraud_detection_using_time_series_data_spark.streaming import (
        streaming_ohlc,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    bars = streaming_ohlc(stream, window_dur="1 hour", watermark="1 hour")
    q = (
        bars.writeStream.format("memory")
        .queryName("ohlc_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    got = {
        (r.event_type, r.bucket): (r.open, r.high, r.low, r.close, r.n, r.total)
        for r in spark.sql("select * from ohlc_stream").collect()
    }
    want = {
        (r.event_type, r.bucket): (r.open, r.high, r.low, r.close, r.n, r.total)
        for r in finance.ohlc_bars(ev, bucket="hour").collect()
    }
    assert got == want  # exact equality, floats included


def test_twap_holding_weights(spark):
    # series: value 10 held 15 min, then 20 held to the hour boundary
    # (end = next series' max ts). TWAP = (10*900 + 20*2700)/3600 = 17.5
    rows = [
        (0, 0, "a", 10.0),
        (1, 900, "a", 20.0),
        (2, 3600, "a", 30.0),  # anchors the hour boundary; holds 0 s after
    ]
    out = {r.bucket: r for r in finance.twap(_ev(spark, rows)).collect()}
    bar = out[datetime(2024, 1, 1, 0)]
    assert bar.twap == pytest.approx((10 * 900 + 20 * 2700) / 3600, abs=1e-9)
    assert bar.covered_s == 3600


def test_twap_interval_spanning_buckets(spark):
    # one value held across 3 hours: each covered bucket gets that value
    rows = [(0, 0, "a", 7.0), (1, 3 * 3600, "a", 9.0)]
    out = sorted(finance.twap(_ev(spark, rows)).collect(), key=lambda r: r.bucket)
    assert len(out) == 3
    for r in out:
        assert r.twap == pytest.approx(7.0, abs=1e-12)
        assert r.covered_s == 3600


def test_twap_vs_plain_avg_burst_bias(spark):
    # a burst of ticks at one level must NOT dominate the bucket:
    # value 100 held 1 s (100 ticks), value 0 held the rest of the hour
    rows = [(i, i, "a", 100.0) for i in range(100)] + [
        (100, 100, "a", 0.0),
        (101, 3600, "a", 1.0),
    ]
    r = sorted(finance.twap(_ev(spark, rows)).collect(), key=lambda x: x.bucket)[0]
    # held: 100.0 for 100s, 0.0 for 3500s
    assert r.twap == pytest.approx(100 * 100 / 3600, abs=1e-9)


# --- lead_lag_corr -----------------------------------------------------------


def test_lead_lag_recovers_planted_shift(spark):
    from datetime import datetime, timedelta

    from financial_fraud_detection_using_time_series_data_spark.operators import finance

    base = datetime(2024, 1, 1)
    rows = []
    # type 'a' count pattern p(t); type 'b' = same pattern shifted +2h:
    # corr peaks exactly at lag +2 (a leads b by 2 hours)
    pattern = [1, 5, 2, 8, 3, 9, 1, 7, 4, 6, 2, 8, 5, 3, 9, 2, 7, 1, 6, 4]
    eid = 0
    for t, c in enumerate(pattern):
        for _ in range(c):
            rows.append((eid, base + timedelta(hours=t, minutes=1), "a")); eid += 1
    for t, c in enumerate(pattern):
        for _ in range(c):
            rows.append((eid, base + timedelta(hours=t + 2, minutes=1), "b")); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r.lag: r.corr for r in finance.lead_lag_corr(df, "a", "b", max_lag=4).collect()}
    assert out[2] == pytest.approx(1.0, abs=1e-9)
    for lag, c in out.items():
        if lag != 2 and c is not None:
            assert c < 0.9, (lag, c)


def test_lead_lag_matches_numpy(spark):
    import numpy as np
    from datetime import datetime, timedelta

    from financial_fraud_detection_using_time_series_data_spark.operators import finance

    rng = np.random.default_rng(6)
    base = datetime(2024, 1, 1)
    xa = rng.integers(0, 6, 24)
    xb = rng.integers(0, 6, 24)
    rows = []
    eid = 0
    for t in range(24):
        for _ in range(int(xa[t])):
            rows.append((eid, base + timedelta(hours=t), "a")); eid += 1
        for _ in range(int(xb[t])):
            rows.append((eid, base + timedelta(hours=t), "b")); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r.lag: (r.n_buckets, r.corr) for r in finance.lead_lag_corr(df, "a", "b", max_lag=3).collect()}
    # brute force on the DENSE-bucket series restricted to buckets where
    # either stream has events (buckets with zero of both never appear)
    hours = [t for t in range(24) if xa[t] or xb[t]]
    series = {t: (int(xa[t]), int(xb[t])) for t in hours}
    for lag in range(-3, 4):
        pairs = [
            (series[t][0], series[t + lag][1])
            for t in hours if (t + lag) in series
        ]
        n = len(pairs)
        assert out[lag][0] == n, lag
        x = np.array([p[0] for p in pairs], dtype=float)
        y = np.array([p[1] for p in pairs], dtype=float)
        if x.std() > 0 and y.std() > 0:
            assert out[lag][1] == pytest.approx(float(np.corrcoef(x, y)[0, 1]), rel=1e-9), lag


# --- var_es ------------------------------------------------------------------


def test_var_es_matches_bruteforce(spark):
    import math

    import numpy as np

    from financial_fraud_detection_using_time_series_data_spark.operators import finance

    rng = np.random.default_rng(12)
    series = {1: rng.normal(0, 10, 100).round(2), 2: rng.normal(5, 3, 40).round(2)}
    rows = [(int(u), float(v)) for u, vs in series.items() for v in vs]
    df = spark.createDataFrame(rows, "user_id long, value double")
    out = {
        r.user_id: (r.n_obs, r.var_value, r.es_value)
        for r in finance.var_es(df, alpha=0.05, min_obs=20).collect()
    }
    for u, vs in series.items():
        s = np.sort(vs)
        k = math.ceil(0.05 * len(s))
        assert out[u][0] == len(s)
        assert out[u][1] == pytest.approx(float(s[k - 1]), abs=1e-9)
        assert out[u][2] == pytest.approx(float(s[:k].mean()), rel=1e-9)
        assert out[u][2] <= out[u][1]  # ES is at least as extreme as VaR


def test_var_es_drops_thin_entities(spark):
    from financial_fraud_detection_using_time_series_data_spark.operators import finance

    df = spark.createDataFrame(
        [(1, float(i)) for i in range(19)] + [(2, float(i)) for i in range(25)],
        "user_id long, value double",
    )
    got = {r.user_id for r in finance.var_es(df, min_obs=20).collect()}
    assert got == {2}
