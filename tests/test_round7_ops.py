"""Round-7 operators: information theory, share-lift AML screens,
peer-group anomaly, Amihud illiquidity, spectral entropy — semantics on
constructed corpora where the right answer is known in closed form."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import (
    drift,
    events as events_ops,
    finance,
    screens,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def test_transition_entropy_deterministic_cycle_has_zero_cond(spark):
    """A strict A→B→A→B process: next state is fully determined by the
    current one, so H(next|cur)=0 and MI = H(next)."""
    rows = [(i, _ts(i), 1, "AB"[i % 2], 1.0) for i in range(40)]
    out = events_ops.transition_entropy(_ev(spark, rows)).collect()[0]
    assert out["h_cond"] == pytest.approx(0.0, abs=1e-9)
    assert out["mi_onestep"] == pytest.approx(out["h_next"], abs=1e-9)
    assert out["h_next"] == pytest.approx(math.log(2), abs=1e-3)


def test_transition_entropy_iid_process_has_zero_mi(spark):
    """An i.i.d.-ish alternating-block process per user still satisfies
    H(cond) ≤ H(next); MI ≥ 0 always."""
    rows = [(i, _ts(i), i % 7, "ABC"[(i * 5 + i // 3) % 3], 1.0) for i in range(300)]
    out = events_ops.transition_entropy(_ev(spark, rows)).collect()[0]
    assert out["h_cond"] <= out["h_next"] + 1e-9
    assert out["mi_onestep"] >= -1e-9


def test_round_amount_screen_flags_the_round_user(spark):
    rows = [(i, _ts(i), 1, "purchase", 10.0 * (i + 1)) for i in range(20)]
    rows += [(100 + i, _ts(i), 2, "purchase", 17.37 + i) for i in range(20)]
    out = {
        r["user_id"]: r
        for r in screens.round_amount_screen(
            _ev(spark, rows), min_n=10
        ).collect()
    }
    assert out[1]["share"] == 1.0
    assert out[2]["share"] == 0.0
    assert out[1]["lift"] == pytest.approx(2.0)  # pop share = 0.5


def test_off_hours_screen_counts_dead_hours(spark):
    rows = [(i, dt.datetime(2024, 1, 1, i % 24), 1, "view", 1.0) for i in range(24)]
    out = screens.off_hours_screen(_ev(spark, rows), min_n=10).collect()[0]
    assert out["n_flag"] == 6 and out["n_txn"] == 24
    assert out["share"] == pytest.approx(0.25)


def test_peer_group_anomaly_zscores_within_tier(spark):
    # tier 1 (n=10): users 1..4 avg 100, user 5 avg 200 -> positive z
    rows = []
    eid = 0
    for u in range(1, 6):
        for i in range(10):
            rows.append((eid, _ts(i), u, "purchase", 200.0 if u == 5 else 100.0))
            eid += 1
    out = {r["user_id"]: r for r in screens.peer_group_anomaly(_ev(spark, rows)).collect()}
    assert all(r["tier"] == 1 for r in out.values())
    assert out[5]["z"] > 1.5
    assert out[1]["z"] < 0
    # mean of tier = 120
    assert out[1]["peer_mean"] == pytest.approx(120.0, abs=1e-6)


def test_amihud_flat_price_is_zero(spark):
    rows = [(i, _ts(i), 1, "view", 50.0) for i in range(48)]
    out = finance.amihud_illiquidity(_ev(spark, rows)).collect()
    assert len(out) == 1 and out[0]["illiq_e6"] == 0.0 and out[0]["n_days"] == 2


def test_amihud_known_value(spark):
    # one user, two days: day1 open 100 close 110, vol 210; day2 open 100 close 90, vol 190
    rows = [
        (0, dt.datetime(2024, 1, 1, 1), 1, "view", 100.0),
        (1, dt.datetime(2024, 1, 1, 2), 1, "view", 110.0),
        (2, dt.datetime(2024, 1, 2, 1), 1, "view", 100.0),
        (3, dt.datetime(2024, 1, 2, 2), 1, "view", 90.0),
    ]
    out = finance.amihud_illiquidity(_ev(spark, rows)).collect()[0]
    expect = (0.1 / 210.0 * 1e6 + 0.1 / 190.0 * 1e6) / 2.0
    assert out["illiq_e6"] == pytest.approx(expect, rel=1e-5)


def test_spectral_entropy_pure_cycle_vs_noise(spark):
    """A count series with a planted k=4 cycle concentrates spectral
    mass (low normalized entropy, dominant_k=4); a flat series spreads
    it."""
    n = 240
    cyc = []
    eid = 0
    for t in range(n):
        reps = 10 + (8 if (4 * t) % n < n // 2 else -8)  # square wave, k=4
        for _ in range(reps):
            cyc.append((eid, _ts(t), 1, "view", 1.0))
            eid += 1
    out_c = drift.spectral_entropy(_ev(spark, cyc), max_k=12).collect()[0]
    flat = [(i, _ts(i % n), 1, "view", 1.0) for i in range(n * 10)]
    out_f = drift.spectral_entropy(_ev(spark, flat), max_k=12).collect()[0]
    assert out_c["dominant_k"] == 4
    assert out_c["spec_entropy_norm"] < 0.75
    assert out_c["spec_entropy_norm"] < out_f["spec_entropy_norm"] + 1.0
