"""Transaction-screen semantics: structuring, duplicate/replay, burst
profile, Bollinger breakout (operators/screens.py)."""

import math
from datetime import datetime, timedelta

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import screens


def _ev(spark, rows):
    """rows: (user, second_offset, event_type, value)"""
    t0 = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, t0 + timedelta(seconds=s), u, t, v)
            for i, (u, s, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


# --- structuring_screen ------------------------------------------------------


def test_structuring_flags_cluster_not_singleton(spark):
    h = 3600
    rows = [
        # u1: three just-under-100 txns inside 48h -> all three flagged
        (1, 0, "a", 95.0), (1, 10 * h, "a", 92.0), (1, 40 * h, "a", 99.0),
        # u1 also has a big txn (not in band, never flagged, never counted)
        (1, 20 * h, "a", 400.0),
        # u2: one near-threshold txn -> below min_count, not flagged
        (2, 0, "a", 95.0),
        # u3: two in-band txns 60h apart -> outside window, not flagged
        (3, 0, "a", 95.0), (3, 60 * h, "a", 95.0),
    ]
    out = screens.structuring_screen(
        _ev(spark, rows), threshold=100.0, band_frac=0.10,
        window_hours=48.0, min_count=2,
    ).collect()
    assert sorted(r.event_id for r in out) == [1, 2]  # 2nd and 3rd u1 band txns
    by_id = {r.event_id: r for r in out}
    assert by_id[1].near_count == 2 and by_id[1].near_sum == pytest.approx(187.0)
    # at 40h the 0h and 10h band txns are both still inside the 48h window
    assert by_id[2].near_count == 3
    assert by_id[2].near_sum == pytest.approx(95.0 + 92.0 + 99.0)


def test_structuring_band_is_half_open(spark):
    rows = [(1, 0, "a", 100.0), (1, 60, "a", 100.0)]  # exactly at threshold: excluded
    assert screens.structuring_screen(
        _ev(spark, rows), threshold=100.0, min_count=1
    ).count() == 0
    rows = [(1, 0, "a", 90.0)]  # exactly at lower edge: included
    assert screens.structuring_screen(
        _ev(spark, rows), threshold=100.0, band_frac=0.10, min_count=1
    ).count() == 1


# --- duplicate_transactions --------------------------------------------------


def test_duplicate_pairs_with_prior(spark):
    day = 86400
    rows = [
        (1, 0, "a", 50.0), (1, 2 * day, "b", 50.0),     # same amount, 2d -> dup
        (1, 20 * day, "a", 50.0),                        # 18d after last -> no
        (2, 0, "a", 50.0),                               # other user -> no
        (1, 0, "a", 60.0), (1, 100, "a", 60.01),         # amounts differ -> no
    ]
    out = screens.duplicate_transactions(_ev(spark, rows), within_days=7.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r.dup_id == 1 and r.prior_id == 0 and r.amount == 50.0
    assert r.gap_hours == pytest.approx(48.0)


def test_duplicate_type_key_optional(spark):
    rows = [(1, 0, "a", 50.0), (1, 3600, "b", 50.0)]
    assert screens.duplicate_transactions(_ev(spark, rows)).count() == 1
    assert screens.duplicate_transactions(
        _ev(spark, rows), type_col="event_type"
    ).count() == 0


# --- burst_screen ------------------------------------------------------------


def test_burst_peak_and_ratio(spark):
    m = 60
    # u1: 10 events in one hour, then 9 days of silence, 2 stragglers
    rows = [(1, i * 5 * m, "a", 1.0) for i in range(10)]
    rows += [(1, 9 * 86400, "a", 1.0), (1, 10 * 86400, "a", 1.0)]
    # u2: active 30 min only -> NULL rate (span < one window)
    rows += [(2, 0, "a", 1.0), (2, 30 * m, "a", 1.0)]
    out = {r.user_id: r for r in screens.burst_screen(
        _ev(spark, rows), window_minutes=60.0
    ).collect()}
    r1 = out[1]
    assert r1.n_events == 12 and r1.peak_in_window == 10  # minutes 0..45 < 60
    span_h = 10 * 86400 / 3600.0
    assert r1.mean_per_window == pytest.approx(12 / span_h)
    assert r1.burstiness == pytest.approx(10 / (12 / span_h))
    assert out[2].mean_per_window is None and out[2].burstiness is None


# --- bollinger_breakout ------------------------------------------------------


def test_bollinger_flags_only_outliers_vs_prior(spark):
    base = [(1, i * 60, "a", 10.0 + (i % 5)) for i in range(20)]  # mean 12, tight
    rows = base + [(1, 20 * 60, "a", 100.0)]  # way outside band
    out = screens.bollinger_breakout(
        _ev(spark, rows), n=20, k=2.0, min_periods=10
    ).collect()
    assert [r.event_id for r in out] == [20]
    r = out[0]
    vals = [10.0 + (i % 5) for i in range(20)]
    mean = sum(vals) / 20
    var = sum((v - mean) ** 2 for v in vals) / 19
    assert r.n_prior == 20
    assert r.band_mean == pytest.approx(mean, abs=1e-9)
    assert r.band_std == pytest.approx(math.sqrt(var), abs=1e-9)
    assert r.deviations == pytest.approx((100.0 - mean) / math.sqrt(var), abs=1e-9)


def test_burst_single_exchange(spark, sf_dir):
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    plan = (
        screens.burst_screen(load_table(spark, sf_dir, "events"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # trailing-range window and the same-key groupBy share one exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_bollinger_excludes_current_and_short_history(spark):
    # 10th event is the first judged (min_periods=10 prior rows)
    rows = [(1, i * 60, "a", 10.0) for i in range(10)] + [(1, 600, "a", 1000.0)]
    out = screens.bollinger_breakout(
        _ev(spark, rows), n=20, k=2.0, min_periods=10
    ).collect()
    # prior 10 values are constant -> var == 0 -> excluded, never a div-by-zero
    assert out == []


# --- interval_overlap_join ---------------------------------------------------


def test_interval_overlap_semantics(spark):
    from datetime import datetime, timedelta

    from financial_fraud_detection_using_time_series_data_spark.operators.relational import (
        interval_overlap_join,
    )

    t0 = datetime(2024, 1, 1)

    def iv(spark, rows):
        return spark.createDataFrame(
            [(i, t0 + timedelta(seconds=s), t0 + timedelta(seconds=e))
             for i, s, e in rows],
            "id long, start timestamp, end timestamp",
        )

    left = iv(spark, [(1, 0, 100), (2, 5000, 9000), (3, 20000, 20010)])
    right = iv(spark, [(10, 50, 150), (11, 99, 300), (12, 100, 200),
                       (13, 8000, 30000)])
    out = {(r.l_id, r.r_id): r.overlap_seconds
           for r in interval_overlap_join(left, right, bucket_seconds=60).collect()}
    # touching intervals (end == start) are NOT overlap (strict)
    assert (1, 12) not in out
    assert out[(1, 10)] == 50.0
    assert out[(1, 11)] == 1.0
    assert out[(2, 13)] == 1000.0
    assert out[(3, 13)] == 10.0
    assert len(out) == 4


def test_interval_overlap_multibucket_dedupes_and_subsecond(spark):
    from datetime import datetime, timedelta

    from financial_fraud_detection_using_time_series_data_spark.operators.relational import (
        interval_overlap_join,
    )

    t0 = datetime(2024, 1, 1)
    # both spans cover many buckets -> candidate pair appears per shared
    # bucket but must emit once; plus a 0.4s overlap must survive
    left = spark.createDataFrame(
        [(1, t0, t0 + timedelta(seconds=600)),
         (2, t0 + timedelta(seconds=1000, microseconds=600000),
          t0 + timedelta(seconds=1001))],
        "id long, start timestamp, end timestamp",
    )
    right = spark.createDataFrame(
        [(7, t0 + timedelta(seconds=60), t0 + timedelta(seconds=660)),
         (8, t0 + timedelta(seconds=1000), t0 + timedelta(seconds=1001))],
        "id long, start timestamp, end timestamp",
    )
    rows = interval_overlap_join(left, right, bucket_seconds=60).collect()
    got = {(r.l_id, r.r_id): r.overlap_seconds for r in rows}
    assert len(rows) == len(got) == 2  # one row per pair despite ~10 shared buckets
    assert got[(1, 7)] == 540.0
    assert got[(2, 8)] == 0.4


def test_fd_check_detects_violations(spark):
    from financial_fraud_detection_using_time_series_data_spark.sources import fd_check

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, "c")],
        "k long, v string",
    )
    r = fd_check(df, ["k"], "v").collect()[0]
    assert r.n_groups == 3 and r.n_violating == 1
    assert r.max_distinct == 2
    assert abs(r.violation_rate - 1 / 3) < 1e-12


# --- mahalanobis_outliers ----------------------------------------------------


def test_mahalanobis_flags_joint_outlier_not_marginal(spark):
    # correlated cloud along y = 10x; one point on-axis-extreme but
    # ON the line (joint-consistent), one mid-range point OFF the line
    rows = [(float(i), 10.0 * i + (i % 3 - 1) * 0.5) for i in range(1, 41)]
    rows.append((60.0, 600.0))   # extreme but consistent with the line
    rows.append((20.0, 390.0))   # mid-range x, wildly off-line y
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(rows)], "id long, x double, y double"
    )
    out = screens.mahalanobis_outliers(
        df, "x", "y", id_cols=["id"], threshold=9.21034,
        x_scale="decimal(18,6)", y_scale="decimal(18,6)",
    ).collect()
    flagged = {r.id for r in out}
    assert 41 in flagged          # the off-line point
    assert 40 not in flagged      # the on-line extreme survives
    for r in out:
        assert r.md2 > 9.21034


def test_mahalanobis_matches_numpy(spark):
    import numpy as np

    rng = [(float(i % 7), float((i * 13) % 11) + 0.25 * (i % 7)) for i in range(50)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(rng)], "id long, x double, y double"
    )
    out = {
        r.id: r.md2
        for r in screens.mahalanobis_outliers(
            df, "x", "y", id_cols=["id"], threshold=0.0,
            x_scale="decimal(18,6)", y_scale="decimal(18,6)",
        ).collect()
    }
    arr = np.array(rng)
    mu = arr.mean(axis=0)
    cov = np.cov(arr, rowvar=False)
    inv = np.linalg.inv(cov)
    for i, p in enumerate(arr):
        d = p - mu
        expect = float(d @ inv @ d)
        assert out[i] == pytest.approx(expect, rel=1e-9)
