"""Monitoring/relevance additions (round 9b): dispersion index, PSI
timeline, Gini gain."""

import datetime as dt
import math

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import (
    drift,
    evaluation,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_dispersion_regular_stream_fano_zero(spark):
    base = dt.datetime(2024, 1, 1)
    # exactly one event per hour -> counts constant 1 -> var 0 -> fano 0
    rows = [(i, base + dt.timedelta(hours=i), "a", 1.0) for i in range(12)]
    row = drift.dispersion_index(_ev(spark, rows)).collect()[0]
    assert row["n_buckets"] == 12 and row["fano"] == pytest.approx(0.0)


def test_dispersion_counts_gap_buckets_as_zero(spark):
    base = dt.datetime(2024, 1, 1)
    # bursts at hour 0 and hour 3 (4 calendar buckets, 2 empty)
    rows = [
        (1, base, "a", 1.0),
        (2, base + dt.timedelta(minutes=5), "a", 1.0),
        (3, base + dt.timedelta(hours=3), "a", 1.0),
        (4, base + dt.timedelta(hours=3, minutes=9), "a", 1.0),
    ]
    row = drift.dispersion_index(_ev(spark, rows)).collect()[0]
    counts = [2, 0, 0, 2]
    n = 4
    mean = sum(counts) / n
    var = sum(c * c for c in counts) / n - mean * mean
    assert row["n_buckets"] == 4 and row["n_nonzero_buckets"] == 2
    assert row["mean_count"] == pytest.approx(mean)
    assert row["fano"] == pytest.approx(var / mean, abs=1e-6)


def test_dispersion_rejects_bad_bucket(spark):
    with pytest.raises(ValueError):
        drift.dispersion_index(_ev(spark, []), bucket="fortnight")


def test_psi_timeline_stable_days_near_zero_shifted_day_spikes(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    # 8 baseline-ish days drawing the same values; day 9 shifts hard
    # (40 rows/day so add-alpha smoothing noise stays small)
    for d in range(9):
        vals = (
            [10.0, 20.0, 30.0, 40.0] * 10
            if d < 8
            else [90.0, 95.0, 99.0, 99.5] * 10
        )
        for v in vals:
            rows.append((i, base + dt.timedelta(days=d, hours=1), "a", v))
            i += 1
    out = sorted(
        drift.psi_timeline(
            _ev(spark, rows), baseline_days=7, n_bins=10
        ).collect(),
        key=lambda r: r["day"],
    )
    assert len(out) == 9
    # identically-distributed days: tiny PSI; the shifted day dominates
    assert out[0]["psi"] < 0.05
    assert out[-1]["psi"] > 1.0
    assert out[-1]["psi"] == max(r["psi"] for r in out)


def test_gini_gain_perfect_split(spark):
    rows = [("a", 1)] * 5 + [("b", 0)] * 5
    df = spark.createDataFrame(rows, "f string, y int")
    row = evaluation.gini_gain(df, "f", "y").collect()[0]
    assert row["gini_root"] == pytest.approx(0.5, abs=1e-6)
    assert row["gini_split"] == pytest.approx(0.0, abs=1e-6)
    assert row["gain"] == pytest.approx(0.5, abs=1e-6)


def test_gini_gain_uninformative_split(spark):
    rows = [("a", 1), ("a", 0), ("b", 1), ("b", 0)]
    df = spark.createDataFrame(rows, "f string, y int")
    row = evaluation.gini_gain(df, "f", "y").collect()[0]
    assert row["gain"] == pytest.approx(0.0, abs=1e-6)


def test_gini_gain_hand_check(spark):
    groups = {"a": (4, 3), "b": (6, 1)}  # (n, positives)
    rows = []
    for g, (n, pos) in groups.items():
        rows += [(g, 1)] * pos + [(g, 0)] * (n - pos)
    df = spark.createDataFrame(rows, "f string, y int")
    row = evaluation.gini_gain(df, "f", "y").collect()[0]
    N = sum(n for n, _ in groups.values())
    P = sum(p for _, p in groups.values())
    pr = P / N
    g_root = 1 - pr * pr - (1 - pr) ** 2
    wg = 0
    for n, pos in groups.values():
        p = pos / n
        gv = 1 - p * p - (1 - p) ** 2
        wg += n * (math.floor(gv * 1e9 + 0.5) / 1e9)
    expect_split = wg / N
    assert row["gini_root"] == pytest.approx(g_root, abs=1e-6)
    assert row["gini_split"] == pytest.approx(expect_split, abs=1e-6)
    assert row["gain"] == pytest.approx(g_root - expect_split, abs=1e-6)


def test_monitoring_round9_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in ("dispersion_index", "psi_timeline", "gini_gain"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "No Partition Defined" not in plan, name
