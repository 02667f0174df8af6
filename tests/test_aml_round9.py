"""AML III (round 9b): second-digit Benford and rapid-movement
(pass-through) screens."""

import datetime as dt
import math

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import (
    drift,
    screens,
)


def test_benford_second_digit_counts_and_expectation(spark):
    # cents strings: 12345 -> second digit 2; 905 -> 0; 19 -> 9
    vals = [123.45, 9.05, 0.19, 0.19, 250.00]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    out = {r["digit"]: r for r in drift.benford_second_digit(df).collect()}
    assert len(out) == 10  # densified 0..9
    assert out[2]["n"] == 1  # 12345
    assert out[0]["n"] == 1  # 905
    assert out[5]["n"] == 1  # 25000
    assert out[9]["n"] == 2  # 19, 19
    expect0 = sum(math.log10(1 + 1 / (10 * d1 + 0)) for d1 in range(1, 10))
    assert out[0]["expected_p"] == pytest.approx(expect0, abs=1e-6)
    assert out[9]["p"] == pytest.approx(2 / 5, abs=1e-6)


def test_benford_second_digit_excludes_single_digit_cents(spark):
    # 0.05 -> cents "5": no second digit -> excluded entirely
    df = spark.createDataFrame([(0.05,), (1.23,)], "value double")
    out = drift.benford_second_digit(df).collect()
    assert sum(r["n"] for r in out) == 1


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_rapid_movement_matches_within_window_and_tolerance(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 7, "purchase", 100.00),
        (2, base + dt.timedelta(minutes=30), 7, "error", 100.50),  # hit
        (3, base + dt.timedelta(hours=3), 7, "purchase", 200.00),
        (4, base + dt.timedelta(hours=5), 7, "error", 230.00),  # 15% off -> no
        (5, base + dt.timedelta(hours=6), 8, "purchase", 50.00),
        (6, base + dt.timedelta(hours=9), 8, "error", 50.00),  # > gap -> no
    ]
    df = _ev(spark, rows)
    out = screens.rapid_movement(
        df, max_gap_s=7200.0, tol=0.01
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 7 and r["n_pass_through"] == 1
    assert r["total_in_value"] == pytest.approx(100.00)
    assert r["min_gap_s"] == pytest.approx(1800.0)


def test_rapid_movement_one_hit_per_inbound(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 7, "purchase", 100.00),
        (2, base + dt.timedelta(minutes=10), 7, "error", 100.00),
        (3, base + dt.timedelta(minutes=20), 7, "error", 100.00),
        (4, base + dt.timedelta(minutes=30), 7, "error", 100.00),
    ]
    df = _ev(spark, rows)
    r = screens.rapid_movement(df, max_gap_s=3600.0, tol=0.01).collect()[0]
    assert r["n_pass_through"] == 1  # three outs collapse to one hit
    assert r["min_gap_s"] == pytest.approx(600.0)


def test_rapid_movement_crosses_bucket_boundary(spark):
    # in at t=3500s into its bucket, out 200s later in the NEXT bucket
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base + dt.timedelta(seconds=3500), 7, "purchase", 10.00),
        (2, base + dt.timedelta(seconds=3700), 7, "error", 10.00),
    ]
    df = _ev(spark, rows)
    out = screens.rapid_movement(df, max_gap_s=3600.0, tol=0.0).collect()
    assert len(out) == 1 and out[0]["n_pass_through"] == 1


def test_rapid_movement_direction_matters(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 7, "error", 100.00),  # out BEFORE in -> no hit
        (2, base + dt.timedelta(minutes=5), 7, "purchase", 100.00),
    ]
    df = _ev(spark, rows)
    assert screens.rapid_movement(df, max_gap_s=3600.0).count() == 0


def test_aml_round9_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in ("benford_second_digit", "rapid_movement"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
