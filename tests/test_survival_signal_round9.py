"""Survival/signal/pricing additions (round 9b): Nelson-Aalen hazard,
Haar wavelet energy, discount elasticity."""

import datetime as dt
import math

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import (
    behavior,
    drift,
    tpch,
)


def test_cumulative_hazard_hand_check(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users with lifetimes 0,0,1,2 days; dataset end = day 30 so all churned
    lifetimes = [0, 0, 1, 2]
    for u, lf in enumerate(lifetimes):
        rows.append((eid, base, u)); eid += 1
        rows.append((eid, base + dt.timedelta(days=lf), u)); eid += 1
    rows.append((eid, base + dt.timedelta(days=30), 99))  # watermark user
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {r["day"]: r for r in behavior.cumulative_hazard(df).collect()}
    # at-risk: day0: 5 users (incl. the censored watermark user, who
    # EXITS the risk set at its day-0 lifetime); day1: 2; day2: 1
    assert out[0]["n_at_risk"] == 5 and out[0]["n_events"] == 2
    h0 = math.floor(2 / 5 * 1e9 + 0.5) / 1e9
    h1 = h0 + math.floor(1 / 2 * 1e9 + 0.5) / 1e9
    h2 = h1 + math.floor(1 / 1 * 1e9 + 0.5) / 1e9
    assert out[0]["cum_hazard"] == pytest.approx(h0, abs=1e-6)
    assert out[1]["cum_hazard"] == pytest.approx(h1, abs=1e-6)
    assert out[2]["cum_hazard"] == pytest.approx(h2, abs=1e-6)
    v0 = 2 / 25
    assert out[0]["cum_hazard_var"] == pytest.approx(v0, abs=1e-6)


def test_cumulative_hazard_monotone(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(days=i % 5, hours=i), i % 7)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = sorted(behavior.cumulative_hazard(df).collect(), key=lambda r: r["day"])
    hs = [r["cum_hazard"] for r in out]
    assert hs == sorted(hs)


def _hourly(spark, counts):
    base = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((i, base + dt.timedelta(hours=h, minutes=5), "a"))
            i += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")


def test_wavelet_energy_alternating_signal(spark):
    # counts alternate 4,0,4,0,... -> level-1 details are ±4, higher
    # levels see balanced halves -> zero energy
    counts = [4, 0] * 8
    df = _hourly(spark, counts)
    out = {r["block_hours"]: r for r in drift.wavelet_energy(df, max_level=3).collect()}
    assert out[2]["energy"] == pytest.approx(16.0, abs=1e-6)
    assert out[4]["energy"] == pytest.approx(0.0, abs=1e-6)
    assert out[8]["energy"] == pytest.approx(0.0, abs=1e-6)


def test_wavelet_energy_step_signal_hits_coarse_level(spark):
    # first 8 hours busy, next 8 quiet -> energy concentrates at the
    # 16-hour block level
    counts = [3] * 8 + [0] * 8
    df = _hourly(spark, counts)
    out = {r["block_hours"]: r for r in drift.wavelet_energy(df, max_level=4).collect()}
    assert out[2]["energy"] == pytest.approx(0.0, abs=1e-6)
    assert out[4]["energy"] == pytest.approx(0.0, abs=1e-6)
    # the 16h block splits 24 vs 0 (alignment-dependent but busy/quiet)
    assert out[16]["energy"] > 100.0


def test_wavelet_energy_rejects_bad_level(spark):
    with pytest.raises(ValueError):
        drift.wavelet_energy(_hourly(spark, [1]), max_level=0)


def test_discount_elasticity_planted_slope(spark):
    # qty = 10 * (1 - d)^(-2) exactly at band means -> elasticity -2
    rows = []
    i = 0
    for d in (0.0, 0.02, 0.05, 0.08, 0.10):
        qty = 10.0 * (1.0 - d) ** -2.0
        for _ in range(20):
            rows.append((i, round(qty, 2), d)); i += 1
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_quantity double, l_discount double"
    )
    row = tpch.discount_elasticity(df).collect()[0]
    assert row["n_bands"] == 5 and row["n_lines"] == 100
    # rounding qty to cents perturbs slightly
    assert row["elasticity"] == pytest.approx(-2.0, abs=0.01)
    assert row["r2"] > 0.999


def test_discount_elasticity_flat_demand_zero(spark):
    rows = [(i, 25.0, d) for i, d in enumerate((0.0, 0.05, 0.10) * 10)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_quantity double, l_discount double"
    )
    row = tpch.discount_elasticity(df).collect()[0]
    assert row["elasticity"] == pytest.approx(0.0, abs=1e-6)


def test_survival_signal_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in ("cumulative_hazard", "wavelet_energy", "discount_elasticity"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
