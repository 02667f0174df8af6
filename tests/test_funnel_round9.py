"""Funnel/data-quality additions (round 9b): window_funnel and
pattern_profile."""

import datetime as dt

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import events
from financial_fraud_detection_using_time_series_data_spark.sources import (
    pattern_profile,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_window_funnel_depths(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: full chain within window -> depth 3
        (1, base, 1, "a"), (2, base + h, 1, "b"), (3, base + 2 * h, 1, "c"),
        # user 2: step b outside the window -> depth 1
        (4, base, 2, "a"), (5, base + 30 * h, 2, "b"),
        # user 3: b before a (out of order) -> depth 1
        (6, base, 3, "b"), (7, base + h, 3, "a"),
        # user 4: a then b in window, c out of window -> depth 2
        (8, base, 4, "a"), (9, base + h, 4, "b"), (10, base + 40 * h, 4, "c"),
        # user 5: never anchors -> excluded
        (11, base, 5, "b"), (12, base + h, 5, "c"),
    ]
    out = {
        r["depth"]: r
        for r in events.window_funnel(
            _ev(spark, rows), ["a", "b", "c"], window_s=24 * 3600.0
        ).collect()
    }
    assert out[3]["n_entities"] == 1
    assert out[2]["n_entities"] == 1
    assert out[1]["n_entities"] == 2
    assert out[1]["share"] == pytest.approx(0.5, abs=1e-6)
    assert 5 not in {u for d in out.values() for u in []}  # excluded by design


def test_window_funnel_step_inside_window_of_anchor_not_prev(spark):
    # b at +20h, c at +23h: within 24h of the ANCHOR though 3h after b
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "a"),
        (2, base + dt.timedelta(hours=20), 1, "b"),
        (3, base + dt.timedelta(hours=23), 1, "c"),
    ]
    out = events.window_funnel(
        _ev(spark, rows), ["a", "b", "c"], window_s=24 * 3600.0
    ).collect()
    assert out[-1]["depth"] == 3


def test_window_funnel_requires_steps(spark):
    with pytest.raises(ValueError):
        events.window_funnel(_ev(spark, []), [], 60.0)


def test_pattern_profile_masks_and_example(spark):
    rows = [
        (1, "AB-1234"),
        (2, "CD-5678"),
        (3, "xy_99"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, code string")
    out = {r["mask"]: r for r in pattern_profile(df, "code").collect()}
    assert out["AA-9999"]["n_rows"] == 2
    assert out["AA-9999"]["example"] == "AB-1234"  # MIN raw value
    assert out["AA-9999"]["share"] == pytest.approx(0.5, abs=1e-6)
    assert out["aa_99"]["n_rows"] == 1
    assert out["<null>"]["n_rows"] == 1


def test_pattern_profile_top_n_and_tiebreak(spark):
    rows = [(i, f"{i % 4}") for i in range(8)]  # four masks '9', equal
    df = spark.createDataFrame(rows, "id long, code string")
    out = pattern_profile(df, "code", top_n=2).collect()
    assert len(out) == 1  # all digits collapse to ONE mask '9'
    assert out[0]["mask"] == "9" and out[0]["n_rows"] == 8


def test_funnel_round9_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in ("window_funnel", "pattern_profile"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    pp = (
        entrymod.queries()["pattern_profile"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in pp
