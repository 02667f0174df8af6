"""Decision-support additions (round 9b): Q6 revenue-change and Q21
waiting-supplier analogs."""

import datetime as dt

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import tpch


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_shipdate timestamp, "
        "l_extendedprice double, l_discount double, l_quantity double",
    )


def test_q6_filters_and_revenue(spark):
    d94 = dt.datetime(1994, 6, 1)
    d95 = dt.datetime(1995, 6, 1)
    rows = [
        (1, 1, d94, 1000.0, 0.06, 10.0),   # in: 60.00
        (2, 1, d94, 2000.0, 0.05, 23.0),   # in: 100.00 (band edge)
        (3, 1, d94, 1000.0, 0.04, 10.0),   # out: below band
        (4, 1, d94, 1000.0, 0.06, 24.0),   # out: qty not < 24
        (5, 1, d95, 1000.0, 0.06, 10.0),   # out: wrong year
    ]
    out = tpch.forecast_revenue_change(
        _li(spark, rows), year=1994, discount_mid=0.06, discount_band=0.01
    ).collect()[0]
    assert out["n_lines"] == 2
    assert out["revenue"] == pytest.approx(160.0)


def test_q6_band_is_basis_point_exact(spark):
    d = dt.datetime(1994, 1, 1)
    # 0.07 must be INCLUDED at band edge despite float representation
    rows = [(1, 1, d, 100.0, 0.07, 1.0), (2, 1, d, 100.0, 0.0701, 1.0)]
    out = tpch.forecast_revenue_change(
        _li(spark, rows), year=1994
    ).collect()[0]
    assert out["n_lines"] == 1


def _sup(spark):
    sup = spark.createDataFrame(
        [(1, "Sup#1", 0), (2, "Sup#2", 0), (3, "Sup#3", 1)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    nat = spark.createDataFrame(
        [(0, "ALPHA"), (1, "BETA")], "n_nationkey long, n_name string"
    )
    return sup, nat


def test_q21_flags_only_the_laggard(spark):
    base = dt.datetime(1994, 1, 1)
    late = base + dt.timedelta(days=90)
    rows = [
        # order 1: suppliers 1 (early) and 2 (90 days later) -> 2 lags
        (1, 1, base, 1.0, 0.0, 1.0),
        (1, 2, late, 1.0, 0.0, 1.0),
        # order 2: single supplier -> excluded (not multi-supplier)
        (2, 2, late, 1.0, 0.0, 1.0),
        # order 3: two suppliers 10 days apart -> excluded (< min lag)
        (3, 1, base, 1.0, 0.0, 1.0),
        (3, 3, base + dt.timedelta(days=10), 1.0, 0.0, 1.0),
    ]
    sup, nat = _sup(spark)
    out = tpch.waiting_supplier(
        _li(spark, rows), sup, nat, min_lag_days=60, top_n=10
    ).collect()
    assert len(out) == 1
    assert out[0]["s_suppkey"] == 2 and out[0]["wait_count"] == 1
    assert out[0]["nation"] == "ALPHA"


def test_q21_multiline_laggard_counts_once(spark):
    base = dt.datetime(1994, 1, 1)
    late = base + dt.timedelta(days=70)
    rows = [
        (1, 1, base, 1.0, 0.0, 1.0),
        (1, 2, late, 1.0, 0.0, 1.0),
        (1, 2, late, 2.0, 0.0, 2.0),  # second line, same ship date
    ]
    sup, nat = _sup(spark)
    out = tpch.waiting_supplier(
        _li(spark, rows), sup, nat, min_lag_days=60
    ).collect()
    assert len(out) == 1 and out[0]["wait_count"] == 1


def test_tpch_round9_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in ("forecast_revenue_change", "waiting_supplier"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "No Partition Defined" not in plan, name
    # the shipdate range + quantity predicates must reach the scan
    # (explain("formatted") shows the full PushedFilters list; the
    # simple-plan string truncates the FileScan line)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        entrymod.queries()["forecast_revenue_change"](spark, sf_dir).explain(
            "formatted"
        )
    q6 = buf.getvalue()
    pushed = [l for l in q6.splitlines() if "PushedFilters" in l][0]
    assert "l_shipdate" in pushed and "LessThan(l_quantity" in pushed, pushed
    q21 = (
        entrymod.queries()["waiting_supplier"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in q21
