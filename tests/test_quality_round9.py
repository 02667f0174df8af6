"""Data-quality / privacy II (round 9b): t-closeness, referential
integrity, PK candidate audit, freshness lag."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import privacy
from financial_fraud_detection_using_time_series_data_spark.sources import (
    freshness_lag,
    pk_candidates,
    referential_integrity,
)


def test_t_closeness_identical_class_is_zero(spark):
    # one class that IS the global distribution -> EMD 0
    rows = [("a", float(v)) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = privacy.t_closeness(df, ["g"], "v", t=0.1, n_bins=5).collect()
    assert len(out) == 1
    assert out[0]["emd"] == 0.0 and bool(out[0]["meets_t"])


def test_t_closeness_skewed_class_flagged(spark):
    # class 'lo' holds only the smallest values, 'hi' only the largest
    rows = [("lo", float(v)) for v in range(10)] + [
        ("hi", float(v)) for v in range(90, 100)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r
        for r in privacy.t_closeness(df, ["g"], "v", t=0.2, n_bins=10).collect()
    }
    # each class occupies one tail -> |cum diff| ~ 0.5 on average
    assert out["lo"]["emd"] > 0.2 and not out["lo"]["meets_t"]
    assert out["hi"]["emd"] > 0.2 and not out["hi"]["meets_t"]
    # hand value for 'lo': bins 0..9, lo all in bin 0 (values 0..9 with
    # global range 0..99) -> cum_lo = 1 everywhere; global cum rises
    # 0.5, 0.5, ..., at bin b: (10 + 10*[b>=9 bins hit])...
    # simpler: EMD_lo = sum_b (1 - cum_g(b)) / 9 with cum_g linear
    cum_g = [(10 if b == 0 else 0) + 10 * b for b in range(10)]
    cum_g = [min((10 + 10 * b) if b < 9 else 100, 100) / 100 for b in range(10)]
    expect = sum(abs(1.0 - c) for c in cum_g) / 9.0
    assert out["lo"]["emd"] == pytest.approx(expect, abs=1e-6)


def test_t_closeness_constant_sensitive_single_bin(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0)], "g string, v double"
    )
    out = privacy.t_closeness(df, ["g"], "v", n_bins=4).collect()
    for r in out:
        assert r["emd"] == 0.0  # degenerate width -> all in bin 0, equal


def test_referential_integrity_counts_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None), (5, 99)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    row = referential_integrity(
        {"child->parent": (child, "fk", parent, "pk")}
    ).collect()[0]
    assert row["n_child"] == 5
    assert row["n_orphans"] == 2  # the two fk=99 rows
    assert row["n_null_fk"] == 1
    assert row["orphan_rate"] == pytest.approx(0.4)


def test_referential_integrity_multi_edge_union(spark):
    a = spark.createDataFrame([(1, 1)], "id long, fk long")
    p = spark.createDataFrame([(1,)], "pk long")
    out = referential_integrity(
        {"e1": (a, "fk", p, "pk"), "e2": (a, "id", p, "pk")}
    ).collect()
    assert sorted(r["edge"] for r in out) == ["e1", "e2"]
    assert all(r["n_orphans"] == 0 for r in out)


def test_pk_candidates_verdicts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")],
        "k long, g string",
    )
    out = {r["candidate"]: r for r in pk_candidates(df, [["k"], ["g"], ["k", "g"]]).collect()}
    # k: distinct but has a NULL row -> not a key
    assert out["k"]["n_distinct"] == 4 and out["k"]["n_null_rows"] == 1
    assert not out["k"]["is_key"]
    # g: duplicated
    assert out["g"]["n_duplicated_rows"] == 2 and not out["g"]["is_key"]
    # (k, g): distinct but nulls present in both columns' rows
    assert out["k,g"]["n_null_rows"] == 2 and not out["k,g"]["is_key"]


def test_pk_candidates_true_key(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    row = pk_candidates(df, [["k"]]).collect()[0]
    assert row["is_key"] and row["n_duplicated_rows"] == 0


def test_freshness_lag_hand_check(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # fresh series: events up to the watermark
        (1, base + dt.timedelta(days=5, hours=3), "fresh"),
        (2, base + dt.timedelta(days=5), "fresh"),
        (3, base + dt.timedelta(days=4), "fresh"),
        # stale series: stopped 3 days before
        (4, base + dt.timedelta(days=2, hours=1), "stale"),
        (5, base, "stale"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {
        r["event_type"]: r
        for r in freshness_lag(df, "event_type", "ts", stale_after_s=86400.0).collect()
    }
    assert out["fresh"]["lag_s"] == 0.0 and not out["fresh"]["is_stale"]
    assert out["fresh"]["n_total"] == 3
    # watermark day = day 5; fresh has 2 events that day, stale none
    assert out["fresh"]["n_watermark_day"] == 2
    assert out["stale"]["n_watermark_day"] == 0
    expect_lag = (dt.timedelta(days=3, hours=2)).total_seconds()
    assert out["stale"]["lag_s"] == pytest.approx(expect_lag)
    assert out["stale"]["is_stale"]


def test_quality_round9_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in (
        "t_closeness",
        "referential_integrity",
        "pk_candidates",
        "freshness_lag",
    ):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_freshness_single_corpus_scan(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        freshness_lag(ev, "event_type", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 0  # rollup checkpointed
