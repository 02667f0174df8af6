"""Round-7 batch 7: operational relational metrics + corpus
fingerprints — closed-form fixtures."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import (
    similarity,
    text as T,
    tpch,
)


def test_fulfillment_latency_integer_days(spark):
    orders = spark.createDataFrame(
        [(1, 10, "O", 1.0, dt.datetime(2024, 1, 1), "1-URGENT"),
         (2, 11, "O", 1.0, dt.datetime(2024, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 3)), (1, dt.datetime(2024, 1, 9)),
         (2, dt.datetime(2024, 1, 5))],
        "l_orderkey long, l_shipdate timestamp",
    )
    out = tpch.fulfillment_latency(orders, li).collect()
    assert len(out) == 1
    r = out[0]
    # first-ship latencies: order 1 -> 2 days, order 2 -> 4 days
    assert r["mean_days"] == pytest.approx(3.0)
    assert r["p50_days"] == pytest.approx(3.0)
    assert r["max_days"] == 4


def test_order_backlog_sweep(spark):
    orders = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 2)),
         (3, dt.datetime(2024, 1, 2))],
        "o_orderkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 3)), (2, dt.datetime(2024, 1, 5))],
        "l_orderkey long, l_shipdate timestamp",
    )  # order 3 never ships
    out = {r["day"].day: r["backlog"] for r in tpch.order_backlog(orders, li).collect()}
    # Jan1: +1 -> 1; Jan2: +2 -> 3; Jan4: order1 closes -> 2; Jan6: order2 closes -> 1
    assert out[1] == 1 and out[2] == 3 and out[4] == 2 and out[6] == 1


def test_supplier_concentration_single_source_is_one(spark):
    li = spark.createDataFrame(
        [(1, 7, 100.0, 0.0), (1, 7, 50.0, 0.0), (2, 7, 30.0, 0.0), (2, 8, 30.0, 0.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "MONO"), (2, "DUO")], "p_partkey long, p_type string"
    )
    out = {r["p_type"]: r for r in tpch.supplier_concentration(li, part).collect()}
    assert out["MONO"]["hhi"] == pytest.approx(1.0)
    assert out["MONO"]["top_share"] == pytest.approx(1.0)
    assert out["DUO"]["hhi"] == pytest.approx(0.5)
    assert out["DUO"]["n_suppliers"] == 2


def test_price_dispersion_flags_only_volatile_part(spark):
    rows = [(1, 10.0 * q, q) for q in (1.0, 2.0, 3.0, 4.0, 5.0)]  # unit price 10 always
    rows += [(2, p, 1.0) for p in (1.0, 1.0, 1.0, 1.0, 400.0)]    # wild
    li = spark.createDataFrame(rows, "l_partkey long, l_extendedprice double, l_quantity double")
    part = spark.createDataFrame(
        [(1, "a", "B1"), (2, "b", "B2")], "p_partkey long, p_name string, p_brand string"
    )
    out = tpch.price_dispersion_screen(li, part, min_lines=5, min_cv=0.5).collect()
    assert [r["l_partkey"] for r in out] == [2]
    assert out[0]["cv"] > 1.0


def test_log_odds_tokens_finds_group_signature(spark):
    docs = spark.createDataFrame(
        [(i, "common words plus zebra zebra zebra", "A") for i in range(10)]
        + [(100 + i, "common words plus yak yak yak", "B") for i in range(10)],
        "doc_id long, text string, source string",
    )
    out = T.log_odds_tokens(docs, "source", "text", top_k=2)
    top = {r["grp"]: r["tok"] for r in out.where(F.col("rank") == 1).collect()}
    assert top["A"] == "zebra" and top["B"] == "yak"


def test_label_centroid_sim_orthogonal_vs_identical(spark):
    rows = []
    for i in range(20):
        rows.append((i, [1.0, 0.0, 0.0, 0.0], 0))
        rows.append((100 + i, [0.0, 1.0, 0.0, 0.0], 1))
        rows.append((200 + i, [1.0, 0.0, 0.0, 0.0], 2))  # same as label 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {(r["label_a"], r["label_b"]): r["cos_sim"]
           for r in similarity.label_centroid_similarity(emb).collect()}
    assert out[(0, 1)] == pytest.approx(0.0, abs=1e-9)
    assert out[(0, 2)] == pytest.approx(1.0, abs=1e-9)


def test_stickiness_daily_vs_monthly_users(spark):
    """User 1 active every day of Jan (31 days), users 2-11 active one
    day each: DAU avg = (31 + 10)/31, MAU = 11."""
    import datetime as dt
    from financial_fraud_detection_using_time_series_data_spark.operators import behavior

    rows = [(d, dt.datetime(2024, 1, 1 + d), 1, "view", 1.0) for d in range(31)]
    rows += [(100 + u, dt.datetime(2024, 1, 1 + u), 2 + u, "view", 1.0) for u in range(10)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = behavior.stickiness(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["mau"] == 11 and r["active_days"] == 31
    assert r["avg_dau"] == pytest.approx(41 / 31)
    assert r["stickiness"] == pytest.approx(41 / 31 / 11)


def test_missing_buckets_counts_gaps(spark):
    import datetime as dt
    from financial_fraud_detection_using_time_series_data_spark.operators import behavior

    # user 1: days 0..39 minus a 5-day hole; user 2: too-short span
    rows = [(d, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), 1, "view", 1.0)
            for d in range(40) if not (10 <= d < 15)]
    rows += [(100, dt.datetime(2024, 1, 1), 2, "view", 1.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = behavior.missing_buckets(ev, min_span_days=30).collect()
    assert len(out) == 1
    r = out[0]
    assert r["span_days"] == 40 and r["observed_days"] == 35 and r["missing_days"] == 5
    assert r["coverage"] == pytest.approx(35 / 40)


def test_two_hop_reach_path_graph(spark):
    """Path 1-2-3-4-5: node 1 reaches {3} in two hops, node 3 reaches
    {1, 5}."""
    from financial_fraud_detection_using_time_series_data_spark.operators import (
        events as events_ops,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "u long, v long"
    )
    out = {r["u"]: r["reach_2hop"] for r in events_ops.two_hop_reach(edges).collect()}
    assert out[1] == 1 and out[3] == 2 and out[5] == 1
    assert out[2] == 1  # reaches 4 (3 is direct, 2 itself excluded)


def test_seasonality_strength_separates_flat_from_cyclic(spark):
    import datetime as dt
    from financial_fraud_detection_using_time_series_data_spark.operators import drift

    rows = []
    eid = 0
    for h in range(24 * 14):
        # 'cyc': strong hour-of-day pattern; 'flat': constant
        cyc_val = 100.0 if (h % 24) < 12 else 10.0
        rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), 1, "cyc", cyc_val)); eid += 1
        rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), 1, "flat", 50.0)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["event_type"]: r["strength"] for r in drift.seasonality_strength(ev).collect()}
    assert out["cyc"] == pytest.approx(1.0, abs=1e-6)
    assert out["flat"] is None or out["flat"] == pytest.approx(0.0, abs=1e-6)


def test_croston_closed_form_two_demands(spark):
    """Two demands 10 and 20, 4 days apart: z = 10 + .2*(20-10) = 12,
    p = 1 + .2*(4-1) = 1.6."""
    import datetime as dt
    from financial_fraud_detection_using_time_series_data_spark.operators import forecast

    rows = [
        (0, dt.datetime(2024, 1, 1), 1, "view", 10.0),
        (1, dt.datetime(2024, 1, 5), 1, "view", 20.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = forecast.croston_forecast(ev, alpha=0.2).collect()[0]
    assert out["z"] == pytest.approx(12.0)
    assert out["p"] == pytest.approx(1.6)
    assert out["forecast_rate"] == pytest.approx(12.0 / 1.6)
    assert out["n_demands"] == 2


def test_page_hinkley_alarms_on_level_shift(spark):
    """30 quiet days then 30 loud days: PH must alarm after the shift
    and never before."""
    import datetime as dt
    from financial_fraud_detection_using_time_series_data_spark.operators import drift

    rows = []
    eid = 0
    for d in range(60):
        n = 5 if d < 30 else 50
        for i in range(n):
            rows.append((eid, dt.datetime(2024, 1, 1, i % 24) + dt.timedelta(days=d), 1, "view", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = drift.page_hinkley(ev, lam=50.0).orderBy("bucket").collect()
    alarms = [r["alarm"] for r in out]
    assert max(alarms[:30]) == 0
    assert alarms[-1] == 1


def test_abc_classes_partition_revenue(spark):
    rows = []
    # part 1: 70 revenue, part 2: 20, parts 3..12: 1 each
    rows += [(1, 70.0, 0.0)]
    rows += [(2, 20.0, 0.0)]
    rows += [(k, 1.0, 0.0) for k in range(3, 13)]
    li = spark.createDataFrame(rows, "l_partkey long, l_extendedprice double, l_discount double")
    out = {r["l_partkey"]: r for r in tpch.abc_classification(li, 0.7, 0.9).collect()}
    assert out[1]["abc_class"] == "A"
    assert out[2]["abc_class"] == "B"
    assert all(out[k]["abc_class"] == "C" for k in range(3, 13))
    assert out[12]["cum_share"] == pytest.approx(1.0)


def test_trimmed_mean_drops_tails(spark):
    """Values 1..100 with one outlier 1e6: trim to [p10,p90] must kill
    the outlier and land near the mid-band mean."""
    from financial_fraud_detection_using_time_series_data_spark.operators import relational

    rows = [(i, "g", float(i + 1)) for i in range(100)]
    rows.append((100, "g", 1e6))
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = relational.trimmed_mean(df, "event_type", "value", 0.1, 0.9).collect()[0]
    assert out["n_total"] == 101
    assert out["trimmed_mean"] < 120  # outlier excluded
    assert out["lo_bound"] < out["hi_bound"] < 1e5
    # sanity: brute force over the same band
    import numpy as np
    vals = np.array([v for _, _, v in rows])
    lo, hi = np.quantile(vals, 0.1), np.quantile(vals, 0.9)
    band = vals[(vals >= lo) & (vals <= hi)]
    assert out["trimmed_mean"] == pytest.approx(band.mean(), rel=1e-9)
    assert out["n_kept"] == len(band)


def test_sketch_accuracy_bounded_error(spark):
    from financial_fraud_detection_using_time_series_data_spark.sources import profiler

    rows = [(i, "g", float((i * 7919) % 10000)) for i in range(20000)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = profiler.sketch_accuracy_audit(df, "event_type", "value").collect()
    assert len(out) == 3
    # KLL at accuracy 10k on 20k rows: relative rank error <= 1e-4,
    # so value error stays well under 1% of the range here
    assert all(r["abs_err"] <= 100.0 for r in out)
    assert all(r["exact_q"] > 0 for r in out)
