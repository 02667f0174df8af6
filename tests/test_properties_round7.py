"""Property-based tests for the round-7 operators: brute-force parity
on arbitrary inputs (hypothesis), not just the driver tables."""

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import (
    evaluation,
    events as events_ops,
    forecast,
    tpch,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    ys=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_kalman_matches_pure_python(spark, ys):
    """The distributed filter must equal the textbook sequential
    recursion exactly (same float ops, same order)."""
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), 1, "v", float(y))
        for i, y in enumerate(ys)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {
        r["step"]: r["level"]
        for r in forecast.kalman_filter(ev, q=0.05, r=0.5, p0=1.0).collect()
    }
    # brute force on the decimal-rounded daily sums (one event/day here,
    # but the rollup casts through decimal(25,2) — mirror that)
    daily = [float(round(y, 2)) for y in ys]
    p, level = 1.0, daily[0]
    expect = {1: level}
    for i, y in enumerate(daily[1:], start=2):
        pp = p + 0.05
        k = pp / (pp + 0.5)
        level = level + k * (y - level)
        p = (1.0 - k) * pp
        expect[i] = level
    assert got.keys() == expect.keys()
    for s in expect:
        assert got[s] == pytest.approx(expect[s], abs=1e-9)


@given(
    labels=st.lists(st.integers(0, 1), min_size=8, max_size=60).filter(
        lambda ls: 0 < sum(ls) < len(ls)
    )
)
@settings(**_SETTINGS)
def test_grouped_auc_matches_bruteforce(spark, labels):
    rows = [(i, int(l), ((i * 31) % 17) / 17.0, 0) for i, l in enumerate(labels)]
    df = spark.createDataFrame(rows, "event_id long, label int, score double, seg int")
    got = evaluation.grouped_auc(df, "seg", "label", "score").collect()[0]["auc"]
    pos = [math.floor(s * 1e6 + 0.5) for _, l, s, _ in rows if l == 1]
    neg = [math.floor(s * 1e6 + 0.5) for _, l, s, _ in rows if l == 0]
    num = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    assert got == pytest.approx(num / (len(pos) * len(neg)), abs=1e-12)


@given(
    edges=st.sets(
        st.tuples(st.integers(1, 12), st.integers(1, 12)).filter(
            lambda t: t[0] < t[1]
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_two_hop_reach_matches_bruteforce(spark, edges):
    df = spark.createDataFrame(sorted(edges), "u long, v long")
    got = {
        r["u"]: r["reach_2hop"]
        for r in events_ops.two_hop_reach(df, max_wedge_degree=64).collect()
    }
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expect = {}
    for u in adj:
        two = set()
        for w in adj[u]:
            two |= adj[w]
        two -= adj[u]
        two.discard(u)
        if two:
            expect[u] = len(two)
    assert got == expect


@given(
    deltas=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 15)),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_order_backlog_never_negative_and_ends_at_open_count(spark, deltas):
    """Backlog is a running count of open intervals: always ≥ 0, and the
    final value equals the number of never-shipped orders."""
    orders = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(days=d)) for i, (d, _) in enumerate(deltas)],
        "o_orderkey long, o_orderdate timestamp",
    )
    li_rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(days=d + ship))
        for i, (d, ship) in enumerate(deltas)
        if ship > 0  # ship==0 -> never ships
    ]
    li = (
        spark.createDataFrame(li_rows, "l_orderkey long, l_shipdate timestamp")
        if li_rows
        else spark.createDataFrame([], "l_orderkey long, l_shipdate timestamp")
    )
    out = tpch.order_backlog(orders, li).orderBy("day").collect()
    assert all(r["backlog"] >= 0 for r in out)
    never_shipped = sum(1 for _, ship in deltas if ship == 0)
    assert out[-1]["backlog"] == never_shipped
