"""Event-sequence analytics: semantic edge cases + plan shape.

Oracle parity for the three queries() entries is covered by
test_oracle_parity; these tests pin the semantics the SQL twin can't
express as sharply (strict funnel ordering, probability normalization)
and the single-exchange scale contract.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import events


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, d, h), u, t, 1.0) for i, (u, d, h, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_transition_probabilities_sum_to_one_per_prev(spark):
    df = _ev(
        spark,
        [(1, 1, 0, "a"), (1, 1, 1, "b"), (1, 1, 2, "a"), (2, 1, 0, "a"), (2, 1, 1, "a")],
    )
    out = events.transition_matrix(df, "user_id", "ts", "event_type", "event_id")
    sums = out.groupBy("prev_type").agg(F.sum("p").alias("s")).collect()
    for r in sums:
        assert abs(r.s - 1.0) < 1e-9
    # user 1: a->b, b->a; user 2: a->a
    m = {(r.prev_type, r.next_type): r.n for r in out.collect()}
    assert m == {("a", "b"): 1, ("b", "a"): 1, ("a", "a"): 1}


def test_funnel_requires_strict_order(spark):
    # u1 completes signup->click->purchase in order; u2 purchases BEFORE
    # signup (purchase must not count); u3 signs up only.
    df = _ev(
        spark,
        [
            (1, 1, 0, "signup"), (1, 1, 1, "click"), (1, 1, 2, "purchase"),
            (2, 1, 0, "purchase"), (2, 1, 1, "signup"), (2, 1, 2, "click"),
            (3, 1, 0, "signup"),
        ],
    )
    out = events.funnel(df, ["signup", "click", "purchase"])
    got = {r.step: (r.entities_reached, r.conversion) for r in out.collect()}
    assert got["signup"] == (3, 1.0)
    assert got["click"] == (2, 0.666667)
    assert got["purchase"] == (1, 0.333333)


def test_funnel_entity_never_reaching_first_step(spark):
    df = _ev(spark, [(1, 1, 0, "view"), (1, 1, 1, "purchase")])
    out = events.funnel(df, ["signup", "purchase"])
    got = {r.step: r.entities_reached for r in out.collect()}
    assert got == {"signup": 0, "purchase": 0}


def test_cohort_retention_age_zero_is_one(spark):
    # u1 first active week 1, active weeks 1+2; u2 first active week 2 only.
    df = _ev(
        spark,
        [(1, 1, 0, "view"), (1, 8, 0, "view"), (2, 8, 0, "view"), (2, 8, 1, "view")],
    )
    out = events.cohort_retention(df)
    rows = {(str(r.cohort), r.age_weeks): (r.n_active, r.retention) for r in out.collect()}
    assert rows[("2024-01-01", 0)] == (1, 1.0)
    assert rows[("2024-01-01", 1)] == (1, 1.0)
    assert rows[("2024-01-08", 0)] == (1, 1.0)


def test_funnel_per_step_windows_share_one_exchange(spark, sf_dir):
    """All K step windows + the per-entity rollup hash on the same key:
    exactly ONE exchange over the event table (the tiny K-row tail may
    repartition; only hashpartitioning exchanges are counted)."""
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    out = events.funnel(ev, ["signup", "click", "purchase"])
    n = _plan(out).count("Exchange hashpartitioning")
    assert n == 1, _plan(out)


def test_transition_matrix_single_corpus_exchange(spark, sf_dir):
    """One exchange on user for the lag; the (prev,next) agg shuffles
    only |types|² partial rows (map-side combine present)."""
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    out = events.transition_matrix(ev, "user_id", "ts", "event_type", "event_id")
    plan = _plan(out)
    assert "partial_count" in plan or "HashAggregate" in plan


def test_shared_attribute_degree_counts_distinct_entities(spark):
    df = spark.createDataFrame(
        [(0, 1, "dev_a"), (1, 2, "dev_a"), (2, 1, "dev_a"), (3, 3, "dev_b")],
        "event_id long, user_id long, device string",
    )
    out = events.shared_attribute_degree(df, F.col("device"))
    got = {r.event_id: (r.n_entities_sharing, r.is_shared) for r in out.collect()}
    # dev_a: users {1,2} → degree 2 (repeat events don't inflate); dev_b: 1
    assert got[0] == (2, True) and got[1] == (2, True) and got[2] == (2, True)
    assert got[3] == (1, False)


def test_shared_attribute_degree_dim_is_broadcast(spark, sf_dir):
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    out = events.shared_attribute_degree(
        ev, F.get_json_object("props", "$.k").cast("int")
    )
    assert "BroadcastHashJoin" in _plan(out)


def test_fraud_rings_transitive_linking_and_caps(spark):
    # amounts: 10.0 links users 1,2; 20.0 links users 2,3 (chain → one
    # ring {1,2,3}); 30.0 is shared by 5 users > max_degree=4 → no link;
    # user 9's 99.0 is unshared → singleton, excluded.
    rows = [
        (0, 1, 10.0), (1, 2, 10.0), (2, 2, 20.0), (3, 3, 20.0),
        (4, 4, 30.0), (5, 5, 30.0), (6, 6, 30.0), (7, 7, 30.0), (8, 8, 30.0),
        (9, 9, 99.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    out = events.fraud_rings(df, F.col("value"), min_degree=2, max_degree=4)
    got = {r.user_id: (r.ring_id, r.ring_size) for r in out.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)


def test_conversion_latency_censoring_and_order(spark):
    from datetime import datetime as dt

    rows = [
        # u1 converts 2h after signup; an earlier purchase must not count
        (0, dt(2024, 1, 1, 0), 1, "purchase"),
        (1, dt(2024, 1, 1, 1), 1, "signup"),
        (2, dt(2024, 1, 1, 3), 1, "purchase"),
        # u2 signs up, never purchases → censored NULL
        (3, dt(2024, 1, 1, 0), 2, "signup"),
        # u3 never signs up → excluded
        (4, dt(2024, 1, 1, 0), 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = events.conversion_latency(df, "signup", "purchase")
    got = {r.user_id: (r.converted, r.latency_us) for r in out.collect()}
    assert set(got) == {1, 2}
    assert got[1] == (True, 2 * 3600 * 1_000_000)
    assert got[2] == (False, None)


def test_match_pattern_contiguity_and_span(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [
        # u1: a b c contiguous (match, span 20s)
        (0, 0, 1, "a"), (1, 10, 1, "b"), (2, 20, 1, "c"),
        # u2: a X b c — intervening X breaks contiguity (no match)
        (3, 0, 2, "a"), (4, 5, 2, "x"), (5, 10, 2, "b"), (6, 15, 2, "c"),
        # u3: two overlapping matches a b c with a b c again
        (7, 0, 3, "a"), (8, 1, 3, "b"), (9, 2, 3, "c"),
        (10, 3, 3, "a"), (11, 4, 3, "b"), (12, 5, 3, "c"),
    ]
    df = spark.createDataFrame(
        [(i, t0 + timedelta(seconds=s), u, ty, 1.0) for i, s, u, ty in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = sorted(
        events.match_pattern(df, ["a", "b", "c"]).collect(),
        key=lambda r: r.start_id,
    )
    assert [(r.user_id, r.start_id, r.span_s) for r in out] == [
        (1, 0, 20.0), (3, 7, 2.0), (3, 10, 2.0),
    ]


def test_match_pattern_max_span_filter(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [(0, 0, 1, "a"), (1, 10, 1, "b"), (2, 2000, 1, "c")]
    df = spark.createDataFrame(
        [(i, t0 + timedelta(seconds=s), u, ty, 1.0) for i, s, u, ty in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    assert events.match_pattern(df, ["a", "b", "c"], max_span_s=60).count() == 0
    assert events.match_pattern(df, ["a", "b", "c"], max_span_s=3000).count() == 1


def test_match_pattern_single_exchange(spark, sf_dir):
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    plan = _plan(events.match_pattern(load_table(spark, sf_dir, "events"), ["a", "b"]))
    assert plan.count("Exchange hashpartitioning") == 1


def test_cooccurrence_lift_semantics(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    # 4 baskets: {a,b} x2, {a} x1, {b} x1 -> n_a=3, n_b=3, n_ab=2, N=4
    # lift = 2*4/(3*3) = 8/9; duplicate events in a basket count once
    rows = [
        (0, 1, 0, "a"), (1, 1, 1, "b"), (2, 1, 2, "a"),  # u1 h0: {a,b} (dup a)
        (3, 2, 0, "a"), (4, 2, 1, "b"),                   # u2 h0: {a,b}
        (5, 3, 0, "a"),                                   # u3 h0: {a}
        (6, 4, 0, "b"),                                   # u4 h0: {b}
    ]
    df = spark.createDataFrame(
        [(i, t0 + timedelta(seconds=s), u, ty, 1.0) for i, u, s, ty in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = events.cooccurrence_lift(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b) == ("a", "b")
    assert (r.n_ab, r.n_a, r.n_b) == (2, 3, 3)
    assert r.support == 0.5
    assert abs(r.lift - 8 / 9) < 1e-12


def test_cooccurrence_basket_cap_drops_whole_basket(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    # u1's basket has 3 items (> cap 2) -> dropped whole; only u2 counts
    rows = [
        (0, 1, 0, "a"), (1, 1, 1, "b"), (2, 1, 2, "c"),
        (3, 2, 0, "a"), (4, 2, 1, "b"),
    ]
    df = spark.createDataFrame(
        [(i, t0 + timedelta(seconds=s), u, ty, 1.0) for i, u, s, ty in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = events.cooccurrence_lift(df, max_basket=2).collect()
    assert len(out) == 1
    assert (out[0].n_ab, out[0].n_a, out[0].n_b) == (1, 1, 1)
    assert out[0].lift == 1.0  # N=1 basket


def test_session_paths_truncation_and_gap(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    # u1 session 1: a,b,c,d,e,f (7 events -> path truncated to 5 steps,
    # avg_session_len still counts all); 2h gap -> session 2: a,b
    rows = (
        [(i, 10 * i, 1, t) for i, t in enumerate(["a", "b", "c", "d", "e", "f", "g"])]
        + [(10, 7200 + 10, 1, "a"), (11, 7200 + 20, 1, "b")]
        + [(20, 0, 2, "a"), (21, 10, 2, "b")]  # u2: same a>b path
    )
    df = spark.createDataFrame(
        [(i, t0 + timedelta(seconds=s), u, ty, 1.0) for i, s, u, ty in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r.path: r for r in events.session_paths(df, gap_s=1800, max_steps=5).collect()}
    assert set(out) == {"a>b>c>d>e", "a>b"}
    assert out["a>b>c>d>e"].n_sessions == 1
    assert out["a>b>c>d>e"].avg_session_len == 7.0  # full length, not truncated
    assert out["a>b"].n_sessions == 2 and out["a>b"].avg_session_len == 2.0


def test_session_paths_top_n_deterministic(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    # three singleton paths tie at n=1 -> top_n=2 keeps the two smallest
    # path strings (tie broken by path asc)
    rows = [(0, 0, 1, "c"), (1, 0, 2, "a"), (2, 0, 3, "b")]
    df = spark.createDataFrame(
        [(i, t0 + timedelta(seconds=s), u, ty, 1.0) for i, s, u, ty in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = sorted(r.path for r in events.session_paths(df, top_n=2).collect())
    assert out == ["a", "b"]


# --- attribution_last_touch --------------------------------------------------


def test_attribution_skips_adjacent_conversions(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "view", 0.0),
        (1, t0 + timedelta(minutes=1), 1, "purchase", 10.0),
        # back-to-back purchase: still credited to 'view', not 'purchase'
        (2, t0 + timedelta(minutes=2), 1, "purchase", 20.0),
        (3, t0 + timedelta(minutes=3), 1, "click", 0.0),
        (4, t0 + timedelta(minutes=4), 1, "purchase", 5.0),
        # u2 converts with no prior touch -> NULL channel
        (5, t0, 2, "purchase", 7.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    from financial_fraud_detection_using_time_series_data_spark.operators import events as ev_ops

    out = {r.channel: r for r in ev_ops.attribution_last_touch(df).collect()}
    assert set(out) == {"view", "click", None}
    assert out["view"].revenue == pytest.approx(30.0)
    assert out["view"].n_conversions == 2
    assert out["click"].revenue == pytest.approx(5.0)
    assert out[None].revenue == pytest.approx(7.0)
    assert out["view"].revenue_share == pytest.approx(30.0 / 42.0)


# --- label_propagation -------------------------------------------------------


def test_label_propagation_two_cliques(spark):
    from datetime import timedelta

    t0 = datetime(2024, 1, 1)
    # attr values shared within each clique only -> two communities
    rows, eid = [], 0
    for attr, users in [(100.0, [1, 2, 3]), (200.0, [2, 3]),
                        (300.0, [10, 11, 12]), (400.0, [11, 12])]:
        for u in users:
            rows.append((eid, t0 + timedelta(seconds=eid), u, "a", attr))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r.user_id: r for r in events.label_propagation(
        df, F.col("value"), min_degree=2, max_degree=10, n_iter=5
    ).collect()}
    assert {out[u].community for u in (1, 2, 3)} == {1}
    assert {out[u].community for u in (10, 11, 12)} == {10}
    assert all(out[u].community_size == 3 for u in out)


def test_label_propagation_deterministic(spark, sf_dir):
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    a = sorted(map(tuple, events.label_propagation(ev, F.col("value")).collect()))
    b = sorted(map(tuple, events.label_propagation(ev, F.col("value")).collect()))
    assert a == b and len(a) > 0


# --- adamic_adar / kcore -----------------------------------------------------


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "u long, v long"
    )


def test_adamic_adar_matches_bruteforce(spark):
    import math
    import itertools

    # two triangles bridged by a path + a pendant
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6), (6, 7)]
    out = {
        (r.u, r.v): (r.n_common, r.aa_score)
        for r in events.adamic_adar(_edges_df(spark, pairs)).collect()
    }
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    for u, v in itertools.combinations(sorted(adj), 2):
        if v in adj[u]:
            continue
        common = adj[u] & adj[v]
        if common:
            expect[(u, v)] = (
                len(common),
                sum(1.0 / math.log(len(adj[w])) for w in common),
            )
    assert set(out) == set(expect)
    for key in expect:
        assert out[key][0] == expect[key][0], key
        assert out[key][1] == pytest.approx(expect[key][1], rel=1e-12), key


def test_adamic_adar_wedge_degree_cap(spark):
    # hub 0 connected to 1..9; cap below 9 removes the hub as a common
    # neighbor, so no pair survives (leaves share only the hub)
    pairs = [(0, i) for i in range(1, 10)]
    full = events.adamic_adar(_edges_df(spark, pairs)).collect()
    assert len(full) == 36  # C(9,2) leaf pairs via the hub
    capped = events.adamic_adar(
        _edges_df(spark, pairs), max_wedge_degree=8
    ).collect()
    assert capped == []


def _peel(pairs, k):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n in adj if len(adj[n]) < k]:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
            changed = True
    return {n: len(adj[n]) for n in adj}


def test_kcore_matches_bruteforce(spark):
    # clique(4) + tail path: 3-core is exactly the clique
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (6, 7)]
    for k in (2, 3, 4):
        got = {
            r.u: r.core_degree
            for r in events.kcore(_edges_df(spark, pairs), k=k).collect()
        }
        assert got == _peel(pairs, k), k


def test_kcore_cascading_peel(spark):
    # long path: 2-core empty only after the peel cascades end-to-end
    pairs = [(i, i + 1) for i in range(10)]
    assert events.kcore(_edges_df(spark, pairs), k=2).collect() == []
    # cycle: every node survives the 2-core with degree 2
    cyc = pairs + [(10, 0)]
    got = {r.u: r.core_degree for r in events.kcore(_edges_df(spark, cyc), k=2).collect()}
    assert got == {i: 2 for i in range(11)}
