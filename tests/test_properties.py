"""Property-based tests (hypothesis) for the pandas-parity scalar library
and window helpers — invariants that must hold for ANY input, not just
the driver tables."""

import math

import pytest

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.functions import exprs as E
from financial_fraud_detection_using_time_series_data_spark.operators import windows

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(finite_doubles, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_pct_rank_matches_pandas(spark, vals):
    pdf = pd.DataFrame({"u": 1, "v": vals, "i": range(len(vals))})
    df = spark.createDataFrame(pdf)
    got = (
        df.select("i", windows.pct_rank_pandas(F.col("v"), "u").alias("p"))
        .toPandas()
        .sort_values("i")["p"]
        .to_numpy()
    )
    want = pdf["v"].rank(pct=True).to_numpy()
    assert all(abs(a - b) < 1e-12 for a, b in zip(got, want))


@given(vals=st.lists(finite_doubles, min_size=1, max_size=30), seq_len=st.integers(1, 6))
@settings(**_SETTINGS)
def test_pad_sequence_always_exact_length(spark, vals, seq_len):
    pdf = pd.DataFrame({"u": 1, "v": vals, "i": range(len(vals))})
    df = spark.createDataFrame(pdf)
    w = windows.user_window("u", "i")
    seq = windows.sliding_sequence(F.col("v"), w, seq_len=seq_len)
    padded = df.select(seq.alias("__s")).select(
        windows.pad_sequence(F.col("__s"), seq_len, F.lit(0.0)).alias("s")
    )
    sizes = [r.s for r in padded.select(F.size("s").alias("s")).collect()]
    assert all(x == seq_len for x in sizes)


@given(v=finite_doubles, lo=finite_doubles, hi=finite_doubles)
@settings(**_SETTINGS)
def test_clip_bounds(spark, v, lo, hi):
    if lo > hi:
        lo, hi = hi, lo
    got = spark.range(1).select(E.clip(F.lit(v), lo, hi).alias("c")).collect()[0].c
    assert lo <= got <= hi
    assert got == min(max(v, lo), hi)


@given(v=st.floats(min_value=-1e4, max_value=1e4, allow_nan=False))
@settings(**_SETTINGS)
def test_amount_bin_is_total_and_monotone(spark, v):
    got = spark.range(1).select(E.amount_bin(F.lit(v)).alias("b")).collect()[0].b
    assert got in range(7)


@given(vals=st.lists(st.one_of(finite_doubles, st.none()), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_scrub_removes_all_non_finite(spark, vals):
    pdf = pd.DataFrame({"v": pd.array(vals, dtype="Float64")})
    df = spark.createDataFrame(pdf)
    out = [r.s for r in df.select(E.scrub(F.col("v")).alias("s")).collect()]
    assert all(s is not None and math.isfinite(s) for s in out)


@given(
    gaps=st.lists(st.integers(min_value=0, max_value=4000), min_size=1, max_size=30),
)
@settings(**_SETTINGS)
def test_sessionize_matches_bruteforce(spark, gaps):
    """Session indices must equal the sequential brute-force labelling for
    any gap sequence (gap > 1800s starts a new session)."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    ts, cur = [], t0
    for g in gaps:
        cur = cur + datetime.timedelta(seconds=g)
        ts.append(cur)
    pdf = pd.DataFrame({"user_id": 1, "ts": ts, "event_id": range(len(ts)), "value": 1.0})
    df = spark.createDataFrame(pdf)
    got = (
        windows.sessionize(df, gap_s=1800)
        .select("event_id", "session_idx")
        .toPandas()
        .sort_values("event_id")["session_idx"]
        .tolist()
    )
    want, sid = [], 0
    prev = None
    for t in ts:
        if prev is None or (t - prev).total_seconds() > 1800:
            sid += 1
        want.append(sid)
        prev = t
    assert got == want


@given(vals=st.lists(finite_doubles, min_size=2, max_size=40))
@settings(**_SETTINGS)
def test_group_quantiles_match_numpy(spark, vals):
    """Exact percentile must match numpy's linear-interpolation rule."""
    import numpy as np

    from financial_fraud_detection_using_time_series_data_spark.operators import relational

    pdf = pd.DataFrame({"k": "a", "v": vals})
    df = spark.createDataFrame(pdf)
    row = relational.group_quantiles(df, "k", "v", probs=(0.5, 0.9)).collect()[0]
    assert abs(row["p50"] - np.percentile(vals, 50)) < 1e-9
    assert abs(row["p90"] - np.percentile(vals, 90)) < 1e-9


@given(
    l_ts=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=15),
    r_ts=st.lists(st.integers(min_value=0, max_value=1000), min_size=0, max_size=15),
)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, l_ts, r_ts):
    """as_of_join must pick the latest right value at-or-before each left
    ts (ties on right ts broken by larger right id)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    lpdf = pd.DataFrame(
        {
            "lid": range(len(l_ts)),
            "k": 1,
            "ts": [base + datetime.timedelta(seconds=s) for s in l_ts],
        }
    )
    rpdf = pd.DataFrame(
        {
            "rid": range(len(r_ts)),
            "k": 1,
            "ts": [base + datetime.timedelta(seconds=s) for s in r_ts],
            "val": [float(i) for i in range(len(r_ts))],
        }
    )
    from financial_fraud_detection_using_time_series_data_spark.operators import relational

    left = spark.createDataFrame(lpdf)
    right = (
        spark.createDataFrame(rpdf)
        if len(rpdf)
        else spark.createDataFrame([], "rid long, k long, ts timestamp, val double")
    )
    out = (
        relational.as_of_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["val"], right_id="rid",
        )
        .select("lid", "asof_val")
        .toPandas()
        .sort_values("lid")["asof_val"]
        .tolist()
    )
    want = []
    for lt in lpdf["ts"]:
        cands = [
            (rt, rid, v)
            for rt, rid, v in zip(rpdf["ts"], rpdf["rid"], rpdf["val"])
            if rt <= lt
        ]
        if cands:
            want.append(max(cands, key=lambda c: (c[0], c[1]))[2])
        else:
            want.append(None)
    assert len(out) == len(want)
    for a, b in zip(out, want):
        if b is None:
            assert a is None or math.isnan(a)
        else:
            assert a == b


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=60
    ),
    n_chunks=st.integers(min_value=1, max_value=8),
)
@settings(**{**_SETTINGS, "max_examples": 6})
def test_chunked_global_rank_matches_single_window(spark, vals, n_chunks):
    """chunked.global_rank must equal row_number() over a single global
    window for ANY value multiset (heavy ties included) and ANY chunk
    count — the exactness contract every chunked operator rests on."""
    from pyspark.sql import Window

    from financial_fraud_detection_using_time_series_data_spark.operators import chunked

    pdf = pd.DataFrame(
        {"tid": range(len(vals)), "v": [float(v) for v in vals]}
    )
    df = spark.createDataFrame(pdf).withColumn("__k", F.col("v"))
    got = chunked.global_rank(
        df, "__k", ["v", "tid"], n_chunks=n_chunks, rank_col="rn", count_col="n"
    )
    want = df.withColumn(
        "want_rn", F.row_number().over(Window.orderBy("v", "tid"))
    )
    j = got.join(want.select("tid", "want_rn"), "tid")
    assert j.filter(F.col("rn") != F.col("want_rn")).count() == 0
    assert got.select(F.max("n")).collect()[0][0] == len(vals)


@given(
    vals=st.lists(
        st.integers(min_value=-20, max_value=20), min_size=1, max_size=50
    ),
    k=st.integers(min_value=2, max_value=10),
)
@settings(**{**_SETTINGS, "max_examples": 6})
def test_ntile_buckets_matches_builtin_ntile(spark, vals, k):
    """relational.ntile_buckets must reproduce F.ntile(k) exactly for any
    multiset and bucket count (incl. n < k)."""
    from pyspark.sql import Window

    from financial_fraud_detection_using_time_series_data_spark.operators import relational

    pdf = pd.DataFrame({"tid": range(len(vals)), "v": [float(v) for v in vals]})
    df = spark.createDataFrame(pdf)
    got = relational.ntile_buckets(df, "v", k, "tid", out_col="b")
    want = df.withColumn("want_b", F.ntile(k).over(Window.orderBy("v", "tid")))
    j = got.join(want.select("tid", "want_b"), "tid")
    assert j.filter(F.col("b") != F.col("want_b")).count() == 0


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"), min_size=0, max_size=120
        ),
        min_size=1,
        max_size=8,
    ),
    chunk_tokens=st.integers(min_value=1, max_value=7),
)
@settings(**{**_SETTINGS, "max_examples": 8})
def test_chunk_documents_roundtrip(spark, texts, chunk_tokens):
    """Chunking must partition the token stream: re-joining a document's
    chunks in chunk_id order reproduces its normalized text exactly, and
    every chunk except possibly the last is full."""
    from financial_fraud_detection_using_time_series_data_spark.operators import text as T

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    out = T.chunk_documents(df, chunk_tokens=chunk_tokens).toPandas()
    for doc_id, want in enumerate(texts):
        norm = " ".join(want.split())
        got = out[out.doc_id == doc_id].sort_values("chunk_id")
        rejoined = " ".join(got.chunk_text)
        assert rejoined == norm, (doc_id, rejoined, norm)
        sizes = got.chunk_tokens.tolist()
        assert all(s == chunk_tokens for s in sizes[:-1])
        if sizes:
            assert 1 <= sizes[-1] <= chunk_tokens


@given(
    tokens=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=40),
    target=st.integers(min_value=1, max_value=12),
)
@settings(**{**_SETTINGS, "max_examples": 8})
def test_pack_chunks_invariants(spark, tokens, target):
    """Offset packing: pack_id non-decreasing in stream order, offsets in
    [0, target), and (pack_id, pack_offset) equals the exclusive prefix
    sum decomposition."""
    from financial_fraud_detection_using_time_series_data_spark.operators import text as T

    pdf = pd.DataFrame(
        {
            "doc_id": [i // 4 for i in range(len(tokens))],
            "chunk_id": [i % 4 for i in range(len(tokens))],
            "chunk_tokens": tokens,
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        T.pack_chunks(df, target_tokens=target)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    ecs = 0
    for _, row in out.iterrows():
        assert row.pack_id == ecs // target
        assert row.pack_offset == ecs % target
        ecs += row.chunk_tokens
    assert (out.pack_offset < target).all() and (out.pack_offset >= 0).all()


def test_ewma_matches_pandas(spark, sf_dir):
    """windows.ewma == pandas ewm(alpha, adjust=False).mean() wherever the
    truncation window covers the full history (rows beyond `lookback` may
    differ by the dropped ~1e-5 tail weight)."""
    from financial_fraud_detection_using_time_series_data_spark.operators import windows
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    got = (
        windows.ewma(ev, alpha=0.2, lookback=10_000)
        .toPandas()
        .set_index("event_id")["ewma"]
    )
    pdf = ev.select("event_id", "user_id", "ts", "value").toPandas()
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    want = (
        pdf.assign(
            ewma=pdf.groupby("user_id")["value"].transform(
                lambda s: s.ewm(alpha=0.2, adjust=False).mean()
            )
        )
        .set_index("event_id")["ewma"]
    )
    diff = (got - want).abs().max()
    assert diff < 1e-9, f"max |spark - pandas| = {diff}"


@given(
    snap_keys=st.sets(st.integers(0, 20), max_size=12),
    ops=st.lists(
        st.tuples(
            st.integers(0, 20),                  # key
            st.sampled_from(["U", "D", "I"]),    # op
            st.integers(0, 5),                   # seq
            st.integers(0, 999),                 # payload
        ),
        max_size=20,
        # duplicate (key, op, seq) with different payloads would make the
        # latest-wins tie arbitrary in BOTH implementations — exclude
        unique_by=lambda t: (t[0], t[1], t[2]),
    ),
)
@settings(**_SETTINGS)
def test_apply_cdc_matches_sequential_replay(spark, snap_keys, ops):
    """apply_cdc (latest-per-key + anti-join) must equal naively replaying
    the change log in (seq, op) order against a dict."""
    from financial_fraud_detection_using_time_series_data_spark.operators import relational

    snap = {k: f"base{k}" for k in snap_keys}
    state = dict(snap)
    # replay in the same total order apply_cdc resolves: per key, the
    # (seq desc, op desc) winner is applied; replay ascending is identical
    for k, op, seq, payload in sorted(ops, key=lambda t: (t[2], t[1])):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = f"v{payload}"
    snap_df = spark.createDataFrame(
        [(k, v) for k, v in snap.items()] or [(None, None)],
        "k int, v string",
    ).where(F.col("k").isNotNull())
    ch_df = spark.createDataFrame(
        [(k, f"v{p}" if op != "D" else None, op, s) for k, op, s, p in ops]
        or [(None, None, None, None)],
        "k int, v string, op string, seq int",
    ).where(F.col("k").isNotNull())
    out = {
        r["k"]: r["v"]
        for r in relational.apply_cdc(snap_df, ch_df, ["k"]).collect()
    }
    assert out == state


@given(
    vals=st.lists(finite_doubles, min_size=2, max_size=40),
    cut=st.integers(1, 39),
)
@settings(**_SETTINGS)
def test_merge_moments_any_split_matches_direct(spark, vals, cut):
    from financial_fraud_detection_using_time_series_data_spark.operators import relational

    cut = min(cut, len(vals) - 1)
    a_vals, b_vals = vals[:cut], vals[cut:]
    mk = lambda vs: spark.createDataFrame(
        [(1, round(v, 2)) for v in vs], "k int, value double"
    )
    a = relational.group_moments(mk(a_vals), ["k"])
    b = relational.group_moments(mk(b_vals), ["k"])
    merged = relational.merge_moments(a, b, ["k"]).collect()[0]
    direct = relational.group_moments(mk(vals), ["k"]).collect()[0]
    assert merged["n"] == direct["n"]
    assert abs(merged["mean"] - direct["mean"]) < 1e-6 * max(1.0, abs(direct["mean"]))
    scale = max(1.0, abs(direct["m2"]))
    assert abs(merged["m2"] - direct["m2"]) < 1e-6 * scale


# --- round-6 behavioral family ---------------------------------------------


@given(
    vals=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=-100, max_value=1000)
        .map(lambda v: round(v, 2)),
        min_size=1,
        max_size=50,
    ),
    n_chunks=st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_gini_matches_bruteforce_any_multiset(spark, vals, n_chunks):
    """Chunked gini == brute-force rank formula on the non-negative
    subset, for any value multiset (ties, negatives, zeros) and any
    chunk count."""
    from financial_fraud_detection_using_time_series_data_spark.operators import behavior

    pdf = pd.DataFrame(
        {"event_type": "g", "value": vals, "event_id": range(len(vals))}
    )
    df = spark.createDataFrame(pdf)
    out = behavior.gini(df, "event_type", "value", "event_id", n_chunks=n_chunks).collect()
    keep = sorted(v for v in vals if v >= 0)
    if not keep:
        assert out == []
        return
    r = out[0]
    assert r.n == len(keep)
    sx = sum(keep)
    if sx <= 0:
        assert r.gini is None
        return
    srx = sum((i + 1) * x for i, x in enumerate(keep))
    expected = 2.0 * srx / (len(keep) * sx) - (len(keep) + 1) / len(keep)
    assert abs(r.gini - expected) < 1e-9
    assert -1e-9 <= r.gini <= 1.0


@given(
    lifetimes=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 40)), min_size=1, max_size=25
    )
)
@settings(**_SETTINGS)
def test_survival_matches_bruteforce_km(spark, lifetimes):
    """survival_curve == a direct python Kaplan-Meier over the same
    per-entity (first_day, last_day) lifetimes, any censoring mix."""
    from datetime import datetime, timedelta

    from financial_fraud_detection_using_time_series_data_spark.operators import behavior

    t0 = datetime(2024, 1, 1)
    rows, eid = [], 0
    for u, (start, dur) in enumerate(lifetimes):
        for d in {start, start + dur}:
            rows.append((eid, t0 + timedelta(days=d), u, "a", 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r.day: r for r in behavior.survival_curve(df, churn_gap_days=7.0).collect()}

    end = max(s + d for s, d in lifetimes)
    per = [(d, 1 if (end - (s + d)) > 7 else 0) for s, d in lifetimes]
    days = sorted({d for d, _ in per})
    surv, prev = {}, 1.0
    for day in days:
        at_risk = sum(1 for d, _ in per if d >= day)
        events_n = sum(c for d, c in per if d == day)
        cens = sum(1 - c for d, c in per if d == day)
        s = 0.0 if events_n >= at_risk else prev * (1 - events_n / at_risk)
        surv[day] = (at_risk, events_n, cens, s)
        prev = s
    assert set(got) == set(surv)
    for day, (at_risk, events_n, cens, s) in surv.items():
        r = got[day]
        assert (r.n_at_risk, r.n_events, r.n_censored) == (at_risk, events_n, cens)
        assert abs(r.survival - s) < 1e-9


_iv = st.tuples(
    st.integers(min_value=0, max_value=5000),      # start second
    st.integers(min_value=1, max_value=4000),      # duration seconds
    st.integers(min_value=0, max_value=999999),    # start microseconds
)


@given(
    lvs=st.lists(_iv, min_size=1, max_size=12),
    rvs=st.lists(_iv, min_size=1, max_size=12),
)
@settings(**_SETTINGS)
def test_interval_overlap_join_matches_bruteforce(spark, lvs, rvs):
    """The bucketized equi-join must equal the all-pairs theta join for
    ANY interval sets — including sub-second overlaps, touching
    endpoints, and spans crossing many buckets."""
    from datetime import datetime, timedelta

    from financial_fraud_detection_using_time_series_data_spark.operators.relational import (
        interval_overlap_join,
    )

    t0 = datetime(2024, 1, 1)

    def mk(vals):
        return [
            (i, t0 + timedelta(seconds=s, microseconds=us),
             t0 + timedelta(seconds=s + d, microseconds=us))
            for i, (s, d, us) in enumerate(vals)
        ]

    lrows, rrows = mk(lvs), mk(rvs)
    left = spark.createDataFrame(lrows, "id long, start timestamp, end timestamp")
    right = spark.createDataFrame(rrows, "id long, start timestamp, end timestamp")
    got = {
        (r.l_id, r.r_id): r.overlap_seconds
        for r in interval_overlap_join(left, right, bucket_seconds=600).collect()
    }
    want = {}
    for li, ls, le in lrows:
        for ri, rs, re_ in rrows:
            if ls < re_ and rs < le:
                ov = (min(le, re_) - max(ls, rs)).total_seconds()
                want[(li, ri)] = ov
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


@given(
    days=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25)
)
@settings(**_SETTINGS)
def test_activity_streaks_matches_bruteforce(spark, days):
    from datetime import datetime, timedelta

    from financial_fraud_detection_using_time_series_data_spark.operators.behavior import (
        activity_streaks,
    )

    t0 = datetime(2024, 1, 1)
    rows = [(i, t0 + timedelta(days=d, seconds=i), 1, "a", 1.0)
            for i, d in enumerate(days)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = activity_streaks(df).collect()[0]
    uniq = sorted(set(days))
    runs, cur = [], 1
    for a, b in zip(uniq, uniq[1:]):
        if b == a + 1:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    assert r.total_active_days == len(uniq)
    assert r.n_streaks == len(runs)
    assert r.longest_streak_days == max(runs)


@given(
    pts=st.lists(
        st.tuples(st.integers(-20, 20), st.integers(-20, 20)),
        min_size=1,
        max_size=40,
    ),
    n_buckets=st.sampled_from([1, 2, 7, 64]),
)
@settings(**_SETTINGS)
def test_pareto_frontier_matches_bruteforce(spark, pts, n_buckets):
    """Bucket-pruned skyline == O(n^2) dominance scan for any point
    multiset (duplicates, collinear points, ties on either axis) and
    any bucket count."""
    from financial_fraud_detection_using_time_series_data_spark.operators import relational

    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id long, d1 double, d2 double",
    )
    out = relational.pareto_frontier(df, "d1", "d2", n_buckets=n_buckets).collect()
    got = sorted((r.d1, r.d2, r.id) for r in out)

    def dominated(q):
        return any(
            p[0] >= q[0] and p[1] >= q[1] and (p[0] > q[0] or p[1] > q[1])
            for p in pts
        )

    expect = sorted(
        (float(x), float(y), i)
        for i, (x, y) in enumerate(pts)
        if not dominated((x, y))
    )
    assert got == expect


@given(
    keys=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=6), min_size=1, max_size=30
    ),
    window=st.sampled_from([2, 3, 5]),
    n_chunks=st.sampled_from([1, 4, 32]),
)
@settings(**_SETTINGS)
def test_sorted_neighborhood_matches_bruteforce(spark, keys, window, n_chunks):
    """Chunked-rank SNM == brute-force sort + slide for any key multiset
    (duplicates, empty strings, ties past the 4-char proxy) and any
    chunk count."""
    from financial_fraud_detection_using_time_series_data_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "doc_id long, k string"
    )
    out = dedup.sorted_neighborhood_pairs(
        df, F.col("k"), id_col="doc_id", window=window, n_chunks=n_chunks
    ).collect()
    got = sorted((r.id_a, r.id_b, r.dist) for r in out)
    order = sorted(range(len(keys)), key=lambda i: (keys[i], i))
    expect = sorted(
        (order[i], order[i + d], d)
        for i in range(len(order))
        for d in range(1, window)
        if i + d < len(order)
    )
    assert got == expect


@given(
    dim_events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=12
    ),
    facts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-5, 55)), min_size=1, max_size=12
    ),
)
@settings(**_SETTINGS)
def test_pit_join_matches_bruteforce_property(spark, dim_events, facts):
    """Union+carry PIT join == per-fact linear scan for any version/fact
    multiset, including same-instant versions (higher version wins),
    facts before any version, and entities with no versions at all."""
    from datetime import datetime, timedelta

    from financial_fraud_detection_using_time_series_data_spark.operators import relational

    base = datetime(2024, 1, 1)
    # build versioned dim: per entity, versions numbered in (t, insert) order
    dim_rows = []
    per_entity = {}
    for ent, t in sorted(dim_events, key=lambda x: (x[0], x[1])):
        v = per_entity.get(ent, 0) + 1
        per_entity[ent] = v
        dim_rows.append((ent, base + timedelta(minutes=t), v, f"a{ent}v{v}"))
    fact_rows = [
        (i, ent, base + timedelta(minutes=t)) for i, (ent, t) in enumerate(facts)
    ]
    dim = spark.createDataFrame(
        dim_rows, "user_id long, valid_from timestamp, version int, attr string"
    ) if dim_rows else spark.createDataFrame(
        [], "user_id long, valid_from timestamp, version int, attr string"
    )
    fdf = spark.createDataFrame(fact_rows, "event_id long, user_id long, ts timestamp")
    out = {
        r.event_id: r.attr
        for r in relational.point_in_time_join(
            fdf, dim, "user_id", "ts",
            fact_cols=["event_id", "user_id"],
            attr_cols=["attr"],
            dim_order_cols=("version",),
        ).collect()
    }
    for i, (ent, t) in enumerate(facts):
        cands = [
            (vf, v, a) for (e, vf, v, a) in dim_rows
            if e == ent and vf <= base + timedelta(minutes=t)
        ]
        expect = max(cands)[2] if cands else None
        assert out[i] == expect, (i, ent, t)
    assert len(out) == len(facts)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    ),
    cap=st.sampled_from([2, 5, 100]),
)
@settings(**_SETTINGS)
def test_adamic_adar_matches_bruteforce_property(spark, edges, cap):
    """Hub-capped Adamic-Adar == brute force for any small graph and
    any wedge-degree cap (including caps that silence every node)."""
    import itertools
    import math

    from financial_fraud_detection_using_time_series_data_spark.operators import events

    norm = sorted({(min(a, b), max(a, b)) for a, b in edges})
    df = spark.createDataFrame(norm, "u long, v long")
    out = {
        (r.u, r.v): (r.n_common, r.aa_score)
        for r in events.adamic_adar(df, max_wedge_degree=cap).collect()
    }
    adj = {}
    for a, b in norm:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    for u, v in itertools.combinations(sorted(adj), 2):
        if v in adj[u]:
            continue
        common = [w for w in adj[u] & adj[v] if len(adj[w]) <= cap]
        if common:
            expect[(u, v)] = (
                len(common),
                sum(1.0 / math.log(len(adj[w])) for w in common),
            )
    assert set(out) == set(expect)
    for key, (nc, sc) in expect.items():
        assert out[key][0] == nc
        assert out[key][1] == pytest.approx(sc, rel=1e-9)


@given(
    minutes=st.lists(st.integers(0, 10_000), min_size=2, max_size=40, unique=True),
    n_folds=st.sampled_from([2, 3, 5]),
)
@settings(**_SETTINGS)
def test_walk_forward_matches_bruteforce_property(spark, minutes, n_folds):
    """Bucket assignment, fold membership, and the leakage invariant vs
    a direct python evaluation for arbitrary timestamp multisets."""
    from datetime import datetime, timedelta

    from financial_fraud_detection_using_time_series_data_spark.operators import relational

    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(minutes=m)) for i, m in enumerate(minutes)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = relational.walk_forward_splits(df, "ts", n_folds=n_folds).collect()

    lo, hi = min(minutes) * 60, max(minutes) * 60
    nb = n_folds + 1
    width = (hi - lo + 1) / nb

    def bucket(m):
        return min(int((m * 60 - lo) // width), nb - 1)

    expect = set()
    for i, m in enumerate(minutes):
        b = bucket(m)
        for fold in range(b + 1, n_folds + 1):
            expect.add((i, fold, "train"))
        if 1 <= b <= n_folds:
            expect.add((i, b, "test"))
    got = {(r.id, r.fold, r.role) for r in out}
    assert got == expect
    # leakage invariant re-checked from the output itself
    ts = dict(rows)
    for fold in range(1, n_folds + 1):
        tr = [ts[i] for i, f, r in got if f == fold and r == "train"]
        te = [ts[i] for i, f, r in got if f == fold and r == "test"]
        if tr and te:
            assert max(tr) < min(te)
