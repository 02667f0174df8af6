"""Round-7 batch 3: neighbor-Jaccard, Kalman filter, PACF, SPRT,
Wasserstein drift, Markov attribution, Fellegi-Sunter EM — closed-form
fixtures and statistical-recovery checks."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import (
    drift,
    evaluation,
    events as events_ops,
    forecast,
    linkage,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def test_neighbor_jaccard_triangle_plus_pendant(spark):
    """Graph: 1-2, 1-3, 2-3 triangle plus pendant 3-4. Non-adjacent
    pairs with a common neighbor: (1,4) and (2,4) via 3.
    deg: 1->2, 2->2, 3->3, 4->1. J(1,4) = 1/(2+1-1) = 0.5."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "u long, v long"
    )
    out = {(r["u"], r["v"]): r for r in events_ops.neighbor_jaccard(edges).collect()}
    assert set(out) == {(1, 4), (2, 4)}
    assert out[(1, 4)]["jaccard"] == pytest.approx(0.5)
    assert out[(1, 4)]["n_common"] == 1
    assert out[(1, 4)]["deg_u"] == 2 and out[(1, 4)]["deg_v"] == 1


def test_kalman_constant_series_locks_on(spark):
    rows = [(i, dt.datetime(2024, 1, 1 + i), 1, "view", 42.0) for i in range(20)]
    out = forecast.kalman_filter(_ev(spark, rows)).orderBy("step").collect()
    assert all(r["level"] == pytest.approx(42.0) for r in out)


def test_kalman_two_step_closed_form(spark):
    rows = [
        (0, dt.datetime(2024, 1, 1), 1, "view", 10.0),
        (1, dt.datetime(2024, 1, 2), 1, "view", 20.0),
    ]
    out = forecast.kalman_filter(_ev(spark, rows), q=0.05, r=0.5, p0=1.0)
    lv = {r["step"]: r["level"] for r in out.collect()}
    k = (1.0 + 0.05) / (1.0 + 0.05 + 0.5)
    assert lv[1] == 10.0
    assert lv[2] == pytest.approx(10.0 + k * 10.0)


def test_pacf_ar1_cuts_off_after_lag1(spark):
    """AR(1) x_t = 0.7 x_{t-1} + e_t (deterministic pseudo-noise):
    PACF(1) ≈ 0.7, |PACF(k>1)| small."""
    x = 0.0
    rows = []
    for i in range(600):
        e = math.sin(i * 12.9898) * 43758.5453
        e = (e - math.floor(e)) - 0.5  # hash-noise in [-0.5, 0.5)
        x = 0.7 * x + e
        rows.append((i, _ts(i), 1, "view", x + 10.0))
    out = {
        r["lag"]: r["pacf"]
        for r in drift.pacf(_ev(spark, rows), max_lag=5).collect()
    }
    assert out[1] == pytest.approx(0.7, abs=0.12)
    assert all(abs(out[k]) < 0.2 for k in (3, 4, 5))


def test_sprt_accepts_h1_on_high_rate_and_is_sticky(spark):
    rows = []
    for d in range(30):
        for i in range(100):
            # 40% success, well above H1's 22%
            rows.append(
                (d * 100 + i, dt.datetime(2024, 1, 1 + d, i % 24), 1,
                 "purchase" if i % 5 < 2 else "view", 1.0)
            )
    ev = _ev(spark, rows).select(
        "ts", (F.col("event_type") == "purchase").cast("int").alias("success")
    )
    out = evaluation.sprt_decision(ev, "ts", "success", 0.18, 0.22).orderBy("bucket").collect()
    verdicts = [r["verdict"] for r in out]
    assert verdicts[-1] == "accept_h1"
    first = verdicts.index("accept_h1")
    assert all(v == "accept_h1" for v in verdicts[first:])  # sticky
    assert all(v == "continue" for v in verdicts[:first])


def test_sprt_verdict_frozen_at_first_crossing(spark):
    """Round-8 fix: an LLR that first crosses the LOW boundary and later
    swings through the HIGH one must stay accept_h0 from the first
    crossing on — the test stopped there; later data can't reopen it."""
    rows = []
    eid = 0
    # 10 days of 0% success: LLR dives through the low boundary fast
    for d in range(10):
        for i in range(200):
            rows.append((eid, dt.datetime(2024, 1, 1 + d, i % 24), 1, "view", 1.0))
            eid += 1
    # then 20 days of 100% success: cumulative LLR recovers and would
    # cross the high boundary if later data could reopen the test
    for d in range(10, 30):
        for i in range(200):
            rows.append((eid, dt.datetime(2024, 1, 1 + d, i % 24), 1, "purchase", 1.0))
            eid += 1
    ev = _ev(spark, rows).select(
        "ts", (F.col("event_type") == "purchase").cast("int").alias("success")
    )
    out = (
        evaluation.sprt_decision(ev, "ts", "success", 0.18, 0.22)
        .orderBy("bucket")
        .collect()
    )
    verdicts = [r["verdict"] for r in out]
    assert "accept_h0" in verdicts
    first = verdicts.index("accept_h0")
    # sanity: the raw LLR really does cross the high boundary later
    hi = math.log(0.8 / 0.05)
    assert any(r["llr"] >= hi for r in out[first:])
    # ...but the verdict stays frozen at the first crossing's decision
    assert all(v == "accept_h0" for v in verdicts[first:])
    assert all(v == "continue" for v in verdicts[:first])


def test_wasserstein_shift_beats_identical(spark):
    base = [(i, _ts(i), 1, "view", float(i % 100)) for i in range(2000)]
    ref = _ev(spark, base)
    same = _ev(spark, base)
    shifted = _ev(spark, [(i, _ts(i), 1, "view", float(i % 100) + 30.0) for i in range(2000)])
    w_same = (
        drift.wasserstein_bins(ref, same, "value", 10)
        .agg(F.sum("w1_term")).collect()[0][0]
    )
    w_shift = (
        drift.wasserstein_bins(ref, shifted, "value", 10)
        .agg(F.sum("w1_term")).collect()[0][0]
    )
    assert w_same == pytest.approx(0.0, abs=1e-9)
    assert w_shift > 1.0


def test_attribution_markov_credits_the_converting_channel(spark):
    """Journeys: 'click' always precedes purchase; 'error' never leads
    anywhere. Removing click should kill most conversion probability."""
    rows = []
    eid = 0
    for u in range(30):
        rows.append((eid, _ts(eid), u, "view", 1.0)); eid += 1
        rows.append((eid, _ts(eid), u, "click", 1.0)); eid += 1
        rows.append((eid, _ts(eid), u, "purchase", 1.0)); eid += 1
    for u in range(30, 60):
        rows.append((eid, _ts(eid), u, "view", 1.0)); eid += 1
        rows.append((eid, _ts(eid), u, "error", 1.0)); eid += 1
    out = {r["channel"]: r for r in events_ops.attribution_markov(_ev(spark, rows)).collect()}
    assert out["click"]["attribution"] > 0.4
    assert out["click"]["attribution"] > out["error"]["attribution"]
    assert out["click"]["p_conv_base"] == pytest.approx(0.5, abs=0.05)


def test_em_weights_recovers_match_structure(spark):
    """Planted pairs: 30 'true matches' agree on both fields, 300
    random pairs agree on neither; EM should learn m >> u for both
    fields and a small lambda."""
    import pandas as pd

    rows = []
    for i in range(30):
        rows.append((1, 1))
    for i in range(300):
        rows.append((0, 0))
    for i in range(20):
        rows.append((1, 0))
    pdf = pd.DataFrame(rows, columns=["a1", "a2"])
    pairs = spark.createDataFrame(pdf)
    comps = [
        linkage.FieldComparison("f1", F.col("a1") == 1, m=0.8, u=0.1),
        linkage.FieldComparison("f2", F.col("a2") == 1, m=0.8, u=0.1),
    ]
    out = {r["field"]: r for r in linkage.em_weights(pairs, comps).collect()}
    assert out["f2"]["m"] > 0.5 > out["f2"]["u"]
    assert out["f1"]["w_agree"] > 0
    # determinism: rerun is bit-identical
    out2 = {r["field"]: r for r in linkage.em_weights(pairs, comps).collect()}
    assert all(out[k] == out2[k] for k in out)


def test_bootstrap_auc_brackets_point_estimate(spark):
    """Replicate AUCs must scatter around the full-sample AUC and a
    perfect separator must bootstrap to 1.0 in every replicate."""
    rows = []
    for i in range(400):
        lab = 1 if i % 4 == 0 else 0
        score = 0.9 if lab else 0.1  # perfectly separable
        rows.append((i, lab, score))
    df = spark.createDataFrame(rows, "event_id long, label int, score double")
    out = evaluation.bootstrap_auc(df, "label", "score", "event_id", reps=8).collect()
    assert len(out) == 8
    assert all(r["auc"] == pytest.approx(1.0) for r in out)
    # noisy separator: replicates straddle the point estimate
    rows2 = [
        (i, 1 if i % 4 == 0 else 0, ((i * 37) % 100) / 100.0 + (0.3 if i % 4 == 0 else 0.0))
        for i in range(2000)
    ]
    df2 = spark.createDataFrame(rows2, "event_id long, label int, score double")
    point = evaluation.roc_auc(df2, "label", "score").collect()[0][0]
    reps = [r["auc"] for r in evaluation.bootstrap_auc(df2, "label", "score", "event_id", reps=16).collect()]
    assert min(reps) < point < max(reps)
    spread = max(reps) - min(reps)
    assert 0.001 < spread < 0.2


def test_containment_catches_subset_doc(spark):
    """Doc B = doc A's text verbatim plus a long suffix: Jaccard is
    diluted but containment(A in B) = 1.0."""
    from financial_fraud_detection_using_time_series_data_spark.operators import text as T

    a_text = "alpha beta gamma delta epsilon zeta"
    b_text = a_text + " " + " ".join(f"filler{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, a_text), (2, b_text), (3, "totally different words here now")],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r for r in T.containment_pairs(docs, min_containment=0.5).collect()}
    assert (1, 2) in out
    assert out[(1, 2)]["contain_a_in_b"] == pytest.approx(1.0)
    assert out[(1, 2)]["contain_b_in_a"] < 0.2
    assert (1, 3) not in out


def test_zipf_slope_recovers_power_law(spark):
    """Corpus where term k appears ~C/k times: slope ≈ -1."""
    from financial_fraud_detection_using_time_series_data_spark.operators import text as T

    words = []
    for k in range(1, 201):
        words += [f"w{k:03d}"] * max(2000 // k, 1)
    docs = spark.createDataFrame(
        [(i, " ".join(words[i::50])) for i in range(50)], "doc_id long, text string"
    )
    out = T.zipf_slope(docs, top_v=200).collect()[0]
    assert out["slope"] == pytest.approx(-1.0, abs=0.1)
    assert out["n_terms"] == 200


def test_grouped_auc_matches_global_on_one_segment(spark):
    rows = [(i, 1 if i % 4 == 0 else 0, ((i * 37) % 100) / 100.0 + (0.3 if i % 4 == 0 else 0.0), 0)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "event_id long, label int, score double, seg int")
    g = evaluation.grouped_auc(df, "seg", "label", "score").collect()
    # grouped_auc is defined on the 1e-6 score grid; compare against the
    # exact rank AUC of the SAME quantized scores
    dq = df.select(
        "label", F.floor(F.col("score") * 1e6 + 0.5).alias("score")
    )
    point = evaluation.roc_auc(dq, "label", "score").collect()[0][0]
    assert len(g) == 1
    assert g[0]["auc"] == pytest.approx(point, abs=1e-6)
    # single-class segment -> NULL auc
    df2 = spark.createDataFrame(
        [(i, 1, 0.5, 9) for i in range(10)], "event_id long, label int, score double, seg int"
    )
    g2 = evaluation.grouped_auc(df2, "seg", "label", "score").collect()
    assert g2[0]["auc"] is None


def test_platt_scaling_recovers_sigmoid(spark):
    """Labels generated from σ(3s - 1.5) thresholded deterministically:
    the fitted curve must be increasing in s and cut ~0.5 near s=0.5."""
    import math as m

    rows = []
    for i in range(4000):
        s = (i % 100) / 100.0
        p = 1.0 / (1.0 + m.exp(-(3.0 * s - 1.5)))
        u = ((i * 2654435761) % 2**32) / 2**32
        rows.append((i, 1 if u < p else 0, s))
    df = spark.createDataFrame(rows, "event_id long, label int, score double")
    (a, b), diag = evaluation.platt_scaling(df, "label", "score")
    assert 2.0 < a < 4.5
    assert -2.5 < b < -0.8
    d = diag.collect()[0]
    assert d["log_loss"] < 0.7
    # determinism
    (a2, b2), _ = evaluation.platt_scaling(df, "label", "score")
    assert (a, b) == (a2, b2)


def test_attribution_markov_instant_conversions_count(spark):
    """Journeys whose FIRST event is the purchase must credit the
    baseline conversion probability (START->CONV), not invent a
    pseudo-channel."""
    rows = []
    eid = 0
    for u in range(10):  # instant converters
        rows.append((eid, _ts(eid), u, "purchase", 1.0)); eid += 1
    for u in range(10, 20):  # click -> purchase
        rows.append((eid, _ts(eid), u, "click", 1.0)); eid += 1
        rows.append((eid, _ts(eid), u, "purchase", 1.0)); eid += 1
    out = events_ops.attribution_markov(_ev(spark, rows)).collect()
    chans = {r["channel"] for r in out}
    assert "purchase" not in chans and chans == {"click"}
    r = out[0]
    # 20 journeys, all convert -> baseline 1.0; removing click still
    # leaves the 10 instant conversions -> removal effect = 0.5
    assert r["p_conv_base"] == pytest.approx(1.0)
    assert r["removal_effect"] == pytest.approx(0.5, abs=1e-9)


def test_attribution_markov_channel_cap_raises(spark):
    """Round-8 guard: a pathological channel cardinality (IDs leaking
    into event_type) must raise, not wedge the driver in the O(k^3)
    removal re-solve loop."""
    rows = []
    eid = 0
    for u in range(8):
        rows.append((eid, _ts(eid), u, f"ch_{u}", 1.0)); eid += 1
        rows.append((eid, _ts(eid), u, "purchase", 1.0)); eid += 1
    # 8 distinct channels, cap at 4 -> clear error naming the knob
    with pytest.raises(ValueError, match="max_channels"):
        events_ops.attribution_markov(_ev(spark, rows), max_channels=4)
    # at the default cap the same input solves fine (numpy path)
    out = events_ops.attribution_markov(_ev(spark, rows)).collect()
    assert len(out) == 8
    assert all(r["p_conv_base"] == pytest.approx(1.0) for r in out)
