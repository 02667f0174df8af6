"""Lexical retrieval / collocation mining: semantics + plan shape.

Oracle parity for the queries() entries is covered by test_oracle_parity;
these pin ranking semantics (idf weighting, multi-term coverage) and the
broadcast plan contract.
"""

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import text


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bm25_rare_term_outranks_common(spark):
    # "rare" appears in 1 of 6 docs, "common" in 5 of 6; both target docs
    # have identical length, so idf decides.
    df = _docs(
        spark,
        [
            "rare pad pad pad",
            "common pad pad pad",
            "common x", "common y", "common z", "common w",
        ],
    )
    out = text.bm25_search(df, ["rare", "common"], n=6).collect()
    scores = {r.doc_id: r.score for r in out}
    assert scores[0] > scores[1]


def test_bm25_more_matched_terms_rank_higher(spark):
    df = _docs(
        spark,
        ["alpha beta pad", "alpha pad pad", "pad pad pad", "other doc here"],
    )
    out = text.bm25_search(df, ["alpha", "beta"], n=4).collect()
    assert out[0].doc_id == 0 and out[0].n_terms_matched == 2
    assert {r.doc_id for r in out} == {0, 1}  # non-matching docs excluded


def test_bm25_df_dimension_is_broadcast(spark, sf_dir):
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = text.bm25_search(docs, ["spark", "join"], n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_pmi_perfect_pair_beats_partial(spark):
    import math

    # N=30: 'a b' always co-occur (n_a=n_b=n_ab=10 → pmi=ln 3);
    # 'c d' co-occur in 5 while each appears in 10 → pmi=ln 1.5.
    texts = ["a b"] * 10 + ["c d"] * 5 + ["c x"] * 5 + ["d y"] * 5 + ["z z"] * 5
    df = _docs(spark, texts)
    out = text.token_pmi(df, min_pairs=5, top=50).collect()
    pmi = {(r.term_a, r.term_b): r.pmi for r in out}
    assert abs(pmi[("a", "b")] - math.log(3.0)) < 1e-9
    assert abs(pmi[("c", "d")] - math.log(1.5)) < 1e-9
    assert pmi[("a", "b")] > pmi[("c", "d")]


def test_pmi_min_support_filters(spark):
    texts = ["p q"] * 4 + ["lone r"] * 6
    df = _docs(spark, texts)
    out = text.token_pmi(df, min_pairs=5, top=50).collect()
    assert ("p", "q") not in {(r.term_a, r.term_b) for r in out}


def test_hybrid_rrf_fuses_both_modalities(spark, sf_dir):
    from financial_fraud_detection_using_time_series_data_spark.operators import text
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    out = text.hybrid_search_rrf(
        docs, embs, ["spark", "join", "window"], query_vec_id=0, n=10
    ).collect()
    assert len(out) == 10
    # ranks are dense 1..10 and scores non-increasing
    assert [r["rank"] for r in out] == list(range(1, 11))
    scores = [r["rrf_score"] for r in out]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    # a doc present in BOTH lists must outrank one present in only one
    # list at similar single-list rank (RRF additivity sanity)
    both = [r for r in out if r["lex_rank"] and r["sem_rank"]]
    for r in both:
        assert r["rrf_score"] > 1.0 / (60 + max(r["lex_rank"], r["sem_rank"]))


def test_hybrid_rrf_deterministic(spark, sf_dir):
    from financial_fraud_detection_using_time_series_data_spark.operators import text
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    a = text.hybrid_search_rrf(docs, embs, ["spark"], 0).collect()
    b = text.hybrid_search_rrf(docs, embs, ["spark"], 0).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


# --- mmr_rerank --------------------------------------------------------------


def test_mmr_matches_reference_greedy(spark):
    import numpy as np

    from financial_fraud_detection_using_time_series_data_spark.operators import similarity

    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(30, 8)).round(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.filter("vec_id < 2").selectExpr("vec_id as qid", "embedding")
    out = similarity.mmr_rerank(corpus, queries, k=5, pool=10, lam=0.6).collect()
    got = {}
    for r in out:
        got.setdefault(r.qid, []).append((r.mmr_rank, r.vec_id, r.cos_sim, r.mmr_score))

    def r6(x):
        import math
        return math.floor(x * 1e6 + 0.5) / 1e6

    def cos(a, b):
        d = float(np.dot(a, b))
        return d / (np.linalg.norm(a) * np.linalg.norm(b))

    for qid in (0, 1):
        qv = vecs[qid]
        scored = sorted(
            ((r6(cos(vecs[i], qv)), -i) for i in range(30) if i != qid), reverse=True
        )
        cand = sorted(-i for _, i in scored[:10])
        rel = {i: r6(cos(vecs[i], qv)) for i in cand}
        Vn = {i: vecs[i] / np.linalg.norm(vecs[i]) for i in cand}
        chosen, max_sim, expect = [], {i: -np.inf for i in cand}, []
        for rank in range(1, 6):
            best, best_s = None, -np.inf
            for i in cand:
                if i in chosen:
                    continue
                s = 0.6 * rel[i] - (0.0 if not chosen else 0.4 * max_sim[i])
                if s > best_s:
                    best, best_s = i, s
            chosen.append(best)
            expect.append((rank, best, rel[best], best_s))
            for i in cand:
                max_sim[i] = max(max_sim[i], float(Vn[i] @ Vn[best]))
        rows = sorted(got[qid])
        for (rk, vid, cs, ms), (erk, evid, ecs, ems) in zip(rows, expect):
            assert (rk, vid) == (erk, evid), (qid, rk)
            assert cs == pytest.approx(ecs, abs=1e-12)
            assert ms == pytest.approx(ems, rel=1e-9)


def test_mmr_diversifies_clones(spark):
    """Corpus with 3 near-identical top docs: plain top-3 returns the
    clones; MMR with strong diversity picks one clone then moves on."""
    import numpy as np

    from financial_fraud_detection_using_time_series_data_spark.operators import similarity

    base = np.array([1.0, 0.0, 0.0, 0.0])
    rows = [
        (10, [1.0, 0.001, 0.0, 0.0]),
        (11, [1.0, 0.002, 0.0, 0.0]),
        (12, [1.0, 0.003, 0.0, 0.0]),
        (20, [0.8, 0.6, 0.0, 0.0]),
        (21, [0.8, 0.0, 0.6, 0.0]),
        (99, [1.0, 0.0, 0.0, 0.0]),
    ]
    corpus = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    queries = corpus.filter("vec_id = 99").selectExpr("vec_id as qid", "embedding")
    out = sorted(
        (r.mmr_rank, r.vec_id)
        for r in similarity.mmr_rerank(corpus, queries, k=3, pool=5, lam=0.3).collect()
    )
    picked = [v for _, v in out]
    assert picked[0] == 10                     # best clone first
    assert len(set(picked) & {10, 11, 12}) == 1  # but only ONE clone survives
    assert set(picked[1:]) == {20, 21}


# --- topk_recall -------------------------------------------------------------


def test_topk_recall_counts(spark):
    from financial_fraud_detection_using_time_series_data_spark.operators import similarity

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)], "qid long, vec_id long"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (1, 12), (2, 77), (2, 78)], "qid long, vec_id long"
    )
    rows = {r.qid: r for r in similarity.topk_recall(exact, approx, k=3).collect()}
    assert rows[1].n_hit == 2 and rows[1].n_exact == 3
    assert rows[1].recall_at_k == pytest.approx(2 / 3)
    assert rows[2].n_hit == 0 and rows[2].recall_at_k == 0.0
    assert rows[-1].n_exact == 5 and rows[-1].n_hit == 2
    assert rows[-1].recall_at_k == pytest.approx(2 / 5)


def test_group_sample_exact_properties(spark):
    from financial_fraud_detection_using_time_series_data_spark.operators import text as T

    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(100)], "doc_id long, source string"
    )
    out = T.group_sample_exact(df, "source", k=5, id_col="doc_id")
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, set()).add(r.doc_id)
    assert all(len(v) == 5 for v in per.values())
    # deterministic: identical second draw; different salt -> different set
    again = {(r.source, r.doc_id) for r in T.group_sample_exact(df, "source", k=5, id_col="doc_id").collect()}
    assert again == {(r.source, r.doc_id) for r in rows}
    other = {(r.source, r.doc_id) for r in T.group_sample_exact(df, "source", k=5, id_col="doc_id", salt="other").collect()}
    assert other != again
    # small groups keep all members
    tiny = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, source string")
    assert T.group_sample_exact(tiny, "source", k=5, id_col="doc_id").count() == 2
