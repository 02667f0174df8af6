"""Lexical retrieval / collocation mining: semantics + plan shape.

Oracle parity for the queries() entries is covered by test_oracle_parity;
these pin ranking semantics (idf weighting, multi-term coverage) and the
broadcast plan contract.
"""

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
