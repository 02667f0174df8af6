"""Product-quantization ANN (pq_train / pq_encode / pq_topk): recall
contract vs exact cosine top-k, the identical-vector guarantee, and the
map-only plan shape of the encode step."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import similarity
from financial_fraud_detection_using_time_series_data_spark.sources import load_table


def test_pq_recall_floor(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = {
        (r.qid, r.vec_id)
        for r in similarity.brute_force_topk(emb, qs, k=5).collect()
    }
    books = similarity.pq_train(emb, dim=64, m=16, ksub=32, n_iter=2)
    got = {
        (r.qid, r.vec_id)
        for r in similarity.pq_topk(emb, qs, books, k=5).collect()
    }
    recall = len(got & exact) / len(exact)
    # 64-bit codes on unstructured vectors: measured 0.46; floor with margin
    assert recall >= 0.3, f"recall {recall:.2f}"


def test_pq_identical_vectors_share_codes_and_rank_first(spark):
    """Quantization is deterministic per vector, so exact duplicates get
    identical codes and reconstruct to the query's own code vector — the
    duplicate must come back at rank 1."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16)).astype("float64")
    dup = base[5].copy()
    vecs = np.vstack([base, dup[None, :]])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype="int64"), "embedding": list(vecs)}
    )
    emb = spark.createDataFrame(pdf)
    books = similarity.pq_train(emb, dim=16, m=4, ksub=8, n_iter=2)

    codes = {r.vec_id: list(r.codes) for r in similarity.pq_encode(emb, books).collect()}
    assert codes[5] == codes[40]

    qs = emb.filter(F.col("vec_id") == 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    top = similarity.pq_topk(emb, qs, books, k=1).collect()
    assert len(top) == 1 and top[0].vec_id == 40


def test_pq_encode_plan_is_map_only(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = similarity.pq_train(emb, dim=64, m=4, ksub=8, n_iter=1)
    plan = similarity.pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
