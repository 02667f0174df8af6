"""Degenerate-LSH-bucket guard: a mass-duplicated corpus (the common
web-corpus pathology — one boilerplate page × tens of thousands of
copies) lands ~everything in ONE (band, signature) bucket. Uncapped,
the within-bucket all-pairs stage is O(B²): 45k dups → ~10⁹ candidate
pairs. These tests plant exactly that corpus and pin the capped
behavior: bounded pair counts, preserved hub connectivity (so
connected-component dedup still collapses the whole bucket), and an
auditable dropped-pair census.
"""

import time

from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import dedup

N_DUPS = 50_000
N_UNIQUE = 2_000
CAP = 64


def _planted_corpus(spark):
    """N_DUPS copies of one boilerplate doc + N_UNIQUE distinct docs."""
    boiler = (
        spark.range(N_DUPS)
        .select(
            F.col("id").alias("doc_id"),
            F.lit(
                "This site uses cookies to improve your experience. "
                "By continuing you accept our terms and privacy policy."
            ).alias("text"),
        )
    )
    unique = spark.range(N_DUPS, N_DUPS + N_UNIQUE).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("entirely distinct document number "),
            F.col("id").cast("string"),
            F.lit(" with its own payload "),
            F.sha2(F.col("id").cast("string"), 256),
        ).alias("text"),
    )
    return boiler.unionByName(unique)


def test_minhash_degenerate_bucket_bounded(spark):
    docs = _planted_corpus(spark)
    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(docs, max_bucket_size=CAP)
    n_pairs = pairs.count()
    elapsed = time.perf_counter() - t0
    # uncapped would be ~C(50k,2)·bands ≈ 2.5e9 pairs; the cap bounds it
    # to star (B-1 per band) + exact block C(cap,2) per band + unique-doc
    # noise — linear in corpus size
    bound = 2 * (N_DUPS + N_UNIQUE) + 2 * CAP * CAP
    assert n_pairs <= bound, f"{n_pairs} pairs exceeds linear bound {bound}"
    assert elapsed < 120, f"degenerate bucket took {elapsed:.0f}s"
    # connectivity: every duplicate doc must be reachable from the hub so
    # cluster-collapse still dedups the whole boilerplate family
    touched = (
        pairs.select(F.col("id_a").alias("d"))
        .unionByName(pairs.select(F.col("id_b").alias("d")))
        .filter(F.col("d") < N_DUPS)
        .distinct()
        .count()
    )
    assert touched == N_DUPS


def test_minhash_degenerate_bucket_stats(spark):
    docs = _planted_corpus(spark)
    stats = dedup.lsh_bucket_stats(docs, max_bucket_size=CAP).collect()
    assert len(stats) == 2  # default bands=2
    for r in stats:
        assert r.max_bucket >= N_DUPS  # the planted bucket is visible
        assert r.oversized_buckets >= 1
        # census must report the quadratic mass the cap dropped
        assert r.dropped_pairs > N_DUPS * (N_DUPS - 1) / 4


def test_embedding_degenerate_bucket_bounded(spark):
    """5k identical vectors → one (band, sig) bucket per band; the capped
    verify must emit ≤ head-block + star pairs, never the full C(n,2)."""
    import numpy as np
    import pandas as pd

    n, cap = 5_000, 32
    vec = np.arange(64).astype("float32")
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"), "embedding": [vec] * n}
    )
    emb = spark.createDataFrame(pdf)
    out = dedup.embedding_near_dup_lsh(
        emb, dim=64, threshold=0.4, max_bucket_size=cap
    )
    n_pairs = out.count()
    # per band: C(cap,2) head pairs + (n-cap)·cap star pairs; cross-band
    # dedup collapses to one copy. Full all-pairs would be ~12.5M.
    bound = cap * (cap - 1) // 2 + (n - cap) * cap
    assert 0 < n_pairs <= bound, f"{n_pairs} vs bound {bound}"
    # hub connectivity: every vector appears in some pair
    touched = (
        out.select(F.col("id_a").alias("d"))
        .unionByName(out.select(F.col("id_b").alias("d")))
        .distinct()
        .count()
    )
    assert touched == n
