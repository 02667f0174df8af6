"""Training-export operators: deterministic sharding and mixture
sampling (data-mixing) semantics."""

from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import text
from financial_fraud_detection_using_time_series_data_spark.sources import load_table


def test_shard_assign_deterministic_and_dense(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = text.shard_assign(docs, n_shards=4, order_col="n_chars")
    b = text.shard_assign(docs, n_shards=4, order_col="n_chars")
    assert a.select("doc_id", "shard", "shard_pos").exceptAll(
        b.select("doc_id", "shard", "shard_pos")
    ).count() == 0
    # positions are dense 1..n within every shard
    per = (
        a.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("shard_pos").alias("mx"),
            F.min("shard_pos").alias("mn"),
            F.countDistinct("shard_pos").alias("nd"),
        )
        .collect()
    )
    assert len(per) == 4
    for r in per:
        assert r.mn == 1 and r.mx == r.n and r.nd == r.n


def test_mixture_sample_budget_and_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    budget = 10_000
    out = text.mixture_sample(
        docs,
        weights={"src0": 0.6, "src1": 0.4},
        budget_tokens=budget,
        salt="t",
    ).cache()
    kept_sources = {r.source for r in out.select("source").distinct().collect()}
    # unweighted sources are dropped entirely
    assert kept_sources <= {"src0", "src1"}
    # kept tokens per source stay at or under the allocation, up to the
    # granularity of whole documents (one doc of slack)
    per = {
        r.source: r.tok
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    max_doc = out.agg(F.max("n_tokens")).collect()[0][0]
    for src, w in [("src0", 0.6), ("src1", 0.4)]:
        total_src = (
            docs.filter(F.col("source") == src)
            .select(text.token_count(F.col("text")).alias("t"))
            .agg(F.sum("t"))
            .collect()[0][0]
        )
        alloc = min(total_src, budget * w)
        # hash sampling is approximate: allow 3 docs of slack either side
        assert per.get(src, 0) <= alloc + 3 * max_doc
    out.unpersist()


def test_mixture_sample_keeps_small_sources_whole(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # enormous budget -> every weighted source kept at rate 1
    out = text.mixture_sample(
        docs, weights={"src0": 1.0}, budget_tokens=10**9
    )
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert out.count() == n_src0
