"""WOE encoder contracts: broadcast fact-side join, unseen-category
default, sign sanity."""

from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import relational


def _labelled(spark, n=2000):
    return spark.range(n).select(
        F.col("id"),
        (F.pmod(F.col("id"), 4)).cast("string").alias("cat"),
        # category "0" is pure-positive-leaning, "3" pure-negative-leaning
        (F.pmod(F.col("id") * 31, 10) < (F.lit(8) - F.pmod(F.col("id"), 4) * 2))
        .cast("int")
        .alias("label"),
    )


def test_woe_signs_and_iv(spark):
    df = _labelled(spark)
    tab = {r.cat: r for r in relational.woe_table(df, "cat", "label").collect()}
    assert tab["0"].woe > tab["3"].woe, "higher positive rate must mean higher WOE"
    iv = sum(r.iv_term for r in tab.values())
    assert iv > 0.0


def test_woe_encode_broadcasts_and_fills_unseen(spark):
    df = _labelled(spark)
    # train only on categories 0-2; category 3 is unseen at fit time
    train = df.filter(F.col("cat") != "3")
    out = relational.woe_encode(df, train, "cat", "label")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1200]
    unseen = out.filter(F.col("cat") == "3").select("woe").distinct().collect()
    assert [r.woe for r in unseen] == [0.0]
