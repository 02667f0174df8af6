"""Skew behavior: a whale key (80% of all rows on one user) must not
change correctness of the two-phase salted aggregation or the expanding
window engine (SURVEY §4.3.1)."""

import pandas as pd
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import (
    relational,
    windows,
)


def _skewed(spark, n=50_000, whale_frac=0.8):
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < int(whale_frac * 10), 7)
        .otherwise(F.col("id") % 997)
        .alias("user_id"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        (F.pmod(F.col("id") * 37, 1000) / 10.0).alias("value"),
    )
    return df


def test_salted_agg_equals_plain_groupby_under_skew(spark):
    df = _skewed(spark)
    salted = relational.salted_agg(df, "user_id", "value", "event_id", n_salts=32)
    plain = df.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    diff = (
        salted.alias("s")
        .join(plain.alias("p"), "user_id", "full")
        .filter(
            (F.col("s.total") != F.col("p.total")) | (F.col("s.n") != F.col("p.n"))
        )
        .count()
    )
    assert diff == 0


def test_expanding_windows_correct_on_whale_key(spark):
    df = _skewed(spark, n=20_000)
    out = windows.expanding_user_features(df)
    whale = (
        out.filter(F.col("user_id") == 7)
        .orderBy("ts")
        .select("user_txn_count", "user_total_amount", "value")
        .toPandas()
    )
    # cumulative invariants on the whale partition
    assert (whale["user_txn_count"].to_numpy() == range(len(whale))).all()
    expect = whale["value"].cumsum().round(6)
    got = whale["user_total_amount"].round(6)
    pd.testing.assert_series_equal(got, expect, check_names=False)
