"""Property-based tests (hypothesis) for the pandas-parity scalar library
and window helpers — invariants that must hold for ANY input, not just
the driver tables."""

import math

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
