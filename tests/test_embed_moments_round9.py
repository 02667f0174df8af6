"""Embeddings/moments II (round 9b): int8 quantization audit and
rolling skewness/kurtosis."""

import datetime as dt
import math

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import (
    finance,
    similarity,
)


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_quantize_audit_hand_check(spark):
    v = [1.27, -0.635, 0.0, 0.4]
    df = _emb(spark, [v])
    row = similarity.quantize_audit(df, bits=8).collect()[0]
    scale = 1.27 / 127.0  # = 0.01
    recon = [max(min(round(x / scale), 127), -127) * scale for x in v]
    err2 = sum((x - r) ** 2 for x, r in zip(v, recon))
    nrm2 = sum(x * x for x in v)
    assert row["dim"] == 4
    assert row["scale"] == pytest.approx(scale, abs=1e-6)
    assert row["rel_err_l2"] == pytest.approx(math.sqrt(err2 / nrm2), abs=1e-6)
    assert row["max_abs_err"] == pytest.approx(
        max(abs(x - r) for x, r in zip(v, recon)), abs=1e-6
    )
    # 1.27/0.01 = 127 saturates the positive lane (>= qmax)
    assert row["n_saturated"] == 1


def test_quantize_audit_zero_vector_nulls(spark):
    df = _emb(spark, [[0.0, 0.0, 0.0]])
    row = similarity.quantize_audit(df).collect()[0]
    assert row["rel_err_l2"] is None and row["norm"] == 0.0


def test_quantize_audit_error_shrinks_with_bits(spark):
    v = [[0.33, -0.71, 0.05, 0.99, -0.12]]
    e8 = similarity.quantize_audit(_emb(spark, v), bits=8).collect()[0]
    e4 = similarity.quantize_audit(_emb(spark, v), bits=4).collect()[0]
    assert e8["rel_err_l2"] < e4["rel_err_l2"]
    with pytest.raises(ValueError):
        similarity.quantize_audit(_emb(spark, v), bits=1)


def _daily_events(spark, vals):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + dt.timedelta(days=d), "a", float(v))
        for i, (d, v) in enumerate(enumerate(vals))
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_rolling_skew_kurt_hand_moments(spark):
    vals = [10.0, 12.0, 9.0, 30.0, 11.0, 13.0]
    df = _daily_events(spark, vals)
    rows = sorted(
        finance.rolling_skew_kurt(df, window=14, min_obs=4).collect(),
        key=lambda r: r["bucket"],
    )
    # last row: window covers all 6 values
    xs = vals
    n = len(xs)
    m = sum(xs) / n
    m2 = sum((x - m) ** 2 for x in xs) / n
    m3 = sum((x - m) ** 3 for x in xs) / n
    m4 = sum((x - m) ** 4 for x in xs) / n
    last = rows[-1]
    assert last["n_obs"] == n
    assert last["roll_mean"] == pytest.approx(m, abs=1e-6)
    assert last["roll_std"] == pytest.approx(math.sqrt(m2), abs=1e-6)
    assert last["roll_skew"] == pytest.approx(m3 / m2**1.5, abs=1e-5)
    assert last["roll_kurt_excess"] == pytest.approx(m4 / m2**2 - 3, abs=1e-5)
    # below min_obs -> NULLs
    assert rows[0]["roll_skew"] is None and rows[2]["roll_skew"] is None


def test_rolling_skew_symmetric_is_zero(spark):
    vals = [10.0, 20.0, 30.0, 40.0, 50.0]  # symmetric around 30
    df = _daily_events(spark, vals)
    last = sorted(
        finance.rolling_skew_kurt(df, window=5, min_obs=5).collect(),
        key=lambda r: r["bucket"],
    )[-1]
    assert last["roll_skew"] == pytest.approx(0.0, abs=1e-6)


def test_embed_moments_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in ("quantize_audit", "rolling_skew_kurt"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "No Partition Defined" not in plan, name
