"""Calibration contracts: Platt and isotonic must repair a deterministic
mis-calibration (compressed scores) and behave monotonically."""

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.ml import calibration


def _miscalibrated(spark, n=4000):
    """Deterministic labels from a sharp sigmoid in a latent variable;
    scores are the COMPRESSED probabilities (0.4 + 0.2·p) — directionally
    right, absolutely wrong, like an over-regularized booster."""
    df = spark.range(n).select(
        F.col("id"),
        ((F.pmod(F.col("id") * 7919, 1000)) / 1000.0).alias("p_true"),
    )
    return df.select(
        "id",
        (F.lit(0.4) + F.lit(0.2) * F.col("p_true")).alias("score"),
        # threshold the latent prob against a deterministic hash draw
        (
            (F.pmod(F.col("id") * 104729 + 17, 1000) / 1000.0) < F.col("p_true")
        )
        .cast("int")
        .alias("label"),
    )


def test_platt_reduces_brier(spark):
    scored = _miscalibrated(spark).cache()
    raw = calibration.brier_score(scored, "score")
    model = calibration.fit_platt(scored)
    cal = calibration.apply_platt(scored, model)
    fixed = calibration.brier_score(cal, "calibrated_p")
    assert fixed < raw - 0.01, (raw, fixed)
    # apply is a pure column expression — no Python eval, no shuffle
    plan = cal._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan[:1200]


def test_isotonic_reduces_brier_and_is_monotone(spark):
    scored = _miscalibrated(spark).cache()
    raw = calibration.brier_score(scored, "score")
    model = calibration.fit_isotonic(scored)
    cal = calibration.apply_isotonic(scored, model)
    fixed = calibration.brier_score(cal, "calibrated_p")
    assert fixed < raw - 0.01, (raw, fixed)
    rows = (
        cal.select("score", "calibrated_p").distinct().orderBy("score").collect()
    )
    probs = [r.calibrated_p for r in rows]
    assert probs == sorted(probs), "isotonic output must be monotone in score"


def test_reliability_table_shape(spark):
    scored = _miscalibrated(spark)
    model = calibration.fit_platt(scored)
    cal = calibration.apply_platt(scored, model)
    tab = calibration.reliability_table(cal, "calibrated_p").collect()
    assert 1 <= len(tab) <= 10
    for r in tab:
        assert 0.0 <= r.mean_predicted <= 1.0 and 0.0 <= r.observed_rate <= 1.0
    # bins ordered, counts sum to the input size
    assert sum(r.n for r in tab) == scored.count()


def test_isotonic_matches_numpy_pav(spark):
    """MLlib's distributed PAVA == the classic sequential
    pool-adjacent-violators on the same (score, label) set."""
    import numpy as np

    rng = np.random.default_rng(5)
    scores = np.round(rng.random(300), 3)
    labels = (rng.random(300) < scores * 0.8).astype(float)
    df = spark.createDataFrame(
        [(float(s), float(y)) for s, y in zip(scores, labels)],
        "score double, label double",
    )
    model = calibration.fit_isotonic(df)
    cal = {
        r.score: r.calibrated_p
        for r in calibration.apply_isotonic(df, model).collect()
    }

    # sequential PAV over DISTINCT scores (ties pre-pooled, as isotonic
    # regression requires: tied x is one weighted point)
    uniq = sorted(set(scores.tolist()))
    pooled = {s: [0.0, 0.0] for s in uniq}
    for s, y in zip(scores, labels):
        pooled[float(s)][0] += y
        pooled[float(s)][1] += 1.0
    blocks = [[pooled[s][0], pooled[s][1], [s]] for s in uniq]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[i + 1][1] + 1e-15:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            blocks[i][2] += blocks[i + 1][2]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    for ysum, cnt, ss in blocks:
        for s in ss:
            assert cal[s] == pytest.approx(ysum / cnt, abs=1e-9), s
