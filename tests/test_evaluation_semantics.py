"""Semantic checks for the AUC operators against the textbook
definitions computed brute-force in numpy (independent of the DuckDB
oracle, which shares the plan shape)."""

import numpy as np
import pandas as pd

from financial_fraud_detection_using_time_series_data_spark.operators import evaluation


def _toy(spark, n=800, seed=3):
    rng = np.random.default_rng(seed)
    label = (rng.random(n) < 0.3).astype(int)
    # scores correlated with label, with deliberate TIES
    score = np.round(rng.random(n) * 0.5 + label * rng.random(n) * 0.5, 2)
    pdf = pd.DataFrame({"event_id": np.arange(n), "label": label, "score": score})
    return spark.createDataFrame(pdf), pdf


def test_roc_auc_equals_pairwise_probability(spark):
    df, pdf = _toy(spark)
    got = evaluation.roc_auc(df, "label", "score").collect()[0].roc_auc

    pos = pdf.loc[pdf.label == 1, "score"].to_numpy()
    neg = pdf.loc[pdf.label == 0, "score"].to_numpy()
    # AUC = P(pos > neg) + 0.5 * P(pos == neg), all pairs
    gt = (pos[:, None] > neg[None, :]).mean() + 0.5 * (
        pos[:, None] == neg[None, :]
    ).mean()
    assert abs(got - gt) < 1e-6, (got, gt)


def test_average_precision_equals_step_sum(spark):
    df, pdf = _toy(spark)
    got = evaluation.average_precision(df, "label", "score", "event_id").collect()[0].pr_auc

    # sklearn definition: AP = sum_i (R_i - R_{i-1}) P_i over descending
    # distinct thresholds
    s = pdf.sort_values(["score", "event_id"], ascending=[False, True])
    cum_tp = s.label.cumsum().to_numpy()
    pred_pos = np.arange(1, len(s) + 1)
    total_pos = s.label.sum()
    # last row per distinct threshold
    is_last = np.append(s.score.to_numpy()[1:] != s.score.to_numpy()[:-1], True)
    tp = cum_tp[is_last]
    pp = pred_pos[is_last]
    rec = tp / total_pos
    prec = tp / pp
    ap = np.sum((rec - np.concatenate([[0.0], rec[:-1]])) * prec)
    assert abs(got - ap) < 1e-6, (got, ap)


def test_roc_auc_perfect_and_random(spark):
    pdf = pd.DataFrame(
        {"event_id": range(6), "label": [0, 0, 0, 1, 1, 1], "score": [0.1, 0.2, 0.3, 0.7, 0.8, 0.9]}
    )
    df = spark.createDataFrame(pdf)
    assert evaluation.roc_auc(df, "label", "score").collect()[0].roc_auc == 1.0
    pdf["score"] = 0.5
    df = spark.createDataFrame(pdf)
    assert abs(evaluation.roc_auc(df, "label", "score").collect()[0].roc_auc - 0.5) < 1e-9
