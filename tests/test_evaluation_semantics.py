"""Semantic checks for the AUC operators against the textbook
definitions computed brute-force in numpy (independent of the DuckDB
oracle, which shares the plan shape)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

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


def test_best_threshold_by_cost_matches_bruteforce(spark):
    df, pdf = _toy(spark)
    got = evaluation.best_threshold_by_cost(
        df, "label", "score", "event_id"
    ).collect()[0]

    best = None
    for t in np.unique(pdf.score):
        pred = (pdf.score >= t).astype(int)
        fn = int(((pdf.label == 1) & (pred == 0)).sum())
        fp = int(((pdf.label == 0) & (pred == 1)).sum())
        cost = fn * 1000.0 + fp * 10.0
        # argmin with ties to the LOWEST threshold (np.argmin first-index
        # rule on an ascending threshold axis)
        if best is None or cost < best[1]:
            best = (t, cost)
    assert abs(got.threshold - best[0]) < 1e-12
    assert got.cost == best[1]


def test_best_threshold_by_recall_constraint(spark):
    df, pdf = _toy(spark)
    got = evaluation.best_threshold_by_recall(
        df, "label", "score", "event_id", target_recall=0.90
    ).collect()[0]
    # the returned point must satisfy the constraint...
    assert got.recall >= 0.90
    # ...and be precision-maximal among all satisfying thresholds
    total_pos = int(pdf.label.sum())
    best_prec = 0.0
    for t in np.unique(pdf.score):
        pred = (pdf.score >= t).astype(int)
        tp = int(((pdf.label == 1) & (pred == 1)).sum())
        rec = tp / total_pos
        prec = tp / int(pred.sum())
        if rec >= 0.90:
            best_prec = max(best_prec, prec)
    assert abs(got.precision - best_prec) < 1e-6


def test_best_threshold_by_recall_fallback(spark):
    """Unreachable target → the reference hard-falls-back to 0.1 with the
    lowest-threshold PR point's metrics (metrics.py:186-189)."""
    pdf = pd.DataFrame(
        {
            "event_id": range(4),
            "label": [1, 1, 0, 0],
            "score": [0.9, 0.2, 0.8, 0.3],
        }
    )
    df = spark.createDataFrame(pdf)
    got = evaluation.best_threshold_by_recall(
        df, "label", "score", "event_id", target_recall=2.0  # impossible
    ).collect()[0]
    assert got.threshold == 0.1
    # lowest-threshold point: everything predicted positive
    assert got.recall == 1.0
    assert abs(got.precision - 0.5) < 1e-6


def test_lift_table_properties(spark):
    df, pdf = _toy(spark)
    rows = evaluation.lift_table(df, "label", "score", "event_id").collect()
    assert [r.bucket for r in rows] == list(range(1, 11))
    assert sum(r.n for r in rows) == len(pdf)
    assert sum(r.npos for r in rows) == int(pdf.label.sum())
    # cumulative capture is monotone and ends at 1
    caps = [r.cum_capture for r in rows]
    assert all(b >= a for a, b in zip(caps, caps[1:]))
    assert abs(caps[-1] - 1.0) < 1e-9
    # scores correlate with labels, so the top decile must over-capture
    assert rows[0].lift > 1.0
    # per-bucket lift vs brute force for the top decile
    top = pdf.sort_values(["score", "event_id"], ascending=[False, True]).head(
        len(pdf) // 10
    )
    base = pdf.label.mean()
    want_lift = top.label.mean() / base
    assert abs(rows[0].lift - want_lift) < 1e-6


# --- ndcg_eval ---------------------------------------------------------------


def test_ndcg_perfect_and_inverted_ranking(spark):
    import math

    from financial_fraud_detection_using_time_series_data_spark.operators.evaluation import (
        ndcg_eval,
    )

    # group "good": 3 positives scored on top of 7 negatives -> nDCG = 1
    # group "bad": the 3 positives carry the LOWEST scores of 10
    rows = []
    for i in range(10):
        rows.append(("good", i, 1 if i < 3 else 0, 1.0 - i * 0.05))
        rows.append(("bad", 100 + i, 1 if i >= 7 else 0, 1.0 - i * 0.05))
    df = spark.createDataFrame(rows, "seg string, event_id long, label int, score double")
    out = {r.seg: r for r in ndcg_eval(df, "seg", "score", "label", "event_id", k=10).collect()}

    def micro(r):
        return math.floor(1e6 / math.log2(r + 1) + 0.5)

    idcg = sum(micro(r) for r in (1, 2, 3)) / 1e6
    assert out["good"].n_pos == 3 and out["bad"].n_pos == 3
    assert out["good"].idcg == out["bad"].idcg == idcg
    assert out["good"].ndcg == 1.0
    want_bad = (sum(micro(r) for r in (8, 9, 10)) / 1e6) / idcg
    assert abs(out["bad"].ndcg - want_bad) < 1e-12


def test_ndcg_no_positives_is_null(spark):
    from financial_fraud_detection_using_time_series_data_spark.operators.evaluation import (
        ndcg_eval,
    )

    df = spark.createDataFrame(
        [("g", i, 0, float(i)) for i in range(5)],
        "seg string, event_id long, label int, score double",
    )
    r = ndcg_eval(df, "seg", "score", "label", "event_id").collect()[0]
    assert r.n_pos == 0 and r.ndcg is None and r.idcg is None and r.dcg == 0.0


def test_topk_per_group_matches_plain_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from financial_fraud_detection_using_time_series_data_spark.operators.relational import (
        topk_per_group,
    )

    df = spark.range(2000).select(
        (F.col("id") % 7).alias("g"),
        (F.pmod(F.col("id") * 2654435761, 10007)).cast("double").alias("v"),
        F.col("id").alias("tid"),
    )
    got = {
        (r.g, r.rank): r.tid
        for r in topk_per_group(df, "g", "v", 5, "tid", n_salts=4).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("tid"))
    want = {
        (r.g, r.rank): r.tid
        for r in df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    }
    assert got == want


# --- mutual_information / ab_test --------------------------------------------


def test_mutual_information_independent_and_dependent(spark):
    import math

    from financial_fraud_detection_using_time_series_data_spark.operators.evaluation import (
        mutual_information,
    )

    rows = []
    for i in range(400):
        # (indep, label) uniform over all 4 combos -> truly independent
        rows.append(((i // 2) % 2, i % 2))
    df = spark.createDataFrame(rows, "indep int, label int")
    dep = df.withColumn("dep", F.col("label"))
    out = {r.feature: r for r in mutual_information(
        dep, ["indep", "dep"], "label"
    ).collect()}
    assert abs(out["indep"].mi_nats) < 1e-9          # independent -> 0
    assert abs(out["dep"].mi_nats - math.log(2)) < 1e-6  # identical -> H = ln 2
    assert out["dep"].n_rows == 400 and out["dep"].n_cells == 2


def test_ab_test_known_z(spark):
    import math

    from financial_fraud_detection_using_time_series_data_spark.operators.evaluation import (
        ab_test,
    )

    # arm 0: 100 trials 20 successes; arm 1: 100 trials 30 successes
    rows = [(0, 1 if i < 20 else 0) for i in range(100)]
    rows += [(1, 1 if i < 30 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "arm int, success int")
    r = ab_test(df, "arm", "success").collect()[0]
    assert (r.n_a, r.s_a, r.n_b, r.s_b) == (100, 20, 100, 30)
    pool = 50 / 200
    want = (0.3 - 0.2) / math.sqrt(pool * (1 - pool) * (2 / 100))
    assert r.lift == pytest.approx(0.1)
    assert r.z == pytest.approx(want, rel=1e-12)


def test_ab_test_empty_arm_null_not_crash(spark):
    from financial_fraud_detection_using_time_series_data_spark.operators.evaluation import (
        ab_test,
    )

    df = spark.createDataFrame([(0, 1), (0, 0)], "arm int, success int")
    r = ab_test(df, "arm", "success").collect()[0]
    assert r.n_b == 0 and r.rate_b is None and r.z is None


# --- anova_f -----------------------------------------------------------------


def test_anova_f_matches_scipy_formula(spark):
    import numpy as np

    from financial_fraud_detection_using_time_series_data_spark.operators import evaluation

    rng = np.random.default_rng(2)
    groups = {"a": rng.normal(0, 1, 40), "b": rng.normal(0.8, 1, 35), "c": rng.normal(-0.5, 1, 25)}
    rows = [
        (g, float(round(v, 4))) for g, vals in groups.items() for v in vals
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = evaluation.anova_f(df, "v", "grp", value_scale="decimal(18,6)").collect()[0]

    allv = np.concatenate(list(groups.values()))
    allv = np.round(allv, 4)
    gm = allv.mean()
    ssb = sum(len(np.round(v, 4)) * (np.round(v, 4).mean() - gm) ** 2 for v in groups.values())
    ssw = sum(((np.round(v, 4) - np.round(v, 4).mean()) ** 2).sum() for v in groups.values())
    k, n = 3, len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r.n == n and r.k == k
    assert r.ss_between == pytest.approx(ssb, rel=1e-6)
    assert r.ss_within == pytest.approx(ssw, rel=1e-6)
    assert r.f_stat == pytest.approx(f, rel=1e-6)


def test_anova_f_null_when_degenerate(spark):
    from financial_fraud_detection_using_time_series_data_spark.operators import evaluation

    one_group = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "grp string, v double")
    assert evaluation.anova_f(one_group, "v", "grp").collect()[0].f_stat is None
    constant = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)], "grp string, v double"
    )
    assert evaluation.anova_f(constant, "v", "grp").collect()[0].f_stat is None
