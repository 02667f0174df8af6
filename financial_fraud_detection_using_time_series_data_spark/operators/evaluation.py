"""Evaluation engine (SURVEY §2.10): thresholded confusion metrics, cost
model, PR-curve threshold search, threshold sweep — all as distributed
aggregations (the reference uses sklearn over in-RAM arrays,
``src/evaluation/metrics.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exprs import r6

COST_FN = 1000.0  # missed fraud  (config/config.yaml:91-93)
COST_FP = 10.0    # false alarm


def confusion_counts(df: DataFrame, label: str, score: str, threshold: float) -> DataFrame:
    """A10/E2 (metrics.py:61-87): binarize at t, four conditional sums in one
    agg (no pivot shuffle)."""
    y = F.col(label)
    p = (F.col(score) >= F.lit(threshold)).cast("int")
    return df.agg(
        F.sum(((y == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((y == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((y == 0) & (p == 0)).cast("long")).alias("tn"),
        F.sum(((y == 1) & (p == 0)).cast("long")).alias("fn"),
    )


def classification_metrics(df: DataFrame, label: str, score: str, threshold: float) -> DataFrame:
    """E2+E3: precision/recall/F1/accuracy/specificity/FPR + cost model."""
    c = confusion_counts(df, label, score, threshold)
    tp, fp, tn, fn = F.col("tp"), F.col("fp"), F.col("tn"), F.col("fn")
    prec = tp / F.nullif(tp + fp, F.lit(0))
    rec = tp / F.nullif(tp + fn, F.lit(0))
    return c.select(
        "*",
        r6(prec).alias("precision"),
        r6(rec).alias("recall"),
        r6(2 * prec * rec / F.nullif(prec + rec, F.lit(0.0))).alias("f1"),
        r6((tp + tn) / (tp + fp + tn + fn)).alias("accuracy"),
        r6(tn / F.nullif(tn + fp, F.lit(0))).alias("specificity"),
        (fn * F.lit(COST_FN) + fp * F.lit(COST_FP)).alias("cost"),
    )


def _pr_points(df: DataFrame, label: str, score: str, id_col: str) -> DataFrame:
    """Shared sorted-cumsum core of pr_curve / average_precision:
    (threshold, tp, pred_pos, total_pos) at every distinct score."""
    w = Window.orderBy(F.col(score).desc(), F.col(id_col))
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total_pos = F.sum(F.col(label)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    scanned = df.select(
        F.col(score).alias("threshold"),
        F.sum(label).over(frame).alias("cum_tp"),
        F.row_number().over(w).alias("cum_pred_pos"),
        total_pos.alias("total_pos"),
    )
    # keep the LAST row per distinct threshold (ties share a threshold)
    return scanned.groupBy("threshold").agg(
        F.max("cum_tp").alias("tp"),
        F.max("cum_pred_pos").alias("pred_pos"),
        F.max("total_pos").alias("total_pos"),
    )


def pr_curve(df: DataFrame, label: str, score: str, id_col: str) -> DataFrame:
    """E4 (metrics.py:121-200): the PR curve as a sorted scan + cumulative
    sums — the flagship analytic.

    Sort desc by score (range-partitioned), cumulative TP = sum(label),
    cumulative predicted-positive = row_number; precision/recall at every
    distinct score threshold. Window state is O(1); the only shuffle is the
    range partitioning of the sort.
    """
    per_t = _pr_points(df, label, score, id_col)
    return per_t.select(
        "threshold",
        "tp",
        "pred_pos",
        r6(F.col("tp") / F.col("pred_pos")).alias("precision"),
        r6(F.col("tp") / F.col("total_pos")).alias("recall"),
        r6(
            2 * (F.col("tp") / F.col("pred_pos")) * (F.col("tp") / F.col("total_pos"))
            / F.nullif(F.col("tp") / F.col("pred_pos") + F.col("tp") / F.col("total_pos"), F.lit(0.0))
        ).alias("f1"),
    )


def best_threshold_by_f1(df: DataFrame, label: str, score: str, id_col: str) -> DataFrame:
    """E4: argmax-F1 threshold — top-1 of the PR curve."""
    curve = pr_curve(df, label, score, id_col)
    return curve.orderBy(F.col("f1").desc(), F.col("threshold").desc()).limit(1)


def threshold_sweep(
    df: DataFrame, label: str, score: str, thresholds: list[float] | None = None
) -> DataFrame:
    """E5 (metrics.py:240-273): metrics at t in {0.1..0.9} as ONE wide
    aggregation pass (4 conditional sums per threshold) then an unpivot of
    the 1-row result — scans the scored table once with no row
    multiplication (the crossJoin formulation shuffles |rows|×|thresholds|)."""
    thresholds = thresholds or [round(0.1 * i, 1) for i in range(1, 10)]
    y = F.col(label)
    aggs = []
    for i, t in enumerate(thresholds):
        p = (F.col(score) >= F.lit(t)).cast("int")
        aggs += [
            F.sum(((y == 1) & (p == 1)).cast("long")).alias(f"tp_{i}"),
            F.sum(((y == 0) & (p == 1)).cast("long")).alias(f"fp_{i}"),
            F.sum(((y == 0) & (p == 0)).cast("long")).alias(f"tn_{i}"),
            F.sum(((y == 1) & (p == 0)).cast("long")).alias(f"fn_{i}"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"{t}D, tp_{i}, fp_{i}, tn_{i}, fn_{i}" for i, t in enumerate(thresholds)
    )
    agg = wide.selectExpr(
        f"stack({len(thresholds)}, {stack}) as (threshold, tp, fp, tn, fn)"
    ).filter(
        # empty input: df.agg() yields one all-NULL row -> would unpivot
        # into |thresholds| phantom rows; the old crossJoin form returned 0
        F.col("tp").isNotNull()
    )
    tp, fp, tn, fn = F.col("tp"), F.col("fp"), F.col("tn"), F.col("fn")
    prec = tp / F.nullif(tp + fp, F.lit(0))
    rec = tp / F.nullif(tp + fn, F.lit(0))
    return agg.select(
        "threshold", "tp", "fp", "tn", "fn",
        r6(prec).alias("precision"),
        r6(rec).alias("recall"),
        r6(2 * prec * rec / F.nullif(prec + rec, F.lit(0.0))).alias("f1"),
        (fn * F.lit(COST_FN) + fp * F.lit(COST_FP)).alias("cost"),
    )


def roc_auc(df: DataFrame, label: str, score: str) -> DataFrame:
    """E1 (metrics.py:47-58): exact ROC-AUC via the Mann-Whitney rank-sum
    identity, AUC = (sum of positives' average ranks - P(P+1)/2) / (P*N),
    with tied scores getting the average rank (sklearn semantics).

    Scale shape: aggregate per DISTINCT score first (one hash-agg
    shuffle), rank the distinct-score table analytically from cumulative
    counts, then one scalar agg. The global-order window runs over
    |distinct scores| rows, not |rows| — at 100 TB the raw table is never
    globally sorted. Returns one row: (roc_auc).
    """
    per_score = df.groupBy(F.col(score).alias("s")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col(label).cast("long")).cast("double").alias("npos"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = per_score.select(
        "n",
        "npos",
        # ranks occupied by this score group: (cum_n - n + 1) .. cum_n;
        # average rank = cum_n - (n - 1)/2
        (F.sum("n").over(w) - (F.col("n") - 1) / 2).alias("avgrank"),
    )
    agg = ranked.agg(
        F.sum(F.col("npos") * F.col("avgrank")).alias("pos_rank_sum"),
        F.sum("npos").alias("p"),
        F.sum(F.col("n") - F.col("npos")).alias("nn"),
    )
    p, nn = F.col("p"), F.col("nn")
    return agg.select(
        r6(
            (F.col("pos_rank_sum") - p * (p + 1) / 2)
            / F.nullif(p * nn, F.lit(0.0))
        ).alias("roc_auc")
    )


def average_precision(df: DataFrame, label: str, score: str, id_col: str) -> DataFrame:
    """E1: PR-AUC as average precision, AP = sum_i (R_i - R_{i-1}) * P_i
    over distinct thresholds in descending-score order (sklearn's
    step-function definition, not a trapezoid). Built on the pr_curve
    sorted-cumsum plan. Returns one row: (pr_auc)."""
    curve = _pr_points(df, label, score, id_col)
    w = Window.orderBy(F.col("threshold").desc())
    prec = F.col("tp") / F.col("pred_pos")
    rec = F.col("tp") / F.col("total_pos")
    stepped = curve.select(
        (
            (rec - F.coalesce(F.lag(rec).over(w), F.lit(0.0))) * prec
        ).alias("ap_term")
    )
    return stepped.agg(r6(F.sum("ap_term")).alias("pr_auc"))
