"""Probability calibration for fraud scores (SURVEY §2.9 M2/V1 adjunct).

The reference thresholds raw booster probabilities directly
(``src/models/*.py`` ``predict_proba`` → ``inference/predictor.py``
threshold); GBDT scores are famously mis-calibrated, and a fraud
cost model (E3) multiplies dollar amounts by these probabilities, so a
production engine needs a calibration stage. Two standard methods, both
fit distributed with stock MLlib estimators:

- **Platt scaling**: 1-feature ``LogisticRegression(score) → P(y=1)``.
  Parametric sigmoid; right when scores are already roughly logistic.
- **Isotonic regression**: MLlib ``IsotonicRegression`` — monotone
  piecewise-constant fit, the non-parametric choice (sklearn's
  ``CalibratedClassifierCV(method="isotonic")`` analog). MLlib's
  implementation is the classic distributed PAVA: per-partition pools,
  then a driver-side merge of the (tiny) pooled boundaries — scales to
  arbitrarily many rows because the shuffle carries pools, not points.

Both return a fitted model whose ``transform`` is a map-only projection
(broadcast model params), so scoring 100 TB stays scan-shaped.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import IsotonicRegression, IsotonicRegressionModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _with_score_vec(scored: DataFrame, score_col: str) -> DataFrame:
    # VectorAssembler is JVM-side — no Python row boundary for the fit pass
    asm = VectorAssembler(inputCols=[score_col], outputCol="__score_vec")
    return asm.transform(
        scored.withColumn(score_col, F.col(score_col).cast("double"))
    )


def fit_platt(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> LogisticRegressionModel:
    """Fit sigmoid calibration P(y|s) = σ(a·s + b) on (score, label)."""
    train = _with_score_vec(scored, score_col)
    lr = LogisticRegression(
        featuresCol="__score_vec", labelCol=label_col, maxIter=50, regParam=0.0
    )
    return lr.fit(train)


def apply_platt(
    scored: DataFrame,
    model: LogisticRegressionModel,
    score_col: str = "score",
    out_col: str = "calibrated_p",
) -> DataFrame:
    """Map-only: apply the 2-parameter sigmoid as a column expression —
    no vector round-trip at scoring time."""
    a = float(model.coefficients[0])
    b = float(model.intercept)
    z = F.col(score_col).cast("double") * F.lit(a) + F.lit(b)
    return scored.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def fit_isotonic(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> IsotonicRegressionModel:
    """Non-parametric monotone calibration via distributed PAVA."""
    iso = IsotonicRegression(
        featuresCol=score_col,
        labelCol=label_col,
        isotonic=True,
        predictionCol="calibrated_p",
    )
    train = scored.select(
        F.col(score_col).cast("double").alias(score_col),
        F.col(label_col).cast("double").alias(label_col),
    )
    return iso.fit(train)


def apply_isotonic(
    scored: DataFrame,
    model: IsotonicRegressionModel,
    score_col: str = "score",
    out_col: str = "calibrated_p",
) -> DataFrame:
    out = model.transform(
        scored.withColumn(score_col, F.col(score_col).cast("double"))
    )
    if "calibrated_p" != out_col:
        out = out.withColumnRenamed("calibrated_p", out_col)
    return out.withColumn(out_col, F.col(out_col).cast(DoubleType()))


def brier_score(
    scored: DataFrame, prob_col: str, label_col: str = "label"
) -> float:
    """Mean squared error of the probability — the standard calibration
    metric. One global agg (map-side combined)."""
    row = scored.agg(
        F.avg(
            F.pow(F.col(prob_col) - F.col(label_col).cast("double"), F.lit(2.0))
        ).alias("b")
    ).collect()[0]
    return float(row.b)


def reliability_table(
    scored: DataFrame,
    prob_col: str,
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Calibration-curve aggregate (the data behind sklearn's
    ``calibration_curve``): bin by predicted probability, compare mean
    prediction vs observed positive rate. One hash agg on the bin key.

    The probability mean goes through a decimal(28,18) sum: double
    summation is order-dependent across partitions, so a plain avg()
    can differ in the last ulp between runs/engines — decimal partials
    make the mean bit-stable (probabilities ∈ [0,1] fit exactly at 18
    fractional digits of accumulation). Label sums are 0/1-valued and
    already exact in any order."""
    binned = scored.withColumn(
        "bin",
        F.least(
            F.floor(F.col(prob_col) * n_bins).cast("int"), F.lit(n_bins - 1)
        ),
    )
    # decimal(38,18): 20 integer digits of headroom (~1e20 rows/bin) —
    # decimal(28,18) would overflow the sum past ~1e10 rows per bin
    dec_sum = F.sum(F.col(prob_col).cast("decimal(38,18)")).cast("double")
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (dec_sum / F.count(F.lit(1))).alias("mean_predicted"),
            (
                F.sum(F.col(label_col).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("observed_rate"),
        )
        .orderBy("bin")
    )
