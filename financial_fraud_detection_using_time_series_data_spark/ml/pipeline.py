"""MLlib model pipeline (SURVEY §2.9 M1-M7).

Capability map from the reference:
- 3 gradient-boosted trees (LightGBM/XGBoost/CatBoost,
  ``src/models/*.py``)      → ``GBTClassifier(weightCol)`` (+ configurable
  seeds give independent ensemble members; stock MLlib, no native deps)
- dynamic ``scale_pos_weight=(1-p)/p``
  (lightgbm_model.py:82-83)  → per-row weight column (A9/helpers.py:151-181)
- stacking meta-LR (ensemble.py:39-133) → base score columns →
  ``VectorAssembler`` → ``LogisticRegression(weightCol)``
- weighted-average ensemble (ensemble.py:159-188) → column expression
- feature importance top-n (M3) → ``featureImportances`` → DataFrame
- save/load (S5) → ``PipelineModel.save/load``

Numeric booster parity is explicitly NOT chased (SURVEY §7.3): data-plane
features are hash-verified against the oracle; the model plane is
verified by AUC threshold.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import GBTClassifier, LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class FraudModelConfig:
    label_col: str = "isFraud"
    weight_col: str = "weight"
    features_col: str = "features"
    max_iter: int = 30           # config.yaml n_estimators analog, CPU-sane
    max_depth: int = 6
    step_size: float = 0.1
    subsample: float = 0.8
    seeds: tuple[int, ...] = (42, 202, 777)   # 3 independent GBTs ≈ LGB/XGB/CAT


def add_class_weights(df: DataFrame, label_col: str = "isFraud", weight_col: str = "weight") -> DataFrame:
    """A9 (helpers.py:151-181): balanced weights total/(2*count_c),
    computed distributed and broadcast back — no driver Counter."""
    # ONE job: the label-cardinality group counts also yield the total
    rows = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__n")).collect()
    total = sum(r["__n"] for r in rows)
    wmap = {r[label_col]: total / (2.0 * r["__n"]) for r in rows}
    expr = F.when(F.col(label_col) == 1, F.lit(wmap.get(1, 1.0))).otherwise(
        F.lit(wmap.get(0, 1.0))
    )
    return df.withColumn(weight_col, expr)


def build_feature_pipeline(
    df: DataFrame,
    categorical_cols: list[str],
    numeric_cols: list[str],
    features_col: str = "features",
    one_hot: bool = False,
    standardize: bool = False,
) -> Pipeline:
    """F10 label encoding (StringIndexer, alphabetAsc = pandas category
    order) + optional F11 one-hot (pd.get_dummies analog,
    preprocessor.py:129-134) + assembly + optional F13 standard scaling
    (fit-on-train Estimator contract, sequence_builder.py:93-139).
    keep-invalid so serving-time unseen categories don't fail (reference
    maps unknowns to 'missing')."""
    from pyspark.ml.feature import OneHotEncoder, StandardScaler

    stages = []
    cat_out = []
    for c in categorical_cols:
        stages.append(
            StringIndexer(
                inputCol=c,
                outputCol=f"{c}_idx",
                handleInvalid="keep",
                stringOrderType="alphabetAsc",
            )
        )
        cat_out.append(f"{c}_idx")
    if one_hot and categorical_cols:
        stages.append(
            OneHotEncoder(
                inputCols=cat_out,
                outputCols=[f"{c}_oh" for c in categorical_cols],
                handleInvalid="keep",
            )
        )
        cat_out = [f"{c}_oh" for c in categorical_cols]
    assembled = "__raw_features" if standardize else features_col
    stages.append(
        VectorAssembler(
            inputCols=numeric_cols + cat_out,
            outputCol=assembled,
            handleInvalid="keep",
        )
    )
    if standardize:
        stages.append(
            StandardScaler(
                inputCol=assembled,
                outputCol=features_col,
                withMean=True,
                withStd=True,
            )
        )
    return Pipeline(stages=stages)


def train_gbt(
    train: DataFrame,
    cfg: FraudModelConfig = FraudModelConfig(),
    seed: int = 42,
) -> PipelineModel:
    """M1: one weighted GBT over an assembled `features` column."""
    gbt = GBTClassifier(
        labelCol=cfg.label_col,
        featuresCol=cfg.features_col,
        weightCol=cfg.weight_col,
        maxIter=cfg.max_iter,
        maxDepth=cfg.max_depth,
        stepSize=cfg.step_size,
        subsamplingRate=cfg.subsample,
        seed=seed,
    )
    return Pipeline(stages=[gbt]).fit(train)


def train_gbt_early_stop(
    train: DataFrame,
    cfg: FraudModelConfig = FraudModelConfig(),
    max_iter_grid: tuple[int, ...] = (10, 20, 30),
    seed: int = 42,
    train_ratio: float = 0.8,
):
    """Early-stopping analog (reference ``lightgbm_model.py:95-105``
    ``early_stopping_rounds=50``): MLlib exposes no per-iteration
    validation callback, so the same decision — "stop boosting when the
    validation metric stops improving" — is made by validation-driven
    selection of the boosting LENGTH: ``TrainValidationSplit`` over a
    ``maxIter`` grid keeps the model whose held-out AUC is best. The grid
    models train concurrently (``parallelism=len(grid)``), each a normal
    distributed GBT fit, so the extra cost is bounded by the largest
    grid entry, not the grid size.

    Returns the fitted TrainValidationSplitModel: ``.bestModel`` is the
    selected GBT, ``.validationMetrics`` the per-grid-entry AUCs.
    """
    from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit

    gbt = GBTClassifier(
        labelCol=cfg.label_col,
        featuresCol=cfg.features_col,
        weightCol=cfg.weight_col,
        maxDepth=cfg.max_depth,
        stepSize=cfg.step_size,
        subsamplingRate=cfg.subsample,
        seed=seed,
    )
    grid = ParamGridBuilder().addGrid(gbt.maxIter, list(max_iter_grid)).build()
    tvs = TrainValidationSplit(
        estimator=gbt,
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(
            labelCol=cfg.label_col, metricName="areaUnderROC"
        ),
        trainRatio=train_ratio,
        parallelism=len(grid),
        seed=seed,
    )
    return tvs.fit(train)


def score_column(model, df: DataFrame, out_col: str) -> DataFrame:
    """M2: probability-of-fraud as a plain double column; drops the
    intermediate ml vectors so models can be chained (J3/ensemble concat)."""
    scored = model.transform(df)
    out = scored.withColumn(out_col, vector_to_array("probability")[1])
    return out.drop("rawPrediction", "probability", "prediction")


def train_stacking_ensemble(
    train: DataFrame,
    base_models: list,
    cfg: FraudModelConfig = FraudModelConfig(),
):
    """M5 (ensemble.py:39-133): base scores → assembler → meta-LR with
    balanced weights. Returns (meta_model, score_cols)."""
    scored = train
    score_cols = []
    for i, m in enumerate(base_models):
        c = f"base_score_{i}"
        scored = score_column(m, scored, c)
        score_cols.append(c)
    assembler = VectorAssembler(inputCols=score_cols, outputCol="meta_features")
    lr = LogisticRegression(
        labelCol=cfg.label_col,
        featuresCol="meta_features",
        weightCol=cfg.weight_col,
        maxIter=50,
    )
    meta = Pipeline(stages=[assembler, lr]).fit(scored)
    return meta, score_cols


def weighted_average_scores(df: DataFrame, score_cols: list[str], weights: list[float] | None = None) -> DataFrame:
    """M6 (ensemble.py:159-188): Σ wᵢ·scoreᵢ as a column expression."""
    weights = weights or [1.0 / len(score_cols)] * len(score_cols)
    expr = sum((F.col(c) * F.lit(w) for c, w in zip(score_cols, weights)), F.lit(0.0))
    return df.withColumn("ensemble_score", expr)


def feature_importances(model: PipelineModel, feature_names: list[str], top_n: int = 20):
    """M3: booster importances → (feature, importance) rows, top-n."""
    gbt = model.stages[-1]
    imp = gbt.featureImportances
    pairs = sorted(
        ((feature_names[i], float(v)) for i, v in zip(imp.indices, imp.values)),
        key=lambda t: -t[1],
    )
    return pairs[:top_n]


def evaluate(df: DataFrame, score_col: str, label_col: str = "isFraud") -> dict[str, float]:
    """E1 via MLlib evaluators (rawPrediction accepts a double column)."""
    out = {}
    for metric in ("areaUnderROC", "areaUnderPR"):
        ev = BinaryClassificationEvaluator(
            rawPredictionCol=score_col, labelCol=label_col, metricName=metric
        )
        out[metric] = ev.evaluate(df)
    return out
