"""End-to-end training driver — the Spark re-expression of the
reference's ``train_pipeline.py`` (load → clean → split → engineer →
train N GBTs → stack → evaluate → importances) as ONE function.

Differences from the reference, by design (SURVEY §3.1):
- windows are computed ONCE over the full time-sorted table and THEN
  split chronologically, so val/test rows keep full histories (the
  reference recomputes per split, truncating them) — leak-free because
  every feature at row t only looks backward;
- fit-on-train is honored where it matters for leakage: target-encoding
  rates (merchant/product) are computed from the train partition only and
  broadcast onto val/test.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.pipeline import (
    FraudModelConfig,
    add_class_weights,
    build_feature_pipeline,
    evaluate,
    feature_importances,
    score_column,
    train_gbt,
    train_stacking_ensemble,
    weighted_average_scores,
)
from ..operators import relational
from ..sources import generate_transactions
from .fraud_pipeline import FraudPipelineConfig, engineer_features, preprocess


@dataclass
class TrainResult:
    metrics: dict
    importances: list
    n_train: int
    n_val: int
    n_test: int


def run_training_pipeline(
    spark: SparkSession,
    txns: DataFrame | None = None,
    pipeline_cfg: FraudPipelineConfig = FraudPipelineConfig(),
    model_cfg: FraudModelConfig | None = None,
    n_synthetic: int = 20_000,
    categorical_cols: tuple[str, ...] = ("ProductCD", "card4"),
    max_features: int = 40,
) -> TrainResult:
    """train_pipeline.py:29-306 as one call. Returns per-model + ensemble
    metrics, top importances, split sizes."""
    model_cfg = model_cfg or FraudModelConfig(max_iter=10, max_depth=4, seeds=(42, 202))
    if txns is None:
        txns = generate_transactions(spark, n=n_synthetic, fraud_rate=0.035, seed=42)

    cleaned = preprocess(txns, pipeline_cfg)

    # chronological 70/15/15 BEFORE feature fit so train-only statistics
    # (target encodes) cannot see the future...
    split = relational.time_split(
        cleaned, pipeline_cfg.ts_col, (0.7, 0.15, 0.15), tiebreak=pipeline_cfg.id_col
    )
    train_raw = split.filter(F.col("split") == "train").drop("split")

    # ...but window features are computed ONCE over the full table
    # (backward-looking only), with rate maps fit on train_raw
    engineered = engineer_features(
        split.drop("split"), pipeline_cfg, train=train_raw
    ).join(split.select(pipeline_cfg.id_col, "split"), pipeline_cfg.id_col)

    weighted = add_class_weights(engineered, pipeline_cfg.label_col)
    num_cols = [
        c
        for c, t in weighted.dtypes
        if t in ("double", "int", "bigint")
        and c not in (pipeline_cfg.label_col, pipeline_cfg.id_col, "weight", "split")
    ][:max_features]
    feat = build_feature_pipeline(weighted, list(categorical_cols), num_cols)
    feat_model = feat.fit(weighted.filter(F.col("split") == "train"))
    prepped = feat_model.transform(weighted).cache()

    train = prepped.filter(F.col("split") == "train")
    val = prepped.filter(F.col("split") == "val")
    test = prepped.filter(F.col("split") == "test")

    models = [train_gbt(train, model_cfg, seed=s) for s in model_cfg.seeds]

    def _score_all(df: DataFrame) -> DataFrame:
        out = df
        for i, m in enumerate(models):
            out = score_column(m, out, f"base_score_{i}")
        return out

    score_cols = [f"base_score_{i}" for i in range(len(models))]
    meta, _ = train_stacking_ensemble(train, models, model_cfg)

    from pyspark.ml.functions import vector_to_array

    def _with_ensembles(df: DataFrame) -> DataFrame:
        stacked = meta.transform(_score_all(df)).withColumn(
            "stacked_score", vector_to_array("probability")[1]
        )
        return weighted_average_scores(stacked, score_cols)

    scored = _with_ensembles(test)

    # threshold selection on the VAL split (never on test): argmax-F1 of
    # the weighted ensemble's PR curve (metrics.py:121-200)
    from ..operators.evaluation import best_threshold_by_f1

    val_scored = _with_ensembles(val)
    best_t = best_threshold_by_f1(
        val_scored.withColumn("__lbl", F.col(pipeline_cfg.label_col).cast("int")),
        "__lbl",
        "ensemble_score",
        pipeline_cfg.id_col,
    ).collect()
    chosen_threshold = float(best_t[0]["threshold"]) if best_t else 0.5

    metrics = {
        f"model_{i}": evaluate(scored, c, pipeline_cfg.label_col)
        for i, c in enumerate(score_cols)
    }
    metrics["ensemble"] = evaluate(scored, "ensemble_score", pipeline_cfg.label_col)
    metrics["stacked"] = evaluate(scored, "stacked_score", pipeline_cfg.label_col)
    metrics["chosen_threshold"] = chosen_threshold

    imps = feature_importances(
        models[0], num_cols + [f"{c}_idx" for c in categorical_cols], top_n=20
    )
    result = TrainResult(
        metrics=metrics,
        importances=imps,
        n_train=train.count(),
        n_val=val.count(),
        n_test=test.count(),
    )
    prepped.unpersist()
    return result


def main() -> None:
    """CLI twin of the reference's ``python train_pipeline.py``:
    ``python -m financial_fraud_detection_using_time_series_data_spark.plans.train
    [n_rows] [signal]`` trains the 3-seed GBT + ensembles on synthetic
    transactions and prints one JSON metrics line."""
    import json
    import sys

    from ..ml.pipeline import FraudModelConfig
    from ..session import get_spark
    from ..sources import generate_transactions

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    signal = sys.argv[2] if len(sys.argv) > 2 else "mild"
    spark = get_spark(app_name="train")
    txns = generate_transactions(spark, n=n, fraud_rate=0.035, seed=42, signal=signal)
    res = run_training_pipeline(
        spark,
        txns=txns,
        model_cfg=FraudModelConfig(max_iter=30, max_depth=6, seeds=(42, 202, 777)),
        categorical_cols=("ProductCD", "card4", "card6", "DeviceType"),
        max_features=60,
    )
    print(
        json.dumps(
            {
                "n": n,
                "signal": signal,
                "splits": [res.n_train, res.n_val, res.n_test],
                "metrics": res.metrics,
                "top_features": res.importances[:10],
            },
            default=float,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
