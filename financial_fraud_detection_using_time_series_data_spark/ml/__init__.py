from .pipeline import (
    FraudModelConfig,
    add_class_weights,
    build_feature_pipeline,
    evaluate,
    train_gbt,
    train_stacking_ensemble,
    weighted_average_scores,
)

__all__ = [
    "FraudModelConfig",
    "add_class_weights",
    "build_feature_pipeline",
    "evaluate",
    "train_gbt",
    "train_stacking_ensemble",
    "weighted_average_scores",
]
