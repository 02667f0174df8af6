from .fraud_pipeline import (
    FraudPipelineConfig,
    engineer_features,
    engineer_features_split_compat,
    preprocess,
)
from .introspect import assert_plan, plan_metrics
from .train import TrainResult, run_training_pipeline

__all__ = [
    "engineer_features",
    "engineer_features_split_compat",
    "preprocess",
    "FraudPipelineConfig",
    "TrainResult",
    "run_training_pipeline",
    "assert_plan",
    "plan_metrics",
]
