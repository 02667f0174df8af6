from .fraud_pipeline import engineer_features, preprocess, FraudPipelineConfig
from .train import TrainResult, run_training_pipeline

__all__ = [
    "engineer_features",
    "preprocess",
    "FraudPipelineConfig",
    "TrainResult",
    "run_training_pipeline",
]
