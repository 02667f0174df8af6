from .fraud_pipeline import engineer_features, preprocess, FraudPipelineConfig

__all__ = ["engineer_features", "preprocess", "FraudPipelineConfig"]
