from .pipeline import (
    FraudModelConfig,
    add_class_weights,
    build_feature_pipeline,
    evaluate,
    train_gbt,
    train_stacking_ensemble,
    weighted_average_scores,
)
from .recurrent import (
    score_sequences_birnn,
    train_sequence_birnn,
)
from .sequence_model import (
    score_sequences_convnet,
    train_sequence_convnet,
)

__all__ = [
    "score_sequences_birnn",
    "train_sequence_birnn",
    "score_sequences_convnet",
    "train_sequence_convnet",
    "FraudModelConfig",
    "add_class_weights",
    "build_feature_pipeline",
    "evaluate",
    "train_gbt",
    "train_stacking_ensemble",
    "weighted_average_scores",
]
