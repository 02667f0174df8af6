from .scoring import (
    score_batch,
    build_stream_scorer,
    streaming_dedup,
    streaming_velocity,
)
from .stateful import stateful_user_features

__all__ = [
    "score_batch",
    "build_stream_scorer",
    "streaming_dedup",
    "streaming_velocity",
    "stateful_user_features",
]
