from .scoring import (
    running_stats,
    score_batch,
    build_stream_scorer,
    streaming_dedup,
    streaming_ohlc,
    streaming_session_agg,
    streaming_velocity,
)
from .stateful import stateful_user_features, stateful_user_features_tws

__all__ = [
    "running_stats",
    "score_batch",
    "build_stream_scorer",
    "streaming_dedup",
    "streaming_ohlc",
    "streaming_session_agg",
    "streaming_velocity",
    "stateful_user_features",
    "stateful_user_features_tws",
]
