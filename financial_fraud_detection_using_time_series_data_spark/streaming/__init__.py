from .scoring import score_batch, build_stream_scorer, streaming_velocity

__all__ = ["score_batch", "build_stream_scorer", "streaming_velocity"]
