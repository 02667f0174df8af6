from . import windows, relational, evaluation, dedup, similarity, text, multimodal

__all__ = [
    "windows",
    "relational",
    "evaluation",
    "dedup",
    "similarity",
    "text",
    "multimodal",
]
