"""Multimodal column plumbing (SURVEY §7 M8): image/audio/video as opaque
``binary`` columns + typed metadata structs.

The Spark-side architecture is real and tested — schema, partition-aware
batching via mapInPandas (Arrow), UDF signatures, frame-sampling shapes.
The codec step itself is stubbed (no PIL/ffmpeg in this container) behind
`decode_stub`, a deterministic fake keyed on the byte content, clearly
marked; swap in a real decoder by replacing one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("content_hash", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def decode_stub(content: bytes, dim: int = 8) -> list[float]:
    """STUB decoder: deterministic pseudo-feature from the md5 of the
    bytes. Replace with a real image/audio decode (PIL / torchaudio) in a
    container that has the libs; the Spark plumbing is unchanged."""
    if content is None:
        return [0.0] * dim
    h = hashlib.md5(content).digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Batch feature extraction over binary media via mapInPandas — Arrow
    batches in, Arrow batches out; never a row at a time. Partitioning of
    the input is preserved (map-only, no shuffle)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "content_hash": pdf["content"].map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feature": pdf["content"].map(lambda b: decode_stub(b, dim)),
                }
            )
            yield out

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (sequence + explode — JVM-side), ready for a decoder UDF.
    The per-frame decode is the stub above."""
    frames = F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (bytes derived from id)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        content = hashlib.sha256(str(i).encode()).digest() * (1 + i % 4)
        rows.append(
            (i, kind, bytearray(content), f"application/x-{kind}", 64, 48, 3000 if kind == "video" else None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
