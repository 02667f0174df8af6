"""Sequence-model inference hosting (SURVEY §2.9 M4).

The reference trains a BiLSTM over per-user sliding windows
(``src/models/lstm_model.py:178-271``) and predicts on ``(N, 10, F)``
tensors. Stock Spark has no LSTM; what the engine preserves is the
INFERENCE-HOSTING pattern every deep sequence model needs at scale:

- sequences built JVM-side by the window engine (W10 ``sliding_sequence``
  — no driver materialization, no Python loop);
- batches cross into Python ONCE via Arrow (``mapInPandas``), shaped
  ``(batch, seq_len)`` — the exact shape a keras/torch
  ``model.predict(batch)`` consumes;
- model weights ride the task closure (broadcast for real weight
  matrices), loaded once per executor, not per row.

The forward pass below is a deterministic logistic head over the
sequence mean — the documented plug-point for a real model is marked. A
real deep-learning runtime is NOT available in this environment, so the
gated import shows the pattern without a hard dependency.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SCORE_SCHEMA = "event_id long, user_id long, seq_score double"


def score_sequences(
    df: DataFrame,
    seq_col: str = "seq",
    w: float = 0.01,
    b: float = -5.0,
) -> DataFrame:
    """Score fixed-length sequence arrays with a vectorized forward pass.

    Input: (event_id, user_id, seq array<double>) with equal-length seqs
    (the W10 full-window filter guarantees this). Output adds
    ``seq_score`` in [0, 1]. One Arrow crossing per partition batch.
    """

    def _forward(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # --- executor-side, once per task ---------------------------------
        # A real model loads here (file pushed via spark.files or a
        # broadcast of the state dict), NOT per batch:
        #
        #   try:
        #       import torch
        #       model = torch.jit.load(model_path).eval()
        #   except ImportError:
        #       model = None   # fall back to the linear head below
        #
        # ------------------------------------------------------------------
        for pdf in batches:
            if not len(pdf):
                continue
            seqs = np.stack(pdf[seq_col].to_numpy())  # (batch, seq_len)
            feat = seqs.mean(axis=1)
            # plug-point: `scores = model(torch.from_numpy(seqs))` — the
            # deterministic logistic head stands in for the trained model
            scores = 1.0 / (1.0 + np.exp(-(w * feat + b)))
            out = pdf[["event_id", "user_id"]].copy()
            out["seq_score"] = scores
            yield out

    return df.mapInPandas(_forward, schema=SCORE_SCHEMA)


def train_sequence_head(
    df: DataFrame,
    seq_col: str = "seq",
    label_col: str = "label",
    max_iter: int = 50,
    reg: float = 0.0,
):
    """TRAIN the sequence head distributed: MLlib LogisticRegression over
    the raw sequence vector (`array_to_vector`, no Python in the fit
    path) — the linear baseline a BiLSTM is benchmarked against, and the
    piece that upgrades the hosting path from a fixed stub to a model
    actually fit on data. Returns ``(weights ndarray(seq_len), bias)``
    exported for the Arrow forward pass below; a deep model would export
    its state dict through the same seam."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    prepped = df.withColumn("__features", array_to_vector(F.col(seq_col)))
    lr = LogisticRegression(
        featuresCol="__features", labelCol=label_col, maxIter=max_iter, regParam=reg
    )
    model = lr.fit(prepped)
    return np.asarray(model.coefficients.toArray()), float(model.intercept)


def score_sequences_trained(
    df: DataFrame,
    weights: "np.ndarray",
    bias: float,
    seq_col: str = "seq",
) -> DataFrame:
    """Host the TRAINED head in the same Arrow `mapInPandas` pattern as
    `score_sequences`: scores = sigmoid(seqs @ w + b), numerically
    identical to `LogisticRegressionModel.transform`'s probability (both
    are float64 sigmoid of the same dot product), so batch-vs-hosted
    parity is testable to 1e-9. Weights ride the task closure (broadcast
    for real weight matrices), loaded once per executor."""
    w = np.asarray(weights, dtype=np.float64)

    def _forward(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            seqs = np.stack(pdf[seq_col].to_numpy())
            scores = 1.0 / (1.0 + np.exp(-(seqs @ w + bias)))
            out = pdf[["event_id", "user_id"]].copy()
            out["seq_score"] = scores
            yield out

    return df.mapInPandas(_forward, schema=SCORE_SCHEMA)
