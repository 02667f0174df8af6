"""TRAINED bidirectional recurrent sequence model with additive
attention (SURVEY §2.9 M4 — the full architecture role of the
reference's BiLSTM+attention, ``src/models/lstm_model.py:25-176``,
re-expressed for a cluster without a deep-learning runtime).

Architecture (numpy, scalar-input sequences):

- forward tanh RNN  h_t = tanh(x_t·Wxf + Whf·h_{t-1} + bf)
- backward tanh RNN over the reversed sequence (independent params)
- per-step state u_t = [h_fwd_t ; h_bwd_t]  (the "Bi")
- additive (Bahdanau) attention: e_t = va·tanh(Wa·u_t + ba),
  α = softmax(e), context c = Σ α_t u_t  (the reference's attention
  layer, lstm_model.py:58-71)
- logistic head on the context vector.

Training is DISTRIBUTED synchronous full-batch gradient descent with
driver-side Adam — the same data-parallel layout as
``sequence_model.train_sequence_convnet``:

- the ~150-float parameter vector rides the task closure each epoch;
- ONE ``mapInPandas`` pass per epoch computes per-partition
  (gradient-sum, loss-sum, count) via vectorized BPTT — Arrow batches,
  never a Python row loop;
- the driver reduces partials IN PARTITION-ID ORDER (deterministic
  float reduction, bit-identical re-runs) and takes one Adam step
  (Adam state lives only on the driver; executors are stateless).

At 100 TB the loop shape holds: the gradient pass is a shuffle-free
scan, and per-epoch driver state is ``n_partitions × |params|``
doubles, independent of row count.

Why this exists next to the conv net: mean-pooled convolution is
blind to the ORDER of local patterns more than a window apart (the
pooled feature bag is position-invariant), while the recurrent state
carries order. The planted order-signal test pins exactly this
separation (conv AUC ≈ 0.5, BiRNN+attention AUC ≥ 0.9).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "init_birnn_params",
    "birnn_forward",
    "birnn_grads",
    "train_sequence_birnn",
    "score_sequences_birnn",
]

_KEYS = ("Wxf", "Whf", "bf", "Wxb", "Whb", "bb", "Wa", "ba", "va", "wd", "bd")


def init_birnn_params(
    hidden: int = 6, attn: int = 4, seed: int = 7
) -> dict[str, np.ndarray]:
    """Deterministic init. Shapes depend only on (hidden, attn); the
    recurrence runs over any sequence length."""
    rng = np.random.default_rng(seed)
    H, A = hidden, attn
    s = 0.5
    return {
        "Wxf": rng.normal(0, s, H),
        "Whf": rng.normal(0, s / np.sqrt(H), (H, H)),
        "bf": np.zeros(H),
        "Wxb": rng.normal(0, s, H),
        "Whb": rng.normal(0, s / np.sqrt(H), (H, H)),
        "bb": np.zeros(H),
        "Wa": rng.normal(0, s, (A, 2 * H)),
        "ba": np.zeros(A),
        "va": rng.normal(0, s, A),
        "wd": rng.normal(0, s, 2 * H),
        "bd": np.zeros(()),
    }


def _flatten(p: dict[str, np.ndarray]) -> np.ndarray:
    return np.concatenate([np.asarray(p[k]).ravel() for k in _KEYS])


def _unflatten(vec: np.ndarray, hidden: int, attn: int) -> dict[str, np.ndarray]:
    H, A = hidden, attn
    shapes = [
        (H,), (H, H), (H,), (H,), (H, H), (H,),
        (A, 2 * H), (A,), (A,), (2 * H,), (),
    ]
    out: dict[str, np.ndarray] = {}
    i = 0
    for k, sh in zip(_KEYS, shapes):
        n = int(np.prod(sh)) if sh else 1
        out[k] = vec[i : i + n].reshape(sh)
        i += n
    return out


def birnn_forward(X: np.ndarray, p: dict[str, np.ndarray]):
    """Vectorized-over-batch forward. X: (N, L). Returns (prob, cache)."""
    N, L = X.shape
    H = p["bf"].shape[0]
    hf = np.zeros((N, L, H))
    hb = np.zeros((N, L, H))
    h = np.zeros((N, H))
    for t in range(L):
        h = np.tanh(np.outer(X[:, t], p["Wxf"]) + h @ p["Whf"].T + p["bf"])
        hf[:, t] = h
    h = np.zeros((N, H))
    for t in range(L - 1, -1, -1):
        h = np.tanh(np.outer(X[:, t], p["Wxb"]) + h @ p["Whb"].T + p["bb"])
        hb[:, t] = h
    U = np.concatenate([hf, hb], axis=2)                          # (N, L, 2H)
    S = np.tanh(np.einsum("ntk,ak->nta", U, p["Wa"]) + p["ba"])   # (N, L, A)
    e = S @ p["va"]                                               # (N, L)
    e = e - e.max(axis=1, keepdims=True)
    alpha = np.exp(e)
    alpha /= alpha.sum(axis=1, keepdims=True)
    c = np.einsum("nt,ntk->nk", alpha, U)                         # (N, 2H)
    logit = c @ p["wd"] + p["bd"]
    prob = 1.0 / (1.0 + np.exp(-logit))
    return prob, (hf, hb, U, S, alpha, c)


def birnn_grads(
    X: np.ndarray, y: np.ndarray, p: dict[str, np.ndarray]
) -> tuple[dict[str, np.ndarray], float]:
    """Sum (not mean) of BCE gradients + summed loss over the batch via
    backprop-through-time — partial sums compose across partitions; the
    driver divides by the global count. Numerically pinned against
    central differences to 1e-4 relative (test_ml_pipeline)."""
    N, L = X.shape
    H = p["bf"].shape[0]
    prob, (hf, hb, U, S, alpha, c) = birnn_forward(X, p)
    eps = 1e-12
    loss = -np.sum(y * np.log(prob + eps) + (1 - y) * np.log(1 - prob + eps))
    dlogit = prob - y
    g = {k: np.zeros_like(np.asarray(p[k])) for k in _KEYS}
    g["wd"] = c.T @ dlogit
    g["bd"] = np.asarray(np.sum(dlogit))
    dc = np.outer(dlogit, p["wd"])                                # (N, 2H)
    # attention backward (softmax + additive score)
    dalpha = np.einsum("nk,ntk->nt", dc, U)
    dU = alpha[:, :, None] * dc[:, None, :]
    de = alpha * (dalpha - np.sum(alpha * dalpha, axis=1, keepdims=True))
    g["va"] = np.einsum("nt,nta->a", de, S)
    dApre = (de[:, :, None] * p["va"]) * (1.0 - S * S)
    g["Wa"] = np.einsum("nta,ntk->ak", dApre, U)
    g["ba"] = dApre.sum(axis=(0, 1))
    dU += np.einsum("nta,ak->ntk", dApre, p["Wa"])
    dhf, dhb = dU[:, :, :H], dU[:, :, H:]
    # BPTT, forward direction (iterate time backwards)
    carry = np.zeros((N, H))
    for t in range(L - 1, -1, -1):
        dz = (dhf[:, t] + carry) * (1.0 - hf[:, t] ** 2)
        g["Wxf"] += X[:, t] @ dz
        g["Whf"] += dz.T @ (hf[:, t - 1] if t > 0 else np.zeros((N, H)))
        g["bf"] += dz.sum(axis=0)
        carry = dz @ p["Whf"]
    # BPTT, backward direction (iterate time forwards)
    carry = np.zeros((N, H))
    for t in range(L):
        dz = (dhb[:, t] + carry) * (1.0 - hb[:, t] ** 2)
        g["Wxb"] += X[:, t] @ dz
        g["Whb"] += dz.T @ (hb[:, t + 1] if t < L - 1 else np.zeros((N, H)))
        g["bb"] += dz.sum(axis=0)
        carry = dz @ p["Whb"]
    return g, float(loss)


def train_sequence_birnn(
    df: DataFrame,
    seq_col: str = "seq",
    label_col: str = "label",
    hidden: int = 6,
    attn: int = 4,
    epochs: int = 60,
    lr: float = 0.05,
    seed: int = 7,
) -> tuple[dict[str, np.ndarray], list[float]]:
    """Distributed synchronous full-batch training with driver-side
    Adam. One Spark job per epoch; cache ``df`` before calling — every
    epoch re-scans it. Returns (params, per-epoch mean-loss history)."""
    from pyspark import TaskContext

    p = init_birnn_params(hidden, attn, seed)
    grad_schema = "pid int, grad array<double>, loss double, n long"
    history: list[float] = []
    flat = _flatten(p)
    m = np.zeros_like(flat)
    v = np.zeros_like(flat)
    b1, b2, a_eps = 0.9, 0.999, 1e-8

    for ep in range(1, epochs + 1):
        cur_flat = flat.copy()

        def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cur = _unflatten(cur_flat, hidden, attn)
            acc = np.zeros_like(cur_flat)
            loss_sum = 0.0
            n = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf[seq_col].to_numpy()).astype(np.float64)
                yv = pdf[label_col].to_numpy().astype(np.float64)
                g, loss = birnn_grads(X, yv, cur)
                acc += _flatten(g)
                loss_sum += loss
                n += len(pdf)
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame(
                {"pid": [pid], "grad": [acc.tolist()], "loss": [loss_sum], "n": [n]}
            )

        rows = sorted(
            df.select(seq_col, label_col).mapInPandas(_partials, grad_schema).collect(),
            key=lambda r: r.pid,
        )
        total_n = sum(r.n for r in rows)
        if total_n == 0:
            raise ValueError("empty training frame")
        grad = np.zeros_like(flat)
        loss = 0.0
        for r in rows:
            grad += np.asarray(r.grad)
            loss += r.loss
        gf = grad / total_n
        m = b1 * m + (1 - b1) * gf
        v = b2 * v + (1 - b2) * gf * gf
        flat = flat - lr * (m / (1 - b1**ep)) / (np.sqrt(v / (1 - b2**ep)) + a_eps)
        history.append(loss / total_n)
    return _unflatten(flat, hidden, attn), history


SCORE_SCHEMA = "event_id long, user_id long, seq_score double"


def score_sequences_birnn(
    df: DataFrame,
    params: dict[str, np.ndarray],
    seq_col: str = "seq",
) -> DataFrame:
    """Host the trained BiRNN in the same Arrow ``mapInPandas`` pattern
    as the conv/linear scorers: weights ride the task closure, one
    Python crossing per batch, vectorized forward, map-only plan."""

    def _forward(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[seq_col].to_numpy()).astype(np.float64)
            prob, _ = birnn_forward(X, params)
            out = pdf[["event_id", "user_id"]].copy()
            out["seq_score"] = prob
            yield out

    return df.mapInPandas(_forward, schema=SCORE_SCHEMA)
