"""Probabilistic record linkage (Fellegi–Sunter): blocked candidate
generation + log-likelihood match scoring — the entity-resolution step a
curation pipeline runs after dedup candidate generation (SNM / LSH
pairs) to decide which near-matches are the SAME real-world entity.

Spark-first shape: blocking is a capped within-block self-join (the
same skew discipline as `events.shared_attr_edges` — an oversized block
means the blocking key is too coarse, and production re-blocks it with
a finer key rather than paying C(n, 2)); scoring is a pure projection
of per-field agreement weights, fully codegen'd, no UDFs, no shuffle
beyond the block join itself.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["FieldComparison", "block_pairs", "fellegi_sunter"]


@dataclass(frozen=True)
class FieldComparison:
    """One field-agreement rule: ``agree`` is any boolean Column over
    the pair frame (exact equality, bucketed equality, tolerance bands,
    prefix match, …). ``m`` = P(agree | same entity), ``u`` =
    P(agree | different entities) — the classic m/u probabilities,
    estimated offline (EM or clerical review) and passed in as
    constants."""

    name: str
    agree: Column
    m: float
    u: float


def block_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    attr_cols: list[str],
    max_block: int = 10_000,
) -> DataFrame:
    """Within-block candidate pairs (id_a < id_b) carrying both sides'
    attributes as ``<attr>_a`` / ``<attr>_b``.

    Blocks with more than ``max_block`` members are DROPPED, not
    truncated — an oversized block is a blocking-key defect (pair count
    grows C(n, 2)); the standard fix is a finer key, and silently
    sampling pairs would bias downstream m/u estimation. The cap is one
    broadcast-joined |blocks|-row dim; the pair join shuffles on the
    block key only.
    """
    cnt = df.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("__bn"))
    ok = cnt.where(F.col("__bn") <= max_block).select(*block_cols)
    base = df.join(F.broadcast(ok), block_cols)
    a = base.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in attr_cols],
    )
    b = base.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in attr_cols],
    )
    return a.join(b, block_cols).where(F.col("id_a") < F.col("id_b"))


def fellegi_sunter(
    pairs: DataFrame,
    comparisons: list[FieldComparison],
    lower: float = 0.0,
    upper: float = 8.0,
) -> DataFrame:
    """Score candidate pairs with Fellegi–Sunter log-likelihood weights:
    each field contributes log2(m/u) on agreement and
    log2((1−m)/(1−u)) on disagreement; the total decides
    match / possible / non_match against the (lower, upper) thresholds.

    Weights are folded into literal doubles at plan-build time, so the
    whole scorer is one codegen'd projection — the oracle embeds the
    identical literals. NULL agreement evaluates as disagreement
    (coalesce false): absent evidence argues against a match exactly as
    a failed comparison does.
    """
    total = F.lit(0.0)
    out_cols = []
    for c in comparisons:
        w_agree = math.log2(c.m / c.u)
        w_dis = math.log2((1.0 - c.m) / (1.0 - c.u))
        agree = F.coalesce(c.agree, F.lit(False))
        out_cols.append(agree.alias(f"agree_{c.name}"))
        total = total + F.when(agree, F.lit(w_agree)).otherwise(F.lit(w_dis))
    scored = pairs.select("*", *out_cols, total.alias("fs_weight"))
    verdict = (
        F.when(F.col("fs_weight") >= F.lit(upper), F.lit("match"))
        .when(F.col("fs_weight") >= F.lit(lower), F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )
    return scored.withColumn("fs_class", verdict)
