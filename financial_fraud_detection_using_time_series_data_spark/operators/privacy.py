"""Privacy auditing for training-data pipelines (beyond-reference §2.13):
k-anonymity equivalence-class audits, l-diversity, quasi-identifier
uniqueness risk, and seeded differentially-private noisy counts.

A 100 TB corpus destined for model training carries re-identification
risk that `redact_pii` (pattern scrubbing) alone cannot bound: the
combination of innocuous columns (nation × segment × balance band) can
single out an individual even with every direct identifier removed.
These operators measure that risk the way the anonymity literature
defines it (Sweeney's k-anonymity, Machanavajjhala's l-diversity) and
demonstrate the DP release mechanism for aggregate sharing.

Scale shape: every operator here is ONE map-side-combined groupBy over
the quasi-identifier tuple (plus, for summaries, a second tiny agg over
the |classes| frame) — the cheapest distributed shape there is, linear
in rows, shuffle bounded by |classes|. No windows, no joins, no Python.

Reference scope note: the reference engine has no privacy surface; this
family is part of the beyond-reference training-data-pipeline layer the
build brief names first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _micro_sum(col: Column) -> Column:
    """Order-invariant float fold: per-row 1e-9-grid integer micro-units
    summed exactly (decimal), divided back once — the repo-wide pattern
    for cross-engine float aggregation parity."""
    return (
        F.sum(F.floor(col * F.lit(1e9) + F.lit(0.5)).cast("decimal(38,0)"))
        .cast("double")
        / F.lit(1e9)
    )


def k_anonymity(df: DataFrame, qi_cols: list[str], k: int = 5) -> DataFrame:
    """Per-equivalence-class k-anonymity audit: group on the
    quasi-identifier tuple and flag classes smaller than ``k`` — each
    flagged row is a set of records an adversary joining on the QI
    columns narrows to fewer than k candidates.

    Returns one row per equivalence class: the QI values, ``class_size``
    and ``meets_k``. A dataset is k-anonymous iff every row meets_k.
    One exact-count groupBy; |classes| output rows.
    """
    if not qi_cols:
        raise ValueError("k_anonymity: qi_cols must be non-empty")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
    ).withColumn("meets_k", F.col("class_size") >= F.lit(int(k)))


def l_diversity(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit: k-anonymity is not enough when everyone in an
    equivalence class shares the same SENSITIVE value (the homogeneity
    attack) — the class leaks the secret without identifying anyone.
    Per class this computes

    - ``distinct_l``   distinct sensitive values (distinct l-diversity)
    - ``entropy_l``    exp(H(sensitive | class)), the entropy-l measure
      (≥ distinct-l is stricter; equals distinct_l when uniform)
    - ``meets_l``      distinct_l >= l

    Two-phase exact aggregation: first (QI, sensitive) counts — map-side
    combined — then the per-class entropy fold on the collapsed frame.
    Entropy terms fold on the 1e-9 micro-grid so the float is
    reduction-order invariant (oracle-exact cross-engine).
    """
    if not qi_cols:
        raise ValueError("l_diversity: qi_cols must be non-empty")
    cell = df.groupBy(*qi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__n_sv")
    )
    tot = F.sum("__n_sv")
    # H = ln(total) - sum(n*ln(n))/total, exact-count arithmetic with one
    # micro-grid fold of the n*ln(n) terms
    nlogn = _micro_sum(F.col("__n_sv").cast("double") * F.log("__n_sv"))
    per_class = cell.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("distinct_l"),
        tot.cast("long").alias("class_size"),
        nlogn.alias("__nlogn"),
    )
    h = F.log(F.col("class_size")) - F.col("__nlogn") / F.col("class_size")
    return per_class.select(
        *qi_cols,
        "class_size",
        "distinct_l",
        (F.floor(F.exp(h) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "entropy_l"
        ),
        (F.col("distinct_l") >= F.lit(int(l))).alias("meets_l"),
    )


def qi_uniqueness(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    """Quasi-identifier uniqueness risk profile: the headline numbers a
    privacy review asks for — how many records are UNIQUE on the QI tuple
    (size-1 classes: directly re-identifiable), and how the rest spread
    across risk bands. Returns one row per band (``1``, ``2-5``,
    ``6-20``, ``>20``) with class and record counts and the record share.

    Two aggs: rows → |classes| (map-side combined), |classes| → 4 bands.
    The share divides exact counts, then rounds to the 1e-6 grid.
    """
    if not qi_cols:
        raise ValueError("qi_uniqueness: qi_cols must be non-empty")
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("__sz"))
    band = (
        F.when(F.col("__sz") == 1, F.lit("1"))
        .when(F.col("__sz") <= 5, F.lit("2-5"))
        .when(F.col("__sz") <= 20, F.lit("6-20"))
        .otherwise(F.lit(">20"))
    )
    banded = classes.groupBy(band.alias("class_size_band")).agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("__sz").cast("long").alias("n_records"),
    )
    total = df.count()  # one scalar job; embeds as a literal like nb in
    # record_linkage_scaled (the oracle computes it as a scalar subquery)
    return banded.select(
        "class_size_band",
        "n_classes",
        "n_records",
        (
            F.floor(
                F.col("n_records") / F.lit(float(total)) * F.lit(1e6) + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("record_share"),
    )


def dp_noisy_count(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private release mechanism for group counts:
    count + Laplace(1/ε) noise via inverse-CDF sampling,
    noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|), u ∈ (0,1).

    The uniform u is SEEDED, not random: the md5-prefix BIGINT of
    ``seed:group`` scaled to (0,1) — the repo's engine-portable hash
    (`sample_by_hash` uses the identical construction), so the release
    is reproducible, testable, and oracle-exact. A production release
    would swap the seeded u for a secure RNG; everything else — the
    sensitivity-1 count, the ε-calibrated scale, the post-processing
    floor at 0 — is the real mechanism. Noisy counts round to the 1e-6
    grid (micro-grid convention) and clamp at 0 (post-processing keeps
    ε-DP).

    One exact groupBy; noise is a codegen'd expression on the
    |groups|-row result. Linear, shuffle bounded by |groups|.
    """
    if epsilon <= 0:
        raise ValueError("dp_noisy_count: epsilon must be > 0")
    if not group_cols:
        raise ValueError("dp_noisy_count: group_cols must be non-empty")
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("true_count"))
    key = F.concat_ws(":", F.lit(seed), *[F.col(c).cast("string") for c in group_cols])
    # 8 hex chars -> [0, 2^32); +0.5 shifts off exact 0 so ln(1-2|u-.5|)
    # is finite for every bucket value
    u = (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") + F.lit(0.5)) / F.lit(
        4294967296.0
    )
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(1.0 / float(epsilon))
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    noisy = F.greatest(
        F.floor((F.col("true_count") + noise) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6),
        F.lit(0.0),
    )
    return counts.select(
        *group_cols,
        "true_count",
        noisy.alias("noisy_count"),
    )
