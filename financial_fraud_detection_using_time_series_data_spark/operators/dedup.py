"""Deduplication operators (SURVEY §7 M8): exact, MinHash-LSH, SimHash,
n-gram Jaccard.

Scale design:
- exact: hash-groupBy on a fingerprint — one shuffle keyed by a 128-bit
  hash (uniform, skew-free).
- MinHash+LSH: per-doc signature (map-only) → explode bands → groupBy
  band-hash (the classic bucket join) → pairwise verify only within
  buckets. Candidate pairs ≪ n²; each stage is a bounded shuffle.
- SimHash: 64-bit signature from token hashes; near-dup = small Hamming
  distance within LSH-style prefix buckets.

MinHash permutations are derived from md5(seed || shingle) so the DuckDB
oracle can reproduce them bit-exactly (xxhash64 is Spark-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exprs import r6

from .text import char_shingles, fingerprint, normalize, tokens


def _md5_hash64(col: Column, seed: int) -> Column:
    """Deterministic 63-bit hash reproducible in DuckDB:
    first 15 hex digits of md5(seed || ':' || value) as a BIGINT."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), col))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: canonical row per normalized-text fingerprint (keep the
    min id — deterministic). Returns (fingerprint, keep_id, n_dups)."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of h_i(s),
    where h_i(s) = md5(i || ':' || s) compared LEXICOGRAPHICALLY — md5 hex
    strings are uniform, and string-min is reproducible bit-exactly in the
    DuckDB oracle (integer conversion of hex is not portable SQL).
    Map-only (no shuffle); signature length bounds the state."""
    sh = char_shingles(F.col(text_col), shingle_k)

    # NB: the lambda must take exactly ONE parameter — PySpark dispatches a
    # two-parameter lambda as (element, index), so a captured default arg
    # (lambda s, i=i: ...) silently receives the array-index Column instead
    # of the seed. Bind the seed via a closure factory.
    def _minhash(seed: int):
        prefix = f"{seed}:"
        return F.array_min(F.transform(sh, lambda s: F.md5(F.concat(F.lit(prefix), s))))

    sig = F.array(*[_minhash(i) for i in range(num_hashes)])
    return df.select(F.col(id_col), sig.alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: docs sharing any band of
    the signature. Returns (id_a, id_b) with id_a < id_b, distinct."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signature(df, text_col, id_col, num_hashes, shingle_k)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_sig"),
    ).select(id_col, "band", F.md5(F.concat_ws(",", "band_sig")).alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard similarity.
    Join shingle sets onto pair ids (broadcast if small), compute
    |A∩B| / |A∪B| with array ops."""
    sh = df.select(F.col(id_col), char_shingles(F.col(text_col), shingle_k).alias("sh"))
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return j.select(
        "id_a", "id_b",
        r6(inter / F.nullif(union.cast("double"), F.lit(0.0))).alias("jaccard"),
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash signature: sign-sum of per-token hash bits. Near-dups have
    small Hamming distance. Map-only."""
    toks = tokens(F.col(text_col))
    tok_hash = F.transform(toks, lambda t: _md5_hash64(t, 9999))

    # closure factory: F.aggregate's merge lambda must be exactly 2-arg
    # (see minhash_signature note on PySpark lambda arity dispatch)
    def _bit_contrib(bit: int):
        return F.aggregate(
            tok_hash,
            F.lit(0),
            lambda acc, h: acc + F.when(F.shiftright(h, bit) % 2 == 1, 1).otherwise(-1),
        )

    bit_cols = []
    for b in range(bits):
        contrib = _bit_contrib(b)
        bit_cols.append(F.when(contrib > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long")))
    sig = bit_cols[0]
    for c in bit_cols[1:]:
        sig = sig + c
    return df.select(F.col(id_col), sig.alias("simhash"))
