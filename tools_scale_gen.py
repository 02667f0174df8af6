"""Generate the `.scale/sf1.0` probe corpus: a 10x FK-consistent
key-shifted replication of the driver's sf0.1 parquet tables.

Growth model (matches SCALE.md "Round 8: measured scale decade"):
- every entity domain (custkey, suppkey, partkey, orderkey, event_id,
  user_id, doc_id, vec_id) gets a per-replica offset of 10_000_000 * r,
  so FK joins stay consistent WITHIN a replica and never collide across
  replicas — entity count scales 10x at constant per-entity history
  (the "more users" growth axis);
- fixed-cardinality attributes (nation, region, mktsegment, event_type,
  lang, brand, returnflag, ...) stay fixed, as they do in real data —
  this is exactly what makes fixed-cardinality BLOCKING keys go
  quadratic, the defect the probe exists to measure;
- timestamps are unchanged, so time-bucketed rollups densify (the
  "same days, more rows" axis);
- replica 0 is the original data byte-for-byte; replicas 1..9 perturb
  free-text/name columns with a replica suffix so content-hash families
  (minhash/simhash/embedding LSH) see 10x corpora, not 10 exact copies
  of one corpus (exact-dup structure within each replica is preserved).

region/nation are dimension tables with fixed real-world cardinality:
copied once, unshifted.

Usage: python tools_scale_gen.py [src_sf_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> .scale/sf1.0
Deterministic; ~25s. Safe to re-run (overwrites).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 10_000_000
REPLICAS = 10

# key columns shifted by OFFSET*r per replica (FK-consistent: the same
# offset applies to a key wherever it appears)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# free-text columns that get a replica suffix (r>=1) so content-hash
# dedup families see genuinely distinct per-replica corpora
TEXT_COLS = {
    "customer": ["c_name"],
    "supplier": ["s_name"],
    "part": ["p_name"],
    "documents": ["text"],
}


def replicate(table: pa.Table, name: str, r: int) -> pa.Table:
    if r == 0:
        return table
    cols = {}
    for field in table.schema:
        col = table.column(field.name)
        if field.name in KEY_COLS.get(name, ()):
            col = pc.add(col, pa.scalar(OFFSET * r, type=field.type))
        elif field.name in TEXT_COLS.get(name, ()):
            col = pc.binary_join_element_wise(
                col.cast(pa.string()), pa.scalar(f" r{r}"), ""
            )
        cols[field.name] = col
    return pa.table(cols, schema=pa.schema(
        [pa.field(f.name, cols[f.name].type) for f in table.schema]
    ))


def perturb_embeddings(table: pa.Table, r: int) -> pa.Table:
    """Replicas r>=1 get a small deterministic rotation-free jitter so
    embedding-LSH buckets grow ~10x in count, not 10x in multiplicity of
    identical vectors (which would be a degenerate scale axis)."""
    if r == 0:
        return table
    emb = table.column("embedding").combine_chunks()
    flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float32)
    rng = np.random.default_rng(123457 + r)
    flat = flat + rng.normal(0.0, 0.01, size=flat.shape).astype(np.float32)
    jittered = pa.ListArray.from_arrays(emb.offsets, pa.array(flat, pa.float32()))
    idx = table.schema.get_field_index("embedding")
    return table.set_column(idx, table.schema.field(idx), jittered.cast(table.schema.field(idx).type))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scale/sf1.0"
    )
    os.makedirs(dst, exist_ok=True)
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")
        print(f"{t}: copied (fixed dimension)")
    for t in KEY_COLS:
        base = pq.read_table(f"{src}/{t}.parquet")
        reps = []
        for r in range(REPLICAS):
            rep = replicate(base, t, r)
            if t == "embeddings":
                rep = perturb_embeddings(rep, r)
            reps.append(rep)
        out = pa.concat_tables(reps)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
