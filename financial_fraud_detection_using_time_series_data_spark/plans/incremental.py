"""Daily-ingest incremental maintenance: the composition a 100 TB corpus
pipeline actually runs every day — fold a delta batch into persisted
state tables without re-scanning history.

The reference recomputes everything from raw CSVs on every run
(``train_pipeline.py:41-57``); at scale the only viable shape is
maintained state + mergeable partials:

- per-key MOMENTS via `relational.group_moments` + Chan's
  `merge_moments` (O(|keys|) fold),
- per-day DISTINCT-USER sketches via `sketches.hll_partial`, re-merged
  per day so same-day reloads collapse (`hll_union_agg` is idempotent
  under re-union of the same stream's partials),
- per-value COUNTS (the trivially mergeable aggregate) feeding
  heavy-hitter reports.

Near-dup maintenance composes the same way through the persisted MinHash
signature index (`dedup.dedup_incremental`) — kept separate because its
state is index-shaped, not aggregate-shaped.

Every update touches ONLY the delta batch plus aggregate-sized state
frames; a year of state is |keys| + 365 sketches + |values| rows. The
invariant (update-folded state == recompute-from-scratch) is test-pinned
at a day-boundary split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import relational, sketches


def init_state(
    batch: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> dict[str, DataFrame]:
    """Build first-day state from the initial batch. Each state table is
    an aggregate-sized partial; persist them (parquet) between runs."""
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    return {
        "moments": relational.group_moments(batch, [key_col], value_col),
        "user_sketches": sketches.hll_partial(
            batch.select(day, user_col), ("day",), user_col
        ),
        "value_counts": batch.groupBy(
            F.col(value_col).alias("value")
        ).agg(F.count(F.lit(1)).alias("n")),
    }


def update_state(
    state: dict[str, DataFrame],
    batch: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> dict[str, DataFrame]:
    """Fold a delta batch into the state. Cost: one scan of the BATCH for
    its partials + merges over aggregate-sized frames. History is never
    re-read."""
    delta = init_state(batch, key_col, ts_col, user_col, value_col)
    return {
        "moments": relational.merge_moments(
            state["moments"], delta["moments"], [key_col]
        ),
        # union then re-merge per day: same-day partial loads collapse to
        # one sketch row; distinct days pass through untouched
        "user_sketches": state["user_sketches"]
        .unionByName(delta["user_sketches"])
        .groupBy("day")
        .agg(F.hll_union_agg("hll_sketch").alias("hll_sketch")),
        "value_counts": state["value_counts"]
        .unionByName(delta["value_counts"])
        .groupBy("value")
        .agg(F.sum("n").alias("n")),
    }


def state_report(state: dict[str, DataFrame]) -> DataFrame:
    """One-row health summary from state alone (no raw-data scan):
    per-key row counts folded, total distinct users (all-days sketch
    union), distinct tracked values."""
    total_rows = state["moments"].agg(F.sum("n").alias("n_rows"))
    users = state["user_sketches"].agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias(
            "approx_users"
        )
    )
    vals = state["value_counts"].agg(
        F.count(F.lit(1)).alias("n_distinct_values")
    )
    return total_rows.crossJoin(users).crossJoin(vals)
