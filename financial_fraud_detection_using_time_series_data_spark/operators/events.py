"""Event-sequence analytics (beyond-reference): Markov transition
matrices, ordered funnels, cohort retention.

The reference's behavioral features (``src/features/engineer.py:72-141``)
treat each user's event stream as an ordered series; these operators mine
the same streams at the *population* level — which event follows which,
how users progress through an ordered goal funnel, and how cohorts decay
over calendar time. All three are single-pass window/agg compositions:
the event table is shuffled at most once (on the entity key), and every
output is a tiny aggregate frame.

Scale notes (100 TB):
- ``transition_matrix``: one exchange on the entity key for the lag
  window, then a groupBy on (prev, next) whose cardinality is |types|²
  — map-side combine collapses it before the second (tiny) shuffle. The
  probability normalization runs on the aggregated frame (|types|² rows),
  not the corpus.
- ``funnel``: one exchange on the entity key; the K per-step windows are
  all unordered frames over the SAME partitioning, so Catalyst reuses a
  single exchange for every step, and the follow-up per-entity groupBy
  reuses it again (same hash key). Output is K rows.
- ``cohort_retention``: one exchange on the entity key for the cohort
  window, one distinct on (entity, cohort, period) — bounded by active
  entity-periods, not events — then a groupBy on (cohort, age) which is
  O(weeks²) tiny. Retention normalizes against the age-0 row via a
  window over the aggregate frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import exprs as E


def transition_matrix(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    *tiebreak: str,
) -> DataFrame:
    """First-order Markov transition counts + probabilities between
    consecutive event types within each entity's timeline.

    Returns (prev_type, next_type, n, p) where p is row-normalized per
    prev_type (each prev row sums to 1). First event per entity has no
    predecessor and is excluded.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, *tiebreak)
    pairs = (
        df.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    per_prev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        E.r6(F.col("n") / F.sum("n").over(per_prev)).alias("p"),
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: how many entities completed step[0], then step[1]
    strictly AFTER their first step[0], then step[2] strictly after that
    step[1], and so on. An out-of-order occurrence (e.g. a purchase before
    the signup) does not count toward the later step.

    Returns one row per step: (step, step_idx, entities_reached,
    conversion) where conversion is relative to step[0]'s count.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(entity_col)
    cur = df.select(entity_col, ts_col, type_col)
    prev_t = None
    t_cols = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == F.lit(step)
        if prev_t is not None:
            cond = cond & F.col(prev_t).isNotNull() & (F.col(ts_col) > F.col(prev_t))
        t_col = f"__t{i}"
        # Unordered min-over-partition; every step shares one exchange.
        cur = cur.withColumn(t_col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev_t = t_col
        t_cols.append(t_col)
    per_entity = cur.groupBy(entity_col).agg(
        *[F.max(t).alias(t) for t in t_cols]
    )
    totals = per_entity.agg(
        *[F.count(t).alias(f"__c{i}") for i, t in enumerate(t_cols)]
    )
    # escape single quotes in step names — they are interpolated into a
    # stack() SQL string and would otherwise parse-error / inject
    stack_args = ", ".join(
        f"""'{s.replace("'", "''")}', {i + 1}, __c{i}""" for i, s in enumerate(steps)
    )
    rows = totals.select(
        F.expr(
            f"stack({len(steps)}, {stack_args}) AS (step, step_idx, entities_reached)"
        )
    )
    first = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return rows.select(
        "step",
        F.col("step_idx").cast("int").alias("step_idx"),
        F.col("entities_reached").cast("long").alias("entities_reached"),
        E.r6(
            F.try_divide(
                F.col("entities_reached"),
                F.max(F.when(F.col("step_idx") == 1, F.col("entities_reached"))).over(first),
            )
        ).alias("conversion"),
    )


def cohort_retention(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: entities are cohorted by the ISO week of
    their first event; for each (cohort, age-in-weeks) cell, count the
    distinct entities active that week and normalize by the cohort's
    age-0 size.

    Returns (cohort, age_weeks, n_active, retention).
    """
    w = Window.partitionBy(entity_col)
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    activity = (
        df.select(
            F.col(entity_col).alias("__e"),
            week.alias("week"),
            F.min(week).over(w).alias("cohort"),
        )
        .distinct()
    )
    cells = (
        activity.groupBy(
            "cohort",
            (F.datediff(F.col("week"), F.col("cohort")) / 7).cast("int").alias("age_weeks"),
        )
        .agg(F.count_distinct("__e").alias("n_active"))
    )
    per_cohort = Window.partitionBy("cohort")
    return cells.select(
        "cohort",
        "age_weeks",
        "n_active",
        E.r6(
            F.col("n_active")
            / F.max(F.when(F.col("age_weeks") == 0, F.col("n_active"))).over(per_cohort)
        ).alias("retention"),
    )


def shared_attribute_degree(
    df: DataFrame,
    attr,
    entity_col: str = "user_id",
    id_col: str = "event_id",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fraud-ring linking signal: for each event, how many DISTINCT
    entities share the event's attribute value (device id, card hash,
    IP...). Degree ≫ 1 on an attribute that should be personal is the
    classic shared-infrastructure flag.

    Plan shape: distinct (attr, entity) — two-phase agg — collapses the
    corpus to the linking graph's edge list before the degree count; the
    (attr, degree) dim is |attr values| rows and broadcast back onto the
    fact, so the full table is never shuffled. For an attribute with
    unbounded cardinality drop ``broadcast_dim`` and let AQE pick the
    join (the dim is still edge-list-sized, not corpus-sized).
    """
    from pyspark.sql import functions as F

    base = df.select(F.col(id_col), F.col(entity_col), attr.alias("__attr"))
    deg = (
        base.select("__attr", entity_col)
        .distinct()
        .groupBy("__attr")
        .agg(F.count(F.lit(1)).alias("n_entities_sharing"))
    )
    d = F.broadcast(deg) if broadcast_dim else deg
    return base.join(d, "__attr", "left").select(
        id_col,
        entity_col,
        F.col("__attr").alias("attr_value"),
        F.coalesce("n_entities_sharing", F.lit(0)).alias("n_entities_sharing"),
        (F.coalesce("n_entities_sharing", F.lit(0)) > F.lit(1)).alias("is_shared"),
    )


def fraud_rings(
    df: DataFrame,
    attr,
    entity_col: str = "user_id",
    min_degree: int = 2,
    max_degree: int = 10,
    max_iter: int = 20,
) -> DataFrame:
    """Fraud-ring detection: entities transitively linked through shared
    attribute values (same card hash, device id, or — here — the same
    exact transaction amounts) are collapsed into rings via connected
    components. Returns (entity, ring_id, ring_size); singletons are
    excluded (they're not rings).

    ``[min_degree, max_degree]`` bounds which attribute values LINK:
    degree 1 links nothing, and a high-degree value (a default amount, a
    shared office IP) is noise, not a ring — dropping it also removes the
    quadratic-edge hazard, the same degenerate-bucket discipline as the
    LSH dedup caps. Each linking value emits STAR edges to its min
    entity (degree-1 fan-out, never u² pairs).

    Plan shape: distinct (attr, entity) collapses the corpus first; the
    degree/hub dim is |linking values| rows; edges are edge-list-sized.
    Components run on the existing min-label + pointer-jumping engine
    (`dedup.connected_components` — O(log diameter) rounds, checkpointed
    lineage); ring size is one window over the (entity, ring) result.
    """
    from pyspark.sql import functions as F

    from . import dedup

    a = (
        df.select(attr.alias("__attr"), F.col(entity_col))
        .where(F.col("__attr").isNotNull())
        .distinct()
    )
    d = (
        a.groupBy("__attr")
        .agg(F.count(F.lit(1)).alias("deg"), F.min(entity_col).alias("hub"))
        .where((F.col("deg") >= min_degree) & (F.col("deg") <= max_degree))
    )
    edges = (
        a.join(d, "__attr")
        .where(F.col(entity_col) != F.col("hub"))
        .select(F.col("hub").alias("id_a"), F.col(entity_col).alias("id_b"))
        .distinct()
    )
    cc = dedup.connected_components(edges, "id_a", "id_b", max_iter=max_iter)
    ring = Window.partitionBy("component")
    return cc.select(
        F.col("node").alias(entity_col),
        F.col("component").alias("ring_id"),
        F.count(F.lit(1)).over(ring).alias("ring_size"),
    )


def conversion_latency(
    df: DataFrame,
    from_step: str,
    to_step: str,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-entity conversion latency: time from the FIRST ``from_step``
    to the FIRST ``to_step`` at a strictly later timestamp. Entities
    that never reach ``from_step`` are excluded; entities that reach it
    but never convert stay with NULL latency (right-censored — dropping
    them would bias any downstream survival/latency statistic).

    Returns (entity, converted, latency_us). Latency is exact integer
    microseconds — no float rounding to reconcile across engines.

    Plan shape: two unordered min-over-partition windows + the
    per-entity rollup, all hashed on the entity key — one exchange over
    the event table, same contract as `funnel` (it IS the two-step
    funnel, keeping the per-entity rows instead of the K-row summary).
    """
    w = Window.partitionBy(entity_col)
    t0 = F.min(
        F.when(F.col(type_col) == F.lit(from_step), F.col(ts_col))
    ).over(w)
    step2 = (
        (F.col(type_col) == F.lit(to_step))
        & F.col("__t0").isNotNull()
        & (F.col(ts_col) > F.col("__t0"))
    )
    cur = (
        df.select(entity_col, ts_col, type_col)
        .withColumn("__t0", t0)
        .withColumn("__t1", F.min(F.when(step2, F.col(ts_col))).over(w))
    )
    per_entity = (
        cur.groupBy(entity_col)
        .agg(F.max("__t0").alias("__t0"), F.max("__t1").alias("__t1"))
        .where(F.col("__t0").isNotNull())
    )
    return per_entity.select(
        entity_col,
        F.col("__t1").isNotNull().alias("converted"),
        (E.epoch_us(F.col("__t1")) - E.epoch_us(F.col("__t0"))).alias("latency_us"),
    )
