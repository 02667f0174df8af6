"""Physical-plan introspection: turn a DataFrame's executed plan into a
metrics row — the programmatic form of the `.explain()`-and-eyeball
loop this engine's plan-quality tests run by hand.

A 100 TB deployment gates releases on plan REGRESSIONS (a dim that
stopped broadcasting, a window that lost its partition spec, Python
that crept into a hot path) long before they show up as wall-clock;
`plan_metrics` is that gate as data. The operator counts come from the
final (post-AQE-prepared) physical plan string — the same artifact
`tests/test_plan_quality.py` asserts against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["plan_metrics", "assert_plan"]

_COUNTERS = {
    "n_exchanges": "Exchange hashpartitioning",
    "n_single_partition_exchanges": "Exchange SinglePartition",
    "n_broadcasts": "BroadcastExchange",
    "n_broadcast_joins": "BroadcastHashJoin",
    "n_sort_merge_joins": "SortMergeJoin",
    "n_nested_loop_joins": "BroadcastNestedLoopJoin",
    "n_cartesian": "CartesianProduct",
    "n_windows": "Window ",
    "n_hash_aggregates": "HashAggregate",
    "n_sorts": "Sort ",
    "n_takeordered": "TakeOrderedAndProject",
    "n_python_row_udf": "BatchEvalPython",
    "n_python_arrow": "ArrowEvalPython",
    "n_map_in_pandas": "MapInPandas",
    "n_scans": "FileScan",
}


def plan_metrics(df: DataFrame) -> dict[str, int]:
    """Operator census of ``df``'s executed physical plan. Pure driver-
    side string analysis — builds the plan, runs nothing."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = {k: plan.count(tok) for k, tok in _COUNTERS.items()}
    out["pushed_filters"] = int("PushedFilters: [" in plan and "PushedFilters: []" not in plan)
    return out


def assert_plan(df: DataFrame, **bounds: int) -> dict[str, int]:
    """Release-gate form: ``assert_plan(df, n_cartesian=0,
    n_python_row_udf=0, n_exchanges=2)`` raises AssertionError naming
    the violated metric. Exact bound per metric; metrics not named are
    unconstrained. Returns the census for logging."""
    m = plan_metrics(df)
    for k, want in bounds.items():
        if k not in m:
            raise KeyError(f"unknown plan metric {k!r}; have {sorted(m)}")
        if m[k] != want:
            raise AssertionError(f"plan metric {k}={m[k]}, expected {want}")
    return m
