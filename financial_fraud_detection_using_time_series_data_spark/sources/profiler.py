"""Dataset profiling (reference ``loader.py:197-207``, ``train_pipeline.py:57-84``).

One wide aggregate pass — a single job regardless of column count, instead
of pandas' per-column ``isnull().sum()`` over an in-RAM frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_profile(df: DataFrame) -> DataFrame:
    """Per-column null counts + percentages, sorted desc — tall format
    (column, null_count, null_pct). Single wide agg then unpivot via stack."""
    total = df.count()
    aggs = [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in df.columns]
    wide = df.agg(*aggs)
    n = len(df.columns)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in df.columns)
    tall = wide.selectExpr(f"stack({n}, {stack_expr}) as (col_name, null_count)")
    pct = F.col("null_count") / F.lit(max(total, 1)) * 100.0
    return tall.withColumn(
        "null_pct", F.floor(pct * 1e6 + F.lit(0.5)) / F.lit(1e6)
    ).orderBy(F.desc("null_count"), "col_name")


def profile(df: DataFrame) -> dict:
    """Shape/columns/dtypes summary (driver-side dict, like get_data_info)."""
    return {
        "rows": df.count(),
        "columns": len(df.columns),
        "dtypes": dict(df.dtypes),
    }
