"""Local mimic of the driver's DuckDB differential-oracle check:
row-count + schema-shape + order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _canon(v):
    if v is None:
        return None
    try:
        import pandas as pd

        # null timestamps: Spark collects None, DuckDB fetchdf gives NaT
        if v is pd.NaT or v is pd.NA:
            return None
    except ImportError:
        pass
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_canon(x) for x in v.tolist())
        if isinstance(v, np.floating):
            f = float(v)
            return None if math.isnan(f) else round(f, 6)
        if isinstance(v, np.integer):
            return int(v)
    except ImportError:
        pass
    return v


def compare(spark_df, oracle_pdf) -> tuple[bool, str]:
    """Sort columns by name, canonicalize values, compare as multisets."""
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return False, f"column mismatch: spark={s_cols} oracle={o_cols}"
    s_rows = spark_df.select(*s_cols).collect()
    n_s, n_o = len(s_rows), len(oracle_pdf)
    if n_s != n_o:
        return False, f"row count mismatch: spark={n_s} oracle={n_o}"
    s_set = sorted(
        (tuple(_canon(v) for v in row) for row in s_rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    o_set = sorted(
        (
            tuple(_canon(v) for v in row)
            for row in oracle_pdf[s_cols].itertuples(index=False, name=None)
        ),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    for i, (a, b) in enumerate(zip(s_set, o_set)):
        if a != b:
            return False, f"first diff at sorted row {i}: spark={a} oracle={b}"
    return True, "ok"
