"""Local-parity attestation for the FULL query registry.

The external driver hash-checks only the first 50 ``queries()`` entries;
everything after position 50 would otherwise carry no per-round audit
trail. This script runs EVERY registry entry at sf0.01 — Spark vs its
DuckDB oracle with the driver's canonicalization (sort columns by name,
sort rows, hash values) — and writes one line per entry to
``ATTESTATION.md``. Entries without an oracle (approximate / env-seeded
operators) get a rows-only execution check, marked as such.

Usage: python attest.py [sf_dir] [limit-or-names]
  sf_dir          parquet dir (default /root/testdata/sf0.01)
  limit-or-names  integer N -> first N entries (the driver window is 50);
                  else comma-separated entry names (sf1.0 spot checks)
Non-default runs write ATTESTATION_<sfdir>.md instead of ATTESTATION.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from financial_fraud_detection_using_time_series_data_spark.session import get_spark

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _canon_hash(df: pd.DataFrame) -> int:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # tz-aware (Spark LTZ) vs naive (DuckDB) and us- vs ns-resolution
        # timestamps are value-identical here (UTC session) but hash
        # differently; normalize to UTC-naive ns
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[ns]")
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # optional 2nd arg: integer -> first-N window; else comma-separated
    # entry names (used for sf1.0 spot attestation over .scale/sf1.0)
    limit = names = None
    if len(sys.argv) > 2:
        if sys.argv[2].isdigit():
            limit = int(sys.argv[2])
        else:
            names = sys.argv[2].split(",")
    spark = get_spark(app_name="attest")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    if limit is not None:
        queries = dict(list(queries.items())[:limit])
    elif names is not None:
        queries = {n: queries[n] for n in names}
    oracles = entrymod.oracle_sql()
    lines = []
    n_pass = n_fail = 0
    for pos, (name, fn) in enumerate(queries.items(), start=1):
        t0 = time.perf_counter()
        try:
            sp = fn(spark, sf_dir).toPandas()
            if name in oracles:
                oc = con.sql(oracles[name]).df()
                ok = len(sp) == len(oc) and _canon_hash(sp) == _canon_hash(oc)
                mode = "oracle-hash"
                detail = f"spark={len(sp)} oracle={len(oc)}"
            else:
                ok = len(sp) >= 0
                mode = "rows-only"
                detail = f"spark={len(sp)}"
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            ok, mode = False, "error"
            detail = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
        dt = time.perf_counter() - t0
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += not ok
        lines.append(f"| {pos} | {name} | {mode} | {status} | {detail} | {dt:.1f}s |")
        print(lines[-1], flush=True)

    if limit is not None:
        window = f"first-{limit} window"
    elif names is not None:
        window = "named spot-check"
    else:
        window = "first-50 (driver-checked)"
    sf_base = os.path.basename(sf_dir.rstrip("/"))
    if limit is not None or names is not None:
        # partial runs must NEVER clobber a full-sweep ledger (the
        # round-11→12 handoff lost two 340-entry ledgers to 2-entry
        # spot-check overwrites); they get their own scratch file
        out_name = f"ATTESTATION_spot_{sf_base}.md"
    elif sf_dir.rstrip("/").endswith("sf0.01"):
        out_name = "ATTESTATION.md"
    else:
        out_name = f"ATTESTATION_{sf_base}.md"
    with open(out_name, "w") as f:
        f.write(
            "# Registry attestation\n\n"
            f"Full `queries()` sweep at `{sf_dir}`, driver-style canonical\n"
            "compare against `oracle_sql()` (rows-only where no oracle exists\n"
            "by design). Positions 1-50 duplicate the external driver window;\n"
            f"positions 51+ are the tail this file exists to audit.\n\n"
            f"**{n_pass} PASS / {n_fail} FAIL of {len(queries)} entries** "
            f"({window} + tail).\n\n"
            "| # | entry | mode | status | rows | time |\n"
            "|---|-------|------|--------|------|------|\n"
        )
        f.write("\n".join(lines) + "\n")
    print(f"\n{n_pass} PASS / {n_fail} FAIL -> {out_name}")


if __name__ == "__main__":
    main()
