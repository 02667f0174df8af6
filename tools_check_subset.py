"""Attest a subset of registry entries by name (dev loop helper).

Usage: python tools_check_subset.py name1 name2 ... [--sf /root/testdata/sf0.01]
Runs the same canonical compare as attest.py but only for the named
entries, so a new operator family can be verified in seconds instead of
re-sweeping all 200+ entries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

import __spark_entry__ as entrymod
from attest import TABLES, _canon_hash
from financial_fraud_detection_using_time_series_data_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    spark = get_spark(app_name="check-subset")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name in args:
        t0 = time.perf_counter()
        try:
            sp = queries[name](spark, sf_dir).toPandas()
            if name in oracles:
                oc = con.sql(oracles[name]).df()
                ok = len(sp) == len(oc) and _canon_hash(sp) == _canon_hash(oc)
                detail = f"spark={len(sp)} oracle={len(oc)}"
                if not ok and len(sp) == len(oc):
                    detail += " HASH-MISMATCH"
                    merged = sp.head(3).to_string()
                    detail += f"\n  spark head:\n{merged}\n  oracle head:\n{oc.head(3).to_string()}"
            else:
                ok = len(sp) >= 0
                detail = f"rows-only spark={len(sp)}"
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"ERROR {str(e).splitlines()[0][:300]}"
        n_fail += not ok
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
