"""Measured scale-decade probe: time registry queries at sf0.1 and sf1.0
and report the per-query scaling exponent e = log10(t_sf1 / t_sf0.1) —
1.0 is perfectly linear in rows, <1 means fixed overhead still dominates
at this absolute size, >1.3 flags super-linear behavior (a join/window
whose cost grows faster than the data).

The sf1.0 corpus is a 10× key-shifted replication of the driver's sf0.1
(regenerate any time with `python tools_scale_gen.py`, which writes
.scale/sf1.0: every entity domain gets replica-offset
keys so FK joins stay consistent; entity COUNT scales 10× with constant
per-entity group sizes — the "more users" growth axis; time-bucketed
rollups instead densify — the "same days, more rows" axis. Fixed-
cardinality attributes (nation, mktsegment, event_type) stay fixed, as
they do in real data).

Each query runs in its OWN subprocess with a hard timeout: a query whose
sf1.0 cost explodes (e.g. quadratic candidate-pair generation under a
fixed blocking key) is recorded as TIMEOUT with a lower-bound exponent
instead of wedging the sweep. Timing: one untimed warm-up + min of 2 at
each SF inside the subprocess (JVM start excluded by construction).

Usage: python tools_scale_probe.py [query ...]
Writes SCALE_PROBE.json and prints one line per query.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(HERE, ".scale/sf1.0")
TIMEOUT_S = 600

# the 20 most expensive entries in BENCH_FULL.json (round-8 measurement)
TOP20 = [
    "fraud_pipeline_split_compat", "entity_clusters",
    "fraud_feature_pipeline", "bootstrap_auc", "platt_scaling",
    "ann_recall", "pagerank", "record_linkage", "dedup_clusters_lsh",
    "triangle_count", "label_propagation", "ivf_pq_topk",
    "simhash_near_dup", "two_hop_reach", "drift_report", "rolling_corr",
    "abc_classification", "em_weights", "ivf_topk_trained",
    "embedding_near_dup_lsh",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {here!r})
import __spark_entry__ as entrymod
from financial_fraud_detection_using_time_series_data_spark.session import get_spark
spark = get_spark(app_name="scale_probe")
fn = entrymod.queries()[{name!r}]
def run(sf):
    t0 = time.perf_counter(); fn(spark, sf).count()
    return time.perf_counter() - t0
run({sf01!r}); t01 = min(run({sf01!r}) for _ in range(2))
print(json.dumps({{"t01": t01}}), flush=True)
run({sf1!r}); t1 = min(run({sf1!r}) for _ in range(2))
print(json.dumps({{"t01": t01, "t1": t1}}), flush=True)
"""


def probe(name: str) -> dict:
    code = _CHILD.format(here=HERE, name=name, sf01=SF01, sf1=SF1)
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=TIMEOUT_S,
        )
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not lines:
            # child died before any timing (crash/OOM): record, don't
            # abort the whole sweep
            tail = (r.stderr or "").strip().splitlines()
            return {
                "status": "error",
                "detail": (tail[-1][:160] if tail else f"rc={r.returncode}, no output"),
            }
        d = json.loads(lines[-1])
    except subprocess.TimeoutExpired as te:
        lines = [
            l for l in (te.stdout or b"").decode().splitlines()
            if l.startswith("{")
        ]
        if not lines:
            return {"status": "timeout", "detail": f"no sf0.1 time in {TIMEOUT_S}s"}
        t01 = json.loads(lines[-1])["t01"]
        # sf1.0 never finished: exponent is a LOWER bound
        e_min = math.log10((TIMEOUT_S / 3.0) / t01)
        return {
            "status": "timeout", "sf0.1_s": round(t01, 3),
            "sf1.0_s": None, "exponent_lower_bound": round(e_min, 2),
        }
    if "t1" not in d:
        return {"status": "error", "detail": "child died mid-probe"}
    e = math.log10(d["t1"] / d["t01"])
    return {
        "status": "ok", "sf0.1_s": round(d["t01"], 3),
        "sf1.0_s": round(d["t1"], 3), "exponent": round(e, 3),
    }


def main() -> None:
    names = sys.argv[1:] or TOP20
    path = os.path.join(HERE, "SCALE_PROBE.json")
    out = {}
    if os.path.exists(path):  # merge: accumulate probes across runs
        with open(path) as f:
            out = json.load(f)
    for name in names:
        out[name] = probe(name)
        print(f"{name}: {out[name]}", flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    flagged = sorted(
        k for k, v in out.items()
        if v.get("exponent", 0) > 1.3 or v["status"] == "timeout"
    )
    print(f"\n{len(out)} probed; super-linear or timed out: {flagged}")


if __name__ == "__main__":
    main()
