"""HTTP serving surface — the engine-side analog of the reference's
FastAPI app (``api/main.py:315-391``: /health, /score, /score/batch,
/stats), on the standard library only (no FastAPI/uvicorn dependency).

The scoring path is the SAME ``streaming.score_batch`` DataFrame
function used by batch jobs and the Structured Streaming scorer — one
implementation for all three serving planes, which is exactly the
train/serve-skew fix the streaming module documents. A request's JSON
records become a small DataFrame, are scored by the shared plan, and
collected back; running stats mirror the reference's mutable global
stats (``api/main.py:143-183``) behind a lock.

This is a functional shim, not a production gateway: per-request
DataFrame creation costs ~10-100 ms of driver time, fine for
health-checked side traffic. High-QPS serving should run the identical
``score_batch`` inside a Structured Streaming query (see
``streaming/scoring.py``) and let this server answer /health + /stats.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..streaming.scoring import score_batch

_EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


class FraudScoringService:
    """Scores JSON event records via the shared ``score_batch`` plan and
    keeps reference-style running stats (count / sum / risk histogram)."""

    def __init__(self, spark: SparkSession, model_score_col: str | None = None):
        self.spark = spark
        self.model_score_col = model_score_col
        self._lock = threading.Lock()
        self._n = 0
        self._score_sum = 0.0
        self._risk_counts: dict[str, int] = {}

    def score_records(self, records: list[dict]) -> list[dict]:
        rows = [
            (
                int(r.get("event_id", i)),
                int(r.get("user_id", 0)),
                float(r["value"]),
            )
            for i, r in enumerate(records)
        ]
        df = self.spark.createDataFrame(rows, _EVENT_SCHEMA)
        out = score_batch(df, amount_col="value", model_score_col=self.model_score_col)
        scored = [
            {
                "event_id": r["event_id"],
                "user_id": r["user_id"],
                "value": r["value"],
                "fraud_score": r["fraud_score"],
                "risk": r["risk"],
                "reasons": list(r["reasons"]),
            }
            for r in out.collect()
        ]
        with self._lock:
            for s in scored:
                self._n += 1
                self._score_sum += s["fraud_score"]
                self._risk_counts[s["risk"]] = self._risk_counts.get(s["risk"], 0) + 1
        return scored

    def stats(self) -> dict:
        with self._lock:
            return {
                "n_scored": self._n,
                "avg_score": (self._score_sum / self._n) if self._n else None,
                "risk_counts": dict(self._risk_counts),
            }

    def health(self) -> dict:
        return {"status": "ok", "spark_version": self.spark.version}


def _make_handler(service: FraudScoringService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet test runs
            pass

        def _reply(self, code: int, payload: dict | list) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, service.health())
            elif self.path == "/stats":
                self._reply(200, service.stats())
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", "0"))
            try:
                payload = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._reply(400, {"error": "invalid json"})
                return
            try:
                if self.path == "/score":
                    self._reply(200, service.score_records([payload])[0])
                elif self.path == "/score/batch":
                    self._reply(200, service.score_records(payload.get("events", [])))
                else:
                    self._reply(404, {"error": "not found"})
            except (KeyError, TypeError, ValueError) as exc:
                self._reply(400, {"error": str(exc)})

    return Handler


def serve(
    spark: SparkSession,
    host: str = "127.0.0.1",
    port: int = 0,
    model_score_col: str | None = None,
) -> tuple[ThreadingHTTPServer, FraudScoringService]:
    """Bind the scoring server (port 0 = ephemeral). The caller drives
    ``server.serve_forever()`` (typically on a thread) and
    ``server.shutdown()``."""
    service = FraudScoringService(spark, model_score_col)
    server = ThreadingHTTPServer((host, port), _make_handler(service))
    return server, service
