"""Live-request tests for the stdlib HTTP scoring shim (reference
api/main.py surface: /health, /score, /score/batch, /stats)."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from financial_fraud_detection_using_time_series_data_spark.serving import serve


@pytest.fixture()
def server(spark):
    srv, service = serve(spark, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_health_score_batch_stats(server):
    code, health = _get(server + "/health")
    assert code == 200 and health["status"] == "ok"

    code, single = _post(server + "/score", {"event_id": 1, "user_id": 7, "value": 1200.0})
    assert code == 200
    assert 0.0 <= single["fraud_score"] <= 1.0
    assert single["risk"] in ("CRITICAL", "HIGH", "MEDIUM", "LOW", "MINIMAL")
    assert "high_amount" in single["reasons"]

    code, batch = _post(
        server + "/score/batch",
        {"events": [{"event_id": 2, "user_id": 8, "value": 10.0},
                    {"event_id": 3, "user_id": 9, "value": 5000.0}]},
    )
    assert code == 200 and len(batch) == 2
    assert batch[0]["fraud_score"] < batch[1]["fraud_score"]

    code, stats = _get(server + "/stats")
    assert code == 200 and stats["n_scored"] == 3
    assert stats["risk_counts"]


def test_bad_requests(server):
    # urllib raises on non-2xx; the server must reply 400, not 500
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server + "/score", {"event_id": 1})  # missing value
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei2:
        _get(server + "/nope")
    assert ei2.value.code == 404
