"""Corpus-mixture + forecasting additions (round 9b): domain KL and the
simplified Theta forecast."""

import datetime as dt
import math

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import (
    forecast,
    text,
)


def _kl_hand(domains, alpha=0.5):
    """Reference KL over the full smoothed vocabulary, replicating the
    operator's per-token 1e-9 quantization of ln p_c."""
    corpus = {}
    for toks in domains.values():
        for t in toks:
            corpus[t] = corpus.get(t, 0) + 1
    V = len(corpus)
    N = sum(corpus.values())
    lq = {
        t: math.floor(math.log((n + alpha) / (N + alpha * V)) * 1e9 + 0.5)
        for t, n in corpus.items()
    }
    out = {}
    for d, toks in domains.items():
        cnt = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        n_d = len(toks)
        kl_seen_nano = 0
        for t, n in cnt.items():
            p_d = (n + alpha) / (n_d + alpha * V)
            term = p_d * (math.log(p_d) - lq[t] / 1e9)
            kl_seen_nano += math.floor(term * 1e9 + 0.5)
        p0 = alpha / (n_d + alpha * V)
        l_all = sum(lq.values())
        l_seen = sum(lq[t] for t in cnt)
        absent = p0 * (
            (V - len(cnt)) * math.log(p0) - (l_all - l_seen) / 1e9
        )
        out[d] = kl_seen_nano / 1e9 + absent
    return out


def test_domain_kl_hand_check(spark):
    domains = {
        "news": ["the", "market", "fell", "the", "bank", "said"],
        "spam": ["buy", "now", "buy", "cheap", "now", "buy"],
    }
    rows = [
        (i, d, " ".join(toks))
        for i, (d, toks) in enumerate(domains.items())
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in text.domain_kl(df).collect()}
    expect = _kl_hand(domains)
    for d in domains:
        assert out[d]["kl_nats"] == pytest.approx(expect[d], abs=1e-6)
    assert out["news"]["n_tokens"] == 6 and out["news"]["vocab_seen"] == 5
    # disjoint vocabularies -> both domains far from the corpus blend
    assert out["spam"]["kl_nats"] > 0.1


def test_domain_kl_identical_domains_near_zero(spark):
    rows = [(1, "a", "x y z x"), (2, "b", "x y z x")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = text.domain_kl(df).collect()
    # identical SHAPES still differ slightly under add-alpha smoothing
    # (domain totals < corpus total), but stay near zero
    for r in out:
        assert 0.0 <= r["kl_nats"] < 0.01


def test_theta_forecast_hand_recursion(spark):
    vals = [10.0, 12.0, 9.0, 15.0]
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + dt.timedelta(days=i), 7, float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = sorted(
        forecast.theta_forecast(df, alpha=0.3, horizon=3).collect(),
        key=lambda r: r["step"],
    )
    # slope via exact integer sums
    cents = [1000, 1200, 900, 1500]
    n = 4
    st, stt = 10, 30
    sy = sum(cents)
    sty = sum((i + 1) * c for i, c in enumerate(cents))
    b = (n * sty - st * sy) / (n * stt - st * st) / 100.0
    lev = vals[0]
    for t in range(1, n):
        lev = 0.3 * vals[t] + 0.7 * lev
    assert len(out) == 3
    for k, row in enumerate(out, start=1):
        assert row["slope"] == pytest.approx(b, abs=1e-6)
        assert row["level"] == pytest.approx(lev, abs=1e-6)
        assert row["forecast"] == pytest.approx(lev + 0.5 * b * k, abs=1e-6)


def test_theta_forecast_drops_short_series(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base, 7, 5.0)], "event_id long, ts timestamp, user_id long, value double"
    )
    assert forecast.theta_forecast(df).count() == 0


def test_mixture_round9_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in ("domain_kl",):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
