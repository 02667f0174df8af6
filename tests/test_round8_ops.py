"""Round-8 operators: retrieval-quality metrics (nDCG/MRR/recall) and
classical seasonal decomposition — closed-form fixtures."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import (
    drift,
    text,
)


def test_retrieval_metrics_perfect_and_miss(spark):
    """Docs engineered so both conjunctive-relevant docs outrank the
    single-term matches: relevant at ranks 1-2 -> recall=1, mrr=1,
    ndcg=1. A query with no postings at all yields zeroed hits and NULL
    recall/ndcg (undefined without relevant docs), mrr=0."""
    docs = spark.createDataFrame(
        [
            (0, "apple banana apple banana"),
            (1, "apple apple apple"),
            (2, "banana"),
            (3, "apple banana"),
            (4, "cherry"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["query_id"]: r
        for r in text.retrieval_metrics(
            docs, [(1, ["apple", "banana"]), (2, ["zzz"])], k=10
        ).collect()
    }
    r1 = out[1]
    assert r1["n_relevant"] == 2 and r1["hits_at_k"] == 2
    assert r1["recall_at_k"] == pytest.approx(1.0)
    assert r1["mrr"] == pytest.approx(1.0)
    assert r1["ndcg_at_k"] == pytest.approx(1.0)
    r2 = out[2]
    assert r2["n_relevant"] == 0 and r2["hits_at_k"] == 0
    assert r2["recall_at_k"] is None and r2["ndcg_at_k"] is None
    assert r2["mrr"] == 0.0


def test_retrieval_metrics_first_hit_at_rank_two(spark):
    """One relevant doc ranked below an irrelevant high-tf doc: mrr=1/2
    and ndcg = disc2/disc1 (single relevant, rank 2)."""
    # 'noise' doc 0 matches only the RARE query term with high tf (rare
    # term -> big idf, high tf -> saturated but largest contribution),
    # so BM25 puts it first; the conjunctive doc lands at rank 2
    docs = spark.createDataFrame(
        [
            (0, "beta beta beta beta beta"),
            (1, "alpha beta"),
            (2, "alpha fill"),
            (3, "alpha fill"),
            (4, "alpha fill"),
            (5, "alpha fill"),
        ],
        "doc_id long, text string",
    )
    row = text.retrieval_metrics(docs, [(1, ["alpha", "beta"])], k=10).collect()[0]
    assert row["n_relevant"] == 1
    assert row["mrr"] == pytest.approx(0.5)
    expected_ndcg = text.DCG_DISC_U[1] / text.DCG_DISC_U[0]
    assert row["ndcg_at_k"] == pytest.approx(expected_ndcg, abs=1e-9)


def _hourly(spark, values):
    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), 1, "a", float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_seasonal_decompose_constant_series(spark):
    """Constant series: interior trend == level, seasonal == 0,
    residual == 0; the first/last `half` buckets have NULL trend."""
    ev = _hourly(spark, [100.0] * 72)
    out = (
        drift.seasonal_decompose(ev, "ts", "event_type", "value", "hour", half=12)
        .orderBy("bucket")
        .collect()
    )
    assert len(out) == 72
    for i, r in enumerate(out):
        if i < 12 or i >= 60:
            assert r["trend"] is None and r["residual"] is None
        else:
            assert r["trend"] == pytest.approx(100.0)
            assert r["seasonal"] == pytest.approx(0.0, abs=1e-9)
            assert r["residual"] == pytest.approx(0.0, abs=1e-9)


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """x_t = 100 + s(hour) with a zero-mean 24-periodic bump: over full
    cycles the centered 25-point MA wobbles only by the duplicated
    phase (±bump/25), so the recovered seasonal profile tracks the
    planted bump within that ripple."""
    bump = {3: 24.0, 15: -24.0}
    vals = [100.0 + bump.get(i % 24, 0.0) for i in range(24 * 5)]
    ev = _hourly(spark, vals)
    out = drift.seasonal_decompose(
        ev, "ts", "event_type", "value", "hour", half=12
    ).collect()
    seas = {}
    for r in out:
        if r["seasonal"] is not None:
            seas[r["bucket"].hour] = r["seasonal"]
    assert seas[3] == pytest.approx(24.0, abs=2.0)
    assert seas[15] == pytest.approx(-24.0, abs=2.0)
    assert seas[9] == pytest.approx(0.0, abs=2.0)
    # residuals stay within the MA ripple everywhere
    for r in out:
        if r["residual"] is not None:
            assert abs(r["residual"]) < 3.0


def test_forecast_accuracy_periodic_series(spark):
    """Weekly-periodic daily series: seasonal-naive is a PERFECT
    forecaster (mase=0, mae=0) while naive pays the day-to-day cycle;
    mase(naive) == 1 by construction."""
    from financial_fraud_detection_using_time_series_data_spark.operators import (
        forecast,
    )

    base = dt.datetime(2024, 1, 1)
    pattern = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0]
    rows = [
        (i, base + dt.timedelta(days=i), 1, "a", pattern[i % 7])
        for i in range(35)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {
        r["method"]: r
        for r in forecast.forecast_accuracy(
            ev, "ts", "event_type", "value", bucket="day", season_lag=7
        ).collect()
    }
    assert out["naive"]["mase"] == pytest.approx(1.0)
    assert out["naive"]["n_evals"] == 34
    assert out["snaive"]["mae"] == pytest.approx(0.0, abs=1e-9)
    assert out["snaive"]["mase"] == pytest.approx(0.0, abs=1e-9)
    assert out["snaive"]["n_evals"] == 28
    assert out["mean"]["n_evals"] == 34
    # the expanding mean is a real (imperfect) forecaster here
    assert out["mean"]["mae"] > 0


def test_residual_anomaly_flags_planted_spike_not_cycle(spark):
    """A strong 24-h cycle plus ONE planted spike: the raw-value screen
    would flag every cycle peak; the residual screen flags only the
    spike bucket."""
    bump = {h: 30.0 * (1 if h < 12 else -1) for h in range(24)}
    # deterministic hash-noise keeps MAD meaningful (an EXACTLY periodic
    # series has all-zero clean residuals, MAD -> float dust, z -> inf)
    vals = [
        200.0 + bump[i % 24] + ((i * 2654435761) % 7 - 3) * 0.5
        for i in range(24 * 6)
    ]
    spike_at = 24 * 3 + 5
    vals[spike_at] += 500.0
    ev = _hourly(spark, vals)
    out = drift.residual_anomaly(
        ev, "ts", "event_type", "value", bucket="hour", half=12, z_threshold=3.5
    ).collect()
    flagged = {r["bucket"]: r["robust_z"] for r in out}
    spike_bucket = dt.datetime(2024, 3, 1) + dt.timedelta(hours=spike_at)
    assert spike_bucket in flagged
    spike_z = abs(flagged[spike_bucket])
    # the spike towers over everything; its collateral (same-phase
    # siblings via the contaminated seasonal mean, MA-window neighbours
    # via the contaminated trend) may also flag, but far below it
    assert spike_z > 50.0
    assert all(
        abs(z) < spike_z / 2.0 for b, z in flagged.items() if b != spike_bucket
    )
    # the clean cycle itself stays unflagged: every flag is the spike,
    # its phase siblings, or inside its 25-bucket trend window
    for b in flagged:
        ok = (
            b == spike_bucket
            or b.hour == spike_bucket.hour
            or abs((b - spike_bucket).total_seconds()) <= 12 * 3600
        )
        assert ok, b


def test_rule_census_closed_form(spark):
    """10 rows, A hits 1-4, B hits 3-6, C hits none: hand-computed
    jaccard/kappa per pair; a dead rule pairs at jaccard 0/kappa 0."""
    from financial_fraud_detection_using_time_series_data_spark.operators import (
        screens,
    )

    df = spark.createDataFrame([(i,) for i in range(10)], "i long")
    rules = [
        ("a", (F.col("i") >= 1) & (F.col("i") <= 4)),
        ("b", (F.col("i") >= 3) & (F.col("i") <= 6)),
        ("c", F.lit(False)),
    ]
    out = {
        (r["rule_a"], r["rule_b"]): r
        for r in screens.rule_census(df, rules).collect()
    }
    ab = out[("a", "b")]
    assert (ab["n"], ab["n_a"], ab["n_b"], ab["n_both"]) == (10, 4, 4, 2)
    assert ab["jaccard"] == pytest.approx(2 / 6)
    # po = 0.6, pe = (16 + 36)/100 = 0.52 -> kappa = 0.08/0.48
    assert ab["kappa"] == pytest.approx(0.08 / 0.48)
    ac = out[("a", "c")]
    assert ac["jaccard"] == pytest.approx(0.0)
    assert ac["kappa"] == pytest.approx(0.0)


def test_rule_census_identical_rules_kappa_one(spark):
    from financial_fraud_detection_using_time_series_data_spark.operators import (
        screens,
    )

    df = spark.createDataFrame([(i,) for i in range(10)], "i long")
    same = (F.col("i") % 2) == 0
    out = screens.rule_census(df, [("x", same), ("y", same)]).collect()[0]
    assert out["kappa"] == pytest.approx(1.0)
    assert out["jaccard"] == pytest.approx(1.0)


def test_decile_migration_stable_portfolio_is_diagonal(spark):
    """Identical spends two weeks running: every entity stays in its
    decile — the matrix is purely diagonal with share 1.0."""
    from financial_fraud_detection_using_time_series_data_spark.operators import (
        behavior,
    )

    rows = []
    eid = 0
    for week in (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8)):
        for u in range(20):
            rows.append((eid, week + dt.timedelta(hours=u), u, "view",
                         float((u + 1) * 10)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = behavior.decile_migration(ev, "user_id", "ts", "value", grain="week").collect()
    assert sum(r["n_entities"] for r in out) == 20
    for r in out:
        assert r["from_decile"] == r["to_decile"]
        assert r["share_of_from"] == pytest.approx(1.0)
