"""Round-12 operator additions: Hodges-Lehmann robust location, MAD
(Hampel-rule) control limits, late-data session fragment merge, and
tumbling-window exact distinct/new counts. Each pinned against
hand-computed ground truth on planted fixtures; oracle parity at
sf0.01/sf0.1 is covered by the attestation sweep."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import (
    drift,
    sketches,
    stats,
    windows,
)
from financial_fraud_detection_using_time_series_data_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _hourly_events(spark, values, series="a", start_id=0):
    rows = [
        (start_id + i, float(3600 * i), series, float(v))
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, tsd double, event_type string, value double"
    )
    return df.select(
        "event_id",
        F.col("tsd").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )


# -------------------------------------------------------- hodges_lehmann


def test_hodges_lehmann_hand_computed(spark):
    """Values 10,12,14,100: the 10 Walsh averages sort to
    10,11,12,12,13,14,55,56,57,100 -> HL = (13+14)/2 = 13.5 — pulled
    toward the bulk, while the mean (34.0) is dragged by the outlier."""
    ev = _hourly_events(spark, [10.0, 12.0, 14.0, 100.0])
    row = stats.hodges_lehmann(ev).collect()[0]
    assert row["n_buckets"] == 4
    assert row["n_pairs"] == 10
    assert row["hl_location"] == 13.5
    assert row["mean_level"] == 34.0


def test_hodges_lehmann_symmetric_equals_median_and_mean(spark):
    """On a symmetric sample HL, median, and mean coincide."""
    ev = _hourly_events(spark, [1.0, 2.0, 3.0, 4.0, 5.0])
    row = stats.hodges_lehmann(ev).collect()[0]
    assert row["hl_location"] == 3.0
    assert row["mean_level"] == 3.0
    assert row["n_pairs"] == 15


def test_hodges_lehmann_breakdown_vs_mean(spark):
    """One wild outlier moves the mean arbitrarily but barely moves HL
    (29% breakdown): HL of 20 tight values + one 1e6 spike stays near
    the bulk."""
    vals = [50.0 + (i % 5) for i in range(20)] + [1_000_000.0]
    ev = _hourly_events(spark, vals)
    row = stats.hodges_lehmann(ev).collect()[0]
    assert 50.0 <= row["hl_location"] <= 56.0
    assert row["mean_level"] > 47000.0


# ---------------------------------------------------- mad_control_limits


def test_mad_control_limits_hand_computed(spark):
    """Values 8..14 + 200: median 11.5; |dev| sorted
    0.5,0.5,1.5,1.5,2.5,2.5,3.5,188.5 -> MAD 2.0; bands
    11.5 -/+ 3*1.4826*2.0 = 2.6044 / 20.3956; only the 200 bucket is
    outside (above)."""
    ev = _hourly_events(spark, [8.0, 9.0, 10.0, 11.0, 12.0, 13.0, 14.0, 200.0])
    row = drift.mad_control_limits(ev).collect()[0]
    assert row["n_buckets"] == 8
    assert row["median"] == 11.5
    assert row["mad"] == 2.0
    assert math.isclose(row["lcl"], 11.5 - 3.0 * (2.0 * 1.4826), abs_tol=1e-6)
    assert math.isclose(row["ucl"], 11.5 + 3.0 * (2.0 * 1.4826), abs_tol=1e-6)
    assert row["n_below"] == 0 and row["n_above"] == 1


def test_mad_robust_where_stddev_is_not(spark):
    """A single huge spike inflates mean+3*std enough to mask a second,
    smaller spike; the MAD bands flag both."""
    vals = [10.0] * 46 + [10_000.0, 500.0]
    ev = _hourly_events(spark, vals)
    row = drift.mad_control_limits(ev).collect()[0]
    assert row["mad"] == 0.0  # >half the buckets sit exactly at 10
    assert row["n_above"] == 2  # both spikes flagged
    mu = sum(vals) / len(vals)
    sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (len(vals) - 1))
    assert 500.0 < mu + 3 * sd  # the classic screen misses the 500


def test_mad_degenerate_constant_series(spark):
    """All-equal buckets: MAD 0, bands collapse to the median, nothing
    flagged."""
    ev = _hourly_events(spark, [7.0] * 10)
    row = drift.mad_control_limits(ev).collect()[0]
    assert row["mad"] == 0.0
    assert row["lcl"] == row["ucl"] == 7.0
    assert row["n_below"] == 0 and row["n_above"] == 0


# --------------------------------------------------- session merge (late)


def _events_df(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, tsd double, user_id string, value double"
    )
    return df.select(
        "event_id",
        F.col("tsd").cast("timestamp").alias("ts"),
        "user_id",
        "value",
    )


def test_merge_fragments_running_max_handles_nested_intervals(spark):
    """Fragment B nested inside A: a lag(end)-based sweep would compare
    C's start against B's (early) end and wrongly split; the running-max
    sweep keeps A-B-C in one session."""
    frags = spark.createDataFrame(
        [
            ("u", 0.0, 10000.0, 11, 110.0),
            ("u", 2000.0, 2000.0, 1, 10.0),
            ("u", 11000.0, 11000.0, 1, 10.0),
        ],
        "user_id string, fsd double, fed double, n_events long,"
        " frag_value double",
    ).select(
        "user_id",
        F.col("fsd").cast("timestamp").alias("frag_start"),
        F.col("fed").cast("timestamp").alias("frag_end"),
        "n_events",
        "frag_value",
    )
    out = windows.merge_session_fragments(frags, gap_s=1800).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_fragments"] == 3
    assert row["n_events"] == 13
    assert row["total_value"] == 130.0


def test_shard_merge_equals_direct_sessionization(spark):
    """The headline property: shard-wise sessionize + fragment merge ==
    whole-stream sessionization, on a random bursty fixture whose
    events scatter arbitrarily across the 4 arrival shards."""
    rng = random.Random(7)
    rows, eid, t = [], 0, 0.0
    for _ in range(60):  # 60 bursts across 8 users
        u = f"u{rng.randrange(8)}"
        t += rng.uniform(0, 6000)  # sometimes > gap -> new session
        for _ in range(rng.randrange(1, 6)):
            rows.append((eid, t, u, round(rng.uniform(1, 99), 2)))
            eid += 1
            t += rng.uniform(0, 1700)  # within-gap spacing
    ev = _events_df(spark, rows)
    merged = windows.shard_sessionize_merge(ev, gap_s=1800, n_shards=4)
    direct = windows.session_agg(
        ev, "user_id", "ts", "event_id", "value", gap_s=1800
    )
    m = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in merged.collect()
    }
    d = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in direct.collect()
    }
    assert set(m) == set(d)
    for k, (n, v) in d.items():
        assert m[k][0] == n, k
        assert math.isclose(m[k][1], v, abs_tol=1e-6), k
    # session ids are a 1-based dense per-user sequence on both sides
    assert merged.where(F.col("session_idx") < 1).count() == 0


def test_shard_merge_bridging_event(spark):
    """Two same-shard events 3000s apart (separate fragments at gap
    1800) are BRIDGED by another shard's event between them — the merge
    must produce one session, exactly like the direct pass would."""
    rows = [
        (0, 0.0, "u", 10.0),      # shard 0
        (4, 3000.0, "u", 10.0),   # shard 0 -> same-shard gap 3000 > 1800
        (1, 1500.0, "u", 10.0),   # shard 1 bridges (1500 both sides)
    ]
    ev = _events_df(spark, rows)
    out = windows.shard_sessionize_merge(ev, gap_s=1800, n_shards=4).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 3
    assert out[0]["n_fragments"] == 3


# --------------------------------------------- windowed_distinct_exact


def test_windowed_distinct_and_new_counts(spark):
    """Two 6h windows: w0 has users u1,u2 (both new); w1 has u1,u3 —
    u3 is the only first-seen. Distinct counts exact, repeat events
    collapse."""
    rows = [
        (0, 100.0, "a", "u1"), (1, 200.0, "a", "u1"), (2, 300.0, "a", "u2"),
        (3, 21700.0, "a", "u1"), (4, 21800.0, "a", "u3"),
        (5, 150.0, "b", "u9"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, tsd double, event_type string, user_id string"
    ).select(
        F.col("tsd").cast("timestamp").alias("ts"), "event_type", "user_id"
    )
    out = {
        (r["event_type"], r["window_start"].hour): r
        for r in sketches.windowed_distinct_exact(df).collect()
    }
    w0a = out[("a", 0)]
    assert (w0a["n_events"], w0a["n_distinct"], w0a["n_new"]) == (3, 2, 2)
    w1a = out[("a", 6)]
    assert (w1a["n_events"], w1a["n_distinct"], w1a["n_new"]) == (2, 2, 1)
    w0b = out[("b", 0)]
    assert (w0b["n_events"], w0b["n_distinct"], w0b["n_new"]) == (1, 1, 1)


def test_windowed_distinct_plan_two_phase(spark):
    """Plan pin: the exact distinct must come from the two-phase
    groupBy composition — no expand, no collect_set, no Python."""
    rows = [(float(i * 977), "a", f"u{i % 13}") for i in range(200)]
    df = spark.createDataFrame(
        rows, "tsd double, event_type string, user_id string"
    ).select(
        F.col("tsd").cast("timestamp").alias("ts"), "event_type", "user_id"
    )
    plan = (
        sketches.windowed_distinct_exact(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "collect_set" not in plan
    assert "Expand" not in plan


# ------------------------------------------------------ lateness_profile


def test_lateness_profile_hand_computed(spark):
    """Arrival order (event_id) vs event time: ids 1, 3, 4 arrive after
    a later event time was already seen -> late by 50s, 10s, 190s."""
    from financial_fraud_detection_using_time_series_data_spark.operators import (
        events as events_ops,
    )

    rows = [(0, 100.0), (1, 50.0), (2, 200.0), (3, 190.0), (4, 10.0)]
    df = spark.createDataFrame(rows, "event_id long, tsd double").select(
        "event_id",
        F.col("tsd").cast("timestamp").alias("ts"),
        F.lit("a").alias("event_type"),
    )
    row = events_ops.lateness_profile(df, thresholds_s=(60, 300, 3600)).collect()[0]
    assert row["n_events"] == 5
    assert row["n_late"] == 3
    assert row["max_lateness_s"] == 190.0
    assert row["avg_lateness_s"] == 50.0  # (0+50+0+10+190)/5
    assert row["n_late_over_60s"] == 1
    assert row["n_late_over_300s"] == 0


def test_lateness_profile_in_order_stream_all_on_time(spark):
    from financial_fraud_detection_using_time_series_data_spark.operators import (
        events as events_ops,
    )

    rows = [(i, float(i * 60)) for i in range(50)]
    df = spark.createDataFrame(rows, "event_id long, tsd double").select(
        "event_id",
        F.col("tsd").cast("timestamp").alias("ts"),
        F.lit("a").alias("event_type"),
    )
    row = events_ops.lateness_profile(df).collect()[0]
    assert row["n_late"] == 0
    assert row["max_lateness_s"] == 0.0
    assert row["avg_lateness_s"] == 0.0


# ---------------------------------------------------------- siegel_slope


def test_siegel_survives_40pct_contamination_sen_does_not(spark):
    """20 hourly buckets on an exact 2.5/hour line, 8 of them (40%)
    corrupted with huge leverage values: the repeated median still reads
    exactly 2.5 (50% breakdown) while Theil-Sen — only 0.36 of pairs
    clean — is dragged off the line."""
    vals = [10.0 + 2.5 * i for i in range(20)]
    # one-sided contamination (the adversarial case): the TRAILING 8
    # buckets explode upward, so every pair touching a bad point slopes
    # far above 2.5 — 64% of pairs — and Theil-Sen's median is dragged;
    # each good point still sees a clean majority among its own slopes
    for i in range(12, 20):
        vals[i] = 100_000.0 + 10_000.0 * i
    ev = _hourly_events(spark, vals)
    row = stats.siegel_slope(ev).collect()[0]
    assert row["n_buckets"] == 20
    assert row["siegel_slope_per_hour"] == 2.5
    assert abs(row["sen_slope_per_hour"] - 2.5) > 10.0


def test_siegel_sen_branch_matches_mann_kendall_sen(spark):
    """The symmetric (doubled) pair multiset has the same median as the
    i<j half, so siegel_slope's Theil-Sen column must equal
    mann_kendall's on any series."""
    vals = [10.0, 14.0, 11.0, 20.0, 13.0, 30.0, 8.0]
    ev = _hourly_events(spark, vals)
    s = stats.siegel_slope(ev).collect()[0]
    mk = stats.mann_kendall(ev).collect()[0]
    assert s["sen_slope_per_hour"] == mk["sen_slope_per_hour"]


def test_windowed_distinct_stream_parity(spark, sf_dir, tmp_path):
    """The docstring's streaming-twin claim, executed: a Structured
    Streaming dropDuplicates + windowed count over the same events file
    must produce identical exact distinct counts per (key, window) —
    batch and stream share the tumbling-window assignment, so on-time
    data yields the same closed windows."""
    import os
    import shutil

    from financial_fraud_detection_using_time_series_data_spark.sources import (
        load_table,
        normalize_scan_types,
    )

    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r["event_type"], r["window_start"]): r["n_distinct"]
        for r in sketches.windowed_distinct_exact(
            ev, "ts", "event_type", "user_id", window_s=21600
        ).collect()
    }

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"), src_dir / "events.parquet"
    )
    raw_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(src_dir))
        .transform(lambda d: normalize_scan_types(d, ["ts"]))
    )
    wus = 21600 * 1_000_000
    win = (
        (F.floor(F.unix_micros(F.col("ts")) / F.lit(wus)) * F.lit(21600))
        .cast("timestamp")
        .alias("window_start")
    )
    counts = (
        stream.select("event_type", win, "user_id")
        .dropDuplicates(["event_type", "window_start", "user_id"])
        .groupBy("event_type", "window_start")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("wde_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r["event_type"], r["window_start"]): r["n_distinct"]
        for r in spark.sql("select * from wde_stream").collect()
    }
    assert got == batch
    assert len(got) > 0


# ------------------------------------------------- property (brute force)

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_HSETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# cent-grid values: the operators' decimal(25,2) quantization is exact
_cents = st.integers(min_value=-10**6, max_value=10**6).map(
    lambda c: c / 100.0
)


@given(vals=st.lists(_cents, min_size=1, max_size=14))
@settings(**_HSETTINGS)
def test_hodges_lehmann_matches_bruteforce(spark, vals):
    """HL must equal the brute-force median of all i<=j Walsh averages
    on arbitrary cent-grid inputs (negatives included)."""
    import statistics

    ev = _hourly_events(spark, vals)
    row = stats.hodges_lehmann(ev).collect()[0]
    walsh = [
        (vals[i] + vals[j]) / 2.0
        for i in range(len(vals))
        for j in range(i, len(vals))
    ]
    assert math.isclose(
        row["hl_location"], statistics.median(walsh), abs_tol=1e-6
    )
    assert row["n_pairs"] == len(walsh)


@given(vals=st.lists(_cents, min_size=1, max_size=14))
@settings(**_HSETTINGS)
def test_mad_limits_match_bruteforce(spark, vals):
    """Median/MAD/bands/counts must equal the brute-force computation
    on arbitrary cent-grid inputs."""
    import statistics

    ev = _hourly_events(spark, vals)
    row = drift.mad_control_limits(ev).collect()[0]
    med = statistics.median(vals)
    mad = statistics.median([abs(v - med) for v in vals])
    lcl = med - 3.0 * (mad * 1.4826)
    ucl = med + 3.0 * (mad * 1.4826)
    assert math.isclose(row["median"], med, abs_tol=1e-6)
    assert math.isclose(row["mad"], mad, abs_tol=1e-6)
    assert math.isclose(row["lcl"], lcl, abs_tol=1e-4)
    assert math.isclose(row["ucl"], ucl, abs_tol=1e-4)
    assert row["n_below"] == sum(v < lcl - 1e-9 for v in vals)
    assert row["n_above"] == sum(v > ucl + 1e-9 for v in vals)


@given(vals=st.lists(_cents, min_size=2, max_size=12))
@settings(**_HSETTINGS)
def test_siegel_matches_bruteforce(spark, vals):
    """Repeated median must equal the brute-force two-level median over
    micro-quantized pairwise slopes."""
    import statistics

    ev = _hourly_events(spark, vals)
    out = stats.siegel_slope(ev).collect()
    n = len(vals)

    def mslope(i, j):
        return math.floor(
            ((vals[j] - vals[i]) / float(j - i)) * 1e6 + 0.5
        )

    per_i = [
        statistics.median([mslope(min(i, j), max(i, j)) for j in range(n) if j != i])
        for i in range(n)
    ]
    want = statistics.median(per_i) / 1e6
    assert len(out) == 1
    assert math.isclose(out[0]["siegel_slope_per_hour"], want, abs_tol=1e-9)


def test_round12_input_validation(spark):
    """Parameter guards fail fast instead of as ANSI job errors or
    colliding output columns."""
    from financial_fraud_detection_using_time_series_data_spark.operators import (
        events as events_ops,
    )

    ev = _hourly_events(spark, [1.0, 2.0])
    with pytest.raises(ValueError, match="n_shards"):
        windows.shard_sessionize_merge(ev.withColumn("user_id", F.lit("u")),
                                       n_shards=0)
    with pytest.raises(ValueError, match="window_s"):
        sketches.windowed_distinct_exact(
            ev.withColumn("user_id", F.lit("u")), window_s=0
        )
    with pytest.raises(ValueError, match="thresholds_s"):
        events_ops.lateness_profile(ev, thresholds_s=(60, 60))
    with pytest.raises(ValueError, match="thresholds_s"):
        events_ops.lateness_profile(ev, thresholds_s=(0,))


# --------------------------------------------- batch-3: ccf / PH / tau / CvM


def _two_series(spark, avals, bvals, b_offset_h=0):
    rows = []
    for i, v in enumerate(avals):
        rows.append((len(rows), float(3600 * i), "purchase", float(v)))
    for i, v in enumerate(bvals):
        rows.append(
            (len(rows), float(3600 * (i + b_offset_h)), "click", float(v))
        )
    df = spark.createDataFrame(
        rows, "event_id long, tsd double, event_type string, value double"
    )
    return df.select(
        "event_id",
        F.col("tsd").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )


def test_cross_correlation_planted_lag(spark):
    """click is an exact 2-hour-delayed copy of purchase: the CCF must
    read exactly 1.0 at lag +2 (same value multiset -> equal means and
    deviation energies) and strictly less elsewhere."""
    from financial_fraud_detection_using_time_series_data_spark.operators import (
        drift as drift_ops,
    )

    a = [10.0, 30.0, 5.0, 40.0, 12.0, 33.0, 7.0, 25.0, 18.0, 44.0]
    ev = _two_series(spark, a, a, b_offset_h=2)
    out = {
        r["lag"]: r
        for r in drift_ops.cross_correlation(
            ev, series_a="purchase", series_b="click", max_lag=4
        ).collect()
    }
    assert out[2]["ccf"] == 1.0
    assert out[2]["n_pairs"] == 10
    for k, r in out.items():
        if k != 2 and r["ccf"] is not None:
            assert abs(r["ccf"]) < 1.0, (k, r["ccf"])


def test_page_hinkley_step_alarm_and_flat_quiet(spark):
    from financial_fraud_detection_using_time_series_data_spark.operators import (
        drift as drift_ops,
    )

    stepped = _hourly_events(spark, [10.0] * 48 + [30.0] * 24)
    row = drift_ops.page_hinkley_alarms(stepped, threshold=50.0).collect()[0]
    assert row["alarmed"]
    assert row["ph_max"] > 50.0
    assert row["first_alarm_bucket"].day >= 3  # hour >= 48
    flat = _hourly_events(spark, [10.0] * 72)
    row = drift_ops.page_hinkley_alarms(flat, threshold=50.0).collect()[0]
    assert not row["alarmed"]
    assert row["ph_max"] == 0.0
    assert row["first_alarm_bucket"] is None


def test_kendall_tau_hand_computed(spark):
    """qa = 1,2,3,4 vs qb = 1,3,2,4: 5 concordant, 1 discordant, no
    ties -> tau_b = 4/6."""
    ev = _two_series(spark, [1.0, 2.0, 3.0, 4.0], [1.0, 3.0, 2.0, 4.0])
    row = stats.kendall_tau(ev, series_a="purchase", series_b="click").collect()[0]
    assert row["n_pairs"] == 6
    assert (row["concordant"], row["discordant"]) == (5, 1)
    assert (row["tied_a"], row["tied_b"]) == (0, 0)
    assert math.isclose(row["tau_b"], 4.0 / 6.0, abs_tol=1e-6)


def test_kendall_tau_perfect_reversal(spark):
    ev = _two_series(spark, [1.0, 2.0, 3.0, 4.0], [9.0, 7.0, 5.0, 3.0])
    row = stats.kendall_tau(ev, series_a="purchase", series_b="click").collect()[0]
    assert row["tau_b"] == -1.0


def test_cramer_von_mises_hand_computed(spark):
    """ref {1,2} vs cur {3,4}: S = 4+16+4+0 = 24, T = 24/(2*2*16) =
    0.375; identical samples give exactly 0."""
    from financial_fraud_detection_using_time_series_data_spark.operators import (
        drift as drift_ops,
    )

    ref = spark.createDataFrame([(1.0,), (2.0,)], "value double")
    cur = spark.createDataFrame([(3.0,), (4.0,)], "value double")
    row = drift_ops.cramer_von_mises(ref, cur).collect()[0]
    assert row["cvm_stat"] == 0.375
    assert (row["n_ref"], row["n_cur"]) == (2, 2)
    same = spark.createDataFrame([(float(i),) for i in range(50)], "value double")
    row = drift_ops.cramer_von_mises(same, same).collect()[0]
    assert row["cvm_stat"] == 0.0
