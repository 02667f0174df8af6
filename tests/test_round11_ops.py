"""Round-11 operator additions: Mann-Kendall/Theil-Sen trend test,
char-entropy quality screen, Qini uplift gains, iterative GESD outliers.
Each is pinned against hand-computed ground truth on planted fixtures;
oracle parity at sf0.01/sf0.1 is covered by the attestation sweep."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import (
    drift,
    evaluation,
    stats,
    text,
)
from financial_fraud_detection_using_time_series_data_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _hourly_events(spark, values, series="a"):
    """One event per hour with the given value sequence."""
    rows = [
        (i, float(3600 * i), series, float(v)) for i, v in enumerate(values)
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


# ---------------------------------------------------------- mann_kendall


def test_mann_kendall_monotone_series(spark):
    """A strictly increasing series: S = n(n-1)/2, no ties, Sen slope =
    the constant step, z > 0."""
    n = 12
    ev = _hourly_events(spark, [10.0 + 2.5 * i for i in range(n)])
    row = stats.mann_kendall(ev).collect()[0]
    assert row["n_buckets"] == n
    assert row["s_stat"] == n * (n - 1) // 2
    # var = n(n-1)(2n+5)/18 with zero tie correction
    var = n * (n - 1) * (2 * n + 5) / 18.0
    assert abs(row["var_s"] - var) < 1e-6
    assert abs(row["sen_slope_per_hour"] - 2.5) < 1e-6
    z = (row["s_stat"] - 1.0) / math.sqrt(var)
    assert abs(row["z"] - z) < 1e-6


def test_mann_kendall_tie_correction_and_sign(spark):
    """A decreasing series with a tied pair: S < 0, tie term subtracts
    t(t-1)(2t+5) for the tied group, z uses the +1 correction."""
    vals = [50.0, 40.0, 40.0, 30.0, 20.0]  # one tie group of size 2
    ev = _hourly_events(spark, vals)
    row = stats.mann_kendall(ev).collect()[0]
    # pairs: every later < earlier except the (40,40) pair which is 0
    assert row["s_stat"] == -(10 - 1)
    n = 5
    var = (n * (n - 1) * (2 * n + 5) - 2 * 1 * 9) / 18.0
    assert abs(row["var_s"] - var) < 1e-6
    z = (row["s_stat"] + 1.0) / math.sqrt(var)
    assert abs(row["z"] - z) < 1e-6
    assert row["sen_slope_per_hour"] < 0


# ---------------------------------------------------------- char_entropy


def test_char_entropy_known_distributions(spark):
    docs = spark.createDataFrame(
        [
            (1, "aaaa"),          # one symbol -> H = 0
            (2, "abab"),          # uniform 2 -> H = ln 2
            (3, "  "),            # whitespace-only -> empty norm
            (4, "a1b2"),          # digit ratio 0.5
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.char_entropy(docs).collect()}
    assert out[1]["entropy_nats"] == 0.0
    assert abs(out[2]["entropy_nats"] - math.log(2)) < 1e-6
    assert out[2]["n_distinct_chars"] == 2
    assert out[3]["n_chars"] == 0
    assert out[3]["entropy_nats"] == 0.0 and out[3]["digit_ratio"] == 0.0
    assert abs(out[4]["digit_ratio"] - 0.5) < 1e-6
    assert out[4]["n_distinct_chars"] == 4


def test_char_entropy_matches_direct_histogram(spark):
    """Run-length form == direct collections.Counter entropy."""
    import collections

    s = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame([(1, s)], "doc_id long, text string")
    row = text.char_entropy(docs).collect()[0]
    cnt = collections.Counter(s)  # already normalized (lowercase, single spaces)
    L = len(s)
    micro = sum(math.floor(n * math.log(n) * 1e9 + 0.5) for n in cnt.values())
    h = math.log(L) - micro / 1e9 / L
    assert abs(row["entropy_nats"] - math.floor(h * 1e6 + 0.5) / 1e6) < 1e-12
    assert row["n_distinct_chars"] == len(cnt)


# ------------------------------------------------------------- qini_curve


def test_qini_curve_hand_computed(spark):
    """Two score bins, known counts: verify the cumulative uplift and
    the random diagonal against hand arithmetic."""
    # bin 9 (score .95): treated 2/2 convert, control 1/2 convert
    # bin 0 (score .05): treated 0/2 convert, control 1/2 convert
    rows = []
    rows += [(1, 1, 0.95), (1, 1, 0.95), (1, 0, 0.05), (1, 0, 0.05)]
    rows += [(0, 1, 0.95), (0, 0, 0.95), (0, 1, 0.05), (0, 0, 0.05)]
    df = spark.createDataFrame(rows, "treated int, converted int, score double")
    out = {r["bin"]: r for r in
           evaluation.qini_curve(df, "treated", "converted", "score").collect()}
    top = out[9]
    assert (top["n_treat"], top["n_ctrl"]) == (2, 2)
    assert (top["conv_treat"], top["conv_ctrl"]) == (2, 1)
    assert abs(top["cum_uplift"] - (2 - 1 * (2 / 2))) < 1e-6      # = 1.0
    # full depth: conv_t 2, conv_c 2, T=C=4 -> total uplift 0
    assert abs(out[0]["cum_uplift"] - 0.0) < 1e-6
    assert abs(out[0]["random_uplift"] - 0.0) < 1e-6
    # random line at half depth = total_uplift * 0.5 = 0
    assert abs(top["random_uplift"] - 0.0) < 1e-6


def test_qini_curve_validates_bins(spark):
    df = spark.createDataFrame([(1, 1, 0.5)], "t int, y int, s double")
    with pytest.raises(ValueError):
        evaluation.qini_curve(df, "t", "y", "s", n_bins=1)


# --------------------------------------------------------- gesd_outliers


def test_gesd_finds_masked_spikes(spark):
    """Two adjacent huge spikes mask each other for a one-shot z-screen;
    the iterative screen removes them in rounds 1 and 2."""
    vals = [10.0] * 40
    vals[5] = 500.0
    vals[6] = 480.0
    # mild noise so sd > 0 after the spikes are gone
    for i in range(0, 40, 7):
        vals[i] += 1.0
    ev = _hourly_events(spark, vals)
    out = drift.gesd_outliers(ev, k=3)
    rows = {r["round"]: r for r in out.collect()}
    assert rows[1]["x"] == 500.0 and rows[1]["flagged"]
    assert {rows[1]["x"], rows[2]["x"]} == {500.0, 480.0}
    # the bucket timestamps point at the planted hours
    hrs = {rows[1]["bucket"].hour + 24 * (rows[1]["bucket"].day - 1),
           rows[2]["bucket"].hour + 24 * (rows[2]["bucket"].day - 1)}
    assert hrs == {5, 6}
    assert rows[1]["n_remaining"] == 39 and rows[2]["n_remaining"] == 38
    # round 3 removes a normal point -> not flagged at z=3
    assert not rows[3]["flagged"]


def test_gesd_tie_break_earliest_bucket(spark):
    """Two buckets tied at the extreme value: the earliest is removed
    first (the documented tie-break)."""
    vals = [10.0] * 20
    vals[4] = 300.0
    vals[9] = 300.0
    for i in (1, 7, 13, 19):  # noise off the planted indices
        vals[i] += 1.0
    ev = _hourly_events(spark, vals)
    rows = sorted(
        drift.gesd_outliers(ev, k=2).collect(), key=lambda r: r["round"]
    )
    assert rows[0]["bucket"].hour == 4
    assert rows[1]["bucket"].hour == 9
