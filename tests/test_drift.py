"""PSI drift-detector contracts: zero for identical distributions, large
for a shifted one, and a scan-shaped plan (no windows, no big joins)."""

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import drift


def _uniform(spark, n=5000, shift=0.0):
    return spark.range(n).select(
        ((F.pmod(F.col("id") * 7919, 10000)) / 10000.0 + shift).alias("value")
    )


def test_psi_zero_on_identical(spark):
    a, b = _uniform(spark), _uniform(spark)
    assert abs(drift.psi(a, b)) < 1e-9


def test_psi_flags_shift(spark):
    a, b = _uniform(spark), _uniform(spark, shift=0.5)
    assert drift.psi(a, b) > 0.25, "half-range shift must cross the retrain line"


def test_psi_bins_complete_and_sane(spark):
    a, b = _uniform(spark), _uniform(spark, shift=0.1)
    rows = drift.psi_bins(a, b, n_bins=10).collect()
    assert [r.bin for r in rows] == list(range(10))
    assert abs(sum(r.p_ref for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r.n_ref + r.n_cur >= 0 and r.p_ref > 0 and r.p_cur > 0


def test_psi_approx_edges_close_to_exact(spark):
    """The 100 TB sketch-edges path must track the exact path closely on
    a smooth distribution."""
    a, b = _uniform(spark), _uniform(spark, shift=0.3)
    exact = drift.psi(a, b)
    approx = drift.psi(a, b, exact_edges=False)
    assert abs(exact - approx) < 0.05 * max(exact, 1.0), (exact, approx)


def test_ks_zero_on_identical_and_flags_shift(spark):
    a, b = _uniform(spark), _uniform(spark)
    row = drift.ks_statistic(a, b).collect()[0]
    assert abs(row.ks_stat) < 1e-9 and row.n_ref == row.n_cur == 5000
    shifted = drift.ks_statistic(a, _uniform(spark, shift=0.5)).collect()[0]
    assert shifted.ks_stat > 0.45  # half-range shift on uniform → KS ≈ 0.5


def test_ks_matches_scipy_formula_small(spark):
    """Brute-force cross-check on a small deterministic sample."""
    a, b = _uniform(spark, n=200), _uniform(spark, n=300, shift=0.2)
    got = drift.ks_statistic(a, b).collect()[0].ks_stat
    av = sorted(r.value for r in a.collect())
    bv = sorted(r.value for r in b.collect())
    pts = sorted(set(av) | set(bv))
    import bisect

    want = max(
        abs(
            bisect.bisect_right(av, p) / len(av)
            - bisect.bisect_right(bv, p) / len(bv)
        )
        for p in pts
    )
    assert abs(got - want) < 1e-12


def test_ks_windows_are_partitioned(spark):
    """The CDF cumsum must run chunked — every WindowExec needs a
    partition spec (three bracket groups in the node's argument list)."""
    import re

    a, b = _uniform(spark), _uniform(spark, shift=0.1)
    plan = drift.ks_statistic(a, b)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            groups = re.findall(r"\[[^\]]*\]", line)
            assert len(groups) >= 3, f"partitionless window:\n{line.strip()}"


def test_streaming_drift_monitor(spark, tmp_path):
    """Live leg: rate stream vs a same-distribution static reference →
    per-batch PSI rows land in the sink and read near-zero drift once a
    batch is big enough to be statistically quiet."""
    import time

    from financial_fraud_detection_using_time_series_data_spark.streaming.scoring import (
        drift_monitor,
    )

    ref = spark.range(20_000).select(
        (F.col("id") % 2000).cast("double").alias("value")
    )
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 2000).load()
        .select((F.col("value") % 2000).cast("double").alias("value"))
    )
    out_dir = str(tmp_path / "drift")
    q = drift_monitor(stream, ref, out_dir, str(tmp_path / "ckpt"))
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(out_dir).collect()
            except Exception:
                rows = []
            if any(r.n_events >= 2000 for r in rows):
                break
            time.sleep(1)
        assert rows, "no PSI rows from the drift monitor"
        big = [r for r in rows if r.n_events >= 2000]
        assert big, [r.n_events for r in rows]
        assert all(r.psi >= 0.0 for r in rows)
        # same distribution → PSI far below the 0.1 watch line
        assert min(r.psi for r in big) < 0.05, [(r.n_events, r.psi) for r in big]
    finally:
        q.stop()


def test_psi_plan_has_no_window(spark):
    a, b = _uniform(spark), _uniform(spark, shift=0.1)
    plan = drift.psi_bins(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan and "Window" not in plan, plan[:1200]


def test_chi2_drift_identical_is_zero(spark):
    from financial_fraud_detection_using_time_series_data_spark.operators.drift import (
        chi2_drift,
    )

    df = spark.range(1000).select(
        (F.col("id") % 4).cast("string").alias("cat")
    )
    r = chi2_drift(df, df, "cat").collect()[0]
    assert r.chi2 == 0.0 and r.dof == 3


def test_chi2_drift_matches_bruteforce(spark):
    import numpy as np

    from financial_fraud_detection_using_time_series_data_spark.operators.drift import (
        chi2_drift,
    )

    rng = np.random.default_rng(11)
    a = rng.choice(["x", "y", "z"], size=600, p=[0.5, 0.3, 0.2])
    b = rng.choice(["x", "y", "z"], size=400, p=[0.3, 0.4, 0.3])
    import pandas as pd

    ra = spark.createDataFrame(pd.DataFrame({"cat": a}))
    rb = spark.createDataFrame(pd.DataFrame({"cat": b}))
    got = chi2_drift(ra, rb, "cat").collect()[0].chi2

    cats = sorted(set(a) | set(b))
    na = np.array([(a == c).sum() for c in cats], dtype=float)
    nb = np.array([(b == c).sum() for c in cats], dtype=float)
    n = na.sum() + nb.sum()
    row = na + nb
    ea, eb = row * na.sum() / n, row * nb.sum() / n
    want = (((na - ea) ** 2) / ea + ((nb - eb) ** 2) / eb).sum()
    assert abs(got - want) < 1e-5, (got, want)


def test_chi2_drift_detects_shift(spark):
    from financial_fraud_detection_using_time_series_data_spark.operators.drift import (
        chi2_drift,
    )

    ref = spark.range(1000).select(
        F.when(F.col("id") % 10 < 8, "a").otherwise("b").alias("cat")
    )
    cur = spark.range(1000).select(
        F.when(F.col("id") % 10 < 2, "a").otherwise("b").alias("cat")
    )
    r = chi2_drift(ref, cur, "cat").collect()[0]
    assert r.chi2 > 100  # massive shift -> far beyond any critical value


def test_drift_report_composes_three_metrics(spark, sf_dir):
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    rows = {r.metric: r for r in drift.drift_report(ref, cur).collect()}
    assert set(rows) == {"psi", "ks", "chi2"}
    assert rows["psi"].col_name == "value" and rows["chi2"].col_name == "event_type"
    # parity-split halves: all three statistics near zero but defined
    for r in rows.values():
        assert r.statistic is not None and r.statistic >= -1e-9
    assert rows["ks"].statistic < 0.1 and rows["psi"].statistic < 0.1
    # psi row equals the sum of the per-bin decomposition
    psi_sum = (
        drift.psi_bins(ref, cur, "value", n_bins=10)
        .agg(F.sum("psi_term").alias("s"))
        .collect()[0]
        .s
    )
    assert abs(rows["psi"].statistic - psi_sum) < 1e-12


# --- volume_anomaly ----------------------------------------------------------


def test_volume_anomaly_flags_planted_outlier(spark):
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(12):
        # jittered baseline (100-104) with a 5x spike on day index 7
        n = 100 + (d % 5) if d != 7 else 500
        for _ in range(n):
            rows.append((eid, t0 + timedelta(days=d, seconds=eid % 3600)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r.bucket_ts.day: r for r in drift.volume_anomaly(df, "ts").collect()}
    assert len(out) == 12
    assert out[8].is_anomaly  # day index 7 -> Jan 8
    assert all(not out[d].is_anomaly for d in out if d != 8)
    # median baseline (101.5) is untouched by the spike; MAD is 1.5
    assert out[8].baseline_median == 101.5
    assert out[8].robust_z == pytest.approx(0.6745 * (500 - 101.5) / 1.5)


def test_volume_anomaly_zero_mad_safe(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [
        (i * 10 + d, t0 + timedelta(days=d, seconds=i))
        for d in range(5)
        for i in range(3)
    ]  # perfectly constant volume -> MAD 0 -> no z, no flags
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = drift.volume_anomaly(df, "ts").collect()
    assert all(r.robust_z is None and not r.is_anomaly for r in out)


def test_new_entity_rate_births_and_cumulative(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 10), (2, t0 + timedelta(hours=3), 11),        # day 1: 2 births
        (3, t0 + timedelta(days=1), 10),                      # day 2: u10 returns, no birth
        (4, t0 + timedelta(days=2), 12), (5, t0 + timedelta(days=2, hours=1), 13),
        (6, t0 + timedelta(days=2), 10),                      # day 3: 2 births
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = sorted(
        drift.new_entity_rate(df, "user_id", "ts").collect(),
        key=lambda r: r.bucket_ts,
    )
    assert [r.n_new for r in out] == [2, 2]  # day 2 emits no row (no births)
    assert [r.cumulative_entities for r in out] == [2, 4]
    assert out[0].bucket_ts.day == 1 and out[1].bucket_ts.day == 3


def test_seasonal_anomaly_flags_off_season_not_peak(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows, eid = [], 0
    # 20 days: quiet hours ~10, hour-20 surge ~60 — both normal in season
    for d in range(20):
        for h, v in [(3, 10.0), (9, 10.5), (15, 10.0), (20, 60.0)]:
            rows.append((eid, t0 + timedelta(days=d, hours=h), 1, "a", v + 0.01 * eid))
            eid += 1
    # the planted anomaly: a surge-sized amount at 3am
    rows.append((9999, t0 + timedelta(days=20, hours=3), 1, "a", 60.0))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    # k=10: the planted off-season surge reads z≈52; the next-largest
    # |z| (≈7.6, collateral of the outlier inflating its own thin
    # day-of-week mean) stays below the bar
    out = drift.seasonal_anomaly(df, k=10.0).collect()
    assert {r.event_id for r in out} == {9999}
    # ... and 60 at hour 20 is NORMAL for the evening surge
    assert all(r.hour != 20 for r in out)


def test_benford_mad_conformity_buckets(spark):
    import numpy as np

    # benford-distributed first digits -> 'close'
    rng = np.random.default_rng(7)
    vals = (10 ** rng.uniform(0, 3, size=20000)).tolist()  # log-uniform == Benford
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    r = drift.benford_mad(df, "value").collect()[0]
    assert r.conformity in ("close", "acceptable") and r.mad < 0.012
    # uniform 1..9 first digits -> far from Benford
    df2 = spark.createDataFrame(
        [(float(d) * 10.0,) for d in range(1, 10) for _ in range(100)],
        "value double",
    )
    r2 = drift.benford_mad(df2, "value").collect()[0]
    assert r2.conformity == "nonconformity" and r2.n_values == 900


# --- periodogram -------------------------------------------------------------


def test_periodogram_finds_planted_cycle(spark):
    import numpy as np
    from datetime import datetime, timedelta

    from financial_fraud_detection_using_time_series_data_spark.operators import drift

    base = datetime(2024, 1, 1)
    rows, eid = [], 0
    # 96 hourly buckets with a strong 24-hour cycle: count = 5 + 4*cos(2pi t/24)
    # -> dominant harmonic k = 96/24 = 4
    for t in range(96):
        c = int(round(5 + 4 * np.cos(2 * np.pi * t / 24)))
        for _ in range(c):
            rows.append((eid, base + timedelta(hours=t, minutes=2))); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r.k: (r.period_buckets, r.power) for r in drift.periodogram(df, max_k=12).collect()}
    best = max(out, key=lambda k: out[k][1])
    assert best == 4
    assert out[4][0] == pytest.approx(24.0)
    # the cycle harmonic dominates every other by a wide margin
    for k, (_, p) in out.items():
        if k != 4:
            assert p < out[4][1] / 10, k


def test_periodogram_matches_numpy(spark):
    import numpy as np
    from datetime import datetime, timedelta

    from financial_fraud_detection_using_time_series_data_spark.operators import drift

    rng = np.random.default_rng(9)
    base = datetime(2024, 1, 1)
    counts = rng.integers(0, 5, 30)
    rows, eid = [], 0
    for t in range(30):
        for _ in range(int(counts[t])):
            rows.append((eid, base + timedelta(hours=t))); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r.k: r.power for r in drift.periodogram(df, max_k=6).collect()}
    # numpy reference with identical quantization
    N = 30
    for k in range(1, 7):
        th = 2 * np.pi * k * np.arange(N) / N
        c = int(sum(np.floor(counts * np.cos(th) * 1e4 + 0.5)))
        s = int(sum(np.floor(counts * np.sin(th) * 1e4 + 0.5)))
        assert out[k] == pytest.approx((float(c) ** 2 + float(s) ** 2) / 1e8, rel=1e-12), k
