"""Classical hypothesis tests (round 9b): Spearman, Kruskal-Wallis,
Welch t, Brown-Forsythe — hand-computed parity, edge cases, plan pins."""

import math

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import stats


def _avg_ranks(vals):
    """Tie-averaged ranks, the scipy.stats.rankdata('average') contract."""
    s = sorted(vals)
    out = []
    for v in vals:
        lo = sum(1 for x in s if x < v)
        eq = sum(1 for x in s if x == v)
        out.append(lo + (eq + 1) / 2.0)
    return out


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    return (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )


def test_spearman_matches_hand_ranks_with_ties(spark):
    xs = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 7.0]
    ys = [2.0, 1.0, 4.0, 4.0, 6.0, 8.0, 7.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    row = stats.spearman_corr(df, "x", "y").collect()[0]
    expect = _pearson(_avg_ranks(xs), _avg_ranks(ys))
    assert row["n"] == 7
    assert row["rho"] == pytest.approx(expect, rel=1e-12)


def test_spearman_perfect_monotone_and_constant(spark):
    df = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 9)], "x double, y double"
    )
    assert stats.spearman_corr(df, "x", "y").collect()[0]["rho"] == 1.0
    const = spark.createDataFrame(
        [(float(i), 3.0) for i in range(5)], "x double, y double"
    )
    assert stats.spearman_corr(const, "x", "y").collect()[0]["rho"] is None


def test_spearman_drops_null_rows(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (None, 3.0), (4.0, 2.0), (5.0, 5.0)],
        "x double, y double",
    )
    row = stats.spearman_corr(df, "x", "y").collect()[0]
    assert row["n"] == 3
    expect = _pearson(_avg_ranks([1.0, 4.0, 5.0]), _avg_ranks([1.0, 2.0, 5.0]))
    assert row["rho"] == pytest.approx(expect, rel=1e-12)


def _kw_hand(groups):
    """Tie-corrected Kruskal-Wallis H over a dict name -> values."""
    allv = [v for vs in groups.values() for v in vs]
    n = len(allv)
    ranks = _avg_ranks(allv)
    pos = 0
    rsum = 0.0
    for vs in groups.values():
        rg = sum(ranks[pos : pos + len(vs)])
        rsum += rg * rg / len(vs)
        pos += len(vs)
    h = 12.0 / (n * (n + 1)) * rsum - 3.0 * (n + 1)
    ties = {}
    for v in allv:
        ties[v] = ties.get(v, 0) + 1
    c = 1.0 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    return h, h / c


def test_kruskal_wallis_hand_check_with_ties(spark):
    groups = {
        "a": [1.0, 2.0, 2.0, 5.0],
        "b": [3.0, 4.0, 4.0, 9.0, 9.0],
        "c": [2.0, 8.0, 10.0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    out = stats.kruskal_wallis(df, "g", "v").collect()[0]
    h, hc = _kw_hand(groups)
    assert out["n"] == 12 and out["k"] == 3
    assert out["h"] == pytest.approx(h, rel=1e-9)
    assert out["h_corrected"] == pytest.approx(hc, rel=1e-9)


def test_kruskal_wallis_single_group_null(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    out = stats.kruskal_wallis(df, "g", "v").collect()[0]
    assert out["k"] == 1 and out["h"] is None


def test_kruskal_wallis_all_tied_null_corrected(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0)], "g string, v double"
    )
    out = stats.kruskal_wallis(df, "g", "v").collect()[0]
    # every value ties -> C = 0 -> corrected H undefined; raw H = 0
    assert out["h"] == pytest.approx(0.0, abs=1e-9)
    assert out["h_corrected"] is None


def test_welch_ttest_hand_check(spark):
    a = [27.5, 21.0, 19.0, 23.6, 17.0, 17.9, 16.9, 20.1, 21.9, 22.6]
    b = [27.1, 22.0, 20.8, 23.4, 23.4, 23.5, 25.8, 22.0, 24.8, 20.2]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    out = stats.welch_ttest(df, "g", "v", "a", "b").collect()[0]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["mean_a"] == pytest.approx(ma, rel=1e-12)
    assert out["t_stat"] == pytest.approx(t, rel=1e-10)
    assert out["df"] == pytest.approx(dof, rel=1e-10)
    assert out["cohens_d"] == pytest.approx((ma - mb) / sp, rel=1e-10)


def test_welch_ttest_degenerate_small_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
    )
    out = stats.welch_ttest(df, "g", "v", "a", "b").collect()[0]
    assert out["n_a"] == 1 and out["t_stat"] is None
    assert out["mean_a"] == 1.0


def test_brown_forsythe_hand_check(spark):
    groups = {
        "a": [1.0, 2.0, 3.0, 9.0, 10.0],  # median 3, spread wide
        "b": [5.0, 5.5, 6.0, 6.5, 7.0],  # median 6, tight
        "c": [1.0, 4.0, 7.0],  # median 4
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    out = stats.brown_forsythe(df, "g", "v").collect()[0]
    # hand one-way ANOVA on z = |x - med_g|
    zs = {
        g: [abs(v - sorted(vs)[len(vs) // 2]) for v in vs]
        for g, vs in groups.items()
    }
    allz = [z for v in zs.values() for z in v]
    n, k = len(allz), len(zs)
    gm = sum(allz) / n
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in zs.values())
    ssw = sum(
        (z - sum(v) / len(v)) ** 2 for v in zs.values() for z in v
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert out["n"] == n and out["k"] == k
    assert out["df1"] == k - 1 and out["df2"] == n - k
    assert out["f_stat"] == pytest.approx(f, rel=1e-5)


def test_brown_forsythe_zero_within_null(spark):
    # every group's |x - med| identical within group -> SSW = 0 -> NULL F
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 14.0)],
        "g string, v double",
    )
    out = stats.brown_forsythe(df, "g", "v").collect()[0]
    assert out["f_stat"] is None


def test_hypothesis_family_plan_pins(spark, sf_dir):
    """No row-Python, no cartesian products, no partitionless windows in
    any of the four test plans."""
    import __spark_entry__ as entrymod

    for name in (
        "spearman_corr",
        "kruskal_wallis",
        "welch_ttest",
        "brown_forsythe",
    ):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "No Partition Defined" not in plan, name
