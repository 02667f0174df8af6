"""Privacy-audit family (round 9, beyond-reference §2.13): k-anonymity,
l-diversity, quasi-identifier uniqueness risk, seeded-DP noisy counts."""

import math

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import privacy


def _people(spark):
    # QI = (zip, age_band); sensitive = diagnosis
    rows = [
        ("02139", "20-29", "flu"),
        ("02139", "20-29", "flu"),
        ("02139", "20-29", "cold"),
        ("02139", "30-39", "flu"),       # singleton class
        ("94105", "20-29", "covid"),
        ("94105", "20-29", "covid"),     # homogeneous class of 2
    ]
    return spark.createDataFrame(rows, "zip string, age_band string, dx string")


def test_k_anonymity_flags_small_classes(spark):
    out = privacy.k_anonymity(_people(spark), ["zip", "age_band"], k=2)
    got = {(r["zip"], r["age_band"]): (r["class_size"], r["meets_k"]) for r in out.collect()}
    assert got[("02139", "20-29")] == (3, True)
    assert got[("02139", "30-39")] == (1, False)
    assert got[("94105", "20-29")] == (2, True)


def test_k_anonymity_empty_qi_raises(spark):
    with pytest.raises(ValueError):
        privacy.k_anonymity(_people(spark), [], k=2)


def test_l_diversity_distinct_and_entropy(spark):
    out = privacy.l_diversity(_people(spark), ["zip", "age_band"], "dx", l=2)
    got = {(r["zip"], r["age_band"]): r for r in out.collect()}
    # class (02139, 20-29): {flu:2, cold:1} -> distinct 2, meets
    r = got[("02139", "20-29")]
    assert r["distinct_l"] == 2 and r["meets_l"]
    # entropy-l = exp(H), H = ln(3) - (2 ln 2 + 1 ln 1)/3
    h = math.log(3) - (2 * math.log(2)) / 3
    assert r["entropy_l"] == pytest.approx(math.exp(h), abs=2e-6)
    # homogeneous class: distinct 1, entropy-l exactly 1, fails l=2
    r = got[("94105", "20-29")]
    assert r["distinct_l"] == 1 and r["entropy_l"] == 1.0 and not r["meets_l"]


def test_qi_uniqueness_bands_and_share(spark):
    out = privacy.qi_uniqueness(_people(spark), ["zip", "age_band"])
    got = {r["class_size_band"]: r for r in out.collect()}
    assert got["1"]["n_classes"] == 1 and got["1"]["n_records"] == 1
    assert got["2-5"]["n_classes"] == 2 and got["2-5"]["n_records"] == 5
    assert got["1"]["record_share"] == pytest.approx(1 / 6, abs=2e-6)
    # shares cover every record exactly once
    assert sum(r["n_records"] for r in got.values()) == 6


def test_dp_noisy_count_is_seed_deterministic_and_calibrated(spark):
    df = _people(spark)
    a = {r["zip"]: r["noisy_count"] for r in privacy.dp_noisy_count(df, ["zip"], epsilon=1.0, seed="s1").collect()}
    b = {r["zip"]: r["noisy_count"] for r in privacy.dp_noisy_count(df, ["zip"], epsilon=1.0, seed="s1").collect()}
    c = {r["zip"]: r["noisy_count"] for r in privacy.dp_noisy_count(df, ["zip"], epsilon=1.0, seed="s2").collect()}
    assert a == b                     # same seed -> identical release
    assert a != c                     # different seed -> different noise
    # noise scale: with eps=1e6 the noise is ~0 -> true counts recovered
    tight = {r["zip"]: r["noisy_count"] for r in privacy.dp_noisy_count(df, ["zip"], epsilon=1e6, seed="s1").collect()}
    assert tight["02139"] == pytest.approx(4.0, abs=1e-4)
    assert tight["94105"] == pytest.approx(2.0, abs=1e-4)
    # post-processing floor: never negative
    loose = privacy.dp_noisy_count(df, ["zip"], epsilon=0.01, seed="s1")
    assert all(r["noisy_count"] >= 0.0 for r in loose.collect())


def test_dp_noisy_count_validates_args(spark):
    with pytest.raises(ValueError):
        privacy.dp_noisy_count(_people(spark), ["zip"], epsilon=0.0)
    with pytest.raises(ValueError):
        privacy.dp_noisy_count(_people(spark), [], epsilon=1.0)


def test_privacy_plans_are_agg_only(spark, sf_dir):
    """Plan pins: the whole family is groupBy aggs — no window exchanges,
    no joins (except qi_uniqueness's literal total), no Python UDFs."""
    import __spark_entry__ as entrymod

    for name in ("k_anonymity", "l_diversity", "qi_uniqueness", "dp_noisy_count"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "Window" not in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
