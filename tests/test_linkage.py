"""Fellegi-Sunter record linkage: blocked pair generation + weight
scoring must match a brute-force python implementation."""

import math

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import linkage


def _people(spark):
    rows = [
        # (id, city, seg, bal, name)
        (1, "a", "X", 1000.0, "ann"),
        (2, "a", "X", 1040.0, "ann"),     # near-dup of 1
        (3, "a", "X", 5000.0, "bob"),
        (4, "b", "X", 1000.0, "ann"),     # different block
        (5, "a", "Y", 1000.0, "ann"),     # different block
        (6, "a", "X", 1990.0, "cat"),
        (7, "a", "X", 2010.0, "cat"),     # close bal, crosses 1000-bucket
    ]
    return spark.createDataFrame(
        rows, "id long, city string, seg string, bal double, name string"
    )


def test_block_pairs_respects_blocks_and_cap(spark):
    df = _people(spark)
    pairs = linkage.block_pairs(
        df, ["city", "seg"], "id", ["bal", "name"]
    ).collect()
    got = sorted((r.id_a, r.id_b) for r in pairs)
    # only the (a, X) block has >1 member: ids {1,2,3,6,7} -> C(5,2)=10
    assert got == [
        (1, 2), (1, 3), (1, 6), (1, 7), (2, 3),
        (2, 6), (2, 7), (3, 6), (3, 7), (6, 7),
    ]
    capped = linkage.block_pairs(
        df, ["city", "seg"], "id", ["bal"], max_block=4
    ).collect()
    assert capped == []  # the only multi-member block exceeds the cap


def test_fellegi_sunter_matches_bruteforce(spark):
    df = _people(spark)
    pairs = linkage.block_pairs(df, ["city", "seg"], "id", ["bal", "name"])
    comps = [
        linkage.FieldComparison(
            "name", F.col("name_a") == F.col("name_b"), m=0.9, u=0.1
        ),
        linkage.FieldComparison(
            "bal", F.abs(F.col("bal_a") - F.col("bal_b")) < 100.0, m=0.8, u=0.2
        ),
    ]
    out = {
        (r.id_a, r.id_b): (r.agree_name, r.agree_bal, r.fs_weight, r.fs_class)
        for r in linkage.fellegi_sunter(pairs, comps, lower=0.0, upper=4.0).collect()
    }
    data = {r.id: r for r in df.collect()}

    def w(agree, m, u):
        return math.log2(m / u) if agree else math.log2((1 - m) / (1 - u))

    for (ia, ib), (an, ab, fw, cls) in out.items():
        a, b = data[ia], data[ib]
        exp_an = a.name == b.name
        exp_ab = abs(a.bal - b.bal) < 100.0
        exp_w = w(exp_an, 0.9, 0.1) + w(exp_ab, 0.8, 0.2)
        assert (an, ab) == (exp_an, exp_ab), (ia, ib)
        assert fw == pytest.approx(exp_w, rel=1e-12)
        exp_cls = "match" if exp_w >= 4.0 else ("possible" if exp_w >= 0.0 else "non_match")
        assert cls == exp_cls
    # the engineered near-dup is the top match
    best = max(out, key=lambda k: out[k][2])
    assert best == (1, 2) and out[best][3] == "match"


def test_fellegi_sunter_null_is_disagreement(spark):
    df = spark.createDataFrame(
        [(1, "k", None), (2, "k", "x")], "id long, blk string, f string"
    )
    pairs = linkage.block_pairs(df, ["blk"], "id", ["f"])
    comps = [
        linkage.FieldComparison("f", F.col("f_a") == F.col("f_b"), m=0.9, u=0.1)
    ]
    r = linkage.fellegi_sunter(pairs, comps).collect()[0]
    assert r.agree_f is False
    assert r.fs_weight == pytest.approx(math.log2(0.1 / 0.9))
