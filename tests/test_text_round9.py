"""Text-II family (round 9b): readability, hapax stats, Heaps'-law fit."""

import math

import pytest

from financial_fraud_detection_using_time_series_data_spark.operators import text


def test_readability_hand_counts(spark):
    doc = "The cat sat. The dog ran fast! Did it rain?"
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    row = text.readability(df).collect()[0]
    assert row["n_words"] == 10
    assert row["n_sentences"] == 3
    # vowel groups: the(1) cat(1) sat(1) the(1) dog(1) ran(1) fast(1)
    # did(1) it(1) rain(1) = 10
    assert row["n_syllables"] == 10
    w, s, syl = 10.0, 3.0, 10.0
    fre = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
    fkgl = 0.39 * (w / s) + 11.8 * (syl / w) - 15.59
    assert row["flesch_reading_ease"] == pytest.approx(fre, abs=1e-6)
    assert row["fk_grade"] == pytest.approx(fkgl, abs=1e-6)


def test_readability_empty_doc_nulls(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = text.readability(df).collect()[0]
    assert row["n_words"] == 0
    assert row["flesch_reading_ease"] is None and row["fk_grade"] is None


def test_readability_syllables_floor_at_words(spark):
    # consonant-only tokens still count >= 1 syllable each
    df = spark.createDataFrame([(1, "hmm pfft tsk")], "doc_id long, text string")
    row = text.readability(df).collect()[0]
    assert row["n_words"] == 3 and row["n_syllables"] == 3


def test_hapax_stats_hand_check(spark):
    docs = [
        (1, "alpha beta alpha"),
        (2, "beta gamma delta"),
        (3, "epsilon"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = text.hapax_stats(df).collect()[0]
    # freqs: alpha 2, beta 2, gamma 1, delta 1, epsilon 1
    assert row["n_tokens"] == 7 and row["vocab_size"] == 5
    assert row["n_hapax"] == 3 and row["n_dis"] == 2
    assert row["hapax_ratio"] == pytest.approx(3 / 5, abs=1e-6)
    assert row["type_token_ratio"] == pytest.approx(5 / 7, abs=1e-6)


def test_hapax_stats_ignores_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "x y"), (2, "")], "doc_id long, text string"
    )
    row = text.hapax_stats(df).collect()[0]
    assert row["n_tokens"] == 2 and row["vocab_size"] == 2


def test_heaps_law_hand_ols(spark):
    docs = [
        (1, "a b c"),          # N=3,  V=3
        (2, "a b d d"),        # N=7,  V=4
        (3, "e f g h"),        # N=11, V=8
        (4, "a a a a a a"),    # N=17, V=8
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = text.heaps_law(df).collect()[0]
    pts = [(3, 3), (7, 4), (11, 8), (17, 8)]
    qs = [
        (math.floor(math.log(n) * 1e9 + 0.5), math.floor(math.log(v) * 1e9 + 0.5))
        for n, v in pts
    ]
    xs = [x / 1e9 for x, _ in qs]
    ys = [y / 1e9 for _, y in qs]
    n = float(len(pts))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    k = math.exp((sy - beta * sx) / n)
    assert row["n_docs"] == 4
    assert row["beta"] == pytest.approx(beta, abs=1e-6)
    assert row["k"] == pytest.approx(k, abs=1e-6)


def test_heaps_law_degenerate_single_doc(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    row = text.heaps_law(df).collect()[0]
    assert row["n_docs"] == 1 and row["beta"] is None


def test_text_round9_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in ("readability", "hapax_stats", "heaps_law"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "No Partition Defined" not in plan, name
