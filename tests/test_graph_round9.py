"""Graph II (round 9b): degree assortativity and degree distribution
over the shared-attribute entity graph."""

import math

import pytest
from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import events


def _attr_df(spark, pairs):
    """(entity, attr) memberships -> frame with user_id/value columns."""
    rows = [(int(u), float(a)) for u, a in pairs]
    return spark.createDataFrame(rows, "user_id long, value double")


def test_assortativity_star_is_negative(spark):
    # star: hub 0 shares a distinct attr with each leaf -> hub deg 4,
    # leaves deg 1 -> strongly disassortative
    pairs = []
    for leaf in (1, 2, 3, 4):
        pairs += [(0, 100 + leaf), (leaf, 100 + leaf)]
    df = _attr_df(spark, pairs)
    row = events.assortativity(df, F.col("value")).collect()[0]
    assert row["n_nodes"] == 5 and row["n_edges"] == 4
    assert row["assortativity"] == pytest.approx(-1.0, abs=1e-6)


def test_assortativity_hand_pearson(spark):
    # path graph 1-2-3-4 via three shared attrs
    pairs = [(1, 10), (2, 10), (2, 20), (3, 20), (3, 30), (4, 30)]
    df = _attr_df(spark, pairs)
    row = events.assortativity(df, F.col("value")).collect()[0]
    edges = [(1, 2), (2, 3), (3, 4)]
    deg = {1: 1, 2: 2, 3: 2, 4: 1}
    pts = [(deg[u], deg[v]) for u, v in edges] + [
        (deg[v], deg[u]) for u, v in edges
    ]
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    r = (m * sxy - sx * sy) / math.sqrt(
        (m * sxx - sx * sx) * (m * syy - sy * sy)
    )
    assert row["assortativity"] == pytest.approx(r, abs=1e-6)


def test_assortativity_regular_graph_null(spark):
    # triangle: every node degree 2 -> zero variance -> NULL r
    pairs = [(1, 10), (2, 10), (2, 20), (3, 20), (1, 30), (3, 30)]
    df = _attr_df(spark, pairs)
    row = events.assortativity(df, F.col("value")).collect()[0]
    assert row["n_edges"] == 3 and row["assortativity"] is None


def test_degree_distribution_hand_check(spark):
    pairs = []
    for leaf in (1, 2, 3):
        pairs += [(0, 100 + leaf), (leaf, 100 + leaf)]
    df = _attr_df(spark, pairs)
    out = {r["degree"]: r for r in events.degree_distribution(df, F.col("value")).collect()}
    assert out[1]["n_nodes"] == 3 and out[3]["n_nodes"] == 1
    assert out[1]["share"] == pytest.approx(0.75, abs=1e-6)


def test_degree_cap_excludes_popular_attrs(spark):
    # one attr shared by 12 entities exceeds max_degree=10 -> no edges
    pairs = [(u, 999) for u in range(12)]
    df = _attr_df(spark, pairs)
    assert events.degree_distribution(df, F.col("value")).count() == 0


def test_graph_round9_plan_pins(spark, sf_dir):
    import __spark_entry__ as entrymod

    for name in ("assortativity", "degree_distribution"):
        plan = (
            entrymod.queries()[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
