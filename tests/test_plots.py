"""Driver-side evaluation visualization helper: curve collection and the
dependency-free CSV export (matplotlib rendering is import-gated)."""

import csv

import pytest

from financial_fraud_detection_using_time_series_data_spark.ml.plots import (
    collect_evaluation_data,
    export_evaluation_csv,
    plot_evaluation,
)
from financial_fraud_detection_using_time_series_data_spark.operators import evaluation
from financial_fraud_detection_using_time_series_data_spark.sources import load_table

from pyspark.sql import functions as F


def _scored(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("event_type") == "error").cast("int").alias("label"),
        (F.col("value") / (F.col("value") + F.lit(100.0))).alias("score"),
    )


def test_collect_and_export(spark, sf_dir, tmp_path):
    scored = _scored(spark, sf_dir)
    curve = evaluation.pr_curve(scored, "label", "score", "event_id")
    sweep = evaluation.threshold_sweep(scored, "label", "score")
    data = collect_evaluation_data(
        pr_curve_df=curve,
        sweep_df=sweep,
        importances=[("amount", 0.5), ("velocity", 0.3)],
    )
    assert len(data["pr"]) > 10
    assert len(data["sweep"]) == 9
    # recall is sorted ascending and within [0, 1]
    recalls = [p[0] for p in data["pr"]]
    assert recalls == sorted(recalls) and 0.0 <= recalls[-1] <= 1.0

    paths = export_evaluation_csv(data, str(tmp_path))
    assert len(paths) == 3
    with open(paths[0]) as fh:
        rows = list(csv.reader(fh))
    assert rows[0] == ["recall", "precision", "threshold"]
    assert len(rows) == len(data["pr"]) + 1


def test_plot_requires_matplotlib_or_renders(spark, sf_dir, tmp_path):
    data = {"importance": [("a", 1.0)]}
    try:
        import matplotlib  # noqa: F401

        paths = plot_evaluation(data, str(tmp_path))
        assert paths and paths[0].endswith("importance.png")
    except ImportError:
        with pytest.raises(ImportError, match="export_evaluation_csv"):
            plot_evaluation(data, str(tmp_path))
