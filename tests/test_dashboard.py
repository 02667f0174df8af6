"""Static dashboard renderer (reference streamlit_app.py analog):
aggregates are Spark-side, output is self-contained HTML."""

import re

from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.serving.dashboard import (
    dashboard_aggregates,
    gauge_svg,
    render_dashboard,
)
from financial_fraud_detection_using_time_series_data_spark.sources import load_table


def test_gauge_svg_risk_bands():
    assert '"#ef4444"' in gauge_svg(0.95)  # CRITICAL
    assert '"#10b981"' in gauge_svg(0.05)  # MINIMAL
    assert "100%" in gauge_svg(1.5)  # clipped


def test_render_dashboard_sections(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "label", (F.col("event_type") == "error").cast("int")
    )
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    out = render_dashboard(
        cur,
        str(tmp_path / "dash.html"),
        label_col="label",
        reference_df=ref,
    )
    doc = open(out).read()
    assert "<svg" in doc and "Risk distribution" in doc
    assert "Threshold sweep" in doc and "Score drift" in doc
    n = int(re.search(r"(\d+) events scored", doc).group(1))
    assert n == cur.count()


def test_dashboard_aggregates_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    agg = dashboard_aggregates(ev)
    assert agg["n"] == ev.count()
    assert sum(agg["risk_counts"].values()) == agg["n"]
    assert 0.0 <= agg["mean_score"] <= 1.0
