"""M8 multimodal plumbing: Arrow batch shapes, deterministic stub
features, frame-sampling expansion."""

from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import multimodal


def test_extract_features_shapes_and_determinism(spark):
    media = multimodal.synthetic_media(spark, n=48)
    out = multimodal.extract_features(media, dim=8)
    rows = out.collect()
    assert len(rows) == 48
    assert all(len(r.feature) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.feature)
    # deterministic: same bytes -> same hash/feature on a second run
    again = {r.media_id: r.content_hash for r in multimodal.extract_features(media).collect()}
    assert all(r.content_hash == again[r.media_id] for r in rows)


def test_frame_sample_plan(spark):
    media = multimodal.synthetic_media(spark, n=12)
    frames = multimodal.frame_sample_plan(media, every_ms=1000)
    pdf = frames.toPandas()
    # only videos (every 3rd row), each 3000ms -> ts 0,1000,2000,3000
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(pdf) == n_videos * 4
    assert sorted(pdf[pdf.media_id == pdf.media_id.iloc[0]].frame_ms) == [0, 1000, 2000, 3000]
