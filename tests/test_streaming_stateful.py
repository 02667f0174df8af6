"""Train/serve-skew check: the stateful streaming expanding features must
equal the batch window engine's output row-for-row on the same data."""

import os

from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import windows
from financial_fraud_detection_using_time_series_data_spark.sources import load_table, normalize_scan_types
from financial_fraud_detection_using_time_series_data_spark.streaming import (
    stateful_user_features,
)


def test_stateful_stream_matches_batch_windows(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")

    # the file-stream source wants a directory of files, and the RAW
    # schema (ts is TIMESTAMP(NANOS) -> bigint under nanosAsLong); convert
    # to a timestamp in the stream exactly like load_table does
    import shutil

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src_dir / "events.parquet")
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema

    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1000")
        .parquet(str(src_dir))
        .transform(lambda d: normalize_scan_types(d, ["ts"]))
    )
    scored = stateful_user_features(stream)
    q = (
        scored.writeStream.format("memory")
        .queryName("stateful_features")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    stream_out = spark.sql(
        "select event_id, user_id, user_txn_count, user_total_amount, "
        "user_avg_amount, user_std_amount, user_max_amount, user_min_amount, "
        "time_since_last_us, is_first_txn from stateful_features"
    )

    batch = windows.expanding_user_features(ev).select(
        "event_id", "user_id",
        F.col("user_txn_count").cast("long").alias("user_txn_count"),
        "user_total_amount", "user_avg_amount", "user_std_amount",
        "user_max_amount", "user_min_amount", "time_since_last_us",
        F.col("is_first_txn").cast("long").alias("is_first_txn"),
    )

    n_stream = stream_out.count()
    n_batch = batch.count()
    assert n_stream == n_batch, f"row counts differ: stream={n_stream} batch={n_batch}"

    # join on event_id; every float rounded to 6dp (stddev_samp uses a
    # different accumulation scheme than sum/sum-of-squares)
    j = stream_out.alias("s").join(batch.alias("b"), "event_id")
    mismatches = j.filter(
        (F.col("s.user_txn_count") != F.col("b.user_txn_count"))
        | (F.abs(F.col("s.user_total_amount") - F.col("b.user_total_amount")) > 1e-6)
        | (F.abs(F.col("s.user_avg_amount") - F.col("b.user_avg_amount")) > 1e-6)
        | (
            F.abs(F.col("s.user_std_amount") - F.col("b.user_std_amount")) > 1e-6
        )  # NULL-safe: NULL != NULL filters to false on both sides below
        | (F.col("s.user_std_amount").isNull() != F.col("b.user_std_amount").isNull())
        | (F.col("s.user_max_amount") != F.col("b.user_max_amount"))
        | (F.col("s.user_min_amount") != F.col("b.user_min_amount"))
        | (
            F.coalesce(F.col("s.time_since_last_us"), F.lit(-1))
            != F.coalesce(F.col("b.time_since_last_us"), F.lit(-1))
        )
        | (F.col("s.is_first_txn") != F.col("b.is_first_txn"))
    ).count()
    assert mismatches == 0, f"{mismatches} rows differ between stream and batch"


def test_stateful_multi_chunk_group_ordering(spark, tmp_path):
    """A user whose micro-batch spans MULTIPLE Arrow chunks must still be
    processed in global (ts, id) order — regression for per-chunk
    sorting (Arrow batch size forced tiny, input written ts-descending)."""
    import pandas as pd

    n = 400
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": (
                pd.to_datetime("2024-01-01") + pd.to_timedelta(range(n), unit="s")
            ).tz_localize("UTC"),
            "user_id": [1] * n,
            "value": [float((i * 7) % 100) for i in range(n)],
        }
    ).sort_values("ts", ascending=False)  # worst case: reverse time order

    src = tmp_path / "one_user"
    src.mkdir()
    pdf.to_parquet(src / "p0.parquet", coerce_timestamps="us", index=False)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        schema = spark.read.parquet(str(src)).schema
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = stateful_user_features(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("chunked_stateful")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(60)
        finally:
            q.stop()
        got = (
            spark.sql(
                "select event_id, user_txn_count, time_since_last_us "
                "from chunked_stateful"
            )
            .toPandas()
            .sort_values("event_id")
        )
        assert len(got) == n
        # processed in ts order == event_id order: cumcount must equal id
        assert (got["user_txn_count"].to_numpy() == got["event_id"].to_numpy()).all()
        # every gap is exactly +1s, never negative
        dt = got["time_since_last_us"].iloc[1:]
        assert (dt == 1_000_000).all()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_tws_stream_matches_batch_windows(spark, sf_dir, tmp_path):
    """The transformWithStateInPandas implementation must ALSO equal the
    batch window engine row-for-row (same contract as the
    applyInPandasWithState path, Spark 4 API + RocksDB state store).

    When google.protobuf is unavailable (the TWS state-server protocol
    is protobuf-based and this container does not ship it), the library
    falls back cleanly to the applyInPandasWithState implementation with
    the identical output contract — this test then pins the fallback's
    parity and, on a protobuf-equipped cluster, exercises real TWS."""
    from financial_fraud_detection_using_time_series_data_spark.streaming import (
        stateful_user_features_tws,
    )

    ev = load_table(spark, sf_dir, "events")

    import shutil

    src_dir = tmp_path / "events_stream_tws"
    src_dir.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src_dir / "events.parquet")
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema

    old_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", "1000")
            .parquet(str(src_dir))
            .transform(lambda d: normalize_scan_types(d, ["ts"]))
        )
        out = stateful_user_features_tws(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("tws_features")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", old_provider)

    stream_out = spark.sql(
        "select event_id, user_id, user_txn_count, user_total_amount, "
        "user_avg_amount, user_std_amount, time_since_last_us, is_first_txn "
        "from tws_features"
    )
    batch = windows.expanding_user_features(ev).select(
        "event_id", "user_id",
        F.col("user_txn_count").cast("long").alias("user_txn_count"),
        "user_total_amount", "user_avg_amount", "user_std_amount",
        "time_since_last_us",
        F.col("is_first_txn").cast("long").alias("is_first_txn"),
    )
    assert stream_out.count() == batch.count()
    j = stream_out.alias("s").join(batch.alias("b"), "event_id")
    mismatches = j.filter(
        (F.col("s.user_txn_count") != F.col("b.user_txn_count"))
        | (F.abs(F.col("s.user_total_amount") - F.col("b.user_total_amount")) > 1e-6)
        | (F.abs(F.col("s.user_avg_amount") - F.col("b.user_avg_amount")) > 1e-6)
        | (F.col("s.user_std_amount").isNull() != F.col("b.user_std_amount").isNull())
        | (
            F.coalesce(F.col("s.time_since_last_us"), F.lit(-1))
            != F.coalesce(F.col("b.time_since_last_us"), F.lit(-1))
        )
        | (F.col("s.is_first_txn") != F.col("b.is_first_txn"))
    ).count()
    assert mismatches == 0, f"{mismatches} rows differ between TWS stream and batch"


def test_stream_stream_attribution_matches_batch(spark, sf_dir, tmp_path):
    """The streaming click->purchase attribution join must emit exactly
    the rows the equivalent batch join produces (no watermark drops with
    availableNow over a finite input)."""
    import shutil

    from financial_fraud_detection_using_time_series_data_spark.streaming.scoring import (
        stream_stream_attribution,
    )

    src_dir = tmp_path / "events_ss"
    src_dir.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src_dir / "events.parquet")
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema

    def stream():
        return (
            spark.readStream.schema(raw_schema)
            .parquet(str(src_dir))
            .transform(lambda d: normalize_scan_types(d, ["ts"]))
        )

    clicks = stream().filter(F.col("event_type") == "click")
    purchases = stream().filter(F.col("event_type") == "purchase")
    joined = stream_stream_attribution(clicks, purchases)
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_attr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = spark.sql(
        "select user_id, click_id, purchase_id, purchase_value from ss_attr"
    )

    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    want = c.join(
        p,
        F.expr(
            "c_user = p_user AND purchase_ts > click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 30 minutes"
        ),
    ).select(
        F.col("c_user").alias("user_id"), "click_id", "purchase_id", "purchase_value"
    )
    n_got, n_want = got.count(), want.count()
    assert n_want > 0, "batch attribution join matched nothing — fixture too sparse"
    assert n_got == n_want, f"stream={n_got} batch={n_want}"
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_incremental_state_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming foreachBatch maintenance over file micro-batches must end
    in the same state as one batch init over the full data."""
    import os

    from financial_fraud_detection_using_time_series_data_spark.plans import incremental
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table
    from financial_fraud_detection_using_time_series_data_spark.streaming.scoring import (
        incremental_state_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = tmp_path / "stream_src"
    # two files -> maxFilesPerTrigger=1 gives two micro-batches
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(src / "a")
    )
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(src / "b")
    )
    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    state_dir = str(tmp_path / "state")
    q = incremental_state_stream(stream, state_dir)
    q.processAllAvailable()
    q.stop()

    from financial_fraud_detection_using_time_series_data_spark.streaming.scoring import (
        read_state,
    )

    state = read_state(spark, state_dir)
    direct = incremental.init_state(ev)
    got_m = {r["event_type"]: r for r in state["moments"].collect()}
    want_m = {r["event_type"]: r for r in direct["moments"].collect()}
    assert got_m.keys() == want_m.keys()
    for k in want_m:
        assert got_m[k]["n"] == want_m[k]["n"]
        assert abs(got_m[k]["mean"] - want_m[k]["mean"]) < 1e-9
    got_c = {r["value"]: r["n"] for r in state["value_counts"].collect()}
    want_c = {r["value"]: r["n"] for r in direct["value_counts"].collect()}
    assert got_c == want_c


def test_incremental_state_stream_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Crash-replay safety: wiping the streaming checkpoint makes the
    source replay batch ids from 0 — the version guard must turn those
    replays into no-ops instead of double-folding the state."""
    import shutil

    from financial_fraud_detection_using_time_series_data_spark.sources import load_table
    from financial_fraud_detection_using_time_series_data_spark.streaming.scoring import (
        incremental_state_stream,
        read_state,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = tmp_path / "replay_src"
    ev.coalesce(1).write.parquet(str(src))
    state_dir = str(tmp_path / "replay_state")

    def run():
        stream = spark.readStream.schema(ev.schema).parquet(str(src))
        q = incremental_state_stream(stream, state_dir)
        q.processAllAvailable()
        q.stop()

    run()
    first = {
        r["event_type"]: r["n"]
        for r in read_state(spark, state_dir)["moments"].collect()
    }
    # simulate the crash-replay: lose the checkpoint, keep the state
    shutil.rmtree(str(tmp_path / "replay_state" / "_checkpoint"))
    run()
    second = {
        r["event_type"]: r["n"]
        for r in read_state(spark, state_dir)["moments"].collect()
    }
    assert first == second  # no double-fold


def test_load_stream_table_normalizes_like_batch(spark, sf_dir, tmp_path):
    """The streaming loader must hand downstream operators the IDENTICAL
    schema (timestamp flavor included) as the batch loader — the
    normalize_scan_types contract applied to readStream, and the rows
    themselves must round-trip equal through a bounded replay."""
    import shutil

    from financial_fraud_detection_using_time_series_data_spark.sources.tables import (
        load_stream_table,
    )

    src_dir = tmp_path / "events_stream_loader"
    src_dir.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src_dir / "events.parquet")
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema

    batch = load_table(spark, sf_dir, "events")
    stream = load_stream_table(spark, str(src_dir), raw_schema, nano_cols=["ts"])
    assert stream.isStreaming
    assert stream.schema == batch.schema, (stream.schema, batch.schema)

    out_dir = str(tmp_path / "sink")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).orderBy("event_id").collect()
    want = batch.orderBy("event_id").collect()
    assert got == want
