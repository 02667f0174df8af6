"""Incremental-pipeline primitives: snapshot_diff and apply_cdc."""

from pyspark.sql import functions as F

from financial_fraud_detection_using_time_series_data_spark.operators import relational


def test_snapshot_diff_classifies_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 9.0), (4, "D", 4.0), (5, "e", 5.0)],
        ["k", "s", "v"],
    )
    out = {
        r["k"]: r["change_type"]
        for r in relational.snapshot_diff(old, new, ["k"]).collect()
    }
    # k=1 unchanged -> absent; k=2 value changed; k=3 removed;
    # k=4 string changed; k=5 added
    assert out == {2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_snapshot_diff_null_safe_compare(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    new = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    out = {
        r["k"]: r["change_type"]
        for r in relational.snapshot_diff(old, new, ["k"]).collect()
    }
    # NULL == NULL is unchanged; NULL -> value is changed
    assert out == {2: "changed"}


def test_snapshot_diff_emits_both_sides(spark):
    old = spark.createDataFrame([(1, 10.0)], ["k", "v"])
    new = spark.createDataFrame([(1, 20.0)], ["k", "v"])
    r = relational.snapshot_diff(old, new, ["k"]).collect()[0]
    assert (r["v_old"], r["v_new"]) == (10.0, 20.0)


def test_apply_cdc_upsert_delete_insert(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (2, "B", "U", 1),   # update existing
            (3, None, "D", 1),  # delete existing
            (4, "d", "I", 1),   # insert new key
        ],
        ["k", "v", "op", "seq"],
    )
    out = {r["k"]: r["v"] for r in relational.apply_cdc(snap, changes, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 4: "d"}


def test_apply_cdc_latest_seq_wins(spark):
    snap = spark.createDataFrame([(1, "a")], ["k", "v"])
    changes = spark.createDataFrame(
        [(1, "first", "U", 1), (1, "second", "U", 2), (1, "stale", "U", 0)],
        ["k", "v", "op", "seq"],
    )
    out = relational.apply_cdc(snap, changes, ["k"]).collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "second")]


def test_apply_cdc_same_seq_delete_upsert_deterministic(spark):
    """At equal seq the op tiebreak (desc) puts 'U' above 'D' — an
    upsert and delete in the same batch resolves to the upsert."""
    snap = spark.createDataFrame([(1, "a")], ["k", "v"])
    changes = spark.createDataFrame(
        [(1, None, "D", 5), (1, "kept", "U", 5)],
        ["k", "v", "op", "seq"],
    )
    out = relational.apply_cdc(snap, changes, ["k"]).collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "kept")]


def test_apply_cdc_delete_then_reinsert_across_batches(spark):
    snap = spark.createDataFrame([(1, "a")], ["k", "v"])
    changes = spark.createDataFrame(
        [(1, None, "D", 1), (1, "back", "I", 2)],
        ["k", "v", "op", "seq"],
    )
    out = relational.apply_cdc(snap, changes, ["k"]).collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "back")]


def test_merge_moments_matches_direct(spark, sf_dir):
    """Merging history+delta partials must reproduce the direct moments
    over the union (up to float tolerance — the merge is algebraically
    exact; doubles round differently along the two paths)."""
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    a = relational.group_moments(ev.where(F.col("ts") < cutoff), ["event_type"])
    b = relational.group_moments(ev.where(F.col("ts") >= cutoff), ["event_type"])
    merged = {
        r["event_type"]: r
        for r in relational.merge_moments(a, b, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r
        for r in relational.group_moments(ev, ["event_type"]).collect()
    }
    assert merged.keys() == direct.keys()
    for k in direct:
        assert merged[k]["n"] == direct[k]["n"]
        assert abs(merged[k]["mean"] - direct[k]["mean"]) < 1e-9
        assert abs(merged[k]["m2"] - direct[k]["m2"]) < 1e-4 * max(1.0, direct[k]["m2"])


def test_merge_moments_one_sided_keys_pass_through(spark):
    a = spark.createDataFrame([("x", 10, 2.0, 5.0)], ["k", "n", "mean", "m2"])
    b = spark.createDataFrame([("y", 4, 7.0, 1.0)], ["k", "n", "mean", "m2"])
    out = {r["k"]: r for r in relational.merge_moments(a, b, ["k"]).collect()}
    assert out["x"]["n"] == 10 and out["x"]["mean"] == 2.0 and out["x"]["m2"] == 5.0
    assert out["y"]["n"] == 4 and out["y"]["mean"] == 7.0 and out["y"]["m2"] == 1.0


def test_compact_files_reduces_file_count(spark, tmp_path):
    from financial_fraud_detection_using_time_series_data_spark.sources.tables import (
        compact_files,
    )

    src = str(tmp_path / "many")
    spark.range(0, 10000).repartition(40).write.parquet(src)
    import pathlib

    n_before = len(list(pathlib.Path(src).glob("*.parquet")))
    assert n_before >= 40
    n = compact_files(spark, src, target_file_bytes=1 << 30)
    n_after = len(list(pathlib.Path(src).glob("*.parquet")))
    assert n == 1 and n_after == 1
    assert spark.read.parquet(src).count() == 10000


def test_compact_files_to_out_path_preserves_source(spark, tmp_path):
    from financial_fraud_detection_using_time_series_data_spark.sources.tables import (
        compact_files,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spark.range(0, 1000).repartition(8).write.parquet(src)
    compact_files(spark, src, target_file_bytes=1 << 30, out_path=dst)
    assert spark.read.parquet(dst).count() == 1000
    assert spark.read.parquet(src).count() == 1000


def test_incremental_state_matches_recompute(spark, sf_dir):
    """Folding daily batches must equal recomputing from scratch: exact
    for counts and day sketches (identical partials at a day-boundary
    split), tolerance for the float moment formulas."""
    from financial_fraud_detection_using_time_series_data_spark.plans import incremental
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    day1 = ev.where(F.col("ts") < cutoff)
    day2 = ev.where(F.col("ts") >= cutoff)

    folded = incremental.update_state(incremental.init_state(day1), day2)
    direct = incremental.init_state(ev)

    fm = {r["event_type"]: r for r in folded["moments"].collect()}
    dm = {r["event_type"]: r for r in direct["moments"].collect()}
    assert fm.keys() == dm.keys()
    for k in dm:
        assert fm[k]["n"] == dm[k]["n"]
        assert abs(fm[k]["mean"] - dm[k]["mean"]) < 1e-9

    fc = {r["value"]: r["n"] for r in folded["value_counts"].collect()}
    dc = {r["value"]: r["n"] for r in direct["value_counts"].collect()}
    assert fc == dc

    # day-boundary split -> identical per-day partials -> exact estimates
    from financial_fraud_detection_using_time_series_data_spark.operators import sketches

    fe = {
        r["day"]: r["approx_distinct"]
        for r in sketches.hll_merge_estimate(
            folded["user_sketches"], ("day",)
        ).collect()
    }
    de = {
        r["day"]: r["approx_distinct"]
        for r in sketches.hll_merge_estimate(
            direct["user_sketches"], ("day",)
        ).collect()
    }
    assert fe == de


def test_incremental_state_report_no_raw_scan(spark, sf_dir):
    """state_report must answer from state alone — its plan reads no
    events parquet."""
    from financial_fraud_detection_using_time_series_data_spark.plans import incremental
    from financial_fraud_detection_using_time_series_data_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    state = incremental.init_state(ev)
    # persist state as parquet (what a daily run would do), reload, report
    import tempfile, os

    d = tempfile.mkdtemp(prefix="incr_state_")
    for name, df in state.items():
        df.write.mode("overwrite").parquet(os.path.join(d, name))
    reloaded = {
        name: spark.read.parquet(os.path.join(d, name)) for name in state
    }
    rep = incremental.state_report(reloaded)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" not in plan
    row = rep.collect()[0]
    assert row["n_rows"] == ev.count()
    exact_users = ev.select("user_id").distinct().count()
    assert abs(row["approx_users"] - exact_users) <= max(1, 0.05 * exact_users)
