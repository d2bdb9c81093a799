"""Sink tests: side-output splitting via foreachBatch, partitioned parquet,
update-mode streaming (the retract-stream analogue)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_uba_spark.streaming.runner import stream_events
from flink_uba_spark.streaming.sinks import foreach_batch_split, write_partitioned
from flink_uba_spark.streaming.windows import stream_windowed_counts


def test_foreach_batch_split_side_outputs(spark, sf_dir, tmp_path):
    """S7: a tagged stream lands in one directory per tag, all in one query
    (the OutputTag routing twin)."""
    ev = stream_events(spark, sf_dir)
    tagged = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "error", "dead_letter").otherwise("main").alias("route"),
    )
    q = foreach_batch_split(tagged, "route", str(tmp_path / "routed"))
    q.awaitTermination()
    main = spark.read.parquet(str(tmp_path / "routed" / "route=main"))
    dead = spark.read.parquet(str(tmp_path / "routed" / "route=dead_letter"))
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_err = batch.filter(F.col("event_type") == "error").count()
    assert dead.count() == n_err
    assert main.count() == batch.count() - n_err


def test_write_partitioned_prunes(spark, sf_dir, tmp_path):
    """Date-partitioned layout must let a day filter prune partitions."""
    from flink_uba_spark.sources.readers import load_testdata

    ev = load_testdata(spark, sf_dir, ("events",))["events"]
    write_partitioned(ev, str(tmp_path / "events_by_day"), date_col="ts")
    back = spark.read.parquet(str(tmp_path / "events_by_day"))
    assert back.count() == ev.count()
    one_day = back.filter(F.col("event_date") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan
    got = one_day.count()
    want = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert got == want


def test_update_mode_windowed_counts(spark, sf_dir):
    """S6: update output mode (the retract-stream analogue) emits refined
    counts; the latest refinement equals the batch answer for final
    windows and ALSO covers windows the watermark never closed."""
    from flink_uba_spark.operators.topn import windowed_counts
    from flink_uba_spark.sources.readers import load_testdata
    from flink_uba_spark.streaming.runner import run_to_table

    ev = stream_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        F.get_json_object("props", "$.k").cast("long").alias("item_id"), "ts"
    )
    upd = run_to_table(
        stream_windowed_counts(views, F.col("item_id"), "item_id"), output_mode="update"
    )
    evb = load_testdata(spark, sf_dir, ("events",))["events"]
    vb = evb.filter(F.col("event_type") == "view").select(
        F.get_json_object("props", "$.k").cast("long").alias("item_id"), "ts"
    )
    batch = windowed_counts(vb, "item_id")
    # single bounded batch → one emission per (window, key); must equal batch
    assert batch.count() > 0, "batch windowed counts empty — vacuous equivalence"
    assert upd.count() == batch.count()
    merged = upd.alias("u").join(
        batch.alias("b"),
        (F.col("u.window_start") == F.col("b.window_start"))
        & (F.col("u.item_id") == F.col("b.item_id")),
    )
    assert merged.filter(F.col("u.cnt") != F.col("b.cnt")).count() == 0


def test_write_corpus_shards_bounded_and_manifest(spark, sf_dir, tmp_path):
    """Corpus sink: every shard respects maxRecordsPerFile, partition dirs
    land per language, and the manifest matches a direct groupBy."""
    from flink_uba_spark.sources.readers import load_testdata
    from flink_uba_spark.streaming.sinks import corpus_manifest, write_corpus_shards

    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    path = str(tmp_path / "corpus")
    write_corpus_shards(
        docs, path, max_records_per_file=40, tasks_per_partition=4
    )
    back = spark.read.parquet(path)
    assert back.count() == docs.count()

    per_file = (
        back.withColumn("f", F.input_file_name()).groupBy("f").count().collect()
    )
    assert max(r["count"] for r in per_file) <= 40

    manifest = {r["lang"]: r for r in corpus_manifest(spark, path).collect()}
    truth = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert {k: v["n_rows"] for k, v in manifest.items()} == truth
    assert all(v["n_files"] >= 1 for v in manifest.values())


def test_replay_memo_is_process_scoped(spark):
    """VERDICT r12 item 2: replay staging must never be reused across
    bench invocations. write_replay(cache_key=...) may memoize within one
    process (warm passes), but the staging dir must be freshly built —
    and the builder callable re-invoked — whenever the memo is empty,
    i.e. in every new process. No deterministic /tmp path keyed on the
    testdata dir may survive as a cross-process cache."""
    import flink_uba_spark.streaming.runner as runner

    calls = []

    def _frames():
        calls.append(1)
        return [spark.range(3).selectExpr("id AS v")]

    key = "/root/testdata/sf0.001"
    tag = "memo_probe"
    runner._REPLAY_MEMO.pop((tag, str(runner.Path(key).resolve())), None)
    p1 = runner.write_replay(_frames, tag=tag, cache_key=key)
    p2 = runner.write_replay(_frames, tag=tag, cache_key=key)
    assert p1 == p2 and len(calls) == 1, "within-process memo must hit"
    # simulate a fresh process: an empty memo must rebuild from inputs
    # into a DIFFERENT dir (uuid component), proving no on-disk reuse
    runner._REPLAY_MEMO.clear()
    p3 = runner.write_replay(_frames, tag=tag, cache_key=key)
    assert p3 != p1, "fresh invocation must pay staging, not reuse /tmp"
    assert len(calls) == 2, "builder must run again on a fresh memo"
