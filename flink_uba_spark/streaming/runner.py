"""Bounded-replay streaming execution helpers.

The reference replays CSV files through its streaming jobs and treats the
final printed state as the answer (SURVEY.md §5). Our equivalence method
(§5 test strategy, point 3): run the streaming form with an availableNow
trigger into a memory sink and compare the final table against the batch
answer — the property that replaces Flink's event-time-replay determinism.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _expose_as_stream_dir(target: Path, tag: str) -> Path:
    """Expose a parquet TABLE (single file or a directory of part files)
    as a directory the file stream source can list (testdata is
    read-only, so symlinks). Keyed by a hash of the RESOLVED path (two sf
    dirs may share a basename); every link is verified via readlink and
    the dir is rebuilt when its link set is stale — a broken or wrong
    link would otherwise silently stream the wrong (or an empty)
    dataset. Directory targets link each part file individually because
    the file source does not follow directory symlinks."""
    target = target.resolve()
    key = hashlib.sha256(str(target).encode()).hexdigest()[:16]
    link_dir = Path(tempfile.gettempdir()) / "spark_graft_stream" / key / tag
    files = (
        [target]
        if target.is_file()
        else sorted(p for p in target.glob("*.parquet") if p.is_file())
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {target}")
    expected = {f"{i:05d}.parquet": str(f) for i, f in enumerate(files)}
    current = {}
    if link_dir.is_dir():
        for p in link_dir.iterdir():
            current[p.name] = os.readlink(p) if p.is_symlink() else None
    if current != expected:
        import shutil

        shutil.rmtree(link_dir, ignore_errors=True)
        link_dir.mkdir(parents=True)
        for name, src in expected.items():
            (link_dir / name).symlink_to(src)
    return link_dir


def _stream_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """readStream over a driver testdata parquet table, schema-adaptive.

    A file stream source needs its schema declared up front, and the
    driver's testdata encoding drifts between rounds (ts was
    TIMESTAMP(NANOS) in round 1, TIMESTAMP_NTZ micros in round 2 —
    hard-coding either was round 2's silent 1000× timestamp-compression
    bug, VERDICT round 2 finding 2). Resolve the schema with a driver-side
    BATCH read of the same files (footer metadata only — nothing is
    scanned) so the stream sees exactly what the batch path sees under the
    same parquet confs, then share the batch path's
    ``normalize_event_time`` so both ingests stay identical by
    construction (tests/test_timestamp_encodings.py pins all encodings)."""
    from flink_uba_spark.sources.readers import normalize_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    target = Path(sf_dir) / f"{table}.parquet"
    schema = spark.read.parquet(str(target)).schema
    link_dir = _expose_as_stream_dir(target, table)
    raw = spark.readStream.schema(schema).parquet(str(link_dir))
    return normalize_event_time(raw)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the driver's events parquet (file source), with the
    same schema-adaptive timestamp normalization as the batch reader."""
    return _stream_table(spark, sf_dir, "events")


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the driver's documents parquet (file source) — the
    corpus-ingestion twin of ``stream_events``; same resolved-path-keyed
    symlink-dir exposure (testdata is read-only)."""
    return _stream_table(spark, sf_dir, "documents")


def stream_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the driver's embeddings parquet (file source) — the
    vector-ingestion twin (index-time assignment runs on this stream)."""
    return _stream_table(spark, sf_dir, "embeddings")


# bump whenever any cached replay's batch construction changes — the cache
# key cannot see the splitting logic, only (tag, key, batch count)
_REPLAY_CACHE_VERSION = 2


def write_replay(
    dfs: "list[DataFrame] | Callable[[], list[DataFrame]]",
    tag: str = "replay",
    cache_key: str | None = None,
) -> str:
    """Materialize DataFrames as an ordered multi-batch file-stream replay.

    Each frame becomes one parquet file in a temp dir, named and
    mtime-stamped in list order so FileStreamSource (which sorts by
    modification time, then path) delivers them as separate micro-batches
    under ``maxFilesPerTrigger=1``. This is replay scaffolding for the
    bounded-out-of-orderness tests — the reference replays ordered CSVs the
    same way (HotPages.java:41) — not a data-path operator.

    ``cache_key``: when the batch frames are a deterministic function of
    some input (e.g. the sf_dir), pass that input here — the replay is
    written once per (tag, key) and reused, keyed like the source symlink
    cache by a hash of the resolved key and guarded by a completion marker
    so a torn write is never reused.

    ``dfs`` may be a zero-argument callable returning the batch list: the
    frames (and any bound computations inside them, e.g. an event-time max
    used in split predicates) are then constructed ONLY on cache miss —
    a cached replay costs zero Spark jobs.
    """
    import shutil

    if cache_key is not None:
        digest = hashlib.sha256(
            f"{tag}|{_REPLAY_CACHE_VERSION}|{Path(cache_key).resolve()}".encode()
        ).hexdigest()[:16]
        base = Path(tempfile.gettempdir()) / "spark_graft_stream" / f"replay_{tag}_{digest}"
        if (base / "_COMPLETE").exists():
            return str(base)
        shutil.rmtree(base, ignore_errors=True)
    else:
        base = (
            Path(tempfile.gettempdir())
            / "spark_graft_stream"
            / f"{tag}_{uuid.uuid4().hex[:12]}"
        )
    if callable(dfs):
        dfs = dfs()
    base.mkdir(parents=True)
    t0 = 1_000_000_000  # fixed epoch base; only relative order matters
    for i, df in enumerate(dfs):
        stage = base / f"_stage_{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        dest = base / f"{i:02d}.parquet"
        next(stage.glob("part-*.parquet")).rename(dest)
        shutil.rmtree(stage)
        os.utime(dest, (t0 + 10 * i, t0 + 10 * i))
    if cache_key is not None:
        (base / "_COMPLETE").touch()
    return str(base)


def run_to_table(
    sdf: DataFrame, output_mode: str = "append", state_partitions: int = 8
) -> DataFrame:
    """Run a streaming frame to completion (availableNow) into a memory
    sink; return the materialized result as a batch DataFrame.

    ``state_partitions`` sizes the stateful-operator partitioning for THIS
    run (each replay starts a fresh checkpoint, so the count is free to
    choose per run; in a long-lived deployment it is fixed at first start
    and must be sized to key cardinality up front). Every state partition
    pays a per-micro-batch store open/commit, so the bounded replays here
    want few; measured 2-3× wall-clock on the sf0.1 replays vs inheriting
    the relational shuffle.partitions=32. Result SETS are partition-count
    invariant (hash partitioning only routes keys), so oracles are
    unaffected."""
    spark = sdf.sparkSession
    name = "mem_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
