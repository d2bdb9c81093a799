"""Sinks (SURVEY.md §2.1 S4-S7 made concrete).

- ``console_sink`` / named query: the reference's tagged print sinks
  (HotItem.java:69, TxPayMatch.java:80-82 — the name prefix becomes
  ``queryName``).
- ``foreach_batch_split``: the side-output pattern (S7) as one streaming
  query writing every tag partition in a single pass — the Spark answer to
  OutputTag routing (TxPayMatch.java:33-34): downstream consumers read
  their tag's directory.
- ``write_partitioned``: batch/bounded results to date-partitioned parquet,
  the layout that gives 100 TB readers partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def console_sink(sdf: DataFrame, name: str, output_mode: str = "append") -> StreamingQuery:
    """S4: named console sink (the print-with-prefix twin)."""
    return (
        sdf.writeStream.format("console")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_split(
    sdf: DataFrame,
    tag_col: str,
    base_path: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """S7: route a tagged stream to one parquet directory per tag value.

    partitionBy(tag_col) writes every side output in one pass over the
    micro-batch — no per-tag re-filtering, no extra query per tag.
    """

    def write(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").partitionBy(tag_col).parquet(base_path)

    return (
        sdf.writeStream.foreachBatch(write)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    date_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Batch sink: optionally derive a date partition from an event-time
    column, sort within partitions for locality, write parquet."""
    out = df
    parts = list(partition_cols)
    if date_col is not None:
        out = out.withColumn("event_date", F.to_date(F.col(date_col)))
        parts.append("event_date")
    writer = out.write.mode(mode)
    if parts:
        writer = writer.partitionBy(*parts)
    writer.parquet(path)


def write_corpus_shards(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
    max_records_per_file: int = 100_000,
    tasks_per_partition: int = 8,
    mode: str = "overwrite",
) -> None:
    """Training-corpus sink: hive-partitioned parquet with BOUNDED shard
    sizes — the output layout a downstream tokenizer/trainer consumes.

    - ``maxRecordsPerFile`` caps every shard regardless of task layout,
      so no shard exceeds what a dataloader wants to map.
    - The pre-write exchange keys on (partition_cols, pmod(hash(id),
      tasks_per_partition)): repartitioning on the partition columns
      alone would write each directory from ONE task — the classic skew
      trap when one language dominates the corpus; the deterministic
      id-hash sub-key fans each directory out to ``tasks_per_partition``
      writers while keeping file counts bounded (tasks × ceil(rows/cap)).
    """
    keys = [F.col(c) for c in partition_cols] + [
        F.pmod(F.hash(F.col(id_col)), F.lit(tasks_per_partition))
    ]
    out = df.repartition(*keys)
    writer = out.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def corpus_manifest(spark, path: str, partition_cols: tuple[str, ...] = ("lang",)) -> DataFrame:
    """Shard inventory for a written corpus: rows and files per partition
    (via input_file_name) — what a training job reads to plan epochs and
    verify the write landed complete."""
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    return df.groupBy(*[F.col(c) for c in partition_cols]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("__file").alias("n_files"),
    )
