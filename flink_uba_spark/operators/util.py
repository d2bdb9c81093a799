"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a too-narrow input before CPU-heavy per-row projections.

    Small dimension-sized inputs (one parquet file → one split) would pin
    signature computation (minhash/simhash/dot products) to a single core;
    a cheap round-robin shuffle of the raw rows buys full parallelism. At
    real scale inputs already have >cores splits and this is a no-op.
    """
    if df.isStreaming:
        # micro-batch parallelism is the source's concern (file splits /
        # kafka partitions); inputFiles/rdd are undefined on streams
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        # file-backed frames: #input files bounds #scan splits for the small
        # inputs this guard exists for, and is much cheaper than an RDD
        # conversion; non-file frames fall through to the RDD check
        n = len(df.inputFiles())
    except Exception:  # noqa: BLE001
        n = 0
    if n == 0:
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df
