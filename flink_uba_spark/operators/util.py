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


def profile_columns(df, cols: "list[str] | None" = None):
    """Data-profiling rollup — per column: row count, null count, exact
    distinct count. The QA primitive a pipeline runs before/after every
    curation stage (schema drift, null regressions, key-cardinality
    checks).

    Plan: ONE aggregate over the scan; multi-distinct compiles to a single
    Expand (one row per profiled column per input row) + two-level
    hash aggregate — the standard Spark multi-count-distinct shape, linear
    in rows × profiled columns with map-side partial aggregation. The wide
    one-row result unpivots via stack() to (column, n_rows, n_null,
    n_distinct) — driver never sees data, only the p-row profile."""
    from pyspark.sql import functions as F

    cols = cols if cols is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c}', __null_{c}, __dist_{c}" for c in cols)
    return wide.select(
        F.expr(f"stack({len(cols)}, {stack}) AS (column, n_null, n_distinct)"),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_null", "n_distinct")
