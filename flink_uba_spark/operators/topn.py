"""Windowed top-N — the hot-items / hot-pages query family.

Reference semantics (SURVEY.md §2.4-2.5): sliding event-time window counts
per key (W1/W2/W3: timeWindow + incremental AggregateFunction, HotItem.java:59-60,
HotPages.java:77-80), window-end enrichment (W4, HotItem.java:99-108), then a
per-window rank with a timer-driven buffer (T1: TopNHotItems, HotItem.java:110-166;
T3: the SQL ROW_NUMBER form, HotItemWithSql.java:65-71).

Spark-first design — why this shape survives 100 TB:
- ``groupBy(window(ts, size, slide), key).count()`` lets Catalyst plan a
  partial (map-side) aggregate before the single hash shuffle on
  (window, key); state per group is O(1), exactly the property the
  reference hand-built with its AggregateFunction (HotItem.java:76-96).
- The rank stage is ``row_number() OVER (PARTITION BY window ORDER BY cnt
  DESC, key)`` — the reference's second keyBy-by-windowEnd shuffle (J5,
  HotItem.java:66) becomes one Exchange on window_start; windows are dense
  and uniform so there is no skew, and the per-partition sort is bounded by
  (#keys alive in one window).
- Ties are broken by key ascending so results are deterministic under any
  parallelism (the reference's sort, HotItem.java:141-146, is stable only
  because it runs at parallelism 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def windowed_counts(
    df: DataFrame,
    key: str | Column,
    ts: str = "ts",
    size: str = "1 hour",
    slide: str | None = "5 minutes",
    key_alias: str | None = None,
) -> DataFrame:
    """Sliding (or tumbling when slide is None) event-time counts per key.

    Output: window_start TIMESTAMP, window_end TIMESTAMP, <key>, cnt LONG.
    Maps W1/W2/W3/W6/W7 of SURVEY.md §2.4.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    if key_alias is None:
        key_alias = key if isinstance(key, str) else "key"
    win = F.window(ts, size, slide) if slide else F.window(ts, size)
    return (
        df.groupBy(win.alias("w"), key_col.alias(key_alias))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_alias,
            "cnt",
        )
    )


def topn_per_window(
    counts: DataFrame,
    key: str,
    n: int = 5,
    partition_cols: tuple[str, ...] = ("window_start",),
) -> DataFrame:
    """Rank keys per window, keep top-n; deterministic tie-break by key asc.

    Equivalent to the reference's TopNHotItems timer+sort (HotItem.java:110-166)
    and the SQL ROW_NUMBER form (HotItemWithSql.java:57-59,65-71).
    """
    w = Window.partitionBy(*partition_cols).orderBy(F.desc("cnt"), F.asc(key))
    return counts.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= n)


def windowed_topn(
    df: DataFrame,
    key: str | Column,
    ts: str = "ts",
    size: str = "1 hour",
    slide: str | None = "5 minutes",
    n: int = 5,
    key_alias: str | None = None,
) -> DataFrame:
    """End-to-end hot-keys query: windowed counts → per-window top-n.

    The full HotItem pipeline (HotItem.java:26-73) as two Catalyst-planned
    exchanges: hash(window,key) for the agg, hash(window) for the rank.
    """
    if key_alias is None:
        key_alias = key if isinstance(key, str) else "key"
    counts = windowed_counts(df, key, ts=ts, size=size, slide=slide, key_alias=key_alias)
    return topn_per_window(counts, key_alias, n=n)


def cumulate_counts(
    df: DataFrame,
    key: str | Column,
    ts: str = "ts",
    step: str = "1 hour",
    max_size: str = "6 hours",
    key_alias: str | None = None,
) -> DataFrame:
    """CUMULATE windowing — the reference SQL engine family's
    ``CUMULATE(TABLE t, DESCRIPTOR(ts), step, max_size)`` windowing TVF
    (Flink 1.13+): tumbling ``max_size`` buckets aligned to the epoch,
    each emitting one EXPANDING window per ``step`` — window_start is
    the bucket start, window_end walks start+step, start+2·step, …,
    start+max_size, and an event contributes to every cumulate window
    of its bucket that ENDS after it (early-fire running totals with a
    final total per bucket; the daily-dashboard "counts so far today,
    hourly" shape).

    Compile: one JVM-side ``explode(sequence(k_first, n_steps))`` per
    event (k_first = the first step index whose window end exceeds the
    event's bucket offset — pure integer µs arithmetic) followed by a
    plain groupBy count, so Catalyst plans a partial (map-side)
    aggregate before the single hash shuffle on (bucket, end, key) —
    the HOP expansion strategy, with fan-out max_size/step (6 here) vs
    HOP's size/slide. At 100 TB: no per-event Python, no state, the
    same one-exchange shape as windowed_counts; the streaming twin
    watermarks the derived window_end so append mode finalizes each
    cumulate window independently (Flink's early-fire emission).

    Output: window_start, window_end TIMESTAMP, <key>, cnt LONG.
    """
    import pandas as pd

    step_us = int(pd.Timedelta(step).total_seconds() * 1_000_000)
    max_us = int(pd.Timedelta(max_size).total_seconds() * 1_000_000)
    if step_us <= 0 or max_us % step_us:
        raise ValueError("max_size must be a positive multiple of step")
    n_steps = max_us // step_us
    key_col = F.col(key) if isinstance(key, str) else key
    if key_alias is None:
        key_alias = key if isinstance(key, str) else "key"
    start_us = (F.unix_micros(F.col(ts)) - F.unix_micros(F.col(ts)) % max_us)
    k_first = (F.unix_micros(F.col(ts)) - F.col("__start_us")) / F.lit(step_us)
    return (
        df.withColumn("__start_us", start_us)
        .withColumn(
            "__k",
            F.explode(
                F.sequence(
                    k_first.cast("long") + F.lit(1), F.lit(n_steps)
                )
            ),
        )
        .groupBy(
            F.timestamp_micros(F.col("__start_us")).alias("window_start"),
            F.timestamp_micros(
                F.col("__start_us") + F.col("__k") * F.lit(step_us)
            ).alias("window_end"),
            key_col.alias(key_alias),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
