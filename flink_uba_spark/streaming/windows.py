"""Streaming windowed aggregation + top-N (the HotItem jobs' native form).

Maps SURVEY.md §1.5/§2.4: event-time watermarks (``withWatermark``) replace
the reference's AscendingTimestampExtractor / BoundedOutOfOrdernessTimestamp-
Extractor (HotItem.java:48-53, HotPages.java:57-62); the windowed count is
the same Catalyst plan as the batch form, executed incrementally with one
state row per (window, key) — exactly the O(1)-per-key property the
reference hand-built (HotItem.java:76-96).

Append-mode semantics: a window is emitted once the watermark passes its
end, so on a bounded replay the final table contains every window whose end
is ≤ final watermark (= max event time − delay). Ranking over an updating
aggregate is an update query (the reference needed retract streams,
HotItemWithSql.java:75-77); per §7 we rank the finalized windows after the
stream completes — the foreachBatch/update-mode pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_windowed_counts(
    events: DataFrame,
    key: Column,
    key_alias: str,
    ts: str = "ts",
    size: str = "1 hour",
    slide: str = "5 minutes",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """withWatermark + sliding-window count over a streaming frame."""
    return (
        events.withWatermark(ts, watermark_delay)
        .groupBy(F.window(ts, size, slide).alias("w"), key.alias(key_alias))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_alias,
            "cnt",
        )
    )
