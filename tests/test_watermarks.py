"""Watermark semantics under multi-batch replay (the HotPages
bounded-out-of-orderness story, HotPages.java:57-62).

Empirically pinned semantics (these are what the streaming oracles and the
W8/W9 documentation rely on):

1. A late row is dropped only when its window's state was evicted in an
   EARLIER batch; if the row arrives in the same batch whose watermark
   evicts the window, it is merged first and the emitted result includes
   it (the batch-N watermark is computed from data through batch N−1).
2. Append mode emits a window exactly when the (lagging) watermark passes
   its end; arrivals after that batch are dropped
   (numRowsDroppedByWatermark counts them).
3. Widening the delay (W8 — allowedLateness folded into the watermark
   delay) admits the same row as on-time.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [T.StructField("item", T.LongType()), T.StructField("ts_s", T.StringType())]
)


def _write(d, name, text):
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    (d / name).write_text(text)


def _run(spark, path, delay, name):
    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .csv(path)
        .select("item", F.col("ts_s").cast("timestamp").alias("ts"))
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", "5 minutes").alias("w"), F.col("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("ws"), "item", "cnt")
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    counts = {(r.ws.strftime("%H:%M"), r.item): r.cnt for r in spark.table(name).collect()}
    return counts, dropped


def test_late_row_dropped_after_emission(spark, tmp_path):
    d = tmp_path / "in3"
    d.mkdir()
    (d / "b1.csv").write_text("1,2024-01-01 10:00:00\n1,2024-01-01 10:04:00\n")
    _write(d, "b2.csv", "2,2024-01-01 10:12:00\n")  # wm source for the NEXT batch
    _write(d, "b3.csv", "2,2024-01-01 10:13:00\n")  # batch wm=10:11:55 → 10:00 window emitted+evicted here
    _write(d, "b4.csv", "1,2024-01-01 10:01:00\n2,2024-01-01 10:20:00\n")  # state gone → dropped
    counts, dropped = _run(spark, str(d), "5 seconds", "wm_strict")
    assert counts[("10:00", 1)] == 2  # emitted before the late row; not resurrected
    assert dropped >= 1  # the 10:01 row was filtered


def test_same_batch_late_row_merges_before_eviction(spark, tmp_path):
    """A late row arriving in the very batch whose watermark evicts its
    window is merged first — documented leniency."""
    d = tmp_path / "in2"
    d.mkdir()
    (d / "b1.csv").write_text("1,2024-01-01 10:00:00\n1,2024-01-01 10:04:00\n2,2024-01-01 10:09:30\n")
    _write(d, "b2.csv", "1,2024-01-01 10:01:00\n2,2024-01-01 10:12:00\n")
    counts, dropped = _run(spark, str(d), "5 seconds", "wm_lag")
    assert counts[("10:00", 1)] == 3  # merged despite eviction wm 10:09:25
    assert dropped == 0


def test_wider_delay_admits_row_as_on_time(spark, tmp_path):
    """W8: with a 15-minute delay the 10:01 row is within bounds — the
    final batch answer includes it and nothing is ever dropped."""
    d = tmp_path / "in_wide"
    d.mkdir()
    (d / "b1.csv").write_text("1,2024-01-01 10:00:00\n1,2024-01-01 10:04:00\n")
    _write(d, "b2.csv", "2,2024-01-01 10:12:00\n")
    _write(d, "b3.csv", "1,2024-01-01 10:01:00\n2,2024-01-01 10:30:00\n")
    counts, dropped = _run(spark, str(d), "15 minutes", "wm_wide")
    assert dropped == 0
    assert counts[("10:00", 1)] == 3  # repaired before the (later) emission