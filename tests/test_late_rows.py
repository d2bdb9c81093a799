"""W9 dead-letter tap: the side-output rows equal the rows the watermarked
aggregation drops (cross-checked against numRowsDroppedByWatermark) on a
fixture where late rows arrive strictly after their window's eviction
batch — the regime where Spark's drop set and Flink's sideOutputLateData
semantics coincide (see streaming/late_rows.py)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_uba_spark.streaming.late_rows import dead_letter_tap

SCHEMA = T.StructType(
    [T.StructField("item", T.LongType()), T.StructField("ts_s", T.StringType())]
)


def _write(d, name, text):
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    (d / name).write_text(text)


def _source(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .csv(str(path))
        .select("item", F.col("ts_s").cast("timestamp").alias("ts"))
    )


def test_dead_letter_matches_dropped_rows(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # tumbling 5-minute windows, 5 s delay — test_watermarks.py batch shape:
    # the 10:01 row arrives two batches after its window was evicted.
    (d / "b1.csv").write_text("1,2024-01-01 10:00:00\n1,2024-01-01 10:04:00\n")
    _write(d, "b2.csv", "2,2024-01-01 10:12:00\n")
    _write(d, "b3.csv", "2,2024-01-01 10:13:00\n")  # wm=10:11:55 evicts 10:00 window
    _write(d, "b4.csv", "1,2024-01-01 10:01:00\n2,2024-01-01 10:20:00\n")

    # main query: the watermarked aggregation (drops the late row)
    agg = (
        _source(spark, d)
        .withWatermark("ts", "5 seconds")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        agg.writeStream.format("memory").queryName("w9_main")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )

    # dead-letter tap over the same replay
    sink = str(tmp_path / "dead_letter")
    tap = dead_letter_tap(
        _source(spark, d), sink, ts="ts", size="5 minutes", delay="5 seconds"
    )
    tap.awaitTermination()

    late = spark.read.parquet(sink).collect()
    assert dropped == 1
    assert len(late) == dropped
    assert late[0].item == 1 and late[0].ts.strftime("%H:%M") == "10:01"


def test_no_false_positives_when_nothing_late(spark, tmp_path):
    d = tmp_path / "in_ok"
    d.mkdir()
    (d / "b1.csv").write_text("1,2024-01-01 10:00:00\n1,2024-01-01 10:04:00\n")
    _write(d, "b2.csv", "2,2024-01-01 10:06:00\n")  # in-order arrivals only
    sink = str(tmp_path / "dl_ok")
    tap = dead_letter_tap(
        _source(spark, d), sink, ts="ts", size="5 minutes", delay="5 seconds"
    )
    tap.awaitTermination()
    # sink dir may not exist if no batch wrote late rows; treat as empty
    try:
        n = spark.read.parquet(sink).count()
    except Exception:
        n = 0
    assert n == 0
