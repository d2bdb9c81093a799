"""Pin the stream-stream FULL OUTER join null-side emission boundary that
STREAM_TX_RECONCILE_ORACLE encodes (TxPayMatch.java:113,131 wait-timer
analogue).

Empirical rule (probed this round, availableNow bounded replay):
a never-matched row with event time t is emitted null-joined iff

    t_us <= (wm_ms - W_ms - 1) * 1000

where W is the join-interval half-width toward the other side and
wm_ms = min over inputs of floor_ms(max event time) - delay_ms. Notably the
rule is ms-granular with a -1 ms guard, NOT a strict < at microsecond
precision: a row 0.4 ms inside the bound is retained (never emitted).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [T.StructField("u", T.LongType()), T.StructField("ts_s", T.StringType())]
)


def _run_full_outer(spark, ldir, rdir, name):
    def src(d, tscol, ucol):
        return (
            spark.readStream.schema(SCHEMA)
            .csv(str(d))
            .select(F.col("u").alias(ucol), F.col("ts_s").cast("timestamp").alias(tscol))
        )

    left = src(ldir, "lts", "lu").withWatermark("lts", "0 seconds")
    right = src(rdir, "rts", "ru").withWatermark("rts", "0 seconds")
    joined = left.join(
        right,
        (F.col("lu") == F.col("ru"))
        & (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 10 SECONDS"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 10 SECONDS")),
        "full_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).collect()


def test_null_side_emission_boundary(spark, tmp_path):
    """wm = min(maxL, maxR) = 10:01:00. Bound = lts + 10s (symmetric ±10s).
    Emitted iff lts <= wm - 10s - 1ms."""
    ldir = tmp_path / "l"
    rdir = tmp_path / "r"
    ldir.mkdir()
    rdir.mkdir()
    (ldir / "l.csv").write_text(
        "1,2024-01-01 10:00:00\n"  # lts <= 10:00:49.999 -> emitted
        "2,2024-01-01 10:00:50\n"  # == wm - 10s: 0.001s past threshold -> kept
        "5,2024-01-01 10:00:49.999600\n"  # 0.4ms past threshold -> kept (ms rule)
        "6,2024-01-01 10:00:49.998900\n"  # 0.1ms inside threshold -> emitted
        "3,2024-01-01 10:01:30\n"  # beyond wm entirely -> kept
    )
    (rdir / "r.csv").write_text(
        "9,2024-01-01 10:01:00\n"  # rts > wm - 10s - 1ms -> kept
        "8,2024-01-01 10:00:20\n"  # emitted
    )
    rows = _run_full_outer(spark, ldir, rdir, "fo_boundary")
    left_emitted = sorted(r.lu for r in rows if r.lu is not None)
    right_emitted = sorted(r.ru for r in rows if r.ru is not None)
    assert left_emitted == [1, 6]
    assert right_emitted == [8]
