"""Ingestion must be schema-adaptive across every timestamp encoding the
driver's testdata generator has used (VERDICT round 2, findings 1-2):

- round 1: TIMESTAMP(NANOS)  -> read as int64 under nanosAsLong
- round 2: TIMESTAMP_NTZ us  -> isAdjustedToUTC=false micros
- plausible next: TIMESTAMP  us with UTC adjustment (LTZ)

Both ingest paths (batch ``load_testdata`` and streaming ``stream_events``)
must yield IDENTICAL TimestampType values for all three.  Round 2 broke
because each path hard-coded one encoding: batch no-op'ed on NTZ (3 queries
failed at analysis) and streaming divided micros by 1000 (every event
collapsed into ~43 minutes of 1970 — plausible output, no exception).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flink_uba_spark.sources.readers import load_testdata
from flink_uba_spark.streaming import runner

ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 7, 179575), 10, "pv", 1.0, "{}"),
    (2, dt.datetime(2024, 1, 15, 12, 30, 0, 500000), 11, "buy", 2.5, "{}"),
    (3, dt.datetime(2024, 1, 30, 23, 57, 12, 194062), 12, "cart", 0.5, "{}"),
]
EXPECTED_TS = sorted(r[1] for r in ROWS)


def _write_events(tmp_path, ts_type: pa.DataType) -> str:
    """Write a tiny events.parquet with ts in the given arrow type."""
    cols = list(zip(*ROWS))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], ts_type),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


ENCODINGS = {
    "int64_nanos": pa.timestamp("ns"),
    "ntz_micros": pa.timestamp("us"),
    "ltz_micros": pa.timestamp("us", tz="UTC"),
}


@pytest.mark.parametrize("name", sorted(ENCODINGS))
def test_batch_ingest_normalizes_encoding(spark, tmp_path, name):
    sf_dir = _write_events(tmp_path, ENCODINGS[name])
    df = load_testdata(spark, sf_dir, tables=["events"])["events"]
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got == EXPECTED_TS


@pytest.mark.parametrize("name", sorted(ENCODINGS))
def test_stream_ingest_normalizes_encoding(spark, tmp_path, name):
    sf_dir = _write_events(tmp_path, ENCODINGS[name])
    sdf = runner.stream_events(spark, sf_dir)
    assert sdf.schema["ts"].dataType.simpleString() == "timestamp"
    out = runner.run_to_table(sdf)
    got = sorted(r.ts for r in out.select("ts").collect())
    assert got == EXPECTED_TS, f"stream ingest corrupted {name} timestamps"
