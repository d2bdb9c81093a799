"""Keyed-changelog materialization (operators/changelog.py) — the CDC
upsert → current-table view (Flink's upsert-stream/table duality; the
keyed twin of the reference's retract conversions, SURVEY §2 S6).

Risks: the (ts, id) winner tie-break, tombstone visibility (latest
tombstone hides the key, overwritten tombstone doesn't), the plan shape
(ONE map-side-partial hash aggregate — no window, no self-join), and
batch ≡ streaming-COMPLETE equality under arbitrary batch splits."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from flink_uba_spark.operators.changelog import changelog_latest

EPOCH = datetime.datetime(2020, 1, 1)


def _changelog_df(spark, rows):
    return spark.createDataFrame(
        [
            (eid, uid, EPOCH + datetime.timedelta(seconds=sec), op, float(v))
            for eid, uid, sec, op, v in rows
        ],
        "event_id long, user_id long, ts timestamp, op string, value double",
    )


_ROWS = [
    # user 1: upsert, upsert — latest (ts=2) wins
    (1, 1, 0, "set", 10), (2, 1, 2, "set", 20),
    # user 2: upsert then DELETE — key absent
    (3, 2, 0, "set", 30), (4, 2, 1, "del", 0),
    # user 3: DELETE then upsert — tombstone overwritten, key present
    (5, 3, 0, "del", 0), (6, 3, 1, "set", 40),
    # user 4: same-ts tie — higher event_id wins
    (7, 4, 5, "set", 50), (8, 4, 5, "set", 60),
    # user 5: only a tombstone — absent
    (9, 5, 0, "del", 0),
]


def _materialize(df):
    return changelog_latest(
        df,
        keys=["user_id"],
        values={"v": F.col("value").cast("long"), "op": F.col("op")},
        delete_when=F.col("op") == "del",
    )


def test_changelog_latest_hand_case(spark):
    out = _materialize(_changelog_df(spark, _ROWS)).toPandas()
    got = {
        int(r["user_id"]): (int(r["v"]), int(r["op_id"]))
        for _, r in out.iterrows()
    }
    assert got == {1: (20, 2), 3: (40, 6), 4: (60, 8)}


def test_changelog_validations(spark):
    df = _changelog_df(spark, _ROWS)
    with pytest.raises(ValueError, match="at least one value"):
        changelog_latest(df, keys=["user_id"], values={},
                         delete_when=F.lit(False))
    with pytest.raises(ValueError, match="collide"):
        changelog_latest(df, keys=["user_id"],
                         values={"op_ts": F.col("value")},
                         delete_when=F.lit(False))


def test_changelog_plan_single_aggregate(spark):
    """The 100 TB shape: one hash-aggregate pair (partial map-side +
    final), ONE key exchange, no window function, no join."""
    plan = _materialize(_changelog_df(spark, _ROWS))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_stream_changelog_matches_batch(spark):
    """COMPLETE-mode streaming materialization equals the batch view
    under an adversarial split: the tombstone and its overwriting upsert
    arrive in different micro-batches, in both orders."""
    from flink_uba_spark.streaming.runner import run_to_table, write_replay

    df = _changelog_df(spark, _ROWS)
    # split by parity of event_id → user 2's delete lands in a different
    # batch than its upsert; user 3's overwrite too
    first = df.filter(F.col("event_id") % 2 == 1)
    second = df.filter(F.col("event_id") % 2 == 0)
    replay = write_replay([first, second], tag="cdc_2b")
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    got = run_to_table(_materialize(sdf), output_mode="complete").toPandas()
    want = _materialize(df).toPandas()
    cols = sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.equals(w)


def test_changelog_null_tombstone_flag_is_not_delete(spark):
    """A NULL delete_when evaluation (e.g. a predicate over a null
    column) must read as 'not a tombstone', not silently hide the key."""
    df = spark.createDataFrame(
        [(1, 1, EPOCH, None, 7.0)],
        "event_id long, user_id long, ts timestamp, op string, value double",
    )
    out = changelog_latest(
        df, keys=["user_id"],
        values={"v": F.col("value").cast("long")},
        delete_when=F.col("op") == "del",   # null op -> null predicate
    ).collect()
    assert len(out) == 1 and out[0]["v"] == 7
