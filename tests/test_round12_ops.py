"""Round-12 lifts (VERDICT r11 items 2/3): streaming VALUE RunAgg
MEASURES and ALL ROWS PER MATCH on the replay family.

- SUM/AVG/MIN/MAX and offset FIRST/LAST MEASURES stream through the
  quantified-chain replayer — value columns ride the buffer (state
  field ``vals``) and every aggregate is computed EXACTLY over the run
  slice in-operator; batch ≡ stream on flushed replays, including the
  output schema (integral sums stay LongType).
- SUBSET unions compose for sum/min/max/avg (members' per-step partials
  combine statelessly); offset navigation over a union keeps the
  curated batch-only raise.
- ``rows_per_match="all"`` streams on the replay routes: quantified /
  optional chains and within_overall under SKIP PAST LAST, quantified
  runs under NO SKIP (the replayer's no-fold mode), SKIP TO chains, and
  the iterative NO-SKIP engine (per-step ids were already emitted).
- The SQL-text front-end compiles all of the above; boundary navigation
  over an EXCLUDED variable raises the curated error (r11 ADVICE).
"""

from __future__ import annotations

import datetime
import uuid

import pytest
from pyspark.sql import functions as F

from flink_uba_spark.operators.match_recognize import (
    match_recognize,
    run_agg,
    stream_match_recognize,
)
from flink_uba_spark.operators.match_recognize_sql import (
    match_recognize_sql,
    stream_match_recognize_sql,
)
from flink_uba_spark.streaming.runner import run_to_table, write_replay

EPOCH = datetime.datetime(2020, 1, 1)
SENT = 10 ** 6

ROWS = [
    # uid, eid, sec, type, value
    (1, 1, 0, "s", 0.0), (1, 2, 1, "e", 5.0), (1, 3, 2, "e", 7.0),
    (1, 4, 30, "p", 9.0),
    (2, 10, 0, "s", 1.0), (2, 11, 3, "e", 2.0), (2, 12, 20, "p", 3.0),
    # overlapping anchors: the skip fold must pick anchor 20 only
    (3, 20, 0, "s", 0.0), (3, 21, 4, "s", 0.0), (3, 22, 5, "e", 4.0),
    (3, 23, 8, "p", 0.0),
    # optional-step key: no e at all
    (4, 30, 0, "s", 2.0), (4, 31, 6, "p", 8.0),
]

_SCHEMA = (
    "user_id long, event_id long, ts timestamp, event_type string, "
    "value double"
)


def _mk(spark):
    return spark.createDataFrame(
        [
            (u, e, EPOCH + datetime.timedelta(seconds=s), t, v)
            for u, e, s, t, v in ROWS
        ],
        _SCHEMA,
    )


def _def():
    return {v: F.col("event_type") == v.lower() for v in "SECP"}


def _stream_of(spark, batch_df, n_batches=3):
    rows = sorted(batch_df.collect(), key=lambda r: (r["ts"], r["event_id"]))
    per = max(1, -(-len(rows) // n_batches))
    frames = [
        spark.createDataFrame([tuple(r) for r in rows[i : i + per]],
                              batch_df.schema)
        for i in range(0, len(rows), per)
    ]
    frames.append(
        spark.createDataFrame(
            [(SENT, SENT, EPOCH + datetime.timedelta(seconds=10 ** 7),
              "s", 0.0)],
            batch_df.schema,
        )
    )
    replay = write_replay(frames, tag=f"r12_{uuid.uuid4().hex[:8]}")
    return (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay)
    )


def _parity(spark, ev, **spec):
    want = match_recognize(ev, **spec)
    got = run_to_table(
        stream_match_recognize(_stream_of(spark, ev), **spec)
    ).filter(F.col("user_id") < SENT)
    assert got.columns == want.columns, (got.columns, want.columns)
    assert got.schema == want.schema, (got.schema, want.schema)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    return want


_BASE = dict(
    partition_by="user_id",
    order_by="ts",
    pattern="S E{1,3} P",
    withins={"E": "INTERVAL 100 SECONDS", "P": "INTERVAL 100 SECONDS"},
)


def _cents():
    return F.floor(F.col("value")).cast("long")


def _val_measures():
    return {
        "anchor_id": F.col("anchor_id"),
        "e_cnt": run_agg("count", "E"),
        "e_sum": run_agg("sum", "E", _cents()),
        "e_max": run_agg("max", "E", _cents()),
        "e_min_dbl": run_agg("min", "E", F.col("value")),
        "e_first": run_agg("first", "E", _cents()),
        "e_last2": run_agg("last", "E", _cents(), 1),
        "e_avg": run_agg("avg", "E", _cents()),
    }


@pytest.mark.slow
def test_stream_value_aggs_skip_past_equals_batch(spark):
    ev = _mk(spark)
    w = _parity(
        spark, ev, **_BASE, define=_def(),
        after_match="skip_past_last", measures=_val_measures(),
    )
    rows = {r["anchor_id"]: r for r in w.collect()}
    # the fixture's 2-rep run: sum 12, max 7, offset last(…,1) = 5
    assert rows[1]["e_sum"] == 12 and rows[1]["e_max"] == 7
    assert rows[1]["e_last2"] == 5 and rows[1]["e_avg"] == 6.0
    # 1-rep runs: offset past the run → NULL (ISO navigation)
    assert rows[10]["e_last2"] is None
    # anchor 21 is skipped by the fold — anchor 20 wins key 3
    assert 20 in rows and 21 not in rows


@pytest.mark.slow
def test_stream_value_aggs_no_skip_equals_batch(spark):
    ev = _mk(spark)
    w = _parity(
        spark, ev, **_BASE, define=_def(),
        after_match="no_skip", measures=_val_measures(),
    )
    # NO SKIP: both key-3 anchors emit
    aids = {r["anchor_id"] for r in w.collect()}
    assert {20, 21} <= aids


@pytest.mark.slow
def test_stream_value_aggs_within_overall_composes(spark):
    ev = _mk(spark)
    w = _parity(
        spark, ev, **_BASE, define=_def(),
        after_match="skip_past_last",
        within_overall="INTERVAL 25 SECONDS",
        measures=_val_measures(),
    )
    # user 1's match spans 30s > 25s — pruned; pruning must not be a
    # silent no-op
    assert all(r["anchor_id"] != 1 for r in w.collect())
    assert w.count() >= 1


@pytest.mark.slow
def test_stream_subset_value_aggs_equal_batch(spark):
    ev = _mk(spark)
    meas = {
        "anchor_id": F.col("anchor_id"),
        "u_cnt": run_agg("count", "U"),
        "u_sum": run_agg("sum", "U", _cents()),
        "u_min": run_agg("min", "U", _cents()),
        "u_max": run_agg("max", "U", F.col("value")),
        "u_avg": run_agg("avg", "U", _cents()),
    }
    _parity(
        spark, ev, **_BASE, define=_def(),
        after_match="skip_past_last",
        subset={"U": ("S", "E", "P")}, measures=meas,
    )


@pytest.mark.slow
def test_stream_value_aggs_optional_member_subset(spark):
    """A skipped optional member contributes NOTHING to the union —
    its partials are null and the stateless combine must skip them."""
    ev = _mk(spark)
    meas = {
        "anchor_id": F.col("anchor_id"),
        "u_sum": run_agg("sum", "U", _cents()),
        "u_min": run_agg("min", "U", _cents()),
    }
    w = _parity(
        spark, ev,
        partition_by="user_id", order_by="ts", pattern="S E? P",
        withins={"E": "INTERVAL 100 SECONDS", "P": "INTERVAL 100 SECONDS"},
        define=_def(), after_match="skip_past_last",
        subset={"U": ("E", "P")}, measures=meas,
    )
    rows = {r["anchor_id"]: r for r in w.collect()}
    # key 4 has no e: E skipped, union = {p@31} → sum 8
    assert rows[30]["u_sum"] == 8


@pytest.mark.slow
def test_stream_value_agg_raises(spark):
    ev = _mk(spark)
    base = dict(
        partition_by="user_id", order_by="ts", define=_def(),
        default_within="INTERVAL 100 SECONDS",
    )
    meas = {"s": run_agg("sum", "E", _cents())}
    with pytest.raises(ValueError, match="SKIP PAST LAST ROW"):
        stream_match_recognize(
            _stream_of(spark, ev), pattern="S E{1,2} P",
            after_match="skip_to_first P", measures=dict(meas), **base,
        )
    with pytest.raises(ValueError, match="FINITE caps"):
        stream_match_recognize(
            _stream_of(spark, ev), pattern="S E+ P",
            after_match="skip_past_last", measures=dict(meas), **base,
        )
    with pytest.raises(ValueError, match="EXCLUDED"):
        stream_match_recognize(
            _stream_of(spark, ev), pattern="S {- E{1,2} -} P",
            after_match="skip_past_last", measures=dict(meas), **base,
        )
    with pytest.raises(ValueError, match="NUMERIC"):
        stream_match_recognize(
            _stream_of(spark, ev), pattern="S E{1,2} P",
            after_match="skip_past_last",
            measures={"s": run_agg("max", "E", F.col("event_type"))},
            **base,
        )
    with pytest.raises(ValueError, match="GREEDY-quantified"):
        stream_match_recognize(
            _stream_of(spark, ev), pattern="S E{1,2} P",
            after_match="skip_past_last",
            measures={"s": run_agg("sum", "P", _cents())}, **base,
        )
    with pytest.raises(ValueError, match="batch-only on the stream"):
        stream_match_recognize(
            _stream_of(spark, ev), pattern="S E{1,2} P",
            after_match="skip_past_last",
            subset={"U": ("S", "P")},
            measures={"s": run_agg("first", "U", _cents(), 1)}, **base,
        )
    with pytest.raises(ValueError, match="single-plan"):
        stream_match_recognize(
            _stream_of(spark, ev), pattern="S (E|C) P",
            after_match="no_skip", measures=dict(meas), **base,
        )


# ---- ALL ROWS on the replay routes ----------------------------------------

@pytest.mark.slow
def test_stream_all_rows_quantified_skip_past_equals_batch(spark):
    ev = _mk(spark)
    w = _parity(
        spark, ev, **_BASE, define=_def(),
        after_match="skip_past_last", rows_per_match="all",
    )
    assert w.columns == [
        "user_id", "anchor_id", "seq", "var", "event_id", "ts",
    ]
    # the 2-rep run enumerates: user 1 emits S + 2×E + P = 4 rows
    assert sum(1 for r in w.collect() if r["user_id"] == 1) == 4


@pytest.mark.slow
def test_stream_all_rows_quantified_no_skip_equals_batch(spark):
    ev = _mk(spark)
    w = _parity(
        spark, ev, **_BASE, define=_def(),
        after_match="no_skip", rows_per_match="all",
    )
    assert {r["anchor_id"] for r in w.collect()} >= {20, 21}


@pytest.mark.slow
def test_stream_all_rows_optional_skip_past_equals_batch(spark):
    # the r11-ADVICE corner: optional + SKIP PAST LAST + ALL ROWS —
    # now streams through the replayer instead of an opaque plan raise
    ev = _mk(spark)
    w = _parity(
        spark, ev,
        partition_by="user_id", order_by="ts", pattern="S E? P",
        withins={"E": "INTERVAL 100 SECONDS", "P": "INTERVAL 100 SECONDS"},
        define=_def(), after_match="skip_past_last", rows_per_match="all",
    )
    by4 = [r for r in w.collect() if r["user_id"] == 4]
    assert {r["var"] for r in by4} == {"S", "P"}  # skipped E: no row


@pytest.mark.slow
def test_stream_all_rows_within_overall_skip_past(spark):
    ev = _mk(spark)
    w = _parity(
        spark, ev, **_BASE, define=_def(),
        after_match="skip_past_last",
        within_overall="INTERVAL 25 SECONDS", rows_per_match="all",
    )
    assert all(r["user_id"] != 1 for r in w.collect())  # 30s span pruned


@pytest.mark.slow
def test_stream_all_rows_skip_to_equals_batch(spark):
    ev = _mk(spark)
    _parity(
        spark, ev,
        partition_by="user_id", order_by="ts", pattern="S E P",
        withins={"E": "INTERVAL 100 SECONDS", "P": "INTERVAL 100 SECONDS"},
        define=_def(), after_match="skip_to_first E", rows_per_match="all",
    )


@pytest.mark.slow
def test_stream_all_rows_iterative_no_skip_equals_batch(spark):
    ev = _mk(spark)
    want = match_recognize(
        ev, partition_by="user_id", order_by="ts", pattern="S E P",
        withins={"E": "INTERVAL 100 SECONDS", "P": "INTERVAL 100 SECONDS"},
        define=_def(), after_match="no_skip", rows_per_match="all",
        payload={"cents": _cents()},
        iter_define={"E": lambda b: b["E"]["cents"] > b["S"]["cents"]},
    )
    got = run_to_table(
        stream_match_recognize(
            _stream_of(spark, ev),
            partition_by="user_id", order_by="ts", pattern="S E P",
            withins={"E": "INTERVAL 100 SECONDS",
                     "P": "INTERVAL 100 SECONDS"},
            define=_def(), after_match="no_skip", rows_per_match="all",
            payload={"cents": _cents()},
            iter_define_py={"E": lambda pre, c: c[0] > pre[0][0]},
        )
    ).filter(F.col("user_id") < SENT)
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.slow
def test_stream_all_rows_excluded_on_replay_route(spark):
    ev = _mk(spark)
    w = _parity(
        spark, ev,
        partition_by="user_id", order_by="ts",
        pattern="S {- E{1,3} -} P",
        withins={"E": "INTERVAL 100 SECONDS", "P": "INTERVAL 100 SECONDS"},
        define=_def(), after_match="skip_past_last", rows_per_match="all",
    )
    assert all(r["var"] != "E" for r in w.collect())


# ---- SQL-text surface ------------------------------------------------------

@pytest.mark.slow
def test_stream_sql_text_value_measures_equal_dict_and_batch(spark):
    ev = _mk(spark)
    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES anchor_id AS anchor_id, COUNT(E.*) AS e_cnt,
                 SUM(E.value) AS e_sum, MAX(E.value) AS e_max,
                 AVG(E.value) AS e_avg, LAST(E.value, 1) AS e_last2
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (S E{1,3} P)
        DEFINE S AS S.event_type = 's', E AS E.event_type = 'e',
               P AS P.event_type = 'p'
    )
    """
    w = {"E": "INTERVAL 100 SECONDS", "P": "INTERVAL 100 SECONDS"}
    want = match_recognize_sql(ev, sql, withins=w)
    got = run_to_table(
        stream_match_recognize_sql(_stream_of(spark, ev), sql, withins=w)
    ).filter(F.col("user_id") < SENT)
    assert got.columns == want.columns
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.slow
def test_stream_sql_text_all_rows_quantified(spark):
    ev = _mk(spark)
    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (S E{1,3} P)
        DEFINE S AS S.event_type = 's', E AS E.event_type = 'e',
               P AS P.event_type = 'p'
    )
    """
    w = {"E": "INTERVAL 100 SECONDS", "P": "INTERVAL 100 SECONDS"}
    want = match_recognize_sql(ev, sql, withins=w)
    got = run_to_table(
        stream_match_recognize_sql(_stream_of(spark, ev), sql, withins=w)
    ).filter(F.col("user_id") < SENT)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.slow
def test_stream_sql_text_excluded_navigation_curated_raise(spark):
    # r11 ADVICE: FIRST/LAST over an excluded variable must raise the
    # curated error, not an opaque AnalysisException on a dropped column
    ev = _mk(spark)
    with pytest.raises(ValueError, match="EXCLUDED"):
        stream_match_recognize_sql(
            _stream_of(spark, ev),
            """
            PARTITION BY user_id ORDER BY ts
            MEASURES FIRST(E.ts) AS e_ts
            PATTERN (S {- E -} P)
            DEFINE S AS S.event_type = 's', E AS E.event_type = 'e',
                   P AS P.event_type = 'p'
            """,
            default_within="INTERVAL 100 SECONDS",
        )
