"""asof_join / range_join semantics and plan contracts
(operators/temporal.py)."""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import functions as F

from flink_uba_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L10"), (1, _ts(20), "L20"), (2, _ts(10), "Lx")],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), 100, "A"),
            (1, _ts(10), 101, "B"),   # ties left@10 — inclusive
            (1, _ts(10), 102, "C"),   # same ts, larger id wins the tie
            (1, _ts(15), 103, "D"),
        ],
        "k long, ts timestamp, rid long, rv string",
    )
    return left, right


def test_asof_backward_inclusive_and_tiebreak(spark):
    left, right = _frames(spark)
    got = {
        (r.k, r.lv): (r.rid, r.rv)
        for r in asof_join(left, right, on="k", tiebreak="rid").collect()
    }
    assert got[(1, "L10")] == (102, "C")   # equal-ts match visible, max rid
    assert got[(1, "L20")] == (103, "D")
    assert got[(2, "Lx")] == (None, None)  # no right rows for key → kept, nulls


def test_asof_forward_direction(spark):
    left, right = _frames(spark)
    got = {
        (r.k, r.lv): r.rid
        for r in asof_join(
            left, right, on="k", tiebreak="rid", direction="forward"
        ).collect()
    }
    assert got[(1, "L10")] == 101  # least at-or-after; min rid on the ts tie
    assert got[(1, "L20")] is None


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = {
        (r.k, r.lv): r.rid
        for r in asof_join(
            left, right, on="k", tiebreak="rid", tolerance_us=3_000_000
        ).collect()
    }
    assert got[(1, "L10")] == 102  # gap 0 ≤ 3s
    assert got[(1, "L20")] is None  # nearest is 5s back — outside tolerance


def test_asof_plan_one_exchange_no_join(spark):
    left, right = _frames(spark)
    df = asof_join(left, right, on="k", tiebreak="rid")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "Join" not in plan  # union + running-last: no join node at all


def test_range_join_bucket_boundaries(spark):
    # range spans multiple buckets; containment is closed on both ends
    ranges = spark.createDataFrame(
        [(1, 10, _ts(5), _ts(25))], "k long, rid long, start_ts timestamp, end_ts timestamp"
    )
    left = spark.createDataFrame(
        [(1, _ts(4)), (1, _ts(5)), (1, _ts(25)), (1, _ts(26)), (2, _ts(10))],
        "k long, ts timestamp",
    )
    got = sorted(
        r.ts.second
        for r in range_join(
            left, ranges, keys=("k",), bucket_seconds=10
        ).collect()
    )
    assert got == [5, 25]  # endpoints in, outside-out, wrong key out


def test_range_join_no_duplicate_pairs(spark):
    # a range spanning many buckets must still emit each pair once
    ranges = spark.createDataFrame(
        [(1, 7, _ts(0), _ts(59))], "k long, rid long, start_ts timestamp, end_ts timestamp"
    )
    left = spark.createDataFrame([(1, _ts(30))], "k long, ts timestamp")
    rows = range_join(left, ranges, keys=("k",), bucket_seconds=5).collect()
    assert len(rows) == 1


def test_range_join_is_equi_join(spark):
    # the bucketized form must plan as an equi-join, never nested-loop
    ranges = spark.createDataFrame(
        [(1, 7, _ts(0), _ts(59))], "k long, rid long, start_ts timestamp, end_ts timestamp"
    )
    left = spark.createDataFrame([(1, _ts(30))], "k long, ts timestamp")
    df = range_join(left, ranges, keys=("k",), bucket_seconds=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_matches_spark_pandas_reference(spark):
    """Cross-check against an independent per-key Python reference on a
    deterministic synthetic set."""
    import itertools

    rows_l, rows_r = [], []
    for k, i in itertools.product(range(4), range(25)):
        rows_l.append((k, _ts((7 * i + k) % 60), i))
        rows_r.append((k, _ts((11 * i + 3 * k) % 60), i, i * 10))
    left = spark.createDataFrame(rows_l, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(rows_r, "k long, ts timestamp, rid long, rv long")

    got = {
        (r.k, r.lid): r.rid
        for r in asof_join(left, right, on="k", tiebreak="rid").collect()
    }
    by_key = {}
    for k, ts, rid, _ in rows_r:
        by_key.setdefault(k, []).append((ts, rid))
    for (k, ts, lid) in rows_l:
        cands = [(t, r) for t, r in by_key.get(k, []) if t <= ts]
        want = max(cands)[1] if cands else None
        assert got[(k, lid)] == want, (k, lid)
