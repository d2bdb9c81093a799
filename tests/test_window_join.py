"""Window join TVF (operators/temporal.py:window_join) — Flink 1.14's
TUMBLE ⋈ TUMBLE. Semantics pins here; values are 3-SF oracle-gated via
window_join_views_purchases / stream_window_join_views_purchases."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

EPOCH = datetime.datetime(2020, 1, 1)  # unix-µs offset divisible by 1 h


def _df(spark, rows, id_name, ts_name):
    return spark.createDataFrame(
        [
            (u, i, EPOCH + datetime.timedelta(minutes=m))
            for u, i, m in rows
        ],
        f"user_id long, {id_name} long, {ts_name} timestamp",
    )


def test_same_window_pairs_only(spark):
    """Rows pair iff they land in the SAME epoch-aligned tumbling bucket:
    59' vs 61' split even though they are 2' apart — the co-occurrence
    semantics, not an interval band."""
    from flink_uba_spark.operators.temporal import window_join

    left = _df(spark, [(1, 10, 59), (1, 11, 61)], "l_id", "l_ts")
    right = _df(spark, [(1, 20, 1), (1, 21, 61), (2, 22, 59)], "r_id", "r_ts")
    got = (
        window_join(left, right, keys=["user_id"], size="1 hour",
                    left_ts="l_ts", right_ts="r_ts")
        .select("user_id", "l_id", "r_id", "window_start")
        .collect()
    )
    pairs = sorted((r.user_id, r.l_id, r.r_id) for r in got)
    # 10@59' pairs with 20@1' (same hour 0); 11@61' pairs with 21@61'
    # (hour 1); user 2's row never crosses keys
    assert pairs == [(1, 10, 20), (1, 11, 21)]
    for r in got:
        start = r.window_start
        assert start.minute == 0 and start.second == 0  # epoch-aligned


def test_window_bounds_cover_both_rows(spark):
    from flink_uba_spark.operators.temporal import window_join

    left = _df(spark, [(1, 10, 5)], "l_id", "l_ts")
    right = _df(spark, [(1, 20, 55)], "r_id", "r_ts")
    row = window_join(
        left, right, keys=["user_id"], size="1 hour",
        left_ts="l_ts", right_ts="r_ts",
    ).collect()[0]
    assert row.window_start <= row.l_ts < row.window_end
    assert row.window_start <= row.r_ts < row.window_end
    assert (row.window_end - row.window_start) == datetime.timedelta(hours=1)


def test_temporal_table_join_versioned_semantics(spark):
    """FOR SYSTEM_TIME AS OF: a fact before the first version keeps
    nulls; each fact reads the latest version at-or-before its ts;
    same-ts versions resolve last-writer-wins (tiebreak)."""
    from flink_uba_spark.operators.temporal import temporal_table_join

    facts = _df(spark, [(1, 100, 0), (1, 101, 30), (1, 102, 90)], "fact_id", "f_ts")
    versions = spark.createDataFrame(
        [
            (1, 10, EPOCH + datetime.timedelta(minutes=20), 500),
            (1, 11, EPOCH + datetime.timedelta(minutes=60), 700),
            (1, 12, EPOCH + datetime.timedelta(minutes=60), 900),  # ties: 12 wins
        ],
        "user_id long, version_id long, v_ts timestamp, price long",
    )
    got = (
        temporal_table_join(
            facts, versions, on="user_id", fact_ts="f_ts", version_ts="v_ts",
            payload=["version_id", "price"], tiebreak="version_id",
        )
        .toPandas()
        .set_index("fact_id")
    )
    assert got.isna().loc[100, "price"]          # before first version
    assert got.loc[101, "price"] == 500          # version at 20'
    assert got.loc[102, "price"] == 900          # last writer at 60' wins


def test_interval_join_left_outer_null_padding(spark):
    """Outer interval join: in-band rights attach (inclusive bounds both
    ends), no-match lefts survive null-padded."""
    from flink_uba_spark.operators.interval_join import interval_join

    left = _df(spark, [(1, 10, 60), (1, 11, 200), (2, 12, 60)], "pay_id", "pay_ts")
    right = _df(spark, [(1, 20, 30), (1, 21, 60), (1, 22, 61)], "click_id", "click_ts")
    got = interval_join(
        left, right, on="user_id", left_ts="pay_ts", right_ts="click_ts",
        lower="INTERVAL 30 MINUTES", upper="INTERVAL 0 SECONDS", how="left",
    ).toPandas()
    pairs = sorted(
        (int(r.pay_id), -1 if r.isna()["click_id"] else int(r.click_id))
        for _, r in got.iterrows()
    )
    # pay@60: clicks at 30 (= lower bound, inclusive) and 60 (= upper,
    # inclusive); click@61 is after. pay@200: none in band → null row.
    # user 2 has no clicks at all → null row.
    assert pairs == [(10, 20), (10, 21), (11, -1), (12, -1)]


def test_window_dedup_min_struct_first(spark):
    """Window dedup keeps the (ts, event_id)-minimal row per (key,
    window) — id breaks the same-ts race deterministically."""
    rows = [
        (1, 10, 5), (1, 11, 5), (1, 12, 40),   # same window: id 10 wins @5'
        (1, 13, 70),                           # next hour window
    ]
    ev = spark.createDataFrame(
        [
            (i, u, EPOCH + datetime.timedelta(minutes=m), "click")
            for u, i, m in rows
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    first = F.min(F.struct("ts", "event_id")).alias("f")
    got = (
        ev.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(first)
        .select("user_id", F.col("f.event_id").alias("first_id"))
        .toPandas()
        .sort_values("first_id")
    )
    assert list(got["first_id"]) == [10, 13]


def test_cogroup_one_side_empty_groups_survive(spark):
    """The coGroup distinction vs a join: a (key, window) group with only
    one side present still emits — counts 0 and an empty CSV for the
    missing side."""
    ev = spark.createDataFrame(
        [
            (1, 1, EPOCH + datetime.timedelta(minutes=5), "view"),
            (2, 1, EPOCH + datetime.timedelta(minutes=70), "purchase"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    tagged = ev.select(
        "user_id",
        F.window("ts", "1 hour").alias("w"),
        (F.col("event_type") == "view").alias("is_v"),
        "event_id",
    )
    side = lambda v: F.when(F.col("is_v") == v, F.col("event_id"))
    got = (
        tagged.groupBy("user_id", "w")
        .agg(
            F.count(side(True)).alias("n_views"),
            F.count(side(False)).alias("n_purchases"),
            F.concat_ws(",", F.sort_array(F.collect_list(side(False)))).alias("p_ids"),
        )
        .orderBy("w.start")
        .collect()
    )
    assert len(got) == 2  # both one-sided windows emit
    assert (got[0].n_views, got[0].n_purchases, got[0].p_ids) == (1, 0, "")
    assert (got[1].n_views, got[1].n_purchases, got[1].p_ids) == (0, 1, "2")
