"""Join-family operators (SURVEY.md §2.6 J1-J4) — fixture + oracle tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_uba_spark.operators.interval_join import interval_join
from flink_uba_spark.operators.order_lifecycle import (
    PAY_NO_CREATE,
    PAYED,
    PAYED_LATE,
    TIMEOUT,
    classify_order_states,
)
from flink_uba_spark.operators.reconcile import reconcile
from flink_uba_spark.queries import uba
from tests.conftest import assert_matches_oracle


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in [(f.name, f.dataType.simpleString()) for f in df.schema.fields]:
        if c.endswith("_s"):
            df = df.withColumn(c[:-2], F.col(c).cast("timestamp")).drop(c)
    return df


def test_interval_join_reference_fixture(spark):
    """TxPayMatchByJoin semantics: receipt.ts ∈ [pay.ts−3s, pay.ts+5s]
    (TxPayMatchByJoin.java:63)."""
    pays = _ts(
        spark,
        [("tx1", "2024-01-01 00:00:10"), ("tx2", "2024-01-01 00:01:00")],
        "txId string, ts_s string",
    ).withColumnRenamed("ts", "pay_ts")
    receipts = _ts(
        spark,
        [
            ("tx1", "2024-01-01 00:00:08"),  # pay−2s: inside [−3s, +5s]
            ("tx1", "2024-01-01 00:00:16"),  # pay+6s: outside
            ("tx2", "2024-01-01 00:01:05"),  # pay+5s: boundary, inside
        ],
        "txId string, ts_s string",
    ).withColumnRenamed("ts", "receipt_ts")
    out = interval_join(
        pays, receipts, on="txId", left_ts="pay_ts", right_ts="receipt_ts"
    ).collect()
    got = {(r.txId, r.receipt_ts.strftime("%H:%M:%S")) for r in out}
    assert got == {("tx1", "00:00:08"), ("tx2", "00:01:05")}


def test_reconcile_tags_unmatched_sides(spark):
    """TxPayMatch side outputs (TxPayMatch.java:33-34) as status tags."""
    pays = _ts(spark, [("a", "2024-01-01 00:00:00"), ("b", "2024-01-01 00:10:00")], "k string, ts_s string").withColumnRenamed("ts", "pay_ts").withColumn("pay_id", F.monotonically_increasing_id())
    receipts = _ts(spark, [("a", "2024-01-01 00:00:02"), ("c", "2024-01-01 00:20:00")], "k string, ts_s string").withColumnRenamed("ts", "receipt_ts").withColumn("receipt_id", F.monotonically_increasing_id())
    out = reconcile(pays, receipts, on="k", left_ts="pay_ts", right_ts="receipt_ts", left_id="pay_id", right_id="receipt_id")
    by_status = {r.k: r.status for r in out.collect()}
    assert by_status == {"a": "matched", "b": "unmatched_left", "c": "unmatched_right"}


def test_order_states_fixture(spark):
    """The four OrderPayMatchDetect outcomes (OrderPayTimeoutWithoutCEP.java:89-143),
    reference-fixture shaped: order 34767's pay arrives after the 15-min
    deadline (OrderLog.csv via FIXTURES.md §3)."""
    creates = _ts(
        spark,
        [
            (1, 34729, "2024-01-01 00:00:00"),  # payed in time
            (2, 34730, "2024-01-01 00:00:10"),  # never payed
            (3, 34767, "2024-01-01 00:00:20"),  # payed late (>15 min)
        ],
        "event_id long, orderId long, ts_s string",
    )
    pays = _ts(
        spark,
        [
            (11, 34729, "2024-01-01 00:05:00"),
            (13, 34767, "2024-01-01 00:19:00"),
            (14, 34999, "2024-01-01 00:30:00"),  # pay with no create
        ],
        "event_id long, orderId long, ts_s string",
    )
    out = classify_order_states(creates, pays, key="orderId", deadline="INTERVAL 15 MINUTES")
    states = {r.orderId: r.state for r in out.collect()}
    assert states == {34729: PAYED, 34730: TIMEOUT, 34767: PAYED_LATE, 34999: PAY_NO_CREATE}


def test_uba_queries_match_oracle(spark, duck, sf_dir):
    for name in ("hot_pages", "order_timeout_states", "attribution_interval_join", "tx_reconcile_full_outer"):
        assert_matches_oracle(uba.QUERIES[name](spark, sf_dir), duck, uba.ORACLES[name])


def test_order_states_single_pass_equals_join_form(spark, sf_dir):
    """The round-3 single-pass window form (one key exchange, linear in
    per-key density) must equal the original join form on the real events
    table — including orphan follows and equal-timestamp edge cases."""
    from pyspark.sql import functions as F

    from flink_uba_spark.operators.order_lifecycle import (
        classify_order_states,
        classify_order_states_single_pass,
    )
    from flink_uba_spark.sources.readers import load_testdata

    ev = load_testdata(spark, sf_dir, ("events",))["events"]
    anchors = ev.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    follows = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    old = classify_order_states(anchors, follows, "user_id").toPandas()
    new = classify_order_states_single_pass(anchors, follows, "user_id").toPandas()
    assert len(old) > 0, "no order states — vacuous equivalence"
    cols = sorted(old.columns)
    o = old[cols].sort_values(cols).reset_index(drop=True)
    n = new[cols].sort_values(cols).reset_index(drop=True)
    assert o.equals(n)


def test_order_states_single_pass_plans_one_exchange(spark, sf_dir):
    """The single-pass form must shuffle the union exactly once (the key
    exchange both frame windows reuse) — the property that makes it linear."""
    import re

    from pyspark.sql import functions as F

    from flink_uba_spark.operators.order_lifecycle import classify_order_states_single_pass
    from flink_uba_spark.sources.readers import load_testdata

    ev = load_testdata(spark, sf_dir, ("events",))["events"]
    anchors = ev.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    follows = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    df = classify_order_states_single_pass(anchors, follows, "user_id")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, f"expected 1 exchange, plan has {n_exchange}"
    assert "Join" not in plan, "single-pass form must not contain a join node"
