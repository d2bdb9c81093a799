"""CEP-lite: 2-step sequence detection (SURVEY.md §2.6 J3, §7 step 7).

Reference: ``Pattern.begin("create").where(...).followedBy("pay")
.where(...).within(Time.minutes(15))`` (OrderPayTimeout.java:52-64), with
``select(timeoutTag, timeoutFn, selectFn)`` splitting matches from timeouts.

Spark has no CEP library; this operator expands the pattern spec into a join
plan (batch) — the §4 conclusion that the pattern is a plan shape, not a
runtime. The surface is deliberately minimal (first → then, within bound, no
Kleene/optional steps): the reference's own non-CEP twin
(OrderPayTimeoutWithoutCEP.java) proves this 2-step form is the semantics
that matters. The streaming twin is streaming/order_timeout.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_uba_spark.operators.order_lifecycle import (
    PAYED,
    classify_order_states_single_pass,
)


def sequence_detect(
    events: DataFrame,
    key: str,
    first_pred: Column,
    then_pred: Column,
    within: str = "INTERVAL 15 MINUTES",
    event_id: str = "event_id",
    ts: str = "ts",
) -> DataFrame:
    """Detect ``first → then`` sequences per key within a time bound.

    Returns one row per anchor event (plus orphan follows) with ``state`` ∈
    {payed, timeout, payed_late, pay_no_create} — ``payed`` rows are the CEP
    matches (selectFn output); every other state is the reference's side
    output family.
    """
    anchors = events.filter(first_pred)
    follows = events.filter(then_pred)
    # round 3: the single-pass window form — one key exchange, linear in
    # per-key density, where the join form fans out anchors×follows per key
    # before aggregating (SCALE.md round-1 ratio 3.7 at 10×); equivalence
    # with the join form is pinned by tests/test_joins.py
    return classify_order_states_single_pass(
        anchors, follows, key=key, deadline=within, anchor_id=event_id, follow_id=event_id, ts=ts
    )


def sequence_matches(events: DataFrame, key: str, first_pred: Column, then_pred: Column, within: str = "INTERVAL 15 MINUTES") -> DataFrame:
    """Only the matched pairs (the CEP ``select`` main output)."""
    return sequence_detect(events, key, first_pred, then_pred, within).filter(
        F.col("state") == PAYED
    )
