"""CEP-lite: N-step sequence detection (SURVEY.md §2.6 J3, §7 step 7).

Reference: ``Pattern.begin("create").where(...).followedBy("pay")
.where(...).within(Time.minutes(15))`` (OrderPayTimeout.java:52-64), with
``select(timeoutTag, timeoutFn, selectFn)`` splitting matches from timeouts.
The Pattern API chains arbitrarily (begin → followedBy → … → within);
``pattern_detect`` compiles that chain shape, and ``sequence_detect`` keeps
the reference's exact 2-step semantics (the non-CEP twin,
OrderPayTimeoutWithoutCEP.java, including orphan-pay side output).

Spark has no CEP library; these operators expand the pattern spec into a
plan — the §4 conclusion that the pattern is a plan shape, not a runtime.
``pattern_detect`` uses followed-by (skip-till-next-match) semantics: from
each anchor event, each subsequent step binds to the EARLIEST event matching
its predicate after the previous step's event (ties at equal timestamps
resolve earlier-steps-first, the same rule the 2-step batch form uses for
same-ts pays). A per-transition ``within`` bound classifies complete chains
as matched vs matched_late — mirroring payed vs payed_late — rather than
re-searching later candidates, exactly as the reference's first-pay-decides
state machine does.

Scale: the whole N-step compile is N-1 chained window aggregates over ONE
hash exchange on the key, each a min-of-struct over the
rows-following frame — no self-joins, no anchors×candidates fan-out, linear
in per-key density (same class as the funnel operator, sessions.py:72).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def pattern_detect(
    events: DataFrame,
    key: str,
    steps: list[tuple[Column, str | None]],
    event_id: str = "event_id",
    ts: str = "ts",
) -> DataFrame:
    """Compile an N-step ``begin → followedBy → …`` pattern into chained
    window aggregates (one key exchange total).

    ``steps`` is an ordered list of ``(predicate, within)`` where ``within``
    (an ``INTERVAL`` literal, or None for unbounded) bounds the transition
    INTO that step; the first step's bound is ignored.

    Semantics (followed-by / skip-till-next-match): every event matching
    step 1 anchors a potential match; step k+1 binds to the earliest
    step-(k+1) event after step k's event (same-timestamp events count,
    with earlier pattern steps ordered first — the 2-step form's
    ``follow_ts >= anchor_ts`` rule). One output row per anchor:

    - ``t1..tN`` — the bound chain timestamps (null from the first unbound
      step onward),
    - ``max_step`` — number of steps bound,
    - ``state`` — ``matched`` (complete, every bound respected),
      ``matched_late`` (complete, some transition exceeded its bound —
      the payed_late analogue: the first candidate decides, later ones are
      not re-searched), ``incomplete`` (chain broke: some step never
      occurred after its predecessor).

    Construction: per key, sort once by (ts, step_rank, event_id). For the
    last step the chain struct is just its timestamp; walking backwards,
    each step's chain = struct(own ts, fields of min(next-step chain) over
    the rows-following frame). min-of-struct orders by the leading ts, so
    it picks the earliest next-step event; equal-ts candidates of the same
    step carry identical downstream fields (later-step events sort after
    ALL equal-ts earlier-step events), keeping the pick deterministic.
    All N-1 windows share one partitioning and sort → a single exchange +
    sort in the plan, linear in per-key density at 100 TB.
    """
    n = len(steps)
    if n < 2:
        raise ValueError("pattern_detect needs at least 2 steps")
    preds = [p for p, _ in steps]

    base = events.select(
        F.col(key).alias("__k"),
        F.col(event_id).alias("__id"),
        F.col(ts).alias("__ts"),
        *[p.cast("boolean").alias(f"__p{i}") for i, p in enumerate(preds, start=1)],
    )
    # earliest pattern step a row can serve — earlier steps sort first at
    # equal timestamps so a same-ts successor is still "after" its anchor
    base = base.withColumn(
        "__rank",
        F.coalesce(
            *[F.when(F.col(f"__p{i}"), F.lit(i)) for i in range(1, n + 1)],
            F.lit(n + 1),
        ),
    )
    w_after = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__rank", "__id")
        .rowsBetween(1, Window.unboundedFollowing)
    )

    df = base.withColumn(
        f"__c{n}", F.when(F.col(f"__p{n}"), F.struct(F.col("__ts").alias(f"t{n}")))
    )
    for k in range(n - 1, 0, -1):
        nxt = F.min(F.col(f"__c{k+1}")).over(w_after)
        fields = [F.col("__ts").alias(f"t{k}")] + [
            nxt.getField(f"t{j}").alias(f"t{j}") for j in range(k + 1, n + 1)
        ]
        df = df.withColumn(f"__c{k}", F.when(F.col(f"__p{k}"), F.struct(*fields)))

    anchors = df.filter(F.col("__p1"))
    t_cols = [F.col("__c1").getField(f"t{k}").alias(f"t{k}") for k in range(1, n + 1)]
    out = anchors.select(
        F.col("__k").alias(key), F.col("__id").alias("anchor_id"), *t_cols
    )

    complete = F.col(f"t{n}").isNotNull()
    bounds_ok = F.lit(True)
    for k in range(2, n + 1):
        within = steps[k - 1][1]
        if within is not None:
            bounds_ok = bounds_ok & (
                F.col(f"t{k}") <= F.col(f"t{k-1}") + F.expr(within)
            )
    max_step = F.lit(1) + sum(
        F.when(F.col(f"t{k}").isNotNull(), 1).otherwise(0) for k in range(2, n + 1)
    )
    return out.withColumn("max_step", max_step.cast("long")).withColumn(
        "state",
        F.when(~complete, F.lit("incomplete"))
        .when(bounds_ok, F.lit("matched"))
        .otherwise(F.lit("matched_late")),
    )
