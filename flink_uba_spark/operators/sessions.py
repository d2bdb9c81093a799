"""Sessionization and UBA behavioral analytics: session windows, funnels,
retention cohorts.

Sessionization is the north-star approach named in BASELINE.json
("Structured Streaming + sessionization"); the reference has no session
windows (SURVEY.md §2.7 lists them as absent), so these are engine
extensions built on native Spark primitives.

Scale design:
- ``sessionize`` uses the built-in ``session_window`` — Spark merges
  per-key gap-bounded sessions inside the aggregation operator (state is
  one row per open session, merged on overlap), one exchange on the key.
  The same expression runs in Structured Streaming with a watermark.
- funnels/retention are conditional-aggregation + self-join shapes keyed
  on the user — each step is one hash exchange on user_id; at 100 TB the
  user key spreads uniformly (no skew by construction of user ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions per key. A session extends while the next event
    arrives within ``gap`` of the last, INCLUSIVE — an event at exactly
    last+gap still merges (Spark session_window semantics, pinned by
    tests/test_behavior.py::test_sessionize_gap_boundary). Output: key,
    session_start, session_end_event (last event ts), n_events."""
    return (
        df.groupBy(F.session_window(ts, gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max(ts).alias("session_end_event"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            "session_end_event",
            "n_events",
        )
    )


def sessionize_dynamic(
    df: DataFrame,
    gap_expr: Column,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Sessions with a PER-EVENT gap (``session_window`` with a gap
    expression): each event claims the interval [ts, ts + gap(event)];
    overlapping intervals merge. Lets cheap signals shape the session —
    e.g. an error event holds the session open for less time than a
    purchase. Output: key, session_start, session_end (max claimed end),
    n_events. Same single-exchange merge as the fixed-gap form."""
    return (
        df.groupBy(F.session_window(F.col(ts), gap_expr).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def funnel(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    steps: tuple[str, ...] = ("signup", "purchase", "click"),
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: step i+1 counts only strictly after the user's
    earliest completion of step i. Output: key, s1..sN (timestamps, null
    when not reached), max_step.

    Single-exchange form (round 2): each step bound is an unordered
    windowed min over the user partition, chained so step i's predicate
    references step i−1's column. Consecutive WindowExecs share the ONE
    hash exchange on the key, and the per-user collapse reuses that
    partitioning — an N-step funnel costs one shuffle total, versus one
    shuffle of the events table per step in the naive join form (the
    round-1 implementation; equivalence pinned in tests/test_behavior.py).
    A user with no step-1 event is absent, matching the join form.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key)
    base = df.select(F.col(key), F.col(ts), F.col(type_col))
    out = base.withColumn(
        "s1", F.min(F.when(F.col(type_col) == steps[0], F.col(ts))).over(w)
    )
    for i, step in enumerate(steps[1:], start=2):
        # ts > null is null -> when() yields null -> min ignores it, so an
        # unreached previous step propagates null forward
        out = out.withColumn(
            f"s{i}",
            F.min(
                F.when(
                    (F.col(type_col) == step) & (F.col(ts) > F.col(f"s{i-1}")), F.col(ts)
                )
            ).over(w),
        )
    cols = [f"s{i}" for i in range(1, len(steps) + 1)]
    per_user = (
        out.filter(F.col("s1").isNotNull())
        .groupBy(key)
        .agg(*[F.max(c).alias(c) for c in cols])
    )
    # steps are sequential (s_{i+1} only exists after s_i), so the depth
    # reached is 1 + count of non-null later steps
    reached = sum(
        (F.when(F.col(f"s{i}").isNotNull(), 1).otherwise(0)) for i in range(2, len(steps) + 1)
    )
    return per_user.withColumn("max_step", (F.lit(1) + reached).cast("long"))


def retention_cohorts(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention: cohort = each user's first-activity period; one row
    per (cohort_period, period_offset) with distinct active users."""
    first = df.groupBy(key).agg(F.min(ts).alias("first_ts"))
    joined = df.select(key, ts).join(first, on=key)
    period_us = 86_400_000_000 * period_days
    # integer division throughout — float division could flip at exact
    # period boundaries and break cross-engine determinism
    offset = F.expr(f"(unix_micros({ts}) - unix_micros(first_ts)) div {period_us}")
    cohort = F.timestamp_micros(F.expr(f"(unix_micros(first_ts) div {period_us}) * {period_us}"))
    return (
        joined.withColumn("cohort_period", cohort)
        .withColumn("period_offset", offset)
        .groupBy("cohort_period", "period_offset")
        .agg(F.count_distinct(F.col(key)).alias("n_users"))
    )
