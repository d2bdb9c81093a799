"""Behavioral analytics catalog: sessionization, funnels, retention cohorts
(operators/sessions.py) — the "Structured Streaming + sessionization"
north-star surface over the events stream."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_uba_spark.operators.sessions import funnel, retention_cohorts, sessionize
from flink_uba_spark.sources.readers import load_testdata


def _events(spark, sf_dir):
    return load_testdata(spark, sf_dir, ("events",))["events"]


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min) per user via native session_window."""
    return sessionize(_events(spark, sf_dir), key="user_id", gap="30 minutes")


USER_SESSIONS_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end_event,
       count(*) AS n_events
FROM sess
GROUP BY user_id, sid
"""


def user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup → purchase → click funnel per user."""
    return funnel(_events(spark, sf_dir), steps=("signup", "purchase", "click"))


USER_FUNNEL_ORACLE = """
WITH s1 AS (
    SELECT user_id, min(ts) AS s1 FROM events WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS s2
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.s1
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS s3
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.s2
    WHERE e.event_type = 'click' GROUP BY e.user_id
)
SELECT s1.user_id, s1.s1, s2.s2, s3.s3,
       CAST(1 + CASE WHEN s2.s2 IS NULL THEN 0 ELSE 1 END
              + CASE WHEN s3.s3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS max_step
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


def user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over all events."""
    return retention_cohorts(_events(spark, sf_dir), period_days=7)


USER_RETENTION_ORACLE = """
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
SELECT make_timestamp((epoch_us(first_ts) // 604800000000) * 604800000000) AS cohort_period,
       (epoch_us(e.ts) - epoch_us(first_ts)) // 604800000000 AS period_offset,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU per day + per-type event volume. (The HLL approximate
    form — approx_count_distinct — is exercised in tests; it has no exact
    oracle by construction.)"""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("DAY", "ts").alias("day"))
        .agg(
            F.count_distinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).cast("long").alias("n_purchases"),
        )
    )


DAILY_ACTIVE_USERS_ORACLE = """
SELECT date_trunc('day', ts) AS day,
       count(DISTINCT user_id) AS dau,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
FROM events
GROUP BY 1
"""


def hourly_event_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window volume per event type (the slide=None path of
    windowed_counts — W1's tumbling sibling)."""
    from flink_uba_spark.operators.topn import windowed_counts

    ev = _events(spark, sf_dir)
    return windowed_counts(
        ev, "event_type", ts="ts", size="1 hour", slide=None, key_alias="event_type"
    )


HOURLY_VOLUME_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type, count(*) AS cnt
FROM events
GROUP BY 1, 2, 3
"""


QUERIES = {
    "daily_active_users": daily_active_users,
    "hourly_event_volume": hourly_event_volume,
    "user_sessions": user_sessions,
    "user_funnel": user_funnel,
    "user_retention": user_retention,
}

ORACLES = {
    "daily_active_users": DAILY_ACTIVE_USERS_ORACLE,
    "hourly_event_volume": HOURLY_VOLUME_ORACLE,
    "user_sessions": USER_SESSIONS_ORACLE,
    "user_funnel": USER_FUNNEL_ORACLE,
    "user_retention": USER_RETENTION_ORACLE,
}
