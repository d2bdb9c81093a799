"""Temporal-join catalog: as-of (last-touch) lookup and per-row-window
range join over the events table (operators/temporal.py).

Determinism contract (queries/__init__.py): outputs are ints, strings,
timestamps; time gaps are exact integer microseconds (unix_micros /
epoch_us), never float seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_uba_spark.operators.temporal import asof_join, range_join
from flink_uba_spark.sources.readers import load_testdata


def _events(spark, sf_dir):
    return load_testdata(spark, sf_dir, ("events",))["events"]


def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the user's most recent
    click at-or-before it (ties on click ts broken by max event_id), plus
    the touch→purchase gap in exact microseconds. Purchases with no prior
    click keep nulls — the left side always survives."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    j = asof_join(
        purchases, clicks, on="user_id", payload=["event_id"], tiebreak="event_id"
    )
    return j.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("r_event_id").alias("click_id"),
        F.col("r_ts").alias("click_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("r_ts"))).alias("gap_us"),
    )


ASOF_LAST_CLICK_ORACLE = """
WITH t AS (
    SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_r
    FROM events WHERE event_type IN ('click', 'purchase')
), w AS (
    SELECT user_id, ts, event_id, is_r,
           last_value(CASE WHEN is_r = 1 THEN event_id END IGNORE NULLS)
             OVER win AS click_id,
           last_value(CASE WHEN is_r = 1 THEN ts END IGNORE NULLS)
             OVER win AS click_ts
    FROM t
    WINDOW win AS (PARTITION BY user_id
                   ORDER BY ts ASC, is_r DESC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, click_id, click_ts,
       epoch_us(ts) - epoch_us(click_ts) AS gap_us
FROM w WHERE is_r = 0
"""


def purchases_in_signup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row-window attribution: each signup opens a window of
    600 + (event_id % 1800) seconds (heterogeneous lengths — the case a
    fixed-band interval join can't express); emit every purchase of the
    same user inside its window. Bucketized equi-join, 15-min buckets."""
    ev = _events(spark, sf_dir)
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("start_ts"),
        F.timestamp_micros(
            F.unix_micros(F.col("ts"))
            + (F.lit(600) + F.col("event_id") % 1800) * 1_000_000
        ).alias("end_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    j = range_join(
        purchases,
        signups,
        left_ts="ts",
        start_col="start_ts",
        end_col="end_ts",
        keys=("user_id",),
        bucket_seconds=900,
    )
    return j.select(
        "user_id",
        "signup_id",
        "purchase_id",
        F.col("ts").alias("purchase_ts"),
        "start_ts",
        "end_ts",
    )


PURCHASES_IN_SIGNUP_WINDOWS_ORACLE = """
WITH r AS (
    SELECT user_id, event_id AS signup_id, ts AS start_ts,
           make_timestamp(epoch_us(ts) + (600 + event_id % 1800) * 1000000) AS end_ts
    FROM events WHERE event_type = 'signup'
), p AS (
    SELECT user_id, event_id AS purchase_id, ts FROM events
    WHERE event_type = 'purchase'
)
SELECT r.user_id, r.signup_id, p.purchase_id, p.ts AS purchase_ts,
       r.start_ts, r.end_ts
FROM r JOIN p ON r.user_id = p.user_id
              AND p.ts >= r.start_ts AND p.ts <= r.end_ts
"""


def window_join_views_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window join TVF (Flink 1.14 ``TUMBLE ⋈ TUMBLE``): views and
    purchases of the same user landing in the same epoch-aligned 1-hour
    tumbling window — the co-occurrence shape an interval join can't
    express (the bound is the shared bucket, not a relative band).
    Plan: operators/temporal.py window_join — two projections + ONE
    shuffle each on (user_id, window); the window in the join key is what
    bounds streaming state to a single window per key."""
    from flink_uba_spark.operators.temporal import window_join

    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return window_join(
        views,
        purchases,
        keys=["user_id"],
        size="1 hour",
        left_ts="view_ts",
        right_ts="purchase_ts",
    ).select(
        "user_id",
        "window_start",
        "window_end",
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
    )


WINDOW_JOIN_ORACLE = """
WITH v AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts,
         epoch_us(ts) // 3600000000 AS w
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
         epoch_us(ts) // 3600000000 AS w
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id,
       make_timestamp(v.w * 3600000000) AS window_start,
       make_timestamp((v.w + 1) * 3600000000) AS window_end,
       v.view_id, v.view_ts, p.purchase_id, p.purchase_ts
FROM v JOIN p ON v.user_id = p.user_id AND v.w = p.w
"""


def temporal_join_price_at_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time temporal table join — Flink SQL's ``FOR SYSTEM_TIME AS
    OF`` over a versioned table: each purchase is a PRICE VERSION for its
    user (amount in exact integer cents, last-writer-wins on ts ties by
    event_id), and every view reads the version valid at ITS OWN event
    time; views before the user's first purchase keep nulls — the
    versioned-dim contract, not an inner lookup. Lowered to the as-of
    single-pass window plan (operators/temporal.py:temporal_table_join —
    the validity-interval range join is the plan that does NOT survive
    100 TB; the latest-at-or-before window form is)."""
    from flink_uba_spark.operators.temporal import temporal_table_join

    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    versions = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("version_ts"),
        F.col("event_id").alias("version_id"),
        F.floor(F.col("value") * 100).cast("long").alias("price_cents"),
    )
    j = temporal_table_join(
        views,
        versions,
        on="user_id",
        fact_ts="ts",
        version_ts="version_ts",
        payload=["version_id", "price_cents"],
        tiebreak="version_id",
    )
    return j.select(
        "user_id",
        "view_id",
        F.col("ts").alias("view_ts"),
        F.col("version_id"),
        F.col("version_ts"),
        F.col("price_cents"),
    )


TEMPORAL_JOIN_PRICE_ORACLE = """
WITH t AS (
    SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_v,
           CASE WHEN event_type = 'purchase'
                THEN CAST(floor(value * 100) AS BIGINT) END AS cents
    FROM events WHERE event_type IN ('view', 'purchase')
), w AS (
    SELECT user_id, ts, event_id, is_v,
           last_value(CASE WHEN is_v = 1 THEN event_id END IGNORE NULLS)
             OVER win AS version_id,
           last_value(CASE WHEN is_v = 1 THEN ts END IGNORE NULLS)
             OVER win AS version_ts,
           last_value(CASE WHEN is_v = 1 THEN cents END IGNORE NULLS)
             OVER win AS price_cents
    FROM t
    WINDOW win AS (PARTITION BY user_id
                   ORDER BY ts ASC, is_v DESC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id AS view_id, ts AS view_ts,
       version_id, version_ts, price_cents
FROM w WHERE is_v = 0
"""


def interval_join_left_outer_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER interval join — Flink SQL's outer interval join (the
    DataStream ``intervalJoin`` the reference family uses,
    TxPayMatchByJoin.java:60-64, is inner-only; SQL adds the outer
    forms): every purchase keeps ALL clicks of its user inside
    [pay_ts − 30 min, pay_ts], and purchases with none survive
    null-padded — attribution with explicit no-touch rows, vs
    ``asof_last_click``'s latest-touch-only contract. Plan: one hash
    exchange on the key, range residual post-filter, null padding free
    (operators/interval_join.py, how='left')."""
    from flink_uba_spark.operators.interval_join import interval_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pay_id"), F.col("ts").alias("pay_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return interval_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="pay_ts",
        right_ts="click_ts",
        lower="INTERVAL 30 MINUTES",
        upper="INTERVAL 0 SECONDS",
        how="left",
    ).select("user_id", "pay_id", "pay_ts", "click_id", "click_ts")


INTERVAL_JOIN_LEFT_OUTER_ORACLE = """
WITH p AS (SELECT user_id, event_id AS pay_id, ts AS pay_ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id AS click_id, ts AS click_ts FROM events
      WHERE event_type = 'click')
SELECT p.user_id, p.pay_id, p.pay_ts, c.click_id, c.click_ts
FROM p LEFT JOIN c
  ON p.user_id = c.user_id
 AND c.click_ts >= p.pay_ts - INTERVAL 30 MINUTE
 AND c.click_ts <= p.pay_ts
"""


def window_dedup_first_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window Deduplication TVF (Flink SQL: ``ROW_NUMBER() OVER
    (PARTITION BY window_start, window_end, key ORDER BY ts) = 1`` over a
    windowed table): the FIRST click per user per epoch-aligned 1-hour
    tumbling window — the rate-limit / first-touch-per-period primitive.
    Compiled as min-of-struct aggregation, NOT a row_number sort: one
    partial+final hash aggregate over a single (user, window) exchange —
    the map-side partial keeps one row per group per task, which is the
    plan that survives 100 TB (a per-window sort would shuffle every
    row)."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    first = F.min(F.struct("ts", "event_id")).alias("f")
    return (
        clicks.groupBy("user_id", F.window("ts", "1 hour").alias("__w"))
        .agg(first)
        .select(
            "user_id",
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            F.col("f.ts").alias("first_ts"),
            F.col("f.event_id").alias("first_click_id"),
        )
    )


WINDOW_DEDUP_ORACLE = """
WITH c AS (
  SELECT user_id, event_id, ts, epoch_us(ts) // 3600000000 AS w
  FROM events WHERE event_type = 'click'
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, w ORDER BY ts, event_id) AS rn
  FROM c
)
SELECT user_id,
       make_timestamp(w * 3600000000) AS window_start,
       make_timestamp((w + 1) * 3600000000) AS window_end,
       ts AS first_ts, event_id AS first_click_id
FROM r WHERE rn = 1
"""


def window_cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed coGroup — Flink's ``coGroup().where().equalTo()
    .window(...)`` (the DataStream sibling of the window join): per
    (user, epoch-aligned hour) BOTH sides' grouped rows arrive together,
    INCLUDING one-side-empty groups — the shape an inner/outer join
    fans out or pads instead of grouping. Views and purchases co-grouped
    into per-side counts and sorted id lists (CSV — deterministic).

    Spark-first compile: tag + UNION the two scans, then ONE
    (user, window) exchange with conditional aggregates — half the
    shuffles of the join formulation and no pair fan-out; at 100 TB the
    union+group form is how coGroup should lower."""
    ev = _events(spark, sf_dir)
    tagged = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        F.window("ts", "1 hour").alias("__w"),
        (F.col("event_type") == "view").alias("__is_v"),
        "event_id",
    )
    side = lambda v: F.when(F.col("__is_v") == v, F.col("event_id"))
    return (
        tagged.groupBy("user_id", "__w")
        .agg(
            F.count(side(True)).alias("n_views"),
            F.count(side(False)).alias("n_purchases"),
            F.concat_ws(",", F.sort_array(F.collect_list(side(True)))).alias("view_ids"),
            F.concat_ws(",", F.sort_array(F.collect_list(side(False)))).alias(
                "purchase_ids"
            ),
        )
        .select(
            "user_id",
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "n_views",
            "n_purchases",
            "view_ids",
            "purchase_ids",
        )
    )


WINDOW_COGROUP_ORACLE = """
WITH t AS (
  SELECT user_id, event_id, event_type = 'view' AS is_v,
         epoch_us(ts) // 3600000000 AS w
  FROM events WHERE event_type IN ('view', 'purchase')
)
SELECT user_id,
       make_timestamp(w * 3600000000) AS window_start,
       make_timestamp((w + 1) * 3600000000) AS window_end,
       CAST(count(CASE WHEN is_v THEN 1 END) AS BIGINT) AS n_views,
       CAST(count(CASE WHEN NOT is_v THEN 1 END) AS BIGINT) AS n_purchases,
       coalesce(string_agg(CASE WHEN is_v THEN event_id END, ','
                           ORDER BY event_id), '') AS view_ids,
       coalesce(string_agg(CASE WHEN NOT is_v THEN event_id END, ','
                           ORDER BY event_id), '') AS purchase_ids
FROM t GROUP BY user_id, w
"""


QUERIES = {
    "asof_last_click": asof_last_click,
    "purchases_in_signup_windows": purchases_in_signup_windows,
    "window_join_views_purchases": window_join_views_purchases,
    "temporal_join_price_at_view": temporal_join_price_at_view,
    "interval_join_left_outer_clicks": interval_join_left_outer_clicks,
    "window_dedup_first_click": window_dedup_first_click,
    "window_cogroup_user_activity": window_cogroup_user_activity,
}

ORACLES = {
    "asof_last_click": ASOF_LAST_CLICK_ORACLE,
    "purchases_in_signup_windows": PURCHASES_IN_SIGNUP_WINDOWS_ORACLE,
    "window_join_views_purchases": WINDOW_JOIN_ORACLE,
    "temporal_join_price_at_view": TEMPORAL_JOIN_PRICE_ORACLE,
    "interval_join_left_outer_clicks": INTERVAL_JOIN_LEFT_OUTER_ORACLE,
    "window_dedup_first_click": WINDOW_DEDUP_ORACLE,
    "window_cogroup_user_activity": WINDOW_COGROUP_ORACLE,
}
