"""UBA query catalog — the reference's query shapes over the driver's
``events`` table (event_id, ts, user_id, event_type, value, props).

Column mapping from the reference's domain to the synthetic stream:
- "item"  := the JSON payload key ``props.k`` (the reference parses
  positional CSV into typed fields, HotItem.java:44-47; here the payload is
  JSON so parsing is get_json_object — same P1 role).
- "page"  := event_type (HotPages groups by url, HotPages.java:76).
- "pv" filter := event_type = 'view' (HotItem.java:57 filters behavior='pv').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_uba_spark.operators.topn import topn_per_window, windowed_counts
from flink_uba_spark.sources.readers import load_testdata

TOP_N = 5

# ---------------------------------------------------------------------------
# hot_items — W1 sliding window 1h/5m + W3 count agg + W4 window-end
# enrichment + T1/T3 per-window top-5 (HotItem.java:26-73)
# ---------------------------------------------------------------------------


def hot_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_testdata(spark, sf_dir, ("events",))["events"]
    views = events.filter(F.col("event_type") == "view").select(
        F.get_json_object("props", "$.k").cast("long").alias("item_id"),
        "ts",
    )
    counts = windowed_counts(views, "item_id", ts="ts", size="1 hour", slide="5 minutes")
    ranked = topn_per_window(counts, "item_id", n=TOP_N)
    return ranked.select(
        "window_start",
        "window_end",
        "item_id",
        "cnt",
        F.col("rnk").cast("long").alias("rnk"),
    )


# DuckDB twin. Spark's window(ts, 1h, 5m) assigns each row to the 12
# epoch-aligned slide starts covering it; emulated with a 0..11 series.
HOT_ITEMS_ORACLE = f"""
WITH pv AS (
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id, ts
    FROM events
    WHERE event_type = 'view'
),
assigned AS (
    SELECT
        make_timestamp(((CAST(floor(epoch(ts) / 300) AS BIGINT) - g.k) * 300) * 1000000)
            AS window_start,
        item_id
    FROM pv
    CROSS JOIN generate_series(0, 11) AS g(k)
),
agg AS (
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           item_id,
           count(*) AS cnt
    FROM assigned
    GROUP BY 1, 3
),
ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY window_start ORDER BY cnt DESC, item_id ASC) AS rnk
    FROM agg
)
SELECT window_start, window_end, item_id, cnt, rnk
FROM ranked
WHERE rnk <= {TOP_N}
"""


def hot_items_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL variant (entry point C, HotItemWithSql.java:64-72):
    nested HOP-window agg + ROW_NUMBER rank + rank filter, via spark.sql."""
    load_testdata(spark, sf_dir, ("events",))["events"].createOrReplaceTempView("events")
    # the JSON parse sits in its own subquery so it runs BEFORE the
    # window Expand — inlined into the windowed aggregate it is evaluated
    # once per (row × 12 windows) instead of once per row (round 10:
    # measured 1.09 s → at parity with the DataFrame twin at sf0.1, and
    # 12× fewer JSON parses at any scale)
    return spark.sql(
        f"""
        SELECT window_start, window_end, item_id, cnt, CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                         ORDER BY cnt DESC, item_id ASC) AS rnk
            FROM (
                SELECT window(ts, '1 hour', '5 minutes').start AS window_start,
                       window(ts, '1 hour', '5 minutes').end   AS window_end,
                       item_id,
                       count(*) AS cnt
                FROM (
                    SELECT ts,
                           CAST(get_json_object(props, '$.k') AS BIGINT) AS item_id
                    FROM events
                    WHERE event_type = 'view'
                )
                GROUP BY 1, 2, 3
            )
        )
        WHERE rnk <= {TOP_N}
        """
    )


# ---------------------------------------------------------------------------
# hot_pages — W2 sliding window + P4 regex filter (HotPages.java:32-91).
# "Pages" are event_type values; static-resource exclusion (HotPages.java:72-75,
# implemented with the evident intent — the reference's regex is a no-op,
# SURVEY.md §2.2 P4) maps to excluding the non-page event classes.
# Window 6h/30m keeps the same 12-windows-per-event shape as 10m/5s while
# staying sane over the 30-day synthetic stream.
# ---------------------------------------------------------------------------

HOT_PAGES_EXCLUDE = "^(error|signup)$"


def hot_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_testdata(spark, sf_dir, ("events",))["events"]
    pages = events.filter(~F.col("event_type").rlike(HOT_PAGES_EXCLUDE)).select(
        F.col("event_type").alias("page"), "ts"
    )
    counts = windowed_counts(pages, "page", ts="ts", size="6 hours", slide="30 minutes")
    ranked = topn_per_window(counts, "page", n=3)
    return ranked.select(
        "window_start", "window_end", "page", "cnt", F.col("rnk").cast("long").alias("rnk")
    )


HOT_PAGES_ORACLE = """
WITH pages AS (
    SELECT event_type AS page, ts FROM events
    WHERE NOT regexp_matches(event_type, '^(error|signup)$')
),
assigned AS (
    SELECT
        make_timestamp(((CAST(floor(epoch(ts) / 1800) AS BIGINT) - g.k) * 1800) * 1000000)
            AS window_start,
        page
    FROM pages CROSS JOIN generate_series(0, 11) AS g(k)
),
agg AS (
    SELECT window_start, window_start + INTERVAL 6 HOUR AS window_end, page, count(*) AS cnt
    FROM assigned GROUP BY 1, 3
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY window_start ORDER BY cnt DESC, page ASC) AS rnk
    FROM agg
)
SELECT window_start, window_end, page, cnt, rnk FROM ranked WHERE rnk <= 3
"""

# ---------------------------------------------------------------------------
# order_timeout_states — J3/J4 (OrderPayTimeout.java:52-75 /
# OrderPayTimeoutWithoutCEP.java:67-152). "create" := signup, "pay" :=
# purchase, keyed by user_id; deadline widened from the reference's 15 min to
# 6 h so the sparse synthetic stream exercises all four states.
# ---------------------------------------------------------------------------

ORDER_DEADLINE = "INTERVAL 6 HOURS"


def order_timeout_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_uba_spark.operators.sequence import sequence_detect

    events = load_testdata(spark, sf_dir, ("events",))["events"]
    return sequence_detect(
        events,
        key="user_id",
        first_pred=F.col("event_type") == "signup",
        then_pred=F.col("event_type") == "purchase",
        within=ORDER_DEADLINE,
    )


ORDER_TIMEOUT_ORACLE = """
WITH a AS (
    SELECT event_id AS anchor_id, user_id, ts AS anchor_ts
    FROM events WHERE event_type = 'signup'
),
f AS (
    SELECT event_id AS follow_id, user_id, ts AS follow_ts
    FROM events WHERE event_type = 'purchase'
),
cand AS (
    SELECT a.anchor_id, f.follow_id, f.follow_ts,
           row_number() OVER (PARTITION BY a.anchor_id
                              ORDER BY f.follow_ts, f.follow_id) AS rn
    FROM a JOIN f USING (user_id)
    WHERE f.follow_ts >= a.anchor_ts
),
ff AS (SELECT anchor_id, follow_id, follow_ts FROM cand WHERE rn = 1),
anchored AS (
    SELECT a.anchor_id, ff.follow_id, a.user_id, a.anchor_ts, ff.follow_ts,
           CASE WHEN ff.follow_ts IS NULL THEN 'timeout'
                WHEN ff.follow_ts <= a.anchor_ts + INTERVAL 6 HOUR THEN 'payed'
                ELSE 'payed_late' END AS state
    FROM a LEFT JOIN ff USING (anchor_id)
),
orphans AS (
    SELECT CAST(NULL AS BIGINT) AS anchor_id, f.follow_id, f.user_id,
           CAST(NULL AS TIMESTAMP) AS anchor_ts, f.follow_ts,
           'pay_no_create' AS state
    FROM f
    WHERE NOT EXISTS (
        SELECT 1 FROM a
        WHERE a.user_id = f.user_id AND a.anchor_ts <= f.follow_ts
    )
)
SELECT * FROM anchored UNION ALL SELECT * FROM orphans
"""

# ---------------------------------------------------------------------------
# attribution_interval_join — J1 (TxPayMatchByJoin.java:60-77): for each
# purchase, the view events by the same user in the preceding 30 minutes
# (receipt.ts ∈ [pay.ts−3s, pay.ts+5s] in the reference; here the marketing
# attribution window shape).
# ---------------------------------------------------------------------------


def attribution_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_uba_spark.operators.interval_join import interval_join

    events = load_testdata(spark, sf_dir, ("events",))["events"]
    pays = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pay_id"), "user_id", F.col("ts").alias("pay_ts")
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts")
    )
    return interval_join(
        pays,
        views,
        on="user_id",
        left_ts="pay_ts",
        right_ts="view_ts",
        lower="INTERVAL 30 MINUTES",
        upper="INTERVAL 0 SECONDS",
        how="inner",
    ).select("pay_id", "view_id", "user_id", "pay_ts", "view_ts")


ATTRIBUTION_ORACLE = """
SELECT p.event_id AS pay_id, v.event_id AS view_id, p.user_id,
       p.ts AS pay_ts, v.ts AS view_ts
FROM events p
JOIN events v
  ON p.user_id = v.user_id
 AND p.event_type = 'purchase' AND v.event_type = 'view'
 AND v.ts >= p.ts - INTERVAL 30 MINUTE
 AND v.ts <= p.ts
"""

# ---------------------------------------------------------------------------
# tx_reconcile_full_outer — J2 + S7 (TxPayMatch.java:73-156): two-stream
# reconciliation as one full-outer interval join; the reference's side
# outputs (unmatched-pays / unmatched-receipts, TxPayMatch.java:33-34) are
# the null-side rows, tagged in a status column.
# ---------------------------------------------------------------------------


def tx_reconcile_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_uba_spark.operators.reconcile import reconcile

    events = load_testdata(spark, sf_dir, ("events",))["events"]
    pays = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pay_id"), "user_id", F.col("ts").alias("pay_ts")
    )
    receipts = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("receipt_id"), "user_id", F.col("ts").alias("receipt_ts")
    )
    out = reconcile(
        pays,
        receipts,
        on="user_id",
        left_ts="pay_ts",
        right_ts="receipt_ts",
        lower="INTERVAL 2 MINUTES",
        upper="INTERVAL 2 MINUTES",
        left_id="pay_id",
        right_id="receipt_id",
    )
    return out.select("pay_id", "receipt_id", "user_id", "pay_ts", "receipt_ts", "status")


TX_RECONCILE_ORACLE = """
SELECT p.pay_id, r.receipt_id, COALESCE(p.user_id, r.user_id) AS user_id,
       p.pay_ts, r.receipt_ts,
       CASE WHEN p.pay_id IS NOT NULL AND r.receipt_id IS NOT NULL THEN 'matched'
            WHEN r.receipt_id IS NULL THEN 'unmatched_left'
            ELSE 'unmatched_right' END AS status
FROM (SELECT event_id AS pay_id, user_id, ts AS pay_ts
      FROM events WHERE event_type = 'purchase') p
FULL OUTER JOIN (SELECT event_id AS receipt_id, user_id, ts AS receipt_ts
                 FROM events WHERE event_type = 'click') r
  ON p.user_id = r.user_id
 AND r.receipt_ts >= p.pay_ts - INTERVAL 2 MINUTE
 AND r.receipt_ts <= p.pay_ts + INTERVAL 2 MINUTE
"""


QUERIES = {
    "hot_items": hot_items,
    "hot_items_sql": hot_items_sql,
    "hot_pages": hot_pages,
    "order_timeout_states": order_timeout_states,
    "attribution_interval_join": attribution_interval_join,
    "tx_reconcile_full_outer": tx_reconcile_full_outer,
}

ORACLES = {
    "hot_items": HOT_ITEMS_ORACLE,
    "hot_items_sql": HOT_ITEMS_ORACLE,
    "hot_pages": HOT_PAGES_ORACLE,
    "order_timeout_states": ORDER_TIMEOUT_ORACLE,
    "attribution_interval_join": ATTRIBUTION_ORACLE,
    "tx_reconcile_full_outer": TX_RECONCILE_ORACLE,
}
