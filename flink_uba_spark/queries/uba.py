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
    return spark.sql(
        f"""
        SELECT window_start, window_end, item_id, cnt, CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                         ORDER BY cnt DESC, item_id ASC) AS rnk
            FROM (
                SELECT window(ts, '1 hour', '5 minutes').start AS window_start,
                       window(ts, '1 hour', '5 minutes').end   AS window_end,
                       CAST(get_json_object(props, '$.k') AS BIGINT) AS item_id,
                       count(*) AS cnt
                FROM events
                WHERE event_type = 'view'
                GROUP BY 1, 2, 3
            )
        )
        WHERE rnk <= {TOP_N}
        """
    )


QUERIES = {
    "hot_items": hot_items,
    "hot_items_sql": hot_items_sql,
}

ORACLES = {
    "hot_items": HOT_ITEMS_ORACLE,
    "hot_items_sql": HOT_ITEMS_ORACLE,
}
