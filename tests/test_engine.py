"""Facade: the three entry styles converge on the same answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_uba_spark.engine import UbaEngine


def test_three_entry_styles_agree(spark, sf_dir):
    eng = UbaEngine(spark).register(sf_dir)
    # style A: operator library on a typed frame
    ev = eng.load(sf_dir, ("events",))["events"]
    views = ev.filter(F.col("event_type") == "view").select(
        F.get_json_object("props", "$.k").cast("long").alias("item_id"), "ts"
    )
    a = eng.hot_keys(views, "item_id", n=5).count()
    # style B: the named catalog
    b = eng.query("hot_items", sf_dir).count()
    # style C: raw SQL over registered views
    c = eng.sql(
        """
        SELECT count(*) AS n FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                         ORDER BY cnt DESC, item_id) AS rnk
            FROM (
                SELECT window(ts, '1 hour', '5 minutes').start AS window_start,
                       CAST(get_json_object(props, '$.k') AS BIGINT) AS item_id,
                       count(*) AS cnt
                FROM events WHERE event_type = 'view' GROUP BY 1, 2
            )
        ) WHERE rnk <= 5
        """
    ).collect()[0].n
    assert a == b == c


def test_catalog_lists_all_queries(spark):
    eng = UbaEngine(spark)
    names = eng.catalog()
    assert "hot_items" in names and "dedup_minhash_lsh" in names
    assert len(names) >= 35
