"""Skew/co-location tools: salted-join equivalence and exchange-free
bucketed joins."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from flink_uba_spark.operators.skew import salted_join, write_bucketed
from flink_uba_spark.sources.readers import load_testdata


def test_salted_join_equals_plain_join(spark, sf_dir):
    t = load_testdata(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].select("l_orderkey", "l_partkey", "l_quantity")
    part = t["part"].select(F.col("p_partkey").alias("l_partkey"), "p_type")
    plain = li.join(part, on="l_partkey").groupBy("p_type").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q")
    )
    salted = salted_join(li, part, on="l_partkey", salt=8).groupBy("p_type").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q")
    )
    a = {(r.p_type, r.q) for r in plain.collect()}
    b = {(r.p_type, r.q) for r in salted.collect()}
    assert a == b


def test_salted_join_spreads_hot_key(spark):
    """A degenerate all-one-key frame must spread across salt partitions."""
    hot = spark.range(10_000).select(F.lit(7).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(7, "x")], "k long, v string")
    out = salted_join(hot, dim, on="k", salt=8)
    assert out.count() == 10_000
    salts = (
        hot.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
        .select("__salt").distinct().count()
    )
    assert salts == 8  # the hot key occupies every salt bucket


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Tables bucketed on the join key join with ZERO exchanges — the
    co-location strategy for repeatedly-joined 100 TB facts."""
    import uuid

    # unique names: the /tmp warehouse outlives the in-memory catalog, so a
    # reused table name hits LOCATION_ALREADY_EXISTS in a fresh session
    suffix = uuid.uuid4().hex[:8]
    t = load_testdata(spark, sf_dir, ("orders", "lineitem"))
    write_bucketed(
        t["orders"].select("o_orderkey", "o_totalprice"), f"b_orders_{suffix}", "o_orderkey", 8
    )
    write_bucketed(
        t["lineitem"].select("l_orderkey", "l_quantity"), f"b_lineitem_{suffix}", "l_orderkey", 8
    )
    joined = spark.table(f"b_lineitem_{suffix}").join(
        spark.table(f"b_orders_{suffix}"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = joined._jdf.queryExecution().explainString(mode)
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 0
    assert joined.count() == t["lineitem"].count()
