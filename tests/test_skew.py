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


def test_incremental_dedup_against_bucketed_index_corpus_never_shuffles(spark, sf_dir):
    """The production ingest shape: the corpus dedup indexes persisted ONCE
    as bucketed tables; every ingest probes them with semi-joins in which
    the corpus side has ZERO exchanges (only the small incoming batch
    shuffles to the bucket layout). Verdicts must equal the inline form."""
    import uuid

    from flink_uba_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup_verdicts,
    )

    suffix = uuid.uuid4().hex[:8]
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    incoming = docs.filter(F.col("doc_id") % 10 == 7)

    digests, band_keys = build_dedup_index(corpus)
    write_bucketed(digests, f"dd_digest_{suffix}", "__d", 8)
    write_bucketed(band_keys, f"dd_bands_{suffix}", "__bk", 8)

    # pin the sort-merge path: at test SF the tiny indexes would broadcast
    # (also exchange-free, but the bucketing claim is about the at-scale
    # shape where the corpus index exceeds any broadcast threshold)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        indexed = incremental_dedup_verdicts(
            incoming,
            corpus_index=(
                spark.table(f"dd_digest_{suffix}"),
                spark.table(f"dd_bands_{suffix}"),
            ),
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = indexed._jdf.queryExecution().explainString(mode)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # every Exchange in the plan must hash on incoming-side derivations
    # (__d probe / band probe / doc_id rollup) — none may follow a scan of
    # the bucketed index tables
    for m in re.finditer(r"^\(\d+\) Exchange[^\n]*\n(?:.+\n)*?\s*Input \[[^\]]*\]: \[([^\]]*)\]", plan, re.M):
        cols = m.group(1)
        assert f"dd_digest_{suffix}" not in cols and f"dd_bands_{suffix}" not in cols
    # structural check: the two index scans feed their joins with no
    # Exchange between scan and join
    assert plan.count("SelectedBucketsCount") >= 2

    inline = incremental_dedup_verdicts(incoming, corpus)
    a = {(r.doc_id, r.verdict) for r in indexed.collect()}
    b = {(r.doc_id, r.verdict) for r in inline.collect()}
    assert a == b and len(a) > 0
