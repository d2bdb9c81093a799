"""Iterative graph scoring — weighted PageRank in exact integer arithmetic.

The UBA suite's graph side: the reference's page/item domain (HotItem.java,
HotPages.java) ranks by raw counts; PageRank over the co-view graph is the
importance measure that survives popularity laundering (an item visited
from many distinct hubs outranks one hammered by a single loop). The same
operator scores any weighted digraph (doc citation/link graphs for corpus
curation — the classic quality prior).

Determinism contract (the repo-wide rule): every iteration is pure BIGINT
arithmetic — per-source integer division ``score div out_weight`` followed
by integer edge-weight multiplies and integer sums (order-independent),
then ``(damping·contrib) div 1000``. No floats anywhere, so Spark and a
DuckDB recursive CTE agree bit-for-bit at any partitioning, and a FIXED
iteration count (no convergence test) keeps both engines on the same
trajectory. Quantization error vs real PageRank is ≤ out_degree ulps per
node per round at scale 10^6 — noise for ranking, exactness for hashing.

Scale: the loop is driver-side control only; each iteration is ONE shuffle
(edges ⋈ scores on src, then a dst rollup — the standard Pregel-on-Spark
formulation, same class as dedup.connected_components). Edges and the
degree table are checkpointed once; per-round localCheckpoint truncates
lineage so the plan stays O(1) across iterations. Dangling mass is dropped
(simplified PageRank), documented rather than redistributed — the variant
most link-spam pipelines run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 10,
    damping_permille: int = 850,
) -> DataFrame:
    """Weighted PageRank over ``edges`` (one row per (src, dst) with a
    positive integer ``weight``); returns (node, score) with score the
    scaled-integer rank after ``iters`` synchronous iterations.

    s_i(0) = SCALE for every node;
    s_i(t+1) = (1000−d)·SCALE/1000 + (d · Σ_j w_ji·(s_j(t) div outw_j)) div 1000
    """
    base = ((1000 - damping_permille) * SCALE) // 1000

    # materialize the (possibly expensive) edge derivation ONCE; everything
    # downstream re-reads the checkpointed blocks
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(weight).cast("long").alias("w"),
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # zero-weight self-edges keep every node (incl. dangling/sink-only) in
    # the per-iteration rollup without a left join — same trick the oracle
    # CTE uses, so both plans stay a single join+rollup per round. The
    # (ow)-joined form is precomputed so the loop body is ONE join.
    e_div = (
        e.join(e.groupBy("src").agg(F.sum("w").alias("ow")), "src")
        .unionByName(
            nodes.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0).cast("long").alias("w"),
                F.lit(1).cast("long").alias("ow"),
            )
        )
        .localCheckpoint(eager=True)
    )

    scores = nodes.select("node", F.lit(SCALE).cast("long").alias("score"))
    for i in range(iters):
        contrib = (
            e_div.join(scores, e_div.src == scores.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("w * (score div ow)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        scores = contrib.select(
            "node",
            (F.lit(base) + F.expr(f"({damping_permille} * contrib) div 1000"))
            .cast("long")
            .alias("score"),
        )
        # truncate lineage every few rounds (linear join chain, not
        # exponential — a shallow chain plans fine; a barrier per round
        # costs more than it saves on real clusters)
        if (i + 1) % 3 == 0 and i + 1 < iters:
            scores = scores.localCheckpoint(eager=True)
    return scores


def coview_edges(
    events: DataFrame,
    item_expr,
    gap: str = "INTERVAL 30 MINUTES",
    key: str = "user_id",
) -> DataFrame:
    """Co-view item transition edges: consecutive view-item pairs per user
    within ``gap`` (the event_transition_matrix recurrence, item-granular).
    One lag window on the user key (high-cardinality, skew-free), then the
    (src,dst) rollup — ≤ items² rows out of the second exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy("ts", "event_id")
    pairs = (
        events.select(F.col(key).alias(key), "ts", "event_id", item_expr.alias("item"))
        .withColumn("prev_item", F.lag("item").over(w))
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(
            F.col("prev_item").isNotNull()
            & (F.col("ts") <= F.col("prev_ts") + F.expr(gap))
            & (F.col("prev_item") != F.col("item"))
        )
    )
    return pairs.groupBy(
        F.col("prev_item").alias("src"), F.col("item").alias("dst")
    ).agg(F.count(F.lit(1)).alias("w"))
