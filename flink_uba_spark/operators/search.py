"""Lexical (keyword) search over the document corpus: BM25 top-k.

The sparse-retrieval complement to the dense operators in similarity.py —
a training-data pipeline uses this for targeted corpus probes ("find the
docs about X") and for building retrieval training sets.

Scale design: term-frequency postings are an explode → partial-agg
pipeline keyed on (doc, term) — map-side combine bounds the exchange by
the number of DISTINCT (doc, matched-term) pairs, not token count. The
query-term list and per-term document frequencies are tiny and broadcast;
the corpus-level scalars (N, avgdl) ride along as a broadcast single-row
cross join. One exchange for the postings rollup, one for the final
score rollup (same doc_id key), one tiny top-k window.

Cross-engine determinism: scores are quantized to integers BEFORE the
order-sensitive SUM. Each per-term partial score is a fixed-shape double
expression using only +, −, ×, ÷ (every op correctly rounded by IEEE 754,
so Spark and DuckDB produce bit-identical doubles), then floored to a
BIGINT at 1e6 scale; summing integers is associative, so the total is
exact no matter the aggregation order. The usual ln() idf is replaced by
its rational core (N − df + ½)/(df + ½) — ln is NOT correctly rounded and
is the one BM25 ingredient that can drift across engines; the rational
form preserves the idf ordering (ln is monotone), keeps rare terms
up-weighted, and stays bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_uba_spark.operators.util import ensure_min_partitions

SCORE_SCALE = 1_000_000


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs for a bag-of-words query under quantized BM25.

    Returns ``doc_id``, per-doc ``score_q`` (Σ floor(idf·tf_norm·1e6),
    BIGINT), and dense ``rnk`` 1..k (ties broken by doc_id — deterministic
    under any parallelism, the U2 discipline).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = F.split(F.col(text_col), " ")
    base = ensure_min_partitions(docs).select(id_col, toks.alias("__w")).withColumn(
        "dl", F.size("__w").cast("long")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).withColumn("avgdl", F.col("sum_dl").cast("double") / F.col("n_docs"))

    hits = base.select(id_col, "dl", F.explode("__w").alias("term")).filter(
        F.col("term").isin(*terms)
    )
    tf = hits.groupBy(id_col, "term", "dl").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    # fixed-shape double expression — mirror the oracle SQL token-for-token
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    term_q = F.floor(idf * tf_norm * SCORE_SCALE).cast("long")
    per_doc = (
        scored.withColumn("term_q", term_q)
        .groupBy(id_col)
        .agg(F.sum("term_q").alias("score_q"))
    )
    # TakeOrderedAndProject first (per-partition top-k, k rows to the
    # driver-side heap — never a single-partition global sort), THEN the
    # rank window runs over only k rows.
    topk = per_doc.orderBy(F.desc("score_q"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("score_q"), F.col(id_col))
    return topk.withColumn("rnk", F.row_number().over(w)).select(
        id_col, "score_q", "rnk"
    )


def rrf_fuse(
    ranked: "list[DataFrame]",
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (the standard
    hybrid-retrieval combiner): score = Σ 1/(c+rank) over the lists that
    contain the doc, then re-rank. Output: (id, score_rrf, rnk ≤ k).

    Determinism: each term is one IEEE double division of exact integers
    and the terms are added in fixed left-to-right order, so scores are
    bit-identical across engines; ties break on id.

    Scale shape: inputs are top-k lists — already reduced to O(k) rows by
    the upstream retrievers (BM25 TakeOrderedAndProject, cosine top-k
    window), so the full-outer fusion join and the single global
    row_number window run over ≤ N·k rows regardless of corpus size. The
    fusion layer is cheap BY CONSTRUCTION; all heavy lifting stays in the
    retrievers.
    """
    if not ranked:
        raise ValueError("ranked must be non-empty")
    out = None
    for i, df in enumerate(ranked):
        side = df.select(F.col(id_col), F.col(rank_col).alias(f"__r{i}"))
        out = side if out is None else out.join(side, id_col, "full_outer")
    terms = [
        F.coalesce(F.lit(1.0) / (F.lit(float(c)) + F.col(f"__r{i}")), F.lit(0.0))
        for i in range(len(ranked))
    ]
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    w = Window.orderBy(F.desc("score_rrf"), F.asc(id_col))
    return (
        out.withColumn("score_rrf", score)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "score_rrf", "rnk")
    )
