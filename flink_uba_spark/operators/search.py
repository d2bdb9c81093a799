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


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_permille: int | None = None,
) -> DataFrame:
    """Per-document top-k keyword extraction by TF-IDF — the corpus
    primitive behind tag suggestion, topic labeling, and quality audits
    (keywords of boilerplate docs collapse to navigation chrome).

    Integer-exact scoring: ``score_q = tf * ((n_docs * 10^6) // df)`` —
    the LINEAR inverse-document-frequency family member (idf = N/df
    without the log), chosen so the score is engine-exact BIGINT
    arithmetic end-to-end (a log-idf score is rank-equivalent per doc
    whenever tf ties break the same way, but its float value is not
    hash-stable across engines; the PMI collocation operator makes the
    same trade, corpus.py collocations_pmi). ``max_df_permille`` is the
    optional stopword guard a df-cap curation pass applies (tokens with
    df·1000 > N·cap are dropped, integer-exact); the default keeps every
    token and lets the idf weight down-rank the common ones — the right
    default for narrow vocabularies, where a hard cap empties the
    output (the synthetic corpus has 31 distinct tokens, 30 of which
    appear in more than half the docs).

    Construction: one explode → (tok, doc) count (the per-doc TF), a
    token-keyed df rollup JOINED BACK on tok (both sides arrive
    tok-partitioned from the same exchange), the one-row corpus stats
    frame broadcast via crossJoin exactly as bm25_topk does (no driver
    collect), then a per-doc row_number window. Three exchanges total
    (tok, tok, doc) — all linear, no global sort, at 100 TB.

    Output: ``doc_id``, ``rnk`` 1..k, ``tok``, ``tf``, ``df``,
    ``score_q`` (ties by tok ascending — deterministic under any
    parallelism, the U2 discipline).
    """
    base = ensure_min_partitions(docs).select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    tf = base.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(dfreq, "tok").crossJoin(F.broadcast(n))
    if max_df_permille is not None:
        scored = scored.filter(
            F.col("df") * 1000 <= F.col("n_docs") * F.lit(int(max_df_permille))
        )
    scored = (
        scored
        .withColumn(
            "score_q",
            (
                F.col("tf")
                * F.expr("(n_docs * 1000000L) div df")
            ).cast("long"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_q"), F.col("tok")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "rnk", "tok", "tf", "df", "score_q")
    )
