"""Corpus-preparation operators for LLM training-data pipelines:
benchmark decontamination, repetition-based quality signals (Gopher-style),
token-budget sequence packing, and overlapping chunking.

North-star extensions (BASELINE.json) — no counterpart in the reference
(its P-family is scalar parse/filter only, SURVEY.md §2.2); these are the
stages a 100 TB curation pipeline runs between dedup and tokenization.

Scale design:
- Decontamination joins the TRAIN postings against the (small) eval-set
  shingle vocabulary — broadcast by default because benchmark suites are
  MBs, not TBs; the train side streams through the scan, one map-side
  semi-join + one exchange on doc_id for the per-doc rollup.
- Repetition signals are explode → partial-agg pipelines keyed on doc_id:
  Catalyst plans map-side combine, so the exchange carries one row per
  (doc, token), bounded by document length, never by corpus size.
- Sequence packing needs a GLOBAL running offset — the one operator here
  that is order-sensitive. It uses the classic two-level distributed
  prefix sum: per-block subtotals (one exchange), a tiny cumsum over
  block subtotals (single-partition window over #blocks ≈ N/block_size
  rows — thousands, not billions), then a within-block window. No global
  sort of the data ever happens.
- Chunking is a pure per-row explode (sequence + slice on the token
  array) — fuses into the scan, output size is the only cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark.sql import Column

from flink_uba_spark.operators.util import ensure_min_partitions


def _h60(col: Column) -> Column:
    """60-bit integer hash: first 15 hex digits of md5 — exact BIGINT on
    every engine, collision odds ~2⁻⁶⁰ per pair (immaterial)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingle_hash_array(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as exact integer hashes: one md5 per TOKEN
    (60-bit base reduced mod 2³¹−1), then an affine combine with the
    frozen NGRAM_C constants — no per-shingle string building, and no
    final mod, so the combined value stays < 2⁶¹ (exact 64-bit on every
    engine) and the effective hash space is ~2⁶¹ (collisions negligible,
    unlike a mod-2³¹ reduction). Measured 4× faster than string shingles
    for the explode pass at sf0.1 (0.6 s vs 2.3 s warm).

    Docs shorter than ``n`` words fall back to one whole-text 60-bit hash.
    """
    from flink_uba_spark.functions.hashing import MERSENNE31, NGRAM_C

    if n not in (2, 3):
        raise ValueError("shingle_hash_array supports n in (2, 3) (NGRAM_C arity)")
    toks = F.split(text, " ")
    th = F.transform(toks, lambda t: _h60(t) % MERSENNE31)
    combine = {
        2: lambda w, i: F.element_at(w, i) * NGRAM_C[0]
        + F.element_at(w, i + 1) * NGRAM_C[1],
        3: lambda w, i: F.element_at(w, i) * NGRAM_C[0]
        + F.element_at(w, i + 1) * NGRAM_C[1]
        + F.element_at(w, i + 2) * NGRAM_C[2],
    }[n]

    # Bind the token-hash array ONCE per row via a one-element-array
    # transform's lambda scope: referencing `th` directly from the combine
    # lambda inlines the whole token-md5 transform into EVERY element_at —
    # Catalyst re-evaluates it per shingle per term (measured 70 s vs
    # 0.6 s at sf0.1). A lambda variable is materialized before the body
    # runs, so the inner transform sees a computed array.
    def _body(thv: Column) -> Column:
        return F.when(
            F.size(thv) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(thv) - (n - 1)), lambda i: combine(thv, i)
            ),
        ).otherwise(F.array(_h60(text)))

    return F.element_at(F.transform(F.array(th), _body), 1)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------
def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
    min_shared: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag training documents that overlap an evaluation/benchmark set.

    The standard n-gram decontamination rule (as published for GPT-3 /
    PaLM / Llama data work): a train doc is contaminated when at least
    ``min_shared`` of its distinct word ``n_shingle``-grams appear
    anywhere in the eval corpus.

    Returns one row per train doc: ``n_shingles`` (distinct), ``n_shared``
    (distinct shingles also present in eval), ``contaminated``.

    Eval vocabularies are small (a benchmark suite is MBs); with
    ``broadcast_eval`` the shingle set ships to every executor and the
    train side never shuffles for the probe — only the per-doc rollup
    exchanges, keyed on doc_id (unskewed by construction).
    """
    # Shingles travel as exact ~2⁶¹-space integer hashes (shingle_hash_array)
    # — 4× faster than string shingles and the oracle still checks TRUE
    # string semantics: hashed overlap counts equal string overlap counts
    # unless a collision occurs (~2⁻⁶¹ per pair), so the string-based
    # oracle doubles as a collision canary.
    # explode_outer + null filter (not explode): InferFiltersFromGenerate
    # would re-evaluate the interpreted shingle lambdas 3× at the scan
    # (the dedup.py lesson); the arrays are never null/empty.
    ev = (
        eval_docs.select(
            F.explode_outer(
                F.array_distinct(shingle_hash_array(F.col(text_col), n_shingle))
            ).alias("sg")
        )
        .filter(F.col("sg").isNotNull())
        .distinct()
        .withColumn("__hit", F.lit(1).cast("long"))
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    # single pass over train: explode the per-doc distinct shingles WITH the
    # doc's shingle count riding along, probe the broadcast vocabulary as a
    # left join (hit marker), roll up once on doc_id. One scan, one
    # exchange — no postings semi-join + join-back (measured 10 s → ~2 s
    # at sf0.1; the join-back formulation scanned the corpus twice and
    # recomputed the shingle lambdas both times).
    postings = (
        ensure_min_partitions(train_docs).select(
            id_col,
            F.array_distinct(shingle_hash_array(F.col(text_col), n_shingle)).alias("__sh"),
        )
        .select(
            id_col,
            F.size("__sh").cast("long").alias("n_shingles"),
            F.explode_outer("__sh").alias("sg"),
        )
        .filter(F.col("sg").isNotNull())
    )
    return (
        postings.join(ev, "sg", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_shared"),
        )
        .withColumn("contaminated", F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# repetition / Gopher-style quality signals
# ---------------------------------------------------------------------------
def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_word_ratio: float = 0.2,
    max_dup_word_ratio: float = 0.5,
) -> DataFrame:
    """Repetition metrics behind the Gopher/MassiveText repetition rules:

    - ``dup_word_ratio``: fraction of word occurrences beyond each word's
      first (1 − distinct/total) — catches boilerplate and keyword spam.
    - ``top_word_ratio``: share of the single most frequent word.
    - ``top_bigram_ratio``: share of the most frequent word bigram.
    - ``repetitive``: either ratio beyond its threshold.

    Distinct/total are per-row array expressions; the two mode counts
    (word, bigram) are explode → count → max pipelines keyed on doc_id
    with map-side partial aggregation, joined back on doc_id.
    """
    # ONE scan, ONE explode, TWO exchanges, ZERO joins: words and bigrams
    # are concatenated into a single tagged array of integer keys — words
    # as NEGATIVE 60-bit hashes (−h−1), bigrams as positive combined
    # hashes (shingle_hash_array) — so one (doc, key) rollup feeds a
    # conditional final aggregate that recovers every metric: n_words /
    # n_distinct as sums/counts of the negative-key groups, the two mode
    # counts as sign-conditional maxes. (The separate words-pipeline +
    # bigrams-pipeline + 3-way join form measured 6.4 s at sf0.1; the
    # string-keyed single-pass ~2.7 s; this integer-keyed shape ~1.5 s.
    # Hash collisions would perturb counts at ~2⁻⁶⁰ odds per pair; the
    # string-semantics oracle doubles as the collision canary.)
    toks = F.split(F.col(text_col), " ")
    tagged = F.concat(
        F.transform(toks, lambda t: -_h60(t) - 1),
        shingle_hash_array(F.col(text_col), 2),
    )
    is_w = F.col("g") < 0
    out = (
        ensure_min_partitions(df).select(id_col, F.explode_outer(tagged).alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum(F.when(is_w, F.col("c"))).cast("long").alias("n_words"),
            F.count(F.when(is_w, F.lit(1))).cast("long").alias("n_distinct_words"),
            F.max(F.when(is_w, F.col("c"))).cast("long").alias("top_word_count"),
            F.max(F.when(~is_w, F.col("c"))).cast("long").alias("top_bigram_count"),
        )
        .withColumn(
            "dup_word_ratio",
            (F.col("n_words") - F.col("n_distinct_words")).cast("double") / F.col("n_words"),
        )
        .withColumn("top_word_ratio", F.col("top_word_count").cast("double") / F.col("n_words"))
        .withColumn(
            "top_bigram_ratio", F.col("top_bigram_count").cast("double") / F.col("n_words")
        )
    )
    return out.withColumn(
        "repetitive",
        (F.col("top_word_ratio") > max_top_word_ratio)
        | (F.col("dup_word_ratio") > max_dup_word_ratio),
    )


# ---------------------------------------------------------------------------
# LM-based quality scoring (CCNet-style)
# ---------------------------------------------------------------------------
def lm_bigram_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style language-model quality signal: an add-one-smoothed
    bigram model is fit on the corpus ITSELF, and every document is
    scored by the mean quantized conditional probability of its bigrams —
    high scores read like the corpus, low scores flag gibberish and
    boilerplate (the filtering role LM perplexity plays in CCNet/CCNet-
    descended pipelines; the probability-domain mean replaces log-domain
    perplexity to stay in exact integer/rational arithmetic — it induces
    a usable quality ordering without cross-engine ln() drift).

    Per-bigram: q = floor(1e6 · (c(w1,w2) + 1) / (c(w1) + V)). Output:
    ``n_bigrams`` and ``lm_score`` = Σq / n_bigrams (NULL for docs under
    two words). Tokens/bigrams travel as integer hashes (the canary
    pattern: the string-semantics oracle catches any collision).

    Scale: two stats rollups (bigram counts, unigram counts) keyed on
    uniform hashes, then two probe joins and one doc_id rollup. The stats
    tables are vocabulary-sized — bounded, broadcast-able at real scale —
    and every explode carries one row per token occurrence, the same
    envelope as the rest of the text family.
    """
    from flink_uba_spark.functions.hashing import MERSENNE31, NGRAM_C

    base = df.select(id_col, F.split(F.col(text_col), " ").alias("__w")).withColumn(
        "__th", F.transform(F.col("__w"), lambda t: _h60(t))
    )
    n = F.size("__th")
    bg = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(F.col("__th"), i).alias("w1h"),
                (
                    (F.element_at(F.col("__th"), i) % MERSENNE31) * NGRAM_C[0]
                    + (F.element_at(F.col("__th"), i + 1) % MERSENNE31) * NGRAM_C[1]
                ).alias("bh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1h:bigint,bh:bigint>>"))
    ex = (
        base.withColumn("__bg", bg)
        .select(id_col, F.explode_outer("__bg").alias("g"))
        .select(id_col, F.col("g.w1h").alias("w1h"), F.col("g.bh").alias("bh"))
    )
    uni = (
        base.select(F.explode_outer("__th").alias("th"))
        .filter(F.col("th").isNotNull())
        .groupBy("th")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bigc = (
        ex.filter(F.col("bh").isNotNull())
        .groupBy("bh")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    v = uni.agg(F.count(F.lit(1)).alias("v"))
    q = F.floor(
        F.lit(1000000.0) * (F.col("c12") + 1) / (F.col("c1") + F.col("v"))
    ).cast("long")
    per_doc = (
        ex.filter(F.col("bh").isNotNull())
        .join(bigc, "bh")
        .join(uni, F.col("w1h") == F.col("th"))
        .crossJoin(F.broadcast(v))
        .withColumn("q", q)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("q").alias("__sq"))
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            (F.col("__sq").cast("double") / F.col("n_bigrams")).alias("lm_score"),
        )
    )


# ---------------------------------------------------------------------------
# token-budget sequence packing (concatenate-and-chunk)
# ---------------------------------------------------------------------------
def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    block_size: int = 4096,
) -> DataFrame:
    """Assign each doc its byte... token offset in the concatenated corpus
    stream (ordered by ``id_col``) and the training pack it lands in:
    ``global_offset``, ``pack_id`` = offset ÷ capacity, ``pack_pos`` =
    offset mod capacity. This is concatenate-and-chunk packing — the
    standard way training sequences are cut from a curated corpus; a doc
    crossing a pack boundary spans packs, exactly as the tokenizer-side
    packer would see it.

    The global running sum is computed as a two-level distributed prefix
    sum (see module docstring): no single-partition pass ever touches the
    full data, only the #blocks subtotal rows. Deterministic for any
    partitioning because the order key is the id, not arrival order.
    """
    # integer `div`, not double `/`+cast: exact for ids beyond 2^53
    blk = F.expr(f"`{id_col}` div {block_size}").alias("__blk")
    base = df.select(id_col, F.col(tokens_col).cast("long").alias("__t"), blk)
    block_tot = base.groupBy("__blk").agg(F.sum("__t").alias("__bt"))
    w_blocks = Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
    block_off = block_tot.select(
        "__blk", F.coalesce(F.sum("__bt").over(w_blocks), F.lit(0)).alias("__boff")
    )
    w_in = (
        Window.partitionBy("__blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        base.join(F.broadcast(block_off), "__blk")
        .withColumn(
            "global_offset",
            F.col("__boff") + F.coalesce(F.sum("__t").over(w_in), F.lit(0)),
        )
        .select(
            id_col,
            F.col("__t").alias(tokens_col),
            "global_offset",
            F.expr(f"global_offset div {capacity}").alias("pack_id"),
            (F.col("global_offset") % capacity).alias("pack_pos"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# overlapping chunking
# ---------------------------------------------------------------------------
def chunk_text(
    df: DataFrame,
    chunk_words: int = 32,
    stride_words: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping word windows of
    ``chunk_words`` every ``stride_words`` (the RAG / long-context
    pre-processing step). A doc with ≤ chunk_words words yields one chunk;
    otherwise chunks start at 0, stride, 2·stride, … and the last chunk
    (possibly shorter) covers the tail. Pure per-row explode — sequence +
    slice over the split array, entirely JVM-side.
    """
    if stride_words <= 0 or chunk_words <= 0:
        raise ValueError("chunk_words and stride_words must be positive")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # smallest n_chunks with (n_chunks-1)*stride + chunk >= n: 1 + ceil((n-chunk)/stride)
    n_chunks = F.when(n <= chunk_words, F.lit(1)).otherwise(
        F.lit(1) + ((n - chunk_words + stride_words - 1) / stride_words).cast("int")
    )
    return (
        df.select(
            id_col,
            toks.alias("__w"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.slice(
                F.col("__w"), F.col("chunk_idx") * stride_words + 1, chunk_words
            ).alias("__cw"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("__cw").cast("long").alias("n_chunk_words"),
            F.concat_ws(" ", F.col("__cw")).alias("chunk_text"),
        )
    )


# ---------------------------------------------------------------------------
# per-source curation rollup — the domain-level keep/drop decision
# ---------------------------------------------------------------------------


def source_curation_rollup(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_high_share_permille: int = 300,
    max_dup_permille: int = 500,
) -> DataFrame:
    """Domain/source-level curation verdicts — the CCNet/RefinedWeb-style
    stage that decides whether a whole SOURCE (domain, crawl segment,
    feed) is worth keeping, from per-doc quality + duplication evidence
    rolled up per source. Output, one row per source: doc counts, exact
    duplicate share, aggregate token/stopword mass, high-quality share,
    and a deterministic ``keep`` verdict.

    All ratios divide exact integer sums (no double accumulation — float
    sums are partition-order-dependent; integer sums are not), so values
    are bit-identical across engines and executor counts. Thresholds are
    permille integers for the same reason.

    Scale shape: one exchange on the md5 text digest (the exact-dup
    window, shared with exact_dedup's plan), then one exchange to the
    per-source partial agg. Source cardinality is tiny next to doc count,
    and map-side combine reduces each partition to |sources| rows before
    the final exchange, so the 20-group (or 20k-group) reducer side sees
    kilobytes regardless of corpus size.
    """
    from flink_uba_spark.operators import text as TX

    q = TX.quality_score(df, text_col=text_col)
    w = Window.partitionBy(F.md5(F.col(text_col)))
    q = q.withColumn("__is_dup", F.col(id_col) != F.min(id_col).over(w))
    agg = q.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("__is_dup").cast("long")).alias("n_dup_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_stop").alias("total_stop"),
        F.sum((F.col("quality") == "high").cast("long")).alias("n_high"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_dup_docs",
        (F.col("n_dup_docs").cast("double") / F.col("n_docs")).alias("dup_rate"),
        "total_words",
        (F.col("total_stop").cast("double") / F.col("total_words")).alias("stop_ratio"),
        (F.col("n_high").cast("double") / F.col("n_docs")).alias("high_share"),
        (
            (F.col("n_high") * 1000 >= F.lit(min_high_share_permille) * F.col("n_docs"))
            & (F.col("n_dup_docs") * 1000 <= F.lit(max_dup_permille) * F.col("n_docs"))
        ).alias("keep"),
    )


def collocations_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
    scale: int = 1_000_000,
) -> DataFrame:
    """Corpus-level collocation mining (round 6): the top-k adjacent-token
    bigrams by pointwise mutual information — the statistic behind
    multiword-expression discovery and tokenizer-merge auditing (the
    corpus-analysis sibling of BPE's pair counting, which ranks by raw
    frequency instead).

    Determinism contract: PMI = log p(xy)/(p(x)p(y)) is rank-equivalent
    to the INTEGER ratio ``c_xy * scale * N // (c_x * c_y)`` (log is
    monotone; N = total tokens), so the score stays engine-exact — no
    floats, no order-dependent sums — and an oracle can replay it
    verbatim. Ties break (score desc, w1, w2). ``min_count`` floors
    c_xy (PMI's low-count pathology). int64 bound: c_xy·scale·N must
    stay under 2^63 — at web scale drop ``scale`` a few decades or
    pre-divide N; the expression is the contract, the constant is not.

    Shape: one corpus scan explodes bigrams (per-row transform over the
    token array — no self-join), ONE hash aggregate each for bigram and
    unigram counts, then two BROADCAST joins of the vocab-sized unigram
    table onto the bigram counts and a broadcast-scalar N; top-k is
    TakeOrderedAndProject, never a global sort. At 100 TB: corpus-sized
    work is the two scans; everything after is vocabulary-sized.
    """
    from pyspark.sql import Window

    toks = df.select(F.split(F.col(text_col), " ").alias("__t"))
    uni = (
        toks.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    n_total = uni.agg(F.sum("n_w").alias("n_tokens"))
    bi = (
        toks.select(
            F.explode(
                F.when(
                    F.size("__t") >= 2,
                    F.expr(
                        "transform(sequence(0, size(__t) - 2), "
                        "i -> struct(__t[i] AS w1, __t[i + 1] AS w2))"
                    ),
                ).otherwise(F.array())
            ).alias("b")
        )
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= min_count)
    )
    scored = (
        bi.join(F.broadcast(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_x"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_y"))), "w2")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "pmi_score",
            F.expr(f"n_xy * CAST({scale} AS BIGINT) * n_tokens div (n_x * n_y)"),
        )
    )
    top = scored.orderBy(
        F.desc("pmi_score"), "w1", "w2"
    ).limit(top_k)
    w = Window.orderBy(F.desc("pmi_score"), "w1", "w2")
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        "w1", "w2", "n_xy", "n_x", "n_y", "pmi_score", "rnk"
    )
