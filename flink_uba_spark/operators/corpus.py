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

from flink_uba_spark.operators.dedup import shingle_array


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
    ev = (
        eval_docs.select(
            F.explode(F.array_distinct(shingle_array(F.col(text_col), n_shingle))).alias("sg")
        )
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    base = train_docs.select(
        id_col,
        F.array_distinct(shingle_array(F.col(text_col), n_shingle)).alias("__sh"),
    )
    postings = base.select(id_col, F.explode("__sh").alias("sg"))
    shared = (
        postings.join(ev, "sg", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        base.select(id_col, F.size("__sh").cast("long").alias("n_shingles"))
        .join(shared, id_col, "left")
        .withColumn("n_shared", F.coalesce(F.col("n_shared"), F.lit(0)).cast("long"))
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
    toks = F.split(F.col(text_col), " ")
    base = df.select(
        id_col,
        F.size(toks).cast("long").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_words"),
        toks.alias("__w"),
    )

    def _mode_count(col, out_name):
        exploded = base.select(id_col, F.explode(col).alias("g"))
        return (
            exploded.groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(id_col)
            .agg(F.max("c").cast("long").alias(out_name))
        )

    top_word = _mode_count(F.col("__w"), "top_word_count")
    top_bigram = _mode_count(
        shingle_array(F.concat_ws(" ", F.col("__w")), 2), "top_bigram_count"
    )
    out = (
        base.drop("__w")
        .join(top_word, id_col)
        .join(top_bigram, id_col)
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
