"""Deduplication family for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard (embedding near-dup lives in similarity.py).

North-star extensions (BASELINE.json) — not present in the reference, but
first-class operators of this engine.

Scale design (the part that matters at 100 TB):
- Signatures (minhash / simhash / fingerprints) are **pure per-row
  projections** over the token array using JVM higher-order functions —
  no explode, no groupBy, no Python. A document's signature costs O(len)
  inside whole-stage codegen, fused onto the scan.
- The only shuffles are the ones information-theoretically required:
  one hash exchange on the signature/band key to bring candidates
  together. LSH banding turns the O(n²) all-pairs problem into
  |bucket|²-bounded local joins; band keys are md5 strings, uniformly
  distributed, so the exchange has no skew by construction.
- Cross-engine determinism: every hash is md5 (identical hex output in
  Spark and DuckDB); min-hash is the lexicographic min of md5 hex strings,
  a valid uniform min-wise hash with no engine-specific integer hashing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_uba_spark.operators.util import ensure_min_partitions

# ---------------------------------------------------------------------------
# exact dedup — hash-groupBy on content digest
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Canonical-id assignment: every doc maps to min(id) among docs with
    identical content. ``is_dup`` marks the rows a pipeline would drop.

    One exchange on the 128-bit digest; group sizes are duplicate-cluster
    sizes, never skewed beyond the true duplicate multiplicity.
    """
    from pyspark.sql import Window

    h = F.md5(F.col(text_col))
    w = Window.partitionBy("text_md5")
    return (
        df.withColumn("text_md5", h)
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_dup", (F.col(id_col) != F.col("canonical_id")))
        .select(id_col, "text_md5", "canonical_id", "is_dup")
    )


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH banding
# ---------------------------------------------------------------------------


def shingle_array(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (whole text when shorter)."""
    toks = F.split(text, " ")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def _token_hash(col: Column) -> Column:
    """md5(token) → 60-bit int → mod 2³¹−1 — the shared base hash (exact
    hex-string parity with DuckDB's ('0x'||substring(md5(t),1,15)) form)."""
    from flink_uba_spark.functions.hashing import MERSENNE31

    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % MERSENNE31


def shingle_hash_expr(th_col: Column, text_col: Column, n_shingle: int = 3) -> Column:
    """array<long> of word-n-gram hashes from a token-hash array: hash each
    TOKEN once (``_token_hash``), combine per shingle arithmetically — no
    per-shingle string building, n_shingle× fewer md5 calls than hashing
    joined shingle strings. ``n_shingle`` ∈ (2, 3), the NGRAM_C arity
    (corpus.shingle_hash_array supports the same range). Docs shorter than
    the shingle fall back to one whole-text hash. Shared by
    minhash_signature and ngram_jaccard_pairs (and mirrored
    token-for-token in their DuckDB oracles)."""
    from flink_uba_spark.functions.hashing import MERSENNE31, NGRAM_C

    if n_shingle not in (2, 3):
        raise ValueError("shingle_hash_expr supports n_shingle in (2, 3) (NGRAM_C arity)")
    return F.when(
        F.size(th_col) >= n_shingle,
        F.transform(
            F.sequence(F.lit(1), F.size(th_col) - (n_shingle - 1)),
            lambda i: sum(
                F.element_at(th_col, i + j) * NGRAM_C[j] for j in range(n_shingle)
            )
            % MERSENNE31,
        ),
    ).otherwise(F.array(_token_hash(text_col)))


def minhash_signature(
    df: DataFrame, text_col: str = "text", n_shingle: int = 3, num_perm: int = 9
) -> DataFrame:
    """Adds ``mh``: array<long> of num_perm min-hashes.

    One md5 per shingle (base hash = first 15 hex digits as a 60-bit int,
    then reduced mod 2³¹−1); each permutation is a cheap affine map
    h ↦ (a·h+b) mod 2³¹−1 with fixed md5-derived constants
    (functions.hashing.minhash_perm_constants). All integer arithmetic —
    exact on both engines — and ~num_perm× fewer md5 calls than hashing
    per permutation. Per-row, shuffle-free."""
    from flink_uba_spark.functions.hashing import (
        MERSENNE31,
        minhash_perm_constants,
    )

    toks = F.split(F.col(text_col), " ")
    with_th = df.withColumn("__th", F.transform(toks, _token_hash))
    sh_hash = shingle_hash_expr(F.col("__th"), F.col(text_col), n_shingle)
    with_base = with_th.withColumn("__sh_hash", sh_hash).drop("__th")
    mh = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("__sh_hash"), lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE31
                )
            )
            for a, b in minhash_perm_constants(num_perm)
        ]
    )
    return with_base.withColumn("mh", mh).drop("__sh_hash")


def lsh_band_keys(df: DataFrame, bands: int = 3, rows_per_band: int = 3) -> DataFrame:
    """Explode the signature into (band_idx, band_key) rows; docs sharing a
    band key are near-dup candidates (standard banding: b bands of r rows,
    collision prob ≈ 1-(1-j^r)^b for Jaccard j)."""
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.array_join(
                F.transform(
                    F.slice(F.col("mh"), b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
                "|",
            )
        ),
    )
    # posexplode_outer: plain posexplode lets Catalyst infer null/size
    # filters on band_arr and re-evaluate the whole banding (and inlined
    # signature) chain at the scan; _outer blocks that. band_arr is a
    # transform over a constant sequence — never null/empty — so the
    # post-hoc filter only restores the inner-explode contract.
    return df.select(
        "*", F.posexplode_outer(band_arr).alias("band_idx", "band_key")
    ).filter(F.col("band_key").isNotNull())


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
    num_perm: int = 9,
    bands: int = 3,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing ≥1 LSH band.

    Plan: per-row signature → posexplode to bands (×b rows) → ONE hash
    exchange grouping by (band_idx, band_key) → in-bucket pair expansion
    with JVM array ops → distinct. No self-join: a naive banded-self-join
    plan computes the signature pipeline twice (once per side); grouping
    computes it once and the bucket arrays are tiny (LSH buckets are
    near-dup clusters). ``max_bucket`` guards the degenerate band that
    would explode quadratically at scale — buckets past it are dropped
    (they carry no discriminating signal).
    """
    rows_per_band = num_perm // bands
    sig = minhash_signature(
        ensure_min_partitions(df.select(id_col, text_col)), text_col, n_shingle, num_perm
    )
    banded = lsh_band_keys(sig, bands, rows_per_band).select(id_col, "band_idx", "band_key")
    buckets = (
        banded.groupBy("band_idx", "band_key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size("ids") - 1),
            lambda i: F.transform(
                F.slice(F.col("ids"), i + 1, F.size("ids") - i),
                lambda x: F.struct(
                    F.element_at(F.col("ids"), i).alias("a_id"), x.alias("b_id")
                ),
            ),
        )
    )
    return (
        # _outer + null filter: blocks the inferred isnotnull/size filter
        # that would re-evaluate the nested pair-building lambda per bucket
        buckets.select(F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(F.col("p.a_id").alias("a_id"), F.col("p.b_id").alias("b_id"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash — 32-bit signature from md5 hex-digit top bits
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id_col, simhash): 32-char '0'/'1' signature. Token hash = first 8
    hex digits of md5(token) as a 32-bit int (one md5 per token); bit j of
    the signature is the sign of Σ over tokens of (2·bit_j(hash) − 1).

    Shape: explode tokens → 32 static conditional sums in ONE hash
    aggregate → bit-string projection. Everything stays inside whole-stage
    codegen (higher-order-function lambdas are interpreted in Spark and
    were ~10× slower here); the doc_id exchange carries 32 longs per doc
    and is partial-aggregated map-side, so the shuffle is tiny at any
    scale."""
    df = ensure_min_partitions(df)
    tok_ints = F.expr(
        f"transform(split({text_col}, ' '), t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))"
    )
    # explode_outer + null filter: explode would infer isnotnull/size
    # filters on tok_ints and re-evaluate the interpreted transform 3× per
    # doc at the scan (split never yields an empty array, so semantics are
    # identical — only null text rows are dropped, same as explode)
    ex = df.select(F.col(id_col), F.explode_outer(tok_ints).alias("h")).filter(
        F.col("h").isNotNull()
    )
    aggs = [
        F.sum((F.shiftright(F.col("h"), 32 - j).bitwiseAND(F.lit(1))) * 2 - 1).alias(f"b{j}")
        for j in range(1, 33)
    ]
    g = ex.groupBy(id_col).agg(*aggs)
    bits = [
        F.when(F.col(f"b{j}") >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(1, 33)
    ]
    return g.select(F.col(id_col), F.concat(*bits).alias("simhash"))


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity on blocked candidate pairs
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over an undirected pair graph — the step that
    turns near-dup PAIRS into dedup CLUSTERS (keep min-id doc per cluster,
    drop the rest). Returns (node, cluster_id = min node id reachable).

    Iterative min-label propagation: each round, every node takes the min
    of its own label and its neighbors' labels; converged when no label
    changes. The loop is driver-side CONTROL only (one count per round —
    a scalar); all data work is joins/aggregates on the cluster. Rounds
    needed ≈ graph diameter, and each round is one shuffle of the (node,
    label) frame against the edge list — the standard Spark formulation of
    large-graph CC (GraphX/GraphFrames use the same label-propagation
    shape). localCheckpoint() per round truncates the lineage so the plan
    doesn't grow exponentially with iterations.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    def _propagate(lbls):
        neighbor_min = (
            edges.join(lbls, edges.dst == lbls.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        return lbls.join(neighbor_min, lbls.node == neighbor_min.src, "left").select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                "label"
            ),
        )

    for _ in range(max_iters):
        # TWO propagation steps per driver round (the fixpoint is the same;
        # it is just reached in half the synchronization barriers): each
        # eager checkpoint + convergence count is a driver round-trip, and
        # most near-dup clusters have diameter ≤ 2, so doubling the hop per
        # round typically converges in ONE round instead of two.
        stepped = _propagate(_propagate(labels)).withColumnRenamed("label", "new_label")
        updated = (
            labels.join(stepped, "node")
        ).localCheckpoint(eager=True)
        changed = updated.filter(F.col("new_label") != F.col("label")).limit(1).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    n_shingle: int = 3,
    threshold: float = 0.1,
    max_bucket: int | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct n-gram shingle sets, restricted to pairs
    sharing a blocking key (at scale: block = LSH bucket or lang×length
    band, keeping each block's pair count bounded).

    jaccard = |A∩B| / (|A|+|B|−|A∩B|) — exact integer set sizes, one
    double division.

    Shape: inverted index, not pairwise array intersection. Distinct
    shingles explode to (block, shingle, doc, |doc|) postings; co-occurring
    pairs come out of per-shingle buckets; one codegen'd count-aggregate
    per pair IS |A∩B|. A pair with zero common shingles never materializes
    (threshold > 0 makes that a no-op), so cost follows actual shingle
    co-occurrence instead of block-size².

    ``max_bucket`` is the df-cap: shingles appearing in more documents are
    dropped from the index (at real scale: the stop-shingle cap every
    near-dup pipeline applies; they carry no discriminating signal). The
    cap also selects the physical strategy:

    - capped: ONE pass — repartition on (block, shingle), df-filter via an
      in-place window (no extra exchange), collect the ≤max_bucket bucket,
      explode ordered pairs, aggregate. The window filter runs BEFORE any
      collect_list, so no oversized bucket is ever materialized (the
      historical GC-spike failure mode), and the whole query shuffles the
      corpus-sized index once plus one pair-sized exchange.
    - uncapped: postings SELF-JOIN (shuffle-hash, never broadcast — the
      index is corpus-sized). Pairs stream through codegen without
      materializing any bucket array, the only safe shape when a
      stop-shingle's bucket is unbounded; costs a second scan+shuffle of
      the index. At scale you always want the cap.
    """
    if threshold <= 0:
        raise ValueError("threshold must be > 0 (zero-overlap pairs are never materialized)")
    # INTEGER shingle hashes, not shingle strings (round-3 change, shared
    # helper with minhash_signature): one md5 per token + arithmetic
    # combine beats per-shingle concat_ws+md5 string building (~1.3 s →
    # ~0.2 s for the signature stage at sf0.1), and the inverted-index
    # exchange then carries 8-byte longs instead of shingle strings. The
    # oracle mirrors the hash token-for-token, so cross-engine exactness
    # is unchanged; distinct-set sizes coincide under the injective-in-
    # practice 60-bit hash exactly as in the minhash/decontam operators.
    base = ensure_min_partitions(df).withColumn(
        "__th", F.transform(F.split(F.col(text_col), " "), _token_hash)
    )
    base = base.select(
        F.col(id_col), *[F.col(c) for c in block_cols],
        F.array_distinct(
            shingle_hash_expr(F.col("__th"), F.col(text_col), n_shingle)
        ).alias("sh"),
    )
    # explode_outer, NOT explode: plain explode lets Catalyst infer
    # isnotnull/size>0 filters on the shingle array and push them below the
    # exchange — re-evaluating the (interpreted) shingle lambda 3× per doc
    # at the scan. Measured 2× on the whole query at sf0.1. explode_outer
    # blocks the inference; the post-hoc null filter restores exact
    # explode semantics (shingle_hash_expr yields ≥1 element on non-null text).
    postings = base.select(
        F.col(id_col), *[F.col(c) for c in block_cols],
        F.size("sh").cast("long").alias("sz"),
        F.explode_outer("sh").alias("s"),
    ).filter(F.col("s").isNotNull())
    # explicit join-key repartition with a pinned partition count: AQE's
    # post-shuffle coalesce otherwise collapses the (small-looking) postings
    # join to ONE task at bench scale — a serial hot spot that only gets
    # worse as co-occurrence grows; user-specified repartition is exempt
    # from coalescing. The df-cap window, the shuffle-hash join, and the
    # in-partition sort all REUSE this one hash layout (ClusteredDistribution
    # on the same keys), so each join side shuffles the index exactly once —
    # window-before-repartition cost a second full exchange per side.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    postings = postings.repartition(n_part, *[F.col(c) for c in block_cols], F.col("s"))
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*[F.col(c) for c in block_cols], F.col("s"))
        buckets = (
            postings.withColumn("__df", F.count(F.lit(1)).over(w))
            .filter(F.col("__df") <= max_bucket)
            .groupBy(*[F.col(c) for c in block_cols], F.col("s"))
            .agg(
                F.collect_list(
                    F.struct(F.col(id_col).alias("i"), F.col("sz").alias("z"))
                ).alias("ds")
            )
            .filter(F.size("ds") >= 2)
        )
        counts = (
            buckets.select(F.explode("ds").alias("a"), F.col("ds"))
            .select("a", F.explode("ds").alias("b"))
            .filter(F.col("a.i") < F.col("b.i"))
            .groupBy(
                F.col("a.i").alias("a_id"),
                F.col("b.i").alias("b_id"),
                F.col("a.z").alias("a_sz"),
                F.col("b.z").alias("b_sz"),
            )
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        # shuffle-hash, never broadcast: the postings index is as large as
        # the corpus — Spark's size estimate can look broadcastable at dev
        # scale and collecting a million-row index to the driver is the
        # failure mode
        a = postings.alias("pa").hint("shuffle_hash")
        b = postings.alias("pb")
        cond = (F.col("pa.s") == F.col("pb.s")) & (
            F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}")
        )
        for c in block_cols:
            cond = cond & (F.col(f"pa.{c}") == F.col(f"pb.{c}"))
        counts = (
            a.join(b, cond)
            .groupBy(
                F.col(f"pa.{id_col}").alias("a_id"),
                F.col(f"pb.{id_col}").alias("b_id"),
                F.col("pa.sz").alias("a_sz"),
                F.col("pb.sz").alias("b_sz"),
            )
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    return (
        counts.withColumn("n_union", F.col("a_sz") + F.col("b_sz") - F.col("n_inter"))
        .withColumn("jaccard", F.col("n_inter").cast("double") / F.col("n_union"))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "n_inter", "n_union", "jaccard")
    )


# ---------------------------------------------------------------------------
# incremental dedup — new batch vs existing corpus
# ---------------------------------------------------------------------------


def _fused_band(band_idx, band_key):
    return F.concat(band_idx.cast("string"), F.lit("|"), band_key)


def build_dedup_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 9,
    bands: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """The two corpus-side dedup indexes (text digests, LSH band keys) as
    standalone frames, so a deployment can persist them ONCE as bucketed
    tables (operators/skew.py:write_bucketed on __d / band_key) and serve
    every subsequent ingest with a join in which the 100 TB corpus side
    never shuffles — the claim incremental_dedup_verdicts documents, made
    executable (plan-asserted in tests/test_skew.py)."""
    rows_per_band = num_perm // bands
    digests = corpus.select(F.md5(F.col(text_col)).alias("__d")).distinct()
    sig = minhash_signature(
        ensure_min_partitions(corpus.select(id_col, text_col)), text_col, 3, num_perm
    )
    # (band_idx, band_key) fused into ONE probe column so the index can be
    # bucketed on a single key and every probe join satisfies the bucket
    # partitioning exactly (a two-column join key over one-column bucketing
    # forces a corpus-side exchange — the thing this index exists to avoid)
    band_keys = (
        lsh_band_keys(sig, bands, rows_per_band)
        .select(_fused_band(F.col("band_idx"), F.col("band_key")).alias("__bk"))
        .distinct()
    )
    return digests, band_keys


def incremental_dedup_verdicts(
    incoming: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 9,
    bands: int = 3,
    corpus_index: "tuple[DataFrame, DataFrame] | None" = None,
) -> DataFrame:
    """Continual-ingestion dedup: classify every incoming doc against an
    EXISTING corpus — ``exact_dup`` (byte-identical text already present),
    ``near_dup`` (shares a MinHash LSH band with a corpus doc), or ``new``.
    Output: (id, verdict), one row per incoming doc.

    This is the production shape for growing a training corpus: the corpus
    side never re-pairs with itself (unlike minhash_lsh_candidates over the
    union), so per-ingest cost is O(|incoming|) hashing plus two hash joins
    against corpus-sized indexes. At real scale the two corpus projections
    (text digests, band keys) are precomputed once and stored as bucketed
    tables, making each ingest a join against a static index; here they are
    derived inline from the corpus frame, same plan shape.

    Joins are LEFT SEMI — Catalyst's dedup-free existence join: no
    multiplicity blow-up when an incoming doc collides with many corpus
    docs, no distinct needed afterwards.
    """
    rows_per_band = num_perm // bands
    if corpus_index is None:
        if corpus is None:
            raise ValueError("provide corpus or corpus_index")
        corpus_index = build_dedup_index(corpus, id_col, text_col, num_perm, bands)
    corp_digest, corp_bands = corpus_index
    inc_digest = incoming.select(F.col(id_col), F.md5(F.col(text_col)).alias("__d"))
    exact = inc_digest.join(corp_digest, "__d", "left_semi").select(id_col)

    def _bands(df):
        sig = minhash_signature(
            ensure_min_partitions(df.select(id_col, text_col)),
            text_col, 3, num_perm,
        )
        return lsh_band_keys(sig, bands, rows_per_band).select(
            id_col, "band_idx", "band_key"
        )

    near = (
        _bands(incoming)
        .select(id_col, _fused_band(F.col("band_idx"), F.col("band_key")).alias("__bk"))
        .join(corp_bands, "__bk", "left_semi")
        .select(id_col)
        .distinct()
    )
    return (
        incoming.select(id_col)
        .join(exact.withColumn("__e", F.lit(1)), id_col, "left")
        .join(near.withColumn("__nr", F.lit(1)), id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("__e").isNotNull(), F.lit("exact_dup"))
            .when(F.col("__nr").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


def cluster_aware_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    test_permille: int = 100,
    salt: str = "",
) -> DataFrame:
    """Leakage-free train/test split: near-duplicate docs must land in the
    SAME split, or the test set leaks into training through paraphrases —
    the standard contamination failure a plain per-doc hash split cannot
    prevent. Output: (id, cluster_id, split).

    Composition: MinHash LSH pairs → connected components → every doc
    adopts its cluster id (singletons are their own cluster) → the split
    hash is keyed on the CLUSTER id, so membership is decided once per
    duplicate group. The cluster-label frame is bounded by the docs that
    appear in any near-dup pair (usually ≪ corpus), so the label join is
    AQE-broadcastable; the split itself stays a per-row expression.
    """
    from flink_uba_spark.operators.sampling import hash_split

    pairs = minhash_lsh_candidates(df, id_col, text_col)
    labels = connected_components(pairs)  # (doc_id, cluster_id)
    labeled = df.select(id_col).join(
        labels.select(F.col("doc_id").alias(id_col), F.col("cluster_id").alias("__c")),
        id_col,
        "left",
    ).select(
        F.col(id_col), F.coalesce(F.col("__c"), F.col(id_col)).alias("cluster_id")
    )
    return hash_split(
        labeled, id_col="cluster_id", test_permille=test_permille, salt=salt
    ).select(id_col, "cluster_id", "split")


# ---------------------------------------------------------------------------
# span-level exact substring dedup
# ---------------------------------------------------------------------------


def span_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
) -> DataFrame:
    """Exact substring-level duplication signal at word-span granularity:
    for every ``width``-token sliding window, find spans whose content
    recurs in a SECOND document, and report per doc how much of it is
    made of such cross-document spans. This is the span analogue of
    exact_dedup — the signal behind substring-level training-data dedup
    (repeated boilerplate/quotes that whole-doc or near-dup hashing
    misses). Output: (id, n_spans, n_dup_spans, dup_span_frac), one row
    per input doc (docs shorter than ``width`` tokens report 0 spans).

    Scale shape: the span table is ~|tokens| rows per doc — linear in
    corpus bytes, never pairwise. Spans are hashed (md5 of the joined
    window, computed AFTER the position explode so the digest stays in
    whole-stage codegen), reduced to one row per (span_hash, doc) by a
    partial-agg groupBy, and cross-document recurrence is a count(*)
    window over span_hash on that reduced frame — a span shared by k docs
    costs k rows, not k². Three exchanges total, all on uniformly
    distributed keys; the only skew risk is a single span recurring in
    millions of docs, which the (hash, doc) pre-reduction caps at one row
    per doc before the window sees it.
    """
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    n_pos = F.greatest(F.size(toks) - (width - 1), F.lit(0))
    spans = (
        df.select(F.col(id_col), toks.alias("__w"), n_pos.alias("__np"))
        .filter(F.col("__np") > 0)
        .select(
            id_col,
            "__w",
            F.explode(F.sequence(F.lit(1), F.col("__np"))).alias("__i"),
        )
        .select(
            id_col,
            F.md5(F.concat_ws(" ", F.slice(F.col("__w"), F.col("__i"), width))).alias(
                "span_h"
            ),
        )
    )
    per_doc = spans.groupBy("span_h", id_col).agg(F.count(F.lit(1)).alias("__occ"))
    w = Window.partitionBy("span_h")
    flagged = per_doc.withColumn("__nd", F.count(F.lit(1)).over(w))
    stats = flagged.groupBy(id_col).agg(
        F.sum("__occ").alias("n_spans"),
        F.sum(F.when(F.col("__nd") >= 2, F.col("__occ")).otherwise(F.lit(0))).alias(
            "n_dup_spans"
        ),
    )
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
            F.when(F.col("n_spans").isNull() | (F.col("n_spans") == 0), F.lit(0.0))
            .otherwise(F.col("n_dup_spans").cast("double") / F.col("n_spans"))
            .alias("dup_span_frac"),
        )
    )


def span_dedup_rewrite(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
) -> DataFrame:
    """Exact-substring dedup with TEXT REWRITE — the removal operator of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better", the ~50-token rule; round 8, completing span_dedup_stats'
    measurement with the act): every ``width``-token span whose content
    recurs in a SECOND document is cut from every occurrence EXCEPT one
    canonical keeper — the corpus-first occurrence in (doc_id, position)
    order — and each doc's surviving tokens are re-joined in order.
    Within-doc repeats are not cut (the cross-document rule, matching
    span_dedup_stats' signal). Output: ``(id, clean_text, n_tokens,
    n_removed)``; token conservation holds by construction
    (len(split(clean_text)) == n_tokens - n_removed whenever any token
    survives).

    Scale shape: the span table is linear in corpus tokens (never
    pairwise); duplicate detection is one hash-keyed exchange
    (count-distinct-docs + min-struct canonical in a single aggregate);
    cut occurrences are a second hash-keyed join (k occurrences of a
    span cost k rows, not k²); covered positions collapse per doc
    (collect_set bounded by the doc's own token count) and the rewrite
    itself is a positional array filter inside whole-stage codegen — no
    token-level shuffle, no UDF.
    """
    toks = F.split(F.col(text_col), " ")
    n_pos = F.size(toks) - (width - 1)
    spans = (
        df.select(F.col(id_col), toks.alias("__w"), n_pos.alias("__np"))
        .filter(F.col("__np") > 0)
        .select(
            id_col,
            "__w",
            F.explode(F.sequence(F.lit(1), F.col("__np"))).alias("__i"),
        )
        .select(
            F.col(id_col).alias("__d"),
            F.col("__i"),
            F.md5(
                F.concat_ws(" ", F.slice(F.col("__w"), F.col("__i"), width))
            ).alias("__h"),
        )
    )
    dup = (
        spans.groupBy("__h")
        .agg(
            F.count_distinct("__d").alias("__nd"),
            F.min(F.struct(F.col("__d"), F.col("__i"))).alias("__canon"),
        )
        .filter(F.col("__nd") >= 2)
        .select("__h", "__canon")
    )
    cut = spans.join(dup, "__h").filter(
        ~(
            (F.col("__d") == F.col("__canon.__d"))
            & (F.col("__i") == F.col("__canon.__i"))
        )
    )
    covered = (
        cut.select(
            F.col("__d"),
            F.explode(
                F.sequence(F.col("__i"), F.col("__i") + (width - 1))
            ).alias("__p"),
        )
        .groupBy("__d")
        .agg(F.collect_set("__p").alias("__cut"))
    )
    return (
        df.join(covered, df[id_col] == covered["__d"], "left")
        .select(
            F.col(id_col),
            F.concat_ws(
                " ",
                F.filter(
                    toks,
                    lambda tok, idx: ~F.coalesce(
                        F.array_contains(F.col("__cut"), idx + 1),
                        F.lit(False),
                    ),
                ),
            ).alias("clean_text"),
            F.size(toks).cast("long").alias("n_tokens"),
            F.coalesce(F.size("__cut"), F.lit(0)).cast("long").alias("n_removed"),
        )
    )


def span_hash_array(text: Column, width: int = 8) -> Column:
    """Array of md5 span hashes for every ``width``-token sliding window
    (empty array when the doc is shorter than ``width`` tokens). The
    array form of span_dedup_stats' explode path, for callers that need
    the spans without a generator node (e.g. explode_outer in streams,
    where zero-span docs must still emit a row).

    Guarded sequence: Spark's ``sequence(1, 0)`` DESCENDS ([1, 0]) rather
    than returning empty, so the position list must be gated on n_pos ≥ 1.
    """
    toks = F.split(text, " ")
    n_pos = F.size(toks) - (width - 1)
    return F.when(
        n_pos >= 1,
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, width))),
        ),
    ).otherwise(F.array().cast("array<string>"))


def sorted_neighborhood_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    threshold_permille: int = 500,
    n_shingle: int = 3,
) -> DataFrame:
    """Sorted-neighborhood dedup (round 6) — the FIFTH candidate-generation
    family beside exact / MinHash-LSH / SimHash / banded n-gram Jaccard:
    the classic record-linkage SNM. Docs sort by a content prefix inside
    a BLOCK (first token), and each doc is verified only against its
    ``window`` successors in that order with exact shingle-set Jaccard —
    near-dups that share a prefix land adjacent, and the comparison count
    is ``window`` per doc by construction, never all-pairs.

    Deterministic contract: total order (block, 60-char prefix, id);
    Jaccard as integer permille (|A∩B|·1000 // |A∪B| over distinct
    ``n_shingle``-gram sets, ``shingle_array``'s whole-text fallback for
    short docs). Pairs keep (earlier-in-order id = doc_id_a).

    Scale: one hash exchange on the block key + a within-block sort (the
    block bounds both sort width and neighbor reach — SNM's standard
    scale-out), then ``window`` lead() probes per row. Complements LSH:
    SNM is exact-similarity over a deterministic neighborhood (no
    banding probability), LSH is probabilistic over the whole corpus.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").getItem(0).alias("__blk"),
        F.substring(F.col(text_col), 1, 60).alias("__sk"),
        F.array_distinct(shingle_array(F.col(text_col), n_shingle)).alias("__sh"),
    )
    w = W.partitionBy("__blk").orderBy("__sk", "doc_id")
    out = None
    for j in range(1, window + 1):
        nb = base.select(
            "doc_id",
            "__sh",
            F.lead("doc_id", j).over(w).alias("__nb_id"),
            F.lead("__sh", j).over(w).alias("__nb_sh"),
        ).filter(F.col("__nb_id").isNotNull())
        pairs = nb.select(
            F.col("doc_id").alias("doc_id_a"),
            F.col("__nb_id").alias("doc_id_b"),
            F.expr(
                "size(array_intersect(__sh, __nb_sh)) * CAST(1000 AS BIGINT)"
                " div size(array_union(__sh, __nb_sh))"
            ).alias("jaccard_permille"),
        ).filter(F.col("jaccard_permille") >= threshold_permille)
        out = pairs if out is None else out.unionByName(pairs)
    return out
