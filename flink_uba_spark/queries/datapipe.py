"""Training-data-pipeline query catalog: text analysis, dedup, similarity
search over ``documents`` / ``embeddings`` (TESTDATA.md).

Each Spark query has a DuckDB oracle twin computing the identical function —
including identical md5-based hashing and quantized-integer float discipline
(see operators/dedup.py, operators/similarity.py docstrings).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_uba_spark.functions.hashing import weights_sql_literal
from flink_uba_spark.operators import dedup as D
from flink_uba_spark.operators import similarity as S
from flink_uba_spark.operators import text as TX
from flink_uba_spark.sources.readers import load_testdata

_STOP_EN_SQL = "['the','a','of','and','to','in','is','on','for','with']"


def _docs(spark, sf_dir):
    return load_testdata(spark, sf_dir, ("documents",))["documents"]


def _embs(spark, sf_dir):
    return load_testdata(spark, sf_dir, ("embeddings",))["embeddings"]


# ------------------------------------------------------------ text analysis
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.token_counts(_docs(spark, sf_dir)).select("doc_id", "n_words", "n_tokens")


TEXT_TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(text, '{TX.BPE_TOKEN_RE}')) AS BIGINT) AS n_tokens
FROM documents
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "n_words", "n_chars_calc", "n_punct", "n_stop",
        "stop_ratio", "avg_word_len", "quality",
    )


TEXT_QUALITY_ORACLE = f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9_ ]')) AS BIGINT) AS n_punct,
       CAST(len(list_filter(w, x -> list_contains({_STOP_EN_SQL}, x))) AS BIGINT) AS n_stop,
       CAST(len(list_filter(w, x -> list_contains({_STOP_EN_SQL}, x))) AS DOUBLE) / len(w) AS stop_ratio,
       CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) AS avg_word_len,
       CASE WHEN len(w) >= 20
                 AND CAST(len(list_filter(w, x -> list_contains({_STOP_EN_SQL}, x))) AS DOUBLE) / len(w) >= 0.05
            THEN 'high'
            WHEN len(w) >= 5 THEN 'medium'
            ELSE 'low' END AS quality
FROM t
"""


def gopher_rule_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style named-rule quality gate (Rae et al. 2021 §A1.1;
    the RefinedWeb rule-filter family): per-document boolean flags for
    word-count bounds, mean-word-length bounds, and minimum unique-word
    fraction, plus the composite keep — the rule-by-rule AUDIT shape a
    curation pipeline reports, vs text_quality_score's scalar features.
    Pure integer-permille projections (operators/text.py:gopher_rules),
    scan-fused, no shuffle."""
    return TX.gopher_rules(_docs(spark, sf_dir)).select(
        "doc_id", "n_words", "mwl_pm", "uniq_pm",
        "wc_ok", "mwl_ok", "uniq_ok", "keep",
    )


GOPHER_RULE_GATE_ORACLE = """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
m AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
         CAST((length(text) - (len(w) - 1)) * 1000 // len(w) AS BIGINT) AS mwl_pm,
         CAST(len(list_distinct(w)) * 1000 // len(w) AS BIGINT) AS uniq_pm
  FROM t
)
SELECT doc_id, n_words, mwl_pm, uniq_pm,
       n_words BETWEEN 20 AND 80 AS wc_ok,
       mwl_pm BETWEEN 4200 AND 4900 AS mwl_ok,
       uniq_pm >= 400 AS uniq_ok,
       (n_words BETWEEN 20 AND 80) AND (mwl_pm BETWEEN 4200 AND 4900)
         AND uniq_pm >= 400 AS keep
FROM m
"""


def dsir_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance selection (Xie et al. 2023): English docs as
    the TARGET distribution, hashed word-bigram features (4096 md5
    buckets — the classifier's hashing trick), Laplace-smoothed
    fixed-point target/raw ratios summed per document, deterministic top
    200‰ selected — the domain-adaptation curation step. Linear ratio
    sum in place of the log-sum (the PMI/linear-idf rank-equivalence
    trade, integer-exact for the hash gate);
    operators/sampling.py:dsir_importance."""
    from flink_uba_spark.operators.sampling import dsir_importance

    return dsir_importance(
        _docs(spark, sf_dir), target_pred=F.col("lang") == "en"
    )


DSIR_IMPORTANCE_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt
  FROM documents
),
bg AS (
  SELECT doc_id, tgt, w[i] || ' ' || w[i + 1] AS bg
  FROM t, LATERAL (SELECT unnest(range(1, len(w))) AS i)
),
bk AS (
  SELECT doc_id, tgt,
         ('0x' || substring(md5(bg), 1, 4))::BIGINT % 4096 AS bucket
  FROM bg
),
cnt AS (SELECT bucket, count(*) AS a, sum(tgt) AS t FROM bk GROUP BY bucket),
db AS (SELECT doc_id, bucket, count(*) AS n FROM bk GROUP BY doc_id, bucket),
sc AS (
  SELECT doc_id, sum(n * (((t + 1) * 1000000) // (a + 1))) AS importance
  FROM db JOIN cnt USING (bucket) GROUP BY doc_id
),
j AS (
  SELECT d.doc_id, CAST(COALESCE(sc.importance, 0) AS BIGINT) AS importance
  FROM documents d LEFT JOIN sc USING (doc_id)
),
r AS (
  SELECT *, row_number() OVER (ORDER BY importance DESC, doc_id) AS rk,
         count(*) OVER () AS nn
  FROM j
)
SELECT doc_id, importance, CAST(rk AS BIGINT) AS sel_rank,
       rk * 1000 <= nn * 200 AS selected
FROM r
"""


def quality_decile_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning (round 7): rank the corpus by an INTEGER
    quality score (stopword permille minus punctuation permille — the
    quality_score features kept in exact integer arithmetic) and cut it
    into 10 ntile stages, reporting per-stage document count, score
    range, and token mass — the stage table a curriculum-ordered
    training run feeds its sampler (low deciles first or last, the
    scheduler's choice).

    Determinism: stages are assigned over the TOTAL order (score,
    doc_id), matching SQL ntile exactly — the first n%10 stages get the
    extra documents.

    Scale (round 7): a naive ``ntile() OVER (ORDER BY …)`` is an
    unpartitioned window — ALL rows through one task. This form is
    DISTRIBUTED: repartitionByRange on the total order, per-partition
    local ranks (a partitioned window), and a 32-scalar per-partition
    count collect folded back as offset literals — global rank = offset
    + local rank for ANY boundary placement, so the sampled range
    boundaries never affect the result. 10× probe: ratio 2.8 vs the
    unpartitioned ntile form's 4.7 — and no single-task sort at any
    scale (the feature scan is cached so the range sampler does not
    re-run it)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks).cast("long")
    n_chars = F.length("text").cast("long")
    n_punct = F.regexp_count(F.col("text"), F.lit("[^A-Za-z0-9_ ]")).cast("long")
    from flink_uba_spark.operators.text import STOPWORDS, _stop_count

    n_stop = _stop_count(F.col("text"), STOPWORDS["en"])
    scored = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("__nc"),
        n_punct.alias("__np"),
        n_stop.alias("__ns"),
    ).select(
        "doc_id",
        "n_words",
        (
            F.expr("(__ns * 1000) div n_words") - F.expr("(__np * 1000) div __nc")
        ).alias("score"),
    )
    import pandas as pd

    # cache BEFORE the range exchange: repartitionByRange samples its
    # child to pick boundaries, which would re-run the regexp-heavy
    # feature scan a second time (measured 2× the 10×-probe cost)
    scored = scored.cache()
    ranged = scored.repartitionByRange(32, "score", "doc_id").sortWithinPartitions(
        "score", "doc_id"
    )

    def count_parts(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        cnt = sum(len(b) for b in batches)
        yield pd.DataFrame({"pid": [pid], "cnt": [cnt]})

    # bounded scalar collect: 32 per-partition counts → offset closure.
    # Global rank = offset + local position is correct for ANY sampled
    # range boundaries, so the result is boundary-independent.
    pid_counts = {
        int(r.pid): int(r.cnt)
        for r in ranged.mapInPandas(count_parts, "pid int, cnt long").collect()
    }
    n = sum(pid_counts.values())
    offsets, acc = {}, 0
    for p in sorted(pid_counts):
        offsets[p] = acc
        acc += pid_counts[p]
    q, r = divmod(n, 10)

    def assign(batches):
        from pyspark import TaskContext

        import numpy as np

        pid = TaskContext.get().partitionId()
        seen = offsets.get(pid, 0)
        for b in batches:
            rnk = seen + np.arange(1, len(b) + 1, dtype="int64")
            seen += len(b)
            if q == 0:
                stage = rnk  # fewer rows than stages: rank IS the stage
            else:
                big = r * (q + 1)
                stage = np.where(
                    rnk <= big,
                    (rnk + q) // (q + 1),
                    r + (rnk - big + q - 1) // q,
                )
            out = b[["n_words", "score"]].copy()
            out["stage"] = stage
            yield out

    staged = ranged.mapInPandas(assign, "n_words long, score long, stage long")
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
        F.sum("n_words").alias("total_words"),
    )


QUALITY_DECILE_ORACLE = f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
scored AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
         CAST(len(list_filter(w, x -> list_contains({_STOP_EN_SQL}, x))) * 1000
              // len(w) AS BIGINT)
         - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9_ ]')) * 1000
              // length(text) AS BIGINT) AS score
  FROM t
),
staged AS (
  SELECT *, CAST(ntile(10) OVER (ORDER BY score, doc_id) AS BIGINT) AS stage
  FROM scored
)
SELECT stage, count(*) AS n_docs,
       CAST(min(score) AS BIGINT) AS min_score,
       CAST(max(score) AS BIGINT) AS max_score,
       CAST(sum(n_words) AS BIGINT) AS total_words
FROM staged GROUP BY stage
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.lang_id(_docs(spark, sf_dir)).select(
        "doc_id", "c_en", "c_de", "c_es", "c_fr", "lang_pred"
    )


def _stop_sql(lang: str) -> str:
    return "[" + ",".join(f"'{w}'" for w in TX.STOPWORDS[lang]) + "]"


TEXT_LANG_ID_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
    SELECT doc_id,
           CAST(len(list_filter(w, x -> list_contains({_stop_sql('en')}, x))) AS BIGINT) AS c_en,
           CAST(len(list_filter(w, x -> list_contains({_stop_sql('de')}, x))) AS BIGINT) AS c_de,
           CAST(len(list_filter(w, x -> list_contains({_stop_sql('es')}, x))) AS BIGINT) AS c_es,
           CAST(len(list_filter(w, x -> list_contains({_stop_sql('fr')}, x))) AS BIGINT) AS c_fr
    FROM t
)
SELECT doc_id, c_en, c_de, c_es, c_fr,
       CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
            WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
            WHEN c_es >= c_fr THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM c
"""


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality audit (round 7): the confusion matrix of the
    documents table's DECLARED ``lang`` metadata against the n-gram
    heuristic's ``lang_pred`` — the agreement table a curation pipeline
    reviews before trusting either label source for filtering. Counts
    and an exact match-permille per declared language (integer ratio).

    Plan: the lang-id projections are pure codegen'd expressions; one
    (lang, lang_pred)-sized hash aggregate — scan-bound."""
    scored = TX.lang_id(_docs(spark, sf_dir))
    cell = scored.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    per_lang = cell.groupBy("lang").agg(F.sum("n_docs").alias("lang_total"))
    return (
        cell.join(F.broadcast(per_lang), "lang")
        .withColumn(
            "cell_permille", F.expr("(n_docs * 1000) div lang_total")
        )
        .select("lang", "lang_pred", "n_docs", "lang_total", "cell_permille")
    )


LANG_ID_CONFUSION_ORACLE = f"""
WITH t AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
c AS (
    SELECT lang,
           CAST(len(list_filter(w, x -> list_contains({{en}}, x))) AS BIGINT) AS c_en,
           CAST(len(list_filter(w, x -> list_contains({{de}}, x))) AS BIGINT) AS c_de,
           CAST(len(list_filter(w, x -> list_contains({{es}}, x))) AS BIGINT) AS c_es,
           CAST(len(list_filter(w, x -> list_contains({{fr}}, x))) AS BIGINT) AS c_fr
    FROM t
),
p AS (
    SELECT lang,
           CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
                WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
                WHEN c_es >= c_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM c
),
cell AS (SELECT lang, lang_pred, count(*) AS n_docs FROM p GROUP BY 1, 2),
tot AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS lang_total FROM cell GROUP BY 1)
SELECT cell.lang, cell.lang_pred, cell.n_docs, tot.lang_total,
       CAST(cell.n_docs * 1000 // tot.lang_total AS BIGINT) AS cell_permille
FROM cell JOIN tot ON cell.lang = tot.lang
""".format(
    en=_stop_sql("en"), de=_stop_sql("de"), es=_stop_sql("es"), fr=_stop_sql("fr")
)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.fingerprint(_docs(spark, sf_dir)).select("doc_id", "fingerprint")


TEXT_FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
FROM documents
"""


# ------------------------------------------------------------------- dedup
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(_docs(spark, sf_dir))


DEDUP_EXACT_ORACLE = """
SELECT doc_id, md5(text) AS text_md5,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
FROM documents
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_candidates(_docs(spark, sf_dir))


def _minhash_bands_sql() -> str:
    """Full SELECT yielding (doc_id, band_idx, band_key) — the DuckDB twin
    of operators/dedup.py:lsh_band_keys ∘ minhash_signature, reused by the
    pair, cluster, and incremental-dedup oracles."""
    from flink_uba_spark.functions.hashing import (
        MERSENNE31,
        NGRAM_C,
        minhash_perm_constants,
    )

    perms = ",\n               ".join(
        f"list_min(list_transform(bh, h -> ({a} * h + {b}) % {MERSENNE31}))"
        for a, b in minhash_perm_constants(9)
    )
    c0, c1, c2 = NGRAM_C
    return f"""
WITH docs AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
th AS (
    SELECT doc_id, text,
           list_transform(w, t -> ('0x' || substring(md5(t), 1, 15))::BIGINT % {MERSENNE31}) AS th
    FROM docs
),
bases AS (
    SELECT doc_id,
           CASE WHEN len(th) >= 3
                THEN list_transform(generate_series(1, len(th) - 2),
                                    i -> (th[i]*{c0} + th[i+1]*{c1} + th[i+2]*{c2}) % {MERSENNE31})
                ELSE [('0x' || substring(md5(text), 1, 15))::BIGINT % {MERSENNE31}] END AS bh
    FROM th
),
mh AS (
    SELECT doc_id,
           [{perms}] AS mh
    FROM bases
)
SELECT doc_id, g.b AS band_idx,
       md5(array_to_string(mh[g.b*3 + 1 : g.b*3 + 3], '|')) AS band_key
FROM mh CROSS JOIN generate_series(0, 2) AS g(b)
"""


def _minhash_oracle() -> str:
    return f"""
WITH bands AS (SELECT * FROM ({_minhash_bands_sql()}) t)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from the MinHash candidate pairs: iterative
    min-label propagation (operators/dedup.py:connected_components) —
    the step that picks one canonical doc per duplicate group. The oracle
    computes the same components with a recursive CTE; the Spark loop is
    the scalable formulation (per-round joins, driver sees only a
    converged-yet scalar)."""
    pairs = D.minhash_lsh_candidates(_docs(spark, sf_dir))
    return D.connected_components(pairs)


def _clusters_oracle() -> str:
    inner = _minhash_oracle()
    return f"""
WITH RECURSIVE pairs AS (
    SELECT * FROM ({inner}) q
), edges AS (
    SELECT a_id AS src, b_id AS dst FROM pairs
    UNION
    SELECT b_id AS src, a_id AS dst FROM pairs
), reach AS (
    SELECT src AS node, dst AS r FROM edges
    UNION
    SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src
)
SELECT node AS doc_id, least(node, min(r)) AS cluster_id
FROM reach GROUP BY node
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(_docs(spark, sf_dir))


DEDUP_SIMHASH_ORACLE = """
WITH t AS (
    SELECT doc_id,
           list_transform(string_split(text, ' '),
                          tok -> ('0x' || substring(md5(tok), 1, 8))::BIGINT) AS th
    FROM documents
)
SELECT doc_id,
       array_to_string(list_transform(generate_series(1, 32), j ->
           CASE WHEN list_sum(list_transform(th, h -> ((h >> (32 - j)) & 1) * 2 - 1)) >= 0
                THEN '1' ELSE '0' END), '') AS simhash
FROM t
"""


JACCARD_MAX_BUCKET = 64  # stop-shingle df-cap (never binds at test SF — max
# df is 9 at sf0.1 — but bounds the quadratic postings blow-up at 100×)


def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup candidates (round 6) — the fifth
    candidate-generation family (operators/dedup.py
    sorted_neighborhood_candidates): block by first token, sort by the
    60-char content prefix, verify each doc against its 2 successors
    with exact integer-permille 3-gram-shingle Jaccard (≥ 500).
    Complements LSH: deterministic neighborhood, no banding
    probability; window comparisons per doc, never all-pairs."""
    from flink_uba_spark.operators.util import ensure_min_partitions

    return D.sorted_neighborhood_candidates(
        ensure_min_partitions(_docs(spark, sf_dir)),
        window=2, threshold_permille=500,
    )


DEDUP_SNM_ORACLE = """
WITH base AS (
  SELECT doc_id, t[1] AS blk, substring(text, 1, 60) AS sk,
         list_distinct(
           CASE WHEN len(t) >= 3
                THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
                ELSE [array_to_string(t, ' ')] END
         ) AS sh
  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
),
nb AS (
  SELECT doc_id, sh,
         lead(doc_id, 1) OVER w AS nb1_id, lead(sh, 1) OVER w AS nb1_sh,
         lead(doc_id, 2) OVER w AS nb2_id, lead(sh, 2) OVER w AS nb2_sh
  FROM base WINDOW w AS (PARTITION BY blk ORDER BY sk, doc_id)
)
SELECT doc_id_a, doc_id_b, jaccard_permille FROM (
  SELECT doc_id AS doc_id_a, nb1_id AS doc_id_b,
         len(list_intersect(sh, nb1_sh)) * CAST(1000 AS BIGINT)
           // len(list_distinct(list_concat(sh, nb1_sh))) AS jaccard_permille
  FROM nb WHERE nb1_id IS NOT NULL
  UNION ALL
  SELECT doc_id, nb2_id,
         len(list_intersect(sh, nb2_sh)) * CAST(1000 AS BIGINT)
           // len(list_distinct(list_concat(sh, nb2_sh)))
  FROM nb WHERE nb2_id IS NOT NULL
)
WHERE jaccard_permille >= 500
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("len_bucket", F.expr("n_chars div 128"))
    return D.ngram_jaccard_pairs(
        docs, block_cols=("lang", "len_bucket"), n_shingle=3, threshold=0.1,
        max_bucket=JACCARD_MAX_BUCKET,
    )


# postings form mirroring the operator exactly: df-capped inverted index,
# pair count = shared KEPT shingles, set sizes stay full-set. Shingles are
# the same integer 3-gram hashes as the Spark side (round 3 — one md5 per
# token, arithmetic combine; see operators/dedup.py:shingle_hash_expr).
def _jaccard_oracle() -> str:
    from flink_uba_spark.functions.hashing import MERSENNE31, NGRAM_C

    c0, c1, c2 = NGRAM_C
    return f"""
WITH dt AS (
    SELECT doc_id, lang, n_chars // 128 AS len_bucket, text,
           list_transform(string_split(text, ' '),
                          t -> ('0x' || substring(md5(t), 1, 15))::BIGINT % {MERSENNE31}) AS th
    FROM documents
),
s AS (
    SELECT doc_id, lang, len_bucket,
           list_distinct(CASE WHEN len(th) >= 3
                THEN list_transform(generate_series(1, len(th) - 2),
                                    i -> (th[i]*{c0} + th[i+1]*{c1} + th[i+2]*{c2}) % {MERSENNE31})
                ELSE [('0x' || substring(md5(text), 1, 15))::BIGINT % {MERSENNE31}] END) AS sh
    FROM dt
),
post AS (
    SELECT doc_id, lang, len_bucket, len(sh) AS sz, unnest(sh) AS sg FROM s
),
dfreq AS (
    SELECT lang, len_bucket, sg, count(*) AS c FROM post GROUP BY 1, 2, 3
),
kept AS (
    SELECT p.doc_id, p.lang, p.len_bucket, p.sz, p.sg
    FROM post p JOIN dfreq d USING (lang, len_bucket, sg)
    WHERE d.c <= {JACCARD_MAX_BUCKET}
),
pairs AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sz AS a_sz, b.sz AS b_sz,
           count(*) AS n_inter
    FROM kept a JOIN kept b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.sg = b.sg
     AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4
)
SELECT a_id, b_id, CAST(n_inter AS BIGINT) AS n_inter,
       CAST(a_sz + b_sz - n_inter AS BIGINT) AS n_union,
       CAST(n_inter AS DOUBLE) / (a_sz + b_sz - n_inter) AS jaccard
FROM pairs
WHERE CAST(n_inter AS DOUBLE) / (a_sz + b_sz - n_inter) >= 0.1
"""


# -------------------------------------------------------------- similarity
_QUANT_SQL = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"


def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 8)
    return S.cosine_topk(embs, queries, k=5)


EMBEDDING_TOPK_ORACLE = f"""
WITH n AS (
    SELECT vec_id, {_QUANT_SQL} AS qemb,
           list_dot_product({_QUANT_SQL}, {_QUANT_SQL}) AS qq
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_dot_product(q.qemb, c.qemb) / (sqrt(q.qq) * sqrt(c.qq)) AS cos
    FROM n q JOIN n c ON c.vec_id != q.vec_id
    WHERE q.vec_id < 8
)
SELECT query_id, neighbor_id, cos, rnk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
    FROM scored
) WHERE rnk <= 5
"""


def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k: deterministic codebook, per-row
    centroid assignment, 2-probe search. Round 13: scoring runs as ONE
    Arrow-kernel corpus pass (operators/similarity.py:
    ivf_probe_topk_candidates — same bucket/tie/cosine contract as the
    ivf_topk join form it replaces here, which remains the generic
    DataFrame-codebook path). The oracle replays the identical algorithm
    relationally."""
    from pyspark.sql import Window

    embs = _embs(spark, sf_dir)
    q_ids, q_mat = S.collect_query_qmatrix(embs.filter(F.col("vec_id") < 8))
    cand = S.ivf_probe_topk_candidates(
        embs, q_ids, q_mat, q_ids, q_mat, probes=(2,), k=5
    ).drop("n_probe")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return cand.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= 5
    )


EMBEDDING_IVF_ORACLE = f"""
WITH n AS (
    SELECT vec_id, {_QUANT_SQL} AS qemb,
           list_dot_product({_QUANT_SQL}, {_QUANT_SQL}) AS qq
    FROM embeddings
),
cent AS (SELECT vec_id AS ck, qemb AS cemb, qq AS cqq FROM n WHERE vec_id < 8),
cosses AS (
    SELECT v.vec_id, c.ck,
           list_dot_product(v.qemb, c.cemb) / (sqrt(v.qq) * sqrt(c.cqq)) AS cos
    FROM n v CROSS JOIN cent c
),
ranked_c AS (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, ck ASC) AS rn
    FROM cosses
),
assign AS (SELECT vec_id, ck AS bucket FROM ranked_c WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, ck AS bucket FROM ranked_c
           WHERE rn <= 2 AND vec_id < 8),
scored AS (
    SELECT p.query_id, v.vec_id AS neighbor_id,
           list_dot_product(q.qemb, v.qemb) / (sqrt(q.qq) * sqrt(v.qq)) AS cos
    FROM probes p
    JOIN assign a ON a.bucket = p.bucket
    JOIN n v ON v.vec_id = a.vec_id
    JOIN n q ON q.vec_id = p.query_id
    WHERE v.vec_id != p.query_id
)
SELECT query_id, neighbor_id, cos, rnk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
    FROM scored
) WHERE rnk <= 5
"""


def ivf_index_upsert_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance (round-5): a simulated ingest —
    every 5th vector arrives, every 3rd of those with a CHANGED embedding
    (deterministic negation) — is re-assigned against the persisted
    centroid table via the broadcast-codebook argmax and classified
    against the existing inverted file (built over the corpus = vectors
    with vec_id % 7 != 0): op ∈ {new, moved, unchanged}. Only the delta is
    ever assigned; the corpus index is probed, never rebuilt
    (operators/similarity.py:ivf_index_upsert — the dedup-index pattern
    applied to vector search; exchange-free probe plan asserted in
    tests/test_skew.py)."""
    embs = _embs(spark, sf_dir)
    cb = S.default_codebook(embs, 8)
    index = S.build_ivf_index(embs.filter(F.col("vec_id") % 7 != 0), codebook=cb)
    incoming = embs.filter(F.col("vec_id") % 5 == 0).withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 3 == 0,
            F.transform(F.col("embedding"), lambda x: -x),
        ).otherwise(F.col("embedding")),
    )
    return S.ivf_index_upsert(incoming, index, cb)


IVF_INDEX_UPSERT_ORACLE = f"""
WITH n AS (
    SELECT vec_id, {_QUANT_SQL} AS qemb,
           list_dot_product({_QUANT_SQL}, {_QUANT_SQL}) AS qq
    FROM embeddings
),
cent AS (SELECT vec_id AS ck, qemb AS cemb, qq AS cqq FROM n WHERE vec_id < 8),
corp AS (
    SELECT vec_id, ck AS prev_bucket FROM (
        SELECT v.vec_id, c.ck,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_dot_product(v.qemb, c.cemb)
                              / (sqrt(v.qq) * sqrt(c.cqq)) DESC, c.ck ASC
               ) AS rn
        FROM n v CROSS JOIN cent c WHERE v.vec_id % 7 != 0
    ) WHERE rn = 1
),
inc_raw AS (
    SELECT vec_id,
           CASE WHEN vec_id % 3 = 0
                THEN list_transform(embedding, x -> -CAST(x AS DOUBLE))
                ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END
               AS embedding
    FROM embeddings WHERE vec_id % 5 = 0
),
ni AS (
    SELECT vec_id, {_QUANT_SQL} AS qemb,
           list_dot_product({_QUANT_SQL}, {_QUANT_SQL}) AS qq
    FROM inc_raw
),
newb AS (
    SELECT vec_id, ck AS bucket FROM (
        SELECT v.vec_id, c.ck,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_dot_product(v.qemb, c.cemb)
                              / (sqrt(v.qq) * sqrt(c.cqq)) DESC, c.ck ASC
               ) AS rn
        FROM ni v CROSS JOIN cent c
    ) WHERE rn = 1
)
SELECT nb.vec_id, CAST(nb.bucket AS BIGINT) AS bucket,
       CAST(corp.prev_bucket AS BIGINT) AS prev_bucket,
       CASE WHEN corp.prev_bucket IS NULL THEN 'new'
            WHEN corp.prev_bucket != nb.bucket THEN 'moved'
            ELSE 'unchanged' END AS op
FROM newb nb LEFT JOIN corp ON corp.vec_id = nb.vec_id
"""


def ivf_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measurement (round-5): recall@5 of the IVF index vs the
    exact brute-force cosine ranking, swept over the probe budget
    (n_probe ∈ 1, 2, 4, 8) — the accuracy/cost dial every production ANN
    deployment tunes. recall_pct is integer-exact (hits × 20), so the
    DuckDB oracle hash-matches bit-for-bit. At n_probe = 8 (= all
    centroids) IVF degenerates to exact search: recall must be 100 — a
    built-in self-check the oracle also encodes."""
    from pyspark.sql import Window

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 8)
    # Round 13 (VERDICT r12 item 4, guide §4.2): ONE Arrow-kernel corpus
    # pass scores every (n_probe, query) pair — replacing one full
    # bucketed-join ivf_topk plan per probe budget plus a separate exact
    # cosine_topk plan. The queries/centroids coincide here (8 lowest-id
    # vectors, the deterministic default_codebook) and are collected once
    # (8 rows — the kmeans-init pattern); n_probe=8 probes ALL centroids,
    # so the widest branch IS the exact ranking by construction — the same
    # degenerate-to-exact self-check the oracle encodes.
    q_ids, q_mat = S.collect_query_qmatrix(queries)
    cand = S.ivf_probe_topk_candidates(
        embs, q_ids, q_mat, q_ids, q_mat, probes=(1, 2, 4, 8), k=5
    )
    w = Window.partitionBy("n_probe", "query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    approx = (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("n_probe", "query_id", "neighbor_id")
    )
    exact = approx.filter(F.col("n_probe") == 8).select("query_id", "neighbor_id")
    hits = (
        approx.join(exact, ["query_id", "neighbor_id"])
        .groupBy("n_probe", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = queries.select(F.col("vec_id").alias("query_id")).crossJoin(
        F.broadcast(
            spark.range(4).select(
                F.element_at(F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(8)), F.col("id").cast("int") + 1)
                .cast("long")
                .alias("n_probe")
            )
        )
    )
    return base.join(hits, ["n_probe", "query_id"], "left").select(
        "n_probe",
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) * 20).cast("long").alias("recall_pct"),
    )


def _ivf_recall_oracle() -> str:
    probes = []
    for p in (1, 2, 4, 8):
        probes.append(
            f"SELECT {p} AS n_probe, vec_id AS query_id, ck AS bucket "
            f"FROM ranked_c WHERE rn <= {p} AND vec_id < 8"
        )
    probe_union = " UNION ALL ".join(probes)
    return f"""
WITH n AS (
    SELECT vec_id, {_QUANT_SQL} AS qemb,
           list_dot_product({_QUANT_SQL}, {_QUANT_SQL}) AS qq
    FROM embeddings
),
cent AS (SELECT vec_id AS ck, qemb AS cemb, qq AS cqq FROM n WHERE vec_id < 8),
cosses AS (
    SELECT v.vec_id, c.ck,
           list_dot_product(v.qemb, c.cemb) / (sqrt(v.qq) * sqrt(c.cqq)) AS cos
    FROM n v CROSS JOIN cent c
),
ranked_c AS (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, ck ASC) AS rn
    FROM cosses
),
assign AS (SELECT vec_id, ck AS bucket FROM ranked_c WHERE rn = 1),
probes AS ({probe_union}),
approx AS (
    SELECT n_probe, query_id, neighbor_id FROM (
        SELECT p.n_probe, p.query_id, v.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY p.n_probe, p.query_id
                   ORDER BY list_dot_product(q.qemb, v.qemb) / (sqrt(q.qq) * sqrt(v.qq)) DESC,
                            v.vec_id
               ) AS rnk
        FROM probes p
        JOIN assign a ON a.bucket = p.bucket
        JOIN n v ON v.vec_id = a.vec_id
        JOIN n q ON q.vec_id = p.query_id
        WHERE v.vec_id != p.query_id
    ) WHERE rnk <= 5
),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.qemb, c.qemb) / (sqrt(q.qq) * sqrt(c.qq)) DESC,
                            c.vec_id
               ) AS rnk
        FROM n q JOIN n c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 8
    ) WHERE rnk <= 5
),
h AS (
    SELECT a.n_probe, e.query_id, count(*) AS n
    FROM exact e JOIN approx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY 1, 2
),
grid AS (
    SELECT p.n_probe, q.vec_id AS query_id
    FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 8) q
    CROSS JOIN (VALUES (1), (2), (4), (8)) AS p(n_probe)
)
SELECT CAST(g.n_probe AS BIGINT) AS n_probe, g.query_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n, 0) * 20 AS BIGINT) AS recall_pct
FROM grid g LEFT JOIN h ON h.n_probe = g.n_probe AND h.query_id = g.query_id
"""


def matryoshka_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-embedding truncation sweep (Kusupati et al. 2022 MRL —
    the serving trade behind truncatable embedding APIs): recall@5 of
    brute-force cosine over PREFIX dimensions (8, 16, 32, 64) vs the
    full-dimension ranking — the quality/cost dial for shrinking vector
    storage 8×. recall_pct is integer-exact (hits × 20); dim=64 is the
    degenerate-to-exact self-check (must read 100), the ivf_recall_sweep
    construction applied to the truncation axis. Broadcast queries, one
    corpus scan per dim — a diagnostic query, not a serving path."""
    from pyspark.sql import Window

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 8)
    # Round 13 (VERDICT r12 item 4, guide §4.2): ONE Arrow-kernel corpus
    # pass scores every (prefix-dim, query) pair — replacing one broadcast-
    # join + HOF-dot cosine_topk plan per dim plus the separate exact plan
    # (slice-then-quantize ≡ quantize-then-slice, so prefix dots over the
    # full quantized matrix are bit-identical to the truncated plans). The
    # dim=64 branch IS the exact full-dimension ranking by construction —
    # the degenerate-to-exact self-check the oracle encodes.
    q_ids, q_mat = S.collect_query_qmatrix(queries)
    cand = S.prefix_topk_candidates(embs, q_ids, q_mat, dims=(8, 16, 32, 64), k=5)
    w = Window.partitionBy("dim", "query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    approx = (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("dim", "query_id", "neighbor_id")
    )
    exact = approx.filter(F.col("dim") == 64).select("query_id", "neighbor_id")
    hits = (
        approx.join(exact, ["query_id", "neighbor_id"])
        .groupBy("dim", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = queries.select(F.col("vec_id").alias("query_id")).crossJoin(
        F.broadcast(
            spark.range(4).select(
                F.element_at(
                    F.array(F.lit(8), F.lit(16), F.lit(32), F.lit(64)),
                    F.col("id").cast("int") + 1,
                )
                .cast("long")
                .alias("dim")
            )
        )
    )
    return base.join(hits, ["dim", "query_id"], "left").select(
        "dim",
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) * 20).cast("long").alias("recall_pct"),
    )


def _matryoshka_recall_oracle() -> str:
    dims = (8, 16, 32, 64)
    approxes = []
    for d in dims:
        approxes.append(f"""
    SELECT {d} AS dim, query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.e{d}, c.e{d})
                              / (sqrt(q.s{d}) * sqrt(c.s{d})) DESC,
                            c.vec_id
               ) AS rnk
        FROM n q JOIN n c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 8
    ) WHERE rnk <= 5""")
    approx_union = " UNION ALL ".join(approxes)
    prefix_cols = ", ".join(
        f"list_transform(embedding[1:{d}], x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e{d}"
        for d in dims
    )
    norm_cols = ", ".join(f"list_dot_product(e{d}, e{d}) AS s{d}" for d in dims)
    return f"""
WITH n0 AS (SELECT vec_id, {prefix_cols} FROM embeddings),
n AS (SELECT *, {norm_cols} FROM n0),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.e64, c.e64)
                              / (sqrt(q.s64) * sqrt(c.s64)) DESC,
                            c.vec_id
               ) AS rnk
        FROM n q JOIN n c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 8
    ) WHERE rnk <= 5
),
approx AS ({approx_union}),
h AS (
    SELECT a.dim, e.query_id, count(*) AS n
    FROM exact e JOIN approx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY 1, 2
),
grid AS (
    SELECT d.dim, q.vec_id AS query_id
    FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 8) q
    CROSS JOIN (VALUES (8), (16), (32), (64)) AS d(dim)
)
SELECT CAST(g.dim AS BIGINT) AS dim, g.query_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n, 0) * 20 AS BIGINT) AS recall_pct
FROM grid g LEFT JOIN h ON h.dim = g.dim AND h.query_id = g.query_id
"""


def embedding_topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic clustering over embeddings: nearest-centroid assignment
    (operators/similarity.py:cluster_assign — broadcast codebook argmax,
    corpus never shuffles) rolled up to per-cluster size, majority label,
    and purity. The deterministic codebook keeps the oracle replayable;
    a k-means|| codebook (kmeans_codebook) plugs into the same operator
    for the trained path."""
    assigned = S.cluster_assign(_embs(spark, sf_dir)).select(
        "cluster_id", F.col("label").cast("long").alias("label")
    )
    per_label = assigned.groupBy("cluster_id", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    # majority via struct-max: (count, -label) so ties break to the LOWEST
    # label — mirrors the oracle's row_number(ORDER BY c DESC, label)
    top = F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl")))
    return (
        per_label.groupBy("cluster_id")
        .agg(
            F.sum("c").alias("n_vectors"),
            top.alias("__top"),
        )
        .select(
            "cluster_id",
            "n_vectors",
            (-F.col("__top.nl")).alias("majority_label"),
            F.col("__top.c").alias("majority_count"),
            (F.col("__top.c").cast("double") / F.col("n_vectors")).alias("purity"),
        )
    )


EMBEDDING_TOPIC_CLUSTERS_ORACLE = f"""
WITH n AS (
    SELECT vec_id, label, {_QUANT_SQL} AS qemb,
           list_dot_product({_QUANT_SQL}, {_QUANT_SQL}) AS qq
    FROM embeddings
),
cent AS (SELECT vec_id AS ck, qemb AS cemb, qq AS cqq FROM n WHERE vec_id < 8),
cosses AS (
    SELECT v.vec_id, v.label, c.ck,
           list_dot_product(v.qemb, c.cemb) / (sqrt(v.qq) * sqrt(c.cqq)) AS cos
    FROM n v CROSS JOIN cent c
),
assign AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label, ck AS cluster_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, ck ASC) AS rn
        FROM cosses
    ) WHERE rn = 1
),
per_label AS (
    SELECT cluster_id, label, count(*) AS c FROM assign GROUP BY 1, 2
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY c DESC, label ASC) AS rn
    FROM per_label
),
tot AS (SELECT cluster_id, CAST(sum(c) AS BIGINT) AS n_vectors FROM per_label GROUP BY 1)
SELECT t.cluster_id, t.n_vectors, r.label AS majority_label,
       CAST(r.c AS BIGINT) AS majority_count,
       CAST(r.c AS DOUBLE) / t.n_vectors AS purity
FROM tot t JOIN ranked r ON r.cluster_id = t.cluster_id AND r.rn = 1
"""


def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-5 (operators/similarity.py:pq_adc_topk):
    corpus compressed to 8 one-byte codes per vector, queries score with
    integer table lookups — the memory-bounded tier of the ANN stack
    (brute → LSH → IVF → PQ). All-integer, oracle replays bit-for-bit."""
    embs = _embs(spark, sf_dir)
    return S.pq_adc_topk(embs, embs.filter(F.col("vec_id") < 8), k=5)


def _pq_l2_sql(c: str, v: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, 8), i -> "
        f"({c}[m*8+i] - {v}[m*8+i]) * ({c}[m*8+i] - {v}[m*8+i])))"
    )


EMBEDDING_PQ_ORACLE = f"""
WITH n AS (SELECT vec_id, {_QUANT_SQL} AS qemb FROM embeddings),
cbl AS (SELECT list(qemb ORDER BY vec_id) AS cb FROM n WHERE vec_id < 16),
codes AS (
    SELECT vec_id,
           list_transform(generate_series(0, 7), m ->
               list_position(
                   list_transform(cb, c -> {_pq_l2_sql('c', 'qemb')}),
                   list_min(list_transform(cb, c -> {_pq_l2_sql('c', 'qemb')}))
               ) - 1) AS codes
    FROM n CROSS JOIN cbl
),
tabs AS (
    SELECT vec_id AS query_id,
           list_transform(generate_series(0, 7), m ->
               list_transform(cb, c -> {_pq_l2_sql('c', 'qemb')})) AS tables
    FROM n CROSS JOIN cbl WHERE vec_id < 8
),
scored AS (
    SELECT t.query_id, c.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(generate_series(1, 8), m ->
               t.tables[m][c.codes[m] + 1])) AS BIGINT) AS approx_dist
    FROM codes c CROSS JOIN tabs t
    WHERE c.vec_id != t.query_id
)
SELECT query_id, neighbor_id, approx_dist, rnk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx_dist, neighbor_id) AS rnk
    FROM scored
) WHERE rnk <= 5
"""


def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_near_dup_pairs(_embs(spark, sf_dir), planes=8, threshold=0.1)


def _near_dup_oracle() -> str:
    planes = weights_sql_literal(8, 64)
    bucket = " || ".join(
        f"(CASE WHEN list_dot_product(qemb, {w}) > 0 THEN '1' ELSE '0' END)" for w in planes
    )
    return f"""
WITH n AS (
    SELECT vec_id, {_QUANT_SQL} AS qemb,
           list_dot_product({_QUANT_SQL}, {_QUANT_SQL}) AS qq
    FROM embeddings
),
b AS (SELECT vec_id, qemb, qq, {bucket} AS bucket FROM n)
SELECT a.vec_id AS a_id, c.vec_id AS b_id,
       list_dot_product(a.qemb, c.qemb) / (sqrt(a.qq) * sqrt(c.qq)) AS cos
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE list_dot_product(a.qemb, c.qemb) / (sqrt(a.qq) * sqrt(c.qq)) >= 0.1
"""


# -------------------------------------------------------------- multimodal
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode/feature pipeline (operators/multimodal.py):
    documents → binary assets → Arrow-batched mapInPandas features. The
    oracle recomputes the deterministic stand-in features relationally
    (payload bytes are the UTF-8 text, so md5(blob) ≡ md5(text))."""
    from flink_uba_spark.operators.multimodal import attach_payload, decode_features
    from flink_uba_spark.operators.util import ensure_min_partitions

    assets = attach_payload(ensure_min_partitions(_docs(spark, sf_dir)))
    return decode_features(assets)


MULTIMODAL_DECODE_ORACLE = """
SELECT doc_id AS asset_id,
       CASE WHEN doc_id % 3 = 0 THEN 'png'
            WHEN doc_id % 3 = 1 THEN 'jpeg'
            ELSE 'wav' END AS format,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       CAST(CASE WHEN strlen(text) > 0 THEN ascii(substring(text, 1, 1)) ELSE -1 END AS BIGINT)
           AS head_byte
FROM documents
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample stage (every-4th-byte stand-in; ASCII payloads
    make the byte stride mirror a char stride relationally)."""
    from flink_uba_spark.operators.multimodal import attach_payload, resize_assets
    from flink_uba_spark.operators.util import ensure_min_partitions

    assets = attach_payload(ensure_min_partitions(_docs(spark, sf_dir)))
    return resize_assets(assets, stride=4).select(
        "asset_id", "format", "n_bytes_resized", "resized_md5"
    )


MULTIMODAL_RESIZE_ORACLE = """
SELECT doc_id AS asset_id,
       CASE WHEN doc_id % 3 = 0 THEN 'png'
            WHEN doc_id % 3 = 1 THEN 'jpeg'
            ELSE 'wav' END AS format,
       CAST(len(list_transform(generate_series(1, strlen(text), 4),
                               i -> substring(text, i, 1))) AS BIGINT) AS n_bytes_resized,
       md5(array_to_string(list_transform(generate_series(1, strlen(text), 4),
                                          i -> substring(text, i, 1)), '')) AS resized_md5
FROM documents
"""


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents. The synthetic corpus carries no PII,
    so the query plants deterministic email/phone strings on a doc_id
    pattern first — the scrub then has real matches to count and redact,
    and the oracle replays the identical planting + regex semantics."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                         F.lit("@example.com now")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" call +555 123 4567 today")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return TX.pii_scrub(docs).select(
        "doc_id", "n_emails", "n_phones", F.md5("scrubbed").alias("scrubbed_md5")
    )


TEXT_PII_SCRUB_ORACLE = f"""
WITH planted AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 5 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                   ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN ' call +555 123 4567 today' ELSE '' END
               AS text
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{TX.EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{TX.PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{TX.EMAIL_RE}', '[EMAIL]', 'g'),
                          '{TX.PHONE_RE}', '[PHONE]', 'g')) AS scrubbed_md5
FROM planted
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage (video-like payloads: fixed 64-byte frames,
    keep every 4th): explodes one row per kept frame through the same
    Arrow-batched mapInPandas plumbing; the oracle replays the frame
    arithmetic relationally over the ASCII payload."""
    from flink_uba_spark.operators.multimodal import attach_payload, frame_sample
    from flink_uba_spark.operators.util import ensure_min_partitions

    assets = attach_payload(ensure_min_partitions(_docs(spark, sf_dir)))
    return frame_sample(assets, frame_size=64, every=4).select(
        "asset_id", "frame_idx", "frame_md5"
    )


MULTIMODAL_FRAME_SAMPLE_ORACLE = """
WITH f AS (
    SELECT doc_id,
           unnest(generate_series(0, greatest(strlen(text) // 64, 1) - 1)) AS i,
           text
    FROM documents
)
SELECT doc_id AS asset_id, CAST(i AS BIGINT) AS frame_idx,
       md5(substring(text, CAST(i AS INTEGER) * 64 + 1, 64)) AS frame_md5
FROM f WHERE i % 4 = 0
"""


def doc_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 90/10 train/test assignment keyed on md5(doc_id) —
    a pure function of the row (operators/sampling.py), identical across
    engines, runs, and input re-splits, unlike RNG-based df.sample()."""
    from flink_uba_spark.operators.sampling import hash_split

    return hash_split(_docs(spark, sf_dir), test_permille=100).select("doc_id", "split")


DOC_TRAIN_TEST_SPLIT_ORACLE = """
SELECT doc_id,
       CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % 1000 < 100
            THEN 'test' ELSE 'train' END AS split
FROM documents
"""


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing downsample: thin dominant English to ~30%, keep half
    of Chinese, keep every other language whole (default 1000‰) — each
    stratum's membership keyed on md5(doc_id), so the mix is reproducible
    across engines and re-runs."""
    from flink_uba_spark.operators.sampling import stratified_hash_sample

    return stratified_hash_sample(
        _docs(spark, sf_dir),
        strata_col="lang",
        rates_permille={"en": 300, "zh": 500},
        default_permille=1000,
    ).select("doc_id", "lang")


DOC_STRATIFIED_SAMPLE_ORACLE = """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
      < CASE lang WHEN 'en' THEN 300 WHEN 'zh' THEN 500 ELSE 1000 END
"""


def doc_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota corpus mixing: precisely 50 docs per language (all when
    a language has fewer), chosen by row-intrinsic md5 order
    (operators/sampling.py:quota_hash_sample)."""
    from flink_uba_spark.operators.sampling import quota_hash_sample

    return quota_hash_sample(
        _docs(spark, sf_dir), strata_col="lang", quota=50
    ).select("doc_id", "lang")


DOC_QUOTA_SAMPLE_ORACLE = """
SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM documents
) WHERE rn <= 50
"""


def corpus_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline in ONE plan: train split (hash_split) →
    exact dedup (keep canonical copy) → token counting → per-language
    corpus stats. The point is composability: three operators chain into
    a single Catalyst plan (the dedup window and final agg are the only
    exchanges; split + token count fuse into the scan)."""
    from flink_uba_spark.operators.dedup import exact_dedup
    from flink_uba_spark.operators.sampling import hash_split

    docs = hash_split(_docs(spark, sf_dir), test_permille=100).filter(
        F.col("split") == "train"
    )
    canonical = exact_dedup(docs).filter(~F.col("is_dup")).select("doc_id")
    kept = _docs(spark, sf_dir).join(canonical, on="doc_id")
    with_tokens = TX.token_counts(kept)
    return with_tokens.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_words").alias("total_words"),
    )


CORPUS_CURATION_STATS_ORACLE = f"""
WITH train AS (
    SELECT * FROM documents
    WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          % 1000 >= 100
), canonical AS (
    SELECT doc_id FROM (
        SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
        FROM train
    ) WHERE keep
)
SELECT d.lang,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(d.text, '{TX.BPE_TOKEN_RE}'))) AS BIGINT)
           AS total_tokens,
       CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS total_words
FROM documents d JOIN canonical c ON d.doc_id = c.doc_id
GROUP BY d.lang
"""


# ------------------------------------------------- corpus prep & search
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the held-out (test-split) slice plays the
    eval suite; every train doc is flagged when ≥1 of its distinct word
    3-grams appears anywhere in it (operators/corpus.py:decontaminate —
    the GPT-3/PaLM-style n-gram overlap rule)."""
    from flink_uba_spark.operators.corpus import decontaminate
    from flink_uba_spark.operators.sampling import hash_split

    docs = hash_split(_docs(spark, sf_dir), test_permille=100)
    return decontaminate(
        docs.filter(F.col("split") == "train"),
        docs.filter(F.col("split") == "test"),
    ).select("doc_id", "n_shingles", "n_shared", "contaminated")


_SHINGLE3_SQL = """list_distinct(CASE WHEN len(string_split(text,' ')) >= 3
                THEN list_transform(generate_series(1, len(string_split(text,' ')) - 2),
                                    i -> array_to_string((string_split(text,' '))[i:i+2], ' '))
                ELSE [text] END)"""

DECONTAM_ORACLE = f"""
WITH split AS (
    SELECT doc_id, text,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
    FROM documents
),
tr AS (SELECT doc_id, {_SHINGLE3_SQL} AS sh FROM split WHERE b >= 100),
ev AS (SELECT DISTINCT unnest({_SHINGLE3_SQL}) AS sg FROM split WHERE b < 100),
post AS (SELECT doc_id, unnest(sh) AS sg FROM tr),
shared AS (
    SELECT doc_id, count(*) AS n_shared FROM post
    WHERE sg IN (SELECT sg FROM ev) GROUP BY 1
)
SELECT t.doc_id,
       CAST(len(t.sh) AS BIGINT) AS n_shingles,
       CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
       coalesce(s.n_shared, 0) >= 1 AS contaminated
FROM tr t LEFT JOIN shared s USING (doc_id)
"""


def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition filters (operators/corpus.py)."""
    from flink_uba_spark.operators.corpus import repetition_signals

    return repetition_signals(_docs(spark, sf_dir)).select(
        "doc_id", "n_words", "n_distinct_words", "top_word_count",
        "top_bigram_count", "dup_word_ratio", "top_word_ratio",
        "top_bigram_ratio", "repetitive",
    )


_SHINGLE2_SQL = """CASE WHEN len(w) >= 2
                THEN list_transform(generate_series(1, len(w) - 1),
                                    i -> array_to_string(w[i:i+1], ' '))
                ELSE [array_to_string(w, ' ')] END"""

TEXT_REPETITION_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
base AS (
    SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
           CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words, w
    FROM t
),
tw AS (
    SELECT doc_id, CAST(max(c) AS BIGINT) AS top_word_count FROM (
        SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest(w) AS g FROM base) GROUP BY 1, 2
    ) GROUP BY 1
),
bg AS (
    SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count FROM (
        SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest({_SHINGLE2_SQL}) AS g FROM base) GROUP BY 1, 2
    ) GROUP BY 1
)
SELECT b.doc_id, b.n_words, b.n_distinct_words, tw.top_word_count, bg.top_bigram_count,
       CAST(b.n_words - b.n_distinct_words AS DOUBLE) / b.n_words AS dup_word_ratio,
       CAST(tw.top_word_count AS DOUBLE) / b.n_words AS top_word_ratio,
       CAST(bg.top_bigram_count AS DOUBLE) / b.n_words AS top_bigram_ratio,
       (CAST(tw.top_word_count AS DOUBLE) / b.n_words > 0.2
        OR CAST(b.n_words - b.n_distinct_words AS DOUBLE) / b.n_words > 0.5)
           AS repetitive
FROM base b JOIN tw USING (doc_id) JOIN bg USING (doc_id)
"""


def text_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (operators/corpus.py:
    lm_bigram_scores): corpus-fit add-one-smoothed bigram model, docs
    scored by mean quantized conditional bigram probability."""
    from flink_uba_spark.operators.corpus import lm_bigram_scores

    return lm_bigram_scores(_docs(spark, sf_dir))


TEXT_LM_QUALITY_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
toks AS (SELECT doc_id, unnest(w) AS t FROM w),
uni AS (SELECT t, count(*) AS c1 FROM toks GROUP BY 1),
v AS (SELECT count(*) AS v FROM uni),
bg AS (
    SELECT doc_id, w[g] AS w1, w[g] || ' ' || w[g + 1] AS b
    FROM w CROSS JOIN LATERAL unnest(generate_series(1, len(w) - 1)) AS s(g)
    WHERE len(w) >= 2
),
bigc AS (SELECT b, count(*) AS c12 FROM bg GROUP BY 1),
scored AS (
    SELECT bg.doc_id,
           CAST(floor(1000000.0 * (bigc.c12 + 1) / (uni.c1 + v.v)) AS BIGINT) AS q
    FROM bg JOIN bigc USING (b) JOIN uni ON bg.w1 = uni.t CROSS JOIN v
),
per_doc AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(q) AS DOUBLE) / count(*) AS lm_score
    FROM scored GROUP BY 1
)
SELECT d.doc_id,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       p.lm_score
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


PACK_CAPACITY = 2048


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk packing: each doc's global token offset (BPE
    token counts, doc_id order) and its training pack of 2048
    tokens — via the two-level distributed prefix sum in
    operators/corpus.py:pack_sequences (no global sort, no full-data
    single-partition window; the oracle IS the naive global window)."""
    from flink_uba_spark.operators.corpus import pack_sequences

    docs = TX.token_counts(_docs(spark, sf_dir)).select("doc_id", "n_tokens")
    return pack_sequences(docs, capacity=PACK_CAPACITY)


PACK_SEQUENCES_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{TX.BPE_TOKEN_RE}')) AS BIGINT) AS n_tokens
    FROM documents
),
o AS (
    SELECT doc_id, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS global_offset
    FROM t
)
SELECT doc_id, n_tokens, global_offset,
       global_offset // {PACK_CAPACITY} AS pack_id,
       global_offset % {PACK_CAPACITY} AS pack_pos
FROM o
"""


def doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-word chunks every 24 words (RAG/long-context prep;
    operators/corpus.py:chunk_text — pure per-row sequence+slice explode)."""
    from flink_uba_spark.operators.corpus import chunk_text

    return chunk_text(_docs(spark, sf_dir), chunk_words=32, stride_words=24)


DOC_CHUNKS_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
    SELECT doc_id, w,
           unnest(generate_series(0,
               CASE WHEN len(w) <= 32 THEN 0
                    ELSE (len(w) - 32 + 23) // 24 END)) AS ci
    FROM t
)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       CAST(len(w[ci*24 + 1 : ci*24 + 32]) AS BIGINT) AS n_chunk_words,
       array_to_string(w[ci*24 + 1 : ci*24 + 32], ' ') AS chunk_text
FROM c
"""


BM25_TERMS = ("spark", "window", "hash", "sort")


def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical BM25 top-20 for a bag-of-words probe query
    (operators/search.py — quantized-integer scores, rational idf)."""
    from flink_uba_spark.operators.search import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), BM25_TERMS, k=20)


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

BM25_ORACLE = f"""
WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS w,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
    FROM documents
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
    FROM d
),
hits AS (SELECT doc_id, dl, unnest(w) AS term FROM d),
tf AS (
    SELECT doc_id, term, dl, CAST(count(*) AS BIGINT) AS tf
    FROM hits WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
    SELECT t.doc_id,
           CAST(floor(((s.n_docs - f.df + 0.5) / (f.df + 0.5))
                      * ((t.tf * 2.2) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dl / s.avgdl)))
                      * 1000000) AS BIGINT) AS term_q
    FROM tf t JOIN dfreq f USING (term) CROSS JOIN stats s
),
per AS (SELECT doc_id, CAST(sum(term_q) AS BIGINT) AS score_q FROM scored GROUP BY 1)
SELECT doc_id, score_q, rnk FROM (
    SELECT *, row_number() OVER (ORDER BY score_q DESC, doc_id) AS rnk FROM per
) WHERE rnk <= 20
"""


def tfidf_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF keywords (round 7) — tag suggestion /
    topic labeling / boilerplate audit over the corpus. Integer-exact
    linear-idf scoring (tf · (N·10^6 // df), the PMI trade) with NO
    df-cap (the synthetic vocabulary is 31 tokens wide — a df·2 ≤ N
    guard keeps 1 of them and empties 95% of docs; the idf weight
    already down-ranks the common tokens, and the operator's
    max_df_permille guard stays available for broad corpora);
    explode → (tok, doc) TF → token df rollup
    joined back tok-partitioned → broadcast one-row corpus stats →
    per-doc row_number. See operators/search.py tfidf_keywords."""
    from flink_uba_spark.operators.search import tfidf_keywords

    docs = _docs(spark, sf_dir)
    return tfidf_keywords(docs, k=5)


TFIDF_KEYWORDS_ORACLE = """
WITH tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  ) GROUP BY 1, 2
),
dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.tok, t.tf, d.df,
         CAST(t.tf * ((n.n_docs * 1000000) // d.df) AS BIGINT) AS score_q
  FROM tf t JOIN dfreq d USING (tok) CROSS JOIN n
)
SELECT doc_id, rnk, tok, tf, df, score_q FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY doc_id ORDER BY score_q DESC, tok) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= 5
"""


def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global vocabulary statistics: top-100 tokens by total occurrences
    (tie → lexicographic) with document frequency — the corpus-level
    inverted-index primitive behind stopword lists, df-caps, and BM25
    statistics. Explode → (tok, doc) rollup → token rollup, top-k via
    TakeOrderedAndProject (never a global sort)."""
    from flink_uba_spark.operators.util import ensure_min_partitions
    from pyspark.sql import Window

    docs = ensure_min_partitions(_docs(spark, sf_dir))
    per_doc = (
        docs.select("doc_id", F.explode_outer(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok").isNotNull())
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = per_doc.groupBy("tok").agg(
        F.sum("tf").alias("n_occurrences"),
        F.count(F.lit(1)).alias("doc_freq"),
    )
    top = vocab.orderBy(F.desc("n_occurrences"), F.col("tok")).limit(100)
    w = Window.orderBy(F.desc("n_occurrences"), F.col("tok"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


CORPUS_VOCABULARY_ORACLE = """
WITH per_doc AS (
    SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ) GROUP BY 1, 2
),
vocab AS (
    SELECT tok, CAST(sum(tf) AS BIGINT) AS n_occurrences,
           CAST(count(*) AS BIGINT) AS doc_freq
    FROM per_doc GROUP BY 1
)
SELECT tok, n_occurrences, doc_freq, rnk FROM (
    SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, tok) AS rnk FROM vocab
) WHERE rnk <= 100
"""


def corpus_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-token collocations by pointwise mutual information
    (round 6) — multiword-expression discovery over the corpus, the
    statistic a tokenizer/quality audit reads next to raw pair frequency
    (BPE) and document frequency (corpus_vocabulary). Integer-exact: PMI
    ranks by c_xy*scale*N // (c_x*c_y) (log is monotone), so the score
    is engine-exact and the oracle replays it verbatim. One corpus scan
    per counts table, vocab-sized broadcast joins, TakeOrderedAndProject
    (operators/corpus.py collocations_pmi)."""
    from flink_uba_spark.operators.corpus import collocations_pmi
    from flink_uba_spark.operators.util import ensure_min_partitions

    return collocations_pmi(
        ensure_min_partitions(_docs(spark, sf_dir)), min_count=5, top_k=20
    )


def heavy_hitter_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus heavy hitters (round 7): every adjacent-token bigram
    occurring in more than 1/800 of all bigram slots, with its exact
    count — boilerplate/template detection over a training corpus (the
    frequency sibling of corpus_collocations_pmi, which ranks by PMI).

    Plan: operators/sketch.py heavy_hitters_exact — the 2-pass
    Misra-Gries prune (per-partition ≤ k-counter summaries → broadcast
    candidate superset → exact counts of candidate rows only). The
    naive groupBy.having would shuffle the whole bigram domain; here the
    tail never leaves the mappers. Output equals the naive form
    bit-for-bit (the superset property makes the prune lossless), which
    is what the oracle replays."""
    from flink_uba_spark.operators.sketch import heavy_hitters_exact

    toks = _docs(spark, sf_dir).select(F.split(F.col("text"), " ").alias("__t"))
    bigrams = toks.select(
        F.explode(
            F.when(
                F.size("__t") >= 2,
                F.expr(
                    "transform(sequence(0, size(__t) - 2), "
                    "i -> concat(__t[i], ' ', __t[i + 1]))"
                ),
            ).otherwise(F.array())
        ).alias("bigram")
    )
    return heavy_hitters_exact(bigrams, "bigram", k=800)


HEAVY_HITTER_BIGRAMS_ORACLE = """
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
big AS (
    SELECT t[i] || ' ' || t[i + 1] AS bigram
    FROM toks, unnest(range(1, len(t))) AS r(i)
),
c AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n_occurrences FROM big GROUP BY 1),
tot AS (SELECT CAST(sum(n_occurrences) AS BIGINT) AS n_items FROM c)
SELECT bigram, n_occurrences, n_items
FROM c CROSS JOIN tot
WHERE n_occurrences * 800 > n_items
"""


CORPUS_COLLOCATIONS_PMI_ORACLE = """
WITH toks AS (
    SELECT string_split(text, ' ') AS t FROM documents
),
uni AS (
    SELECT w, CAST(count(*) AS BIGINT) AS n_w
    FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
),
n_total AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_tokens FROM uni),
bi AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy FROM (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM toks, unnest(range(1, len(t))) AS r(i)
    ) GROUP BY 1, 2 HAVING count(*) >= 5
),
scored AS (
    SELECT bi.w1, bi.w2, bi.n_xy, ux.n_w AS n_x, uy.n_w AS n_y,
           bi.n_xy * CAST(1000000 AS BIGINT) * n_total.n_tokens
             // (ux.n_w * uy.n_w) AS pmi_score
    FROM bi
    JOIN uni ux ON ux.w = bi.w1
    JOIN uni uy ON uy.w = bi.w2
    CROSS JOIN n_total
)
SELECT w1, w2, n_xy, n_x, n_y, pmi_score, rnk FROM (
    SELECT *, row_number() OVER (ORDER BY pmi_score DESC, w1, w2) AS rnk
    FROM scored
) WHERE rnk <= 20
"""


def dedup_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END of the dedup story: one representative document per
    near-dup cluster — longest doc wins (n_words desc, tie → lowest
    doc_id), singletons represent themselves. Composes
    minhash_lsh_candidates → connected_components → a per-cluster rank;
    this is the row set a curation pipeline KEEPS."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_words")
    )
    clusters = D.connected_components(D.minhash_lsh_candidates(_docs(spark, sf_dir)))
    member = docs.join(clusters, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_words"), F.col("doc_id")
    )
    return (
        member.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster_id")))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("representative_id"),
            F.col("n_words").alias("representative_words"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
    )


def _canonical_selection_oracle() -> str:
    return f"""
WITH clusters AS ({_clusters_oracle()}),
member AS (
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
           coalesce(c.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN clusters c USING (doc_id)
),
ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY cluster_id ORDER BY n_words DESC, doc_id) AS rn,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM member
)
SELECT cluster_id, doc_id AS representative_id, n_words AS representative_words,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM ranked WHERE rn = 1
"""


def semantic_dedup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage cross-modal near-dup detection — the production semantic-
    dedup shape: DENSE candidate generation (hyperplane-LSH embedding
    pairs, operators/similarity.py) followed by LEXICAL verification
    (exact word-3-gram Jaccard on the joined document texts; vec_id ↔
    doc_id align 1:1 in the testdata). Candidates are a tiny fraction of
    the corpus, so the per-pair set intersection is cheap; the two id
    joins hash on doc ids (unskewed). Output: the candidate pairs with
    both signals and the lexical verdict."""
    pairs = S.embedding_near_dup_pairs(_embs(spark, sf_dir), planes=8, threshold=0.1)
    # round 3: shingle ONLY the candidate docs (left-semi on the pair ids —
    # candidates are a tiny fraction of the corpus, AQE broadcasts them),
    # and use integer shingle hashes (shingle_hash_expr, shared with
    # minhash/jaccard) instead of per-shingle string building. The verify
    # stage cost now follows |candidates|, not |corpus|.
    cand_ids = (
        pairs.select(F.col("a_id").alias("doc_id"))
        .unionByName(pairs.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    sh = (
        _docs(spark, sf_dir)
        .join(cand_ids, "doc_id", "left_semi")
        .withColumn("__th", F.transform(F.split(F.col("text"), " "), D._token_hash))
        .select(
            "doc_id",
            F.array_distinct(
                D.shingle_hash_expr(F.col("__th"), F.col("text"), 3)
            ).alias("sh"),
        )
    )
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    inter = F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh"))).cast("long")
    return (
        pairs.join(a, "a_id")
        .join(b, "b_id")
        .withColumn("n_inter", inter)
        .withColumn(
            "n_union",
            (F.size("a_sh") + F.size("b_sh")).cast("long") - F.col("n_inter"),
        )
        .withColumn(
            "jaccard", F.col("n_inter").cast("double") / F.col("n_union")
        )
        .withColumn("lexical_match", F.col("jaccard") >= 0.05)
        .select("a_id", "b_id", "cos", "n_inter", "n_union", "jaccard", "lexical_match")
    )


def _semantic_dedup_oracle() -> str:
    from flink_uba_spark.functions.hashing import MERSENNE31, NGRAM_C

    inner = _near_dup_oracle()
    c0, c1, c2 = NGRAM_C
    return f"""
WITH pairs AS ({inner}),
dt AS (
    SELECT doc_id, text,
           list_transform(string_split(text, ' '),
                          t -> ('0x' || substring(md5(t), 1, 15))::BIGINT % {MERSENNE31}) AS th
    FROM documents
),
sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(th) >= 3
                THEN list_transform(generate_series(1, len(th) - 2),
                                    i -> (th[i]*{c0} + th[i+1]*{c1} + th[i+2]*{c2}) % {MERSENNE31})
                ELSE [('0x' || substring(md5(text), 1, 15))::BIGINT % {MERSENNE31}] END) AS sh
    FROM dt
)
SELECT p.a_id, p.b_id, p.cos,
       CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
       CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_union,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.05
           AS lexical_match
FROM pairs p
JOIN sh a ON a.doc_id = p.a_id
JOIN sh b ON b.doc_id = p.b_id
"""


# --------------------------------------------------- round-3 pipeline ops
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: (doc_id, shard, pos). Shard =
    md5 bucket (one hash exchange), pos = per-shard md5-order rank — never
    a global sort, so rank assignment parallelizes at any corpus size
    (operators/sampling.py:global_shuffle)."""
    from flink_uba_spark.operators.sampling import global_shuffle

    return global_shuffle(_docs(spark, sf_dir), n_shards=8).select(
        "doc_id", "shard", "pos"
    )


CORPUS_GLOBAL_SHUFFLE_ORACLE = """
WITH h AS (
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
    FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) AS BIGINT) AS pos
FROM h
"""


def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (sample ∝ n^0.5): exact integer
    quotas per source — dominant sources down-weighted, rare up-weighted —
    every arithmetic step integer-quantized so the mix is bit-reproducible
    on any engine (operators/sampling.py:temperature_mixture_sample)."""
    from flink_uba_spark.operators.sampling import temperature_mixture_sample

    return temperature_mixture_sample(
        _docs(spark, sf_dir), strata_col="source", total=200
    ).select("doc_id", "source")


DOC_MIXTURE_SAMPLE_ORACLE = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
q AS (SELECT source, n, CAST(floor(sqrt(n) * 1000000) AS BIGINT) AS w FROM c),
qq AS (SELECT source, least(n, (200 * w) // (SELECT sum(w) FROM q)) AS quota FROM q),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
SELECT r.doc_id, r.source
FROM r JOIN qq USING (source)
WHERE r.rn <= qq.quota
"""


def split_no_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/test split: near-duplicate docs (MinHash LSH →
    connected components) share one split decision keyed on the CLUSTER id,
    so paraphrases can never straddle train and test
    (operators/dedup.py:cluster_aware_split)."""
    return D.cluster_aware_split(_docs(spark, sf_dir)).select(
        "doc_id", "cluster_id", "split"
    )


def _split_no_leakage_oracle() -> str:
    return f"""
WITH cl AS (SELECT * FROM ({_clusters_oracle()}) t),
ad AS (
    SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
)
SELECT doc_id, cluster_id,
       CASE WHEN ('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT
                 % 1000 < 100
            THEN 'test' ELSE 'train' END AS split
FROM ad
"""


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continual-ingestion dedup: docs with doc_id ≡ 7 (mod 10) play the
    incoming batch, the rest the existing corpus; each incoming doc is
    classified exact_dup / near_dup / new against the corpus only
    (operators/dedup.py:incremental_dedup_verdicts)."""
    docs = _docs(spark, sf_dir)
    incoming = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    return D.incremental_dedup_verdicts(incoming, corpus)


def _dedup_incremental_oracle() -> str:
    return f"""
WITH bands AS (SELECT * FROM ({_minhash_bands_sql()}) t),
inc AS (SELECT doc_id, md5(text) AS d FROM documents WHERE doc_id % 10 = 7),
corp AS (SELECT DISTINCT md5(text) AS d FROM documents WHERE doc_id % 10 <> 7),
exact AS (SELECT DISTINCT i.doc_id FROM inc i JOIN corp c ON i.d = c.d),
corpb AS (SELECT DISTINCT band_idx, band_key FROM bands WHERE doc_id % 10 <> 7),
near AS (
    SELECT DISTINCT b.doc_id
    FROM bands b JOIN corpb cb
      ON b.band_idx = cb.band_idx AND b.band_key = cb.band_key
    WHERE b.doc_id % 10 = 7
)
SELECT i.doc_id,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN n.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'new' END AS verdict
FROM inc i
LEFT JOIN exact e ON i.doc_id = e.doc_id
LEFT JOIN near n ON i.doc_id = n.doc_id
"""


def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram per language — the profiling
    rollup every curation run starts with (what to truncate, what to drop,
    how skewed the corpus is). Exact integer buckets (floor(log2) via
    bit_length of the BIGINT char count, no float log), one partial-agg
    exchange carrying ≤ langs×buckets rows at any corpus size."""
    docs = _docs(spark, sf_dir)
    # floor(log2(n)) = length(bin(n)) - 1 for n >= 1: pure integer — float
    # log2 can disagree between engines exactly at bucket edges
    return (
        docs.select(
            "lang",
            (F.length(F.expr("bin(n_chars)")) - 1).alias("len_bucket"),
        )
        .groupBy("lang", "len_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


CORPUS_LENGTH_HISTOGRAM_ORACLE = """
SELECT lang,
       CAST(length(bin(n_chars)) - 1 AS INT) AS len_bucket,
       count(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage profiling: per-doc out-of-vocabulary rate against
    the corpus's own top-256 tokens (standing in for a fixed tokenizer
    vocab). The vocab is a two-exchange rollup whose result is vocab-sized
    → broadcast back; the probe is explode → broadcast-hash marker join →
    per-doc rollup. Exact integers plus one final double division."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok").isNotNull())
    # orderBy+limit = TakeOrderedAndProject: distributed per-partition
    # top-256 then a 256-row merge — never a global single-task sort/window
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), F.asc("tok"))
        .limit(256)
        .select("tok")
        .withColumn("__inv", F.lit(1))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__inv").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
    )


DOC_OOV_RATE_ORACLE = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
    SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS r
        FROM toks GROUP BY tok
    ) WHERE r <= 256
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
           AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id
"""


def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-document duplicated-span coverage (8-token windows)."""
    return D.span_dedup_stats(_docs(spark, sf_dir))


DEDUP_SPAN_EXACT_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (
    SELECT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS span_h
    FROM t, unnest(range(1, len(w) - 6)) AS u(i)
),
pd AS (SELECT span_h, doc_id, count(*) AS occ FROM s GROUP BY 1, 2),
ph AS (SELECT doc_id, occ, count(*) OVER (PARTITION BY span_h) AS n_docs_h FROM pd),
st AS (
    SELECT doc_id,
           sum(occ) AS n_spans,
           sum(CASE WHEN n_docs_h >= 2 THEN occ ELSE 0 END) AS n_dup_spans
    FROM ph GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(st.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(st.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CASE WHEN st.n_spans IS NULL OR st.n_spans = 0 THEN 0.0
            ELSE CAST(st.n_dup_spans AS DOUBLE) / st.n_spans END AS dup_span_frac
FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
"""


def dedup_span_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup with TEXT REWRITE (Lee et al. 2021's removal
    rule at 8-token granularity; round 8): cross-document duplicated
    spans are CUT from every occurrence except the corpus-first one, and
    each doc's surviving tokens re-join in order — span_dedup_stats
    measures, this one acts. Emits the cleaned corpus plus conservation
    counters (n_tokens, n_removed)."""
    return D.span_dedup_rewrite(_docs(spark, sf_dir))


DEDUP_SPAN_REWRITE_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (
    SELECT doc_id, i, md5(array_to_string(w[i:i+7], ' ')) AS h
    FROM t, unnest(range(1, len(w) - 6)) AS u(i)
),
dup AS (SELECT h FROM s GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
occ AS (
    SELECT s.doc_id, s.i,
           row_number() OVER (PARTITION BY s.h ORDER BY s.doc_id, s.i) AS rk
    FROM s JOIN dup USING (h)
),
cov AS (
    SELECT DISTINCT occ.doc_id, u.p
    FROM occ, unnest(range(occ.i, occ.i + 8)) AS u(p)
    WHERE occ.rk > 1
),
tok AS (
    SELECT doc_id, unnest(w) AS tok,
           generate_subscripts(w, 1) AS pos
    FROM t
),
clean AS (
    SELECT tok.doc_id,
           coalesce(string_agg(tok.tok, ' ' ORDER BY tok.pos)
                    FILTER (WHERE cov.p IS NULL), '') AS clean_text,
           count(*) AS n_tokens,
           count(cov.p) AS n_removed
    FROM tok LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.p = tok.pos
    GROUP BY tok.doc_id
)
SELECT d.doc_id, c.clean_text,
       CAST(c.n_tokens AS BIGINT) AS n_tokens,
       CAST(c.n_removed AS BIGINT) AS n_removed
FROM documents d JOIN clean c ON c.doc_id = d.doc_id
"""


def source_curation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level keep/drop verdicts from per-doc quality + dup evidence."""
    from flink_uba_spark.operators import corpus as C

    return C.source_curation_rollup(_docs(spark, sf_dir))


SOURCE_CURATION_ROLLUP_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source, string_split(text, ' ') AS w, md5(text) AS h
    FROM documents
),
q AS (
    SELECT source, doc_id, h,
           CAST(len(w) AS BIGINT) AS n_words,
           CAST(len(list_filter(w, x -> list_contains({_STOP_EN_SQL}, x))) AS BIGINT)
               AS n_stop
    FROM t
),
d AS (
    SELECT source, n_words, n_stop,
           doc_id != min(doc_id) OVER (PARTITION BY h) AS is_dup,
           CASE WHEN n_words >= 20 AND CAST(n_stop AS DOUBLE) / n_words >= 0.05
                THEN 1 ELSE 0 END AS is_high
    FROM q
),
a AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_stop) AS BIGINT) AS total_stop,
           CAST(sum(is_high) AS BIGINT) AS n_high
    FROM d GROUP BY 1
)
SELECT source, n_docs, n_dup_docs,
       CAST(n_dup_docs AS DOUBLE) / n_docs AS dup_rate,
       total_words,
       CAST(total_stop AS DOUBLE) / total_words AS stop_ratio,
       CAST(n_high AS DOUBLE) / n_docs AS high_share,
       (n_high * 1000 >= 300 * n_docs AND n_dup_docs * 1000 <= 500 * n_docs) AS keep
FROM a
"""


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: lexical BM25 top-20 and dense cosine top-20 (query
    vector 0, vec_id ≡ doc_id in the testdata) fused with reciprocal-rank
    fusion (operators/search.py:rrf_fuse) — the standard production
    two-tower + keyword combiner. The fusion layer joins two already-top-k
    lists, so its cost is O(k) regardless of corpus size."""
    from flink_uba_spark.operators.search import bm25_topk, rrf_fuse

    docs = _docs(spark, sf_dir)
    embs = _embs(spark, sf_dir)
    lex = bm25_topk(docs, BM25_TERMS, k=20).select("doc_id", "rnk")
    dense = (
        S.cosine_topk(embs, embs.filter(F.col("vec_id") == 0), k=20)
        .select(F.col("neighbor_id").alias("doc_id"), "rnk")
    )
    return rrf_fuse([lex, dense], k=10)


HYBRID_SEARCH_RRF_ORACLE = f"""
WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS w,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
    FROM documents
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
    FROM d
),
hits AS (SELECT doc_id, dl, unnest(w) AS term FROM d),
tf AS (
    SELECT doc_id, term, dl, CAST(count(*) AS BIGINT) AS tf
    FROM hits WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
    SELECT t.doc_id,
           CAST(floor(((s.n_docs - f.df + 0.5) / (f.df + 0.5))
                      * ((t.tf * 2.2) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dl / s.avgdl)))
                      * 1000000) AS BIGINT) AS term_q
    FROM tf t JOIN dfreq f USING (term) CROSS JOIN stats s
),
per AS (SELECT doc_id, CAST(sum(term_q) AS BIGINT) AS score_q FROM scored GROUP BY 1),
lex AS (
    SELECT doc_id, rnk FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id) AS rnk FROM per
    ) WHERE rnk <= 20
),
n AS (
    SELECT vec_id, {_QUANT_SQL} AS qemb,
           list_dot_product({_QUANT_SQL}, {_QUANT_SQL}) AS qq
    FROM embeddings
),
dscored AS (
    SELECT c.vec_id AS doc_id,
           list_dot_product(q.qemb, c.qemb) / (sqrt(q.qq) * sqrt(c.qq)) AS cos
    FROM n q JOIN n c ON c.vec_id != q.vec_id
    WHERE q.vec_id = 0
),
dense AS (
    SELECT doc_id, rnk FROM (
        SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rnk FROM dscored
    ) WHERE rnk <= 20
),
fused AS (
    SELECT coalesce(l.doc_id, de.doc_id) AS doc_id,
           coalesce(CAST(1 AS DOUBLE) / (60.0 + l.rnk), CAST(0 AS DOUBLE))
           + coalesce(CAST(1 AS DOUBLE) / (60.0 + de.rnk), CAST(0 AS DOUBLE))
               AS score_rrf
    FROM lex l FULL OUTER JOIN dense de ON l.doc_id = de.doc_id
)
SELECT doc_id, score_rrf, rnk FROM (
    SELECT *, row_number() OVER (ORDER BY score_rrf DESC, doc_id) AS rnk FROM fused
) WHERE rnk <= 10
"""


def classifier_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering — the classifier gate of an LLM data
    pipeline (the GPT-3/LLaMA quality-classifier stage): a linear scorer
    over hashed token features, integer weights broadcast from a 256-row
    dim (operators/text.py:classifier_quality_scores; a trained model
    plugs into the same frame). Deterministic integer arithmetic end to
    end, so the DuckDB oracle replicates it exactly."""
    from flink_uba_spark.operators.text import classifier_quality_scores

    return classifier_quality_scores(_docs(spark, sf_dir))


CLASSIFIER_QUALITY_FILTER_ORACLE = """
WITH w AS (
  SELECT CAST(b AS INTEGER) AS bucket,
         CAST(('0x' || substring(md5('w' || CAST(b AS VARCHAR)), 1, 4))::BIGINT % 16 - 8
              AS BIGINT) AS weight
  FROM generate_series(0, 255) AS g(b)
),
t AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 4))::BIGINT % 256 AS INTEGER) AS bucket
  -- COALESCE inside string_split: a NULL text must yield one '' token
  -- (matching Spark's coalesce(text,'') -> split), not zero rows
  FROM documents, unnest(string_split(COALESCE(text, ''), ' ')) AS u(tok)
),
s AS (
  SELECT t.doc_id, sum(w.weight) AS score FROM t JOIN w USING (bucket) GROUP BY 1
)
SELECT d.doc_id, CAST(COALESCE(s.score, 0) AS BIGINT) AS score,
       COALESCE(s.score, 0) >= 0 AS keep
FROM documents d LEFT JOIN s USING (doc_id)
"""


_CLASSIFIER_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "classifier_weights.parquet",
)


def classifier_quality_filter_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier gate serving TRAINED weights (round 6, closing r5
    verdict item 5: the trained path previously lived only in tests while
    the catalog served the synthetic dim): pyspark.ml logistic regression
    fit offline on the deterministic labeled fixture
    (tools/train_classifier_fixture.py), quantized to the integer
    (bucket, weight) frame and committed as
    fixtures/classifier_weights.parquet — the production flow, where
    training happens once and serving loads the persisted dim. The
    serving plan is byte-identical to ``classifier_quality_filter``
    (broadcast 256-row dim, one exchange, integer score); the oracle
    reads the SAME parquet, so the hash gate checks the whole
    train→persist→serve loop. ``engine.curate(classifier_weights=...)``
    accepts this frame directly."""
    from flink_uba_spark.operators.text import classifier_quality_scores

    w = spark.read.parquet(_CLASSIFIER_FIXTURE).select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("weight").cast("long").alias("weight"),
    )
    return classifier_quality_scores(_docs(spark, sf_dir), weights=w)


CLASSIFIER_QUALITY_FILTER_TRAINED_ORACLE = f"""
WITH w AS (
  SELECT CAST(bucket AS INTEGER) AS bucket, CAST(weight AS BIGINT) AS weight
  FROM read_parquet('{_CLASSIFIER_FIXTURE}')
),
t AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 4))::BIGINT % 256 AS INTEGER) AS bucket
  FROM documents, unnest(string_split(COALESCE(text, ''), ' ')) AS u(tok)
),
s AS (
  SELECT t.doc_id, sum(w.weight) AS score FROM t JOIN w USING (bucket) GROUP BY 1
)
SELECT d.doc_id, CAST(COALESCE(s.score, 0) AS BIGINT) AS score,
       COALESCE(s.score, 0) >= 0 AS keep
FROM documents d LEFT JOIN s USING (doc_id)
"""


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed TOKENIZER TRAINING (round 6): learn 6 BPE merge rules
    from the corpus — the missing piece beside vocabulary/token-count/OOV:
    a pipeline must LEARN the subword vocab it tokenizes with.
    operators/tokenizer.py:bpe_train — corpus scanned ONCE into the
    cached (word, count) vocab (Sennrich-style learn-BPE), each merge =
    one pair-count hash aggregate over the vocab + a one-row argmax +
    one literal replace; the corpus is never rescanned. Integer counts,
    (count DESC, lhs, rhs) tie-break, and the two-space-delimiter greedy
    replace make the DuckDB oracle — the same 6 iterations unrolled as
    chained CTEs, the PageRank precedent — hash-match bit-for-bit."""
    from flink_uba_spark.operators.tokenizer import bpe_train

    return bpe_train(_docs(spark, sf_dir), n_merges=6)


def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving half of the tokenizer: apply the learned merges and
    count BPE tokens per document (the token-budget accounting a training
    pipeline schedules by). The 6 rules fold into the plan as chained
    codegen'd literal replaces (no per-row Python, no rules join);
    production persists the merge table once and reuses it —
    re-training here keeps the query self-contained and deterministic."""
    from flink_uba_spark.operators.tokenizer import bpe_segment, bpe_train

    docs = _docs(spark, sf_dir)
    rules = [(r.lhs, r.rhs) for r in bpe_train(docs, n_merges=6).collect()]
    return bpe_segment(docs, rules)


def _bpe_chain_sql(n_merges: int = 6) -> str:
    """The learn-BPE iterations unrolled as DuckDB CTEs (shared by both
    BPE oracles): w0 = the char-symbol vocab, then per merge i a
    pair-count (p), a deterministic argmax (b), and the greedy
    two-space-delimiter replace (w)."""
    base = """w0 AS (
  SELECT word, cnt,
         ' ' || array_to_string(string_split(word, ''), '  ') || ' ' AS syms
  FROM (
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS word FROM documents)
    WHERE regexp_matches(word, '^[A-Za-z]+$')
    GROUP BY word
  )
)"""
    parts = [base]
    for i in range(1, n_merges + 1):
        parts.append(f"""p{i} AS (
  SELECT l[i] AS lhs, l[i + 1] AS rhs, CAST(sum(cnt) AS BIGINT) AS pair_count
  FROM (
    SELECT cnt, l, unnest(generate_series(1, len(l) - 1)) AS i
    FROM (SELECT cnt, string_split(trim(syms), '  ') AS l FROM w{i - 1})
  )
  GROUP BY 1, 2
),
b{i} AS (SELECT lhs, rhs, pair_count FROM p{i} ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
w{i} AS (
  SELECT w.word, w.cnt,
         replace(w.syms, ' ' || b.lhs || '  ' || b.rhs || ' ',
                         ' ' || b.lhs || b.rhs || ' ') AS syms
  FROM w{i - 1} w CROSS JOIN b{i} b
)""")
    return "WITH " + ",\n".join(parts)


def _bpe_train_oracle(n_merges: int = 6) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, lhs, rhs, pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return _bpe_chain_sql(n_merges) + "\n" + union


def _bpe_token_counts_oracle(n_merges: int = 6) -> str:
    return _bpe_chain_sql(n_merges) + f""",
docw AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS word
    FROM documents
  ) WHERE regexp_matches(word, '^[A-Za-z]+$')
)
SELECT dw.doc_id,
       CAST(sum(len(string_split(trim(wk.syms), '  '))) AS BIGINT) AS bpe_tokens
FROM docw dw JOIN w{n_merges} wk USING (word)
GROUP BY 1
"""


BPE_TRAIN_MERGES_ORACLE = _bpe_train_oracle()
BPE_TOKEN_COUNTS_ORACLE = _bpe_token_counts_oracle()


def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling rollup over the events table — per-column null and
    exact-distinct counts in one pass (operators/util.py:profile_columns:
    single Expand + two-level hash aggregate, the multi-distinct shape)."""
    from flink_uba_spark.operators.util import profile_columns
    from flink_uba_spark.sources.readers import load_testdata

    ev = load_testdata(spark, sf_dir, ("events",))["events"]
    return profile_columns(ev, ["event_id", "user_id", "event_type", "props"])


EVENTS_PROFILE_ORACLE = """
SELECT 'event_id' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       count(DISTINCT event_id) AS n_distinct FROM events
UNION ALL
SELECT 'user_id', count(*),
       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT user_id) FROM events
UNION ALL
SELECT 'event_type', count(*),
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT event_type) FROM events
UNION ALL
SELECT 'props', count(*),
       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT props) FROM events
"""


def semantic_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed k-means clustering (round 6):
    operators/similarity.py:kmeans_train_exact — Lloyd's over
    quantized-int64 embeddings, init = 8 lowest-id vectors, 3 iterations,
    integer squared-L2 with (dist, cid) lexicographic argmin, floor-div
    centroid updates, empty clusters keep their previous centroid. The
    DuckDB oracle replays the ENTIRE training loop (iterations unrolled
    as CTEs, the BPE/PageRank precedent) so the hash gate covers
    training, not just the final assignment pass. Each iteration is one
    map-only Arrow-kernel scan (the centroid matrix ships in the task
    closure, round 12) + one (cluster, dim) hash aggregate — nothing
    all-pairs, k·dim driver round-trip per iteration."""
    from flink_uba_spark.operators.similarity import kmeans_train_exact

    return kmeans_train_exact(_embs(spark, sf_dir), k=8, iters=3)


def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sampling: train the deterministic
    k-means, then take up to 20 vectors PER CLUSTER by md5(vec_id) order
    — the cluster-then-sample curation step that keeps a training mix
    topically diverse instead of letting one dense mode dominate.
    Deterministic (md5 pseudo-order, vec_id tie-break), one extra
    per-cluster window over the final assignment."""
    from pyspark.sql import Window

    from flink_uba_spark.operators.similarity import kmeans_train_exact

    a = kmeans_train_exact(_embs(spark, sf_dir), k=8, iters=3)
    w = Window.partitionBy("cluster_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        a.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= 20)
        .select("cluster_id", "vec_id", "pick_rank")
    )


def _kmeans_chain_sql(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """The k-means training loop unrolled as DuckDB CTEs (shared by both
    clustering oracles): q = quantized vectors, c1 = lowest-id init, then
    per iteration an assignment (a{t}: lexicographic (dist, cid) argmin
    over the centroid list) and a floor-div centroid update (c{t+1};
    empty clusters keep the previous centroid via the LEFT JOIN
    coalesce). Lists are 1-indexed in DuckDB, cluster/dim ids 0-indexed —
    hence the c-1 / i-1 shifts mirroring Spark's posexplode."""
    parts = [
        f"q AS (SELECT vec_id, {_QUANT_SQL} AS qv FROM embeddings)",
        (
            "c1 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cv\n"
            f"  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {k}))"
        ),
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"cents{t} AS (SELECT list(cv ORDER BY cid) AS cbs FROM c{t})"
        )
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, qv,
         list_min(list_transform(generate_series(1, {k}), c ->
             [list_sum(list_transform(generate_series(1, {dim}),
                  i -> (qv[i] - cbs[c][i]) * (qv[i] - cbs[c][i]))), c - 1])) AS best
  FROM q, cents{t}
)"""
        )
        if t < iters:
            parts.append(
                f"""u{t} AS (
  SELECT best[2] AS cid, i, CAST(sum(qv[i]) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS c
  FROM a{t}, generate_series(1, {dim}) g(i) GROUP BY 1, 2
)"""
            )
            parts.append(
                f"cn{t} AS (SELECT cid, list((s - ((s % c) + c) % c) // c ORDER BY i) AS cv\n"
                f"  FROM u{t} GROUP BY cid)"
            )
            parts.append(
                f"c{t + 1} AS (SELECT p.cid, COALESCE(n.cv, p.cv) AS cv\n"
                f"  FROM c{t} p LEFT JOIN cn{t} n ON n.cid = p.cid)"
            )
    return "WITH " + ",\n".join(parts)


def _kmeans_assign_oracle(k: int = 8, iters: int = 3) -> str:
    return f"""{_kmeans_chain_sql(k, iters)}
SELECT vec_id, CAST(best[2] AS BIGINT) AS cluster_id,
       CAST(best[1] AS BIGINT) AS sqdist
FROM a{iters}
"""


def _cluster_balanced_sample_oracle(k: int = 8, iters: int = 3) -> str:
    return f"""{_kmeans_chain_sql(k, iters)}
SELECT cluster_id, vec_id, pick_rank FROM (
    SELECT CAST(best[2] AS BIGINT) AS cluster_id, vec_id,
           row_number() OVER (
               PARTITION BY best[2]
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
           ) AS pick_rank
    FROM a{iters}
) WHERE pick_rank <= 20
"""


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding OUTLIER detection (round 7): vectors whose integer
    sq-L2 distance to their own k-means centroid exceeds the cluster's
    exact nearest-rank p90 — the curation step that drops noisy /
    mis-embedded points before training (the distance-tail sibling of
    cluster_balanced_sample's diversity cap). Nearest-rank keeps the
    whole query in integer arithmetic (the order_value_percentiles
    convention); the threshold table is k rows, broadcast back.

    Scale: one kmeans training (map-only scans + k·dim aggregates), one
    (cluster) window pass for the rank — per-cluster sort is bounded by
    cluster size — and a broadcast join; nothing all-pairs."""
    from pyspark.sql import Window

    from flink_uba_spark.operators.similarity import kmeans_train_exact

    a = kmeans_train_exact(_embs(spark, sf_dir), k=8, iters=3)
    w = Window.partitionBy("cluster_id").orderBy("sqdist", "vec_id")
    wf = Window.partitionBy("cluster_id")
    # one pass over the assignment: rank, pick the nearest-rank value via
    # a conditional window max, filter — no self-join, so the (driver-
    # looped) training/assignment plan is evaluated once
    ranked = a.withColumn("rk", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(wf)
    )
    return (
        ranked.withColumn(
            "p90_sqdist",
            F.max(
                F.when(F.col("rk") == F.expr("-((-9 * cnt) div 10)"), F.col("sqdist"))
            ).over(wf),
        )
        .filter(F.col("sqdist") > F.col("p90_sqdist"))
        .select("vec_id", "cluster_id", "sqdist", "p90_sqdist")
    )


def _embedding_outliers_oracle(k: int = 8, iters: int = 3) -> str:
    return f"""{_kmeans_chain_sql(k, iters)},
assign AS (
    SELECT vec_id, CAST(best[2] AS BIGINT) AS cluster_id,
           CAST(best[1] AS BIGINT) AS sqdist
    FROM a{iters}
),
ranked AS (
    SELECT *, row_number() OVER (
               PARTITION BY cluster_id ORDER BY sqdist, vec_id) AS rk,
           count(*) OVER (PARTITION BY cluster_id) AS cnt
    FROM assign
),
thresh AS (
    SELECT cluster_id, sqdist AS p90_sqdist FROM ranked
    WHERE rk = -((-9 * cnt) // 10)
)
SELECT a.vec_id, a.cluster_id, a.sqdist, t.p90_sqdist
FROM assign a JOIN thresh t USING (cluster_id)
WHERE a.sqdist > t.p90_sqdist
"""


SEMANTIC_KMEANS_ASSIGN_ORACLE = _kmeans_assign_oracle()
EMBEDDING_OUTLIERS_ORACLE = _embedding_outliers_oracle()
CLUSTER_BALANCED_SAMPLE_ORACLE = _cluster_balanced_sample_oracle()


QUERIES = {
    "classifier_quality_filter": classifier_quality_filter,
    "semantic_kmeans_assign": semantic_kmeans_assign,
    "embedding_outliers": embedding_outliers,
    "cluster_balanced_sample": cluster_balanced_sample,
    "classifier_quality_filter_trained": classifier_quality_filter_trained,
    "bpe_train_merges": bpe_train_merges,
    "bpe_token_counts": bpe_token_counts,
    "events_profile": events_profile,
    "corpus_vocabulary": corpus_vocabulary,
    "corpus_collocations_pmi": corpus_collocations_pmi,
    "heavy_hitter_bigrams": heavy_hitter_bigrams,
    "dedup_span_exact": dedup_span_exact,
    "dedup_span_rewrite": dedup_span_rewrite,
    "source_curation_rollup": source_curation_rollup,
    "hybrid_search_rrf": hybrid_search_rrf,
    "corpus_length_histogram": corpus_length_histogram,
    "doc_oov_rate": doc_oov_rate,
    "semantic_dedup_verified": semantic_dedup_verified,
    "dedup_canonical_selection": dedup_canonical_selection,
    "decontam_ngram_overlap": decontam_ngram_overlap,
    "text_repetition_signals": text_repetition_signals,
    "text_lm_quality": text_lm_quality,
    "pack_training_sequences": pack_training_sequences,
    "doc_chunks_overlap": doc_chunks_overlap,
    "bm25_keyword_search": bm25_keyword_search,
    "tfidf_doc_keywords": tfidf_doc_keywords,
    "doc_train_test_split": doc_train_test_split,
    "doc_stratified_sample": doc_stratified_sample,
    "doc_quota_sample": doc_quota_sample,
    "corpus_curation_stats": corpus_curation_stats,
    "multimodal_decode": multimodal_decode,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
    "text_token_count": text_token_count,
    "text_quality_score": text_quality_score,
    "gopher_rule_gate": gopher_rule_gate,
    "dsir_importance_selection": dsir_importance_selection,
    "matryoshka_recall_sweep": matryoshka_recall_sweep,
    "quality_decile_curriculum": quality_decile_curriculum,
    "text_lang_id": text_lang_id,
    "lang_id_confusion": lang_id_confusion,
    "text_fingerprint": text_fingerprint,
    "text_pii_scrub": text_pii_scrub,
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_clusters": dedup_clusters,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_sorted_neighborhood": dedup_sorted_neighborhood,
    "embedding_cosine_topk": embedding_cosine_topk,
    "embedding_ivf_topk": embedding_ivf_topk,
    "ivf_index_upsert": ivf_index_upsert_ops,
    "ivf_recall_sweep": ivf_recall_sweep,
    "embedding_topic_clusters": embedding_topic_clusters,
    "embedding_pq_topk": embedding_pq_topk,
    "embedding_near_dup_lsh": embedding_near_dup_lsh,
    "corpus_global_shuffle": corpus_global_shuffle,
    "doc_mixture_sample": doc_mixture_sample,
    "split_no_leakage": split_no_leakage,
    "dedup_incremental": dedup_incremental,
}

ORACLES = {
    "classifier_quality_filter": CLASSIFIER_QUALITY_FILTER_ORACLE,
    "semantic_kmeans_assign": SEMANTIC_KMEANS_ASSIGN_ORACLE,
    "embedding_outliers": EMBEDDING_OUTLIERS_ORACLE,
    "cluster_balanced_sample": CLUSTER_BALANCED_SAMPLE_ORACLE,
    "classifier_quality_filter_trained": CLASSIFIER_QUALITY_FILTER_TRAINED_ORACLE,
    "bpe_train_merges": BPE_TRAIN_MERGES_ORACLE,
    "bpe_token_counts": BPE_TOKEN_COUNTS_ORACLE,
    "events_profile": EVENTS_PROFILE_ORACLE,
    "corpus_vocabulary": CORPUS_VOCABULARY_ORACLE,
    "corpus_collocations_pmi": CORPUS_COLLOCATIONS_PMI_ORACLE,
    "heavy_hitter_bigrams": HEAVY_HITTER_BIGRAMS_ORACLE,
    "dedup_span_exact": DEDUP_SPAN_EXACT_ORACLE,
    "dedup_span_rewrite": DEDUP_SPAN_REWRITE_ORACLE,
    "source_curation_rollup": SOURCE_CURATION_ROLLUP_ORACLE,
    "hybrid_search_rrf": HYBRID_SEARCH_RRF_ORACLE,
    "corpus_length_histogram": CORPUS_LENGTH_HISTOGRAM_ORACLE,
    "doc_oov_rate": DOC_OOV_RATE_ORACLE,
    "corpus_global_shuffle": CORPUS_GLOBAL_SHUFFLE_ORACLE,
    "doc_mixture_sample": DOC_MIXTURE_SAMPLE_ORACLE,
    "split_no_leakage": _split_no_leakage_oracle(),
    "dedup_incremental": _dedup_incremental_oracle(),
    "semantic_dedup_verified": _semantic_dedup_oracle(),
    "dedup_canonical_selection": _canonical_selection_oracle(),
    "decontam_ngram_overlap": DECONTAM_ORACLE,
    "text_repetition_signals": TEXT_REPETITION_ORACLE,
    "text_lm_quality": TEXT_LM_QUALITY_ORACLE,
    "pack_training_sequences": PACK_SEQUENCES_ORACLE,
    "doc_chunks_overlap": DOC_CHUNKS_ORACLE,
    "bm25_keyword_search": BM25_ORACLE,
    "tfidf_doc_keywords": TFIDF_KEYWORDS_ORACLE,
    "doc_train_test_split": DOC_TRAIN_TEST_SPLIT_ORACLE,
    "doc_stratified_sample": DOC_STRATIFIED_SAMPLE_ORACLE,
    "doc_quota_sample": DOC_QUOTA_SAMPLE_ORACLE,
    "corpus_curation_stats": CORPUS_CURATION_STATS_ORACLE,
    "multimodal_decode": MULTIMODAL_DECODE_ORACLE,
    "multimodal_resize": MULTIMODAL_RESIZE_ORACLE,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SAMPLE_ORACLE,
    "text_token_count": TEXT_TOKEN_COUNT_ORACLE,
    "text_quality_score": TEXT_QUALITY_ORACLE,
    "gopher_rule_gate": GOPHER_RULE_GATE_ORACLE,
    "dsir_importance_selection": DSIR_IMPORTANCE_ORACLE,
    "matryoshka_recall_sweep": _matryoshka_recall_oracle(),
    "quality_decile_curriculum": QUALITY_DECILE_ORACLE,
    "text_lang_id": TEXT_LANG_ID_ORACLE,
    "lang_id_confusion": LANG_ID_CONFUSION_ORACLE,
    "text_fingerprint": TEXT_FINGERPRINT_ORACLE,
    "text_pii_scrub": TEXT_PII_SCRUB_ORACLE,
    "dedup_exact": DEDUP_EXACT_ORACLE,
    "dedup_minhash_lsh": _minhash_oracle(),
    "dedup_clusters": _clusters_oracle(),
    "dedup_simhash": DEDUP_SIMHASH_ORACLE,
    "dedup_ngram_jaccard": _jaccard_oracle(),
    "dedup_sorted_neighborhood": DEDUP_SNM_ORACLE,
    "embedding_cosine_topk": EMBEDDING_TOPK_ORACLE,
    "embedding_ivf_topk": EMBEDDING_IVF_ORACLE,
    "ivf_index_upsert": IVF_INDEX_UPSERT_ORACLE,
    "ivf_recall_sweep": _ivf_recall_oracle(),
    "embedding_topic_clusters": EMBEDDING_TOPIC_CLUSTERS_ORACLE,
    "embedding_pq_topk": EMBEDDING_PQ_ORACLE,
    "embedding_near_dup_lsh": _near_dup_oracle(),
}
