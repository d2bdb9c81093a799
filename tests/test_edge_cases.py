"""Degenerate-input hardening: empty frames and single-row extremes flow
through every operator without errors."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _empty_events(spark):
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    return spark.createDataFrame([], schema)


def test_windowed_topn_empty(spark):
    from flink_uba_spark.operators.topn import windowed_topn

    assert windowed_topn(_empty_events(spark), "user_id").count() == 0


def test_sequence_detect_empty(spark):
    from flink_uba_spark.operators.sequence import sequence_detect

    out = sequence_detect(
        _empty_events(spark),
        key="user_id",
        first_pred=F.col("event_type") == "signup",
        then_pred=F.col("event_type") == "purchase",
    )
    assert out.count() == 0


def test_reconcile_one_empty_side(spark):
    from flink_uba_spark.operators.reconcile import reconcile

    ev = _empty_events(spark).select(
        F.col("event_id").alias("pay_id"), "user_id", F.col("ts").alias("pay_ts")
    )
    full = spark.createDataFrame(
        [(1, 5, "2024-01-01 00:00:00")], "receipt_id long, user_id long, t string"
    ).select("receipt_id", "user_id", F.col("t").cast("timestamp").alias("receipt_ts"))
    out = reconcile(
        ev, full, on="user_id", left_ts="pay_ts", right_ts="receipt_ts",
        left_id="pay_id", right_id="receipt_id",
    ).collect()
    assert len(out) == 1 and out[0].status == "unmatched_right"


def test_sessionize_empty_and_single(spark):
    from flink_uba_spark.operators.sessions import sessionize

    assert sessionize(_empty_events(spark), key="user_id").count() == 0
    one = spark.createDataFrame([(1, "2024-01-01 00:00:00")], "user_id long, t string").select(
        "user_id", F.col("t").cast("timestamp").alias("ts")
    )
    rows = sessionize(one, key="user_id").collect()
    assert len(rows) == 1 and rows[0].n_events == 1


def test_dedup_single_word_docs(spark):
    """Docs shorter than the shingle width take the whole-text fallback."""
    from flink_uba_spark.operators.dedup import minhash_lsh_candidates, simhash

    docs = spark.createDataFrame(
        [(1, "spark"), (2, "spark"), (3, "flink")], "doc_id long, text string"
    )
    pairs = {(r.a_id, r.b_id) for r in minhash_lsh_candidates(docs).collect()}
    assert pairs == {(1, 2)}  # identical one-word docs collide; distinct ones don't
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sh[1] == sh[2] != sh[3]
    assert set(sh[1]) <= {"0", "1"} and len(sh[1]) == 32


def test_text_ops_on_stopword_free_text(spark):
    from flink_uba_spark.operators.text import lang_id, quality_score

    docs = spark.createDataFrame([(1, "zzz qqq xxx")], "doc_id long, text string")
    row = lang_id(docs).collect()[0]
    assert row.lang_pred == "en"  # deterministic all-zero tie-break
    q = quality_score(docs).collect()[0]
    assert q.n_words == 3 and q.quality == "low"


def test_jaccard_df_cap_drops_stop_shingles(spark):
    """max_bucket: a shingle present in more than max_bucket docs carries no
    signal and is dropped from the index — a pair sharing ONLY that shingle
    disappears; pairs sharing rarer shingles keep full-set sizes with
    n_inter counting kept shingles only."""
    from flink_uba_spark.operators.dedup import ngram_jaccard_pairs

    stop = "the quick fox"  # shared by all 4 docs -> df=4 > cap=3
    texts = [
        stop + " alpha beta gamma",        # 0: stop + unique tail
        stop + " alpha beta delta",        # 1: shares 'alpha beta *'-ish with 0
        stop + " omega psi chi",           # 2: only the stop shingle in common
        stop + " zeta eta theta",          # 3: only the stop shingle in common
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).withColumn("blk", F.lit(1))

    uncapped = {
        (r.a_id, r.b_id)
        for r in ngram_jaccard_pairs(docs, block_cols=("blk",), threshold=0.001).collect()
    }
    capped_rows = ngram_jaccard_pairs(
        docs, block_cols=("blk",), threshold=0.001, max_bucket=3
    ).collect()
    capped = {(r.a_id, r.b_id): r for r in capped_rows}

    assert (2, 3) in uncapped  # stop-shingle-only pair exists uncapped
    assert (2, 3) not in capped  # ...and is pruned by the cap
    assert (0, 1) in capped  # rare-shingle pair survives
    r = capped[(0, 1)]
    # doc0/doc1 share 'quick fox alpha' and 'fox alpha beta' after the cap
    # drops 'the quick fox'; sizes stay full-set (4 shingles each)
    assert r.n_inter == 2 and r.n_union == 6


def test_corpus_ops_degenerate_docs(spark):
    """Empty and single-word docs flow through every corpus operator with
    pinned semantics (split('') yields one empty token; short docs fall
    back to a whole-text shingle)."""
    from flink_uba_spark.operators.corpus import (
        chunk_text,
        decontaminate,
        pack_sequences,
        repetition_signals,
    )

    df = spark.createDataFrame(
        [(0, ""), (1, "solo"), (2, "a b")], "doc_id long, text string"
    )
    rep = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert rep[0]["n_words"] == 1 and rep[0]["n_distinct_words"] == 1
    assert rep[1]["top_word_count"] == 1 and rep[1]["top_bigram_count"] == 1
    assert rep[2]["top_bigram_count"] == 1  # one real bigram "a b"

    ch = chunk_text(df, chunk_words=4, stride_words=3).collect()
    assert len(ch) == 3  # one whole-doc chunk each
    assert {r["chunk_text"] for r in ch} == {"", "solo", "a b"}

    # short docs: whole-text shingle — identical text in eval contaminates
    dec = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(df, df.filter(F.col("doc_id") == 1)).collect()
    }
    assert dec == {0: False, 1: True, 2: False}

    packed = {r["doc_id"]: r for r in pack_sequences(
        spark.createDataFrame([(0, 0), (1, 5)], "doc_id long, n_tokens long"),
        capacity=4,
    ).collect()}
    assert packed[0]["global_offset"] == 0 and packed[0]["pack_id"] == 0
    assert packed[1]["global_offset"] == 0  # zero-token doc consumes nothing
