"""Unit tests for the corpus-prep operators (operators/corpus.py,
operators/search.py): decontamination, repetition signals, sequence
packing, chunking, BM25."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def docs_df(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


# ------------------------------------------------------------ decontaminate
def test_decontaminate_flags_overlap(spark):
    from flink_uba_spark.operators.corpus import decontaminate

    train = docs_df(
        spark,
        [
            "alpha beta gamma delta",      # shares "alpha beta gamma" with eval
            "one two three four five",     # disjoint
            "zz",                          # short doc → whole-text shingle
        ],
    )
    eval_docs = spark.createDataFrame(
        [(100, "alpha beta gamma epsilon"), (101, "zz")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, eval_docs).collect()
    }
    assert out[0]["contaminated"] and out[0]["n_shared"] == 1
    assert out[0]["n_shingles"] == 2
    assert not out[1]["contaminated"] and out[1]["n_shared"] == 0
    assert out[2]["contaminated"]  # whole-text match for short docs


def test_decontaminate_min_shared_threshold(spark):
    from flink_uba_spark.operators.corpus import decontaminate

    train = docs_df(spark, ["a b c d e"])  # shingles: "a b c","b c d","c d e"
    ev = docs_df(spark, ["a b c d"])       # shares "a b c" and "b c d"
    assert decontaminate(train, ev, min_shared=3).first()["contaminated"] is False
    assert decontaminate(train, ev, min_shared=2).first()["contaminated"] is True


# ------------------------------------------------------ repetition signals
def test_repetition_signals_counts(spark):
    from flink_uba_spark.operators.corpus import repetition_signals

    # "spam spam spam eggs": top word spam×3, top bigram "spam spam"×2,
    # distinct=2 → dup ratio 2/4
    df = docs_df(spark, ["spam spam spam eggs"])
    r = repetition_signals(df).first()
    assert r["n_words"] == 4 and r["n_distinct_words"] == 2
    assert r["top_word_count"] == 3 and r["top_bigram_count"] == 2
    assert r["dup_word_ratio"] == 0.5 and r["top_word_ratio"] == 0.75
    assert r["repetitive"]

    clean = repetition_signals(docs_df(spark, ["a b c d e f"])).first()
    assert clean["dup_word_ratio"] == 0.0 and not clean["repetitive"]


# ------------------------------------------------------------ pack_sequences
def test_pack_sequences_matches_naive_cumsum(spark):
    from flink_uba_spark.operators.corpus import pack_sequences

    rows = [(i, (i * 37) % 90 + 10) for i in range(50)]  # doc_id, n_tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    # tiny block size → many blocks → the two-level prefix sum is exercised
    got = {
        r["doc_id"]: r
        for r in pack_sequences(df, capacity=100, block_size=4).collect()
    }
    offset = 0
    for i, t in rows:
        assert got[i]["global_offset"] == offset
        assert got[i]["pack_id"] == offset // 100
        assert got[i]["pack_pos"] == offset % 100
        offset += t
    assert len(got) == 50


def test_pack_sequences_sparse_ids(spark):
    from flink_uba_spark.operators.corpus import pack_sequences

    # non-contiguous ids: order is by id, gaps don't matter
    rows = [(5, 10), (1000, 20), (7, 5), (42, 7)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["doc_id"]: r["global_offset"] for r in pack_sequences(df, 16).collect()}
    assert got == {5: 0, 7: 10, 42: 15, 1000: 22}


# ---------------------------------------------------------------- chunk_text
def test_chunk_text_shapes(spark):
    from flink_uba_spark.operators.corpus import chunk_text

    words = " ".join(f"w{i}" for i in range(10))
    df = docs_df(spark, [words, "short text"])
    out = chunk_text(df, chunk_words=4, stride_words=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 10 words, chunk 4 stride 3 → starts 0,3,6 cover to 9? (6+4=10 ✓) → 3 chunks
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
    assert [r["n_chunk_words"] for r in c0] == [4, 4, 4]
    assert c0[0]["chunk_text"] == "w0 w1 w2 w3"
    assert c0[2]["chunk_text"] == "w6 w7 w8 w9"
    # short doc → single whole chunk
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == "short text"


def test_chunk_text_tail_chunk_shorter(spark):
    from flink_uba_spark.operators.corpus import chunk_text

    words = " ".join(f"w{i}" for i in range(11))  # starts 0,3,6,9 → tail 2 words
    out = sorted(
        chunk_text(docs_df(spark, [words]), 4, 3).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["n_chunk_words"] for r in out] == [4, 4, 4, 2]
    assert out[-1]["chunk_text"] == "w9 w10"


# --------------------------------------------------------------------- bm25
def test_bm25_ranks_tf_and_rarity(spark):
    from flink_uba_spark.operators.search import bm25_topk

    df = docs_df(
        spark,
        [
            "spark spark spark filler filler",  # high tf for 'spark'
            "spark filler filler filler filler",
            "rare filler filler filler filler",  # only doc with 'rare'
            "filler filler filler filler filler",
        ],
    )
    out = bm25_topk(df, ("spark", "rare"), k=10).collect()
    ranks = {r["doc_id"]: r["rnk"] for r in out}
    scores = {r["doc_id"]: r["score_q"] for r in out}
    assert 3 not in ranks  # no query term → no row
    assert scores[0] > scores[1]  # higher tf wins within a term
    # 'rare' (df=1) outscores single-occurrence 'spark' (df=2)
    assert scores[2] > scores[1]


def test_bm25_deterministic_tie_break(spark):
    from flink_uba_spark.operators.search import bm25_topk

    df = docs_df(spark, ["x y", "x y", "x y"])
    out = bm25_topk(df, ("x",), k=2).collect()
    assert [(r["doc_id"], r["rnk"]) for r in sorted(out, key=lambda r: r["rnk"])] == [
        (0, 1),
        (1, 2),
    ]


# ------------------------------------------------------------ plan contracts
def test_corpus_plan_contracts(spark, sf_dir):
    from flink_uba_spark.queries import datapipe as dp
    from tests.test_plans import count_nodes, plan_of

    # chunking: pure per-row explode — zero exchanges, no Python
    pc = plan_of(spark, sf_dir, dp.doc_chunks_overlap)
    assert count_nodes(pc, "Exchange") == 0
    assert "BatchEvalPython" not in pc and "ArrowEvalPython" not in pc

    # decontamination: eval vocabulary broadcast, train side never
    # shuffles for the probe join
    pd_ = plan_of(spark, sf_dir, dp.decontam_ngram_overlap)
    assert "BroadcastHashJoin" in pd_ and "BatchEvalPython" not in pd_

    # packing: no Python; the single-partition exchange feeding the global
    # window carries only the block SUBTOTALS (__blk, __bt) — never the
    # full data (which would show the raw __t column instead)
    pp = plan_of(spark, sf_dir, dp.pack_training_sequences)
    assert "BatchEvalPython" not in pp
    import re

    sp = re.search(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: SinglePartition", pp
    )
    assert sp and "__bt" in sp.group(1) and "__t#" not in sp.group(1)

    # bm25: top-k via TakeOrderedAndProject, not a global sort
    pb = plan_of(spark, sf_dir, dp.bm25_keyword_search)
    assert "TakeOrderedAndProject" in pb


def test_vocabulary_and_clusters_plan_contracts(spark, sf_dir):
    from flink_uba_spark.queries import datapipe as dp
    from tests.test_plans import count_nodes, plan_of

    # vocabulary: top-k fused into TakeOrderedAndProject, partial aggs
    pv = plan_of(spark, sf_dir, dp.corpus_vocabulary)
    assert "TakeOrderedAndProject" in pv and "partial_" in pv

    # topic clusters: codebook rides in as ONE broadcast row (nested-loop
    # cross join of a single-row relation), corpus side never exchanges
    # before assignment; the only hash exchanges are the two rollups
    pt = plan_of(spark, sf_dir, dp.embedding_topic_clusters)
    assert "BroadcastNestedLoopJoin" in pt
    assert "BatchEvalPython" not in pt and "ArrowEvalPython" not in pt


def test_lm_bigram_scores_hand_computed(spark):
    from flink_uba_spark.operators.corpus import lm_bigram_scores

    # corpus: "a b" ×2, "a c" ×1, "x" ×1 → c(a)=3, V={a,b,c,x}=4
    # bigram "a b": c12=2 → q = floor(1e6·(2+1)/(3+4)) = 428571
    # bigram "a c": c12=1 → q = floor(1e6·(1+1)/(3+4)) = 285714
    df = docs_df(spark, ["a b", "a b", "a c", "x"])
    out = {r["doc_id"]: r for r in lm_bigram_scores(df).collect()}
    assert out[0]["lm_score"] == 428571.0 and out[0]["n_bigrams"] == 1
    assert out[1]["lm_score"] == 428571.0
    assert out[2]["lm_score"] == 285714.0
    assert out[3]["n_bigrams"] == 0 and out[3]["lm_score"] is None


def test_quota_hash_sample_exact_and_stable(spark):
    from flink_uba_spark.operators.sampling import quota_hash_sample

    rows = [(i, "en" if i % 3 else "de") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = quota_hash_sample(df, "lang", quota=10).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by["en"]) == 10 and len(by["de"]) == 10
    # quota above stratum size → whole stratum survives
    small = quota_hash_sample(df.filter(F.col("lang") == "de"), "lang", 1000).count()
    assert small == 20
    # membership is partitioning-invariant (row-intrinsic hash order)
    again = quota_hash_sample(df.repartition(7), "lang", quota=10).collect()
    by2 = {}
    for r in again:
        by2.setdefault(r["lang"], set()).add(r["doc_id"])
    assert by == by2
