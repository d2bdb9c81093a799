"""Round-5 operator tests: the trained classifier gate (VERDICT item 5)
and the incremental IVF index maintenance path."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

CLEAN_WORDS = (
    "the quick brown fox jumps over a lazy dog while many people read good "
    "books about science history music art nature travel food health work "
    "family friends school learning writing thinking speaking walking"
).split()
GIBBERISH_CHARS = "xqzjvwkf"


def _mk_docs(n, gibberish, seed):
    rnd = random.Random(seed)
    docs = []
    for i in range(n):
        if gibberish:
            words = [
                "".join(rnd.choice(GIBBERISH_CHARS) for _ in range(rnd.randint(4, 9)))
                for _ in range(rnd.randint(6, 14))
            ]
        else:
            words = [rnd.choice(CLEAN_WORDS) for _ in range(rnd.randint(6, 14))]
        docs.append((i, " ".join(words)))
    return docs


def test_trained_classifier_gate_separates_gibberish_from_clean(spark):
    """Fit logistic weights on a labeled synthetic (pyspark.ml L-BFGS over
    the SAME md5-bucket features the serving path scores with), quantize
    to the integer frame, and require the trained gate to separate PLANTED
    gibberish from clean docs on a HELD-OUT set — while the serving
    operator, its schema, and its deterministic integer arithmetic stay
    exactly the oracle-checked ``classifier_quality_scores`` path."""
    from flink_uba_spark.operators.text import (
        classifier_quality_scores,
        train_classifier_weights,
    )

    clean = _mk_docs(150, gibberish=False, seed=1)
    bad = _mk_docs(150, gibberish=True, seed=2)
    train = spark.createDataFrame(
        [(i, t, 1) for i, t in clean] + [(i + 1000, t, 0) for i, t in bad],
        "doc_id long, text string, label int",
    )
    weights = train_classifier_weights(train)
    wrows = weights.collect()
    assert len(wrows) == 256
    assert all(isinstance(r.weight, int) and -127 <= r.weight <= 127 for r in wrows)

    # held-out docs the trainer never saw (different seeds)
    ho_clean = _mk_docs(60, gibberish=False, seed=11)
    ho_bad = _mk_docs(60, gibberish=True, seed=12)
    held = spark.createDataFrame(
        [(i, t) for i, t in ho_clean] + [(i + 1000, t) for i, t in ho_bad],
        "doc_id long, text string",
    )
    scored = classifier_quality_scores(held, weights=weights).toPandas()
    scored["is_clean"] = scored["doc_id"] < 1000
    acc = (scored["keep"] == scored["is_clean"]).mean()
    assert acc >= 0.95, f"trained gate accuracy {acc:.2f} on held-out docs"
    assert (
        scored.loc[scored["is_clean"], "score"].mean()
        > scored.loc[~scored["is_clean"], "score"].mean() + 50
    ), "score distributions must separate, not just straddle 0"
    # serving contract unchanged: same columns, integer score
    assert list(scored.columns[:3]) == ["doc_id", "score", "keep"]
    assert str(scored["score"].dtype) == "int64"


def test_trained_weights_roundtrip_parquet(spark, tmp_path):
    """The production flow: persist the trained integer dim, reload, score
    — byte-identical to scoring with the in-memory frame."""
    from flink_uba_spark.operators.text import (
        classifier_quality_scores,
        train_classifier_weights,
    )

    docs = _mk_docs(80, gibberish=False, seed=3) + [
        (i + 1000, t) for i, t in _mk_docs(80, gibberish=True, seed=4)
    ]
    labeled = spark.createDataFrame(
        [(i, t, 1 if i < 1000 else 0) for i, t in docs],
        "doc_id long, text string, label int",
    )
    w = train_classifier_weights(labeled)
    path = str(tmp_path / "clf_weights.parquet")
    w.write.parquet(path)
    w2 = spark.read.parquet(path)
    df = labeled.select("doc_id", "text")
    a = classifier_quality_scores(df, weights=w).toPandas().sort_values("doc_id")
    b = classifier_quality_scores(df, weights=w2).toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_ivf_upsert_against_bucketed_index_corpus_never_shuffles(spark, sf_dir):
    """The production IVF-maintenance shape: the inverted file persisted
    ONCE bucketed on vec_id; every ingest re-assigns ONLY its delta
    (broadcast-codebook argmax, map-only) and probes the index with a join
    in which the corpus side has ZERO exchanges. Ops must equal the inline
    form."""
    import re
    import uuid

    from flink_uba_spark.operators.similarity import (
        build_ivf_index,
        default_codebook,
        ivf_index_upsert,
    )
    from flink_uba_spark.operators.skew import write_bucketed
    from flink_uba_spark.sources.readers import load_testdata

    suffix = uuid.uuid4().hex[:8]
    embs = load_testdata(spark, sf_dir, ("embeddings",))["embeddings"]
    cb = default_codebook(embs, 8)
    corpus = embs.filter(F.col("vec_id") % 7 != 0)
    incoming = embs.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")

    index = build_ivf_index(corpus, codebook=cb)
    tbl = f"ivf_index_{suffix}"
    write_bucketed(index, tbl, "vec_id", 8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        upserts = ivf_index_upsert(incoming, spark.table(tbl), cb)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = upserts._jdf.queryExecution().explainString(mode)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # no Exchange may consume columns scanned from the bucketed index table
    for m in re.finditer(
        r"^\(\d+\) Exchange[^\n]*\n(?:.+\n)*?\s*Input \[[^\]]*\]: \[([^\]]*)\]",
        plan,
        re.M,
    ):
        assert tbl not in m.group(1)
    assert "SelectedBucketsCount" in plan

    inline = ivf_index_upsert(incoming, index, cb)
    a = {(r.vec_id, r.bucket, r.prev_bucket, r.op) for r in upserts.collect()}
    b = {(r.vec_id, r.bucket, r.prev_bucket, r.op) for r in inline.collect()}
    assert a == b and len(a) > 0
    assert {r[3] for r in a} >= {"new", "unchanged"}
