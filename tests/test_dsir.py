"""DSIR-style importance selection (operators/sampling.py:dsir_importance)
— semantic pins; values 3-SF oracle-gated via dsir_importance_selection."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_target_ngram_docs_outrank(spark):
    """Docs sharing bigrams with the TARGET slice score above docs made
    of raw-only bigrams; a doc with < 2 tokens scores 0 and ranks last."""
    from flink_uba_spark.operators.sampling import dsir_importance

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", "en"),      # target
            (2, "alpha beta gamma", "fr"),           # shares target bigram
            (3, "delta epsilon delta", "fr"),        # raw-only bigrams
            (4, "solo", "fr"),                       # no bigram → 0
        ],
        "doc_id long, text string, lang string",
    )
    got = (
        dsir_importance(docs, target_pred=F.col("lang") == "en",
                        keep_per_mille=500)
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[4, "importance"] == 0 and got.loc[4, "sel_rank"] == 4
    assert got.loc[1, "importance"] > got.loc[3, "importance"]
    assert got.loc[2, "importance"] > got.loc[3, "importance"]
    # top 500‰ of 4 docs = 2 selected, deterministically by (score, id)
    assert sorted(got[got["selected"]].index) == sorted(
        got.sort_values(["importance", "doc_id"],
                        ascending=[False, True]).index[:2]
    )


def test_importance_is_exact_integer_sum(spark):
    """One shared bucket world: by hand, doc A (1 target bigram occurrence
    'x y') and the corpus counts give score = n * ((t+1)*1e6 div (a+1))."""
    from flink_uba_spark.operators.sampling import dsir_importance

    docs = spark.createDataFrame(
        [(1, "x y", "en"), (2, "x y", "fr")],
        "doc_id long, text string, lang string",
    )
    got = (
        dsir_importance(docs, target_pred=F.col("lang") == "en")
        .toPandas().set_index("doc_id")
    )
    # bucket('x y'): a=2, t=1 → r = (2*1e6) div 3 = 666666; each doc has 1
    assert got.loc[1, "importance"] == 666666
    assert got.loc[2, "importance"] == 666666
