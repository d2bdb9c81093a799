"""Unit tests for the round-4 corpus operators: span-level exact substring
dedup (operators/dedup.py:span_dedup_stats) and the per-source curation
rollup (operators/corpus.py:source_curation_rollup)."""

from __future__ import annotations

from pyspark.sql import functions as F


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ------------------------------------------------------------ span dedup
def test_span_dedup_flags_shared_window(spark):
    from flink_uba_spark.operators.dedup import span_dedup_stats

    shared = "a b c d e f g h"  # exactly one 8-token span
    df = docs_df(
        spark,
        [
            (1, "s", shared + " x y z"),        # 4 spans, 1 shared
            (2, "s", "q r " + shared),          # 3 spans, 1 shared
            (3, "s", "totally different words here so nothing matches at all"),
            (4, "s", "short doc"),               # < 8 tokens → 0 spans
        ],
    ).select("doc_id", "text")
    out = {r["doc_id"]: r.asDict() for r in span_dedup_stats(df).collect()}
    assert out[1]["n_spans"] == 4 and out[1]["n_dup_spans"] == 1
    assert out[2]["n_spans"] == 3 and out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] == 0
    assert out[4]["n_spans"] == 0 and out[4]["dup_span_frac"] == 0.0
    assert abs(out[1]["dup_span_frac"] - 0.25) < 1e-12


def test_span_dedup_within_doc_repeat_not_cross(spark):
    """A span repeated WITHIN one doc but in no other doc is not a dup."""
    from flink_uba_spark.operators.dedup import span_dedup_stats

    span = "p q r s t u v w"
    df = spark.createDataFrame(
        [(1, span + " gap1 gap2 gap3 gap4 gap5 gap6 gap7 gap8 " + span)],
        "doc_id long, text string",
    )
    row = span_dedup_stats(df).collect()[0]
    assert row["n_dup_spans"] == 0


def test_span_dedup_counts_occurrences_when_cross(spark):
    """When a span IS cross-document, every occurrence of it counts."""
    from flink_uba_spark.operators.dedup import span_dedup_stats

    span = "p q r s t u v w"
    df = spark.createDataFrame(
        [
            (1, span + " gap1 gap2 gap3 gap4 gap5 gap6 gap7 gap8 " + span),
            (2, span),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in span_dedup_stats(df).collect()}
    assert out[1]["n_dup_spans"] == 2  # both occurrences in doc 1
    assert out[2]["n_dup_spans"] == 1


def test_span_dedup_matches_oracle_at_sf(spark, duck):
    from tests.conftest import assert_matches_oracle

    from flink_uba_spark.queries.datapipe import (
        DEDUP_SPAN_EXACT_ORACLE,
        dedup_span_exact,
    )

    import tests.conftest as c

    assert_matches_oracle(dedup_span_exact(spark, c.SF_DIR), duck, DEDUP_SPAN_EXACT_ORACLE)


# ------------------------------------------------------ source rollup
def test_source_rollup_verdicts(spark):
    from flink_uba_spark.operators.corpus import source_curation_rollup

    high = " ".join(["the word"] * 15)  # 30 words, half stopwords → high
    low = "tiny"
    df = docs_df(
        spark,
        [
            (1, "good", high),
            (2, "good", high + " extra"),
            (3, "dupfarm", high),
            (4, "dupfarm", high),      # exact dup of 3? no — same text as 1/3…
            (5, "junk", low),
            (6, "junk", low + " bit"),
        ],
    )
    out = {r["source"]: r.asDict() for r in source_curation_rollup(df).collect()}
    # docs 1,3,4 share identical text: canonical is doc 1, so 3 and 4 are dups
    assert out["dupfarm"]["n_dup_docs"] == 2
    assert out["dupfarm"]["keep"] is False      # dup_rate 1.0 > 0.5
    assert out["good"]["n_dup_docs"] == 0
    assert out["good"]["keep"] is True          # high_share 1.0, no dups
    assert out["junk"]["keep"] is False         # no high-quality docs
    assert out["good"]["total_words"] == 61


def test_source_rollup_matches_oracle_at_sf(spark, duck):
    from tests.conftest import assert_matches_oracle

    from flink_uba_spark.queries.datapipe import (
        SOURCE_CURATION_ROLLUP_ORACLE,
        source_curation_rollup,
    )

    import tests.conftest as c

    assert_matches_oracle(
        source_curation_rollup(spark, c.SF_DIR), duck, SOURCE_CURATION_ROLLUP_ORACLE
    )


# ------------------------------------------------------ property: span dedup
def _brute_span_stats(texts, width=8):
    """Brute-force reference for span_dedup_stats."""
    spans = {}  # doc -> list of span tuples
    for did, t in texts:
        w = t.split(" ")
        spans[did] = [tuple(w[i : i + width]) for i in range(len(w) - width + 1)]
    docs_of = {}
    for did, ss in spans.items():
        for s in set(ss):
            docs_of.setdefault(s, set()).add(did)
    out = {}
    for did, ss in spans.items():
        n = len(ss)
        nd = sum(1 for s in ss if len(docs_of[s]) >= 2)
        out[did] = (n, nd, 0.0 if n == 0 else nd / n)
    return out


def test_span_dedup_property(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_uba_spark.operators.dedup import span_dedup_stats

    texts_strategy = st.lists(
        st.lists(st.sampled_from(list("abcd")), min_size=1, max_size=20).map(
            lambda toks: " ".join(toks)
        ),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts=texts_strategy)
    def run(texts):
        rows = list(enumerate(texts))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_span_frac"])
            for r in span_dedup_stats(df, width=3).collect()
        }
        assert got == _brute_span_stats(rows, width=3)

    run()


# ------------------------------------------- streaming span decontamination
def test_stream_span_decontam_matches_oracle(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    from flink_uba_spark.queries.streaming import (
        STREAM_SPAN_DECONTAM_ORACLE,
        stream_span_decontam,
    )

    assert_matches_oracle(
        stream_span_decontam(spark, sf_dir), duck, STREAM_SPAN_DECONTAM_ORACLE
    )


def test_span_hash_array_empty_for_short_docs(spark):
    from flink_uba_spark.operators.dedup import span_hash_array

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e f g h i")], "doc_id long, text string"
    ).select("doc_id", F.size(span_hash_array(F.col("text"))).alias("n"))
    got = {r["doc_id"]: r["n"] for r in df.collect()}
    assert got == {1: 0, 2: 2}


# ------------------------------------------------------------- RRF fusion
def test_rrf_fuse_hand_computed(spark):
    from flink_uba_spark.operators.search import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rnk int")
    dense = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rnk int")
    rows = {r["doc_id"]: r for r in rrf_fuse([lex, dense], k=10).collect()}
    # doc 3: 1/63 + 1/61 (both lists) beats doc 1: 1/61 (lex only)
    assert rows[3]["rnk"] == 1
    assert rows[1]["rnk"] == 2
    assert abs(rows[3]["score_rrf"] - (1 / 63 + 1 / 61)) < 1e-15
    assert abs(rows[4]["score_rrf"] - 1 / 62) < 1e-15
    assert set(rows) == {1, 2, 3, 4}


def test_rrf_fuse_k_cap_and_tie_break(spark):
    from flink_uba_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(i, i) for i in range(1, 8)], "doc_id long, rnk int")
    b = spark.createDataFrame([(i, i) for i in range(1, 8)], "doc_id long, rnk int")
    out = rrf_fuse([a, b], k=3).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rnk"])] == [1, 2, 3]


def test_hybrid_search_matches_oracle_at_sf(spark, duck):
    from tests.conftest import assert_matches_oracle

    import tests.conftest as c
    from flink_uba_spark.queries.datapipe import (
        HYBRID_SEARCH_RRF_ORACLE,
        hybrid_search_rrf,
    )

    assert_matches_oracle(
        hybrid_search_rrf(spark, c.SF_DIR), duck, HYBRID_SEARCH_RRF_ORACLE
    )


def test_order_value_percentiles_approx_bound_holds(spark):
    """The GK rank-error guarantee must hold (all ok flags TRUE) and the
    check must not be vacuous: recomputing with a zero-width acceptance
    band around a deliberately wrong 'estimate' must flag FALSE."""
    import tests.conftest as c
    from pyspark.sql import functions as F
    from flink_uba_spark.queries.tpch import order_value_percentiles_approx

    out = order_value_percentiles_approx(spark, c.SF_DIR).collect()
    assert len(out) > 0
    assert all(r["p50_ok"] and r["p90_ok"] and r["p99_ok"] for r in out)

    # teeth: the same rank-interval test applied to the column MIN (rank 1)
    # as a fake p99 estimate must reject at any n where p99 has slack
    from flink_uba_spark.sources.readers import load_testdata

    t = load_testdata(spark, c.SF_DIR, ("orders",))
    g = (
        t["orders"]
        .select(F.col("o_orderpriority").alias("priority"),
                F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"))
        .groupBy("priority")
        .agg(F.count(F.lit(1)).alias("n"), F.min("cents").alias("vmin"))
        .collect()
    )
    for r in g:
        cnt_le, cnt_lt, n = 1, 0, r["n"]  # min is unique-ish: rank interval starts at 1
        lo_ok = (cnt_le + 1) * 1000 >= (990 - 10) * n
        assert not lo_ok, "bound check accepts an arbitrarily wrong estimate"


def test_pagerank_matches_bruteforce_integer_reference(spark):
    """10-iteration integer PageRank on a small weighted digraph (with a
    dangling node) must equal the same recurrence run in plain Python."""
    from flink_uba_spark.operators.graph import SCALE, pagerank

    edges = [(1, 2, 3), (2, 3, 1), (3, 1, 2), (1, 3, 1), (4, 1, 5)]  # 4 dangles... no: 4->1
    # make node 5 dangling (in-edges only)
    edges.append((2, 5, 2))
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r["node"]: r["score"] for r in pagerank(df).collect()}

    nodes = {n for e in edges for n in e[:2]}
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    scores = {n: SCALE for n in nodes}
    for _ in range(10):
        contrib = {n: 0 for n in nodes}
        for s, d, w in edges:
            contrib[d] += w * (scores[s] // outw[s])
        scores = {n: 150000 + (850 * contrib[n]) // 1000 for n in nodes}
    assert got == scores
    assert 5 in got and outw.get(5) is None  # dangling node kept, mass dropped


# ---- round 8: span_dedup_rewrite (Lee et al. removal rule) -----------------


def test_span_rewrite_cuts_noncanonical_occurrences(spark):
    """A span recurring across docs is cut everywhere except the
    corpus-first (doc_id, position) occurrence; within-doc repeats are
    not cut; docs shorter than the width pass through unchanged."""
    from flink_uba_spark.operators.dedup import span_dedup_rewrite

    shared = "a b c d e f g h"            # the 8-token duplicated span
    rows = [
        (1, f"{shared} tail1 tail2"),      # canonical keeper (doc 1, pos 1)
        (2, f"lead1 {shared} tail3"),      # cut: tokens 2..9 removed
        (3, "short doc"),                  # < width: untouched
        (4, f"x y {shared}"),              # cut: tokens 3..10 removed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = span_dedup_rewrite(df).toPandas().set_index("doc_id")
    assert got.loc[1, "clean_text"] == f"{shared} tail1 tail2"
    assert int(got.loc[1, "n_removed"]) == 0
    assert got.loc[2, "clean_text"] == "lead1 tail3"
    assert int(got.loc[2, "n_removed"]) == 8
    assert got.loc[3, "clean_text"] == "short doc"
    assert got.loc[4, "clean_text"] == "x y"
    # conservation: surviving + removed == original token count
    for d in (1, 2, 3, 4):
        n_kept = len(got.loc[d, "clean_text"].split(" ")) if got.loc[d, "clean_text"] else 0
        assert n_kept + int(got.loc[d, "n_removed"]) == int(got.loc[d, "n_tokens"])


def test_span_rewrite_overlapping_spans_union_coverage(spark):
    """Two overlapping duplicated spans cut the UNION of their token
    positions (no double counting), and a fully-duplicated doc empties."""
    from flink_uba_spark.operators.dedup import span_dedup_rewrite

    nine = "a b c d e f g h i"            # 9 tokens -> two 8-token spans
    rows = [
        (1, f"{nine} unique1"),            # keeper of both spans
        (2, nine),                         # both spans duplicated -> empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = span_dedup_rewrite(df).toPandas().set_index("doc_id")
    assert int(got.loc[1, "n_removed"]) == 0
    assert got.loc[2, "clean_text"] == ""
    assert int(got.loc[2, "n_removed"]) == 9   # union of 1..8 and 2..9
    assert int(got.loc[2, "n_tokens"]) == 9


def test_span_rewrite_conservation_on_corpus(spark):
    """Token conservation over the real documents table at sf0.001:
    size(split(clean_text)) == n_tokens - n_removed for every doc with
    survivors (an emptied doc splits to [''] — size 1 — by convention)."""
    from pyspark.sql import functions as F

    from flink_uba_spark.operators.dedup import span_dedup_rewrite
    from flink_uba_spark.sources.readers import load_testdata

    docs = load_testdata(spark, "/root/testdata/sf0.001", ("documents",))[
        "documents"
    ]
    out = span_dedup_rewrite(docs)
    bad = out.filter(
        (F.col("clean_text") != "")
        & (
            F.size(F.split(F.col("clean_text"), " "))
            != F.col("n_tokens") - F.col("n_removed")
        )
    ).count()
    assert bad == 0
    # the corpus actually contains duplicated spans (non-vacuous rewrite)
    assert out.filter(F.col("n_removed") > 0).count() > 0
