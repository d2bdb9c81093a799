"""UbaEngine — the thin library facade (SURVEY.md §7 guiding decision:
"engine = library, not framework").

One object binds (a) typed source readers, (b) the operator library, and
(c) SQL view registration, so every capability is reachable three ways:
DataFrame calls, the named query catalog, or plain ``spark.sql`` over
registered views — mirroring the reference's three entry styles
(DataStream / Table API / SQL, SURVEY.md §3) on one Catalyst plan space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_uba_spark.session import get_spark
from flink_uba_spark.sources import readers


class UbaEngine:
    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    # ------------------------------------------------------------- sources
    def load(self, sf_dir: str, tables=None) -> dict[str, DataFrame]:
        kw = {} if tables is None else {"tables": tables}
        return readers.load_testdata(self.spark, sf_dir, **kw)

    def register(self, sf_dir: str) -> "UbaEngine":
        """Expose every testdata table as a SQL view (entry style C)."""
        readers.register_views(self.spark, sf_dir)
        return self

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    # ----------------------------------------------------------- operators
    def hot_keys(self, df, key, **kw) -> DataFrame:
        from flink_uba_spark.operators.topn import windowed_topn

        return windowed_topn(df, key, **kw)

    def interval_join(self, left, right, on, **kw) -> DataFrame:
        from flink_uba_spark.operators.interval_join import interval_join

        return interval_join(left, right, on, **kw)

    def reconcile(self, left, right, on, **kw) -> DataFrame:
        from flink_uba_spark.operators.reconcile import reconcile

        return reconcile(left, right, on, **kw)

    def detect_sequence(self, events, key, first_pred, then_pred, **kw) -> DataFrame:
        from flink_uba_spark.operators.sequence import sequence_detect

        return sequence_detect(events, key, first_pred, then_pred, **kw)

    def detect_pattern(self, events, key, steps, **kw) -> DataFrame:
        """The full Pattern-API chain (begin/followedBy/within/oneOrMore —
        uncapped with max_reps=float('inf') — /times/notFollowedBy/
        optional/next/notNext), compiled to window aggregates."""
        from flink_uba_spark.operators.sequence import pattern_detect

        return pattern_detect(events, key, steps, **kw)

    def train_bpe(self, docs, n_merges=6, **kw) -> DataFrame:
        from flink_uba_spark.operators.tokenizer import bpe_train

        return bpe_train(docs, n_merges, **kw)

    def bpe_tokens(self, docs, merge_rules, **kw) -> DataFrame:
        from flink_uba_spark.operators.tokenizer import bpe_segment

        return bpe_segment(docs, merge_rules, **kw)

    def sessionize(self, df, **kw) -> DataFrame:
        from flink_uba_spark.operators.sessions import sessionize

        return sessionize(df, **kw)

    def funnel(self, df, **kw) -> DataFrame:
        from flink_uba_spark.operators.sessions import funnel

        return funnel(df, **kw)

    def asof_join(self, left, right, on, **kw) -> DataFrame:
        from flink_uba_spark.operators.temporal import asof_join

        return asof_join(left, right, on, **kw)

    def range_join(self, left, ranges, **kw) -> DataFrame:
        from flink_uba_spark.operators.temporal import range_join

        return range_join(left, ranges, **kw)

    def hash_split(self, df, **kw) -> DataFrame:
        from flink_uba_spark.operators.sampling import hash_split

        return hash_split(df, **kw)

    def decontaminate(self, train, eval_docs, **kw) -> DataFrame:
        from flink_uba_spark.operators.corpus import decontaminate

        return decontaminate(train, eval_docs, **kw)

    def repetition_signals(self, df, **kw) -> DataFrame:
        from flink_uba_spark.operators.corpus import repetition_signals

        return repetition_signals(df, **kw)

    def pack_sequences(self, df, capacity, **kw) -> DataFrame:
        from flink_uba_spark.operators.corpus import pack_sequences

        return pack_sequences(df, capacity, **kw)

    def chunk_text(self, df, **kw) -> DataFrame:
        from flink_uba_spark.operators.corpus import chunk_text

        return chunk_text(df, **kw)

    def bm25_search(self, df, terms, **kw) -> DataFrame:
        from flink_uba_spark.operators.search import bm25_topk

        return bm25_topk(df, terms, **kw)

    def cluster_topics(self, corpus, **kw) -> DataFrame:
        from flink_uba_spark.operators.similarity import cluster_assign

        return cluster_assign(corpus, **kw)

    def write_corpus(self, df, path, **kw) -> None:
        from flink_uba_spark.streaming.sinks import write_corpus_shards

        write_corpus_shards(df, path, **kw)

    def mixture_sample(self, df, strata_col, total, **kw) -> DataFrame:
        from flink_uba_spark.operators.sampling import temperature_mixture_sample

        return temperature_mixture_sample(df, strata_col, total, **kw)

    def shuffle_corpus(self, df, **kw) -> DataFrame:
        from flink_uba_spark.operators.sampling import global_shuffle

        return global_shuffle(df, **kw)

    def split_without_leakage(self, df, **kw) -> DataFrame:
        from flink_uba_spark.operators.dedup import cluster_aware_split

        return cluster_aware_split(df, **kw)

    def dedup_against_corpus(self, incoming, corpus, **kw) -> DataFrame:
        from flink_uba_spark.operators.dedup import incremental_dedup_verdicts

        return incremental_dedup_verdicts(incoming, corpus, **kw)

    def fuse_rankings(self, ranked, **kw) -> DataFrame:
        from flink_uba_spark.operators.search import rrf_fuse

        return rrf_fuse(ranked, **kw)

    def span_dedup(self, df, **kw) -> DataFrame:
        from flink_uba_spark.operators.dedup import span_dedup_stats

        return span_dedup_stats(df, **kw)

    def rollup_sources(self, df, **kw) -> DataFrame:
        from flink_uba_spark.operators.corpus import source_curation_rollup

        return source_curation_rollup(df, **kw)

    # ------------------------------------------------------------ pipelines
    def curate(
        self,
        sf_dir: str,
        out_path: str,
        min_words: int = 5,
        test_permille: int = 100,
        max_records_per_file: int = 100_000,
        mixture_total: int | None = None,
        leakage_free_split: bool = False,
        classifier_weights: DataFrame | None = None,
        quality_gate: bool = False,
    ) -> DataFrame:
        """End-to-end corpus curation in ONE composed run: length filter →
        [optional model-based quality gate (hashed linear classifier;
        ``classifier_weights`` plugs a trained model in — e.g. the
        committed trained dim
        ``spark.read.parquet("fixtures/classifier_weights.parquet")``
        produced by tools/train_classifier_fixture.py)] → exact dedup
        (keep canonical) → [optional temperature mixture rebalance by
        source] → train/test split (per-doc hash, or cluster-aware so
        near-dups never straddle splits) → decontaminate train against the
        held-out slice → drop contaminated → write size-bounded shards
        partitioned by (lang, split) → return the shard manifest.
        Everything up to the dedup window fuses into the scan; the whole
        pipeline is lazy until the write."""
        from pyspark.sql import functions as F

        from flink_uba_spark.operators.corpus import decontaminate
        from flink_uba_spark.operators.dedup import cluster_aware_split, exact_dedup
        from flink_uba_spark.operators.sampling import (
            hash_split,
            temperature_mixture_sample,
        )
        from flink_uba_spark.operators.text import classifier_quality_scores
        from flink_uba_spark.streaming.sinks import corpus_manifest, write_corpus_shards

        docs = self.load(sf_dir, ("documents",))["documents"].filter(
            F.size(F.split(F.col("text"), " ")) >= min_words
        )
        if quality_gate or classifier_weights is not None:
            kept_ids = (
                classifier_quality_scores(docs, weights=classifier_weights)
                .filter(F.col("keep"))
                .select("doc_id")
            )
            docs = docs.join(kept_ids, "doc_id")
        canonical = (
            exact_dedup(docs).filter(~F.col("is_dup")).select("doc_id")
        )
        kept = docs.join(canonical, "doc_id")
        if mixture_total is not None:
            kept = temperature_mixture_sample(kept, "source", mixture_total)
        if leakage_free_split:
            assignment = cluster_aware_split(
                kept, test_permille=test_permille
            ).select("doc_id", "split")
            split = kept.join(assignment, "doc_id")
        else:
            split = hash_split(kept, test_permille=test_permille)
        train = split.filter(F.col("split") == "train")
        evald = split.filter(F.col("split") == "test")
        contaminated = (
            decontaminate(train, evald)
            .filter(F.col("contaminated"))
            .select("doc_id")
        )
        clean = split.join(contaminated, "doc_id", "left_anti")
        write_corpus_shards(
            clean,
            out_path,
            partition_cols=("lang", "split"),
            max_records_per_file=max_records_per_file,
        )
        return corpus_manifest(self.spark, out_path, ("lang", "split"))

    # ------------------------------------------------------- query catalog
    def query(self, name: str, sf_dir: str) -> DataFrame:
        """Run a named catalog query (the driver-visible surface)."""
        from flink_uba_spark.queries import all_queries

        return all_queries()[name](self.spark, sf_dir)

    def catalog(self) -> list[str]:
        from flink_uba_spark.queries import all_queries

        return sorted(all_queries())
