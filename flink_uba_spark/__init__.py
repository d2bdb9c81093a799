"""flink_uba_spark — a PySpark-native user-behavior-analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference UBA suite (stillcoolme/flink-uba — windowed hot-item/hot-page top-N,
order-payment timeout detection, two-stream reconciliation), re-expressed
Spark-first: DataFrame / Spark SQL plans optimized by Catalyst, with
Structured Streaming twins for the unbounded cases, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) the reference never had.

Layout
------
- ``session``    : SparkSession factory (UTC, AQE, sane shuffle defaults)
- ``schemas``    : StructType registry for every entity in SURVEY.md §1.2
- ``sources``    : batch + streaming readers, reference-shaped fixture generators
- ``operators``  : the operator library (SURVEY.md §2) — windowed top-N,
                   interval join, reconciliation, order lifecycle, sequence
                   (CEP-lite), dedup, similarity, text analysis, multimodal
- ``streaming``  : Structured Streaming forms (watermarks, stateful timeout)
- ``queries``    : named query catalog: (spark, sf_dir) -> DataFrame, each with
                   a DuckDB-oracle SQL twin for correctness checking
"""

__version__ = "0.1.0"
