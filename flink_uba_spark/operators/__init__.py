from flink_uba_spark.operators.topn import (  # noqa: F401
    topn_per_window,
    windowed_counts,
    windowed_topn,
)
