"""Two-stream reconciliation with unmatched side outputs (SURVEY.md §2.6 J2).

Reference: TxPayMatch.java:73-156 — a keyed CoProcessFunction stores each
side in ValueState, matches the other side on arrival, and routes records
whose wait timer fires unmatched to side outputs (``unmatched-pays`` /
``unmatched-receipts``, TxPayMatch.java:33-34).

Spark-first design: a single **full outer join** on the key + time-range
residual. Matched pairs are rows with both sides present; the side outputs
are exactly the null-side rows, surfaced as a ``status`` tag column (the S7
side-output mapping — callers split with two filters, which Catalyst prunes
into the same plan). One exchange per side, no per-record state machine; in
streaming the same join with watermarks emits the null-side rows when the
watermark passes the range bound — the exact analogue of the reference's
wait timers (pay waits 5 s, TxPayMatch.java:113; receipt 3 s, :131).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_uba_spark.operators.interval_join import interval_join

MATCHED = "matched"
UNMATCHED_LEFT = "unmatched_left"
UNMATCHED_RIGHT = "unmatched_right"


def reconcile(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "INTERVAL 3 SECONDS",
    upper: str = "INTERVAL 5 SECONDS",
    left_id: str | None = None,
    right_id: str | None = None,
) -> DataFrame:
    """Full-outer interval match; adds ``status`` ∈ {matched, unmatched_left,
    unmatched_right}. ``left_id``/``right_id`` name columns that identify
    presence of each side (must be non-null on their own side)."""
    joined = interval_join(
        left, right, on, left_ts=left_ts, right_ts=right_ts, lower=lower, upper=upper, how="full_outer"
    )
    lid = left_id or (left_ts + "_l" if left_ts == right_ts else left_ts)
    rid = right_id or (right_ts + "_r" if left_ts == right_ts else right_ts)
    return joined.withColumn(
        "status",
        F.when(F.col(lid).isNotNull() & F.col(rid).isNotNull(), F.lit(MATCHED))
        .when(F.col(rid).isNull(), F.lit(UNMATCHED_LEFT))
        .otherwise(F.lit(UNMATCHED_RIGHT)),
    )
