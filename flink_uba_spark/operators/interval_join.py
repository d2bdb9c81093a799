"""Event-time interval join (SURVEY.md §2.6 J1).

Reference: TxPayMatchByJoin.java:60-64 — ``pay.keyBy(txId)
.intervalJoin(receipt.keyBy(txId)).between(Time.seconds(-3), Time.seconds(5))``
emits (pay, receipt) pairs where receipt.ts ∈ [pay.ts−3s, pay.ts+5s].

Spark-first design: an equi-join on the key with the time window as a range
residual. Catalyst plans a shuffled hash / sort-merge join on the key alone;
the range predicate is evaluated as a post-join filter on each key group, so
cost is O(matches per key), not a cross product. At 100 TB the shuffle is
hash(key) — the same single exchange the reference's keyBy pair implies —
and AQE's skew-join splitting handles hot keys. In streaming mode the same
plan runs as a stream-stream join with watermarks on both sides (the range
condition doubles as the state-retention bound).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "INTERVAL 3 SECONDS",
    upper: str = "INTERVAL 5 SECONDS",
    how: str = "inner",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Join rows where right.ts ∈ [left.ts − lower, left.ts + upper].

    ``on`` is the equi-key (string or list). Overlapping column names are
    suffixed. ``how`` may be any Spark join type; ``full_outer`` gives the
    reconciliation form (see reconcile.py).
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = {c for c in left.columns}
    rcols = {c for c in right.columns}
    overlap = (lcols & rcols) - set(keys)

    lsel = [F.col(c).alias(c + suffixes[0]) if c in overlap else F.col(c) for c in left.columns]
    rsel = [F.col(c).alias(c + suffixes[1]) if c in overlap else F.col(c) for c in right.columns]
    # dataset aliases so self-joins (both sides derived from one frame) resolve
    lt = left.select(*lsel).alias("ij_l")
    rt = right.select(*rsel).alias("ij_r")

    lts = left_ts + suffixes[0] if left_ts in overlap else left_ts
    rts = right_ts + suffixes[1] if right_ts in overlap else right_ts

    cond: Column = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"ij_l.{k}") == F.col(f"ij_r.{k}"))
    cond = (
        cond
        & (F.col(f"ij_r.{rts}") >= F.col(f"ij_l.{lts}") - F.expr(lower))
        & (F.col(f"ij_r.{rts}") <= F.col(f"ij_l.{lts}") + F.expr(upper))
    )
    joined = lt.join(rt, cond, how)
    # collapse duplicated key columns (coalesced so outer-join rows keep theirs)
    for k in keys:
        joined = (
            joined.withColumn(f"__k_{k}", F.coalesce(F.col(f"ij_l.{k}"), F.col(f"ij_r.{k}")))
            .drop(F.col(f"ij_l.{k}"))
            .drop(F.col(f"ij_r.{k}"))
            .withColumnRenamed(f"__k_{k}", k)
        )
    return joined
