"""Deterministic mergeable-summary sketches (round 7).

The approximate family so far (HLL daily_users_approx, PQ/IVF ANN) trades
exactness for space with the error bound folded into the output contract.
This module adds the OTHER classic sketch shape: MISRA-GRIES heavy
hitters, used as a 2-PASS EXACT operator — the sketch only PRUNES, the
answer is exact, so the DuckDB hash gate applies with no error-bound
gymnastics.

Reference grounding: Misra & Gries (1982); the mergeable-summaries
formulation (Agarwal, Cormode, Huang, Phillips, Wei, Yi — PODS'12 /
TODS'13) is what makes the per-partition → union step sound.

Why a 100 TB engine wants it: a plain ``groupBy(item).count().having``
shuffles the WHOLE distinct-item domain (trillions of keys for n-grams at
web scale). The 2-pass form shuffles (a) ≤ cap summary rows per partition
in pass 1 and (b) only candidate-matching rows in pass 2 — the tail never
crosses the wire.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """Pass 1: per-partition Misra-Gries summaries, unioned.

    Each partition keeps at most ``k`` weighted counters, maintained
    chunk-vectorized (pandas ``value_counts`` per Arrow batch, then the
    Agarwal-et-al MERGE: subtract the (k+1)-th largest counter from all,
    drop non-positive — the batched equivalent of the classic one-row
    decrement, same ≤ n_p/(k+1) undercount bound). MG guarantees any item
    with partition frequency > n_p/k survives its partition's summary; by
    pigeonhole an item with GLOBAL frequency > n/k must exceed the local
    threshold somewhere, so the union of survivors is a SUPERSET of the
    global heavy hitters. At most k·partitions candidate rows leave the
    mappers — no corpus-sized shuffle.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[item_col].value_counts()
            acc = acc.add(vc, fill_value=0).astype("int64")
            if len(acc) > k:
                # mergeable-summaries trim to k counters
                cut = int(acc.nlargest(k + 1).iloc[-1])
                acc = acc - cut
                acc = acc[acc > 0]
        if len(acc):
            yield pd.DataFrame({item_col: acc.index, "mg_weight": acc.values})

    return items.select(item_col).mapInPandas(
        summarize, f"{item_col} string, mg_weight long"
    )


def heavy_hitters_exact(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """EXACT heavy hitters: every item with frequency · k > n (strictly),
    with its exact count — via the 2-pass sketch-prune:

    pass 1  ``misra_gries_candidates`` → a small candidate superset
            (≤ k · partitions rows; broadcast).
    pass 2  one more scan counts ONLY candidate-matching rows (the
            broadcast semi-join keeps the tail off the shuffle; map-side
            partial aggregation collapses to ≤ candidates rows per task)
            and filters on the INTEGER comparison ``cnt * k > n`` with
            ``n`` as a broadcast scalar — no floats, hash-exact.

    The superset property (see pass-1 docstring) makes the prune lossless:
    the output equals the naive ``groupBy.having`` bit-for-bit, which is
    exactly what the DuckDB oracle replays.
    """
    cands = misra_gries_candidates(items, item_col, k).select(item_col).distinct()
    total = items.agg(F.count(F.lit(1)).alias("n_items"))
    return (
        items.join(F.broadcast(cands), item_col)
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * k > F.col("n_items"))
        .select(item_col, "n_occurrences", "n_items")
    )
