"""Event-time OVER aggregation as a continuous query — Flink SQL's
``SUM(v) OVER (PARTITION BY k ORDER BY ts RANGE BETWEEN INTERVAL '7' DAY
PRECEDING AND CURRENT ROW)``, a native streaming operator in Flink with
no prior twin here (round 8; the batch form is
queries/behavior.py:rolling_7d_purchase_value's window frame).

Semantics (ISO SQL RANGE frame, Flink's event-time OVER): every input
row emits exactly one output row carrying the aggregate over the key's
rows with ``ts' ∈ [ts − range, ts]`` — equal-timestamp PEERS included,
calendar gaps shrink the frame (a true RANGE, not ROWS).

Emission is WATERMARK-FINAL: a row emits once the watermark passes its
event time, because only then can no frame member still arrive (Spark
drops later rows below the watermark before the operator). Rows in the
stream's final sub-millisecond tail (ts above the ms-floored terminal
watermark) stay pending — the family's established frontier-cut
contract (the left-outer interval join twin cuts identically), applied
to BOTH the query and its oracle.

State per key: the row buffer covering ``[wm − range, ∞)`` — rows older
than that can contribute to no pending frame and are evicted each
invoke; an emitted row stays (flagged) only while a future frame can
still reach back to it. This is exactly Flink's OVER-aggregate state
bound (its RANGE operator retains the window of rows per key), so state
is per-key density × (range + watermark lag) — bounded, no full-history
retention.

Compute per invoke is vectorized: the buffer sorts once by (ts, id),
value prefix-sums once, and every emitting row's frame is two
``np.searchsorted`` probes into that order — O((buf + emit) log buf),
no per-row Python loop.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OVER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.LongType())),
        T.StructField("emitted", T.ArrayType(T.LongType())),
    ]
)

OVER_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("val", T.LongType()),
        T.StructField("agg", T.LongType()),
    ]
)


def make_over_aggregator(range_us: int | None, rows_preceding: int | None = None):
    """Per-key state function: buffer, emit watermark-final rows with
    their frame sum, evict rows no pending frame can reach. Exactly one
    of ``range_us`` (RANGE frame: ``ts' ∈ [ts − range, ts]``) and
    ``rows_preceding`` (ROWS frame: the ``n`` rows before this one plus
    itself, in the (ts, id) total order — Flink SQL's ``ROWS BETWEEN n
    PRECEDING AND CURRENT ROW``) must be set."""
    if (range_us is None) == (rows_preceding is None):
        raise ValueError("exactly one of range_us / rows_preceding")

    def agg(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        timed_out = getattr(state, "hasTimedOut", False)
        chunks = [] if timed_out else [c for c in pdfs if len(c)]
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        if state.exists:
            s_ts, s_id, s_val, s_em = (
                np.asarray(f, dtype="int64") for f in state.get
            )
        else:
            s_ts = s_id = s_val = s_em = np.empty(0, dtype="int64")

        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            n_ts = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            n_id = pdf["event_id"].to_numpy().astype("int64")
            n_val = pdf["val"].to_numpy().astype("int64")
            s_ts = np.concatenate([s_ts, n_ts])
            s_id = np.concatenate([s_id, n_id])
            s_val = np.concatenate([s_val, n_val])
            s_em = np.concatenate([s_em, np.zeros(len(n_ts), dtype="int64")])

        out = None
        if len(s_ts):
            order = np.lexsort((s_id, s_ts))
            s_ts, s_id, s_val, s_em = (
                s_ts[order], s_id[order], s_val[order], s_em[order]
            )
            prefix = np.concatenate([[0], np.cumsum(s_val)])
            # STRICTLY below the watermark: Spark's late-row filter drops
            # ts < wm only, so a peer AT the watermark can still arrive —
            # a row is frame-final once wm passes it strictly
            emit = (s_em == 0) & (s_ts < wm_us)
            if emit.any():
                e_ts = s_ts[emit]
                if range_us is not None:
                    hi = np.searchsorted(s_ts, e_ts, side="right")
                    lo = np.searchsorted(s_ts, e_ts - range_us, side="left")
                else:
                    # ROWS frame: position in the (ts, id) total order is
                    # the row's own sorted index — no peer inclusion
                    pos = np.arange(len(s_ts))[emit]
                    hi = pos + 1
                    lo = np.maximum(pos - rows_preceding, 0)
                sums = prefix[hi] - prefix[lo]
                out = pd.DataFrame(
                    {
                        "user_id": pd.array(
                            [key[0]] * int(emit.sum()), dtype="int64"
                        ),
                        "event_id": pd.array(s_id[emit], dtype="int64"),
                        "ts": pd.Series(e_ts.astype("datetime64[us]")),
                        "val": pd.array(s_val[emit], dtype="int64"),
                        "agg": pd.array(sums, dtype="int64"),
                    }
                )
                s_em = s_em.copy()
                s_em[emit] = 1
            # eviction — unemitted rows never evict; emitted rows evict
            # once no pending/future frame can reach them:
            # RANGE: older than wm − range (any future row's frame floor
            #   is above it);
            # ROWS: all but the last n emitted rows (every emitted row
            #   sorts below every pending/future row — ts < wm ≤ theirs —
            #   so a future frame's emitted portion is always the last
            #   ≤ n emitted rows)
            if range_us is not None:
                keep = (s_ts >= wm_us - range_us) | (s_em == 0)
            else:
                keep = np.ones(len(s_ts), dtype=bool)
                em_idx = np.nonzero(s_em == 1)[0]
                if rows_preceding > 0:
                    keep[em_idx[:-rows_preceding]] = False
                else:
                    keep[em_idx] = False
            s_ts, s_id, s_val, s_em = (
                s_ts[keep], s_id[keep], s_val[keep], s_em[keep]
            )

        if len(s_ts):
            state.update(
                (s_ts.tolist(), s_id.tolist(), s_val.tolist(), s_em.tolist())
            )
            # re-fire when the watermark moves (wm_ms lags one batch):
            # pending rows emit, aged emitted rows evict
            state.setTimeoutTimestamp(wm_ms + 1)
        elif state.exists:
            state.remove()

        if out is not None:
            yield out

    return agg


def stream_over_aggregate(
    events: DataFrame,
    key: str,
    value: Column,
    range_interval: str | None = None,
    rows_preceding: int | None = None,
    row_filter: Column | None = None,
    event_id: str = "event_id",
    ts: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Wire the OVER aggregator over a streaming frame. Exactly one of
    ``range_interval`` (RANGE frame) and ``rows_preceding`` (ROWS frame:
    the ``n`` rows before each row in (ts, id) order, plus itself) picks
    the frame. ``value`` must be an integer Column (the family's
    exactness rule); ``row_filter`` pre-filters rows BEFORE the
    watermark is applied, so the watermark — and the frontier cut —
    track the filtered stream. Output columns: ``user_id, event_id, ts,
    val, agg``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from flink_uba_spark.streaming.pattern import _interval_us

    src = events if row_filter is None else events.filter(row_filter)
    filtered = (
        src.select(
            F.col(event_id).alias("event_id"),
            F.col(ts).alias("ts"),
            F.col(key).alias("user_id"),
            value.cast("long").alias("val"),
        )
        .withWatermark("ts", watermark_delay)
    )
    return filtered.groupBy("user_id").applyInPandasWithState(
        make_over_aggregator(
            None if range_interval is None else _interval_us(range_interval),
            rows_preceding,
        ),
        OVER_OUTPUT_SCHEMA,
        OVER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
