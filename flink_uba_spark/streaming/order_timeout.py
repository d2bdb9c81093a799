"""Stateful streaming order-timeout detection — the J4 state machine
(OrderPayMatchDetect, OrderPayTimeoutWithoutCEP.java:67-152) as an
``applyInPandasWithState`` operator with event-time timeouts.

Semantics reproduced (keyed by the order/user key):
- create (anchor) arrives → remembered in state, timer armed at
  anchor_ts + deadline (the reference's registerEventTimeTimer at
  create.ts+15min, OrderPayTimeoutWithoutCEP.java:101-102);
- pay (follow) arrives → every pending anchor it is the first follow of
  resolves as ``payed`` (within deadline) or ``payed_late`` (after it,
  the ":116 payed but already timeout" branch); the timer is dropped
  (deleteEventTimeTimer, :98,122 — here: state rewrite);
- timer fires (watermark ≥ deadline) → pending anchor emits ``timeout``;
- pay with no anchor ever seen → ``pay_no_create`` (:139).

State per key is O(pending anchors) plus one bool — the same footprint as
the reference's ValueState flags. At 100 TB the key space shards across
executors via the groupBy exchange; a production deployment would TTL the
``seen_anchor`` bool (kept forever here for exact orphan semantics).

Batch equivalence: on a bounded replay, payed/payed_late/pay_no_create rows
match operators.order_lifecycle exactly; ``timeout`` rows appear only for
anchors whose deadline the final watermark passed (timers that never fire
never emit) — the oracle encodes that watermark filter.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("anchor_id", T.LongType()),
        T.StructField("follow_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("anchor_ts", T.TimestampType()),
        T.StructField("follow_ts", T.TimestampType()),
        T.StructField("state", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("anchor_ids", T.ArrayType(T.LongType())),
        T.StructField("anchor_ts_us", T.ArrayType(T.LongType())),
        T.StructField("seen_anchor", T.BooleanType()),
    ]
)

_US = 1_000_000


def _ts(us: int):
    return pd.Timestamp(us, unit="us")


def make_detector(deadline_us: int, anchor_type: str = "signup", follow_type: str = "purchase"):
    """Build the per-key state function (returned separately so unit tests
    can drive it with a fake GroupState)."""

    def detect(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            anchor_ids, anchor_ts_us, seen = state.get
            pending = list(zip(anchor_ids, anchor_ts_us))
        else:
            pending, seen = [], False

        out: list[tuple] = []

        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            # anchors first at equal timestamps (batch uses follow_ts >= anchor_ts)
            rows["__anchor_first"] = (rows["event_type"] != anchor_type).astype(int)
            rows = rows.sort_values(["ts", "__anchor_first", "event_id"])
            for ev_id, ev_ts, ev_type in zip(
                rows["event_id"], rows["ts"], rows["event_type"]
            ):
                ts_us = ev_ts.value // 1000  # pandas ns → us
                if ev_type == anchor_type:
                    pending.append((int(ev_id), ts_us))
                    seen = True
                elif ev_type == follow_type:
                    if pending:
                        for a_id, a_us in pending:
                            st = "payed" if ts_us <= a_us + deadline_us else "payed_late"
                            out.append((a_id, int(ev_id), user_id, _ts(a_us), _ts(ts_us), st))
                        pending = []
                    elif not seen:
                        out.append((None, int(ev_id), user_id, None, _ts(ts_us), "pay_no_create"))

        # fire timers: watermark passed a pending deadline → timeout
        wm_us = state.getCurrentWatermarkMs() * 1000
        still = []
        for a_id, a_us in pending:
            if wm_us > 0 and a_us + deadline_us <= wm_us:
                out.append((a_id, None, user_id, _ts(a_us), None, "timeout"))
            else:
                still.append((a_id, a_us))
        pending = still

        state.update((
            [a for a, _ in pending],
            [u for _, u in pending],
            seen,
        ))
        if pending:
            next_fire_ms = min(u for _, u in pending) // 1000 + deadline_us // 1000
            state.setTimeoutTimestamp(max(next_fire_ms, state.getCurrentWatermarkMs() + 1))

        yield pd.DataFrame(
            out,
            columns=["anchor_id", "follow_id", "user_id", "anchor_ts", "follow_ts", "state"],
        )

    return detect


def stream_order_timeout(
    events: DataFrame,
    deadline: str = "6 hours",
    key: str = "user_id",
    anchor_type: str = "signup",
    follow_type: str = "purchase",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Wire the detector over a streaming events frame."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    qty, unit = deadline.split()
    unit_us = {"seconds": _US, "minutes": 60 * _US, "hours": 3600 * _US}[unit]
    deadline_us = int(qty) * unit_us

    filtered = (
        events.filter(F.col("event_type").isin(anchor_type, follow_type))
        .select("event_id", "ts", F.col(key).alias("user_id"), "event_type")
        .withWatermark("ts", watermark_delay)
    )
    return filtered.groupBy("user_id").applyInPandasWithState(
        make_detector(deadline_us, anchor_type, follow_type),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
