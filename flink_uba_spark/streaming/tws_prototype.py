"""``transformWithStateInPandas`` prototype (round 10 — VERDICT r9
item 2): the plain-chain NFA on Spark 4's arbitrary-state operator.

Spark 4.x ships ``transformWithStateInPandas`` (SPARK-49564, the
successor to ``applyInPandasWithState``): a ``StatefulProcessor`` with
TYPED value/list/map state handles and REAL event-time timers
(register/delete/list), lifting the two Spark-3 constraints this repo's
streaming engines were built around — the one-stateful-call-per-query
limit (which forced the branch-major ``seg_lens`` state packing,
streaming/pattern.py BRANCHING_STATE_SCHEMA) and the single implicit
timeout timestamp (which forced min-of-candidates timer folding).

This module runs the EXISTING per-key matcher
(``make_pattern_matcher``'s closure — state tuple in, frames out)
unchanged behind a shim that maps the GroupState surface onto a
ValueState handle + real timers, so output equality with
``stream_pattern_detect`` is by construction the shim's correctness,
and any wall-clock delta isolates the OPERATOR PROTOCOL (Arrow pipe,
state codec, RocksDB-backed store — transformWithState REQUIRES the
RocksDB provider) from NFA work. The measured comparison and the
adoption decision live in SCALE.md ("transformWithStateInPandas
prototype"); the production routes stay on ``applyInPandasWithState``.

ENVIRONMENT-BLOCKED in this sandbox (same class as the Kafka
connector, VERDICT "What's missing" #2): transformWithState's Python
state-server protocol imports ``google.protobuf``
(pyspark/sql/streaming/proto/StateMessage_pb2.py), and the ``protobuf``
package is absent here — the TWS driver worker crashes at PRE_INIT
with ``ImportError: cannot import name 'descriptor'`` before any user
code runs (reproduced on a trivial count processor;
tests/test_round10_ops.py::test_tws_prototype pins the gate and runs
the full equality check whenever the import succeeds).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from flink_uba_spark.streaming.pattern import (
    STATE_SCHEMA,
    make_pattern_matcher,
    pattern_output_schema,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """transformWithState's Python protocol needs ``google.protobuf``
    (absent in this sandbox — see module docstring); gate callers on
    this instead of crashing the TWS driver worker mid-query."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class _GroupStateShim:
    """The GroupState surface the matcher closure consumes, backed by a
    transformWithState ValueState + the invocation's watermark. Timer
    requests are recorded and applied by the processor (real timers,
    not the applyInPandasWithState min-fold emulation)."""

    def __init__(self, vstate, wm_ms: int, timed_out: bool):
        self._v = vstate
        self._wm = wm_ms
        self.hasTimedOut = timed_out
        self.requested_timer: int | None = None
        self.removed = False

    @property
    def exists(self) -> bool:
        return self._v.exists()

    @property
    def get(self):
        return tuple(self._v.get())

    def update(self, value) -> None:
        self._v.update(tuple(value))
        self.removed = False

    def remove(self) -> None:
        self._v.clear()
        self.removed = True

    def getCurrentWatermarkMs(self) -> int:
        return self._wm

    def setTimeoutTimestamp(self, ts_ms: int) -> None:
        self.requested_timer = int(ts_ms)


class ChainNFAProcessor(StatefulProcessor):
    """Runs a ``make_pattern_matcher`` closure per key with typed state +
    real event-time timers."""

    def __init__(self, step_types, withins_us, kleenes=None):
        self._fn_args = (step_types, withins_us, kleenes)

    def init(self, handle: StatefulProcessorHandle) -> None:
        step_types, withins_us, kleenes = self._fn_args
        self._detect = make_pattern_matcher(
            step_types, withins_us, kleenes=kleenes
        )
        self._state = handle.getValueState("nfa", STATE_SCHEMA)
        self._handle = handle

    def _sync_timer(self, shim: _GroupStateShim) -> None:
        if shim.requested_timer is None and not shim.removed:
            return
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        if shim.requested_timer is not None:
            self._handle.registerTimer(shim.requested_timer)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        shim = _GroupStateShim(
            self._state, timerValues.getCurrentWatermarkInMs(), False
        )
        yield from self._detect(key, rows, shim)
        self._sync_timer(shim)

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        shim = _GroupStateShim(
            self._state, timerValues.getCurrentWatermarkInMs(), True
        )
        yield from self._detect(key, iter([]), shim)
        self._sync_timer(shim)

    def close(self) -> None:
        pass


def tws_pattern_detect(
    events: DataFrame,
    key: str,
    steps: list[tuple],
    event_id: str = "event_id",
    ts: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """``stream_pattern_detect``'s plain-chain subset on
    transformWithStateInPandas (event-type string steps, optional
    withins, no guards/Kleene — the prototype scope). The caller must
    set ``spark.sql.streaming.stateStore.providerClass`` to
    :data:`ROCKSDB_PROVIDER` before starting the query (transformWith-
    State requires it)."""
    from flink_uba_spark.streaming.pattern import _interval_us

    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(its Python state-server protocol imports google.protobuf); "
            "absent in this environment — the applyInPandasWithState "
            "routes serve every production query (see module docstring)"
        )
    step_types = [s[0] for s in steps]
    if not all(isinstance(t, str) for t in step_types):
        raise ValueError("prototype scope: event-type string steps only")
    withins_us = [
        None if s[1] is None else _interval_us(s[1]) for s in steps
    ]
    n = len(steps)
    filtered = (
        events.filter(F.col("event_type").isin(*step_types))
        .select(
            F.col(event_id).alias("event_id"),
            F.col(ts).alias("ts"),
            F.col(key).alias("user_id"),
            "event_type",
        )
        .withWatermark("ts", watermark_delay)
    )
    return filtered.groupBy("user_id").transformWithStateInPandas(
        ChainNFAProcessor(step_types, withins_us),
        pattern_output_schema(n, [None] * n),
        "append",
        "eventTime",
    )
