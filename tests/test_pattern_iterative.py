"""pattern_detect_iterative + stream_pattern_detect_iterative — Flink's
``IterativeCondition`` (``where(new IterativeCondition...)`` with
``ctx.getEventsForPattern``): step admissibility depending on the bound
prefix's values.

Brute reference here; hypothesis properties drive BOTH engines against it
(the stream via _FakeState micro-batch splits + mid-stream timers + final
drive); the distinguishing pin is condition-skip — a candidate failing its
iterative condition is SKIPPED and the search continues, which no
post-filter on the earliest match can reproduce. tools/nfa_soak.py gains an
``iter`` mode over the same brute. Catalog pair:
pattern_iterative_price_escalation / stream_... (3-SF DuckDB lateral-join
oracle).
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

EPOCH = datetime.datetime(2020, 1, 1)


def make_cond_py(spec):
    op, j = spec[0], spec[1]
    if op == "ge2x":
        return lambda pre, c: c[0] >= 2 * pre[j - 1][0]
    if op == "gt":
        return lambda pre, c: c[0] > pre[j - 1][0]
    if op == "le":
        return lambda pre, c: c[0] <= pre[j - 1][0]
    raise ValueError(op)


def make_cond_col(spec, k):
    op, j = spec[0], spec[1]
    if op == "ge2x":
        return F.col(f"v{k}") >= 2 * F.col(f"v{j}")
    if op == "gt":
        return F.col(f"v{k}") > F.col(f"v{j}")
    if op == "le":
        return F.col(f"v{k}") <= F.col(f"v{j}")
    raise ValueError(op)


def brute_iter(events, withins_us, conds, final_wm_us=None):
    """Greedy skip-till-next with iterative conditions.

    ``events``: (eid, ts_us, mask, val) on one key. ``conds``: dict step
    k -> spec for make_cond_py. Complete chains only; with
    ``final_wm_us`` set, restricted to chains whose END precedes it (the
    streaming emission contract). Returns sorted
    (i1..iN, t1..tN, v1..vN)."""
    n = len(withins_us)
    full = (1 << n) - 1
    evs = [(eid, ts, m & full, v) for eid, ts, m, v in events if m & full]

    def rank(m):
        return (m & -m).bit_length()

    evs.sort(key=lambda e: (e[1], rank(e[2]), e[0]))
    out = []
    for p0, (eid, ts0, m, v0) in enumerate(evs):
        if not (m & 1):
            continue
        chain = [p0]
        prefix = [(v0,)]
        pos = p0
        complete = True
        for s in range(2, n + 1):
            bound = evs[pos][1] + withins_us[s - 1]
            nxt = None
            for p in range(pos + 1, len(evs)):
                if evs[p][1] > bound:
                    break
                if evs[p][2] >> (s - 1) & 1 and (
                    s not in conds
                    or make_cond_py(conds[s])(prefix, (evs[p][3],))
                ):
                    nxt = p
                    break
            if nxt is None:
                complete = False
                break
            pos = nxt
            chain.append(nxt)
            prefix.append((evs[nxt][3],))
        if not complete:
            continue
        if final_wm_us is not None and evs[pos][1] >= final_wm_us:
            continue
        out.append(
            tuple(evs[p][0] for p in chain)
            + tuple(evs[p][1] for p in chain)
            + tuple(evs[p][3] for p in chain)
        )
    return sorted(out)


def run_iter_batch(spark, events, withins_us, conds, n):
    from flink_uba_spark.operators.sequence import pattern_detect_iterative

    schema = "event_id long, user_id long, ts timestamp, v long, " + ", ".join(
        f"c{j} boolean" for j in range(n)
    )
    rows = [
        (eid, 0, EPOCH + datetime.timedelta(microseconds=ts), val,
         *[bool(m >> j & 1) for j in range(n)])
        for eid, ts, m, val in events
    ]
    df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    out = pattern_detect_iterative(
        df,
        key="user_id",
        steps=[(F.col("c0"), None)]
        + [
            (F.col(f"c{k - 1}"), f"INTERVAL {withins_us[k - 1]} MICROSECONDS")
            for k in range(2, n + 1)
        ],
        payload={"v": F.col("v")},
        conds={k: make_cond_col(spec, k) for k, spec in conds.items()},
    ).toPandas()
    got = []
    for _, r in out.iterrows():
        got.append(
            tuple(int(r[f"i{k}"]) for k in range(1, n + 1))
            + tuple(
                int((r[f"t{k}"].to_pydatetime() - EPOCH).total_seconds() * 1e6)
                for k in range(1, n + 1)
            )
            + tuple(int(r[f"v{k}"]) for k in range(1, n + 1))
        )
    return sorted(got)


def run_iter_stream(events, withins_us, conds, n, cuts):
    """Drive make_iterative_matcher over micro-batch splits with
    mid-stream timers + the final availableNow drive (_FakeState, the
    stream-soak harness)."""
    from test_properties_round5 import _FakeState

    from flink_uba_spark.streaming.pattern import make_iterative_matcher

    detect = make_iterative_matcher(
        n, [0] + list(withins_us[1:]), 1,
        {k: make_cond_py(spec) for k, spec in conds.items()},
    )
    state = _FakeState()
    got = []

    def drain(gen):
        for f in gen:
            for r in f.itertuples(index=False):
                got.append(
                    tuple(int(getattr(r, f"i{k}")) for k in range(1, n + 1))
                    + tuple(
                        pd.Timestamp(getattr(r, f"t{k}")).value // 1000
                        for k in range(1, n + 1)
                    )
                    + tuple(int(getattr(r, f"v0_{k}")) for k in range(1, n + 1))
                )

    lo, wm = -1, 0
    for hi in cuts + [10 ** 12]:
        batch = [e for e in events if lo < e[1] <= hi]
        lo = hi
        if not batch:
            continue
        state._wm = wm  # lags one batch, as in Spark
        pdf = pd.DataFrame(
            [
                {
                    "event_id": eid,
                    "ts": pd.Timestamp(ts, unit="us"),
                    "__v0": val,
                    **{f"__p{k}": bool(m >> (k - 1) & 1) for k in range(1, n + 1)},
                }
                for eid, ts, m, val in batch
                if m
            ]
        )
        if not len(pdf):
            continue
        state.hasTimedOut = False
        drain(detect((1,), iter([pdf]), state))
        wm = max(wm, max(ts for _, ts, _, _ in batch) // 1000)
        for _ in range(8):
            if (
                state._v is None
                or state.timeout_set is None
                or state.timeout_set >= wm
            ):
                break
            state._wm, state.hasTimedOut, state.timeout_set = wm, True, None
            drain(detect((1,), iter([]), state))
            state.hasTimedOut = False
    if state._v is not None and events:
        state._wm = max(ts for _, ts, _, _ in events) // 1000
        state.hasTimedOut = True
        drain(detect((1,), iter([]), state))
    return sorted(got)


def test_condition_skip_not_post_filter(spark):
    """THE IterativeCondition distinction: the earliest candidate fails
    the condition and is SKIPPED; a later candidate binds. A post-filter
    on the skip-till-next earliest match would emit nothing."""
    #        anchor v=10     fails (15 < 20)   binds (25 >= 20)
    events = [(1, 0, 0b01, 10), (2, 10, 0b10, 15), (3, 20, 0b10, 25)]
    conds = {2: ("ge2x", 1)}
    want = [(1, 3, 0, 20, 10, 25)]
    assert brute_iter(events, [0, 100], conds) == want
    assert run_iter_batch(spark, events, [0, 100], conds, 2) == want


def test_condition_references_anchor_and_previous(spark):
    """Step 3's condition reads step 2's bound value, step 2's reads the
    anchor — ctx.getEventsForPattern across the whole prefix."""
    events = [
        (1, 0, 0b001, 10),
        (2, 5, 0b010, 20),   # binds step 2 (20 >= 2*10)
        (3, 8, 0b100, 15),   # fails step 3 (15 <= 20) → skipped
        (4, 12, 0b100, 21),  # binds step 3 (21 > 20)
    ]
    conds = {2: ("ge2x", 1), 3: ("gt", 2)}
    want = [(1, 2, 4, 0, 5, 12, 10, 20, 21)]
    assert brute_iter(events, [0, 50, 50], conds) == want
    assert run_iter_batch(spark, events, [0, 50, 50], conds, 3) == want


def test_within_mandatory():
    from flink_uba_spark.operators.sequence import pattern_detect_iterative

    with pytest.raises(ValueError, match="within"):
        pattern_detect_iterative(
            None, key="k", steps=[(F.lit(True), None), (F.lit(True), None)]
        )


def test_stream_final_wm_restriction():
    """A chain ending AT the final watermark is not final (strict µs
    comparison) — the oracle's ms-floored restriction, pinned."""
    events = [(1, 1000, 0b01, 5), (2, 2000, 0b10, 9)]
    # final wm_ms = 2 → wm_us = 2000; end == 2000 → held back
    assert run_iter_stream(events, [0, 5000], {}, 2, []) == []
    assert brute_iter(events, [0, 5000], {}, final_wm_us=2000) == []
    # a later unrelated row pushes the wm past the end → emits
    events2 = events + [(3, 9000, 0b10, 1)]
    got = run_iter_stream(events2, [0, 5000], {}, 2, [])
    assert got == brute_iter(events2, [0, 5000], {}, final_wm_us=9000)
    assert got == [(1, 2, 1000, 2000, 5, 9)]


@st.composite
def iter_case(draw):
    n = draw(st.integers(2, 4))
    n_ev = draw(st.integers(0, 14))
    events = []
    for i in range(n_ev):
        ts = draw(st.integers(0, 50)) * 1000  # ms-aligned for the wm gate
        mask = draw(st.integers(1, (1 << n) - 1))
        val = draw(st.integers(0, 30))
        events.append((i + 1, ts, mask, val))
    withins = [0] + [draw(st.integers(2, 40)) * 1000 for _ in range(n - 1)]
    conds = {}
    for k in range(2, n + 1):
        if draw(st.booleans()):
            op = draw(st.sampled_from(["ge2x", "gt", "le"]))
            j = draw(st.integers(1, k - 1))
            conds[k] = (op, j)
    return events, n, withins, conds


@pytest.mark.slow
@settings(max_examples=30, deadline=None)
@given(iter_case())
def test_property_batch_matches_brute(spark, case):
    events, n, withins, conds = case
    assert run_iter_batch(spark, events, withins, conds, n) == brute_iter(
        events, withins, conds
    )


@settings(max_examples=40, deadline=None)
@given(iter_case(), st.lists(st.integers(0, 50), max_size=4))
def test_property_stream_matches_brute(case, raw_cuts):
    events, n, withins, conds = case
    cuts = sorted({c * 1000 for c in raw_cuts})
    final_wm = (
        (max(ts for _, ts, _, _ in events) // 1000) * 1000 if events else None
    )
    assert run_iter_stream(events, withins, conds, n, cuts) == brute_iter(
        events, withins, conds, final_wm_us=final_wm
    )
