"""Streaming event-time temporal table join
(streaming/temporal.py:make_temporal_join_matcher) — brute property over
micro-batch splits + timers; values 3-SF oracle-gated via
stream_temporal_join_price_at_view."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


def brute_temporal(events, final_wm_us):
    """(rid, ts_us, is_fact, pay) on one key → emitted fact rows
    (fact_id, fact_ts, version_id or None): latest (ts, id) version
    at-or-before each fact with fact_ts < final_wm."""
    versions = sorted(
        ((ts, rid, pay) for rid, ts, isf, pay in events if not isf)
    )
    out = []
    for rid, ts, isf, _ in events:
        if not isf or ts >= final_wm_us:
            continue
        cand = [v for v in versions if v[0] <= ts]
        if cand:
            vts, vid, vpay = cand[-1]
            out.append((rid, ts, vid, vts, vpay))
        else:
            out.append((rid, ts, None, None, None))
    return sorted(out)


def run_temporal_stream(events, cuts):
    from test_properties_round5 import _FakeState

    from flink_uba_spark.streaming.temporal import make_temporal_join_matcher

    detect = make_temporal_join_matcher()
    state = _FakeState()
    got = []

    def drain(gen):
        for f in gen:
            for r in f.itertuples(index=False):
                got.append((
                    int(r.fact_id),
                    pd.Timestamp(r.fact_ts).value // 1000,
                    None if pd.isna(r.version_id) else int(r.version_id),
                    None if pd.isna(r.version_ts)
                    else pd.Timestamp(r.version_ts).value // 1000,
                    None if pd.isna(r.payload) else int(r.payload),
                ))

    lo, wm = -1, 0
    for hi in cuts + [10 ** 12]:
        batch = [e for e in events if lo < e[1] <= hi]
        lo = hi
        if not batch:
            continue
        state._wm = wm
        pdf = pd.DataFrame(
            [
                {"row_id": rid, "ts": pd.Timestamp(ts, unit="us"),
                 "is_fact": isf, "payload": pay}
                for rid, ts, isf, pay in batch
            ]
        )
        state.hasTimedOut = False
        drain(detect((1,), iter([pdf]), state))
        wm = max(wm, max(ts for _, ts, _, _ in batch) // 1000)
        for _ in range(8):
            if (state._v is None or state.timeout_set is None
                    or state.timeout_set >= wm):
                break
            state._wm, state.hasTimedOut, state.timeout_set = wm, True, None
            drain(detect((1,), iter([]), state))
    if state._v is not None and events:
        state._wm = max(ts for _, ts, _, _ in events) // 1000
        state.hasTimedOut = True
        drain(detect((1,), iter([]), state))
    return sorted(got)


def test_version_switch_and_null_before_first():
    events = [
        (1, 1000, True, 0),    # fact before any version → nulls
        (10, 2000, False, 5),  # version v=5
        (2, 3000, True, 0),    # fact reads v=5
        (11, 4000, False, 9),
        (3, 5000, True, 0),    # fact reads v=9
        (99, 9000, False, 1),  # tail row advances the wm past fact 3
    ]
    got = run_temporal_stream(events, [])
    assert got == brute_temporal(events, 9000)
    assert got == [
        (1, 1000, None, None, None),
        (2, 3000, 10, 2000, 5),
        (3, 5000, 11, 4000, 9),
    ]


def test_same_ts_last_writer_wins():
    events = [
        (10, 1000, False, 5),
        (12, 1000, False, 9),  # same ts, higher id wins
        (1, 2000, True, 0),
        (99, 9000, False, 1),
    ]
    got = run_temporal_stream(events, [])
    assert got == [(1, 2000, 12, 1000, 9)]
    assert got == brute_temporal(events, 9000)


@st.composite
def temporal_case(draw):
    n_ev = draw(st.integers(0, 16))
    events = []
    for i in range(n_ev):
        ts = draw(st.integers(0, 50)) * 1000
        isf = draw(st.booleans())
        pay = draw(st.integers(0, 20))
        events.append((i + 1, ts, isf, pay))
    cuts = sorted({c * 1000 for c in draw(st.lists(st.integers(0, 50), max_size=4))})
    return events, cuts


@settings(max_examples=60, deadline=None)
@given(temporal_case())
def test_property_matches_brute(case):
    events, cuts = case
    final_wm = (max(ts for _, ts, _, _ in events) // 1000) * 1000 if events else 0
    assert run_temporal_stream(events, cuts) == brute_temporal(events, final_wm)
