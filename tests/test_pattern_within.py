"""pattern_within — Flink's GLOBAL match window (``Pattern...within(Time)``,
OrderPayTimeout.java:52-64) with the timed-out-partial side output.

The operator is a pure reclassification over ``pattern_detect`` (binding
under skip-till-next-match is within-independent), so the risk profile is
the classification algebra, not NFA state: verified here by a dedicated
brute reference + hypothesis property + boundary pins, and by the 3-SF
DuckDB oracle gate on the catalog pair
(pattern_within_view_click_purchase / stream_pattern_within_...).
"""

from __future__ import annotations

import pytest

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

EPOCH = datetime.datetime(2020, 1, 1)


def brute_within(events, n, window_us):
    """Reference: skip-till-next-match earliest binding — candidates
    are ADMITTED strictly after the previous row's position in the
    engine's (ts, rank, id) total order (rank = the event's earliest
    matching step), and among the admissible ones the EARLIEST by
    (ts, id) binds (the engine's min-of-struct; brute_chain's srows
    convention — round 9 fixed this brute's first-POSITION pick, which
    diverged when two same-ts candidates carried different ranks),
    then the global-window classification — matched iff complete and
    span ≤ window (inclusive), else a timeout row whose max_step counts
    the chain prefix bound at ``t1 + window`` (the NFA state at pruning
    time).

    ``events``: (eid, ts_us, mask) on one key, bit j ⇔ matches step j+1.
    Returns sorted (anchor_id, (t1..tn, None-padded), max_step,
    span_us | None, state).
    """
    full = (1 << n) - 1
    evs = [(eid, ts, m & full) for eid, ts, m in events if m & full]

    def rank(m):
        return (m & -m).bit_length()

    evs.sort(key=lambda e: (e[1], rank(e[2]), e[0]))
    out = []
    for p0, (eid, ts0, m) in enumerate(evs):
        if not (m & 1):
            continue
        tss = [ts0]
        pos = p0
        for s in range(2, n + 1):
            cands = [
                p for p in range(pos + 1, len(evs))
                if evs[p][2] >> (s - 1) & 1
            ]
            if not cands:
                break
            nxt = min(cands, key=lambda p: (evs[p][1], evs[p][0]))
            tss.append(evs[nxt][1])
            pos = nxt
        deadline = ts0 + window_us
        if len(tss) == n and tss[-1] <= deadline:
            out.append((eid, tuple(tss), n, tss[-1] - ts0, "matched"))
        else:
            ms = 1 + sum(1 for t in tss[1:] if t <= deadline)
            out.append(
                (eid, tuple(tss) + (None,) * (n - len(tss)), ms, None, "timeout")
            )
    return sorted(out)


def run_within(spark, events, n, window_us):
    """Run pattern_within on one key; extract brute_within's tuple shape."""
    from flink_uba_spark.operators.sequence import pattern_within

    schema = "event_id long, user_id long, ts timestamp, " + ", ".join(
        f"c{j} boolean" for j in range(n)
    )
    rows = [
        (eid, 0, EPOCH + datetime.timedelta(microseconds=ts),
         *[bool(m >> j & 1) for j in range(n)])
        for eid, ts, m in events
    ]
    df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    out = pattern_within(
        df,
        key="user_id",
        preds=[F.col(f"c{j}") for j in range(n)],
        window=f"INTERVAL {window_us} MICROSECONDS",
    ).toPandas()
    got = []
    for _, r in out.iterrows():
        tss = tuple(
            None
            if r[f"t{k}"] is None or str(r[f"t{k}"]) == "NaT"
            else int((r[f"t{k}"].to_pydatetime() - EPOCH).total_seconds() * 1e6)
            for k in range(1, n + 1)
        )
        span = None if r.isna()["span_us"] else int(r["span_us"])
        got.append((int(r["anchor_id"]), tss, int(r["max_step"]), span, r["state"]))
    return sorted(got)


def test_inclusive_boundary_span_exactly_window(spark):
    """span == window is matched — the family's inclusive deadline rule
    (order_lifecycle.py:82), NOT Flink's strict NFA clock; pinned so the
    choice is explicit."""
    events = [(1, 0, 0b001), (2, 40, 0b010), (3, 100, 0b100)]
    got = run_within(spark, events, 3, 100)
    assert got == [(1, (0, 40, 100), 3, 100, "matched")]
    assert got == brute_within(events, 3, 100)
    # one microsecond past → timeout, and the bound-at-expiry prefix is 2
    got2 = run_within(spark, events, 3, 99)
    assert got2 == [(1, (0, 40, 100), 2, None, "timeout")]
    assert got2 == brute_within(events, 3, 99)


def test_timeout_prefix_truncated_at_budget(spark):
    """A chain that COMPLETES but blows the window emits the partial the
    NFA held at expiry: steps bound past t1+W don't count toward
    max_step."""
    events = [(1, 0, 0b001), (2, 500, 0b010), (3, 600, 0b100)]
    got = run_within(spark, events, 3, 100)
    assert got == [(1, (0, 500, 600), 1, None, "timeout")]
    assert got == brute_within(events, 3, 100)


def test_incomplete_chain_is_timeout(spark):
    """No final candidate ever: the timed-out partial carries the bound
    prefix (Flink prunes at window expiry and emits via timeoutTag)."""
    events = [(1, 0, 0b01), (2, 30, 0b01)]
    got = run_within(spark, events, 2, 100)
    assert got == [
        (1, (0, None), 1, None, "timeout"),
        (2, (30, None), 1, None, "timeout"),
    ]
    assert got == brute_within(events, 2, 100)


def test_binding_is_window_independent(spark):
    """Skip-till-next binds the earliest candidate even when a LATER
    candidate would fit the budget — the engine never re-searches
    (the first-candidate-decides rule, payed vs payed_late)."""
    events = [(1, 0, 0b01), (2, 500, 0b10), (3, 50, 0b10)]
    # earliest step-2 candidate is id 3 at ts 50 (in budget) → matched
    got = run_within(spark, events, 2, 100)
    assert got == [(1, (0, 50), 2, 50, "matched")]
    # shrink the window under it → timeout; id 2 at 500 is never tried
    got2 = run_within(spark, events, 2, 30)
    assert got2 == [(1, (0, 50), 1, None, "timeout")]
    assert got2 == brute_within(events, 2, 30)


@st.composite
def within_case(draw):
    n = draw(st.integers(2, 4))
    n_ev = draw(st.integers(0, 12))
    events = []
    for i in range(n_ev):
        ts = draw(st.integers(0, 120))
        mask = draw(st.integers(1, (1 << n) - 1))
        events.append((i + 1, ts, mask))
    window = draw(st.integers(1, 150))
    return events, n, window


@pytest.mark.slow
@settings(max_examples=40, deadline=None)
@given(within_case())
def test_property_matches_brute(spark, case):
    events, n, window = case
    assert run_within(spark, events, n, window) == brute_within(events, n, window)
