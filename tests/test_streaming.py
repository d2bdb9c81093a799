"""Streaming twins: batch/stream equivalence (SURVEY.md §5 point 3) and
state-machine unit tests (§5 point 4)."""

from __future__ import annotations

import pandas as pd
import pytest

from flink_uba_spark.queries import streaming as SQ
from flink_uba_spark.queries import uba
from flink_uba_spark.streaming.order_timeout import make_detector
from tests.conftest import assert_matches_oracle

US = 1_000_000
H6 = 6 * 3600 * US


class FakeState:
    def __init__(self, watermark_ms=0, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self._wm = watermark_ms
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def getCurrentWatermarkMs(self):
        return self._wm

    def update(self, v):
        self._v = v

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = ms

    def remove(self):
        self._v = None


def _rows(*evs):
    return pd.DataFrame(
        [
            {"event_id": i, "ts": pd.Timestamp(ts_us, unit="us"), "event_type": t}
            for i, ts_us, t in evs
        ]
    )


_OUT_COLS = ["anchor_id", "follow_id", "user_id", "anchor_ts", "follow_ts", "state"]


def _collect(gen):
    frames = list(gen)
    if not frames:
        return pd.DataFrame(columns=_OUT_COLS)
    return pd.concat(frames, ignore_index=True)


def _run(detector, pdf, state):
    return _collect(detector((7,), iter([pdf]), state))


@pytest.fixture(scope="module")
def detector():
    return make_detector(H6)


def test_detector_payed_within_deadline(detector):
    st = FakeState()
    out = _run(detector, _rows((1, 0, "signup"), (2, US, "purchase")), st)
    assert list(out["state"]) == ["payed"]
    assert out.loc[0, "anchor_id"] == 1 and out.loc[0, "follow_id"] == 2


def test_detector_payed_late(detector):
    st = FakeState()
    out = _run(detector, _rows((1, 0, "signup"), (2, H6 + US, "purchase")), st)
    assert list(out["state"]) == ["payed_late"]


def test_detector_orphan_pay(detector):
    st = FakeState()
    out = _run(detector, _rows((2, US, "purchase")), st)
    assert list(out["state"]) == ["pay_no_create"]
    # a later pay after an anchor existed is NOT an orphan
    out2 = _run(detector, _rows((3, 2 * US, "signup"), (4, 3 * US, "purchase")), st)
    assert list(out2["state"]) == ["payed"]


def test_detector_timer_fires_timeout(detector):
    st = FakeState()
    out = _run(detector, _rows((1, 0, "signup")), st)
    assert len(out) == 0 and st.timeout_set is not None
    # watermark passes the deadline → timeout emitted on the timer call
    st2 = FakeState(watermark_ms=(H6 + US) // 1000, value=st._v, timed_out=True)
    out2 = _collect(detector((7,), iter([]), st2))
    assert list(out2["state"]) == ["timeout"]
    assert out2.loc[0, "anchor_id"] == 1


def test_detector_timer_boundary_is_ms_floored(detector):
    """ADVICE r1 boundary pin: the timer fires on deadline_us <= wm_ms*1000.
    An anchor whose deadline exceeds the ms-floored watermark by even 0.4 ms
    does NOT fire; exact ms equality DOES (non-strict <=). The streaming
    oracle replicates this with (epoch_us(w) // 1000) * 1000."""
    # anchor at 400us: deadline = H6 + 400us; wm_ms floor(H6/1000) → no fire
    st = FakeState()
    _run(detector, _rows((1, 400, "signup")), st)
    st2 = FakeState(watermark_ms=H6 // 1000, value=st._v, timed_out=True)
    out = _collect(detector((7,), iter([]), st2))
    assert len(out) == 0 and st2._v[0] == [1]
    # anchor at 0: deadline == wm_ms*1000 exactly → fires (<= is non-strict)
    st3 = FakeState()
    _run(detector, _rows((1, 0, "signup")), st3)
    st4 = FakeState(watermark_ms=H6 // 1000, value=st3._v, timed_out=True)
    out2 = _collect(detector((7,), iter([]), st4))
    assert list(out2["state"]) == ["timeout"]


def test_detector_unfired_timer_stays_pending(detector):
    st = FakeState()
    _run(detector, _rows((1, 0, "signup")), st)
    st2 = FakeState(watermark_ms=US // 1000, value=st._v, timed_out=True)  # before deadline
    out = _collect(detector((7,), iter([]), st2))
    assert len(out) == 0
    assert st2._v[0] == [1]  # anchor still pending


def test_stream_queries_match_oracle(spark, duck, sf_dir):
    for name in ("stream_hot_items", "stream_attribution_join", "stream_order_timeout_states"):
        assert_matches_oracle(SQ.QUERIES[name](spark, sf_dir), duck, SQ.ORACLES[name])


def test_stream_join_equals_batch(spark, sf_dir):
    """Stream-stream interval join converges to the batch answer on
    bounded input (watermarks bound state, not output)."""
    batch = uba.attribution_interval_join(spark, sf_dir).toPandas()
    stream = SQ.stream_attribution_join(spark, sf_dir).toPandas()
    assert len(batch) > 0, "batch join returned no rows — vacuous equivalence"
    key = ["pay_id", "view_id"]
    assert sorted(map(tuple, batch[key].values)) == sorted(map(tuple, stream[key].values))


def test_rocksdb_state_store_matches_default(spark, sf_dir):
    """The RocksDB state store — the production provider once streaming
    state exceeds executor heap (100 TB hot-items windows, dedup keys) —
    must produce byte-identical results to the default HDFS-backed store."""
    from pyspark.sql import functions as F

    from flink_uba_spark.streaming.runner import run_to_table, stream_events
    from flink_uba_spark.streaming.windows import stream_windowed_counts

    def q():
        ev = stream_events(spark, sf_dir)
        views = ev.filter(F.col("event_type") == "view").select(
            F.get_json_object("props", "$.k").cast("long").alias("item_id"), "ts"
        )
        return run_to_table(stream_windowed_counts(views, F.col("item_id"), "item_id"))

    base = q().toPandas()
    assert len(base) > 0, "no windows — vacuous equivalence"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        rocks = q().toPandas()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    cols = sorted(base.columns)
    b = base[cols].sort_values(cols).reset_index(drop=True)
    r = rocks[cols].sort_values(cols).reset_index(drop=True)
    assert b.equals(r)


def test_transition_state_links_across_micro_batches(spark, sf_dir):
    """The transition extractor's state must chain the LAST event of one
    micro-batch to the FIRST of the next — split the events into two
    time-ordered replay batches and require the same pair multiset as the
    batch lag-window form."""
    from pyspark.sql import functions as F

    from flink_uba_spark.queries.behavior import event_transition_matrix
    from flink_uba_spark.sources.readers import load_testdata
    from flink_uba_spark.streaming.runner import run_to_table, write_replay
    from flink_uba_spark.streaming.transitions import stream_transition_pairs

    ev = load_testdata(spark, sf_dir, ("events",))["events"].select(
        "user_id", "event_id", "event_type", "ts"
    )
    mid = ev.agg(F.expr("percentile_approx(unix_micros(ts), 0.5)")).collect()[0][0]
    first = ev.filter(F.unix_micros("ts") <= mid)
    second = ev.filter(F.unix_micros("ts") > mid)
    replay = write_replay([first, second], tag="transitions_2b")
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    pairs = run_to_table(stream_transition_pairs(sdf))
    got = (
        pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt")).toPandas()
    )
    want = event_transition_matrix(spark, sf_dir).toPandas()
    assert len(want) > 0, "no transitions — vacuous"
    cols = sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.equals(w)


# --- streaming N-step pattern matcher (streaming/pattern.py) ---

_P_STEPS = ["view", "click", "purchase"]
_P_WITHINS = [None, 30 * 60 * US, 2 * 3600 * US]


def _p_collect(gen):
    frames = list(gen)
    if not frames:
        return pd.DataFrame(
            columns=["user_id", "anchor_id", "t1", "t2", "t3", "max_step", "state"]
        )
    return pd.concat(frames, ignore_index=True)


def _p_rows(*evs):
    return pd.DataFrame(
        [
            {"event_id": i, "ts": pd.Timestamp(ts_us, unit="us"), "event_type": t}
            for i, ts_us, t in evs
        ]
    )


def test_pattern_matcher_single_batch_match_and_late():
    from flink_uba_spark.streaming.pattern import make_pattern_matcher

    detect = make_pattern_matcher(_P_STEPS, _P_WITHINS)
    st = FakeState()
    out = _p_collect(
        detect(
            (7,),
            iter(
                [
                    _p_rows(
                        (1, 0, "view"),
                        (2, 10 * 60 * US, "click"),          # within 30m
                        (3, 60 * 60 * US, "purchase"),       # within 2h of click
                        (4, 61 * 60 * US, "view"),
                        (5, 100 * 60 * US, "click"),         # 39m after view 4 -> late
                        (6, 110 * 60 * US, "purchase"),
                    )
                ]
            ),
            st,
        )
    )
    out = out.sort_values("anchor_id").reset_index(drop=True)
    assert list(out["anchor_id"]) == [1, 4]
    assert list(out["state"]) == ["matched", "matched_late"]
    assert st._v is None  # all chains resolved -> state removed


def test_pattern_matcher_chains_across_batches_and_shares_successors():
    from flink_uba_spark.streaming.pattern import make_pattern_matcher

    detect = make_pattern_matcher(_P_STEPS, _P_WITHINS)
    st = FakeState()
    # batch 1: two anchors + one click; nothing completes
    out1 = _p_collect(
        detect(
            (7,),
            iter([_p_rows((1, 0, "view"), (2, 5 * 60 * US, "view"), (3, 6 * 60 * US, "click"))]),
            st,
        )
    )
    assert len(out1) == 0 and st.exists
    # anchor 1 and 2 both bound click 3; both wait for purchase
    a_ids, steps = st.get[0], st.get[1]
    assert sorted(a_ids) == [1, 2] and list(steps) == [2, 2]
    # batch 2: one purchase completes BOTH chains off the shared click
    out2 = _p_collect(
        detect((7,), iter([_p_rows((9, 20 * 60 * US, "purchase"))]), st)
    )
    out2 = out2.sort_values("anchor_id").reset_index(drop=True)
    assert list(out2["anchor_id"]) == [1, 2]
    assert list(out2["state"]) == ["matched", "matched"]
    assert list(out2["t2"].astype("datetime64[ns]").astype("int64") // 1000) == [6 * 60 * US] * 2
    assert st._v is None


def test_pattern_matcher_same_ts_successor_counts():
    """A same-timestamp successor binds (the batch compiler's
    earlier-steps-first tie rule) and the (ts, id)-minimal candidate wins."""
    from flink_uba_spark.streaming.pattern import make_pattern_matcher

    detect = make_pattern_matcher(_P_STEPS, _P_WITHINS)
    st = FakeState()
    out = _p_collect(
        detect(
            (7,),
            iter(
                [
                    _p_rows(
                        (5, 0, "view"),
                        (4, 0, "click"),       # same ts as the view -> still binds
                        (9, 60, "purchase"),
                        (2, 60, "purchase"),   # equal ts: min id wins
                    )
                ]
            ),
            st,
        )
    )
    assert len(out) == 1 and out.loc[0, "anchor_id"] == 5
    assert out.loc[0, "state"] == "matched"


def test_stream_pattern_matches_batch_on_two_batch_replay(spark, sf_dir):
    """End-to-end: the streaming NFA over a two-batch event-time replay
    equals the batch pattern compiler minus its incomplete rows."""
    from pyspark.sql import functions as F

    from flink_uba_spark.queries.behavior import pattern_view_click_purchase
    from flink_uba_spark.sources.readers import load_testdata
    from flink_uba_spark.streaming.pattern import stream_pattern_detect
    from flink_uba_spark.streaming.runner import run_to_table, write_replay

    ev = load_testdata(spark, sf_dir, ("events",))["events"].select(
        "event_id", "ts", "user_id", "event_type"
    )
    mid = ev.agg(F.expr("percentile_approx(unix_micros(ts), 0.5)")).collect()[0][0]
    replay = write_replay(
        [ev.filter(F.unix_micros("ts") <= mid), ev.filter(F.unix_micros("ts") > mid)],
        tag="pattern_2b",
    )
    sdf = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(replay)
    )
    got = run_to_table(
        stream_pattern_detect(
            sdf,
            key="user_id",
            steps=[("view", None), ("click", "INTERVAL 30 MINUTES"), ("purchase", "INTERVAL 2 HOURS")],
        )
    ).toPandas()
    want = (
        pattern_view_click_purchase(spark, sf_dir)
        .filter("state != 'incomplete'")
        .toPandas()
    )
    assert len(want) > 100, "vacuous"
    cols = sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.equals(w)


def test_pattern_matcher_ttl_flushes_stale_chains_as_incomplete():
    """With state_ttl set, a chain idle past last-bound-ts + ttl (by
    watermark) flushes as an incomplete row and leaves state; fresh chains
    survive the same timer pass."""
    from flink_uba_spark.streaming.pattern import make_pattern_matcher

    ttl = 3600 * US
    detect = make_pattern_matcher(_P_STEPS, _P_WITHINS, ttl_us=ttl)
    st = FakeState()
    # two anchors: one stale (t=0), one fresh (t = ttl - 1s); wm still 0
    out1 = _p_collect(
        detect((7,), iter([_p_rows((1, 0, "view"), (2, ttl - US, "view"))]), st)
    )
    assert len(out1) == 0 and st.exists and st.timeout_set is not None
    # timer fires: watermark passes anchor-1's deadline only
    st.hasTimedOut = True
    st._wm = (ttl + 1000) // 1000  # ms, just past t1=0 + ttl
    out2 = _p_collect(detect((7,), iter([]), st))
    assert list(out2["anchor_id"]) == [1]
    assert list(out2["state"]) == ["incomplete"]
    assert list(out2["max_step"]) == [1]
    assert pd.isna(out2.loc[0, "t2"]) and pd.isna(out2.loc[0, "t3"])
    a_ids, steps = st.get[0], st.get[1]
    assert list(a_ids) == [2]  # fresh chain survives


def test_pattern_matcher_ttl_zero_none_is_exact():
    """ttl_us=None (the default) never flushes — state persists across an
    arbitrarily late binder, producing matched_late exactly as batch."""
    from flink_uba_spark.streaming.pattern import make_pattern_matcher

    detect = make_pattern_matcher(_P_STEPS, _P_WITHINS)
    st = FakeState()
    _p_collect(detect((7,), iter([_p_rows((1, 0, "view"))]), st))
    out = _p_collect(
        detect(
            (7,),
            iter([_p_rows((2, 10**10, "click"), (3, 10**10 + 1, "purchase"))]),
            st,
        )
    )
    assert list(out["state"]) == ["matched_late"]


def test_stream_pattern_arbitrary_predicates_match_batch(spark, sf_dir):
    """The streaming NFA accepts Column predicates (the batch compiler's
    surface): a value-filtered 3-step pattern over a two-batch replay must
    equal batch pattern_detect minus incomplete rows."""
    from pyspark.sql import functions as F

    from flink_uba_spark.operators.sequence import pattern_detect
    from flink_uba_spark.sources.readers import load_testdata
    from flink_uba_spark.streaming.pattern import stream_pattern_detect
    from flink_uba_spark.streaming.runner import run_to_table, write_replay

    preds = [
        (F.col("event_type") == "view") & (F.col("value") >= 0.3),
        F.col("event_type") == "click",
        (F.col("event_type") == "purchase") | (F.col("event_type") == "signup"),
    ]
    ev = load_testdata(spark, sf_dir, ("events",))["events"].select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    mid = ev.agg(F.expr("percentile_approx(unix_micros(ts), 0.5)")).collect()[0][0]
    replay = write_replay(
        [ev.filter(F.unix_micros("ts") <= mid), ev.filter(F.unix_micros("ts") > mid)],
        tag="pattern_pred_2b",
    )
    sdf = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(replay)
    )
    got = run_to_table(
        stream_pattern_detect(
            sdf,
            key="user_id",
            steps=[(preds[0], None), (preds[1], "INTERVAL 30 MINUTES"), (preds[2], "INTERVAL 2 HOURS")],
        )
    ).toPandas()
    want = (
        pattern_detect(
            ev,
            key="user_id",
            steps=[(preds[0], None), (preds[1], "INTERVAL 30 MINUTES"), (preds[2], "INTERVAL 2 HOURS")],
        )
        .filter("state != 'incomplete'")
        .withColumnRenamed("anchor_id", "anchor_id")
        .toPandas()
    )
    assert len(want) > 20, "vacuous"
    cols = sorted(set(got.columns) & set(want.columns))
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.equals(w)


# --- bounded-Kleene streaming NFA (streaming/pattern.py) ---

_K_OUT = ["user_id", "anchor_id", "t1", "t2", "t2_last", "n2", "t3", "max_step", "state"]


def _k_collect(gen):
    frames = list(gen)
    if not frames:
        return pd.DataFrame(columns=_K_OUT)
    return pd.concat(frames, ignore_index=True)


def _k_detector(gap_s=100, cap=3):
    from flink_uba_spark.streaming.pattern import make_kleene_matcher

    return make_kleene_matcher(["A", "B", "C"], gap_s * US, cap, None, None)


def _k_rows(*evs):
    return pd.DataFrame(
        [
            {"event_id": i, "ts": pd.Timestamp(ts_s * US, unit="us"), "event_type": t}
            for i, ts_s, t in evs
        ]
    )


def test_kleene_run_extends_across_batches_then_gap_closes():
    det = _k_detector()
    st = FakeState()
    out1 = _k_collect(det((7,), iter([_k_rows((1, 0, "A"), (2, 10, "B"))]), st))
    assert len(out1) == 0 and st.exists
    out2 = _k_collect(
        det((7,), iter([_k_rows((3, 50, "B"), (4, 400, "B"), (5, 500, "C"))]), st)
    )
    assert len(out2) == 1
    r = out2.iloc[0]
    assert (r["anchor_id"], r["n2"], r["state"]) == (1, 2, "matched")
    assert pd.Timestamp(r["t2_last"]).value // 1000 == 50 * US
    assert pd.Timestamp(r["t3"]).value // 1000 == 500 * US


def test_kleene_watermark_closure_binds_buffered_candidate():
    det = _k_detector(gap_s=100, cap=5)
    st = FakeState()
    # C arrives while the run is still open -> buffered, not bound
    out1 = _k_collect(
        det((7,), iter([_k_rows((1, 0, "A"), (2, 10, "B"), (3, 50, "C"))]), st)
    )
    assert len(out1) == 0 and st.exists and st.timeout_set is not None
    st.hasTimedOut = True
    st._wm = ((10 + 100) * US) // 1000 + 1  # ms, past last_rep + gap
    out2 = _k_collect(det((7,), iter([]), st))
    assert len(out2) == 1
    r = out2.iloc[0]
    assert (r["anchor_id"], r["n2"]) == (1, 1)
    assert pd.Timestamp(r["t3"]).value // 1000 == 50 * US
    assert st._v is None


def test_kleene_cap_closure_ignores_overflow_reps():
    det = _k_detector(gap_s=100, cap=3)
    st = FakeState()
    out = _k_collect(
        det(
            (7,),
            iter(
                [
                    _k_rows(
                        (1, 0, "A"), (2, 1, "B"), (3, 2, "B"), (4, 3, "B"),
                        (5, 4, "B"),               # beyond cap: not in the run
                        (6, 3, "C"), (7, 5, "C"),  # C@3 ties run-last ts; C@5 binds
                    )
                ]
            ),
            st,
        )
    )
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n2"], pd.Timestamp(r["t2_last"]).value // 1000 // US) == (3, 3)
    # run-last row (B@3, rank 2) precedes C@3 (rank 3) at equal ts -> C@3 binds
    assert pd.Timestamp(r["t3"]).value // 1000 == 3 * US


def _k_brute(events, gap_s=100, cap=3, final_wm_ms=None):
    """Batch Kleene semantics + the streaming closure filter."""
    gap = gap_s * US
    rank = {"A": 1, "B": 2, "C": 3}
    evs = sorted(
        [(i, s * US, t) for i, s, t in events if t in rank],
        key=lambda e: (e[1], rank[e[2]], e[0]),
    )
    if not evs:
        return []
    bpos = [(p, e) for p, e in enumerate(evs) if e[2] == "B"]
    bs = sorted(bpos, key=lambda pe: (pe[1][1], pe[1][0]))  # (ts, id) session order
    maxts = max(e[1] for e in evs)
    out = []
    for p0, (aid, ats, t) in enumerate(evs):
        if t != "A":
            continue
        entries = [(e[1], e[0], p, si) for si, (p, e) in enumerate(bs) if p > p0]
        if not entries:
            continue
        ets, eid, epos, esi = min(entries)
        # greedy run through (ts,id)-ordered B rows from esi
        n = 1
        last_si = esi
        while n < cap and last_si + 1 < len(bs):
            if bs[last_si + 1][1][1] <= bs[last_si][1][1] + gap:
                last_si += 1
                n += 1
            else:
                break
        lpos, (lid, lts, _) = bs[last_si][0], (bs[last_si][1][0], bs[last_si][1][1], 0)
        cands = [(e[1], e[0]) for p, e in enumerate(evs) if p > lpos and e[2] == "C"]
        if not cands:
            continue
        t3, _ = min(cands)
        closed = (
            n == cap
            or any(e[1] > lts + gap for e in evs)
            or (final_wm_ms is not None and lts + gap <= final_wm_ms * 1000)
        )
        if closed:
            out.append((aid, ets, lts, n, t3))
    return sorted(out)


@pytest.mark.parametrize("seed", range(12))
def test_kleene_nfa_matches_bruteforce_across_random_splits(seed):
    import random

    rnd = random.Random(seed)
    events = [
        (i, rnd.randint(0, 1500), rnd.choice("ABBCX"))
        for i in range(rnd.randint(0, 28))
    ]
    cuts = sorted(rnd.sample(range(1, 1500), rnd.randint(0, 3))) + [10**7]
    det = _k_detector(gap_s=100, cap=3)
    st = FakeState()
    got = []

    def drain(gen):
        for f in gen:
            for r in f.itertuples(index=False):
                got.append(
                    (
                        r.anchor_id,
                        pd.Timestamp(r.t2).value // 1000,
                        pd.Timestamp(r.t2_last).value // 1000,
                        r.n2,
                        pd.Timestamp(r.t3).value // 1000,
                    )
                )

    lo = -1
    for hi in cuts:
        batch = [e for e in events if lo < e[1] <= hi]
        lo = hi
        if batch:
            drain(det((7,), iter([_k_rows(*batch)]), st))
    # final watermark = max event time (ms floor), timers fire
    if events:
        wm_ms = (max(s for _, s, _ in events) * US) // 1000
        st.hasTimedOut = True
        st._wm = wm_ms
        drain(det((7,), iter([]), st))
        want = _k_brute(events, final_wm_ms=wm_ms)
    else:
        want = []
    assert sorted(got) == want
