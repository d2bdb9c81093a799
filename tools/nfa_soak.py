"""Adversarial soak for the CEP engines (round 5): randomized pattern
specs — plain/Kleene-times steps, notFollowedBy guards, optional steps,
overlapping slot masks — checked against the brute-force reference in
tests/test_properties_round5.py.

Three modes:
  python tools/nfa_soak.py stream [N]   # fake-state NFA, final-timer drive
  python tools/nfa_soak.py timers [N]   # + mid-stream timer firings and
                                        #   lagged watermarks (Spark's real
                                        #   mechanics)
  python tools/nfa_soak.py batch [N]    # the batch compiler on Spark

The stream soak runs ~100 cases/s; the batch soak ~0.7/s. Round-5 history:
the first 4000-case stream soak surfaced two real NFA bugs (provisional
guard/race decisions against tentative times() binders; buffer trimming a
same-timestamp run continuation) and the first 120-case batch soak two
more (optional-race tie direction; Kleene→optional race carry) — all
fixed and pinned as regression tests. Current status: clean over 50k
stream + 12k dense-tie + 27k timer + 330 batch cases.
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def random_case(rnd, max_steps=6, ts_range=200):
    from test_properties_round5 import slot_layout

    n = rnd.randint(2, max_steps)
    kpos = set(rnd.sample(range(1, n), rnd.randint(0, min(2, n - 1))))
    opt_cands = [k for k in range(2, n) if (k - 1) not in kpos and k not in kpos]
    opts = (
        frozenset(rnd.sample(opt_cands, 1))
        if opt_cands and rnd.random() < 0.5
        else frozenset()
    )
    guard_cands = [k for k in range(1, n) if k not in opts and (k + 1) not in opts]
    guards = frozenset(
        rnd.sample(guard_cands, min(len(guard_cands), rnd.randint(0, 2)))
    )

    def kspec():
        mx = rnd.randint(1, 3)
        return (rnd.randint(2, max(3, ts_range // 7)), mx, rnd.randint(1, mx))

    steps = [
        (
            rnd.choice([None, rnd.randint(2, max(3, ts_range // 3))]),
            kspec() if i in kpos else None,
        )
        for i in range(n)
    ]
    nslots = len(slot_layout(n, guards)[0])
    events = [
        (i, rnd.randint(0, ts_range), rnd.getrandbits(nslots) if rnd.random() < 0.92 else 0)
        for i in range(rnd.randint(0, 45))
    ]
    cuts = set(rnd.sample(range(1, ts_range), rnd.randint(0, 5)))
    return steps, guards, opts, events, cuts


def soak_stream(n_cases, timers=False):
    import pandas as pd

    from test_properties_round5 import _FakeState, brute_chain, _drive, slot_layout
    from flink_uba_spark.streaming.pattern import make_pattern_matcher

    def drive_timers(events, steps, cuts, guards, opts):
        n = len(steps)
        slots, pslot, gslot = slot_layout(n, guards)
        detect = make_pattern_matcher(
            [f"s{k}" for k in range(1, n + 1)],
            [w for w, _ in steps],
            kleenes=[k for _, k in steps],
            negations={k: f"x{k}" for k in gslot},
            optionals=set(opts),
        )
        state = _FakeState()
        got = []

        def _us(v):
            t = pd.Timestamp(v)
            return None if pd.isna(t) else t.value // 1000

        def drain(gen):
            for f in gen:
                for r in f.itertuples(index=False):
                    key = []
                    for s in range(1, n + 1):
                        key.append(_us(getattr(r, f"t{s}")))
                        if steps[s - 1][1] is not None:
                            key.append(_us(getattr(r, f"t{s}_last")))
                            key.append(int(getattr(r, f"n{s}")))
                    got.append((r.anchor_id, tuple(key), r.state))

        bounds = sorted(cuts) + [10 ** 9]
        lo, wm = -1, 0
        for hi in bounds:
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
                        **{
                            f"__{kind}{k}": bool(m >> j & 1)
                            for j, (kind, k) in enumerate(slots)
                        },
                    }
                    for eid, ts, m in batch
                ]
            )
            state.hasTimedOut = False
            drain(detect((1,), iter([pdf]), state))
            wm = max(wm, max(ts for _, ts, _ in batch) // 1000)
            for _ in range(8):  # mid-stream timer firings
                if state._v is None or state.timeout_set is None or state.timeout_set >= wm:
                    break
                state._wm, state.hasTimedOut, state.timeout_set = wm, True, None
                drain(detect((1,), iter([]), state))
            state.hasTimedOut = False
        if events and state._v is not None:
            state._wm = max(ts for _, ts, _ in events) // 1000
            state.hasTimedOut = True
            drain(detect((1,), iter([]), state))
        wm_final = (
            max((ts for _, ts, _ in events), default=0) // 1000 if events else None
        )
        return got, wm_final

    t0, fails = time.time(), 0
    for seed in range(n_cases):
        rnd = random.Random(seed * 7919 + 13)
        steps, guards, opts, events, cuts = random_case(rnd)
        if timers:
            got, wm = drive_timers(events, steps, cuts, guards, opts)
        else:
            got, wm = _drive(events, steps, cuts, guards=guards, opts=opts)
        want = brute_chain(events, steps, final_wm_ms=wm, guards=guards, opts=opts)
        if sorted(got) != want:
            fails += 1
            print(f"MISMATCH seed={seed} steps={steps} guards={guards} opts={opts}")
            if fails > 5:
                break
    print(f"{n_cases} cases ({'timers' if timers else 'final-wm'}), "
          f"{fails} failures, {time.time() - t0:.0f}s")
    return fails


def soak_batch(n_cases):
    import datetime

    import pandas as pd
    from pyspark.sql import functions as F

    from test_properties_round5 import brute_chain, slot_layout
    from flink_uba_spark.operators.sequence import pattern_detect
    from flink_uba_spark.session import get_spark

    spark = get_spark("nfa_soak")
    t0, fails = time.time(), 0
    for seed in range(n_cases):
        rnd = random.Random(seed * 271 + 5)
        steps, guards, opts, events, _ = random_case(rnd, max_steps=5, ts_range=120)
        slots, pslot, gslot = slot_layout(len(steps), guards)
        n, nslots = len(steps), len(slots)
        rows = [
            (eid, 1, datetime.datetime(2020, 1, 1) + datetime.timedelta(microseconds=ts),
             *[bool(m >> j & 1) for j in range(nslots)])
            for eid, ts, m in events
        ]
        schema = "event_id long, user_id long, ts timestamp, " + ", ".join(
            f"c{j} boolean" for j in range(nslots)
        )
        df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
        spec = []
        for k in range(1, n + 1):
            w, kl = steps[k - 1]
            if kl is not None:
                gap, mx, mn = kl
                spec.append((F.col(f"c{pslot[k]}"), f"INTERVAL {gap} MICROSECONDS", (mn, mx)))
            else:
                spec.append((
                    F.col(f"c{pslot[k]}"),
                    f"INTERVAL {w} MICROSECONDS" if w is not None else None,
                ))
        out = pattern_detect(
            df, key="user_id", steps=spec,
            not_followed_by={k: F.col(f"c{gslot[k]}") for k in guards},
            optional=set(opts),
        )
        pdf = out.filter(F.col("state").isin("matched", "matched_late")).toPandas()
        epoch0 = 1577836800000000
        got = []
        for _, r in pdf.iterrows():
            key = []
            for s in range(1, n + 1):
                v = r[f"t{s}"]
                key.append(None if pd.isna(v) else int(pd.Timestamp(v).value // 1000) - epoch0)
                if steps[s - 1][1] is not None:
                    lv = r[f"t{s}_last"]
                    key.append(None if pd.isna(lv) else int(pd.Timestamp(lv).value // 1000) - epoch0)
                    key.append(int(r[f"n{s}"]))
            got.append((int(r["anchor_id"]), tuple(key), r["state"]))
        # batch emits all runs regardless of closure; a Kleene step's
        # within IS its gap in the batch API
        want = brute_chain(
            events,
            [((kl[0] if kl is not None else w), kl) for (w, kl) in steps],
            final_wm_ms=10 ** 15, guards=guards, opts=frozenset(opts),
        )
        if sorted(got) != want:
            fails += 1
            print(f"MISMATCH seed={seed} steps={steps} guards={guards} opts={opts}")
            if fails > 5:
                break
    print(f"{n_cases} batch cases, {fails} failures, {time.time() - t0:.0f}s")
    return fails


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "stream"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else (2000 if mode != "batch" else 60)
    if mode == "batch":
        return 1 if soak_batch(n) else 0
    return 1 if soak_stream(n, timers=(mode == "timers")) else 0


if __name__ == "__main__":
    raise SystemExit(main())
