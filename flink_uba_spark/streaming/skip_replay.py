"""Watermark-driven AFTER MATCH skip replays as continuous queries
(round 9) — the two batch-only MATCH_RECOGNIZE routes lifted:

- ``stream_chain_skip_to_detect``: plain chains under ``SKIP TO
  FIRST/LAST <var>`` — Flink's AfterMatchSkipStrategy.SKIP_TO_FIRST /
  SKIP_TO_LAST (one event binds per variable on a plain chain, so
  FIRST ≡ LAST), the streaming twin of
  ``operators/sequence.py:after_match_skip_to_first`` over the chain
  engine's skip-till-next candidates;
- ``stream_reluctant_lazy_detect``: the reluctant lazy fold under
  ``SKIP PAST LAST ROW`` — per anchor the candidate completing EARLIEST
  (ties to the smaller repetition count) wins, then the non-overlap
  horizon replay — the streaming twin of
  ``match_recognize_reluctant_lazy``'s batch compile.

Both use the recompute-over-buffer pattern (the budget-run twin's
construction): per key, buffer the classified rows inside the
reachability horizon and re-derive the candidates VECTORIZED-ish on
every invoke; the skip replay itself is then a SEQUENTIAL horizon walk
that must observe candidates in completion order — the part that makes
these folds non-trivial on a stream. Decidability: every MATCHED
candidate satisfies ``end ≤ t1 + H`` (H = the spec's total within
budget: Σ withins for the chain, ``max_reps·gap + suffix_within`` for
the lazy run), and any future anchor has ``t1 ≥ wm − H`` — so once
``end + H < wm`` STRICTLY, no yet-unknown candidate can precede
``end`` in completion order and the replay prefix is final. State
beyond the row buffer is three scalars: the skip horizon pair and the
last-processed completion key (exactly-once: re-derived candidates at
or before it are skipped). Rows evict at ``ts < wm − 2H`` — processed
candidates reach back at most H from their end, ends still pending are
above ``wm − H``, and run/availability lookups are FORWARD-only from
the entry, so truncation never changes a pending candidate.

Scale: one keyed exchange, per-key state = row density × 2H, per
invoke O(buffer log buffer + candidates); the replay loop is
candidate-sized. Reference: Flink CEP AfterMatchSkipStrategy
(SKIP_TO_FIRST/SKIP_TO_LAST/SKIP_PAST_LAST_EVENT), the Pattern API
family of OrderPayTimeout.java:52-64.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NULL = -(1 << 62)

SKIP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("mask", T.ArrayType(T.LongType())),
        # [h_ts, h_id, lp_end_ts, lp_end_id, lp_t1, lp_anchor]
        T.StructField("ctrl", T.ArrayType(T.LongType())),
    ]
)


def skip_state_schema(with_vals: bool = False) -> T.StructType:
    """``SKIP_STATE_SCHEMA`` plus the optional row-major VALUE matrix
    (round 12 — value-aggregate MEASURES on the replay family). The
    extra field only exists for specs that declare value columns — a
    NEW query shape — so checkpoints of existing value-free queries
    keep their layout."""
    fields = list(SKIP_STATE_SCHEMA.fields)
    if with_vals:
        fields.append(T.StructField("vals", T.ArrayType(T.DoubleType())))
    return T.StructType(fields)


# ALL ROWS PER MATCH on the replay family (round 12 — VERDICT r11 item
# 3): one row per BOUND EVENT; ``var`` (CLASSIFIER) is attached by the
# front-end from ``seq`` — a compile-time constant per step
ALL_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("anchor_id", T.LongType()),
        # non-nullable: the batch explode's seq is F.lit(k) — schema
        # parity on the ALL-ROWS shape requires it here too
        T.StructField("seq", T.LongType(), nullable=False),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _agg_val(func: str, n_off: int, sl) -> float | None:
    """One aggregate over a run's value slice (float64, NaN = SQL null).
    sum/avg/min/max skip nulls (Spark's aggregate rule; all-null → null);
    first/last are ISO logical navigation with offset (past-the-run or a
    null value → null)."""
    if func in ("first", "last"):
        idx = n_off if func == "first" else len(sl) - 1 - n_off
        if idx < 0 or idx >= len(sl):
            return None
        v = float(sl[idx])
        return None if np.isnan(v) else v
    good = sl[~np.isnan(sl)]
    if func == "cnt":
        # non-null value count (avg's denominator — F.avg skips nulls)
        return float(len(good))
    if not len(good):
        return None
    if func == "sum":
        return float(good.sum())
    if func == "avg":
        return float(good.mean())
    if func == "min":
        return float(good.min())
    return float(good.max())


def chain_skip_output_schema(n_steps: int) -> T.StructType:
    return T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("anchor_id", T.LongType()),
            *[
                T.StructField(f"t{k}", T.TimestampType())
                for k in range(1, n_steps + 1)
            ],
            T.StructField("end_id", T.LongType()),
        ]
    )


LAZY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("anchor_id", T.LongType()),
        T.StructField("t1", T.TimestampType()),
        T.StructField("t2", T.TimestampType()),
        T.StructField("t2_last", T.TimestampType()),
        T.StructField("n2", T.LongType()),
        T.StructField("t3", T.TimestampType()),
        T.StructField("end_id", T.LongType()),
    ]
)


def _order_and_pos(ts, ids, mask, n_flags):
    """(ts, rank, id) total order (rank = earliest set flag's 2k−1 slot)
    → sorted arrays + positions + the sort permutation (round 12: the
    permutation lets value columns ride along without re-sorting)."""
    rank = np.full(len(ts), 2 * n_flags + 1, dtype="int64")
    for k in range(n_flags, 0, -1):
        rank = np.where((mask >> (k - 1)) & 1 == 1, 2 * k - 1, rank)
    order = np.lexsort((ids, rank, ts))
    return ts[order], ids[order], mask[order], rank[order], order


def _bind_next(st_ts, st_id, st_pos, prev_ts, prev_pos):
    """Earliest (ts, id) row strictly after position prev_pos; −1 if
    none. Linear only over the prev_ts tie group (the engine family's
    min-of-struct over the strictly-after frame)."""
    j = int(np.searchsorted(st_ts, prev_ts, side="left"))
    while j < len(st_ts) and st_ts[j] == prev_ts:
        if st_pos[j] > prev_pos:
            return j
        j += 1
    return j if j < len(st_ts) else -1


def make_chain_skip_replayer(n: int, withins_us: list, skip_step: int,
                             h_us: int, mode: str = "skip_to",
                             within_overall_us: int | None = None,
                             all_rows: bool = False):
    """Plain-chain skip-till-next candidates + the AFTER MATCH horizon
    replay (see module docstring). ``withins_us[k-1]`` bounds the
    transition INTO step k (entry None); all must be finite past the
    first — their sum is the decidability horizon ``h_us``.

    ``mode`` (round 10): ``"skip_to"`` — Flink's SKIP_TO_FIRST/LAST:
    survivors have their anchor AT-or-past the skip point
    (``chain[skip_step]``), which becomes the horizon; ``"past_last"``
    — SKIP_PAST_LAST_EVENT: survivors start STRICTLY past the emitted
    match's END (``chain[n]``), the trailing-run replayer's rule.

    ``within_overall_us`` (round 10, VERDICT r9 item 5): Flink's overall
    window — candidates with ``end > t1 + bound`` (inclusive bound, the
    repo convention) are NOT matches, so they prune BEFORE the fold and
    never advance the horizon or the last-processed key — exactly the
    batch compile's pre-fold filter. The prune only shrinks the
    candidate set (survivors still satisfy ``end ≤ t1 + H``), so the
    family's decidability contract is unchanged."""
    if mode not in ("skip_to", "past_last"):
        raise ValueError("mode: skip_to | past_last")
    past_last = mode == "past_last"

    def detect(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        timed_out = getattr(state, "hasTimedOut", False)
        chunks = [] if timed_out else [c for c in pdfs if len(c)]
        wm_us = state.getCurrentWatermarkMs() * 1000

        if state.exists:
            ts, ids, mask, ctrl = (
                np.asarray(f, dtype="int64") for f in state.get
            )
            ctrl = list(ctrl)
        else:
            ts = ids = mask = np.empty(0, dtype="int64")
            ctrl = [_NULL] * 6
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            ts = np.concatenate(
                [ts, pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()]
            )
            ids = np.concatenate([ids, pdf["event_id"].to_numpy().astype("int64")])
            m = np.zeros(len(pdf), dtype="int64")
            for k in range(1, n + 1):
                m |= pdf[f"f{k}"].to_numpy().astype("int64") << (k - 1)
            mask = np.concatenate([mask, m])

        out = None
        if len(ts):
            s_ts, s_id, s_mask, _rank, _ord = _order_and_pos(ts, ids, mask, n)
            pos = np.arange(len(s_ts))
            legs = []
            for k in range(1, n + 1):
                sel = np.nonzero((s_mask >> (k - 1)) & 1)[0]
                sel = sel[np.lexsort((s_id[sel], s_ts[sel]))]
                legs.append((s_ts[sel], s_id[sel], pos[sel]))
            cands = []
            a_ts, a_id, a_pos = legs[0]
            for ai in range(len(a_ts)):
                chain_ts, chain_id = [int(a_ts[ai])], [int(a_id[ai])]
                p_ts, p_pos = int(a_ts[ai]), int(a_pos[ai])
                ok = True
                for k in range(2, n + 1):
                    lt, li, lp = legs[k - 1]
                    j = _bind_next(lt, li, lp, p_ts, p_pos)
                    if j < 0:
                        ok = False
                        break
                    chain_ts.append(int(lt[j]))
                    chain_id.append(int(li[j]))
                    p_ts, p_pos = int(lt[j]), int(lp[j])
                    if (
                        withins_us[k - 1] is not None
                        and chain_ts[-1] > chain_ts[-2] + withins_us[k - 1]
                    ):
                        ok = False  # matched_late never emits under skip
                        break
                if not ok:
                    continue
                if (
                    within_overall_us is not None
                    and chain_ts[-1] > chain_ts[0] + within_overall_us
                ):
                    continue  # not a match — prunes BEFORE the fold
                cands.append((chain_ts, chain_id))
            # completion-order replay over the decidable prefix
            cands.sort(
                key=lambda c: (c[0][n - 1], c[1][n - 1], c[0][0], c[1][0])
            )
            rows = []
            h_ts, h_id = ctrl[0], ctrl[1]
            lp = tuple(ctrl[2:6])
            for chain_ts, chain_id in cands:
                ckey = (chain_ts[n - 1], chain_id[n - 1],
                        chain_ts[0], chain_id[0])
                if chain_ts[n - 1] + h_us >= wm_us:
                    break
                if lp[0] != _NULL and ckey <= lp:
                    continue
                lp = ckey
                anchor = (chain_ts[0], chain_id[0])
                survives = h_ts == _NULL or (
                    anchor > (h_ts, h_id) if past_last
                    else anchor >= (h_ts, h_id)
                )
                if survives:
                    if all_rows:
                        # one row per bound event (round 12 — the plain
                        # chain's per-step ids are the chain itself)
                        rows.extend(
                            {
                                "user_id": key[0],
                                "anchor_id": chain_id[0],
                                "seq": k,
                                "event_id": chain_id[k - 1],
                                "ts": chain_ts[k - 1],
                            }
                            for k in range(1, n + 1)
                        )
                    else:
                        rows.append(
                            {
                                "user_id": key[0],
                                "anchor_id": chain_id[0],
                                **{
                                    f"t{k}": chain_ts[k - 1]
                                    for k in range(1, n + 1)
                                },
                                "end_id": chain_id[n - 1],
                            }
                        )
                    sp = (
                        (chain_ts[n - 1], chain_id[n - 1])
                        if past_last
                        else (chain_ts[skip_step - 1], chain_id[skip_step - 1])
                    )
                    if h_ts == _NULL or sp > (h_ts, h_id):
                        h_ts, h_id = sp
            ctrl = [h_ts, h_id, *lp] if lp[0] != _NULL else [h_ts, h_id] + [_NULL] * 4
            if rows:
                out = pd.DataFrame(rows)
                if all_rows:
                    out["ts"] = pd.to_datetime(out["ts"], unit="us")
                else:
                    for k in range(1, n + 1):
                        out[f"t{k}"] = pd.to_datetime(out[f"t{k}"], unit="us")
            keep = s_ts >= wm_us - 2 * h_us
            ts, ids, mask = s_ts[keep], s_id[keep], s_mask[keep]

        if len(ts) or ctrl[0] != _NULL or ctrl[2] != _NULL:
            state.update(
                (ts.tolist(), ids.tolist(), mask.tolist(),
                 [int(x) for x in ctrl])
            )
            if len(ts):
                state.setTimeoutTimestamp(wm_us // 1000 + 1)
        elif state.exists:
            state.remove()
        if out is not None:
            yield out

    return detect


def make_lazy_reluctant_replayer(gap_us: int, sfx_us: int | None,
                                 mn: int, mx: int, h_us: int,
                                 within_overall_us: int | None = None):
    """Reluctant per-count candidates + the lazy preference + the SKIP
    PAST LAST horizon replay (see module docstring). Flags: bit0 anchor,
    bit1 run, bit2 suffix. ``within_overall_us`` (round 10) prunes a
    count candidate whose end exceeds the anchor bound BEFORE the lazy
    preference pick and the horizon walk — the bound depends only on
    the end, so violating candidates are a suffix of the per-anchor
    completion order and the preference among qualifying counts is
    exactly the batch window pipeline's."""

    def detect(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        timed_out = getattr(state, "hasTimedOut", False)
        chunks = [] if timed_out else [c for c in pdfs if len(c)]
        wm_us = state.getCurrentWatermarkMs() * 1000

        if state.exists:
            ts, ids, mask, ctrl = (
                np.asarray(f, dtype="int64") for f in state.get
            )
            ctrl = list(ctrl)
        else:
            ts = ids = mask = np.empty(0, dtype="int64")
            ctrl = [_NULL] * 6
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            ts = np.concatenate(
                [ts, pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()]
            )
            ids = np.concatenate([ids, pdf["event_id"].to_numpy().astype("int64")])
            m = np.zeros(len(pdf), dtype="int64")
            for k in range(1, 4):
                m |= pdf[f"f{k}"].to_numpy().astype("int64") << (k - 1)
            mask = np.concatenate([mask, m])

        out = None
        if len(ts):
            s_ts, s_id, s_mask, _rank, _ord = _order_and_pos(ts, ids, mask, 3)
            pos = np.arange(len(s_ts))
            # run rows in (ts, id) order + forward availability
            r_sel = np.nonzero((s_mask >> 1) & 1)[0]
            r_sel = r_sel[np.lexsort((s_id[r_sel], s_ts[r_sel]))]
            r_ts, r_id, r_pos = s_ts[r_sel], s_id[r_sel], pos[r_sel]
            nR = len(r_sel)
            if nR:
                new_sess = np.empty(nR, dtype=bool)
                new_sess[0] = True
                new_sess[1:] = r_ts[1:] > r_ts[:-1] + gap_us
                starts = np.nonzero(new_sess)[0]
                ends = np.append(starts[1:], nR)
                sess_end = np.empty(nR, dtype="int64")
                for si in range(len(starts)):
                    sess_end[starts[si]:ends[si]] = ends[si]
                avail = sess_end - np.arange(nR)
            else:
                avail = np.empty(0, dtype="int64")
            x_sel = np.nonzero((s_mask >> 2) & 1)[0]
            x_sel = x_sel[np.lexsort((s_id[x_sel], s_ts[x_sel]))]
            x_ts, x_id, x_pos = s_ts[x_sel], s_id[x_sel], pos[x_sel]
            a_sel = np.nonzero(s_mask & 1)[0]

            prefs = []
            for ai in a_sel:
                t1, i1, p1 = int(s_ts[ai]), int(s_id[ai]), int(pos[ai])
                best = None
                for m_ in range(mn, mx + 1):
                    # earliest (ts, id) entry strictly after the anchor
                    # with >= m_ forward repetitions
                    j = int(np.searchsorted(r_ts, t1, side="left"))
                    ent = -1
                    while j < nR:
                        if avail[j] >= m_ and r_pos[j] > p1:
                            ent = j
                            break
                        j += 1
                    if ent < 0:
                        continue
                    t2 = int(r_ts[ent])
                    last = ent + m_ - 1
                    t2l, lr_pos = int(r_ts[last]), int(r_pos[last])
                    sj = _bind_next(x_ts, x_id, x_pos, t2l, lr_pos)
                    if sj < 0:
                        continue
                    t3, i3 = int(x_ts[sj]), int(x_id[sj])
                    if t2 > t1 + gap_us:
                        continue  # matched_late never emits under skip
                    if sfx_us is not None and t3 > t2l + sfx_us:
                        continue
                    if (
                        within_overall_us is not None
                        and t3 > t1 + within_overall_us
                    ):
                        continue  # overall WITHIN: not a match at all
                    cand = (t3, i3, m_, t2, t2l)
                    if best is None or cand < best:
                        best = cand  # lazy: earliest completion, then m
                if best is not None:
                    prefs.append((t1, i1, best))
            prefs.sort(key=lambda p: (p[2][0], p[2][1], p[0], p[1]))
            rows = []
            h_ts, h_id = ctrl[0], ctrl[1]
            lp = tuple(ctrl[2:6])
            for t1, i1, (t3, i3, m_, t2, t2l) in prefs:
                if t3 + h_us >= wm_us:
                    break
                ckey = (t3, i3, t1, i1)
                if lp[0] != _NULL and ckey <= lp:
                    continue
                lp = ckey
                if h_ts == _NULL or (t1, i1) > (h_ts, h_id):
                    rows.append(
                        {
                            "user_id": key[0], "anchor_id": i1,
                            "t1": t1, "t2": t2, "t2_last": t2l,
                            "n2": m_, "t3": t3, "end_id": i3,
                        }
                    )
                    h_ts, h_id = t3, i3
            ctrl = [h_ts, h_id, *lp] if lp[0] != _NULL else [h_ts, h_id] + [_NULL] * 4
            if rows:
                out = pd.DataFrame(rows)
                for c in ("t1", "t2", "t2_last", "t3"):
                    out[c] = pd.to_datetime(out[c], unit="us")
            keep = s_ts >= wm_us - 2 * h_us
            ts, ids, mask = s_ts[keep], s_id[keep], s_mask[keep]

        if len(ts) or ctrl[0] != _NULL or ctrl[2] != _NULL:
            state.update(
                (ts.tolist(), ids.tolist(), mask.tolist(),
                 [int(x) for x in ctrl])
            )
            if len(ts):
                state.setTimeoutTimestamp(wm_us // 1000 + 1)
        elif state.exists:
            state.remove()
        if out is not None:
            yield out

    return detect


def trailing_run_output_schema(n_steps: int) -> T.StructType:
    return T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("anchor_id", T.LongType()),
            *[
                T.StructField(f"t{k}", T.TimestampType())
                for k in range(1, n_steps + 1)
            ],
            T.StructField(f"t{n_steps}_last", T.TimestampType()),
            T.StructField(f"n{n_steps}", T.LongType()),
            T.StructField("end_id", T.LongType()),
        ]
    )


def make_trailing_run_replayer(n: int, withins_us: list, gap_us: int,
                               mn: int, mx: int, h_us: int,
                               within_overall_us: int | None = None):
    """Trailing-GREEDY-run SKIP PAST LAST replay (round 9 second pass —
    the streaming twin of the batch trailing-run compile): plain steps
    1..n−1 bound skip-till-next, step n is a capped greedy run (gap
    sessions over the step's rows, entry = earliest admissible row with
    ≥ mn reachable repetitions — the times(mn, mx) binding), and the
    match's END is the run's LAST repetition.

    Decidability mirrors the family contract: a candidate's end sits
    ≤ t1 + H (H = Σ plain withins + entry within + mx·gap), future
    anchors produce ends ≥ wm, a pending prefix completed by a
    post-watermark row yields an end ≥ wm, and — the run-specific
    pieces — `end + H < wm` implies the run is gap-CLOSED (no future
    row can extend it: they all sit ≥ wm > end + gap) and the ENTRY
    choice is final (an earlier entry could only become valid if its
    own session were still open, but that session's last row precedes
    the bound entry, so it closed strictly earlier). Hence candidates
    with `end + H < wm` form a final completion-order prefix, exactly
    the chain replayer's rule."""

    def detect(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        timed_out = getattr(state, "hasTimedOut", False)
        chunks = [] if timed_out else [c for c in pdfs if len(c)]
        wm_us = state.getCurrentWatermarkMs() * 1000

        if state.exists:
            ts, ids, mask, ctrl = (
                np.asarray(f, dtype="int64") for f in state.get
            )
            ctrl = list(ctrl)
        else:
            ts = ids = mask = np.empty(0, dtype="int64")
            ctrl = [_NULL] * 6
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            ts = np.concatenate(
                [ts, pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()]
            )
            ids = np.concatenate([ids, pdf["event_id"].to_numpy().astype("int64")])
            m = np.zeros(len(pdf), dtype="int64")
            for k in range(1, n + 1):
                m |= pdf[f"f{k}"].to_numpy().astype("int64") << (k - 1)
            mask = np.concatenate([mask, m])

        out = None
        if len(ts):
            s_ts, s_id, s_mask, _rank, _ord = _order_and_pos(ts, ids, mask, n)
            pos = np.arange(len(s_ts))
            legs = []
            for k in range(1, n + 1):
                sel = np.nonzero((s_mask >> (k - 1)) & 1)[0]
                sel = sel[np.lexsort((s_id[sel], s_ts[sel]))]
                legs.append((s_ts[sel], s_id[sel], pos[sel]))
            bt, bi, bp = legs[n - 1]
            # greedy-run reachability over the run leg's (ts, id) order:
            # avail[j] = length of the gap-linked chain starting at j
            avail = np.ones(len(bt), dtype="int64")
            for i in range(len(bt) - 2, -1, -1):
                if bt[i + 1] <= bt[i] + gap_us:
                    avail[i] += avail[i + 1]
            cands = []
            a_ts, a_id, a_pos = legs[0]
            for ai in range(len(a_ts)):
                chain_ts, chain_id = [int(a_ts[ai])], [int(a_id[ai])]
                p_ts, p_pos = int(a_ts[ai]), int(a_pos[ai])
                ok = True
                for k in range(2, n):
                    lt, li, lp = legs[k - 1]
                    j = _bind_next(lt, li, lp, p_ts, p_pos)
                    if j < 0:
                        ok = False
                        break
                    chain_ts.append(int(lt[j]))
                    chain_id.append(int(li[j]))
                    p_ts, p_pos = int(lt[j]), int(lp[j])
                    if (
                        withins_us[k - 1] is not None
                        and chain_ts[-1] > chain_ts[-2] + withins_us[k - 1]
                    ):
                        ok = False  # matched_late never emits under skip
                        break
                if not ok:
                    continue
                # run entry: earliest admissible row with avail >= mn
                # (times(mn, mx): a shorter entry is not a valid binding
                # and the previous step binds the next valid one)
                j = int(np.searchsorted(bt, p_ts, side="left"))
                while j < len(bt) and (
                    (bt[j] == p_ts and bp[j] <= p_pos) or avail[j] < mn
                ):
                    j += 1
                if j >= len(bt):
                    continue
                if withins_us[n - 1] is not None and bt[j] > p_ts + withins_us[n - 1]:
                    continue  # matched_late
                cnt = int(min(avail[j], mx))
                last = j + cnt - 1
                if (
                    within_overall_us is not None
                    and int(bt[last]) > chain_ts[0] + within_overall_us
                ):
                    # overall WITHIN (round 10): a candidate whose run-last
                    # END exceeds the anchor bound is NOT a match — it
                    # prunes BEFORE the fold (batch-compile parity; the
                    # greedy run does NOT back off, Flink's timeout rule)
                    continue
                cands.append(
                    (chain_ts, chain_id, int(bt[j]), int(bi[j]),
                     int(bt[last]), int(bi[last]), cnt)
                )
            # completion-order replay over the decidable prefix — the
            # end is the run's LAST repetition
            cands.sort(key=lambda c: (c[4], c[5], c[0][0], c[1][0]))
            rows = []
            h_ts, h_id = ctrl[0], ctrl[1]
            lp = tuple(ctrl[2:6])
            for chain_ts, chain_id, e_ts, e_id, l_ts, l_id, cnt in cands:
                ckey = (l_ts, l_id, chain_ts[0], chain_id[0])
                if l_ts + h_us >= wm_us:
                    break
                if lp[0] != _NULL and ckey <= lp:
                    continue
                lp = ckey
                # SKIP PAST LAST: the anchor must be STRICTLY past the
                # previously emitted match's last event (the skip-to
                # replay's >= rule is the other strategy)
                if (h_ts == _NULL
                        or (chain_ts[0], chain_id[0]) > (h_ts, h_id)):
                    rows.append(
                        {
                            "user_id": key[0],
                            "anchor_id": chain_id[0],
                            **{
                                f"t{k}": chain_ts[k - 1]
                                for k in range(1, n)
                            },
                            f"t{n}": e_ts,
                            f"t{n}_last": l_ts,
                            f"n{n}": cnt,
                            "end_id": l_id,
                        }
                    )
                    if h_ts == _NULL or (l_ts, l_id) > (h_ts, h_id):
                        h_ts, h_id = l_ts, l_id
            ctrl = [h_ts, h_id, *lp] if lp[0] != _NULL else [h_ts, h_id] + [_NULL] * 4
            if rows:
                out = pd.DataFrame(rows)
                for c in [f"t{k}" for k in range(1, n + 1)] + [f"t{n}_last"]:
                    out[c] = pd.to_datetime(out[c], unit="us")
            keep = s_ts >= wm_us - 2 * h_us
            ts, ids, mask = s_ts[keep], s_id[keep], s_mask[keep]

        if len(ts) or ctrl[0] != _NULL or ctrl[2] != _NULL:
            state.update(
                (ts.tolist(), ids.tolist(), mask.tolist(),
                 [int(x) for x in ctrl])
            )
            if len(ts):
                state.setTimeoutTimestamp(wm_us // 1000 + 1)
        elif state.exists:
            state.remove()
        if out is not None:
            yield out

    return detect


def stream_trailing_run_detect(
    events: DataFrame,
    key: str,
    steps: list[tuple],
    event_id: str = "event_id",
    ts: str = "ts",
    watermark_delay: str = "0 seconds",
    within_overall: str | None = None,
) -> DataFrame:
    """Wire the trailing-run SKIP PAST LAST replay: ``steps`` is n−1
    plain ``(pred, within)`` entries followed by one
    ``(pred, within, (mn, mx))`` capped-run entry (finite cap mandatory
    — ``mx·gap`` is part of the replay horizon; every within after the
    first mandatory too)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from flink_uba_spark.streaming.pattern import _interval_us

    n = len(steps)
    if n < 2:
        raise ValueError("need at least 2 steps")
    if len(steps[-1]) != 3:
        raise ValueError("the last step must carry the (mn, mx) run spec")
    mn, mx = steps[-1][2]
    if mx == float("inf"):
        raise ValueError(
            "the streaming trailing-run replay needs a FINITE cap "
            "(mx·gap is part of the replay horizon)"
        )
    mn, mx = int(mn), int(mx)
    if mn < 1 or mx < mn:
        raise ValueError("need 1 <= mn <= mx")
    withins_us = [None] + [
        None if s[1] is None else _interval_us(s[1]) for s in steps[1:]
    ]
    if any(w is None for w in withins_us[1:]):
        raise ValueError(
            "the streaming trailing-run replay needs a FINITE within on "
            "every transition (their sum bounds the replay horizon)"
        )
    gap_us = withins_us[n - 1]  # the front-end ties entry within + gap
    h_us = sum(withins_us[1:]) + mx * gap_us
    flags = {f"f{k}": s[0].cast("boolean") for k, s in enumerate(steps, 1)}
    filtered = _wire(events, key, flags, event_id, ts, watermark_delay)
    wo_us = None if within_overall is None else _interval_us(within_overall)
    return filtered.groupBy("user_id").applyInPandasWithState(
        make_trailing_run_replayer(
            n, withins_us, gap_us, mn, mx, h_us, within_overall_us=wo_us
        ),
        trailing_run_output_schema(n),
        SKIP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def quantified_chain_output_schema(
    n_steps: int, quant: set[int],
    agg_fields: list[tuple[str, bool]] | None = None,
) -> T.StructType:
    """``agg_fields`` (round 12): one extra column per value-aggregate
    MEASURE — ``(name, integral)``; integral aggregates emit LongType
    (exact for |v| < 2^53 — the float64 state carrier's envelope),
    others DoubleType."""
    fields = [
        T.StructField("user_id", T.LongType()),
        T.StructField("anchor_id", T.LongType()),
    ]
    for k in range(1, n_steps + 1):
        fields.append(T.StructField(f"t{k}", T.TimestampType()))
        if k in quant:
            fields.append(T.StructField(f"t{k}_last", T.TimestampType()))
            fields.append(T.StructField(f"n{k}", T.LongType()))
    fields.append(T.StructField("end_id", T.LongType()))
    for name, integral in agg_fields or ():
        fields.append(
            T.StructField(name, T.LongType() if integral else T.DoubleType())
        )
    return T.StructType(fields)


def make_quantified_chain_replayer(n: int, withins_us: list, kleenes: list,
                                   h_us: int,
                                   within_overall_us: int | None = None,
                                   optionals: set[int] | None = None,
                                   mode: str = "past_last",
                                   all_rows: bool = False,
                                   n_vals: int = 0,
                                   aggs: list[tuple] | None = None):
    """GENERAL quantified-chain SKIP PAST LAST replay (round 11 — VERDICT
    r10 item 6, the last within_overall cell, and with it the whole
    'quantified chain under SKIP PAST LAST' streaming family): any step
    may be a capped GREEDY run (``kleenes[k-1] = (gap_us, mn, mx)``,
    finite mx), at ANY position — the trailing-run replayer generalized.

    Per step the binding is the batch single-plan rule: a plain step
    binds the earliest (ts, id) row strictly after the frontier; a
    quantified step binds the earliest admissible ENTRY whose gap-linked
    session holds ≥ mn repetitions, takes ``cnt = min(avail, mx)`` reps,
    and moves the frontier to the run's LAST repetition (skip-till-next
    continues from there). Transition withins classify entry rows from
    the previous frontier (a violating bind is ``matched_late`` and
    never emits under skip). ``within_overall`` prunes candidates whose
    END (the last step's bind, or its run-last) exceeds the anchor
    bound BEFORE the fold — pruned candidates never advance the
    horizon, the batch compile's rule.

    Decidability is the family contract with the trailing replayer's
    run-specific arguments applied PER quantified step: every candidate
    end sits ≤ t1 + H (H = Σ entry withins + Σ mx·gap over quantified
    steps); once ``end + H < wm`` strictly, every involved run is
    gap-closed (any extending row would sit ≥ wm > run_last + gap,
    since each run_last ≤ end) and each entry choice is final (an
    earlier admissible entry's session would have closed strictly
    earlier), so candidates below the cut form a final
    completion-order prefix.

    ``optionals`` (round 11 second pass — the last in-NFA-fold cell):
    interior OPTIONAL steps take the engines' greedy race — the step
    binds unless the earliest candidate of the NEXT step strictly
    precedes its own earliest candidate in (ts, position) order (a tie,
    the same row serving both steps, takes); a skipped optional leaves
    the frontier unchanged, emits a null t{k}, and the next step's
    within classifies from the pre-optional frontier (the batch
    fall-through rule).

    Round 12 (VERDICT r11 items 2/3):

    - ``mode="no_skip"`` — every anchor's candidate emits (the NO SKIP
      strategy): the horizon never advances and ``survives`` is always
      true. The decidability cut and the last-processed exactly-once
      walk are unchanged — emitted candidates still form a final
      completion-order prefix (any yet-unknown candidate's end sits
      ≥ wm − H, strictly after every emitted end under the cut).
    - ``all_rows=True`` — ALL ROWS PER MATCH: instead of the ONE-row
      shape, emit one row per BOUND EVENT (``ALL_ROWS_SCHEMA``); a
      quantified step enumerates its whole run — the replayer holds
      the run's member rows (leg slice ``j..j+cnt−1``), so no band
      join is needed, unlike batch.
    - ``n_vals``/``aggs`` — value-aggregate MEASURES: ``n_vals`` value
      columns (``v0..``, float64, NaN = null) ride the buffer (state
      field 5, ``skip_state_schema``); each ``aggs`` entry
      ``(k, vi, func, n_off, name, integral)`` emits one extra output
      column = ``func`` over step k's bound rows' ``vi``-th value —
      exact run membership, the batch band join's stream twin."""
    opts = set(optionals or ())
    if mode not in ("past_last", "no_skip"):
        raise ValueError("mode: past_last | no_skip")
    if all_rows and aggs:
        raise ValueError("ALL ROWS and aggregate MEASURES are exclusive")
    aggs = list(aggs or ())

    def detect(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        timed_out = getattr(state, "hasTimedOut", False)
        chunks = [] if timed_out else [c for c in pdfs if len(c)]
        wm_us = state.getCurrentWatermarkMs() * 1000

        if state.exists:
            got = state.get
            ts, ids, mask, ctrl = (
                np.asarray(f, dtype="int64") for f in got[:4]
            )
            ctrl = list(ctrl)
            vals = (
                np.asarray(got[4], dtype="float64").reshape(-1, n_vals)
                if n_vals else np.empty((len(ts), 0))
            )
        else:
            ts = ids = mask = np.empty(0, dtype="int64")
            ctrl = [_NULL] * 6
            vals = np.empty((0, n_vals))
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            ts = np.concatenate(
                [ts, pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()]
            )
            ids = np.concatenate([ids, pdf["event_id"].to_numpy().astype("int64")])
            m = np.zeros(len(pdf), dtype="int64")
            for k in range(1, n + 1):
                m |= pdf[f"f{k}"].to_numpy().astype("int64") << (k - 1)
            mask = np.concatenate([mask, m])
            if n_vals:
                vals = np.concatenate(
                    [
                        vals,
                        np.stack(
                            [
                                pdf[f"v{i}"].to_numpy(dtype="float64",
                                                      na_value=np.nan)
                                for i in range(n_vals)
                            ],
                            axis=1,
                        ),
                    ]
                )

        out = None
        if len(ts):
            s_ts, s_id, s_mask, _rank, _ord = _order_and_pos(ts, ids, mask, n)
            s_vals = vals[_ord] if n_vals else None
            pos = np.arange(len(s_ts))
            legs, avails, leg_vals = [], [], []
            for k in range(1, n + 1):
                sel = np.nonzero((s_mask >> (k - 1)) & 1)[0]
                sel = sel[np.lexsort((s_id[sel], s_ts[sel]))]
                legs.append((s_ts[sel], s_id[sel], pos[sel]))
                leg_vals.append(s_vals[sel] if n_vals else None)
                if kleenes[k - 1] is not None:
                    gap_us = kleenes[k - 1][0]
                    bt = s_ts[sel]
                    avail = np.ones(len(bt), dtype="int64")
                    for i in range(len(bt) - 2, -1, -1):
                        if bt[i + 1] <= bt[i] + gap_us:
                            avail[i] += avail[i + 1]
                    avails.append(avail)
                else:
                    avails.append(None)
            def _cand(k, p_ts, p_pos):
                """Earliest candidate of step k strictly after the
                frontier — a plain step's next row, or a quantified
                step's earliest admissible entry (avail >= mn). Returns
                (leg index, ts, timeline position) or None."""
                lt, li, lp = legs[k - 1]
                if kleenes[k - 1] is None:
                    j = _bind_next(lt, li, lp, p_ts, p_pos)
                    return None if j < 0 else (j, int(lt[j]), int(lp[j]))
                mn = kleenes[k - 1][1]
                avail = avails[k - 1]
                j = int(np.searchsorted(lt, p_ts, side="left"))
                while j < len(lt) and (
                    (lt[j] == p_ts and lp[j] <= p_pos) or avail[j] < mn
                ):
                    j += 1
                return None if j >= len(lt) else (j, int(lt[j]), int(lp[j]))

            cands = []
            a_ts, a_id, a_pos = legs[0]
            for ai in range(len(a_ts)):
                # per step: (entry_ts, entry_id, last_ts, last_id, cnt,
                # leg_j) — plain steps carry cnt 0 and entry == last; a
                # skipped optional carries None entries (null t{k});
                # leg_j indexes the step's leg arrays (run slice
                # j..j+cnt−1 — the ALL ROWS / value-aggregate member set)
                rec = [
                    (int(a_ts[ai]), int(a_id[ai]),
                     int(a_ts[ai]), int(a_id[ai]), 0, ai)
                ]
                p_ts, p_pos = int(a_ts[ai]), int(a_pos[ai])
                ok = True
                for k in range(2, n + 1):
                    c = _cand(k, p_ts, p_pos)
                    if k in opts:
                        # the greedy race: skip iff the next step's
                        # earliest candidate STRICTLY precedes this
                        # step's (timeline positions are (ts, rank, id)
                        # total-order indexes; a tie — the same row
                        # serving both — takes)
                        nxt = _cand(k + 1, p_ts, p_pos)
                        if c is None or (
                            nxt is not None and nxt[2] < c[2]
                        ):
                            rec.append((None, None, None, None, 0, -1))
                            continue  # frontier unchanged — fall through
                    if c is None:
                        ok = False
                        break
                    j, c_ts, c_pos = c
                    if (
                        withins_us[k - 1] is not None
                        and c_ts > p_ts + withins_us[k - 1]
                    ):
                        ok = False  # matched_late never emits under skip
                        break
                    lt, li, lp = legs[k - 1]
                    if kleenes[k - 1] is None:
                        rec.append((c_ts, int(li[j]), c_ts, int(li[j]), 0, j))
                        p_ts, p_pos = c_ts, c_pos
                    else:
                        cnt = int(min(avails[k - 1][j], kleenes[k - 1][2]))
                        last = j + cnt - 1
                        rec.append(
                            (c_ts, int(li[j]),
                             int(lt[last]), int(li[last]), cnt, j)
                        )
                        p_ts, p_pos = int(lt[last]), int(lp[last])
                if not ok:
                    continue
                end_ts, end_id = rec[n - 1][2], rec[n - 1][3]
                if (
                    within_overall_us is not None
                    and end_ts > rec[0][0] + within_overall_us
                ):
                    continue  # not a match — prunes BEFORE the fold
                cands.append((rec, end_ts, end_id))
            cands.sort(key=lambda c: (c[1], c[2], c[0][0][0], c[0][0][1]))
            rows = []
            h_ts, h_id = ctrl[0], ctrl[1]
            lp_key = tuple(ctrl[2:6])
            for rec, end_ts, end_id in cands:
                ckey = (end_ts, end_id, rec[0][0], rec[0][1])
                if end_ts + h_us >= wm_us:
                    break
                if lp_key[0] != _NULL and ckey <= lp_key:
                    continue
                lp_key = ckey
                if mode == "no_skip" or h_ts == _NULL or (
                    (rec[0][0], rec[0][1]) > (h_ts, h_id)
                ):
                    if all_rows:
                        # one row per bound event; a quantified step's
                        # run is the leg slice j..j+cnt−1 (skipped
                        # optionals contribute nothing)
                        for k in range(1, n + 1):
                            e = rec[k - 1]
                            if e[0] is None:
                                continue
                            lt_k, li_k, _lp_k = legs[k - 1]
                            lj, cnt = e[5], max(e[4], 1)
                            rows.extend(
                                {
                                    "user_id": key[0],
                                    "anchor_id": rec[0][1],
                                    "seq": k,
                                    "event_id": int(li_k[lj + r]),
                                    "ts": int(lt_k[lj + r]),
                                }
                                for r in range(cnt)
                            )
                    else:
                        row = {"user_id": key[0], "anchor_id": rec[0][1]}
                        for k in range(1, n + 1):
                            row[f"t{k}"] = rec[k - 1][0]
                            if kleenes[k - 1] is not None:
                                row[f"t{k}_last"] = rec[k - 1][2]
                                row[f"n{k}"] = rec[k - 1][4]
                        row["end_id"] = end_id
                        for k, vi, func, n_off, name, _intg in aggs:
                            e = rec[k - 1]
                            if e[0] is None:
                                row[name] = None
                                continue
                            lj, cnt = e[5], max(e[4], 1)
                            row[name] = _agg_val(
                                func, n_off,
                                leg_vals[k - 1][lj:lj + cnt, vi],
                            )
                        rows.append(row)
                    if mode != "no_skip" and (
                        h_ts == _NULL or (end_ts, end_id) > (h_ts, h_id)
                    ):
                        h_ts, h_id = end_ts, end_id
            ctrl = (
                [h_ts, h_id, *lp_key]
                if lp_key[0] != _NULL
                else [h_ts, h_id] + [_NULL] * 4
            )
            if rows:
                out = pd.DataFrame(rows)
                if all_rows:
                    out["ts"] = pd.to_datetime(out["ts"], unit="us")
                else:
                    for k in range(1, n + 1):
                        out[f"t{k}"] = pd.to_datetime(out[f"t{k}"], unit="us")
                        if kleenes[k - 1] is not None:
                            out[f"t{k}_last"] = pd.to_datetime(
                                out[f"t{k}_last"], unit="us"
                            )
                    for _k, _vi, _fn, _no, name, integral in aggs:
                        if integral:
                            out[name] = pd.array(
                                [
                                    None if pd.isna(v) else int(round(v))
                                    for v in out[name]
                                ],
                                dtype="Int64",
                            )
                        else:
                            out[name] = pd.array(out[name], dtype="Float64")
            keep = s_ts >= wm_us - 2 * h_us
            ts, ids, mask = s_ts[keep], s_id[keep], s_mask[keep]
            if n_vals:
                vals = s_vals[keep]

        if len(ts) or ctrl[0] != _NULL or ctrl[2] != _NULL:
            state.update(
                (ts.tolist(), ids.tolist(), mask.tolist(),
                 [int(x) for x in ctrl])
                + ((vals.reshape(-1).tolist(),) if n_vals else ())
            )
            if len(ts):
                state.setTimeoutTimestamp(wm_us // 1000 + 1)
        elif state.exists:
            state.remove()
        if out is not None:
            yield out

    return detect


def stream_quantified_chain_detect(
    events: DataFrame,
    key: str,
    steps: list[tuple],
    event_id: str = "event_id",
    ts: str = "ts",
    watermark_delay: str = "0 seconds",
    within_overall: str | None = None,
    optional: set[int] | None = None,
    mode: str = "past_last",
    all_rows: bool = False,
    values: dict[str, Column] | None = None,
    aggs: list[tuple] | None = None,
) -> DataFrame:
    """Wire the general quantified-chain SKIP PAST LAST replay:
    ``steps`` entries are ``(pred, within)`` (plain) or
    ``(pred, within, (mn, mx))`` (capped greedy run, ANY position past
    the first; finite cap and finite withins mandatory — Σ within +
    Σ mx·gap is the replay horizon). ``optional`` marks interior plain
    steps with the engines' greedy-race single-match semantics.

    Round 12: ``mode="no_skip"`` emits every anchor's candidate (no
    fold); ``all_rows=True`` emits per-BOUND-EVENT rows
    (``ALL_ROWS_SCHEMA``); ``values`` declares named value Columns that
    ride the buffer (cast to double; state schema gains the ``vals``
    field) and ``aggs`` entries ``(k, value_name, func, n_offset,
    out_name, integral)`` emit one aggregate column each over step k's
    bound rows — see ``make_quantified_chain_replayer``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from flink_uba_spark.streaming.pattern import _interval_us

    n = len(steps)
    if n < 2:
        raise ValueError("need at least 2 steps")
    if len(steps[0]) > 2 and steps[0][2] is not None:
        raise ValueError("the first step (the anchor) must be plain")
    opts = set(optional or ())
    if any(k <= 1 or k >= n for k in opts):
        raise ValueError("optional steps must be interior (2..n-1)")
    if any(k + 1 in opts for k in opts):
        raise ValueError("two consecutive optional steps are not supported")
    if any(len(steps[k - 1]) > 2 and steps[k - 1][2] is not None for k in opts):
        raise ValueError("an optional step cannot be a Kleene/times step")
    withins_us = [None] + [
        None if s[1] is None else _interval_us(s[1]) for s in steps[1:]
    ]
    if any(w is None for w in withins_us[1:]):
        raise ValueError(
            "the streaming quantified-chain replay needs a FINITE within "
            "on every transition (their sum bounds the replay horizon)"
        )
    kleenes: list = []
    for k, s in enumerate(steps, 1):
        if len(s) <= 2 or s[2] is None:
            kleenes.append(None)
            continue
        mn, mx = s[2]
        if mx == float("inf"):
            raise ValueError(
                "the streaming quantified-chain replay needs FINITE caps "
                "(mx*gap is part of the replay horizon)"
            )
        mn, mx = int(mn), int(mx)
        if mn < 1 or mx < mn:
            raise ValueError("need 1 <= mn <= mx")
        kleenes.append((withins_us[k - 1], mn, mx))
    h_us = sum(withins_us[1:]) + sum(
        k[2] * k[0] for k in kleenes if k is not None
    )
    if all_rows and (values or aggs):
        raise ValueError("ALL ROWS and aggregate MEASURES are exclusive")
    values = dict(values or {})
    val_ix = {nm: i for i, nm in enumerate(values)}
    raggs = []
    agg_fields: list[tuple[str, bool]] = []
    for k, val_name, func, n_off, out_name, integral in aggs or ():
        if not 1 <= k <= n:
            raise ValueError(f"agg step {k} out of range 1..{n}")
        if val_name not in val_ix:
            raise ValueError(f"agg references undeclared value {val_name!r}")
        raggs.append((k, val_ix[val_name], func, n_off, out_name, integral))
        agg_fields.append((out_name, integral))
    flags = {f"f{k}": s[0].cast("boolean") for k, s in enumerate(steps, 1)}
    extra = {
        f"v{i}": c.cast("double") for i, c in enumerate(values.values())
    }
    filtered = _wire(events, key, flags, event_id, ts, watermark_delay,
                     extra=extra)
    wo_us = None if within_overall is None else _interval_us(within_overall)
    quant = {k for k in range(1, n + 1) if kleenes[k - 1] is not None}
    return filtered.groupBy("user_id").applyInPandasWithState(
        make_quantified_chain_replayer(
            n, withins_us, kleenes, h_us, within_overall_us=wo_us,
            optionals=opts, mode=mode, all_rows=all_rows,
            n_vals=len(values), aggs=raggs,
        ),
        ALL_ROWS_SCHEMA if all_rows
        else quantified_chain_output_schema(n, quant, agg_fields),
        skip_state_schema(bool(values)),
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def _wire(events, key, flag_cols, event_id, ts, watermark_delay, extra=None):
    any_f = None
    for c in flag_cols.values():
        any_f = c if any_f is None else (any_f | c)
    named = {nm: F.coalesce(c, F.lit(False)).alias(nm)
             for nm, c in flag_cols.items()}
    return (
        events.filter(any_f)
        .withColumns(named)
        .select(
            F.col(event_id).alias("event_id"),
            F.col(ts).alias("ts"),
            F.col(key).alias("user_id"),
            *named.keys(),
            *[c.alias(nm) for nm, c in (extra or {}).items()],
        )
        .withWatermark("ts", watermark_delay)
    )


def stream_chain_skip_to_detect(
    events: DataFrame,
    key: str,
    steps: list[tuple[Column, str | None]],
    skip_step: int,
    event_id: str = "event_id",
    ts: str = "ts",
    watermark_delay: str = "0 seconds",
    within_overall: str | None = None,
    all_rows: bool = False,
) -> DataFrame:
    """Wire the SKIP TO FIRST/LAST replay over a streaming frame (plain
    chains; every within after the first MANDATORY — their sum is the
    emission horizon). ``within_overall`` (round 10) prunes candidates
    whose end exceeds the anchor bound BEFORE the fold. ``all_rows``
    (round 12) emits per-BOUND-EVENT rows instead of the ONE-row shape
    — the chain IS the per-step id list, so the explode is in-replayer."""
    return _wire_chain_replay(
        events, key, steps, skip_step, "skip_to", event_id, ts,
        watermark_delay, within_overall, all_rows=all_rows,
    )


def stream_chain_skip_past_detect(
    events: DataFrame,
    key: str,
    steps: list[tuple[Column, str | None]],
    event_id: str = "event_id",
    ts: str = "ts",
    watermark_delay: str = "0 seconds",
    within_overall: str | None = None,
) -> DataFrame:
    """Wire the plain-chain SKIP PAST LAST replay (round 10 — VERDICT r9
    item 5): the same candidate machinery with the past-last fold
    (survivors start STRICTLY past the emitted END, which is the
    horizon). The in-NFA fold (streaming/pattern.py after_match) serves
    this strategy WITHOUT an overall bound; this replayer exists for
    ``within_overall``, whose prune must happen before the fold — a
    post-filter after the in-NFA fold would let pruned candidates
    advance the skip horizon."""
    return _wire_chain_replay(
        events, key, steps, len(steps), "past_last", event_id, ts,
        watermark_delay, within_overall,
    )


def _wire_chain_replay(
    events, key, steps, skip_step, mode, event_id, ts,
    watermark_delay, within_overall, all_rows=False,
):
    from pyspark.sql.streaming.state import GroupStateTimeout

    from flink_uba_spark.streaming.pattern import _interval_us

    n = len(steps)
    if n < 2:
        raise ValueError("need at least 2 steps")
    if not 2 <= skip_step <= n:
        raise ValueError(f"skip_step must be in [2, {n}]")
    withins_us = [None] + [
        None if s[1] is None else _interval_us(s[1]) for s in steps[1:]
    ]
    if any(w is None for w in withins_us[1:]):
        raise ValueError(
            "the streaming skip replay needs a FINITE within on every "
            "transition (their sum bounds when a candidate's replay "
            "prefix is final)"
        )
    h_us = sum(withins_us[1:])
    wo_us = None if within_overall is None else _interval_us(within_overall)
    flags = {f"f{k}": s[0].cast("boolean") for k, s in enumerate(steps, 1)}
    filtered = _wire(events, key, flags, event_id, ts, watermark_delay)
    return filtered.groupBy("user_id").applyInPandasWithState(
        make_chain_skip_replayer(
            n, withins_us, skip_step, h_us, mode=mode,
            within_overall_us=wo_us, all_rows=all_rows,
        ),
        ALL_ROWS_SCHEMA if all_rows else chain_skip_output_schema(n),
        SKIP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def stream_reluctant_lazy_detect(
    events: DataFrame,
    key: str,
    anchor: Column,
    run: Column,
    suffix: Column,
    gap: str,
    suffix_within: str,
    mn: int,
    mx: int,
    event_id: str = "event_id",
    ts: str = "ts",
    watermark_delay: str = "0 seconds",
    within_overall: str | None = None,
) -> DataFrame:
    """Wire the lazy-reluctant SKIP PAST LAST replay over a streaming
    frame (anchor → run{mn,mx}? → suffix; finite cap mandatory — the
    horizon is ``mx·gap + suffix_within``). ``within_overall``
    (round 10) prunes count candidates in-replayer before the
    preference + fold."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from flink_uba_spark.streaming.pattern import _interval_us

    if mn < 1 or mx < mn:
        raise ValueError("need 1 <= mn <= mx")
    gap_us = _interval_us(gap)
    sfx_us = _interval_us(suffix_within)
    h_us = mx * gap_us + sfx_us
    wo_us = None if within_overall is None else _interval_us(within_overall)
    flags = {
        "f1": anchor.cast("boolean"),
        "f2": run.cast("boolean"),
        "f3": suffix.cast("boolean"),
    }
    filtered = _wire(events, key, flags, event_id, ts, watermark_delay)
    return filtered.groupBy("user_id").applyInPandasWithState(
        make_lazy_reluctant_replayer(
            gap_us, sfx_us, mn, mx, h_us, within_overall_us=wo_us
        ),
        LAZY_OUTPUT_SCHEMA,
        SKIP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
