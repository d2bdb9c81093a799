"""Route × global-option matrix (VERDICT r10 item 1; r11 item 1 grew
the stream columns to EVERY option — 128 → 192 cells).

The r9 alternation + within_overall bug was a routing early-return that
skipped a GLOBAL option filter — wrong answers, not errors, and no
catalog query hit the cell for a full round. This module kills the
class mechanically: for EVERY routing-matrix route (batch + stream) ×
every global option (within_overall, exclusion ``{- X -}``, ALL ROWS
PER MATCH, SUBSET + RunAgg MEASURES, ``^`` / ``$`` anchors), the option
must either demonstrably take effect on a crafted fixture or raise —
never silently no-op.

Effect assertions are semantic, not just "output changed":

- ``within_overall`` — the bound is picked BETWEEN the fixture's match
  spans (so some matches pass and some fail), and every emitted row's
  span must respect it. Fixtures include a skip-fold key where pruning
  the violating anchor must UNLOCK a later anchor (the r9 bug shape:
  a post-fold filter would emit nothing for that key).
- exclusion — the excluded variable's columns leave the projection and
  the remaining values equal the option-free run exactly.
- ALL ROWS — per-event rows whose per-match counts equal the bound-step
  counts derivable from the option-free ONE-row output.
- SUBSET + RunAgg — ``COUNT(U.*)`` equals the sum of the members' bound
  counts from the option-free output.
- ``^`` / ``$`` — every emitted match starts at its partition's first
  row / ends at its last row, and the fixture contains a match that the
  anchor must kill.

A raise is always acceptable (the routing matrix documents its
unsupported cells); an option that RUNS but leaves the option-free
output untouched fails the cell.
"""

from __future__ import annotations

import datetime
import uuid
from collections import Counter

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from flink_uba_spark.operators.match_recognize import (
    match_recognize,
    run_agg,
    stream_match_recognize,
)
from flink_uba_spark.streaming.runner import run_to_table, write_replay

EPOCH = datetime.datetime(2020, 1, 1)
SENTINEL_UID = 10 ** 6

def _def():
    # Columns need an active SparkContext — built lazily, not at import
    return {v: F.col("event_type") == v.lower() for v in "SCPAB"}

# fixture rows are (uid, eid, sec, event_type, amt); amt is payload for
# the iterative route and inert elsewhere
ROUTES = [
    # ---- single-plan plain chains, one route per AFTER MATCH mode ----
    dict(
        name="plain_skip_past",
        pattern="S C P",
        after="skip_past_last",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "c", 0), (1, 3, 2, "p", 0),
            (2, 10, 0, "s", 0), (2, 11, 2, "c", 0), (2, 12, 8, "p", 0),
            # fold-shift key: pruning anchor 20 must let anchor 21 emit
            (3, 20, 0, "s", 0), (3, 21, 4, "s", 0), (3, 22, 5, "c", 0),
            (3, 23, 8, "p", 0),
            # noise-led key for ^ (anchor 31 is not the first row)
            (4, 30, 0, "c", 0), (4, 31, 1, "s", 0), (4, 32, 2, "c", 0),
            (4, 33, 3, "p", 0),
            # trailing-noise key for $ (match ends before the last row)
            (5, 40, 0, "s", 0), (5, 41, 1, "c", 0), (5, 42, 2, "p", 0),
            (5, 43, 3, "a", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "plain"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="S {- C -} P",
        excl_var="C",
        subset=("C", "P"),
        end_col="P_ts",
    ),
    dict(
        name="plain_no_skip",
        pattern="S C P",
        after="no_skip",
        rows=None,  # filled below: shares plain_skip_past's fixture
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "plain"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="S {- C -} P",
        excl_var="C",
        subset=("C", "P"),
        end_col="P_ts",
    ),
    dict(
        name="plain_skip_to",
        pattern="S C P",
        after="skip_to_first C",
        rows=None,  # shares plain_skip_past's fixture
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "plain"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="S {- C -} P",
        excl_var="C",
        subset=("C", "P"),
        end_col="P_ts",
    ),
    # ---- quantified shapes on the single-plan path ----
    dict(
        name="trailing_run_skip_past",
        pattern="S C{1,3}",
        after="skip_past_last",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "c", 0), (1, 3, 2, "c", 0),
            (2, 10, 0, "s", 0), (2, 11, 6, "c", 0),
            (3, 20, 0, "s", 0), (3, 21, 4, "s", 0), (3, 22, 6, "c", 0),
            (4, 30, 0, "c", 0), (4, 31, 1, "s", 0), (4, 32, 2, "c", 0),
            (5, 40, 0, "s", 0), (5, 41, 1, "c", 0), (5, 42, 2, "a", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "quant")],
        all_vars={"S", "C"},
        excl_pattern="S {- C{1,3} -}",
        excl_var="C",
        subset=("S", "C"),
        end_col="C_last_ts",
    ),
    dict(
        name="mid_quant_no_skip",
        pattern="S C{1,2} P",
        after="no_skip",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "c", 0), (1, 3, 2, "p", 0),
            (2, 10, 0, "s", 0), (2, 11, 1, "c", 0), (2, 12, 2, "c", 0),
            (2, 13, 7, "p", 0),
            (4, 30, 0, "p", 0), (4, 31, 1, "s", 0), (4, 32, 2, "c", 0),
            (4, 33, 3, "p", 0),
            (5, 40, 0, "s", 0), (5, 41, 1, "c", 0), (5, 42, 2, "p", 0),
            (5, 43, 3, "a", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "quant"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="S {- C{1,2} -} P",
        excl_var="C",
        subset=("C", "P"),
        end_col="P_ts",
    ),
    dict(
        name="mid_quant_skip_past",
        pattern="S C{1,2} P",
        after="skip_past_last",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "c", 0), (1, 3, 2, "p", 0),
            (2, 10, 0, "s", 0), (2, 11, 1, "c", 0), (2, 12, 2, "c", 0),
            (2, 13, 7, "p", 0),
            (3, 20, 0, "s", 0), (3, 21, 3, "s", 0), (3, 22, 4, "c", 0),
            (3, 23, 7, "p", 0),
            (4, 30, 0, "p", 0), (4, 31, 1, "s", 0), (4, 32, 2, "c", 0),
            (4, 33, 3, "p", 0),
            (5, 40, 0, "s", 0), (5, 41, 1, "c", 0), (5, 42, 2, "p", 0),
            (5, 43, 3, "a", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "quant"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="S {- C{1,2} -} P",
        excl_var="C",
        subset=("C", "P"),
        end_col="P_ts",
    ),
    dict(
        name="optional_no_skip",
        pattern="S C? P",
        after="no_skip",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "c", 0), (1, 3, 2, "p", 0),
            (2, 10, 0, "s", 0), (2, 11, 7, "p", 0),
            (4, 30, 0, "a", 0), (4, 31, 1, "s", 0), (4, 32, 2, "c", 0),
            (4, 33, 3, "p", 0),
            (5, 40, 0, "s", 0), (5, 41, 1, "p", 0), (5, 42, 2, "b", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "opt"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="S {- C? -} P",
        excl_var="C",
        subset=("C", "P"),
        end_col="P_ts",
    ),
    dict(
        name="optional_skip_past",
        pattern="S C? P",
        after="skip_past_last",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "c", 0), (1, 3, 2, "p", 0),
            (2, 10, 0, "s", 0), (2, 11, 7, "p", 0),
            # fold-shift key for within_overall
            (3, 20, 0, "s", 0), (3, 21, 4, "s", 0), (3, 22, 5, "c", 0),
            (3, 23, 8, "p", 0),
            (4, 30, 0, "a", 0), (4, 31, 1, "s", 0), (4, 32, 2, "c", 0),
            (4, 33, 3, "p", 0),
            (5, 40, 0, "s", 0), (5, 41, 1, "p", 0), (5, 42, 2, "b", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "opt"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="S {- C? -} P",
        excl_var="C",
        subset=("C", "P"),
        end_col="P_ts",
    ),
    # ---- reluctant engines ----
    dict(
        name="reluctant_no_skip",
        pattern="S C{1,2}? P",
        after="no_skip",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "c", 0), (1, 3, 2, "c", 0),
            (1, 4, 3, "p", 0),
            (2, 10, 0, "s", 0), (2, 11, 1, "c", 0), (2, 12, 9, "p", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "quant"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="S {- C{1,2}? -} P",
        excl_var="C",
        subset=("C", "P"),
        end_col="P_ts",
        multi_match=True,  # per-count multi-match shares the anchor
    ),
    dict(
        name="reluctant_lazy_skip_past",
        pattern="S C{1,2}? P",
        after="skip_past_last",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "c", 0), (1, 3, 2, "c", 0),
            (1, 4, 3, "p", 0),
            (2, 10, 0, "s", 0), (2, 11, 1, "c", 0), (2, 12, 9, "p", 0),
            (3, 20, 0, "s", 0), (3, 21, 4, "s", 0), (3, 22, 5, "c", 0),
            (3, 23, 8, "p", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "quant"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="S {- C{1,2}? -} P",
        excl_var="C",
        subset=("C", "P"),
        end_col="P_ts",
    ),
    # ---- branch-union / preference routes ----
    dict(
        name="alternation_no_skip",
        pattern="S (A|B) P",
        after="no_skip",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "a", 0), (1, 3, 2, "p", 0),
            (2, 10, 0, "s", 0), (2, 11, 3, "b", 0), (2, 12, 8, "p", 0),
            (3, 20, 0, "s", 0), (3, 21, 1, "b", 0), (3, 22, 2, "a", 0),
            (3, 23, 3, "p", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("A", "plain"), ("B", "plain"),
              ("P", "plain")],
        all_vars={"S", "A", "B", "P"},
        excl_pattern="{- S -} (A|B) P",
        excl_var="S",
        subset=("S", "P"),
        end_col="P_ts",
    ),
    dict(
        name="alternation_skip_past",
        pattern="S (A|B) P",
        after="skip_past_last",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "a", 0), (1, 3, 2, "p", 0),
            (2, 10, 0, "s", 0), (2, 11, 3, "b", 0), (2, 12, 8, "p", 0),
            (3, 20, 0, "s", 0), (3, 21, 1, "b", 0), (3, 22, 2, "a", 0),
            (3, 23, 3, "p", 0),
            (6, 50, 0, "s", 0), (6, 51, 4, "s", 0), (6, 52, 5, "a", 0),
            (6, 53, 8, "p", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("A", "plain"), ("B", "plain"),
              ("P", "plain")],
        all_vars={"S", "A", "B", "P"},
        excl_pattern="{- S -} (A|B) P",
        excl_var="S",
        subset=("S", "P"),
        end_col="P_ts",
    ),
    dict(
        name="permute_no_skip",
        pattern="PERMUTE(S,C) P",
        after="no_skip",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "c", 0), (1, 3, 2, "p", 0),
            (2, 10, 0, "c", 0), (2, 11, 4, "s", 0), (2, 12, 9, "p", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "plain"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="PERMUTE(S,C) {- P -}",
        excl_var="P",
        subset=("S", "P"),
        end_col="P_ts",
    ),
    # ---- iterative route (prefix-referencing DEFINE) ----
    dict(
        name="iterative_no_skip",
        pattern="S C P",
        after="no_skip",
        rows=[
            (1, 1, 0, "s", 1), (1, 2, 1, "c", 2), (1, 3, 2, "p", 0),
            (2, 10, 0, "s", 1), (2, 11, 3, "c", 5), (2, 12, 8, "p", 0),
            # the iterative condition must skip c@1 (amt 2 < 5)
            (3, 20, 0, "s", 5), (3, 21, 1, "c", 2), (3, 22, 2, "c", 6),
            (3, 23, 3, "p", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "plain"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="{- S -} C P",
        excl_var="S",
        excl_extra=("amt_S",),
        subset=("C", "P"),
        end_col=None,
        extra_batch=lambda: dict(
            payload={"amt": F.col("amt")},
            iter_define={"C": lambda b: b["C"]["amt"] > b["S"]["amt"]},
        ),
        extra_stream=lambda: dict(
            payload={"amt": F.col("amt")},
            iter_define_py={"C": lambda pre, c: c[0] > pre[0][0]},
        ),
    ),
    dict(
        name="iterative_skip_past",
        pattern="S C P",
        after="skip_past_last",
        rows=None,  # shares iterative_no_skip's fixture
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("C", "plain"), ("P", "plain")],
        all_vars={"S", "C", "P"},
        excl_pattern="{- S -} C P",
        excl_var="S",
        excl_extra=("amt_S",),
        subset=("C", "P"),
        end_col=None,
        extra_batch=lambda: dict(
            payload={"amt": F.col("amt")},
            iter_define={"C": lambda b: b["C"]["amt"] > b["S"]["amt"]},
        ),
        extra_stream=lambda: dict(
            payload={"amt": F.col("amt")},
            iter_define_py={"C": lambda pre, c: c[0] > pre[0][0]},
        ),
    ),
    # ---- quantified alternation group (single-plan OR-predicate run) ----
    dict(
        name="quant_group_no_skip",
        pattern="S (A|B){1,2} P",
        after="no_skip",
        rows=[
            (1, 1, 0, "s", 0), (1, 2, 1, "a", 0), (1, 3, 2, "p", 0),
            (2, 10, 0, "s", 0), (2, 11, 1, "a", 0), (2, 12, 2, "b", 0),
            (2, 13, 8, "p", 0),
            (4, 30, 0, "c", 0), (4, 31, 1, "s", 0), (4, 32, 2, "a", 0),
            (4, 33, 3, "p", 0),
            (5, 40, 0, "s", 0), (5, 41, 1, "b", 0), (5, 42, 2, "p", 0),
            (5, 43, 3, "c", 0),
        ],
        engines=("batch", "stream"),
        vars=[("S", "plain"), ("A_B", "quant"), ("P", "plain")],
        all_vars={"S", "A", "B", "P"},
        excl_pattern="{- S -} (A|B){1,2} P",
        excl_var="S",
        subset=("S", "P"),
        end_col="P_ts",
    ),
]

# shared fixtures (declared once, reused by mode variants)
_BY_NAME = {r["name"]: r for r in ROUTES}
_BY_NAME["plain_no_skip"]["rows"] = _BY_NAME["plain_skip_past"]["rows"]
_BY_NAME["plain_skip_to"]["rows"] = _BY_NAME["plain_skip_past"]["rows"]
_BY_NAME["iterative_skip_past"]["rows"] = _BY_NAME["iterative_no_skip"]["rows"]

_SCHEMA = "user_id long, event_id long, ts timestamp, event_type string, amt double"


def _mk(spark, rows):
    return spark.createDataFrame(
        [
            (u, e, EPOCH + datetime.timedelta(seconds=s), t, float(a))
            for (u, e, s, t, a) in rows
        ],
        _SCHEMA,
    )


def _stream_of(spark, batch_df, n_batches=2):
    """Replay a batch frame in ts-ordered micro-batches plus a far-future
    sentinel row (its own key; filtered out) that drags the final
    watermark past every real candidate's decidability horizon."""
    rows = sorted(batch_df.collect(), key=lambda r: (r["ts"], r["event_id"]))
    frames = []
    per = max(1, -(-len(rows) // n_batches))
    for i in range(0, len(rows), per):
        frames.append(
            spark.createDataFrame(
                [tuple(r) for r in rows[i : i + per]], batch_df.schema
            )
        )
    frames.append(
        spark.createDataFrame(
            [
                (
                    SENTINEL_UID,
                    SENTINEL_UID,
                    EPOCH + datetime.timedelta(seconds=10 ** 7),
                    "s",
                    0.0,
                )
            ],
            batch_df.schema,
        )
    )
    replay = write_replay(frames, tag=f"optmx_{uuid.uuid4().hex[:8]}")
    return (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay)
    )


def _spec(route, engine, pattern=None, **opts):
    spec = dict(
        partition_by="user_id",
        order_by="ts",
        pattern=pattern if pattern is not None else route["pattern"],
        define=_def(),
        default_within="INTERVAL 1000 SECONDS",
        after_match=route["after"],
    )
    extra = route.get(f"extra_{engine}")
    if extra is not None:
        spec.update(extra())
    spec.update(opts)
    return spec


def _run(spark, route, engine, **opts):
    ev = _mk(spark, route["rows"])
    spec = _spec(route, engine, **opts)
    if engine == "batch":
        df = match_recognize(ev, **spec)
        df.collect()  # force evaluation so run-time raises surface here
        return df
    out = run_to_table(stream_match_recognize(_stream_of(spark, ev), **spec))
    return out.filter(F.col("user_id") < SENTINEL_UID)


_BASE: dict = {}


def _base(spark, route, engine):
    key = (route["name"], engine)
    if key not in _BASE:
        try:
            df = _run(spark, route, engine)
            cols = df.columns
            rows = sorted(map(tuple, df.collect()))
            assert rows, f"fixture flaw: {route['name']}/{engine} base is empty"
            _BASE[key] = (cols, rows, df.schema)
        except ValueError as e:
            _BASE[key] = e
    return _BASE[key]


def _spans(cols, rows, schema):
    ts_idx = [
        i for i, f in enumerate(schema.fields)
        if isinstance(f.dataType, TimestampType)
    ]
    out = []
    for r in rows:
        vals = [r[i] for i in ts_idx if r[i] is not None]
        out.append((max(vals) - min(vals)).total_seconds())
    return out


def _bound_counts(route, cols, row):
    """Bound-event count per variable, derived from a ONE-row match."""
    counts = {}
    for v, kind in route["vars"]:
        if kind == "quant":
            n = row[cols.index(f"{v}_n")]
            counts[v] = int(n) if n is not None else 0
        else:
            counts[v] = int(row[cols.index(f"{v}_ts")] is not None)
    return counts


def _collect(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------

OPTIONS = ("within", "exclusion", "all_rows", "subset", "anchor_start", "anchor_end")

# Tiering (VERDICT r12 item 1): the full 192-cell sweep blew past the
# driver's verify window, so the default tier keeps every route x option
# CLASS covered — all 96 batch cells (fast: tiny fixtures, one plan each)
# plus a stream covering subset (one option per route, rotated so every
# option class also runs on the stream engine every time) — and marks the
# remaining stream cells `slow`. `pytest -m slow` runs the full sweep;
# round 12 (VERDICT r11 item 1) made STREAM cells cover every option, and
# the slow tier preserves that in full.
CELLS = []
for _ri, _r in enumerate(ROUTES):
    for _e in _r["engines"]:
        for _oi, _opt in enumerate(OPTIONS):
            fast = _e == "batch" or _oi == _ri % len(OPTIONS)
            CELLS.append(
                pytest.param(
                    _r["name"], _e, _opt,
                    marks=() if fast else (pytest.mark.slow,),
                    id=f"{_r['name']}-{_e}-{_opt}",
                )
            )


@pytest.mark.parametrize("rname,engine,option", CELLS)
def test_option_matrix(spark, rname, engine, option):
    route = _BY_NAME[rname]
    base = _base(spark, route, engine)

    def opt_kwargs():
        if option == "within":
            if isinstance(base, ValueError):
                return dict(within_overall="INTERVAL 5 SECONDS")
            cols, rows, schema = base
            spans = sorted(set(_spans(cols, rows, schema)))
            assert len(spans) >= 2, (
                f"fixture flaw: {rname}/{engine} match spans all equal "
                f"({spans}) — within_overall cannot demonstrate an effect"
            )
            bound = int((spans[0] + spans[-1]) // 2)
            return dict(within_overall=f"INTERVAL {bound} SECONDS")
        if option == "exclusion":
            return dict(pattern=route["excl_pattern"])
        if option == "all_rows":
            return dict(rows_per_match="all")
        if option == "subset":
            return dict(
                measures={
                    "anchor_id": F.col("anchor_id"),
                    "u_cnt": run_agg("count", "U"),
                },
                subset={"U": route["subset"]},
            )
        if option == "anchor_start":
            return dict(pattern="^ " + route["pattern"])
        if option == "anchor_end":
            return dict(pattern=route["pattern"] + " $")
        raise AssertionError(option)

    if isinstance(base, ValueError):
        # the route itself is an unsupported cell — options must not
        # resurrect it
        with pytest.raises(ValueError):
            _run(spark, route, engine, **opt_kwargs())
        return

    cols, rows, schema = base
    try:
        applied = _run(spark, route, engine, **opt_kwargs())
    except ValueError:
        return  # principled raise — the documented routing-matrix cell

    arows = _collect(applied)

    if option == "within":
        bound = int(opt_kwargs()["within_overall"].split()[1])
        assert applied.columns == cols
        assert arows != rows, (
            f"{rname}/{engine}: within_overall ran but the output is "
            "identical to the option-free run — silent no-op"
        )
        assert arows, "bound >= the smallest span must keep >= 1 match"
        for s in _spans(applied.columns, arows, applied.schema):
            assert s <= bound, (
                f"{rname}/{engine}: emitted a match spanning {s}s under "
                f"within_overall of {bound}s"
            )
        return

    if option == "exclusion":
        v = route["excl_var"]
        dropped = {f"{v}_ts", f"{v}_last_ts", f"{v}_n"}
        # routes with payload drop the excluded variable's payload
        # columns too (the iterative route's rule)
        dropped |= set(route.get("excl_extra", ()))
        assert dropped & set(cols), "fixture flaw: nothing to drop"
        keep = [i for i, c in enumerate(cols) if c not in dropped]
        assert applied.columns == [cols[i] for i in keep], (
            f"{rname}/{engine}: exclusion ran but did not drop "
            f"{sorted(dropped & set(cols))}"
        )
        assert arows == sorted(tuple(r[i] for i in keep) for r in rows), (
            f"{rname}/{engine}: exclusion changed row VALUES — it is "
            "output shaping only"
        )
        return

    if option == "all_rows":
        assert applied.columns == [
            "user_id", "anchor_id", "seq", "var", "event_id", "ts",
        ]
        uid_i, aid_i = cols.index("user_id"), cols.index("anchor_id")
        if route.get("multi_match"):
            # per-count multi-match shares anchors; ALL ROWS over it has
            # no single per-event row set — reaching here means the raise
            # was lifted without resolving that, which is a bug
            raise AssertionError(
                f"{rname}: ALL ROWS ran on a multi-match route"
            )
        expected = {}
        for r in rows:
            k = (r[uid_i], r[aid_i])
            assert k not in expected, "duplicate match key in base"
            expected[k] = sum(_bound_counts(route, cols, r).values())
        got = Counter((r["user_id"], r["anchor_id"]) for r in applied.collect())
        assert got == Counter(expected), (
            f"{rname}: ALL ROWS per-match row counts diverge from the "
            f"ONE-row bound counts: {dict(got)} != {expected}"
        )
        assert {r["var"] for r in applied.collect()} <= route["all_vars"]
        return

    if option == "subset":
        uid_i, aid_i = cols.index("user_id"), cols.index("anchor_id")
        expected = sorted(
            (
                r[uid_i],
                r[aid_i],
                sum(
                    cnt
                    for v, cnt in _bound_counts(route, cols, r).items()
                    if v in route["subset"]
                ),
            )
            for r in rows
        )
        assert arows == expected, (
            f"{rname}: SUBSET COUNT(U.*) diverges from the members' bound "
            f"counts: {arows} != {expected}"
        )
        return

    if option == "anchor_start":
        firsts = {}
        for (u, e, s, _t, _a) in route["rows"]:
            if u not in firsts or (s, e) < firsts[u][0]:
                firsts[u] = ((s, e), e)
        assert applied.columns == cols
        assert arows != rows, (
            f"{rname}: ^ ran but the output is identical — silent no-op"
        )
        assert arows, "fixture flaw: no first-row-anchored match survives ^"
        aid_i, uid_i = cols.index("anchor_id"), cols.index("user_id")
        for r in arows:
            assert r[aid_i] == firsts[r[uid_i]][1], (
                f"{rname}: ^ emitted a match not anchored at its "
                f"partition's first row: {r}"
            )
        return

    if option == "anchor_end":
        assert route.get("end_col"), (
            f"{rname}: $ unexpectedly ran — declare end_col so the matrix "
            "can verify it"
        )
        lasts = {}
        for (u, _e, s, _t, _a) in route["rows"]:
            lasts[u] = max(lasts.get(u, 0), s)
        assert applied.columns == cols
        assert arows != rows, (
            f"{rname}: $ ran but the output is identical — silent no-op"
        )
        assert arows, "fixture flaw: no last-row-ending match survives $"
        uid_i = cols.index("user_id")
        end_i = cols.index(route["end_col"])
        for r in arows:
            want = EPOCH + datetime.timedelta(seconds=lasts[r[uid_i]])
            assert r[end_i] == want, (
                f"{rname}: $ emitted a match not ending at its partition's "
                f"last row: {r}"
            )
        return

    raise AssertionError(option)
