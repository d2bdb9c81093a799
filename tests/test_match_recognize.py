"""MATCH_RECOGNIZE front-end (operators/match_recognize.py) — Flink SQL's
row-pattern-recognition surface compiled onto the Pattern engines.

The front-end is a pure compiler (the engines underneath carry the soak
evidence), so the risk is the MAPPING: parser pins + spec-to-engine
equivalence against hand-built pattern_detect calls, plus the 3-SF oracle
gate on the catalog pair (match_recognize_error_run /
stream_match_recognize_onboarding).
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_uba_spark.operators.match_recognize import (
    match_recognize,
    parse_pattern,
)

EPOCH = datetime.datetime(2020, 1, 1)


def test_parse_pattern_quantifiers():
    assert parse_pattern("A B C") == [("A", None), ("B", None), ("C", None)]
    assert parse_pattern("A B+ C") == [
        ("A", None), ("B", ("kleene", 1, None)), ("C", None)]
    assert parse_pattern("A B{3} C") == [
        ("A", None), ("B", ("kleene", 3, 3)), ("C", None)]
    assert parse_pattern("A B{2,5} C") == [
        ("A", None), ("B", ("kleene", 2, 5)), ("C", None)]
    assert parse_pattern("A B{2,} C") == [
        ("A", None), ("B", ("kleene", 2, None)), ("C", None)]
    assert parse_pattern("A B? C") == [
        ("A", None), ("B", ("optional",)), ("C", None)]


def test_parse_pattern_rejects(spark):
    with pytest.raises(ValueError, match="at least 2"):
        parse_pattern("A")
    with pytest.raises(ValueError, match="bad PATTERN token"):
        parse_pattern("A B++")
    with pytest.raises(ValueError, match="distinct"):
        parse_pattern("A B A")
    with pytest.raises(ValueError, match="AFTER MATCH"):
        match_recognize(
            None, "k", "ts", "A B", {"A": F.lit(True), "B": F.lit(True)},
            after_match="skip_to_wherever",
        )
    with pytest.raises(ValueError, match="DEFINE"):
        match_recognize(None, "k", "ts", "A B", {"A": F.lit(True)})


def _events_df(spark):
    rows = []
    # user 1: signup, err, err, err, err (session), purchase — then a
    # second overlapping-candidate signup inside the first episode
    base = [
        (1, 0, "signup"), (2, 60, "error"), (3, 120, "error"),
        (4, 180, "error"), (5, 240, "error"), (6, 300, "purchase"),
        (7, 90, "signup"),   # anchored inside episode 1 → skipped by fold
        (8, 400, "signup"), (9, 460, "error"), (10, 520, "purchase"),
    ]
    for eid, sec, typ in base:
        rows.append((eid, 1, EPOCH + datetime.timedelta(seconds=sec), typ))
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_compile_equivalence_quantified_skip(spark):
    """The front-end's quantified+skip compile equals the hand-built
    pattern_detect → filter matched → after_match_skip_past_last chain,
    column renames aside."""
    from flink_uba_spark.operators.sequence import (
        after_match_skip_past_last,
        pattern_detect,
    )

    ev = _events_df(spark)
    spec = dict(
        pattern="S E{1,3} P",
        define={
            "S": F.col("event_type") == "signup",
            "E": F.col("event_type") == "error",
            "P": F.col("event_type") == "purchase",
        },
        withins={"E": "INTERVAL 2 MINUTES", "P": "INTERVAL 10 MINUTES"},
    )
    got = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        after_match="skip_past_last", **spec,
    ).toPandas().sort_values("anchor_id").reset_index(drop=True)
    want = after_match_skip_past_last(
        pattern_detect(
            ev,
            key="user_id",
            steps=[
                (spec["define"]["S"], None),
                (spec["define"]["E"], "INTERVAL 2 MINUTES", (1, 3)),
                (spec["define"]["P"], "INTERVAL 10 MINUTES"),
            ],
            with_end_id=True,
        ).filter(F.col("state") == "matched"),
        key="user_id",
    ).toPandas().sort_values("anchor_id").reset_index(drop=True)
    assert list(got["anchor_id"]) == list(want["anchor_id"])
    assert list(got["E_n"]) == list(want["n2"])
    assert list(got["P_ts"]) == list(want["t3"])
    # the fixture exercises the semantics: episode 1 caps the error run
    # at 3 (E{1,3}), the signup inside it is skipped by the fold, the
    # post-episode signup starts episode 2
    assert list(got["anchor_id"]) == [1, 8]
    assert list(got["E_n"]) == [3, 1]


def test_measures_projection(spark):
    ev = _events_df(spark)
    got = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        pattern="S P", define={
            "S": F.col("event_type") == "signup",
            "P": F.col("event_type") == "purchase",
        },
        default_within="INTERVAL 30 MINUTES",
        after_match="no_skip",
        measures={
            "start_ts": F.col("S_ts"),
            "lag_us": F.unix_micros(F.col("P_ts")) - F.unix_micros(F.col("S_ts")),
        },
    ).toPandas()
    assert sorted(got.columns) == ["lag_us", "start_ts", "user_id"]
    assert (got["lag_us"] > 0).all()


def test_optional_variable(spark):
    """B? compiles to the engine's optional set (greedy-race semantics)."""
    rows = [
        (1, 1, EPOCH, "signup"),
        (2, 1, EPOCH + datetime.timedelta(seconds=10), "click"),
        (3, 1, EPOCH + datetime.timedelta(seconds=20), "purchase"),
        (4, 2, EPOCH, "signup"),
        (5, 2, EPOCH + datetime.timedelta(seconds=20), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        pattern="S C? P", define={
            "S": F.col("event_type") == "signup",
            "C": F.col("event_type") == "click",
            "P": F.col("event_type") == "purchase",
        },
        default_within="INTERVAL 5 MINUTES", after_match="no_skip",
    ).toPandas().set_index("user_id")
    assert str(got.loc[2, "C_ts"]) == "NaT"  # skipped optional
    assert got.loc[1, "C_ts"] is not None


def test_all_rows_per_match(spark):
    """ALL ROWS PER MATCH: one row per bound event with the match handle,
    seq and CLASSIFIER() var; a skipped optional emits no row; Kleene
    and MEASURES raise."""
    import pytest as _pytest

    ev = _events_df(spark)
    got = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        pattern="S E P", define={
            "S": F.col("event_type") == "signup",
            "E": F.col("event_type") == "error",
            "P": F.col("event_type") == "purchase",
        },
        withins={"E": "INTERVAL 2 MINUTES", "P": "INTERVAL 10 MINUTES"},
        after_match="skip_past_last", rows_per_match="all",
    ).toPandas()
    ep1 = got[got["anchor_id"] == 1].sort_values("seq")
    assert list(ep1["var"]) == ["S", "E", "P"]
    assert list(ep1["event_id"]) == [1, 2, 6]  # earliest error binds
    assert set(got["anchor_id"]) == {1, 8}     # fold still applies
    with _pytest.raises(ValueError, match="MEASURES"):
        match_recognize(
            ev, "user_id", "ts", "S P",
            {"S": F.lit(True), "P": F.lit(True)},
            default_within="INTERVAL 1 HOUR", rows_per_match="all",
            measures={"x": F.lit(1)},
        )


def test_one_row_output_unchanged_by_step_id_flag(spark):
    """with_step_ids must not perturb the default contract: the ONE ROW
    compile (flag off) emits no i{k} columns."""
    ev = _events_df(spark)
    out = match_recognize(
        ev, "user_id", "ts", "S P",
        {"S": F.col("event_type") == "signup",
         "P": F.col("event_type") == "purchase"},
        default_within="INTERVAL 1 DAY", after_match="no_skip",
    )
    assert not [c for c in out.columns if c.startswith("i")]


# ---- round 8: the wired specialties ---------------------------------------


def test_parse_pattern_round8_tokens():
    assert parse_pattern("A B{1,3}? C") == [
        ("A", None), ("B", ("reluctant", 1, 3)), ("C", None)]
    assert parse_pattern("A B{2}? C") == [
        ("A", None), ("B", ("reluctant", 2, 2)), ("C", None)]
    assert parse_pattern("S (C|V) P") == [
        ("S", None), (("C", "V"), None), ("P", None)]
    # round 9: uncapped reluctant PARSES (the count-enumeration engine
    # serves the 3-step shape; other shapes raise at routing)
    assert parse_pattern("A B+? C") == [
        ("A", None), ("B", ("reluctant", 1, None)), ("C", None)]
    assert parse_pattern("A B{2,}? C") == [
        ("A", None), ("B", ("reluctant", 2, None)), ("C", None)]
    # round 9: quantified groups parse to one OR-predicate Kleene step
    assert parse_pattern("S (C|V)+ P") == [
        ("S", None), (("C", "V"), ("kleene", 1, None)), ("P", None)]
    assert parse_pattern("S (C|V){2,4} P") == [
        ("S", None), (("C", "V"), ("kleene", 2, 4)), ("P", None)]
    with pytest.raises(ValueError, match="RELUCTANT quantifier on an"):
        parse_pattern("S (C|V){1,3}? P")
    with pytest.raises(ValueError, match="distinct"):
        parse_pattern("S (C|S) P")


def test_specialties_do_not_compose(spark):
    ev = _events_df(spark)
    with pytest.raises(ValueError, match="one specialty"):
        match_recognize(
            ev, "user_id", "ts", "S (C|V) P{1,2}?",
            {"S": F.lit(True), "C": F.lit(True), "V": F.lit(True),
             "P": F.lit(True)},
            default_within="INTERVAL 1 HOUR",
        )


def test_reluctant_lazy_one_row(spark):
    """S E{1,3}? P under SKIP PAST LAST: the lazy quantifier binds as FEW
    repetitions as possible while completing — E_n = 1 where the greedy
    twin binds 3."""
    ev = _events_df(spark)
    spec = dict(
        pattern="S E{1,3}? P",
        define={
            "S": F.col("event_type") == "signup",
            "E": F.col("event_type") == "error",
            "P": F.col("event_type") == "purchase",
        },
        withins={"E": "INTERVAL 2 MINUTES", "P": "INTERVAL 10 MINUTES"},
    )
    got = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        after_match="skip_past_last", **spec,
    ).toPandas().sort_values("anchor_id").reset_index(drop=True)
    assert list(got["anchor_id"]) == [1, 8]
    assert list(got["E_n"]) == [1, 1]          # lazy (greedy twin binds 3)
    # same completion event either way — the fold's episodes agree
    assert list(got["end_id"]) == [6, 10]


def test_reluctant_no_skip_multimatch(spark):
    """Under NO SKIP the reluctant compile is Flink CEP's multi-match:
    one row per admissible repetition count per anchor."""
    ev = _events_df(spark)
    got = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        pattern="S E{1,3}? P",
        define={
            "S": F.col("event_type") == "signup",
            "E": F.col("event_type") == "error",
            "P": F.col("event_type") == "purchase",
        },
        withins={"E": "INTERVAL 2 MINUTES", "P": "INTERVAL 10 MINUTES"},
        after_match="no_skip",
    ).toPandas()
    counts = got.groupby("anchor_id")["E_n"].apply(
        lambda s: sorted(s.tolist())).to_dict()
    assert counts == {1: [1, 2, 3], 7: [1, 2, 3], 8: [1]}


def test_alternation_leftmost_preference(spark):
    rows = [
        # user 1: only V available — the right alternative binds
        (1, 1, EPOCH, "signup"),
        (2, 1, EPOCH + datetime.timedelta(seconds=10), "view"),
        (3, 1, EPOCH + datetime.timedelta(seconds=20), "purchase"),
        # user 2: both available — leftmost (C) preferred
        (4, 2, EPOCH, "signup"),
        (5, 2, EPOCH + datetime.timedelta(seconds=10), "click"),
        (6, 2, EPOCH + datetime.timedelta(seconds=15), "view"),
        (7, 2, EPOCH + datetime.timedelta(seconds=20), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        pattern="S (C|V) P",
        define={
            "S": F.col("event_type") == "signup",
            "C": F.col("event_type") == "click",
            "V": F.col("event_type") == "view",
            "P": F.col("event_type") == "purchase",
        },
        default_within="INTERVAL 5 MINUTES",
        after_match="skip_past_last",
    ).toPandas().set_index("user_id")
    assert got.loc[1, "classifier_2"] == "V"
    assert str(got.loc[1, "C_ts"]) == "NaT"
    assert got.loc[2, "classifier_2"] == "C"
    assert str(got.loc[2, "V_ts"]) == "NaT"
    assert list(got.sort_index()["end_id"]) == [3, 7]


def test_skip_to_first_vs_past_last(spark):
    """SKIP TO FIRST C re-admits anchors at-or-past the bound C event —
    one MORE match than SKIP PAST LAST on an overlapping-episode fixture."""
    rows = [
        (1, 1, EPOCH, "signup"),
        (2, 1, EPOCH + datetime.timedelta(seconds=10), "click"),
        (3, 1, EPOCH + datetime.timedelta(seconds=15), "signup"),
        (4, 1, EPOCH + datetime.timedelta(seconds=20), "purchase"),
        (5, 1, EPOCH + datetime.timedelta(seconds=25), "click"),
        (6, 1, EPOCH + datetime.timedelta(seconds=40), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    spec = dict(
        pattern="S C P",
        define={
            "S": F.col("event_type") == "signup",
            "C": F.col("event_type") == "click",
            "P": F.col("event_type") == "purchase",
        },
        default_within="INTERVAL 5 MINUTES",
    )
    past = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        after_match="skip_past_last", **spec,
    ).toPandas()
    to_first = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        after_match="skip_to_first C", **spec,
    ).toPandas()
    assert list(past["anchor_id"]) == [1]          # s2@15 < end p1@20
    assert sorted(to_first["anchor_id"]) == [1, 3]  # s2@15 >= C@10
    assert sorted(to_first["end_id"]) == [4, 6]
    # plain chains: FIRST == LAST
    to_last = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        after_match="skip_to_last C", **spec,
    ).toPandas()
    assert sorted(to_last["anchor_id"]) == sorted(to_first["anchor_id"])


def test_iter_define_prefix_reference(spark):
    """DEFINE P AS P.cents >= 2 * S.cents — the IterativeCondition route:
    a failing candidate is SKIPPED (not bound then filtered)."""
    rows = [
        (1, 1, EPOCH, "signup", 10.0),
        (2, 1, EPOCH + datetime.timedelta(seconds=10), "purchase", 15.0),
        (3, 1, EPOCH + datetime.timedelta(seconds=20), "purchase", 25.0),
        (4, 2, EPOCH, "signup", 10.0),
        (5, 2, EPOCH + datetime.timedelta(seconds=10), "purchase", 15.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double",
    )
    got = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        pattern="S P",
        define={
            "S": F.col("event_type") == "signup",
            "P": F.col("event_type") == "purchase",
        },
        default_within="INTERVAL 5 MINUTES",
        payload={"cents": F.floor(F.col("value") * 100).cast("long")},
        iter_define={
            "P": lambda b: b["P"]["cents"] >= 2 * b["S"]["cents"],
        },
        after_match="skip_past_last",
    ).toPandas()
    assert list(got["user_id"]) == [1]             # user 2 never completes
    assert list(got["end_id"]) == [3]              # candidate 2 was skipped
    assert list(got["cents_S"]) == [1000]
    assert list(got["cents_P"]) == [2500]
    # referencing the first variable's prefix raises
    with pytest.raises(ValueError, match="no prefix"):
        match_recognize(
            ev, "user_id", "ts", "S P",
            {"S": F.lit(True), "P": F.lit(True)},
            default_within="INTERVAL 1 HOUR",
            iter_define={"S": lambda b: F.lit(True)},
        )


def test_all_rows_quantified_run(spark):
    """ALL ROWS PER MATCH enumerates a quantified variable's whole run —
    one row per repetition, capped at the quantifier's max."""
    ev = _events_df(spark)
    got = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        pattern="S E{1,3} P",
        define={
            "S": F.col("event_type") == "signup",
            "E": F.col("event_type") == "error",
            "P": F.col("event_type") == "purchase",
        },
        withins={"E": "INTERVAL 2 MINUTES", "P": "INTERVAL 10 MINUTES"},
        after_match="skip_past_last", rows_per_match="all",
    ).toPandas()
    rows = sorted(
        (int(a), v, int(e))
        for a, v, e in zip(got["anchor_id"], got["var"], got["event_id"])
    )
    assert rows == [
        (1, "E", 2), (1, "E", 3), (1, "E", 4),   # run capped at 3 (not id 5)
        (1, "P", 6), (1, "S", 1),
        (8, "E", 9), (8, "P", 10), (8, "S", 8),
    ]


# ---- randomized equivalence vs the round-5 brute reference -----------------


def _mask_df(spark, events, nbits):
    rows = [
        (eid, 0, EPOCH + datetime.timedelta(microseconds=ts),
         *[bool(m >> j & 1) for j in range(nbits)])
        for eid, ts, m in events
    ]
    cols = ", ".join(f"c{j} boolean" for j in range(nbits))
    return spark.createDataFrame(
        rows, f"event_id long, user_id long, ts timestamp, {cols}"
    )


def _us(v):
    import pandas as pd

    return (
        None if pd.isna(v)
        else int((v.to_pydatetime() - EPOCH).total_seconds() * 1e6)
    )


def brute_reluctant_lazy_skip(events, gap, mn, mx, w3):
    """SQL's lazy ONE-ROW reluctant semantics over the round-5 brute:
    per anchor the earliest-completing count (ties → smaller count),
    then the greedy SKIP PAST LAST fold."""
    from test_properties_round5 import brute_chain

    cands = []
    for m in range(mn, mx + 1):
        for aid, key, st, e_ts, e_id in brute_chain(
            events, [(None, None), (gap, (gap, m, m)), (w3, None)],
            final_wm_ms=10 ** 15, with_end=True,
        ):
            if st == "matched":
                cands.append((aid, key, e_ts, e_id, m))
    best = {}
    for aid, key, e_ts, e_id, m in cands:
        cur = best.get(aid)
        if cur is None or (e_ts, e_id, m) < (cur[2], cur[3], cur[4]):
            best[aid] = (aid, key, e_ts, e_id, m)
    items = sorted(best.values(), key=lambda c: (c[2], c[3], c[1][0], c[0]))
    le, out = (-1, -1), []
    for aid, key, e_ts, e_id, _m in items:
        if (key[0], aid) > le:
            out.append((aid, key))
            le = (e_ts, e_id)
    return sorted(out)


@st.composite
def _lazy_case(draw):
    gap = draw(st.integers(2, 40))
    mn = draw(st.integers(1, 2))
    mx = mn + draw(st.integers(0, 2))
    n_ev = draw(st.integers(0, 16))
    events = [
        (i, draw(st.integers(0, 90)), draw(st.integers(0, 7)))
        for i in range(n_ev)
    ]
    return gap, mn, mx, events


@pytest.mark.slow
@settings(max_examples=40, deadline=None)
@given(_lazy_case())
def test_reluctant_lazy_matches_brute(spark, case):
    gap, mn, mx, events = case
    df = _mask_df(spark, events, 3)
    out = match_recognize(
        df, partition_by="user_id", order_by="ts",
        pattern=f"S E{{{mn},{mx}}}? P",
        define={"S": F.col("c0"), "E": F.col("c1"), "P": F.col("c2")},
        withins={"E": f"INTERVAL {gap} MICROSECONDS",
                 "P": "INTERVAL 100 MICROSECONDS"},
        after_match="skip_past_last",
    ).toPandas()
    got = sorted(
        (int(r["anchor_id"]),
         (_us(r["S_ts"]), _us(r["E_ts"]), _us(r["E_last_ts"]),
          int(r["E_n"]), _us(r["P_ts"])))
        for _, r in out.iterrows()
    )
    assert got == brute_reluctant_lazy_skip(events, gap, mn, mx, 100)


def brute_alternation_skip(events, w2, w3):
    """Leftmost-preference alternation over two plain brute chains +
    the greedy SKIP PAST LAST fold. Event masks: bit0 = S, bit1 = C,
    bit2 = V, bit3 = P."""
    from test_properties_round5 import brute_chain

    def remap(bit_mid):
        return [
            (eid, ts,
             (m & 1) | ((m >> bit_mid & 1) << 1) | ((m >> 3 & 1) << 2))
            for eid, ts, m in events
        ]

    cands = []
    for b, bit_mid in enumerate((1, 2)):
        for aid, key, st, e_ts, e_id in brute_chain(
            remap(bit_mid), [(None, None), (w2, None), (w3, None)],
            final_wm_ms=10 ** 15, with_end=True,
        ):
            if st == "matched":
                cands.append((aid, b, key, e_ts, e_id))
    best = {}
    for aid, b, key, e_ts, e_id in cands:
        if aid not in best or b < best[aid][1]:
            best[aid] = (aid, b, key, e_ts, e_id)
    items = sorted(best.values(), key=lambda c: (c[3], c[4], c[2][0], c[0]))
    le, out = (-1, -1), []
    for aid, b, key, e_ts, e_id in items:
        if (key[0], aid) > le:
            out.append((aid, ("C", "V")[b], key))
            le = (e_ts, e_id)
    return sorted(out)


@st.composite
def _alt_case(draw):
    w2 = draw(st.integers(2, 50))
    n_ev = draw(st.integers(0, 16))
    events = [
        (i, draw(st.integers(0, 90)), draw(st.integers(0, 15)))
        for i in range(n_ev)
    ]
    return w2, events


@pytest.mark.slow
@settings(max_examples=40, deadline=None)
@given(_alt_case())
def test_alternation_matches_brute(spark, case):
    w2, events = case
    df = _mask_df(spark, events, 4)
    out = match_recognize(
        df, partition_by="user_id", order_by="ts",
        pattern="S (C|V) P",
        define={"S": F.col("c0"), "C": F.col("c1"),
                "V": F.col("c2"), "P": F.col("c3")},
        withins={"C": f"INTERVAL {w2} MICROSECONDS",
                 "V": f"INTERVAL {w2} MICROSECONDS",
                 "P": "INTERVAL 100 MICROSECONDS"},
        after_match="skip_past_last",
    ).toPandas()
    got = sorted(
        (int(r["anchor_id"]), r["classifier_2"],
         (_us(r["S_ts"]),
          _us(r["C_ts"]) if r["classifier_2"] == "C" else _us(r["V_ts"]),
          _us(r["P_ts"])))
        for _, r in out.iterrows()
    )
    assert got == brute_alternation_skip(events, w2, 100)


def test_permute_orders_and_preference(spark):
    """PERMUTE(C,E): both orderings match (classifier records the bound
    order); when both complete for one anchor the LISTED order wins."""
    rows = [
        (1, 1, EPOCH, "signup"),
        (2, 1, EPOCH + datetime.timedelta(seconds=10), "click"),
        (3, 1, EPOCH + datetime.timedelta(seconds=20), "error"),
        (4, 1, EPOCH + datetime.timedelta(seconds=30), "purchase"),
        (5, 2, EPOCH, "signup"),
        (6, 2, EPOCH + datetime.timedelta(seconds=10), "error"),
        (7, 2, EPOCH + datetime.timedelta(seconds=20), "click"),
        (8, 2, EPOCH + datetime.timedelta(seconds=30), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = match_recognize(
        ev, partition_by="user_id", order_by="ts",
        pattern="S PERMUTE(C,E) P",
        define={
            "S": F.col("event_type") == "signup",
            "C": F.col("event_type") == "click",
            "E": F.col("event_type") == "error",
            "P": F.col("event_type") == "purchase",
        },
        default_within="INTERVAL 5 MINUTES",
        after_match="skip_past_last",
    ).toPandas().set_index("user_id")
    assert got.loc[1, "classifier_2"] == "C,E"
    assert got.loc[2, "classifier_2"] == "E,C"
    assert list(got.sort_index()["end_id"]) == [4, 8]
    # listed-order preference: user 2's E->C ALSO satisfies C-after-S
    # via a later C? no second C exists, so only one branch matches —
    # build the both-match case: C at 10, E at 20 satisfies both C,E and
    # (E after C fails) — instead verify preference via parse order on
    # user 1: C,E (listed first) is the classifier even though E,C would
    # need E before C (it doesn't match), so check a true tie:
    rows_tie = [
        (1, 1, EPOCH, "signup"),
        (2, 1, EPOCH + datetime.timedelta(seconds=10), "click"),
        (3, 1, EPOCH + datetime.timedelta(seconds=15), "error"),
        (4, 1, EPOCH + datetime.timedelta(seconds=20), "click"),
        (5, 1, EPOCH + datetime.timedelta(seconds=25), "error"),
        (6, 1, EPOCH + datetime.timedelta(seconds=40), "purchase"),
    ]
    ev2 = spark.createDataFrame(
        rows_tie, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got2 = match_recognize(
        ev2, partition_by="user_id", order_by="ts",
        pattern="S PERMUTE(E,C) P",   # listed order: E first
        define={
            "S": F.col("event_type") == "signup",
            "C": F.col("event_type") == "click",
            "E": F.col("event_type") == "error",
            "P": F.col("event_type") == "purchase",
        },
        default_within="INTERVAL 5 MINUTES",
        after_match="no_skip",
    ).toPandas()
    # both E->C (3,4) and C->E (2,3) complete; listed order E,C wins
    assert list(got2["classifier_2"]) == ["E,C"]


def test_exclusion_shapes_output_only(spark):
    """{- X -}: matching is unchanged (the chain still requires X); the
    excluded variable vanishes from ONE-ROW columns and ALL-ROWS rows."""
    ev = _events_df(spark)
    spec = dict(
        define={
            "S": F.col("event_type") == "signup",
            "E": F.col("event_type") == "error",
            "P": F.col("event_type") == "purchase",
        },
        withins={"E": "INTERVAL 2 MINUTES", "P": "INTERVAL 10 MINUTES"},
        after_match="skip_past_last",
    )
    one = match_recognize(
        ev, "user_id", "ts", "S {-E{1,3}-} P", **spec
    ).toPandas()
    assert "E_ts" not in one.columns and "E_n" not in one.columns
    assert sorted(one["anchor_id"]) == [1, 8]   # matching unchanged
    allr = match_recognize(
        ev, "user_id", "ts", "S {-E{1,3}-} P", rows_per_match="all", **spec
    ).toPandas()
    assert set(allr["var"]) == {"S", "P"}
    assert sorted(allr["anchor_id"].unique()) == [1, 8]
    # a stripped exclusion token becomes a pattern variable like any
    # other — it still needs a DEFINE entry
    with pytest.raises(ValueError, match="DEFINE"):
        match_recognize(
            ev, "user_id", "ts", "S {-X-} P",
            {"S": F.lit(True), "P": F.lit(True)},
            default_within="INTERVAL 1 HOUR",
        )


def test_stream_reluctant_skip_routing(spark):
    """Round 9 lifted the r8 batch-only raises: the 3-variable lazy
    SKIP PAST LAST fold and alternation under NO SKIP now stream; the
    REMAINING constraints are pinned here — the lazy fold's shape bound
    (exactly 3 plain-anchored variables, finite cap) and the
    alternation preference fold's NO SKIP bound."""
    from flink_uba_spark.operators.match_recognize import (
        stream_match_recognize,
    )

    # 4-variable reluctant spec under SKIP PAST LAST: not the lazy
    # replay's shape
    with pytest.raises(ValueError, match="3-variable shape"):
        stream_match_recognize(
            None, "user_id", "ts", "S C E{1,2}? P",
            {"S": F.lit(True), "C": F.lit(True), "E": F.lit(True),
             "P": F.lit(True)},
            default_within="INTERVAL 1 HOUR",
            after_match="skip_past_last",
        )
    # uncapped reluctant under SKIP PAST LAST: the cap bounds the
    # replay horizon
    with pytest.raises(ValueError, match="finite cap"):
        stream_match_recognize(
            None, "user_id", "ts", "S E+? P",
            {"S": F.lit(True), "E": F.lit(True), "P": F.lit(True)},
            default_within="INTERVAL 1 HOUR",
            after_match="skip_past_last",
        )
    # alternation streams under NO SKIP only (the cross-anchor skip
    # replay over branches is batch-only)
    with pytest.raises(ValueError, match="NO SKIP"):
        stream_match_recognize(
            None, "user_id", "ts", "S (C|V) P",
            {"S": F.lit(True), "C": F.lit(True), "V": F.lit(True),
             "P": F.lit(True)},
            default_within="INTERVAL 1 HOUR",
            after_match="skip_past_last",
        )


def test_partition_anchors(spark):
    """^ requires the anchor to BE the partition's first row; $ requires
    the match to end at its last row; anchors are pure candidate filters
    (matching semantics unchanged)."""
    from flink_uba_spark.operators.match_recognize import strip_anchors

    assert strip_anchors("^ S P $") == ("S P", True, True)
    assert strip_anchors("S P") == ("S P", False, False)
    with pytest.raises(ValueError, match="PATTERN's ends"):
        strip_anchors("S ^ P")

    rows = [
        # user 1: first row IS a signup; last row IS a purchase
        (1, 1, EPOCH, "signup"),
        (2, 1, EPOCH + datetime.timedelta(seconds=10), "purchase"),
        # user 2: first row is a view -> ^ kills the (signup@3) anchor
        (3, 2, EPOCH, "view"),
        (4, 2, EPOCH + datetime.timedelta(seconds=5), "signup"),
        (5, 2, EPOCH + datetime.timedelta(seconds=10), "purchase"),
        # user 3: matches but a later view means $ kills it
        (6, 3, EPOCH, "signup"),
        (7, 3, EPOCH + datetime.timedelta(seconds=10), "purchase"),
        (8, 3, EPOCH + datetime.timedelta(seconds=20), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    spec = dict(
        define={
            "S": F.col("event_type") == "signup",
            "P": F.col("event_type") == "purchase",
        },
        default_within="INTERVAL 5 MINUTES",
        after_match="no_skip",
    )
    base = match_recognize(ev, "user_id", "ts", "S P", **spec).toPandas()
    assert sorted(base["user_id"]) == [1, 2, 3]
    start = match_recognize(ev, "user_id", "ts", "^ S P", **spec).toPandas()
    assert sorted(start["user_id"]) == [1, 3]
    both = match_recognize(ev, "user_id", "ts", "^ S P $", **spec).toPandas()
    assert sorted(both["user_id"]) == [1]
    assert "end_id" not in both.columns       # no_skip: end id is internal
    # streaming: anchors raise (last row unknowable on a stream)
    from flink_uba_spark.operators.match_recognize import (
        stream_match_recognize,
    )

    with pytest.raises(ValueError, match="batch-only"):
        stream_match_recognize(
            None, "user_id", "ts", "^ S P",
            {"S": F.lit(True), "P": F.lit(True)},
            default_within="INTERVAL 1 HOUR",
        )


def brute_trailing_run_skip(events, w, cap):
    """SKIP PAST LAST over a trailing GREEDY run (round 9 second pass):
    the run-5 brute's with_end already walks a Kleene step to its run's
    last repetition, so the fold's end IS the run-last (ts, id)."""
    from test_properties_round5 import brute_skip_past_last

    return brute_skip_past_last(
        events, [(None, None), (w, (w, cap))], final_wm_ms=10 ** 15
    )


@st.composite
def _trailing_case(draw):
    w = draw(st.integers(2, 40))
    cap = draw(st.sampled_from([1, 2, 3, None]))  # None = uncapped E+
    n_ev = draw(st.integers(0, 16))
    events = [
        (i, draw(st.integers(0, 90)), draw(st.integers(0, 3)))
        for i in range(n_ev)
    ]
    return w, cap, events


@pytest.mark.slow
@settings(max_examples=40, deadline=None)
@given(_trailing_case())
def test_trailing_run_skip_matches_brute(spark, case):
    """PATTERN (S E+) / (S E{1,cap}) under SKIP PAST LAST ROW — the
    trailing run's end is its LAST repetition (engine end_id = il{n});
    overlapping-predicate masks exercise the (ts, rank, id) order."""
    w, cap, events = case
    df = _mask_df(spark, events, 2)
    pat = "S E+" if cap is None else f"S E{{1,{cap}}}"
    out = match_recognize(
        df, partition_by="user_id", order_by="ts",
        pattern=pat,
        define={"S": F.col("c0"), "E": F.col("c1")},
        withins={"E": f"INTERVAL {w} MICROSECONDS"},
        after_match="skip_past_last",
    ).toPandas()
    got = sorted(
        (int(r["anchor_id"]),
         (_us(r["S_ts"]), _us(r["E_ts"]), _us(r["E_last_ts"]),
          int(r["E_n"])))
        for _, r in out.iterrows()
    )
    want = sorted(
        (aid, key)
        for aid, key, _st in brute_trailing_run_skip(
            events, w, cap if cap is not None else 10 ** 6
        )
    )
    assert got == want


def test_trailing_run_skip_hand_case(spark):
    """Hand-checked episode segmentation: the greedy run absorbs every
    in-gap repetition, and anchors inside an emitted episode are
    discarded by the fold."""
    rows = [
        # key 1: S@0, E@1 E@2 E@3 (+ E@6, still in the 10s gap) — one
        # maximal run; S@5 sits before the run's end → discarded
        (1, 1, 0, "s"), (2, 1, 1, "e"), (3, 1, 2, "e"), (4, 1, 3, "e"),
        (5, 1, 5, "s"), (6, 1, 6, "e"),
        # key 2: the run ends at E@4; S@2 anchors INSIDE it → discarded
        (7, 2, 0, "s"), (8, 2, 1, "e"), (9, 2, 2, "s"),
        (10, 2, 3, "e"), (11, 2, 4, "e"),
    ]
    ev = spark.createDataFrame(
        [
            (eid, uid, EPOCH + datetime.timedelta(seconds=sec), et)
            for eid, uid, sec, et in rows
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = match_recognize(
        ev, "user_id", "ts", "S E+",
        define={"S": F.col("event_type") == "s",
                "E": F.col("event_type") == "e"},
        default_within="INTERVAL 10 SECONDS",
        after_match="skip_past_last",
    ).toPandas().sort_values("user_id").reset_index(drop=True)
    assert len(out) == 2
    assert int(out.loc[0, "user_id"]) == 1
    assert int(out.loc[0, "E_n"]) == 4 and int(out.loc[0, "end_id"]) == 6
    assert int(out.loc[1, "user_id"]) == 2
    assert int(out.loc[1, "E_n"]) == 3 and int(out.loc[1, "end_id"]) == 11


def test_trailing_run_end_anchor(spark):
    """$ with a trailing run: the run's LAST repetition must be the
    partition's last row."""
    rows = [
        (1, 1, 0, "s"), (2, 1, 1, "e"), (3, 1, 2, "e"),   # ends partition
        (4, 2, 0, "s"), (5, 2, 1, "e"), (6, 2, 2, "x"),   # x after run
    ]
    ev = spark.createDataFrame(
        [
            (eid, uid, EPOCH + datetime.timedelta(seconds=sec), et)
            for eid, uid, sec, et in rows
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = match_recognize(
        ev, "user_id", "ts", "S E+ $",
        define={"S": F.col("event_type") == "s",
                "E": F.col("event_type") == "e"},
        default_within="INTERVAL 10 SECONDS",
        after_match="no_skip",
    ).toPandas()
    assert sorted(out["user_id"]) == [1]
    assert int(out.loc[0, "E_n"]) == 2


def test_subset_union_aggregates(spark):
    """SUBSET U = (S, E, P) consumed by RunAgg MEASURES: the union of
    the members' bound rows in (ts, id) order — sum/count over all
    members, offset navigation crossing member boundaries."""
    from flink_uba_spark.operators.match_recognize import run_agg

    rows = [
        (1, 1, 0, "s", 10), (2, 1, 1, "e", 1),
        (3, 1, 2, "e", 2), (4, 1, 3, "p", 5),
    ]
    ev = spark.createDataFrame(
        [
            (eid, uid, EPOCH + datetime.timedelta(seconds=sec), et, v)
            for eid, uid, sec, et, v in rows
        ],
        "event_id long, user_id long, ts timestamp, event_type string, v long",
    )
    define = {
        "S": F.col("event_type") == "s",
        "E": F.col("event_type") == "e",
        "P": F.col("event_type") == "p",
    }
    out = match_recognize(
        ev, "user_id", "ts", "S E+ P", define,
        default_within="INTERVAL 10 SECONDS", after_match="no_skip",
        subset={"U": ("S", "E", "P")},
        measures={
            "u_sum": run_agg("sum", "U", "v"),
            "u_cnt": run_agg("count", "U"),
            "u_first": run_agg("first", "U", "v"),
            "u_second": run_agg("first", "U", "v", 1),
            "u_last2": run_agg("last", "U", "v", 1),
            "u_oob": run_agg("last", "U", "v", 9),   # past the union → NULL
            "e_sum": run_agg("sum", "E", "v"),
        },
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["u_sum"] == 18 and r["u_cnt"] == 4
    assert r["u_first"] == 10 and r["u_second"] == 1 and r["u_last2"] == 2
    assert r["u_oob"] is None
    assert r["e_sum"] == 3


def test_subset_validations(spark):
    from flink_uba_spark.operators.match_recognize import run_agg

    ev = spark.createDataFrame(
        [(1, 1, EPOCH, "s")],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    define = {"S": F.col("event_type") == "s",
              "E": F.col("event_type") == "e"}
    base = dict(default_within="INTERVAL 1 HOUR", after_match="no_skip")
    with pytest.raises(ValueError, match="collides"):
        match_recognize(ev, "user_id", "ts", "S E", define,
                        subset={"S": ("E",)},
                        measures={"x": run_agg("count", "S")}, **base)
    with pytest.raises(ValueError, match="members must be PATTERN"):
        match_recognize(ev, "user_id", "ts", "S E", define,
                        subset={"U": ("S", "Z")},
                        measures={"x": run_agg("count", "U")}, **base)
    with pytest.raises(ValueError, match="consumed by RunAgg"):
        match_recognize(ev, "user_id", "ts", "S E", define,
                        subset={"U": ("S", "E")}, **base)
    with pytest.raises(ValueError, match="at least one member"):
        match_recognize(ev, "user_id", "ts", "S E", define,
                        subset={"U": ()},
                        measures={"x": run_agg("count", "U")}, **base)
    # ISO treats SUBSET members as a set — a repeated member would
    # silently double count/sum aggregates (round-9 ADVICE)
    with pytest.raises(ValueError, match="repeats a member"):
        match_recognize(ev, "user_id", "ts", "S E", define,
                        subset={"U": ("E", "E")},
                        measures={"x": run_agg("count", "U")}, **base)


def test_trailing_reluctant_zero_min_raises(spark):
    # (round-9 ADVICE) 'S B{0,3}?' under SKIP PAST LAST would rewrite to
    # times(0, 0) → lead(ts, -1), silently wrong run bounds; must raise
    ev = spark.createDataFrame(
        [(1, 1, EPOCH, "s")],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    define = {"S": F.col("event_type") == "s",
              "B": F.col("event_type") == "b"}
    with pytest.raises(ValueError, match="minimum count >= 1"):
        match_recognize(
            ev, "user_id", "ts", "S B{0,3}?", define,
            default_within="INTERVAL 1 HOUR", after_match="skip_past_last",
        )
    with pytest.raises(ValueError, match="minimum count >= 1"):
        match_recognize(
            ev, "user_id", "ts", "S B{0}?", define,
            default_within="INTERVAL 1 HOUR", after_match="skip_past_last",
        )


@st.composite
def _subset_case(draw):
    w = draw(st.integers(5, 60))
    n_ev = draw(st.integers(0, 14))
    events = [
        (i, draw(st.integers(0, 90)), draw(st.integers(0, 7)))
        for i in range(n_ev)
    ]
    return w, events


@pytest.mark.slow
@settings(max_examples=30, deadline=None)
@given(_subset_case())
def test_subset_agg_matches_all_rows_route(spark, case):
    """Property: SUBSET aggregates over U=(S,E,P) equal aggregating the
    ALL ROWS PER MATCH enumeration of the same matches (the two routes
    share only the engine — plain members arrive via id-equi join in
    one, via the explode projection in the other)."""
    w, events = case
    df = _mask_df(spark, events, 3).withColumn(
        "v", (F.col("event_id") % 7 + 1).cast("long")
    )
    from flink_uba_spark.operators.match_recognize import run_agg

    define = {"S": F.col("c0"), "E": F.col("c1"), "P": F.col("c2")}
    spec = dict(
        withins={"E": f"INTERVAL {w} MICROSECONDS",
                 "P": f"INTERVAL {w} MICROSECONDS"},
        after_match="no_skip",
    )
    got = match_recognize(
        df, "user_id", "ts", "S E{1,2} P", define,
        subset={"U": ("S", "E", "P")},
        measures={
            "anchor_id": F.col("anchor_id"),
            "u_cnt": run_agg("count", "U"),
            "u_sum": run_agg("sum", "U", "v"),
        },
        **spec,
    ).toPandas()
    allrows = match_recognize(
        df, "user_id", "ts", "S E{1,2} P", define,
        rows_per_match="all", **spec,
    ).toPandas()
    vals = {int(eid): int(eid) % 7 + 1 for eid, _ts, _m in events}
    want = {}
    for _, r in allrows.iterrows():
        a = int(r["anchor_id"])
        cnt, s = want.get(a, (0, 0))
        want[a] = (cnt + 1, s + vals[int(r["event_id"])])
    gotd = {
        int(r["anchor_id"]): (int(r["u_cnt"]), int(r["u_sum"]))
        for _, r in got.iterrows()
    }
    assert gotd == want


def test_all_rows_alternation_and_permute(spark):
    """ALL ROWS over a branch union (round 9 second pass): one row per
    bound event of the WINNING branch, CLASSIFIER() per row; leftmost /
    listed-order preference decides which branch's rows emit."""
    rows = [
        # user 1: C and V both complete at the same positions → C wins
        (1, 1, 0, "s"), (2, 1, 1, "c"), (3, 1, 1, "v"), (4, 1, 2, "p"),
        # user 2: only the V branch completes
        (5, 2, 0, "s"), (6, 2, 1, "v"), (7, 2, 2, "p"),
    ]
    ev = spark.createDataFrame(
        [
            (eid, uid, EPOCH + datetime.timedelta(seconds=sec), et)
            for eid, uid, sec, et in rows
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    define = {
        "S": F.col("event_type") == "s", "C": F.col("event_type") == "c",
        "V": F.col("event_type") == "v", "P": F.col("event_type") == "p",
    }
    out = match_recognize(
        ev, "user_id", "ts", "S (C|V) P", define,
        default_within="INTERVAL 10 SECONDS",
        after_match="skip_past_last", rows_per_match="all",
    ).toPandas().sort_values(["user_id", "seq"]).reset_index(drop=True)
    assert list(out["var"]) == ["S", "C", "P", "S", "V", "P"]
    assert list(out["event_id"]) == [1, 2, 4, 5, 6, 7]
    # PERMUTE: user 1 binds c then v? PERMUTE(C,V) prefers listed order
    outp = match_recognize(
        ev, "user_id", "ts", "S PERMUTE(C,V)", define,
        default_within="INTERVAL 10 SECONDS",
        after_match="no_skip", rows_per_match="all",
    ).toPandas().sort_values(["user_id", "seq"]).reset_index(drop=True)
    # user 1 has both c and v after s: the (C,V) ordering wins; user 2
    # lacks a c so no PERMUTE match at all
    assert list(outp["var"]) == ["S", "C", "V"]
    assert list(outp["event_id"]) == [1, 2, 3]
    # quantified variables stay single-plan under ALL ROWS
    with pytest.raises(ValueError, match="plain/optional"):
        match_recognize(
            ev, "user_id", "ts", "S (C|V) P{1,2}", define,
            default_within="INTERVAL 10 SECONDS",
            after_match="no_skip", rows_per_match="all",
        )


def test_group_run_agg_hand_case(spark):
    """RunAgg over a quantified GROUP's run: the OR-predicate band join
    recovers every repetition regardless of which member matched it."""
    from flink_uba_spark.operators.match_recognize import run_agg

    rows = [
        ("a", 1, 0, "s", 1), ("a", 2, 1, "c", 10), ("a", 3, 2, "v", 20),
        ("a", 4, 3, "c", 30), ("a", 5, 4, "p", 99),
    ]
    ev = spark.createDataFrame(
        [
            (uid, eid, EPOCH + datetime.timedelta(seconds=sec), et, v)
            for uid, eid, sec, et, v in rows
        ],
        "user_id string, event_id long, ts timestamp, event_type string, v long",
    )
    out = match_recognize(
        ev, "user_id", "ts", "S (C|V){1,3} P",
        define={"S": F.col("event_type") == "s",
                "C": F.col("event_type") == "c",
                "V": F.col("event_type") == "v",
                "P": F.col("event_type") == "p"},
        default_within="INTERVAL 10 SECONDS",
        after_match="skip_past_last",
        measures={
            "run_n": F.col("C_V_n"),
            "run_sum": run_agg("sum", "C_V", "v"),
            "run_max": run_agg("max", "C_V", "v"),
            "run_first": run_agg("first", "C_V", "v"),
        },
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["run_n"] == 3 and r["run_sum"] == 60
    assert r["run_max"] == 30 and r["run_first"] == 10


def test_all_rows_iter_and_skip_to(spark):
    """ALL ROWS over the plain-chain specialty routes (round 9 second
    pass): iter_define and SKIP TO FIRST/LAST both explode the bound
    events statelessly; reluctant stays a clear raise."""
    rows = [("a", 1, 0, "s", 5), ("a", 2, 1, "c", 3),
            ("a", 3, 2, "p", 9), ("a", 4, 3, "p", 2)]
    ev = spark.createDataFrame(
        [
            (uid, eid, EPOCH + datetime.timedelta(seconds=sec), et, v)
            for uid, eid, sec, et, v in rows
        ],
        "user_id string, event_id long, ts timestamp, event_type string, v long",
    )
    d = {"S": F.col("event_type") == "s", "C": F.col("event_type") == "c",
         "P": F.col("event_type") == "p"}
    base = dict(default_within="INTERVAL 10 SECONDS", rows_per_match="all")
    out = match_recognize(
        ev, "user_id", "ts", "S C P", define=d, after_match="no_skip",
        payload={"v": F.col("v")},
        iter_define={"P": lambda b: b["P"]["v"] >= b["S"]["v"]},
        **base,
    ).toPandas().sort_values("seq")
    assert list(out["event_id"]) == [1, 2, 3]   # P@4 (v=2 < 5) never binds
    out2 = match_recognize(
        ev, "user_id", "ts", "S C P", define=d,
        after_match="skip_to_last C", **base,
    ).toPandas().sort_values("seq")
    assert list(out2["var"]) == ["S", "C", "P"]
    with pytest.raises(ValueError, match="reluctant"):
        match_recognize(
            ev, "user_id", "ts", "S C{1,2}? P", define=d,
            after_match="no_skip", **base,
        )


@pytest.mark.slow
@settings(max_examples=25, deadline=None)
@given(_trailing_case())
def test_trailing_reluctant_rewrite_matches_brute(spark, case):
    """Trailing RELUCTANT under SKIP PAST LAST ≡ the exact minimum-count
    run times(mn, mn): no suffix → the lazy preference is always mn, and
    the engine's entry rule is the times(mn, mn) binding itself."""
    from test_properties_round5 import brute_skip_past_last

    w, cap, events = case
    mn = 1 if cap is None else min(2, cap)
    pat = f"S E{{{mn},}}?" if cap is None else f"S E{{{mn},{cap}}}?"
    df = _mask_df(spark, events, 2)
    out = match_recognize(
        df, partition_by="user_id", order_by="ts",
        pattern=pat,
        define={"S": F.col("c0"), "E": F.col("c1")},
        withins={"E": f"INTERVAL {w} MICROSECONDS"},
        after_match="skip_past_last",
    ).toPandas()
    got = sorted(
        (int(r["anchor_id"]),
         (_us(r["S_ts"]), _us(r["E_ts"]), _us(r["E_last_ts"]),
          int(r["E_n"])))
        for _, r in out.iterrows()
    )
    want = sorted(
        (aid, key)
        for aid, key, _st in brute_skip_past_last(
            events, [(None, None), (w, (w, mn, mn))], final_wm_ms=10 ** 15
        )
    )
    assert got == want


def test_within_overall_prunes_before_fold(spark):
    """Flink's overall within: a violating candidate is NOT a match, so
    it never advances the SKIP PAST LAST horizon — a later overlapping
    candidate that respects the bound emits instead."""
    rows = [(1, 1, 0, "s"), (2, 1, 2, "s"), (3, 1, 3, "c"), (4, 1, 6, "p")]
    ev = spark.createDataFrame(
        [
            (eid, uid, EPOCH + datetime.timedelta(seconds=sec), et)
            for eid, uid, sec, et in rows
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    d = {"S": F.col("event_type") == "s", "C": F.col("event_type") == "c",
         "P": F.col("event_type") == "p"}
    base = dict(default_within="INTERVAL 10 SECONDS",
                after_match="skip_past_last")
    # without the overall bound, the earlier anchor wins and the later
    # one is folded away
    no_bound = match_recognize(ev, "user_id", "ts", "S C P", d, **base)
    assert [r["anchor_id"] for r in no_bound.collect()] == [1]
    # with a 5 s overall bound, anchor 1's match (end at +6 s) is pruned
    # BEFORE the fold and anchor 2's (end-anchor gap 4 s) emits
    bounded = match_recognize(
        ev, "user_id", "ts", "S C P", d,
        within_overall="INTERVAL 5 SECONDS", **base,
    )
    assert [r["anchor_id"] for r in bounded.collect()] == [2]
    # trailing run: the bound applies to the run's LAST repetition
    run = match_recognize(
        ev, "user_id", "ts", "S C+", d,
        within_overall="INTERVAL 2 SECONDS", **base,
    )
    assert [r["anchor_id"] for r in run.collect()] == [2]
    # reluctant routes compose too (round 10 lifted the r9 raise): the
    # bound filters the per-count candidates before preference/fold —
    # here the only candidate (end +6 s > 5 s) dies
    rel = match_recognize(
        ev, "user_id", "ts", "S C{1,2}? P", d,
        within_overall="INTERVAL 5 SECONDS",
        default_within="INTERVAL 10 SECONDS", after_match="no_skip",
    )
    assert rel.count() == 1  # anchor 2's candidate (span 4 s) survives
