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
    with _pytest.raises(ValueError, match="ALL ROWS"):
        match_recognize(
            ev, "user_id", "ts", "S E{1,3} P",
            {"S": F.lit(True), "E": F.lit(True), "P": F.lit(True)},
            default_within="INTERVAL 1 HOUR", rows_per_match="all",
        )
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
