"""Round-5 batch-compiler semantics pins: notFollowedBy kills, times(from,
to) entry validity, and the optional() greedy race — small hand-built
cases where the expected answer is verifiable by eye (the property suite
covers the randomized space; these are the documentation-grade pins)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (i, u, t, datetime.datetime(2020, 1, 1) + datetime.timedelta(seconds=s))
            for i, u, t, s in rows
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )


def _run(spark, rows, **kwargs):
    from flink_uba_spark.operators.sequence import pattern_detect

    out = pattern_detect(_df(spark, rows), key="user_id", **kwargs)
    return {r.user_id: r for r in out.collect()}


def test_not_followed_by_kill_matrix(spark):
    rows = [
        (1, 1, "A", 10), (2, 1, "C", 20), (3, 1, "B", 30),   # C first → matched
        (4, 2, "A", 10), (5, 2, "B", 20), (6, 2, "C", 30),   # B between → negated
        (7, 3, "A", 10), (8, 3, "B", 20),                    # B while waiting → negated
        (9, 4, "A", 10),                                     # nothing → incomplete
        (10, 5, "A", 10), (11, 5, "B", 20), (12, 5, "C", 20),  # tie: B sorts first → negated
    ]
    got = _run(
        spark, rows,
        steps=[(F.col("event_type") == "A", None), (F.col("event_type") == "C", None)],
        not_followed_by={1: F.col("event_type") == "B"},
    )
    assert {u: got[u].state for u in (1, 2, 3, 4, 5)} == {
        1: "matched", 2: "negated", 3: "negated", 4: "incomplete", 5: "negated",
    }


def test_times_skips_short_runs_and_caps_greedily(spark):
    rows = [
        # u1: 2-run at 10..20, then a 3-run at 200..220 → times(3) binds the 3-run
        (1, 1, "A", 0), (2, 1, "B", 10), (3, 1, "B", 20),
        (4, 1, "B", 200), (5, 1, "B", 210), (6, 1, "B", 220), (7, 1, "C", 300),
        # u2: only a 2-run → incomplete under times(3)
        (8, 2, "A", 0), (9, 2, "B", 10), (10, 2, "B", 20), (11, 2, "C", 100),
        # u3: a 5-run under times(2,3) → greedy 3, C binds after the 3rd rep
        (12, 3, "A", 0), (13, 3, "B", 10), (14, 3, "B", 20), (15, 3, "B", 30),
        (16, 3, "B", 40), (17, 3, "B", 50), (18, 3, "C", 60),
    ]
    t3 = _run(
        spark, rows,
        steps=[
            (F.col("event_type") == "A", None),
            (F.col("event_type") == "B", "INTERVAL 30 SECONDS", (3, 3)),
            (F.col("event_type") == "C", None),
        ],
    )
    assert t3[1].n2 == 3 and t3[1].state == "matched_late"  # skipped the 2-run
    assert t3[1].t2 == datetime.datetime(2020, 1, 1, 0, 3, 20)
    assert t3[2].state == "incomplete" and t3[2].n2 is None
    assert t3[3].n2 == 3 and t3[3].state == "matched"
    t23 = _run(
        spark, rows,
        steps=[
            (F.col("event_type") == "A", None),
            (F.col("event_type") == "B", "INTERVAL 30 SECONDS", (2, 3)),
            (F.col("event_type") == "C", None),
        ],
    )
    assert t23[2].state != "incomplete" and t23[2].n2 == 2  # 2-run now valid


def test_optional_greedy_race_matrix(spark):
    rows = [
        (1, 1, "A", 0), (2, 1, "C", 10), (3, 1, "B", 20),   # C first → skip B
        (4, 2, "A", 0), (5, 2, "B", 10), (6, 2, "C", 20),   # B first → take
        (7, 3, "A", 0), (8, 3, "B", 10),                    # take, no C → incomplete
        (9, 4, "A", 0), (10, 4, "C", 10),                   # skip, complete
        (11, 5, "A", 0),                                    # incomplete
        (12, 6, "A", 0), (13, 6, "B", 10), (14, 6, "C", 10),  # tie → B first → take
    ]
    got = _run(
        spark, rows,
        steps=[
            (F.col("event_type") == "A", None),
            (F.col("event_type") == "B", "INTERVAL 5 SECONDS"),
            (F.col("event_type") == "C", "INTERVAL 30 SECONDS"),
        ],
        optional={2},
    )
    assert got[1].state == "matched" and got[1].t2 is None and got[1].max_step == 2
    assert got[2].state == "matched_late" and got[2].max_step == 3  # 10s > 5s within
    assert got[3].state == "incomplete"
    assert got[4].state == "matched" and got[4].t2 is None
    assert got[5].state == "incomplete"
    assert got[6].state == "matched_late" and got[6].t2 is not None


def test_pattern_combinator_validation(spark):
    from flink_uba_spark.operators.sequence import pattern_detect

    df = _df(spark, [(1, 1, "A", 0)])
    steps3 = [
        (F.col("event_type") == "A", None),
        (F.col("event_type") == "B", None),
        (F.col("event_type") == "C", None),
    ]
    with pytest.raises(ValueError):
        pattern_detect(df, key="user_id", steps=steps3, optional={1})
    with pytest.raises(ValueError):
        pattern_detect(df, key="user_id", steps=steps3, optional={3})
    with pytest.raises(ValueError):
        pattern_detect(
            df, key="user_id", steps=steps3, optional={2},
            not_followed_by={2: F.col("event_type") == "X"},
        )
    with pytest.raises(ValueError):
        pattern_detect(
            df, key="user_id",
            steps=[
                (F.col("event_type") == "A", None),
                (F.col("event_type") == "B", "INTERVAL 1 SECOND", (3, 2)),
                (F.col("event_type") == "C", None),
            ],
        )


def test_optional_race_tie_takes_when_one_row_serves_both_steps(spark):
    """Batch-soak regression: when the SAME event is the earliest
    candidate for both the optional step and its successor (one row
    matching both predicates), the race is a tie and the optional step is
    TAKEN — matching the streaming race's strict skip rule."""
    from flink_uba_spark.operators.sequence import pattern_detect

    df = _df(spark, [(1, 1, "A", 0)]).unionByName(
        spark.createDataFrame(
            [(2, 1, "BC", datetime.datetime(2020, 1, 1, 0, 0, 10)),
             (3, 1, "C", datetime.datetime(2020, 1, 1, 0, 0, 20))],
            "event_id long, user_id long, event_type string, ts timestamp",
        )
    )
    out = pattern_detect(
        df, key="user_id",
        steps=[
            (F.col("event_type") == "A", None),
            (F.col("event_type").isin("B", "BC"), None),        # optional
            (F.col("event_type").isin("C", "BC"), None),
        ],
        optional={2},
    ).collect()
    assert len(out) == 1
    r = out[0]
    # row 2 serves step 2 (taken); step 3 then binds the SAME row? no —
    # strictly after → row 3
    assert r.t2 == datetime.datetime(2020, 1, 1, 0, 0, 10)
    assert r.t3 == datetime.datetime(2020, 1, 1, 0, 0, 20)
    assert r.state == "matched"


def test_kleene_then_optional_carries_race_from_run_last(spark):
    """Batch-soak regression (seed 39): when a Kleene step precedes an
    optional step, the race lookup must be evaluated at the run's LAST
    repetition and carried back — previously the unmerged next-chain was
    carried and the skip branch was lost."""
    from flink_uba_spark.operators.sequence import pattern_detect

    rows = [
        (1, 1, "A", 0),       # anchor
        (2, 1, "B", 10),      # kleene rep (oneOrMore cap 1)
        (3, 1, "D", 20),      # step-4 row arrives BEFORE any step-3 row
        (4, 1, "C", 30),      # optional step-3 candidate (after D!)
    ]
    out = pattern_detect(
        _df(spark, rows), key="user_id",
        steps=[
            (F.col("event_type") == "A", None),
            (F.col("event_type") == "B", "INTERVAL 1 MINUTE", 1),
            (F.col("event_type") == "C", None),   # optional
            (F.col("event_type") == "D", None),
        ],
        optional={3},
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.t3 is None  # D precedes C → race skips the optional step
    assert r.t4 == datetime.datetime(2020, 1, 1, 0, 0, 20)
    assert r.state == "matched"
