"""SQL-text MATCH_RECOGNIZE front-end (operators/match_recognize_sql.py).

The parser is a pure text-to-spec compiler onto match_recognize, so the
risk is the MAPPING: (1) parser pins on the spec dict, (2) text ≡ dict
equality against the catalog's Python-spec twins at sf0.001 (three text
twins also sit in the catalog ×3-SF oracle gate:
match_recognize_sql_{error_run,skip_to_first,subset_agg}), (3) rejection
tests — every unsupported construct raises with the reason.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_uba_spark.operators.match_recognize_sql import (
    match_recognize_sql,
    parse_match_recognize_sql,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    from flink_uba_spark.sources.readers import load_testdata

    return load_testdata(spark, SF, ("events",))["events"]


def _assert_frame_equal(got, want):
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


# ---------------------------------------------------------------------------
# parser pins
# ---------------------------------------------------------------------------


def test_parse_full_wrapper():
    spec = parse_match_recognize_sql(
        """
        SELECT * FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts ASC
            MEASURES S.ts AS start_ts, COUNT(E.*) AS n_err
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (S E{1,3} P) WITHIN INTERVAL '12' HOUR
            SUBSET U = (S, E, P)
            DEFINE S AS S.event_type = 'signup',
                   E AS E.event_type = 'error',
                   P AS P.event_type = 'purchase'
        ) AS m
        """
    )
    assert spec["partition_by"] == "user_id"
    assert spec["order_by"] == "ts"
    assert spec["pattern"] == "S E{1,3} P"
    assert spec["rows_per_match"] == "one"
    assert spec["after_match"] == "no_skip"
    assert spec["within_overall"] == "INTERVAL 12 HOUR"
    assert spec["subset"] == {"U": ("S", "E", "P")}
    assert spec["define_sql"]["E"] == "E.event_type = 'error'"
    assert spec["measures_sql"] == {
        "start_ts": "S.ts",
        "n_err": "COUNT(E.*)",
    }


def test_parse_after_match_variants():
    base = """
    PARTITION BY u ORDER BY ts {am}
    PATTERN (A B) DEFINE A AS x = 1, B AS x = 2
    """
    am = lambda s: parse_match_recognize_sql(base.format(am=s))["after_match"]
    assert am("") == "skip_past_last"  # the ISO default
    assert am("AFTER MATCH SKIP PAST LAST ROW") == "skip_past_last"
    assert am("AFTER MATCH SKIP TO NEXT ROW") == "no_skip"
    assert am("AFTER MATCH SKIP TO FIRST B") == "skip_to_first B"
    assert am("AFTER MATCH SKIP TO LAST B") == "skip_to_last B"
    assert am("AFTER MATCH SKIP TO B") == "skip_to_last B"  # ISO: TO ≡ TO LAST


def test_parse_pattern_spacing_normalized():
    spec = parse_match_recognize_sql(
        """
        PARTITION BY u ORDER BY ts
        PATTERN (S ( A | B )+ PERMUTE(C, D) {- E -} $)
        DEFINE S AS x=1, A AS x=2, B AS x=3, C AS x=4, D AS x=5, E AS x=6
        """
    )
    assert spec["pattern"] == "S (A|B)+ PERMUTE(C,D) {- E -} $"


# ---------------------------------------------------------------------------
# text ≡ dict-spec equality (the catalog twins also pin 3 of these ×3 SFs
# against DuckDB through the driver gate)
# ---------------------------------------------------------------------------


def test_text_equals_dict_quantified(spark):
    from flink_uba_spark.queries.behavior import match_recognize_error_run

    got = match_recognize_sql(
        _events(spark),
        """
        SELECT * FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (S E{1,3} P)
            DEFINE S AS S.event_type = 'signup',
                   E AS E.event_type = 'error',
                   P AS P.event_type = 'purchase'
        )
        """,
        withins={"E": "INTERVAL 12 HOURS", "P": "INTERVAL 24 HOURS"},
    )
    _assert_frame_equal(got, match_recognize_error_run(spark, SF))


def test_text_equals_dict_skip_to_first(spark):
    from flink_uba_spark.queries.rowpattern import match_recognize_skip_to_first

    got = match_recognize_sql(
        _events(spark),
        """
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP TO FIRST C
        PATTERN (S C P)
        DEFINE S AS S.event_type = 'signup',
               C AS C.event_type = 'click',
               P AS P.event_type = 'purchase'
        """,
        withins={"C": "INTERVAL 6 HOURS", "P": "INTERVAL 24 HOURS"},
    )
    _assert_frame_equal(got, match_recognize_skip_to_first(spark, SF))


def test_text_equals_dict_within_overall(spark):
    from flink_uba_spark.queries.rowpattern import match_recognize_within_overall

    got = match_recognize_sql(
        _events(spark),
        """
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (S C P) WITHIN INTERVAL '12' HOUR
        DEFINE S AS S.event_type = 'signup',
               C AS C.event_type = 'click',
               P AS P.event_type = 'purchase'
        """,
        withins={"C": "INTERVAL 6 HOURS", "P": "INTERVAL 24 HOURS"},
    )
    _assert_frame_equal(got, match_recognize_within_overall(spark, SF))


def test_text_equals_dict_reluctant(spark):
    from flink_uba_spark.queries.rowpattern import match_recognize_reluctant_lazy

    got = match_recognize_sql(
        _events(spark),
        """
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (S E{1,3}? P)
        DEFINE S AS S.event_type = 'signup',
               E AS E.event_type = 'error',
               P AS P.event_type = 'purchase'
        """,
        withins={"E": "INTERVAL 12 HOURS", "P": "INTERVAL 24 HOURS"},
    )
    _assert_frame_equal(got, match_recognize_reluctant_lazy(spark, SF))


def test_text_equals_dict_prev_navigation(spark):
    from flink_uba_spark.queries.rowpattern import match_recognize_prev_navigation

    ev = (
        _events(spark)
        .filter(F.col("event_type") == "purchase")
        .withColumn("cents", F.floor(F.col("value") * 100).cast("long"))
    )
    got = match_recognize_sql(
        ev,
        """
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (B R{2,4})
        DEFINE B AS TRUE,
               R AS R.cents > PREV(cents)
        """,
        default_within="INTERVAL 7 DAYS",
    )
    _assert_frame_equal(got, match_recognize_prev_navigation(spark, SF))


def test_text_equals_dict_all_rows_exclusion(spark):
    from flink_uba_spark.queries.rowpattern import match_recognize_all_rows_excluded

    got = match_recognize_sql(
        _events(spark),
        """
        PARTITION BY user_id ORDER BY ts
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (S {- E{1,3} -} P)
        DEFINE S AS S.event_type = 'signup',
               E AS E.event_type = 'error',
               P AS P.event_type = 'purchase'
        """,
        withins={"E": "INTERVAL 12 HOURS", "P": "INTERVAL 24 HOURS"},
    )
    _assert_frame_equal(got, match_recognize_all_rows_excluded(spark, SF))


def test_text_equals_dict_permute(spark):
    from flink_uba_spark.queries.rowpattern import match_recognize_permute

    got = match_recognize_sql(
        _events(spark),
        """
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (S PERMUTE(C, E) P)
        DEFINE S AS S.event_type = 'signup',
               C AS C.event_type = 'click',
               E AS E.event_type = 'error',
               P AS P.event_type = 'purchase'
        """,
        withins={
            "C": "INTERVAL 6 HOURS",
            "E": "INTERVAL 6 HOURS",
            "P": "INTERVAL 24 HOURS",
        },
    )
    _assert_frame_equal(got, match_recognize_permute(spark, SF))


# ---------------------------------------------------------------------------
# rejection tests — readable errors
# ---------------------------------------------------------------------------

_OK = """
PARTITION BY u ORDER BY ts
PATTERN (A B) DEFINE A AS x = 1, B AS x = 2
"""


def _reject(sql, match):
    with pytest.raises(ValueError, match=match):
        parse_match_recognize_sql(sql)


def test_rejects_missing_clauses():
    _reject("PARTITION BY u ORDER BY ts DEFINE A AS x=1", "needs a PATTERN")
    _reject("PARTITION BY u ORDER BY ts PATTERN (A B)", "needs a DEFINE")
    _reject("ORDER BY ts PATTERN (A B) DEFINE A AS x=1", "needs PARTITION BY")
    _reject("PARTITION BY u PATTERN (A B) DEFINE A AS x=1", "needs ORDER BY")


def test_rejects_bad_shapes():
    _reject(_OK.replace("PARTITION BY u", "PARTITION BY u, v"),
            "exactly one column")
    _reject(_OK.replace("ORDER BY ts", "ORDER BY ts DESC"),
            "ascending event-time")
    _reject(_OK.replace("PATTERN (A B)", "PATTERN A B"), "parentheses")
    _reject(_OK + " AFTER MATCH SKIP HALFWAY", "AFTER MATCH")
    _reject(_OK + " SUBSET U = A, B", "bad SUBSET")
    _reject(_OK.replace("A AS x = 1", "A x = 1"), "bad DEFINE")
    _reject(_OK + _OK.split("DEFINE")[0].strip().splitlines()[-1], "duplicate")


def test_rejects_wrapper_with_projection():
    _reject(
        "SELECT user_id FROM t MATCH_RECOGNIZE (" + _OK + ")",
        "SELECT \\* FROM",
    )
    _reject(
        "SELECT * FROM t MATCH_RECOGNIZE (" + _OK + ") WHERE x = 1",
        "unexpected text after",
    )


def test_rejects_cross_variable_define(spark):
    ev = _events(spark)
    with pytest.raises(ValueError, match="iter_define"):
        match_recognize_sql(
            ev,
            """
            PARTITION BY user_id ORDER BY ts
            PATTERN (S P)
            DEFINE S AS S.event_type = 'signup',
                   P AS P.value >= 2 * S.value
            """,
            default_within="INTERVAL 1 HOUR",
        )
    with pytest.raises(ValueError, match="LOGICAL navigation"):
        match_recognize_sql(
            ev,
            """
            PARTITION BY user_id ORDER BY ts
            PATTERN (S P)
            DEFINE S AS S.event_type = 'signup',
                   P AS P.value > LAST(P.value)
            """,
            default_within="INTERVAL 1 HOUR",
        )


def test_rejects_payload_measure(spark):
    with pytest.raises(ValueError, match="ORDER BY column"):
        match_recognize_sql(
            _events(spark),
            """
            PARTITION BY user_id ORDER BY ts
            MEASURES S.value AS v
            PATTERN (S P)
            DEFINE S AS S.event_type = 'signup',
                   P AS P.event_type = 'purchase'
            """,
            default_within="INTERVAL 1 HOUR",
        )


def test_rejects_mixed_variable_aggregate(spark):
    with pytest.raises(ValueError, match="one run per aggregate"):
        match_recognize_sql(
            _events(spark),
            """
            PARTITION BY user_id ORDER BY ts
            MEASURES SUM(S.value + P.value) AS v
            PATTERN (S P)
            DEFINE S AS S.event_type = 'signup',
                   P AS P.event_type = 'purchase'
            """,
            default_within="INTERVAL 1 HOUR",
        )


def test_rejects_star_on_non_count(spark):
    with pytest.raises(ValueError, match="only COUNT takes"):
        match_recognize_sql(
            _events(spark),
            """
            PARTITION BY user_id ORDER BY ts
            MEASURES SUM(S.*) AS v
            PATTERN (S P)
            DEFINE S AS S.event_type = 'signup',
                   P AS P.event_type = 'purchase'
            """,
            default_within="INTERVAL 1 HOUR",
        )


def test_stream_text_surface(spark):
    """stream_match_recognize_sql: the same clause parse onto the
    streaming engines — equality with the dict-spec stream twin on a
    bounded replay (the catalog twin stream_match_recognize_sql_text
    also pins it against DuckDB ×3 SFs), plus the stream-only raises."""
    from flink_uba_spark.operators.match_recognize import (
        stream_match_recognize,
    )
    from flink_uba_spark.operators.match_recognize_sql import (
        stream_match_recognize_sql,
    )
    from flink_uba_spark.streaming.runner import run_to_table, stream_events

    text = """
    PARTITION BY user_id ORDER BY ts
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (S C P) WITHIN INTERVAL '12' HOUR
    DEFINE S AS S.event_type = 'signup',
           C AS C.event_type = 'click',
           P AS P.event_type = 'purchase'
    """
    w = {"C": "INTERVAL 6 HOURS", "P": "INTERVAL 24 HOURS"}
    got = run_to_table(
        stream_match_recognize_sql(stream_events(spark, SF), text, withins=w)
    )
    want = run_to_table(
        stream_match_recognize(
            stream_events(spark, SF),
            partition_by="user_id", order_by="ts", pattern="S C P",
            define={
                "S": F.col("event_type") == "signup",
                "C": F.col("event_type") == "click",
                "P": F.col("event_type") == "purchase",
            },
            withins=w, after_match="skip_past_last",
            within_overall="INTERVAL 12 HOURS",
        )
    )
    _assert_frame_equal(got, want)
    # stream-only raises
    ev = stream_events(spark, SF)
    base = """
    PARTITION BY user_id ORDER BY ts {extra}
    PATTERN (S P)
    DEFINE S AS S.event_type = 'signup', P AS P.event_type = 'purchase'
    """
    # round 12: value aggregates stream on quantified runs / SUBSET
    # unions; SUM over a PLAIN variable still raises on BOTH engines
    # (the bound row's columns project directly — no run to aggregate)
    with pytest.raises(ValueError, match="GREEDY-quantified"):
        stream_match_recognize_sql(
            ev,
            base.format(extra="MEASURES SUM(P.value) AS v"),
            default_within="INTERVAL 1 HOUR",
        )
    with pytest.raises(ValueError, match="batch-only"):
        stream_match_recognize_sql(
            ev,
            """
            PARTITION BY user_id ORDER BY ts
            PATTERN (S P)
            DEFINE S AS S.event_type = 'signup',
                   P AS P.value > PREV(value)
            """,
            default_within="INTERVAL 1 HOUR",
        )


def test_rejects_prev_of_other_variable(spark):
    with pytest.raises(ValueError, match="PHYSICAL navigation"):
        match_recognize_sql(
            _events(spark),
            """
            PARTITION BY user_id ORDER BY ts
            PATTERN (S P)
            DEFINE S AS S.event_type = 'signup',
                   P AS P.value > PREV(S.value)
            """,
            default_within="INTERVAL 1 HOUR",
        )
