"""Behavioral analytics: sessions/funnel/retention/DAU oracles, approx
distinct sanity, streaming full-outer reconciliation equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_uba_spark.queries import behavior
from flink_uba_spark.sources.readers import load_testdata
from tests.conftest import assert_matches_oracle


def test_behavior_queries_match_oracle(spark, duck, sf_dir):
    for name, fn in behavior.QUERIES.items():
        if name not in behavior.ORACLES:
            continue  # rows-only queries (approx sketches) have their own gates
        assert_matches_oracle(fn(spark, sf_dir), duck, behavior.ORACLES[name])


def test_approx_count_distinct_within_error(spark, sf_dir):
    """The HLL path (no exact oracle by construction): approximate DAU must
    land within the configured relative error of the exact count."""
    ev = load_testdata(spark, sf_dir, ("events",))["events"]
    row = ev.agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(3, 0.1 * row.exact)


def test_sessionize_gap_boundary(spark):
    """Empirically pinned: an event at exactly last+gap MERGES (inclusive
    boundary); one microsecond past the gap starts a new session. The
    oracle SQL (> gap ⇒ new session) encodes the same rule."""
    from flink_uba_spark.operators.sessions import sessionize

    def sessions(ts3):
        rows = [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:29:59"), (1, ts3)]
        df = spark.createDataFrame(rows, "user_id long, t string").select(
            "user_id", F.col("t").cast("timestamp").alias("ts")
        )
        return len(sessionize(df, gap="30 minutes").collect())

    assert sessions("2024-01-01 00:59:59") == 1  # exactly last+gap → merges
    assert sessions("2024-01-01 00:59:59.000001") == 2  # past the gap → new


def test_stream_reconcile_matches_batch_matched_rows(spark, sf_dir):
    """J2 streaming twin: full-outer stream-stream join with watermarks.
    Matched pairs must equal the batch reconciliation's matched set
    (unmatched rows depend on watermark progress and are checked for
    tag-correctness only)."""
    from flink_uba_spark.queries.uba import tx_reconcile_full_outer
    from flink_uba_spark.streaming.runner import run_to_table, stream_events

    pays = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("pay_id"), "user_id", F.col("ts").alias("pay_ts"))
        .withWatermark("pay_ts", "5 seconds")
    )
    receipts = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("receipt_id"), F.col("user_id").alias("r_user_id"),
                F.col("ts").alias("receipt_ts"))
        .withWatermark("receipt_ts", "5 seconds")
    )
    joined = pays.join(
        receipts,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("receipt_ts") >= F.col("pay_ts") - F.expr("INTERVAL 2 MINUTES"))
        & (F.col("receipt_ts") <= F.col("pay_ts") + F.expr("INTERVAL 2 MINUTES")),
        "full_outer",
    )
    out = run_to_table(joined)
    batch = tx_reconcile_full_outer(spark, sf_dir).toPandas()
    got_matched = {
        (r.pay_id, r.receipt_id)
        for r in out.filter(F.col("pay_id").isNotNull() & F.col("receipt_id").isNotNull()).collect()
    }
    want_matched = {
        (r.pay_id, r.receipt_id)
        for r in batch[batch.status == "matched"][["pay_id", "receipt_id"]].itertuples(index=False)
    }
    assert want_matched, "batch produced no matched pairs — vacuous equivalence"
    assert got_matched == want_matched
    # every batch-unmatched pay that streams out unmatched keeps a null receipt
    stream_unmatched_pays = {
        r.pay_id for r in out.filter(F.col("receipt_id").isNull()).collect()
    }
    batch_unmatched_pays = set(batch[batch.status == "unmatched_left"].pay_id)
    assert stream_unmatched_pays <= batch_unmatched_pays


def test_funnel_single_pass_equals_join_form(spark, sf_dir):
    """The round-2 windowed funnel must equal the naive join-per-step form
    (the round-1 implementation) on the real events table, and plan with
    exactly ONE exchange regardless of step count."""
    import re

    from flink_uba_spark.operators.sessions import funnel
    from flink_uba_spark.sources.readers import load_testdata

    events = load_testdata(spark, sf_dir, ("events",))["events"]
    steps = ("signup", "purchase", "click")

    def join_form(df, key, ts, steps, type_col):
        base = df.select(F.col(key), F.col(ts), F.col(type_col))
        out = base.filter(F.col(type_col) == steps[0]).groupBy(key).agg(F.min(ts).alias("s1"))
        for i, step in enumerate(steps[1:], start=2):
            nxt = (
                base.filter(F.col(type_col) == step)
                .join(out.select(key, f"s{i-1}"), on=key)
                .filter(F.col(ts) > F.col(f"s{i-1}"))
                .groupBy(key)
                .agg(F.min(ts).alias(f"s{i}"))
            )
            out = out.join(nxt, on=key, how="left")
        return out

    got = funnel(events, steps=steps).drop("max_step").toPandas()
    want = join_form(events, "user_id", "ts", steps, "event_type").toPandas()
    assert len(got) > 0, "funnel returned no rows — vacuous equivalence"
    key = sorted(got.columns)
    g = got[key].sort_values(key).reset_index(drop=True)
    w = want[key].sort_values(key).reset_index(drop=True)
    assert g.equals(w)

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = funnel(events, steps=steps)._jdf.queryExecution().explainString(mode)
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1


def test_daily_users_approx_within_rsd(spark, sf_dir):
    """HLL++ estimate stays within ~3 relative standard deviations of the
    exact daily uniques — the raw form; the catalog form folds this bound
    into its output, and its DuckDB oracle asserts approx_ok=TRUE so the
    driver's hash gate verifies the same bound per day."""
    from flink_uba_spark.queries.behavior import daily_users_approx, daily_users_approx_raw

    rows = daily_users_approx_raw(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(3, 0.15 * r.exact_users), r
    flags = daily_users_approx(spark, sf_dir).collect()
    assert len(flags) == len(rows) and all(r.approx_ok for r in flags)


def test_pattern_detect_n2_equals_sequence_detect(spark, sf_dir):
    """Property: the N-step compiler restricted to 2 steps reproduces the
    reference 2-step state machine's anchor rows exactly (payed ↔ matched,
    payed_late ↔ matched_late, timeout ↔ incomplete) — same first-follow
    binding, same equal-ts anchors-first rule."""
    from flink_uba_spark.operators.sequence import pattern_detect, sequence_detect

    events = load_testdata(spark, sf_dir, ("events",))["events"]
    two = (
        sequence_detect(
            events,
            "user_id",
            F.col("event_type") == "signup",
            F.col("event_type") == "purchase",
            within="INTERVAL 6 HOURS",
        )
        .filter(F.col("anchor_id").isNotNull())  # orphan pays: no N-step analogue
        .select("anchor_id", "anchor_ts", "follow_ts", "state")
        .toPandas()
    )
    n2 = (
        pattern_detect(
            events,
            key="user_id",
            steps=[
                (F.col("event_type") == "signup", None),
                (F.col("event_type") == "purchase", "INTERVAL 6 HOURS"),
            ],
        )
        .select(
            "anchor_id",
            F.col("t1").alias("anchor_ts"),
            F.col("t2").alias("follow_ts"),
            F.expr(
                "CASE state WHEN 'matched' THEN 'payed' WHEN 'matched_late' "
                "THEN 'payed_late' ELSE 'timeout' END"
            ).alias("state"),
        )
        .toPandas()
    )
    assert len(two) > 0, "no anchors — vacuous equivalence"
    cols = ["anchor_id", "anchor_ts", "follow_ts", "state"]
    t = two[cols].sort_values("anchor_id").reset_index(drop=True)
    n = n2[cols].sort_values("anchor_id").reset_index(drop=True)
    assert t.equals(n)


def test_pattern_detect_single_exchange(spark, sf_dir):
    """The N-step compile must stay one hash exchange + one sort however
    many steps chain — the property that makes it linear at 100 TB."""
    import re

    from flink_uba_spark.queries.behavior import pattern_view_click_purchase

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = (
        pattern_view_click_purchase(spark, sf_dir)
        ._jdf.queryExecution()
        .explainString(mode)
    )
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Sort", plan, re.M)) == 1
    assert "pythonUDF" not in plan


def test_pattern_detect_kleene_runs(spark):
    """oneOrMore pins: greedy run extension within the gap, the max_reps
    cap truncating both count and hand-off time, gap breaks ending runs,
    and the next step binding after the run's LAST repetition."""
    from flink_uba_spark.operators.sequence import pattern_detect

    M = 60_000_000  # one minute in us

    def ev(rows):
        return spark.createDataFrame(
            [(i, "2024-01-01 00:00:00", t) for i, t in rows], "event_id long, base string, event_type string"
        ).selectExpr(
            "event_id",
            "cast(1 as long) AS user_id",
            "timestampadd(MICROSECOND, event_id * 300000000, cast(base as timestamp)) AS ts",  # 5 min apart
            "event_type",
        )

    steps = [
        (F.col("event_type") == "signup", None),
        (F.col("event_type") == "error", "INTERVAL 30 MINUTES", 5),
        (F.col("event_type") == "purchase", "INTERVAL 2 HOURS"),
    ]

    # run of 3 errors 5 min apart, purchase after: matched, n2=3
    out = pattern_detect(
        ev([(0, "signup"), (1, "error"), (2, "error"), (3, "error"), (4, "purchase")]),
        key="user_id", steps=steps,
    ).collect()
    assert len(out) == 1 and out[0].state == "matched" and out[0].n2 == 3
    assert out[0].t2_last > out[0].t2 and out[0].t3 > out[0].t2_last

    # 7-error burst with cap 5: n2=5, t3 binds after the 5th error — the
    # purchase BEFORE the 5th error (id 4) must not match; the one after
    # (id 8) does
    rows = [(0, "signup")] + [(i, "error") for i in (1, 2, 3, 4)] + [(5, "purchase")] + [
        (i, "error") for i in (6, 7, 8)
    ] + [(9, "purchase")]
    out = pattern_detect(ev(rows), key="user_id", steps=steps).collect()
    assert len(out) == 1 and out[0].n2 == 5
    # 5th error is id 7 (errors: 1,2,3,4,6 → wait ids 1,2,3,4 then 6,7,8;
    # cap-5 run = ids 1,2,3,4,6) → t2_last = ts of id 6; first purchase at
    # ts >= that is id 9
    assert out[0].t2_last.minute == 30  # id 6 → 30 min
    assert out[0].t3.minute == 45  # id 9 → 45 min
    assert out[0].state == "matched"

    # gap > 30 min breaks the run: errors at 0h05 and 8h (ids 1, 96):
    # run = just the first error; purchase binds after it
    out = pattern_detect(
        ev([(0, "signup"), (1, "error"), (96, "error"), (97, "purchase")]),
        key="user_id", steps=steps,
    ).collect()
    assert len(out) == 1 and out[0].n2 == 1 and out[0].t2_last == out[0].t2
    # purchase at id 97 = 8h05 is > 2h after t2_last (0h05) → matched_late
    assert out[0].state == "matched_late"
