"""Behavioral analytics catalog: sessionization, funnels, retention cohorts
(operators/sessions.py) — the "Structured Streaming + sessionization"
north-star surface over the events stream."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_uba_spark.operators.sessions import funnel, retention_cohorts, sessionize
from flink_uba_spark.sources.readers import load_testdata


def _events(spark, sf_dir):
    return load_testdata(spark, sf_dir, ("events",))["events"]


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min) per user via native session_window."""
    return sessionize(_events(spark, sf_dir), key="user_id", gap="30 minutes")


USER_SESSIONS_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end_event,
       count(*) AS n_events
FROM sess
GROUP BY user_id, sid
"""


def user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup → purchase → click funnel per user."""
    return funnel(_events(spark, sf_dir), steps=("signup", "purchase", "click"))


USER_FUNNEL_ORACLE = """
WITH s1 AS (
    SELECT user_id, min(ts) AS s1 FROM events WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS s2
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.s1
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS s3
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.s2
    WHERE e.event_type = 'click' GROUP BY e.user_id
)
SELECT s1.user_id, s1.s1, s2.s2, s3.s3,
       CAST(1 + CASE WHEN s2.s2 IS NULL THEN 0 ELSE 1 END
              + CASE WHEN s3.s3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS max_step
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


def user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over all events."""
    return retention_cohorts(_events(spark, sf_dir), period_days=7)


USER_RETENTION_ORACLE = """
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
SELECT make_timestamp((epoch_us(first_ts) // 604800000000) * 604800000000) AS cohort_period,
       (epoch_us(e.ts) - epoch_us(first_ts)) // 604800000000 AS period_offset,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU per day + per-type event volume. (The HLL approximate
    form — approx_count_distinct — is exercised in tests; it has no exact
    oracle by construction.)"""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("DAY", "ts").alias("day"))
        .agg(
            F.count_distinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).cast("long").alias("n_purchases"),
        )
    )


DAILY_ACTIVE_USERS_ORACLE = """
SELECT date_trunc('day', ts) AS day,
       count(DISTINCT user_id) AS dau,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
FROM events
GROUP BY 1
"""


def hourly_event_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window volume per event type (the slide=None path of
    windowed_counts — W1's tumbling sibling)."""
    from flink_uba_spark.operators.topn import windowed_counts

    ev = _events(spark, sf_dir)
    return windowed_counts(
        ev, "event_type", ts="ts", size="1 hour", slide=None, key_alias="event_type"
    )


HOURLY_VOLUME_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type, count(*) AS cnt
FROM events
GROUP BY 1, 2, 3
"""


def cumulate_event_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE windowing TVF (the reference SQL family's
    ``CUMULATE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR,
    INTERVAL '6' HOUR)``, Flink 1.13+): per event type, expanding
    counts inside epoch-aligned 6 h buckets — each bucket emits its
    1 h, 2 h, …, 6 h running totals (the daily-dashboard early-fire
    shape). Compile: operators/topn.py cumulate_counts — one JVM-side
    explode(sequence) (fan-out 6, the HOP expansion strategy) + one
    partial+final hash aggregate; no state, no Python."""
    from flink_uba_spark.operators.topn import cumulate_counts

    ev = _events(spark, sf_dir)
    return cumulate_counts(
        ev, "event_type", ts="ts", step="1 hour", max_size="6 hours",
        key_alias="event_type",
    )


CUMULATE_VOLUME_ORACLE = """
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) // 21600000000) * 21600000000 AS start_us,
         epoch_us(ts) - (epoch_us(ts) // 21600000000) * 21600000000 AS off_us
  FROM events
),
x AS (
  SELECT event_type, start_us, k
  FROM e, UNNEST(generate_series(CAST(off_us // 3600000000 AS BIGINT) + 1, 6)) AS t(k)
)
SELECT make_timestamp(start_us) AS window_start,
       make_timestamp(start_us + k * 3600000000) AS window_end,
       event_type, count(*) AS cnt
FROM x
GROUP BY 1, 2, 3
"""


def daily_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per day, one count column per event type. Spark's
    ``groupBy().pivot(values=...)`` with explicit values compiles to the
    same single-exchange conditional aggregate the oracle spells out —
    listing the values keeps the plan one-pass (omitting them adds a
    distinct-scan job to discover them)."""
    ev = _events(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves nulls where a (day, type) pair never occurred — a count
    # should read 0 there
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types]
    )


DAILY_EVENT_TYPE_PIVOT_ORACLE = """
SELECT date_trunc('day', ts) AS day,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY 1
"""


def rolling_7d_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window frame: per day, the purchase value summed over that
    day and the 6 before it (RANGE frame over day epochs, cents-exact).
    One exchange; days without purchases are absent (matching the oracle),
    and the frame is a true RANGE — calendar gaps shrink the window, they
    don't slide over them."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = (
        ev.select(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400)
            .cast("long")
            .alias("day_no"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("day_no")
        .agg(F.sum("cents").alias("day_cents"))
    )
    w = Window.orderBy("day_no").rangeBetween(-6, 0)
    return daily.select(
        F.timestamp_seconds(F.col("day_no") * 86400).alias("day"),
        "day_cents",
        F.sum("day_cents").over(w).alias("rolling_7d_cents"),
    )


ROLLING_7D_ORACLE = """
WITH daily AS (
    SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day_no,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT make_timestamp(day_no * 86400 * 1000000) AS day, day_cents,
       CAST(sum(day_cents) OVER (ORDER BY day_no RANGE BETWEEN 6 PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS rolling_7d_cents
FROM daily
"""


def user_sessions_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessions: error events hold the session open 5 minutes,
    everything else 30 — session_window with a per-event gap expression.
    Each event claims [ts, ts+gap]; overlapping claims merge (inclusive at
    the exact boundary, same as the fixed-gap rule pinned in
    tests/test_behavior.py)."""
    from flink_uba_spark.operators.sessions import sessionize_dynamic

    ev = _events(spark, sf_dir)
    # session_window's gap expression must be CalendarIntervalType;
    # make_interval produces it (ANSI INTERVAL literals are DayTimeInterval)
    gap = F.when(
        F.col("event_type") == "error", F.expr("make_interval(0,0,0,0,0,5,0)")
    ).otherwise(F.expr("make_interval(0,0,0,0,0,30,0)"))
    return sessionize_dynamic(ev, gap)


USER_SESSIONS_DYNAMIC_GAP_ORACLE = """
WITH g AS (
    SELECT user_id, ts,
           epoch_us(ts)
             + CASE WHEN event_type = 'error' THEN 300 ELSE 1800 END * 1000000
               AS claim_end
    FROM events
), o AS (
    SELECT user_id, ts, claim_end,
           max(claim_end) OVER (PARTITION BY user_id ORDER BY ts, claim_end
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
    FROM g
), f AS (
    SELECT *, CASE WHEN prev_max IS NULL OR epoch_us(ts) > prev_max
                   THEN 1 ELSE 0 END AS new_s
    FROM o
), s AS (
    SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, claim_end
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM f
)
SELECT user_id, min(ts) AS session_start,
       make_timestamp(max(claim_end)) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def daily_users_approx_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ daily uniques next to the exact count — the production
    form (returns the raw estimate). At 100 TB this is the DAU you actually
    run: the sketch shrinks the per-day exchange from user-id sets to
    ~kilobyte registers."""
    ev = _events(spark, sf_dir)
    return (
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
        .groupBy("day")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
    )


def daily_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog form of the HLL++ DAU with the error bound folded INTO the
    output: the raw sketch estimate is engine-specific (no cross-engine
    hash can match it), so the verifiable contract is the bound itself —
    ``approx_ok`` is true iff |approx − exact| ≤ max(3, 3·rsd·exact) per
    day (3 relative standard deviations, small-count floor). The DuckDB
    oracle asserts exact_users and ``approx_ok = TRUE`` row-by-row, so the
    driver's hash gate now verifies the estimator's error bound instead of
    recording a rows-only check. Raw-estimate form: daily_users_approx_raw."""
    raw = daily_users_approx_raw(spark, sf_dir)
    bound = F.greatest(F.lit(3.0), F.lit(3 * 0.05) * F.col("exact_users"))
    return raw.select(
        "day",
        "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users")) <= bound).alias("approx_ok"),
    )


DAILY_USERS_APPROX_ORACLE = """
SELECT date_trunc('day', ts) AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS approx_ok
FROM events
GROUP BY 1
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts between consecutive events of the same user
    within a 30-minute gap — the "what do users do NEXT" path analysis of a
    UBA suite (the reference's page-view domain, HotPages.java, asks the
    aggregate form of the same question).

    Plan: one lag window keyed on user_id (high-cardinality, skew-free) →
    gap filter → (src,dst) count with map-side partial agg. Two exchanges
    total at any scale; the second carries ≤ |event_type|² rows."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("src"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return (
        o.filter(
            F.col("src").isNotNull()
            & (F.col("ts") <= F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES"))
        )
        .groupBy(F.col("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


EVENT_TRANSITION_ORACLE = """
WITH o AS (
    SELECT user_id, event_type, ts,
           lag(event_type) OVER w AS src,
           lag(ts)        OVER w AS prev_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT src, event_type AS dst, count(*) AS cnt
FROM o
WHERE src IS NOT NULL AND ts <= prev_ts + INTERVAL 30 MINUTE
GROUP BY src, dst
"""


def daily_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-count anomaly flags per event type: a day is anomalous
    when its count deviates from the type's mean by more than 2 population
    standard deviations — computed ENTIRELY in integer/decimal arithmetic
    so both engines agree exactly:

        z² > k²  ⇔  (c·n − Σc)² > k²·(n·Σc² − (Σc)²)        (k = 2)

    No sqrt, no float mean/stddev (whose engine-specific summation order
    would drift at the flag boundary). DECIMAL(38,0) keeps the squares
    exact even at 100 TB daily counts (~1e12 → squares ~1e29, past BIGINT).
    Plan: one daily rollup exchange; the stats window runs over the
    days-sized aggregate, not the corpus."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type")
    c = F.col("cnt").cast("decimal(38,0)")
    n = F.count(F.lit(1)).over(w).cast("decimal(38,0)")
    s1 = F.sum("cnt").over(w).cast("decimal(38,0)")
    s2 = F.sum(c * F.col("cnt")).over(w).cast("decimal(38,0)")
    lhs = (c * n - s1) * (c * n - s1)
    rhs = F.lit(4) * (n * s2 - s1 * s1)
    return daily.select(
        "event_type", "day", "cnt", (lhs > rhs).alias("is_anomaly")
    )


DAILY_ANOMALY_ORACLE = """
WITH d AS (
    SELECT event_type, date_trunc('day', ts) AS day, count(*) AS cnt
    FROM events GROUP BY 1, 2
),
s AS (
    SELECT event_type, day, cnt,
           CAST(count(*) OVER w AS DECIMAL(38,0)) AS n,
           CAST(sum(cnt) OVER w AS DECIMAL(38,0)) AS s1,
           CAST(sum(CAST(cnt AS DECIMAL(38,0)) * cnt) OVER w AS DECIMAL(38,0)) AS s2
    FROM d WINDOW w AS (PARTITION BY event_type)
)
SELECT event_type, day, cnt,
       (CAST(cnt AS DECIMAL(38,0))*n - s1)*(CAST(cnt AS DECIMAL(38,0))*n - s1)
           > 4*(n*s2 - s1*s1) AS is_anomaly
FROM s
"""


def pattern_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step CEP chain per anchor: view → click (within 30 min) → purchase
    (within 2 h), the N-step generalization of the reference's 2-step
    ``Pattern.begin("create").followedBy("pay").within(...)`` chain
    (OrderPayTimeout.java:52-64 — the Pattern API chains arbitrarily; this
    exercises the 3-deep form the reference never needed).

    Plan: operators/sequence.py pattern_detect — two min-of-struct windows
    sharing ONE hash exchange + sort on user_id; no joins, linear per key.
    """
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir)
    return pattern_detect(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "view", None),
            (F.col("event_type") == "click", "INTERVAL 30 MINUTES"),
            (F.col("event_type") == "purchase", "INTERVAL 2 HOURS"),
        ],
    )


PATTERN_VCP_ORACLE = """
WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
s2 AS (
  SELECT v.user_id, v.event_id AS anchor_id, v.ts AS t1,
         (SELECT min(c.ts) FROM c WHERE c.user_id = v.user_id AND c.ts >= v.ts) AS t2
  FROM v
),
s3 AS (
  SELECT s2.*,
         (SELECT min(p.ts) FROM p WHERE p.user_id = s2.user_id AND p.ts >= s2.t2) AS t3
  FROM s2
)
SELECT user_id, anchor_id, t1, t2, t3,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN t3 IS NULL THEN 'incomplete'
            WHEN t2 <= t1 + INTERVAL 30 MINUTE AND t3 <= t2 + INTERVAL 2 HOUR
              THEN 'matched'
            ELSE 'matched_late' END AS state
FROM s3
"""


def pattern_error_burst_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleene CEP chain: signup → error.oneOrMore (each repetition within
    30 min of the previous, capped at 5) → purchase within 2 h of the LAST
    error — the bounded ``oneOrMore()`` family of the reference Pattern API
    (OrderPayTimeout.java:52-64 chains; oneOrMore is the natural next
    surface), compiled by operators/sequence.py pattern_detect.

    Output per signup anchor: t2/t2_last/n2 describe the greedy error run,
    t3 the recovery purchase after the run ends."""
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir)
    return pattern_detect(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "signup", None),
            (F.col("event_type") == "error", "INTERVAL 30 MINUTES", 5),
            (F.col("event_type") == "purchase", "INTERVAL 2 HOURS"),
        ],
    )


PATTERN_ERROR_BURST_ORACLE = """
WITH err AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
  FROM events WHERE event_type = 'error'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM err
),
runs AS (
  SELECT user_id, event_id, ts,
         COALESCE(lead(ts, 4) OVER ws, max(ts) OVER wf) AS run_last,
         LEAST(5, count(*) OVER wf - row_number() OVER ws + 1) AS n_reps
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id),
         wf AS (PARTITION BY user_id, sid)
),
a AS (SELECT user_id, event_id AS anchor_id, ts AS t1 FROM events WHERE event_type = 'signup'),
a2 AS (
  SELECT a.*,
    (SELECT r.ts FROM runs r WHERE r.user_id = a.user_id AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2,
    (SELECT r.run_last FROM runs r WHERE r.user_id = a.user_id AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2_last,
    (SELECT r.n_reps FROM runs r WHERE r.user_id = a.user_id AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS n2
  FROM a
),
a3 AS (
  SELECT a2.*,
    (SELECT min(p.ts) FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = a2.user_id
       AND p.ts >= a2.t2_last) AS t3
  FROM a2
)
SELECT user_id, anchor_id, t1, t2, t2_last, CAST(n2 AS BIGINT) AS n2, t3,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN t3 IS NULL THEN 'incomplete'
            WHEN t2 <= t1 + INTERVAL 30 MINUTE AND t3 <= t2_last + INTERVAL 2 HOUR
              THEN 'matched'
            ELSE 'matched_late' END AS state
FROM a3
"""


def item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item importance by weighted PageRank over the co-view transition
    graph — the ranking that survives popularity laundering, vs the raw
    counts the reference's HotItem ranks by (HotItem.java:26-73; same
    domain, the graph-global question). Edges: consecutive view-item pairs
    per user within a 6-hour gap (event_transition_matrix's recurrence,
    item-granular); 10 synchronous iterations in pure BIGINT arithmetic
    (operators/graph.py) so the DuckDB oracle — the same recurrence
    unrolled as 10 chained CTEs — hash-matches bit-for-bit."""
    from flink_uba_spark.operators.graph import coview_edges, pagerank

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "view")
    edges = coview_edges(
        ev, F.get_json_object("props", "$.k").cast("long"), gap="INTERVAL 6 HOURS"
    )
    return pagerank(edges).select(F.col("node").alias("item_id"), "score")


def _item_pagerank_oracle(iters: int = 10) -> str:
    step = """, s{nxt} AS (
  SELECT e.dst AS item_id,
         CAST(150000 + (850 * sum(e.w * (p.score // COALESCE(o.ow, 1)))) // 1000 AS BIGINT) AS score
  FROM s{cur} p JOIN e_aug e ON e.src = p.item_id
  LEFT JOIN outw o ON o.src = p.item_id
  GROUP BY 1)"""
    steps = "".join(step.format(cur=i, nxt=i + 1) for i in range(iters))
    return f"""
WITH v AS (
  SELECT user_id, event_id, ts,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT item, lag(item) OVER w AS prev_item, ts, lag(ts) OVER w AS prev_ts
  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
edges AS (
  SELECT prev_item AS src, item AS dst, count(*) AS w FROM p
  WHERE prev_item IS NOT NULL AND ts <= prev_ts + INTERVAL 6 HOUR
    AND prev_item != item
  GROUP BY 1, 2
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
e_aug AS (SELECT src, dst, w FROM edges
          UNION ALL SELECT node, node, 0 FROM nodes),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
s0 AS (SELECT node AS item_id, CAST(1000000 AS BIGINT) AS score FROM nodes){steps}
SELECT item_id, score FROM s{iters}
"""


ITEM_PAGERANK_ORACLE = _item_pagerank_oracle()


def pattern_signup_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-step CEP chain with a MID-CHAIN bounded Kleene: signup → view
    (within 1 h) → error.oneOrMore (6 h rep gap, capped at 3) → purchase
    within 12 h of the LAST error — the arbitrary-position ``oneOrMore``
    chaining of the reference Pattern API
    (Pattern.begin/followedBy/oneOrMore, OrderPayTimeout.java:52-64),
    compiled by operators/sequence.py pattern_detect. Round 5: proves the
    compiler's Kleene support at positions other than the canonical
    second step (pattern_error_burst_recovery's shape)."""
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir)
    return pattern_detect(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "signup", None),
            (F.col("event_type") == "view", "INTERVAL 1 HOUR"),
            (F.col("event_type") == "error", "INTERVAL 6 HOURS", 3),
            (F.col("event_type") == "purchase", "INTERVAL 12 HOURS"),
        ],
    )


PATTERN_SIGNUP_JOURNEY_ORACLE = """
WITH err AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 6 HOUR THEN 1 ELSE 0 END AS ns
  FROM events WHERE event_type = 'error'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM err
),
runs AS (
  SELECT user_id, event_id, ts,
         COALESCE(lead(ts, 2) OVER ws, max(ts) OVER wf) AS run_last,
         LEAST(3, count(*) OVER wf - row_number() OVER ws + 1) AS n_reps
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id),
         wf AS (PARTITION BY user_id, sid)
),
a AS (SELECT user_id, event_id AS anchor_id, ts AS t1 FROM events WHERE event_type = 'signup'),
a2 AS (
  SELECT a.*,
    (SELECT v.ts FROM events v
     WHERE v.event_type = 'view' AND v.user_id = a.user_id AND v.ts >= a.t1
     ORDER BY v.ts, v.event_id LIMIT 1) AS t2
  FROM a
),
a3 AS (
  SELECT a2.*,
    (SELECT r.ts FROM runs r WHERE r.user_id = a2.user_id AND r.ts >= a2.t2
     ORDER BY r.ts, r.event_id LIMIT 1) AS t3,
    (SELECT r.run_last FROM runs r WHERE r.user_id = a2.user_id AND r.ts >= a2.t2
     ORDER BY r.ts, r.event_id LIMIT 1) AS t3_last,
    (SELECT r.n_reps FROM runs r WHERE r.user_id = a2.user_id AND r.ts >= a2.t2
     ORDER BY r.ts, r.event_id LIMIT 1) AS n3
  FROM a2
),
a4 AS (
  SELECT a3.*,
    (SELECT min(p.ts) FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = a3.user_id
       AND p.ts >= a3.t3_last) AS t4
  FROM a3
)
SELECT user_id, anchor_id, t1, t2, t3, t3_last, CAST(n3 AS BIGINT) AS n3, t4,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t4 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN t4 IS NULL THEN 'incomplete'
            WHEN t2 <= t1 + INTERVAL 1 HOUR
             AND t3 <= t2 + INTERVAL 6 HOUR
             AND t4 <= t3_last + INTERVAL 12 HOUR
              THEN 'matched'
            ELSE 'matched_late' END AS state
FROM a4
"""


def pattern_error_streak_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """times(from, to) CEP chain: signup → error.times(2, 4) (each
    repetition within 6 h of the previous) → purchase within 12 h of the
    LAST error — the reference Pattern API's exact-repetition surface
    (``Pattern.times(from, to)``), round 5. An error run shorter than 2 is
    NOT a valid binding: the anchor skips it and binds the next streak of
    ≥ 2 (skip-till-next-match through invalid entries), so this detects
    users who recovered after a real error STREAK, not a single blip."""
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir)
    return pattern_detect(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "signup", None),
            (F.col("event_type") == "error", "INTERVAL 6 HOURS", (2, 4)),
            (F.col("event_type") == "purchase", "INTERVAL 12 HOURS"),
        ],
    )


PATTERN_ERROR_STREAK_ORACLE = """
WITH err AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 6 HOUR THEN 1 ELSE 0 END AS ns
  FROM events WHERE event_type = 'error'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM err
),
runs AS (
  SELECT user_id, event_id, ts,
         COALESCE(lead(ts, 3) OVER ws, max(ts) OVER wf) AS run_last,
         LEAST(4, count(*) OVER wf - row_number() OVER ws + 1) AS n_reps,
         count(*) OVER wf - row_number() OVER ws + 1 AS avail
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id),
         wf AS (PARTITION BY user_id, sid)
),
vruns AS (SELECT * FROM runs WHERE avail >= 2),
a AS (SELECT user_id, event_id AS anchor_id, ts AS t1 FROM events WHERE event_type = 'signup'),
a2 AS (
  SELECT a.*,
    (SELECT r.ts FROM vruns r WHERE r.user_id = a.user_id AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2,
    (SELECT r.run_last FROM vruns r WHERE r.user_id = a.user_id AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2_last,
    (SELECT r.n_reps FROM vruns r WHERE r.user_id = a.user_id AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS n2
  FROM a
),
a3 AS (
  SELECT a2.*,
    (SELECT min(p.ts) FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = a2.user_id
       AND p.ts >= a2.t2_last) AS t3
  FROM a2
)
SELECT user_id, anchor_id, t1, t2, t2_last, CAST(n2 AS BIGINT) AS n2, t3,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN t3 IS NULL THEN 'incomplete'
            WHEN t2 <= t1 + INTERVAL 6 HOUR AND t3 <= t2_last + INTERVAL 12 HOUR
              THEN 'matched'
            ELSE 'matched_late' END AS state
FROM a3
"""


def pattern_optional_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """optional() CEP chain: view → click? (optional, within 30 min when
    taken) → purchase (within 2 h of the click if taken, else of the
    view) — the reference Pattern API's ``optional()`` combinator, round
    5, under this engine's single-match greedy-race semantics: the
    optional step binds iff its earliest candidate precedes the earliest
    purchase candidate in (ts, rank, id) order, else the chain skips it
    (t2 null, not counted in max_step). Flink's optional() branches into
    BOTH matches; the one-row-per-anchor output model here takes the
    greedy branch and documents the divergence."""
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir)
    return pattern_detect(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "view", None),
            (F.col("event_type") == "click", "INTERVAL 30 MINUTES"),
            (F.col("event_type") == "purchase", "INTERVAL 2 HOURS"),
        ],
        optional={2},
    )


PATTERN_OPTIONAL_CLICK_ORACLE = """
WITH a AS (SELECT user_id, event_id AS anchor_id, ts AS t1 FROM events WHERE event_type = 'view'),
a2 AS (
  SELECT a.*,
    (SELECT c.ts FROM events c
     WHERE c.event_type = 'click' AND c.user_id = a.user_id AND c.ts >= a.t1
     ORDER BY c.ts, c.event_id LIMIT 1) AS cand2,
    (SELECT p.ts FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = a.user_id AND p.ts >= a.t1
     ORDER BY p.ts, p.event_id LIMIT 1) AS cand3
  FROM a
),
a3 AS (
  -- greedy race: take the click iff it precedes the purchase candidate;
  -- at equal timestamps the click (earlier step rank) sorts first
  SELECT a2.*,
    CASE WHEN cand2 IS NOT NULL AND (cand3 IS NULL OR cand2 <= cand3)
         THEN cand2 END AS t2
  FROM a2
),
a4 AS (
  SELECT a3.*,
    CASE WHEN t2 IS NOT NULL THEN
      (SELECT min(p.ts) FROM events p
       WHERE p.event_type = 'purchase' AND p.user_id = a3.user_id
         AND p.ts >= a3.t2)
    ELSE cand3 END AS t3
  FROM a3
)
SELECT user_id, anchor_id, t1, t2, t3,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN t3 IS NULL THEN 'incomplete'
            WHEN (t2 IS NULL OR t2 <= t1 + INTERVAL 30 MINUTE)
             AND t3 <= COALESCE(t2, t1) + INTERVAL 2 HOUR
              THEN 'matched'
            ELSE 'matched_late' END AS state
FROM a4
"""


def pattern_optional_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink-faithful MULTI-MATCH optional(): view → click? → purchase
    emitting BOTH branches per anchor — the taken chain (view → click
    within 30 min → purchase within 2 h) AND the skipped chain (view →
    purchase within 2 h) — exactly as the reference's branching NFA
    (Pattern.optional()). Closes the single-match divergence the greedy
    `pattern_optional_click_purchase` documents; `skipped` names the
    branch. operators/sequence.py:pattern_detect_branching — one compiled
    plan per optional subset, unioned."""
    from flink_uba_spark.operators.sequence import pattern_detect_branching

    ev = _events(spark, sf_dir)
    return pattern_detect_branching(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "view", None),
            (F.col("event_type") == "click", "INTERVAL 30 MINUTES"),
            (F.col("event_type") == "purchase", "INTERVAL 2 HOURS"),
        ],
        optional={2},
    )


PATTERN_OPTIONAL_BRANCHING_ORACLE = """
WITH a AS (SELECT user_id, event_id AS anchor_id, ts AS t1 FROM events WHERE event_type = 'view'),
taken AS (
  SELECT a.*,
    (SELECT c.ts FROM events c
     WHERE c.event_type = 'click' AND c.user_id = a.user_id AND c.ts >= a.t1
     ORDER BY c.ts, c.event_id LIMIT 1) AS t2
  FROM a
),
taken2 AS (
  SELECT taken.*,
    (SELECT min(p.ts) FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = taken.user_id
       AND p.ts >= taken.t2) AS t3
  FROM taken
),
skipped2 AS (
  SELECT a.*,
    (SELECT min(p.ts) FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = a.user_id
       AND p.ts >= a.t1) AS t3
  FROM a
)
SELECT user_id, anchor_id, t1, t2, t3,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN t3 IS NULL THEN 'incomplete'
            WHEN t2 <= t1 + INTERVAL 30 MINUTE AND t3 <= t2 + INTERVAL 2 HOUR
              THEN 'matched'
            ELSE 'matched_late' END AS state,
       'none' AS skipped
FROM taken2
UNION ALL
SELECT user_id, anchor_id, t1, CAST(NULL AS TIMESTAMP) AS t2, t3,
       CAST(1 + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN t3 IS NULL THEN 'incomplete'
            WHEN t3 <= t1 + INTERVAL 2 HOUR THEN 'matched'
            ELSE 'matched_late' END AS state,
       '2' AS skipped
FROM skipped2
"""


def pattern_purchase_no_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP chain with a NEGATIVE pattern: view → click (within 30 min) →
    purchase (within 2 h) with ``notFollowedBy(error)`` between click and
    purchase — the reference Pattern API's negative-pattern surface
    (Pattern.notFollowedBy; OrderPayTimeout.java:52-64 chains), round 5.
    An error landing between the bound click and the purchase binder (or
    after the click while no purchase ever arrives) KILLS the match; the
    batch form keeps the anchor row with state='negated' for
    auditability (the streaming twin emits nothing for it)."""
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir)
    return pattern_detect(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "view", None),
            (F.col("event_type") == "click", "INTERVAL 30 MINUTES"),
            (F.col("event_type") == "purchase", "INTERVAL 2 HOURS"),
        ],
        not_followed_by={2: F.col("event_type") == "error"},
    )


PATTERN_PURCHASE_NO_ERROR_ORACLE = """
WITH a AS (SELECT user_id, event_id AS anchor_id, ts AS t1 FROM events WHERE event_type = 'view'),
a2 AS (
  SELECT a.*,
    (SELECT c.ts FROM events c
     WHERE c.event_type = 'click' AND c.user_id = a.user_id AND c.ts >= a.t1
     ORDER BY c.ts, c.event_id LIMIT 1) AS t2
  FROM a
),
a3 AS (
  SELECT a2.*,
    (SELECT min(p.ts) FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = a2.user_id
       AND p.ts >= a2.t2) AS t3
  FROM a2
),
a4 AS (
  -- notFollowedBy(error) between click and purchase: slot order puts the
  -- guard after click and before purchase at equal timestamps, so both
  -- boundaries are inclusive; with no purchase ever bound, any error
  -- after the click kills the pending match
  SELECT a3.*,
    EXISTS (SELECT 1 FROM events e
            WHERE e.event_type = 'error' AND e.user_id = a3.user_id
              AND a3.t2 IS NOT NULL AND e.ts >= a3.t2
              AND (a3.t3 IS NULL OR e.ts <= a3.t3)) AS killed
  FROM a3
)
SELECT user_id, anchor_id, t1, t2, t3,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN killed THEN 'negated'
            WHEN t3 IS NULL THEN 'incomplete'
            WHEN t2 <= t1 + INTERVAL 30 MINUTE AND t3 <= t2 + INTERVAL 2 HOUR
              THEN 'matched'
            ELSE 'matched_late' END AS state
FROM a4
"""


def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order user-journey paths (round 7): counts of length-3
    consecutive event-type sequences per user timeline — the sankey /
    path-analysis table that generalizes event_transition_matrix's
    first-order transitions (and the behavioral sibling of the corpus
    bigram miners). Timeline order is the engine family's (ts, event_id).

    Plan: ONE key exchange + sort for the two lead() windows, then a
    path-sized hash aggregate (|event_types|^3 groups at most) — linear,
    no joins."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_paths"))


EVENT_PATH_TRIGRAMS_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
       count(*) AS n_paths
FROM ordered WHERE e3 IS NOT NULL
GROUP BY 1
"""


def time_to_convert_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution (round 7): per user, the time from
    FIRST signup to the first purchase after it, bucketed in whole hours
    — the funnel-latency histogram a growth dashboard plots next to
    user_funnel's step counts. Integer buckets (floor of the second
    delta / 3600) keep the hash gate exact; users who never convert are
    excluded (they belong to user_funnel's drop-off columns).

    Plan: one (user) aggregate for the first signup, one min-filtered
    aggregate for the first purchase after it (per-user scalars — no
    fan-out), then a bucket-sized hash aggregate. Linear, two exchanges.
    """
    ev = _events(spark, sf_dir)
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    first_purchase = (
        purchases.join(first_signup, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"), F.first("signup_ts").alias("signup_ts"))
    )
    return (
        first_purchase.withColumn(
            "hours_bucket",
            F.expr(
                "(unix_micros(purchase_ts) - unix_micros(signup_ts)) "
                "div 3600000000"
            ),
        )
        .groupBy("hours_bucket")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


TIME_TO_CONVERT_ORACLE = """
WITH fs AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
fp AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts, min(fs.signup_ts) AS signup_ts
  FROM events e JOIN fs ON e.user_id = fs.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= fs.signup_ts
  GROUP BY 1
)
SELECT CAST((epoch_us(purchase_ts) - epoch_us(signup_ts)) // 3600000000
         AS BIGINT) AS hours_bucket,
       count(*) AS n_users
FROM fp GROUP BY 1
"""


def pattern_uncapped_error_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNCAPPED oneOrMore CEP chain (round 6): per event SHARD
    (user_id % 8 — the load-sharded system-monitoring keying, where
    error cascades are a shard property, not a user property), detect
    signup → error.oneOrMore(30 min repetition gap, NO cap) → purchase
    within 2 h of the cascade's LAST error — the reference Pattern API's
    plain ``oneOrMore()`` (no ``.times()`` bound), which Flink's NFA runs
    unbounded. Shard-keyed so runs are genuinely long (up to 63 reps at
    sf0.1 — no fixed cap reproduces this). Safe at scale because the
    repetition GAP is what bounds everything: the batch compile keeps no
    per-rep state (the run is the whole within-gap session —
    operators/sequence.py pattern_detect with max_reps=float('inf')), and
    the streaming twin's per-run state is one fixed-width frontier plus
    the gap-horizon buffer."""
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir).withColumn("shard", F.col("user_id") % 8)
    return pattern_detect(
        ev,
        key="shard",
        steps=[
            (F.col("event_type") == "signup", None),
            (F.col("event_type") == "error", "INTERVAL 30 MINUTES", float("inf")),
            (F.col("event_type") == "purchase", "INTERVAL 2 HOURS"),
        ],
    )


def pattern_error_run_until_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``oneOrMore().until(...)`` (round 7 — the stop-condition
    combinator, completing the Kleene surface): per shard, signup →
    error.oneOrMore(30 min gap, UNCAPPED).until(purchase) → click within
    2 h of the cascade's last error. The first purchase on the shard
    STOPS the error run — Flink's ``until`` ends the looping state even
    though later errors are still inside the repetition gap — so the
    cascade measured is "errors until service recovered", not the whole
    gap session.

    Compile: operators/sequence.py pattern_detect ``until={2: ...}`` —
    the stop rows refine the Kleene gap-sessions (a run never spans a
    purchase in the (ts, id) run order); caps, min_reps and the
    run-last handoff apply to the refined runs unchanged. Verified by
    the extended brute (untils slots) riding the 10k batch soak."""
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir).withColumn("shard", F.col("user_id") % 8)
    return pattern_detect(
        ev,
        key="shard",
        steps=[
            (F.col("event_type") == "signup", None),
            (F.col("event_type") == "error", "INTERVAL 30 MINUTES", float("inf")),
            (F.col("event_type") == "click", "INTERVAL 2 HOURS"),
        ],
        until={2: F.col("event_type") == "purchase"},
    )


# the uncapped oracle with purchase-refined sessions: a run breaks on the
# 30-min gap OR on an intervening purchase (ucnt = purchases strictly
# before the error in the shard's (ts, id) order)
PATTERN_ERROR_RUN_UNTIL_ORACLE = """
WITH err AS (
  SELECT e.user_id % 8 AS shard, e.event_id, e.ts,
         (SELECT count(*) FROM events u
           WHERE u.event_type = 'purchase' AND u.user_id % 8 = e.user_id % 8
             AND (u.ts, u.event_id) < (e.ts, e.event_id)) AS ucnt
  FROM events e WHERE e.event_type = 'error'
),
flagged AS (
  SELECT shard, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                OR ucnt != lag(ucnt) OVER w THEN 1 ELSE 0 END AS ns
  FROM err
  WINDOW w AS (PARTITION BY shard ORDER BY ts, event_id)
),
sess AS (
  SELECT shard, event_id, ts,
         sum(ns) OVER (PARTITION BY shard ORDER BY ts, event_id) AS sid
  FROM flagged
),
runs AS (
  SELECT shard, event_id, ts,
         max(ts) OVER wf AS run_last,
         count(*) OVER wf - row_number() OVER ws + 1 AS n_reps
  FROM sess
  WINDOW ws AS (PARTITION BY shard, sid ORDER BY ts, event_id),
         wf AS (PARTITION BY shard, sid)
),
a AS (SELECT user_id % 8 AS shard, event_id AS anchor_id, ts AS t1
      FROM events WHERE event_type = 'signup'),
a2 AS (
  SELECT a.*,
    (SELECT r.ts FROM runs r WHERE r.shard = a.shard AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2,
    (SELECT r.run_last FROM runs r WHERE r.shard = a.shard AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2_last,
    (SELECT r.n_reps FROM runs r WHERE r.shard = a.shard AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS n2
  FROM a
),
a3 AS (
  SELECT a2.*,
    (SELECT min(c.ts) FROM events c
     WHERE c.event_type = 'click' AND c.user_id % 8 = a2.shard
       AND c.ts >= a2.t2_last) AS t3
  FROM a2
)
SELECT shard, anchor_id, t1, t2, t2_last, CAST(n2 AS BIGINT) AS n2, t3,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN t3 IS NULL THEN 'incomplete'
            WHEN t2 <= t1 + INTERVAL 30 MINUTE AND t3 <= t2_last + INTERVAL 2 HOUR
              THEN 'matched'
            ELSE 'matched_late' END AS state
FROM a3
"""


# the burst oracle minus its cap arithmetic: a run is its ENTIRE 30-min-gap
# session (run_last = session max, n_reps = rows from entry to session end)
PATTERN_UNCAPPED_ERROR_RUN_ORACLE = """
WITH err AS (
  SELECT user_id % 8 AS shard, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
  FROM events WHERE event_type = 'error'
  WINDOW w AS (PARTITION BY user_id % 8 ORDER BY ts, event_id)
),
sess AS (
  SELECT shard, event_id, ts,
         sum(ns) OVER (PARTITION BY shard ORDER BY ts, event_id) AS sid
  FROM err
),
runs AS (
  SELECT shard, event_id, ts,
         max(ts) OVER wf AS run_last,
         count(*) OVER wf - row_number() OVER ws + 1 AS n_reps
  FROM sess
  WINDOW ws AS (PARTITION BY shard, sid ORDER BY ts, event_id),
         wf AS (PARTITION BY shard, sid)
),
a AS (SELECT user_id % 8 AS shard, event_id AS anchor_id, ts AS t1
      FROM events WHERE event_type = 'signup'),
a2 AS (
  SELECT a.*,
    (SELECT r.ts FROM runs r WHERE r.shard = a.shard AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2,
    (SELECT r.run_last FROM runs r WHERE r.shard = a.shard AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2_last,
    (SELECT r.n_reps FROM runs r WHERE r.shard = a.shard AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS n2
  FROM a
),
a3 AS (
  SELECT a2.*,
    (SELECT min(p.ts) FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id % 8 = a2.shard
       AND p.ts >= a2.t2_last) AS t3
  FROM a2
)
SELECT shard, anchor_id, t1, t2, t2_last, CAST(n2 AS BIGINT) AS n2, t3,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN t3 IS NULL THEN 'incomplete'
            WHEN t2 <= t1 + INTERVAL 30 MINUTE AND t3 <= t2_last + INTERVAL 2 HOUR
              THEN 'matched'
            ELSE 'matched_late' END AS state
FROM a3
"""


def pattern_times_or_more_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``timesOrMore(3)`` (the reference Pattern API's minimum-repetition
    looping combinator — ``Pattern.times(from)`` with no upper bound,
    Flink's ``timesOrMore``): per user, signup → error.timesOrMore(3)
    (12 h repetition gap, NO cap) → purchase within 24 h of the
    cascade's last error. Only cascades of AT LEAST 3 errors bind — an
    entry whose within-gap run holds fewer than min_reps rows is not a
    valid binding, so the signup binds the next valid cascade entry
    (skip-till-next-match over VALID entries), exactly the engine's
    times(from, to) validity rule with the uncapped sentinel as ``to``.

    Compile: operators/sequence.py pattern_detect with
    ``max_reps=(3, float('inf'))`` — the same session machinery as
    uncapped oneOrMore plus the avail>=min_reps validity mask; no extra
    exchange, no extra state. Soak-covered since round 6 (kspec draws
    min_reps 1..3 with 25% uncapped caps); this query is the catalog
    witness."""
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir)
    return pattern_detect(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "signup", None),
            (
                F.col("event_type") == "error",
                "INTERVAL 12 HOURS",
                (3, float("inf")),
            ),
            (F.col("event_type") == "purchase", "INTERVAL 24 HOURS"),
        ],
    )


# the uncapped oracle restricted to VALID entries: a signup may only bind
# an error whose run (entry -> session end) holds >= 3 repetitions
PATTERN_TIMES_OR_MORE_ORACLE = """
WITH err AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 12 HOUR THEN 1 ELSE 0 END AS ns
  FROM events WHERE event_type = 'error'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM err
),
runs AS (
  SELECT user_id, event_id, ts,
         max(ts) OVER wf AS run_last,
         count(*) OVER wf - row_number() OVER ws + 1 AS n_reps
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id),
         wf AS (PARTITION BY user_id, sid)
),
a AS (SELECT user_id, event_id AS anchor_id, ts AS t1
      FROM events WHERE event_type = 'signup'),
a2 AS (
  SELECT a.*,
    (SELECT r.ts FROM runs r WHERE r.user_id = a.user_id AND r.ts >= a.t1
       AND r.n_reps >= 3
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2,
    (SELECT r.run_last FROM runs r WHERE r.user_id = a.user_id AND r.ts >= a.t1
       AND r.n_reps >= 3
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2_last,
    (SELECT r.n_reps FROM runs r WHERE r.user_id = a.user_id AND r.ts >= a.t1
       AND r.n_reps >= 3
     ORDER BY r.ts, r.event_id LIMIT 1) AS n2
  FROM a
),
a3 AS (
  SELECT a2.*,
    (SELECT min(p.ts) FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = a2.user_id
       AND p.ts >= a2.t2_last) AS t3
  FROM a2
)
SELECT user_id, anchor_id, t1, t2, t2_last, CAST(n2 AS BIGINT) AS n2, t3,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN t3 IS NULL THEN 'incomplete'
            WHEN t2 <= t1 + INTERVAL 12 HOUR AND t3 <= t2_last + INTERVAL 24 HOUR
              THEN 'matched'
            ELSE 'matched_late' END AS state
FROM a3
"""


def pattern_consecutive_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``oneOrMore().consecutive()`` (round 7 — Flink's STRICT internal
    contiguity for looping patterns, the looping twin of ``next()``):
    per user, signup → error.oneOrMore().consecutive() (12 h repetition
    gap) → purchase within 24 h of the burst's last error. Repetitions
    must be IMMEDIATELY ADJACENT events of the user — a click, view, or
    anything else between two errors ends the burst (Flink: "any
    non-matching element breaks the loop"), so the run measured is the
    true back-to-back error burst, not the gap session.

    Compile: operators/sequence.py pattern_detect ``consecutive={2}`` —
    one extra row_number() over the key's total (ts, rank, id) order
    plus an adjacency term in the session-break predicate; the
    match-nothing scan filter is off (every row is a contiguity
    witness, the same price next()/notNext() pay). Caps / min_reps /
    until / the run-last handoff apply to the refined runs unchanged.
    Verified by the ``consec`` soak mode (brute_chain consecs slots)."""
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir)
    return pattern_detect(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "signup", None),
            (
                F.col("event_type") == "error",
                "INTERVAL 12 HOURS",
                float("inf"),
            ),
            (F.col("event_type") == "purchase", "INTERVAL 24 HOURS"),
        ],
        consecutive={2},
    )


# engine-order global positions (ts, rank, id; witness rows rank 2n+1=7),
# then the uncapped-run oracle with an adjacency term in the session break
PATTERN_CONSECUTIVE_BURST_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts,
           CASE event_type WHEN 'signup' THEN 1 WHEN 'error' THEN 3
                           WHEN 'purchase' THEN 5 ELSE 7 END,
           event_id) AS pos
  FROM events
),
err AS (
  SELECT user_id, event_id, ts, pos,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 12 HOUR
                OR pos != lag(pos) OVER w + 1 THEN 1 ELSE 0 END AS ns
  FROM ranked WHERE event_type = 'error'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM err
),
runs AS (
  SELECT user_id, event_id, ts,
         max(ts) OVER wf AS run_last,
         count(*) OVER wf - row_number() OVER ws + 1 AS n_reps
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id),
         wf AS (PARTITION BY user_id, sid)
),
a AS (SELECT user_id, event_id AS anchor_id, ts AS t1
      FROM events WHERE event_type = 'signup'),
a2 AS (
  SELECT a.*,
    (SELECT r.ts FROM runs r WHERE r.user_id = a.user_id AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2,
    (SELECT r.run_last FROM runs r WHERE r.user_id = a.user_id AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS t2_last,
    (SELECT r.n_reps FROM runs r WHERE r.user_id = a.user_id AND r.ts >= a.t1
     ORDER BY r.ts, r.event_id LIMIT 1) AS n2
  FROM a
),
a3 AS (
  SELECT a2.*,
    (SELECT min(p.ts) FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = a2.user_id
       AND p.ts >= a2.t2_last) AS t3
  FROM a2
)
SELECT user_id, anchor_id, t1, t2, t2_last, CAST(n2 AS BIGINT) AS n2, t3,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN t3 IS NULL THEN 'incomplete'
            WHEN t2 <= t1 + INTERVAL 12 HOUR AND t3 <= t2_last + INTERVAL 24 HOUR
              THEN 'matched'
            ELSE 'matched_late' END AS state
FROM a3
"""


def pattern_impulse_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT-CONTIGUITY CEP (round 6 — the reference Pattern API's
    ``next()``, Flink's other core temporal relation beside followedBy):
    the impulse-buy detector — a view whose IMMEDIATELY NEXT user event
    (any event, not just pattern-relevant ones) is a purchase, classified
    matched within 1 h. An intervening click/error/anything breaks the
    chain (``incomplete``), exactly Flink's strict-contiguity discard.
    operators/sequence.py pattern_detect(strict={2}): the binder is one
    ``lead()`` over the (ts, step_rank, id) total order — O(1) per row —
    and the match-nothing scan filter is off, since every row is a
    contiguity witness."""
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir)
    return pattern_detect(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "view", None),
            (F.col("event_type") == "purchase", "INTERVAL 1 HOUR"),
        ],
        strict={2},
    )


# successor = lead over the SAME (ts, step_rank, id) total order the
# compiler binds in: view rank 1, purchase rank 3, everything else 5
PATTERN_IMPULSE_PURCHASE_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id, ts, event_type,
         CASE event_type WHEN 'view' THEN 1 WHEN 'purchase' THEN 3 ELSE 5 END AS rnk
  FROM events
),
nxt AS (
  SELECT user_id, event_id, ts, event_type,
         lead(event_type) OVER w AS nx_type,
         lead(ts) OVER w AS nx_ts
  FROM ranked
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, rnk, event_id)
)
SELECT user_id, event_id AS anchor_id, ts AS t1,
       CASE WHEN nx_type = 'purchase' THEN nx_ts END AS t2,
       CAST(CASE WHEN nx_type = 'purchase' THEN 2 ELSE 1 END AS BIGINT) AS max_step,
       CASE WHEN nx_type IS DISTINCT FROM 'purchase' THEN 'incomplete'
            WHEN nx_ts <= ts + INTERVAL 1 HOUR THEN 'matched'
            ELSE 'matched_late' END AS state
FROM nxt WHERE event_type = 'view'
"""


def pattern_clean_onboarding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEGATIVE strict contiguity (round 6 — the reference Pattern API's
    ``notNext()``): signups whose IMMEDIATELY NEXT user event is NOT an
    error ("clean onboarding"), then the first purchase within 24 h by
    normal followed-by search. A signup immediately followed by an error
    is ``negated`` (Flink kills the partial match; the streaming twin
    emits nothing); with no next event at all the probe is trivially
    satisfied. operators/sequence.py pattern_detect(not_next={1: ...})."""
    from flink_uba_spark.operators.sequence import pattern_detect

    ev = _events(spark, sf_dir)
    return pattern_detect(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "signup", None),
            (F.col("event_type") == "purchase", "INTERVAL 24 HOURS"),
        ],
        not_next={1: F.col("event_type") == "error"},
    )


# ranks: signup 1, error (the notNext slot between 1 and 2) 2, purchase 3,
# everything else 5 — the forbidden row sorts between its neighbors at
# equal timestamps, exactly as the compiler's 2k-1/2k interleave
PATTERN_CLEAN_ONBOARDING_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id, ts, event_type,
         CASE event_type WHEN 'signup' THEN 1 WHEN 'error' THEN 2
                         WHEN 'purchase' THEN 3 ELSE 5 END AS rnk
  FROM events
),
nxt AS (
  SELECT user_id, event_id, ts, event_type,
         lead(event_type) OVER w AS nx_type
  FROM ranked
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, rnk, event_id)
),
a AS (
  SELECT user_id, event_id AS anchor_id, ts AS t1,
         COALESCE(nx_type = 'error', FALSE) AS killed
  FROM nxt WHERE event_type = 'signup'
),
a2 AS (
  SELECT a.*,
    (SELECT min(p.ts) FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = a.user_id
       AND p.ts >= a.t1) AS t2
  FROM a
)
SELECT user_id, anchor_id, t1, t2,
       CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
       CASE WHEN killed THEN 'negated'
            WHEN t2 IS NULL THEN 'incomplete'
            WHEN t2 <= t1 + INTERVAL 24 HOUR THEN 'matched'
            ELSE 'matched_late' END AS state
FROM a2
"""


def pattern_nonoverlap_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AFTER-MATCH SKIP STRATEGY (round 6 — Flink CEP's
    ``AfterMatchSkipStrategy.SKIP_PAST_LAST_EVENT``): non-overlapping
    view → click (4 h) → purchase (12 h) EPISODES per user. The
    per-anchor compiler output (NO_SKIP — every view anchors a candidate)
    is post-processed by the greedy completion-order horizon scan: once
    an episode is emitted, every candidate anchored at or before its
    last event is discarded, so episodes segment the user's timeline —
    the alert-dedup semantics of the Flink skip strategy family.

    Plan: pattern_detect's one exchange + windows over events, then ONE
    extra match-sized exchange for the per-key greedy fold
    (operators/sequence.py after_match_skip_past_last)."""
    from flink_uba_spark.operators.sequence import (
        after_match_skip_past_last,
        pattern_detect,
    )

    ev = _events(spark, sf_dir)
    m = pattern_detect(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "view", None),
            (F.col("event_type") == "click", "INTERVAL 4 HOURS"),
            (F.col("event_type") == "purchase", "INTERVAL 12 HOURS"),
        ],
        with_end_id=True,
    ).filter(F.col("state") == "matched")
    return after_match_skip_past_last(m, key="user_id").select(
        "user_id", "anchor_id", "t1", "t2", "t3", "end_id"
    )


# candidates = the matched per-anchor chains (the PATTERN_VCP_ORACLE
# binding rule, plus the end binder's id: min event_id among purchases at
# the bound t3 — the engine's (ts, rank, id) min-struct tie-break); the
# skip strategy is a per-key greedy fold in completion order, replayed as
# a recursive CTE advancing one candidate rank per key per iteration and
# carrying the last-emitted-end (ts, id) horizon
PATTERN_NONOVERLAP_EPISODES_ORACLE = """
WITH RECURSIVE
v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
s2 AS (
  SELECT v.user_id, v.event_id AS anchor_id, v.ts AS t1,
         (SELECT min(c.ts) FROM c WHERE c.user_id = v.user_id AND c.ts >= v.ts) AS t2
  FROM v
),
s3 AS (
  SELECT s2.*,
         (SELECT min(p.ts) FROM p WHERE p.user_id = s2.user_id AND p.ts >= s2.t2) AS t3
  FROM s2
),
cand AS (
  SELECT user_id, anchor_id, t1, t2, t3,
         (SELECT min(p.event_id) FROM p
           WHERE p.user_id = s3.user_id AND p.ts = s3.t3) AS end_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY t3, (SELECT min(p.event_id) FROM p
                          WHERE p.user_id = s3.user_id AND p.ts = s3.t3),
                    t1, anchor_id
         ) AS r
  FROM s3
  WHERE t3 IS NOT NULL
    AND t2 <= t1 + INTERVAL 4 HOUR AND t3 <= t2 + INTERVAL 12 HOUR
),
sel AS (
  SELECT user_id, 0 AS r, TIMESTAMP '1900-01-01' AS le_ts,
         CAST(-1 AS BIGINT) AS le_id, FALSE AS kept
  FROM (SELECT DISTINCT user_id FROM cand)
  UNION ALL
  SELECT c.user_id, c.r,
         CASE WHEN (c.t1, c.anchor_id) > (s.le_ts, s.le_id)
              THEN c.t3 ELSE s.le_ts END,
         CASE WHEN (c.t1, c.anchor_id) > (s.le_ts, s.le_id)
              THEN c.end_id ELSE s.le_id END,
         (c.t1, c.anchor_id) > (s.le_ts, s.le_id)
  FROM sel s JOIN cand c ON c.user_id = s.user_id AND c.r = s.r + 1
)
SELECT c.user_id, c.anchor_id, c.t1, c.t2, c.t3, c.end_id
FROM sel s JOIN cand c ON c.user_id = s.user_id AND c.r = s.r
WHERE s.kept
"""

def pattern_reluctant_error_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELUCTANT (non-greedy) Kleene — the reference Pattern API's
    DEFAULT ``oneOrMore()``/``times(from, to)`` multi-match emission
    (Flink: a looping pattern not marked ``greedy()`` emits one match
    per admissible repetition count; the engine's greedy run is the
    ``greedy()`` variant). Per user: signup → error.times(1, 3)
    RELUCTANT (12 h repetition gap) → purchase within 24 h of the
    prefix's last error — a 2-error cascade followed by a purchase
    emits BOTH the 1-error and the 2-error match, each binding the
    purchase after its own prefix. Reference family:
    Pattern.oneOrMore / times chaining, OrderPayTimeout.java:52-64.

    Compile: operators/sequence.py pattern_detect_reluctant — one
    pattern_detect plan per count (times(m, m) pins the run), a 3-way
    union, and a match-sized dropDuplicates (branches agree exactly on
    anchors whose run never bound). Verified by the ``reluctant`` soak
    mode (tools/nfa_soak.py, brute_reluctant union reference)."""
    from flink_uba_spark.operators.sequence import pattern_detect_reluctant

    ev = _events(spark, sf_dir)
    return pattern_detect_reluctant(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "signup", None),
            (F.col("event_type") == "error", "INTERVAL 12 HOURS", (1, 3)),
            (F.col("event_type") == "purchase", "INTERVAL 24 HOURS"),
        ],
        reluctant={2},
    )


def _reluctant_oracle() -> str:
    """Union-of-counts oracle: per count m, the exact-m capped form of
    the timesOrMore oracle (entry valid iff its session holds >= m rows
    from it — lead(ts, m-1) within the session — and the run binds
    exactly m repetitions), then DISTINCT over the union (never-bound
    anchors agree across counts, exactly the engine's dropDuplicates)."""
    blocks = []
    for m in (1, 2, 3):
        blocks.append(f"""
  SELECT user_id, anchor_id, t1, t2, t2_last,
         CAST(CASE WHEN t2 IS NULL THEN NULL ELSE {m} END AS BIGINT) AS n2,
         t3,
         CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
                + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS max_step,
         CASE WHEN t3 IS NULL THEN 'incomplete'
              WHEN t2 <= t1 + INTERVAL 12 HOUR
                   AND t3 <= t2_last + INTERVAL 24 HOUR THEN 'matched'
              ELSE 'matched_late' END AS state
  FROM (
    SELECT a2.*,
      (SELECT min(p.ts) FROM events p
       WHERE p.event_type = 'purchase' AND p.user_id = a2.user_id
         AND p.ts >= a2.t2_last) AS t3
    FROM (
      SELECT a.user_id, a.anchor_id, a.t1,
        (SELECT r.ts FROM runs r WHERE r.user_id = a.user_id
           AND r.ts >= a.t1 AND r.l{m} IS NOT NULL
         ORDER BY r.ts, r.event_id LIMIT 1) AS t2,
        (SELECT r.l{m} FROM runs r WHERE r.user_id = a.user_id
           AND r.ts >= a.t1 AND r.l{m} IS NOT NULL
         ORDER BY r.ts, r.event_id LIMIT 1) AS t2_last
      FROM anch a
    ) a2
  ) b{m}""")
    union = "\n  UNION ALL\n".join(blocks)
    return f"""
WITH err AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 12 HOUR THEN 1 ELSE 0 END AS ns
  FROM events WHERE event_type = 'error'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM err
),
runs AS (
  SELECT user_id, event_id, ts,
         lead(ts, 0) OVER ws AS l1,
         lead(ts, 1) OVER ws AS l2,
         lead(ts, 2) OVER ws AS l3
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
),
anch AS (SELECT user_id, event_id AS anchor_id, ts AS t1
         FROM events WHERE event_type = 'signup')
SELECT DISTINCT * FROM (
{union}
)
"""


PATTERN_RELUCTANT_ORACLE = _reluctant_oracle()


def pattern_any_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``followedByAny`` journey: view → click (within 12 h) → purchase
    (within 24 h), branching on EVERY candidate — the reference Pattern
    API's relaxed NON-DETERMINISTIC contiguity (``Pattern.followedByAny``,
    the family of OrderPayTimeout.java:52-64), where
    pattern_view_click_purchase keeps only the skip-till-next binding.

    Output: one row per (view, click, purchase) combination with strictly
    increasing (ts, rank, id) positions and both transitions in bound —
    at sf0.1 that is ~2k combinations from 100k events; the within
    windows bound per-key fan-out so output stays data-sized at 100 TB.

    Plan: operators/sequence.py pattern_detect_any — two key-equi range
    joins, no cartesian term; verified by the exhaustive brute
    (tests/test_round7_ops.py) and a 10k-case soak (nfa_soak any).
    """
    from flink_uba_spark.operators.sequence import pattern_detect_any

    ev = _events(spark, sf_dir)
    return pattern_detect_any(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "view", None),
            (F.col("event_type") == "click", "INTERVAL 12 HOURS"),
            (F.col("event_type") == "purchase", "INTERVAL 24 HOURS"),
        ],
    )


# With disjoint step predicates every event has exactly one rank (its
# type's step), so the engine's (ts, rank, id) "strictly after" collapses
# to ts >= prev_ts for a later-step candidate — encoded here as >=.
PATTERN_ANY_VCP_ORACLE = """
SELECT v.user_id,
       v.event_id AS i1, c.event_id AS i2, p.event_id AS i3,
       v.ts AS t1, c.ts AS t2, p.ts AS t3
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = v.user_id AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 12 HOUR
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
"""


def pattern_combinations_view_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``allowCombinations()`` (round 7 — Flink's non-deterministic
    relaxed contiguity for LOOPING patterns, completing the engine
    family's contiguity matrix: strict next/consecutive, relaxed
    followedBy/oneOrMore, non-deterministic followedByAny/
    allowCombinations, each on the simple AND looping axes): per user,
    view → click.times(1, 2).allowCombinations() (24 h gap) → purchase
    within 48 h of the subset's last click — EVERY 1- and 2-click
    ordered subset after the view gets its own match row (the default
    relaxed loop would emit only prefixes of the earliest run).

    Compile: operators/sequence.py pattern_detect_combinations — one
    followedByAny plan per count (chained key-equi range joins, one
    global rank per event so legs bind distinct events), column-aligned
    union, no dedupe exchange (nK separates branches). Verified by the
    ``comb`` soak mode vs the union-of-counts brute_any expansion."""
    from flink_uba_spark.operators.sequence import pattern_detect_combinations

    ev = _events(spark, sf_dir)
    return pattern_detect_combinations(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "view", None),
            (F.col("event_type") == "click", "INTERVAL 24 HOURS", (1, 2)),
            (F.col("event_type") == "purchase", "INTERVAL 48 HOURS"),
        ],
        combinations={2},
    )


PATTERN_COMBINATIONS_ORACLE = """
SELECT v.user_id,
       v.event_id AS i1, v.ts AS t1,
       c1.event_id AS i2_1, CAST(NULL AS BIGINT) AS i2_2,
       c1.ts AS t2_1, CAST(NULL AS TIMESTAMP) AS t2_2,
       CAST(1 AS BIGINT) AS n2,
       p.event_id AS i3, p.ts AS t3
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c1
  ON c1.user_id = v.user_id AND c1.ts >= v.ts AND c1.ts <= v.ts + INTERVAL 24 HOUR
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c1.user_id AND p.ts >= c1.ts AND p.ts <= c1.ts + INTERVAL 48 HOUR
UNION ALL
SELECT v.user_id,
       v.event_id AS i1, v.ts AS t1,
       c1.event_id AS i2_1, c2.event_id AS i2_2,
       c1.ts AS t2_1, c2.ts AS t2_2,
       CAST(2 AS BIGINT) AS n2,
       p.event_id AS i3, p.ts AS t3
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c1
  ON c1.user_id = v.user_id AND c1.ts >= v.ts AND c1.ts <= v.ts + INTERVAL 24 HOUR
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c2
  ON c2.user_id = c1.user_id
     AND (c2.ts > c1.ts OR (c2.ts = c1.ts AND c2.event_id > c1.event_id))
     AND c2.ts <= c1.ts + INTERVAL 24 HOUR
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c2.user_id AND p.ts >= c2.ts AND p.ts <= c2.ts + INTERVAL 48 HOUR
"""


def pattern_group_browse_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP patterns (round 7 — Flink's ``Pattern.begin(subPattern)``
    quantified as one unit): per user, signup →
    (view → click).times(1, 2) → purchase — the whole view→click
    browse sub-pattern repeats, every transition branching on every
    candidate (the non-deterministic group-family member; a 1-step
    group IS allowCombinations). Windows: view within 48 h of the
    previous element, click within 24 h of its view, purchase within
    72 h of the last click.

    Compile: operators/sequence.py pattern_detect_group_loop — the
    group tiled m times through one pattern_detect_any plan per count,
    column-aligned union (gi{r}_{j}/gt{r}_{j} null-padded + n_loops).
    Verified by the ``group`` soak mode vs the tiled brute_any.

    Oracle note: the expanded chain's (ts, rank, id) order makes the
    click→view BACK-EDGE strict (rank(view)=2 < rank(click)=3, so a
    same-ts view sorts BEFORE the click and cannot follow it); every
    forward edge admits same-ts binding — the UNION blocks spell both
    out."""
    from flink_uba_spark.operators.sequence import pattern_detect_group_loop

    ev = _events(spark, sf_dir)
    return pattern_detect_group_loop(
        ev,
        key="user_id",
        prefix=[(F.col("event_type") == "signup", None)],
        group=[
            (F.col("event_type") == "view", "INTERVAL 48 HOURS"),
            (F.col("event_type") == "click", "INTERVAL 24 HOURS"),
        ],
        suffix=[(F.col("event_type") == "purchase", "INTERVAL 72 HOURS")],
        reps=(1, 2),
    )


PATTERN_GROUP_LOOP_ORACLE = """
SELECT a.user_id,
       a.event_id AS i1, a.ts AS t1,
       b1.event_id AS gi1_1, b1.ts AS gt1_1,
       c1.event_id AS gi1_2, c1.ts AS gt1_2,
       CAST(NULL AS BIGINT) AS gi2_1, CAST(NULL AS TIMESTAMP) AS gt2_1,
       CAST(NULL AS BIGINT) AS gi2_2, CAST(NULL AS TIMESTAMP) AS gt2_2,
       CAST(1 AS BIGINT) AS n_loops,
       p.event_id AS s1_id, p.ts AS s1_ts
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup') a
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') b1
  ON b1.user_id = a.user_id AND b1.ts >= a.ts AND b1.ts <= a.ts + INTERVAL 48 HOUR
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c1
  ON c1.user_id = b1.user_id AND c1.ts >= b1.ts AND c1.ts <= b1.ts + INTERVAL 24 HOUR
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c1.user_id AND p.ts >= c1.ts AND p.ts <= c1.ts + INTERVAL 72 HOUR
UNION ALL
SELECT a.user_id,
       a.event_id AS i1, a.ts AS t1,
       b1.event_id AS gi1_1, b1.ts AS gt1_1,
       c1.event_id AS gi1_2, c1.ts AS gt1_2,
       b2.event_id AS gi2_1, b2.ts AS gt2_1,
       c2.event_id AS gi2_2, c2.ts AS gt2_2,
       CAST(2 AS BIGINT) AS n_loops,
       p.event_id AS s1_id, p.ts AS s1_ts
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup') a
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') b1
  ON b1.user_id = a.user_id AND b1.ts >= a.ts AND b1.ts <= a.ts + INTERVAL 48 HOUR
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c1
  ON c1.user_id = b1.user_id AND c1.ts >= b1.ts AND c1.ts <= b1.ts + INTERVAL 24 HOUR
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') b2
  ON b2.user_id = c1.user_id AND b2.ts > c1.ts AND b2.ts <= c1.ts + INTERVAL 48 HOUR
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c2
  ON c2.user_id = b2.user_id AND c2.ts >= b2.ts AND c2.ts <= b2.ts + INTERVAL 24 HOUR
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c2.user_id AND p.ts >= c2.ts AND p.ts <= c2.ts + INTERVAL 72 HOUR
"""


def pattern_any_skip_to_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``AfterMatchSkipStrategy.SKIP_TO_NEXT`` over the followedByAny
    journey (round 7): of the many branches each view anchors, only the
    FIRST-COMPLETING match survives — one row per start event, the Flink
    docs' canonical SKIP_TO_NEXT × followedByAny pairing (under
    skip-till-next there is one match per anchor and the strategy is a
    no-op).

    Plan: operators/sequence.py after_match_skip_to_next — per-anchor
    INDEPENDENT (no sequential horizon): one hash exchange on
    (user_id, i1) and a partial/final min_by struct aggregate over the
    match set. Completion order (t3, i3, t2, i2) — same-ts races
    canonicalized by event id, the engine family's determinization.
    """
    from flink_uba_spark.operators.sequence import after_match_skip_to_next

    return after_match_skip_to_next(
        pattern_any_view_click_purchase(spark, sf_dir), key="user_id"
    )


PATTERN_ANY_SKIP_TO_NEXT_ORACLE = f"""
SELECT * FROM ({PATTERN_ANY_VCP_ORACLE})
QUALIFY row_number() OVER (
    PARTITION BY user_id, i1 ORDER BY t3, i3, t2, i2
) = 1
"""


def pattern_any_skip_to_first_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``AfterMatchSkipStrategy.SKIP_TO_FIRST(click)`` over the
    followedByAny journey (round 7, completing the after-match family):
    when a match emits, pending matches that started BEFORE its click
    event are discarded (AT-or-after survives — Flink's "started before"
    clause); the horizon replays greedily in completion order.

    Plan: operators/sequence.py after_match_skip_to_first — one
    match-sized exchange + a linear per-key horizon pass; oracle = the
    same greedy replay as a recursive CTE over the correlated-join
    candidates (the skip_past_last precedent)."""
    from flink_uba_spark.operators.sequence import after_match_skip_to_first

    return after_match_skip_to_first(
        pattern_any_view_click_purchase(spark, sf_dir), key="user_id", step=2
    )


PATTERN_ANY_SKIP_TO_FIRST_ORACLE = f"""
WITH RECURSIVE
cand AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY t3, i3, t1, i1, t2, i2
  ) AS r
  FROM ({PATTERN_ANY_VCP_ORACLE})
),
sel AS (
  SELECT user_id, 0 AS r, TIMESTAMP '1900-01-01' AS h_ts,
         CAST(-1 AS BIGINT) AS h_id, FALSE AS kept
  FROM (SELECT DISTINCT user_id FROM cand)
  UNION ALL
  SELECT c.user_id, c.r,
         CASE WHEN (c.t1, c.i1) >= (s.h_ts, s.h_id)
                AND (c.t2, c.i2) > (s.h_ts, s.h_id)
              THEN c.t2 ELSE s.h_ts END,
         CASE WHEN (c.t1, c.i1) >= (s.h_ts, s.h_id)
                AND (c.t2, c.i2) > (s.h_ts, s.h_id)
              THEN c.i2 ELSE s.h_id END,
         (c.t1, c.i1) >= (s.h_ts, s.h_id)
  FROM sel s JOIN cand c ON c.user_id = s.user_id AND c.r = s.r + 1
)
SELECT c.user_id, c.i1, c.i2, c.i3, c.t1, c.t2, c.t3
FROM sel s JOIN cand c ON c.user_id = s.user_id AND c.r = s.r
WHERE s.kept
"""


def pattern_within_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GLOBAL pattern window — Flink's ``Pattern...within(Time)``
    (OrderPayTimeout.java:52-64) generalized past the reference's 2-step
    shape: view → click → purchase must COMPLETE within 3 days of the
    anchor (first event → last event), and every anchor that doesn't make
    it emits the timed-out partial match (the ``timeoutTag`` side output)
    with ``max_step`` counting the prefix bound at window expiry.

    Contrast with ``pattern_view_click_purchase``: that query bounds each
    TRANSITION (the engine family's per-step ``within``); this one bounds
    the whole match — the semantics Flink's own ``within()`` carries on
    N-step patterns. Plan: the same one-exchange window compile plus a
    pure reclassification projection (operators/sequence.py
    pattern_within)."""
    from flink_uba_spark.operators.sequence import pattern_within

    ev = _events(spark, sf_dir)
    return pattern_within(
        ev,
        key="user_id",
        preds=[
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        window="INTERVAL 3 DAYS",
    )


PATTERN_WITHIN_VCP_ORACLE = """
WITH a AS (SELECT user_id, event_id AS anchor_id, ts AS t1 FROM events
           WHERE event_type = 'view'),
s2 AS (
  SELECT a.*, (SELECT min(e.ts) FROM events e WHERE e.event_type = 'click'
               AND e.user_id = a.user_id AND e.ts >= a.t1) AS t2
  FROM a
),
s3 AS (
  SELECT s2.*, (SELECT min(e.ts) FROM events e WHERE e.event_type = 'purchase'
                AND e.user_id = s2.user_id AND e.ts >= s2.t2) AS t3
  FROM s2
)
SELECT user_id, anchor_id, t1, t2, t3,
       CAST(1 + (CASE WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL 3 DAY
                      THEN 1 ELSE 0 END)
              + (CASE WHEN t3 IS NOT NULL AND t3 <= t1 + INTERVAL 3 DAY
                      THEN 1 ELSE 0 END) AS BIGINT) AS max_step,
       CASE WHEN t3 IS NOT NULL AND t3 <= t1 + INTERVAL 3 DAY
            THEN epoch_us(t3) - epoch_us(t1) END AS span_us,
       CASE WHEN t3 IS NOT NULL AND t3 <= t1 + INTERVAL 3 DAY
            THEN 'matched' ELSE 'timeout' END AS state
FROM s3
"""


def pattern_iterative_price_escalation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IterativeCondition CEP — Flink's ``where(new IterativeCondition...
    ctx.getEventsForPattern(...))`` (the dynamic form of the reference's
    static ``where`` clauses, OrderPayTimeout.java:52-64): view →
    purchase at ≥ 2× the VIEWED amount (within 3 days) → purchase
    strictly above the PREVIOUS purchase (within 3 days). Each step's
    admissibility depends on the partial match's bound values, so the
    shared-window compile can't express it; operators/sequence.py
    pattern_detect_iterative compiles it to per-step key-equi band joins
    + min_by argmin (skip-till-next: a candidate failing the iterative
    condition is SKIPPED, not a post-filter on the earliest match).
    Amounts are exact integer cents (floor(value*100), the family rule).
    """
    from flink_uba_spark.operators.sequence import pattern_detect_iterative

    ev = _events(spark, sf_dir)
    return pattern_detect_iterative(
        ev,
        key="user_id",
        steps=[
            (F.col("event_type") == "view", None),
            (F.col("event_type") == "purchase", "INTERVAL 3 DAYS"),
            (F.col("event_type") == "purchase", "INTERVAL 3 DAYS"),
        ],
        payload={"cents": F.floor(F.col("value") * 100).cast("long")},
        conds={
            2: F.col("cents2") >= 2 * F.col("cents1"),
            3: F.col("cents3") > F.col("cents2"),
        },
    )


PATTERN_ITERATIVE_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, ts, CAST(floor(value*100) AS BIGINT) AS cents,
         event_type
  FROM events WHERE event_type IN ('view', 'purchase')
),
a AS (SELECT user_id, event_id AS i1, ts AS t1, cents AS cents1
      FROM e WHERE event_type = 'view'),
s2 AS (
  SELECT a.*, p.event_id AS i2, p.ts AS t2, p.cents AS cents2
  FROM a JOIN LATERAL (
    SELECT event_id, ts, cents FROM e p
    WHERE p.event_type = 'purchase' AND p.user_id = a.user_id
      AND p.ts >= a.t1 AND p.ts <= a.t1 + INTERVAL 3 DAY
      AND p.cents >= 2 * a.cents1
    ORDER BY p.ts, p.event_id LIMIT 1) p ON TRUE
),
s3 AS (
  SELECT s2.*, q.event_id AS i3, q.ts AS t3, q.cents AS cents3
  FROM s2 JOIN LATERAL (
    SELECT event_id, ts, cents FROM e q
    WHERE q.event_type = 'purchase' AND q.user_id = s2.user_id
      AND (q.ts > s2.t2 OR (q.ts = s2.t2 AND q.event_id > s2.i2))
      AND q.ts <= s2.t2 + INTERVAL 3 DAY
      AND q.cents > s2.cents2
    ORDER BY q.ts, q.event_id LIMIT 1) q ON TRUE
)
SELECT user_id, i1, i2, i3, t1, t2, t3, cents1, cents2, cents3 FROM s3
"""


def match_recognize_error_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE — Flink SQL's row-pattern-recognition surface
    (ISO 9075-2:2016) compiled onto the Pattern engine
    (operators/match_recognize.py): ``PARTITION BY user_id ORDER BY ts
    PATTERN (S E{1,3} P) DEFINE S/E/P AFTER MATCH SKIP PAST LAST ROW``
    with the repetition gap 12 h and the recovery window 24 h — Flink
    ships the same CEP NFA under both the Pattern API
    (OrderPayTimeout.java:52-64) and SQL MATCH_RECOGNIZE; this is the
    declarative spelling, and the first catalog witness of a QUANTIFIED
    pattern under the SKIP PAST LAST fold (the r6 skip machinery ran on
    plain chains). One row per non-overlapping match:
    ``S_ts, E_ts/E_last_ts/E_n`` (the error run), ``P_ts``, ``end_id``."""
    from flink_uba_spark.operators.match_recognize import match_recognize

    ev = _events(spark, sf_dir)
    return match_recognize(
        ev,
        partition_by="user_id",
        order_by="ts",
        pattern="S E{1,3} P",
        define={
            "S": F.col("event_type") == "signup",
            "E": F.col("event_type") == "error",
            "P": F.col("event_type") == "purchase",
        },
        withins={"E": "INTERVAL 12 HOURS", "P": "INTERVAL 24 HOURS"},
        after_match="skip_past_last",
    )


MATCH_RECOGNIZE_ERROR_RUN_ORACLE = """
WITH RECURSIVE
err AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 12 HOUR THEN 1 ELSE 0 END AS ns
  FROM events WHERE event_type = 'error'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM err
),
runs AS (
  SELECT user_id, event_id, ts,
         COALESCE(lead(ts, 2) OVER ws, max(ts) OVER wf) AS run_last,
         LEAST(3, count(*) OVER wf - row_number() OVER ws + 1) AS n_reps
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id),
         wf AS (PARTITION BY user_id, sid)
),
a AS (SELECT user_id, event_id AS anchor_id, ts AS t1 FROM events
      WHERE event_type = 'signup'),
a2 AS (
  SELECT a.*, r.ts AS t2, r.run_last AS t2_last, r.n_reps AS n2
  FROM a JOIN LATERAL (
    SELECT ts, run_last, n_reps, event_id FROM runs r
    WHERE r.user_id = a.user_id AND r.ts >= a.t1
    ORDER BY r.ts, r.event_id LIMIT 1) r ON TRUE
),
a3 AS (
  SELECT a2.*, (SELECT min(p.ts) FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = a2.user_id
       AND p.ts >= a2.t2_last) AS t3
  FROM a2
),
cand0 AS (
  SELECT user_id, anchor_id, t1, t2, t2_last, n2, t3,
         (SELECT min(p.event_id) FROM events p WHERE p.event_type = 'purchase'
            AND p.user_id = a3.user_id AND p.ts = a3.t3) AS end_id
  FROM a3
  WHERE t3 IS NOT NULL AND t2 <= t1 + INTERVAL 12 HOUR
    AND t3 <= t2_last + INTERVAL 24 HOUR
),
cand AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY t3, end_id, t1, anchor_id) AS r
  FROM cand0
),
sel AS (
  SELECT user_id, 0 AS r, TIMESTAMP '1900-01-01' AS le_ts,
         CAST(-1 AS BIGINT) AS le_id, FALSE AS kept
  FROM (SELECT DISTINCT user_id FROM cand)
  UNION ALL
  SELECT c.user_id, c.r,
         CASE WHEN (c.t1, c.anchor_id) > (s.le_ts, s.le_id)
              THEN c.t3 ELSE s.le_ts END,
         CASE WHEN (c.t1, c.anchor_id) > (s.le_ts, s.le_id)
              THEN c.end_id ELSE s.le_id END,
         (c.t1, c.anchor_id) > (s.le_ts, s.le_id)
  FROM sel s JOIN cand c ON c.user_id = s.user_id AND c.r = s.r + 1
)
SELECT c.user_id, c.anchor_id, c.t1 AS S_ts, c.t2 AS E_ts,
       c.t2_last AS E_last_ts, CAST(c.n2 AS BIGINT) AS E_n,
       c.t3 AS P_ts, c.end_id
FROM sel s JOIN cand c ON c.user_id = s.user_id AND c.r = s.r
WHERE s.kept
"""


def match_recognize_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE with ``ALL ROWS PER MATCH`` (ISO 9075-2's second
    output shape; Flink supports ONE ROW — this engine carries both):
    every bound EVENT of each non-overlapping signup → click (6 h) →
    purchase (24 h) episode emits its own row with the match handle
    (anchor_id), its step ``seq`` and CLASSIFIER() variable — the shape
    downstream joins need to tie matches back to raw events. Compiled as
    a chain explode over the engine's per-step ids
    (pattern_detect with_step_ids)."""
    from flink_uba_spark.operators.match_recognize import match_recognize

    ev = _events(spark, sf_dir)
    return match_recognize(
        ev,
        partition_by="user_id",
        order_by="ts",
        pattern="S C P",
        define={
            "S": F.col("event_type") == "signup",
            "C": F.col("event_type") == "click",
            "P": F.col("event_type") == "purchase",
        },
        withins={"C": "INTERVAL 6 HOURS", "P": "INTERVAL 24 HOURS"},
        after_match="skip_past_last",
        rows_per_match="all",
    )


def _match_recognize_all_rows_oracle() -> str:
    from flink_uba_spark.queries.streaming import (
        STREAM_MATCH_RECOGNIZE_ONBOARDING_ORACLE,
    )

    # the same candidates + greedy fold as the ONE-ROW onboarding twin,
    # unpivoted to one row per bound event; per-step event ids are the
    # engine's min-(ts, rank, id) binders: the anchor id itself, the min
    # click id at the bound t2, the min purchase id at the bound t3
    return f"""
WITH m AS ({STREAM_MATCH_RECOGNIZE_ONBOARDING_ORACLE})
SELECT user_id, anchor_id, CAST(1 AS BIGINT) AS seq, 'S' AS var,
       anchor_id AS event_id, S_ts AS ts
FROM m
UNION ALL
SELECT m.user_id, m.anchor_id, CAST(2 AS BIGINT), 'C',
       (SELECT min(e.event_id) FROM events e WHERE e.event_type = 'click'
         AND e.user_id = m.user_id AND e.ts = m.C_ts), m.C_ts
FROM m
UNION ALL
SELECT m.user_id, m.anchor_id, CAST(3 AS BIGINT), 'P',
       (SELECT min(e.event_id) FROM events e WHERE e.event_type = 'purchase'
         AND e.user_id = m.user_id AND e.ts = m.P_ts), m.P_ts
FROM m
"""


def pattern_budget_error_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUDGET-capped Kleene run (round 8) — ``oneOrMore().until`` with a
    RUNNING-AGGREGATE stop, the Pattern-API spelling of an aggregate in
    DEFINE over a quantified variable: signup → error-run (12 h gap)
    accepting repetitions while the run's cumulative cents stay ≤ 100.00
    (stop BEFORE exceeding; an error alone above the budget is not a
    valid entry), capped at 5 → purchase within 24 h of the run's last
    error. Emits the run's exact integer spend alongside the chain."""
    from flink_uba_spark.operators.sequence import pattern_detect_budget_run

    ev = _events(spark, sf_dir)
    out = pattern_detect_budget_run(
        ev,
        key="user_id",
        anchor=F.col("event_type") == "signup",
        run=F.col("event_type") == "error",
        suffix=F.col("event_type") == "purchase",
        payload=F.floor(F.col("value") * 100),
        budget=10000,
        gap="INTERVAL 12 HOURS",
        suffix_within="INTERVAL 24 HOURS",
        cap=5,
    )
    return out.select(
        "user_id", "anchor_id",
        F.col("t1").alias("S_ts"),
        F.col("t2").alias("E_ts"),
        F.col("t2_last").alias("E_last_ts"),
        F.col("n2").alias("E_n"),
        F.col("spent").alias("spent_cents"),
        F.col("t3").alias("P_ts"),
        "end_id",
    )


PATTERN_BUDGET_RUN_ORACLE = """
WITH err AS (
  SELECT user_id, event_id, ts, CAST(floor(value * 100) AS BIGINT) AS pay,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 12 HOUR THEN 1 ELSE 0 END AS ns
  FROM events WHERE event_type = 'error'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM err
),
pre AS (
  SELECT user_id, event_id, ts, pay, sid,
         row_number() OVER ws AS rn, sum(pay) OVER ws AS pre
  FROM sess WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
),
-- stop-before-exceeding: prefix sums are non-decreasing (pay >= 0), so
-- the run length is the count of session prefixes <= entry_base + budget
ent0 AS (
  SELECT p.*, LEAST(5,
     (SELECT count(*) FROM pre q WHERE q.user_id = p.user_id
        AND q.sid = p.sid AND q.pre <= p.pre - p.pay + 10000)
     - (p.rn - 1)) AS n2
  FROM pre p WHERE p.pay <= 10000
),
ent AS (
  SELECT e.user_id, e.ts AS t2, e.event_id AS i2, e.n2,
         l.ts AS t2_last, l.pre - (e.pre - e.pay) AS spent
  FROM ent0 e JOIN pre l
    ON l.user_id = e.user_id AND l.sid = e.sid AND l.rn = e.rn + e.n2 - 1
),
a AS (SELECT user_id, event_id AS anchor_id, ts AS t1 FROM events
      WHERE event_type = 'signup'),
b1 AS (
  SELECT a.*, e.t2, e.i2, e.t2_last, e.n2, e.spent
  FROM a JOIN LATERAL (
    SELECT * FROM ent e WHERE e.user_id = a.user_id AND e.t2 >= a.t1
      AND e.t2 <= a.t1 + INTERVAL 12 HOUR
    ORDER BY e.t2, e.i2 LIMIT 1) e ON TRUE
),
b2 AS (
  SELECT b1.*, p.ts AS t3, p.event_id AS end_id
  FROM b1 JOIN LATERAL (
    SELECT ts, event_id FROM events p WHERE p.event_type = 'purchase'
      AND p.user_id = b1.user_id AND p.ts >= b1.t2_last
      AND p.ts <= b1.t2_last + INTERVAL 24 HOUR
    ORDER BY p.ts, p.event_id LIMIT 1) p ON TRUE
)
SELECT user_id, anchor_id, t1 AS S_ts, t2 AS E_ts, t2_last AS E_last_ts,
       CAST(n2 AS BIGINT) AS E_n, CAST(spent AS BIGINT) AS spent_cents,
       t3 AS P_ts, end_id
FROM b2
"""


def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed-changelog materialization (CDC upsert → current table,
    Flink's upsert-stream/table duality — ``fromChangelogStream`` /
    upsert-kafka tombstones; the keyed twin of the reference's retract
    conversions, SURVEY §2 S6): events as a per-user profile changelog
    where every record upserts (event_type, cents, props) and an
    ``error`` record is the DELETE tombstone — the output holds each
    user's latest visible profile, absent when the latest record is a
    tombstone. ONE hash aggregate (map-side-partial ``max_by``), no
    window/self-join — the 100 TB shape (operators/changelog.py)."""
    from flink_uba_spark.operators.changelog import changelog_latest

    ev = _events(spark, sf_dir)
    return changelog_latest(
        ev,
        keys=["user_id"],
        values={
            "last_type": F.col("event_type"),
            "last_cents": F.floor(F.col("value") * 100).cast("long"),
            "last_props": F.col("props"),
        },
        delete_when=F.col("event_type") == "error",
    )


CDC_LATEST_STATE_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, ts, event_id, props,
         CAST(floor(value * 100) AS BIGINT) AS cents,
         row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type AS last_type, cents AS last_cents,
       props AS last_props, ts AS op_ts, event_id AS op_id
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""


QUERIES = {
    "cdc_latest_state": cdc_latest_state,
    "daily_users_approx": daily_users_approx,
    "item_pagerank": item_pagerank,
    "pattern_view_click_purchase": pattern_view_click_purchase,
    "pattern_within_view_click_purchase": pattern_within_view_click_purchase,
    "pattern_iterative_price_escalation": pattern_iterative_price_escalation,
    "match_recognize_error_run": match_recognize_error_run,
    "match_recognize_all_rows": match_recognize_all_rows,
    "pattern_error_burst_recovery": pattern_error_burst_recovery,
    "pattern_signup_journey": pattern_signup_journey,
    "pattern_purchase_no_error": pattern_purchase_no_error,
    "pattern_error_streak_recovery": pattern_error_streak_recovery,
    "pattern_optional_click_purchase": pattern_optional_click_purchase,
    "pattern_optional_branching": pattern_optional_branching,
    "event_path_trigrams": event_path_trigrams,
    "time_to_convert_histogram": time_to_convert_histogram,
    "pattern_uncapped_error_run": pattern_uncapped_error_run,
    "pattern_error_run_until_purchase": pattern_error_run_until_purchase,
    "pattern_budget_error_run": pattern_budget_error_run,
    "pattern_times_or_more_errors": pattern_times_or_more_errors,
    "pattern_consecutive_error_burst": pattern_consecutive_error_burst,
    "pattern_reluctant_error_prefixes": pattern_reluctant_error_prefixes,
    "pattern_impulse_purchase": pattern_impulse_purchase,
    "pattern_clean_onboarding": pattern_clean_onboarding,
    "pattern_nonoverlap_episodes": pattern_nonoverlap_episodes,
    "pattern_any_view_click_purchase": pattern_any_view_click_purchase,
    "pattern_combinations_view_clicks": pattern_combinations_view_clicks,
    "pattern_group_browse_loop": pattern_group_browse_loop,
    "pattern_any_skip_to_next": pattern_any_skip_to_next,
    "pattern_any_skip_to_first_click": pattern_any_skip_to_first_click,
    "event_transition_matrix": event_transition_matrix,
    "daily_anomaly_days": daily_anomaly_days,
    "daily_event_type_pivot": daily_event_type_pivot,
    "cumulate_event_volume": cumulate_event_volume,
    "rolling_7d_purchase_value": rolling_7d_purchase_value,
    "daily_active_users": daily_active_users,
    "hourly_event_volume": hourly_event_volume,
    "user_sessions": user_sessions,
    "user_sessions_dynamic_gap": user_sessions_dynamic_gap,
    "user_funnel": user_funnel,
    "user_retention": user_retention,
}

ORACLES = {
    "cdc_latest_state": CDC_LATEST_STATE_ORACLE,
    "daily_users_approx": DAILY_USERS_APPROX_ORACLE,
    "item_pagerank": ITEM_PAGERANK_ORACLE,
    "pattern_view_click_purchase": PATTERN_VCP_ORACLE,
    "pattern_within_view_click_purchase": PATTERN_WITHIN_VCP_ORACLE,
    "pattern_iterative_price_escalation": PATTERN_ITERATIVE_ORACLE,
    "match_recognize_error_run": MATCH_RECOGNIZE_ERROR_RUN_ORACLE,
    "match_recognize_all_rows": _match_recognize_all_rows_oracle(),
    "pattern_error_burst_recovery": PATTERN_ERROR_BURST_ORACLE,
    "pattern_signup_journey": PATTERN_SIGNUP_JOURNEY_ORACLE,
    "pattern_purchase_no_error": PATTERN_PURCHASE_NO_ERROR_ORACLE,
    "pattern_error_streak_recovery": PATTERN_ERROR_STREAK_ORACLE,
    "pattern_optional_click_purchase": PATTERN_OPTIONAL_CLICK_ORACLE,
    "pattern_optional_branching": PATTERN_OPTIONAL_BRANCHING_ORACLE,
    "event_path_trigrams": EVENT_PATH_TRIGRAMS_ORACLE,
    "time_to_convert_histogram": TIME_TO_CONVERT_ORACLE,
    "pattern_uncapped_error_run": PATTERN_UNCAPPED_ERROR_RUN_ORACLE,
    "pattern_error_run_until_purchase": PATTERN_ERROR_RUN_UNTIL_ORACLE,
    "pattern_budget_error_run": PATTERN_BUDGET_RUN_ORACLE,
    "pattern_times_or_more_errors": PATTERN_TIMES_OR_MORE_ORACLE,
    "pattern_consecutive_error_burst": PATTERN_CONSECUTIVE_BURST_ORACLE,
    "pattern_reluctant_error_prefixes": PATTERN_RELUCTANT_ORACLE,
    "pattern_impulse_purchase": PATTERN_IMPULSE_PURCHASE_ORACLE,
    "pattern_clean_onboarding": PATTERN_CLEAN_ONBOARDING_ORACLE,
    "pattern_nonoverlap_episodes": PATTERN_NONOVERLAP_EPISODES_ORACLE,
    "pattern_any_view_click_purchase": PATTERN_ANY_VCP_ORACLE,
    "pattern_combinations_view_clicks": PATTERN_COMBINATIONS_ORACLE,
    "pattern_group_browse_loop": PATTERN_GROUP_LOOP_ORACLE,
    "pattern_any_skip_to_next": PATTERN_ANY_SKIP_TO_NEXT_ORACLE,
    "pattern_any_skip_to_first_click": PATTERN_ANY_SKIP_TO_FIRST_ORACLE,
    "event_transition_matrix": EVENT_TRANSITION_ORACLE,
    "daily_anomaly_days": DAILY_ANOMALY_ORACLE,
    "daily_event_type_pivot": DAILY_EVENT_TYPE_PIVOT_ORACLE,
    "cumulate_event_volume": CUMULATE_VOLUME_ORACLE,
    "rolling_7d_purchase_value": ROLLING_7D_ORACLE,
    "daily_active_users": DAILY_ACTIVE_USERS_ORACLE,
    "hourly_event_volume": HOURLY_VOLUME_ORACLE,
    "user_sessions": USER_SESSIONS_ORACLE,
    "user_sessions_dynamic_gap": USER_SESSIONS_DYNAMIC_GAP_ORACLE,
    "user_funnel": USER_FUNNEL_ORACLE,
    "user_retention": USER_RETENTION_ORACLE,
}
