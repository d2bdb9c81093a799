"""Temporal joins Spark lacks natively: as-of join and table-interval
range join.

Neither exists in the reference (its only temporal join is the fixed-band
intervalJoin, TxPayMatchByJoin.java:60-64 → operators/interval_join.py);
these are the two shapes a training-data / feature pipeline hits next:
"latest value at-or-before t" (feature lookup, last-touch attribution)
and "events within per-row windows" (campaign/maintenance/session
attribution with heterogeneous interval lengths).

Scale design:

- ``asof_join`` is the union-and-running-last form: tag both inputs,
  union, ONE hash exchange on the key, in-partition sort, running
  ``last(payload, ignorenulls)``. No join node at all — cost is the same
  single exchange a keyBy implies, and per-key memory is O(1) (the
  running payload), unlike collect-and-scan implementations. This is the
  plan a 100 TB backfill wants: no build side, no broadcast, no state.
- ``range_join`` turns an arbitrary-interval containment join into an
  EQUI-join by time bucket: each left row owns exactly one bucket;
  each range explodes to the buckets it overlaps; candidates meet on
  (keys…, bucket) and exact containment filters. Catalyst would other-
  wise plan key-equi + range residual (fine with selective keys) or a
  BroadcastNestedLoop (disaster) when keys are absent; bucketing keeps
  the weight in one shuffled equi-join either way. Bucket width trades
  range-row duplication (ranges spanning many buckets) against candidate
  fan-in; pick ≈ the median range length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    tiebreak: str | None = None,
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` at-or-before ``left_ts`` (direction="backward"; "forward"
    takes the least at-or-after) sharing the ``on`` key.

    ``payload``: right columns to attach (default: all non-key, non-ts).
    Attached columns are prefixed ``r_`` only on name collision with left.
    ``tiebreak``: right column ordering equal-``right_ts`` candidates —
    the MAX wins (backward) — required for a deterministic answer when
    right timestamps can tie; defaults to ``right_ts`` alone.
    ``tolerance_us``: match only if |left_ts − right_ts| ≤ this many
    microseconds; farther matches become nulls (left row is kept).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    pay = payload if payload is not None else [
        c for c in right.columns if c not in (*keys, right_ts)
    ]
    out_names = {
        c: (c if c not in left.columns else f"r_{c}") for c in (*pay, right_ts)
    }
    tb = tiebreak if tiebreak is not None else right_ts

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.col(tb).alias("__tb"),
        F.lit(1).alias("__is_r"),
        F.struct(
            F.col(right_ts).alias("__rt"), *[F.col(c) for c in pay]
        ).alias("__p"),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(0).alias("__is_r"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # backward: scan time ascending, rights sort BEFORE lefts at equal ts
    # (at-or-before is inclusive), equal-ts rights ascending so the running
    # last picks the max tiebreak. forward mirrors the scan direction.
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__is_r").desc(), F.col("__tb").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__is_r").desc(), F.col("__tb").desc()]
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).filter(
        F.col("__is_r") == 0
    )
    if tolerance_us is not None:
        within = (
            F.abs(F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__m.__rt")))
            <= tolerance_us
        )
        matched = matched.withColumn("__m", F.when(within, F.col("__m")))
    out = matched.select(
        *left.columns,
        F.col("__m.__rt").alias(out_names[right_ts]),
        *[F.col(f"__m.{c}").alias(out_names[c]) for c in pay],
    )
    return out


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    left_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    keys: tuple[str, ...] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join left rows into every range row whose closed interval
    [start_col, end_col] contains ``left_ts`` (plus key equality).

    Bucketized: both sides map time to floor(epoch_s / bucket_seconds);
    a left row has one bucket, a range covers a bucket run (bounded
    explode), and the join is pure equi on (keys…, bucket) with exact
    containment as the in-task filter. Each (left, range) pair meets in
    exactly one bucket — the left row's — so no post-join dedup is needed.
    """
    b = F.lit(int(bucket_seconds))
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_ts).cast("long") / b).cast("long")
    )
    rb = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / b).cast("long"),
                F.floor(F.col(end_col).cast("long") / b).cast("long"),
            )
        ),
    )
    on = [*keys, "__bucket"]
    return (
        lb.join(rb, on=on)
        .filter((F.col(left_ts) >= F.col(start_col)) & (F.col(left_ts) <= F.col(end_col)))
        .drop("__bucket")
    )


def window_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    size: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Flink's window join TVF (1.14+): ``SELECT ... FROM TABLE(TUMBLE(L))
    JOIN TABLE(TUMBLE(R)) ON L.window_start = R.window_start AND ...`` —
    both inputs assigned the SAME epoch-aligned tumbling window, inner
    join on (window, keys). The window assignment is a pure projection
    (no pre-aggregation state); the join shuffles both sides once on
    (keys, window) — because the window is part of the join key, per-task
    state in the streaming form is bounded by one window's rows and
    expires with the watermark, which is exactly Flink's window-join
    state story.

    Both inputs must have disjoint non-key column names (pre-alias at the
    call site). Returns the joined rows with ``window_start``/
    ``window_end`` columns.
    """
    lw = left.withColumn("__w", F.window(left_ts, size))
    rw = right.withColumn("__w", F.window(right_ts, size))
    return (
        lw.join(rw, keys + ["__w"], "inner")
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def temporal_table_join(
    fact: DataFrame,
    dim_versions: DataFrame,
    on: list[str] | str,
    fact_ts: str = "ts",
    version_ts: str = "ts",
    payload: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """``FOR SYSTEM_TIME AS OF`` — Flink SQL's event-time temporal
    (versioned-table) join: each fact row sees the dimension VERSION that
    was valid at its own event time (the latest version at-or-before
    ``fact_ts``); facts before the first version keep nulls.

    Lowering: the validity-interval formulation (version k valid on
    [ts_k, ts_{k+1})) would need a range join whose last interval is
    unbounded; the equivalent — and cheaper — plan is the as-of compile
    (``asof_join``): ONE union + key exchange + a last-non-null running
    window, linear per key, no interval table and no join band at all.
    That equivalence (latest-at-or-before ⟺ valid-at) is exactly why
    Flink implements the temporal join operator as sorted state lookup
    rather than interval containment; at 100 TB the single-pass window
    form is the one that survives.

    ``tiebreak``: highest wins among same-timestamp versions (the
    last-writer-wins rule a versioned table needs).
    """
    return asof_join(
        fact,
        dim_versions,
        on=on,
        left_ts=fact_ts,
        right_ts=version_ts,
        payload=payload,
        tiebreak=tiebreak,
    )
