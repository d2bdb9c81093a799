"""MATCH_RECOGNIZE — the SQL row-pattern-recognition front-end (subset),
compiled onto the Pattern-API engines.

Flink exposes its CEP library twice: the Pattern API the reference uses
(OrderPayTimeout.java:52-64) and SQL ``MATCH_RECOGNIZE`` (ISO/IEC
9075-2:2016 row-pattern recognition), which compiles onto the same NFA.
This module is that second surface for the Spark engines: a declarative
(PARTITION BY, ORDER BY, PATTERN, DEFINE, AFTER MATCH, MEASURES) spec
compiled onto ``pattern_detect`` (batch) / ``stream_pattern_detect``
(streaming) — the pattern is a plan shape here, so the front-end is a
pure compiler; nothing new executes.

Supported subset (validated, everything else raises):

- ``PATTERN``: a space-separated variable sequence, each with an optional
  quantifier — ``B+`` (oneOrMore, uncapped), ``B{n}`` (times(n)),
  ``B{n,m}`` (times(n, m)), ``B{n,}`` (timesOrMore(n)), ``B?``
  (optional). Greedy (the engines' run semantics — SQL's default);
  reluctant ``+?`` is served by ``pattern_detect_reluctant`` and not
  wired here.
- ``DEFINE``: variable → Column predicate (or event-type string on the
  streaming side). SQL's ``PREV``/``NEXT``/aggregate defines are the
  IterativeCondition family — ``pattern_detect_iterative`` covers the
  prefix-referencing form; this front-end takes self-row predicates.
- ``AFTER MATCH``: ``skip_past_last`` (SKIP PAST LAST ROW — the SQL
  default; non-overlapping matches via the greedy completion-order fold)
  or ``no_skip`` (every anchor's match).
- ``ONE ROW PER MATCH`` only (the engines' chain-per-row shape);
  ``MEASURES`` maps output names to Columns over the chain columns
  (``<var>_ts``, ``<var>_last_ts``/``<var>_n`` for quantified vars,
  ``anchor_id``, ``end_id``).
- ``ORDER BY`` must be the event-time column; ties determinize by the
  engine family's (ts, step_rank, id) total order.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*)(\+|\?|\{(\d+)(,(\d*))?\})?$")


def parse_pattern(pattern: str) -> list[tuple[str, tuple | None]]:
    """``"S E{1,3} P"`` → ``[("S", None), ("E", ("kleene", 1, 3)),
    ("P", None)]``; quantifiers: + ? {n} {n,} {n,m}."""
    out = []
    toks = pattern.split()
    if len(toks) < 2:
        raise ValueError("PATTERN needs at least 2 variables")
    for tok in toks:
        m = _TOKEN.match(tok)
        if not m:
            raise ValueError(f"bad PATTERN token: {tok!r}")
        var, quant = m.group(1), m.group(2)
        if quant is None:
            q = None
        elif quant == "+":
            q = ("kleene", 1, None)
        elif quant == "?":
            q = ("optional",)
        elif m.group(4) is None:  # {n}
            q = ("kleene", int(m.group(3)), int(m.group(3)))
        elif m.group(5) == "":  # {n,}
            q = ("kleene", int(m.group(3)), None)
        else:  # {n,m}
            q = ("kleene", int(m.group(3)), int(m.group(5)))
        out.append((var, q))
    vars_ = [v for v, _ in out]
    if len(set(vars_)) != len(vars_):
        raise ValueError("PATTERN variables must be distinct")
    return out


def _steps_and_sets(parsed, define, withins, default_within):
    steps, optional = [], set()
    for k, (var, q) in enumerate(parsed, start=1):
        if var not in define:
            raise ValueError(f"PATTERN variable {var!r} has no DEFINE entry")
        w = withins.get(var, default_within if k > 1 else None)
        if q is None:
            steps.append((define[var], w))
        elif q[0] == "optional":
            steps.append((define[var], w))
            optional.add(k)
        else:
            lo, hi = q[1], q[2]
            steps.append(
                (define[var], w, (lo, float("inf") if hi is None else hi))
            )
    return steps, optional


def _rename(out: DataFrame, parsed) -> DataFrame:
    for k, (var, q) in enumerate(parsed, start=1):
        out = out.withColumnRenamed(f"t{k}", f"{var}_ts")
        if q is not None and q[0] == "kleene":
            out = out.withColumnRenamed(f"t{k}_last", f"{var}_last_ts")
            out = out.withColumnRenamed(f"n{k}", f"{var}_n")
    return out


def match_recognize(
    events: DataFrame,
    partition_by: str,
    order_by: str,
    pattern: str,
    define: dict[str, Column],
    withins: dict[str, str] | None = None,
    default_within: str | None = None,
    measures: dict[str, Column] | None = None,
    after_match: str = "skip_past_last",
    event_id: str = "event_id",
    rows_per_match: str = "one",
) -> DataFrame:
    """Compile the MATCH_RECOGNIZE spec onto the batch engine. ``withins``
    bounds the transition INTO a variable's step (and is a quantified
    variable's repetition gap); ``default_within`` fills unlisted
    variables. Returns one row per match: ``partition_by, anchor_id,
    <var>_ts...`` (+ ``<var>_last_ts``/``<var>_n`` per quantified var,
    ``end_id`` under skip_past_last), or the MEASURES projection if
    given.

    ``rows_per_match="all"`` is SQL's ``ALL ROWS PER MATCH``: one output
    row per BOUND EVENT — ``(partition, anchor_id, seq, var, event_id,
    ts)``, anchor_id the match handle, ``var`` the CLASSIFIER() column —
    compiled as a chain explode over the engine's per-step ids
    (``with_step_ids``). Plain/optional variables only (a skipped
    optional emits no row; a quantified run binds a SET the chain struct
    does not enumerate — raises), and no MEASURES (that is the ONE ROW
    shape)."""
    from flink_uba_spark.operators.sequence import (
        after_match_skip_past_last,
        pattern_detect,
    )

    if after_match not in ("skip_past_last", "no_skip"):
        raise ValueError("AFTER MATCH: skip_past_last | no_skip")
    if rows_per_match not in ("one", "all"):
        raise ValueError("ROWS PER MATCH: one | all")
    parsed = parse_pattern(pattern)
    if rows_per_match == "all":
        if any(q is not None and q[0] == "kleene" for _, q in parsed):
            raise ValueError(
                "ALL ROWS PER MATCH supports plain/optional variables only"
            )
        if measures is not None:
            raise ValueError("MEASURES is the ONE ROW PER MATCH shape")
    steps, optional = _steps_and_sets(
        parsed, define, dict(withins or {}), default_within
    )
    out = pattern_detect(
        events,
        key=partition_by,
        steps=steps,
        event_id=event_id,
        ts=order_by,
        optional=optional or None,
        with_end_id=(after_match == "skip_past_last"),
        with_step_ids=(rows_per_match == "all"),
    ).filter(F.col("state") == "matched")
    if after_match == "skip_past_last":
        out = after_match_skip_past_last(out, key=partition_by)
    if rows_per_match == "all":
        entries = F.array(
            *[
                F.struct(
                    F.lit(k).cast("long").alias("seq"),
                    F.lit(var).alias("var"),
                    F.col(f"i{k}").alias("event_id"),
                    F.col(f"t{k}").alias("ts"),
                )
                for k, (var, _q) in enumerate(parsed, start=1)
            ]
        )
        return (
            out.select(partition_by, "anchor_id", F.explode(entries).alias("__e"))
            .select(
                partition_by,
                "anchor_id",
                "__e.seq",
                "__e.var",
                "__e.event_id",
                "__e.ts",
            )
            .filter(F.col("ts").isNotNull())
        )
    out = _rename(out.drop("max_step", "state"), parsed)
    if measures is not None:
        out = out.select(
            partition_by, *[c.alias(nm) for nm, c in measures.items()]
        )
    return out


def stream_match_recognize(
    events: DataFrame,
    partition_by: str,
    order_by: str,
    pattern: str,
    define: dict,
    withins: dict[str, str] | None = None,
    default_within: str | None = None,
    measures: dict[str, Column] | None = None,
    after_match: str = "skip_past_last",
    event_id: str = "event_id",
) -> DataFrame:
    """The same spec as a continuous query (``stream_pattern_detect``).
    The streaming skip fold supports plain chains (the NFA's documented
    bound); quantified patterns stream under ``no_skip``."""
    from flink_uba_spark.streaming.pattern import stream_pattern_detect

    if after_match not in ("skip_past_last", "no_skip"):
        raise ValueError("AFTER MATCH: skip_past_last | no_skip")
    parsed = parse_pattern(pattern)
    steps, optional = _steps_and_sets(
        parsed, define, dict(withins or {}), default_within
    )
    out = stream_pattern_detect(
        events,
        key=partition_by,
        steps=steps,
        event_id=event_id,
        ts=order_by,
        optional=optional or None,
        after_match=("skip_past_last" if after_match == "skip_past_last" else None),
    )
    # the stream NFA also emits matched_late (first-candidate-decides);
    # MATCH_RECOGNIZE's contract is bounds-respected matches, as batch
    out = out.filter(F.col("state") == "matched")
    if partition_by != "user_id":
        # pattern_output_schema names the key column user_id
        out = out.withColumnRenamed("user_id", partition_by)
    out = _rename(out.drop("max_step", "state"), parsed)
    if measures is not None:
        out = out.select(
            partition_by, *[c.alias(nm) for nm, c in measures.items()]
        )
    return out
