"""SQL-text MATCH_RECOGNIZE front-end — parses the ISO 9075-2 clause
text (Flink SQL's spelling) into the Python spec served by
``operators.match_recognize``.

Flink's second CEP surface is a SQL *string* — a user types::

    SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES S.ts AS S_ts, COUNT(E.*) AS E_n
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (S E{1,3} P) WITHIN INTERVAL '12' HOUR
        SUBSET U = (S, E, P)
        DEFINE S AS S.event_type = 'signup',
               E AS E.event_type = 'error',
               P AS P.event_type = 'purchase'
    )

(reference anchor: OrderPayTimeout.java:52-64 is the Pattern-API
spelling of the same NFA; the Python-dict spec in
``match_recognize(...)`` is this repo's Pattern-API twin). This module
is a pure text-to-spec compiler: every clause maps onto an argument of
:func:`flink_uba_spark.operators.match_recognize.match_recognize`, so
routing, validation and execution are exactly the dict spec's — nothing
new executes.

Supported text subset (everything else raises with the reason):

- ``PARTITION BY <col>`` (one key) / ``ORDER BY <col> [ASC]`` — the
  event-time column (the engine's contract).
- ``PATTERN ( ... )`` — the full pattern token language of
  ``parse_pattern`` (quantifiers incl. reluctant, ``(A|B)`` groups,
  ``PERMUTE(A,B)``, exclusions ``{- X -}``, anchors ``^``/``$``).
- ``WITHIN INTERVAL '<n>' <unit>`` after PATTERN — Flink's overall
  window (``Pattern.within``): compiled to ``within_overall``
  (INCLUSIVE bound — the repo's documented divergence from Flink's
  exclusive edge, see match_recognize). ISO has no per-transition
  bound, so unlisted transition withins default to the SAME bound
  (correctness-neutral under a monotone ORDER BY: any transition gap
  inside a qualifying match is at most the overall span); the
  ``withins=`` kwarg carries tighter per-transition bounds — the
  Pattern-API knob SQL text cannot spell.
- ``DEFINE V AS <predicate>`` — self-row predicates
  (``V.col`` → ``col``; referencing ANOTHER variable raises with a
  pointer to ``iter_define``) plus ISO PHYSICAL navigation
  ``PREV(V.col [, n])`` — compiled to a window ``lag`` over
  (PARTITION BY, ORDER BY ts, id) on the input BEFORE classification,
  exactly the match_recognize_prev_navigation construction (Flink
  compiles PREV the same way). ``NEXT``/``FIRST``/``LAST`` in DEFINE
  raise (LOGICAL navigation is ``iter_define``'s surface).
- ``MEASURES <expr> AS <name>, ...`` — run aggregates
  ``SUM/AVG/MIN/MAX(V.<expr>)``, ``COUNT(V.*)``,
  ``FIRST/LAST(V.<expr> [, n])`` → :class:`RunAgg`; any other
  expression is rewritten over the ONE-row output columns
  (``V.ts`` → ``V_ts``; bare output columns — ``anchor_id``,
  ``end_id``, ``V_last_ts``, ``V_n`` — pass through).
- ``ONE ROW PER MATCH`` (default) / ``ALL ROWS PER MATCH``.
- ``AFTER MATCH SKIP PAST LAST ROW`` (default) / ``SKIP TO NEXT ROW``
  (≡ the dict spec's ``no_skip`` — every row may anchor) /
  ``SKIP TO FIRST <V>`` / ``SKIP TO [LAST] <V>``.
- ``SUBSET U = (A, B), ...``.

The wrapper ``SELECT * FROM <t> MATCH_RECOGNIZE ( ... )`` is accepted
and must be exactly that shape — the input table is the ``events``
DataFrame argument (a projection list or WHERE clause raises: compose
them on the DataFrame before the call)."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "match_recognize_sql",
    "parse_match_recognize_sql",
    "stream_match_recognize_sql",
]

# clause keywords, in ISO clause order; each starts a new segment when
# seen at paren-depth 0 outside quotes
_CLAUSES = [
    "PARTITION BY",
    "ORDER BY",
    "MEASURES",
    "ONE ROW PER MATCH",
    "ALL ROWS PER MATCH",
    "AFTER MATCH",
    "PATTERN",
    "WITHIN",
    "SUBSET",
    "DEFINE",
]

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def _strip_wrapper(sql: str) -> str:
    """Accept either the bare clause text or the full
    ``SELECT * FROM <t> MATCH_RECOGNIZE ( ... ) [AS <alias>]`` wrapper;
    return the clause text."""
    m = re.search(r"\bMATCH_RECOGNIZE\s*\(", sql, re.IGNORECASE)
    if not m:
        return sql
    head = sql[: m.start()].strip()
    if head and not re.fullmatch(
        rf"SELECT\s+\*\s+FROM\s+{_IDENT}", head, re.IGNORECASE
    ):
        raise ValueError(
            "the MATCH_RECOGNIZE wrapper must be exactly "
            "'SELECT * FROM <table> MATCH_RECOGNIZE (...)' — the input "
            "table is the events DataFrame argument; compose projections "
            f"and filters on it before the call (got head {head!r})"
        )
    depth, i = 0, m.end() - 1
    while i < len(sql):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                break
        i += 1
    if depth != 0:
        raise ValueError("unbalanced parentheses in MATCH_RECOGNIZE(...)")
    tail = sql[i + 1 :].strip().rstrip(";").strip()
    if tail and not re.fullmatch(
        rf"(AS\s+)?{_IDENT}", tail, re.IGNORECASE
    ):
        raise ValueError(f"unexpected text after MATCH_RECOGNIZE(...): {tail!r}")
    return sql[m.end() : i]


def _split_clauses(body: str) -> dict[str, str]:
    """Segment the clause body on the keyword set at depth 0 (parens and
    single-quoted strings respected). Returns {clause: text-after-it}."""
    # positions of each clause keyword at depth 0
    hits: list[tuple[int, int, str]] = []  # (start, end, clause)
    i, depth, n = 0, 0, len(body)
    while i < n:
        c = body[i]
        if c == "'":
            j = body.find("'", i + 1)
            if j < 0:
                raise ValueError("unterminated string literal")
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and (c.isalpha() or c == "_"):
            rest = body[i:]
            for kw in _CLAUSES:
                m = re.match(rf"{re.escape(kw)}\b", rest, re.IGNORECASE)
                if m:
                    # word-boundary on the left too
                    if i > 0 and (body[i - 1].isalnum() or body[i - 1] == "_"):
                        break
                    hits.append((i, i + m.end(), kw))
                    i += m.end()
                    break
            else:
                # skip the identifier
                m = re.match(_IDENT, rest)
                i += m.end() if m else 1
            continue
        i += 1
    if not hits:
        raise ValueError("no MATCH_RECOGNIZE clauses found")
    head = body[: hits[0][0]].strip()
    if head:
        raise ValueError(f"unexpected text before the first clause: {head!r}")
    out: dict[str, str] = {}
    for idx, (_s, e, kw) in enumerate(hits):
        nxt = hits[idx + 1][0] if idx + 1 < len(hits) else len(body)
        if kw in out:
            raise ValueError(f"duplicate {kw} clause")
        out[kw] = body[e:nxt].strip()
    return out


def _split_top(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren-depth 0 outside quotes."""
    parts, depth, cur, i, n = [], 0, [], 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            j = text.find("'", i + 1)
            if j < 0:
                raise ValueError("unterminated string literal")
            cur.append(text[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur).strip())
    return [p for p in parts if p]


_VAR_REF = re.compile(rf"\b({_IDENT})\s*\.\s*({_IDENT})\b")
_INTERVAL = re.compile(
    r"^INTERVAL\s+'?(\d+)'?\s+([A-Za-z]+)$", re.IGNORECASE
)
_RUN_AGG = re.compile(
    rf"^(SUM|COUNT|AVG|MIN|MAX|FIRST|LAST)\s*\((.*)\)$",
    re.IGNORECASE | re.DOTALL,
)
_PREV = re.compile(r"\bPREV\s*\(", re.IGNORECASE)


def _norm_interval(text: str) -> str:
    m = _INTERVAL.match(text.strip())
    if not m:
        raise ValueError(
            f"expected INTERVAL '<n>' <unit>, got {text.strip()!r}"
        )
    return f"INTERVAL {m.group(1)} {m.group(2).upper()}"


def _rewrite_refs(expr: str, mapper) -> str:
    """Rewrite every ``var.col`` reference (outside string literals)
    through ``mapper(var, col) -> str``."""
    out, i, n = [], 0, len(expr)
    while i < n:
        c = expr[i]
        if c == "'":
            j = expr.find("'", i + 1)
            out.append(expr[i : j + 1])
            i = j + 1
            continue
        m = _VAR_REF.match(expr, i)
        if m:
            out.append(mapper(m.group(1), m.group(2)))
            i = m.end()
            continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_match_recognize_sql(sql: str) -> dict:
    """Parse the SQL text into a plain spec dict (no Spark objects):
    keys mirror :func:`match_recognize`'s arguments with the DEFINE /
    MEASURES entries still as expression STRINGS (``define_sql``,
    ``measures_sql``) plus ``prev_lags`` — the physical-navigation lag
    columns to precompute as ``(name, col, n)``. Exposed separately so
    the parser is testable without a SparkSession."""
    body = _strip_wrapper(sql)
    clauses = _split_clauses(body)

    if "PATTERN" not in clauses:
        raise ValueError("MATCH_RECOGNIZE needs a PATTERN clause")
    if "DEFINE" not in clauses:
        raise ValueError("MATCH_RECOGNIZE needs a DEFINE clause")
    if "PARTITION BY" not in clauses:
        raise ValueError("this engine needs PARTITION BY (keyed streams)")
    if "ORDER BY" not in clauses:
        raise ValueError("MATCH_RECOGNIZE needs ORDER BY (the event-time column)")

    part = clauses["PARTITION BY"]
    if not re.fullmatch(_IDENT, part):
        raise ValueError(
            f"PARTITION BY takes exactly one column (got {part!r})"
        )
    order = clauses["ORDER BY"]
    m = re.fullmatch(rf"({_IDENT})(\s+ASC)?", order, re.IGNORECASE)
    if not m:
        raise ValueError(
            f"ORDER BY takes exactly one ascending event-time column "
            f"(got {order!r}; DESC has no event-time meaning here)"
        )
    order = m.group(1)

    # PATTERN (...) — the clause text is '( tokens )'
    pat_text = clauses["PATTERN"]
    if not (pat_text.startswith("(") and pat_text.endswith(")")):
        raise ValueError(f"PATTERN needs parentheses: {pat_text!r}")
    pattern = pat_text[1:-1].strip()
    # normalize intra-group spacing to parse_pattern's compact tokens:
    # '( A | B )+' -> '(A|B)+', 'PERMUTE(A, B)' -> 'PERMUTE(A,B)'
    pattern = re.sub(r"\s*\|\s*", "|", pattern)
    pattern = re.sub(r"\s*,\s*", ",", pattern)
    pattern = re.sub(r"\(\s+", "(", pattern)
    pattern = re.sub(r"\s+\)", ")", pattern)

    rows_per_match = "all" if "ALL ROWS PER MATCH" in clauses else "one"

    after = clauses.get("AFTER MATCH")
    if after is None:
        after_match = "skip_past_last"  # the ISO default
    else:
        a = " ".join(after.upper().split())
        if a == "SKIP PAST LAST ROW":
            after_match = "skip_past_last"
        elif a == "SKIP TO NEXT ROW":
            after_match = "no_skip"
        else:
            m = re.fullmatch(
                rf"SKIP\s+TO\s+(FIRST\s+|LAST\s+)?({_IDENT})",
                after.strip(),
                re.IGNORECASE,
            )
            if not m:
                raise ValueError(
                    f"AFTER MATCH: SKIP PAST LAST ROW | SKIP TO NEXT ROW "
                    f"| SKIP TO [FIRST|LAST] <var> (got {after!r})"
                )
            which = (m.group(1) or "LAST").strip().lower()
            after_match = f"skip_to_{which} {m.group(2)}"

    within_overall = None
    if "WITHIN" in clauses:
        within_overall = _norm_interval(clauses["WITHIN"])

    subset: dict[str, tuple] = {}
    if "SUBSET" in clauses:
        for ent in _split_top(clauses["SUBSET"]):
            m = re.fullmatch(
                rf"({_IDENT})\s*=\s*\(\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\)",
                ent,
            )
            if not m:
                raise ValueError(f"bad SUBSET entry: {ent!r}")
            subset[m.group(1)] = tuple(
                x.strip() for x in m.group(2).split(",")
            )

    define_sql: dict[str, str] = {}
    for ent in _split_top(clauses["DEFINE"]):
        m = re.match(rf"({_IDENT})\s+AS\s+", ent, re.IGNORECASE)
        if not m:
            raise ValueError(f"bad DEFINE entry (want 'V AS <pred>'): {ent!r}")
        define_sql[m.group(1)] = ent[m.end() :].strip()

    measures_sql: dict[str, str] = {}
    if "MEASURES" in clauses:
        for ent in _split_top(clauses["MEASURES"]):
            m = re.search(rf"\s+AS\s+({_IDENT})$", ent, re.IGNORECASE)
            if not m:
                raise ValueError(
                    f"bad MEASURES entry (want '<expr> AS <name>'): {ent!r}"
                )
            measures_sql[m.group(1)] = ent[: m.start()].strip()

    return {
        "partition_by": part,
        "order_by": order,
        "pattern": pattern,
        "rows_per_match": rows_per_match,
        "after_match": after_match,
        "within_overall": within_overall,
        "subset": subset or None,
        "define_sql": define_sql,
        "measures_sql": measures_sql or None,
    }


def _compile_define(
    var: str, pred: str, all_vars: set[str], order_by: str,
    prev_lags: dict[tuple[str, int], str],
) -> str:
    """DEFINE predicate text → a Spark SQL expression over the input
    columns: ``var.col`` self-refs drop the prefix, PREV(...) becomes the
    precomputed physical-lag column, other-variable refs raise."""
    # PREV(V.col [, n]) / PREV(col [, n]) — physical navigation
    def _sub_prev(text: str) -> str:
        out = []
        i = 0
        while True:
            m = _PREV.search(text, i)
            if not m:
                out.append(text[i:])
                return "".join(out)
            out.append(text[i : m.start()])
            depth, j = 1, m.end()
            while j < len(text) and depth:
                if text[j] == "(":
                    depth += 1
                elif text[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ValueError(f"unbalanced PREV(...) in DEFINE {var}")
            inner = text[m.end() : j - 1].strip()
            parts = _split_top(inner)
            if len(parts) == 1:
                ref, n = parts[0], 1
            elif len(parts) == 2 and parts[1].isdigit():
                ref, n = parts[0], int(parts[1])
            else:
                raise ValueError(
                    f"PREV takes (col [, n]) — got PREV({inner}) in "
                    f"DEFINE {var}"
                )
            rm = re.fullmatch(rf"(?:({_IDENT})\s*\.\s*)?({_IDENT})", ref)
            if not rm:
                raise ValueError(
                    f"PREV navigates a plain column reference — got "
                    f"PREV({inner}) in DEFINE {var}"
                )
            if rm.group(1) is not None and rm.group(1) != var:
                raise ValueError(
                    f"PREV({inner}) in DEFINE {var}: ISO PREV is PHYSICAL "
                    "navigation over the partition's rows — the variable "
                    "prefix must be the defined variable itself"
                )
            col = rm.group(2)
            name = prev_lags.setdefault((col, n), f"__prev{n}_{col}")
            out.append(name)
            i = j

    pred = _sub_prev(pred)
    for nav in ("NEXT", "FIRST", "LAST"):
        if re.search(rf"\b{nav}\s*\(", pred, re.IGNORECASE):
            raise ValueError(
                f"{nav}() in DEFINE is LOGICAL navigation over bound "
                f"variables — the text surface serves self-row predicates "
                f"and physical PREV(); use the dict spec's iter_define "
                f"for bound-variable navigation (DEFINE {var})"
            )

    def mapper(v, c):
        if v == var:
            return c
        if v in all_vars:
            raise ValueError(
                f"DEFINE {var} references {v}.{c} — a prefix-referencing "
                "condition (Flink's IterativeCondition); the text surface "
                "serves self-row predicates, pass iter_define in the dict "
                "spec for cross-variable references"
            )
        return f"{v}.{c}"  # a qualified non-variable name; let Spark judge

    return _rewrite_refs(pred, mapper)


def _compile_measure(
    expr: str, all_vars: set[str], quantified: set[str],
    subset_names: set[str], order_by: str, stream: bool = False,
    excluded: set[str] | None = None,
):
    """MEASURES expression text → RunAgg | Spark SQL expr string over
    the ONE-row output columns.

    ``stream`` (round 11): ``COUNT(V.*)`` (incl. SUBSET unions) stays a
    RunAgg — the dict front-end rewrites it onto the NFA's ``{v}_n`` /
    bound-indicator columns — and ``FIRST/LAST(V.<order_by>)`` compiles
    straight to the run-boundary columns ``{v}_ts`` / ``{v}_last_ts``.
    Round 12 lifts the rest: value aggregates (``SUM/AVG/MIN/MAX``) and
    offset ``FIRST/LAST`` compile to RunAgg exactly as batch — the dict
    front-end streams them through the quantified-chain replayer or
    raises with the route reason. ``excluded`` (round-11 ADVICE): a
    boundary navigation over an EXCLUDED variable raises the curated
    error here — the column it would read is dropped by exclusion
    before MEASURES on the stream."""
    from flink_uba_spark.operators.match_recognize import run_agg

    m = _RUN_AGG.match(expr.strip())
    if m:
        func = m.group(1).lower()
        inner = m.group(2).strip()
        parts = _split_top(inner)
        n = 0
        if func in ("first", "last") and len(parts) == 2 and parts[1].isdigit():
            inner, n = parts[0].strip(), int(parts[1])
        elif len(parts) != 1:
            raise ValueError(f"bad MEASURES aggregate: {expr!r}")
        agg_targets = {
            v for v, _c in _VAR_REF.findall(inner)
            if v in all_vars or v in subset_names
        }
        star = re.fullmatch(rf"({_IDENT})\s*\.\s*\*", inner)
        if star:
            if func != "count":
                raise ValueError(f"{func.upper()}(V.*) — only COUNT takes *")
            return run_agg("count", star.group(1))
        if stream and len(agg_targets) == 1:
            var = next(iter(agg_targets))
            is_ts_nav = re.fullmatch(
                rf"{re.escape(var)}\s*\.\s*{re.escape(order_by)}", inner
            )
            if func in ("first", "last") and is_ts_nav and n == 0:
                if var in (excluded or ()):
                    raise ValueError(
                        f"MEASURES {expr!r} navigates the EXCLUDED "
                        f"variable {var!r} — batch-only on the stream "
                        "(exclusion drops the variable's columns before "
                        "MEASURES here; batch attaches navigation first)"
                    )
                # the run-boundary columns the NFA already emits
                if func == "last" and var in quantified:
                    return f"{var}_last_ts"
                return f"{var}_ts"
            # value aggregates / offset navigation (round 12): compile
            # to RunAgg — the dict front-end routes them through the
            # quantified-chain replayer (value columns ride the buffer)
            # or raises with the real route reason
        if len(agg_targets) == 1:
            var = agg_targets.pop()
            val = _rewrite_refs(
                inner, lambda v, c: c if v == var else f"{v}.{c}"
            )
            return run_agg(func, var, F.expr(val), n)
        if agg_targets:
            raise ValueError(
                f"MEASURES aggregate {expr!r} mixes pattern variables "
                f"{sorted(agg_targets)} — one run per aggregate"
            )
        # no variable target: fall through to the plain-expression path

    def mapper(v, c):
        if v in all_vars or v in subset_names:
            if c == order_by:
                return f"{v}_ts"
            raise ValueError(
                f"MEASURES reference {v}.{c}: the text surface navigates "
                f"the ORDER BY column ({v}.{order_by} → {v}_ts) and the "
                "run aggregates; payload measures take the dict spec"
            )
        return f"{v}.{c}"

    return _rewrite_refs(expr, mapper)


def match_recognize_sql(
    events: DataFrame,
    sql: str,
    withins: dict[str, str] | None = None,
    default_within: str | None = None,
    event_id: str = "event_id",
) -> DataFrame:
    """Run a SQL-text MATCH_RECOGNIZE over ``events`` (see the module
    docstring for the supported text subset). ``withins`` /
    ``default_within`` carry the engine's per-transition bounds — the
    Pattern-API knob ISO text cannot spell; with neither given, the
    clause's ``WITHIN`` bound fills ``default_within`` (a transition can
    never outspan a qualifying match under a monotone ORDER BY)."""
    from flink_uba_spark.operators.match_recognize import (
        match_recognize,
        parse_pattern,
        strip_anchors,
        strip_exclusions,
    )

    spec = parse_match_recognize_sql(sql)
    core, _a, _b = strip_anchors(spec["pattern"])
    core, _x = strip_exclusions(core)
    parsed = parse_pattern(core)
    all_vars = {
        v
        for var, _q in parsed
        for v in (var if isinstance(var, tuple) else (var,))
    }
    quantified = {
        var
        for var, q in parsed
        if not isinstance(var, tuple) and q is not None and q[0] != "optional"
    }
    subset_names = set((spec["subset"] or {}).keys())

    prev_lags: dict[tuple[str, int], str] = {}
    define = {
        v: F.expr(
            _compile_define(v, pred, all_vars, spec["order_by"], prev_lags)
        )
        for v, pred in spec["define_sql"].items()
    }
    if prev_lags:
        w = Window.partitionBy(spec["partition_by"]).orderBy(
            spec["order_by"], event_id
        )
        for (col, n), name in prev_lags.items():
            events = events.withColumn(name, F.lag(col, n).over(w))

    measures = None
    if spec["measures_sql"]:
        measures = {}
        for nm, ex in spec["measures_sql"].items():
            compiled = _compile_measure(
                ex, all_vars, quantified, subset_names, spec["order_by"]
            )
            measures[nm] = (
                F.expr(compiled) if isinstance(compiled, str) else compiled
            )

    if withins is None and default_within is None and spec["within_overall"]:
        default_within = spec["within_overall"]

    return match_recognize(
        events,
        partition_by=spec["partition_by"],
        order_by=spec["order_by"],
        pattern=spec["pattern"],
        define=define,
        withins=withins,
        default_within=default_within,
        measures=measures,
        after_match=spec["after_match"],
        event_id=event_id,
        rows_per_match=spec["rows_per_match"],
        subset=spec["subset"],
        within_overall=spec["within_overall"],
    )


def stream_match_recognize_sql(
    events: DataFrame,
    sql: str,
    withins: dict[str, str] | None = None,
    default_within: str | None = None,
    event_id: str = "event_id",
) -> DataFrame:
    """The SQL-text surface as a CONTINUOUS query — the same clause
    parse compiled onto ``stream_match_recognize`` (round 10; Flink's
    SQL CEP is a streaming surface first). Round 11 streams ``ALL ROWS
    PER MATCH`` on plain/optional chains (per-step NFA ids),
    ``COUNT(V.*)`` / SUBSET counts (the NFA's own count columns) and
    ``FIRST/LAST(V.<ORDER BY col>)`` boundary navigation. Round 12
    streams the rest of the aggregate surface: ``SUM/AVG/MIN/MAX
    (V.<expr>)`` and offset ``FIRST/LAST`` compile to RunAgg exactly as
    batch and route through the quantified-chain replayer (value
    columns ride the buffer; see match_recognize._stream_value_measures
    for the routing matrix), and ALL ROWS composes with quantified
    runs / the replay routes. Still batch-only (raises with the
    reason): ``PREV`` (a partition-ordered lag is unbounded on a
    stream), offset navigation over SUBSET unions, and the specialty
    engines' value aggregates; everything else — quantifiers, groups,
    PERMUTE, exclusions, AFTER MATCH strategies, WITHIN — routes
    through the stream engines' own matrix, whose raises carry the
    real reason."""
    from flink_uba_spark.operators.match_recognize import (
        parse_pattern,
        stream_match_recognize,
        strip_anchors,
        strip_exclusions,
    )

    spec = parse_match_recognize_sql(sql)
    core, _a, _b = strip_anchors(spec["pattern"])
    core, _x = strip_exclusions(core)
    parsed = parse_pattern(core)
    all_vars = {
        v
        for var, _q in parsed
        for v in (var if isinstance(var, tuple) else (var,))
    }
    quantified = {
        var
        for var, q in parsed
        if not isinstance(var, tuple) and q is not None and q[0] != "optional"
    }
    subset_names = set((spec["subset"] or {}).keys())
    prev_lags: dict[tuple[str, int], str] = {}
    define = {
        v: F.expr(
            _compile_define(v, pred, all_vars, spec["order_by"], prev_lags)
        )
        for v, pred in spec["define_sql"].items()
    }
    if prev_lags:
        raise ValueError(
            "PREV() is batch-only on the text surface (the physical lag "
            "is a partition-ordered window — unbounded on a stream)"
        )
    measures = None
    if spec["measures_sql"]:
        measures = {}
        for nm, ex in spec["measures_sql"].items():
            compiled = _compile_measure(
                ex, all_vars, quantified, subset_names, spec["order_by"],
                stream=True, excluded=_x,
            )
            measures[nm] = (
                F.expr(compiled) if isinstance(compiled, str) else compiled
            )
    if withins is None and default_within is None and spec["within_overall"]:
        default_within = spec["within_overall"]
    return stream_match_recognize(
        events,
        partition_by=spec["partition_by"],
        order_by=spec["order_by"],
        pattern=spec["pattern"],
        define=define,
        withins=withins,
        default_within=default_within,
        measures=measures,
        after_match=spec["after_match"],
        event_id=event_id,
        rows_per_match=spec["rows_per_match"],
        subset=spec["subset"],
        within_overall=spec["within_overall"],
    )
