"""Catalog-integrity pins (no Spark session needed).

Round-6 regression class: commit b30e492 copy-extended a query block and
re-used the module-level constant name ``REVENUE_ROLLUP_ORACLE``, so Python
shadowing silently pointed ``ORACLES["revenue_rollup"]`` at the wrong SQL
(VERDICT r6 "What's wrong" #1). These pins make that class impossible to
ship again: distinct queries may never share an oracle string, every oracle
must have a query, and names may not collide across catalog modules.
"""

from __future__ import annotations

from collections import defaultdict

from flink_uba_spark.queries import _MODULES, all_oracles, all_queries


def test_every_oracle_has_a_query():
    queries, oracles = all_queries(), all_oracles()
    missing = sorted(set(oracles) - set(queries))
    assert not missing, f"oracles without a queries() entry: {missing}"


def _intentional_share(names: list[str]) -> bool:
    """Batch queries and their streaming twins deliberately share one oracle
    (same semantics, different engine). Allowed shapes: ``x`` + ``stream_x``,
    a documented pair below, or the hot_items DataFrame/SQL twin."""
    allow = {
        ("daily_anomaly_days", "stream_daily_anomaly"),
        ("event_transition_matrix", "stream_event_transitions"),
        ("attribution_interval_join", "stream_attribution_join"),
        ("ivf_index_upsert", "stream_ivf_upsert"),
        ("semantic_kmeans_assign", "stream_kmeans_assign"),
        ("hot_items", "hot_items_sql"),
        # SQL-TEXT twins (round 10): the text surface deliberately pins
        # text-parse ≡ dict-spec by pairing with the dict twin's oracle
        ("match_recognize_error_run", "match_recognize_sql_error_run"),
        ("match_recognize_skip_to_first", "match_recognize_sql_skip_to_first"),
        ("match_recognize_sql_subset_agg", "match_recognize_subset_agg"),
        ("stream_match_recognize_sql_text", "stream_match_recognize_within_skip"),
        # round 11: the streaming run-agg / ALL ROWS text twins pin
        # text-parse ≡ dict-spec the same way
        ("stream_match_recognize_error_streak", "stream_match_recognize_sql_run_agg"),
        ("stream_match_recognize_all_rows", "stream_match_recognize_sql_all_rows"),
        # round 12: the streaming VALUE-aggregate text twin pins
        # text-parse ≡ dict-spec the same way (see
        # stream_match_recognize_sql_value_agg's docstring)
        (
            "stream_match_recognize_sql_value_agg",
            "stream_match_recognize_value_run_agg",
        ),
    }
    s = sorted(names)
    if len(s) != 2:
        return False
    a, b = s
    # either member may be the stream twin — alphabetical order flips
    # when the batch name sorts after "stream_" (e.g. window_*)
    return b == f"stream_{a}" or a == f"stream_{b}" or (a, b) in allow


def test_no_two_distinct_queries_share_an_oracle():
    """Two catalog entries may share oracle SQL only if they run the SAME
    query function OR are a declared batch/streaming twin pair — otherwise
    one oracle has been clobbered (the round-6 shadowing bug)."""
    queries, oracles = all_queries(), all_oracles()
    by_sql: dict[str, list[str]] = defaultdict(list)
    for name, sql in oracles.items():
        by_sql[sql.strip()].append(name)
    offenders = {
        tuple(sorted(names)): [queries[n].__name__ for n in names]
        for names in by_sql.values()
        if len(names) > 1
        and len({id(queries[n]) for n in names}) > 1
        and not _intentional_share(names)
    }
    assert not offenders, (
        "distinct query functions share identical oracle SQL "
        f"(likely a shadowed module constant): {offenders}"
    )


def test_no_query_name_collisions_across_modules():
    """dict.update in all_queries() silently drops earlier entries on a name
    collision — assert no two modules define the same query name."""
    seen: dict[str, str] = {}
    dupes = []
    for mod in _MODULES:
        for name in mod.QUERIES:
            if name in seen:
                dupes.append((name, seen[name], mod.__name__))
            seen[name] = mod.__name__
    assert not dupes, f"query names defined in more than one module: {dupes}"


def test_no_duplicate_module_level_oracle_constants():
    """Scan each catalog module's source for a module-level NAME = assignment
    that appears twice — the exact shadowing bug shipped in round 6."""
    import ast
    import inspect

    offenders = []
    for mod in _MODULES:
        tree = ast.parse(inspect.getsource(mod))
        counts: dict[str, int] = defaultdict(int)
        for node in tree.body:
            if isinstance(node, ast.Assign):
                for tgt in node.targets:
                    if isinstance(tgt, ast.Name):
                        counts[tgt.id] += 1
        for name, n in counts.items():
            if n > 1 and name.isupper():
                offenders.append((mod.__name__, name, n))
    assert not offenders, f"module-level constant assigned more than once: {offenders}"
