"""Analysis smoke sweep over the ENTIRE query catalog (VERDICT round 2,
item 4).  Building each ``queries()`` plan at sf0.001 and touching
``df.schema`` forces Catalyst analysis — this is the test that would have
caught the round-2 TIMESTAMP_NTZ drift (``unix_micros()`` rejecting NTZ) the
moment the driver's testdata encoding changed, for every query at once,
without paying execution time.

Note: the ``stream_*`` entries materialize their bounded replay when called
(their callables return the final memory-sink table), so for those this is
an execute-and-nonempty check at sf0.001 — which is exactly the non-empty
guard VERDICT item 8 asks for at catalog level.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


# Tiering (VERDICT r12 item 1): batch entries only ANALYZE (cheap — the
# whole catalog stays in the default tier), but ``stream_*`` entries
# EXECUTE their bounded replay when called, ~2-4 s each × 80. The default
# keeps one executing stream representative per twin family; the full
# stream sweep runs under `pytest -m slow` (and every stream query is also
# executed against its oracle by tools/check.py sweeps each round).
_STREAM_FAST = {
    "stream_hot_items",          # windowed topn
    "stream_user_sessions",      # session gap state
    "stream_pattern_view_click_purchase",   # pattern NFA twin
    "stream_match_recognize_all_rows",      # MR replay twin
    "stream_dedup_events",       # dedup state
    "stream_tx_reconcile",       # co-stream join
    "stream_kmeans_assign",      # Arrow-kernel serving
    "stream_corpus_ingest",      # document stream
}
_CELLS = [
    pytest.param(
        n,
        marks=()
        if (not n.startswith("stream_") or n in _STREAM_FAST)
        else (pytest.mark.slow,),
        id=n,
    )
    for n in sorted(QUERIES)
]


@pytest.mark.parametrize("name", _CELLS)
def test_query_plan_analyzes(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert len(df.schema.fields) > 0
    if name.startswith("stream_"):
        # streaming callables already ran their replay; an empty memory-sink
        # table silently passing is round 2's stream_user_sessions failure
        assert df.count() > 0, f"{name} produced an empty result at {sf_dir}"
