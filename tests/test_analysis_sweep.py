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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_plan_analyzes(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert len(df.schema.fields) > 0
    if name.startswith("stream_"):
        # streaming callables already ran their replay; an empty memory-sink
        # table silently passing is round 2's stream_user_sessions failure
        assert df.count() > 0, f"{name} produced an empty result at {sf_dir}"
