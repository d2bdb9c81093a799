"""Deterministic hash-derived constants shared by Spark plans and DuckDB
oracle SQL.

Hyperplane weights for sign-pattern (SimHash-style) embedding LSH: weight
(p, d) is an odd integer in [−15, 15] derived from md5(f"{p}_{d}") — fixed
forever, no RNG, embeddable as literals on both engines.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache


@lru_cache(maxsize=None)
def hyperplane_weights(planes: int, dim: int) -> tuple[tuple[int, ...], ...]:
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()
            row.append(int(h[0], 16) * 2 - 15)  # odd ints −15..15, never 0
        out.append(tuple(row))
    return tuple(out)


def weights_sql_literal(planes: int, dim: int) -> list[str]:
    """Each plane's weights as a DuckDB BIGINT[] literal string."""
    ws = hyperplane_weights(planes, dim)
    return ["[" + ",".join(str(w) for w in row) + "]::BIGINT[]" for row in ws]
