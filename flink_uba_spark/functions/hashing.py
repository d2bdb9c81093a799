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


MERSENNE31 = 2147483647  # modulus for affine min-hash permutations

# n-gram combiner constants: shingle hash = Σ token_hash[i+j]·NGRAM_C[j] mod M.
# Odd, < 2²⁸ (md5-derived once, frozen) so each product stays < 2⁵⁹ — exact
# 64-bit integer arithmetic on every engine.
NGRAM_C = (
    int(hashlib.md5(b"ngram0").hexdigest()[:7], 16) | 1,
    int(hashlib.md5(b"ngram1").hexdigest()[:7], 16) | 1,
    int(hashlib.md5(b"ngram2").hexdigest()[:7], 16) | 1,
)


@lru_cache(maxsize=None)
def minhash_perm_constants(num_perm: int) -> tuple[tuple[int, int], ...]:
    """(a, b) per permutation for h ↦ (a·h + b) mod 2³¹−1.

    a is odd and < 2²⁸ so a·h < 2⁵⁹ stays exact in 64-bit integers on both
    engines; constants are md5-derived, fixed forever.
    """
    out = []
    for p in range(num_perm):
        a = int(hashlib.md5(f"a{p}".encode()).hexdigest()[:7], 16) | 1
        b = int(hashlib.md5(f"b{p}".encode()).hexdigest()[:7], 16)
        out.append((a, b))
    return tuple(out)


def weights_sql_literal(planes: int, dim: int) -> list[str]:
    """Each plane's weights as a DuckDB BIGINT[] literal string."""
    ws = hyperplane_weights(planes, dim)
    return ["[" + ",".join(str(w) for w in row) + "]::BIGINT[]" for row in ws]
