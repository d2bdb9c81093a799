"""Skew and co-location tools: salted joins and bucketed tables.

AQE's skew-join splitting (on by default, session.py) handles most skew at
runtime; these are the explicit tools for the cases AQE can't fix:

- ``salted_join``: a hot-key aggregate/join where one key dominates (the
  celebrity-user problem). The skewed side gets a uniform random-salt
  column; the small side is exploded across all salt values and broadcast
  or shuffled on (key, salt) — the hot key's rows spread over ``salt``
  partitions instead of one straggler task.
- ``write_bucketed`` / bucketed reads: co-locate repeatedly-joined tables
  on their join key at write time; Spark then plans the join with NO
  exchange on either side (verified in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: spread each key over
    ``salt`` sub-partitions; replicate ``small`` across every salt value.

    Result equals ``skewed.join(small, on, how)`` (asserted in tests); the
    exchange keys on (key, salt) so no single task owns a hot key.
    ``how`` supports inner/left joins (the skewed side survives intact).

    Routing is CONTENT-deterministic: salt = pmod(xxhash64(all columns),
    salt) — identical under task retries and input re-splits, unlike
    ``rand(seed)`` whose assignment depends on the partition layout
    (ADVICE r1). Exact-duplicate rows of a hot key share a salt bucket;
    that residual imbalance is bounded by the duplicate multiplicity.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    salted_left = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)).cast("int"),
    )
    exploded_right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(exploded_right, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.
    Joins between tables bucketed the same way plan with zero exchanges."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
