"""Named query catalog.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL twin, omitted for
non-SQL-expressible ops). ``__spark_entry__`` at the repo root merges them.

Determinism contract (so Spark-vs-DuckDB value hashes can never drift):
every query output column is an integer, string, or timestamp — or a double
produced by a single IEEE operation on exactly-representable integers
(e.g. cents-as-BIGINT sums divided once). No order-dependent float sums.
"""

from __future__ import annotations

from flink_uba_spark.queries import (
    behavior,
    datapipe,
    rowpattern,
    streaming,
    temporal,
    tpch,
    uba,
)

_MODULES = (uba, tpch, datapipe, streaming, behavior, temporal, rowpattern)


def all_queries():
    merged = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    return merged


def all_oracles():
    merged = {}
    for mod in _MODULES:
        merged.update(mod.ORACLES)
    return merged
