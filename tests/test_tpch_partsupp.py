"""TPC-H q2/q9/q11/q16/q20 over the synthesized partsupp (round 10,
VERDICT r9 item 7).

The driver ships no partsupp, so these five queries are test-gated
only: each runs against its DuckDB oracle (the driver-gate comparison —
row count, column set, order-insensitive value hash) at the conftest SF
with partsupp registered as a view over the SAME deterministic parquet
both engines read. A generator pin asserts the synthesis invariants
(4 distinct suppliers per part, value ranges, bit-identical regen).
"""

from __future__ import annotations

import os

import pytest

from flink_uba_spark.queries.tpch_partsupp import (
    PARTSUPP_ORACLES,
    PARTSUPP_QUERIES,
    partsupp_path,
)
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.fixture(scope="module")
def duck_ps(duck, sf_dir):
    duck.execute(
        "CREATE VIEW IF NOT EXISTS partsupp AS "
        f"SELECT * FROM '{partsupp_path(sf_dir)}'"
    )
    yield duck


def test_partsupp_synthesis_invariants(sf_dir):
    import duckdb

    path = partsupp_path(sf_dir)
    con = duckdb.connect()
    n_part = con.execute(
        f"select count(*) from '{sf_dir}/part.parquet'"
    ).fetchone()[0]
    n_supp = con.execute(
        f"select count(*) from '{sf_dir}/supplier.parquet'"
    ).fetchone()[0]
    rows, parts, pairs = con.execute(
        f"select count(*), count(distinct ps_partkey), "
        f"count(distinct (ps_partkey, ps_suppkey)) from '{path}'"
    ).fetchone()
    assert rows == 4 * n_part
    assert parts == n_part
    assert pairs == rows  # 4 DISTINCT suppliers per part
    lo_q, hi_q, lo_c, hi_c, lo_s, hi_s = con.execute(
        f"select min(ps_availqty), max(ps_availqty), "
        f"min(ps_supplycost), max(ps_supplycost), "
        f"min(ps_suppkey), max(ps_suppkey) from '{path}'"
    ).fetchone()
    assert 1 <= lo_q and hi_q <= 9999
    assert 1.0 <= lo_c and hi_c < 1000.0
    assert 0 <= lo_s and hi_s <= n_supp - 1
    # regeneration is bit-identical (pure arithmetic, no RNG)
    st = os.stat(path)
    os.remove(path)
    path2 = partsupp_path(sf_dir)
    assert path2 == path and os.stat(path).st_size == st.st_size
    a = con.execute(f"select * from '{path}' order by all").fetchall()
    con.close()
    assert len(a) == rows


@pytest.mark.parametrize("name", sorted(PARTSUPP_QUERIES))
def test_tpch_partsupp_oracle(spark, duck_ps, sf_dir, name):
    df = PARTSUPP_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck_ps, PARTSUPP_ORACLES[name])


def test_not_in_driver_catalog():
    """These queries must stay OUT of the driver catalog — its testdata
    ships no partsupp, so a queries() entry would hard-fail the gate."""
    import __spark_entry__ as e

    assert not set(PARTSUPP_QUERIES) & set(e.queries())
    assert not set(PARTSUPP_ORACLES) & set(e.oracle_sql())
