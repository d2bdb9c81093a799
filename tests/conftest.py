from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from flink_uba_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con


def assert_matches_oracle(spark_df, duck_con, oracle_sql):
    """Order-insensitive compare of a Spark result against a DuckDB oracle."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from check import frame_hash

    spdf = spark_df.toPandas()
    opdf = duck_con.execute(oracle_sql).df()
    # empty-vs-empty proves nothing: round 2's stream_user_sessions returned
    # 0 rows with no exception and an equivalence test would have passed
    assert len(opdf) > 0, "oracle returned no rows — vacuous comparison"
    assert len(spdf) == len(opdf), f"row count {len(spdf)} != {len(opdf)}"
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert frame_hash(spdf) == frame_hash(opdf)
