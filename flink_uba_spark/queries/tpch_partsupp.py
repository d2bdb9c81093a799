"""TPC-H q2/q9/q11/q16/q20 — the five queries blocked on ``partsupp``,
closed at TEST level with a synthesized table (round 10, VERDICT r9
item 7).

The driver's testdata ships no partsupp (re-verified every round since
r7), so these queries CANNOT join the driver gate — they live here as
locally-oracle-checked surface (tests/test_tpch_partsupp.py runs each
against its DuckDB twin at sf0.001 + sf0.01), deliberately NOT
registered in the catalog ``QUERIES``/``ORACLES`` maps.

``partsupp`` synthesis (documented in FIXTURES.md): a pure-arithmetic
deterministic table derived from the sf dir's part/supplier COUNTS —
no RNG, no state, so any two runs (and both engines, which read the
same parquet) agree bit-for-bit. Each part gets 4 suppliers at evenly
spaced offsets (dbgen's shape: part p's i-th supplier is
``(p + i*(S//4) + p//S) % S`` — distinct for S ≥ 4 since the offsets
are distinct mod S), availqty/supplycost are small affine-mod formulas
in (p, i). Written once per SF under ``fixtures/partsupp/`` and reused.

Determinism contract (queries/tpch.py): money stays floor-cents BIGINT
end-to-end — ``ps_supplycost`` enters every aggregate as
``floor(x*100)`` — so Spark and DuckDB results are bit-equal with no
float tolerance. Reduced-schema adaptations (the driver's star schema
drops p_mfgr / s_comment / l_commitdate etc.) are noted per query.

Scale notes: partsupp is a TRUE dimension-bridge (4 rows per part —
~0.8% of lineitem at any SF) and is declared plainly so AQE picks the
join strategy; q11/q16's grand totals are 1-row broadcast-crossed
scalars, never driver collects; q2's per-part minimum is one hash
aggregate over partsupp, not a self-join.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_uba_spark.sources.readers import load_testdata

_FIXTURE_DIR = Path(__file__).resolve().parents[2] / "fixtures" / "partsupp"


def _cents(col):
    return F.floor(col * 100).cast("long")


def partsupp_path(sf_dir: str) -> str:
    """Generate (once) and return the deterministic partsupp parquet for
    the given testdata sf dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import numpy as np
    import duckdb

    tag = Path(sf_dir).name or Path(sf_dir).parent.name
    out = _FIXTURE_DIR / f"{tag}.parquet"
    if out.exists():
        return str(out)
    con = duckdb.connect()
    n_part = con.execute(
        f"select count(*) from read_parquet('{sf_dir}/part.parquet')"
    ).fetchone()[0]
    n_supp = con.execute(
        f"select count(*) from read_parquet('{sf_dir}/supplier.parquet')"
    ).fetchone()[0]
    con.close()
    p = np.repeat(np.arange(n_part, dtype="int64"), 4)
    i = np.tile(np.arange(4, dtype="int64"), n_part)
    sk = (p + i * (n_supp // 4) + p // n_supp) % n_supp
    availqty = ((p * 7 + i * 13) % 9999) + 1
    supplycost = (((p * 31 + i * 17 + (p % 5)) % 99900) + 100) / 100.0
    _FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    tmp = str(out) + f".tmp{os.getpid()}"
    pq.write_table(
        pa.table(
            {
                "ps_partkey": p,
                "ps_suppkey": sk,
                "ps_availqty": availqty.astype("int32"),
                "ps_supplycost": supplycost,
            }
        ),
        tmp,
    )
    os.replace(tmp, out)  # atomic: a concurrent generator never tears
    return str(out)


def _tables(spark: SparkSession, sf_dir: str, names: tuple) -> dict:
    t = load_testdata(spark, sf_dir, tuple(n for n in names if n != "partsupp"))
    if "partsupp" in names:
        t["partsupp"] = spark.read.parquet(partsupp_path(sf_dir))
    return t


# --------------------------------------------------------------------- q2
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H q2, reduced schema: no p_mfgr /
    s_address / s_phone / s_comment in the driver's star). For STANDARD
    parts of size 15, the EUROPE supplier(s) at each part's minimum
    supplycost, ordered by account balance."""
    t = _tables(
        spark, sf_dir,
        ("part", "supplier", "nation", "region", "partsupp"),
    )
    eu_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t["part"].filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") == 15)
    ).select("p_partkey")
    cand = (
        t["partsupp"]
        .join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(eu_supp, F.col("ps_suppkey") == F.col("s_suppkey"))
        .withColumn("cost_cents", _cents(F.col("ps_supplycost")))
    )
    from pyspark.sql import Window

    # per-part minimum as a window aggregate — one exchange on the part
    # key, no self-join (the spec's correlated subquery shape)
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost_cents", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("min_cost_cents"))
        .select(
            _cents(F.col("s_acctbal")).alias("s_acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
            F.col("cost_cents").alias("supplycost_cents"),
        )
        .orderBy(
            F.col("s_acctbal_cents").desc(), "n_name", "s_name", "p_partkey"
        )
    )


TPCH_Q2_ORACLE = """
WITH eu AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
),
cand AS (
    SELECT ps_partkey AS p_partkey, s_acctbal, s_name, n_name,
           CAST(floor(ps_supplycost * 100) AS BIGINT) AS cost_cents
    FROM partsupp
    JOIN (SELECT p_partkey FROM part
          WHERE p_type = 'STANDARD' AND p_size = 15) p
      ON ps_partkey = p.p_partkey
    JOIN eu ON ps_suppkey = eu.s_suppkey
)
SELECT CAST(floor(s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
       s_name, n_name, p_partkey, cost_cents AS supplycost_cents
FROM cand c
WHERE cost_cents = (SELECT min(cost_cents) FROM cand m
                    WHERE m.p_partkey = c.p_partkey)
ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
"""


# --------------------------------------------------------------------- q9
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H q9): per (nation, order year), the
    profit on 'gear' parts — revenue minus supply cost — in exact cents
    (profit_cents = floor(extprice*(1-disc)*100) − supplycost_cents ×
    quantity). Joins partsupp on BOTH keys (the composite-key bridge)."""
    t = _tables(
        spark, sf_dir,
        ("lineitem", "orders", "part", "supplier", "nation", "partsupp"),
    )
    gear = t["part"].filter(F.col("p_name").like("%gear%")).select("p_partkey")
    li = (
        t["lineitem"]
        .join(F.broadcast(gear), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            t["partsupp"],
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    )
    profit = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) - _cents(F.col("ps_supplycost")) * F.col("l_quantity").cast("long")
    return (
        li.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).alias("profit_cents"))
        .orderBy("nation", F.col("o_year").desc())
    )


TPCH_Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                - CAST(floor(ps_supplycost * 100) AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem
JOIN (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%') p
  ON l_partkey = p.p_partkey
JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# -------------------------------------------------------------------- q11
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H q11): parts whose NATION_3
    stock value (supplycost_cents × availqty, exact) exceeds 0.1% of the
    nation's total — the threshold compare stays integral
    (1000 × value > total), and the total is a 1-row broadcast cross,
    never a driver collect."""
    t = _tables(spark, sf_dir, ("supplier", "nation", "partsupp"))
    n3 = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    val = (
        t["partsupp"]
        .join(F.broadcast(n3), F.col("ps_suppkey") == F.col("s_suppkey"))
        .withColumn(
            "value_cents",
            _cents(F.col("ps_supplycost")) * F.col("ps_availqty").cast("long"),
        )
    )
    by_part = val.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("value_cents")
    )
    total = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        by_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select("ps_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "ps_partkey")
    )


TPCH_Q11_ORACLE = """
WITH val AS (
    SELECT ps_partkey,
           CAST(floor(ps_supplycost * 100) AS BIGINT)
             * CAST(ps_availqty AS BIGINT) AS value_cents
    FROM partsupp
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
)
SELECT ps_partkey, CAST(SUM(value_cents) AS BIGINT) AS value_cents
FROM val
GROUP BY ps_partkey
HAVING SUM(value_cents) * 1000 > (SELECT SUM(value_cents) FROM val)
ORDER BY value_cents DESC, ps_partkey
"""


# -------------------------------------------------------------------- q16
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H q16, reduced schema: the
    driver's star drops s_comment, so the spec's complaint exclusion is
    replaced — documented — by excluding NEGATIVE-balance suppliers):
    distinct supplier counts per (brand, type, size) for three sizes,
    excluding BRAND_11 and PROMO parts."""
    t = _tables(spark, sf_dir, ("part", "supplier", "partsupp"))
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t["part"].filter(
        (F.col("p_brand") != "BRAND_11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(5, 15, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        t["partsupp"]
        .join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


TPCH_Q16_ORACLE = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'BRAND_11' AND p_type <> 'PROMO'
  AND p_size IN (5, 15, 25)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# -------------------------------------------------------------------- q20
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H q20): NATION_3 suppliers holding
    a 'small' part whose available stock strictly exceeds half the 1996
    shipped quantity of that (part, supplier) — integral compare
    (2 × availqty > shipped)."""
    t = _tables(
        spark, sf_dir,
        ("lineitem", "part", "supplier", "nation", "partsupp"),
    )
    small = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("shipped_qty"))
    )
    hot = (
        t["partsupp"]
        .join(F.broadcast(small), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty").cast("long") * 2 > F.col("shipped_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .join(hot, F.col("s_suppkey") == F.col("ps_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_name", "s_suppkey")
    )


TPCH_Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT ps_suppkey
    FROM partsupp
    JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') p
      ON ps_partkey = p.p_partkey
    JOIN (SELECT l_partkey, l_suppkey,
                 SUM(CAST(l_quantity AS BIGINT)) AS shipped_qty
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY 1, 2) sh
      ON ps_partkey = sh.l_partkey AND ps_suppkey = sh.l_suppkey
    WHERE CAST(ps_availqty AS BIGINT) * 2 > shipped_qty
  )
ORDER BY s_name, s_suppkey
"""


# test-gated surface (NOT in the driver catalog — testdata ships no
# partsupp); tests/test_tpch_partsupp.py runs these against the oracles
PARTSUPP_QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q9_product_type_profit": tpch_q9_product_type_profit,
    "tpch_q11_important_stock": tpch_q11_important_stock,
    "tpch_q16_supplier_part_counts": tpch_q16_supplier_part_counts,
    "tpch_q20_potential_promotion": tpch_q20_potential_promotion,
}

PARTSUPP_ORACLES = {
    "tpch_q2_min_cost_supplier": TPCH_Q2_ORACLE,
    "tpch_q9_product_type_profit": TPCH_Q9_ORACLE,
    "tpch_q11_important_stock": TPCH_Q11_ORACLE,
    "tpch_q16_supplier_part_counts": TPCH_Q16_ORACLE,
    "tpch_q20_potential_promotion": TPCH_Q20_ORACLE,
}
