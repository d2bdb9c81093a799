"""General analytics over the TPC-H-ish star schema (TESTDATA.md).

The reference is a pure-streaming UBA suite; these queries prove the same
engine serves the tables-at-rest side (scan → filter → join → agg → rank)
with Catalyst doing pushdown/pruning/broadcast — the §4 conclusion that no
custom optimizer work is needed.

Determinism contract: money aggregates are ``floor(x*100)`` cents summed as
BIGINT — floor (unlike round) has no tie-breaking ambiguity, and integer
sums are order-independent, so Spark and DuckDB hashes match bit-for-bit.
Averages are a single double division of exact integers.

Scale notes (100 TB design point):
- q1/q6: map-side partial agg → 6-group / 1-row final; scan-bound. Filters
  and column pruning reach the parquet reader (PushedFilters in explain).
- Broadcast discipline (ADVICE r1): ``F.broadcast`` is reserved for TRUE
  dimensions (region, nation, supplier, part — bounded or ~1000× smaller
  than the facts). orders/customer sides are declared plainly so
  Catalyst/AQE picks the strategy from runtime stats: at test SF they still
  broadcast (tiny files); at 100 TB they become shuffle joins instead of
  OOMing the driver with a fact-sized broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_uba_spark.sources.readers import load_testdata


def _cents(col):
    return F.floor(col * 100).cast("long")


# --------------------------------------------------------------------- q1
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_testdata(spark, sf_dir, ("lineitem",))["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_price_cents"),
            F.sum(_cents(disc_price)).alias("sum_disc_price_cents"),
            F.sum(_cents(charge)).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty").cast("double") / F.col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


TPCH_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
       count(*) AS count_order,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------- q3
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders.join(cust, orders.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("o_orderkey"))
        .limit(10)
    )


TPCH_Q3_ORACLE = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------- q5
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(
        spark, sf_dir, ("region", "nation", "customer", "supplier", "orders", "lineitem")
    )
    dims = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    cust = t["customer"].join(F.broadcast(dims), F.col("c_nationkey") == dims.n_nationkey).select(  # dims = 5 nations
        "c_custkey", F.col("n_nationkey").alias("cn_key"), "n_name"
    )
    supp = t["supplier"].select("s_suppkey", "s_nationkey")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), (F.col("l_suppkey") == supp.s_suppkey) & (supp.s_nationkey == F.col("cn_key")))
        .groupBy("n_name")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("n_name"))
    )


TPCH_Q5_ORACLE = """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue_cents DESC, n_name ASC
"""


# --------------------------------------------------------------------- q6
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_testdata(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue_cents"))
    )


TPCH_Q6_ORACLE = """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# -------------------------------------------------------------------- q10
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = t["customer"].select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


TPCH_Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_cents DESC, c_custkey ASC
LIMIT 20
"""


# -------------------------------------------------------------------- q14
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    disc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(t["part"].select("p_partkey", "p_type")),
                li.l_partkey == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0))).alias("promo_cents"),
            F.sum(disc).alias("total_cents"),
        )
        .withColumn(
            "promo_pct", F.lit(100.0) * F.col("promo_cents") / F.col("total_cents")
        )
    )


TPCH_Q14_ORACLE = """
SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       100.0 * sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                        ELSE 0 END)
             / sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS promo_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


# --------------------------------------------------------------------- q4
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking — the SEMI-JOIN shape (EXISTS subquery).
    The commit/receipt-date predicate of canonical q4 maps to 'a lineitem
    shipped >90 days after the order date' on this schema."""
    t = load_testdata(spark, sf_dir, ("orders", "lineitem"))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


TPCH_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------- q7
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume: supplier nation ↔ customer nation pairs
    (NATION_1/NATION_2 stand in for FRANCE/GERMANY) by ship year."""
    t = load_testdata(spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation"))
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        t["lineitem"].select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"].select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"].select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


TPCH_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume_cents) AS BIGINT) AS revenue_cents
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS volume_cents
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# -------------------------------------------------------------------- q18
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: the HAVING-subquery (aggregate semi-join) shape."""
    t = load_testdata(spark, sf_dir, ("customer", "orders", "lineitem"))
    big = (
        t["lineitem"].groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        t["orders"].join(big, t["orders"].o_orderkey == big.l_orderkey)
        .join(t["customer"].select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            _cents(F.col("o_totalprice")).alias("totalprice_cents"), "sum_qty",
        )
        .orderBy(F.desc("sum_qty"), F.asc("o_orderkey"))
    )


TPCH_Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(floor(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       sum_qty
FROM customer, orders,
     (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 250) big
WHERE o_orderkey = big.l_orderkey AND c_custkey = o_custkey
ORDER BY sum_qty DESC, o_orderkey ASC
"""


# ---------------------------------------------------------------- rollup
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set analytics (rollup over nation × order-year) — not in the
    reference (SURVEY.md §2.7 'not present'), included as engine surface."""
    t = load_testdata(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    enriched = (
        t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
        .join(t["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"].select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.year("o_orderdate").cast("long").alias("o_year"),
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("cents"),
        )
    )
    return enriched.rollup("n_name", "o_year").agg(F.sum("cents").alias("revenue_cents"))


REVENUE_ROLLUP_ORACLE = """
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem, orders, customer, nation
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey AND c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, CAST(year(o_orderdate) AS BIGINT))
"""


# --------------------------------------------------------------------- q8
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_7's share of PROMO-part
    revenue among EUROPE customers, by order year. partsupp does not exist
    in the testdata so the query is the standard 7-table form minus it.

    Share = cents(nation) / cents(all) — two exact BIGINT sums and ONE
    IEEE division (determinism contract). Dimension sides (part filter,
    supplier→nation, customer-nation→region) broadcast; lineitem/orders/
    customer join strategy is AQE's.
    """
    t = load_testdata(
        spark, sf_dir,
        ("region", "nation", "customer", "supplier", "orders", "lineitem", "part"),
    )
    promo = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp_nat = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    eur_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = t["customer"].join(
        F.broadcast(eur_nations), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year"))
    li = t["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol_cents"),
    )
    vol = (
        li.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("vol_cents")).otherwise(F.lit(0)))
            .alias("nation_cents"),
            F.sum("vol_cents").alias("total_cents"),
        )
        .select(
            "o_year", "nation_cents", "total_cents",
            (F.col("nation_cents").cast("double") / F.col("total_cents").cast("double"))
            .alias("mkt_share"),
        )
        .orderBy("o_year")
    )


TPCH_Q8_ORACLE = """
WITH vol AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS vol_cents,
           n2.n_name AS supp_nation
    FROM lineitem, part, orders, customer, supplier, nation n1, nation n2, region
    WHERE l_partkey = p_partkey AND p_type = 'PROMO'
      AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
      AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol_cents ELSE 0 END) AS BIGINT)
           AS nation_cents,
       CAST(sum(vol_cents) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol_cents ELSE 0 END) AS DOUBLE)
           / CAST(sum(vol_cents) AS DOUBLE) AS mkt_share
FROM vol GROUP BY o_year ORDER BY o_year
"""


# --------------------------------------------------------------------- q13
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution), minus the o_comment
    NOT LIKE filter (column absent in testdata). Left outer join keeps
    zero-order customers; two aggregations re-use the same exchange only
    at the second groupBy's small cardinality — the heavy exchange is the
    c_custkey count, map-side partial first."""
    t = load_testdata(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


TPCH_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# --------------------------------------------------------------------- q19
def tpch_q19_brand_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive brand/size/quantity bands; the
    shipmode/shipinstruct legs are absent from the testdata schema).
    The OR-of-conjunctions is an equi-join on partkey with the
    disjunction as the join residual — never a nested loop — and each
    leg's part-side conjuncts (brand, size) still prune the broadcast
    build side."""
    t = load_testdata(spark, sf_dir, ("lineitem", "part"))
    part = t["part"].select("p_partkey", "p_brand", "p_size")
    li = t["lineitem"].select(
        "l_partkey", "l_quantity",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("cents"),
    )
    band = (
        ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 30))
    )
    pre = F.col("p_brand").isin("Brand#4", "Brand#2", "Brand#19")
    return (
        li.join(F.broadcast(part.filter(pre)), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(F.sum("cents").alias("revenue_cents"))
    )


TPCH_Q19_ORACLE = """
SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND ((p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30))
"""


def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete (nearest-rank) p50/p90/p99 of order value per
    priority class. Nearest-rank over cents-BIGINT keeps the whole query
    in integer arithmetic — interpolated percentiles (quantile_cont /
    Spark ``percentile``) produce engine-specific float blends, so the
    discrete form is the deterministic one.

    Plan: ONE exchange on priority; the ranking window and the final
    aggregate both reuse it (ClusteredDistribution satisfied). The rank
    tiebreak (o_orderkey) affects which ROW sits at rank k, never the
    VALUE there, so the answer is tie-free by construction.
    """
    from pyspark.sql import Window

    t = load_testdata(spark, sf_dir, ("orders",))
    w = Window.partitionBy("priority").orderBy(F.asc("cents"), F.asc("o_orderkey"))
    ranked = (
        t["orders"]
        .select(
            F.col("o_orderpriority").alias("priority"),
            _cents(F.col("o_totalprice")).alias("cents"),
            "o_orderkey",
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("priority")).cast("long")
        )
    )

    def at(pct):  # nearest-rank: value at ceil(pct/100 * n), exact ints
        k = F.expr(f"({pct} * n + 99) div 100")
        return F.max(F.when(F.col("rn") == k, F.col("cents")))

    return ranked.groupBy("priority").agg(
        at(50).alias("p50_cents"),
        at(90).alias("p90_cents"),
        at(99).alias("p99_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def order_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch tier of ``order_value_percentiles``: Spark's
    ``percentile_approx`` (Greenwald-Khanna summaries, merged map-side) with
    the rank-error guarantee folded INTO the output — the same contract
    shape as ``daily_users_approx``. The raw estimate is merge-order- and
    engine-specific, so the verifiable cross-engine fact is the GUARANTEE:
    for accuracy A the returned value's rank interval [cnt_lt+1, cnt_le]
    must intersect [(p−e)·n, (p+e)·n] with e = 1/A — an invariant GK
    maintains under ANY merge order, so ``pXX_ok`` is deterministically
    TRUE and the DuckDB oracle asserts it row-by-row (±1 rank slack guards
    the integer boundary).

    At 100 TB this is the percentile you actually run: the exact
    nearest-rank form must rank every row per key, the sketch reduces the
    exchange to O(A·log n) summary tuples per key, merged associatively.
    Plan: one scan feeds both the sketch agg and the verification counts;
    the 5-row sketch frame broadcasts back.
    """
    t = load_testdata(spark, sf_dir, ("orders",))
    cents = t["orders"].select(
        F.col("o_orderpriority").alias("priority"),
        _cents(F.col("o_totalprice")).alias("cents"),
    )
    acc = 100  # e = 1% relative rank error
    appx = cents.groupBy("priority").agg(
        F.percentile_approx("cents", [0.5, 0.9, 0.99], acc).alias("v")
    )
    j = cents.join(F.broadcast(appx), "priority")
    pmille = {"p50": 500, "p90": 900, "p99": 990}
    emille = 1000 // acc
    aggs = [F.count(F.lit(1)).alias("n_orders")]
    for i, name in enumerate(["p50", "p90", "p99"]):
        v = F.col("v")[i]
        aggs.append(F.sum((F.col("cents") <= v).cast("long")).alias(f"__le_{name}"))
        aggs.append(F.sum((F.col("cents") < v).cast("long")).alias(f"__lt_{name}"))
    g = j.groupBy("priority").agg(*aggs)
    out_cols = [F.col("priority"), F.col("n_orders")]
    for name in ["p50", "p90", "p99"]:
        p, e = pmille[name], emille
        lo_ok = (F.col(f"__le_{name}") + 1) * 1000 >= F.lit(p - e) * F.col("n_orders")
        hi_ok = F.col(f"__lt_{name}") * 1000 <= F.lit(p + e) * F.col("n_orders") + 1000
        out_cols.append((lo_ok & hi_ok).alias(f"{name}_ok"))
    return g.select(*out_cols)


ORDER_VALUE_PERCENTILES_APPROX_ORACLE = """
SELECT o_orderpriority AS priority, count(*) AS n_orders,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM orders GROUP BY 1
"""


ORDER_VALUE_PERCENTILES_ORACLE = """
WITH c AS (
    SELECT o_orderpriority AS priority,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
    FROM orders
), r AS (
    SELECT priority, cents,
           row_number() OVER (PARTITION BY priority
                              ORDER BY cents ASC, o_orderkey ASC) AS rn,
           count(*) OVER (PARTITION BY priority) AS n
    FROM c
)
SELECT priority,
       max(CASE WHEN rn = (50 * n + 99) // 100 THEN cents END) AS p50_cents,
       max(CASE WHEN rn = (90 * n + 99) // 100 THEN cents END) AS p90_cents,
       max(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END) AS p99_cents,
       count(*) AS n_orders
FROM r GROUP BY priority
"""


# -------------------------------------------------------------------- q15
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 (top supplier): per-supplier revenue over one quarter, return
    the supplier(s) hitting the maximum (ties kept, per the spec's view
    formulation). The max is a 1-row broadcast joined back — never a
    corpus-wide window — so the plan is two exchanges (supplier rollup,
    nothing else): revenue agg → 1-row max → broadcast-filter → dim join."""
    t = load_testdata(spark, sf_dir, ("lineitem", "supplier"))
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "total_revenue_cents"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue_cents").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_revenue_cents"] == mx["__mx"])
        .join(F.broadcast(t["supplier"]), rev["l_suppkey"] == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
    )


TPCH_Q15_ORACLE = """
WITH rev AS (
    SELECT l_suppkey,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
               AS total_revenue_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
"""


# -------------------------------------------------------------------- q17
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 (small-quantity-order revenue), adapted to the testdata schema:
    p_container is not carried, so the part filter is brand-only. The
    fractional-average condition qty < 0.2·avg(qty per part) is evaluated
    in pure integers (5·qty·n < Σqty — l_quantity is integral in this
    data, asserted by the cast), so the boundary cannot drift between
    engines. Per-part stats join back on the part key; one lineitem
    rollup exchange + one co-keyed join."""
    t = load_testdata(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].select(
        "l_partkey", F.col("l_quantity").cast("long").alias("qty"), "l_extendedprice"
    )
    pa = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("qty").alias("__sq")
    )
    brand = t["part"].filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        li.join(pa, "l_partkey")
        .join(F.broadcast(brand), li["l_partkey"] == F.col("p_partkey"))
        .filter(F.lit(5) * F.col("qty") * F.col("__n") < F.col("__sq"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("revenue_cents"),
        )
    )


TPCH_Q17_ORACLE = """
WITH pa AS (
    SELECT l_partkey, count(*) AS n, sum(CAST(l_quantity AS BIGINT)) AS sq
    FROM lineitem GROUP BY 1
)
SELECT count(*) AS n_lines,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN pa ON pa.l_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1' AND 5 * CAST(l.l_quantity AS BIGINT) * pa.n < pa.sq
"""


# -------------------------------------------------------------------- q22
def tpch_q22_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (global sales opportunity), adapted to the testdata schema:
    c_phone is not carried, so the country code is c_nationkey, and every
    customer has old orders, so "no orders" becomes "no orders since
    1997-06-01" (lapsed high-balance customers). Above-average balance is
    decided in integers (bal·n > Σbal over cents) — no float-average
    boundary. Anti-join on the filtered orders; the (n, Σ) scalar is a
    1-row broadcast."""
    t = load_testdata(spark, sf_dir, ("customer", "orders"))
    cust = t["customer"].select(
        "c_custkey", "c_nationkey", _cents(F.col("c_acctbal")).alias("__bal")
    )
    tot = cust.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__bal").alias("__s")
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(tot), F.col("__bal") * F.col("__n") > F.col("__s"))
        .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("__bal").alias("total_acctbal_cents"),
        )
    )


TPCH_Q22_ORACLE = """
WITH cents AS (
    SELECT c_custkey, c_nationkey, CAST(floor(c_acctbal * 100) AS BIGINT) AS bal
    FROM customer
),
tot AS (SELECT count(*) AS n, sum(bal) AS s FROM cents)
SELECT c_nationkey, count(*) AS n_custs,
       CAST(sum(bal) AS BIGINT) AS total_acctbal_cents
FROM cents, tot
WHERE bal * n > s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = cents.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1997-06-01')
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------- q12
def tpch_q12_ship_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping modes and order priority (TPC-H q12 shape: fact⋈fact join +
    conditional two-way count split). This schema has no l_shipmode /
    l_commitdate, so the canonical mapping used throughout this catalog
    applies: class = l_linestatus, late = shipped > 60 days after the
    order date, one shipdate year window.

    Plan: the only exchange pair is the orders⋈lineitem equi-join on
    orderkey (both fact-sized — AQE picks the strategy; no forced
    broadcast, same q3/q4 rule), then a partial-agg count split into a
    |classes|-row result."""
    t = load_testdata(spark, sf_dir, ("orders", "lineitem"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    j = t["orders"].join(li, F.col("o_orderkey") == F.col("l_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


TPCH_Q12_ORACLE = """
SELECT l_linestatus AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------- q21
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H q21 shape: the
    EXISTS / NOT-EXISTS double-correlation). A supplier counts once per
    LATE lineitem of a finalized multi-supplier order on which it was the
    ONLY late supplier. Late = shipped > 90 days after the order date
    (this schema's q4 lateness rule; no l_receiptdate).

    Spark-first: the two correlated EXISTS collapse into ONE per-order
    aggregate — countDistinct(supplier) and countDistinct(late supplier)
    — reused for both conditions, so lineitem is scanned once and joined
    once instead of three times (the canonical l1/l2/l3 self-joins). The
    DuckDB oracle keeps the canonical EXISTS formulation, making the
    rewrite equivalence the verified property. nation is broadcast;
    the per-order aggregate reuses the orderkey exchange."""
    t = load_testdata(spark, sf_dir, ("orders", "lineitem", "supplier", "nation"))
    li = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .withColumn(
            "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    waiting = (
        li.filter(F.col("late"))
        .join(
            per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            on="l_orderkey",
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


TPCH_Q21_ORACLE = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_7'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def revenue_rollup_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP ROLLUP (round 6): order revenue by (nation, year) with
    per-nation subtotals and a grand total in ONE pass —
    ``df.rollup(...)`` compiles to a single Expand (3 grouping sets) +
    one hash exchange, the multi-level-report shape a BI layer asks for
    (Spark's GROUPING SETS family; DuckDB replays it verbatim with
    GROUP BY ROLLUP). ``gid`` = grouping_id disambiguates a NULL data
    value from a subtotal row. Cents-exact revenue; only the bounded
    nation dim is force-broadcast (orders⋈customer stays with AQE)."""
    t = load_testdata(spark, sf_dir, ("orders", "customer", "nation"))
    dims = t["nation"].select("n_nationkey", "n_name")
    # nation is the only forced broadcast (bounded dim); orders⋈customer
    # is left to Catalyst/AQE stats — the r1-ADVICE rule
    cust = (
        t["customer"]
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
    )
    rows = (
        t["orders"]
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    return rows.rollup("nation", "yr").agg(
        F.sum("cents").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_orders"),
        F.grouping_id().cast("long").alias("gid"),
    )


REVENUE_ROLLUP_NATION_YEAR_ORACLE = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(GROUPING(n_name) * 2 + GROUPING(year(o_orderdate)) AS BIGINT) AS gid
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, year(o_orderdate))
"""


def revenue_cube_mktseg_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full OLAP CUBE report (round 7, completing the grouping-sets
    family beside ROLLUP): revenue + order counts by market segment ×
    order priority, INCLUDING per-segment totals, per-priority totals,
    and the grand total in ONE pass — ``df.cube`` compiles to a single
    Expand (4 grouping sets) feeding one partial+final hash aggregate,
    the same single-exchange shape plan-pinned for rollup
    (test_revenue_rollup_single_expand_one_agg_exchange); DuckDB replays
    it verbatim with GROUP BY CUBE. ``gid`` disambiguates subtotal rows.
    At 100 TB: Expand multiplies rows 4× BEFORE the map-side partial
    aggregate collapses them to the tiny group space (seg × priority
    ≤ dozens) — the shuffle carries group rows only."""
    t = load_testdata(spark, sf_dir, ("orders", "customer"))
    rows = (
        t["orders"]
        .join(
            t["customer"].select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("mktseg"),
            F.col("o_orderpriority").alias("priority"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    return rows.cube("mktseg", "priority").agg(
        F.sum("cents").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_orders"),
        F.grouping_id().cast("long").alias("gid"),
    )


REVENUE_CUBE_ORACLE = """
SELECT c_mktsegment AS mktseg, o_orderpriority AS priority,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(GROUPING(c_mktsegment) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderpriority)
"""


QUERIES = {
    "tpch_q12_ship_priority_classes": tpch_q12_ship_priority_classes,
    "tpch_q21_waiting_suppliers": tpch_q21_waiting_suppliers,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q17_small_qty_revenue": tpch_q17_small_qty_revenue,
    "tpch_q22_lapsed_customers": tpch_q22_lapsed_customers,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q13_customer_distribution": tpch_q13_customer_distribution,
    "revenue_rollup_nation_year": revenue_rollup_nation_year,
    "revenue_cube_mktseg_priority": revenue_cube_mktseg_priority,
    "tpch_q19_brand_bands": tpch_q19_brand_bands,
    "order_value_percentiles": order_value_percentiles,
    "order_value_percentiles_approx": order_value_percentiles_approx,
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "tpch_q10_returned_items": tpch_q10_returned_items,
    "tpch_q14_promo_effect": tpch_q14_promo_effect,
    "revenue_rollup": revenue_rollup,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q4_order_priority": tpch_q4_order_priority,
    "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
    "tpch_q18_large_orders": tpch_q18_large_orders,
    "tpch_q5_local_supplier": tpch_q5_local_supplier,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
}

ORACLES = {
    "tpch_q12_ship_priority_classes": TPCH_Q12_ORACLE,
    "tpch_q21_waiting_suppliers": TPCH_Q21_ORACLE,
    "tpch_q15_top_supplier": TPCH_Q15_ORACLE,
    "tpch_q17_small_qty_revenue": TPCH_Q17_ORACLE,
    "tpch_q22_lapsed_customers": TPCH_Q22_ORACLE,
    "tpch_q8_market_share": TPCH_Q8_ORACLE,
    "tpch_q13_customer_distribution": TPCH_Q13_ORACLE,
    "revenue_rollup_nation_year": REVENUE_ROLLUP_NATION_YEAR_ORACLE,
    "revenue_cube_mktseg_priority": REVENUE_CUBE_ORACLE,
    "tpch_q19_brand_bands": TPCH_Q19_ORACLE,
    "order_value_percentiles": ORDER_VALUE_PERCENTILES_ORACLE,
    "order_value_percentiles_approx": ORDER_VALUE_PERCENTILES_APPROX_ORACLE,
    "tpch_q1_pricing_summary": TPCH_Q1_ORACLE,
    "tpch_q10_returned_items": TPCH_Q10_ORACLE,
    "tpch_q14_promo_effect": TPCH_Q14_ORACLE,
    "revenue_rollup": REVENUE_ROLLUP_ORACLE,
    "tpch_q3_shipping_priority": TPCH_Q3_ORACLE,
    "tpch_q4_order_priority": TPCH_Q4_ORACLE,
    "tpch_q7_volume_shipping": TPCH_Q7_ORACLE,
    "tpch_q18_large_orders": TPCH_Q18_ORACLE,
    "tpch_q5_local_supplier": TPCH_Q5_ORACLE,
    "tpch_q6_forecast_revenue": TPCH_Q6_ORACLE,
}
