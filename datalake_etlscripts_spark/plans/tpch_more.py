"""Additional TPC-H-shaped relational queries (Q7/Q8/Q14/Q18/Q19,
adapted to the cut-down synthetic schema — no partsupp, no shipmode).

These widen multi-join / conditional-aggregate / semi-join coverage
beyond the Q1/Q3/Q4/Q5/Q10 set in plans/relational.py. Float policy
per plans/registry.py: sums in exact DECIMAL on both engines, ratios
divided in IEEE double.

Scale notes: every query is join-reorderable by Catalyst; nation and
region are explicitly broadcast (5/25 rows), the rest are shuffle
joins on their natural keys with AQE sizing. Q18's having-filter is a
self-contained aggregate on lineitem — map-side combined before its
single shuffle on l_orderkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.plans.registry import query
from datalake_etlscripts_spark.plans.relational import dec, money, rate


def _volume():
    return money("l_extendedprice") * (F.lit(1) - rate("l_discount"))


# Q7 — volume shipping between two nations, per direction and year.
@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(6,4))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.filter(
            F.col("l_shipdate").between("1995-01-01 00:00:00", "1997-12-31 00:00:00")
        )
        .join(s.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_volume()).cast("double").alias("revenue"))
    )


# Q8 — market share of one supplier nation among a region's customers.
@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           (CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                               ELSE CAST(0 AS DECIMAL(12,4)) END) AS VARCHAR) AS DOUBLE))
           / (CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE)) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(6,4))) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
    )
    GROUP BY o_year
    """,
)
def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share within a region by year."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    p = read_table(spark, sf_dir, "part")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    n_cust = n.select(F.col("n_nationkey").alias("c_nk"), "n_regionkey")
    n_supp = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    joined = (
        li.join(
            p.filter(F.col("p_type") == "ECONOMY").select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            o.filter(
                F.col("o_orderdate").between("1995-01-01 00:00:00", "1996-12-31 00:00:00")
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nk"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE").select("r_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(s.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nk"))
    )
    vol = _volume()
    zero = F.lit(0).cast("decimal(12,4)")
    return (
        joined.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


# Q14 — promo revenue share over one shipping year.
@query(
    "q14_promo_revenue",
    oracle="""
    SELECT (100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume
                                       ELSE CAST(0 AS DECIMAL(12,4)) END) AS VARCHAR) AS DOUBLE))
           / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS promo_revenue
    FROM (
      SELECT p_type, CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(6,4))) AS volume
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    )
    """,
)
def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue percentage - decimal-exact conditional aggregates."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _volume()
    zero = F.lit(0).cast("decimal(12,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


# Q18 — large-volume customers: orders whose total quantity exceeds a
# threshold (semi-join against a having-aggregate).
@query(
    "q18_large_volume",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 200
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(CAST(CAST(o.o_totalprice AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS o_totalprice,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume customers via a having-sum semi join."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(
            o.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c.select("c_custkey", "c_name"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            dec("o_totalprice").cast("double").alias("o_totalprice"),
        )
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
    )


# Q19 — discounted revenue under OR'd brand/size/quantity predicates
# (disjunctive pushdown: the whole predicate reaches the scans).
@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                 * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive bracket predicates folded into one scan."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(_volume()).cast("double").alias("revenue"))
    )


# Q6 — forecast revenue change: single-table scan with a fully
# pushed-down conjunctive predicate; no join, no shuffle beyond the
# final 1-row aggregate.
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                 * CAST(l_discount AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast revenue change - tight range scan with decimal-exact sum."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * rate("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


# Q9 — profit by supplier nation and order year. Adapted: the synthetic
# schema has no partsupp, so unit cost is modeled as 10% of
# p_retailprice (decimal widths chosen so volume − cost stays within
# precision 38 in both engines — no precision-loss rounding fires).
@query(
    "q9_profit_by_nation",
    oracle="""
    SELECT nation, o_year, CAST(CAST(SUM(amount) AS VARCHAR) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))
             - CAST(p_retailprice AS DECIMAL(12,4))
               * CAST(l_quantity AS DECIMAL(18,4)) * CAST(0.1 AS DECIMAL(2,1)) AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
)
def q_q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by nation and order-year from a five-way join."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    amount = _volume() - (
        money("p_retailprice") * dec("l_quantity") * F.lit("0.1").cast("decimal(2,1)")
    )
    return (
        li.join(
            p.filter(F.col("p_name").contains("red")).select("p_partkey", "p_retailprice"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(s.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("nation", "o_year")
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


# Q12 — priority shipping. Adapted: no l_shipmode column, so lines are
# grouped by l_returnflag; high = urgent/high order priority. Counts
# are conditional sums (map-side combined before one shuffle).
@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= o.o_orderdate
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: shipmode priority counts with conditional aggregation."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
        )
        .join(
            o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


# Q13 — customer order-count distribution: left outer join with an
# ON-clause filter (customers whose orders all fail the filter still
# appear with count 0), then a histogram of the counts.
@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution via left join + double aggregate."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = (
        c.select("c_custkey")
        .join(
            o.select("o_custkey", "o_orderkey", "o_orderpriority"),
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# Q15 — top supplier(s) by 3-month revenue: scalar-subquery max over an
# aggregate view, joined back. Revenue stays exact DECIMAL through the
# max/equality (ties kept, no float ==), cast to double only on output.
@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                 * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(CAST(r.total_rev AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by revenue - window max instead of a scalar subquery."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1996-04-01 00:00:00")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_volume()).alias("total_rev"))
    )
    best = revenue.agg(F.max("total_rev").alias("best_rev"))
    return (
        revenue.join(F.broadcast(best), F.col("total_rev") == F.col("best_rev"))
        .join(s.select("s_suppkey", "s_name"), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


# Q16 — supplier counts per part attribute. Adapted: no partsupp, so
# lineitem is the part↔supplier bridge; suppliers with negative account
# balance are excluded via NOT IN (anti join in the engine).
@query(
    "q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: supplier counts per part attribute with NOT-IN anti join."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            p.filter(
                (F.col("p_brand") != "Brand#1")
                & (F.col("p_type") != "PROMO")
                & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
            ).select("p_partkey", "p_brand", "p_type", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# Q17 — small-quantity-order revenue: per-part average quantity as a
# decorrelated aggregate joined back (threshold = 0.2 × avg, computed
# as exact-decimal sum / count so both engines derive the identical
# double before the comparison).
@query(
    "q17_small_qty_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey AS agg_partkey,
             0.2 * (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                    / count(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.agg_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < pq.qty_threshold
    """,
)
def q_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of small-quantity lines vs 0.2x the part's average quantity (decorrelated)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    pq = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        li.join(
            p.filter(F.col("p_brand") == "Brand#23").select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(pq, F.col("agg_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


# Q22 — dormant high-balance customers. Adapted: every synthetic
# customer has orders, so "waiting" means no order since 2000-01-01
# (NOT EXISTS → anti join); balance threshold is the positive-balance
# average as an exact-decimal-derived double broadcast to every row.
@query(
    "q22_dormant_customers",
    oracle="""
    SELECT n_name, count(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS totacctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
        SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
               / count(*)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY n_name
    """,
)
def q_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: dormant high-balance customers - anti join + decorrelated average."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
        )
    )
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01 00:00:00").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# Q2 — minimum-cost supplier. Adapted: no partsupp, so the part↔supplier
# bridge is lineitem and "supply cost" is the cheapest observed line
# price for the pair. The correlated min subquery decorrelates to a
# window MIN over the per-pair aggregate (one shuffle on l_partkey,
# reused by the window — no second shuffle); cost stays exact DECIMAL
# through the min/equality and is cast to double only on output.
@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS DECIMAL(12,4))) AS cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           CAST(CAST(c.cost AS VARCHAR) AS DOUBLE) AS supplycost
    FROM costs c
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size = 15 AND p.p_type = 'SMALL'
      AND c.cost = (SELECT MIN(c2.cost) FROM costs c2 WHERE c2.l_partkey = c.l_partkey)
    """,
)
def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-(part, region) min supply cost via a window over the joined dims."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    eur_supp = (
        s.join(
            F.broadcast(
                n.join(
                    F.broadcast(r.filter(F.col("r_name") == "EUROPE").select("r_regionkey")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        li.join(eur_supp.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(money("l_extendedprice")).alias("cost"))
    )
    best = W.partitionBy("l_partkey")
    return (
        costs.withColumn("min_cost", F.min("cost").over(best))
        .filter(F.col("cost") == F.col("min_cost"))
        .join(
            p.filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL")).select(
                "p_partkey", "p_name"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("cost").cast("double").alias("supplycost"),
        )
    )


# Q11 — important parts. Adapted: per-part "inventory value" is the
# lineitem revenue contributed by one nation's suppliers; parts kept if
# their value exceeds fraction × the nation-wide total (scalar subquery
# → 1-row aggregate broadcast to every group). Both engines derive the
# comparison doubles from exact decimal sums.
@query(
    "q11_important_parts",
    oracle="""
    WITH vpp AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_2'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey,
           CAST(CAST(val AS VARCHAR) AS DOUBLE) AS part_value
    FROM vpp
    WHERE CAST(CAST(val AS VARCHAR) AS DOUBLE)
          > 0.001 * (SELECT CAST(CAST(SUM(val) AS VARCHAR) AS DOUBLE) FROM vpp)
    """,
)
def q_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: important stock values with a scalar-total HAVING threshold."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    nat_supp = s.join(
        F.broadcast(n.filter(F.col("n_name") == "NATION_2").select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    vpp = (
        li.join(nat_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(money("l_extendedprice")).alias("val"))
    )
    total = vpp.agg(F.sum("val").cast("double").alias("total_val"))
    return (
        vpp.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.lit(0.001) * F.col("total_val"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("val").cast("double").alias("part_value"),
        )
    )


# Q20 — potential part promotion. Adapted: a supplier has "excess
# stock" of a part when their 1996 shipped quantity exceeds half their
# 1995 shipped quantity for the same part (the reference's
# availqty > 0.5×sum(l_quantity) probe, re-expressed over the lineitem
# bridge). Nested IN chain → semi joins; conditional year sums are
# map-side combined in ONE pass over lineitem (no per-year rescan).
@query(
    "q20_potential_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
                       AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
                      THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS qty95,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                      THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS qty96
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM shipped
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
        AND CAST(CAST(qty96 AS VARCHAR) AS DOUBLE)
            > 0.5 * CAST(CAST(qty95 AS VARCHAR) AS DOUBLE)
    )
    """,
)
def q_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers with excess stock of promoted parts - nested IN decorrelated to semi-join chain."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    in95 = (F.col("l_shipdate") >= "1995-01-01 00:00:00") & (
        F.col("l_shipdate") < "1996-01-01 00:00:00"
    )
    in96 = (F.col("l_shipdate") >= "1996-01-01 00:00:00") & (
        F.col("l_shipdate") < "1997-01-01 00:00:00"
    )
    shipped = (
        li.filter(in95 | in96)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in95, dec("l_quantity"))).alias("qty95"),
            F.sum(F.when(in96, dec("l_quantity"))).alias("qty96"),
        )
    )
    blue = p.filter(F.col("p_name").contains("blue")).select("p_partkey")
    excess = (
        shipped.join(blue, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .filter(
            F.col("qty96").cast("double") > F.lit(0.5) * F.col("qty95").cast("double")
        )
        .select("l_suppkey")
    )
    return (
        s.join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )


# Q21 — suppliers who kept orders waiting. Adapted: no
# commit/receipt dates, so "late" = shipped ≥60 days after the order
# date. A line qualifies when its order is finalized ('F'), involves
# another supplier (EXISTS), and NO other supplier was late on it
# (NOT EXISTS). Instead of the textbook double self-join (two extra
# lineitem shuffles), per-order supplier/late-supplier distinct counts
# are computed in the SAME single shuffle pipeline and joined back —
# the exists/not-exists pair becomes `n_supps > 1 AND n_late_supps = 1`
# on the late supplier's own rows, which is algebraically identical.
@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH late_lines AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late_lines l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
)
def q_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: sole late supplier per multi-supplier order, in ONE lineitem shuffle (no double self-join)."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    f_orders = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    lines = li.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        f_orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    late = F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        lines.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supps"),
        )
        .withColumnRenamed("l_orderkey", "agg_orderkey")
    )
    qualifying = (
        lines.filter(late)
        .join(per_order, F.col("l_orderkey") == F.col("agg_orderkey"))
        .filter((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
    )
    return (
        qualifying.join(
            s.select("s_suppkey", "s_name"), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )


@query(
    "q4_priority_late_orders",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking, EXISTS decorrelated to
    a left-semi join; the testdata carries no l_commitdate /
    l_receiptdate, so 'late' = a line shipped 30+ days after the order
    date). The semi join shuffles on the order key and short-circuits
    per order - never materializes the multiplicity of matching
    lines."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count")
    )
