"""Relational query inventory over the synthetic test tables.

Covers SURVEY.md §2.1–§2.6: scans, projections/filters, joins,
aggregations, windows, set ops. Every query here has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.plans.registry import ddb_hex32, query
from datalake_etlscripts_spark.summary import summary_counts


def dec(c, scale: int = 4):
    """Exact decimal view of a double column (see registry docstring)."""
    return F.col(c).cast(f"decimal(18,{scale})")


def money(c):
    """Money column view for products: decimal(12,4). Together with
    rate() operands, a triple product stays within precision 38 in BOTH
    Spark and DuckDB, so no engine-specific precision-loss rounding
    ever fires — products are exact → identical doubles after cast."""
    return F.col(c).cast("decimal(12,4)")


def rate(c):
    """Rate column (discount/tax, |x| < 10) view: decimal(6,4)."""
    return F.col(c).cast("decimal(6,4)")


# ---------------------------------------------------------------------------
# A2 generalized — the calc_summary flagship shape (reference
# calc_summary.py:53-81): per-field value counts + grand total, one scan.
# ---------------------------------------------------------------------------
@query(
    "summary_counts",
    oracle="""
    SELECT 'o_orderstatus' AS field, CAST(o_orderstatus AS VARCHAR) AS value,
           count(*) AS cnt
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR), count(*)
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT '__total__', NULL, count(*) FROM orders
    """,
)
def q_summary_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-value count summaries over the store (calc_summary semantics) - one grouping-sets scan."""
    orders = read_table(spark, sf_dir, "orders")
    return summary_counts(orders, ["o_orderstatus", "o_orderpriority"])


# ---------------------------------------------------------------------------
# TPC-H Q1 shape — scan → filter → groupBy 2 keys → 8 aggregates → sort.
# The headline relational aggregate (pushdown + partial agg + AQE).
# ---------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))
                    * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report - decimal-exact aggregates per returnflag/linestatus.

    Exactness tax (measured, r4 A/B at sf0.1, min of 5 full-width
    runs): decimal-exact sums 0.99s vs native double sums 0.29s —
    ~3.4x. The decimal path is kept as the registered query because
    its results are bit-deterministic under ANY partitioning (the
    oracle hash-match requires it; double summation is
    reduction-order-dependent). bench.py also times the double-path
    twin (`pricing_summary_double`) so the tax is tracked
    round-over-round; on a cluster where last-bit determinism is not
    required, the double form is the throughput choice.
    """
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    charge = disc_price * (F.lit(1) + rate("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P1/P2/P8 — projection + range + compound predicates; Catalyst pushes
# both the filter and the 3-column projection into the parquet scan.
# ---------------------------------------------------------------------------
@query(
    "project_filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) AS VARCHAR) AS DOUBLE) AS price
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
    """,
)
def q_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + range predicate scan shape (P1-P10): pushdown-friendly select/filter."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity").between(10, 20) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", dec("l_extendedprice").cast("double").alias("price"))
    )


# ---------------------------------------------------------------------------
# P5/P6 — membership + prefix predicates (isin for small lists;
# startswith maps to a parquet-pushable StringStartsWith).
# ---------------------------------------------------------------------------
@query(
    "membership_prefix",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AND c_name LIKE 'Customer#00000%'
    """,
)
def q_membership_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership + LIKE-prefix predicates (P6/P7 shapes)."""
    c = read_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_name").startswith("Customer#00000")
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# J9 — broadcast dimension join chain (region→nation→customer), the
# star-schema lookup. Dims are tiny → broadcast, zero shuffle of facts.
# ---------------------------------------------------------------------------
@query(
    "dim_join_broadcast",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation, count(*) AS n_customers,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension broadcast join: small dims never shuffle the fact side."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# J2-shape equi join + aggregate: revenue per nation (TPC-H Q5 cut).
# Fact-fact join shuffles on the key; dims broadcast.
# ---------------------------------------------------------------------------
@query(
    "revenue_per_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
)
def q_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 cut: revenue per nation through the customer/orders/lineitem/supplier/nation join with broadcast dims."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    revenue = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# J5 — anti/semi join set-difference (sync_documents.py:214-231 shape):
# customers with no orders (anti) and, separately, counts via semi.
# ---------------------------------------------------------------------------
@query(
    "anti_join_missing",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recovery anti-join: source rows absent from the destination (J6)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "semi_join_existing",
    oracle="""
    SELECT count(*) AS n_with_orders FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recovery semi-join: source rows already present in the destination (J6)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )


# ---------------------------------------------------------------------------
# A1 — max-id aggregate (get_last_order, ntp_utils.py:51-69 shape).
# ---------------------------------------------------------------------------
@query(
    "max_key",
    oracle="SELECT max(o_orderkey) AS max_id FROM orders WHERE o_orderstatus = 'O'",
)
def q_max_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-id aggregate (A1): the next-_id seed read from the store."""
    o = read_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == "O").agg(F.max("o_orderkey").alias("max_id"))


# ---------------------------------------------------------------------------
# A4/A5 — duplicate detection + histogram of group sizes
# (clean_place.py:125-132, OLD/cleanPlace.py_old:65).
# ---------------------------------------------------------------------------
@query(
    "dup_detection",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) > 10
    """,
)
def q_dup_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate natural-key detection: groupBy + having count > 1 (A4)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 10)
    )


@query(
    "group_size_histogram",
    oracle="""
    SELECT n_orders, count(*) AS n_customers FROM (
      SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
    ) GROUP BY n_orders
    """,
)
def q_group_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of group sizes: distribution of versions-per-key (A5)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# A6/W2 — argmax / latest-per-key (clean_place.py:153-165):
# each customer's most recent order via max_by semantics.
# ---------------------------------------------------------------------------
@query(
    "latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderdate AS last_date, o_orderkey AS last_orderkey FROM (
      SELECT o_custkey, o_orderdate, o_orderkey, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest version per key via max_by / argmax window (A6/W2)."""
    o = read_table(spark, sf_dir, "orders")
    # deterministic argmax: tie-break on the key itself (max_by over a struct)
    return o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_date"),
        F.max_by("o_orderkey", F.struct("o_orderdate", "o_orderkey")).alias("last_orderkey"),
    )


# ---------------------------------------------------------------------------
# W1/W2 — row_number latest-per-key window (the SCD2 current-version view).
# ---------------------------------------------------------------------------
@query(
    "window_row_number",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row_number id assignment (W1) - the documented bounded single-partition window over batch-sized input."""
    o = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# W5 — lag-diff over versions (OLD/process_place.py:115-141 shape):
# per customer, gap in days between consecutive orders.
# ---------------------------------------------------------------------------
@query(
    "window_lag_diff",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
)
def q_window_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key lag diff between consecutive versions (W5)."""
    o = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("bigint").alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# Top-K per group — window rank ≤ K (the reference's latest-version pick
# generalized; SURVEY.md §2.5).
# ---------------------------------------------------------------------------
@query(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k rows per group with full deterministic tie-break (W4)."""
    o = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# §2.6 set operations — union / intersect / except over key sets.
# ---------------------------------------------------------------------------
@query(
    "set_ops",
    oracle="""
    SELECT 'only_building' AS tag, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    UNION ALL
    SELECT 'both', c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over id sets (SURVEY 2.6)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey")
    )
    f_orders = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    only = building.exceptAll(f_orders.dropDuplicates()).dropDuplicates()
    both = building.intersect(f_orders)
    return only.select(F.lit("only_building").alias("tag"), "c_custkey").unionAll(
        both.select(F.lit("both").alias("tag"), "c_custkey")
    )


# ---------------------------------------------------------------------------
# A7 — distinct-set per key + violation filter
# (check_unique_place_id.py:48-59): natural keys mapping to >1 URL.
# Arrays hash-compare, so both sides sort them.
# ---------------------------------------------------------------------------
@query(
    "distinct_set_per_key",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
           count(DISTINCT o_orderpriority) AS n_distinct
    FROM orders GROUP BY o_custkey HAVING count(DISTINCT o_orderpriority) > 3
    """,
)
def q_distinct_set_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct value set per key (sorted array) - A7."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias(
                "priorities"
            ),
            F.count_distinct("o_orderpriority").alias("n_distinct"),
        )
        .filter(F.col("n_distinct") > 3)
    )


# ---------------------------------------------------------------------------
# Rollup — the A2 summary generalized to hierarchies (SURVEY.md §2.4 note).
# ---------------------------------------------------------------------------
@query(
    "rollup_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority): hierarchical grouping sets."""
    o = read_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("o_totalprice")).cast("double").alias("total"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — shipping priority: 3-way join, filter both sides,
# top-10 by revenue (join-order + topk exercise).
# ---------------------------------------------------------------------------
@query(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-order revenue by order/date, top-priority cut."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    revenue = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape — order priority checking: EXISTS → left-semi join.
# ---------------------------------------------------------------------------
@query(
    "order_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join, counts by priority."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = o.join(
        li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi"
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item reporting: 4-way join + top-20
# customers by lost revenue.
# ---------------------------------------------------------------------------
@query(
    "returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
           n_name AS nation
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1993-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1994-10-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1993-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1994-10-01 00:00:00").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    revenue = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# scalar-subquery shape: customers above their segment's average balance
# (correlated aggregate decorrelated into a join — TPC-H Q17 family).
# ---------------------------------------------------------------------------
@query(
    "above_segment_average",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment,
             CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
               / count(*) AS avg_bal
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(CAST(CAST(c.c_acctbal AS DECIMAL(12,4)) AS VARCHAR) AS DOUBLE) AS acctbal
    FROM customer c JOIN seg s USING (c_mktsegment)
    WHERE CAST(c.c_acctbal AS DECIMAL(12,4)) > CAST(s.avg_bal AS DECIMAL(12,4))
    """,
)
def q_above_segment_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated scalar subquery: customers above their segment's average account balance."""
    c = read_table(spark, sf_dir, "customer")
    seg = c.groupBy("c_mktsegment").agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(seg), "c_mktsegment")
        .filter(dec("c_acctbal") > F.col("avg_bal").cast("decimal(18,4)"))
        .select(
            "c_custkey",
            "c_mktsegment",
            dec("c_acctbal").cast("double").alias("acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# declarative data-quality expectations (checking/* generalized):
# row predicates in ONE scan + uniqueness + referential integrity,
# one (rule, n_violations) report. 'price_above_100k' is deliberately
# violated so the report shape is visibly non-trivial.
# ---------------------------------------------------------------------------
@query(
    "data_quality_checks",
    oracle="""
    SELECT 'totalprice_nonneg' AS rule,
           CAST(SUM(CASE WHEN NOT (o_totalprice >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orderdate_not_null',
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'priority_known',
           CAST(SUM(CASE WHEN o_orderpriority NOT IN
             ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
             THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'price_above_100k',
           CAST(SUM(CASE WHEN NOT (o_totalprice <= 100000) THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique_o_orderkey',
           CAST(coalesce(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'fk_l_orderkey',
           CAST(count(*) AS BIGINT)
    FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'fk_o_custkey',
           CAST(count(*) AS BIGINT)
    FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    """,
)
def q_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rules (row predicates, uniqueness, referential integrity) evaluated in one scan per table."""
    from datalake_etlscripts_spark.operators.expectations import (
        fk_rule,
        row_rules,
        run_expectations,
        unique_rule,
    )

    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    c = read_table(spark, sf_dir, "customer")
    rules = row_rules(
        o,
        {
            "totalprice_nonneg": F.col("o_totalprice") >= 0,
            "orderdate_not_null": F.col("o_orderdate").isNotNull(),
            "priority_known": F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            ),
            "price_above_100k": F.col("o_totalprice") <= 100000,
        },
    )
    return run_expectations(
        rules,
        unique_rule(o, ["o_orderkey"], name="unique_o_orderkey"),
        fk_rule(li, o, "l_orderkey", "o_orderkey", name="fk_l_orderkey"),
        fk_rule(o, c, "o_custkey", "c_custkey", name="fk_o_custkey"),
    )


# ---------------------------------------------------------------------------
# table profiling — the discovery half of the expectations engine:
# per-column row/null/distinct counts from ONE aggregate (multi-distinct
# expands ×columns map-side; the one result row unpivots driver-side).
# ---------------------------------------------------------------------------
@query(
    "profile_columns",
    oracle="""
    SELECT 'o_orderstatus' AS column, count(*) AS n_rows,
           count(*) - count(o_orderstatus) AS n_nulls,
           count(DISTINCT o_orderstatus) AS n_distinct FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority) FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey) FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice) FROM orders
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (rows, nulls, exact distinct) of orders in one aggregate - the discovery pass that seeds expectations rules."""
    from datalake_etlscripts_spark.operators.expectations import profile_table

    o = read_table(spark, sf_dir, "orders")
    return profile_table(
        o, ["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"]
    )


# ---------------------------------------------------------------------------
# market-basket association mining: frequent part pairs over orders
# ---------------------------------------------------------------------------
@query(
    "frequent_pairs",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    capped AS (SELECT b, list_sort(list(i))[1:32] AS items FROM li GROUP BY b),
    n AS (SELECT count(*) AS n FROM capped),
    it AS (SELECT b, unnest(items) AS i FROM capped),
    sup AS (SELECT i, count(*) AS sup FROM it GROUP BY i),
    pairs AS (
      SELECT a.i AS item_a, bb.i AS item_b, count(*) AS pair_support
      FROM it a JOIN it bb ON a.b = bb.b AND a.i < bb.i
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT item_a, item_b, pair_support,
           sa.sup AS support_a, sb.sup AS support_b,
           CAST(pair_support AS DOUBLE) / CAST(sa.sup AS DOUBLE) AS conf_a_to_b,
           CAST(pair_support AS DOUBLE) / CAST(sb.sup AS DOUBLE) AS conf_b_to_a,
           CAST(pair_support * n.n AS DOUBLE)
             / CAST(sa.sup * sb.sup AS DOUBLE) AS lift
    FROM pairs
    JOIN sup sa ON sa.i = item_a
    JOIN sup sb ON sb.i = item_b
    CROSS JOIN n
    """,
)
def q_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket frequent part pairs with confidence and lift - capped baskets bound pair blowup, exact integer supports, one pair-keyed shuffle."""
    from datalake_etlscripts_spark.operators.itemsets import frequent_pairs

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("b"), F.col("l_partkey").alias("i")
    )
    return frequent_pairs(li, basket_col="b", item_col="i", min_support=2, max_items=32)


# ---------------------------------------------------------------------------
# exact correlation matrix: decimal-exact moments, double combination
# ---------------------------------------------------------------------------
@query(
    "correlation_matrix",
    oracle="""
    WITH m AS (
      SELECT count(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(12,4))) AS s_q,
             SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS ss_q,
             SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS s_p,
             SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(12,4))) AS ss_p,
             SUM(CAST(l_discount AS DECIMAL(12,4))) AS s_d,
             SUM(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(12,4))) AS ss_d,
             SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(12,4))) AS sp_qp,
             SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(12,4))) AS sp_qd,
             SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(12,4))) AS sp_pd
      FROM lineitem
    )
    SELECT n,
      (CAST(n AS DOUBLE) * CAST(sp_qp AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_p AS DOUBLE))
        / (sqrt(CAST(n AS DOUBLE) * CAST(ss_q AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
         * sqrt(CAST(n AS DOUBLE) * CAST(ss_p AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE)))
        AS corr_q_p,
      (CAST(n AS DOUBLE) * CAST(sp_qd AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_d AS DOUBLE))
        / (sqrt(CAST(n AS DOUBLE) * CAST(ss_q AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
         * sqrt(CAST(n AS DOUBLE) * CAST(ss_d AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE)))
        AS corr_q_d,
      (CAST(n AS DOUBLE) * CAST(sp_pd AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_d AS DOUBLE))
        / (sqrt(CAST(n AS DOUBLE) * CAST(ss_p AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))
         * sqrt(CAST(n AS DOUBLE) * CAST(ss_d AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE)))
        AS corr_p_d
    FROM m
    """,
)
def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of quantity/price/discount from ONE decimal-exact aggregate - moments summed exactly, combined once in double."""
    from datalake_etlscripts_spark.operators.expectations import pearson_matrix

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("p"),
        F.col("l_discount").alias("d"),
    )
    return pearson_matrix(li, ["q", "p", "d"]).select(
        "n",
        F.col("corr_q_p"),
        F.col("corr_q_d"),
        F.col("corr_p_d"),
    )


@query(
    "frequent_triples",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    capped AS (SELECT b, list_sort(list(i))[1:32] AS items FROM li GROUP BY b),
    it AS (SELECT b, unnest(items) AS i FROM capped),
    pairs AS (
      SELECT a.i AS x, bb.i AS y, count(*) AS n
      FROM it a JOIN it bb ON a.b = bb.b AND a.i < bb.i
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    trip AS (
      SELECT p1.x AS item_a, p1.y AS item_b, p2.y AS item_c
      FROM pairs p1 JOIN pairs p2 ON p2.x = p1.x AND p2.y > p1.y
      WHERE EXISTS (SELECT 1 FROM pairs p3
                    WHERE p3.x = p1.y AND p3.y = p2.y)
    )
    SELECT t.item_a, t.item_b, t.item_c, count(*) AS triple_support
    FROM trip t JOIN capped cp
      ON list_contains(cp.items, t.item_a)
     AND list_contains(cp.items, t.item_b)
     AND list_contains(cp.items, t.item_c)
    GROUP BY 1, 2, 3 HAVING count(*) >= 2
    """,
)
def q_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori frequent triples: downward-closure candidates from the frequent-pair table, one verification pass - 3445 pairs prune to ~61 candidates at sf0.01."""
    from datalake_etlscripts_spark.operators.itemsets import frequent_triples

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("b"), F.col("l_partkey").alias("i")
    )
    return frequent_triples(li, basket_col="b", item_col="i", min_support=2)


# ---------------------------------------------------------------------------
# k-anonymity privacy audit before a data release: every
# (nation, segment, balance-band) quasi-id group must hold >= 5 rows.
# ---------------------------------------------------------------------------
@query(
    "k_anonymity_audit",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
             count(*) AS n
      FROM customer GROUP BY ALL
    )
    SELECT 5 AS k,
           CAST(sum(n) AS BIGINT) AS n_rows,
           count(*) AS n_groups,
           CAST(COALESCE(sum(CASE WHEN n < 5 THEN 1 END), 0) AS BIGINT)
             AS n_risky_groups,
           CAST(COALESCE(sum(CASE WHEN n < 5 THEN n END), 0) AS BIGINT)
             AS n_risky_rows,
           min(n) AS min_group_size,
           min(n) >= 5 AS anonymous
    FROM g
    """,
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity privacy audit: quasi-id groups (nation, segment, balance band) below k=5 counted before release - one grouping shuffle, 1-row summary, risky groups never leave the executors."""
    from datalake_etlscripts_spark.operators.expectations import k_anonymity

    c = read_table(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 2000).cast("bigint")
    )
    return k_anonymity(c, ["c_nationkey", "c_mktsegment", "bal_band"], k=5)


# ---------------------------------------------------------------------------
# join-key skew reconnaissance: the report read BEFORE a big join to
# decide salting / AQE skew thresholds (operators/skew.py holds the
# mitigation; this is the detection). Top heavy hitters + their
# multiple of the mean key frequency.
# ---------------------------------------------------------------------------
@query(
    "join_skew_audit",
    oracle="""
    WITH c AS (SELECT l_partkey AS key, count(*) AS n FROM lineitem GROUP BY 1),
    s AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM c)
    SELECT key, n,
           CAST(n AS DOUBLE) / total AS share,
           CAST(n * n_keys AS DOUBLE) / total AS skew_vs_mean,
           rank
    FROM (
      SELECT c.key, c.n, s.total, s.n_keys,
             CAST(row_number() OVER (ORDER BY c.n DESC, c.key) AS INT) AS rank
      FROM c, s
    )
    WHERE rank <= 10
    """,
)
def q_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew reconnaissance: top-10 heavy-hitter keys with share and multiple-of-mean frequency - the detection pass behind salting decisions; one count shuffle + a 1-row stats broadcast."""
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey")
    c = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    s = c.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    # distributed top-k (TakeOrderedAndProject), NOT a global
    # row_number window — the key table is dictionary-sized relative
    # to the corpus but still corpus-wide (1e8+ keys at 100 TB); the
    # rank window then runs over the bounded 10-row result only
    top = c.crossJoin(F.broadcast(s)).orderBy(F.desc("n"), F.asc("key")).limit(10)
    w = W.orderBy(F.desc("n"), F.asc("key"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "key",
            "n",
            (F.col("n").cast("double") / F.col("_total")).alias("share"),
            ((F.col("n") * F.col("_n_keys")).cast("double") / F.col("_total")).alias(
                "skew_vs_mean"
            ),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# the SQL API surface: the same engine through spark.sql over temp
# views — ANSI text in, Catalyst plan out, byte-identical to the
# DataFrame plans everywhere else in this module. The statement is
# shared verbatim with the oracle (one definition, two engines).
# ---------------------------------------------------------------------------
_SQL_API_STMT = """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY o_orderpriority
"""


@query("sql_api_demo", oracle=_SQL_API_STMT)
def q_sql_api_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL API surface: the identical ANSI statement runs through spark.sql over a temp view and through the DuckDB oracle - one SQL text, two engines, same hash."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SQL_API_STMT)


@query(
    "l_diversity_audit",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS n,
             count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) AS d
      FROM customer GROUP BY ALL
    )
    SELECT 2 AS l,
           count(*) AS n_groups,
           CAST(COALESCE(sum(CASE WHEN d < 2 THEN 1 END), 0) AS BIGINT)
             AS n_risky_groups,
           CAST(COALESCE(sum(CASE WHEN d < 2 THEN n END), 0) AS BIGINT)
             AS n_risky_rows,
           min(d) AS min_distinct_sensitive,
           COALESCE(min(d) >= 2, TRUE) AS diverse
    FROM g
    """,
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: quasi-id groups whose sensitive attribute (balance band) has < 2 distinct values - the homogeneity-attack gate beside k-anonymity."""
    from datalake_etlscripts_spark.operators.expectations import l_diversity

    c = read_table(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 2000).cast("bigint")
    )
    return l_diversity(c, ["c_nationkey", "c_mktsegment"], "bal_band", l=2)


# ---------------------------------------------------------------------------
# t-closeness completes the privacy triad: a big, diverse quasi-id
# group still leaks when its sensitive DISTRIBUTION skews far from the
# table's. Ordered EMD in exact integers (scaled cumulative counts in
# DECIMAL(38,0)); ONE double division per group at the end, so the
# cross-engine hash is safe — DuckDB's HUGEINT products route to
# double through VARCHAR (the engine's decimal→double convention).
# ---------------------------------------------------------------------------
@query(
    "t_closeness_audit",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS b
      FROM customer
    ),
    gdist AS (SELECT b, count(*) AS m FROM g GROUP BY 1),
    tot AS (SELECT CAST(sum(m) AS BIGINT) AS N, count(*) AS nv FROM gdist),
    grp AS (SELECT c_nationkey, c_mktsegment, count(*) AS ng FROM g GROUP BY 1, 2),
    gc AS (SELECT c_nationkey, c_mktsegment, b, count(*) AS n FROM g GROUP BY 1, 2, 3),
    grid AS (
      SELECT grp.c_nationkey, grp.c_mktsegment, grp.ng, gdist.b, gdist.m,
             COALESCE(gc.n, 0) AS n
      FROM grp CROSS JOIN gdist
      LEFT JOIN gc ON gc.c_nationkey = grp.c_nationkey
                  AND gc.c_mktsegment = grp.c_mktsegment
                  AND gc.b = gdist.b
    ),
    cum AS (
      SELECT c_nationkey, c_mktsegment, ng,
             sum(CAST(n AS HUGEINT) * (SELECT N FROM tot)
                 - CAST(m AS HUGEINT) * ng)
               OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY b) AS d
      FROM grid
    ),
    per AS (
      SELECT c_nationkey, c_mktsegment, ng, sum(abs(d)) AS sumabs
      FROM cum GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT ng,
             CASE WHEN (SELECT nv FROM tot) <= 1 THEN 0.0
                  ELSE CAST(CAST(sumabs AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(CAST(ng AS HUGEINT) * (SELECT N FROM tot)
                                   * ((SELECT nv FROM tot) - 1) AS VARCHAR)
                              AS DOUBLE)
             END AS emd
      FROM per
    )
    SELECT 0.2 AS t,
           count(*) AS n_groups,
           CAST(COALESCE(sum(CASE WHEN emd > 0.2 THEN 1 END), 0) AS BIGINT)
             AS n_risky_groups,
           CAST(COALESCE(sum(CASE WHEN emd > 0.2 THEN ng END), 0) AS BIGINT)
             AS n_risky_rows,
           max(emd) AS max_emd,
           COALESCE(max(emd) <= 0.2, TRUE) AS close
    FROM scored
    """,
)
def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit: ordered EMD between each quasi-id group's sensitive distribution and the global one, exact integer cumulative sums, one double division per group - the distribution-skew gate beside k-anonymity/l-diversity."""
    from datalake_etlscripts_spark.operators.expectations import t_closeness

    c = read_table(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 2000).cast("bigint")
    )
    return t_closeness(c, ["c_nationkey", "c_mktsegment"], "bal_band", t=0.2)


# ---------------------------------------------------------------------------
# DP release (r4): the privacy family's RELEASE half — audits gate raw
# publication; this publishes ε=1 noisy counts that are safe anyway.
# Discrete-Laplace noise = difference of two geometrics, each a
# 1024-level quantized floor(−ln(u)) lookup (driver-fixed integers for
# Spark, ln in SQL for DuckDB — same-host libm, the Gumbel-resample
# convention).
# ---------------------------------------------------------------------------
@query(
    "dp_noisy_release",
    oracle=f"""
    WITH gdim AS (
      SELECT range AS lvl,
             CAST(floor(-ln((range + 0.5) / 1024)) AS BIGINT) AS geo
      FROM range(1024)
    ),
    c AS (
      SELECT o_orderpriority, o_orderstatus, count(*) AS n,
             o_orderpriority || chr(31) || o_orderstatus AS key
      FROM orders GROUP BY 1, 2
    )
    SELECT c.o_orderpriority, c.o_orderstatus,
           CAST(c.n + g1.geo - g2.geo AS BIGINT) AS noisy_count
    FROM c
    JOIN gdim g1 ON {ddb_hex32("md5('dp1a' || key)")} % 1024 = g1.lvl
    JOIN gdim g2 ON {ddb_hex32("md5('dp1b' || key)")} % 1024 = g2.lvl
    """,
)
def q_dp_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release: per (priority, status) order counts plus seeded discrete-Laplace noise (difference of two quantized geometrics) - one grouping shuffle, two broadcast lookups, epsilon=1."""
    from datalake_etlscripts_spark.operators.expectations import dp_noisy_counts

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus"
    )
    return dp_noisy_counts(o, ["o_orderpriority", "o_orderstatus"])


# ---------------------------------------------------------------------------
# 2-d skyline / Pareto frontier (r5): parts no other part beats on
# BOTH (bigger size, cheaper price) — the multi-objective shortlist
# operator (Börzsönyi et al., "The Skyline Operator"). Plan: collapse
# to the distinct-size grid (bounded domain), prefix-min price over
# strictly-larger sizes on that grid only, then one broadcast join
# back — no pairwise self-join anywhere. The oracle is the
# INDEPENDENT NOT-EXISTS dominance definition, so the sweep plan is
# checked against the spec, not against itself.
# ---------------------------------------------------------------------------
@query(
    "skyline_pareto",
    oracle="""
    SELECT q.p_partkey, q.p_size, q.p_retailprice
    FROM part q
    WHERE NOT EXISTS (
      SELECT 1 FROM part p
      WHERE p.p_size >= q.p_size AND p.p_retailprice <= q.p_retailprice
        AND (p.p_size > q.p_size OR p.p_retailprice < q.p_retailprice)
    )
    """,
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-d skyline (Pareto frontier) of parts on (maximize size, minimize price) - distinct-size grid sweep with prefix-min price, broadcast join back; oracle is the independent NOT-EXISTS dominance spec."""
    p = read_table(spark, sf_dir, "part")
    grid = p.groupBy("p_size").agg(F.min("p_retailprice").alias("_gmin"))
    w = W.orderBy(F.col("p_size").desc()).rowsBetween(W.unboundedPreceding, -1)
    grid = grid.withColumn("_pmin", F.min("_gmin").over(w))
    return (
        p.join(F.broadcast(grid), "p_size")
        .filter(
            (F.col("_pmin").isNull() | (F.col("_pmin") > F.col("p_retailprice")))
            & (F.col("p_retailprice") == F.col("_gmin"))
        )
        .select("p_partkey", "p_size", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# k-anonymity generalization ladder (r5): the release half of the
# audit — full-domain global recoding (Samarati): widen the balance
# band, then suppress segment, then nation; publish at the first
# level whose smallest group reaches k.
# ---------------------------------------------------------------------------
@query(
    "k_anonymity_generalize",
    oracle="""
    WITH l0 AS (
      SELECT count(*) AS n FROM customer
      GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 2000) AS BIGINT)
    ),
    l1 AS (
      SELECT count(*) AS n FROM customer
      GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 8000) AS BIGINT)
    ),
    l2 AS (
      SELECT count(*) AS n FROM customer
      GROUP BY c_nationkey, CAST(floor(c_acctbal / 8000) AS BIGINT)
    ),
    l3 AS (
      SELECT count(*) AS n FROM customer
      GROUP BY CAST(floor(c_acctbal / 8000) AS BIGINT)
    ),
    u AS (
      SELECT 0 AS level, count(*) AS n_groups, CAST(min(n) AS BIGINT) AS m FROM l0
      UNION ALL SELECT 1, count(*), CAST(min(n) AS BIGINT) FROM l1
      UNION ALL SELECT 2, count(*), CAST(min(n) AS BIGINT) FROM l2
      UNION ALL SELECT 3, count(*), CAST(min(n) AS BIGINT) FROM l3
    ),
    b AS (
      SELECT min(CASE WHEN m >= 5 THEN level END) AS best, max(level) AS last
      FROM u
    )
    SELECT CAST(level AS BIGINT) AS level, n_groups,
           m AS min_group_size, m >= 5 AS meets_k,
           level = COALESCE(best, last) AS chosen
    FROM u, b
    """,
)
def q_k_anonymity_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-domain generalization ladder: widen balance bands, then suppress segment, then nation; mark the minimal level whose smallest quasi-id group reaches k=5 - one grouping shuffle per level, 1-row summaries only."""
    from datalake_etlscripts_spark.operators.expectations import k_anonymity_ladder

    c = read_table(spark, sf_dir, "customer")
    band2 = F.floor(F.col("c_acctbal") / 2000).cast("bigint").alias("band")
    band8 = F.floor(F.col("c_acctbal") / 8000).cast("bigint").alias("band")
    levels = [
        [F.col("c_nationkey"), F.col("c_mktsegment"), band2],
        [F.col("c_nationkey"), F.col("c_mktsegment"), band8],
        [F.col("c_nationkey"), band8],
        [band8],
    ]
    return k_anonymity_ladder(c, levels, k=5)


# ---------------------------------------------------------------------------
# DP median (r6): exponential mechanism over the distinct-value grid
# via the quantized-Gumbel argmax — order-statistic release beside
# dp_noisy_release's count release.
# ---------------------------------------------------------------------------
@query(
    "dp_quantile_release",
    oracle=f"""
    WITH gdim AS (
      SELECT range AS lvl,
             CAST(floor(-ln(-ln((range + 0.5) / 1024)) * 1000000 + 0.5)
                  AS BIGINT) AS gumbel_micro
      FROM range(1024)
    ),
    grid AS (
      SELECT CAST(floor(value) AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT v, c,
             CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS le,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM grid
    ),
    scored AS (
      SELECT v, n, abs(2 * le - n) AS d,
             -((abs(2 * le - n) * 1000000) // 4) + gd.gumbel_micro AS score
      FROM g JOIN gdim gd
        ON {ddb_hex32("md5('dpq1' || CAST(v AS VARCHAR))")} % 1024 = gd.lvl
    ),
    pick AS (
      SELECT n, v AS dp_median, d AS rank_dist_dp FROM scored
      ORDER BY score DESC, v ASC LIMIT 1
    ),
    exact AS (
      SELECT v AS true_median, d AS rank_dist_true FROM scored
      ORDER BY d ASC, v ASC LIMIT 1
    )
    SELECT p.n, e.true_median, p.dp_median, e.rank_dist_true, p.rank_dist_dp
    FROM pick p CROSS JOIN exact e
    """,
)
def q_dp_quantile_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private median of event values via the exponential mechanism: integer micro-nat rank utilities plus quantized-Gumbel argmax over the bounded distinct-value grid - exact median rides along for the utility-gap audit."""
    from datalake_etlscripts_spark.operators.expectations import (
        dp_quantile_exponential,
    )

    e = read_table(spark, sf_dir, "events").select(
        F.floor(F.col("value")).cast("long").alias("vq")
    )
    return dp_quantile_exponential(e, "vq")


# ---------------------------------------------------------------------------
# GROUPING SETS (r6): the one multi-grain grouping surface cube/rollup
# don't show — an explicit, non-hierarchical set list with
# grouping_id disambiguating real NULLs from subtotal rows.
# ---------------------------------------------------------------------------
@query(
    "grouping_sets_report",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS total_price,
           CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
                AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
)
def q_grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain order report via explicit GROUPING SETS (both grains, each margin, grand total) with grouping_id separating subtotal rows from real NULLs - one pass, Spark expands sets without rescanning."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [
                ["o_orderpriority", "o_orderstatus"],
                ["o_orderpriority"],
                ["o_orderstatus"],
                [],
            ],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_price"),
            F.expr("grouping_id(o_orderpriority, o_orderstatus)")
            .cast("long")
            .alias("gid"),
        )
    )


# ---------------------------------------------------------------------------
# FK inference (r6): data-side join-key discovery — distinct-value
# containment via anti joins at key cardinality.
# ---------------------------------------------------------------------------
@query(
    "fk_inference",
    oracle="""
    WITH c1 AS (SELECT DISTINCT o_custkey AS k FROM orders),
    o1 AS (SELECT count(*) AS o FROM c1
           WHERE k NOT IN (SELECT c_custkey FROM customer)),
    c2 AS (SELECT DISTINCT l_partkey AS k FROM lineitem),
    o2 AS (SELECT count(*) AS o FROM c2
           WHERE k NOT IN (SELECT p_partkey FROM part)),
    c3 AS (SELECT DISTINCT c_custkey AS k FROM customer),
    o3 AS (SELECT count(*) AS o FROM c3
           WHERE k NOT IN (SELECT o_custkey FROM orders)),
    c4 AS (SELECT DISTINCT l_suppkey AS k FROM lineitem),
    o4 AS (SELECT count(*) AS o FROM c4
           WHERE k NOT IN (SELECT n_nationkey FROM nation))
    , cand AS (
      SELECT 'orders.o_custkey->customer.c_custkey' AS candidate,
             CAST((SELECT count(*) FROM c1) AS BIGINT) AS n_child_distinct,
             CAST((SELECT o FROM o1) AS BIGINT) AS n_orphans
      UNION ALL
      SELECT 'lineitem.l_partkey->part.p_partkey',
             CAST((SELECT count(*) FROM c2) AS BIGINT),
             CAST((SELECT o FROM o2) AS BIGINT)
      UNION ALL
      SELECT 'customer.c_custkey->orders.o_custkey',
             CAST((SELECT count(*) FROM c3) AS BIGINT),
             CAST((SELECT o FROM o3) AS BIGINT)
      UNION ALL
      SELECT 'lineitem.l_suppkey->nation.n_nationkey',
             CAST((SELECT count(*) FROM c4) AS BIGINT),
             CAST((SELECT o FROM o4) AS BIGINT)
    )
    SELECT candidate, n_child_distinct, n_orphans,
           1.0 - CAST(n_orphans AS DOUBLE) / CAST(n_child_distinct AS DOUBLE)
             AS containment,
           n_orphans = 0 AS is_fk
    FROM cand
    """,
)
def q_fk_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key discovery: distinct-value containment of four candidate child-parent pairs via key-cardinality anti joins - true FKs show zero orphans, the reverse direction and a decoy show orphan mass."""
    from datalake_etlscripts_spark.operators.expectations import fk_inference

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    n = read_table(spark, sf_dir, "nation")
    return fk_inference(
        [
            ("orders.o_custkey->customer.c_custkey", o, "o_custkey", c, "c_custkey"),
            ("lineitem.l_partkey->part.p_partkey", li, "l_partkey", p, "p_partkey"),
            ("customer.c_custkey->orders.o_custkey", c, "c_custkey", o, "o_custkey"),
            ("lineitem.l_suppkey->nation.n_nationkey", li, "l_suppkey", n, "n_nationkey"),
        ]
    )


# ---------------------------------------------------------------------------
# Recursive SQL surface (r9): Spark 4 supports WITH RECURSIVE, so the
# IDENTICAL recursive statement runs through spark.sql over a temp
# view AND through the DuckDB oracle — one SQL text, two engines, same
# hash (the recursive twin of sql_api_demo). The recursion walks the
# key-encoded part tree (parent = floor(k/8) — floor of a double
# division is exact for these magnitudes in both engines) from the
# first 64 parts up to the root.
# ---------------------------------------------------------------------------
_SQL_RECURSIVE_STMT = """
    WITH RECURSIVE up(part, anc, depth) AS (
      SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey <= 64
      UNION ALL
      SELECT part, CAST(floor(anc / 8) AS BIGINT), depth + 1
      FROM up WHERE anc > 0
    )
    SELECT part, CAST(count(*) AS BIGINT) AS chain_len,
           CAST(max(depth) AS INT) AS root_depth,
           CAST(sum(anc) AS BIGINT) AS anc_sum
    FROM up GROUP BY part
"""


@query("sql_recursive_demo", oracle=_SQL_RECURSIVE_STMT)
def q_sql_recursive_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive SQL surface: the identical WITH RECURSIVE ancestor walk runs through spark.sql and the DuckDB oracle - one SQL text, two engines, same hash."""
    read_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_SQL_RECURSIVE_STMT)


# ---------------------------------------------------------------------------
# SQL hint surface (r9): the IDENTICAL statement text carries Spark
# optimizer hints (/*+ BROADCAST, REPARTITION */) that DuckDB simply
# reads as comments — one SQL text, two engines, same hash, but Spark
# gets the physical steering. The hint-compatibility trick every
# cross-engine SQL layer relies on.
# ---------------------------------------------------------------------------
_SQL_HINT_STMT = """
    SELECT /*+ BROADCAST(nation), REPARTITION(8) */
           n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(CAST(c.c_acctbal AS DECIMAL(14,2)) * 100
                AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
"""


@query("sql_hint_demo", oracle=_SQL_HINT_STMT)
def q_sql_hint_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer hints in shared SQL text: Spark applies BROADCAST/REPARTITION, DuckDB reads them as comments - one statement, two engines, same hash."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    read_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_SQL_HINT_STMT)


# ---------------------------------------------------------------------------
# Distributed two-stage top-k (r13): the global-sort-free top-k shape
# — per-key sums shuffle once, then each of 16 key-functional salt
# buckets ranks ITS candidates with a bounded window (≤ its keys, in
# parallel), and only the 16×10 survivors meet for the final bounded
# rank. Exact by construction: salt is a function of the key, so the
# global top-10 keys are each their bucket's top-10. At 100 TB this
# replaces a single-partition global window over millions of keys
# with parallel bucket windows + one 160-row sort. The oracle is the
# plain global ORDER BY LIMIT with a total-order tiebreak.
# ---------------------------------------------------------------------------
@query(
    "salted_topk_exact",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS revenue_cents
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT o_custkey, revenue_cents,
             row_number() OVER (ORDER BY revenue_cents DESC, o_custkey)
               AS rk
      FROM s
    )
    SELECT CAST(rk AS INT) AS rk, o_custkey, revenue_cents
    FROM r WHERE rk <= 10
    """,
)
def q_salted_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 customers by exact revenue cents WITHOUT a global sort: per-key sums, then per-salt-bucket bounded rank windows (salt = key mod 16, key-functional, so no true winner can be lost), then one 160-row final rank - the oracle is the plain global ORDER BY LIMIT."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    s = o.groupBy("o_custkey").agg(
        F.sum("cents").cast("long").alias("revenue_cents")
    )
    # stage 1: bounded rank inside each key-functional salt bucket
    ws = W.partitionBy("salt").orderBy(
        F.col("revenue_cents").desc(), F.col("o_custkey")
    )
    cand = (
        s.withColumn("salt", F.col("o_custkey") % 16)
        .withColumn("_rk", F.row_number().over(ws))
        .filter(F.col("_rk") <= 10)
        .drop("salt", "_rk")
    )
    # stage 2: final rank over the <=160 survivors
    wg = W.orderBy(F.col("revenue_cents").desc(), F.col("o_custkey"))
    return (
        cand.withColumn("rk", F.row_number().over(wg))
        .filter(F.col("rk") <= 10)
        .select(F.col("rk").cast("int").alias("rk"), "o_custkey",
                "revenue_cents")
    )
