"""Field-diff, crawl, and version-history queries (F17/F18, S10, A3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.crawl import crawl, extract_urls, prune_urls
from datalake_etlscripts_spark.functions.scalar import format_ntp_id
from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.operators.diffpatch import diff_columns
from datalake_etlscripts_spark.plans.registry import query


# ---------------------------------------------------------------------------
# F17: field-level diff between two derived versions of each customer's
# order profile (old = orders %3!=0 latest, new = %3==0 latest)
# ---------------------------------------------------------------------------
@query(
    "field_diff",
    oracle="""
    WITH base AS (
      SELECT CAST(o_custkey AS VARCHAR) AS id, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts,
             o_orderpriority AS prio,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price
      FROM orders
    ),
    oldv AS (
      SELECT id, prio AS old_title, price AS old_price FROM (
        SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts DESC, o_orderkey DESC) rn
        FROM base WHERE o_orderkey % 3 <> 0) WHERE rn = 1
    ),
    newv AS (
      SELECT id, prio AS new_title, price AS new_price FROM (
        SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts DESC, o_orderkey DESC) rn
        FROM base WHERE o_orderkey % 3 = 0) WHERE rn = 1
    ),
    j AS (SELECT * FROM oldv JOIN newv USING (id)),
    d AS (
      SELECT id, 'title' AS field, old_title AS old_value, new_title AS new_value FROM j
      UNION ALL
      SELECT id, 'price', old_price, new_price FROM j
    )
    SELECT id, field, old_value, new_value,
           CASE WHEN (old_value IS NULL OR old_value = '')
                     AND new_value IS NOT NULL AND new_value <> '' THEN 'add'
                WHEN old_value IS NOT NULL AND old_value <> ''
                     AND (new_value IS NULL OR new_value = '') THEN 'del'
                ELSE 'mod' END AS kind
    FROM d
    WHERE NOT (coalesce(old_value,'') = coalesce(new_value,''))
    """,
)
def q_field_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_custkey").cast("string").alias("id"),
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price"),
    )
    w = W.partitionBy("id").orderBy(F.desc("ts"), F.desc("o_orderkey"))

    def latest(df, prefix):
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "id",
                F.col("prio").alias(f"{prefix}title"),
                F.col("price").alias(f"{prefix}price"),
            )
        )

    oldv = latest(base.filter(F.col("o_orderkey") % 3 != 0), "old_")
    newv = latest(base.filter(F.col("o_orderkey") % 3 == 0), "new_")
    joined = oldv.join(newv, "id")
    return diff_columns(joined, ["title", "price"], ["id"])


# ---------------------------------------------------------------------------
# S10: offline crawl over URLs derived from part rows — the fake fetcher
# is deterministic (status/type/bytes from the URL text), so even the
# external-I/O operator gets a SQL oracle
# ---------------------------------------------------------------------------
@query(
    "crawl_fetch",
    oracle="""
    WITH docs AS (
      SELECT printf('ntp%08d', p_partkey) AS ntp_id,
             'http://docs' || CAST(p_partkey % 5 AS VARCHAR) ||
                '.example/files/' ||
                CASE WHEN p_partkey % 11 = 0 THEN 'missing' ELSE 'doc' END ||
                CAST(p_partkey AS VARCHAR) AS url
      FROM part WHERE p_partkey <= 1000
    )
    SELECT ntp_id, 'doc_url' AS field, url,
           CASE WHEN url LIKE '%missing%' THEN -1 ELSE 200 END AS status,
           CASE WHEN url LIKE '%missing%' THEN ''
                WHEN length(url) % 2 = 0 THEN 'pdf' ELSE 'docx' END AS doc_type,
           CASE WHEN url LIKE '%missing%' THEN 0
                ELSE length('content-of:' || url) END AS n_bytes
    FROM docs
    """,
)
def q_crawl_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    docs = p.select(
        format_ntp_id(F.col("p_partkey")).alias("_id"),
        F.concat(
            F.lit("http://docs"),
            (F.col("p_partkey") % 5).cast("string"),
            F.lit(".example/files/"),
            F.when(F.col("p_partkey") % 11 == 0, F.lit("missing")).otherwise(F.lit("doc")),
            F.col("p_partkey").cast("string"),
        ).alias("doc_url"),
    )
    urls = prune_urls(extract_urls(docs, scalar_cols=("doc_url",)))
    return crawl(urls).drop("idx")


# ---------------------------------------------------------------------------
# A3: version history per natural key (clean_place.py:112-120,174):
# sorted list of (first_update, _id) pairs + version count
# ---------------------------------------------------------------------------
@query(
    "version_history",
    oracle="""
    WITH ex_rows AS (
      SELECT CAST(o_custkey AS VARCHAR) AS id,
             CASE WHEN o_custkey % 50 = 0 THEN o_orderkey % 2 ELSE 0 END AS part,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    ex_groups AS (
      SELECT id, part, min(ts) AS first_upd FROM ex_rows GROUP BY id, part
    ),
    store AS (
      SELECT printf('ntp%08d', row_number() OVER (ORDER BY id, part)) AS _id,
             id, first_upd
      FROM ex_groups
    )
    SELECT id, count(*) AS n_versions,
           array_to_string(list_sort(list(first_upd || '|' || _id)), ';') AS updates_dates_list
    FROM store GROUP BY id
    """,
)
def q_version_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    ex = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_custkey").cast("string").alias("id"),
        F.when(F.col("o_custkey") % 50 == 0, F.col("o_orderkey") % 2)
        .otherwise(F.lit(0))
        .alias("part"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )
    groups = ex.groupBy("id", "part").agg(F.min("ts").alias("first_upd"))
    store = groups.select(
        format_ntp_id(F.row_number().over(W.orderBy("id", "part"))).alias("_id"),
        "id",
        "first_upd",
    )
    return store.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.array_join(
            F.array_sort(F.collect_list(F.concat_ws("|", "first_upd", "_id"))), ";"
        ).alias("updates_dates_list"),
    )
