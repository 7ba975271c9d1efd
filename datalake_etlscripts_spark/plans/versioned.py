"""Flagship versioned-ingest query, oracle-checkable.

Derives a versioned store + one incoming batch deterministically from
the ``orders`` table (so it scales with the scale factor), runs the
real ``versioning.merge_batch``, and exposes the resulting state.
The DuckDB oracle replicates the merge semantics in pure SQL.

Construction (deterministic in both engines):
- natural key ``id``     = customer key as string
- version timestamps     = the customer's order dates ('yyyy-MM-dd HH:mm:ss')
- store                  = orders with o_orderkey % 3 != 0; customers with
                           o_custkey % 50 == 0 get TWO active rows (split by
                           orderkey parity) to exercise the multi-active
                           demotion path (read_parquet.py:112-118)
- incoming batch         = orders with o_orderkey % 3 == 0 OR % 5 == 0;
                           the % 5 overlap makes some keys idempotent
                           re-ingests (timestamp-set overlap), % 3-only
                           keys merge without overlap, never-seen keys
                           get fresh ids
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.functions.scalar import format_ntp_id
from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.plans.registry import query
from datalake_etlscripts_spark.versioning import merge_batch

VFIELDS = ["title", "price"]


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_custkey").cast("string").alias("id"),
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price"),
    )


def _collapse(rows: DataFrame, keys: list[str]) -> DataFrame:
    """One row per key group: sorted distinct ts set + latest fields.
    Single groupBy (map-side combined) — max_by picks the latest row's
    fields in the same shuffle that unions the timestamp sets, instead
    of a window + join (3 shuffles → 1)."""
    agg = rows.groupBy(*keys).agg(
        F.array_sort(F.collect_set("ts")).alias("updated"),
        F.max_by(
            F.struct(F.col("prio").alias("title"), F.col("price")),
            F.struct("ts", "o_orderkey"),
        ).alias("_f"),
    )
    return agg.select(
        *keys, "updated", F.col("_f.title").alias("title"), F.col("_f.price").alias("price")
    )


def build_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _base(spark, sf_dir).filter(F.col("o_orderkey") % 3 != 0)
    rows = rows.withColumn(
        "part",
        F.when(F.col("id").cast("long") % 50 == 0, F.col("o_orderkey") % 2).otherwise(
            F.lit(0)
        ),
    )
    groups = _collapse(rows, ["id", "part"])
    # demo-store construction only: a global row_number builds the fake
    # id space; real ingest never renumbers the store (see versioning.py)
    return groups.select(
        format_ntp_id(F.row_number().over(W.orderBy("id", "part"))).alias("_id"),
        "id",
        "updated",
        F.lit(False).alias("obsolete_version"),
        F.lit(None).cast("string").alias("updated_to"),
        "title",
        "price",
    )


def build_incoming(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _base(spark, sf_dir).filter(
        (F.col("o_orderkey") % 3 == 0) | (F.col("o_orderkey") % 5 == 0)
    )
    return _collapse(rows, ["id"]).select("id", "updated", "title", "price")


@query(
    "versioned_ingest",
    oracle="""
    WITH base AS (
      SELECT CAST(o_custkey AS VARCHAR) AS id, o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts,
             o_orderpriority AS prio,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price
      FROM orders
    ),
    ex_rows AS (
      SELECT *, CASE WHEN o_custkey % 50 = 0 THEN o_orderkey % 2 ELSE 0 END AS part
      FROM base WHERE o_orderkey % 3 <> 0
    ),
    ex_latest AS (
      SELECT id, part, prio, price FROM (
        SELECT *, row_number() OVER (PARTITION BY id, part
                                     ORDER BY ts DESC, o_orderkey DESC) AS rn
        FROM ex_rows) WHERE rn = 1
    ),
    ex_groups AS (
      SELECT id, part, list_sort(list(DISTINCT ts)) AS updated
      FROM ex_rows GROUP BY id, part
    ),
    existing AS (
      SELECT printf('ntp%08d', row_number() OVER (ORDER BY g.id, g.part)) AS _id,
             g.id, g.updated, l.prio AS title, l.price
      FROM ex_groups g JOIN ex_latest l ON g.id = l.id AND g.part = l.part
    ),
    inc_rows AS (SELECT * FROM base WHERE o_orderkey % 3 = 0 OR o_orderkey % 5 = 0),
    inc_latest AS (
      SELECT id, prio, price FROM (
        SELECT *, row_number() OVER (PARTITION BY id
                                     ORDER BY ts DESC, o_orderkey DESC) AS rn
        FROM inc_rows) WHERE rn = 1
    ),
    incoming AS (
      SELECT r.id, list_sort(list(DISTINCT r.ts)) AS updated, l.prio AS title, l.price
      FROM inc_rows r JOIN inc_latest l ON r.id = l.id
      GROUP BY r.id, l.prio, l.price
    ),
    cand AS (
      SELECT i.id, i.updated AS inc_updated, i.title AS inc_title,
             i.price AS inc_price, e._id AS old_id, e.updated AS old_updated,
             e.title AS old_title, e.price AS old_price,
             coalesce(len(list_intersect(i.updated, e.updated)) > 0, FALSE) AS ovl
      FROM incoming i LEFT JOIN existing e ON i.id = e.id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY id ORDER BY ovl DESC, old_id DESC) AS rk,
             flatten(list(old_updated) OVER (PARTITION BY id)) AS all_old_updated
      FROM cand
    ),
    resolved AS (
      SELECT *, CASE WHEN old_id IS NULL THEN 'new' ELSE 'merge' END AS action
      FROM ranked WHERE rk = 1
    ),
    mo AS (SELECT count(*) AS m FROM existing),
    with_target AS (
      SELECT r.*, CASE WHEN action = 'merge' THEN old_id
                       ELSE printf('ntp%08d', (SELECT m FROM mo) +
                            row_number() OVER (PARTITION BY action ORDER BY id))
                  END AS target_id
      FROM resolved r
    ),
    upserts AS (
      SELECT target_id AS _id, id,
             CASE WHEN action = 'merge'
                  THEN list_sort(list_distinct(list_concat(all_old_updated, inc_updated)))
                  ELSE inc_updated END AS updated,
             FALSE AS obsolete_version, CAST(NULL AS VARCHAR) AS updated_to,
             CASE WHEN action = 'merge'
                  THEN coalesce(nullif(inc_title, ''), old_title)
                  ELSE inc_title END AS title,
             CASE WHEN action = 'merge'
                  THEN coalesce(nullif(inc_price, ''), old_price)
                  ELSE inc_price END AS price
      FROM with_target
    ),
    demoted AS (
      SELECT e._id, e.id, e.updated, TRUE AS obsolete_version,
             t.target_id AS updated_to,
             CAST(NULL AS VARCHAR) AS title, CAST(NULL AS VARCHAR) AS price
      FROM existing e JOIN with_target t ON e.id = t.id AND e._id <> t.target_id
    ),
    untouched AS (
      SELECT e._id, e.id, e.updated, FALSE AS obsolete_version,
             CAST(NULL AS VARCHAR) AS updated_to, e.title, e.price
      FROM existing e WHERE e.id NOT IN (SELECT id FROM incoming)
    ),
    state AS (
      SELECT * FROM untouched UNION ALL SELECT * FROM upserts
      UNION ALL SELECT * FROM demoted
    )
    SELECT _id, id, array_to_string(updated, ',') AS updated_str,
           obsolete_version, coalesce(updated_to, '') AS updated_to,
           coalesce(title, '') AS title, coalesce(price, '') AS price
    FROM state
    """,
)
def q_versioned_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # in production the store is a materialized table; merge_batch
    # references it 4× (max_order + three joins), so materialize the
    # demo construction once instead of re-deriving it per reference
    store = build_store(spark, sf_dir).localCheckpoint()
    incoming = build_incoming(spark, sf_dir)
    state = merge_batch(store, incoming, VFIELDS)
    return state.select(
        "_id",
        "id",
        F.array_join("updated", ",").alias("updated_str"),
        "obsolete_version",
        F.coalesce("updated_to", F.lit("")).alias("updated_to"),
        F.coalesce("title", F.lit("")).alias("title"),
        F.coalesce("price", F.lit("")).alias("price"),
    )


@query(
    "version_invariants",
    oracle="""
    -- healthy post-merge state: zero multi-active keys, zero dangling pointers
    SELECT 0 AS n_multi_active, 0 AS n_dangling
    """,
)
def q_version_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_etlscripts_spark.versioning import (
        check_pointers_resolve,
        check_unique_active,
    )

    state = merge_batch(
        build_store(spark, sf_dir), build_incoming(spark, sf_dir), VFIELDS
    ).localCheckpoint()
    return spark.createDataFrame(
        [(check_unique_active(state).count(), check_pointers_resolve(state).count())],
        "n_multi_active bigint, n_dangling bigint",
    )
