"""Flagship versioned-ingest query, oracle-checkable.

Derives a versioned store + one incoming batch deterministically from
the ``customer`` key spine (scales with the scale factor), runs the
real ``versioning.merge_batch``, and exposes the resulting state.
The DuckDB oracle replicates the merge semantics in pure SQL.

Fixture construction (arithmetic, identical in both engines — no
aggregation, no global window: the store fixture is pure projection,
so the benched time is the MERGE, not scaffolding):
- natural key ``id``   = customer key as string
- timestamps           = printf('2024-%02d-%02d 00:00:0%d') derived
                         from (custkey, lane) — distinct per lane
- store                = custkeys with ck % 3 != 0; one active row
                         (part 0, lanes {0,1}); ck % 50 == 0 adds a
                         SECOND active (part 1, lane {2}) to exercise
                         the multi-active demotion path
                         (read_parquet.py:112-118); _id = ntp(2·ck+part)
- incoming             = custkeys with ck % 3 == 0 OR ck % 5 == 0:
                         ck % 10 == 0 → lanes {1,9}: overlaps the
                         store (idempotent re-ingest); other ck % 5
                         → lane {8}: disjoint → merge onto max-_id
                         active (reference fallback); ck % 3-only →
                         never-seen keys, fresh ids from max_order+1
- fields               = title always overwrites (non-empty); price
                         is '' for ck % 4 == 0 → keeps the old value
                         (ntp_entry.py:30-46 empty-keeps-old)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_etlscripts_spark.functions.scalar import format_ntp_id
from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.plans.registry import query
from datalake_etlscripts_spark.versioning import merge_batch

VFIELDS = ["title", "price"]


def _ts(ck: Column, j: int) -> Column:
    return F.format_string(
        "2024-%02d-%02d 00:00:0%d",
        (ck + F.lit(j)) % 12 + 1,
        (ck * 3 + F.lit(j)) % 28 + 1,
        F.lit(j),
    )


def _spine(spark: SparkSession, sf_dir: str) -> Column:
    return read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck")
    )


def build_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _spine(spark, sf_dir).filter(F.col("ck") % 3 != 0)
    ck = F.col("ck")
    part0 = c.select(ck, F.lit(0).alias("part"))
    part1 = c.filter(ck % 50 == 0).select(ck, F.lit(1).alias("part"))
    rows = part0.unionByName(part1)
    return rows.select(
        format_ntp_id(ck * 2 + F.col("part")).alias("_id"),
        ck.cast("string").alias("id"),
        F.when(
            F.col("part") == 0, F.array_sort(F.array(_ts(ck, 0), _ts(ck, 1)))
        )
        .otherwise(F.array(_ts(ck, 2)))
        .alias("updated"),
        F.lit(False).alias("obsolete_version"),
        F.lit(None).cast("string").alias("updated_to"),
        F.concat(F.lit("T"), (ck % 7).cast("string")).alias("title"),
        (ck * 10).cast("string").alias("price"),
    )


def build_incoming(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _spine(spark, sf_dir).filter(
        (F.col("ck") % 3 == 0) | (F.col("ck") % 5 == 0)
    )
    ck = F.col("ck")
    return c.select(
        ck.cast("string").alias("id"),
        F.when(ck % 10 == 0, F.array_sort(F.array(_ts(ck, 1), _ts(ck, 9))))
        .when(ck % 5 == 0, F.array(_ts(ck, 8)))
        .otherwise(F.array(_ts(ck, 7)))
        .alias("updated"),
        F.concat(F.lit("I"), (ck % 5).cast("string")).alias("title"),
        F.when(ck % 4 == 0, F.lit("")).otherwise((ck * 11).cast("string")).alias(
            "price"
        ),
    )


_CONSTRUCTION_SQL = """
    cust AS (SELECT c_custkey AS ck FROM customer),
    ex_rows AS (
      SELECT ck, 0 AS part FROM cust WHERE ck % 3 <> 0
      UNION ALL
      SELECT ck, 1 FROM cust WHERE ck % 3 <> 0 AND ck % 50 = 0
    ),
    existing AS (
      SELECT printf('ntp%08d', ck * 2 + part) AS _id,
             CAST(ck AS VARCHAR) AS id,
             CASE WHEN part = 0 THEN list_sort([
               printf('2024-%02d-%02d 00:00:0%d', (ck + 0) % 12 + 1, (ck*3 + 0) % 28 + 1, 0),
               printf('2024-%02d-%02d 00:00:0%d', (ck + 1) % 12 + 1, (ck*3 + 1) % 28 + 1, 1)])
             ELSE [printf('2024-%02d-%02d 00:00:0%d', (ck + 2) % 12 + 1, (ck*3 + 2) % 28 + 1, 2)]
             END AS updated,
             'T' || CAST(ck % 7 AS VARCHAR) AS title,
             CAST(ck * 10 AS VARCHAR) AS price
      FROM ex_rows
    ),
    incoming AS (
      SELECT CAST(ck AS VARCHAR) AS id,
             CASE WHEN ck % 10 = 0 THEN list_sort([
               printf('2024-%02d-%02d 00:00:0%d', (ck + 1) % 12 + 1, (ck*3 + 1) % 28 + 1, 1),
               printf('2024-%02d-%02d 00:00:0%d', (ck + 9) % 12 + 1, (ck*3 + 9) % 28 + 1, 9)])
             WHEN ck % 5 = 0 THEN
               [printf('2024-%02d-%02d 00:00:0%d', (ck + 8) % 12 + 1, (ck*3 + 8) % 28 + 1, 8)]
             ELSE
               [printf('2024-%02d-%02d 00:00:0%d', (ck + 7) % 12 + 1, (ck*3 + 7) % 28 + 1, 7)]
             END AS updated,
             'I' || CAST(ck % 5 AS VARCHAR) AS title,
             CASE WHEN ck % 4 = 0 THEN '' ELSE CAST(ck * 11 AS VARCHAR) END AS price
      FROM cust WHERE ck % 3 = 0 OR ck % 5 = 0
    )
"""


@query(
    "versioned_ingest",
    oracle=f"""
    WITH {_CONSTRUCTION_SQL},
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
    mo AS (SELECT coalesce(max(ck * 2 + part), 0) AS m FROM ex_rows),
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
    """Flagship: merge an incoming batch into the versioned store - resolve against active versions, obsolete overlaps, assign new _ids (read_parquet.py semantics, set-oriented)."""
    # the store is projection-only (no shuffle), but merge_batch
    # references it 4× (max_order + three joins) — materialize once;
    # in production this is the already-materialized store table
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
    """Post-merge health: zero multi-active keys and zero dangling updated_to pointers over the merged state."""
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
