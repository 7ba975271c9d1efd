"""Transactional-store queries: time travel across a CREATE + COW
MERGE, oracle-checked against DuckDB replaying the same upsert in SQL.

The store under test is io/txstore.py — the engine's replacement for
the reference's MongoDB collection (atomic upserts, read_parquet.py
ingest). Here it is driven with deterministic content derived from
``orders`` so the oracle can reconstruct both versions exactly:

  v0 CREATE : orders with o_orderkey % 2 = 0   (key=o_orderkey, price)
  v1 MERGE  : upsert orders with o_orderkey % 3 = 0, price doubled

The query aggregates BOTH snapshots via time travel — proving that v0
is still readable bit-exact after the COW merge replaced files.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.io.txstore import TransactionalStore
from datalake_etlscripts_spark.plans.registry import query


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("id"),
        F.col("o_totalprice").cast("decimal(14,2)").alias("p"),
    )


def build_demo_store(spark: SparkSession, sf_dir: str) -> TransactionalStore:
    base = tempfile.mkdtemp(prefix="txstore_demo_")
    o = _orders(spark, sf_dir)
    v0 = o.filter(F.col("o_orderkey") % 2 == 0).select("id", "p")
    st = TransactionalStore.create(
        spark, os.path.join(base, "t"), v0.repartition(4, "id"), key="id"
    )
    src = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .select("id", (F.col("p") * 2).cast("decimal(14,2)").alias("p"))
    )

    def upsert(subset: DataFrame, source: DataFrame) -> DataFrame:
        return subset.join(source.select("id"), "id", "left_anti").unionByName(source)

    st.merge(src, upsert)
    return st


@query(
    "txstore_time_travel",
    oracle="""
    WITH v0 AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             CAST(o_totalprice AS DECIMAL(14,2)) AS p
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    src AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 2 AS DECIMAL(14,2)) AS p
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    v1 AS (
      SELECT v0.id, v0.p FROM v0 LEFT JOIN src ON v0.id = src.id
      WHERE src.id IS NULL
      UNION ALL SELECT id, p FROM src
    )
    SELECT 0 AS version, COUNT(*) AS n_rows,
           CAST(CAST(SUM(p) AS VARCHAR) AS DOUBLE) AS sum_price
    FROM v0
    UNION ALL
    SELECT 1 AS version, COUNT(*) AS n_rows,
           CAST(CAST(SUM(p) AS VARCHAR) AS DOUBLE) AS sum_price
    FROM v1
    """,
)
def q_txstore_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional-store time travel: read an older snapshot version and diff row counts against latest."""
    st = build_demo_store(spark, sf_dir)

    def agg(version: int) -> DataFrame:
        return (
            st.snapshot(version=version)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("p").cast("double").alias("sum_price"),
            )
            .withColumn("version", F.lit(version))
        )

    return agg(0).unionByName(agg(1))


# ---------------------------------------------------------------------------
# CDC between two store versions (Delta change-data-feed shape):
# v0→v1 of the demo store has only updates (the merge upserts keys
# already present when o_orderkey % 6 == 0) and inserts (% 3 but not
# % 2). The struct payloads are flattened to strings for the compare.
# ---------------------------------------------------------------------------
@query(
    "txstore_snapshot_diff",
    oracle="""
    WITH v0 AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             CAST(o_totalprice AS DECIMAL(14,2)) AS p
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    src AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 2 AS DECIMAL(14,2)) AS p
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    v1 AS (
      SELECT v0.id, v0.p FROM v0 LEFT JOIN src ON v0.id = src.id
      WHERE src.id IS NULL
      UNION ALL SELECT id, p FROM src
    )
    SELECT coalesce(v1.id, v0.id) AS id,
           CASE WHEN v0.id IS NULL THEN 'insert'
                WHEN v1.id IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           coalesce(CAST(v0.p AS VARCHAR), '') AS old_p,
           coalesce(CAST(v1.p AS VARCHAR), '') AS new_p
    FROM v0 FULL OUTER JOIN v1 ON v0.id = v1.id
    WHERE v0.id IS NULL OR v1.id IS NULL OR v0.p <> v1.p
    """,
)
def q_txstore_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two transactional-store snapshots: insert/update/delete rows from manifest-pruned file reads."""
    from datalake_etlscripts_spark.io.txstore import snapshot_diff

    st = build_demo_store(spark, sf_dir)
    d = snapshot_diff(st, 0, 1, key="id")
    return d.select(
        "id",
        "change_type",
        F.coalesce(F.col("_old.p").cast("string"), F.lit("")).alias("old_p"),
        F.coalesce(F.col("_new.p").cast("string"), F.lit("")).alias("new_p"),
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance: the calc_summary counts (A2) refreshed
# from the v0→v1 CDC delta alone — the engine never rescans v1. The
# oracle recomputes the summary over v1 from scratch; hash-equality IS
# the IVM correctness claim (incremental ≡ full recompute).
# The summarized field is a derived price band; cents DIV 2_000_000
# stays in integer arithmetic so Spark and DuckDB band identically
# (decimal division would round differently at band edges).
# ---------------------------------------------------------------------------
_BAND = "CAST(p * 100 AS BIGINT) div 2000000"


@query(
    "summary_incremental",
    oracle="""
    WITH v0 AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             CAST(o_totalprice AS DECIMAL(14,2)) AS p
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    src AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 2 AS DECIMAL(14,2)) AS p
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    v1 AS (
      SELECT v0.id, v0.p FROM v0 LEFT JOIN src ON v0.id = src.id
      WHERE src.id IS NULL
      UNION ALL SELECT id, p FROM src
    )
    SELECT 'band' AS field,
           CAST(CAST(p * 100 AS BIGINT) // 2000000 AS VARCHAR) AS value,
           count(*) AS cnt
    FROM v1 GROUP BY 2
    UNION ALL
    SELECT '__total__', NULL, count(*) FROM v1
    """,
)
def q_summary_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-count summaries maintained from the CDC delta (old state + added - removed) - the base table is never rescanned."""
    from datalake_etlscripts_spark.io.txstore import snapshot_diff
    from datalake_etlscripts_spark.summary import (
        cdc_images,
        incremental_summary,
        summary_counts,
    )

    st = build_demo_store(spark, sf_dir)
    band = lambda df: df.withColumn("band", F.expr(_BAND))  # noqa: E731
    old_sum = summary_counts(band(st.snapshot(version=0)), ["band"])
    removed, added = cdc_images(snapshot_diff(st, 0, 1, key="id"))
    return incremental_summary(old_sum, band(removed), band(added), ["band"])


# ---------------------------------------------------------------------------
# CDC apply — the consumer half of the change-data-feed pair: replay a
# snapshot_diff-shaped changeset (insert/update/delete + payload) onto
# a base snapshot. Deterministic changeset derived from documents:
#   base    = doc_id % 7 <> 0
#   delete  = doc_id % 7 = 1
#   update  = doc_id % 7 = 2   (text rewritten 'rev2 ' || text)
#   insert  = doc_id % 7 = 0   (absent from base)
# ---------------------------------------------------------------------------
@query(
    "cdc_apply",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id % 7 <> 0
    )
    SELECT doc_id, text, lang, source, n_chars
    FROM base WHERE doc_id % 7 NOT IN (1, 2)
    UNION ALL
    SELECT doc_id, 'rev2 ' || text, lang, source, n_chars
    FROM documents WHERE doc_id % 7 = 2
    UNION ALL
    SELECT doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC consumer: apply an insert/update/delete changeset onto a base snapshot - one anti join + delta-sized union, base history never re-read."""
    from datalake_etlscripts_spark.io.txstore import apply_changeset

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    base = d.filter(F.col("doc_id") % 7 != 0)
    updates = d.filter(F.col("doc_id") % 7 == 2).select(
        "doc_id",
        F.lit("update").alias("change_type"),
        F.struct(
            F.concat(F.lit("rev2 "), F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        ).alias("_new"),
    )
    inserts = d.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.lit("insert").alias("change_type"),
        F.struct("text", "lang", "source", "n_chars").alias("_new"),
    )
    payload_type = dict(updates.dtypes)["_new"]
    deletes = d.filter(F.col("doc_id") % 7 == 1).select(
        "doc_id",
        F.lit("delete").alias("change_type"),
        F.lit(None).cast(payload_type).alias("_new"),
    )
    changes = updates.unionByName(inserts).unionByName(deletes)
    return apply_changeset(base, changes, key="doc_id")


# ---------------------------------------------------------------------------
# IVM for a JOIN view (r5): revenue-by-(segment, priority) maintained
# under a signed order delta — inserts AND deletes — by the counting
# algorithm. The oracle recomputes the view from the final fact set;
# hash-equality is the incremental ≡ recompute claim, deletes proven
# by groups whose count returns to zero vanishing.
# ---------------------------------------------------------------------------
@query(
    "ivm_join_view",
    oracle="""
    SELECT c_mktsegment, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o_orderkey % 5 <> 1
    GROUP BY 1, 2
    """,
)
def q_ivm_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-aggregate view maintained from a signed fact delta (counting-algorithm IVM, deletes first-class) - base facts never rescanned, dim broadcast, view-sized merge shuffle."""
    from datalake_etlscripts_spark.summary import incremental_join_view

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(14,2)").alias("price"),
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    keys = ["c_mktsegment", "o_orderpriority"]
    base = o.filter(F.col("o_orderkey") % 5 != 0)
    # the persisted view state (stand-in for a stored table)
    old_view = (
        base.join(F.broadcast(c), "o_custkey")
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("price").cast("decimal(26,2)").alias("_tot"),
        )
        .localCheckpoint()
    )
    delta = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "_sign", F.lit(1)
    ).unionByName(
        o.filter(F.col("o_orderkey") % 5 == 1).withColumn("_sign", F.lit(-1))
    )
    v = incremental_join_view(old_view, delta, c, "o_custkey", keys, "price")
    return v.select(
        *keys, "n", F.col("_tot").cast("double").alias("total_price")
    )


# ---------------------------------------------------------------------------
# MIN-view IVM (r6): the aggregate the counting algorithm canNOT
# self-maintain — min-multiplicity state absorbs most deletes, only
# min-exhausted groups rescan the base via a pruned semi-join. The
# oracle recomputes the view from the final fact set (incremental ≡
# recompute) and derives the rescanned flag from the same pre/delta
# aggregates the engine uses.
# ---------------------------------------------------------------------------
@query(
    "ivm_minmax_view",
    oracle="""
    WITH f AS (
      SELECT l_suppkey AS g, CAST(l_extendedprice AS DECIMAL(12,2)) AS v,
             l_orderkey % 5 AS m
      FROM lineitem
    ),
    base AS (SELECT g, v FROM f WHERE m <> 0),
    finalt AS (SELECT g, v FROM f WHERE m <> 1),
    oldmin AS (SELECT g, min(v) AS old_min FROM base GROUP BY g),
    oldnmin AS (
      SELECT b.g, CAST(count(*) AS BIGINT) AS n_min_old
      FROM base b JOIN oldmin o ON o.g = b.g AND b.v = o.old_min
      GROUP BY b.g
    ),
    sd AS (
      SELECT g, v, 1 AS s FROM f WHERE m = 0
      UNION ALL
      SELECT g, v, -1 AS s FROM f WHERE m = 1
    ),
    d1 AS (
      SELECT g, min(CASE WHEN s = 1 THEN v END) AS ins_min FROM sd GROUP BY g
    ),
    dat AS (
      SELECT x.g, CAST(sum(x.s) AS BIGINT) AS d_at_old_min
      FROM sd x JOIN oldmin o ON o.g = x.g AND x.v = o.old_min
      GROUP BY x.g
    ),
    newv AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n, min(v) AS min_v
      FROM finalt GROUP BY g
    ),
    newnmin AS (
      SELECT t.g, CAST(count(*) AS BIGINT) AS n_min
      FROM finalt t JOIN newv nv ON nv.g = t.g AND t.v = nv.min_v
      GROUP BY t.g
    )
    SELECT nv.g, nv.n, CAST(nv.min_v AS DOUBLE) AS min_v, nm.n_min,
           CASE
             WHEN d1.ins_min IS NOT NULL
                  AND (o.old_min IS NULL OR d1.ins_min < o.old_min) THEN FALSE
             WHEN o.old_min IS NOT NULL
                  AND COALESCE(no.n_min_old, 0)
                        + COALESCE(dat.d_at_old_min, 0) > 0
                  AND NOT (d1.ins_min IS NOT NULL
                           AND d1.ins_min < o.old_min) THEN FALSE
             ELSE TRUE
           END AS rescanned
    FROM newv nv
    JOIN newnmin nm ON nm.g = nv.g
    LEFT JOIN oldmin o ON o.g = nv.g
    LEFT JOIN oldnmin no ON no.g = nv.g
    LEFT JOIN d1 ON d1.g = nv.g
    LEFT JOIN dat ON dat.g = nv.g
    """,
)
def q_ivm_minmax_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN-aggregate view maintained incrementally with min-multiplicity state (Gupta-Mumick self-maintenance) - deletes at the min only rescan base when multiplicity exhausts, rescan pruned to dirty keys by semi-join."""
    from datalake_etlscripts_spark.summary import incremental_minmax_view

    li = read_table(spark, sf_dir, "lineitem")
    f = li.select(
        F.col("l_suppkey").alias("g"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("v"),
        (F.col("l_orderkey") % 5).alias("_m"),
    )
    base = f.filter(F.col("_m") != 0)
    mn = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.min("v").alias("min_v")
    )
    old_view = (
        base.join(F.broadcast(mn), "g")
        .filter(F.col("v") == F.col("min_v"))
        .groupBy("g", "n", "min_v")
        .agg(F.count(F.lit(1)).cast("long").alias("n_min"))
        .localCheckpoint()
    )
    delta = (
        f.filter(F.col("_m") == 0)
        .withColumn("_sign", F.lit(1))
        .unionByName(f.filter(F.col("_m") == 1).withColumn("_sign", F.lit(-1)))
        .select("g", "v", "_sign")
    )
    current = f.filter(F.col("_m") != 1).select("g", "v")
    out = incremental_minmax_view(old_view, delta, current, "g", "v")
    return out.withColumn("min_v", F.col("min_v").cast("double"))


# ---------------------------------------------------------------------------
# Transaction conflict detection (r6): the OCC/SSI certifier as a
# relational pass — write-write intersection plus SSI's rw
# antidependency (T2 read overlapping T1's write), first-committer
# (T1) wins. One full-outer key join, nothing row-scale collected.
# ---------------------------------------------------------------------------
@query(
    "txn_conflict_detect",
    oracle="""
    WITH w1 AS (SELECT DISTINCT o_orderkey AS k FROM orders
                WHERE o_orderkey % 7 = 0),
    w2 AS (SELECT DISTINCT o_orderkey AS k FROM orders
           WHERE o_orderkey % 5 = 0),
    r2 AS (SELECT DISTINCT o_orderkey AS k FROM orders
           WHERE o_orderkey % 3 = 0),
    u AS (
      SELECT COALESCE(w1.k, w2.k, r2.k) AS k,
             w1.k IS NOT NULL AS in_w1,
             w2.k IS NOT NULL AS in_w2,
             r2.k IS NOT NULL AS in_r2
      FROM w1
      FULL JOIN w2 ON w1.k = w2.k
      FULL JOIN r2 ON COALESCE(w1.k, w2.k) = r2.k
    ),
    c AS (
      SELECT k,
             CASE WHEN in_w1 AND in_w2 THEN 'ww_conflict'
                  WHEN in_w1 AND in_r2 THEN 'rw_conflict'
                  WHEN in_w1 THEN 't1_write'
                  WHEN in_w2 THEN 't2_write'
                  ELSE 't2_read' END AS outcome
      FROM u
    )
    SELECT outcome, CAST(count(*) AS BIGINT) AS n_keys,
           CAST(min(k) AS BIGINT) AS first_key
    FROM c GROUP BY outcome
    """,
)
def q_txn_conflict_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCC/SSI commit certification over two concurrent batches: write-write intersection and the rw-antidependency class, first-committer wins - one full-outer key join, outcome-class counts out."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    w1 = o.filter(F.col("o_orderkey") % 7 == 0).distinct().select(
        F.col("o_orderkey").alias("k"), F.lit(True).alias("in_w1")
    )
    w2 = o.filter(F.col("o_orderkey") % 5 == 0).distinct().select(
        F.col("o_orderkey").alias("k"), F.lit(True).alias("in_w2")
    )
    r2 = o.filter(F.col("o_orderkey") % 3 == 0).distinct().select(
        F.col("o_orderkey").alias("k"), F.lit(True).alias("in_r2")
    )
    u = (
        w1.join(w2, "k", "full_outer")
        .join(r2, "k", "full_outer")
        .select(
            "k",
            F.coalesce("in_w1", F.lit(False)).alias("in_w1"),
            F.coalesce("in_w2", F.lit(False)).alias("in_w2"),
            F.coalesce("in_r2", F.lit(False)).alias("in_r2"),
        )
    )
    outcome = (
        F.when(F.col("in_w1") & F.col("in_w2"), "ww_conflict")
        .when(F.col("in_w1") & F.col("in_r2"), "rw_conflict")
        .when(F.col("in_w1"), "t1_write")
        .when(F.col("in_w2"), "t2_write")
        .otherwise("t2_read")
    )
    return u.select("k", outcome.alias("outcome")).groupBy("outcome").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.min("k").cast("long").alias("first_key"),
    )


# ---------------------------------------------------------------------------
# TOP-K view IVM (r7): the third maintenance shape beside the counting
# algorithm and min-multiplicity state — a 2k-buffer with floor τ; only
# non-buffer delta keys whose upper bound τ+Δ clears the updated k-th
# count rescan the base (dirty-key semi-join). The oracle RECOMPUTES
# the top-k from the post-delta facts (incremental ≡ recompute) and
# derives the rescanned flag from the same pre/delta aggregates the
# engine uses — including the refill condition (updated k-th count
# sinking below the floor flags every row rescanned). Delta:
# o_orderkey%7=0 inserts (absent from base), %7=1 AND %3=0 deletes
# (pressure tuned so the incremental path, not refill, runs at the
# test SFs; the refill branch is unit-tested with mass deletes).
# ---------------------------------------------------------------------------
@query(
    "ivm_topk_view",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS g FROM orders WHERE o_orderkey % 7 <> 0
    ),
    bc AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1),
    buf AS (
      SELECT g, cnt FROM (
        SELECT g, cnt, row_number() OVER (ORDER BY cnt DESC, g) AS rn
        FROM bc
      ) WHERE rn <= 20
    ),
    tau AS (
      SELECT CASE WHEN (SELECT count(*) FROM buf) >= 20
                  THEN (SELECT min(cnt) FROM buf) ELSE 0 END AS t
    ),
    d AS (
      SELECT o_custkey AS g,
             CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE -1 END)
                  AS BIGINT) AS dn
      FROM orders
      WHERE o_orderkey % 7 = 0
         OR (o_orderkey % 7 = 1 AND o_orderkey % 3 = 0)
      GROUP BY 1
    ),
    b2 AS (
      SELECT buf.g, buf.cnt + COALESCE(d.dn, 0) AS cnt
      FROM buf LEFT JOIN d USING (g)
      WHERE buf.cnt + COALESCE(d.dn, 0) > 0
    ),
    kth AS (
      SELECT min(cnt) AS kv FROM (
        SELECT cnt, row_number() OVER (ORDER BY cnt DESC, g) AS rn FROM b2
      ) WHERE rn <= 10
    ),
    resc AS (
      SELECT d.g FROM d, tau, kth
      WHERE d.g NOT IN (SELECT g FROM buf) AND tau.t + d.dn >= kth.kv
    ),
    post AS (
      SELECT o_custkey AS g FROM orders
      WHERE NOT (o_orderkey % 7 = 1 AND o_orderkey % 3 = 0)
    ),
    r AS (
      SELECT g, cnt, row_number() OVER (ORDER BY cnt DESC, g) AS rnk
      FROM (SELECT g, CAST(count(*) AS BIGINT) AS cnt FROM post GROUP BY 1)
    )
    SELECT CAST(rnk AS INT) AS rank, g AS o_custkey, cnt AS n,
           CASE WHEN (SELECT count(*) FROM b2) < 10
                  OR (SELECT kv FROM kth) < (SELECT t FROM tau)
             THEN TRUE ELSE g IN (SELECT g FROM resc) END AS rescanned
    FROM r WHERE rnk <= 10
    """,
)
def q_ivm_topk_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k-by-count view maintained from a signed delta with a 2k buffer and floor bound - only non-buffer keys whose upper bound clears the updated k-th count rescan the base; oracle recomputes from post-delta facts (incremental = recompute)."""
    from datalake_etlscripts_spark.summary import incremental_topk_view

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = o.filter(F.col("o_orderkey") % 7 != 0)
    buf = (
        base.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("o_custkey"))
        .limit(20)
        .localCheckpoint()  # the persisted view state (stand-in for a table)
    )
    is_del = (F.col("o_orderkey") % 7 == 1) & (F.col("o_orderkey") % 3 == 0)
    delta = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "_sign", F.lit(1)
    ).unionByName(o.filter(is_del).withColumn("_sign", F.lit(-1)))
    post = o.filter(~is_del)
    return incremental_topk_view(
        buf, delta, post, "o_custkey", k=10, buffer_cap=20
    )


# ---------------------------------------------------------------------------
# Schema evolution through MERGE (round-6 verdict #6): v1 upserts a
# source carrying a NEW column through merge(evolve_schema=True) —
# untouched v0 files stay on disk without the column (no rewrite),
# the evolved snapshot null-fills them via parquet footer union, and
# time travel still serves v0 under its ORIGINAL two-column schema.
# The query aggregates both snapshots plus a schema probe per side,
# so a driver-green row proves add-column evolution, COW isolation,
# and old-schema readability at once. Delta-Lake mergeSchema
# semantics; the reference's Mongo upserts are schemaless so this is
# the lakehouse-grade replacement surface (read_parquet.py:85-122).
# ---------------------------------------------------------------------------
@query(
    "evolve_merge_demo",
    oracle="""
    WITH v0 AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             CAST(o_totalprice AS DECIMAL(14,2)) AS p
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    src AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 2
                  AS DECIMAL(14,2)) AS p,
             CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    v1 AS (
      SELECT v0.id, v0.p, CAST(NULL AS BIGINT) AS prio
      FROM v0 LEFT JOIN src ON v0.id = src.id WHERE src.id IS NULL
      UNION ALL SELECT id, p, prio FROM src
    )
    SELECT 0 AS version, CAST(2 AS BIGINT) AS n_cols,
           COUNT(*) AS n_rows,
           CAST(0 AS BIGINT) AS n_prio,
           CAST(0 AS BIGINT) AS sum_prio,
           CAST(CAST(SUM(p) AS VARCHAR) AS DOUBLE) AS sum_price
    FROM v0
    UNION ALL
    SELECT 1 AS version, CAST(3 AS BIGINT) AS n_cols,
           COUNT(*) AS n_rows,
           CAST(COUNT(prio) AS BIGINT) AS n_prio,
           CAST(coalesce(SUM(prio), 0) AS BIGINT) AS sum_prio,
           CAST(CAST(SUM(p) AS VARCHAR) AS DOUBLE) AS sum_price
    FROM v1
    """,
)
def q_evolve_merge_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution through a COW merge: v1 adds a 'prio' column via merge(evolve_schema=True), v0 time-travels back under its original schema - per-version row/column/priority aggregates prove evolution without rewrite."""
    base = tempfile.mkdtemp(prefix="txstore_evolve_")
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("id"),
        F.col("o_totalprice").cast("decimal(14,2)").alias("p"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("prio"),
    )
    v0 = o.filter(F.col("o_orderkey") % 2 == 0).select("id", "p")
    st = TransactionalStore.create(
        spark, os.path.join(base, "t"), v0.repartition(4, "id"), key="id"
    )
    src = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "id",
        (F.col("p") * 2).cast("decimal(14,2)").alias("p"),
        "prio",
    )

    def upsert(subset: DataFrame, source: DataFrame) -> DataFrame:
        return subset.join(
            source.select("id"), "id", "left_anti"
        ).unionByName(source)

    st.merge(src, upsert, evolve_schema=True)

    def probe(version: int) -> DataFrame:
        s = st.snapshot(version=version)
        has_prio = "prio" in s.columns
        return s.agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.count("prio") if has_prio else F.lit(0)
            ).cast("long").alias("n_prio"),
            (
                F.coalesce(F.sum("prio"), F.lit(0))
                if has_prio
                else F.lit(0)
            ).cast("long").alias("sum_prio"),
            F.sum("p").cast("double").alias("sum_price"),
        ).select(
            F.lit(version).alias("version"),
            F.lit(len(s.columns)).cast("long").alias("n_cols"),
            "n_rows",
            "n_prio",
            "sum_prio",
            "sum_price",
        )

    return probe(0).unionByName(probe(1))
