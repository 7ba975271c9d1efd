"""Storage-sync + crawl-shaped queries (SURVEY.md §2.1 S8/J5/K3,
§3.2/§3.3), file listings derived from ``part`` so they scale with sf."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_etlscripts_spark.functions.scalar import format_ntp_id
from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.plans.registry import query
from datalake_etlscripts_spark.storesync import parse_ntp_range, plan_sync


def _listing(spark: SparkSession, sf_dir: str, side: str) -> DataFrame:
    """Deterministic synthetic file listing: name '{ntp_id}_doc.pdf'
    from the part key; src/dst membership and sizes differ by key
    residues so ADD/DEL/UPD all occur."""
    p = read_table(spark, sf_dir, "part")
    keep = (F.col("p_partkey") % 7 != 0) if side == "src" else (F.col("p_partkey") % 5 != 0)
    size = (
        F.col("p_size")
        if side == "src"
        else F.col("p_size")
        + F.when(F.col("p_partkey") % 3 == 0, F.lit(1)).otherwise(F.lit(0))
    )
    return p.filter(keep).select(
        F.concat(format_ntp_id(F.col("p_partkey")), F.lit("_doc.pdf")).alias("file_name"),
        size.alias("size"),
    )


@query(
    "storage_sync_plan",
    oracle="""
    WITH src AS (
      SELECT printf('ntp%08d', p_partkey) || '_doc.pdf' AS file_name, p_size AS size
      FROM part WHERE p_partkey % 7 <> 0
    ),
    dst AS (
      SELECT printf('ntp%08d', p_partkey) || '_doc.pdf' AS file_name,
             p_size + CASE WHEN p_partkey % 3 = 0 THEN 1 ELSE 0 END AS size
      FROM part WHERE p_partkey % 5 <> 0
    )
    SELECT 'ADD' AS op, s.file_name FROM src s
    WHERE s.file_name NOT IN (SELECT file_name FROM dst)
    UNION ALL
    SELECT 'UPD', s.file_name FROM src s JOIN dst d USING (file_name)
    WHERE s.size <> d.size
    UNION ALL
    SELECT 'DEL', d.file_name FROM dst d
    WHERE d.file_name NOT IN (SELECT file_name FROM src)
    """,
)
def q_storage_sync_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage reconciliation plan (ADD/UPD/DEL) between source and destination listings via anti/semi joins (sync_documents semantics)."""
    src = _listing(spark, sf_dir, "src")
    dst = _listing(spark, sf_dir, "dst")
    return plan_sync(src, dst, content_cols=("size",))


@query(
    "listing_id_range",
    oracle="""
    WITH listing AS (
      SELECT printf('ntp%08d', p_partkey) || '_doc.pdf' AS file_name
      FROM part WHERE p_partkey % 7 <> 0
    )
    SELECT file_name,
           regexp_extract(file_name, '^(ntp[0-9]{8})_', 1) AS ntp_id,
           regexp_extract(file_name, '^ntp[0-9]{8}_(.+)\\.[^.]+$', 1) AS field,
           regexp_extract(file_name, '\\.([^.]+)$', 1) AS ext
    FROM listing
    WHERE regexp_extract(file_name, '^(ntp[0-9]{8})_', 1)
          BETWEEN 'ntp00000010' AND 'ntp00000099'
    """,
)
def q_listing_id_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/P2/P3: storage listing decorated with parsed ntp ids, pruned
    to an id range (ntp_storage.py:74-80 file_list semantics)."""
    listing = _listing(spark, sf_dir, "src").select("file_name")
    parsed = parse_ntp_range(listing)
    return parsed.filter(F.col("ntp_id").between("ntp00000010", "ntp00000099"))


@query(
    "purge_plan",
    oracle="""
    WITH listing AS (
      SELECT printf('ntp%08d', p_partkey) || '_doc.pdf' AS file_name
      FROM part WHERE p_partkey % 7 <> 0
    ),
    obsolete AS (
      SELECT printf('ntp%08d', p_partkey) AS _id FROM part WHERE p_partkey % 4 = 0
    ),
    doomed AS (
      SELECT file_name, regexp_extract(file_name, '^(ntp[0-9]{8})_', 1) AS ntp_id
      FROM listing
      WHERE regexp_extract(file_name, '^(ntp[0-9]{8})_', 1) IN (SELECT _id FROM obsolete)
    )
    SELECT 'BACKUP' AS op, file_name, ntp_id FROM doomed
    UNION ALL
    SELECT 'DEL', file_name, ntp_id FROM doomed
    """,
)
def q_purge_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """purge_documents.py:97-118 parity: files of obsolete versions are
    backed up then deleted; the plan is the --dry_run output."""
    from datalake_etlscripts_spark.storesync import plan_purge

    listing = _listing(spark, sf_dir, "src").select("file_name")
    store = read_table(spark, sf_dir, "part").select(
        format_ntp_id(F.col("p_partkey")).alias("_id"),
        (F.col("p_partkey") % 4 == 0).alias("obsolete_version"),
    )
    return plan_purge(listing, store)


# ---------------------------------------------------------------------------
# Merkle anti-entropy diff (r6): replica checksum trees compared
# top-down — superblocks prune the leaf comparison to the damaged
# keyspace, order-independent 60-bit digest sums patch incrementally.
# ---------------------------------------------------------------------------
def _merkle_oracle() -> str:
    from datalake_etlscripts_spark.plans.registry import ddb_hex60

    digest = ddb_hex60(
        "md5(concat_ws('|', CAST(l_orderkey AS VARCHAR),"
        " CAST(l_linenumber AS VARCHAR), CAST(qn AS VARCHAR)))"
    )
    return f"""
    WITH a0 AS (
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qn
      FROM lineitem
    ),
    b0 AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_orderkey % 991 = 0 THEN qn + 100 ELSE qn END AS qn
      FROM a0 WHERE l_orderkey % 997 <> 0
    ),
    ha AS (SELECT l_orderkey // 4096 AS block, {digest} AS h FROM a0),
    hb AS (SELECT l_orderkey // 4096 AS block, {digest} AS h FROM b0),
    la AS (SELECT block, CAST(count(*) AS BIGINT) AS n_a,
                  CAST(sum(h) % 1152921504606846976 AS BIGINT) AS h_a
           FROM ha GROUP BY 1),
    lb AS (SELECT block, CAST(count(*) AS BIGINT) AS n_b,
                  CAST(sum(h) % 1152921504606846976 AS BIGINT) AS h_b
           FROM hb GROUP BY 1),
    sa AS (SELECT block // 64 AS sb, sum(n_a) AS n, 
                  CAST(sum(h_a) % 1152921504606846976 AS BIGINT) AS h
           FROM la GROUP BY 1),
    sb_ AS (SELECT block // 64 AS sb, sum(n_b) AS n,
                  CAST(sum(h_b) % 1152921504606846976 AS BIGINT) AS h
           FROM lb GROUP BY 1),
    bad AS (
      SELECT COALESCE(sa.sb, sb_.sb) AS sb
      FROM sa FULL JOIN sb_ ON sa.sb = sb_.sb
      WHERE NOT (sa.h IS NOT DISTINCT FROM sb_.h
                 AND sa.n IS NOT DISTINCT FROM sb_.n)
    ),
    laf AS (SELECT * FROM la WHERE block // 64 IN (SELECT sb FROM bad)),
    lbf AS (SELECT * FROM lb WHERE block // 64 IN (SELECT sb FROM bad))
    SELECT COALESCE(laf.block, lbf.block) AS block,
           COALESCE(laf.n_a, 0) AS n_a, COALESCE(lbf.n_b, 0) AS n_b,
           laf.h_a AS h_a, lbf.h_b AS h_b
    FROM laf FULL JOIN lbf ON laf.block = lbf.block
    WHERE NOT (laf.h_a IS NOT DISTINCT FROM lbf.h_b
               AND laf.n_a IS NOT DISTINCT FROM lbf.n_b)
    """


@query("merkle_diff_blocks", oracle=_merkle_oracle())
def q_merkle_diff_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy replica diff via Merkle checksum state: order-independent 60-bit digest sums per 4096-key block roll into superblocks, the descent compares superblocks first and reads leaves only under damage."""
    from datalake_etlscripts_spark.storesync import (
        merkle_block_state,
        merkle_diff_blocks,
    )

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
        .cast("long")
        .alias("qn"),
    )
    b = li.filter(F.col("l_orderkey") % 997 != 0).withColumn(
        "qn",
        F.when(F.col("l_orderkey") % 991 == 0, F.col("qn") + 100).otherwise(
            F.col("qn")
        ),
    )
    rep = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("qn").cast("string"),
    )
    sa = merkle_block_state(li, "l_orderkey", rep)
    sb = merkle_block_state(b, "l_orderkey", rep)
    return merkle_diff_blocks(sa, sb)
