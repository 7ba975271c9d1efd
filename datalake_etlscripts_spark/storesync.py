"""Storage reconciliation — sync_documents.py semantics, set-oriented.

The reference lists two storage backends and walks Python sets to
decide transfers/deletes (sync_documents.py:202-281). Here the two
listings are DataFrames and the decision is three joins:

  ADD  source files missing at destination        (left_anti)
  DEL  destination files missing at source        (reversed anti)
  UPD  present on both but content differs        (inner + filter)

The reference compares names only (UPD emitted only with --force,
sync_documents.py:214-231); we also compare a content column (size /
checksum) when provided. ``plan_sync`` is the --check_only/--patch_list
dry run (sync_documents.py:233-245): the plan IS a DataFrame — write
it as text for the audit file, or feed it to apply callbacks in
``foreachPartition`` for the real transfer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plan_sync(
    src: DataFrame,
    dst: DataFrame,
    name_col: str = "file_name",
    content_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Reconciliation plan: (op 'ADD'|'DEL'|'UPD', file_name).
    One shuffle on the name key (both listings hash-partitioned);
    content comparison rides the same join."""
    s = src.select(F.col(name_col), *[F.col(c).alias(f"_s_{c}") for c in content_cols])
    d = dst.select(F.col(name_col), *[F.col(c).alias(f"_d_{c}") for c in content_cols])
    add = s.join(d, name_col, "left_anti").select(
        F.lit("ADD").alias("op"), F.col(name_col)
    )
    delete = d.join(s, name_col, "left_anti").select(
        F.lit("DEL").alias("op"), F.col(name_col)
    )
    if content_cols:
        differs = None
        for c in content_cols:
            cond = ~F.col(f"_s_{c}").eqNullSafe(F.col(f"_d_{c}"))
            differs = cond if differs is None else (differs | cond)
        upd = (
            s.join(d, name_col, "inner")
            .filter(differs)
            .select(F.lit("UPD").alias("op"), F.col(name_col))
        )
        return add.unionByName(upd).unionByName(delete)
    return add.unionByName(delete)


def apply_sync(
    plan: DataFrame,
    transfer: Callable[[str], None],
    delete: Callable[[str], None],
    name_col: str = "file_name",
) -> dict[str, int]:
    """Execute a plan with per-partition callbacks (the external-I/O
    stage; sync_documents.py:249-281 transfer/delete loops). Returns
    op tallies. Callbacks run on executors — they must be serializable
    and idempotent (a retried task re-runs its partition)."""
    counts = {
        r["op"]: r["n"]
        for r in plan.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    def run(rows):
        for row in rows:
            if row["op"] in ("ADD", "UPD"):
                transfer(row[name_col])
            elif row["op"] == "DEL":
                delete(row[name_col])

    plan.foreachPartition(run)
    return counts


def parse_ntp_range(listing: DataFrame, name_col: str = "file_name") -> DataFrame:
    """S8: decorate a listing with (ntp_id, field, ext) parsed from
    '{ntp_id}_{field}.{ext}' names (ntp_storage.py:12-30 semantics),
    enabling id-range pruning before any transfer."""
    from datalake_etlscripts_spark.functions.scalar import split_file_name

    parts = split_file_name(F.col(name_col))
    out = listing
    for k, c in parts.items():
        out = out.withColumn(k, c)
    return out


def plan_purge(
    listing: DataFrame,
    store: DataFrame,
    name_col: str = "file_name",
) -> DataFrame:
    """Purge plan (purge_documents.py:97-118 semantics, set-oriented):
    files belonging to OBSOLETE store rows are backed up then deleted.
    Returns (op 'BACKUP'|'DEL', file_name, ntp_id) — two ordered rows
    per doomed file, so apply callbacks can run the backup strictly
    before the delete (the reference's store-to-backup-bucket-then-
    delete loop). The reference's --dry_run is simply not applying
    the plan.

    One semi-join of the listing (parsed ntp_id) against the obsolete
    ids: the store side is projected to its key column only, so at
    100 TB the probe side is a column-pruned scan, not a row fetch
    per file (the reference does one find() per obsolete doc).
    """
    obsolete_ids = store.filter(
        F.coalesce(F.col("obsolete_version"), F.lit(False))
    ).select(F.col("_id").alias("ntp_id"))
    doomed = (
        parse_ntp_range(listing, name_col)
        .join(obsolete_ids, "ntp_id", "left_semi")
        .select(name_col, "ntp_id")
    )
    return doomed.select(F.lit("BACKUP").alias("op"), name_col, "ntp_id").unionByName(
        doomed.select(F.lit("DEL").alias("op"), name_col, "ntp_id")
    )
