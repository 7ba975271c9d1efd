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


def merkle_block_state(
    df: DataFrame,
    key_col: str,
    repr_col,
    block_size: int = 4096,
    fanout: int = 64,
) -> DataFrame:
    """Merkle-style checksum state for anti-entropy replica repair
    (the Dynamo/Cassandra pattern, relationalized): each row digests
    to a 60-bit md5 lane, blocks of ``block_size`` keys sum digests
    mod 2⁶⁰ (ORDER-INDEPENDENT and an addition monoid — an insert or
    delete patches the block hash without re-reading the block), and
    ``fanout`` blocks roll into one superblock the same way. Returns
    (level, block, n_rows, h) with level 0 = leaf blocks, 1 =
    superblocks — the state each replica publishes."""
    from datalake_etlscripts_spark.functions.scalar import md5_hash60

    mod = 1 << 60
    leaf = (
        df.select(
            F.expr(f"{key_col} div {block_size}").alias("block"),
            md5_hash60(repr_col).alias("_h"),
        )
        .groupBy("block")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            # digests are < 2^60 but a block of 4096 of them tops 2^72:
            # accumulate in DECIMAL(38,0), mod back into the 60-bit lane
            (F.sum(F.col("_h").cast("decimal(38,0)")) % mod)
            .cast("long")
            .alias("h"),
        )
        # r07 (guide §2.4): the leaf table feeds BOTH the superblock
        # rollup and the level-0 union branch (and, through
        # merkle_diff_blocks' split(), each consumer re-derives it),
        # re-running the full-corpus md5 digest pass per consumer.
        # Settle the tiny (keyspace/block_size rows) leaf state once.
        .localCheckpoint(eager=False)
    )
    sup = (
        leaf.groupBy(F.expr(f"block div {fanout}").alias("block"))
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            (F.sum(F.col("h").cast("decimal(38,0)")) % mod)
            .cast("long")
            .alias("h"),
        )
        .select(F.lit(1).cast("long").alias("level"), "block", "n_rows", "h")
    )
    return leaf.select(
        F.lit(0).cast("long").alias("level"), "block", "n_rows", "h"
    ).unionByName(sup)


def merkle_diff_blocks(
    state_a: DataFrame, state_b: DataFrame, fanout: int = 64
) -> DataFrame:
    """Anti-entropy descent over two replicas' Merkle state: compare
    SUPERBLOCKS first, then look at leaf blocks only under differing
    superblocks — exactly the pruning that makes replica repair read
    a fraction of the keyspace. A full outer join at each level keeps
    blocks missing entirely from one side. Returns the differing leaf
    blocks (block, n_a, n_b, h_a, h_b) — the repair work list."""
    def split(st, suffix):
        return (
            st.filter(F.col("level") == 0).select(
                "block",
                F.col("n_rows").alias(f"n_{suffix}"),
                F.col("h").alias(f"h_{suffix}"),
            ),
            st.filter(F.col("level") == 1).select(
                "block",
                F.col("n_rows").alias(f"n_{suffix}"),
                F.col("h").alias(f"h_{suffix}"),
            ),
        )

    leaf_a, sup_a = split(state_a, "a")
    leaf_b, sup_b = split(state_b, "b")
    bad_sup = (
        sup_a.join(sup_b, "block", "full_outer")
        .filter(
            ~(
                F.col("h_a").eqNullSafe(F.col("h_b"))
                & F.col("n_a").eqNullSafe(F.col("n_b"))
            )
        )
        .select(F.col("block").alias("_sb"))
    )
    la = leaf_a.join(
        F.broadcast(bad_sup), F.expr(f"block div {fanout}") == F.col("_sb"), "left_semi"
    )
    lb = leaf_b.join(
        F.broadcast(bad_sup), F.expr(f"block div {fanout}") == F.col("_sb"), "left_semi"
    )
    return (
        la.join(lb, "block", "full_outer")
        .filter(
            ~(
                F.col("h_a").eqNullSafe(F.col("h_b"))
                & F.col("n_a").eqNullSafe(F.col("n_b"))
            )
        )
        .select(
            "block",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
            F.col("h_a").cast("long").alias("h_a"),
            F.col("h_b").cast("long").alias("h_b"),
        )
    )
