"""Concrete storage backend (K3/K4 depth): local-disk file store.

The reference ships three backends (disk ntp_storage.py:41-80, GridFS
:82-138, Swift :140-247) behind one store/read/delete/exists/list
interface. This module provides the DISK one — the only backend this
container can actually exercise — and the executor-side callbacks that
wire it into the reconciliation plans (storesync.plan_sync/plan_purge),
so the sync and purge CLIs move real bytes instead of printing plans.

Spark-shape notes:
- ``DiskStorage`` is a frozen dataclass holding only the root path, so
  it pickles into ``foreachPartition`` callbacks cheaply (the same
  seam a cluster deployment would fill with an object-store client).
- Listing a local directory is driver-side by nature; ``listing_df``
  returns the small (file_name, n_bytes) metadata table that feeds
  plan_sync — at 100 TB the equivalent is an object-store inventory
  table read as a DataFrame, same schema, same plan.
- GridFS/Swift remain out of scope (no servers in the environment);
  their interface shape is identical, which is the point of the seam.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DiskStorage:
    """Flat-directory file store mirroring reference
    ntp_storage.py:41-80 semantics: names are '{ntp_id}_{field}.{ext}',
    reads of missing files are soft (None), deletes are idempotent."""

    data_dir: str

    def _path(self, file_name: str) -> str:
        return os.path.join(self.data_dir, file_name)

    def file_store(self, file_name: str, contents: bytes) -> None:
        os.makedirs(self.data_dir, exist_ok=True)
        with open(self._path(file_name), "bw") as fh:
            fh.write(contents)

    def file_read(self, file_name: str) -> bytes | None:
        try:
            with open(self._path(file_name), "br") as fh:
                return fh.read()
        except OSError:
            return None

    def file_delete(self, file_name: str) -> None:
        try:
            os.remove(self._path(file_name))
        except OSError:
            pass

    def file_exists(self, file_name: str) -> bool:
        return os.path.exists(self._path(file_name))

    def file_list(self, id_range: tuple[str, str] | None = None) -> list[str]:
        """Names in the store, optionally limited to an ntp-id range
        (S9). Fixed-width 'ntpNNNNNNNN' ids make lexicographic compare
        equal numeric compare."""
        if not os.path.isdir(self.data_dir):
            return []
        names = sorted(os.listdir(self.data_dir))
        if id_range is None:
            return names
        lo, hi = id_range
        return [n for n in names if lo <= n.split("_", 1)[0] <= hi]

    def listing_df(self, spark: SparkSession) -> DataFrame:
        """(file_name, n_bytes) metadata table for plan_sync — the
        content column catches same-name-different-bytes drift."""
        rows = [
            (n, os.path.getsize(self._path(n))) for n in self.file_list()
        ]
        return spark.createDataFrame(rows, "file_name string, n_bytes bigint")


def copy_callbacks(src: DiskStorage, dst: DiskStorage):
    """(transfer, delete) pair for storesync.apply_sync: ADD/UPD reads
    from src and writes dst; DEL removes from dst. Idempotent — a
    retried partition re-copies byte-identically."""

    def transfer(file_name: str) -> None:
        data = src.file_read(file_name)
        if data is not None:
            dst.file_store(file_name, data)

    def delete(file_name: str) -> None:
        dst.file_delete(file_name)

    return transfer, delete


def apply_purge(
    plan: DataFrame,
    store: DiskStorage,
    backup: DiskStorage,
    name_col: str = "file_name",
) -> dict[str, int]:
    """Execute a plan_purge plan: per doomed file, BACKUP strictly
    before DEL (reference purge_documents.py's store-to-backup-then-
    delete loop). The plan's BACKUP/DEL rows for one file may land in
    different partitions, so ordering is enforced per FILE here — one
    distinct-name pass, both steps inside the same task. Idempotent:
    re-running a partition re-backs-up from a file that still exists,
    or skips one already gone (its backup was taken before the
    delete)."""
    counts = {
        r["op"]: r["n"]
        for r in plan.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    def run(rows):
        for row in rows:
            name = row[name_col]
            data = store.file_read(name)
            if data is not None:
                backup.file_store(name, data)
                store.file_delete(name)

    plan.select(name_col).distinct().foreachPartition(run)
    return counts
