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


@dataclass(frozen=True)
class UriStorage:
    """URI-addressed file store over ``pyarrow.fs`` — the lake-scale
    K3/K4 backend beside DiskStorage: the same interface against any
    FileSystem URI (``file://`` here; ``s3://``, ``gs://``,
    ``hdfs://`` with the matching arrow filesystem on a cluster
    image). Completes the reference's object-store backends
    (ntp_storage.py:140-247, the Swift analogue) for a real lake.

    Why pyarrow.fs and not the JVM Hadoop FileSystem: per-file
    store/read/delete callbacks run INSIDE ``foreachPartition`` on
    Python workers, which have no py4j gateway — a spark._jvm-backed
    client would only ever work on the driver (the streaming state
    checks, which are driver-side, do use the Hadoop API:
    streaming/ingest.py:_fs_path_exists). The frozen dataclass holds
    only the URI; the filesystem client is constructed lazily and
    cached PER PROCESS, exactly how an object-store SDK client is
    handled on executors."""

    base_uri: str

    def _fs(self):
        import pyarrow.fs as pafs

        key = self.base_uri
        cached = _FS_CACHE.get(key)
        if cached is None:
            cached = pafs.FileSystem.from_uri(key)
            _FS_CACHE[key] = cached
        return cached  # (FileSystem, base_path)

    def _path(self, file_name: str) -> str:
        _, base = self._fs()
        return f"{base.rstrip('/')}/{file_name}"

    def file_store(self, file_name: str, contents: bytes) -> None:
        fs, base = self._fs()
        fs.create_dir(base, recursive=True)
        with fs.open_output_stream(self._path(file_name)) as out:
            out.write(contents)

    def file_read(self, file_name: str) -> bytes | None:
        fs, _ = self._fs()
        try:
            with fs.open_input_stream(self._path(file_name)) as inp:
                return inp.read()
        except (OSError, FileNotFoundError):
            return None

    def file_delete(self, file_name: str) -> None:
        fs, _ = self._fs()
        try:
            fs.delete_file(self._path(file_name))
        except (OSError, FileNotFoundError):
            pass

    def file_exists(self, file_name: str) -> bool:
        import pyarrow.fs as pafs

        fs, _ = self._fs()
        return fs.get_file_info(self._path(file_name)).type != pafs.FileType.NotFound

    def file_list(self, id_range: tuple[str, str] | None = None) -> list[str]:
        import pyarrow.fs as pafs

        fs, base = self._fs()
        if fs.get_file_info(base).type != pafs.FileType.Directory:
            return []
        infos = fs.get_file_info(pafs.FileSelector(base, recursive=False))
        names = sorted(
            i.base_name for i in infos if i.type == pafs.FileType.File
        )
        if id_range is None:
            return names
        lo, hi = id_range
        return [n for n in names if lo <= n.split("_", 1)[0] <= hi]

    def listing_df(self, spark: SparkSession) -> DataFrame:
        """(file_name, n_bytes) metadata table for plan_sync. At
        100 TB the same table comes from an object-store inventory
        export; this lists the prefix once, driver-side."""
        import pyarrow.fs as pafs

        fs, base = self._fs()
        if fs.get_file_info(base).type != pafs.FileType.Directory:
            rows = []
        else:
            rows = [
                (i.base_name, i.size)
                for i in fs.get_file_info(pafs.FileSelector(base, recursive=False))
                if i.type == pafs.FileType.File
            ]
        return spark.createDataFrame(rows, "file_name string, n_bytes bigint")


# per-process client cache (executors construct their own on first use)
_FS_CACHE: dict = {}


Storage = DiskStorage | UriStorage


def make_store(spec: str) -> Storage:
    """Storage factory for CLI/user-facing specs: a URI
    (``file:///path``, ``s3://bucket/prefix``, ...) selects the
    pyarrow.fs-backed UriStorage, a bare path the local DiskStorage —
    one flag serves both the laptop and the lake."""
    return UriStorage(spec) if "://" in spec else DiskStorage(spec)


def copy_callbacks(src: Storage, dst: Storage):
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
    store: Storage,
    backup: Storage,
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
