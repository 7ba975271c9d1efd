"""Reliable-checkpoint knob for iterative operators.

localCheckpoint (the default) keeps truncated-lineage blocks on
executors — at cluster scale an executor loss mid-iteration has no
recompute path. The ``checkpoint_dir`` knob swaps every N-th round's
cut for a reliable DFS-backed checkpoint (operators/checkpointing.py).
These tests prove the knob changes durability, not results."""

from __future__ import annotations

import os

from datalake_etlscripts_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)
from datalake_etlscripts_spark.operators.graph import kcore, pagerank
from datalake_etlscripts_spark.versioning import follow_version


def _edges(spark):
    # two triangles bridged by one edge + a dangling chain
    pairs = [
        (1, 2), (2, 3), (3, 1),
        (4, 5), (5, 6), (6, 4),
        (3, 4),
        (7, 8),
    ]
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src bigint, dst bigint")


def test_pagerank_reliable_checkpoint_same_ranks(spark, tmp_path):
    e = _edges(spark)
    base = {
        (r["node"], r["rank"])
        for r in pagerank(e, iterations=4).collect()
    }
    ckdir = str(tmp_path / "ck_pagerank")
    durable = {
        (r["node"], r["rank"])
        for r in pagerank(
            e, iterations=4, checkpoint_dir=ckdir, checkpoint_every=2
        ).collect()
    }
    assert durable == base
    # rounds 1 and 3 wrote durable snapshots under the dir
    found = [
        os.path.join(root, f)
        for root, _, files in os.walk(ckdir)
        for f in files
    ]
    assert found, "reliable checkpoint wrote nothing to checkpoint_dir"


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13)],
        "id_a bigint, id_b bigint",
    )
    base = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    ckdir = str(tmp_path / "ck_cc")
    durable = {
        (r["node"], r["component"])
        for r in connected_components(
            pairs, checkpoint_dir=ckdir, checkpoint_every=1
        ).collect()
    }
    assert durable == base
    star = {
        (r["node"], r["component"])
        for r in connected_components_star(
            pairs, checkpoint_dir=str(tmp_path / "ck_star"), checkpoint_every=1
        ).collect()
    }
    assert star == base


def test_kcore_and_follow_version_knob(spark, tmp_path):
    e = _edges(spark)
    base = {(r["node"], r["degree"]) for r in kcore(e, k=2).collect()}
    durable = {
        (r["node"], r["degree"])
        for r in kcore(
            e, k=2, checkpoint_dir=str(tmp_path / "ck_kcore"), checkpoint_every=1
        ).collect()
    }
    assert durable == base

    state = spark.createDataFrame(
        [
            ("a", "x", True, "b"),
            ("b", "x", True, "c"),
            ("c", "x", False, None),
        ],
        "_id string, id string, obsolete_version boolean, updated_to string",
    )
    base_v = {
        (r["_id"], r["resolved_id"]) for r in follow_version(state).collect()
    }
    durable_v = {
        (r["_id"], r["resolved_id"])
        for r in follow_version(
            state, checkpoint_dir=str(tmp_path / "ck_fv"), checkpoint_every=1
        ).collect()
    }
    assert durable_v == base_v
    assert base_v == {("a", "c"), ("b", "c"), ("c", "c")}


def test_uri_storage_sync_e2e_over_file_uris(spark, tmp_path):
    """K3/K4 over URI-addressed storage (r4 verdict task #8): the same
    plan_sync → apply_sync → empty-replan loop as the disk backend,
    but src/dst are UriStorage('file://...') — the pyarrow.fs client
    the executors rebuild per process, the s3://-ready seam."""
    from datalake_etlscripts_spark.storage import (
        DiskStorage,
        UriStorage,
        apply_purge,
        copy_callbacks,
    )
    from datalake_etlscripts_spark.storesync import apply_sync, plan_purge, plan_sync

    src = UriStorage(f"file://{tmp_path}/src")
    dst = UriStorage(f"file://{tmp_path}/dst")
    src.file_store("ntp00000001_doc.pdf", b"one")
    src.file_store("ntp00000002_doc.pdf", b"two")
    src.file_store("ntp00000003_doc.pdf", b"three")
    dst.file_store("ntp00000002_doc.pdf", b"STALE!")
    dst.file_store("ntp00000009_doc.pdf", b"orphan")

    plan = plan_sync(
        src.listing_df(spark), dst.listing_df(spark), content_cols=("n_bytes",)
    )
    transfer, delete = copy_callbacks(src, dst)
    counts = apply_sync(plan, transfer, delete)
    assert counts == {"ADD": 2, "UPD": 1, "DEL": 1}
    assert dst.file_read("ntp00000002_doc.pdf") == b"two"
    assert not dst.file_exists("ntp00000009_doc.pdf")
    assert (
        plan_sync(
            src.listing_df(spark), dst.listing_df(spark), content_cols=("n_bytes",)
        ).count()
        == 0
    )
    # S9 id-range listing via the URI backend
    assert src.file_list(("ntp00000002", "ntp00000003")) == [
        "ntp00000002_doc.pdf",
        "ntp00000003_doc.pdf",
    ]
    # cross-backend: URI source → disk destination through one seam
    disk_dst = DiskStorage(str(tmp_path / "disk_dst"))
    plan2 = plan_sync(src.listing_df(spark), disk_dst.listing_df(spark))
    t2, d2 = copy_callbacks(src, disk_dst)
    apply_sync(plan2, t2, d2)
    assert disk_dst.file_read("ntp00000003_doc.pdf") == b"three"
    # purge through the URI backend: backup strictly before delete
    store_df = spark.createDataFrame(
        [("ntp00000001", True), ("ntp00000002", False), ("ntp00000003", None)],
        "_id string, obsolete_version boolean",
    )
    backup = UriStorage(f"file://{tmp_path}/backup")
    counts = apply_purge(plan_purge(src.listing_df(spark), store_df), src, backup)
    assert counts == {"BACKUP": 1, "DEL": 1}
    assert backup.file_read("ntp00000001_doc.pdf") == b"one"
    assert not src.file_exists("ntp00000001_doc.pdf")
