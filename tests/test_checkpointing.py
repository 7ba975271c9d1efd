"""Reliable-checkpoint knob for iterative operators.

localCheckpoint (the default) keeps truncated-lineage blocks on
executors — at cluster scale an executor loss mid-iteration has no
recompute path. The ``checkpoint_dir`` knob swaps every N-th round's
cut for a reliable DFS-backed checkpoint (operators/checkpointing.py).
These tests prove the knob changes durability, not results."""

from __future__ import annotations

import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_perceptron_learns_the_label_token(spark):
    """The contains-'spark' label is linearly separable on bucket
    features when 'spark' hashes alone: after 3 integer rounds the
    'spark' bucket's weight must be strictly positive and score
    separation must improve over the zero init (fewer misclassified
    than total)."""
    from datalake_etlscripts_spark.functions.scalar import md5_hash32
    from datalake_etlscripts_spark.operators.text import perceptron_train, tokens
    from pyspark.sql import functions as F

    rows = [(i, ("spark wins " if i % 3 == 0 else "flink rules ") + f"doc {i}")
            for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    label = F.when(
        F.array_contains(tokens(F.col("text")), "spark"), F.lit(1)
    ).otherwise(F.lit(-1))
    w = {r["bucket"]: r["weight"] for r in perceptron_train(d, label, rounds=3).collect()}
    spark_bucket = d.select(
        (md5_hash32(F.lit("spark")) % 64).alias("b")
    ).first()["b"]
    assert w[spark_bucket] > 0
    # the trained weights classify the training set well
    feats = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    scored = (
        feats.withColumn("b", md5_hash32(F.col("t")) % 64)
        .withColumn("w", F.lit(0) + sum(F.when(F.col("b") == b, wt).otherwise(0) for b, wt in w.items() if b >= 0))
        .groupBy("doc_id")
        .agg((F.sum("w") + w[-1]).alias("sc"))
        .join(d.select("doc_id", label.alias("y")), "doc_id")
    )
    n_bad = scored.filter(F.col("y") * F.col("sc") <= 0).count()
    assert n_bad <= 6  # >= 90% training accuracy


def test_dsir_prefers_target_like_docs(spark):
    """Docs whose tokens mirror the target slice must out-weigh docs
    drawn from a disjoint vocabulary."""
    from datalake_etlscripts_spark.operators.sampling import dsir_logweights

    target = spark.createDataFrame(
        [(1000 + i, "science physics theorem proof lemma") for i in range(10)],
        "doc_id bigint, text string",
    )
    raw = spark.createDataFrame(
        [(1, "physics theorem proof"), (2, "celebrity gossip fashion shoes")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in dsir_logweights(raw, target).collect()}
    assert got[1]["log_weight_micro"] > got[2]["log_weight_micro"]
    assert got[1]["keep"] and not got[2]["keep"]


def test_bitext_margin_suppresses_hubs(spark):
    """A hub vector close to EVERYTHING must lose to a vector with one
    distinctive match: raw cosine picks the hub, margin does not."""
    from datalake_etlscripts_spark.operators.similarity import bitext_margin_topk

    # side A: query 0 aligned with b=11; hub b=99 moderately close to all
    a_rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    hub = [0.5, 0.5, 0.5, 0.28]
    b_rows = [
        (11, [0.95, 0.05, 0.0, 0.0]),   # true match for 0
        (13, [0.1, 0.9, 0.1, 0.0]),     # true match for 2
        (15, [0.0, 0.1, 0.9, 0.1]),     # true match for 4
        (99, hub),
    ]
    a = spark.createDataFrame(a_rows, "vec_id bigint, embedding array<float>")
    b = spark.createDataFrame(b_rows, "vec_id bigint, embedding array<float>")
    got = {r["a_id"]: r["b_id"] for r in bitext_margin_topk(a, b, k=2, top=1).collect()}
    assert got == {0: 11, 2: 13, 4: 15}
