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
