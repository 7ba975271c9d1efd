"""Tests: partitioned/bucketed store writes, skew utilities, and
plan-shape guards (pushdown + broadcast must not regress)."""

from __future__ import annotations

import io
import contextlib
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.writers import (
    read_store,
    with_partition_cols,
    write_store,
)
from datalake_etlscripts_spark.operators.skew import salted_aggregate, salted_join


def _mini_state(spark):
    return spark.createDataFrame(
        [
            ("ntp00000001", "u/a", ["2023-05-01 00:00:00"], False, None, None, "A"),
            ("ntp00000002", "u/b", ["2024-01-01 00:00:00"], False, None, None, "B"),
            ("ntp10000001", "u/m", ["2024-02-01 00:00:00"], False, None, None, "M"),
        ],
        "_id string, id string, updated array<string>, obsolete_version boolean, "
        "updated_to string, patch_data string, title string",
    )


def test_write_store_partitions_and_prunes(spark):
    tmp = tempfile.mkdtemp(prefix="store_")
    try:
        write_store(_mini_state(spark), tmp)
        # physical layout: group=... / upd_year=... directories
        assert any(d.startswith("group=") for d in os.listdir(tmp))
        got = read_store(spark, tmp)
        assert got.count() == 3
        minors = got.filter(F.col("group") == "minors")
        assert minors.count() == 1 and minors.first()["_id"] == "ntp10000001"
        # partition filter must prune (plan shows partition count 1)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            got.filter(F.col("group") == "minors").explain(True)
        assert "PartitionFilters" in buf.getvalue()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_partition_cols_derivation(spark):
    out = {r["_id"]: r for r in with_partition_cols(_mini_state(spark)).collect()}
    assert out["ntp00000001"]["group"] == "contracts"
    assert out["ntp00000001"]["upd_year"] == "2023"
    assert out["ntp10000001"]["group"] == "minors"


def test_salted_aggregate_matches_plain(spark, sf_dir):
    from datalake_etlscripts_spark.io.readers import read_table

    o = read_table(spark, sf_dir, "orders")
    plain = {
        r["o_custkey"]: r["n"]
        for r in o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r["o_custkey"]: r["n"]
        for r in salted_aggregate(
            o, "o_custkey", [F.count(F.lit(1)).alias("n")]
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_dir):
    from datalake_etlscripts_spark.io.readers import read_table

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(c, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(o, c, "o_custkey").groupBy("c_mktsegment").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


# ------------------------------------------------------ plan-shape guards
def _plan_of(q_name, spark):
    import __spark_entry__ as e

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        e.queries()[q_name](spark, "/root/testdata/sf0.001").explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan_of("project_filter_range", spark)
    assert "PushedFilters: [IsNotNull(l_quantity)" in plan
    # projection pruned to exactly the referenced columns
    assert "l_tax" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_dim_join_stays_broadcast(spark):
    plan = _plan_of("dim_join_broadcast", spark)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_pricing_summary_partial_aggregation(spark):
    plan = _plan_of("pricing_summary", spark)
    # two HashAggregates (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2


def test_compact_files_reduces_file_count(spark, tmp_path):
    from datalake_etlscripts_spark.io.writers import compact_files

    path = str(tmp_path / "frag")
    # fragment: 64 tiny files from 64 partitions
    spark.range(0, 10000).repartition(64).write.parquet(path)
    import glob

    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 32
    n = compact_files(spark, path, target_file_bytes=64 * 1024 * 1024, order_cols=("id",))
    after = len(glob.glob(path + "/*.parquet"))
    assert after < before and after <= max(n, 1) + 1
    # data intact and range-ordered files carry tight min/max
    assert spark.read.parquet(path).count() == 10000


def test_zorder_layout_prunes_box_queries(spark, sf_dir):
    """Data skipping: for a predicate narrow in the SECOND dimension, a
    layout sorted only by the first keeps every file a candidate, while
    the Z-ordered layout confines each file to a compact 2-D region so
    most files' min/max stats exclude the box."""
    from datalake_etlscripts_spark.io.layout import candidate_files, cluster_write
    from datalake_etlscripts_spark.io.readers import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    lo, hi = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).first()
    box = {
        "l_partkey": (-(1 << 40), 1 << 40),  # full range
        "l_suppkey": (lo, lo),  # one supplier
    }

    z_dir = tempfile.mkdtemp(prefix="zorder_")
    lin_dir = tempfile.mkdtemp(prefix="linear_")
    try:
        cluster_write(li, z_dir, ["l_partkey", "l_suppkey"], n_files=16)
        (
            li.repartitionByRange(16, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.mode("overwrite")
            .parquet(lin_dir)
        )
        z_hit, z_total = candidate_files(spark, z_dir, box)
        l_hit, l_total = candidate_files(spark, lin_dir, box)
        assert z_total >= 8 and l_total >= 8
        # linear-by-partkey spreads every supplier across all files
        assert l_hit == l_total
        # z-order: most files excluded by stats
        assert z_hit < l_hit and z_hit <= z_total // 2, (z_hit, z_total, l_hit)
        # correctness: skipping is advisory — both layouts hold the same rows
        assert (
            spark.read.parquet(z_dir).filter(F.col("l_suppkey") == lo).count()
            == li.filter(F.col("l_suppkey") == lo).count()
        )
    finally:
        shutil.rmtree(z_dir, ignore_errors=True)
        shutil.rmtree(lin_dir, ignore_errors=True)


def test_bucketed_store_join_avoids_shuffle(spark, sf_dir):
    """write_bucketed_store's contract, plan-proven: two tables
    bucketed on the same key with the same bucket count join with NO
    Exchange on either side — the 100 TB merge join reads both sides
    in place instead of shuffling the store every ingest."""
    from datalake_etlscripts_spark.io.readers import read_table
    from datalake_etlscripts_spark.io.writers import write_bucketed_store

    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"), "o_totalprice"
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("id"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed_store(o, "bkt_orders_t", buckets=8)
        write_bucketed_store(li, "bkt_items_t", buckets=8)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_orders_t").join(spark.table("bkt_items_t"), "id")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # bucketed-store join returns exactly the plain shuffle join
        assert joined.count() == o.join(li, "id").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_orders_t")
        spark.sql("DROP TABLE IF EXISTS bkt_items_t")


def test_bucketed_store_point_lookup_prunes_buckets(spark, sf_dir):
    """Bucket pruning: an equality predicate on the bucket key scans 1
    of N buckets (the K1 point-lookup path on the bucketed store)."""
    from datalake_etlscripts_spark.io.readers import read_table
    from datalake_etlscripts_spark.io.writers import write_bucketed_store

    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"), "o_totalprice"
    )
    auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        write_bucketed_store(o, "bkt_point_t", buckets=8)
        # a bare filter has no shuffle to elide, so the planner falls
        # back to a plain scan unless bucketed scans are kept on
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        some_id = o.agg(F.min("id")).first()[0]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            spark.table("bkt_point_t").filter(F.col("id") == some_id).explain(
                "formatted"
            )
        plan = buf.getvalue()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", auto)
        spark.sql("DROP TABLE IF EXISTS bkt_point_t")


def test_write_training_shards_deterministic_membership(spark, tmp_path):
    """Shard membership must be identical regardless of input
    partitioning, and the shards must round-trip the full corpus."""
    from datalake_etlscripts_spark.io.writers import write_training_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    n_a = write_training_shards(docs.repartition(3), out_a, rows_per_shard=100)
    n_b = write_training_shards(docs.repartition(17), out_b, rows_per_shard=100)
    assert n_a == n_b >= 2

    a = spark.read.json(out_a).select("doc_id", "shard")
    b = spark.read.json(out_b).select("doc_id", "shard")
    assert a.count() == docs.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_write_training_shards_null_keys_stay_in_layout(spark, tmp_path):
    """NULL shard keys must land in a numbered shard, never in
    __HIVE_DEFAULT_PARTITION__ (invisible to shard=0..N-1 loaders)."""
    import os

    from datalake_etlscripts_spark.io.writers import write_training_shards

    df = spark.createDataFrame(
        [(None, "a"), ("u1", "b"), (None, "c"), ("u2", "d")],
        "url string, text string",
    )
    out = str(tmp_path / "s")
    write_training_shards(df, out, rows_per_shard=2, shard_key="url")
    dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert all(d.split("=")[1].isdigit() for d in dirs), dirs
    assert spark.read.json(out).count() == 4
