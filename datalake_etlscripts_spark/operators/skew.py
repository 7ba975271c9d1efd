"""Skew-mitigation utilities.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these utilities cover the two shapes AQE can't fix:

- ``salted_aggregate``: a groupBy where one key holds a large share of
  all rows. Two-phase: partial agg on (key, salt) — map-side combine
  already shrinks it — then final agg on key. Cost: one extra narrow
  aggregation; benefit: no single reducer owns the hot key.
- ``salted_join``: broadcast-infeasible join with a hot key on the big
  side: explode the small side per salt, salt the big side randomly —
  the hot key's rows spread across ``n_salts`` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: list[Column],
    n_salts: int = 16,
    merge_aggs: list[Column] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation. ``aggs`` run per (key, salt);
    ``merge_aggs`` combine the partials per key (defaults assume
    sum-like partials named identically)."""
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(*aggs)
    if merge_aggs is None:
        merge_aggs = [
            F.sum(c).alias(c) for c in partial.columns if c not in (key, "_salt")
        ]
    return partial.groupBy(key).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: replicate the small side across salts,
    randomly salt the big side. Equivalent rows, hot keys spread over
    ``n_salts`` tasks."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    return big_salted.join(small_rep, [key, "_salt"], how).drop("_salt")


def spread_small_input(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the plan has fewer input
    partitions than cores. The under-parallel-scan shape: a small
    single-row-group parquet file reads as ONE task, so heavy per-row
    expression work downstream (minhash signatures, md5 lanes) runs on
    one core regardless of cluster size. At real scale the scan yields
    many splits and this is a no-op — getNumPartitions inspects the
    plan without running a job, and the shuffle is only paid when it
    buys parallelism (A/B: ~2x on the md5-scheme minhash bench line)."""
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def rendezvous_assign(
    df: DataFrame, key_col: str, n_shards: int, out_col: str = "shard"
) -> DataFrame:
    """Rendezvous / highest-random-weight placement (Thaler &
    Ravishankar): each key goes to argmax_s md5(key ':' s) — the
    shard-assignment scheme whose resize property matters at lake
    scale: growing n→n+1 shards moves ONLY the keys that now win on
    the new shard (≈ 1/(n+1) of data), never a full rehash like
    key % n. Pure per-row expression — no shuffle, no state, any
    engine replays the md5 argmax bit-for-bit. Ties (h, s) break to
    the larger shard id on both engines (struct max ≡ ORDER BY h
    DESC, s DESC)."""
    from datalake_etlscripts_spark.functions.scalar import md5_hash32

    entries = [
        F.struct(
            md5_hash32(
                F.concat(F.col(key_col).cast("string"), F.lit(f":{s}"))
            ).alias("h"),
            F.lit(s).cast("long").alias("s"),
        )
        for s in range(n_shards)
    ]
    return df.withColumn(out_col, F.array_max(F.array(*entries))["s"])


def rendezvous_resize_audit(
    df: DataFrame, key_col: str, n_old: int, n_new: int
) -> DataFrame:
    """Shard-count resize plan: per shard, occupancy under ``n_old``
    and ``n_new`` shards plus how many keys ARRIVE in the resize. For
    HRW growth (n_new = n_old + 1) arrivals concentrate entirely on
    the new shards — the minimal-movement guarantee, visible as
    moved_in = 0 on every surviving shard. One scan, one tiny
    aggregate."""
    a = rendezvous_assign(
        rendezvous_assign(df, key_col, n_old, "_s_old"), key_col, n_new, "_s_new"
    )
    per_old = a.groupBy(F.col("_s_old").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_old_shards")
    )
    per_new = a.groupBy(F.col("_s_new").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_new_shards")
    )
    moved = (
        a.filter(F.col("_s_old") != F.col("_s_new"))
        .groupBy(F.col("_s_new").alias("shard"))
        .agg(F.count(F.lit(1)).alias("moved_in"))
    )
    return (
        per_new.join(per_old, "shard", "left")
        .join(moved, "shard", "left")
        .select(
            "shard",
            F.coalesce(F.col("n_old_shards"), F.lit(0)).cast("long").alias("n_with_old"),
            F.col("n_new_shards").cast("long").alias("n_with_new"),
            F.coalesce(F.col("moved_in"), F.lit(0)).cast("long").alias("moved_in"),
        )
    )
