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
