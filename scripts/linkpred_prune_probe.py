"""Feasibility probe for VERDICT item 5 (top-k-aware pruning in
graph_link_prediction): a pair (a, b) can reach the top-k only if
min(deg_a, deg_b) >= tau, where tau is any LOWER bound on the true
kth-largest common-neighbor count. A valid tau comes from exact
UNDERCOUNTS: run the pair aggregate over wedges from a deterministic
1/16 sample of wedge centers and take the kth-largest sampled count
(every sampled count <= the true count, and the subset's kth-largest
<= the global kth-largest).

The probe reports tau and the fraction q of adjacency entries with
deg >= tau — the filter keeps q of the wedge-array elements, so the
pair aggregate shrinks to ~q^2. If q ≈ 1 the prune is vacuous on this
graph and the rewrite is a documented rejection, not a build.

Usage: SPARK_GRAFT_SF_DIR=<dir> python scripts/linkpred_prune_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.functions.scalar import ordered_pairs_packed
    from datalake_etlscripts_spark.plans.graphops import _co_order_edges
    from datalake_etlscripts_spark.session import get_spark

    spark = get_spark("linkpred-prune-probe")
    k = 50
    edges = _co_order_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = edges.select(F.col("u").alias("x"), F.col("v").alias("n")).unionAll(
        edges.select(F.col("v").alias("x"), F.col("u").alias("n"))
    )
    n_spread = spark.sparkContext.defaultParallelism * 2
    adjarr = (
        adj.repartition(n_spread, "x")
        .groupBy("x")
        .agg(F.array_sort(F.collect_list("n")).alias("_nbrs"))
        .localCheckpoint()
    )
    # deterministic 1/16 center sample -> exact undercounts -> tau
    sampled = adjarr.filter(F.pmod(F.xxhash64("x"), F.lit(16)) == 0)
    cnt = (
        sampled.select(F.explode(ordered_pairs_packed(F.col("_nbrs"))).alias("_pk"))
        .groupBy("_pk")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"))
        .limit(k)
        .collect()
    )
    tau = cnt[-1]["c"] if len(cnt) == k else 1
    deg = adjarr.select(F.size("_nbrs").alias("d"))
    row = deg.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.min("d").alias("dmin"),
        F.expr("percentile_approx(d, array(0.01, 0.5, 0.99))").alias("q"),
        F.max("d").alias("dmax"),
        F.sum(F.when(F.col("d") >= tau, F.col("d"))).alias("deg_kept"),
        F.sum("d").alias("deg_all"),
    ).collect()[0]
    q_keep = (row["deg_kept"] or 0) / row["deg_all"]
    print(
        f"sf_dir={sf_dir} k={k} tau={tau} nodes={row['nodes']} "
        f"deg(min/p1/p50/p99/max)={row['dmin']}/{row['q'][0]}/{row['q'][1]}/"
        f"{row['q'][2]}/{row['dmax']} keep_fraction_q={q_keep:.4f} "
        f"aggregate_shrink~q^2={q_keep * q_keep:.4f}"
    )


if __name__ == "__main__":
    main()
