"""Synthesize a LARGER deterministic dataset from sf0.1 for the
higher-SF scaling spot-check (r08 VERDICT item 4) — /root/testdata is
driver-generated and read-only, and no generator ships with it, so
the builder-side scale-up replicates sf0.1 K times with DISJOINT key
spaces per replica:

- lineitem/orders: orderkey/partkey/suppkey shifted by replica·stride,
  so the co-order and supplier-part graphs become K disjoint copies of
  the sf0.1 graph (nodes ×K, edges ×K, degree distribution unchanged).
- documents: doc_id shifted; the block key (lang) gets a per-replica
  suffix so shingle-postings blocks stay disjoint (df per shingle
  unchanged — pair volume scales ×K, not ×K²).
- embeddings: id shifted; one coordinate offset per replica keeps
  cross-replica cosine pairs out of near-dup thresholds.
- customer/supplier/part/nation/region/events: copied as-is (the
  scaling targets don't key on them beyond joins that stay valid).

This is MEASUREMENT INFRASTRUCTURE ONLY: nothing here feeds the
oracle or the default bench; the output lives under /tmp.

Usage: python scripts/gen_scale_data.py <K> <out_dir> [<src_sf_dir>]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 10_000_000  # far above any sf0.1 key


def main() -> None:
    k = int(sys.argv[1])
    out_dir = sys.argv[2]
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.session import get_spark

    spark = get_spark("gen-scale-data")
    os.makedirs(out_dir, exist_ok=True)

    def replicate(name: str, shift_cols: list[str], extra=None):
        df = spark.read.parquet(f"{src}/{name}.parquet")
        parts = []
        for i in range(k):
            d = df
            for c in shift_cols:
                d = d.withColumn(c, F.col(c) + F.lit(i * STRIDE))
            if extra is not None:
                d = extra(d, i)
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: {df.count()} -> {out.count()} rows")

    replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate(
        "documents",
        ["doc_id"],
        extra=lambda d, i: d.withColumn(
            "lang", F.concat(F.col("lang"), F.lit(f"_{i}"))
        ),
    )
    # embeddings: (vec_id, embedding ARRAY<double>, label). Shift the
    # id; rotate the vector's first coordinate sign per odd replica so
    # cross-replica cosine stays far from near-dup thresholds.
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    parts = []
    for i in range(k):
        d = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * STRIDE))
        if i % 2 == 1:
            d = d.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda v, j: F.when(j == 0, -v).otherwise(v),
                ),
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    print(f"embeddings: {emb.count()} -> {out.count()} rows")

    for name in ["customer", "supplier", "part", "nation", "region", "events"]:
        spark.read.parquet(f"{src}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"{name}: copied")


if __name__ == "__main__":
    main()
