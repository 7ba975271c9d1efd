"""Stage-level timing of the refinedweb_pipeline funnel (guide §1):
times each stage's subtree in isolation with the same xxhash64 forcing
bench.py uses, so the 7s headline can be attributed to a stage before
any restructuring. Run AFTER any sweep finishes (needs the machine).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_refinedweb.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(df) -> int:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.try_sum(F.xxhash64(*df.columns)).alias("h"),
    ).collect()[0]
    return row["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.session import get_spark
    from datalake_etlscripts_spark.crawl import url_quality_filter
    from datalake_etlscripts_spark.io.readers import read_table
    from datalake_etlscripts_spark.operators import dedup, text

    spark = get_spark("profile-refinedweb")

    def stage(name, fn):
        spark.sparkContext.setJobDescription(f"rw: {name}")
        t0 = time.perf_counter()
        n = fn()
        print(f"{name}: {time.perf_counter() - t0:.3f}s rows={n}", flush=True)

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    first_tok = F.element_at(text.tokens(F.col("text")), 1)
    urls = d.withColumn(
        "url",
        F.concat(
            F.when(F.col("doc_id") % 17 == 0, F.lit("ftp://")).otherwise(
                F.lit("http://")
            ),
            F.lit("src"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".example/"),
            F.coalesce(first_tok, F.lit("x")),
            F.lit("/p"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 13 == 0, F.lit(".js")).otherwise(
                F.lit(".html")
            ),
        ),
    )
    s1 = (
        url_quality_filter(urls, strict_words=("dup",))
        .filter(F.col("keep"))
        .select(d.columns)
    )
    stage("s1 url_filter", lambda: _force(s1))
    gq = text.gopher_quality_filter(s1).filter(F.col("keep")).select("doc_id")
    s2 = s1.join(gq, "doc_id", "left_semi").localCheckpoint(eager=False)
    stage("s2 gopher (cum)", lambda: _force(s2))
    s3 = dedup.dedup_keep_first(s2).localCheckpoint(eager=False)
    stage("s3 exact_dedup (incr)", lambda: _force(s3))
    pairs = dedup.minhash_lsh_pairs(s3, threshold=0.04, scheme="md5")
    stage("s4a minhash_pairs (incr)", lambda: _force(pairs))
    comp = dedup.connected_components_star(pairs)
    scored = comp.join(
        s3.select(F.col("doc_id").alias("node"), F.length("text").alias("_len")),
        "node",
    )
    w = W.partitionBy("component").orderBy(F.desc("_len"), F.asc("node"))
    drop = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select(F.col("node").alias("doc_id"))
    )
    s4 = s3.join(drop, "doc_id", "left_anti").localCheckpoint(eager=False)
    stage("s4b components+drop (incr)", lambda: _force(s4))
    bench = d.filter(F.col("doc_id") % 97 == 0)
    s5 = dedup.decontaminate_corpus(s4, bench, k=5)
    stage("s5 decontaminate (incr)", lambda: _force(s5))


if __name__ == "__main__":
    main()
