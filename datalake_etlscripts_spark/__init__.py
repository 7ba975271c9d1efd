"""datalake_etlscripts_spark — a PySpark-native analytics/ETL engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities of the reference repo
``nextprocurement/datalake_etlscripts`` (see SURVEY.md), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, set-oriented
merges instead of row-at-a-time loops, Pandas UDFs only where external
I/O or genuinely procedural logic demands it.

Layout:
    session       SparkSession factory tuned for local[N] and cluster scale
    io            sources/sinks: parquet, TSV/CSV, JSONL, text, file listings
    normalize     column-mapping rename, null policy, stringified-list parse
    functions     scalar function library (ntp ids, timestamps, URLs, diffs)
    versioning    the flagship versioned-ingest merge (SCD2-style)
    summary       group-by count summaries (calc_summary semantics)
    operators     joins, aggregates, windows, dedup, similarity, text stats
    crawl         document-crawl plumbing (mapInPandas, host-partitioned)
    storesync     storage reconciliation via anti/semi joins
    streaming     Structured Streaming entry points (foreachBatch ingest)
"""

__version__ = "0.1.0"
