"""Sinks (SURVEY.md §2.1 K1–K7), lake-native.

The reference's sinks are MongoDB upserts (single + bulk-buffered),
targeted field updates, and collection drops. On a data lake these
become set-oriented writes:

  K1/K2  versioned upsert       → versioning.merge_batch + write_store
                                  (one MERGE on Delta; write-and-swap
                                  on plain parquet)
  K5     field update           → full-column rewrite (normalize.
                                  rename_fields / normalize_to_list)
  K6     array-append           → array_union inside the merge
  K7     drop/truncate          → overwrite-mode write

Partitioning policy for the 100 TB store: ``group`` (contracts/minors
— the reference's id-prefix split, ntp_constants.py:23-27) × year of
first update. Both are low-cardinality, stable, and line up with the
dominant predicates (group filters, date ranges), so partition pruning
does the reference's `$regex`-prefix and range scans for free.
Bucketing by natural key co-locates the merge join without a shuffle
when the store is re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_etlscripts_spark.functions.scalar import ntp_group


def with_partition_cols(state: DataFrame) -> DataFrame:
    """Derive the physical partition columns (group, first-update year)."""
    return state.withColumn("group", ntp_group(F.col("_id"))).withColumn(
        "upd_year",
        F.coalesce(F.substring(F.element_at("updated", 1), 1, 4), F.lit("unknown")),
    )


def write_store(state: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist the versioned store partitioned by (group, upd_year).
    Readers filtering either column get partition pruning."""
    with_partition_cols(state).write.mode(mode).partitionBy(
        "group", "upd_year"
    ).parquet(path)


def read_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed_store(
    state: DataFrame, table: str, buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Bucketed variant (saveAsTable): co-locates future merge joins on
    the natural key — the store side of the ingest join then needs no
    shuffle. Requires a metastore-backed table (works in local warehouse
    too)."""
    state.write.mode(mode).bucketBy(buckets, "id").sortBy("id").saveAsTable(table)


def overwrite_table(df: DataFrame, path: str) -> None:
    """K7: drop/recreate semantics (read_parquet.py:75-78 --drop)."""
    df.write.mode("overwrite").parquet(path)
