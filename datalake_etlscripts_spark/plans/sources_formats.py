"""Extra source/sink formats beyond parquet/CSV/TSV/JSONL (SURVEY.md
§2.1): ORC, JDBC (embedded Derby — the only JDBC driver baked into the
Spark distribution), and XML (native datasource in Spark 4).

Each query WRITES deterministic content derived from the test tables
into the format under test, reads it back, and aggregates — so the
DuckDB oracle (which cannot read ORC/Derby/XML) replays the same
aggregate over the parquet views. A hash match proves the round-trip
was lossless.

Avro is intentionally absent: the `spark-avro` external module is not
in this distribution (`Failed to find data source: avro`), and the
engine does not paper over a missing connector. `io.readers.read_avro`
raises with the exact message a user needs.

Scale notes:
- ORC: same columnar pushdown/pruning story as parquet; the scan shows
  PushedFilters the same way.
- JDBC at 100 TB is for DIMENSION tables, not facts. The read below
  still demonstrates the parallel pattern (partitionColumn/lowerBound/
  upperBound/numPartitions → one query per partition) that a real
  warehouse-backed dim load would use; the result is then broadcast.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_jdbc, read_orc, read_table, read_xml
from datalake_etlscripts_spark.plans.registry import query

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


# S1-variant: ORC round-trip. Write lineitem's shipping columns as ORC
# (partitioned by return flag — partition pruning works for ORC too),
# read back, aggregate.
@query(
    "orc_source",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip source: written then read back with schema intact (format breadth)."""
    out = os.path.join(tempfile.mkdtemp(prefix="orc_src_"), "lineitem_orc")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
        F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
    )
    li.write.partitionBy("l_returnflag").orc(out)
    back = read_orc(spark, out)
    return (
        back.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qty").cast("double").alias("sum_qty"),
        )
    )


# S-variant JDBC: dims written to and read back from an embedded Derby
# database; the nation read is PARTITIONED (4 concurrent range queries
# on n_nationkey) to demonstrate the parallel-JDBC pattern, then joined
# broadcast onto region.
@query(
    "jdbc_dim_join",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_nations,
           array_to_string(list_sort(list(n.n_name)), '|') AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_jdbc_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory dimension registered as a table and joined - the JDBC-dim join shape without a database dependency."""
    db = os.path.join(tempfile.mkdtemp(prefix="jdbc_dim_"), "dims")
    url = f"jdbc:derby:{db};create=true"

    def jdbc_write(df: DataFrame, table: str) -> None:
        (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("driver", DERBY_DRIVER)
            .save()
        )

    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    jdbc_write(nation, "NATION")
    jdbc_write(region, "REGION")

    nation_jdbc = read_jdbc(
        spark, url, "NATION", driver=DERBY_DRIVER,
        partition_column="n_nationkey", lower_bound=0, upper_bound=25, num_partitions=4,
    )
    region_jdbc = read_jdbc(spark, url, "REGION", driver=DERBY_DRIVER)
    return (
        nation_jdbc.join(F.broadcast(region_jdbc), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
        )
    )


# S-variant XML: supplier snapshot → XML files → read back with an
# explicit schema (inference would widen types) → aggregate.
@query(
    "xml_source",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n_suppliers,
           CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_acctbal
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def q_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML-ish source parsed via expressions into relational rows (ATOM feed shape)."""
    out = os.path.join(tempfile.mkdtemp(prefix="xml_src_"), "supplier_xml")
    sup = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.col("s_acctbal").cast("decimal(12,2)").alias("bal"),
    )
    sup.write.format("xml").option("rootTag", "suppliers").option("rowTag", "supplier").save(out)
    back = read_xml(
        spark, out, "supplier", schema="s_suppkey long, s_nationkey int, bal decimal(12,2)"
    )
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("bal").cast("double").alias("sum_acctbal"),
    )


# S-variant fixed width (r6): COBOL-copybook shaped text — write
# padded supplier rows, read back via the substring-spec scan,
# aggregate; the oracle replays the aggregate over parquet (lossless
# round-trip proof, same contract as the ORC/XML twins).
@query(
    "fixed_width_scan",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS bal_cents
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def q_fixed_width_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width text source: padded supplier records round-trip through the substring-spec scan (pure codegen expressions, splittable) - aggregate hash proves losslessness."""
    from datalake_etlscripts_spark.io.readers import read_fixed_width

    out = os.path.join(tempfile.mkdtemp(prefix="fw_src_"), "supplier_fw")
    sup = read_table(spark, sf_dir, "supplier").select(
        F.concat(
            F.lpad(F.col("s_suppkey").cast("string"), 10, " "),
            F.lpad(F.col("s_nationkey").cast("string"), 5, " "),
            F.lpad(
                F.floor(F.col("s_acctbal") * 100 + F.lit(0.5))
                .cast("long")
                .cast("string"),
                12,
                " ",
            ),
        ).alias("value")
    )
    sup.write.mode("overwrite").text(out)
    back = read_fixed_width(
        spark,
        out,
        [
            ("s_suppkey", 1, 10, "long"),
            ("s_nationkey", 11, 5, "int"),
            ("bal_cents", 16, 12, "long"),
        ],
    )
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bal_cents").cast("long").alias("bal_cents"),
    )


# ---------------------------------------------------------------------------
# VARIANT ingestion (r9): the Spark 4 open-variant lane for
# semi-structured columns — props parses ONCE to VARIANT
# (parse_json), fields extract with variant_get path expressions and
# SCHEMA-LESS storage semantics (the shredded-JSON answer to "don't
# re-parse strings per extraction, don't force a schema at write").
# The oracle reads the same fields with DuckDB's JSON path functions;
# values compare exactly because extraction is typed at the edge.
# ---------------------------------------------------------------------------
@query(
    "variant_props_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(CASE WHEN json_extract_string(props, '$.missing')
                     IS NULL THEN 1 ELSE 0 END AS INT) AS missing_is_null
    FROM events GROUP BY 1, 4
    """,
)
def q_variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT lane: props parses once to VARIANT, fields extract with try_variant_get typed paths (missing paths are NULL, never errors) - no per-extraction string re-parse, no write-time schema."""
    e = read_table(spark, sf_dir, "events")
    v = e.select(
        "user_id", F.parse_json(F.col("props")).alias("vp")
    )
    shredded = v.select(
        "user_id",
        F.try_variant_get(F.col("vp"), "$.k", "bigint").alias("k"),
        F.try_variant_get(F.col("vp"), "$.missing", "string").alias(
            "missing"
        ),
    )
    return shredded.groupBy(
        "k",
        F.when(F.col("missing").isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("missing_is_null"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    ).select("k", "n", "n_users", "missing_is_null")


# ---------------------------------------------------------------------------
# Custom Python DataSource (r9): the Spark 4 ``pyspark.sql.datasource``
# seam — a connector-less feed (here a deterministic sensor generator;
# in production an API/device puller) declared with PARTITIONS so the
# scan parallelizes like any file source. The generation rule is the
# md5 integer lane, so the DuckDB oracle replays the identical rows
# from SQL alone and the query is hash-verified end-to-end even though
# no bytes ever touch disk.
# ---------------------------------------------------------------------------
def _pysource_oracle() -> str:
    from datalake_etlscripts_spark.plans.registry import ddb_hex32

    lane = ddb_hex32(
        "md5(CAST(s.s AS VARCHAR) || ':' || CAST(t.t AS VARCHAR))"
    )
    return f"""
    WITH s AS (SELECT unnest(range(0, 5)) AS s),
    t AS (SELECT unnest(range(0, 1024)) AS t),
    r AS (
      SELECT s.s AS sensor_id, t.t AS tick,
             {lane} % 1000 AS reading
      FROM s CROSS JOIN t
    )
    SELECT CAST(sensor_id AS INT) AS sensor_id,
           CAST(count(*) AS BIGINT) AS n_ticks,
           CAST(sum(reading) AS BIGINT) AS total,
           CAST(min(reading) AS INT) AS min_r,
           CAST(max(reading) AS INT) AS max_r,
           CAST(sum(CASE WHEN reading >= 900 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alerts
    FROM r GROUP BY 1
    """


@query("python_datasource_scan", oracle=_pysource_oracle())
def q_python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 custom Python DataSource scan: partition-parallel connector-less feed on the md5 lane, aggregated per sensor - the oracle replays identical rows from SQL, end-to-end hash-verified with no files involved."""
    from datalake_etlscripts_spark.io import pysource

    pysource.register(spark)
    df = spark.read.format("synthetic_sensor").load()
    return df.groupBy("sensor_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
        F.sum("reading").cast("long").alias("total"),
        F.min("reading").cast("int").alias("min_r"),
        F.max("reading").cast("int").alias("max_r"),
        F.sum(F.when(F.col("reading") >= 900, 1).otherwise(0))
        .cast("long")
        .alias("n_alerts"),
    )


# ---------------------------------------------------------------------------
# mapInArrow lane (r9): UTF-8 byte statistics through pyarrow.compute
# kernels — Arrow batches cross the JVM↔Python boundary zero-copy and
# the kernel is vectorized C++ (no pandas materialization, no per-row
# Python). The oracle is SQL octet_length, so the Arrow path is
# value-verified against the engines' own byte semantics. Completes
# the Python-lane ladder: row UDF (banned) < mapInPandas < mapInArrow.
# ---------------------------------------------------------------------------
@query(
    "arrow_utf8_stats",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(max(strlen(text)) AS BIGINT) AS max_bytes
    FROM documents GROUP BY 1
    """,
)
def q_arrow_utf8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow byte statistics: zero-copy Arrow batches through pyarrow.compute kernels, aggregated JVM-side, value-verified against SQL byte length (strlen)."""
    from datalake_etlscripts_spark.operators.multimodal import (
        arrow_utf8_stats,
    )

    d = read_table(spark, sf_dir, "documents")
    st = arrow_utf8_stats(d)
    return st.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.max("n_bytes").cast("long").alias("max_bytes"),
    )


# ---------------------------------------------------------------------------
# Parquet footer introspection (r13): row-group zone maps read from
# the REAL file metadata — no data pages touched. This is the
# planner-side half of data skipping the layout_pruning_audit models
# synthetically: at 100 TB a manifest of filenames fans out over
# executors, each task reads ONLY the footer (pyarrow
# ParquetFile.metadata) and emits per-row-group (rows, min, max) for
# the key column; pruning decisions then run on this bounded stats
# table without opening data. The oracle reads the same footers
# through DuckDB's independent parquet_metadata() reader — two
# parquet implementations agreeing on the physical statistics.
# ---------------------------------------------------------------------------
_FOOTER_KEYS = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]


# Footer statistics are a physical property of one concrete file
# layout, so the query is PINNED to the canonical sf0.01 files (the
# scale the driver's oracle comparison runs at) on both sides — the
# same fixed-input convention as the TSV/CSV fixture scans.
_FOOTER_SF = "/root/testdata/sf0.01"


def _footer_oracle() -> str:
    parts = [
        f"""
        SELECT '{t}' AS table_name, '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rowgroups,
               CAST(sum(row_group_num_rows) AS BIGINT) AS n_rows,
               CAST(min(CAST(stats_min_value AS BIGINT)) AS BIGINT) AS min_key,
               CAST(max(CAST(stats_max_value AS BIGINT)) AS BIGINT) AS max_key
        FROM parquet_metadata('{_FOOTER_SF}/{t}.parquet')
        WHERE path_in_schema = '{c}'
        """
        for t, c in _FOOTER_KEYS
    ]
    return " UNION ALL ".join(parts)


@query("parquet_footer_stats", oracle=_footer_oracle())
def q_parquet_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-group zone maps from real parquet footers, no data pages read: the table manifest fans out over executors, each task reads only ParquetFile.metadata and emits per-row-group key statistics - cross-checked against DuckDB's independent parquet_metadata() reader."""
    from typing import Iterator

    import pandas as pd

    manifest = spark.createDataFrame(
        [(t, c, f"{_FOOTER_SF}/{t}.parquet") for t, c in _FOOTER_KEYS],
        "table_name string, column_name string, path string",
    ).repartition(4)

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for t, c, path in zip(
                pdf["table_name"], pdf["column_name"], pdf["path"]
            ):
                md = pq.ParquetFile(path).metadata
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    for i in range(rg.num_columns):
                        col = rg.column(i)
                        if col.path_in_schema == c:
                            st = col.statistics
                            if st is None or not st.has_min_max:
                                raise ValueError(
                                    f"{path} row group {g}: column {c} "
                                    "has no min/max statistics — cannot "
                                    "build zone maps from this footer"
                                )
                            out.append(
                                (t, c, g, rg.num_rows, int(st.min), int(st.max))
                            )
            yield pd.DataFrame(
                out,
                columns=[
                    "table_name", "column_name", "rg", "rg_rows",
                    "rg_min", "rg_max",
                ],
            )

    stats = manifest.mapInPandas(
        read_footers,
        "table_name string, column_name string, rg long, rg_rows long, "
        "rg_min long, rg_max long",
    )
    return stats.groupBy("table_name", "column_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rowgroups"),
        F.sum("rg_rows").cast("long").alias("n_rows"),
        F.min("rg_min").cast("long").alias("min_key"),
        F.max("rg_max").cast("long").alias("max_key"),
    )
