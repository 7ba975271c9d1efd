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
