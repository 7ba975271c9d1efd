"""Source-format queries (SURVEY.md §2.1 S3/S4/S5 + J1/J9) over the
committed fixture files in /root/repo/fixtures — TSV column mapping,
';'-quoted CPV dimension CSV, JSONL company annotations."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_etlscripts_spark.functions.scalar import is_valid_nif
from datalake_etlscripts_spark.io.readers import read_csv_dim, read_jsonl, read_mapping_tsv, read_table
from datalake_etlscripts_spark.plans.registry import query

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "fixtures")
TSV = os.path.join(FIXTURES, "column_mapping.tsv")
CSV = os.path.join(FIXTURES, "cpv.csv")
JSONL = os.path.join(FIXTURES, "company_annotations.jsonl")


# S3: TSV mapping scan + collision detection (two ORIGINALs → one DBFIELD,
# the list-merge trigger in normalize.apply_mapping; ntp_utils.py:101-107)
@query(
    "tsv_mapping_scan",
    oracle=f"""
    SELECT DBFIELD AS dbfield, count(*) AS n_sources,
           array_to_string(list_sort(list(ORIGINAL)), '|') AS originals
    FROM read_csv('{TSV}', delim='\t', header=true, all_varchar=true)
    GROUP BY DBFIELD
    """,
)
def q_tsv_mapping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = read_mapping_tsv(spark, TSV)
    return m.groupBy(F.col("DBFIELD").alias("dbfield")).agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.array_join(F.array_sort(F.collect_list("ORIGINAL")), "|").alias("originals"),
    )


# S4: ';'-separated quoted CSV dimension + F1-style int cast + J9 self
# lookup of the 2-digit CPV division prefix
@query(
    "csv_cpv_dim",
    oracle=f"""
    WITH cpv AS (
      SELECT _id, CAST(control AS INT) AS control, descripcion
      FROM read_csv('{CSV}', delim=';', header=true, quote='''', all_varchar=true)
    )
    SELECT c._id, c.control, c.descripcion,
           d.descripcion AS division_desc
    FROM cpv c LEFT JOIN cpv d ON d._id = substr(c._id, 1, 2) || '000000'
    """,
)
def q_csv_cpv_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    cpv = read_csv_dim(spark, CSV, int_cols=("control",))
    division = cpv.select(
        F.col("_id").alias("_div_id"), F.col("descripcion").alias("division_desc")
    )
    return cpv.join(
        F.broadcast(division),
        F.concat(F.substring("_id", 1, 2), F.lit("000000")) == F.col("_div_id"),
        "left",
    ).select("_id", "control", "descripcion", "division_desc")


# S5 + F13: JSONL annotations scan, company-id validation, per-notice
# rollup (parse_bsc_companies.py:66-112 shape)
@query(
    "jsonl_company_annotations",
    oracle=f"""
    WITH ann AS (
      SELECT procurement_id, doc_name,
             coalesce(SINGLE_COMPANY, []) AS singles, coalesce(UTE, []) AS utes
      FROM read_json('{JSONL}', format='newline_delimited',
                     columns={{'procurement_id':'VARCHAR','doc_name':'VARCHAR',
                               'SINGLE_COMPANY':'VARCHAR[]','UTE':'VARCHAR[]'}})
    )
    SELECT procurement_id, count(*) AS n_docs,
           coalesce(array_to_string(list_sort(flatten(list(singles))), ','), '') AS all_singles,
           coalesce(array_to_string(list_sort(flatten(list(utes))), ','), '') AS all_utes
    FROM ann GROUP BY procurement_id
    """,
)
def q_jsonl_annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ann = read_jsonl(
        spark,
        JSONL,
        schema="procurement_id string, doc_name string, "
        "SINGLE_COMPANY array<string>, UTE array<string>",
    )
    return (
        ann.groupBy("procurement_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(
                F.array_sort(
                    F.flatten(F.collect_list(F.coalesce("SINGLE_COMPANY", F.array())))
                ),
                ",",
            ).alias("all_singles"),
            F.array_join(
                F.array_sort(F.flatten(F.collect_list(F.coalesce("UTE", F.array())))),
                ",",
            ).alias("all_utes"),
        )
    )


# F13: NIF/CIF/NIE validation over the annotation ids
@query(
    "nif_validation",
    oracle=f"""
    WITH ids AS (
      SELECT unnest(coalesce(SINGLE_COMPANY, []) || coalesce(UTE, [])) AS company_id
      FROM read_json('{JSONL}', format='newline_delimited',
                     columns={{'procurement_id':'VARCHAR','doc_name':'VARCHAR',
                               'SINGLE_COMPANY':'VARCHAR[]','UTE':'VARCHAR[]'}})
    )
    SELECT company_id,
           (regexp_matches(upper(replace(replace(replace(company_id,'-',''),'.',''),' ','')), '^[0-9]{{8}}[A-Z]$')
            OR regexp_matches(upper(replace(replace(replace(company_id,'-',''),'.',''),' ','')), '^[ABCDEFGHJKLMNPQRSUVW][0-9]{{7}}[0-9A-J]$')
            OR regexp_matches(upper(replace(replace(replace(company_id,'-',''),'.',''),' ','')), '^[XYZ][0-9]{{7}}[A-Z]$')) AS valid
    FROM ids
    """,
)
def q_nif_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ann = read_jsonl(
        spark,
        JSONL,
        schema="procurement_id string, doc_name string, "
        "SINGLE_COMPANY array<string>, UTE array<string>",
    )
    ids = ann.select(
        F.explode(
            F.concat(
                F.coalesce("SINGLE_COMPANY", F.array()), F.coalesce("UTE", F.array())
            )
        ).alias("company_id")
    )
    return ids.select("company_id", is_valid_nif(F.col("company_id")).alias("valid"))


# J7-shape enrichment join: annotations resolved onto the versioned
# store built from orders (active versions only), yielding per-notice
# company enrichment — the parse_bsc_companies pipeline end-to-end
@query(
    "enrichment_join",
    oracle=f"""
    WITH ann AS (
      SELECT procurement_id, doc_name,
             coalesce(SINGLE_COMPANY, []) AS singles
      FROM read_json('{JSONL}', format='newline_delimited',
                     columns={{'procurement_id':'VARCHAR','doc_name':'VARCHAR',
                               'SINGLE_COMPANY':'VARCHAR[]','UTE':'VARCHAR[]'}})
    ),
    store AS (
      SELECT printf('ntp%08d', row_number() OVER (ORDER BY CAST(o_custkey AS VARCHAR))) AS _id,
             CAST(o_custkey AS VARCHAR) AS id
      FROM (SELECT DISTINCT o_custkey FROM orders)
    )
    SELECT a.procurement_id, s.id AS natural_key, a.doc_name,
           len(a.singles) AS n_companies
    FROM ann a JOIN store s ON a.procurement_id = s._id
    """,
)
def q_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from datalake_etlscripts_spark.functions.scalar import format_ntp_id

    ann = read_jsonl(
        spark,
        JSONL,
        schema="procurement_id string, doc_name string, "
        "SINGLE_COMPANY array<string>, UTE array<string>",
    )
    orders = read_table(spark, sf_dir, "orders")
    store = (
        orders.select(F.col("o_custkey").cast("string").alias("id"))
        .distinct()
        .select(
            format_ntp_id(F.row_number().over(W.orderBy("id"))).alias("_id"), "id"
        )
    )
    return (
        ann.join(store, ann.procurement_id == store._id)
        .select(
            "procurement_id",
            F.col("id").alias("natural_key"),
            "doc_name",
            F.size(F.coalesce("SINGLE_COMPANY", F.array())).alias("n_companies"),
        )
    )
