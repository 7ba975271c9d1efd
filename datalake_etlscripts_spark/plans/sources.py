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
    """TSV mapping-table scan + column-rename application (S3/J1, insert_zip semantics)."""
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
    """';'-separated CPV dimension CSV source read with declared schema."""
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
    """JSONL annotation source: parsed, typed, and exploded into
    relational rows (S5, get_documents annotation sidecar)."""
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
    """Spanish NIF/NIE/CIF checksum validation (F13) as pure column expressions."""
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
    """Annotation enrichment join resolving redirects to company payloads (J7)."""
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


# ---------------------------------------------------------------------------
# parse_bsc_companies end-to-end (operators/enrichment.py): annotations
# redirected through the version chain, then folded into the nested
# empresas_en_docs payload. Fixtures are arithmetic projections of the
# customer spine (identical in both engines, no shuffle to build):
#   store        active row ntp(2·ck) per ck; even ck adds an OBSOLETE
#                row ntp(2·ck+1) pointing at the active (1-hop chain)
#   annotations  ck % 3 == 0 → targets ntp(2·ck+1): redirect for even
#                ck, UNKNOWN id for odd ck (found=false — the
#                reference's warn-and-skip path);
#                ck % 5 == 0 → targets the active directly
# ---------------------------------------------------------------------------
_ENRICH_FIXTURE_SQL = """
    cust AS (SELECT c_custkey AS ck FROM customer),
    store AS (
      SELECT printf('ntp%08d', ck * 2) AS _id, CAST(ck AS VARCHAR) AS id,
             FALSE AS obsolete_version, CAST(NULL AS VARCHAR) AS updated_to,
             'T' || CAST(ck % 7 AS VARCHAR) AS title
      FROM cust
      UNION ALL
      SELECT printf('ntp%08d', ck * 2 + 1), CAST(ck AS VARCHAR),
             TRUE, printf('ntp%08d', ck * 2), CAST(NULL AS VARCHAR)
      FROM cust WHERE ck % 2 = 0
    ),
    ann AS (
      SELECT printf('ntp%08d', ck * 2 + 1) AS procurement_id,
             'doc' || CAST(ck % 4 AS VARCHAR) AS doc_name,
             ['C' || CAST(ck % 5 AS VARCHAR)] AS SINGLE_COMPANY,
             CASE WHEN ck % 4 = 0 THEN ['U' || CAST(ck % 3 AS VARCHAR)]
                  ELSE CAST(NULL AS VARCHAR[]) END AS UTE
      FROM cust WHERE ck % 3 = 0
      UNION ALL
      SELECT printf('ntp%08d', ck * 2), 'extra',
             CAST(NULL AS VARCHAR[]), ['U' || CAST(ck % 7 AS VARCHAR)]
      FROM cust WHERE ck % 5 = 0
    )
"""


def _enrich_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_etlscripts_spark.functions.scalar import format_ntp_id

    c = read_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("ck"))
    ck = F.col("ck")
    active = c.select(
        format_ntp_id(ck * 2).alias("_id"),
        ck.cast("string").alias("id"),
        F.lit(False).alias("obsolete_version"),
        F.lit(None).cast("string").alias("updated_to"),
        F.concat(F.lit("T"), (ck % 7).cast("string")).alias("title"),
    )
    obsolete = c.filter(ck % 2 == 0).select(
        format_ntp_id(ck * 2 + 1).alias("_id"),
        ck.cast("string").alias("id"),
        F.lit(True).alias("obsolete_version"),
        format_ntp_id(ck * 2).alias("updated_to"),
        F.lit(None).cast("string").alias("title"),
    )
    return active.unionByName(obsolete)


def _enrich_annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_etlscripts_spark.functions.scalar import format_ntp_id

    c = read_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("ck"))
    ck = F.col("ck")
    a = c.filter(ck % 3 == 0).select(
        format_ntp_id(ck * 2 + 1).alias("procurement_id"),
        F.concat(F.lit("doc"), (ck % 4).cast("string")).alias("doc_name"),
        F.array(F.concat(F.lit("C"), (ck % 5).cast("string"))).alias("SINGLE_COMPANY"),
        F.when(
            ck % 4 == 0, F.array(F.concat(F.lit("U"), (ck % 3).cast("string")))
        ).alias("UTE"),
    )
    b = c.filter(ck % 5 == 0).select(
        format_ntp_id(ck * 2).alias("procurement_id"),
        F.lit("extra").alias("doc_name"),
        F.lit(None).cast("array<string>").alias("SINGLE_COMPANY"),
        F.array(F.concat(F.lit("U"), (ck % 7).cast("string"))).alias("UTE"),
    )
    return a.unionByName(b)


@query(
    "enrichment_resolved",
    oracle=f"""
    WITH {_ENRICH_FIXTURE_SQL}
    SELECT a.procurement_id, a.doc_name,
           coalesce(CASE WHEN s.obsolete_version THEN s.updated_to
                         ELSE s._id END, '') AS resolved_id,
           s._id IS NOT NULL AS found,
           len(coalesce(a.SINGLE_COMPANY, [])) AS n_singles,
           len(coalesce(a.UTE, [])) AS n_utes
    FROM ann a LEFT JOIN store s ON a.procurement_id = s._id
    """,
)
def q_enrichment_resolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotation → version-chain redirect (parse_bsc_companies.py:78-96)
    as a join against follow_version; unknown targets surface as
    found=false instead of vanishing. Oracle replays the 1-hop chase
    with a CASE over the obsolete flag."""
    from datalake_etlscripts_spark.operators.enrichment import resolve_annotations

    resolved = resolve_annotations(
        _enrich_store(spark, sf_dir), _enrich_annotations(spark, sf_dir)
    )
    return resolved.select(
        "procurement_id",
        "doc_name",
        F.coalesce("resolved_id", F.lit("")).alias("resolved_id"),
        "found",
        F.size(F.coalesce("SINGLE_COMPANY", F.array())).alias("n_singles"),
        F.size(F.coalesce("UTE", F.array())).alias("n_utes"),
    )


@query(
    "enrichment_nested",
    oracle=f"""
    WITH {_ENRICH_FIXTURE_SQL},
    resolved AS (
      SELECT CASE WHEN s.obsolete_version THEN s.updated_to ELSE s._id END AS _id,
             a.doc_name, coalesce(a.SINGLE_COMPANY, []) AS singles,
             coalesce(a.UTE, []) AS utes
      FROM ann a JOIN store s ON a.procurement_id = s._id
    ),
    payload AS (
      SELECT _id,
             CAST(to_json(list_sort(list(struct_pack(
               doc_name := doc_name, singles := singles, utes := utes
             )))) AS VARCHAR) AS empresas_en_docs
      FROM resolved GROUP BY _id
    )
    SELECT s._id, s.id, s.title, p.empresas_en_docs
    FROM store s JOIN payload p ON s._id = p._id
    """,
)
def q_enrichment_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full enrich_state pipeline: the nested empresas_en_docs
    payload (parse_bsc_companies.py:98-104) lands as a byte-stable JSON
    column, hash-compared against DuckDB building the identical JSON.
    Only enriched notices are returned (the untouched rest of the store
    is covered by the row-preservation unit test)."""
    from datalake_etlscripts_spark.operators.enrichment import enrich_state

    out = enrich_state(
        _enrich_store(spark, sf_dir), _enrich_annotations(spark, sf_dir)
    )
    return out.filter(F.col("empresas_en_docs").isNotNull()).select(
        "_id", "id", "title", "empresas_en_docs"
    )


# ---------------------------------------------------------------------------
# fuzzy entity matching (record linkage): q-gram-blocked levenshtein
# self-join over part names — the near-identical-spelling company-name
# problem from the reference's entity domain, as a blocked equi-join.
# Both engines implement classic Levenshtein, so the verify is exact.
# ---------------------------------------------------------------------------
@query(
    "fuzzy_name_match",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name AS n FROM part),
    g0 AS (
      SELECT n, unnest(list_transform(
               generate_series(1, greatest(length(n) - 1, 0)),
               i -> substr(n, CAST(i AS INT), 2))) AS gram
      FROM names WHERE length(n) >= 2
    ),
    g AS (SELECT n, gram, count(*) AS c FROM g0 GROUP BY 1, 2),
    cand AS (
      SELECT a.n AS name_a, b.n AS name_b, SUM(LEAST(a.c, b.c)) AS shared
      FROM g a JOIN g b ON a.gram = b.gram
      WHERE a.n < b.n AND abs(length(a.n) - length(b.n)) <= 2
      GROUP BY 1, 2
    ),
    f AS (
      SELECT name_a, name_b FROM cand
      WHERE shared >= greatest(
        greatest(length(name_a), length(name_b)) - 1 - 4, 1)
    )
    SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS INT) AS dist
    FROM f WHERE levenshtein(name_a, name_b) <= 2
    """,
)
def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: q-gram-blocked candidate equi-join + exact Levenshtein verify (distance <= 2) over distinct part names - never an all-pairs cross product."""
    from datalake_etlscripts_spark.operators.enrichment import fuzzy_match_pairs

    p = read_table(spark, sf_dir, "part")
    return fuzzy_match_pairs(p, name_col="p_name", max_dist=2, q=2)


# F3: field-name sanitize — the suggested-mapping generator for
# unmapped source headers (ntp_utils.py:43-49: prefix strip,
# parenthesized-qualifier promotion, space/dash underscoring, accent
# transliteration). Runs over the real fixture headers plus two
# literal prefixed headers that exercise the strip path.
_SANITIZE_EXTRA = [
    "ContractFolderStatus - Procurement Project - Name (Estimated)",
    "ContractFolderStatus - Budget Amount",
]
_SANITIZE_EXTRA_SQL = ", ".join(f"('{h}')" for h in _SANITIZE_EXTRA)

_SANITIZE_ORACLE = f"""
    WITH src AS (
      SELECT ORIGINAL AS original
      FROM read_csv('{TSV}', delim='\t', header=true, all_varchar=true)
      UNION ALL SELECT * FROM (VALUES {_SANITIZE_EXTRA_SQL}) v(original)
    ),
    s1 AS (
      SELECT original,
             regexp_replace(original, '^ContractFolderStatus - ', '') AS c
      FROM src
    ),
    s2 AS (
      SELECT original,
             CASE WHEN regexp_matches(c, '^.+ \\([^)]+\\)$')
                  THEN regexp_extract(c, '\\(([^)]+)\\)$', 1) || '/'
                       || regexp_extract(c, '^(.+?) \\([^)]+\\)$', 1)
                  ELSE c END AS c
      FROM s1
    ),
    s3 AS (SELECT original, replace(replace(c, ' - ', '_'), ' ', '_') AS c FROM s2)
    SELECT original,
           translate(c, 'áéíóúüñÁÉÍÓÚÜÑ', 'aeiouunAEIOUUN') AS dbfield
    FROM s3
"""


@query("sanitize_fields", oracle=_SANITIZE_ORACLE)
def q_sanitize_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 suggested-mapping generator: raw Spanish source headers to DBFIELD-style names - prefix strip, qualifier promotion, accent transliteration, pure expressions."""
    from datalake_etlscripts_spark.functions.scalar import sanitize_field_name

    m = read_mapping_tsv(spark, TSV).select(F.col("ORIGINAL").alias("original"))
    extra = spark.createDataFrame([(h,) for h in _SANITIZE_EXTRA], ["original"])
    return m.unionByName(extra).select(
        "original", sanitize_field_name(F.col("original")).alias("dbfield")
    )


# entity resolution END-TO-END: fuzzy pairs → transitive closure →
# canonical entity per name (the full record-linkage workflow the
# reference's adjudicatario normalization implies: OLD/get_entities.py
# canonicalizes company spellings; this is its distributed form)
_ENTITY_ORACLE = """
    WITH RECURSIVE names AS (SELECT DISTINCT p_name AS n FROM part),
    g0 AS (
      SELECT n, unnest(list_transform(
               generate_series(1, greatest(length(n) - 1, 0)),
               i -> substr(n, CAST(i AS INT), 2))) AS gram
      FROM names WHERE length(n) >= 2
    ),
    g AS (SELECT n, gram, count(*) AS c FROM g0 GROUP BY 1, 2),
    cand AS (
      SELECT a.n AS name_a, b.n AS name_b, SUM(LEAST(a.c, b.c)) AS shared
      FROM g a JOIN g b ON a.gram = b.gram
      WHERE a.n < b.n AND abs(length(a.n) - length(b.n)) <= 2
      GROUP BY 1, 2
    ),
    f AS (
      SELECT name_a, name_b FROM cand
      WHERE shared >= greatest(
        greatest(length(name_a), length(name_b)) - 1 - 4, 1)
        AND levenshtein(name_a, name_b) <= 2
    ),
    edges AS (
      SELECT name_a AS src, name_b AS dst FROM f
      UNION
      SELECT name_b, name_a FROM f
    ),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node)
    SELECT n.n AS name, COALESCE(c.component, n.n) AS entity
    FROM names n LEFT JOIN comp c ON c.node = n.n
"""


@query("entity_resolution", oracle=_ENTITY_ORACLE)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: fuzzy pairs (Levenshtein <= 2, q-gram blocked) to connected components to a canonical entity per name; singletons map to themselves."""
    from datalake_etlscripts_spark.operators.dedup import connected_components_star
    from datalake_etlscripts_spark.operators.enrichment import fuzzy_match_pairs

    p = read_table(spark, sf_dir, "part")
    names = p.select(F.col("p_name").alias("n")).dropDuplicates()
    pairs = fuzzy_match_pairs(names, name_col="n", max_dist=2, q=2).select(
        F.col("name_a").alias("id_a"), F.col("name_b").alias("id_b")
    )
    comp = connected_components_star(pairs, "id_a", "id_b")
    return names.join(
        comp.withColumnRenamed("node", "n"), "n", "left"
    ).select(
        F.col("n").alias("name"),
        F.coalesce("component", F.col("n")).alias("entity"),
    )


# Fellegi–Sunter probabilistic linkage (r4): the calibrated scoring
# layer the rule-based entity_resolution lacks — per-field agreement
# weights ln(m/u_f) with u_f from the field's value histogram (rare
# fields earn large weights). ln follows the DSIR convention: exact
# integer (S_f, N²) scalars, cast-then-divide, same-host libm, fixed
# to integer micro-nats; pair scoring is pure BIGINT.
_FS_ORACLE = """
    WITH r AS (
      SELECT p_partkey, p_type, p_brand,
             string_split(p_name, ' ')[1] AS name_head,
             CAST(floor(p_size / 10) AS BIGINT) AS size_band,
             CAST(floor(p_retailprice / 5) AS BIGINT) AS price_band
      FROM part
    ),
    n AS (SELECT count(*) AS N FROM r),
    sb AS (SELECT CAST(sum(c*c) AS BIGINT) AS s FROM (SELECT count(*) AS c FROM r GROUP BY p_brand)),
    sm AS (SELECT CAST(sum(c*c) AS BIGINT) AS s FROM (SELECT count(*) AS c FROM r GROUP BY name_head)),
    sc AS (SELECT CAST(sum(c*c) AS BIGINT) AS s FROM (SELECT count(*) AS c FROM r GROUP BY price_band)),
    ss AS (SELECT CAST(sum(c*c) AS BIGINT) AS s FROM (SELECT count(*) AS c FROM r GROUP BY size_band)),
    w AS (
      SELECT
        CAST(floor(ln(CAST(95 * N * N AS DOUBLE) / CAST(100 * sb.s AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wab,
        CAST(floor(ln(CAST(5 * N * N AS DOUBLE) / CAST(100 * (N * N - sb.s) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wdb,
        CAST(floor(ln(CAST(95 * N * N AS DOUBLE) / CAST(100 * sm.s AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wam,
        CAST(floor(ln(CAST(5 * N * N AS DOUBLE) / CAST(100 * (N * N - sm.s) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wdm,
        CAST(floor(ln(CAST(95 * N * N AS DOUBLE) / CAST(100 * sc.s AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wac,
        CAST(floor(ln(CAST(5 * N * N AS DOUBLE) / CAST(100 * (N * N - sc.s) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wdc,
        CAST(floor(ln(CAST(95 * N * N AS DOUBLE) / CAST(100 * ss.s AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS was,
        CAST(floor(ln(CAST(5 * N * N AS DOUBLE) / CAST(100 * (N * N - ss.s) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wds
      FROM n, sb, sm, sc, ss
    ),
    p AS (
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             a.p_brand = b.p_brand AS gb, a.name_head = b.name_head AS gm,
             a.price_band = b.price_band AS gc,
             a.size_band = b.size_band AS gs
      FROM r a JOIN r b ON a.p_type = b.p_type AND a.p_partkey < b.p_partkey
    )
    SELECT id_a, id_b,
           CAST((CASE WHEN gb THEN 1 ELSE 0 END + CASE WHEN gm THEN 1 ELSE 0 END
                 + CASE WHEN gc THEN 1 ELSE 0 END + CASE WHEN gs THEN 1 ELSE 0 END)
                AS INT) AS n_agree,
           CAST((CASE WHEN gb THEN wab ELSE wdb END
                 + CASE WHEN gm THEN wam ELSE wdm END
                 + CASE WHEN gc THEN wac ELSE wdc END
                 + CASE WHEN gs THEN was ELSE wds END) AS BIGINT) AS score_micro
    FROM p, w
    WHERE (CASE WHEN gb THEN wab ELSE wdb END
           + CASE WHEN gm THEN wam ELSE wdm END
           + CASE WHEN gc THEN wac ELSE wdc END
           + CASE WHEN gs THEN was ELSE wds END) > 0
"""


@query("fellegi_sunter_linkage", oracle=_FS_ORACLE)
def q_fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage: type-blocked part pairs scored by per-field ln(m/u) agreement weights with u estimated from value histograms - integer micro-nat scoring, blocked equi-join, never all-pairs."""
    from datalake_etlscripts_spark.operators.enrichment import fellegi_sunter_pairs

    r = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_type",
        "p_brand",
        F.split(F.col("p_name"), " ").getItem(0).alias("name_head"),
        F.floor(F.col("p_size") / 10).cast("bigint").alias("size_band"),
        F.floor(F.col("p_retailprice") / 5).cast("bigint").alias("price_band"),
    )
    return fellegi_sunter_pairs(
        r,
        id_col="p_partkey",
        block_col="p_type",
        compare_cols=["p_brand", "name_head", "price_band", "size_band"],
    )


# ---------------------------------------------------------------------------
# Id-completeness audit (r5): which 1024-key blocks of the orderkey
# space are missing rows — the ingestion-gap monitor (did a backfill
# skip a range?). Block spine generated from the global bounds so
# FULLY-missing blocks surface too; one groupBy + broadcast bounds.
# ---------------------------------------------------------------------------
@query(
    "id_completeness",
    oracle="""
    WITH b AS (
      SELECT o_orderkey // 1024 AS block, count(*) AS n_present
      FROM orders GROUP BY 1
    ),
    g AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi FROM orders),
    spine AS (
      SELECT unnest(generate_series(lo // 1024, hi // 1024)) AS block, lo, hi
      FROM g
    )
    SELECT spine.block,
           CAST(COALESCE(b.n_present, 0) AS BIGINT) AS n_present,
           CAST(least(hi, spine.block * 1024 + 1023)
                - greatest(lo, spine.block * 1024) + 1 AS BIGINT) AS n_expected,
           CAST(least(hi, spine.block * 1024 + 1023)
                - greatest(lo, spine.block * 1024) + 1
                - COALESCE(b.n_present, 0) AS BIGINT) AS n_missing
    FROM spine LEFT JOIN b ON b.block = spine.block
    WHERE least(hi, spine.block * 1024 + 1023)
          - greatest(lo, spine.block * 1024) + 1
          - COALESCE(b.n_present, 0) > 0
    """,
)
def q_id_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-gap audit: per 1024-key block of the orderkey space, present vs expected counts with fully-missing blocks surfaced via a generated spine - one groupBy plus broadcast bounds."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    b = o.groupBy(F.expr("o_orderkey div 1024").alias("block")).agg(
        F.count(F.lit(1)).alias("n_present")
    )
    g = o.agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
    spine = g.select(
        F.explode(
            F.sequence(F.expr("lo div 1024"), F.expr("hi div 1024"))
        ).alias("block"),
        "lo",
        "hi",
    ).repartition(8, "block")
    j = spine.join(b, "block", "left")
    expected = (
        F.least(F.col("hi"), F.col("block") * 1024 + 1023)
        - F.greatest(F.col("lo"), F.col("block") * 1024)
        + 1
    )
    present = F.coalesce(F.col("n_present"), F.lit(0)).cast("long")
    return (
        j.select(
            "block",
            present.alias("n_present"),
            expected.cast("long").alias("n_expected"),
            (expected - present).cast("long").alias("n_missing"),
        )
        .filter(F.col("n_missing") > 0)
    )


# ---------------------------------------------------------------------------
# CPV spend rollup (r12): THE procurement analytics shape — revenue
# rolled up the CPV code hierarchy (division = 2-digit prefix,
# group = 3, class = 4) from the same ';'-quoted dimension CSV the
# reference loads (load_cpv.py:56-72). Part keys map onto the 10-code
# fixture deterministically (p_partkey mod |cpv|, by the control
# order), lineitem revenue stays DECIMAL-exact through the three
# grouped unions, and the dim join is a broadcast. One fact scan →
# three dictionary-keyed aggregates; at 100 TB the rollup table is
# |prefixes|-sized.
# ---------------------------------------------------------------------------
@query(
    "cpv_spend_rollup",
    oracle=f"""
    WITH cpv AS (
      SELECT _id, CAST(control AS INT) AS control
      FROM read_csv('{CSV}', delim=';', header=true, quote='''',
                    all_varchar=true)
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS k FROM cpv),
    pc AS (
      SELECT p.p_partkey, c._id AS cpv_id
      FROM part p, n
      JOIN cpv c ON c.control = CAST(p.p_partkey % n.k + 1 AS INT)
    ),
    rev AS (
      SELECT pc.cpv_id,
             CAST(li.l_extendedprice * (1 - li.l_discount)
                  AS DECIMAL(18,4)) AS r
      FROM lineitem li JOIN pc ON pc.p_partkey = li.l_partkey
    ),
    lv AS (
      SELECT 'division' AS level, substr(cpv_id, 1, 2) AS prefix,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(r) AS DECIMAL(38,4)) AS revenue
      FROM rev GROUP BY 2
      UNION ALL
      SELECT 'group', substr(cpv_id, 1, 3), CAST(count(*) AS BIGINT),
             CAST(sum(r) AS DECIMAL(38,4))
      FROM rev GROUP BY 2
      UNION ALL
      SELECT 'class', substr(cpv_id, 1, 4), CAST(count(*) AS BIGINT),
             CAST(sum(r) AS DECIMAL(38,4))
      FROM rev GROUP BY 2
    )
    SELECT level, prefix, n_items, revenue FROM lv
    """,
)
def q_cpv_spend_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rolled up the CPV hierarchy (division/group/class prefixes) from the reference's ';'-quoted CPV dimension CSV - deterministic part-to-code assignment, DECIMAL-exact sums, broadcast dim join."""
    from datalake_etlscripts_spark.io.readers import read_csv_dim, read_table

    cpv = read_csv_dim(spark, CSV, int_cols=("control",)).select(
        "_id", "control"
    )
    n = cpv.groupBy().agg(F.count(F.lit(1)).cast("long").alias("k"))
    p = read_table(spark, sf_dir, "part").select("p_partkey")
    pc = (
        p.crossJoin(F.broadcast(n))
        .join(
            F.broadcast(cpv),
            F.col("control")
            == (F.col("p_partkey") % F.col("k") + 1).cast("int"),
        )
        .select("p_partkey", F.col("_id").alias("cpv_id"))
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).cast("decimal(18,4)").alias("r"),
    )
    rev = li.join(F.broadcast(pc), li["l_partkey"] == pc["p_partkey"]).select(
        "cpv_id", "r"
    )

    def lvl(name: str, width: int) -> DataFrame:
        return rev.groupBy(
            F.substring("cpv_id", 1, width).alias("prefix")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("r").cast("decimal(38,4)").alias("revenue"),
        ).select(F.lit(name).alias("level"), "prefix", "n_items", "revenue")

    return (
        lvl("division", 2)
        .unionByName(lvl("group", 3))
        .unionByName(lvl("class", 4))
    )
