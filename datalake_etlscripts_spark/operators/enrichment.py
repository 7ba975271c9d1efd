"""Company-annotation enrichment — parse_bsc_companies.py end-to-end.

The reference reads JSONL company annotations keyed by a notice's
``_id`` (parse_bsc_companies.py:66-77), redirects annotations that
point at an OBSOLETE version to the current active one by chasing
``updated_to`` (parse_bsc_companies.py:78-96 via
ntp_entry.follow_version, nextplib/ntp_entry.py:95-109), and writes a
nested ``empresas_en_docs.{doc_name}.{SINGLE_COMPANY|UTE}`` map onto
the notice (parse_bsc_companies.py:98-104) — one Mongo round-trip per
annotation.

Here the whole pipeline is three hash-joins on the store's key spine:

  resolve_annotations   annotations ⟕ follow_version(state): pointer
                        redirect as a JOIN (1-hop after merge_batch —
                        the engine maintains the 1-hop invariant the
                        reference repairs offline). Unmatched ids are
                        RETURNED (found=false), not silently dropped —
                        the reference logs and skips them.
  company_map           per resolved notice: deterministic nested map
                        doc_name → (singles, utes), built as a
                        doc_name-sorted array of structs serialized
                        with to_json — stable bytes for store writes.
  enrich_state          state ⟕ company_map: adds the
                        ``empresas_en_docs`` JSON column (NULL for
                        unannotated notices), reference --dry_run
                        parity left to the caller (the plan IS the
                        dry run until written).

Scale: annotations ≪ store, so the enrichment side is broadcast-sized
in practice; the join key is the store's primary key → AQE picks a
broadcast hash join. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_etlscripts_spark.versioning import follow_version

ANNOTATION_SCHEMA = (
    "procurement_id string, doc_name string, "
    "SINGLE_COMPANY array<string>, UTE array<string>"
)


def resolve_annotations(state: DataFrame, ann: DataFrame) -> DataFrame:
    """Redirect each annotation to the CURRENT active version of its
    target notice (parse_bsc_companies.py:78-96). Returns the
    annotation columns plus (resolved_id, found):

      found=true    procurement_id exists; resolved_id is the active
                    _id (== procurement_id when the target was active)
      found=false   unknown procurement_id; resolved_id is NULL (the
                    reference warns and skips — callers filter or
                    report these)
    """
    res = follow_version(state).select(
        F.col("_id").alias("procurement_id"),
        F.col("resolved_id"),
    )
    return ann.join(res, "procurement_id", "left").withColumn(
        "found", F.col("resolved_id").isNotNull()
    )


def company_map(resolved: DataFrame) -> DataFrame:
    """Per resolved notice: the nested enrichment payload
    (parse_bsc_companies.py:98-104's empresas_en_docs), as a
    deterministic JSON string — entries sorted by doc_name, company
    lists kept in annotation order, absent lists as empty arrays.
    Returns (resolved_id, empresas_en_docs)."""
    entry = F.struct(
        F.col("doc_name"),
        F.coalesce("SINGLE_COMPANY", F.array().cast("array<string>")).alias("singles"),
        F.coalesce("UTE", F.array().cast("array<string>")).alias("utes"),
    )
    return (
        resolved.filter(F.col("found"))
        .groupBy("resolved_id")
        .agg(F.array_sort(F.collect_list(entry)).alias("_docs"))
        .select("resolved_id", F.to_json(F.col("_docs")).alias("empresas_en_docs"))
    )


def enrich_state(state: DataFrame, ann: DataFrame) -> DataFrame:
    """The full pipeline: state + annotations → state with an
    ``empresas_en_docs`` JSON column (NULL where no annotation
    resolves). Row count and every existing column are preserved."""
    docs = company_map(resolve_annotations(state, ann)).withColumnRenamed(
        "resolved_id", "_id"
    )
    return state.join(docs, "_id", "left")


def qgrams(s, q: int = 2):
    """ARRAY<STRING> of ALL character q-grams of ``s`` (with repeats —
    the count filter needs multiset semantics). Strings shorter than q
    yield an EMPTY array: Spark's sequence(1, 0) counts DOWN ([1, 0]),
    so the length guard is explicit (same pitfall dedup.char_gram_hashes
    guards; DuckDB's generate_series(1, 0) is already empty)."""
    from pyspark.sql import functions as F

    idx = F.sequence(F.lit(1), F.length(s) - (q - 1))
    return F.when(
        F.length(s) >= q,
        F.transform(idx, lambda i: F.substring(s, i, q)),
    ).otherwise(F.array().cast("array<string>"))


def fuzzy_match_pairs(
    names: DataFrame,
    name_col: str = "name",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Fuzzy self-match over an entity-name table: all unordered pairs
    within Levenshtein distance ``max_dist`` — the record-linkage /
    entity-resolution primitive (the reference's company-name domain:
    OLD/get_entities.py normalizes adjudicatario names; near-identical
    spellings of one company are exactly this join).

    Blocking: per-string q-gram MULTISETS ((gram, count) rows, one
    grouped explode) equi-joined on the gram; candidate pairs must pass
    the Gravano count filter — multiset intersection Σ min(ca, cb) ≥
    max(|a|,|b|)−q+1−d·q (complete: edit distance ≤ d cannot destroy
    more than d·q grams) — plus the |len(a)−len(b)| ≤ d length filter.
    Only survivors pay the exact levenshtein.

    Scaling honesty: the gram join's volume is Σ_g bucket(g)², which
    degrades toward (and past) all-pairs when q is small relative to
    the name length/alphabet — on very short strings brute force by
    length-bucket is cheaper. Pick q so grams are selective (q=3+ for
    real company names); the rare-gram prefix filter (pick each
    string's d·q+1 globally rarest grams as its only blocking keys) is
    the established further cut and slots into the same join. Returns
    (name_a, name_b, dist), name_a < name_b."""
    from pyspark.sql import functions as F

    base = names.select(F.col(name_col).alias("_n")).dropDuplicates()
    g = (
        base.select("_n", F.explode(qgrams(F.col("_n"), q)).alias("_g"))
        .groupBy("_n", "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    ga = g.select(
        F.col("_n").alias("name_a"), "_g", F.col("_c").alias("_ca")
    )
    gb = g.select(
        F.col("_n").alias("name_b"), "_g", F.col("_c").alias("_cb")
    )
    bound = (
        F.greatest(F.length("name_a"), F.length("name_b"))
        - F.lit(q - 1)
        - F.lit(max_dist * q)
    )
    cand = (
        ga.join(gb, "_g")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= F.lit(max_dist)
        )
        .groupBy("name_a", "name_b")
        .agg(F.sum(F.least("_ca", "_cb")).alias("_shared"))
        .filter(F.col("_shared") >= F.greatest(bound, F.lit(1)))
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
