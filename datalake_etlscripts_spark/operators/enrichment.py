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


def fellegi_sunter_pairs(
    records: DataFrame,
    id_col: str,
    block_col: str,
    compare_cols: list[str],
    m: tuple[int, int] = (95, 100),
    scale: int = 1_000_000,
    threshold_micro: int = 0,
) -> DataFrame:
    """Probabilistic record linkage (Fellegi & Sunter 1969; the
    scoring model behind Splink-style ER): candidate pairs blocked on
    ``block_col`` are scored by Σ_f agreement weights, where each
    compared field f contributes

        agree:    ln(m / u_f)          disagree: ln((1−m) / (1−u_f))

    with m the match-agreement prior (default 95/100, the standard
    initialization) and u_f ESTIMATED FROM DATA as the probability two
    random records agree on f: u_f = S_f / N² with S_f = Σ_v n_v² over
    f's value histogram. Rare fields (small u) earn large agreement
    weights — agreeing on a 1-in-40 container says more than agreeing
    on a 1-in-5 manufacturer; the rule-based twin (fuzzy_match_pairs →
    entity_resolution) has no such calibration.

    Determinism/scale shape (the DSIR convention): each u_f reduces to
    TWO exact integers (S_f, N) via one map-side-combined aggregate
    per field; only those scalars reach the driver, where the ln()
    happens in Python as ln(float(x)/float(y)) — cast-then-divide,
    mirroring the external oracle — and is fixed to integer
    micro-nats (floor(x·1e6 + 0.5), half-up). Pair scoring is then
    pure BIGINT: one blocked self-equi-join (never all-pairs) + a
    literal-weight sum. Returns (id_a, id_b, n_agree, score_micro)
    for pairs with score_micro > ``threshold_micro``.
    """
    import math

    m_num, m_den = m
    n_total = records.count()
    weights: dict[str, tuple[int, int]] = {}
    for f in compare_cols:
        s_f = (
            records.groupBy(f)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.sum(F.col("_n") * F.col("_n")).cast("long").alias("_s"))
            .collect()[0]["_s"]
        )
        nn = n_total * n_total
        if s_f >= nn:
            raise ValueError(
                f"compare field {f!r} agrees on every record pair (u=1) - "
                "it carries no linkage signal; drop it from compare_cols"
            )
        w_agree = math.floor(
            math.log(float(m_num * nn) / float(m_den * s_f)) * scale + 0.5
        )
        w_dis = math.floor(
            math.log(float((m_den - m_num) * nn) / float(m_den * (nn - s_f)))
            * scale
            + 0.5
        )
        weights[f] = (w_agree, w_dis)

    a = records.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col).alias("_blk"),
        *[F.col(f).alias(f"_a_{f}") for f in compare_cols],
    )
    b = records.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col).alias("_blk"),
        *[F.col(f).alias(f"_b_{f}") for f in compare_cols],
    )
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    score = F.lit(0).cast("long")
    agree_n = F.lit(0)
    for f in compare_cols:
        agrees = F.col(f"_a_{f}") == F.col(f"_b_{f}")
        w_agree, w_dis = weights[f]
        score = score + F.when(agrees, F.lit(w_agree)).otherwise(F.lit(w_dis))
        agree_n = agree_n + F.when(agrees, 1).otherwise(0)
    return (
        pairs.select(
            "id_a",
            "id_b",
            agree_n.alias("n_agree"),
            score.alias("score_micro"),
        )
        .filter(F.col("score_micro") > threshold_micro)
    )
