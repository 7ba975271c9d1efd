"""Query registry backing ``__spark_entry__.py``.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame``
paired (when SQL-expressible) with an ANSI-SQL oracle string DuckDB can
run against the same parquet tables. Column names are aliased
identically on both sides — the driver's compare hashes values after
sorting columns by name.

Float determinism policy: any aggregate over DOUBLE columns is summed
in DECIMAL (exact, engine-independent) and cast back to DOUBLE, so the
value hash matches DuckDB bit-for-bit. Ratios divide two such exact
numbers in IEEE754 double — also bit-deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def ddb_hex32(md5_expr: str, offset: int = 0) -> str:
    """DuckDB SQL: 8 hex digits of an md5 varchar starting after
    ``offset`` digits → BIGINT. DuckDB has no conv(); polynomial over
    hex digits. The cross-engine half of the md5 hash scheme used by
    oracle-checkable sketches (CMS lanes, simhash, minhash lanes) —
    Spark computes the same value with
    conv(substring(md5(x), offset + 1, 8), 16, 10)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({md5_expr}, {offset + i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"({terms})"


def query(name: str, oracle: str | None = None):
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The correctness driver checks the FIRST 50 entries of queries() per
# round; round 1 verified the original first 50 (CORRECTNESS_r01.json,
# 47 green + 3 approx). The window leads with the flagship
# ingest/txstore path, the dedup/ANN/text (LLM-pipeline) family,
# enrichment, and the hardest TPC-H. Round 3 rotated in the new
# operator families (exact AllPairs join, BM25 retrieval, PQ ANN,
# n-gram novelty, perceptual-hash dedup, triangle counting, basket
# mining, CDC apply); round 4 rotates in the end-to-end RefinedWeb
# funnel, the unigram-LM tokenizer, SoftDeDup reweighting, k-core, and
# the LSH tuning histogram — displacing five single-expression entries
# (fingerprints, PII regexes, pair counts, hash mixture sample, the
# corpus-prep subset of the funnel), which rest on the local replica
# harness (tests/test_oracle_parity.py). Names not yet registered are
# skipped; unlisted queries follow in registration order.
PRIORITY: list[str] = [
    "versioned_ingest",
    "version_invariants",
    "txstore_snapshot_diff",
    "summary_incremental",
    "storage_sync_plan",
    "crawl_fetch_policy",
    "multimodal_ahash_dupes",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_incremental_lsh",
    "dedup_simhash",
    "dedup_clusters_star",
    "dedup_paragraphs",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_semantic",
    "decontaminate",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "text_quality",
    "text_repetition",
    "lang_id",
    "soft_dedup_weights",
    "dedup_similarity_histogram",
    "quality_deciles",
    "tfidf_top_terms",
    "ngram_lm_counts",
    "vocab_top_terms",
    "unigram_tokenize",
    "ann_pq_topk",
    "dedup_allpairs_prefix",
    "bm25_topk",
    "graph_kcore",
    "ngram_novelty",
    "refinedweb_pipeline",
    "enrichment_resolved",
    "enrichment_nested",
    "graph_triangles",
    "graph_pagerank",
    "cdc_apply",
    "frequent_pairs",
    "approx_topk_terms",
    "approx_distinct_incremental",
    "q2_min_cost_supplier",
    "q9_profit_by_nation",
    "q17_small_qty_revenue",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
]


def _ordered(d: dict) -> dict:
    head = {n: d[n] for n in PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)
