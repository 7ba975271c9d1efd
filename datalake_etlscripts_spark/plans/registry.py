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

# Mega-basket cap shared by every co-order / basket self-join query
# (the skew bound: a same-key self-join emits B² rows per basket of B
# items). The SINGLE definition — Spark plans import it, and oracle SQL
# references it via the ``__MAX_BASKET__`` token substituted at
# registration below, so changing the cap can never desynchronize the
# engine from its oracles.
MAX_BASKET = 64


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


def ddb_hex60(md5_expr: str) -> str:
    """DuckDB SQL: first 15 hex digits of an md5 varchar → BIGINT
    (≤ 2^60−1 — the sum of 15 digit·16^i terms stays < 1.16e18, inside
    BIGINT). Spark twin: functions/scalar.md5_hash60 via
    conv(substring(md5(x), 1, 15), 16, 10). The wide lane for
    order-statistic sketches (KMV/theta)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({md5_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"({terms})"


def query(name: str, oracle: str | None = None):
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.replace("__MAX_BASKET__", str(MAX_BASKET))
        return fn

    return deco


# The correctness driver checks the FIRST 50 entries of queries() per
# round. Rounds 1/3/4/5 accumulated 191 distinct driver-green queries
# (CORRECTNESS_r0{1,3,4,5}.json, zero failures); every other query is
# green in the local replica harness (tests/test_oracle_parity.py, all
# queries, sf0.01). Round 6 rotates the window onto 47 NEVER-driver-
# checked names, the families the round-5 verdict staged: events/
# attribution + retention, the data-quality audit heads, the dedup/ANN
# tuning curves, the three NEW streaming batch twins (funnel fold,
# trending-terms state, mini-batch k-means — promoted from unit-only
# evidence), the remaining co-order graph heads, the privacy suite,
# the LLM-corpus heads, and four TPC-H classics. compaction_bins is
# staged deliberately: its bin arithmetic moved to exact long `div`
# this round. Three sentinels (versioned_ingest, dedup_minhash_lsh,
# refinedweb_pipeline) keep round-over-round continuity.
#
# Rotation plan (round-5 verdict #10): 47 fresh names per round,
# sentinels pinned, comparable_subsets frozen in bench.py. ~200
# never-driver-checked names remained after this window, plus the 17
# r12-session additions (inference lane: mann_whitney_u,
# kruskal_wallis, brown_forsythe_variance, bh_fdr_discoveries,
# mcnemar_paired, yuen_trimmed_test, conformal_interval_coverage;
# fold lane: dtw_profile_distance, holt_winters_forecast,
# bradley_terry_brands; TS: daily_motif_pairs, sax_daily_symbols;
# retrieval: query_likelihood_lm; graph: graph_harmonic_closeness;
# codecs: tiff_pixel_stats, mulaw_audio_stats, qoi_pixel_stats) →
# ~5 more rotations (r07: events/window analytics + lakeops commerce
# heads + the r12 inference/fold lanes; r08: text/LLM long tail;
# r09: vector/retrieval + stats; r10+: remainder).
PRIORITY: list[str] = [
    # sentinels (driver-green r01+r03+r04+r05, kept for continuity)
    "versioned_ingest",
    "dedup_minhash_lsh",
    "refinedweb_pipeline",
    # attribution / retention family (round-5 verdict #1)
    "attribution_first_touch",
    "attribution_position_based",
    "attribution_time_decay",
    "retention_d1_d7_d28",
    "cohort_ltv_curve",
    "survival_retention_km",
    "bot_detection",
    # data-quality audit heads
    "fd_discovery",
    "candidate_keys",
    "benford_audit",
    "simpsons_paradox_audit",
    # dedup / ANN tuning curves
    "ann_multiprobe_topk",
    "ann_ivf_nprobe_sweep",
    "dedup_lsh_band_sweep",
    "ann_recall_mrr",
    "ann_projected_topk",
    # streaming batch twins (NEW this round — shared-fold evidence)
    "funnel_advance_fold",
    "trending_terms_fold",
    "minibatch_kmeans_fold",
    # co-order graph heads without driver rows
    "graph_stress_centrality",
    "graph_coreness_classes",
    "graph_ppr_seeds",
    "graph_neighborhood_hll",
    "graph_rich_club",
    "graph_density_summary",
    "graph_lpa_modularity",
    "graph_community_conductance",
    "textrank_keywords",
    # privacy / anonymization suite
    "k_anonymity_audit",
    "l_diversity_audit",
    "t_closeness_audit",
    "dp_noisy_release",
    "k_anonymity_generalize",
    # LLM-corpus heads
    "token_counts",
    "doc_fingerprints",
    "dedup_clusters",
    "train_test_split",
    "pack_sequences",
    "vocab_encode",
    "decontamination_ngram_sweep",
    # lakehouse heads (compaction_bins: new exact-div arithmetic)
    "compaction_bins",
    "txstore_time_travel",
    "ivm_join_view",
    # real-PNG pixel path (NEW this round: stdlib-zlib inflate +
    # all five scanline unfilters)
    "png_pixel_stats",
    # TPC-H classics
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q14_promo_revenue",
]
# Per-query driver-evidence ledger (which round last driver-checked
# each query vs replica-only): see the "driver evidence" column in
# QUERIES.md, regenerated by scripts/gen_query_catalog.py from
# CORRECTNESS_r0*.json.


def _ordered(d: dict) -> dict:
    head = {n: d[n] for n in PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)
