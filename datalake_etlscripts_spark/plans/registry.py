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
# round. Rounds 1/3/4/5/6 accumulated 238 distinct driver-green
# queries (CORRECTNESS_r0{1,3,4,5,6}.json; one r01 row errored —
# approx_aggregates, since fixed); every other query is green in the
# local replica harness (tests/test_oracle_parity.py, all queries,
# sf0.01). Round 7 rotates the window onto 47 NEVER-driver-green
# names, led by the lanes the round-6 verdict staged: the r12
# inference family (dictionary-rank tests), the bounded-recurrence
# fold lane, the real-codec heads (TIFF/QOI/µ-law/GIF), the two TS
# motif heads, the retrieval + graph strays, the three queries built
# THIS round (schema-evolution merge, sensor/SCD2 stream-fold twins),
# approx_aggregates (the only errored row in driver history — its
# list-valued columns were scalarized rounds ago; this closes the
# ledger), and the lakeops commerce heads. Three sentinels
# (versioned_ingest, dedup_minhash_lsh, refinedweb_pipeline) keep
# round-over-round continuity.
#
# Rotation plan (round-5 verdict #10): 47 fresh names per round,
# sentinels pinned, comparable_subsets frozen in bench.py. ~185
# never-driver-checked names remain after this window → ~4 more
# rotations (r08: text/LLM long tail; r09: vector/retrieval + stats
# heads; r10: events/window analytics; r11: remainder + format
# lanes).
PRIORITY: list[str] = [
    # sentinels (driver-green r01+r03+r04+r05+r06, kept for continuity)
    "versioned_ingest",
    "dedup_minhash_lsh",
    "refinedweb_pipeline",
    # r12 inference lane (round-6 verdict #1 — zero driver history)
    "mann_whitney_u",
    "kruskal_wallis",
    "brown_forsythe_variance",
    "bh_fdr_discoveries",
    "mcnemar_paired",
    "yuen_trimmed_test",
    "conformal_interval_coverage",
    "good_turing_counts",
    "eb_shrunken_rates",
    "cramers_v_type_dow",
    "turning_points_test",
    "mean_excess_table",
    # bounded-recurrence fold lane (nested-fold IEEE-replay technique)
    "dtw_profile_distance",
    "holt_winters_forecast",
    "bradley_terry_brands",
    "rls_ar1_forecast",
    "viterbi_user_state_path",
    # real-codec heads (GIF closed per round-6 verdict #4)
    "tiff_pixel_stats",
    "qoi_pixel_stats",
    "mulaw_audio_stats",
    "gif_pixel_stats",
    # time-series motif heads
    "daily_motif_pairs",
    "sax_daily_symbols",
    # retrieval + graph strays
    "query_likelihood_lm",
    "graph_harmonic_closeness",
    # built this round (round-6 verdict #6/#9)
    "evolve_merge_demo",
    "sensor_alerts_fold",
    "scd2_stream_fold",
    # the one ever-errored driver row, re-staged fixed
    "approx_aggregates",
    # lakeops / commerce heads (registry plan r07 tranche)
    "rfm_segments",
    "max_drawdown",
    "weekend_lift",
    "topn_with_others",
    "inventory_aging",
    "rev_recognition_schedule",
    "weekly_rank_movers",
    "arc_elasticity",
    "arpu_monthly",
    "supplier_concentration",
    "brand_return_rates",
    "discount_response_curve",
    "brand_cross_sell",
    "order_backlog_curve",
    "price_dispersion_audit",
    "dup_invoice_candidates",
    "supplier_leadtime_stats",
    "customer_frequency_histogram",
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
