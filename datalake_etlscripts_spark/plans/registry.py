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
            ORACLES[name] = oracle
        return fn

    return deco


# The correctness driver checks the FIRST 50 entries of queries() per
# round. Rounds 1, 3 and 4 accumulated 145 distinct driver-green
# queries (CORRECTNESS_r0{1,3,4}.json, zero failures); every other
# query is green in the local replica harness
# (tests/test_oracle_parity.py, all queries, sf0.01). Round 5 rotates
# the window onto 47 NEVER-driver-checked queries: the r9
# builder-session queue the round-4 verdict promoted (fifo_allocation,
# watermark_lateness_audit, voptimal_histogram, sprt_ab_monitor,
# cuped_adjusted_ab, graph_ktruss, python_datasource_scan,
# sql_recursive_demo, variant_props_extract, arrow_utf8_stats), the
# streaming-twin batch anchors (scd2_build, golden_record_merge), the
# co-order graph family re-anchored AFTER this round's mega-basket
# cap (label_propagation, link_prediction, assortativity,
# shortest_paths, mutual_matching, ktruss), and the lakeops/statops/
# sketch heads. Three sentinels (`versioned_ingest`,
# `dedup_minhash_lsh`, `refinedweb_pipeline`) keep round-over-round
# continuity. Names not yet registered are skipped; unlisted queries
# follow in registration order.
PRIORITY: list[str] = [
    # sentinels (driver-green r01+r03+r04, kept for continuity)
    "versioned_ingest",
    "dedup_minhash_lsh",
    "refinedweb_pipeline",
    # the staged r9 queue, judge-named first
    "fifo_allocation",
    "watermark_lateness_audit",
    "voptimal_histogram",
    "sprt_ab_monitor",
    "cuped_adjusted_ab",
    "graph_ktruss",
    "python_datasource_scan",
    "sql_recursive_demo",
    "variant_props_extract",
    "arrow_utf8_stats",
    # streaming-family batch twins (anchor the shared fold logic)
    "scd2_build",
    "golden_record_merge",
    # lakeops / warehouse heads
    "abc_classification",
    "bom_subtree_rollup",
    "revenue_waterfall",
    "pvm_bridge",
    # experimentation / causal heads
    "ips_offpolicy_estimate",
    "dr_offpolicy_estimate",
    "psm_stratified_ate",
    "bootstrap_ci_poisson",
    "experiment_did",
    # co-order graph family (newly capped edge builder this round)
    "graph_label_propagation",
    "graph_link_prediction",
    "graph_assortativity",
    "graph_shortest_paths",
    "graph_mutual_matching",
    # sketches / distributional audits
    "kmv_overlap",
    "hll_accuracy_audit",
    "moments_sketch_merge",
    "psi_drift",
    "ks_two_sample_quantized",
    # time-series / forecasting heads
    "ewma_anomaly",
    "seasonal_decompose",
    "croston_forecast",
    "holt_trend_forecast",
    "wavelet_haar",
    # ML-exact heads
    "ridge_regression_exact",
    "pca_2d_eigen",
    "isotonic_calibration",
    "ndcg_at_k",
    "matryoshka_recall",
    # linkage / retrieval heads
    "phonetic_blocking",
    "fellegi_sunter_linkage",
    "rake_keyphrases",
    # multimodal pixel path (new this round: real BMP/PPM pixel decode)
    "image_pixel_stats",
    # events / training-data heads
    "funnel_latency_quantiles",
    "pit_training_join",
]
# Per-query driver-evidence ledger (which round last driver-checked
# each query vs replica-only): see the "driver evidence" column in
# QUERIES.md, regenerated by scripts/gen_query_catalog.py from
# CORRECTNESS_r0*.json. ~237 never-driver-checked queries remain
# after this window — full coverage needs ~5 more rotations at 47
# fresh names per round.


def _ordered(d: dict) -> dict:
    head = {n: d[n] for n in PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)
