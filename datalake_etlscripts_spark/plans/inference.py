"""Hypothesis-testing query plans (r12): the inferential-statistics
lane a metrics warehouse runs beside the estimation heads already in
statops — rank-based two-sample comparison (Mann-Whitney U with tie
correction), multiple-testing control (Benjamini-Hochberg step-up over
a deterministic p-value table), paired binary outcomes (McNemar), and
a robust equality-of-variances test (Brown-Forsythe, median-centred
Levene). House float-determinism policy throughout: every rank, count
and deviation is an exact integer (event values quantized to cents);
doubles appear only in one final fixed-order combine both engines
evaluate identically (the bm25_topk / graph_assortativity policy).

Reference provenance: the reference engine has no inferential lane —
this extends the experimentation surface (SURVEY §2 beyond-reference:
sprt_ab_monitor, cuped_adjusted_ab) with the classical tests that sit
upstream of those sequential monitors in a real experimentation stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.plans.registry import query


# ---------------------------------------------------------------------------
# Mann-Whitney U ('click' vs 'purchase' event values): ranks computed
# on the VALUE DICTIONARY (distinct cents — bounded by the 2-decimal
# value domain, ≤ ~50k rows regardless of fact count), never on the
# facts: per distinct value the cumulative count below it gives the
# average rank in closed form, avg_rank = c_lt + (n_v + 1)/2, kept
# integral as 2·avg_rank. U, the tie term Σ(t³−t) and the variance
# numerator are exact integers (DECIMAL(38,0) for the n³ headroom —
# int64 overflows at sf≳1); z is one double division over one sqrt at
# the very end. The single global window runs on the dictionary, so
# the one-partition sort is bounded by construction — the facts take
# one hash aggregate. 100 TB: scan → dict aggregate → 50k-row window.
# ---------------------------------------------------------------------------
@query(
    "mann_whitney_u",
    oracle="""
    WITH e AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    d AS (
      SELECT v, CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
      FROM e GROUP BY v
    ),
    c AS (
      SELECT v, na, nb,
             CAST(coalesce(sum(na + nb) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS clt
      FROM d
    ),
    m AS (
      SELECT CAST(sum(na) AS BIGINT) AS n_a,
             CAST(sum(nb) AS BIGINT) AS n_b,
             CAST(sum(CAST(na AS DECIMAL(38,0))
                      * (2 * clt + na + nb + 1)) AS DECIMAL(38,0)) AS r2a,
             CAST(sum(CAST(na + nb AS DECIMAL(38,0)) * (na + nb) * (na + nb)
                      - (na + nb)) AS DECIMAL(38,0)) AS tie_term
      FROM c
    )
    SELECT n_a, n_b,
           CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           CAST(tie_term AS BIGINT) AS tie_term,
           CAST(floor(
             CAST(r2a - n_a * (n_a + 1) - n_a * n_b AS DOUBLE)
             / (2 * sqrt(
                 CAST(CAST(n_a * n_b AS DECIMAL(38,0))
                      * (CAST(n_a + n_b + 1 AS DECIMAL(38,0))
                         * (n_a + n_b) * (n_a + n_b - 1) - tie_term)
                      AS DOUBLE)
                 / CAST(12 * (n_a + n_b) * (n_a + n_b - 1) AS DOUBLE)))
             * 1000000 + 0.5) AS BIGINT) AS z_micros
    FROM m
    """,
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test on click-vs-purchase event values - dictionary ranks in closed form (2x average rank stays integral), exact tie-corrected variance in DECIMAL, one double division + sqrt at the end."""
    e = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("b"),
        )
    )
    d = e.groupBy("v").agg(
        F.sum("a").cast("long").alias("na"),
        F.sum("b").cast("long").alias("nb"),
    )
    # dictionary-sized window (distinct cents, bounded by the value domain)
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    c = d.select(
        "na",
        "nb",
        F.coalesce(F.sum(F.col("na") + F.col("nb")).over(wv), F.lit(0))
        .cast("long")
        .alias("clt"),
    )
    # r2a / tie_term ride DECIMAL(38,0) end-to-end (round-6 advice):
    # the per-value cube (n_v³) passes 2^63 once a single cents value
    # holds ~2.1M rows, and the engines would diverge differently
    # (DuckDB cast error vs Spark silent wrap). Only the BIGINT
    # *output* columns u2_a/tie_term keep that ceiling — the z
    # statistic itself is computed from the exact DECIMAL carriers.
    m = c.groupBy().agg(
        F.sum("na").cast("long").alias("n_a"),
        F.sum("nb").cast("long").alias("n_b"),
        F.sum(
            F.col("na").cast("decimal(38,0)")
            * (2 * F.col("clt") + F.col("na") + F.col("nb") + 1)
        ).cast("decimal(38,0)").alias("r2a"),
        F.sum(
            (F.col("na") + F.col("nb")).cast("decimal(38,0)")
            * (F.col("na") + F.col("nb")) * (F.col("na") + F.col("nb"))
            - (F.col("na") + F.col("nb"))
        ).cast("decimal(38,0)").alias("tie_term"),
    )
    nn = F.col("n_a") + F.col("n_b")
    varnum = (
        (F.col("n_a") * F.col("n_b")).cast("decimal(38,0)")
        * ((nn + 1).cast("decimal(38,0)") * nn * (nn - 1) - F.col("tie_term"))
    )
    varden = (12 * nn * (nn - 1)).cast("long")
    z = (
        (F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1)
         - F.col("n_a") * F.col("n_b")).cast("double")
        / (2 * F.sqrt(varnum.cast("double") / varden.cast("double")))
    )
    return m.select(
        "n_a",
        "n_b",
        (F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("long")
        .alias("u2_a"),
        F.col("tie_term").cast("long").alias("tie_term"),
        F.floor(z * 1000000 + 0.5).cast("long").alias("z_micros"),
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg step-up over the (event_type × day-of-week)
# hypothesis table: p-values come from the house deterministic
# md5-uniform (first 8 hex chars as a 32-bit integer — the
# sampling.uniform_hash scheme, engine-portable), with a planted
# signal (purchase rows divided by 64) so some discoveries are real.
# The entire procedure is INTEGER-EXACT: the step-up comparison
# p_(i) ≤ i·q/m at q = 1/20 becomes p32·m·20 ≤ i·2^32, and the
# adjusted p is a running min-from-the-bottom of floor-scaled
# rationals — no float appears anywhere. m is dictionary-sized
# (|types|·7 = 35), so the windows are trivially bounded; the fact
# scan contributes only the hypothesis keys. The same shape scales to
# millions of hypotheses: the window is over the HYPOTHESIS table,
# never the facts.
# ---------------------------------------------------------------------------
@query(
    "bh_fdr_discoveries",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dw
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT event_type, dw,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(('0x' || substr(
                         md5(event_type || '|' || CAST(dw AS VARCHAR)),
                         1, 8)) AS UBIGINT) // 64
                  ELSE CAST(('0x' || substr(
                         md5(event_type || '|' || CAST(dw AS VARCHAR)),
                         1, 8)) AS UBIGINT)
             END AS p32
      FROM h
    ),
    r AS (
      SELECT event_type, dw, CAST(p32 AS BIGINT) AS p32,
             CAST(row_number() OVER (ORDER BY p32, event_type, dw)
                  AS BIGINT) AS rnk,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM p
    ),
    s AS (
      SELECT *,
             CAST(max(CASE WHEN p32 * m * 20 <= rnk * 4294967296
                       THEN rnk ELSE 0 END) OVER () AS BIGINT) AS kmax,
             CAST(min(least(1000000, (p32 * m * 1000000)
                                     // (rnk * 4294967296)))
                  OVER (ORDER BY rnk ROWS BETWEEN CURRENT ROW
                        AND UNBOUNDED FOLLOWING) AS BIGINT) AS padj_micros
      FROM r
    )
    SELECT event_type, dw, p32, rnk, m,
           CAST(CASE WHEN rnk <= kmax THEN 1 ELSE 0 END AS INT)
             AS discovered,
           padj_micros
    FROM s
    """,
)
def q_bh_fdr_discoveries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR step-up (q=1/20) over the event_type x day-of-week hypothesis table - md5-deterministic p-values with a planted purchase signal, integer-exact step-up comparison and floor-scaled adjusted p, windows on the 35-row hypothesis table only."""
    e = read_table(spark, sf_dir, "events")
    # Spark dayofweek is 1(Sun)..7; DuckDB is 0(Sun)..6 — align on 0..6.
    h = e.groupBy(
        "event_type",
        (F.dayofweek("ts") - 1).cast("long").alias("dw"),
    ).agg(F.lit(1))
    p32_raw = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("event_type"), F.col("dw"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    # integer `div`, not float /: structurally identical to the
    # oracle's `// 64` (round-6 advice — float division was exact only
    # because 64 is a power of two and p32 < 2^53)
    p = h.select(
        "event_type",
        "dw",
        p32_raw.alias("p32_raw"),
    ).select(
        "event_type",
        "dw",
        F.when(
            F.col("event_type") == "purchase",
            F.expr("p32_raw div 64"),
        ).otherwise(F.col("p32_raw")).alias("p32"),
    )
    # hypothesis-table windows (m = |types| * 7 — dictionary-sized)
    wr = W.orderBy("p32", "event_type", "dw")
    r = p.select(
        "event_type",
        "dw",
        "p32",
        F.row_number().over(wr).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(
            W.partitionBy().rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).cast("long").alias("m"),
    )
    scale = F.lit(4294967296).cast("long")
    hit = F.when(
        F.col("p32") * F.col("m") * 20 <= F.col("rnk") * scale,
        F.col("rnk"),
    ).otherwise(F.lit(0))
    wall = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    wtail = W.orderBy("rnk").rowsBetween(0, W.unboundedFollowing)
    padj_at = F.least(
        F.lit(1000000).cast("long"),
        F.expr("(p32 * m * 1000000) div (rnk * 4294967296)"),
    )
    s = r.select(
        "event_type",
        "dw",
        "p32",
        "rnk",
        "m",
        F.max(hit).over(wall).cast("long").alias("kmax"),
        F.min(padj_at).over(wtail).cast("long").alias("padj_micros"),
    )
    return s.select(
        "event_type",
        "dw",
        "p32",
        "rnk",
        "m",
        F.when(F.col("rnk") <= F.col("kmax"), 1).otherwise(0)
        .cast("int")
        .alias("discovered"),
        "padj_micros",
    )


# ---------------------------------------------------------------------------
# McNemar's paired test on (user, week) exposure units: within each
# unit the paired binary outcomes are "clicked" and "purchased"; the
# test reads only the DISCORDANT cells b (click-only) and c
# (purchase-only). Week index is floor(epoch/604800) — identical
# arithmetic both engines, no calendar-week semantics to disagree on.
# χ² = (b−c)²/(b+c) and the continuity-corrected (|b−c|−1)²/(b+c)
# are emitted as exact floor-scaled integers (pure int64 division —
# no float at all). One fact scan → unit aggregate → 1 row.
# ---------------------------------------------------------------------------
@query(
    "mcnemar_paired",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(epoch(ts) AS BIGINT) // 604800 AS wk,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cl,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pu
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(CASE WHEN cl = 1 AND pu = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b_click_only,
             CAST(sum(CASE WHEN cl = 0 AND pu = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_purchase_only
      FROM u
    )
    SELECT n_units, b_click_only, c_purchase_only,
           CAST(CASE WHEN b_click_only + c_purchase_only = 0 THEN 0
                ELSE ((b_click_only - c_purchase_only)
                      * (b_click_only - c_purchase_only) * 1000000)
                     // (b_click_only + c_purchase_only) END AS BIGINT)
             AS stat_micros,
           CAST(CASE WHEN b_click_only + c_purchase_only = 0
                       OR abs(b_click_only - c_purchase_only) < 1 THEN 0
                ELSE ((abs(b_click_only - c_purchase_only) - 1)
                      * (abs(b_click_only - c_purchase_only) - 1) * 1000000)
                     // (b_click_only + c_purchase_only) END AS BIGINT)
             AS stat_cc_micros
    FROM m
    """,
)
def q_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test on (user, week) units: click-only vs purchase-only discordant counts, chi-square and continuity-corrected statistics as exact floor-scaled int64 - no float anywhere."""
    e = read_table(spark, sf_dir, "events")
    u = e.groupBy(
        "user_id",
        F.expr("unix_timestamp(ts) div 604800").alias("wk"),
    ).agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("cl"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("pu"),
    )
    m = u.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(
            F.when((F.col("cl") == 1) & (F.col("pu") == 0), 1).otherwise(0)
        ).cast("long").alias("b_click_only"),
        F.sum(
            F.when((F.col("cl") == 0) & (F.col("pu") == 1), 1).otherwise(0)
        ).cast("long").alias("c_purchase_only"),
    )
    b, c = F.col("b_click_only"), F.col("c_purchase_only")
    stat = F.when(b + c == 0, F.lit(0)).otherwise(
        F.expr(
            "((b_click_only - c_purchase_only)"
            " * (b_click_only - c_purchase_only) * 1000000)"
            " div (b_click_only + c_purchase_only)"
        )
    )
    stat_cc = F.when(
        (b + c == 0) | (F.abs(b - c) < 1), F.lit(0)
    ).otherwise(
        F.expr(
            "((abs(b_click_only - c_purchase_only) - 1)"
            " * (abs(b_click_only - c_purchase_only) - 1) * 1000000)"
            " div (b_click_only + c_purchase_only)"
        )
    )
    return m.select(
        "n_units",
        "b_click_only",
        "c_purchase_only",
        stat.cast("long").alias("stat_micros"),
        stat_cc.cast("long").alias("stat_cc_micros"),
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe equality-of-variances test across the five event
# types: deviations are |cents − group lower median| — medians found
# by row_number on the per-group sort (exact, deterministic; no
# percentile interpolation to disagree on), deviations and their
# squares summed as exact int64 per group. The F statistic needs the
# rational Σ s_g²/n_g, which is NOT integral across unequal groups —
# so the five per-group terms fold as doubles IN GROUP ORDER
# (sort_array over a 5-row collect — the bm25 fixed-order-combine
# policy), then one final double expression. Output: the five exact
# integer group rows, each carrying the shared f_micros scalar.
# 100 TB: one fact scan → per-group median window (partitioned by the
# 5-value type key) → 5-row fold on the driver-side-free plan.
# ---------------------------------------------------------------------------
@query(
    "brown_forsythe_variance",
    oracle="""
    WITH e AS (
      SELECT event_type AS g,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    med AS (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY g) AS cnt
      FROM e
    ),
    md AS (
      SELECT g, v AS med FROM med WHERE rn = (cnt + 1) // 2
    ),
    z AS (
      SELECT e.g, abs(e.v - md.med) AS z
      FROM e JOIN md ON e.g = md.g
    ),
    gs AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(z) AS BIGINT) AS s_g,
             CAST(sum(z * z) AS BIGINT) AS q_g
      FROM z GROUP BY g
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(s_g) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS k,
             list_reduce(
               list_prepend(0.0, list(CAST(s_g * s_g AS DOUBLE)
                                      / CAST(n_g AS DOUBLE) ORDER BY g)),
               (a, b) -> a + b) AS sg2,
             CAST(sum(q_g) AS BIGINT) AS q
      FROM gs
    ),
    f AS (
      SELECT CAST(floor(
               (CAST(n - k AS DOUBLE) / CAST(k - 1 AS DOUBLE))
               * ((sg2 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n AS DOUBLE))
                  / (CAST(q AS DOUBLE) - sg2))
               * 1000000 + 0.5) AS BIGINT) AS f_micros
      FROM tot
    )
    SELECT gs.g AS event_type, gs.n_g, md.med AS med_cents, gs.s_g,
           gs.q_g, f.f_micros
    FROM gs JOIN md ON gs.g = md.g CROSS JOIN f
    """,
)
def q_brown_forsythe_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centred Levene) equality-of-variances across event types - exact integer medians/deviations per group, the 5 rational between-group terms folded as doubles in group order, one final F expression."""
    e = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )
    wg = W.partitionBy("g").orderBy("v")
    wc = W.partitionBy("g")
    # aggregate-by-g (not filter) so the skew guard PROVES one row per
    # key on the join's build side
    med = (
        e.select(
            "g",
            "v",
            F.row_number().over(wg).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("cnt"),
        )
        .groupBy("g")
        .agg(
            F.min(
                F.when(F.col("rn") == F.expr("(cnt + 1) div 2"), F.col("v"))
            ).alias("med")
        )
    )
    z = e.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("v") - F.col("med")).alias("z")
    )
    gs = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("z").cast("long").alias("s_g"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("q_g"),
    )
    # 5-row fold in group order: the only doubles in the plan
    tot = gs.groupBy().agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("g"),
                        (
                            (F.col("s_g") * F.col("s_g")).cast("double")
                            / F.col("n_g").cast("double")
                        ).alias("t"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("sg2"),
        F.sum("q_g").cast("long").alias("q"),
    )
    f = tot.select(
        F.floor(
            ((F.col("n") - F.col("k")).cast("double")
             / (F.col("k") - 1).cast("double"))
            * (
                (F.col("sg2")
                 - F.col("s").cast("double") * F.col("s").cast("double")
                 / F.col("n").cast("double"))
                / (F.col("q").cast("double") - F.col("sg2"))
            )
            * 1000000
            + 0.5
        ).cast("long").alias("f_micros")
    )
    return (
        gs.join(med, "g")
        .crossJoin(F.broadcast(f))
        .select(
            F.col("g").alias("event_type"),
            "n_g",
            F.col("med").alias("med_cents"),
            "s_g",
            "q_g",
            "f_micros",
        )
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H across ALL FIVE event types — the k-group
# generalization of mann_whitney_u on the same value dictionary:
# per distinct cents value the per-group counts and the global
# cumulative-below give every group's rank sum in closed form
# (2·R_g stays integral). H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1) needs
# the rational Σ R_g²/n_g, so the five per-group terms fold as
# doubles IN GROUP ORDER (the brown_forsythe policy; R_g² rides
# DECIMAL(38,0) — int64 overflows at sf≳0.1); the tie correction
# divides by 1 − ΣT/(N³−N) with the same exact tie term the MW query
# emits. Output: one exact integer row per group plus the shared
# h_micros / h_tied_micros scalars.
# ---------------------------------------------------------------------------
@query(
    "kruskal_wallis",
    oracle="""
    WITH e AS (
      SELECT event_type AS g,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    d AS (
      SELECT v, g, CAST(count(*) AS BIGINT) AS ngv FROM e GROUP BY v, g
    ),
    nv AS (
      SELECT v, CAST(sum(ngv) AS BIGINT) AS n_v,
             CAST(coalesce(sum(sum(ngv)) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS clt
      FROM d GROUP BY v
    ),
    rg AS (
      SELECT d.g, CAST(sum(d.ngv) AS BIGINT) AS n_g,
             CAST(sum(CAST(d.ngv AS DECIMAL(38,0))
                      * (2 * nv.clt + nv.n_v + 1))
                  AS DECIMAL(38,0)) AS r2_g
      FROM d JOIN nv USING (v) GROUP BY d.g
    ),
    ties AS (
      SELECT CAST(sum(CAST(n_v AS DECIMAL(38,0)) * n_v * n_v - n_v)
                  AS DECIMAL(38,0)) AS tie_term FROM nv
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             list_reduce(
               list_prepend(0.0, list(
                 CAST(r2_g * r2_g AS DOUBLE)
                 / CAST(4 * n_g AS DOUBLE) ORDER BY g)),
               (a, b) -> a + b) AS s
      FROM rg
    ),
    h AS (
      SELECT CAST(floor(
               (12.0 * s / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
               * 1000000 + 0.5) AS BIGINT) AS h_micros,
             CAST(floor(
               (12.0 * s / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
               / (1.0 - CAST(t.tie_term AS DOUBLE)
                        / CAST(CAST(n AS DECIMAL(38,0)) * n * n - n
                               AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS h_tied_micros
      FROM tot CROSS JOIN ties t
    )
    SELECT rg.g AS event_type, rg.n_g,
           CAST(rg.r2_g AS BIGINT) AS r2_g, h.h_micros, h.h_tied_micros
    FROM rg CROSS JOIN h
    """,
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five event types on cent-quantized values - closed-form dictionary ranks (2xR_g integral), DECIMAL-exact squares, five-term fixed-order double fold, exact tie correction."""
    e = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )
    d = e.groupBy("v", "g").agg(F.count(F.lit(1)).cast("long").alias("ngv"))
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    nv = (
        d.groupBy("v")
        .agg(F.sum("ngv").cast("long").alias("n_v"))
        .select(
            "v",
            "n_v",
            F.coalesce(F.sum("n_v").over(wv), F.lit(0))
            .cast("long")
            .alias("clt"),
        )
    )
    # r2_g / tie_term ride DECIMAL(38,0) internally (round-6 advice:
    # the per-value cube and the rank sum pass 2^63 at scale and the
    # engines wrap vs error differently); only the BIGINT r2_g
    # *output* column keeps that ceiling — H itself is exact.
    rg = (
        d.join(nv, "v")
        .groupBy("g")
        .agg(
            F.sum("ngv").cast("long").alias("n_g"),
            F.sum(
                F.col("ngv").cast("decimal(38,0)")
                * (2 * F.col("clt") + F.col("n_v") + 1)
            ).cast("decimal(38,0)").alias("r2_g"),
        )
    )
    ties = nv.groupBy().agg(
        F.sum(
            F.col("n_v").cast("decimal(38,0)") * F.col("n_v") * F.col("n_v")
            - F.col("n_v")
        ).cast("decimal(38,0)").alias("tie_term")
    )
    tot = rg.groupBy().agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("g"),
                        (
                            (F.col("r2_g") * F.col("r2_g")).cast("double")
                            / (4 * F.col("n_g")).cast("double")
                        ).alias("t"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("s"),
    )
    nn = F.col("n").cast("double")
    h_raw = 12.0 * F.col("s") / (nn * (F.col("n") + 1)) - 3.0 * (
        F.col("n") + 1
    )
    h = tot.crossJoin(F.broadcast(ties)).select(
        F.floor(h_raw * 1000000 + 0.5).cast("long").alias("h_micros"),
        F.floor(
            h_raw
            / (
                1.0
                - F.col("tie_term").cast("double")
                / (
                    F.col("n").cast("decimal(38,0)") * F.col("n")
                    * F.col("n") - F.col("n")
                ).cast("double")
            )
            * 1000000
            + 0.5
        ).cast("long").alias("h_tied_micros"),
    )
    return rg.crossJoin(F.broadcast(h)).select(
        F.col("g").alias("event_type"),
        "n_g",
        F.col("r2_g").cast("long").alias("r2_g"),
        "h_micros",
        "h_tied_micros",
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction intervals (r12): the
# distribution-free uncertainty wrapper every forecasting service
# bolts onto a point model. Deterministic md5 split of events into
# train/calibration/test (60/20/20 — integer threshold comparison on
# the 32-bit hash, the sampling.uniform_hash scheme); the point model
# is the train mean of cents per (event_type, hour-of-day) cell (kept
# as the exact rational sum/n — each residual is ONE double division
# of two exact integers, so both engines see identical bits); the
# conformal radius q̂ is the ⌈0.9·(n_cal+1)⌉-th smallest calibration
# residual (an order statistic — no interpolation to disagree on),
# and the test coverage count compares bit-identical doubles. The
# guarantee under exchangeability is coverage ≥ 0.9; the emitted
# coverage_permille audits it. Dictionary-bounded after one fact scan
# (cells = |types|·24); the residual sort is calibration-sized.
# ---------------------------------------------------------------------------
@query(
    "conformal_interval_coverage",
    oracle="""
    WITH e AS (
      SELECT event_type AS g, CAST(hour(ts) AS BIGINT) AS h,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
             CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) AS p32
      FROM events
    ),
    tr AS (
      SELECT g, h, CAST(count(*) AS BIGINT) AS n_cell,
             CAST(sum(y) AS BIGINT) AS s_cell
      FROM e WHERE p32 * 10 < 4294967296 * 6 GROUP BY g, h
    ),
    cal AS (
      SELECT e.g, e.h,
             CAST(abs(e.y * t.n_cell - t.s_cell) AS DOUBLE)
               / CAST(t.n_cell AS DOUBLE) AS r
      FROM e JOIN tr t ON t.g = e.g AND t.h = e.h
      WHERE p32 * 10 >= 4294967296 * 6 AND p32 * 10 < 4294967296 * 8
    ),
    nq AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal
    ),
    qh AS (
      SELECT r AS qhat FROM (
        SELECT r, row_number() OVER (ORDER BY r) AS rn FROM cal
      ), nq
      WHERE rn = (9 * (nq.n_cal + 1) + 9) // 10
    ),
    te AS (
      SELECT e.y, t.n_cell, t.s_cell,
             CAST(abs(e.y * t.n_cell - t.s_cell) AS DOUBLE)
               / CAST(t.n_cell AS DOUBLE) AS r
      FROM e JOIN tr t ON t.g = e.g AND t.h = e.h
      WHERE p32 * 10 >= 4294967296 * 8
    )
    SELECT (SELECT CAST(sum(n_cell) AS BIGINT) FROM tr) AS n_train,
           nq.n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(floor(qh.qhat * 1000000 + 0.5) AS BIGINT) AS q_micros,
           CAST(sum(CASE WHEN te.r <= qh.qhat THEN 1 ELSE 0 END)
                AS BIGINT) AS covered,
           CAST((sum(CASE WHEN te.r <= qh.qhat THEN 1 ELSE 0 END) * 1000)
                // count(*) AS BIGINT) AS coverage_permille
    FROM te CROSS JOIN qh CROSS JOIN nq
    GROUP BY nq.n_cal, qh.qhat
    """,
)
def q_conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval audit: md5-deterministic 60/20/20 split, per-(type,hour) train-mean model kept as an exact rational, order-statistic conformal radius at 90%, bit-exact test coverage in permille."""
    from datalake_etlscripts_spark.operators.sampling import _hex_key

    e = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.hour("ts").cast("long").alias("h"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("y"),
        F.conv(F.substring(_hex_key(F.col("event_id")), 1, 8), 16, 10)
        .cast("long")
        .alias("p32"),
    )
    scale = F.lit(4294967296).cast("long")
    tr = (
        e.filter(F.col("p32") * 10 < scale * 6)
        .groupBy("g", "h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cell"),
            F.sum("y").cast("long").alias("s_cell"),
        )
    )
    resid = (
        F.abs(F.col("y") * F.col("n_cell") - F.col("s_cell")).cast("double")
        / F.col("n_cell").cast("double")
    )
    cal = (
        e.filter(
            (F.col("p32") * 10 >= scale * 6) & (F.col("p32") * 10 < scale * 8)
        )
        .join(F.broadcast(tr), ["g", "h"])
        .select(resid.alias("r"))
    )
    nq = cal.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    wq = W.orderBy("r")
    qh = (
        cal.select("r", F.row_number().over(wq).alias("rn"))
        .crossJoin(F.broadcast(nq))
        # ⌈9(n+1)/10⌉ in pure integer arithmetic (round-6 advice: the
        # binary-float 0.9·(n+1) can land epsilon off an integer)
        .filter(F.col("rn") == F.expr("(9 * (n_cal + 1) + 9) div 10"))
        .select(F.col("r").alias("qhat"), "n_cal")
    )
    te = (
        e.filter(F.col("p32") * 10 >= scale * 8)
        .join(F.broadcast(tr), ["g", "h"])
        .select(resid.alias("r"))
    )
    n_train = tr.groupBy().agg(
        F.sum("n_cell").cast("long").alias("n_train")
    )
    agg = (
        te.crossJoin(F.broadcast(qh))
        .groupBy("n_cal", "qhat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("r") <= F.col("qhat"), 1).otherwise(0)
            ).cast("long").alias("covered"),
        )
    )
    return agg.crossJoin(F.broadcast(n_train)).select(
        "n_train",
        "n_cal",
        "n_test",
        F.floor(F.col("qhat") * 1000000 + 0.5).cast("long").alias("q_micros"),
        "covered",
        F.expr("(covered * 1000) div n_test").alias("coverage_permille"),
    )


# ---------------------------------------------------------------------------
# Yuen's trimmed-mean test (click vs purchase, 20% trim) — the robust
# LOCATION test beside brown_forsythe's robust scale test. Everything
# comes off the VALUE DICTIONARY, never a fact-sized sort: with
# per-value counts and the cumulative-below, the g-th order statistic
# is the first value whose cumulative reaches it, the trimmed sum is
# Σ v · overlap of [clt, clt+cnt) with the kept rank band
# [g, n−g) (exact partial-tie handling), and the winsorized moments
# clamp v to [lo, hi] before the same dictionary aggregate. Trimmed
# means and the winsorized variance numerator A = n·Σw² − (Σw)² stay
# exact (DECIMAL for the Σw² headroom); t is one fixed-order double
# expression. 100 TB: one fact scan → dictionary aggregate →
# two scalar rows.
# ---------------------------------------------------------------------------
@query(
    "yuen_trimmed_test",
    oracle="""
    WITH e AS (
      SELECT event_type AS g,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    d AS (
      SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY g, v
    ),
    c AS (
      SELECT g, v, cnt,
             CAST(coalesce(sum(cnt) OVER (
               PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS clt
      FROM d
    ),
    nn AS (
      SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt) // 5 AS BIGINT) AS gt
      FROM d GROUP BY g
    ),
    oshi AS (
      SELECT c.g,
             CAST(min(CASE WHEN c.clt + c.cnt >= nn.gt + 1
                      THEN c.v END) AS BIGINT) AS lo,
             CAST(min(CASE WHEN c.clt + c.cnt >= nn.n - nn.gt
                      THEN c.v END) AS BIGINT) AS hi
      FROM c JOIN nn USING (g) GROUP BY c.g
    ),
    agg AS (
      SELECT c.g, nn.n, nn.n - 2 * nn.gt AS h, o.lo, o.hi,
             CAST(sum(c.v * greatest(0,
               least(nn.n - nn.gt, c.clt + c.cnt) - greatest(nn.gt, c.clt)
             )) AS BIGINT) AS sum_mid,
             CAST(sum(least(greatest(c.v, o.lo), o.hi) * c.cnt)
                  AS BIGINT) AS sw,
             CAST(sum(CAST(least(greatest(c.v, o.lo), o.hi)
                           AS DECIMAL(38,0))
                      * least(greatest(c.v, o.lo), o.hi) * c.cnt)
                  AS DECIMAL(38,0)) AS sw2
      FROM c JOIN nn USING (g) JOIN oshi o ON o.g = c.g
      GROUP BY c.g, nn.n, nn.gt, o.lo, o.hi
    ),
    ab AS (
      SELECT
        (SELECT n FROM agg WHERE g = 'click') AS n_a,
        (SELECT h FROM agg WHERE g = 'click') AS h_a,
        (SELECT lo FROM agg WHERE g = 'click') AS lo_a,
        (SELECT hi FROM agg WHERE g = 'click') AS hi_a,
        (SELECT sum_mid FROM agg WHERE g = 'click') AS summid_a,
        (SELECT CAST(CAST(CAST(n AS DECIMAL(38,0)) * sw2
                          - CAST(sw AS DECIMAL(38,0)) * sw AS VARCHAR)
                     AS DOUBLE) FROM agg WHERE g = 'click') AS aa,
        (SELECT n FROM agg WHERE g = 'purchase') AS n_b,
        (SELECT h FROM agg WHERE g = 'purchase') AS h_b,
        (SELECT lo FROM agg WHERE g = 'purchase') AS lo_b,
        (SELECT hi FROM agg WHERE g = 'purchase') AS hi_b,
        (SELECT sum_mid FROM agg WHERE g = 'purchase') AS summid_b,
        (SELECT CAST(CAST(CAST(n AS DECIMAL(38,0)) * sw2
                          - CAST(sw AS DECIMAL(38,0)) * sw AS VARCHAR)
                     AS DOUBLE) FROM agg WHERE g = 'purchase') AS ab_
    )
    SELECT n_a, n_b, h_a, h_b, lo_a, hi_a, lo_b, hi_b,
           summid_a, summid_b,
           CAST(floor(
             (CAST(summid_a AS DOUBLE) / h_a
              - CAST(summid_b AS DOUBLE) / h_b)
             / sqrt(aa / (CAST(n_a AS DOUBLE) * h_a * (h_a - 1))
                    + ab_ / (CAST(n_b AS DOUBLE) * h_b * (h_b - 1)))
             * 1000000 + 0.5) AS BIGINT) AS t_micros
    FROM ab
    """,
)
def q_yuen_trimmed_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's 20%-trimmed-mean test on click-vs-purchase values - order statistics and trimmed/winsorized moments all from the value dictionary (exact partial-tie handling), one fixed-order double t at the end."""
    e = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.col("event_type").alias("g"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
        )
    )
    d = e.groupBy("g", "v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wg = W.partitionBy("g").orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    c = d.select(
        "g",
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(wg), F.lit(0)).cast("long").alias("clt"),
    )
    nn = d.groupBy("g").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.expr("sum(cnt) div 5").cast("long").alias("gt"),
    )
    cj = c.join(F.broadcast(nn), "g")
    oshi = cj.groupBy("g").agg(
        F.min(
            F.when(
                F.col("clt") + F.col("cnt") >= F.col("gt") + 1, F.col("v")
            )
        ).cast("long").alias("lo"),
        F.min(
            F.when(
                F.col("clt") + F.col("cnt") >= F.col("n") - F.col("gt"),
                F.col("v"),
            )
        ).cast("long").alias("hi"),
    )
    wv = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    agg = (
        cj.join(F.broadcast(oshi), "g")
        .groupBy("g", "n", "gt", "lo", "hi")
        .agg(
            F.sum(
                F.col("v")
                * F.greatest(
                    F.lit(0),
                    F.least(
                        F.col("n") - F.col("gt"), F.col("clt") + F.col("cnt")
                    )
                    - F.greatest(F.col("gt"), F.col("clt")),
                )
            ).cast("long").alias("sum_mid"),
            F.sum(wv * F.col("cnt")).cast("long").alias("sw"),
            F.sum(
                wv.cast("decimal(38,0)") * wv * F.col("cnt")
            ).cast("decimal(38,0)").alias("sw2"),
        )
        .select(
            "g",
            "n",
            (F.col("n") - 2 * F.col("gt")).alias("h"),
            "lo",
            "hi",
            "sum_mid",
            (
                F.col("n").cast("decimal(38,0)") * F.col("sw2")
                - F.col("sw").cast("decimal(38,0)") * F.col("sw")
            ).cast("decimal(38,0)").cast("string").cast("double").alias("a"),
        )
    )
    a = agg.filter(F.col("g") == "click").select(
        F.col("n").alias("n_a"),
        F.col("h").alias("h_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
        F.col("sum_mid").alias("summid_a"),
        F.col("a").alias("aa"),
    )
    b = agg.filter(F.col("g") == "purchase").select(
        F.col("n").alias("n_b"),
        F.col("h").alias("h_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
        F.col("sum_mid").alias("summid_b"),
        F.col("a").alias("ab_"),
    )
    ab = a.crossJoin(F.broadcast(b))
    t = (
        (
            F.col("summid_a").cast("double") / F.col("h_a")
            - F.col("summid_b").cast("double") / F.col("h_b")
        )
        / F.sqrt(
            F.col("aa")
            / (F.col("n_a").cast("double") * F.col("h_a") * (F.col("h_a") - 1))
            + F.col("ab_")
            / (F.col("n_b").cast("double") * F.col("h_b") * (F.col("h_b") - 1))
        )
    )
    return ab.select(
        "n_a", "n_b", "h_a", "h_b", "lo_a", "hi_a", "lo_b", "hi_b",
        "summid_a", "summid_b",
        F.floor(t * 1000000 + 0.5).cast("long").alias("t_micros"),
    )


# ---------------------------------------------------------------------------
# Good-Turing smoothing (r12): the frequency-of-frequencies estimator
# every n-gram LM pipeline needs — for tokens seen r times, the
# discounted count r* = (r+1)·N_{r+1}/N_r where N_r = number of
# distinct tokens with frequency r. Everything is integer-exact off
# two dictionary aggregates (token counts → count-of-counts); r* and
# the probability mass emit as exact floor-scaled micros plus the raw
# integer numerators so downstream smoothers can keep exact rationals.
# The unseen-mass estimate P0 = N_1/N rides along. 100 TB: one token
# explode → two keyed aggregates, both dictionary-sized outputs.
# ---------------------------------------------------------------------------
@query(
    "good_turing_counts",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        AS t
      FROM documents
    ),
    tc AS (SELECT t, CAST(count(*) AS BIGINT) AS r FROM tok GROUP BY t),
    ff AS (
      SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tc GROUP BY r
    ),
    tot AS (
      SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
             CAST(sum(n_r) AS BIGINT) AS n_types
      FROM ff
    ),
    j AS (
      SELECT f.r, f.n_r, f2.n_r AS n_r1
      FROM ff f LEFT JOIN ff f2 ON f2.r = f.r + 1
    )
    SELECT j.r, j.n_r, coalesce(j.n_r1, 0) AS n_r_plus_1,
           CAST(CASE WHEN j.n_r1 IS NULL THEN NULL
                ELSE ((j.r + 1) * j.n_r1 * 1000000) // j.n_r END
                AS BIGINT) AS r_star_micros,
           CAST((j.r * j.n_r * 1000000) // t.n_tokens AS BIGINT)
             AS mass_micros
    FROM j CROSS JOIN tot t
    """,
)
def q_good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency-of-frequencies table over the document tokens - discounted count r* = (r+1)N_{r+1}/N_r and per-r probability mass as exact floor-scaled integers, two dictionary aggregates after one token explode."""
    from datalake_etlscripts_spark.operators.text import tokens

    d = read_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("t"))
    tc = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("r"))
    ff = tc.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    tot = ff.groupBy().agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens")
    )
    f2 = ff.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    j = ff.join(F.broadcast(f2), "r", "left")
    return j.crossJoin(F.broadcast(tot)).select(
        "r",
        "n_r",
        F.coalesce("n_r1", F.lit(0)).cast("long").alias("n_r_plus_1"),
        F.when(
            F.col("n_r1").isNotNull(),
            F.expr("((r + 1) * n_r1 * 1000000) div n_r"),
        ).cast("long").alias("r_star_micros"),
        F.expr("(r * n_r * 1000000) div n_tokens")
        .cast("long")
        .alias("mass_micros"),
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes shrinkage of per-(type, hour) purchase rates (r12):
# the beta-binomial method-of-moments prior fitted from the 120-cell
# rate table, each cell's rate shrunk toward the grand prior by its
# own sample size — the standard "small cells borrow strength" move
# behind every CTR/conversion dashboard. Cell counts are exact
# integers; the MoM moments fold as doubles IN CELL ORDER (the
# fixed-order policy), and each shrunken rate is one double
# expression both engines evaluate identically. Dictionary-bounded:
# the fact scan feeds a 120-row table.
# ---------------------------------------------------------------------------
@query(
    "eb_shrunken_rates",
    oracle="""
    WITH c AS (
      SELECT event_type AS g, CAST(hour(ts) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             list_reduce(list_prepend(0.0,
               list(CAST(x AS DOUBLE) / n ORDER BY g, h)),
               (a, b) -> a + b) AS s1,
             list_reduce(list_prepend(0.0,
               list((CAST(x AS DOUBLE) / n) * (CAST(x AS DOUBLE) / n)
                    ORDER BY g, h)),
               (a, b) -> a + b) AS s2
      FROM c
    ),
    pr AS (
      SELECT k, s1 / k AS mu,
             (s2 - s1 * (s1 / k)) / (k - 1) AS vr
      FROM mom
    ),
    ab AS (
      SELECT CASE WHEN vr > 0
                  THEN (mu * (1.0 - mu) / vr - 1.0) * mu
                  ELSE 1.0 END AS alpha,
             CASE WHEN vr > 0
                  THEN (mu * (1.0 - mu) / vr - 1.0) * (1.0 - mu)
                  ELSE 1.0 END AS beta
      FROM pr
    )
    SELECT c.g AS event_type, c.h AS hour, c.n, c.x,
           CAST(c.x AS DOUBLE) / c.n AS raw_rate,
           (c.x + ab.alpha) / (c.n + ab.alpha + ab.beta)
             AS shrunk_rate
    FROM c CROSS JOIN ab
    """,
)
def q_eb_shrunken_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-(type, hour) high-value rates - method-of-moments prior from the 120-cell table (fixed-order double fold), each cell shrunk by its own sample size."""
    e = read_table(spark, sf_dir, "events")
    c = e.groupBy(
        F.col("event_type").alias("g"),
        F.hour("ts").cast("long").alias("h"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") >= 100, 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    rate = F.col("x").cast("double") / F.col("n")
    mom = c.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col("g"), F.col("h"), rate.alias("t")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("s1"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("g"), F.col("h"), (rate * rate).alias("t"))
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("s2"),
    )
    pr = mom.select(
        "k",
        (F.col("s1") / F.col("k")).alias("mu"),
        (
            (F.col("s2") - F.col("s1") * (F.col("s1") / F.col("k")))
            / (F.col("k") - 1)
        ).alias("vr"),
    )
    ab = pr.select(
        F.when(
            F.col("vr") > 0,
            (F.col("mu") * (1.0 - F.col("mu")) / F.col("vr") - 1.0)
            * F.col("mu"),
        ).otherwise(F.lit(1.0)).alias("alpha"),
        F.when(
            F.col("vr") > 0,
            (F.col("mu") * (1.0 - F.col("mu")) / F.col("vr") - 1.0)
            * (1.0 - F.col("mu")),
        ).otherwise(F.lit(1.0)).alias("beta"),
    )
    return c.crossJoin(F.broadcast(ab)).select(
        F.col("g").alias("event_type"),
        F.col("h").alias("hour"),
        "n",
        "x",
        rate.alias("raw_rate"),
        (
            (F.col("x") + F.col("alpha"))
            / (F.col("n") + F.col("alpha") + F.col("beta"))
        ).alias("shrunk_rate"),
    )


# ---------------------------------------------------------------------------
# Turning-points randomness test (r12): counts local maxima/minima in
# the 168-hour series (strict triples — plateaus don't turn) and
# compares against the i.i.d. expectation E[T] = 2(n−2)/3 with
# Var[T] = (16n−29)/90 — the classical quick screen for serial
# structure before fitting any TS model. The count is one lag/lead
# window over the dense spine; the z-score is exact integers until
# one sqrt. Emitted: n, turning points, expectation numerators, and
# z in micros.
# ---------------------------------------------------------------------------
@query(
    "turning_points_test",
    oracle="""
    WITH b AS (SELECT min(date_trunc('hour', ts)) AS lo FROM events),
    hx AS (
      SELECT CAST(epoch(date_trunc('hour', ts))
                  - epoch((SELECT lo FROM b)) AS BIGINT) // 3600 AS idx,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    spine AS (SELECT unnest(range(0, 168)) AS idx),
    g AS (
      SELECT s.idx, CAST(coalesce(hx.c, 0) AS BIGINT) AS x
      FROM spine s LEFT JOIN hx ON hx.idx = s.idx
    ),
    w AS (
      SELECT idx, x,
             lag(x) OVER (ORDER BY idx) AS pv,
             lead(x) OVER (ORDER BY idx) AS nx
      FROM g
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
                       AND ((x > pv AND x > nx) OR (x < pv AND x < nx))
                      THEN 1 ELSE 0 END) AS BIGINT) AS tp
      FROM w
    )
    SELECT n, tp,
           CAST(2 * (n - 2) AS BIGINT) AS expect_x3,
           CAST(16 * n - 29 AS BIGINT) AS var_x90,
           CAST(floor(
             (CAST(3 * tp - 2 * (n - 2) AS DOUBLE) / 3.0)
             / sqrt(CAST(16 * n - 29 AS DOUBLE) / 90.0)
             * 1000000 + 0.5) AS BIGINT) AS z_micros
    FROM t
    """,
)
def q_turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points randomness test on the 168-hour series - strict local extrema via one lag/lead window, classical E=2(n-2)/3 and Var=(16n-29)/90, exact integers until the final z."""
    e = read_table(spark, sf_dir, "events")
    h = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lo = h.groupBy().agg(F.min("hr").alias("lo"))
    idx = h.crossJoin(F.broadcast(lo)).select(
        ((F.unix_timestamp("hr") - F.unix_timestamp("lo")) / 3600)
        .cast("long")
        .alias("idx"),
        "c",
    )
    spine = e.sparkSession.range(0, 168).select(F.col("id").alias("idx"))
    g = spine.join(idx, "idx", "left").select(
        "idx", F.coalesce("c", F.lit(0)).cast("long").alias("x")
    )
    wo = W.orderBy("idx")
    w = g.select(
        "x",
        F.lag("x").over(wo).alias("pv"),
        F.lead("x").over(wo).alias("nx"),
    )
    t = w.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("pv").isNotNull()
                & F.col("nx").isNotNull()
                & (
                    ((F.col("x") > F.col("pv")) & (F.col("x") > F.col("nx")))
                    | ((F.col("x") < F.col("pv")) & (F.col("x") < F.col("nx")))
                ),
                1,
            ).otherwise(0)
        ).cast("long").alias("tp"),
    )
    z = (
        (3 * F.col("tp") - 2 * (F.col("n") - 2)).cast("double") / 3.0
    ) / F.sqrt((16 * F.col("n") - 29).cast("double") / 90.0)
    return t.select(
        "n",
        "tp",
        (2 * (F.col("n") - 2)).cast("long").alias("expect_x3"),
        (16 * F.col("n") - 29).cast("long").alias("var_x90"),
        F.floor(z * 1000000 + 0.5).cast("long").alias("z_micros"),
    )


# ---------------------------------------------------------------------------
# Cramér's V association between event_type and day-of-week (r12):
# χ² with the expected counts cleared of denominators — each cell
# contributes (O·N − R·C)²/(N·R·C), an exact integer numerator over
# an exact integer denominator folded as doubles IN CELL ORDER, so
# χ² and V = sqrt(χ²/(N·min(r−1, c−1))) are fixed-order expressions
# both engines replay. The contingency table is |types|·7 = 35 cells.
# ---------------------------------------------------------------------------
@query(
    "cramers_v_type_dow",
    oracle="""
    WITH e AS (
      SELECT event_type AS g, CAST(dayofweek(ts) AS BIGINT) AS dw
      FROM events
    ),
    o AS (
      SELECT g, dw, CAST(count(*) AS BIGINT) AS obs FROM e GROUP BY 1, 2
    ),
    rr AS (SELECT g, CAST(sum(obs) AS BIGINT) AS r FROM o GROUP BY g),
    cc AS (SELECT dw, CAST(sum(obs) AS BIGINT) AS c FROM o GROUP BY dw),
    nn AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
                  CAST(count(DISTINCT g) AS BIGINT) AS kr,
                  CAST(count(DISTINCT dw) AS BIGINT) AS kc
           FROM o),
    chi AS (
      SELECT nn.n, nn.kr, nn.kc,
             list_reduce(list_prepend(0.0, list(
               CAST((o.obs * nn.n - rr.r * cc.c)
                    * (o.obs * nn.n - rr.r * cc.c) AS DOUBLE)
               / CAST(nn.n * rr.r * cc.c AS DOUBLE)
               ORDER BY o.g, o.dw)),
               (a, b) -> a + b) AS chi2
      FROM o JOIN rr USING (g) JOIN cc USING (dw) CROSS JOIN nn
      GROUP BY nn.n, nn.kr, nn.kc
    )
    SELECT n, kr AS n_types, kc AS n_dows,
           CAST(floor(chi2 * 1000000 + 0.5) AS BIGINT) AS chi2_micros,
           CAST(floor(sqrt(chi2 / (CAST(n AS DOUBLE)
                 * least(kr - 1, kc - 1))) * 1000000 + 0.5) AS BIGINT)
             AS v_micros
    FROM chi
    """,
)
def q_cramers_v_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V association between event type and day-of-week - chi-square with denominators cleared to exact integer cell numerators, 35-cell fixed-order double fold, one sqrt at the end."""
    e = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        (F.dayofweek("ts") - 1).cast("long").alias("dw0"),
    )
    # align with DuckDB dayofweek (Sun=0..6)
    o = e.groupBy("g", F.col("dw0").alias("dw")).agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    rr = o.groupBy("g").agg(F.sum("obs").cast("long").alias("r"))
    cc = o.groupBy("dw").agg(F.sum("obs").cast("long").alias("c"))
    nn = o.groupBy().agg(
        F.sum("obs").cast("long").alias("n"),
        F.countDistinct("g").cast("long").alias("kr"),
        F.countDistinct("dw").cast("long").alias("kc"),
    )
    cell = (
        o.join(F.broadcast(rr), "g")
        .join(F.broadcast(cc), "dw")
        .crossJoin(F.broadcast(nn))
    )
    num = F.col("obs") * F.col("n") - F.col("r") * F.col("c")
    term = (num * num).cast("double") / (
        F.col("n") * F.col("r") * F.col("c")
    ).cast("double")
    chi = cell.groupBy("n", "kr", "kc").agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("g"), F.col("dw"), term.alias("t"))
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("chi2")
    )
    return chi.select(
        "n",
        F.col("kr").alias("n_types"),
        F.col("kc").alias("n_dows"),
        F.floor(F.col("chi2") * 1000000 + 0.5).cast("long").alias(
            "chi2_micros"
        ),
        F.floor(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n").cast("double")
                    * F.least(F.col("kr") - 1, F.col("kc") - 1)
                )
            )
            * 1000000
            + 0.5
        ).cast("long").alias("v_micros"),
    )


# ---------------------------------------------------------------------------
# Mean-excess table (r12): the peaks-over-threshold diagnostic from
# extreme-value theory — for thresholds at the empirical 90/95/99th
# percentiles of event values, the count of exceedances and their
# mean excess E[X − u | X > u]. A linearly increasing mean-excess
# function signals a heavy (Pareto-type) tail; this table is what an
# analyst plots before fitting any GPD. EXACT: thresholds are order
# statistics off the cents dictionary (cumulative-rank arithmetic, no
# fact sort), excess sums are integer cents, one division per row.
# ---------------------------------------------------------------------------
@query(
    "mean_excess_table",
    oracle="""
    WITH e AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events
    ),
    d AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY v),
    c AS (
      SELECT v, cnt,
             CAST(coalesce(sum(cnt) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS clt
      FROM d
    ),
    nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM d),
    q AS (SELECT unnest([90, 95, 99]) AS pct),
    th AS (
      SELECT q.pct,
             CAST(min(CASE WHEN (c.clt + c.cnt) * 100 >= q.pct * nn.n
                      THEN c.v END) AS BIGINT) AS u
      FROM c CROSS JOIN nn CROSS JOIN q
      GROUP BY q.pct
    ),
    ex AS (
      SELECT th.pct, th.u,
             CAST(sum(CASE WHEN c.v > th.u THEN c.cnt ELSE 0 END)
                  AS BIGINT) AS n_exceed,
             CAST(sum(CASE WHEN c.v > th.u
                      THEN (c.v - th.u) * c.cnt ELSE 0 END)
                  AS BIGINT) AS sum_excess
      FROM c CROSS JOIN th GROUP BY th.pct, th.u
    )
    SELECT pct, u AS threshold_cents, n_exceed, sum_excess,
           CAST(CASE WHEN n_exceed = 0 THEN 0
                ELSE (sum_excess * 1000000) // n_exceed END AS BIGINT)
             AS mean_excess_micros
    FROM ex
    """,
)
def q_mean_excess_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold mean-excess table at the 90/95/99th percentiles - order-statistic thresholds off the cents dictionary, exact integer excess sums, the EVT heavy-tail diagnostic."""
    e = read_table(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v")
    )
    d = e.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    c = d.select(
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0)).cast("long").alias("clt"),
    )
    nn = d.groupBy().agg(F.sum("cnt").cast("long").alias("n"))
    q = e.sparkSession.createDataFrame([(90,), (95,), (99,)], "pct bigint")
    th = (
        c.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(q))
        .groupBy("pct")
        .agg(
            F.min(
                F.when(
                    (F.col("clt") + F.col("cnt")) * 100
                    >= F.col("pct") * F.col("n"),
                    F.col("v"),
                )
            ).cast("long").alias("u")
        )
    )
    ex = (
        c.crossJoin(F.broadcast(th))
        .groupBy("pct", "u")
        .agg(
            F.sum(
                F.when(F.col("v") > F.col("u"), F.col("cnt")).otherwise(0)
            ).cast("long").alias("n_exceed"),
            F.sum(
                F.when(
                    F.col("v") > F.col("u"),
                    (F.col("v") - F.col("u")) * F.col("cnt"),
                ).otherwise(0)
            ).cast("long").alias("sum_excess"),
        )
    )
    return ex.select(
        "pct",
        F.col("u").alias("threshold_cents"),
        "n_exceed",
        "sum_excess",
        F.when(F.col("n_exceed") == 0, F.lit(0))
        .otherwise(F.expr("(sum_excess * 1000000) div n_exceed"))
        .cast("long")
        .alias("mean_excess_micros"),
    )


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample drift test ('click' vs 'purchase'
# event values, r13): the distribution-shift detector a feature
# pipeline runs between serving windows. D = max |ECDF_a - ECDF_b| is
# computed WITHOUT a single division: per distinct cents value the
# inclusive cumulative counts ca, cb give the exact integer
# |ca·NB - cb·NA|, maximized over the value dictionary (bounded by
# the 2-decimal domain, never the fact count). The α=0.05 decision
# c(α)=1.358 is an exact integer comparison on the floored d_micros
# (both engines compare identical integers, so the boundary is
# deterministic). DECIMAL(38,0) carriers keep the NA·NB product exact
# past int64 (ADVICE r06 pattern). 100 TB: one fact aggregate → one
# dictionary window → 1-row result.
# ---------------------------------------------------------------------------
@query(
    "ks_two_sample_drift",
    oracle="""
    WITH e AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    d AS (
      SELECT v, CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
      FROM e GROUP BY v
    ),
    c AS (
      SELECT v, sum(na) OVER w AS ca, sum(nb) OVER w AS cb
      FROM d WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
    ),
    t AS (SELECT sum(na) AS n_a, sum(nb) AS n_b FROM d),
    m AS (
      SELECT t.n_a, t.n_b,
             max(abs(CAST(c.ca AS DECIMAL(38,0)) * t.n_b
                     - CAST(c.cb AS DECIMAL(38,0)) * t.n_a)) AS dnum
      FROM c CROSS JOIN t GROUP BY t.n_a, t.n_b
    )
    -- // on DECIMAL routes through double in DuckDB; HUGEINT keeps
    -- the quotient exact-integer like Spark's decimal `div`. The
    -- n_a/n_b > 0 guard keeps an empty arm from dividing by zero
    -- DIFFERENTLY per engine (DuckDB errors, Spark yields NULL).
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(dnum AS BIGINT) AS d_num,
           CAST(CAST(dnum AS HUGEINT) * 1000000
                // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
             AS d_micros,
           CAST(CASE WHEN
             (CAST(dnum AS HUGEINT) * 1000000
              // (CAST(n_a AS HUGEINT) * n_b))
             * (CAST(dnum AS HUGEINT) * 1000000
                // (CAST(n_a AS HUGEINT) * n_b))
             * n_a * n_b
             > CAST(1844164000000 AS HUGEINT) * (n_a + n_b)
             THEN 1 ELSE 0 END AS INT) AS reject_05
    FROM m WHERE n_a > 0 AND n_b > 0
    """,
)
def q_ks_two_sample_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov two-sample drift test on click-vs-purchase event values - exact integer sup-distance over the cents dictionary (no division until the floored d_micros readout), alpha=0.05 decision as an exact integer comparison."""
    e = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("b"),
        )
    )
    # the cents dictionary feeds BOTH the cumulative window and the
    # totals row — settle it so the fact table is scanned once
    d = (
        e.groupBy("v")
        .agg(
            F.sum("a").cast("long").alias("na"),
            F.sum("b").cast("long").alias("nb"),
        )
        .localCheckpoint(eager=False)
    )
    # dictionary-sized window (distinct cents, bounded by the domain)
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    c = d.select(
        "v",
        F.sum("na").over(wv).alias("ca"),
        F.sum("nb").over(wv).alias("cb"),
    )
    t = d.agg(
        F.sum("na").cast("long").alias("n_a"),
        F.sum("nb").cast("long").alias("n_b"),
    )
    m = (
        c.crossJoin(F.broadcast(t))  # 1-row scalar attach
        .groupBy("n_a", "n_b")
        .agg(
            F.max(
                F.abs(
                    F.col("ca").cast("decimal(38,0)") * F.col("n_b")
                    - F.col("cb").cast("decimal(38,0)") * F.col("n_a")
                )
            ).alias("dnum")
        )
    )
    d_micros = F.expr(
        "dnum * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
    )
    # empty-arm guard: keeps the division from going NULL here while
    # the oracle's HUGEINT division would error — engines must agree
    m = m.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    return m.select(
        "n_a",
        "n_b",
        F.col("dnum").cast("long").alias("d_num"),
        d_micros.cast("long").alias("d_micros"),
        F.when(
            d_micros.cast("decimal(38,0)") * d_micros * F.col("n_a")
            * F.col("n_b")
            > F.lit(1844164000000).cast("decimal(38,0)")
            * (F.col("n_a") + F.col("n_b")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("reject_05"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (quantity vs discount over lineitem,
# r13): the tie-heavy rank correlation a feature store audits between
# numeric columns. Average ranks are computed on the MARGINAL
# dictionaries in closed form (2·avg_rank = 2·c_lt + n_v + 1 stays
# integral), joined onto the JOINT dictionary (|qty|×|disc| ≤ ~550
# cells regardless of fact count), and the Pearson moments of the
# doubled ranks accumulate as DECIMAL(38,0) — products reach 4n³, far
# past int64 at scale. One double expression at the end, written in
# the identical fixed order in both engines. 100 TB: one fact
# aggregate to the joint dictionary; every window is dictionary-sized.
# ---------------------------------------------------------------------------
@query(
    "spearman_rho",
    oracle="""
    WITH f AS (
      SELECT CAST(l_quantity AS BIGINT) AS qx,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS qy
      FROM lineitem
    ),
    j AS (SELECT qx, qy, CAST(count(*) AS BIGINT) AS cnt FROM f GROUP BY 1, 2),
    mx AS (
      SELECT qx, 2 * coalesce(sum(nx) OVER (ORDER BY qx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + nx + 1 AS rx2
      FROM (SELECT qx, sum(cnt) AS nx FROM j GROUP BY 1) t
    ),
    my AS (
      SELECT qy, 2 * coalesce(sum(ny) OVER (ORDER BY qy
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + ny + 1 AS ry2
      FROM (SELECT qy, sum(cnt) AS ny FROM j GROUP BY 1) t
    ),
    m AS (
      SELECT CAST(sum(cnt) AS DECIMAL(38,0)) AS n,
             sum(CAST(cnt AS DECIMAL(38,0)) * rx2) AS sx,
             sum(CAST(cnt AS DECIMAL(38,0)) * ry2) AS sy,
             sum(CAST(cnt AS DECIMAL(38,0)) * rx2 * rx2) AS sxx,
             sum(CAST(cnt AS DECIMAL(38,0)) * ry2 * ry2) AS syy,
             sum(CAST(cnt AS DECIMAL(38,0)) * rx2 * ry2) AS sxy
      FROM j JOIN mx USING (qx) JOIN my USING (qy)
    )
    -- a constant variable zeroes its variance: NULL rho in BOTH
    -- engines rather than a 0/0 NaN that casts differently
    SELECT CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                THEN NULL
                ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                  * 1000000 + 0.5) END AS BIGINT) AS rho_micros
    FROM m
    """,
)
def q_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between lineitem quantity and discount - tie-averaged ranks in closed form on the marginal dictionaries (2x rank stays integral), exact DECIMAL moments on the joint dictionary, one fixed-order double expression at the end."""
    f = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qx"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("qy"),
    )
    # the joint dictionary feeds BOTH marginals and the moment join —
    # settle it so the fact table is scanned once, not three times
    j = (
        f.groupBy("qx", "qy")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    wx = W.orderBy("qx").rowsBetween(W.unboundedPreceding, -1)
    mx = (
        j.groupBy("qx")
        .agg(F.sum("cnt").alias("nx"))
        .select(
            "qx",
            (
                2 * F.coalesce(F.sum("nx").over(wx), F.lit(0))
                + F.col("nx")
                + 1
            ).alias("rx2"),
        )
    )
    wy = W.orderBy("qy").rowsBetween(W.unboundedPreceding, -1)
    my = (
        j.groupBy("qy")
        .agg(F.sum("cnt").alias("ny"))
        .select(
            "qy",
            (
                2 * F.coalesce(F.sum("ny").over(wy), F.lit(0))
                + F.col("ny")
                + 1
            ).alias("ry2"),
        )
    )
    cnt_d = F.col("cnt").cast("decimal(38,0)")
    m = (
        j.join(F.broadcast(mx), "qx")
        .join(F.broadcast(my), "qy")
        .agg(
            F.sum(cnt_d).alias("n"),
            F.sum(cnt_d * F.col("rx2")).alias("sx"),
            F.sum(cnt_d * F.col("ry2")).alias("sy"),
            F.sum(cnt_d * F.col("rx2") * F.col("rx2")).alias("sxx"),
            F.sum(cnt_d * F.col("ry2") * F.col("ry2")).alias("syy"),
            F.sum(cnt_d * F.col("rx2") * F.col("ry2")).alias("sxy"),
        )
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    rho = F.floor(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double")))
        * 1000000
        + 0.5
    )
    # a constant variable zeroes its variance: NULL rho in BOTH
    # engines rather than a 0/0 NaN that casts differently
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.when((varx == 0) | (vary == 0), F.lit(None))
        .otherwise(rho)
        .cast("long")
        .alias("rho_micros"),
    )


# ---------------------------------------------------------------------------
# CUSUM drift alarm over per-type daily revenue (r13): the classic
# one-sided mean-shift detector (g_t = max(0, g_{t-1} + x_t - ref - k))
# run as an EXACT INTEGER fold over each event type's day-ordered
# revenue series — reference level ref = month mean (exact long div),
# slack k = ref/20, alarm threshold h = ref. The recurrence rides the
# nested-fold lane: per-type array fold, state = [g, max_g, n_alarms,
# first_alarm_day, day_idx], bit-identical in DuckDB's list_reduce.
# Per-key parallel — a million monitored series fold independently
# after one (type, day) aggregate. 100 TB: one keyed aggregate, one
# 31-element fold per key, no fact-sized sort.
# ---------------------------------------------------------------------------
@query(
    "cusum_drift_alarm",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(date_part('day', ts) AS BIGINT) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             list(x ORDER BY day) AS xs,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) // count(*) AS BIGINT) AS ref
      FROM d GROUP BY 1
    ),
    r AS (
      SELECT event_type, n_days, ref,
             list_reduce(
               list_prepend(
                 [CAST(0 AS BIGINT), 0, 0, 0, 0],
                 list_transform(xs, x -> [x, 0, 0, 0, 0])),
               (acc, xx) -> [
                 greatest(CAST(0 AS BIGINT),
                          acc[1] + xx[1] - ref - ref // 20),
                 greatest(acc[2],
                          greatest(CAST(0 AS BIGINT),
                                   acc[1] + xx[1] - ref - ref // 20)),
                 acc[3] + CASE WHEN greatest(CAST(0 AS BIGINT),
                     acc[1] + xx[1] - ref - ref // 20) > ref
                   THEN 1 ELSE 0 END,
                 CASE WHEN acc[4] = 0 AND greatest(CAST(0 AS BIGINT),
                     acc[1] + xx[1] - ref - ref // 20) > ref
                   THEN acc[5] + 1 ELSE acc[4] END,
                 acc[5] + 1
               ]) AS st
      FROM s
    )
    SELECT event_type, n_days, ref AS ref_cents,
           CAST(st[2] AS BIGINT) AS max_g,
           CAST(st[3] AS BIGINT) AS n_alarms,
           CAST(st[4] AS BIGINT) AS first_alarm_day
    FROM r
    """,
)
def q_cusum_drift_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift alarm per event type over day-ordered daily revenue - exact integer fold (slack ref/20, threshold ref), state carries running g, max, alarm count and first alarm day; per-key parallel after one (type, day) aggregate."""
    e = read_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.dayofmonth("ts").cast("long").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("x")
    )
    s = d.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda t: t["x"],
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        # nonneg precondition: Spark `div` truncates toward zero while
        # DuckDB `//` floors, so a NEGATIVE revenue sum would divide
        # differently — event values are nonnegative by the data
        # contract (same precondition as the shifted-coordinate geo
        # divisions), making the two identical here
        F.expr("sum(x) div count(*)").cast("long").alias("ref"),
    )
    zero = F.lit(0).cast("long")
    ref = F.col("ref")
    slack = F.expr("ref div 20")

    def step(acc, x):
        g = F.greatest(zero, F.element_at(acc, 1) + x - ref - slack)
        return F.array(
            g,
            F.greatest(F.element_at(acc, 2), g),
            F.element_at(acc, 3)
            + F.when(g > ref, F.lit(1).cast("long")).otherwise(zero),
            F.when(
                (F.element_at(acc, 4) == 0) & (g > ref),
                F.element_at(acc, 5) + 1,
            ).otherwise(F.element_at(acc, 4)),
            F.element_at(acc, 5) + 1,
        )

    st = F.aggregate(
        F.col("xs"), F.array(zero, zero, zero, zero, zero), step
    )
    return s.select(
        "event_type",
        "n_days",
        ref.alias("ref_cents"),
        F.element_at(st, 2).cast("long").alias("max_g"),
        F.element_at(st, 3).cast("long").alias("n_alarms"),
        F.element_at(st, 4).cast("long").alias("first_alarm_day"),
    )
