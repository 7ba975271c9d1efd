"""Data-quality expectations — the reference's ``checking/`` audits
(check_unique_place_id.py:48-61, check_versions_completness.py:71-117,
fix_contracter_ids.py:69-88) generalized into a declarative rules
engine (Delta-expectations style).

Three primitives, each returning (rule, n_violations) rows:

  row_rules     per-row boolean predicates — ALL rules evaluated in
                ONE scan as conditional sums (map-side combined;
                adding a rule adds zero passes over the data)
  unique_rule   key-uniqueness via one groupBy (violations = rows in
                excess of one per key)
  fk_rule       referential integrity via left-anti join (orphans);
                broadcast the parent when it is dimension-sized

At 100 TB the row_rules pass piggybacks on any existing scan and the
two aggregate rules shuffle only their key columns (column-pruned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCHEMA = ["rule", "n_violations"]


def row_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """``rules``: name → boolean Column, True = row passes. One scan,
    one 1-row aggregate, unpivoted to (rule, n_violations)."""
    aggs = [
        F.sum(F.when(~cond, 1).otherwise(0)).cast("bigint").alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    stack_args: list[Column] = []
    for name in rules:
        stack_args += [F.lit(name), F.col(name)]
    return wide.select(
        F.stack(F.lit(len(rules)), *stack_args).alias("rule", "n_violations")
    )


def unique_rule(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Violations = rows beyond the first per key (0 when unique)."""
    name = name or f"unique_{'_'.join(cols)}"
    excess = (
        df.groupBy(*cols)
        .agg((F.count(F.lit(1)) - 1).alias("_extra"))
        .agg(F.coalesce(F.sum("_extra"), F.lit(0)).cast("bigint").alias("n"))
    )
    return excess.select(F.lit(name).alias("rule"), F.col("n").alias("n_violations"))


def fk_rule(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str | None = None,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Violations = child rows whose key has no parent (orphans)."""
    name = name or f"fk_{child_key}"
    p = parent.select(F.col(parent_key).alias(child_key)).dropDuplicates()
    if broadcast_parent:
        p = F.broadcast(p)
    orphans = child.select(child_key).join(p, child_key, "left_anti")
    return orphans.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_violations")
    ).select(F.lit(name).alias("rule"), "n_violations")


def run_expectations(*checks: DataFrame) -> DataFrame:
    """Union any number of rule results into one report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile — (column, n_rows, n_nulls, n_distinct) — in
    the fewest scans Spark allows: all per-column counts are
    expressions of ONE aggregate (multiple exact count-distincts expand
    the input ×columns — the standard profiling cost, linear not
    quadratic, and map-side partial-combined), then the single result
    row unpivots driver-side (it is one row; no data-sized collect).
    The discovery half of the expectations engine: run it first, write
    rules from what it reports."""
    cols = cols or df.columns
    # ONE shared row count; per-column aggregates aliased by INDEX so
    # arbitrary column names (spaces, dashes, quotes) never reach the
    # generated stack() SQL as identifiers; the display name rides as
    # an escaped string literal. Null counts coalesce to 0 so an empty
    # table profiles as (0, 0, 0), not (0, NULL, 0).
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"__nulls_{i}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{i}"),
        ]
    row = df.agg(*aggs)
    stacked = row.select(
        F.expr(
            "stack({n}, {args}) as (column, n_rows, n_nulls, n_distinct)".format(
                n=len(cols),
                args=", ".join(
                    "'{lit}', __n, __nulls_{i}, __dist_{i}".format(
                        lit=c.replace("\\", "\\\\").replace("'", "\\'"), i=i
                    )
                    for i, c in enumerate(cols)
                ),
            )
        )
    )
    return stacked


def pearson_matrix(df: DataFrame, cols: list[str], scale: int = 4) -> DataFrame:
    """Pairwise Pearson correlations for ``cols`` from ONE aggregate:
    every moment (n, Σx, Σx², Σxy) is summed in DECIMAL — exact and
    partition-order-independent — then each exact sum is cast to
    double ONCE and the correlations combine those doubles in a fixed
    expression order, so the result is bit-identical on any engine
    replaying the same sums (the value_trend_per_type policy applied
    to second moments).

    One full scan, no shuffle beyond the single global aggregate.
    Rows with a NULL in ANY of ``cols`` are dropped first (listwise
    deletion) — mixing count(*) with NULL-skipping sums would
    otherwise produce silently wrong correlations on incomplete data.
    Output: one row with n plus corr_<a>_<b> per unordered pair;
    constant columns yield NULL (try_divide by zero variance).
    """
    df = df.na.drop(subset=cols)
    # decimal(12,s): physical int64 in DuckDB, so pairwise products
    # widen to decimal(25,2s) (int128) without overflow — the money()
    # pattern from plans/relational.py applied to second moments
    dec = f"decimal(12,{scale})"
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(dec)).alias(f"s_{c}"))
        aggs.append(
            F.sum(F.col(c).cast(dec) * F.col(c).cast(dec)).alias(f"ss_{c}")
        )
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast(dec) * F.col(b).cast(dec)).alias(f"sp_{a}_{b}")
            )
    m = df.agg(*aggs)
    out = [F.col("n")]
    n = F.col("n").cast("double")
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
            ssa, ssb = F.col(f"ss_{a}").cast("double"), F.col(f"ss_{b}").cast("double")
            sp = F.col(f"sp_{a}_{b}").cast("double")
            cov = n * sp - sa * sb
            va = n * ssa - sa * sa
            vb = n * ssb - sb * sb
            out.append(
                F.try_divide(cov, F.sqrt(va) * F.sqrt(vb)).alias(f"corr_{a}_{b}")
            )
    return m.select(*out)


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """k-anonymity audit over the quasi-identifier combination: a
    release is k-anonymous when every quasi-id group holds >= k rows
    (Sweeney 2002). The pre-release privacy gate for any dataset with
    person-level rows — the reference exposes raw NIF/company ids
    (parse_bsc_companies.py), which is exactly the re-identification
    surface this audits.

    One grouping shuffle + a 1-row summary: (k, n_rows, n_groups,
    n_risky_groups, n_risky_rows, min_group_size, anonymous). Risky =
    group size < k; risky ROWS are the re-identifiable population.
    Group details stay distributed — only the summary reaches the
    driver/output (publishing the risky groups themselves would leak
    the very quasi-ids under audit).
    """
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    return sizes.agg(
        F.lit(k).alias("k"),
        F.coalesce(F.sum("_n"), F.lit(0)).alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(
            F.sum(F.when(F.col("_n") < k, 1)), F.lit(0)
        ).cast("bigint").alias("n_risky_groups"),
        F.coalesce(
            F.sum(F.when(F.col("_n") < k, F.col("_n"))), F.lit(0)
        ).cast("bigint").alias("n_risky_rows"),
        F.min("_n").alias("min_group_size"),
        # empty input is vacuously anonymous (min over zero groups is
        # NULL — without the coalesce the gate would return NULL and a
        # boolean consumer would silently skip the check)
        F.coalesce(F.min("_n") >= k, F.lit(True)).alias("anonymous"),
    )


def l_diversity(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 2
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007), the
    homogeneity-attack complement to k_anonymity: a quasi-id group
    with enough rows but only ONE sensitive value still reveals that
    value for everyone in it. Requires >= l DISTINCT sensitive values
    per quasi-id group.

    One grouping shuffle (exact countDistinct per group) + a 1-row
    summary: (l, n_groups, n_risky_groups, n_risky_rows,
    min_distinct_sensitive, diverse). Same publication policy as
    k_anonymity: group details never leave the executors.
    """
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(sensitive_col).alias("_d"),
    )
    return groups.agg(
        F.lit(l).alias("l"),
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(F.sum(F.when(F.col("_d") < l, 1)), F.lit(0))
        .cast("bigint")
        .alias("n_risky_groups"),
        F.coalesce(F.sum(F.when(F.col("_d") < l, F.col("_n"))), F.lit(0))
        .cast("bigint")
        .alias("n_risky_rows"),
        F.min("_d").alias("min_distinct_sensitive"),
        F.coalesce(F.min("_d") >= l, F.lit(True)).alias("diverse"),
    )


def t_closeness(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, t: float = 0.2
) -> DataFrame:
    """t-closeness audit (Li et al. 2007), the distribution-skew
    complement to k_anonymity/l_diversity: a quasi-id group can be
    large AND diverse yet still leak — if its sensitive-value
    DISTRIBUTION sits far from the global one (e.g. a group that is
    90% lowest-income band). Requires ordered-EMD(group, global) <= t
    for every quasi-id group; ``sensitive_col`` must be an ordinal
    integer (a band/bucket).

    Ordered EMD = (1/(m-1)) * Σ_j |Σ_{i<=j} (p_i - q_i)| over the m
    global sensitive values in value order. Computed EXACTLY in
    integers: scaling by N_g*N turns every cumulative term into
    Σ(n_i*N - m_i*N_g) — products in DECIMAL(38,0), one double
    division per group at the very end (the engine's determinism
    policy: no double summation anywhere).

    Plan: global value dim (m rows, broadcast) × the group table,
    left-joined with per-(group, value) counts; the cumulative window
    partitions per GROUP over m rows — never a corpus-scale
    partition. Output is the usual 1-row summary (t, n_groups,
    n_risky_groups, n_risky_rows, max_emd, close); per-group EMDs
    stay distributed (publishing the worst groups would leak the
    quasi-ids under audit).
    """
    from pyspark.sql import Window

    glob = df.groupBy(F.col(sensitive_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_m")
    )
    tot = glob.agg(
        F.sum("_m").cast("bigint").alias("_tN"),
        F.count(F.lit(1)).alias("_nv"),
    )
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_ng"))
    gc = df.groupBy(*quasi_cols, F.col(sensitive_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    grid = (
        groups.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(gc, [*quasi_cols, "_v"], "left")
        .withColumn("_n", F.coalesce(F.col("_n"), F.lit(0)))
    )
    term = (
        F.col("_n").cast("decimal(19,0)") * F.col("_tN").cast("decimal(19,0)")
        - F.col("_m").cast("decimal(19,0)") * F.col("_ng").cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("_d", F.sum(term).over(w))
    per = cum.groupBy(*quasi_cols, "_ng", "_tN", "_nv").agg(
        F.sum(F.abs(F.col("_d"))).cast("decimal(38,0)").alias("_sumabs")
    )
    den = (
        F.col("_ng").cast("decimal(19,0)")
        * F.col("_tN").cast("decimal(19,0)")
        * (F.col("_nv") - 1).cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    scored = per.withColumn(
        "_emd",
        F.when(F.col("_nv") <= 1, F.lit(0.0)).otherwise(
            F.col("_sumabs").cast("double") / den.cast("double")
        ),
    )
    return scored.agg(
        F.lit(t).alias("t"),
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(F.sum(F.when(F.col("_emd") > t, 1)), F.lit(0))
        .cast("bigint")
        .alias("n_risky_groups"),
        F.coalesce(F.sum(F.when(F.col("_emd") > t, F.col("_ng"))), F.lit(0))
        .cast("bigint")
        .alias("n_risky_rows"),
        F.max("_emd").alias("max_emd"),
        F.coalesce(F.max("_emd") <= t, F.lit(True)).alias("close"),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon_inv: int = 1,
    n_levels: int = 1024,
    seed: str = "dp1",
) -> DataFrame:
    """ε-differentially-private count release (discrete / two-sided
    geometric mechanism, Ghosh-Roughgarden-Sundararajan 2012) — the
    RELEASE half of the privacy family: the audits
    (k_anonymity/l_diversity/t_closeness) say whether raw groups are
    publishable; this publishes counts that are safe regardless, with
    noise = G₁ − G₂ for two geometrics P(G=g) ∝ e^(−εg), the discrete
    Laplace that ε-DP count queries require (sensitivity 1). ε =
    1/``epsilon_inv``.

    Noise is deterministic and engine-portable (the Gumbel-resample
    scheme): each group's two md5-uniform lanes quantize to
    ``n_levels`` levels whose geometric values floor(−ln(u)/ε) are
    fixed to integers ON THE DRIVER (same-host-libm ln, the documented
    boundary) and broadcast back as a lookup dim — quantization floors
    the tail at −ln(1/(2·n_levels))/ε ≈ 7.6·epsilon_inv, a documented
    truncation, not a bias in the bulk. Seeded determinism is the
    test/replay mode; a production release would draw the two lanes
    from a real entropy source (determinism here is for the oracle,
    not a DP claim about adversarial seeds).

    One grouping shuffle + two broadcast joins; group keys never leave
    the executors unaggregated. Returns (*group_cols, noisy_count).
    """
    import math

    from datalake_etlscripts_spark.functions.scalar import md5_hash32

    spark = df.sparkSession
    levels = [
        (
            lv,
            int(
                math.floor(
                    -math.log((lv + 0.5) / n_levels) * epsilon_inv
                )
            ),
        )
        for lv in range(n_levels)
    ]
    gdim = spark.createDataFrame(levels, "lvl bigint, geo bigint")
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])
    keyed = counts.withColumn(
        "_lv1", md5_hash32(F.concat(F.lit(seed + "a"), key)) % n_levels
    ).withColumn("_lv2", md5_hash32(F.concat(F.lit(seed + "b"), key)) % n_levels)
    g1 = gdim.select(F.col("lvl").alias("_lv1"), F.col("geo").alias("_g1"))
    g2 = gdim.select(F.col("lvl").alias("_lv2"), F.col("geo").alias("_g2"))
    return (
        keyed.join(F.broadcast(g1), "_lv1")
        .join(F.broadcast(g2), "_lv2")
        .select(
            *group_cols,
            (F.col("_n") + F.col("_g1") - F.col("_g2")).alias("noisy_count"),
        )
    )


def rank_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank identity — the
    classifier-evaluation metric computed at corpus scale without a
    global sort: group by DISTINCT score, order the (score, n_pos,
    n_neg) grid ascending, and

        U₂ = Σ_s p_s · (2·cumneg_<s + q_s),   AUC = U₂ / (2·P·Q)

    (the 2× scaling makes the tie term n_neg_s/2 integral, so U₂ is an
    exact BIGINT and AUC is ONE double division of exact integers).

    The ordered window runs over the distinct-SCORE grid — use integer
    or quantized scores so the grid is dictionary-sized (token counts,
    micro-nat margins, deciles), the same boundedness contract as the
    quantized KS. Returns one row (n_pos, n_neg, u2, auc); AUC is NULL
    for degenerate inputs (all-positive or all-negative)."""
    from pyspark.sql import Window

    g = df.select(
        F.col(score_col).alias("_s"), F.col(label_col).cast("int").alias("_y")
    )
    grid = g.groupBy("_s").agg(
        F.sum("_y").cast("long").alias("_p"),
        F.sum(1 - F.col("_y")).cast("long").alias("_q"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    cum = grid.withColumn(
        "_cq", F.coalesce(F.sum("_q").over(w), F.lit(0).cast("long"))
    )
    agg = cum.agg(
        F.sum("_p").cast("long").alias("n_pos"),
        F.sum("_q").cast("long").alias("n_neg"),
        F.sum(F.col("_p") * (2 * F.col("_cq") + F.col("_q")))
        .cast("long")
        .alias("u2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "u2",
        (
            F.col("u2").cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


def average_precision(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """EXACT average precision (the PR-curve area, sklearn's
    step-integration definition) without a global sort:

        AP = Σ_s  (p_s / P) · TP_s / (TP_s + FP_s)

    over the distinct-score grid in DESCENDING score order, where
    TP_s/FP_s are cumulative positives/negatives at threshold s. Every
    count is an exact BIGINT; each precision term is one fixed-order
    double expression; the terms fold in GRID ORDER (sorted collected
    array, dictionary-sized by the quantized-score contract — the
    distribution_drift policy), so the sum is
    partitioning-deterministic. Returns one row
    (n_pos, n_neg, ap)."""
    from pyspark.sql import Window

    g = df.select(
        F.col(score_col).alias("_s"), F.col(label_col).cast("int").alias("_y")
    )
    grid = g.groupBy("_s").agg(
        F.sum("_y").cast("long").alias("_p"),
        F.sum(1 - F.col("_y")).cast("long").alias("_q"),
    )
    w = Window.orderBy(F.col("_s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grid.withColumn("_tp", F.sum("_p").over(w).cast("long")).withColumn(
        "_fp", F.sum("_q").over(w).cast("long")
    )
    v = (F.col("_p").cast("double") * F.col("_tp").cast("double")) / (
        F.col("_tp") + F.col("_fp")
    ).cast("double")
    agg = cum.select(
        F.struct(F.col("_s").alias("k"), v.alias("v")).alias("_st"),
        "_p",
        "_q",
    ).agg(
        F.collect_list("_st").alias("_arr"),
        F.sum("_p").cast("long").alias("n_pos"),
        F.sum("_q").cast("long").alias("n_neg"),
    )
    total = F.aggregate(
        F.reverse(F.sort_array(F.col("_arr"))),
        F.lit(0.0),
        lambda acc, x: acc + x["v"],
    )
    return agg.select(
        "n_pos",
        "n_neg",
        (total / F.col("n_pos").cast("double")).alias("ap"),
    )


def calibration_table(
    df: DataFrame,
    p_micro_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reliability diagram + per-bin Brier score for a probabilistic
    classifier, computed entirely from exact integers: predictions
    arrive as micro-probabilities (BIGINT in [0, scale]), bins are the
    equal-width ladder, and per bin

        avg_pred = Σp / (n·scale),  frac_pos = Σy / n,
        brier    = Σ(p − y·scale)² / (n·scale²)

    with the squared sums in DECIMAL(38,0) (n·scale² exceeds BIGINT at
    corpus n). One groupBy shuffle over ≤ n_bins groups; each output
    double is one fixed-order division chain. The calibration gap
    (avg_pred − frac_pos) per bin is the model-audit signal."""
    width = scale // n_bins
    g = df.select(
        F.least(F.col(p_micro_col), F.lit(scale - 1))
        .cast("long")
        .alias("_p"),
        F.col(label_col).cast("int").cast("long").alias("_y"),
    ).withColumn("bin", F.expr(f"_p div {width}"))
    sq = (F.col("_p") - F.col("_y") * F.lit(scale)).cast("decimal(19,0)")
    agg = g.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_p").cast("decimal(38,0)").alias("_sp"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum(sq * sq).alias("_sq"),
    )
    n_d = F.col("n").cast("double")
    return agg.select(
        "bin",
        "n",
        "n_pos",
        (
            (F.col("_sp").cast("string").cast("double") / n_d)
            / F.lit(float(scale))
        ).alias("avg_pred"),
        (F.col("n_pos").cast("double") / n_d).alias("frac_pos"),
        (
            (F.col("_sq").cast("string").cast("double") / n_d)
            / F.lit(float(scale) * float(scale))
        ).alias("brier"),
    )


def decision_stump(df: DataFrame, feature_col: str = "feature",
                   x_col: str = "x", label_col: str = "y") -> DataFrame:
    """Depth-1 decision-tree training (the boosting weak learner /
    quality-filter baseline) by EXACT Gini split search: input is the
    long format (feature, x, y) with x already QUANTIZED so each
    feature's candidate grid is dictionary-sized (the quantized-KS
    boundedness contract). For every candidate threshold t (split
    x <= t):

        cost(t) = (A·r + B·l) / (l·r)
        A = l² − lp² − ln²,  B = r² − rp² − rn²

    — the weighted Gini impurity with all counts exact BIGINTs from
    ONE grid scan (prefix sums over the per-feature grid window), cost
    one fixed-order double expression, argmin tie-broken on (cost,
    threshold). Counts beyond ~3e9 need the DECIMAL ladder for the
    squares. Returns one row per feature: (feature, threshold,
    n_left, n_right, cost) — the best stump per feature; the global
    winner is the min-cost row."""
    from pyspark.sql import Window

    g = df.groupBy(feature_col, x_col).agg(
        F.sum(F.col(label_col)).cast("long").alias("_p"),
        F.sum(1 - F.col(label_col)).cast("long").alias("_q"),
    )
    wc = (
        Window.partitionBy(feature_col)
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(feature_col)
    c = (
        g.withColumn("_lp", F.sum("_p").over(wc).cast("long"))
        .withColumn("_ln", F.sum("_q").over(wc).cast("long"))
        .withColumn("_tp", F.sum("_p").over(wt).cast("long"))
        .withColumn("_tq", F.sum("_q").over(wt).cast("long"))
    )
    l = F.col("_lp") + F.col("_ln")
    r = (F.col("_tp") + F.col("_tq")) - l
    rp = F.col("_tp") - F.col("_lp")
    rn = F.col("_tq") - F.col("_ln")
    c = (
        c.withColumn("_l", l)
        .withColumn("_r", r)
        .filter(F.col("_r") > 0)
        .withColumn(
            "_A",
            F.col("_l") * F.col("_l") - F.col("_lp") * F.col("_lp")
            - F.col("_ln") * F.col("_ln"),
        )
        .withColumn(
            "_B",
            F.col("_r") * F.col("_r") - rp * rp - rn * rn,
        )
    )
    cost = (
        F.col("_A").cast("double") * F.col("_r").cast("double")
        + F.col("_B").cast("double") * F.col("_l").cast("double")
    ) / (F.col("_l").cast("double") * F.col("_r").cast("double"))
    ranked = c.withColumn("_cost", cost).withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(feature_col).orderBy(
                F.col("_cost").asc(), F.col(x_col).asc()
            )
        ),
    )
    return ranked.filter(F.col("_rk") == 1).select(
        F.col(feature_col).alias("feature"),
        F.col(x_col).alias("threshold"),
        F.col("_l").alias("n_left"),
        F.col("_r").alias("n_right"),
        F.col("_cost").alias("cost"),
    )


def k_anonymity_ladder(
    df: DataFrame, levels: list[list[Column]], k: int = 5
) -> DataFrame:
    """Global-recoding generalization — the RELEASE half of the
    k_anonymity audit (Samarati's full-domain generalization): given a
    ladder of progressively coarser quasi-identifier encodings
    (wider bands, then suppressed columns), report every level's group
    profile and mark the MINIMAL level whose smallest group reaches k
    — the level a release would publish at. One grouping shuffle per
    ladder level (the ladder is small and fixed); per-level output is
    a 1-row summary, so nothing row-scale leaves the executors.
    Returns (level, n_groups, min_group_size, meets_k, chosen) with
    chosen falling back to the coarsest level when none meets k."""
    summaries = []
    for i, cols in enumerate(levels):
        g = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n"))
        s = g.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.min("_n").cast("long").alias("min_group_size"),
        ).select(F.lit(i).cast("long").alias("level"), "n_groups", "min_group_size")
        summaries.append(s)
    u = summaries[0]
    for s in summaries[1:]:
        u = u.unionByName(s)
    u = u.withColumn("meets_k", F.col("min_group_size") >= k)
    best = u.agg(
        F.min(F.when(F.col("meets_k"), F.col("level"))).alias("_best"),
        F.max("level").alias("_last"),
    )
    return u.crossJoin(F.broadcast(best)).select(
        "level",
        "n_groups",
        "min_group_size",
        "meets_k",
        (F.col("level") == F.coalesce(F.col("_best"), F.col("_last"))).alias(
            "chosen"
        ),
    )


def rank_auc_by(
    df: DataFrame, group_col: str, score_col: str, label_col: str
) -> DataFrame:
    """Disaggregated (per-slice) exact ROC-AUC — rank_auc's grouped
    twin, the fairness/robustness evaluation practice of scoring a
    classifier per language/domain/cohort rather than trusting one
    global number. Same Mann-Whitney integer identity, with the
    ordered window running over each slice's distinct-score grid
    (PARTITION BY slice — grids stay dictionary-sized per the
    quantized-score contract). Slices with one class present return
    NULL auc. Returns (group, n_pos, n_neg, u2, auc)."""
    from pyspark.sql import Window

    g = df.select(
        F.col(group_col).alias("_g"),
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
    )
    grid = g.groupBy("_g", "_s").agg(
        F.sum("_y").cast("long").alias("_p"),
        F.sum(1 - F.col("_y")).cast("long").alias("_q"),
    )
    w = (
        Window.partitionBy("_g")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.withColumn(
        "_cq", F.coalesce(F.sum("_q").over(w), F.lit(0).cast("long"))
    )
    agg = cum.groupBy("_g").agg(
        F.sum("_p").cast("long").alias("n_pos"),
        F.sum("_q").cast("long").alias("n_neg"),
        F.sum(F.col("_p") * (2 * F.col("_cq") + F.col("_q")))
        .cast("long")
        .alias("u2"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        "n_pos",
        "n_neg",
        "u2",
        F.try_divide(
            F.col("u2").cast("double"),
            (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("auc"),
    )


def adaboost_stumps(
    feats: DataFrame, labels: DataFrame, rounds: int = 3
) -> DataFrame:
    """AdaBoost over decision stumps trained IN-ENGINE with EXACT
    arithmetic (Freund & Schapire's reweighting, beside the
    perceptron / naive-Bayes / single-stump trainers; reference has
    no learners — this serves the quality-filter training loop a
    corpus pipeline needs, cf. generate_training_data.py semantics).

    The float-free trick: the multiplicative update
    ``w ·= exp(±alpha)``, ``exp(2·alpha) = (W−err)/err`` only ever
    needs the RATIO between wrong and right weights, so multiplying
    misclassified rows by ``W−err`` and correct rows by ``err`` keeps
    the exact AdaBoost distribution with INTEGER weights (common
    factor cancels in the next round's weighted-error argmin). Weights
    live in DECIMAL(38,0); totals obey W_{t+1} = 2·err·(W−err) ≤
    W²/2, so three rounds from n ≤ ~5·10⁴ docs stay inside 38 digits
    — the docstring-level bound; wider T at corpus scale renormalizes
    (divide by gcd / rescale to a fixed sum) between rounds.

    Per round, ONE plan: weighted class masses per (feature, x) grid
    cell (the quantized-grid contract keeps it dictionary-sized),
    prefix sums per feature for both stump polarities
    (h = pol·sign(thr − x)), a global deterministic argmin
    (err, feature, x), then the 1-row winner broadcast back over the
    docs to flip weights. Only dictionary-sized grids are windowed;
    nothing row-scale reaches the driver.

    Inputs: ``feats`` (id, feature, x) with x pre-quantized;
    ``labels`` (id, ypm) with ypm ∈ {+1, −1}. Returns one row per
    round: (round, feature, threshold, polarity, err_rate, n_mis) —
    the model trajectory (err_rate = weighted error / total, one
    division of exact decimals; n_mis = unweighted misclassified
    count)."""
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    w_t = labels.select("id", F.lit(1).cast(dec).alias("w"))
    outs: list[DataFrame] = []
    fl = feats.join(labels, "id")
    for t in range(1, rounds + 1):
        j = fl.join(w_t, "id")
        grid = j.groupBy("feature", "x").agg(
            F.sum(F.when(F.col("ypm") == 1, F.col("w")).otherwise(F.lit(0)))
            .cast(dec)
            .alias("wp"),
            F.sum(F.when(F.col("ypm") == -1, F.col("w")).otherwise(F.lit(0)))
            .cast(dec)
            .alias("wn"),
        )
        wc = (
            Window.partitionBy("feature")
            .orderBy("x")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt_ = Window.partitionBy("feature")
        c = (
            grid.withColumn("cwp", F.sum("wp").over(wc).cast(dec))
            .withColumn("cwn", F.sum("wn").over(wc).cast(dec))
            .withColumn("tp", F.sum("wp").over(wt_).cast(dec))
            .withColumn("tn", F.sum("wn").over(wt_).cast(dec))
        )
        err_a = F.col("cwn") + (F.col("tp") - F.col("cwp"))
        err_b = F.col("cwp") + (F.col("tn") - F.col("cwn"))
        e = c.select(
            "feature",
            F.col("x").alias("thr"),
            F.when(err_a <= err_b, F.lit(1)).otherwise(F.lit(-1)).alias("pol"),
            F.when(err_a <= err_b, err_a).otherwise(err_b).cast(dec).alias("err"),
            (F.col("tp") + F.col("tn")).cast(dec).alias("tot"),
        )
        best = (
            e.withColumn(
                "rk",
                F.row_number().over(
                    Window.orderBy(
                        F.col("err").asc(), F.col("feature").asc(), F.col("thr").asc()
                    )
                ),
            )
            .filter(F.col("rk") == 1)
            .drop("rk")
            .localCheckpoint(eager=False)
        )
        b = F.broadcast(best.select(
            F.col("feature").alias("_bf"),
            F.col("thr").alias("_bt"),
            F.col("pol").alias("_bp"),
            F.col("err").alias("_be"),
            F.col("tot").alias("_bw"),
        ))
        h = (
            fl.join(b, fl["feature"] == F.col("_bf"))
            .select(
                "id",
                "ypm",
                F.when(F.col("x") <= F.col("_bt"), F.col("_bp"))
                .otherwise(-F.col("_bp"))
                .alias("h"),
            )
        )
        err_eff = F.when(F.col("_be") > 0, F.col("_be")).otherwise(
            F.lit(1).cast(dec)
        )
        w_t = (
            w_t.join(h, "id")
            .crossJoin(b)
            .select(
                "id",
                (
                    F.col("w")
                    * F.when(
                        F.col("h") != F.col("ypm"), F.col("_bw") - err_eff
                    ).otherwise(err_eff)
                )
                .cast(dec)
                .alias("w"),
            )
            .localCheckpoint(eager=False)
        )
        n_mis = h.agg(
            F.sum(F.when(F.col("h") != F.col("ypm"), 1).otherwise(0))
            .cast("long")
            .alias("n_mis")
        )
        outs.append(
            best.crossJoin(F.broadcast(n_mis)).select(
                F.lit(t).cast("long").alias("round"),
                "feature",
                F.col("thr").cast("long").alias("threshold"),
                F.col("pol").cast("long").alias("polarity"),
                (
                    F.col("err").cast("string").cast("double")
                    / F.col("tot").cast("string").cast("double")
                ).alias("err_rate"),
                "n_mis",
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u


def grouped_ols(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group simple linear regression SOLVED IN CLOSED FORM from
    one scan: the five moments (n, Σx, Σy, Σxy, Σx², Σy²) accumulate
    as DECIMAL(38,0) integers in a single map-side-combined groupBy,
    then Cramer's rule gives every coefficient as ONE division of two
    exact integers —

        slope     = (nΣxy − ΣxΣy) / D,   D = nΣx² − (Σx)²
        intercept = (ΣyΣx² − ΣxΣxy) / D
        r²        = (nΣxy − ΣxΣy)² / (D · (nΣy² − (Σy)²))

    so the result is bit-deterministic cross-engine (the house float
    policy). Constant-x or constant-y groups return NULL coefficients
    instead of dividing by zero. Inputs must be integer-valued
    (pre-quantize reals by a fixed scale); at corpus scale the moment
    products stay inside DECIMAL(38,0) for |x|,|y| ≤ ~10⁶ over ~10⁹
    rows — beyond that, quantize coarser. One shuffle total; output is
    group-cardinality-sized."""
    dec = "decimal(38,0)"
    x = F.col(x_col).cast(dec)
    y = F.col(y_col).cast(dec)
    m = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast(dec).alias("_n"),
        F.sum(x).cast(dec).alias("_sx"),
        F.sum(y).cast(dec).alias("_sy"),
        F.sum(x * y).cast(dec).alias("_sxy"),
        F.sum(x * x).cast(dec).alias("_sxx"),
        F.sum(y * y).cast(dec).alias("_syy"),
    )
    d_ = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(dec)
    num_s = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(dec)
    num_i = (F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy")).cast(
        dec
    )
    den_y = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast(dec)
    as_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    return m.select(
        group_col,
        F.col("_n").cast("long").alias("n"),
        F.when(d_ != 0, as_d(num_s) / as_d(d_)).alias("slope"),
        F.when(d_ != 0, as_d(num_i) / as_d(d_)).alias("intercept"),
        F.when(
            (d_ != 0) & (den_y != 0),
            (as_d(num_s) * as_d(num_s)) / (as_d(d_) * as_d(den_y)),
        ).alias("r2"),
    )


def dp_quantile_exponential(
    df: DataFrame,
    value_col: str,
    n_levels: int = 1024,
    micro: int = 1_000_000,
    seed: str = "dpq1",
) -> DataFrame:
    """ε=1 differentially-private MEDIAN via the exponential mechanism
    (McSherry-Talwar; Smith's quantile instantiation) — the privacy
    family's release half for order statistics, beside
    dp_noisy_counts' geometric mechanism for counts. Candidates are
    the distinct-value grid (pre-quantize continuous columns — the
    bounded-grid contract); utility is the rank distance
    u(v) = −|2·cnt_le(v) − n|/2 with sensitivity 1, so the exponent
    ε·u/2 is the INTEGER micro-nat score −(|2·cnt_le − n|·micro div 4).
    Selection uses the Gumbel-max trick with the engine's quantized
    Gumbel table (md5-level assignment, driver-fixed integer
    micro-nats, the gumbel_topk_resample convention) — argmax of
    score + Gumbel IS a sample from the exponential mechanism.
    Deterministic seeding is the replay/oracle mode; production draws
    real entropy. One grid-sized window; the exact median rides along
    for the utility-gap audit. Returns one row
    (n, true_median, dp_median, rank_dist_true, rank_dist_dp)."""
    import math

    from pyspark.sql import Window

    from datalake_etlscripts_spark.functions.scalar import md5_hash32

    spark = df.sparkSession
    levels = [
        (
            lv,
            int(
                math.floor(
                    -math.log(-math.log((lv + 0.5) / n_levels)) * micro + 0.5
                )
            ),
        )
        for lv in range(n_levels)
    ]
    gdim = spark.createDataFrame(levels, "lvl bigint, gumbel_micro bigint")
    grid = df.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    wt = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    g = grid.withColumn("_le", F.sum("_c").over(wt).cast("long")).withColumn(
        "_n", F.sum("_c").over(wa).cast("long")
    )
    d = F.abs(2 * F.col("_le") - F.col("_n"))
    scored = (
        g.withColumn("_d", d)
        .withColumn(
            "lvl", md5_hash32(F.concat(F.lit(seed), F.col("v").cast("string")))
            % n_levels
        )
        .join(F.broadcast(gdim), "lvl")
        .withColumn(
            "_score",
            -F.expr(f"(_d * {micro}) div 4") + F.col("gumbel_micro"),
        )
    )
    pick = (
        scored.withColumn(
            "_rk",
            F.row_number().over(Window.orderBy(F.desc("_score"), F.asc("v"))),
        )
        .filter(F.col("_rk") == 1)
        .select(
            F.col("_n").alias("n"),
            F.col("v").alias("dp_median"),
            F.col("_d").alias("rank_dist_dp"),
        )
    )
    exact = (
        scored.withColumn(
            "_rk", F.row_number().over(Window.orderBy(F.asc("_d"), F.asc("v")))
        )
        .filter(F.col("_rk") == 1)
        .select(
            F.col("v").alias("true_median"),
            F.col("_d").alias("rank_dist_true"),
        )
    )
    return pick.crossJoin(F.broadcast(exact)).select(
        "n", "true_median", "dp_median", "rank_dist_true", "rank_dist_dp"
    )


def fk_inference(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]]
) -> DataFrame:
    """Foreign-key / join-key DISCOVERY (the catalog-inference audit):
    for each candidate (name, child df, child col, parent df, parent
    col), measure distinct-value containment of the child in the
    parent — orphans via one left-anti join on the deduplicated child
    side (distinct first: the anti join then runs at key cardinality,
    not fact cardinality). containment = 1 − orphans/distinct; a true
    FK has zero orphans. Candidate pairs come from schema/type
    matching upstream; this pass is the data check. Returns one row
    per candidate (candidate, n_child_distinct, n_orphans,
    containment, is_fk)."""
    outs = []
    for name, child, ccol, parent, pcol in pairs:
        cd = child.select(F.col(ccol).alias("_k")).distinct()
        pd_ = parent.select(F.col(pcol).alias("_k")).distinct()
        orphans = cd.join(pd_, "_k", "left_anti")
        outs.append(
            cd.agg(F.count(F.lit(1)).cast("long").alias("n_child_distinct"))
            .crossJoin(
                F.broadcast(
                    orphans.agg(
                        F.count(F.lit(1)).cast("long").alias("n_orphans")
                    )
                )
            )
            .select(
                F.lit(name).alias("candidate"),
                "n_child_distinct",
                "n_orphans",
                (
                    F.lit(1.0)
                    - F.col("n_orphans").cast("double")
                    / F.col("n_child_distinct").cast("double")
                ).alias("containment"),
                (F.col("n_orphans") == 0).alias("is_fk"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u
