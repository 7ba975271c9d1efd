"""Feature-engineering operators for training-data preparation (r7).

Beyond-reference surface in the LLM-pipeline family (the reference
engine — row-at-a-time pandas ETL, see nextprocurement README — has no
feature layer at all): leakage-free target encoding, the hashing
trick, relational log-template mining, a mergeable moments sketch,
seasonal decomposition, truncated-EWMA anomaly scoring, an A/B
diff-in-differences readout with SRM guard, and item-item
co-occurrence similarity. Every operator follows the house float
policy: accumulate in DECIMAL(38,0) (exact, engine-independent),
divide exactly once per output value through a string→double cast so
the result is bit-deterministic against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.functions.scalar import md5_hash32

_DEC = "decimal(38,0)"


def _as_double(c: Column) -> Column:
    """Exact DECIMAL → DOUBLE via the decimal string (the one
    conversion both engines round identically)."""
    return c.cast("string").cast("double")


# ---------------------------------------------------------------------------
# Leave-one-out target encoding
# ---------------------------------------------------------------------------
def target_encode_loo(
    df: DataFrame,
    id_col: str,
    cat_col: str,
    y_col: str,
    smoothing: int = 20,
) -> DataFrame:
    """Leakage-free target encoding of a categorical feature: each
    row's encode EXCLUDES its own label (leave-one-out), so the
    feature never memorizes the row it describes —

        loo      = (Σy_cat − y_i) / (n_cat − 1)
        smoothed = ((Σy_cat − y_i)·N + m·ΣY) / ((n_cat − 1 + m)·N)

    the second shrinking rare categories toward the global prior
    ΣY/N with pseudo-count ``m``. All sums are DECIMAL(38,0) integers
    (``y_col`` must be 0/1 or integer-valued), so each output is ONE
    exact-integer division → bit-deterministic double. Singleton
    categories yield NULL loo (nothing left after holding out).

    Scale: one map-side-combined groupBy over the facts produces the
    category stats (category-cardinality-sized → broadcast back), one
    1-row global aggregate crossed in; the facts are scanned once and
    never shuffled on the row grain. At 10⁹ rows the (Σy−y)·N product
    is ≤ ~10¹⁸·10¹⁰ — inside DECIMAL(38,0).
    """
    y = F.col(y_col).cast(_DEC)
    facts = df.select(
        F.col(id_col).alias("id"), F.col(cat_col).alias("cat"), y.alias("y")
    )
    per_cat = facts.groupBy("cat").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n_c"),
        F.sum("y").cast(_DEC).alias("s_c"),
    )
    glob = facts.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n_g"),
        F.sum("y").cast(_DEC).alias("s_g"),
    )
    j = facts.join(F.broadcast(per_cat), "cat").crossJoin(F.broadcast(glob))
    hold = (F.col("s_c") - F.col("y")).cast(_DEC)
    m = F.lit(smoothing).cast(_DEC)
    loo_den = (F.col("n_c") - 1).cast(_DEC)
    sm_num = (hold * F.col("n_g") + m * F.col("s_g")).cast(_DEC)
    sm_den = ((loo_den + m) * F.col("n_g")).cast(_DEC)
    return j.select(
        F.col("id"),
        F.col("cat"),
        F.col("y").cast("long").alias("y_int"),
        F.when(loo_den != 0, _as_double(hold) / _as_double(loo_den)).alias(
            "loo_encode"
        ),
        (_as_double(sm_num) / _as_double(sm_den)).alias("smoothed_encode"),
    )


# ---------------------------------------------------------------------------
# Hashing-trick feature vectors
# ---------------------------------------------------------------------------
def feature_hash_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Hashing-trick (Weinberger et al.) sparse feature vectors: each
    token lands in ``md5lane mod n_buckets`` with a ±1 sign drawn from
    the next hash bit, so collisions cancel in expectation and NO
    vocabulary is ever built — the fixed-dimension representation that
    needs zero shuffles of dictionary state at corpus scale (contrast
    vocab_encode, which shuffles a vocab). Output is the sparse
    (id, bucket) grain: signed sum and touch count per bucket.

    One explode + one keyed groupBy; the hash is the shared md5 lane
    (functions/scalar.md5_hash32 ↔ registry.ddb_hex32) so the oracle
    replays it bit-for-bit.
    """
    lane = md5_hash32(F.col("tok"))
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("tok"),
    )
    sgn = F.when((lane.bitwiseAND(F.lit(n_buckets))) == 0, 1).otherwise(-1)
    return (
        toks.select("id", (lane % n_buckets).alias("bucket"), sgn.alias("sgn"))
        .groupBy("id", "bucket")
        .agg(
            F.sum("sgn").cast("long").alias("feat"),
            F.count(F.lit(1)).cast("long").alias("n_tok"),
        )
    )


# ---------------------------------------------------------------------------
# Relational log-template mining (Drain-lite)
# ---------------------------------------------------------------------------
def template_mine(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Log-template mining done relationally (a Drain-lite): lines are
    grouped by the (token count, first token) signature — Drain's tree
    prefix collapsed to one relational key — then each token POSITION
    is declared a variable slot ``<*>`` iff it takes more than one
    distinct value inside the group, else kept as the constant
    literal. Emits one row per discovered template with its support.

    Plan shape: one posexplode to the (group, position) grain, one
    countDistinct aggregate there, one position-ordered reassembly
    (array_sort over collect_list of (pos, piece) structs — the
    deterministic ordered-string_agg). State is bounded by
    groups × positions (template-dictionary-sized), never line-grain;
    the raw lines are scanned once. Token counts above ~200 should be
    truncated upstream (log lines, not documents).
    """
    toks = F.filter(F.split(F.col(line_col), " "), lambda t: t != "")
    base = lines.select(
        toks.alias("_toks"),
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("_t1"),
    )
    grp_counts = base.groupBy("n_tokens", "_t1").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    pos = base.select(
        "n_tokens", "_t1", F.posexplode("_toks").alias("_p0", "_tok")
    ).select("n_tokens", "_t1", (F.col("_p0") + 1).alias("pos"), "_tok")
    slots = pos.groupBy("n_tokens", "_t1", "pos").agg(
        F.countDistinct("_tok").alias("_nd"), F.min("_tok").alias("_ctok")
    )
    pieces = slots.select(
        "n_tokens",
        "_t1",
        "pos",
        F.when(F.col("_nd") > 1, F.lit("<*>")).otherwise(F.col("_ctok")).alias(
            "piece"
        ),
    )
    tpl = pieces.groupBy("n_tokens", "_t1").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "piece"))),
                lambda s: s["piece"],
            ),
            " ",
        ).alias("template"),
        F.sum(F.when(F.col("piece") == "<*>", 1).otherwise(0))
        .cast("long")
        .alias("n_wild"),
    )
    return tpl.join(grp_counts, ["n_tokens", "_t1"]).select(
        "template", "n_tokens", "n_wild", "n_lines"
    )


# ---------------------------------------------------------------------------
# Mergeable moments sketch
# ---------------------------------------------------------------------------
def moments_state_merge(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Moments sketch (Gan et al., VLDB'18 — the power-sums variant,
    exact because our values are integers): per key the mergeable
    state (n, Σx, Σx², Σx³, Σx⁴) as DECIMAL(38,0), PLUS a ``__total__``
    row produced by MERGING the per-key states — component-wise
    addition, the facts are NOT rescanned. That merge row is the whole
    point: partition → sketch → add is how a 100 TB profile rolls up
    without a second pass. Mean and variance come out of the state as
    single exact-integer divisions:

        mean = Σx/n        variance = (n·Σx² − (Σx)²) / n²

    Values must be integers ≤ ~10⁹ so Σx⁴ stays inside DECIMAL(38,0)
    at 10⁹ rows; quantize reals upstream.
    """
    x = F.col(value_col).cast(_DEC)
    st = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(x).cast(_DEC).alias("s1"),
        F.sum(x * x).cast(_DEC).alias("s2"),
        F.sum(x * x * x).cast(_DEC).alias("s3"),
        F.sum(x * x * x * x).cast(_DEC).alias("s4"),
    )
    merged = st.agg(
        F.lit("__total__").alias("key"),
        F.sum("n").cast(_DEC).alias("n"),
        F.sum("s1").cast(_DEC).alias("s1"),
        F.sum("s2").cast(_DEC).alias("s2"),
        F.sum("s3").cast(_DEC).alias("s3"),
        F.sum("s4").cast(_DEC).alias("s4"),
    )
    all_rows = st.unionByName(merged)
    var_num = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(_DEC)
    var_den = (F.col("n") * F.col("n")).cast(_DEC)
    return all_rows.select(
        "key",
        F.col("n").cast("long").alias("n"),
        _as_double(F.col("s1")).alias("s1"),
        _as_double(F.col("s2")).alias("s2"),
        _as_double(F.col("s3")).alias("s3"),
        _as_double(F.col("s4")).alias("s4"),
        (_as_double(F.col("s1")) / _as_double(F.col("n"))).alias("mean"),
        (_as_double(var_num) / _as_double(var_den)).alias("variance"),
    )


# ---------------------------------------------------------------------------
# Hourly spine (shared by the two time-series operators below)
# ---------------------------------------------------------------------------
def _hourly_counts_spine(
    df: DataFrame, type_col: str, ts_col: str
) -> DataFrame:
    """Gap-filled per-key hourly count series (the seasonal_mase /
    burst_smoothing spine, operators/events.py:1282): zero hours are
    real observations. Key-grain × hours rows — operationally bounded,
    never event-grain."""
    hc = df.groupBy(
        F.col(type_col).alias("k"), F.date_trunc("hour", F.col(ts_col)).alias("h")
    ).agg(F.count(F.lit(1)).alias("_c"))
    rng = hc.groupBy("k").agg(F.min("h").alias("_lo"), F.max("h").alias("_hi"))
    spine = rng.select(
        "k",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("interval 1 hour"))
        ).alias("h"),
    )
    return spine.join(hc, ["k", "h"], "left").select(
        "k", "h", F.coalesce(F.col("_c"), F.lit(0)).cast("long").alias("c")
    )


def seasonal_decompose_hourly(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    half_window: int = 12,
) -> DataFrame:
    """Classical additive seasonal decomposition of the per-key hourly
    count series, y = trend + seasonal + residual, done exactly:

      trend_t    = Σ_{|i|≤12} y_{t+i} / 25      (centered MA, full
                   windows only — NULL on the 12-row edges)
      dev25_t    = 25·y_t − Σ25_t               (25× the detrended
                   series — INTEGER, no early division)
      seasonal_h = Σ_{t: hod(t)=h} dev25_t / (25·count)
      residual   = y − trend − seasonal          (two deterministic
                   doubles, fixed op order)

    The only floats are the three end divisions of exact BIGINTs, so
    the oracle matches bit-for-bit. Windows are per-key hour-grain
    (days×24 rows per key) — a year of hours is 8 760 rows per key, so
    the window state is trivially executor-resident at any fact scale;
    the one event-grain operation is the initial count groupBy.
    """
    g = _hourly_counts_spine(df, type_col, ts_col)
    w = W.partitionBy("k").orderBy("h").rowsBetween(-half_window, half_window)
    span = 2 * half_window + 1
    g = g.withColumn("_s", F.sum("c").over(w)).withColumn(
        "_wn", F.count(F.lit(1)).over(w)
    )
    g = g.withColumn(
        "_s25", F.when(F.col("_wn") == span, F.col("_s").cast("long"))
    ).withColumn(
        "_dev25", F.lit(span) * F.col("c") - F.col("_s25")
    )
    seas = (
        g.filter(F.col("_dev25").isNotNull())
        .groupBy(F.col("k").alias("_sk"), F.hour("h").alias("_hod"))
        .agg(
            F.sum("_dev25").cast("long").alias("_sn"),
            (F.lit(span) * F.count(F.lit(1))).cast("long").alias("_sd"),
        )
    )
    out = g.join(
        F.broadcast(seas),
        (F.col("k") == F.col("_sk")) & (F.hour("h") == F.col("_hod")),
        "left",
    )
    trend = F.col("_s25").cast("double") / F.lit(float(span))
    seasonal = F.col("_sn").cast("double") / F.col("_sd").cast("double")
    return out.select(
        F.col("k").alias("event_type"),
        F.col("h").alias("hour"),
        F.col("c").alias("y"),
        trend.alias("trend"),
        F.when(trend.isNotNull(), seasonal).alias("seasonal"),
        F.when(
            trend.isNotNull(),
            F.col("c").cast("double") - trend - seasonal,
        ).alias("residual"),
    )


def ewma_anomaly_hourly(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    lags: int = 8,
    spike_mult: int = 3,
) -> DataFrame:
    """Truncated exponentially-weighted moving-average forecast with a
    spike flag, exactly: the EWMA weight (3/4)^(i−1) over the last 8
    PAST hours is cleared of its denominator (w_i = 3^(i−1)·4^(8−i),
    all integers), so

        pred_t  = Σ w_i·y_{t−i} / Σ_{present} w_i
        spike_t = y_t·den > 3·num            (integer cross-mult —
                                              no float compare)

    Early rows renormalize over the lags that exist (same rule both
    engines); the very first row per key has no past → NULL pred.
    Eight fixed lag() terms in ONE window pass — no self-joins, and
    the window is per-key hour-grain like the rest of the spine
    family. Flags count-rate spikes ``y > 3·pred`` for ingest
    monitoring.
    """
    g = _hourly_counts_spine(df, type_col, ts_col)
    w = W.partitionBy("k").orderBy("h")
    wts = [3 ** (i - 1) * 4 ** (lags - i) for i in range(1, lags + 1)]
    num = None
    den = None
    for i, wt in enumerate(wts, start=1):
        li = F.lag("c", i).over(w)
        term = F.when(li.isNotNull(), F.lit(wt) * li).otherwise(F.lit(0))
        dterm = F.when(li.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    g = g.withColumn("_num", num.cast("long")).withColumn(
        "_den", den.cast("long")
    )
    pred = F.when(
        F.col("_den") > 0,
        F.col("_num").cast("double") / F.col("_den").cast("double"),
    )
    spike = F.when(
        F.col("_den") > 0,
        F.col("c") * F.col("_den") > F.lit(spike_mult) * F.col("_num"),
    )
    return g.select(
        F.col("k").alias("event_type"),
        F.col("h").alias("hour"),
        F.col("c").alias("y"),
        pred.alias("ewma_pred"),
        spike.alias("spike"),
    )


# ---------------------------------------------------------------------------
# A/B readout: difference-in-differences + sample-ratio-mismatch guard
# ---------------------------------------------------------------------------
def experiment_did(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    outcome: Column | None = None,
    post_cut: str = "2024-01-16 00:00:00",
) -> DataFrame:
    """One-row A/B experiment readout in ONE conditional-aggregation
    scan: users are hashed into arms on the shared md5 lane (the
    rendezvous/split discipline — assignment is a pure function of the
    id, reproducible anywhere), the window splits pre/post at
    ``post_cut``, and the causal readout is difference-in-differences
    over the four cell means

        did = (m_treat_post − m_treat_pre) − (m_ctrl_post − m_ctrl_pre)

    each mean an exact BIGINT/BIGINT division; the DiD combines four
    deterministic doubles in fixed order. Beside it, the guardrail
    every experiment readout needs first: the sample-ratio-mismatch
    chi-square (nu_t − nu_c)²/(nu_t + nu_c) on DISTINCT user counts —
    if that's large, the split is broken and the DiD is meaningless.
    No joins, no shuffle beyond the single 1-row aggregate.
    """
    if outcome is None:
        outcome = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    treat = md5_hash32(F.col(user_col).cast("string")) % 2 == 1
    post = F.col(ts_col) >= F.to_timestamp(F.lit(post_cut))
    y = outcome.cast("long")

    def cell(t: bool, p: bool):
        cond = (treat == t) & (post == p)
        s = F.sum(F.when(cond, y).otherwise(0)).cast("long")
        n = F.sum(F.when(cond, 1).otherwise(0)).cast("long")
        return s, n

    s00, n00 = cell(False, False)
    s01, n01 = cell(False, True)
    s10, n10 = cell(True, False)
    s11, n11 = cell(True, True)
    nu_t = F.countDistinct(F.when(treat, F.col(user_col)))
    nu_c = F.countDistinct(F.when(~treat, F.col(user_col)))
    agg = df.agg(
        s00.alias("s00"), n00.alias("n00"),
        s01.alias("s01"), n01.alias("n01"),
        s10.alias("s10"), n10.alias("n10"),
        s11.alias("s11"), n11.alias("n11"),
        nu_t.cast("long").alias("users_treat"),
        nu_c.cast("long").alias("users_ctrl"),
    )
    m = {
        k: F.col(f"s{k}").cast("double") / F.col(f"n{k}").cast("double")
        for k in ("00", "01", "10", "11")
    }
    d_users = F.col("users_treat") - F.col("users_ctrl")
    return agg.select(
        "users_treat",
        "users_ctrl",
        (
            (d_users * d_users).cast("double")
            / (F.col("users_treat") + F.col("users_ctrl")).cast("double")
        ).alias("srm_chi2"),
        m["00"].alias("m_ctrl_pre"),
        m["01"].alias("m_ctrl_post"),
        m["10"].alias("m_treat_pre"),
        m["11"].alias("m_treat_post"),
        ((m["11"] - m["10"]) - (m["01"] - m["00"])).alias("did"),
    )


# ---------------------------------------------------------------------------
# Item-item co-occurrence similarity
# ---------------------------------------------------------------------------
def item_item_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 3,
    max_basket: int = 64,
) -> DataFrame:
    """Item-item collaborative-filtering similarity from co-occurrence
    ("customers who bought X also bought Y"): for items a, b with
    basket counts n_a, n_b and co-basket count c_ab, rank neighbors by
    cosine² = c²/(n_a·n_b) — the square avoids sqrt, preserves the
    ordering, and is ONE exact-integer division per pair. Top-``k``
    per item, ties broken by neighbor id.

    Scale: the only quadratic step is the within-basket pair
    self-join, which is bounded by ``max_basket``² per basket — the
    cap drops pathological mega-baskets (a retailer's "unknown
    customer" basket would otherwise dominate the shuffle; same guard
    both engines so the oracle agrees). Pair counts shuffle on the
    (a, b) key; the final top-k window partitions by item — both
    linear in the pair count.
    """
    from datalake_etlscripts_spark.functions.scalar import ordered_pairs

    oi = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    # r07 (guide §2.4): one basket-keyed aggregate builds the capped
    # sorted-distinct item array; pairs are then generated MAP-SIDE
    # (ordered_pairs) and item counts by exploding the same arrays —
    # replaces the former sizes-join + basket self-join (two joins,
    # two extra exchanges) with zero joins. Pair multiset identical
    # (u < v over distinct per-basket items). Lazy settle: the array
    # table feeds both ni and the pair build.
    arrs = (
        oi.groupBy("b")
        .agg(F.sort_array(F.collect_list("i")).alias("_items"))
        .filter(F.size("_items") <= max_basket)
        .localCheckpoint(eager=False)
    )
    ni = (
        arrs.select(F.explode("_items").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # settle the pair counts: the symmetrizing union below reads
    # `pairs` twice, and without a lineage cut the pair explode +
    # aggregation (the only quadratic-ish step) executes once per
    # branch — the swapped branch's exchange canonicalizes differently
    # so ReuseExchange does not share it (guide §2.4). Lazy.
    pairs = (
        arrs.select(F.explode(ordered_pairs(F.col("_items"))).alias("_p"))
        .groupBy(F.col("_p.x").alias("ia"), F.col("_p.y").alias("ib"))
        .agg(F.count(F.lit(1)).cast("long").alias("cooc"))
        .localCheckpoint(eager=False)
    )
    sym = pairs.unionByName(
        pairs.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), "cooc"
        )
    )
    scored = (
        sym.join(ni.withColumnRenamed("i", "ia").withColumnRenamed("n", "n_a"), "ia")
        .join(ni.withColumnRenamed("i", "ib").withColumnRenamed("n", "n_b"), "ib")
        .withColumn(
            "cosine_sq",
            _as_double((F.col("cooc").cast(_DEC) * F.col("cooc")).cast(_DEC))
            / _as_double((F.col("n_a").cast(_DEC) * F.col("n_b")).cast(_DEC)),
        )
    )
    w = W.partitionBy("ia").orderBy(F.desc("cosine_sq"), F.asc("ib"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("ia").alias("item"),
            F.col("ib").alias("neighbor"),
            "cooc",
            "n_a",
            "n_b",
            "cosine_sq",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed exact global rank (the quality_deciles plan, factored)
# ---------------------------------------------------------------------------
def distributed_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    out_col: str = "rank",
    part_cols: tuple[str, ...] = (),
    n_buckets: int = 16,
) -> DataFrame:
    """Exact 1-based rank by (value, tiebreak) without a single-task
    global window — the quality_deciles distributed sort-rank plan
    (plans/textops.py) factored for reuse: approxQuantile picks range
    buckets (approximation affects only bucket BALANCE, never
    correctness — equal values always share a bucket), row_number runs
    per (partition, bucket) with bounded state, and a driver-side
    cumsum of the bucket counts (≤ |partitions|·n_buckets longs, which
    must stay driver-bounded — fine for language/type-grain partition
    columns) converts them to exact global ranks within each
    partition. Appends ``out_col``."""
    probes = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(
        set(df.approxQuantile(value_col, probes, 0.01))
    )
    bkt = F.lit(0)
    for b in bounds:
        bkt = bkt + F.when(F.col(value_col) > b, 1).otherwise(0)
    bucketed = df.withColumn("_bkt", bkt)
    cnt_rows = (
        bucketed.groupBy(*part_cols, "_bkt")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    offsets: dict[tuple, int] = {}
    acc: dict[tuple, int] = {}
    for r in sorted(cnt_rows, key=lambda r: (tuple(str(r[c]) for c in part_cols), r["_bkt"])):
        pk = tuple(r[c] for c in part_cols)
        offsets[pk + (r["_bkt"],)] = acc.get(pk, 0)
        acc[pk] = acc.get(pk, 0) + r["_c"]
    off = F.lit(0)
    for key, v in offsets.items():
        cond = F.col("_bkt") == key[-1]
        for c, kv in zip(part_cols, key[:-1]):
            cond = cond & (F.col(c) == F.lit(kv))
        off = F.when(cond, F.lit(v)).otherwise(off)
    w = W.partitionBy(*part_cols, "_bkt").orderBy(value_col, tiebreak_col)
    return bucketed.withColumn(out_col, off + F.row_number().over(w)).drop(
        "_bkt"
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Quantile normalization across groups (the microarray-era
    Bolstad et al. transform, here for aligning per-language /
    per-source score distributions before thresholding): each row is
    replaced by the POOLED distribution's value at its within-group
    quantile position,

        qn(row) = pooled[ ⌈ r·N / n_g ⌉ ]ᅟᅟ(r = rank in group,
                                            n_g = group size, N = total)

    so every group ends up with (a subsample of) the same marginal
    distribution and a single global threshold means the same thing in
    every group. The index arithmetic is pure integers (⌈a/b⌉ =
    (a+b−1) div b) and the pooled lookup is an equi-join on the index,
    so the result is engine-exact. Ranks on both sides come from the
    distributed sort-rank plan — no single-task global window."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
    )
    ranked = distributed_rank(base, "v", "id", "_r", part_cols=("grp",))
    sizes = base.groupBy("grp").agg(F.count(F.lit(1)).alias("_ng"))
    pooled = distributed_rank(base, "v", "id", "_idx").select(
        F.col("_idx"), F.col("v").alias("_ref")
    )
    n_total = base.count()
    j = ranked.join(F.broadcast(sizes), "grp").withColumn(
        "_tidx",
        F.expr(f"(_r * CAST({n_total} AS BIGINT) + _ng - 1) div _ng"),
    )
    return (
        j.join(pooled, j["_tidx"] == pooled["_idx"])
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            F.col("v").alias(value_col),
            F.col("_ref").alias("qn_" + value_col),
        )
    )


# ---------------------------------------------------------------------------
# Robust trend statistics on the hourly spine
# ---------------------------------------------------------------------------
def mann_kendall(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Mann-Kendall trend test per key — the NONPARAMETRIC twin of
    grouped OLS (expectations.grouped_ols): monotone-trend evidence
    that no outlier can drag, because the statistic only looks at
    SIGNS of pairwise differences,

        S = Σ_{i<j} sgn(y_j − y_i)ᅟᅟτ_a = S / (n(n−1)/2)

    — exact integers until the one τ division. The pair self-join runs
    at HOUR grain per key (a year is 8 760 rows → ~38M sign pairs per
    key, executor-local after the key shuffle; the fact table itself is
    touched once by the count groupBy). Keys with n < 2 are dropped.
    Returns (event_type, n_hours, s_stat, tau_a)."""
    g = _hourly_counts_spine(df, type_col, ts_col)
    a = g.select(F.col("k"), F.col("h").alias("ha"), F.col("c").alias("ca"))
    b = g.select(F.col("k"), F.col("h").alias("hb"), F.col("c").alias("cb"))
    pairs = a.join(b, "k").filter(F.col("ha") < F.col("hb"))
    s = pairs.groupBy("k").agg(
        F.sum(F.signum(F.col("cb") - F.col("ca")).cast("long"))
        .cast("long")
        .alias("s_stat")
    )
    n = g.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_hours"))
    j = n.join(s, "k").filter(F.col("n_hours") >= 2)
    denom = (F.col("n_hours") * (F.col("n_hours") - 1) / 2).cast("long")
    return j.select(
        F.col("k").alias(type_col),
        "n_hours",
        "s_stat",
        (F.col("s_stat").cast("double") / denom.cast("double")).alias("tau_a"),
    )


def theil_sen(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Theil-Sen robust slope per key: the MEDIAN of all pairwise
    slopes (y_j − y_i)/(x_j − x_i) over the hourly spine — up to ~29%
    corrupted hours cannot move it (breakdown point), where one wild
    outlier hour ruins an OLS fit. Each slope is an exact rational
    (integer Δcount over integer Δhours); the median is selected by
    ORDER (slope double from one exact division, ties broken by the
    rational pair), so both engines pick the identical pair and the
    reported slope is that pair's own division — no averaging of two
    middles (lower median for even counts, documented). Same hour-grain
    pair join as mann_kendall. Returns (event_type, n_pairs,
    slope_per_hour)."""
    g = _hourly_counts_spine(df, type_col, ts_col)
    g = g.withColumn("x", F.expr("unix_micros(h) div 3600000000"))
    a = g.select("k", F.col("x").alias("xa"), F.col("c").alias("ca"))
    b = g.select("k", F.col("x").alias("xb"), F.col("c").alias("cb"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("xa") < F.col("xb"))
        .select(
            "k",
            (F.col("cb") - F.col("ca")).alias("dy"),
            (F.col("xb") - F.col("xa")).alias("dx"),
        )
        .withColumn(
            "slope", F.col("dy").cast("double") / F.col("dx").cast("double")
        )
    )
    w = W.partitionBy("k").orderBy("slope", "dy", "dx")
    cnt = W.partitionBy("k")
    ranked = pairs.withColumn("_r", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(cnt)
    )
    med = ranked.filter(F.col("_r") == F.expr("(_n + 1) div 2"))
    return med.select(
        F.col("k").alias(type_col),
        F.col("_n").cast("long").alias("n_pairs"),
        F.col("slope").alias("slope_per_hour"),
    )


# ---------------------------------------------------------------------------
# Concentration metrics: Gini + Herfindahl-Hirschman
# ---------------------------------------------------------------------------
def concentration_metrics(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    amount_col: str,
) -> DataFrame:
    """Market-concentration readout per group over entity totals (who
    owns the revenue): the Gini coefficient from the sorted-rank
    identity

        G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)ᅟᅟ(xᵢ ascending, i = rank)

    and the Herfindahl-Hirschman index Σ(xᵢ/Σx)² = Σxᵢ²/(Σx)². Amounts
    must be pre-quantized integers (cents); every numerator and
    denominator accumulates in DECIMAL(38,0) and each metric is ONE
    exact division. Ranks within each group come from a window ordered
    (amount, entity) — per-group entity grain (customers per nation,
    suppliers per region: bounded); for a single giant group compose
    with distributed_rank. Returns (group, n_entities, total_amount,
    gini, hhi)."""
    dec = "decimal(38,0)"
    ent = df.groupBy(
        F.col(group_col).alias("grp"), F.col(entity_col).alias("ent")
    ).agg(F.sum(F.col(amount_col).cast(dec)).cast(dec).alias("x"))
    w = W.partitionBy("grp").orderBy("x", "ent")
    r = ent.withColumn("_i", F.row_number().over(w).cast(dec))
    st = r.groupBy("grp").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum(F.col("_i") * F.col("x")).cast(dec).alias("six"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
    )
    gini_num = (2 * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast(dec)
    gini_den = (F.col("n") * F.col("sx")).cast(dec)
    hhi_den = (F.col("sx") * F.col("sx")).cast(dec)
    return st.select(
        F.col("grp").alias(group_col),
        F.col("n").cast("long").alias("n_entities"),
        _as_double(F.col("sx")).alias("total_amount"),
        (_as_double(gini_num) / _as_double(gini_den)).alias("gini"),
        (_as_double(F.col("sxx")) / _as_double(hhi_den)).alias("hhi"),
    )


# ---------------------------------------------------------------------------
# Schema profiling: functional dependencies & candidate keys
# ---------------------------------------------------------------------------
def fd_audit(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Functional-dependency discovery over a HUMAN-BOUNDED candidate
    list (the Metanome/TANE-style profiling primitive, restricted to
    the pairs a schema reviewer actually asks about): A → B holds iff
    every A-group sees exactly one B value, and the audit reports the
    exact violation mass

        violations(A→B) = Σ_A (|distinct B in group| − 1)

    so "almost-FDs" (dirty foreign columns, stale denormalizations)
    are visible, not just booleans. One lhs-keyed distinct-count
    aggregate per candidate pair — each is a single shuffle on A over
    one table scan; the union output is |pairs| rows. Complements
    fk_inference (cross-table containment) with the intra-table half
    of schema discovery."""
    outs = []
    for lhs, rhs in pairs:
        g = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("_nd"))
        outs.append(
            g.agg(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.col("_nd") - 1).cast("long").alias("violations"),
                (F.sum(F.col("_nd") - 1) == 0).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def key_audit(df: DataFrame, candidates: list[tuple[str, ...]]) -> DataFrame:
    """Candidate-key audit: a column set is a key iff its distinct
    count equals the row count; the report carries both numbers plus
    the exact duplicate mass (n_rows − n_distinct) per candidate. One
    distinct-count aggregate per candidate set over one table scan;
    output is |candidates| rows."""
    outs = []
    for cand in candidates:
        outs.append(
            df.agg(
                F.lit(",".join(cand)).alias("columns"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.countDistinct(F.struct(*[F.col(c) for c in cand]))
                .cast("long")
                .alias("n_distinct"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "columns",
        "n_rows",
        "n_distinct",
        (F.col("n_rows") - F.col("n_distinct")).alias("dup_mass"),
        (F.col("n_rows") == F.col("n_distinct")).alias("is_key"),
    )


def pit_feature_rows(e: DataFrame) -> DataFrame:
    """Point-in-time feature rows for purchase labels over an event
    set: running view count and last error timestamp as of STRICTLY
    before each label, via ONE union+carry window per user (labels
    sort before features at equal timestamps — an equal-ts feature can
    never leak into its own label). Shared by the registered
    pit_training_join query and the streaming feature-store service's
    in-batch half. Input columns: event_id, user_id, ts, event_type.
    Returns (event_id, user_id, ts, n_views_before, last_err)."""
    labels = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("vcnt"),
        F.lit(None).cast("timestamp").alias("ets"),
    )
    vw = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    views = e.filter(F.col("event_type") == "view").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.row_number().over(vw).cast("long").alias("vcnt"),
        F.lit(None).cast("timestamp").alias("ets"),
    )
    errs = e.filter(F.col("event_type") == "error").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("vcnt"),
        F.col("ts").alias("ets"),
    )
    u = labels.unionByName(views).unionByName(errs)
    cw = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = u.select(
        "event_id",
        "user_id",
        "ts",
        "tag",
        F.max("vcnt").over(cw).alias("n_views_before"),
        F.max("ets").over(cw).alias("last_err"),
    )
    return c.filter(F.col("tag") == 0).select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce("n_views_before", F.lit(0)).cast("long").alias(
            "n_views_before"
        ),
        "last_err",
    )


# ---------------------------------------------------------------------------
# Time-series diagnostics: ACF grid + weighted Holt trend
# ---------------------------------------------------------------------------
def acf_grid(
    df: DataFrame,
    max_lag: int = 24,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Autocorrelation function r_1..r_max_lag per key over the hourly
    spine — the seasonality DIAGNOSTIC behind seasonality_lag24's
    single point. Cleared of the mean's denominator so everything is
    exact integers until one division per (key, lag):

        r_k = [n²·Σy_t·y_{t−k} − n·S·(H_k+T_k) + (n−k)·S²]
              / [n·(n−k)/n... ]  — normalized by n·(n·Σy² − S²)

    where S = Σy, H_k/T_k are the head/tail window sums. The k-lag
    pairing is ONE equi-join of the spine against itself shifted by an
    exploded lag column — hour-grain × max_lag rows, time-bounded.
    Returns (key, lag, n_pairs, r)."""
    dec = "decimal(38,0)"
    g = _hourly_counts_spine(df, type_col, ts_col).withColumn(
        "x", F.expr("unix_micros(h) div 3600000000")
    )
    st = g.groupBy("k").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("c").cast(dec).alias("s"),
        F.sum(F.col("c").cast(dec) * F.col("c")).cast(dec).alias("syy"),
    )
    lags = g.select(
        "k",
        "x",
        F.col("c").alias("ch"),
        F.explode(F.array(*[F.lit(i) for i in range(1, max_lag + 1)])).alias(
            "lag"
        ),
    )
    tails = g.select("k", F.col("x").alias("xt"), F.col("c").alias("ct"))
    pairs = lags.join(
        tails,
        (lags["k"] == tails["k"]) & (tails["xt"] == lags["x"] - lags["lag"]),
    ).select(lags["k"].alias("k"), "lag", "ch", "ct")
    pk = pairs.groupBy("k", "lag").agg(
        F.count(F.lit(1)).cast(dec).alias("m"),
        F.sum(F.col("ch").cast(dec) * F.col("ct")).cast(dec).alias("syy_k"),
        F.sum("ch").cast(dec).alias("hk"),
        F.sum("ct").cast(dec).alias("tk"),
    )
    j = pk.join(F.broadcast(st), "k")
    num = (
        F.col("n") * F.col("n") * F.col("syy_k")
        - F.col("n") * F.col("s") * (F.col("hk") + F.col("tk"))
        + F.col("m") * F.col("s") * F.col("s")
    ).cast(dec)
    den = (
        F.col("n") * (F.col("n") * F.col("syy") - F.col("s") * F.col("s"))
    ).cast(dec)
    return j.select(
        F.col("k").alias(type_col),
        F.col("lag").cast("int").alias("lag"),
        F.col("m").cast("long").alias("n_pairs"),
        F.when(den != 0, _as_double(num) / _as_double(den)).alias("r"),
    )


def holt_weighted_trend(
    df: DataFrame,
    window: int = 16,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Holt-style level+trend from the last ``window`` hours, made
    exact: instead of the recursive smoother (whose state is an
    unbounded-denominator rational), fit a WEIGHTED least squares line
    with geometric weights (3/4)^age cleared of denominators
    (w_a = 3^a·4^(K−1−a) — the truncated-EWMA integer trick applied to
    both Holt equations at once). With x = −age, Cramer's rule gives

        slope = (W·Sxy − Sx·Sy) / Dᅟᅟlevel = (Sy·Sxx − Sx·Sxy) / D

    and the h-step forecast (level_num + h·slope_num)/D is still ONE
    exact division. Keys with < 2 recent hours return NULLs. Per-key
    work is ``window`` rows."""
    dec = "decimal(38,0)"
    g = _hourly_counts_spine(df, type_col, ts_col)
    w_rank = W.partitionBy("k").orderBy(F.desc("h"))
    recent = g.withColumn("age", F.row_number().over(w_rank) - 1).filter(
        F.col("age") < window
    )
    wexpr = "CASE age " + " ".join(
        f"WHEN {a} THEN {3 ** a * 4 ** (window - 1 - a)}"
        for a in range(window)
    ) + " ELSE 0 END"
    r = recent.select(
        "k",
        F.expr(wexpr).cast(dec).alias("w"),
        (-F.col("age")).cast(dec).alias("x"),
        F.col("c").cast(dec).alias("y"),
    )
    m = r.groupBy("k").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("w").cast(dec).alias("sw"),
        F.sum(F.col("w") * F.col("x")).cast(dec).alias("sx"),
        F.sum(F.col("w") * F.col("y")).cast(dec).alias("sy"),
        F.sum(F.col("w") * F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).cast(dec).alias("sxx"),
    )
    d_ = (F.col("sw") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(dec)
    num_s = (F.col("sw") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(dec)
    num_l = (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast(dec)
    ok = (F.col("nh") >= 2) & (d_ != 0)
    return m.select(
        F.col("k").alias(type_col),
        F.col("nh").cast("int").alias("n_hours_used"),
        F.when(ok, _as_double(num_l) / _as_double(d_)).alias("level"),
        F.when(ok, _as_double(num_s) / _as_double(d_)).alias("trend"),
        F.when(
            ok, _as_double((num_l + num_s).cast(dec)) / _as_double(d_)
        ).alias("forecast_1h"),
        F.when(
            ok, _as_double((num_l + 24 * num_s).cast(dec)) / _as_double(d_)
        ).alias("forecast_24h"),
    )
