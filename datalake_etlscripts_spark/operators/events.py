"""Event-stream operators: sessionization and as-of joins.

Both are compositions of windows over one shuffle on the entity key —
the shapes that survive a 100 TB event table (no range-join explosion,
no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_minutes``.
    Appends ``session_no`` (1-based per user). One shuffle on the user
    key; both windows share it."""
    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    new_session = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn("_new_session", new_session).withColumn(
        "session_no",
        F.sum("_new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    ).drop("_new_session")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row matched to the right row with the
    greatest ``ts`` ≤ left.ts (backward) per key — merge_asof
    semantics without a range join.

    Implementation: tag + union both sides, sort within the key
    window, carry the last-seen right row forward with last(...,
    ignorenulls) — ONE shuffle on the key, linear in rows. The
    classic bucketed-range-join alternative shuffles the same data
    but pays candidate multiplication; this shape never does.

    Right columns come back suffixed; right rows themselves are not
    emitted. ``direction='forward'`` matches the next right row ≥ ts.
    """
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    tagged_l = left.select(
        F.col(on),
        F.col(ts_col).alias("_ats"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(_struct_type_of(right, rcols)).alias("_r"),
    )
    tagged_r = right.select(
        F.col(on),
        F.col(ts_col).alias("_ats"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(_struct_type_of(left, lcols)).alias("_l"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
    )
    unioned = tagged_l.select(on, "_ats", "_is_left", "_l", "_r").unionByName(tagged_r)

    if direction == "backward":
        # right rows sort BEFORE a left row at the same ts (ties match)
        w = W.partitionBy(on).orderBy("_ats", "_is_left").rowsBetween(
            W.unboundedPreceding, 0
        )
        carried = F.last("_r", ignorenulls=True).over(w)
    else:
        w = W.partitionBy(on).orderBy(F.desc("_ats"), "_is_left").rowsBetween(
            W.unboundedPreceding, 0
        )
        carried = F.last("_r", ignorenulls=True).over(w)

    out = (
        unioned.withColumn("_matched", carried)
        .filter(F.col("_is_left") == 1)
        .select(
            F.col(on),
            *[F.col(f"_l.{c}").alias(c) for c in lcols if c != on],
            *[F.col(f"_matched.{c}").alias(f"{c}{suffix}") for c in rcols],
        )
    )
    return out


def _struct_type_of(df: DataFrame, cols: list[str]):
    from pyspark.sql.types import StructType

    return StructType([df.schema[c] for c in cols])


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel analysis: per user, the furthest step of ``steps``
    reached IN ORDER (a later step only counts after an earlier one —
    the classic ordered-sequence funnel). Returns (user_id, max_step)
    with max_step in 0..len(steps).

    Shape: ONE shuffle on the user key — events collect into a
    (ts, id, type) array per user, sorted, and a JVM-side aggregate
    fold advances the step counter. No per-step self-joins (the
    textbook k-way join pays k shuffles and candidate blowup); state
    per user is one int. Ties are deterministic: (ts, event_id) is a
    total order."""
    ev = df.select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            F.col(type_col).alias("t"),
        ).alias("_e"),
    ).filter(F.col(f"_e.t").isin(steps))
    per_user = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list("_e")).alias("_evs")
    )

    def advance(acc, e):
        out = acc
        for i, s in enumerate(steps):
            out = F.when((acc == i) & (e["t"] == s), i + 1).otherwise(out)
        return out

    fold = F.aggregate(
        F.col("_evs"), F.lit(0), lambda acc, e: advance(acc, e)
    )
    return per_user.select(user_col, fold.alias("max_step"))


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    **kw,
) -> DataFrame:
    """Aggregate funnel: (step, n_users) where n_users counts users
    whose ordered progression reached AT LEAST that step — the
    conversion curve. Step 1..len(steps); a user contributes to every
    step up to their max."""
    per_user = funnel_steps(df, steps, user_col=user_col, **kw)
    # NB: filter BEFORE the explode — sequence(1, 0) infers step -1
    # and yields [1, 0], which would phantom-count step-0 users
    reached = per_user.filter(F.col("max_step") >= 1).select(
        F.explode(F.sequence(F.lit(1), F.col("max_step"))).alias("step")
    )
    return reached.groupBy("step").agg(F.count(F.lit(1)).alias("n_users"))


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity period
    (their cohort); for each (cohort, offset) the number of DISTINCT
    cohort users active ``offset`` periods later. Returns
    (cohort, period_offset, n_users); offset 0 is the cohort size.

    Shape: first-activity via a min-aggregate per user (one user-keyed
    shuffle, map-side combined — not a window over raw events), joined
    back onto the per-(user, period) activity table, then one
    (cohort, offset) count-distinct. The join key is the user id —
    hash-partitioned both sides, no skew beyond real power users
    (AQE-handled)."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"unsupported period {period!r}; use day/week/month")
    pu = F.date_trunc(period, F.col(ts_col))
    activity = df.select(F.col(user_col).alias("_u"), pu.alias("_p")).distinct()
    cohorts = activity.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    if period == "month":
        # calendar months are irregular — datediff(days) cannot express
        # them; both sides are month starts so months_between is integral
        offset = F.months_between(F.col("_p"), F.col("_cohort")).cast("int")
    else:
        offset = (
            F.datediff(F.col("_p"), F.col("_cohort"))
            / F.lit(7 if period == "week" else 1)
        ).cast("int")
    return (
        activity.join(cohorts, "_u")
        .select("_u", F.col("_cohort").alias("cohort"), offset.alias("period_offset"))
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct("_u").alias("n_users"))
    )


def resample_forward_fill(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Per-key time-series resampling with forward fill: a dense
    ``step``-spaced grid from floor(first observation) to the last
    observation, each grid point carrying the latest observation at
    or before it (NULL when none yet — only possible on the first
    point). Returns (user_id, grid_ts, value).

    Shape: the grid generates from a per-key min/max aggregate
    (sequence + explode — grid rows, never a range join); grid and
    observations union and ONE key-partitioned window carries the
    last non-null value forward (the as-of shape of as_of_join).
    Observations tie-break BEFORE their grid point so an observation
    exactly on the grid is included. At 100 TB the window state is
    one carried value — linear in rows."""
    trunc_unit = step.split()[-1].rstrip("s").lower()
    if trunc_unit not in ("second", "minute", "hour", "day", "week"):
        raise ValueError(f"unsupported step unit in {step!r}")
    bounds = df.groupBy(user_col).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("_lo"),
        F.max(ts_col).alias("_hi"),
    )
    grid = bounds.select(
        user_col,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
        ).alias("_gts"),
        F.lit(None).cast("double").alias("_v"),
        F.lit(0).alias("_is_grid"),
    )
    # deterministic under same-timestamp duplicates: one observation
    # per (key, ts) — max value wins (mirrored by the oracle)
    obs = (
        df.groupBy(user_col, ts_col)
        .agg(F.max(F.col(value_col).cast("double")).alias("_v"))
        .select(
            user_col,
            F.col(ts_col).alias("_gts"),
            "_v",
            F.lit(-1).alias("_is_grid"),
        )
    )
    w = (
        W.partitionBy(user_col)
        .orderBy("_gts", "_is_grid")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = grid.unionByName(obs).withColumn(
        "_filled", F.last("_v", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_is_grid") == 0).select(
        user_col,
        F.col("_gts").alias("grid_ts"),
        F.col("_filled").alias(value_col),
    )


def zscore_outliers(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 3.0,
) -> DataFrame:
    """Per-group z-score outliers: events whose value deviates more
    than ``k`` population standard deviations from the group mean.
    Returns (event_id, group, value, z).

    Cross-engine determinism (the oracle-parity float policy): the
    moments Σx and Σx² accumulate in EXACT decimal — double summation
    would be partitioning-order-dependent — and only the final
    mean/std/z arithmetic runs in double, where identical inputs give
    identical IEEE results (sqrt is correctly rounded). One group
    aggregate + one broadcast join back; no window, no second scan
    shuffle.

    Robustness under ANSI mode: decimal(18,4) keeps dv*dv exact
    (precision 37 ≤ 38 in both Spark and DuckDB) while moving the
    overflow cliff to |value| ≥ 10^14; beyond that try_cast yields
    NULL and the row is excluded from both moments and output rather
    than aborting the stage. Zero-variance groups (any group with one
    event, or all-equal values) produce NULL z via the var > 0 guard
    and are filtered out — never DIVIDE_BY_ZERO."""
    dv = F.col(value_col).try_cast("decimal(18,4)")
    stats = df.groupBy(group_col).agg(
        F.count(dv).alias("_n"),
        F.sum(dv).alias("_s1"),
        F.sum(dv * dv).alias("_s2"),
    )
    x = dv.cast("double")
    mean = F.col("_s1").cast("double") / F.col("_n")
    var = F.col("_s2").cast("double") / F.col("_n") - mean * mean
    z = F.when((F.col("_n") > 0) & (var > 0), (x - mean) / F.sqrt(var))
    return (
        df.join(F.broadcast(stats), group_col)
        .filter(dv.isNotNull())
        .select(
            id_col,
            group_col,
            x.alias(value_col),
            z.alias("z"),
        )
        .filter(F.abs("z") > k)
    )


def _ordered_types(
    type_col: str, ts_col: str, tie_col: str, max_seq: int | None
):
    """Aggregate expression: the group's event types as an ARRAY sorted
    by (ts, tie) — THE ordered-sequence idiom shared by
    event_pattern_matches and top_session_paths so the deterministic
    tie-break lives in one place. ``max_seq`` keeps the first N."""
    arr = F.array_sort(F.collect_list(F.struct(ts_col, tie_col, type_col)))
    if max_seq is not None:
        arr = F.slice(arr, 1, max_seq)
    return F.transform(arr, lambda s: s[type_col])


def event_pattern_matches(
    events: DataFrame,
    pattern: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    max_seq: int | None = None,
) -> DataFrame:
    """Sequence-pattern matching over per-user event streams — the
    MATCH_RECOGNIZE shape ("view then later purchase") as a regex over
    the user's time-ordered event-type string. ONE user-keyed shuffle:
    collect (ts, tie, type) per user, sort the ARRAY (deterministic —
    ties break on the id column), join to a string, count regex
    matches JVM-side. Adding a pattern is free once the string exists.

    Token anchoring: each event type is DELIMITED as ``<type>`` in the
    sequence string, and ``pattern`` must be written over delimited
    tokens (e.g. ``r"<view>(<error>)?<purchase>"``) — a bare substring
    pattern would false-match inside longer type names ('view' inside
    'preview'). Types containing '<'/'>' are not supported (asserted
    nowhere — choose different delimiters at the call site by
    pre-mapping the type column if needed).

    Skew: one row per user must hold the user's whole sequence; a
    bot-grade user concentrates its stream on one executor. Cap with
    ``max_seq`` (keeps the FIRST max_seq events after sorting) when
    the stream has unbounded per-user cardinality — the rest of this
    module's per-key ops stay window-shaped for exactly that reason.
    Returns (user_id, n_events, n_matches); zero-match users are kept
    (a per-user feature, not a filter)."""
    seq = (
        events.groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    _ordered_types(type_col, ts_col, tie_col, max_seq),
                    lambda t: F.concat(F.lit("<"), t, F.lit(">")),
                ),
                "",
            ).alias("_seq"),
        )
    )
    return seq.select(
        "user_id",
        "n_events",
        F.size(F.regexp_extract_all(F.col("_seq"), F.lit(pattern), 0)).alias(
            "n_matches"
        ),
    )


def robust_outliers(
    events: DataFrame,
    value_col: str = "value",
    key_col: str = "event_type",
    id_col: str = "event_id",
    threshold: float = 3.5,
) -> DataFrame:
    """Median/MAD robust outlier detection per key — the
    contaminated-data complement of zscore_outliers: mean/std move
    with the outliers they are meant to find, the median and the
    median-absolute-deviation do not (50% breakdown point).
    rz = (x − median) / (1.4826·MAD); |rz| > threshold flags.

    Shape: two grouped EXACT medians (percentile — interpolation
    semantics verified identical to DuckDB's median/quantile_cont)
    with the group-sized stats broadcast back; the events table is
    scanned twice (once per median round) — at 100 TB both scans are
    column-pruned to (key, value). Zero-MAD groups (constant values —
    a degenerate distribution has no meaningful deviation unit) are
    excluded on BOTH engine sides rather than fed to a divide;
    mirrors the zscore_outliers singleton guard."""
    med = events.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    dev = events.join(F.broadcast(med), key_col).select(
        id_col,
        key_col,
        value_col,
        "_med",
        F.abs(F.col(value_col) - F.col("_med")).alias("_dv"),
    )
    mad = dev.groupBy(key_col).agg(F.expr("percentile(_dv, 0.5)").alias("_mad"))
    scored = (
        dev.join(F.broadcast(mad), key_col)
        .filter(F.col("_mad") > 0)
        .select(
            id_col,
            key_col,
            value_col,
            F.col("_med").alias("med"),
            F.col("_mad").alias("mad"),
            (
                (F.col(value_col) - F.col("_med"))
                / (F.lit(1.4826) * F.col("_mad"))
            ).alias("rz"),
        )
    )
    return scored.filter(F.abs(F.col("rz")) > threshold)


def top_session_paths(
    events: DataFrame,
    k: int = 20,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    max_len: int = 1000,
) -> DataFrame:
    """Top-k most common session paths — the classic product-analytics
    "what do users actually do" query: sessionize (gap-based), build
    each session's time-ordered event-type path, count identical paths
    corpus-wide, keep the k most frequent (ties broken by path string
    so the cut is deterministic). Paths are '>'-joined type names.

    Shape: sessionize's user shuffle → one (user, session) collect →
    one path-keyed count → TakeOrdered k. The collect is bounded by
    ``max_len`` (first N events of a session), NOT by the gap alone —
    a bot emitting continuously never breaks its session, so the gap
    bounds idle time, not session length; the cap is the real
    guarantee (same hazard event_pattern_matches documents). Caveat:
    the path string is separator-joined raw type names — a type
    containing the separator collides ('a>b'+'c' vs 'a'+'b>c'); keep
    the separator outside the type alphabet (or pre-map types).
    Returns (path, n_sessions, n_events), n_events = path length."""
    s = sessionize(events, user_col, ts_col, tie_col, gap_minutes)
    paths = (
        s.groupBy(F.col(user_col).alias("_u"), F.col("session_no").alias("_s"))
        .agg(
            F.array_join(
                _ordered_types(type_col, ts_col, tie_col, max_len), ">"
            ).alias("path"),
            F.least(F.count(F.lit(1)), F.lit(max_len)).alias("_len"),
        )
    )
    counted = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("_len").alias("n_events"),
    )
    return counted.orderBy(
        F.col("n_sessions").desc(), F.col("path").asc()
    ).limit(k)


def linear_trend(
    events: DataFrame,
    value_col: str = "value",
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key least-squares trend (slope/intercept of value over time)
    — the drift-detection primitive. Engine-portable determinism the
    same way the engine's other float aggregates get it: every SUM is
    EXACT (integer/decimal — x is per-key-centered epoch seconds, y is
    scaled to integer 1e-4 units via an exact decimal cast), and the
    only floating-point steps are the final divisions, replayed in the
    same order by the oracle. Built-in regr_slope/regr_avg* would sum
    doubles in partition order — non-deterministic across engines and
    partitionings — so they are deliberately not used.

    slope is in value-units per second; intercept is the value at the
    key's FIRST observation (x centered at per-key min — also what
    keeps Σx² inside exact 38-digit decimals at 100 TB row counts).
    Two scans (per-key min, then moments), both column-pruned; the
    min dim rides a broadcast join. Returns (key, n, slope,
    intercept)."""
    mins = events.groupBy(key_col).agg(
        F.min(F.unix_seconds(F.col(ts_col))).alias("_x0")
    )
    base = events.join(F.broadcast(mins), key_col).select(
        key_col,
        (F.unix_seconds(F.col(ts_col)) - F.col("_x0")).alias("_x"),
        (F.col(value_col).cast("decimal(12,4)") * 10000)
        .cast("decimal(38,0)")
        .alias("_yi"),
    )
    m = base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").cast("decimal(38,0)").alias("_sx"),
        F.sum("_yi").cast("decimal(38,0)").alias("_sy"),
        F.sum(F.col("_x").cast("decimal(19,0)") * F.col("_yi")).cast("decimal(38,0)").alias("_sxy"),
        F.sum(F.col("_x").cast("decimal(19,0)") * F.col("_x")).cast("decimal(38,0)").alias("_sxx"),
    )
    num = (F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "decimal(38,0)"
    )
    den = (F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
        "decimal(38,0)"
    )
    slope = (num.cast("double") / den.cast("double")) / F.lit(10000.0)
    intercept = (
        F.col("_sy").cast("double") / F.lit(10000.0) / F.col("n").cast("double")
        - F.col("slope") * (F.col("_sx").cast("double") / F.col("n").cast("double"))
    )
    return (
        m.withColumn("slope", slope)
        .withColumn("intercept", intercept)
        .select(key_col, "n", "slope", "intercept")
    )


def distribution_drift(
    events: DataFrame,
    value_col: str = "value",
    key_col: str = "event_type",
    half_col: str = "event_id",
    bin_width: float = 10.0,
) -> DataFrame:
    """Chi-square-style distributional drift between two snapshot
    halves (rows split by ``half_col`` parity) per key: bin the value,
    count per (key, bin, half) — exact integers — then fold
    (pa−pb)²/(pa+pb) over bins IN BIN ORDER (sorted collect, the
    engine's deterministic-double-sum policy). PSI's ln() is not
    bit-portable across engines; this form needs only +,−,×,÷.
    Returns (key, ta, tb, drift) — 0 for identical distributions,
    → 2 for disjoint ones."""
    binned = events.select(
        key_col,
        (F.col(half_col) % 2).alias("_h"),
        F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("_bin"),
    )
    c = binned.groupBy(key_col, "_bin").agg(
        F.sum(F.when(F.col("_h") == 0, 1).otherwise(0)).alias("_na"),
        F.sum(F.when(F.col("_h") == 1, 1).otherwise(0)).alias("_nb"),
    )
    t = c.groupBy(key_col).agg(
        F.sum("_na").alias("ta"),
        F.sum("_nb").alias("tb"),
        F.array_sort(F.collect_list(F.struct("_bin", "_na", "_nb"))).alias("_arr"),
    )

    def term(s):
        na = s["_na"].cast("double") / F.col("ta")
        nb = s["_nb"].cast("double") / F.col("tb")
        return (na - nb) * (na - nb) / (na + nb)

    return t.select(
        key_col,
        "ta",
        "tb",
        F.aggregate(
            F.col("_arr"), F.lit(0.0), lambda acc, s: acc + term(s)
        ).alias("drift"),
    )


def rolling_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    entity_col: str,
    window_hours: int = 3,
) -> DataFrame:
    """EXACT sliding-window distinct count: for every (key, hour) the
    number of distinct entities seen in the trailing ``window_hours``
    hours — the rolling-active-users metric. Distinct is not
    decomposable, so a RANGE window cannot compute it; instead each
    (key, hour, entity) observation is fanned out to the window-end
    hours it participates in (a ``window_hours``-way explode of the
    DEDUPLICATED hourly grain, NOT of raw events) and deduplicated
    once more per window.

    Scale: raw events collapse to the (key, hour, entity) grain first
    — the explode multiplies the small grain by the window width, and
    the final aggregate shuffles on (key, window_end). For wide
    windows over high-cardinality entities switch to the HLL sketch
    state (operators/sketches.py) — union-merge over hour buckets is
    the approximate answer without the fan-out. Window ends with no
    event in their own hour still appear when covered by the trailing
    window. Returns (key, window_end, n_entities).
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    grain = df.select(
        F.col(key_col).alias("key"), hour.alias("_h"), F.col(entity_col).alias("_e")
    ).dropDuplicates()
    fanned = grain.select(
        "key",
        "_e",
        F.explode(
            F.array(
                *[
                    F.col("_h") + F.make_interval(hours=F.lit(k))
                    for k in range(window_hours)
                ]
            )
        ).alias("window_end"),
    ).dropDuplicates()
    return fanned.groupBy("key", "window_end").agg(
        F.count(F.lit(1)).alias("n_entities")
    )


def winsorized_mean(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lower_pct: float = 0.05,
    upper_pct: float = 0.95,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Winsorized per-key mean: values are CLAMPED to the key's exact
    [p_lower, p_upper] percentiles before averaging — the
    outlier-robust mean that keeps every row (unlike trimming) while
    bounding any single value's influence.

    Exactness policy: percentiles are Spark's exact interpolated
    ``percentile`` (verified interpolation-identical to DuckDB
    quantile_cont by the robust_outliers oracle); the clamped values
    are summed in DECIMAL (partition-order-independent) and the mean
    is one double division. At unbounded-group scale swap the exact
    percentile for the mergeable histogram sketch's quantiles.

    Returns (key, n, p_lo, p_hi, wmean).
    """
    stats = df.groupBy(F.col(key_col).alias("key")).agg(
        F.expr(f"percentile({value_col}, {lower_pct})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {upper_pct})").alias("p_hi"),
    )
    # stats is one row per key: broadcast fits grouping dimensions
    # (event types, languages); disable for high-cardinality keys and
    # the join falls back to a shuffle hash join
    hint = F.broadcast if broadcast_stats else (lambda d: d)
    # NULL values are dropped explicitly: Spark's greatest/least SKIP
    # NULLs, so a NULL value would silently clamp to p_lo and be
    # counted — a missing measurement must not become a p_lo one
    joined = (
        df.select(F.col(key_col).alias("key"), F.col(value_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .join(hint(stats), "key")
    )
    clamped = F.least(F.greatest(F.col("_v"), F.col("p_lo")), F.col("p_hi"))
    return (
        joined.withColumn("_c", clamped.cast("decimal(18,6)"))
        .groupBy("key", "p_lo", "p_hi")
        .agg(
            F.count("_c").alias("n"),
            (F.sum("_c").cast("double") / F.count("_c")).alias("wmean"),
        )
        .select("key", "n", "p_lo", "p_hi", "wmean")
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average per key (TWAP): each observation is
    weighted by how long it REMAINED current — the duration to the
    next observation of the same key. The plain mean over-weights
    bursts; the time-weighted one is the metric-system standard for
    irregularly sampled gauges.

    One key-partitioned lead window (shared shuffle), integer
    MICROSECOND durations × DECIMAL values summed exactly (whole
    seconds would truncate sub-second timestamps differently per
    engine), one double division at the end — bit-deterministic under
    any partitioning. The last observation per key has no successor
    and carries zero weight; keys with a single observation (zero
    total duration) yield NULL.
    Returns (key, n_obs, total_micros, twap).
    """
    w = W.partitionBy(key_col).orderBy(ts_col, id_col)
    dur = (
        F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col))
    ).cast("long")
    weighted = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("decimal(12,4)").alias("_v"),
        dur.alias("_dur"),
    )
    return (
        weighted.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.coalesce(F.sum("_dur"), F.lit(0).cast("long")).alias("total_micros"),
            F.sum(F.col("_v") * F.col("_dur").cast("decimal(18,0)")).alias("_wsum"),
        )
        .select(
            "key",
            "n_obs",
            "total_micros",
            F.try_divide(
                F.col("_wsum").cast("double"), F.col("total_micros").cast("double")
            ).alias("twap"),
        )
    )


def peak_concurrency(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    entity_col: str,
) -> DataFrame:
    """Peak simultaneous entities per (key, day): each entity's
    presence interval is [first event, last event] of that day; a
    +1/−1 boundary sweep with a running sum finds the maximum overlap
    — the classic interval-concurrency problem (license peaks,
    connection-pool sizing) as one window, no interval self-join.

    Determinism: boundaries sort by (ts, delta DESC) so a start
    arriving exactly when another interval ends counts as overlapping
    (inclusive intervals), and equal-timestamp prefix sums are
    replayable. The sweep window partitions by (key, day) — bounded by
    a day's entities per key; for heavier keys pre-bucket by hour and
    sweep bucket maxima. Returns (key, day, peak).
    """
    day = F.date_trunc("day", F.col(ts_col))
    iv = (
        df.select(
            F.col(key_col).alias("key"), day.alias("day"),
            F.col(entity_col).alias("_e"), F.col(ts_col).alias("_ts"),
        )
        .groupBy("key", "day", "_e")
        .agg(F.min("_ts").alias("_lo"), F.max("_ts").alias("_hi"))
    )
    bounds = iv.select(
        "key", "day", F.col("_lo").alias("_t"), F.lit(1).alias("_d")
    ).unionByName(
        iv.select("key", "day", F.col("_hi").alias("_t"), F.lit(-1).alias("_d"))
    )
    w = (
        W.partitionBy("key", "day")
        .orderBy(F.col("_t"), F.desc("_d"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    swept = bounds.withColumn("_run", F.sum("_d").over(w))
    return swept.groupBy("key", "day").agg(F.max("_run").alias("peak"))


def funnel_counts_deadline(
    df: DataFrame,
    steps: list[str],
    within_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-boxed funnel: like funnel_counts, but steps after the
    first only count while within ``within_seconds`` of the user's
    FIRST step-1 event — the "converted within an hour" metric.
    Single-attempt semantics: the clock anchors at the first entry
    and never restarts (a re-entry variant would reset expired
    state; this one answers "of first-touch users, how many
    converted in time").

    Same shape as the plain funnel: ONE user-keyed shuffle, events
    collect into a sorted array, a JVM-side fold carries
    (step, first_ts) — state per user is one struct. Returns
    (step, n_users) where n_users reached AT LEAST that step in time.
    """
    ev = df.select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            F.col(type_col).alias("t"),
        ).alias("_e"),
    ).filter(F.col("_e.t").isin(steps))
    per_user = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list("_e")).alias("_evs")
    )
    within_us = within_seconds * 1_000_000
    init = F.struct(
        F.lit(0).alias("step"), F.lit(0).cast("long").alias("first_us")
    )

    def advance(acc, e):
        ts_us = F.unix_micros(e["ts"])
        step, first = acc["step"], acc["first_us"]
        new_step, new_first = step, first
        for i, s in enumerate(steps):
            if i == 0:
                hit = (step == 0) & (e["t"] == s)
                new_first = F.when(hit, ts_us).otherwise(new_first)
                new_step = F.when(hit, 1).otherwise(new_step)
            else:
                hit = (step == i) & (e["t"] == s) & (ts_us <= first + within_us)
                new_step = F.when(hit, i + 1).otherwise(new_step)
        return F.struct(new_step.alias("step"), new_first.alias("first_us"))

    fold = F.aggregate(F.col("_evs"), init, advance, lambda acc: acc["step"])
    per = per_user.select(user_col, fold.alias("max_step"))
    reached = per.filter(F.col("max_step") >= 1).select(
        F.explode(F.sequence(F.lit(1), F.col("max_step"))).alias("step")
    )
    return reached.groupBy("step").agg(F.count(F.lit(1)).alias("n_users"))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "id_a",
    right_id: str = "id_b",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Interval×interval overlap join without an inequality cross
    join: each interval explodes to the coarse time buckets it covers,
    candidates come from a plain equi-join on the bucket, then the
    exact closed-interval test (s_a <= e_b AND s_b <= e_a) filters and
    the pair dedups (a pair sharing n buckets appears n times). The
    interval generalization of the point-in-window range join above.

    Scale: shuffle is linear in Σ buckets-per-interval; pick
    ``bucket_us`` near the typical interval length so that factor
    stays O(1). Degenerate LONG intervals (spanning thousands of
    buckets) are the skew risk — cap or split them upstream, same
    policy as any hot-key mitigation. Both inputs: (id, start_us,
    end_us) with microsecond integers, closed intervals.

    Returns (left_id, right_id, overlap_us >= 0).
    """
    def buckets(df: DataFrame, idc: str, tag: str) -> DataFrame:
        s, e = F.col(start_col), F.col(end_col)
        # inverted intervals (end < start) are EMPTY and dropped —
        # without this, Spark's sequence(a, b) with b < a silently
        # generates a DESCENDING bucket list (the mixture_upsample
        # footgun) and the pair would appear under wrong buckets
        return df.filter(e >= s).select(
            F.col(idc),
            s.alias(f"_s{tag}"),
            e.alias(f"_e{tag}"),
            F.explode(
                F.sequence(
                    F.floor(s / bucket_us).cast("long"),
                    F.floor(e / bucket_us).cast("long"),
                )
            ).alias("_b"),
        )

    la = buckets(left, left_id, "a")
    rb = buckets(right, right_id, "b")
    return (
        la.join(rb, "_b")
        .filter(
            (F.col("_sa") <= F.col("_eb")) & (F.col("_sb") <= F.col("_ea"))
        )
        .dropDuplicates([left_id, right_id])
        .select(
            left_id,
            right_id,
            (
                F.least("_ea", "_eb") - F.greatest("_sa", "_sb")
            ).alias("overlap_us"),
        )
    )


def cusum_rate_shift(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    alarm_mult: int = 2,
) -> DataFrame:
    """One-sided CUSUM rate-shift detection per key (Page 1954), in
    EXACT integer arithmetic: over the hour-ordered event counts x_t,
    S_t = max(0, S_{t-1} + x_t·H − T)  (H = observed hours, T = total
    events, so x_t·H − T is the mean-centered count scaled by H — no
    division, no floats), alarm when S_t > alarm_mult·T·H... scaled
    consistently: alarm when S_t > alarm_mult·T (S is in H-units of
    events, T = mean·H, so the threshold is alarm_mult× the mean
    sustained for H hours-worth of excess).

    State per key is the HOURLY series (time-range-bounded, not
    corpus-bounded — the top_session_paths collect policy), folded
    once. Gaps (hours with zero events) are not materialized: the
    detector sees observed hours only, documented — resample_forward_
    fill feeds it a dense grid when zero-hours must count.

    Returns (key, n_hours, total, n_alarms, peak_s) — all BIGINT,
    replayable bit-for-bit by an external engine.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = df.groupBy(F.col(key_col), hour.alias("_hr")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_key = hourly.groupBy(key_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_hr", "_c"))), lambda s: s["_c"]
        ).alias("_xs"),
        F.sum("_c").alias("total"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    init = F.struct(
        F.lit(0).cast("bigint").alias("s"),
        F.lit(0).cast("bigint").alias("a"),
        F.lit(0).cast("bigint").alias("p"),
    )

    def step(acc: Column, x: Column) -> Column:
        s2 = F.greatest(
            F.lit(0).cast("bigint"),
            acc["s"] + x * F.col("n_hours") - F.col("total"),
        )
        return F.struct(
            s2.alias("s"),
            (
                acc["a"]
                + F.when(s2 > F.lit(alarm_mult) * F.col("total"), 1).otherwise(0)
            ).alias("a"),
            F.greatest(acc["p"], s2).alias("p"),
        )

    folded = per_key.withColumn("_f", F.aggregate("_xs", init, step))
    return folded.select(
        F.col(key_col),
        "n_hours",
        "total",
        F.col("_f")["a"].alias("n_alarms"),
        F.col("_f")["p"].alias("peak_s"),
    )


def funnel_advance(
    df: DataFrame,
    steps: list[str],
    state: DataFrame | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Incremental funnel: advance each user's ordered-step counter
    from a PRIOR state (user, max_step) over a new batch of events —
    the resumable form of funnel_steps (state=None ≡ funnel_steps).
    Users present only in the state pass through unchanged; the fold
    starts from their stored step, so re-processing history is never
    needed. Contract: per-user event time is monotone ACROSS batches
    (the CDC-mirror ordered-replay contract) — a late event belonging
    before the stored step's evidence cannot rewind the counter.
    Returns (user, max_step) — the updated state."""
    ev = df.select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            F.col(type_col).alias("t"),
        ).alias("_e"),
    ).filter(F.col("_e.t").isin(steps))
    per_user = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list("_e")).alias("_evs")
    )
    if state is not None:
        per_user = per_user.join(
            state.select(F.col(user_col), F.col("max_step").alias("_init")),
            user_col,
            "full",
        ).select(
            user_col,
            F.coalesce("_evs", F.array().cast(per_user.schema["_evs"].dataType)).alias(
                "_evs"
            ),
            F.coalesce("_init", F.lit(0)).alias("_init"),
        )
    else:
        per_user = per_user.withColumn("_init", F.lit(0))

    def advance(acc, e):
        out = acc
        for i, s in enumerate(steps):
            out = F.when((acc == i) & (e["t"] == s), i + 1).otherwise(out)
        return out

    fold = F.aggregate(F.col("_evs"), F.col("_init"), advance)
    return per_user.select(user_col, fold.alias("max_step"))


def survival_km(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier retention survival with right-censoring — the
    product-limit estimator S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) over user
    lifetimes (days between first and last event). Users whose last
    event falls within ``censor_days`` of the corpus end are CENSORED
    (still alive — treating them as churned is the classic retention
    bias); they leave the risk set without contributing a death.

    Scale shape: one (user) aggregate reduces the event log to a
    lifetime row per user; everything after runs on the DAY-grain grid
    (≤ corpus-span rows — calendar-sized, never user-sized), so the
    single ordered window and the prefix-product fold are bounded.
    Survival multiplies (1 − d/n) factors — each one double division
    of exact integers — IN LIFETIME ORDER via a sorted-array fold
    (the engine's deterministic-double policy; products reorder as
    badly as sums). Returns (t_days, n_risk, n_deaths, survival).
    """
    from pyspark.sql import Window

    u = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.to_date(F.min(ts_col)).alias("_f"),
        F.to_date(F.max(ts_col)).alias("_l"),
    )
    mx = u.agg(F.max("_l").alias("_m"))
    lab = u.crossJoin(F.broadcast(mx)).select(
        F.datediff(F.col("_l"), F.col("_f")).alias("t_days"),
        F.when(
            F.col("_l") >= F.date_sub(F.col("_m"), censor_days), 1
        ).otherwise(0).alias("_cen"),
    )
    g = lab.groupBy("t_days").agg(
        F.sum(1 - F.col("_cen")).cast("long").alias("n_deaths"),
        F.sum("_cen").cast("long").alias("_c"),
    )
    tot = g.agg(F.sum(F.col("n_deaths") + F.col("_c")).cast("long").alias("_n"))
    w_prior = (
        Window.orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = (
        g.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("_n")
            - F.coalesce(
                F.sum(F.col("n_deaths") + F.col("_c")).over(w_prior),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("_rn", F.row_number().over(Window.orderBy("t_days")))
    )
    arr = r.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("t_days", "n_deaths", "n_risk"))
        ).alias("_a")
    )
    factors = lambda s: F.lit(1.0) - s["n_deaths"].cast("double") / s[  # noqa: E731
        "n_risk"
    ].cast("double")
    return (
        r.crossJoin(F.broadcast(arr))
        .select(
            "t_days",
            "n_risk",
            "n_deaths",
            F.aggregate(
                F.slice(F.col("_a"), 1, F.col("_rn")),
                F.lit(1.0),
                lambda acc, s: acc * factors(s),
            ).alias("survival"),
        )
    )


def psi_drift(
    df: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    half_col: str = "event_id",
    bin_width: float = 10.0,
    threshold: float = 0.2,
) -> DataFrame:
    """Population Stability Index per key between the two snapshot
    halves — the industry-standard drift score beside the ln-free
    distribution_drift. With +1 Laplace smoothing over each key's
    union bin set, every PSI term reduces to integers over ONE
    per-key denominator:

        pa/pb = x/y,  pa − pb = (x − y)/D
        x = (ca+1)(Nb+B),  y = (cb+1)(Na+B),  D = (Na+B)(Nb+B)
        PSI = Σ_bins (x − y)·(ln x − ln y)  /  (D · 1e6)

    with ln quantized to integer micro-nats DRIVER-side over the
    distinct x/y values (bounded: ≤ 2·bins·keys rows collect, the DSIR
    ln-portability pattern — same-host libm is the one documented
    boundary). The whole sum is exact BIGINT; one double division per
    key at the end. At corpus scale x·Δln and D belong in DECIMAL —
    counts beyond ~1e9 per key overflow the BIGINT products.
    Returns (key, n_bins, psi, drift)."""
    import math

    b = df.select(
        F.col(type_col).alias("_k"),
        (F.col(half_col) % 2).alias("_h"),
        F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("_bin"),
    )
    c = b.groupBy("_k", "_bin").agg(
        F.sum(F.when(F.col("_h") == 0, 1).otherwise(0)).cast("long").alias("_ca"),
        F.sum(F.when(F.col("_h") == 1, 1).otherwise(0)).cast("long").alias("_cb"),
    )
    t = c.groupBy("_k").agg(
        F.sum("_ca").cast("long").alias("_na"),
        F.sum("_cb").cast("long").alias("_nb"),
        F.count(F.lit(1)).alias("_nbins"),
    )
    j = (
        c.join(t, "_k")
        .withColumn("_x", (F.col("_ca") + 1) * (F.col("_nb") + F.col("_nbins")))
        .withColumn("_y", (F.col("_cb") + 1) * (F.col("_na") + F.col("_nbins")))
        .withColumn(
            "_d", (F.col("_na") + F.col("_nbins")) * (F.col("_nb") + F.col("_nbins"))
        )
    )
    args = sorted(
        r["arg"]
        for r in j.select(F.col("_x").alias("arg"))
        .union(j.select(F.col("_y").alias("arg")))
        .distinct()
        .collect()
    )
    spark = df.sparkSession
    lt = spark.createDataFrame(
        [(a, int(math.floor(math.log(a) * 1_000_000 + 0.5))) for a in args],
        "arg bigint, lnm bigint",
    )
    j2 = (
        j.join(F.broadcast(lt.withColumnRenamed("lnm", "_lnx")), j["_x"] == lt["arg"])
        .drop("arg")
        .join(
            F.broadcast(lt.withColumnRenamed("lnm", "_lny")),
            F.col("_y") == F.col("arg"),
        )
        .drop("arg")
    )
    s = (
        j2.groupBy("_k", "_d", "_nbins")
        .agg(
            F.sum((F.col("_x") - F.col("_y")) * (F.col("_lnx") - F.col("_lny")))
            .cast("long")
            .alias("_num")
        )
    )
    psi = F.col("_num").cast("string").cast("double") / (
        F.col("_d").cast("string").cast("double") * F.lit(1_000_000.0)
    )
    return s.select(
        F.col("_k").alias(type_col),
        F.col("_nbins").cast("long").alias("n_bins"),
        psi.alias("psi"),
        (psi > F.lit(threshold)).alias("drift"),
    )


def position_attribution(
    purchases: DataFrame,
    touches: DataFrame,
    lookback_us: int = 3_600_000_000,
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution beside the
    last-touch operator: every click/view inside the lookback window
    shares a purchase's value 40% first / 40% last / 20% split across
    middles. Credit is INTEGER micro-units per touch —

        k=1 → 1_000_000;  k=2 → 500_000 each;
        k≥3 → 400_000 ends, 200_000 div (k−2) per middle

    (the div truncation short-changes totals by < k−2 micro-units per
    purchase — documented, and replayed identically by any engine) —
    times the DECIMAL(18,4)-scaled value, so every sum is an exact
    BIGINT and only the final unit conversion divides. Touch ordering
    ties break on (ts, channel). Purchases with no touch credit
    'none' in full. The join is user-keyed (per-user event counts are
    operationally bounded); per-purchase windows are touch-count
    sized. Returns (channel, n_credits, total_value)."""
    p = purchases.select(
        "event_id",
        F.col("user_id").alias("_u"),
        F.col("ts").alias("_pts"),
        (F.col("value").cast("decimal(18,4)") * 10000)
        .cast("long")
        .alias("_v4"),
    )
    t = touches.select(
        F.col("user_id").alias("_u"),
        F.col("ts").alias("_tts"),
        "channel",
    )
    j = p.join(t, "_u", "left").withColumn(
        "_ok",
        F.col("_tts").isNotNull()
        & (F.col("_tts") <= F.col("_pts"))
        & (F.unix_micros("_pts") - F.unix_micros("_tts") <= lookback_us),
    )
    j = j.select(
        "event_id",
        "_v4",
        F.when(F.col("_ok"), F.col("_tts")).alias("_tts"),
        F.when(F.col("_ok"), F.col("channel")).alias("_ch"),
    )
    w = W.partitionBy("event_id").orderBy(
        F.col("_tts").asc_nulls_last(), F.col("_ch").asc_nulls_last()
    )
    wk = W.partitionBy("event_id")
    r = (
        j.withColumn("_rn", F.row_number().over(w))
        .withColumn("_k", F.sum(F.col("_ch").isNotNull().cast("int")).over(wk))
        # one row per (purchase, valid touch); a no-touch purchase —
        # including one whose user HAS touches, all outside the
        # window — collapses to exactly one null row (rn = 1)
        .filter(
            F.col("_ch").isNotNull()
            | ((F.col("_k") == 0) & (F.col("_rn") == 1))
        )
    )
    wmicro = (
        F.when(F.col("_k") == 0, F.lit(1_000_000))
        .when(F.col("_k") == 1, F.lit(1_000_000))
        .when(F.col("_k") == 2, F.lit(500_000))
        .when(F.col("_rn") == 1, F.lit(400_000))
        .when(F.col("_rn") == F.col("_k"), F.lit(400_000))
        .otherwise(F.expr("200000 div (_k - 2)"))
    )
    return (
        r.withColumn("_w", wmicro)
        .groupBy(F.coalesce(F.col("_ch"), F.lit("none")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum(F.col("_v4") * F.col("_w")).cast("long").alias("_cr"),
        )
        .select(
            "channel",
            "n_credits",
            (
                F.col("_cr").cast("string").cast("double") / F.lit(1.0e10)
            ).alias("total_value"),
        )
    )


def seasonal_mase(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    season: int = 24,
) -> DataFrame:
    """Forecast-quality gate for the seasonal-naive model: per key,
    build the gap-filled hourly count series (a generated hour spine —
    zero hours count, they are real observations), forecast each hour
    with the value ``season`` hours earlier, and score

        MASE = Σ|c_h − c_{h−24}|  /  Σ|c_h − c_{h−1}|

    over the common eval window (h ≥ season) — the scale-free Hyndman
    & Koehler metric as a ratio of two exact BIGINT sums, one double
    division. MASE < 1 ⇒ the seasonal pattern beats naive persistence
    ⇒ the key is worth a real forecaster. The spine/window is per-key
    HOUR-grain (operationally bounded — days × 24 rows), never the
    event grain. Returns (key, n_eval, sae_seasonal, sae_naive,
    mase)."""
    hc = df.groupBy(
        F.col(type_col).alias("_k"),
        F.date_trunc("hour", F.col(ts_col)).alias("_h"),
    ).agg(F.count(F.lit(1)).alias("_c"))
    rng = hc.groupBy("_k").agg(F.min("_h").alias("_lo"), F.max("_h").alias("_hi"))
    spine = rng.select(
        "_k",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("interval 1 hour"))
        ).alias("_h"),
    )
    g = spine.join(hc, ["_k", "_h"], "left").select(
        "_k", "_h", F.coalesce(F.col("_c"), F.lit(0)).cast("long").alias("_c")
    )
    w = W.partitionBy("_k").orderBy("_h")
    g = (
        g.withColumn("_rn", F.row_number().over(w))
        .withColumn("_c1", F.lag("_c", 1).over(w))
        .withColumn("_cs", F.lag("_c", season).over(w))
    )
    ev = g.filter(F.col("_rn") > season)
    agg = ev.groupBy("_k").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(F.abs(F.col("_c") - F.col("_cs"))).cast("long").alias("sae_seasonal"),
        F.sum(F.abs(F.col("_c") - F.col("_c1"))).cast("long").alias("sae_naive"),
    )
    return agg.select(
        F.col("_k").alias(type_col),
        "n_eval",
        "sae_seasonal",
        "sae_naive",
        (
            F.col("sae_seasonal").cast("double")
            / F.col("sae_naive").cast("double")
        ).alias("mase"),
    )


def burst_smoothing(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    gamma: int = 2,
) -> DataFrame:
    """Kleinberg-style burst detection (the 2-state automaton of
    "Bursty and Hierarchical Structure in Streams", binned form): per
    key, the gap-filled hourly count series is reduced to a high/low
    observation (count·H > 2·total — strictly above twice the mean,
    integer cross-multiplication), then a 2-state Viterbi DP finds the
    minimum-cost burst labeling where each label-observation mismatch
    costs 1 and each state switch costs ``gamma`` — smoothing out
    single-hour blips that a plain threshold would call bursts.

    Exactness: the DP folds PACKED integers ``cost·2²⁰ + burst_hours``
    (the unigram-Viterbi packing trick), so plain ``min()``/``least()``
    resolves cost ties toward FEWER burst hours identically in both
    engines; costs stay < 2⁴³ for series up to a million hours.

    Scale shape: the hourly aggregation is the only corpus-scale
    shuffle; the DP runs on ONE array per key (time-bounded — hours in
    the retention window, not event-grain), folded with a single
    ``aggregate`` expression. A per-key sequential DP cannot be
    split across tasks without changing the answer; keys parallelize.
    Returns (key, n_hours, n_high, smooth_cost, burst_hours)."""
    pack = 1 << 20
    gp = gamma * pack
    hc = df.groupBy(
        F.col(type_col).alias("_k"),
        F.date_trunc("hour", F.col(ts_col)).alias("_h"),
    ).agg(F.count(F.lit(1)).alias("_c"))
    rng = hc.groupBy("_k").agg(F.min("_h").alias("_lo"), F.max("_h").alias("_hi"))
    spine = rng.select(
        "_k",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("interval 1 hour"))
        ).alias("_h"),
    )
    g = spine.join(hc, ["_k", "_h"], "left").select(
        "_k", "_h", F.coalesce(F.col("_c"), F.lit(0)).cast("long").alias("_c")
    )
    tw = W.partitionBy("_k")
    g = g.withColumn(
        "_hi_bit",
        (
            F.col("_c") * F.count(F.lit(1)).over(tw)
            > 2 * F.sum("_c").over(tw)
        ).cast("long"),
    )
    seq = g.groupBy("_k").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("_hi_bit").cast("long").alias("n_high"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("_h", "_hi_bit"))),
            lambda s: s["_hi_bit"],
        ).alias("_bits"),
    )
    init = F.struct(
        F.lit(0).cast("long").alias("k0"), F.lit(gp).cast("long").alias("k1")
    )
    folded = seq.withColumn(
        "_dp",
        F.aggregate(
            "_bits",
            init,
            lambda acc, h: F.struct(
                (
                    F.least(acc["k0"], acc["k1"] + F.lit(gp)) + h * F.lit(pack)
                ).alias("k0"),
                (
                    F.least(acc["k1"], acc["k0"] + F.lit(gp))
                    + (1 - h) * F.lit(pack)
                    + F.lit(1)
                ).alias("k1"),
            ),
        ),
    ).withColumn("_best", F.least(F.col("_dp.k0"), F.col("_dp.k1")))
    return folded.select(
        F.col("_k").alias(type_col),
        "n_hours",
        "n_high",
        F.expr(f"_best div {pack}").alias("smooth_cost"),
        (F.col("_best") % pack).alias("burst_hours"),
    )


def markov_removal_attribution(
    events: DataFrame,
    channels: tuple[str, ...],
    absorbing: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    steps: int = 4,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Markov-chain (removal-effect) attribution — the data-driven
    successor of last-touch/position-based: model user journeys as a
    first-order chain over event types with ``absorbing`` as the
    absorbing conversion state, score each channel by how much the
    K-step conversion probability drops when that channel is REMOVED
    (its incoming transitions lost, NOT renormalized — the walker that
    would have gone there is lost, the standard removal-effect
    semantics; denominators stay the original out-totals).

    Exactness: absorption probabilities are integer-scaled
    (``scale``-nanoprobabilities) with one floor division per DP cell
    — the PageRank integer-recurrence discipline — so both engines
    replay the recurrence bit-for-bit; the removal effect is one final
    double division.

    Scale shape: the event-grain work is ONE user-keyed lead window
    (transition pairs) + one first-touch window + one distinct count.
    Everything after runs on the transition MATRIX — dictionary-sized
    (|event types|²) — so the (1 base + |channels|) × ``steps`` DP
    rounds are joins between broadcast-tiny dims regardless of corpus
    size. Returns (removed_channel, cvr_scaled, removal_effect) with
    '(none)' = the intact-chain baseline (NULL effect)."""
    w = W.partitionBy(user_col).orderBy(ts_col, tie_col)
    # r07 note: settling this event-grain window (localCheckpoint) was
    # A/B'd and REJECTED — 7.0 -> 8.5 s wall: the pair aggregate and
    # the first-touch branch share the window's exchange via
    # ReuseExchange already, so the settle only added a 600k-row
    # materialization. Settles pay off when the reused subtree is
    # EXPENSIVE past its exchange (see ktruss/LPA), not here.
    base = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("cur"),
        F.lead(type_col).over(w).alias("nxt"),
        F.row_number().over(w).alias("_rn"),
    )
    pairs = (
        base.filter(
            F.col("nxt").isNotNull() & (F.col("cur") != absorbing)
        )
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = pairs.groupBy("cur").agg(F.sum("n").cast("long").alias("t"))
    nodes = (
        pairs.select("cur")
        .distinct()
        .unionByName(
            pairs.sparkSession.createDataFrame([(absorbing,)], "cur string")
        )
        .distinct()
        .select(F.col("cur").alias("node"))
    )
    ft = (
        base.filter(F.col("_rn") == 1)
        .groupBy(F.col("cur").alias("et"))
        .agg(F.count(F.lit(1)).cast("long").alias("nf"))
        .localCheckpoint(eager=False)
    )
    nu = ft.agg(F.sum("nf").cast("long").alias("_nu"))

    def absorb_cvr(removed: str | None):
        pv = pairs if removed is None else pairs.filter(F.col("nxt") != removed)
        r = nodes.select(
            "node",
            F.when(F.col("node") == absorbing, F.lit(scale))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("val"),
        )
        for _ in range(steps):
            s = (
                pv.join(
                    F.broadcast(r), pv["nxt"] == F.col("node")
                )
                .join(F.broadcast(tot), "cur")
                .groupBy("cur")
                .agg(F.expr("sum(n * val) div max(t)").cast("long").alias("v"))
            )
            r = nodes.join(F.broadcast(s), nodes["node"] == s["cur"], "left").select(
                "node",
                F.when(F.col("node") == absorbing, F.lit(scale))
                .otherwise(F.coalesce(F.col("v"), F.lit(0)))
                .cast("long")
                .alias("val"),
            )
        ftv = ft if removed is None else ft.filter(F.col("et") != removed)
        return (
            ftv.join(F.broadcast(r), ftv["et"] == F.col("node"))
            .agg(F.sum(F.col("nf") * F.col("val")).cast("long").alias("_s"))
            .crossJoin(F.broadcast(nu))
            .select(F.expr("_s div _nu").cast("long").alias("cvr_scaled"))
        )

    base_cvr = absorb_cvr(None).localCheckpoint(eager=False)
    out = base_cvr.select(
        F.lit("(none)").alias("removed_channel"),
        F.col("cvr_scaled").alias("_base"),
        F.col("cvr_scaled"),
    )
    for c in channels:
        out = out.unionByName(
            absorb_cvr(c)
            .crossJoin(
                F.broadcast(base_cvr.select(F.col("cvr_scaled").alias("_base")))
            )
            .select(F.lit(c).alias("removed_channel"), "_base", "cvr_scaled")
        )
    return out.select(
        "removed_channel",
        "cvr_scaled",
        F.when(
            F.col("removed_channel") != "(none)",
            (F.col("_base") - F.col("cvr_scaled")).cast("double")
            / F.col("_base").cast("double"),
        ).alias("removal_effect"),
    )


def weighted_median_arrow(
    df: DataFrame, key_col: str, value_col: str, weight_col: str
) -> DataFrame:
    """Per-key weighted LOWER median computed in an Arrow-batched
    applyInPandas UDAF — the sanctioned Python escape hatch
    demonstrated on an operator an external engine can still verify
    exactly: the result is the smallest v whose cumulative weight
    reaches half the total (2·cumw ≥ W, integer comparison), so the
    pandas path and a SQL window replay agree bit-for-bit. Inputs must
    be integer-valued. One grouped shuffle; each group sorts in-memory
    (per-key data must fit an executor — the same per-key contract as
    the window ops; pre-aggregate to the distinct-value grain first
    when values repeat heavily, which also bounds the batch).
    Returns (key, total_w, wmedian)."""
    import pandas as pd

    def wmed(pdf: pd.DataFrame) -> pd.DataFrame:
        g = (
            pdf.groupby("_v", as_index=False)["_w"]
            .sum()
            .sort_values("_v", kind="mergesort")
        )
        cum = g["_w"].cumsum()
        total = int(g["_w"].sum())
        idx = (2 * cum >= total).idxmax()
        return pd.DataFrame(
            {
                "key": [pdf["_k"].iloc[0]],
                "total_w": [total],
                "wmedian": [int(g["_v"].loc[idx])],
            }
        )

    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(value_col).cast("long").alias("_v"),
        F.col(weight_col).cast("long").alias("_w"),
    )
    return base.groupBy("_k").applyInPandas(
        wmed, "key string, total_w long, wmedian long"
    )


def ab_test_ztest(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
) -> DataFrame:
    """Two-proportion z-test for an A/B split (variant = user id
    parity — the deterministic stand-in for an assignment table):
    conversion = the user is an ABOVE-AVERAGE ``convert_type`` emitter
    (cnt_u·n_users > total, integer cross-multiplication — a plain
    has-one flag is degenerate on dense streams where every user
    fires every type). All counts are exact integers from ONE
    user-grain aggregate; the pooled-variance z statistic is a
    fixed-order double expression (sqrt is the one engine-portable
    libm call — IEEE correctly-rounded), NULL when the pooled
    variance is zero. Returns one row
    (n_a, conv_a, n_b, conv_b, p_a, p_b, z)."""
    cnts = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.sum(
            F.when(F.col(type_col) == convert_type, 1).otherwise(0)
        )
        .cast("long")
        .alias("_k")
    )
    tot = cnts.agg(
        F.sum("_k").cast("long").alias("_tot"),
        F.count(F.lit(1)).cast("long").alias("_nu"),
    )
    u = cnts.crossJoin(F.broadcast(tot)).select(
        "_u",
        (F.col("_k") * F.col("_nu") > F.col("_tot")).cast("int").alias("_c"),
    )
    agg = u.agg(
        F.sum(F.when(F.col("_u") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("_u") % 2 == 0, F.col("_c")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("_u") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("_u") % 2 == 1, F.col("_c")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    na, ca = F.col("n_a").cast("double"), F.col("conv_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("conv_b").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    return agg.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        pa.alias("p_a"),
        pb.alias("p_b"),
        F.when(
            (F.col("conv_a") + F.col("conv_b") > 0)
            & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b")),
            (pa - pb)
            / F.sqrt(
                pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
            ),
        ).alias("z"),
    )


def interval_coalesce(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key (the
    gaps-and-islands idiom): an interval starts a new span when its
    start exceeds the running max of prior ends (cummax window — the
    carry that plain lag() gets wrong when an early interval swallows
    later ones). Per-key windows only; timestamps compare as integer
    epoch seconds. Returns one row per key:
    (key, n_intervals, n_spans, covered_seconds)."""
    s = F.unix_timestamp(F.col(start_col))
    e = F.unix_timestamp(F.col(end_col))
    g = df.select(key_col, s.alias("_s"), e.alias("_e"))
    w = W.partitionBy(key_col).orderBy("_s", "_e").rowsBetween(
        W.unboundedPreceding, -1
    )
    g = g.withColumn("_carry", F.max("_e").over(w)).withColumn(
        "_new", (F.col("_carry").isNull() | (F.col("_s") > F.col("_carry"))).cast("long")
    )
    ws = W.partitionBy(key_col).orderBy("_s", "_e").rowsBetween(
        W.unboundedPreceding, 0
    )
    g = g.withColumn("_span", F.sum("_new").over(ws))
    spans = g.groupBy(key_col, "_span").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.min("_s").alias("_lo"),
        F.max("_e").alias("_hi"),
    )
    return spans.groupBy(key_col).agg(
        F.sum("_n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("_hi") - F.col("_lo")).cast("long").alias("covered_seconds"),
    )


def bot_regularity(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_events: int = 20,
    bot_min_events: int = 50,
    max_std_seconds: int = 30,
) -> DataFrame:
    """Automation/bot detection by inter-arrival REGULARITY: humans
    produce bursty, high-variance gaps; schedulers tick like clocks.
    Per user, gaps are exact epoch-microsecond differences (one lag
    window), and the gap variance is formed without ever leaving
    integers —

        var_num = m·Σg² − (Σg)²ᅟᅟvar_den = m²ᅟᅟ(m = n−1 gaps)

    accumulated in DECIMAL(38,0) (µs² fourth-power-free but still
    ~10²⁴ magnitudes). The bot flag is an INTEGER cross-multiplication,
    never a float compare:

        is_bot  ⇔  n ≥ bot_min_events  AND
                   var_num < max_std_seconds²·10¹² · var_den

    (std < 30 s in µs² units). Output is user-grain, restricted to
    users with ≥ ``min_events`` so the report stays review-sized;
    mean gap and variance ride along as single exact divisions. One
    user-keyed window + one groupBy — the same shuffle key, so Spark
    reuses the partitioning; no self-joins at any scale."""
    dec = "decimal(38,0)"
    w = W.partitionBy(user_col).orderBy("_us")
    gaps = df.select(
        user_col, F.unix_micros(F.col(ts_col)).alias("_us")
    ).withColumn("_g", (F.col("_us") - F.lag("_us", 1).over(w)).cast(dec))
    st = gaps.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("_g").cast(dec).alias("_m"),
        F.sum("_g").cast(dec).alias("_sg"),
        F.sum(F.col("_g") * F.col("_g")).cast(dec).alias("_sg2"),
    )
    st = st.filter(F.col("n_events") >= min_events)
    var_num = (F.col("_m") * F.col("_sg2") - F.col("_sg") * F.col("_sg")).cast(
        dec
    )
    var_den = (F.col("_m") * F.col("_m")).cast(dec)
    thresh = max_std_seconds * max_std_seconds * 1_000_000_000_000
    as_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    return st.select(
        user_col,
        "n_events",
        (as_d(F.col("_sg")) / as_d(F.col("_m"))).alias("mean_gap_us"),
        (as_d(var_num) / as_d(var_den)).alias("var_gap_us2"),
        (
            (F.col("n_events") >= bot_min_events)
            & (var_num < F.lit(thresh).cast(dec) * var_den)
        ).alias("is_bot"),
    )
