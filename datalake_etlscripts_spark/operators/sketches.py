"""Mergeable distinct-count sketch state (HLL).

The reference's calc_summary.py:53-81 recomputes counts over the full
collection every run; summary.incremental_summary fixes that for plain
counts, but DISTINCT counts are not self-maintainable from deltas —
you cannot decrement a distinct count. The standard 100 TB answer is
mergeable sketch state: keep a per-group HyperLogLog sketch (Apache
DataSketches, built into Spark 4 as ``hll_sketch_agg``/``hll_union``),
fold each new batch's sketches in with a union-merge, and estimate on
read. The base table is scanned once per batch — never re-scanned —
and the stored state is a few KB per group.

Union-merge also gives hierarchy rollups for free: nation-level
sketches union into region-level without touching the fact table
(the "hypertable rollup" shape — coarse grains derived from fine).

All operators are JVM-side built-ins: one shuffle per groupBy, sketch
payloads are small binary columns, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH_COL = "sketch"


def distinct_sketch_table(
    df: DataFrame, keys: list[str], value: str, lgk: int = 12
) -> DataFrame:
    """Build per-group HLL sketch state: (*keys, sketch BINARY).
    lgk=12 → ~1.6% relative standard error, ≤ 4 KB per group."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value), F.lit(lgk)).alias(SKETCH_COL)
    )


def merge_sketch_tables(*tables: DataFrame) -> DataFrame:
    """Union-merge sketch states (the incremental-maintenance step:
    yesterday's state ∪ today's batch state). Groups present in any
    input survive; same keys' sketches union losslessly."""
    keys = [c for c in tables[0].columns if c != SKETCH_COL]
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*keys).agg(
        F.hll_union_agg(F.col(SKETCH_COL), F.lit(True)).alias(SKETCH_COL)
    )


def rollup_sketches(state: DataFrame, coarser_keys: list[str]) -> DataFrame:
    """Derive a coarser-grain sketch table by union-merging the fine
    grain — no fact-table access."""
    return state.groupBy(*coarser_keys).agg(
        F.hll_union_agg(F.col(SKETCH_COL), F.lit(True)).alias(SKETCH_COL)
    )


def estimate_distinct(state: DataFrame, alias: str = "approx_distinct") -> DataFrame:
    """Readable view of sketch state: keys + estimated distinct count."""
    keys = [c for c in state.columns if c != SKETCH_COL]
    return state.select(
        *keys, F.hll_sketch_estimate(F.col(SKETCH_COL)).alias(alias)
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable FREQUENCY state (the counts analogue of
# the HLL distinct state above). Spark ships count_min_sketch() as an
# opaque binary with no SQL-side estimator or merge, so the sketch is
# built arithmetically as a TABLE of (depth, bucket, n) counters:
#   - mergeable by union + sum (exact — counter addition is lossless,
#     unlike re-aggregating raw data), so per-batch sketches fold into
#     running state without rescanning history;
#   - estimable in SQL: point estimate for an item = min over depths
#     of its counter (classic CM overestimate ≤ εN with prob 1−δ);
#   - sized (depth × width) counters regardless of corpus size.
# Hash lanes are Kirsch-Mitzenmacher over xxhash64 like the minhash
# signatures (operators/dedup.py) — JVM-side, no UDF.
# ---------------------------------------------------------------------------

CMS_DEPTH = 5
CMS_WIDTH = 2048


def _cms_bucket(
    item: F.Column, depth_idx: int, width: int, scheme: str = "xxhash64"
) -> F.Column:
    """Kirsch-Mitzenmacher lane bucket. ``xxhash64`` is the production
    scheme (JVM-side, fastest). ``md5`` derives the two base hashes
    from md5 hex prefixes with the seed folded into the input — ~2×
    slower but reproducible in ANY engine with md5 (DuckDB included),
    which makes CMS estimates oracle-checkable cross-engine."""
    if scheme == "xxhash64":
        h1 = F.xxhash64(item, F.lit(101)).bitwiseAND(F.lit(0x7FFFFFFF))
        h2 = F.xxhash64(item, F.lit(202)).bitwiseAND(F.lit(0x7FFFFFFF))
    elif scheme == "md5":
        h1 = F.conv(
            F.substring(F.md5(F.concat(item, F.lit("|101"))), 1, 8), 16, 10
        ).cast("long")
        h2 = F.conv(
            F.substring(F.md5(F.concat(item, F.lit("|202"))), 1, 8), 16, 10
        ).cast("long")
    else:
        raise ValueError(f"unknown CMS hash scheme {scheme!r}")
    return (h1 + F.lit(depth_idx) * h2) % F.lit(width)


def cms_sketch_table(
    df: DataFrame,
    item: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight: str | None = None,
    scheme: str = "xxhash64",
) -> DataFrame:
    """Build count-min state from item rows: (depth, bucket, n).
    One explode to ``depth`` counter updates per row, one shuffle of
    (depth, bucket) keys — map-side combined, so shuffle volume is
    bounded by depth × width per input partition, not by row count."""
    w = F.col(weight) if weight else F.lit(1).cast("long")
    # NULL items are excluded (SQL count semantics) — xxhash64(NULL)
    # is a fixed per-seed value, so counting NULLs would inflate one
    # lane set and overcount every term colliding with it
    df = df.filter(F.col(item).isNotNull())
    lanes = df.select(
        F.posexplode(
            F.array(
                *[_cms_bucket(F.col(item), d, width, scheme) for d in range(depth)]
            )
        ).alias("depth", "bucket"),
        w.alias("_w"),
    )
    return lanes.groupBy("depth", "bucket").agg(F.sum("_w").alias("n"))


def merge_cms_tables(*tables: DataFrame) -> DataFrame:
    """Fold sketch states (running state ∪ new batch): counter-wise sum.
    Exact — merging per-batch sketches equals sketching the whole."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("depth", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(
    state: DataFrame,
    items: DataFrame,
    item: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    scheme: str = "xxhash64",
) -> DataFrame:
    """Point-estimate the frequency of each item in ``items`` against
    sketch state: min over depths of the item's counter. The sketch
    state is counter-sized — broadcast it so per-item lookup is a
    map-side join, no shuffle of the item side."""
    lanes = items.filter(F.col(item).isNotNull()).select(
        F.col(item),
        F.posexplode(
            F.array(
                *[_cms_bucket(F.col(item), d, width, scheme) for d in range(depth)]
            )
        ).alias("depth", "bucket"),
    )
    return (
        lanes.join(F.broadcast(state), ["depth", "bucket"], "left")
        .groupBy(item)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("approx_count"))
    )


# ---------------------------------------------------------------------------
# Histogram sketch: mergeable QUANTILE state completing the trio
# (HLL → distinct, CMS → frequency, histogram → quantiles). Fixed-bin
# counters over a declared value range: (bin, n) rows merge by
# bin-sum (exact, like CMS), and any quantile reads off the cumulative
# bin distribution within one bin width of truth. The 100 TB use: the
# quality-score decile boundaries of quality_deciles maintained
# incrementally — per-batch histograms fold into running state, the
# corpus is never rescanned to re-rank.
# ---------------------------------------------------------------------------

HIST_BINS = 1024


def histogram_sketch_table(
    df: DataFrame,
    value: str,
    lo: float,
    hi: float,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Build histogram state from value rows: (bin, n). NULLs are
    ignored (count/approxQuantile semantics); out-of-range values are
    clamped to the edge bins ON THE DOUBLE — clamping after an int
    cast would ANSI-CAST_OVERFLOW the stage on one huge value. One
    map-side-combined shuffle bounded by ``bins`` rows per input
    partition."""
    width = (hi - lo) / bins
    b = F.least(
        F.greatest((F.col(value) - F.lit(lo)) / F.lit(width), F.lit(0.0)),
        F.lit(float(bins - 1)),
    ).cast("int")
    return (
        df.filter(F.col(value).isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_histogram_tables(*tables: DataFrame) -> DataFrame:
    """Fold histogram states (running ∪ batch): bin-wise sum — exact,
    so per-batch histograms equal one histogram of the whole."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bin").agg(F.sum("n").alias("n"))


def histogram_quantiles(
    state: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Estimate quantiles from histogram state: the left edge of the
    first bin whose cumulative count reaches q·N. Error ≤ one bin
    width. State is bins-sized — the cumulative window runs on a
    single partition of ≤ ``bins`` rows, never on data."""
    from pyspark.sql import Window as W

    width = (hi - lo) / bins
    cum = state.select(
        "bin",
        F.sum("n").over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("n").over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).alias("total"),
    )
    out = None
    for q in qs:
        est = (
            cum.filter(F.col("cum") >= F.ceil(F.lit(q) * F.col("total")))
            .agg(F.min("bin").alias("bin"))
            .select(
                F.lit(q).alias("q"),
                (F.lit(lo) + F.col("bin") * F.lit(width)).alias("estimate"),
            )
        )
        out = est if out is None else out.unionByName(est)
    return out


# ---------------------------------------------------------------------------
# Explicit-register HLL: the oracle-checkable twin of the DataSketches
# state above. Registers are a TABLE of (keys..., bucket, register) —
# one 32-bit md5 lane per value: low 8 bits pick 1 of 256 buckets, the
# remaining 24-bit word's leading-zero rank (+1) is the register
# candidate; the register keeps the max. That table is the mergeable
# state (union + max — lossless, like CMS counter addition), rolls up
# to coarser grains the same way, and the RAW HLL estimator
#   alpha_m * m^2 / sum_j 2^-M_j
# is pure integer-plus-one-division arithmetic any engine replays
# bit-for-bit: sum_j 2^-M_j is scaled by 2^25 into an exact BIGINT
# (registers <= 25 → terms <= 2^25, 256 terms < 2^33). No ln()/
# small-range correction — transcendental libm calls differ across
# engines; the raw estimator is the documented contract (production
# accuracy lives in the DataSketches path above).
# ---------------------------------------------------------------------------

HLL_BUCKET_BITS = 8
HLL_BUCKETS = 1 << HLL_BUCKET_BITS  # 256
HLL_WORD_BITS = 32 - HLL_BUCKET_BITS  # 24
# alpha_256 * m^2 * 2^25, computed once so both engines multiply the
# same double literal
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_BUCKETS)
HLL_EST_NUM = HLL_ALPHA * HLL_BUCKETS * HLL_BUCKETS * float(1 << (HLL_WORD_BITS + 1))


def _hll_rho(w: F.Column) -> F.Column:
    """Leading-zero rank + 1 of the 24-bit word (1 if the top bit is
    set … 24 if only the lowest, 25 if zero) — a comparison ladder,
    not floor(log2()): log2 rounding at 2^k boundaries is not a
    cross-engine guarantee."""
    cases = F.when(w >= F.lit(1 << (HLL_WORD_BITS - 1)), F.lit(1))
    for i in range(HLL_WORD_BITS - 2, -1, -1):
        cases = cases.when(w >= F.lit(1 << i), F.lit(HLL_WORD_BITS - i))
    return cases.otherwise(F.lit(HLL_WORD_BITS + 1))


def hll_register_table(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Mergeable explicit HLL state: (*keys, bucket, register).
    One scan, one (keys, bucket) shuffle; NULL values contribute
    nothing (md5(NULL) is NULL on both engines — made explicit)."""
    from datalake_etlscripts_spark.operators.dedup import md5_hash32

    h = md5_hash32(F.col(value).cast("string"))
    return (
        df.filter(F.col(value).isNotNull())
        .select(
            *keys,
            h.bitwiseAND(F.lit(HLL_BUCKETS - 1)).alias("bucket"),
            _hll_rho(F.shiftrightunsigned(h, HLL_BUCKET_BITS)).alias("_rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("_rho").alias("register"))
    )


def merge_hll_register_tables(*tables: DataFrame) -> DataFrame:
    """Union + max per (keys, bucket) — the incremental-maintenance
    step; registers merge losslessly."""
    keys = [c for c in tables[0].columns if c != "register"]
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*keys).agg(F.max("register").alias("register"))


def rollup_hll_registers(state: DataFrame, coarser_keys: list[str]) -> DataFrame:
    """Coarser grain by max-merging registers — no fact-table access."""
    return state.groupBy(*coarser_keys, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_register_estimate(
    state: DataFrame, alias: str = "approx_distinct"
) -> DataFrame:
    """Raw HLL estimate per key group. Absent buckets contribute
    2^-0 = 1 each — accounted via (m - present) * 2^25 on the scaled
    integer sum.

    Valid regime: n ≳ 2.5·m (≈ 640 distinct at m=256) — below that the
    raw estimator overestimates and classic HLL switches to linear
    counting, which needs ln() (not bit-reproducible across engines);
    use the DataSketches path (estimate_distinct) when small-n
    accuracy matters."""
    keys = [c for c in state.columns if c not in ("bucket", "register")]
    scaled = F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_WORD_BITS + 1} - register)")
    agg = state.groupBy(*keys).agg(
        F.sum(scaled).alias("_s"), F.count(F.lit(1)).alias("_nb")
    )
    denom = F.col("_s") + (F.lit(HLL_BUCKETS) - F.col("_nb")) * F.lit(
        1 << (HLL_WORD_BITS + 1)
    )
    return agg.select(*keys, (F.lit(HLL_EST_NUM) / denom).alias(alias))


# ---------------------------------------------------------------------------
# Mergeable Bloom-filter state: the membership analogue of the CMS /
# HLL tables above, stored as (word_idx, bits BIGINT) rows (32 used bits
# per word — checked-shift engines reject 1<<63 where Java wraps) — merge is
# union + bit_or (lossless), probe is a broadcast join of the word
# table. The 100 TB use: crawl recovery keeps a Bloom filter of every
# stored document name; each batch's "already fetched?" check probes
# the broadcast filter first and pays the exact anti-join ONLY for the
# (tiny) maybe-set — the full fetched-name set is never shuffled.
# False positives only ever cause an extra exact check, never a wrong
# answer. md5 hash lanes (Kirsch-Mitzenmacher, same scheme as CMS) →
# any engine replays bit placement bit-for-bit.
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16  # 64 Ki bits = 2048 32-bit words; ~1% fp at ~6.8k items, k=7
BLOOM_HASHES = 7


def _bloom_positions(item: F.Column, m_bits: int, k: int) -> list[F.Column]:
    h1 = F.conv(F.substring(F.md5(item), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(item), 9, 8), 16, 10).cast("long")
    return [(h1 + F.lit(i) * h2) % F.lit(m_bits) for i in range(k)]


def bloom_table(
    df: DataFrame, value: str, m_bits: int = BLOOM_BITS, k: int = BLOOM_HASHES
) -> DataFrame:
    """(word_idx INT, bits BIGINT) Bloom state for the values of
    ``value``. One scan + one tiny (≤ m/64 rows) shuffle."""
    pos = F.explode(F.array(*_bloom_positions(F.col(value), m_bits, k))).alias("_p")
    return (
        df.filter(F.col(value).isNotNull())
        .select(pos)
        # 32-bit words: bit 63 would overflow engines with CHECKED
        # shifts (DuckDB) while Java wraps — sub-63 shifts behave
        # identically everywhere
        .select(
            (F.col("_p") / 32).cast("int").alias("word_idx"),
            (F.col("_p") % 32).cast("int").alias("_bit"),
        )
        # SQL shiftleft: the Python wrapper only takes a literal shift
        .select("word_idx", F.expr("shiftleft(CAST(1 AS BIGINT), _bit)").alias("_b"))
        .groupBy("word_idx")
        .agg(F.bit_or("_b").alias("bits"))
    )


def merge_bloom_tables(*tables: DataFrame) -> DataFrame:
    """Union + bit_or per word — the incremental-maintenance step."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    value: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Append ``maybe_member`` to ``df``: True iff ALL k bit positions
    of ``value`` are set. The word table broadcasts (≤ m/64 rows);
    per row the probe is k explode rows + one broadcast join — no
    shuffle of ``df``. Definite-negative rows can skip any downstream
    exact membership join entirely."""
    # probe DISTINCT values: duplicate probe rows would multiply the
    # per-value hit rows and break the sum(_hit) == k test — a false
    # NEGATIVE, the one error class a Bloom filter must never make
    vals = df.select(F.col(value).alias("_v")).distinct()
    probe = vals.select(
        "_v",
        F.posexplode(F.array(*_bloom_positions(F.col("_v"), m_bits, k))).alias(
            "_i", "_p"
        ),
    ).select(
        "_v",
        "_i",
        (F.col("_p") / 32).cast("int").alias("word_idx"),
        (F.col("_p") % 32).cast("int").alias("_bit"),
    )
    hits = (
        probe.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "_v",
            F.expr(
                "CAST((shiftright(coalesce(bits, CAST(0 AS BIGINT)), _bit) & 1) = 1"
                " AS INT)"
            ).alias("_hit"),
        )
        .groupBy("_v")
        .agg((F.sum("_hit") == F.lit(k)).alias("maybe_member"))
    )
    return df.join(
        hits.withColumnRenamed("_v", value), value, "left"
    ).withColumn("maybe_member", F.coalesce("maybe_member", F.lit(False)))


def negate_histogram(hist: DataFrame) -> DataFrame:
    """Signed view of a histogram state for DELETE maintenance:
    bin-wise counters subtract as exactly as they add, so
    merge_histogram_tables(state, negate_histogram(removed_hist))
    yields the histogram of the post-delete data — the removal story
    HLL registers cannot offer (max-merge is insert-only)."""
    return hist.select("bin", (-F.col("n")).alias("n"))


# ------------------------------------------------------------------ KMV/theta
KMV_HASH_BITS = 60
KMV_HASH_SPACE = 1 << KMV_HASH_BITS


def kmv_sketch_table(
    df: DataFrame, keys: list[str], value: str, k: int = 256
) -> DataFrame:
    """K-Minimum-Values (theta) sketch per group: the k SMALLEST
    distinct 60-bit hashes of ``value`` as (*keys, pos, h) rows —
    an ORDER-STATISTIC sketch (Bar-Yossef et al. 2002; the Apache
    DataSketches theta family). Unlike HLL registers, KMV supports a
    direct set-INTERSECTION estimate (kmv_overlap_estimate) instead
    of error-amplifying inclusion-exclusion, and is fully
    deterministic: the k smallest hashes are a property of the SET,
    independent of partitioning or arrival order — so an external
    engine replays the sketch bit-for-bit.

    Scale shape: dedup (keys, h) once (one keyed shuffle), then exact
    distributed k-min — every physical partition emits its own ≤k
    candidates (window over (keys, partition-id); intermediate
    partition ids don't affect the final answer), and the global
    k-min window runs over ≤ partitions×k survivors per group, never
    the corpus. Merge of two sketch tables = union → same k-min
    (the sketch is a monoid).
    """
    from pyspark.sql import Window

    from datalake_etlscripts_spark.functions.scalar import md5_hash60

    hashed = df.select(
        *keys, md5_hash60(F.col(value).cast("string")).alias("h")
    ).dropDuplicates([*keys, "h"])
    cand = hashed.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy(*keys, "_pid").orderBy("h")
    stage1 = (
        cand.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_pid", "_r")
    )
    w2 = Window.partitionBy(*keys).orderBy("h")
    return (
        stage1.withColumn("pos", F.row_number().over(w2))
        .filter(F.col("pos") <= k)
        .select(*keys, "pos", "h")
    )


def kmv_estimate(sketch: DataFrame, keys: list[str], k: int = 256) -> DataFrame:
    """Distinct-count estimate from a KMV sketch table: for a full
    sketch, D̂ = (k−1) · 2^60 / h_(k) (the unbiased KMV estimator);
    a group with fewer than k hashes is EXACT (its estimate is the
    count itself). One double division of exact integers per group —
    decimal(38,0) product, so (k−1)·2^60 never overflows BIGINT."""
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_k"), F.max("h").alias("kth")
    )
    num = (
        (F.col("n_k") - 1).cast("decimal(19,0)")
        * F.lit(KMV_HASH_SPACE).cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    return agg.select(
        *keys,
        "n_k",
        "kth",
        F.when(F.col("n_k") < k, F.col("n_k").cast("double"))
        .otherwise(num.cast("double") / F.col("kth").cast("double"))
        .alias("est_distinct"),
    )


def kmv_overlap_estimate(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 256
) -> DataFrame:
    """Set-overlap estimates from two keyless KMV sketches (columns
    pos, h): theta-sketch intersection. θ* = min(h_(k)^A, h_(k)^B);
    hashes present in BOTH sketches at or below θ* are a uniform
    sample of the intersection at sampling rate θ*/2^60, so
    est_intersection = |common ≤ θ*| · 2^60 / θ*, and jaccard_est =
    |common ≤ θ*| / |union of sketch hashes ≤ θ*| (the fixed-θ* MinHash
    identity). All counts are exact integers; two double divisions.

    A sketch with fewer than k hashes IS its full set (nothing was
    discarded), so its threshold is the whole hash space 2^60 — when
    neither sketch is full the estimates collapse to the EXACT
    intersection and Jaccard. Sketch-sized inputs only (≤ k rows
    each) — the join is a broadcast of k hashes, never corpus-scale."""
    ka = sketch_a.agg(F.max("h").alias("kth_a"), F.count(F.lit(1)).alias("nka"))
    kb = sketch_b.agg(F.max("h").alias("kth_b"), F.count(F.lit(1)).alias("nkb"))
    both = (
        sketch_a.select(F.col("h").alias("ha"))
        .join(sketch_b.select(F.col("h").alias("hb")), F.col("ha") == F.col("hb"))
        .select(F.col("ha").alias("h"))
    )
    uni = (
        sketch_a.select("h").unionByName(sketch_b.select("h")).dropDuplicates()
    )
    theta = ka.crossJoin(F.broadcast(kb)).withColumn(
        "theta",
        F.least(
            F.when(F.col("nka") < k, F.lit(KMV_HASH_SPACE)).otherwise(
                F.col("kth_a")
            ),
            F.when(F.col("nkb") < k, F.lit(KMV_HASH_SPACE)).otherwise(
                F.col("kth_b")
            ),
        ),
    )
    n_common = (
        both.crossJoin(F.broadcast(theta.select("theta")))
        .filter(F.col("h") <= F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    n_union = (
        uni.crossJoin(F.broadcast(theta.select("theta")))
        .filter(F.col("h") <= F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_union_theta"))
    )
    space = F.lit(KMV_HASH_SPACE).cast("decimal(19,0)")
    return (
        theta.crossJoin(F.broadcast(n_common))
        .crossJoin(F.broadcast(n_union))
        .select(
            "kth_a",
            "kth_b",
            "theta",
            "n_common",
            "n_union_theta",
            (
                (F.col("n_common").cast("decimal(19,0)") * space)
                .cast("decimal(38,0)")
                .cast("double")
                / F.col("theta").cast("double")
            ).alias("est_intersection"),
            (
                F.col("n_common").cast("double")
                / F.col("n_union_theta").cast("double")
            ).alias("jaccard_est"),
        )
    )


def kmv_difference_estimate(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 256
) -> DataFrame:
    """Theta-sketch A-NOT-B from two keyless KMV sketches (columns
    pos, h): below θ* = min(θ_A, θ_B) the retained hashes of A are a
    uniform sample of A, so the ones ABSENT from B's sketch sample
    A∖B at rate θ*/2^60:

        est_difference = |{h ∈ A-sketch : h ≤ θ*, h ∉ B-sketch}| · 2^60 / θ*

    (the DataSketches AnotB operation). Exact integers throughout, one
    double division; when neither sketch is full nothing was discarded
    and the answer is the EXACT difference. Anti-join of ≤ k hashes —
    sketch-sized work only."""
    ka = sketch_a.agg(F.max("h").alias("kth_a"), F.count(F.lit(1)).alias("nka"))
    kb = sketch_b.agg(F.max("h").alias("kth_b"), F.count(F.lit(1)).alias("nkb"))
    theta = ka.crossJoin(F.broadcast(kb)).withColumn(
        "theta",
        F.least(
            F.when(F.col("nka") < k, F.lit(KMV_HASH_SPACE)).otherwise(
                F.col("kth_a")
            ),
            F.when(F.col("nkb") < k, F.lit(KMV_HASH_SPACE)).otherwise(
                F.col("kth_b")
            ),
        ),
    )
    only_a = sketch_a.select("h").join(
        sketch_b.select("h"), "h", "left_anti"
    )
    n_diff = (
        only_a.crossJoin(F.broadcast(theta.select("theta")))
        .filter(F.col("h") <= F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_diff"))
    )
    space = F.lit(KMV_HASH_SPACE).cast("decimal(19,0)")
    return (
        theta.crossJoin(F.broadcast(n_diff))
        .select(
            "kth_a",
            "kth_b",
            "theta",
            "n_diff",
            (
                (F.col("n_diff").cast("decimal(19,0)") * space)
                .cast("decimal(38,0)")
                .cast("string")
                .cast("double")
                / F.col("theta").cast("double")
            ).alias("est_difference"),
        )
    )


def bitmap_distinct_state(
    df: DataFrame, key_col: str, id_col: str, word_bits: int = 62
) -> DataFrame:
    """EXACT distinct-count state as a bitmap index (the roaring-bitmap
    shape beside the HLL/KMV sketches — exact where they estimate):
    integer ids pack into 62-bit words (62, not 64: a 1<<63 shift
    overflows signed BIGINT in external engines), keyed by
    (key, word_idx = id div 62); only NON-EMPTY words are stored —
    exactly roaring's container trick, so sparse id ranges cost
    nothing. The state is a mergeable monoid under bitwise OR:
    rollups to coarser keys OR the words and never re-read the fact
    table; |state| ≤ distinct ids regardless of row count. One
    map-side-combined groupBy. Returns (key, widx, word)."""
    return df.groupBy(
        F.col(key_col).alias("key"),
        F.expr(f"{id_col} div {word_bits}").alias("widx"),
    ).agg(
        F.expr(f"bit_or(shiftleft(1L, int({id_col} % {word_bits})))").alias(
            "word"
        )
    )


def bitmap_distinct_counts(state: DataFrame) -> DataFrame:
    """Per-key exact distinct from bitmap state: Σ bit_count(word)."""
    return state.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.bit_count("word")).cast("long").alias("distinct_ids"),
    )


def bitmap_rollup(state: DataFrame, rollup_key: str = "(all)") -> DataFrame:
    """OR-merge bitmap state to one coarser key — the monoid law; the
    fact table is never touched."""
    return (
        state.groupBy("widx")
        .agg(F.expr("bit_or(word)").alias("word"))
        .select(F.lit(rollup_key).alias("key"), "widx", "word")
    )
