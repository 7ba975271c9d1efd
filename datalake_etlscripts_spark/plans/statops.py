"""Statistical / signal-processing query plans (r9): multilevel Haar
wavelet transform in pure integers, cross-correlation lead-lag
detection between two event series, and isotonic (PAV) calibration via
the minimax identity over bounded score bins. All spine- or
dictionary-bounded after one fact scan; house float-determinism policy
(exact integers until final divisions; doubles only in fixed-order
combines both engines evaluate identically)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.plans.registry import query


# ---------------------------------------------------------------------------
# Haar wavelet transform of the global hourly event-count series,
# first 256 hours, levels 1..8 — the unnormalized (integer) Haar:
# detail(ℓ, p) = Σ_{t in block} x_t · s(t), s = +1 on the first half
# of the 2^ℓ block, −1 on the second. Every coefficient is an exact
# integer; the closed form needs NO iteration — each hour explodes to
# its 8 (level, position, sign) slots and ONE groupBy computes the
# whole pyramid. The top-level approximation (sum of all 256) rides
# along as level 0. Energy compaction reads off coef². At 100 TB the
# fact scan is the only data-sized stage; the pyramid is 256 rows.
# ---------------------------------------------------------------------------
@query(
    "wavelet_haar",
    oracle="""
    WITH b AS (SELECT min(date_trunc('hour', ts)) AS lo FROM events),
    h AS (
      SELECT CAST(epoch(date_trunc('hour', ts))
                  - epoch((SELECT lo FROM b)) AS BIGINT) // 3600 AS idx,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    spine AS (
      SELECT unnest(range(0, 256)) AS idx
    ),
    dense AS (
      SELECT s.idx, coalesce(h.x, 0) AS x
      FROM spine s LEFT JOIN h ON h.idx = s.idx
    ),
    lv AS (SELECT unnest(range(1, 9)) AS lev),
    detail AS (
      SELECT CAST(lev AS INT) AS level,
             CAST(idx // (1 << lev) AS BIGINT) AS pos,
             CAST(sum(CASE WHEN (idx // (1 << (lev - 1))) % 2 = 0
                      THEN x ELSE -x END) AS BIGINT) AS coef
      FROM dense CROSS JOIN lv
      GROUP BY 1, 2
    ),
    approx AS (
      SELECT CAST(0 AS INT) AS level, CAST(0 AS BIGINT) AS pos,
             CAST(sum(x) AS BIGINT) AS coef
      FROM dense
    )
    SELECT level, pos, coef, CAST(coef * coef AS BIGINT) AS energy
    FROM (SELECT * FROM detail UNION ALL SELECT * FROM approx)
    """,
)
def q_wavelet_haar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilevel Haar wavelet pyramid of the hourly event-count series (256 hours, 8 levels) - closed-form signed groupBy, every coefficient an exact integer, no iteration."""
    e = read_table(spark, sf_dir, "events")
    h = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).alias("x")
    )
    lo = h.groupBy().agg(F.min("hr").alias("lo"))
    idx = h.crossJoin(F.broadcast(lo)).select(
        (
            (F.unix_timestamp("hr") - F.unix_timestamp("lo")) / 3600
        ).cast("long").alias("idx"),
        "x",
    )
    spine = spark.range(0, 256).select(F.col("id").alias("idx"))
    dense = spine.join(idx, "idx", "left").select(
        "idx", F.coalesce("x", F.lit(0)).alias("x")
    )
    lv = spark.range(1, 9).select(F.col("id").cast("int").alias("lev"))
    detail = (
        dense.crossJoin(F.broadcast(lv))
        .groupBy(
            F.col("lev").alias("level"),
            F.expr("idx div (1 << lev)").cast("long").alias("pos"),
        )
        .agg(
            F.sum(
                F.when(
                    F.expr("(idx div (1 << (lev - 1))) % 2 = 0"),
                    F.col("x"),
                ).otherwise(-F.col("x"))
            ).cast("long").alias("coef")
        )
    )
    approx = dense.groupBy().agg(
        F.sum("x").cast("long").alias("coef")
    ).select(
        F.lit(0).cast("int").alias("level"),
        F.lit(0).cast("long").alias("pos"),
        "coef",
    )
    out = detail.select("level", "pos", "coef").unionByName(approx)
    return out.select(
        "level", "pos", "coef", (F.col("coef") * F.col("coef")).cast(
            "long"
        ).alias("energy")
    )


# ---------------------------------------------------------------------------
# Cross-correlation lead-lag: Pearson r between the 'view' and
# 'purchase' hourly series at lags −12..+12 (y shifted ℓ hours after
# x), exact integer moments per lag, r in one fixed-order double
# combine (the seasonality_lag24 policy), best lag flagged by
# (r DESC, lag ASC). Answers "which series leads, and by how much" —
# the scheduling primitive behind metric-causality dashboards. Spine-
# bounded: the lag explode is 25× the DENSE HOURLY GRID, never the
# raw facts.
# ---------------------------------------------------------------------------
@query(
    "ccf_lead_lag",
    oracle="""
    WITH b AS (
      SELECT min(date_trunc('hour', ts)) AS lo,
             max(date_trunc('hour', ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b
    ),
    xv AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    yp AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    dx AS (SELECT s.hr, coalesce(x.c, 0) AS x
           FROM spine s LEFT JOIN xv x ON x.hr = s.hr),
    dy AS (SELECT s.hr, coalesce(y.c, 0) AS y
           FROM spine s LEFT JOIN yp y ON y.hr = s.hr),
    lags AS (SELECT unnest(range(-12, 13)) AS lag),
    paired AS (
      SELECT l.lag, dx.x, dy.y
      FROM dx CROSS JOIN lags l
      JOIN dy ON dy.hr = dx.hr + to_hours(l.lag)
    ),
    m AS (
      SELECT CAST(lag AS INT) AS lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM paired GROUP BY 1
    ),
    r AS (
      SELECT lag, n,
             CAST(n * sxy - sx * sy AS BIGINT) AS num,
             CAST(n * sxx - sx * sx AS BIGINT) AS vx,
             CAST(n * syy - sy * sy AS BIGINT) AS vy,
             CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                  THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             END AS r
      FROM m
    )
    SELECT lag, n, num, vx, vy, r,
           CAST(CASE WHEN row_number() OVER (ORDER BY r DESC, lag ASC) = 1
                THEN 1 ELSE 0 END AS INT) AS best
    FROM r
    """,
)
def q_ccf_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation lead-lag between the view and purchase hourly series at lags -12..+12: exact integer moments per lag, fixed-order Pearson combine, best lag flagged deterministically."""
    e = read_table(spark, sf_dir, "events")

    def dense(tp: str, out: str) -> DataFrame:
        h = (
            e.filter(F.col("event_type") == tp)
            .groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return h

    bounds = e.groupBy().agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hr"
        )
    )
    dx = spine.join(dense("view", "x"), "hr", "left").select(
        "hr", F.coalesce("c", F.lit(0)).alias("x")
    )
    dy = spine.join(dense("purchase", "y"), "hr", "left").select(
        F.col("hr").alias("yhr"), F.coalesce("c", F.lit(0)).alias("y")
    )
    lags = spark.range(-12, 13).select(F.col("id").cast("int").alias("lag"))
    paired = (
        dx.crossJoin(F.broadcast(lags))
        .withColumn(
            "thr",
            F.col("hr")
            + F.make_dt_interval(hours=F.col("lag")),
        )
        .join(dy, F.col("yhr") == F.col("thr"))
    )
    m = paired.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("long")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("long")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("long")
    r = m.select(
        "lag",
        F.col("n").cast("long").alias("n"),
        num.alias("num"),
        vx.alias("vx"),
        vy.alias("vy"),
        F.when(
            (vx > 0) & (vy > 0),
            num.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
        ).alias("r"),
    )
    wb = W.orderBy(F.col("r").desc(), F.col("lag").asc())
    return r.withColumn(
        "best",
        F.when(F.row_number().over(wb) == 1, 1).otherwise(0).cast("int"),
    )


# ---------------------------------------------------------------------------
# Isotonic (PAV) calibration of the stopword-ratio english predictor
# via the minimax identity: over score bins b (permille div 50, ≤21
# bins) with prefix sums (N, S),
#     iso(i) = max_{j≤i} min_{k≥i} (S_k − S_{j−1}) / (N_k − N_{j−1})
# — the closed form of pool-adjacent-violators, so NO sequential fold
# is needed: a triple (j,i,k) join on the BIN table (≤21³ combos)
# computes the exact monotone fit. Each candidate average is one exact
# division; max/min over those doubles is value-deterministic. The
# fact scan happens once; everything after is dictionary-sized.
# ---------------------------------------------------------------------------
@query(
    "isotonic_calibration",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    p AS (
      SELECT CAST((1000 * len(list_filter(tk, x -> x = 'the' OR x = 'a'))
                   // len(tk)) // 50 AS BIGINT) AS bin,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM d WHERE len(tk) > 0
    ),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
      FROM p GROUP BY 1
    ),
    pre AS (
      SELECT bin, n, s,
             CAST(sum(n) OVER w AS BIGINT) AS cn,
             CAST(sum(s) OVER w AS BIGINT) AS cs
      FROM bins WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)
    ),
    pairs AS (
      SELECT j.bin AS jb, k.bin AS kb,
             CAST(k.cs - (j.cs - j.s) AS DOUBLE)
               / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS avg_jk
      FROM pre j JOIN pre k ON j.bin <= k.bin
    ),
    inner_min AS (
      SELECT i.bin, p.jb, min(p.avg_jk) AS mn
      FROM pre i JOIN pairs p ON p.jb <= i.bin AND p.kb >= i.bin
      GROUP BY 1, 2
    ),
    iso AS (SELECT bin, max(mn) AS iso_fit FROM inner_min GROUP BY 1)
    SELECT b.bin, b.n, b.s,
           CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS raw_rate,
           i.iso_fit
    FROM bins b JOIN iso i USING (bin)
    """,
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration fit over stopword-ratio score bins via the closed-form minimax identity - triple join on the bounded bin table, exact-division candidate averages, value-deterministic max-min."""
    d = read_table(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    stop = F.filter(tk, lambda t: (t == "the") | (t == "a"))
    p = d.filter(F.size(tk) > 0).select(
        F.expr(
            "CAST((1000 * size(filter(split(text, ' '), x -> x = 'the' OR"
            " x = 'a')) div size(filter(split(text, ' '), x -> x != '')))"
            " div 50 AS BIGINT)"
        ).alias("bin"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
    )
    bins = p.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    wp = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    pre = bins.select(
        "bin",
        "n",
        "s",
        F.sum("n").over(wp).alias("cn"),
        F.sum("s").over(wp).alias("cs"),
    )
    j = pre.select(
        F.col("bin").alias("jb"),
        (F.col("cs") - F.col("s")).alias("js0"),
        (F.col("cn") - F.col("n")).alias("jn0"),
    )
    k = pre.select(
        F.col("bin").alias("kb"),
        F.col("cs").alias("kcs"),
        F.col("cn").alias("kcn"),
    )
    pairs = j.join(F.broadcast(k), F.col("jb") <= F.col("kb")).select(
        "jb",
        "kb",
        (
            (F.col("kcs") - F.col("js0")).cast("double")
            / (F.col("kcn") - F.col("jn0")).cast("double")
        ).alias("avg_jk"),
    )
    i = pre.select(F.col("bin").alias("ib"))
    inner_min = (
        i.join(
            F.broadcast(pairs),
            (F.col("jb") <= F.col("ib")) & (F.col("kb") >= F.col("ib")),
        )
        .groupBy("ib", "jb")
        .agg(F.min("avg_jk").alias("mn"))
    )
    iso = inner_min.groupBy("ib").agg(F.max("mn").alias("iso_fit"))
    return bins.join(iso, bins["bin"] == iso["ib"]).select(
        "bin",
        "n",
        "s",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias(
            "raw_rate"
        ),
        "iso_fit",
    )


# ---------------------------------------------------------------------------
# Watermark lateness audit (r9): how out-of-order is the stream? For
# each event, lateness = (running max event-time in ARRIVAL order) −
# own event-time, in exact integer microseconds. The running max is
# computed DISTRIBUTED: arrival ids bucket by div 4096, a bucket-grain
# prefix max supplies each bucket's carry-in, and the within-bucket
# window is bounded at 4096 rows — the two-level prefix-scan shape
# (recurse the bucket level for another 4096× at extreme scale; the
# oracle is the single flat window, identical by associativity of
# max). Output: per-type drop counts at candidate watermark delays —
# the input you need to CHOOSE a Structured Streaming watermark.
# ---------------------------------------------------------------------------
@query(
    "watermark_lateness_audit",
    oracle="""
    WITH e AS (
      SELECT event_type, event_id, epoch_us(ts) AS t_us FROM events
    ),
    lag_ AS (
      SELECT event_type,
             max(t_us) OVER (ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) - t_us AS late_us
      FROM e
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(late_us) AS BIGINT) AS sum_late_us,
           CAST(max(late_us) AS BIGINT) AS max_late_us,
           CAST(count(*) FILTER (late_us > 60000000) AS BIGINT)
             AS drop_1m,
           CAST(count(*) FILTER (late_us > 300000000) AS BIGINT)
             AS drop_5m,
           CAST(count(*) FILTER (late_us > 3600000000) AS BIGINT)
             AS drop_1h
    FROM lag_ GROUP BY 1
    """,
)
def q_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark lateness audit: per-event out-of-orderness vs the running arrival-order max event-time, computed with a two-level distributed prefix max (4096-row buckets + bucket-grain carry-in) - exact integer microseconds, per-type drop counts at 1m/5m/1h watermark delays."""
    e = read_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
    ).withColumn("bkt", F.expr("event_id div 4096"))
    # level 1: per-bucket max; carry-in = running max over PRIOR buckets
    bmax = e.groupBy("bkt").agg(F.max("t_us").alias("bmax"))
    wb = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    carry = bmax.select(
        "bkt", F.max("bmax").over(wb).alias("carry_us")
    )
    # level 2: within-bucket running max (bounded 4096-row window)
    ww = (
        W.partitionBy("bkt")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    late = (
        e.join(F.broadcast(carry), "bkt")
        .withColumn("run_in", F.max("t_us").over(ww))
        .withColumn(
            "late_us",
            F.greatest(
                F.coalesce(F.col("carry_us"), F.lit(-(2**62))),
                F.col("run_in"),
            )
            - F.col("t_us"),
        )
    )
    return late.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("late_us").cast("long").alias("sum_late_us"),
        F.max("late_us").cast("long").alias("max_late_us"),
        F.sum(F.when(F.col("late_us") > 60_000_000, 1).otherwise(0))
        .cast("long")
        .alias("drop_1m"),
        F.sum(F.when(F.col("late_us") > 300_000_000, 1).otherwise(0))
        .cast("long")
        .alias("drop_5m"),
        F.sum(F.when(F.col("late_us") > 3_600_000_000, 1).otherwise(0))
        .cast("long")
        .alias("drop_1h"),
    )


# ---------------------------------------------------------------------------
# Lo–MacKinlay variance-ratio test (r9): is the hourly event-count
# series a random walk? VR(k) = Var(k-step diffs)/(k·Var(1-step
# diffs)); VR < 1 → mean reversion, > 1 → trending. Both variances are
# exact integers via the n·Σz²−(Σz)² identity; the ratio is ONE double
# division of two DECIMAL products, and the mean-reversion flag is an
# integer cross-multiplication. Spine-bounded after one fact scan.
# ---------------------------------------------------------------------------
@query(
    "variance_ratio_test",
    oracle="""
    WITH b AS (
      SELECT min(date_trunc('hour', ts)) AS lo,
             max(date_trunc('hour', ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b
    ),
    h AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    dense AS (
      SELECT s.hr, coalesce(h.c, 0) AS x,
             row_number() OVER (ORDER BY s.hr) AS i
      FROM spine s LEFT JOIN h ON h.hr = s.hr
    ),
    d1 AS (
      SELECT a.x - b.x AS d
      FROM dense a JOIN dense b ON b.i = a.i - 1
    ),
    dk AS (
      SELECT a.x - b.x AS d
      FROM dense a JOIN dense b ON b.i = a.i - 4
    ),
    m1 AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(d) AS s,
                  sum(d * d) AS ss FROM d1),
    mk AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(d) AS s,
                  sum(d * d) AS ss FROM dk)
    SELECT CAST(m1.n AS BIGINT) AS n_1, CAST(mk.n AS BIGINT) AS n_k,
           CAST(m1.n * m1.ss - m1.s * m1.s AS BIGINT) AS s2_1,
           CAST(mk.n * mk.ss - mk.s * mk.s AS BIGINT) AS s2_k,
           CAST(CAST((mk.n * mk.ss - mk.s * mk.s)
                     * m1.n * (m1.n - 1) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(4 * (m1.n * m1.ss - m1.s * m1.s)
                       * mk.n * (mk.n - 1) AS VARCHAR) AS DOUBLE) AS vr,
           CAST(CASE WHEN (mk.n * mk.ss - mk.s * mk.s)
                          * m1.n * (m1.n - 1)
                        < 4 * (m1.n * m1.ss - m1.s * m1.s)
                          * mk.n * (mk.n - 1)
                THEN 1 ELSE 0 END AS INT) AS mean_reverting
    FROM m1 CROSS JOIN mk
    """,
)
def q_variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio random-walk test on the hourly series (k=4): exact integer variances via the n-sum-of-squares identity, one double division, cross-multiplied mean-reversion flag."""
    e = read_table(spark, sf_dir, "events")
    h = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    b = h.groupBy().agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = b.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hr"
        )
    )
    wi = W.orderBy("hr")
    dense = (
        spine.join(h, "hr", "left")
        .select("hr", F.coalesce("c", F.lit(0)).alias("x"))
        .withColumn("i", F.row_number().over(wi).cast("long"))
    )

    def diffs(k: int) -> DataFrame:
        a = dense.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
        bb = dense.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
        return a.join(bb, F.col("ib") == F.col("ia") - k).select(
            (F.col("xa") - F.col("xb")).cast("decimal(38,0)").alias("d")
        )

    def mom(df: DataFrame, pre: str) -> DataFrame:
        return df.groupBy().agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias(f"{pre}n"),
            F.sum("d").alias(f"{pre}s"),
            F.sum(F.col("d") * F.col("d")).alias(f"{pre}ss"),
        )

    m1 = mom(diffs(1), "a")
    mk = mom(diffs(4), "b")
    j = m1.crossJoin(F.broadcast(mk))
    s2_1 = F.col("an") * F.col("ass") - F.col("as") * F.col("as")
    s2_k = F.col("bn") * F.col("bss") - F.col("bs") * F.col("bs")
    num = s2_k * F.col("an") * (F.col("an") - 1)
    den = 4 * s2_1 * F.col("bn") * (F.col("bn") - 1)

    def dd_(c):
        return c.cast("string").cast("double")

    return j.select(
        F.col("an").cast("long").alias("n_1"),
        F.col("bn").cast("long").alias("n_k"),
        s2_1.cast("long").alias("s2_1"),
        s2_k.cast("long").alias("s2_k"),
        (dd_(num) / dd_(den)).alias("vr"),
        F.when(num < den, 1).otherwise(0).cast("int").alias(
            "mean_reverting"
        ),
    )


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test (r9): randomness of the hourly count series
# around its median — too few runs = clustering/regimes, too many =
# oscillation. The median is an explicit rank pick on the bounded
# spine (no interpolation), runs are a lag-marker sum, E[R] and the
# z-score combine exact integers in fixed order. One fact scan; spine-
# bounded thereafter.
# ---------------------------------------------------------------------------
@query(
    "runs_test",
    oracle="""
    WITH b AS (
      SELECT min(date_trunc('hour', ts)) AS lo,
             max(date_trunc('hour', ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b
    ),
    h AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    dense AS (
      SELECT s.hr, coalesce(h.c, 0) AS x
      FROM spine s LEFT JOIN h ON h.hr = s.hr
    ),
    med AS (
      SELECT x AS m FROM (
        SELECT x, row_number() OVER (ORDER BY x, hr) AS r,
               count(*) OVER () AS n
        FROM dense
      ) WHERE r = (n + 1) // 2
    ),
    signs AS (
      SELECT hr, CASE WHEN x > m THEN 1 ELSE 0 END AS s
      FROM dense CROSS JOIN med WHERE x <> m
    ),
    runs AS (
      SELECT s, CASE WHEN lag(s) OVER (ORDER BY hr) IS DISTINCT FROM s
                THEN 1 ELSE 0 END AS chg
      FROM signs
    ),
    agg AS (
      SELECT CAST(sum(chg) AS BIGINT) AS r_runs,
             CAST(sum(s) AS BIGINT) AS n1,
             CAST(count(*) - sum(s) AS BIGINT) AS n2,
             CAST(count(*) AS BIGINT) AS n
      FROM runs
    )
    SELECT r_runs, n1, n2,
           1.0 + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n AS DOUBLE) AS e_runs,
           (CAST(r_runs AS DOUBLE)
            - (1.0 + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n AS DOUBLE)))
           / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n) AS DOUBLE)
                  / CAST(n * n * (n - 1) AS DOUBLE)) AS z
    FROM agg
    """,
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test of the hourly series around its exact rank-picked median: lag-marker run count, integer-exact E[R] inputs, fixed-order z combine."""
    e = read_table(spark, sf_dir, "events")
    h = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    b = h.groupBy().agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = b.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hr"
        )
    )
    dense = spine.join(h, "hr", "left").select(
        "hr", F.coalesce("c", F.lit(0)).alias("x")
    )
    wm = W.orderBy("x", "hr")
    med = (
        dense.withColumn("r", F.row_number().over(wm))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy()))
        .filter(F.expr("r = (n + 1) div 2"))
        .select(F.col("x").alias("m"))
    )
    signs = (
        dense.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("m"))
        .select(
            "hr", F.when(F.col("x") > F.col("m"), 1).otherwise(0).alias("s")
        )
    )
    wo = W.orderBy("hr")
    runs = signs.select(
        "s",
        F.when(~F.lag("s").over(wo).eqNullSafe(F.col("s")), 1)
        .otherwise(0)
        .alias("chg"),
    )
    agg = runs.groupBy().agg(
        F.sum("chg").cast("long").alias("r_runs"),
        F.sum("s").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    e_runs = F.lit(1.0) + (2 * F.col("n1") * F.col("n2")).cast(
        "double"
    ) / F.col("n").cast("double")
    var = (
        2 * F.col("n1") * F.col("n2") * (2 * F.col("n1") * F.col("n2") - F.col("n"))
    ).cast("double") / (
        F.col("n") * F.col("n") * (F.col("n") - 1)
    ).cast("double")
    return agg.select(
        "r_runs",
        "n1",
        "n2",
        e_runs.alias("e_runs"),
        ((F.col("r_runs").cast("double") - e_runs) / F.sqrt(var)).alias("z"),
    )


# ---------------------------------------------------------------------------
# Linear interpolation of zero-hours (r9): per event type, hours with
# no events get y = (y0·(i1−i) + y1·(i−i0)) / (i1−i0) between the
# bracketing observed hours — integer numerators, ONE exact division
# per gap row. Prev/next brackets come from struct-carry windows on
# the per-type dense grid (the forward-fill shape + its mirror); the
# oracle uses two ASOF joins. Interior-only by construction (the grid
# spans each type's own observed range). Spine-bounded.
# ---------------------------------------------------------------------------
@query(
    "interpolate_linear",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS i,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    b AS (
      SELECT event_type, min(i) AS lo, max(i) AS hi FROM h GROUP BY 1
    ),
    grid AS (
      SELECT event_type, unnest(range(lo, hi + 1)) AS i FROM b
    ),
    dense AS (
      SELECT g.event_type, g.i, coalesce(h.y, 0) AS y
      FROM grid g LEFT JOIN h ON h.event_type = g.event_type AND h.i = g.i
    ),
    obs AS (SELECT event_type, i, y FROM dense WHERE y > 0),
    obs_neg AS (SELECT event_type, -i AS ni, i, y FROM obs),
    prev AS (
      SELECT d.event_type, d.i, d.y, o.i AS i0, o.y AS y0
      FROM dense d ASOF LEFT JOIN obs o
        ON d.event_type = o.event_type AND d.i >= o.i
    ),
    nxt AS (
      SELECT d.event_type, d.i, o.i AS i1, o.y AS y1
      FROM (SELECT event_type, -i AS ni, i FROM dense) d
      ASOF LEFT JOIN obs_neg o
        ON d.event_type = o.event_type AND d.ni >= o.ni
    )
    SELECT p.event_type, p.i AS hour_idx, p.y AS observed,
           CASE WHEN p.y > 0 THEN CAST(p.y AS DOUBLE)
                ELSE CAST(p.y0 * (n.i1 - p.i) + n.y1 * (p.i - p.i0)
                          AS DOUBLE)
                     / CAST(n.i1 - p.i0 AS DOUBLE) END AS y_interp
    FROM prev p JOIN nxt n ON n.event_type = p.event_type AND n.i = p.i
    """,
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear interpolation of zero-hours between bracketing observed hours: integer numerators with one exact division per gap, struct-carry prev/next windows on the dense grid."""
    e = read_table(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type",
        F.expr(
            "CAST(unix_seconds(date_trunc('hour', ts)) AS BIGINT) div 3600"
        ).alias("i"),
    ).agg(F.count(F.lit(1)).alias("y"))
    b = h.groupBy("event_type").agg(
        F.min("i").alias("lo"), F.max("i").alias("hi")
    )
    grid = b.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("i")
    )
    dense = grid.join(h, ["event_type", "i"], "left").select(
        "event_type", "i", F.coalesce("y", F.lit(0)).alias("y")
    )
    obs_struct = F.when(
        F.col("y") > 0, F.struct(F.col("i"), F.col("y"))
    )
    wp = (
        W.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wn = (
        W.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(0, W.unboundedFollowing)
    )
    br = dense.select(
        "event_type",
        "i",
        "y",
        F.max(obs_struct).over(wp).alias("p0"),
        F.min(obs_struct).over(wn).alias("p1"),
    )
    y0, i0 = F.col("p0.y"), F.col("p0.i")
    y1, i1 = F.col("p1.y"), F.col("p1.i")
    return br.select(
        "event_type",
        F.col("i").alias("hour_idx"),
        F.col("y").alias("observed"),
        F.when(F.col("y") > 0, F.col("y").cast("double")).otherwise(
            (y0 * (i1 - F.col("i")) + y1 * (F.col("i") - i0)).cast("double")
            / (i1 - i0).cast("double")
        ).alias("y_interp"),
    )


# ---------------------------------------------------------------------------
# Kendall tau between two nation rankings (r9): revenue rank vs total
# account balance rank over the 25-nation dimension — concordant and
# discordant pairs counted exactly on the dictionary-sized pair join
# (n² = 625 combos after the fact aggregates), tau-a as one exact
# division. The rank-agreement primitive behind "do two metrics order
# entities the same way".
# ---------------------------------------------------------------------------
@query(
    "kendall_tau_nations",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nk,
             CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100
                  AS HUGEINT)) AS HUGEINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ),
    bal AS (
      SELECT c_nationkey AS nk,
             CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100
                  AS HUGEINT)) AS HUGEINT) AS bcents
      FROM customer GROUP BY 1
    ),
    r AS (
      SELECT rev.nk,
             row_number() OVER (ORDER BY rev.cents DESC, rev.nk ASC) AS rx,
             row_number() OVER (ORDER BY bal.bcents DESC, bal.nk ASC) AS ry
      FROM rev JOIN bal ON bal.nk = rev.nk
    ),
    pairs AS (
      SELECT CASE WHEN (a.rx - b.rx) * (a.ry - b.ry) > 0 THEN 1 ELSE 0 END
               AS conc
      FROM r a JOIN r b ON a.nk < b.nk
    )
    SELECT CAST((SELECT count(*) FROM r) AS BIGINT) AS n,
           CAST(sum(conc) AS BIGINT) AS concordant,
           CAST(count(*) - sum(conc) AS BIGINT) AS discordant,
           CAST(2 * sum(conc) - count(*) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS tau
    FROM pairs
    """,
)
def q_kendall_tau_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a between nation revenue and account-balance rankings: exact concordant/discordant pair counts on the 25-row dimension, one exact division."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    rev = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            o["o_custkey"] == c["c_custkey"],
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast(
                    "decimal(38,0)"
                )
            ).alias("cents")
        )
    )
    bal = c.groupBy(F.col("c_nationkey").alias("bnk")).agg(
        F.sum(
            (F.col("c_acctbal").cast("decimal(14,2)") * 100).cast(
                "decimal(38,0)"
            )
        ).alias("bcents")
    )
    j = rev.join(F.broadcast(bal), F.col("nk") == F.col("bnk"))
    wx = W.orderBy(F.col("cents").desc(), F.col("nk").asc())
    wy = W.orderBy(F.col("bcents").desc(), F.col("nk").asc())
    r = j.select(
        "nk",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    a = r.select(
        F.col("nk").alias("ank"), F.col("rx").alias("arx"),
        F.col("ry").alias("ary"),
    )
    bt = r.select(
        F.col("nk").alias("bnk2"), F.col("rx").alias("brx"),
        F.col("ry").alias("bry"),
    )
    pairs = a.join(F.broadcast(bt), F.col("ank") < F.col("bnk2")).select(
        F.when(
            (F.col("arx") - F.col("brx")) * (F.col("ary") - F.col("bry"))
            > 0,
            1,
        )
        .otherwise(0)
        .alias("conc")
    )
    n = r.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = pairs.groupBy().agg(
        F.sum("conc").cast("long").alias("concordant"),
        (F.count(F.lit(1)) - F.sum("conc")).cast("long").alias("discordant"),
        F.count(F.lit(1)).alias("np"),
    )
    return agg.crossJoin(F.broadcast(n)).select(
        "n",
        "concordant",
        "discordant",
        (
            (2 * F.col("concordant") - F.col("np")).cast("double")
            / F.col("np").cast("double")
        ).alias("tau"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap CI (r9): the resampling scheme that actually works
# distributed — independent Poisson(1) weights per (row, replicate)
# replace multinomial resampling (Chamandy et al., "Estimating
# Uncertainty for Massive Data Streams", Google 2012), so 32 bootstrap
# replicates of the mean come from ONE scan with a 32-way explode and
# a keyed aggregate. The weights are decided by comparing the 32-bit
# md5 lane against PRECOMPUTED INTEGER cutoffs (inverse Poisson CDF ·
# 2^32) — no floats anywhere until each replicate's single exact mean
# division. CI = explicit order statistics of the 32 replicate means.
# ---------------------------------------------------------------------------
_POIS_CUTS = (1580030168, 3160060337, 3950075421, 4213413783)


def _pois_w(lane: str) -> str:
    c = _POIS_CUTS
    return (
        f"CASE WHEN {lane} < {c[0]} THEN 0 WHEN {lane} < {c[1]} THEN 1 "
        f"WHEN {lane} < {c[2]} THEN 2 WHEN {lane} < {c[3]} THEN 3 "
        f"ELSE 4 END"
    )


@query(
    "bootstrap_ci_poisson",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey AS id,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS HUGEINT)
               AS cents
      FROM orders
    ),
    reps AS (SELECT unnest(range(0, 32)) AS b),
    w AS (
      SELECT r.b, o.cents,
             {_pois_w("(" + __import__("datalake_etlscripts_spark.plans.registry", fromlist=["ddb_hex32"]).ddb_hex32("md5(CAST(o.id AS VARCHAR) || '#' || CAST(r.b AS VARCHAR))") + ")")} AS wt
      FROM o CROSS JOIN reps r
    ),
    boot AS (
      SELECT CAST(b AS INT) AS replicate,
             CAST(sum(wt) AS BIGINT) AS n_eff,
             CAST(sum(wt * cents) AS BIGINT) AS s_cents,
             CAST(CAST(sum(wt * cents) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(sum(wt) AS VARCHAR) AS DOUBLE) AS mean_cents
      FROM w GROUP BY 1
    ),
    pt AS (
      SELECT CAST(CAST(sum(cents) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(count(*) AS VARCHAR) AS DOUBLE) AS point_mean
      FROM o
    )
    SELECT replicate, n_eff, s_cents, mean_cents,
           CAST(row_number() OVER (ORDER BY mean_cents, replicate)
                AS BIGINT) AS rk,
           pt.point_mean
    FROM boot CROSS JOIN pt
    """,
)
def q_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson(1) bootstrap of the mean order value: 32 replicates from one scan via integer md5-cutoff weights (no multinomial shuffle), exact per-replicate mean divisions, CI read off explicit order statistics."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("decimal(38,0)")
        .alias("cents"),
    )
    # r07 (guide §2.5 input skew): the single-row-group orders file
    # scans as ONE task, and the ×32-replicate cross join + per-row
    # md5 weight lane all ran on that one core (wall ≈ JVM CPU).
    # Spreading the scan is a no-op once the table has real splits.
    o_wide = spread_small_input(o)
    reps = spark.range(0, 32).select(F.col("id").cast("int").alias("b"))
    lane = (
        "conv(substring(md5(concat(CAST(id AS STRING), '#',"
        " CAST(b AS STRING))), 1, 8), 16, 10)"
    )
    w = o_wide.crossJoin(F.broadcast(reps)).withColumn(
        "wt", F.expr(_pois_w(f"CAST({lane} AS BIGINT)")).cast("decimal(38,0)")
    )
    boot = w.groupBy(F.col("b").alias("replicate")).agg(
        F.sum("wt").cast("long").alias("n_eff"),
        F.sum(F.col("wt") * F.col("cents")).cast("long").alias("s_cents"),
        (
            F.sum(F.col("wt") * F.col("cents")).cast("string").cast("double")
            / F.sum("wt").cast("string").cast("double")
        ).alias("mean_cents"),
    )
    pt = o.groupBy().agg(
        (
            F.sum("cents").cast("string").cast("double")
            / F.count(F.lit(1)).cast("string").cast("double")
        ).alias("point_mean")
    )
    wr = W.orderBy("mean_cents", "replicate")
    return (
        boot.withColumn("rk", F.row_number().over(wr).cast("long"))
        .crossJoin(F.broadcast(pt))
        .select(
            "replicate", "n_eff", "s_cents", "mean_cents", "rk", "point_mean"
        )
    )


# ---------------------------------------------------------------------------
# SPRT sequential A/B monitor (r9): Wald's sequential probability
# ratio test of conversion rate per md5 arm — H0 p=0.45 vs H1 p=0.55,
# α = β = 0.05. Each hour's log-likelihood ratio is computed DIRECTLY
# from the exact cumulative (successes k, trials n) as
# k·L1 + (n−k)·L2 with L1/L2 PYTHON-PRECOMPUTED double literals (both
# engines parse the identical decimal literal — never a running float
# sum, never an in-engine ln). Boundaries ±ln(19) likewise literal.
# The per-arm cumulative counts ride the hourly spine.
# ---------------------------------------------------------------------------
_SPRT_L1 = "CAST(0.20067069546215124 AS DOUBLE)"
_SPRT_L2 = "CAST(-0.20067069546215124 AS DOUBLE)"
_SPRT_A = "2.9444389791664403"
_SPRT_AD = "CAST(2.9444389791664403 AS DOUBLE)"


@query(
    "sprt_ab_monitor",
    oracle=f"""
    WITH t AS (
      SELECT CASE WHEN {__import__("datalake_etlscripts_spark.plans.registry", fromlist=["ddb_hex32"]).ddb_hex32("md5(CAST(user_id AS VARCHAR))")} % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             date_trunc('hour', ts) AS hr,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS succ
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    h AS (
      SELECT arm, hr, CAST(count(*) AS BIGINT) AS n_h,
             CAST(sum(succ) AS BIGINT) AS k_h
      FROM t GROUP BY 1, 2
    ),
    c AS (
      SELECT arm, hr,
             CAST(sum(n_h) OVER w AS BIGINT) AS n,
             CAST(sum(k_h) OVER w AS BIGINT) AS k
      FROM h WINDOW w AS (PARTITION BY arm ORDER BY hr
                          ROWS UNBOUNDED PRECEDING)
    ),
    l AS (
      SELECT arm, hr, n, k,
             k * {_SPRT_L1} + (n - k) * ({_SPRT_L2}) AS llr
      FROM c
    )
    SELECT arm, hr, n, k, llr,
           CASE WHEN llr >= {_SPRT_AD} THEN 'accept_h1'
                WHEN llr <= -{_SPRT_AD} THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           CAST(CASE WHEN abs(llr) >= {_SPRT_AD}
                     AND row_number() OVER (PARTITION BY arm,
                       CASE WHEN abs(llr) >= {_SPRT_AD} THEN 1 ELSE 0 END
                       ORDER BY hr) = 1
                THEN 1 ELSE 0 END AS INT) AS first_crossing
    FROM l
    """,
)
def q_sprt_ab_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT sequential conversion-rate monitor per md5 arm: hourly LLR computed directly from exact cumulative counts times Python-precomputed literals (no in-engine ln, no running float sum), literal +/-ln(19) boundaries, first-crossing flags."""
    e = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    lane = "conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
    t = e.select(
        F.when(F.expr(f"CAST({lane} AS BIGINT) % 2 = 0"), "A")
        .otherwise("B")
        .alias("arm"),
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "succ"
        ),
    )
    h = t.groupBy("arm", "hr").agg(
        F.count(F.lit(1)).alias("n_h"), F.sum("succ").alias("k_h")
    )
    wc = (
        W.partitionBy("arm")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    c = h.select(
        "arm",
        "hr",
        F.sum("n_h").over(wc).cast("long").alias("n"),
        F.sum("k_h").over(wc).cast("long").alias("k"),
    )
    llr = F.expr(f"k * {_SPRT_L1} + (n - k) * ({_SPRT_L2})")
    l = c.withColumn("llr", llr)
    crossed = F.abs(F.col("llr")) >= float(_SPRT_A)
    wf = W.partitionBy(
        "arm", F.when(crossed, 1).otherwise(0)
    ).orderBy("hr")
    return l.select(
        "arm",
        "hr",
        "n",
        "k",
        "llr",
        F.when(F.col("llr") >= float(_SPRT_A), "accept_h1")
        .when(F.col("llr") <= -float(_SPRT_A), "accept_h0")
        .otherwise("continue")
        .alias("decision"),
        F.when(crossed & (F.row_number().over(wf) == 1), 1)
        .otherwise(0)
        .cast("int")
        .alias("first_crossing"),
    )


# ---------------------------------------------------------------------------
# Exact ridge regression (r9): y = n_chars on (1, n_tokens,
# n_sentences) with λ = 100, solved in closed form by Cramer's rule on
# the 3×3 regularized normal equations — every matrix entry is an
# exact DECIMAL(38,0) moment from ONE scan, each determinant a fixed
# polynomial of those integers, each coefficient ONE exact division.
# The multivariate big sibling of ols_trend_by_lang (which is 1D).
# At extreme scale pre-scale features by a common power of ten to keep
# determinant magnitude inside DECIMAL(38) — noted, not needed here.
# ---------------------------------------------------------------------------
_RIDGE_FEATS = """
      SELECT CAST(n_chars AS HUGEINT) AS y,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                  AS HUGEINT) AS x1,
             CAST(len(string_split(text, '.')) - 1 AS HUGEINT) AS x2
      FROM documents
"""


@query(
    "ridge_regression_exact",
    oracle=f"""
    WITH f AS ({_RIDGE_FEATS}),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
             sum(x2 * x2) AS s22,
             sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
      FROM f
    ),
    d AS (
      SELECT n, sy, s1y, s2y,
             (n + 100) AS a, s1 AS b, s2 AS c,
             (s11 + 100) AS e, s12 AS g, (s22 + 100) AS h
      FROM m
    ),
    det AS (
      SELECT *,
             a * (e * h - g * g) - b * (b * h - g * c)
               + c * (b * g - e * c) AS dd,
             sy * (e * h - g * g) - b * (s1y * h - g * s2y)
               + c * (s1y * g - e * s2y) AS d0,
             a * (s1y * h - s2y * g) - sy * (b * h - g * c)
               + c * (b * s2y - s1y * c) AS d1,
             a * (e * s2y - s1y * g) - b * (b * s2y - s1y * c)
               + sy * (b * g - e * c) AS d2
      FROM d
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(CAST(dd AS VARCHAR) AS DOUBLE) AS det,
           CAST(CAST(d0 AS VARCHAR) AS DOUBLE)
             / CAST(CAST(dd AS VARCHAR) AS DOUBLE) AS b0,
           CAST(CAST(d1 AS VARCHAR) AS DOUBLE)
             / CAST(CAST(dd AS VARCHAR) AS DOUBLE) AS b1,
           CAST(CAST(d2 AS VARCHAR) AS DOUBLE)
             / CAST(CAST(dd AS VARCHAR) AS DOUBLE) AS b2
    FROM det
    """,
)
def q_ridge_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (lambda=100) of doc length on token and sentence counts: exact DECIMAL normal-equation moments from one scan, Cramer determinants as fixed integer polynomials, one exact division per coefficient."""
    d = read_table(spark, sf_dir, "documents")
    f = d.select(
        F.col("n_chars").cast("decimal(38,0)").alias("y"),
        F.expr(
            "CAST(size(filter(split(text, ' '), t -> t != ''))"
            " AS DECIMAL(38,0))"
        ).alias("x1"),
        (F.size(F.split(F.col("text"), "\\.")) - 1)
        .cast("decimal(38,0)")
        .alias("x2"),
    )
    m = f.groupBy().agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    a = F.col("n") + 100
    b = F.col("s1")
    c = F.col("s2")
    e = F.col("s11") + 100
    g = F.col("s12")
    h = F.col("s22") + 100
    sy, s1y, s2y = F.col("sy"), F.col("s1y"), F.col("s2y")
    dd = a * (e * h - g * g) - b * (b * h - g * c) + c * (b * g - e * c)
    d0 = sy * (e * h - g * g) - b * (s1y * h - g * s2y) + c * (
        s1y * g - e * s2y
    )
    d1 = a * (s1y * h - s2y * g) - sy * (b * h - g * c) + c * (
        b * s2y - s1y * c
    )
    d2 = a * (e * s2y - s1y * g) - b * (b * s2y - s1y * c) + sy * (
        b * g - e * c
    )

    def dd_(x):
        return x.cast("string").cast("double")

    return m.select(
        F.col("n").cast("long").alias("n"),
        dd_(dd).alias("det"),
        (dd_(d0) / dd_(dd)).alias("b0"),
        (dd_(d1) / dd_(dd)).alias("b1"),
        (dd_(d2) / dd_(dd)).alias("b2"),
    )


# ---------------------------------------------------------------------------
# Exact 2×2 PCA (r9): principal axes of embedding dims (0, 1) —
# coordinates quantized to integers by floor(x·2^20) (exact: float32→
# double is lossless, ×2^20 is a power-of-two scale, floor is
# deterministic), covariance numerators via the n·Σ−ΣΣ identity in
# DECIMAL, then the 2×2 eigenpair in closed form:
# λ± = (tr ± √(tr²−4·det))/2 with the eigenvector reported as its
# un-normalized components (no atan2, no libm angle). Explained-
# variance ratio is one division.
# ---------------------------------------------------------------------------
@query(
    "pca_2d_eigen",
    oracle="""
    WITH q AS (
      SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1048576)
                  AS HUGEINT) AS a,
             CAST(floor(CAST(embedding[2] AS DOUBLE) * 1048576)
                  AS HUGEINT) AS b
      FROM embeddings
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(a) AS sa, sum(b) AS sb,
             sum(a * a) AS saa, sum(b * b) AS sbb, sum(a * b) AS sab
      FROM q
    ),
    c AS (
      SELECT n,
             n * saa - sa * sa AS ca,
             n * sbb - sb * sb AS cb,
             n * sab - sa * sb AS cab
      FROM m
    ),
    ei AS (
      SELECT n, ca, cb, cab,
             CAST(CAST(ca AS VARCHAR) AS DOUBLE) AS cad,
             CAST(CAST(cb AS VARCHAR) AS DOUBLE) AS cbd,
             CAST(CAST(cab AS VARCHAR) AS DOUBLE) AS cabd
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
           CAST(cab AS BIGINT) AS cab,
           (cad + cbd + sqrt((cad - cbd) * (cad - cbd)
                             + 4 * cabd * cabd)) / 2 AS lam1,
           (cad + cbd - sqrt((cad - cbd) * (cad - cbd)
                             + 4 * cabd * cabd)) / 2 AS lam2,
           (cad + cbd + sqrt((cad - cbd) * (cad - cbd)
                             + 4 * cabd * cabd)) / 2
             / (cad + cbd) AS evr,
           cabd AS v_x,
           (cbd - cad + sqrt((cad - cbd) * (cad - cbd)
                             + 4 * cabd * cabd)) / 2 AS v_y
    FROM ei
    """,
)
def q_pca_2d_eigen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2x2 PCA of embedding dims 0-1: power-of-two integer quantization, DECIMAL covariance numerators, closed-form eigenpair with the eigenvector as raw components - no libm beyond one sqrt."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        F.floor(F.col("embedding")[0].cast("double") * 1048576)
        .cast("decimal(38,0)")
        .alias("a"),
        F.floor(F.col("embedding")[1].cast("double") * 1048576)
        .cast("decimal(38,0)")
        .alias("b"),
    )
    m = q.groupBy().agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
    )
    ca = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    cb = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    cab = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")

    def dd_(x):
        return x.cast("string").cast("double")

    c = m.select(
        F.col("n").cast("long").alias("n"),
        ca.cast("long").alias("ca"),
        cb.cast("long").alias("cb"),
        cab.cast("long").alias("cab"),
        dd_(ca).alias("cad"),
        dd_(cb).alias("cbd"),
        dd_(cab).alias("cabd"),
    )
    disc = F.sqrt(
        (F.col("cad") - F.col("cbd")) * (F.col("cad") - F.col("cbd"))
        + 4 * F.col("cabd") * F.col("cabd")
    )
    lam1 = (F.col("cad") + F.col("cbd") + disc) / 2
    lam2 = (F.col("cad") + F.col("cbd") - disc) / 2
    return c.select(
        "n",
        "ca",
        "cb",
        "cab",
        lam1.alias("lam1"),
        lam2.alias("lam2"),
        (lam1 / (F.col("cad") + F.col("cbd"))).alias("evr"),
        F.col("cabd").alias("v_x"),
        ((F.col("cbd") - F.col("cad") + disc) / 2).alias("v_y"),
    )


# ---------------------------------------------------------------------------
# Matryoshka-truncation recall (r9): how much ANN quality survives
# using only the first d dims of the 64-dim embeddings (the MRL
# deployment question — shorter prefixes mean cheaper indexes)?
# Top-5 per query at d ∈ {8, 16, 32, 64} via the SAME left-fold dot
# product as ann_cosine_topk (fixed order → bit-deterministic), then
# overlap@5 against the full-dim answer — integer overlap counts, one
# exact division. At scale each prefix run is the standard broadcast
# query block; the d-sweep multiplies work by |dims|, not corpus².
# ---------------------------------------------------------------------------
def _mat_scored(d: int) -> str:
    slice_q = f"list_slice(qv, 1, {d})"
    slice_c = f"list_slice(cv, 1, {d})"
    return f"""
      SELECT {d} AS dim, query_id, neighbor_id,
        list_reduce(list_prepend(0.0, list_transform(
            list_zip({slice_q}, {slice_c}),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))),
            (a, b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform({slice_q},
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform({slice_c},
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b)))
          AS cos_sim
      FROM c, q WHERE query_id <> neighbor_id"""


_MAT_DIMS = (8, 16, 32, 64)

_MAT_ORACLE = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS ({" UNION ALL ".join(_mat_scored(d) for d in _MAT_DIMS)}),
    topk AS (
      SELECT dim, query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY dim, query_id
          ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored
      ) WHERE rank <= 5
    ),
    full_ AS (SELECT query_id, neighbor_id FROM topk WHERE dim = 64)
    SELECT t.dim, t.query_id,
           CAST(count(f.neighbor_id) AS BIGINT) AS overlap,
           CAST(count(f.neighbor_id) AS DOUBLE) / 5.0 AS recall_at_5
    FROM topk t LEFT JOIN full_ f
      ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    GROUP BY 1, 2
"""


@query("matryoshka_recall", oracle=_MAT_ORACLE)
def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka prefix-truncation recall: top-5 cosine neighbors at dims 8/16/32/64 via the fixed-order fold, overlap@5 vs the full dimension - integer overlaps, one division."""
    from datalake_etlscripts_spark.operators.similarity import (
        brute_force_topk,
    )

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    parts = []
    for d in _MAT_DIMS:
        ed = e.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        qd = q.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        parts.append(
            brute_force_topk(ed, qd, k=5)
            .select("query_id", "neighbor_id")
            .withColumn("dim", F.lit(d))
        )
    topk = parts[0]
    for p in parts[1:]:
        topk = topk.unionByName(p)
    full = topk.filter(F.col("dim") == 64).select(
        F.col("query_id").alias("fq"), F.col("neighbor_id").alias("fn")
    )
    j = topk.join(
        full,
        (F.col("query_id") == F.col("fq"))
        & (F.col("neighbor_id") == F.col("fn")),
        "left",
    )
    return j.groupBy("dim", "query_id").agg(
        F.count("fn").cast("long").alias("overlap"),
        (F.count("fn").cast("double") / F.lit(5.0)).alias("recall_at_5"),
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction (r9): the industry-standard experiment
# adjustment — Y_adj = Y − θ(X − E[X]) with X a PRE-period covariate
# and θ = cov(X,Y)/var(X) pooled across arms. All moments are exact
# integers from one user-grain aggregate; θ, the adjusted means and
# the variance-reduction ratio are fixed-order double combines. Arms
# on the md5 lane; pre = Jan 1–15 activity count, Y = post purchases.
# ---------------------------------------------------------------------------
@query(
    "cuped_adjusted_ab",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN {__import__("datalake_etlscripts_spark.plans.registry", fromlist=["ddb_hex32"]).ddb_hex32("md5(CAST(user_id AS VARCHAR))")} % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(count(*) FILTER (ts < TIMESTAMP '2024-01-16') AS HUGEINT)
               AS x,
             CAST(count(*) FILTER (ts >= TIMESTAMP '2024-01-16'
                  AND event_type = 'purchase') AS HUGEINT) AS y
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      FROM u
    ),
    th AS (
      SELECT n, sx, sy,
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
               / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
               AS theta,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE)
               / CAST(CAST(n AS VARCHAR) AS DOUBLE) AS mx
      FROM g
    ),
    adj AS (
      SELECT u.arm,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(u.y) AS BIGINT) AS sum_y,
             CAST(CAST(sum(u.y) AS VARCHAR) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS raw_mean,
             CAST(CAST(sum(u.y) AS VARCHAR) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)
             - any_value(th.theta)
               * (CAST(CAST(sum(u.x) AS VARCHAR) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) - any_value(th.mx))
               AS adj_mean
      FROM u CROSS JOIN th GROUP BY u.arm
    )
    SELECT a.arm, a.n_users, a.sum_y, a.raw_mean, a.adj_mean,
           th.theta,
           1.0 - CAST(CAST(g.n * g.sxy - g.sx * g.sy AS VARCHAR) AS DOUBLE)
                 * CAST(CAST(g.n * g.sxy - g.sx * g.sy AS VARCHAR)
                        AS DOUBLE)
                 / (CAST(CAST(g.n * g.sxx - g.sx * g.sx AS VARCHAR)
                         AS DOUBLE)
                    * CAST(CAST(g.n * g.syy - g.sy * g.sy AS VARCHAR)
                           AS DOUBLE)) AS var_ratio
    FROM adj a CROSS JOIN th CROSS JOIN g
    """,
)
def q_cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B readout: pooled theta = cov/var from exact integer moments, per-arm raw and adjusted means, residual variance ratio 1-rho^2 - fixed-order double combines only."""
    e = read_table(spark, sf_dir, "events")
    lane = "conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
    cut = "2024-01-16"
    u = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts") < F.lit(cut).cast("timestamp"), 1).otherwise(
                0
            )
        )
        .cast("decimal(38,0)")
        .alias("x"),
        F.sum(
            F.when(
                (F.col("ts") >= F.lit(cut).cast("timestamp"))
                & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        )
        .cast("decimal(38,0)")
        .alias("y"),
    ).withColumn(
        "arm",
        F.when(F.expr(f"CAST({lane} AS BIGINT) % 2 = 0"), "A").otherwise(
            "B"
        ),
    )
    g = u.groupBy().agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )

    def dd_(c):
        return c.cast("string").cast("double")

    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    th = g.select(
        "n",
        "sx",
        "sy",
        "sxx",
        "sxy",
        "syy",
        (dd_(num) / dd_(vx)).alias("theta"),
        (dd_(F.col("sx")) / F.col("n").cast("double")).alias("mx"),
    )
    adj = (
        u.crossJoin(F.broadcast(th))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("y").cast("long").alias("sum_y"),
            (
                dd_(F.sum("y")) / F.count(F.lit(1)).cast("double")
            ).alias("raw_mean"),
            # algebraic form: Σ(y−θ(x−mx)) = Σy − θ(Σx − n·mx), so the
            # combine uses ONLY exact integer sums (never a float sum
            # over user-grain terms — reduction order would leak in)
            (
                dd_(F.sum("y")) / F.count(F.lit(1)).cast("double")
                - F.first("theta")
                * (
                    dd_(F.sum("x")) / F.count(F.lit(1)).cast("double")
                    - F.first("mx")
                )
            ).alias("adj_mean"),
            F.first("theta").alias("theta"),
        )
    )
    var_ratio = F.lit(1.0) - dd_(num) * dd_(num) / (dd_(vx) * dd_(vy))
    gg = g.select(var_ratio.alias("var_ratio"))
    return adj.crossJoin(F.broadcast(gg)).select(
        "arm",
        "n_users",
        "sum_y",
        "raw_mean",
        "adj_mean",
        "theta",
        "var_ratio",
    )


# ---------------------------------------------------------------------------
# SPC c-chart (r9): statistical process control on hourly error
# counts — centerline c̄ and ±3√c̄ control limits, but every violation
# flag is decided by PURE INTEGER cross-multiplication:
# with S = Σc, n = hours, X = x·n − S, flag iff X > 0 ∧ X² > 9·S·n
# (upper) or X < 0 ∧ X² > 9·S·n (lower) — algebraically identical to
# |x − c̄| > 3√c̄, no sqrt in the decision path. The limits themselves
# ride along as display doubles. One fact aggregate; spine-bounded.
# ---------------------------------------------------------------------------
@query(
    "spc_c_chart",
    oracle="""
    WITH b AS (
      SELECT min(date_trunc('hour', ts)) AS lo,
             max(date_trunc('hour', ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b
    ),
    h AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    dense AS (
      SELECT s.hr, coalesce(h.c, 0) AS x FROM spine s
      LEFT JOIN h ON h.hr = s.hr
    ),
    g AS (SELECT CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
          FROM dense)
    SELECT d.hr, d.x,
           CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE) AS center,
           CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE)
             + 3 * sqrt(CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE)) AS ucl,
           CAST(CASE WHEN d.x * g.n - g.s > 0
                     AND (d.x * g.n - g.s) * (d.x * g.n - g.s)
                         > 9 * g.s * g.n
                THEN 1 ELSE 0 END AS INT) AS above_ucl,
           CAST(CASE WHEN d.x * g.n - g.s < 0
                     AND (d.x * g.n - g.s) * (d.x * g.n - g.s)
                         > 9 * g.s * g.n
                THEN 1 ELSE 0 END AS INT) AS below_lcl
    FROM dense d CROSS JOIN g
    """,
)
def q_spc_c_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPC c-chart on hourly error counts: 3-sigma Poisson control limits with violation flags decided by integer cross-multiplication (no sqrt in the decision path), spine-bounded."""
    e = read_table(spark, sf_dir, "events")
    h = (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    b = e.groupBy().agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = b.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hr"
        )
    )
    dense = spine.join(h, "hr", "left").select(
        "hr", F.coalesce("c", F.lit(0)).alias("x")
    )
    g = dense.groupBy().agg(
        F.sum("x").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    d = dense.crossJoin(F.broadcast(g))
    X = F.col("x") * F.col("n") - F.col("s")
    thresh = 9 * F.col("s") * F.col("n")
    center = F.col("s").cast("double") / F.col("n").cast("double")
    return d.select(
        "hr",
        "x",
        center.alias("center"),
        (center + 3 * F.sqrt(center)).alias("ucl"),
        F.when((X > 0) & (X * X > thresh), 1)
        .otherwise(0)
        .cast("int")
        .alias("above_ucl"),
        F.when((X < 0) & (X * X > thresh), 1)
        .otherwise(0)
        .cast("int")
        .alias("below_lcl"),
    )


# ---------------------------------------------------------------------------
# IPS / SNIPS off-policy evaluation (r9): estimate a TARGET policy's
# value from logs of a uniform-random logging policy without running
# it — the counterfactual primitive behind recommendation and ranking
# iteration. Logged action = md5 lane mod 4 (propensity exactly 1/4),
# reward = deterministic md5 draw whose success rate RISES with the
# arm index, target policy = always arm 3. IPS multiplies matched
# rewards by the exact integer inverse propensity (×4); SNIPS
# self-normalizes. Integer sums, two exact divisions.
# ---------------------------------------------------------------------------
@query(
    "ips_offpolicy_estimate",
    oracle=f"""
    WITH t AS (
      SELECT event_id,
             {__import__("datalake_etlscripts_spark.plans.registry", fromlist=["ddb_hex32"]).ddb_hex32("md5(CAST(event_id AS VARCHAR))")} % 4 AS a_log,
             {__import__("datalake_etlscripts_spark.plans.registry", fromlist=["ddb_hex32"]).ddb_hex32("md5('r:' || CAST(event_id AS VARCHAR))")} % 10 AS rdraw
      FROM events
    ),
    l AS (
      SELECT event_id, a_log,
             CASE WHEN rdraw < 3 + a_log THEN 1 ELSE 0 END AS r,
             CASE WHEN a_log = 3 THEN 1 ELSE 0 END AS match_
      FROM t
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(match_) AS BIGINT) AS n_matched,
             CAST(sum(r * match_) AS BIGINT) AS matched_r
      FROM l
    )
    SELECT n, n_matched, sum_r, matched_r,
           CAST(sum_r AS DOUBLE) / CAST(n AS DOUBLE) AS logged_value,
           CAST(4 * matched_r AS DOUBLE) / CAST(n AS DOUBLE) AS ips,
           CAST(matched_r AS DOUBLE) / CAST(n_matched AS DOUBLE) AS snips
    FROM m
    """,
)
def q_ips_offpolicy_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPS and SNIPS off-policy value estimates from uniform-random logs: exact integer inverse-propensity weights (x4), md5-deterministic actions and rewards, two exact divisions."""
    e = read_table(spark, sf_dir, "events")
    lane = "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    rlane = "CAST(conv(substring(md5(concat('r:', CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    l = e.select(
        F.expr(f"{lane} % 4").alias("a_log"),
        F.expr(f"{rlane} % 10").alias("rdraw"),
    ).select(
        "a_log",
        F.when(F.col("rdraw") < 3 + F.col("a_log"), 1).otherwise(0).alias(
            "r"
        ),
        F.when(F.col("a_log") == 3, 1).otherwise(0).alias("match_"),
    )
    m = l.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("sum_r"),
        F.sum("match_").cast("long").alias("n_matched"),
        F.sum(F.col("r") * F.col("match_")).cast("long").alias("matched_r"),
    )
    return m.select(
        "n",
        "n_matched",
        "sum_r",
        "matched_r",
        (F.col("sum_r").cast("double") / F.col("n").cast("double")).alias(
            "logged_value"
        ),
        (
            (4 * F.col("matched_r")).cast("double")
            / F.col("n").cast("double")
        ).alias("ips"),
        (
            F.col("matched_r").cast("double")
            / F.col("n_matched").cast("double")
        ).alias("snips"),
    )


# ---------------------------------------------------------------------------
# Doubly-robust off-policy estimate (r9): DR = direct model + IPS
# correction. With a per-arm mean-reward model q̂(a) = S_a/N_a fit on
# the same logs and the target "always arm 3", the estimator folds to
# the ALGEBRAIC form
#     DR = S₃/N₃ + (4/n)·(matched_r − n_matched·S₃/N₃)
# so — like the CUPED combine — no float sum ever runs over row-grain
# terms: integer sums from one scan, three exact divisions in fixed
# order. Reports direct, IPS and DR side by side (DR keeps IPS's
# unbiasedness with the model's variance).
# ---------------------------------------------------------------------------
@query(
    "dr_offpolicy_estimate",
    oracle=f"""
    WITH t AS (
      SELECT event_id,
             {__import__("datalake_etlscripts_spark.plans.registry", fromlist=["ddb_hex32"]).ddb_hex32("md5(CAST(event_id AS VARCHAR))")} % 4 AS a_log,
             {__import__("datalake_etlscripts_spark.plans.registry", fromlist=["ddb_hex32"]).ddb_hex32("md5('r:' || CAST(event_id AS VARCHAR))")} % 10 AS rdraw
      FROM events
    ),
    l AS (
      SELECT CASE WHEN rdraw < 3 + a_log THEN 1 ELSE 0 END AS r,
             CASE WHEN a_log = 3 THEN 1 ELSE 0 END AS match_
      FROM t
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(match_) AS BIGINT) AS n3,
             CAST(sum(r * match_) AS BIGINT) AS s3
      FROM l
    )
    SELECT n, n3, s3,
           CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE) AS direct_q3,
           CAST(4 * s3 AS DOUBLE) / CAST(n AS DOUBLE) AS ips,
           CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE)
             + (CAST(4 * s3 AS DOUBLE)
                - CAST(4 * n3 AS DOUBLE)
                  * (CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE)))
               / CAST(n AS DOUBLE) AS dr
    FROM m
    """,
)
def q_dr_offpolicy_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust off-policy value: per-arm direct model plus exact-weight IPS correction folded to an algebraic combine of integer sums - no row-grain float summation, three fixed-order divisions."""
    e = read_table(spark, sf_dir, "events")
    lane = "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    rlane = "CAST(conv(substring(md5(concat('r:', CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    l = e.select(
        F.expr(f"{lane} % 4").alias("a_log"),
        F.expr(f"{rlane} % 10").alias("rdraw"),
    ).select(
        F.when(F.col("rdraw") < 3 + F.col("a_log"), 1).otherwise(0).alias(
            "r"
        ),
        F.when(F.col("a_log") == 3, 1).otherwise(0).alias("match_"),
    )
    m = l.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("match_").cast("long").alias("n3"),
        F.sum(F.col("r") * F.col("match_")).cast("long").alias("s3"),
    )
    q3 = F.col("s3").cast("double") / F.col("n3").cast("double")
    return m.select(
        "n",
        "n3",
        "s3",
        q3.alias("direct_q3"),
        ((4 * F.col("s3")).cast("double") / F.col("n").cast("double")).alias(
            "ips"
        ),
        (
            q3
            + (
                (4 * F.col("s3")).cast("double")
                - (4 * F.col("n3")).cast("double") * q3
            )
            / F.col("n").cast("double")
        ).alias("dr"),
    )


# ---------------------------------------------------------------------------
# Propensity-stratified ATE (r9): the observational-causal companion
# to the randomized CUPED readout — users stratify into quintiles of
# the pre-period activity covariate (distributed rank + integer index
# arithmetic, the RFM lane), the treatment effect is estimated within
# each stratum and combined with stratum-share weights. The combine
# PIVOTS the five strata into literal columns so the final
# Σ (n_s/n)·(ȳ₁s − ȳ₀s) is one FIXED-ORDER expression — never a float
# sum over a 5-row aggregate whose reduction order could drift.
# ---------------------------------------------------------------------------
_PSM_LANE = "md5(CAST(user_id AS VARCHAR))"


def _psm_cell(s: int, arm: int, agg: str) -> str:
    return (
        f"CAST(coalesce(sum(CASE WHEN st = {s} AND arm = {arm}"
        f" THEN {agg} END), 0) AS BIGINT)"
    )


def _psm_oracle() -> str:
    from datalake_etlscripts_spark.plans.registry import ddb_hex32

    cells = ",\n             ".join(
        f"{_psm_cell(s, a, agg)} AS {n}{s}_{a}"
        for s in range(1, 6)
        for a, agg in ((1, "1"), (0, "1"))
        for n in ("c",)
    ) + ",\n             " + ",\n             ".join(
        f"{_psm_cell(s, a, 'y')} AS s{s}_{a}"
        for s in range(1, 6)
        for a in (1, 0)
    )
    diffs = " + ".join(
        f"(CASE WHEN c{s}_1 > 0 AND c{s}_0 > 0 THEN"
        f" (CAST(c{s}_1 + c{s}_0 AS DOUBLE) / CAST(n AS DOUBLE))"
        f" * (CAST(s{s}_1 AS DOUBLE) / CAST(c{s}_1 AS DOUBLE)"
        f"    - CAST(s{s}_0 AS DOUBLE) / CAST(c{s}_0 AS DOUBLE))"
        f" ELSE 0.0 END)"
        for s in range(1, 6)
    )
    return f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN {ddb_hex32(_PSM_LANE)} % 2 = 0 THEN 1 ELSE 0 END
               AS arm,
             CAST(count(*) FILTER (ts < TIMESTAMP '2024-01-16') AS BIGINT)
               AS x,
             CAST(count(*) FILTER (ts >= TIMESTAMP '2024-01-16'
                  AND event_type = 'purchase') AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    r AS (
      SELECT *, row_number() OVER (ORDER BY x, user_id) AS rk,
             count(*) OVER () AS nn
      FROM u
    ),
    st AS (
      SELECT arm, y, CAST(1 + ((rk - 1) * 5) // nn AS INT) AS st FROM r
    ),
    wide AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {cells}
      FROM st
    )
    SELECT n,
           {', '.join(f'c{s}_1, c{s}_0, s{s}_1, s{s}_0' for s in range(1, 6))},
           {diffs} AS ate
    FROM wide
    """


@query("psm_stratified_ate", oracle=_psm_oracle())
def q_psm_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity-stratified average treatment effect: pre-period covariate quintiles from the distributed rank lane, per-stratum exact cell sums pivoted to literal columns, one fixed-order five-term combine."""
    from datalake_etlscripts_spark.operators.features import distributed_rank

    e = read_table(spark, sf_dir, "events")
    lane = "conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
    cut = "2024-01-16"
    u = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts") < F.lit(cut).cast("timestamp"), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(
                (F.col("ts") >= F.lit(cut).cast("timestamp"))
                & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    ).withColumn(
        "arm",
        F.when(F.expr(f"CAST({lane} AS BIGINT) % 2 = 0"), 1).otherwise(0),
    )
    n_tot = u.groupBy().agg(F.count(F.lit(1)).alias("nn"))
    u = distributed_rank(u, "x", "user_id", out_col="rk").crossJoin(
        F.broadcast(n_tot)
    )
    st = u.select(
        "arm", "y", F.expr("CAST(1 + ((rk - 1) * 5) div nn AS INT)").alias("st")
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for s in range(1, 6):
        for a in (1, 0):
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("st") == s) & (F.col("arm") == a), 1
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"c{s}_{a}")
            )
    for s in range(1, 6):
        for a in (1, 0):
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("st") == s) & (F.col("arm") == a),
                            F.col("y"),
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"s{s}_{a}")
            )
    wide = st.groupBy().agg(*aggs)
    ate = None
    for s in range(1, 6):
        share = (F.col(f"c{s}_1") + F.col(f"c{s}_0")).cast("double") / F.col(
            "n"
        ).cast("double")
        diff = F.col(f"s{s}_1").cast("double") / F.col(f"c{s}_1").cast(
            "double"
        ) - F.col(f"s{s}_0").cast("double") / F.col(f"c{s}_0").cast("double")
        # empty-cell strata contribute exactly 0 (guard matches the
        # oracle; also dodges ANSI divide-by-zero)
        term = F.when(
            (F.col(f"c{s}_1") > 0) & (F.col(f"c{s}_0") > 0), share * diff
        ).otherwise(F.lit(0.0))
        ate = term if ate is None else ate + term
    cols = ["n"]
    for s in range(1, 6):
        cols += [f"c{s}_1", f"c{s}_0", f"s{s}_1", f"s{s}_0"]
    return wide.select(*cols, ate.alias("ate"))


# ---------------------------------------------------------------------------
# Per-class F1 for a rule-based language identifier (r9): the five
# fixed labels pivot to literal confusion columns (tp/fp/fn per
# class, exact integers from one scan), every P/R/F1 is one division
# (F1 = 2tp/(2tp+fp+fn) — no nested ratios), micro-F1 is accuracy,
# macro-F1 a fixed-order five-term mean. The multi-class eval beside
# auc_by_language / naive_bayes_confusion.
# ---------------------------------------------------------------------------
_LANGS = ("en", "de", "es", "fr", "zh")
_PRED_SQL = """CASE
  WHEN strpos(text, ' the ') > 0 THEN 'en'
  WHEN strpos(text, ' der ') > 0 OR strpos(text, ' und ') > 0 THEN 'de'
  WHEN strpos(text, ' el ') > 0 OR strpos(text, ' los ') > 0 THEN 'es'
  WHEN strpos(text, ' le ') > 0 OR strpos(text, ' les ') > 0 THEN 'fr'
  ELSE 'zh' END"""
_PRED_SPARK = _PRED_SQL.replace("strpos", "instr")


def _f1_oracle() -> str:
    cells = ",\n           ".join(
        f"CAST(sum(CASE WHEN lang = '{c}' AND pred = '{c}' THEN 1 ELSE 0 END) AS BIGINT) AS tp_{c},\n"
        f"           CAST(sum(CASE WHEN lang <> '{c}' AND pred = '{c}' THEN 1 ELSE 0 END) AS BIGINT) AS fp_{c},\n"
        f"           CAST(sum(CASE WHEN lang = '{c}' AND pred <> '{c}' THEN 1 ELSE 0 END) AS BIGINT) AS fn_{c}"
        for c in _LANGS
    )
    f1s = {
        c: f"CAST(2 * tp_{c} AS DOUBLE) / CAST(2 * tp_{c} + fp_{c} + fn_{c} AS DOUBLE)"
        for c in _LANGS
    }
    macro = "(" + " + ".join(f1s[c] for c in _LANGS) + ") / 5"
    micro = (
        "CAST(" + " + ".join(f"tp_{c}" for c in _LANGS) + " AS DOUBLE)"
        " / CAST(n AS DOUBLE)"
    )
    f1_cols = ",\n           ".join(
        f"{f1s[c]} AS f1_{c}" for c in _LANGS
    )
    tpfn = ",\n           ".join(
        f"tp_{c}, fp_{c}, fn_{c}" for c in _LANGS
    )
    return f"""
    WITH p AS (
      SELECT lang, {_PRED_SQL} AS pred FROM documents
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
           {cells}
      FROM p
    )
    SELECT n,
           {tpfn},
           {f1_cols},
           {micro} AS micro_f1,
           {macro} AS macro_f1
    FROM m
    """


@query("f1_scores_langid", oracle=_f1_oracle())
def q_f1_scores_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class F1 of a rule-based language identifier: literal-column confusion cells, one-division F1 per class (2tp/(2tp+fp+fn)), fixed-order macro mean."""
    d = read_table(spark, sf_dir, "documents").select(
        "lang", F.expr(_PRED_SPARK).alias("pred")
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in _LANGS:
        aggs += [
            F.sum(
                F.when((F.col("lang") == c) & (F.col("pred") == c), 1)
                .otherwise(0)
            ).cast("long").alias(f"tp_{c}"),
            F.sum(
                F.when((F.col("lang") != c) & (F.col("pred") == c), 1)
                .otherwise(0)
            ).cast("long").alias(f"fp_{c}"),
            F.sum(
                F.when((F.col("lang") == c) & (F.col("pred") != c), 1)
                .otherwise(0)
            ).cast("long").alias(f"fn_{c}"),
        ]
    m = d.groupBy().agg(*aggs)
    f1 = {
        c: (2 * F.col(f"tp_{c}")).cast("double")
        / (2 * F.col(f"tp_{c}") + F.col(f"fp_{c}") + F.col(f"fn_{c}")).cast(
            "double"
        )
        for c in _LANGS
    }
    macro = sum(f1[c] for c in _LANGS) / 5
    micro = sum(F.col(f"tp_{c}") for c in _LANGS).cast("double") / F.col(
        "n"
    ).cast("double")
    cols = ["n"]
    for c in _LANGS:
        cols += [f"tp_{c}", f"fp_{c}", f"fn_{c}"]
    sel = [F.col(x) for x in cols] + [
        f1[c].alias(f"f1_{c}") for c in _LANGS
    ] + [micro.alias("micro_f1"), macro.alias("macro_f1")]
    return m.select(*sel)


# ---------------------------------------------------------------------------
# Codec advisor (r9): per-column physical-encoding suggestion from
# exact layout statistics — distinct ratio (dictionary candidate),
# average run length in the table's natural (orderkey, linenumber)
# order (RLE candidate; runs counted inside bounded per-order
# windows, so no global single-task sort), and the top value's share.
# Decision rules are integer cross-multiplications:
# DICT iff 100·distinct ≤ n, else RLE iff n ≥ 8·runs, else PLAIN.
# The storage-layout twin of compaction_plan / layout_pruning_audit.
# ---------------------------------------------------------------------------
_CODEC_COLS = (
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
    ("l_quantity", "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)"),
    ("ship_month", "strftime(l_shipdate, '%Y-%m')"),
)
_CODEC_COLS_SPARK = (
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
    ("l_quantity", "CAST(CAST(l_quantity AS BIGINT) AS STRING)"),
    ("ship_month", "date_format(l_shipdate, 'yyyy-MM')"),
)


def _codec_oracle() -> str:
    branches = "\n      UNION ALL ".join(
        f"SELECT l_orderkey AS okey, l_linenumber AS lno, '{name}' AS col,"
        f" {expr} AS val FROM lineitem"
        for name, expr in _CODEC_COLS
    )
    return f"""
    WITH u AS ({branches}),
    runs AS (
      SELECT col, val,
             CASE WHEN lag(val) OVER (PARTITION BY col, okey ORDER BY lno, val)
                  IS DISTINCT FROM val THEN 1 ELSE 0 END AS chg
      FROM u
    ),
    s AS (
      SELECT col, CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
             CAST(sum(chg) AS BIGINT) AS n_runs
      FROM runs GROUP BY 1
    ),
    tops AS (
      SELECT col, CAST(max(c) AS BIGINT) AS top_cnt FROM (
        SELECT col, val, count(*) AS c FROM u GROUP BY 1, 2
      ) GROUP BY 1
    )
    SELECT s.col, s.n, s.n_distinct, s.n_runs, t.top_cnt,
           CAST(t.top_cnt AS DOUBLE) / CAST(s.n AS DOUBLE) AS top_share,
           CASE WHEN 100 * s.n_distinct <= s.n THEN 'DICT'
                WHEN s.n >= 8 * s.n_runs THEN 'RLE'
                ELSE 'PLAIN' END AS codec
    FROM s JOIN tops t ON t.col = s.col
    """


@query("codec_advisor", oracle=_codec_oracle())
def q_codec_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column encoding advisor: exact distinct/run/top-share layout stats (runs inside bounded per-order windows), integer cross-multiplied DICT/RLE/PLAIN rules."""
    li = read_table(spark, sf_dir, "lineitem")
    parts = []
    for name, expr in _CODEC_COLS_SPARK:
        parts.append(
            li.select(
                F.col("l_orderkey").alias("okey"),
                F.col("l_linenumber").alias("lno"),
                F.lit(name).alias("col"),
                F.expr(expr).alias("val"),
            )
        )
    u = parts[0]
    for pdf in parts[1:]:
        u = u.unionByName(pdf)
    wr = W.partitionBy("col", "okey").orderBy("lno", "val")
    runs = u.withColumn(
        "chg",
        F.when(~F.lag("val").over(wr).eqNullSafe(F.col("val")), 1).otherwise(
            0
        ),
    )
    s = runs.groupBy("col").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        F.sum("chg").cast("long").alias("n_runs"),
    )
    tops = (
        u.groupBy("col", "val")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("col")
        .agg(F.max("c").cast("long").alias("top_cnt"))
        .withColumnRenamed("col", "tcol")
    )
    j = s.join(tops, F.col("col") == F.col("tcol"))
    return j.select(
        "col",
        "n",
        "n_distinct",
        "n_runs",
        "top_cnt",
        (F.col("top_cnt").cast("double") / F.col("n").cast("double")).alias(
            "top_share"
        ),
        F.when(100 * F.col("n_distinct") <= F.col("n"), "DICT")
        .when(F.col("n") >= 8 * F.col("n_runs"), "RLE")
        .otherwise("PLAIN")
        .alias("codec"),
    )


# ---------------------------------------------------------------------------
# V-optimal histogram (r9): the optimizer-statistics classic
# (Jagadish et al., VLDB'98) — partition the 256-hour count series
# into K=6 variance-minimal buckets by exact dynamic programming over
# 32 pre-aggregated 8-hour segments. Segment prefix sums are exact
# integers; every candidate bucket's SSE is ONE fixed-order double
# expression (SSQ − SUM²/CNT); each DP layer picks its argmin with a
# deterministic (cost, split) tie order; backpointers reconstruct the
# optimal boundaries. All state is 32²-bounded after one fact scan —
# this is how an engine would build its own stats at 100 TB.
# ---------------------------------------------------------------------------
_VOPT_K = 6


def _vopt_oracle(K: int = _VOPT_K) -> str:
    parts = [
        """
    WITH b AS (SELECT min(date_trunc('hour', ts)) AS lo FROM events),
    h AS (
      SELECT CAST(epoch(date_trunc('hour', ts))
                  - epoch((SELECT lo FROM b)) AS BIGINT) // 3600 AS idx,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    dense AS (
      SELECT s.idx, coalesce(h.x, 0) AS x
      FROM (SELECT unnest(range(0, 256)) AS idx) s
      LEFT JOIN h ON h.idx = s.idx
    ),
    seg AS (
      SELECT idx // 8 AS s, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(x) AS BIGINT) AS sm,
             CAST(sum(x * x) AS BIGINT) AS sq
      FROM dense GROUP BY 1
    ),
    pre AS (
      SELECT s + 1 AS i,
             CAST(sum(cnt) OVER w AS BIGINT) AS pcnt,
             CAST(sum(sm) OVER w AS BIGINT) AS psm,
             CAST(sum(sq) OVER w AS BIGINT) AS psq
      FROM seg WINDOW w AS (ORDER BY s ROWS UNBOUNDED PRECEDING)
    ),
    pre0 AS (
      SELECT i, pcnt, psm, psq FROM pre
      UNION ALL SELECT 0, 0, 0, 0
    ),
    pairs AS (
      SELECT j.i AS j, i.i AS i,
             CAST(i.psq - j.psq AS DOUBLE)
             - CAST(i.psm - j.psm AS DOUBLE)
               * CAST(i.psm - j.psm AS DOUBLE)
               / CAST(i.pcnt - j.pcnt AS DOUBLE) AS sse
      FROM pre0 j JOIN pre0 i ON j.i < i.i
    ),
    c1 AS (SELECT i, sse AS cost, 0 AS bp FROM pairs WHERE j = 0)"""
    ]
    for k in range(2, K + 1):
        parts.append(
            f""",
    c{k} AS (
      SELECT i, cost, bp FROM (
        SELECT p.i, c.cost + p.sse AS cost, p.j AS bp,
               row_number() OVER (PARTITION BY p.i
                 ORDER BY c.cost + p.sse, p.j) AS rn
        FROM c{k - 1} c JOIN pairs p ON p.j = c.i
      ) WHERE rn = 1
    )"""
        )
    # backwalk: e6 = 32, e5 = bp6(32), ...
    walk = [f"w{K} AS (SELECT 32 AS hi, bp AS lo FROM c{K} WHERE i = 32)"]
    for k in range(K - 1, 0, -1):
        walk.append(
            f"w{k} AS (SELECT w.lo AS hi, c.bp AS lo"
            f" FROM w{k + 1} w JOIN c{k} c ON c.i = w.lo)"
        )
    parts.append(",\n    " + ",\n    ".join(walk))
    sel = " UNION ALL ".join(
        f"SELECT {k} AS bucket, lo AS seg_from, hi - 1 AS seg_to FROM w{k}"
        for k in range(1, K + 1)
    )
    parts.append(
        f""",
    bounds AS ({sel})
    SELECT b.bucket, b.seg_from, b.seg_to,
           CAST(i.pcnt - j.pcnt AS BIGINT) AS n_hours,
           CAST(i.psm - j.psm AS BIGINT) AS bucket_sum,
           CAST(i.psq - j.psq AS DOUBLE)
           - CAST(i.psm - j.psm AS DOUBLE)
             * CAST(i.psm - j.psm AS DOUBLE)
             / CAST(i.pcnt - j.pcnt AS DOUBLE) AS bucket_sse,
           (SELECT cost FROM c{K} WHERE i = 32) AS total_sse
    FROM bounds b
    JOIN pre0 j ON j.i = b.seg_from
    JOIN pre0 i ON i.i = b.seg_to + 1"""
    )
    return "".join(parts)


@query("voptimal_histogram", oracle=_vopt_oracle())
def q_voptimal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-optimal histogram (K=6) of the 256-hour series by exact DP over 32 pre-aggregated segments: integer prefix sums, fixed-order SSE doubles, deterministic argmin layers with backpointer reconstruction."""
    e = read_table(spark, sf_dir, "events")
    h = e.groupBy(
        F.expr(
            "CAST(unix_seconds(date_trunc('hour', ts)) AS BIGINT)"
        ).alias("ep")
    ).agg(F.count(F.lit(1)).alias("x"))
    lo = h.groupBy().agg(F.min("ep").alias("lo"))
    idx = h.crossJoin(F.broadcast(lo)).select(
        F.expr("(ep - lo) div 3600").alias("idx"), "x"
    )
    dense = (
        spark.range(0, 256)
        .select(F.col("id").alias("idx"))
        .join(idx, "idx", "left")
        .select("idx", F.coalesce("x", F.lit(0)).alias("x"))
    )
    seg = dense.groupBy(F.expr("idx div 8").alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("x").cast("long").alias("sm"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sq"),
    )
    wp = W.orderBy("s").rowsBetween(W.unboundedPreceding, 0)
    pre = seg.select(
        (F.col("s") + 1).alias("i"),
        F.sum("cnt").over(wp).alias("pcnt"),
        F.sum("sm").over(wp).alias("psm"),
        F.sum("sq").over(wp).alias("psq"),
    )
    zero = spark.createDataFrame(
        [(0, 0, 0, 0)], "i BIGINT, pcnt BIGINT, psm BIGINT, psq BIGINT"
    )
    pre0 = pre.select(
        F.col("i").cast("long").alias("i"),
        F.col("pcnt").cast("long").alias("pcnt"),
        F.col("psm").cast("long").alias("psm"),
        F.col("psq").cast("long").alias("psq"),
    ).unionByName(zero).localCheckpoint()
    pj = pre0.select(
        F.col("i").alias("j"),
        F.col("pcnt").alias("jc"),
        F.col("psm").alias("js"),
        F.col("psq").alias("jq"),
    )
    pi = pre0.select("i", "pcnt", "psm", "psq")
    sse = (
        (F.col("psq") - F.col("jq")).cast("double")
        - (F.col("psm") - F.col("js")).cast("double")
        * (F.col("psm") - F.col("js")).cast("double")
        / (F.col("pcnt") - F.col("jc")).cast("double")
    )
    pairs = (
        pj.join(F.broadcast(pi), F.col("j") < F.col("i"))
        .select("j", "i", sse.alias("sse"))
        .localCheckpoint()
    )
    layers = {}
    c = pairs.filter(F.col("j") == 0).select(
        "i", F.col("sse").alias("cost"), F.lit(0).cast("long").alias("bp")
    )
    layers[1] = c.localCheckpoint()
    for k in range(2, _VOPT_K + 1):
        prev = layers[k - 1].select(
            F.col("i").alias("pi"), F.col("cost").alias("pcost")
        )
        wr = W.partitionBy("i").orderBy(
            (F.col("pcost") + F.col("sse")).asc(), F.col("j").asc()
        )
        c = (
            pairs.join(F.broadcast(prev), F.col("j") == F.col("pi"))
            .withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") == 1)
            .select(
                "i",
                (F.col("pcost") + F.col("sse")).alias("cost"),
                F.col("j").alias("bp"),
            )
        )
        layers[k] = c.localCheckpoint()
    # backwalk from i=32 through the bp chain
    walk = {
        _VOPT_K: layers[_VOPT_K]
        .filter(F.col("i") == 32)
        .select(F.lit(32).cast("long").alias("hi"), F.col("bp").alias("lo"))
    }
    for k in range(_VOPT_K - 1, 0, -1):
        wprev = walk[k + 1].select(F.col("lo").alias("wlo"))
        walk[k] = (
            layers[k]
            .join(F.broadcast(wprev), F.col("i") == F.col("wlo"))
            .select(F.col("i").alias("hi"), F.col("bp").alias("lo"))
        )
    bounds = None
    for k in range(1, _VOPT_K + 1):
        bk = walk[k].select(
            F.lit(k).alias("bucket"),
            F.col("lo").alias("seg_from"),
            (F.col("hi") - 1).alias("seg_to"),
        )
        bounds = bk if bounds is None else bounds.unionByName(bk)
    total = layers[_VOPT_K].filter(F.col("i") == 32).select(
        F.col("cost").alias("total_sse")
    )
    jj = pre0.select(
        F.col("i").alias("ji"),
        F.col("pcnt").alias("jc"),
        F.col("psm").alias("js"),
        F.col("psq").alias("jq"),
    )
    ii = pre0.select(
        F.col("i").alias("ii"),
        F.col("pcnt").alias("ic"),
        F.col("psm").alias("is_"),
        F.col("psq").alias("iq"),
    )
    out = (
        bounds.join(F.broadcast(jj), F.col("seg_from") == F.col("ji"))
        .join(F.broadcast(ii), F.col("seg_to") + 1 == F.col("ii"))
        .crossJoin(F.broadcast(total))
    )
    bsse = (
        (F.col("iq") - F.col("jq")).cast("double")
        - (F.col("is_") - F.col("js")).cast("double")
        * (F.col("is_") - F.col("js")).cast("double")
        / (F.col("ic") - F.col("jc")).cast("double")
    )
    return out.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("seg_from").cast("long").alias("seg_from"),
        F.col("seg_to").cast("long").alias("seg_to"),
        (F.col("ic") - F.col("jc")).cast("long").alias("n_hours"),
        (F.col("is_") - F.col("js")).cast("long").alias("bucket_sum"),
        bsse.alias("bucket_sse"),
        "total_sse",
    )


# ---------------------------------------------------------------------------
# Spectral power at the daily period (r9): the DFT bin for period 24
# computed PHASE-FOLDED — hours group by (idx mod 24) first, so the
# trig combine is a FIXED-ORDER 24-term expression over exact integer
# phase sums (never a float sum over the raw series), and every
# cos/sin is a PYTHON-PRECOMPUTED literal (no in-engine trig, the
# sprt literal discipline). Output: the integer phase sums' n, the
# real/imag parts, the bin power, and the DC-removed total power
# ratio — "how much of the variance is the daily cycle".
# ---------------------------------------------------------------------------

@query(
    "spectral_power_daily",
    oracle=f"""
    WITH b AS (SELECT min(date_trunc('hour', ts)) AS lo FROM events),
    h AS (
      SELECT CAST(epoch(date_trunc('hour', ts))
                  - epoch((SELECT lo FROM b)) AS BIGINT) // 3600 AS idx,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    dense AS (
      SELECT s.idx, coalesce(h.x, 0) AS x
      FROM (SELECT unnest(range(0, 720)) AS idx) s
      LEFT JOIN h ON h.idx = s.idx
    ),
    ph AS (
      SELECT CAST(idx % 24 AS INT) AS ph, CAST(sum(x) AS BIGINT) AS sx
      FROM dense GROUP BY 1
    ),
    wide AS (
      SELECT CAST(sum(sx) AS BIGINT) AS tot,
             CAST(coalesce(sum(CASE WHEN ph = 0 THEN sx END), 0) AS BIGINT) AS p0,
             CAST(coalesce(sum(CASE WHEN ph = 1 THEN sx END), 0) AS BIGINT) AS p1,
             CAST(coalesce(sum(CASE WHEN ph = 2 THEN sx END), 0) AS BIGINT) AS p2,
             CAST(coalesce(sum(CASE WHEN ph = 3 THEN sx END), 0) AS BIGINT) AS p3,
             CAST(coalesce(sum(CASE WHEN ph = 4 THEN sx END), 0) AS BIGINT) AS p4,
             CAST(coalesce(sum(CASE WHEN ph = 5 THEN sx END), 0) AS BIGINT) AS p5,
             CAST(coalesce(sum(CASE WHEN ph = 6 THEN sx END), 0) AS BIGINT) AS p6,
             CAST(coalesce(sum(CASE WHEN ph = 7 THEN sx END), 0) AS BIGINT) AS p7,
             CAST(coalesce(sum(CASE WHEN ph = 8 THEN sx END), 0) AS BIGINT) AS p8,
             CAST(coalesce(sum(CASE WHEN ph = 9 THEN sx END), 0) AS BIGINT) AS p9,
             CAST(coalesce(sum(CASE WHEN ph = 10 THEN sx END), 0) AS BIGINT) AS p10,
             CAST(coalesce(sum(CASE WHEN ph = 11 THEN sx END), 0) AS BIGINT) AS p11,
             CAST(coalesce(sum(CASE WHEN ph = 12 THEN sx END), 0) AS BIGINT) AS p12,
             CAST(coalesce(sum(CASE WHEN ph = 13 THEN sx END), 0) AS BIGINT) AS p13,
             CAST(coalesce(sum(CASE WHEN ph = 14 THEN sx END), 0) AS BIGINT) AS p14,
             CAST(coalesce(sum(CASE WHEN ph = 15 THEN sx END), 0) AS BIGINT) AS p15,
             CAST(coalesce(sum(CASE WHEN ph = 16 THEN sx END), 0) AS BIGINT) AS p16,
             CAST(coalesce(sum(CASE WHEN ph = 17 THEN sx END), 0) AS BIGINT) AS p17,
             CAST(coalesce(sum(CASE WHEN ph = 18 THEN sx END), 0) AS BIGINT) AS p18,
             CAST(coalesce(sum(CASE WHEN ph = 19 THEN sx END), 0) AS BIGINT) AS p19,
             CAST(coalesce(sum(CASE WHEN ph = 20 THEN sx END), 0) AS BIGINT) AS p20,
             CAST(coalesce(sum(CASE WHEN ph = 21 THEN sx END), 0) AS BIGINT) AS p21,
             CAST(coalesce(sum(CASE WHEN ph = 22 THEN sx END), 0) AS BIGINT) AS p22,
             CAST(coalesce(sum(CASE WHEN ph = 23 THEN sx END), 0) AS BIGINT) AS p23
      FROM ph
    ),
    g AS (
      SELECT tot,
             CAST(p0 AS DOUBLE) * 1.0e0 + CAST(p1 AS DOUBLE) * 0.9659258262890683e0 + CAST(p2 AS DOUBLE) * 0.8660254037844387e0 + CAST(p3 AS DOUBLE) * 0.7071067811865476e0 + CAST(p4 AS DOUBLE) * 0.5000000000000001e0 + CAST(p5 AS DOUBLE) * 0.25881904510252074e0 + CAST(p6 AS DOUBLE) * 6.123233995736766e-17 + CAST(p7 AS DOUBLE) * -0.25881904510252063e0 + CAST(p8 AS DOUBLE) * -0.4999999999999998e0 + CAST(p9 AS DOUBLE) * -0.7071067811865475e0 + CAST(p10 AS DOUBLE) * -0.8660254037844387e0 + CAST(p11 AS DOUBLE) * -0.9659258262890682e0 + CAST(p12 AS DOUBLE) * -1.0e0 + CAST(p13 AS DOUBLE) * -0.9659258262890683e0 + CAST(p14 AS DOUBLE) * -0.8660254037844388e0 + CAST(p15 AS DOUBLE) * -0.7071067811865479e0 + CAST(p16 AS DOUBLE) * -0.5000000000000004e0 + CAST(p17 AS DOUBLE) * -0.25881904510252063e0 + CAST(p18 AS DOUBLE) * -1.8369701987210297e-16 + CAST(p19 AS DOUBLE) * 0.2588190451025203e0 + CAST(p20 AS DOUBLE) * 0.5000000000000001e0 + CAST(p21 AS DOUBLE) * 0.7071067811865474e0 + CAST(p22 AS DOUBLE) * 0.8660254037844384e0 + CAST(p23 AS DOUBLE) * 0.9659258262890681e0 AS re,
             CAST(p0 AS DOUBLE) * 0.0e0 + CAST(p1 AS DOUBLE) * 0.25881904510252074e0 + CAST(p2 AS DOUBLE) * 0.49999999999999994e0 + CAST(p3 AS DOUBLE) * 0.7071067811865475e0 + CAST(p4 AS DOUBLE) * 0.8660254037844386e0 + CAST(p5 AS DOUBLE) * 0.9659258262890683e0 + CAST(p6 AS DOUBLE) * 1.0e0 + CAST(p7 AS DOUBLE) * 0.9659258262890683e0 + CAST(p8 AS DOUBLE) * 0.8660254037844387e0 + CAST(p9 AS DOUBLE) * 0.7071067811865476e0 + CAST(p10 AS DOUBLE) * 0.49999999999999994e0 + CAST(p11 AS DOUBLE) * 0.258819045102521e0 + CAST(p12 AS DOUBLE) * 1.2246467991473532e-16 + CAST(p13 AS DOUBLE) * -0.2588190451025208e0 + CAST(p14 AS DOUBLE) * -0.4999999999999997e0 + CAST(p15 AS DOUBLE) * -0.7071067811865471e0 + CAST(p16 AS DOUBLE) * -0.8660254037844384e0 + CAST(p17 AS DOUBLE) * -0.9659258262890683e0 + CAST(p18 AS DOUBLE) * -1.0e0 + CAST(p19 AS DOUBLE) * -0.9659258262890684e0 + CAST(p20 AS DOUBLE) * -0.8660254037844386e0 + CAST(p21 AS DOUBLE) * -0.7071067811865477e0 + CAST(p22 AS DOUBLE) * -0.5000000000000004e0 + CAST(p23 AS DOUBLE) * -0.25881904510252157e0 AS im
      FROM wide
    ),
    v AS (
      SELECT CAST(sum(x * x) AS BIGINT) AS sxx, CAST(count(*) AS BIGINT)
               AS n, CAST(sum(x) AS BIGINT) AS sx
      FROM dense
    )
    SELECT g.tot, g.re, g.im,
           g.re * g.re + g.im * g.im AS power_24,
           CAST(v.n * v.sxx - v.sx * v.sx AS BIGINT) AS var_num,
           (g.re * g.re + g.im * g.im)
             / (CAST(v.n * v.sxx - v.sx * v.sx AS DOUBLE) / v.n) AS
             power_to_var
    FROM g CROSS JOIN v
    """,
)
def q_spectral_power_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT bin power at period 24 via phase folding: exact integer phase sums, a fixed-order 24-term literal-trig combine (no in-engine cos/sin, no raw-series float sums), power-to-variance ratio."""
    e = read_table(spark, sf_dir, "events")
    h = e.groupBy(
        F.expr(
            "CAST(unix_seconds(date_trunc('hour', ts)) AS BIGINT)"
        ).alias("ep")
    ).agg(F.count(F.lit(1)).alias("x"))
    lo = h.groupBy().agg(F.min("ep").alias("lo"))
    idx = h.crossJoin(F.broadcast(lo)).select(
        F.expr("(ep - lo) div 3600").alias("idx"), "x"
    )
    dense = (
        spark.range(0, 720)
        .select(F.col("id").alias("idx"))
        .join(idx, "idx", "left")
        .select("idx", F.coalesce("x", F.lit(0)).alias("x"))
    )
    ph = dense.groupBy(
        (F.col("idx") % 24).cast("int").alias("ph")
    ).agg(F.sum("x").cast("long").alias("sx"))
    # 24-term fixed-order combine via a pivot to literal columns
    aggs = [
        F.sum("sx").cast("long").alias("tot"),
    ]
    for k in range(24):
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("ph") == k, F.col("sx"))), F.lit(0)
            ).cast("long").alias(f"p{k}")
        )
    wide = ph.groupBy().agg(*aggs)
    import math as _math

    re = None
    im = None
    for k in range(24):
        c = F.lit(_math.cos(2 * _math.pi * k / 24))
        s = F.lit(_math.sin(2 * _math.pi * k / 24))
        tr = F.col(f"p{k}").cast("double") * c
        ti = F.col(f"p{k}").cast("double") * s
        re = tr if re is None else re + tr
        im = ti if im is None else im + ti
    v = dense.groupBy().agg(
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx_all"),
    )
    g = wide.crossJoin(F.broadcast(v))
    var_num = F.col("n") * F.col("sxx") - F.col("sx_all") * F.col("sx_all")
    power = re * re + im * im
    return g.select(
        "tot",
        re.alias("re"),
        im.alias("im"),
        power.alias("power_24"),
        var_num.cast("long").alias("var_num"),
        (power / (var_num.cast("double") / F.col("n").cast("double"))).alias(
            "power_to_var"
        ),
    )


# ---------------------------------------------------------------------------
# Wilson score intervals (r9): the proportion CI that behaves at the
# extremes — per event type, the purchase-share 95% bounds from exact
# integer (k, n) in ONE fixed-order double expression with the
# z = 1.96 literal in e-notation (the literal-parsing discipline).
# The last piece of the proportion toolkit beside the z-test and SPRT.
# ---------------------------------------------------------------------------
_WILSON_Z = "1.96e0"


@query(
    "wilson_interval",
    oracle=f"""
    WITH c AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN k > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted
      FROM c
    )
    SELECT n_users, n_converted,
           CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS p_hat,
           (CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE)
            + {_WILSON_Z} * {_WILSON_Z} / (2 * CAST(n_users AS DOUBLE))
            - {_WILSON_Z} * sqrt(
                (CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
                * (1 - CAST(n_converted AS DOUBLE)
                       / CAST(n_users AS DOUBLE))
                  / CAST(n_users AS DOUBLE)
                + {_WILSON_Z} * {_WILSON_Z}
                  / (4 * CAST(n_users AS DOUBLE)
                       * CAST(n_users AS DOUBLE))))
           / (1 + {_WILSON_Z} * {_WILSON_Z} / CAST(n_users AS DOUBLE))
             AS wilson_lo,
           (CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE)
            + {_WILSON_Z} * {_WILSON_Z} / (2 * CAST(n_users AS DOUBLE))
            + {_WILSON_Z} * sqrt(
                (CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
                * (1 - CAST(n_converted AS DOUBLE)
                       / CAST(n_users AS DOUBLE))
                  / CAST(n_users AS DOUBLE)
                + {_WILSON_Z} * {_WILSON_Z}
                  / (4 * CAST(n_users AS DOUBLE)
                       * CAST(n_users AS DOUBLE))))
           / (1 + {_WILSON_Z} * {_WILSON_Z} / CAST(n_users AS DOUBLE))
             AS wilson_hi
    FROM g
    """,
)
def q_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for the user conversion share: exact integer counts, one fixed-order double expression per bound, e-notation z literal."""
    e = read_table(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("k")
    )
    g = c.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("k") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_converted"),
    )
    z = 1.96
    n = F.col("n_users").cast("double")
    p = F.col("n_converted").cast("double") / n
    half = F.lit(z) * F.sqrt(
        p * (1 - p) / n + F.lit(z) * F.lit(z) / (4 * n * n)
    )
    center = p + F.lit(z) * F.lit(z) / (2 * n)
    denom = 1 + F.lit(z) * F.lit(z) / n
    return g.select(
        "n_users",
        "n_converted",
        p.alias("p_hat"),
        ((center - half) / denom).alias("wilson_lo"),
        ((center + half) / denom).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# Cumulative gains table (r9): rank documents by the stopword-ratio
# english score (descending), split into deciles by integer index
# arithmetic on the distributed rank lane, and report each decile's
# cumulative share of all positives — the gains/lift chart behind
# "how deep must we screen to catch X% of the targets". Cumulative
# sums run on the 10-row decile table; everything before is one scan
# + one rank pass.
# ---------------------------------------------------------------------------
@query(
    "gains_table_deciles",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             CAST(1000 * len(list_filter(tk, x -> x = 'the' OR x = 'a'))
                  // len(tk) AS BIGINT) AS score,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM d WHERE len(tk) > 0
    ),
    r AS (
      SELECT score, y,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk,
             count(*) OVER () AS n
      FROM s
    ),
    dec AS (
      SELECT CAST(1 + ((rk - 1) * 10) // n AS INT) AS decile,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(y) AS BIGINT) AS positives
      FROM r GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(positives) AS BIGINT) AS p FROM dec)
    SELECT decile, n_docs, positives,
           CAST(sum(positives) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_positives,
           CAST(sum(positives) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / CAST(tot.p AS DOUBLE) AS cum_gain
    FROM dec CROSS JOIN tot
    """,
)
def q_gains_table_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains table: score-ranked deciles via the distributed rank lane's integer index arithmetic, each decile's cumulative positive share as one division on the 10-row table."""
    from datalake_etlscripts_spark.operators.features import (
        distributed_rank,
    )

    d = read_table(spark, sf_dir, "documents")
    tk = "filter(split(text, ' '), x -> x != '')"
    s = d.filter(F.expr(f"size({tk}) > 0")).select(
        "doc_id",
        F.expr(
            f"CAST(1000 * size(filter({tk}, x -> x = 'the' OR x = 'a'))"
            f" div size({tk}) AS BIGINT)"
        ).alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias(
            "y"
        ),
    )
    n_tot = s.groupBy().agg(F.count(F.lit(1)).alias("nn"))
    ranked = distributed_rank(
        s.withColumn("_neg", -F.col("score").cast("double")),
        "_neg",
        "doc_id",
        out_col="rk",
    ).crossJoin(F.broadcast(n_tot))
    dec = ranked.groupBy(
        F.expr("CAST(1 + ((rk - 1) * 10) div nn AS INT)").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("positives"),
    )
    tot = dec.groupBy().agg(F.sum("positives").cast("long").alias("p"))
    wd = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = dec.withColumn(
        "cum_positives", F.sum("positives").over(wd).cast("long")
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_docs",
        "positives",
        "cum_positives",
        (
            F.col("cum_positives").cast("double") / F.col("p").cast("double")
        ).alias("cum_gain"),
    )


# ---------------------------------------------------------------------------
# Day-of-week uniformity chi-square (r9): are orders placed uniformly
# across the week? With e = n/7 the statistic folds to
# χ² = (7·Σo² − n²)/n — ONE exact division of integer sums; the
# rejection flag cross-multiplies against the df=6 critical value
# (12.592 as an e-notation literal only in the reported bound, the
# DECISION is integer: 1000·(7Σo² − n²) > 12592·n). Weekday from
# epoch arithmetic.
# ---------------------------------------------------------------------------
@query(
    "dow_uniformity_chi2",
    oracle="""
    WITH d AS (
      SELECT CAST(((epoch(o_orderdate) // 86400) + 3) % 7 AS INT) AS dow
      FROM orders
    ),
    c AS (SELECT dow, CAST(count(*) AS BIGINT) AS o FROM d GROUP BY 1),
    m AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(sum(o * o) AS BIGINT) AS soo,
             CAST(count(*) AS BIGINT) AS k
      FROM c
    )
    SELECT n, k,
           CAST(7 * soo - n * n AS BIGINT) AS chi2_num,
           CAST(7 * soo - n * n AS DOUBLE) / CAST(n AS DOUBLE) AS chi2,
           CAST(CASE WHEN 1000 * (7 * soo - n * n) > 12592 * n
                THEN 1 ELSE 0 END AS INT) AS reject_uniform
    FROM m
    """,
)
def q_dow_uniformity_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square uniformity of order placement across weekdays folded to one exact division ((7*sum(o^2) - n^2)/n), integer cross-multiplied rejection at the df=6 critical value."""
    o = read_table(spark, sf_dir, "orders")
    d = o.select(
        F.expr(
            "CAST(((unix_seconds(o_orderdate) div 86400) + 3) % 7 AS INT)"
        ).alias("dow")
    )
    c = d.groupBy("dow").agg(F.count(F.lit(1)).cast("long").alias("o"))
    m = c.groupBy().agg(
        F.sum("o").cast("long").alias("n"),
        F.sum(F.col("o") * F.col("o")).cast("long").alias("soo"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    num = 7 * F.col("soo") - F.col("n") * F.col("n")
    return m.select(
        "n",
        "k",
        num.cast("long").alias("chi2_num"),
        (num.cast("double") / F.col("n").cast("double")).alias("chi2"),
        F.when(1000 * num > 12592 * F.col("n"), 1)
        .otherwise(0)
        .cast("int")
        .alias("reject_uniform"),
    )


# ---------------------------------------------------------------------------
# Discrete purchase-hazard table (r9): P(next purchase on day-age a |
# no purchase yet) from the inter-purchase day gaps — exact at-risk
# counts by the suffix-sum trick (at_risk(a) = Σ_{g≥a} n_g, one
# descending cumulative over the bounded gap grid), hazard one
# division per age. The discrete-time companion of the KM curve.
# ---------------------------------------------------------------------------
@query(
    "purchase_hazard_table",
    oracle="""
    WITH p AS (
      SELECT user_id, ts,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS d
      FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT d - lag(d) OVER (PARTITION BY user_id ORDER BY ts) AS g
      FROM p
    ),
    c AS (
      SELECT CAST(g AS BIGINT) AS age, CAST(count(*) AS BIGINT) AS n_g
      FROM gaps WHERE g IS NOT NULL GROUP BY 1
    ),
    r AS (
      SELECT age, n_g,
             CAST(sum(n_g) OVER (ORDER BY age DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS at_risk
      FROM c
    )
    SELECT age, n_g, at_risk,
           CAST(n_g AS DOUBLE) / CAST(at_risk AS DOUBLE) AS hazard
    FROM r
    """,
)
def q_purchase_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time hazard of the next purchase by day-age: gap counts on the bounded grid, at-risk via one descending cumulative, one division per age."""
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.expr(
            "CAST(unix_seconds(date_trunc('day', ts)) AS BIGINT)"
            " div 86400"
        ).alias("d"),
    )
    w = W.partitionBy("user_id").orderBy("ts")
    gaps = p.select((F.col("d") - F.lag("d").over(w)).alias("g")).filter(
        F.col("g").isNotNull()
    )
    c = gaps.groupBy(F.col("g").cast("long").alias("age")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g")
    )
    wr = W.orderBy(F.col("age").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    r = c.withColumn("at_risk", F.sum("n_g").over(wr).cast("long"))
    return r.select(
        "age",
        "n_g",
        "at_risk",
        (F.col("n_g").cast("double") / F.col("at_risk").cast("double")).alias(
            "hazard"
        ),
    )


# ---------------------------------------------------------------------------
# Daily SRM trace (r9): sample-ratio-mismatch χ² per day for the
# 50/50 md5 assignment — (n_A−n_B)²/(n_A+n_B) is one exact division,
# and the alarm cross-multiplies against the df=1 critical value
# (100·(n_A−n_B)² > 384·n). The guardrail that catches broken
# assignment pipelines the day they break, not at readout.
# ---------------------------------------------------------------------------
@query(
    "daily_srm_trace",
    oracle=f"""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, user_id,
             CASE WHEN {__import__("datalake_etlscripts_spark.plans.registry", fromlist=["ddb_hex32"]).ddb_hex32("md5(CAST(user_id AS VARCHAR))")} % 2 = 0
                  THEN 1 ELSE 0 END AS arm_a
      FROM events
    ),
    u AS (SELECT DISTINCT day, user_id, arm_a FROM d),
    c AS (
      SELECT day, CAST(sum(arm_a) AS BIGINT) AS n_a,
             CAST(count(*) - sum(arm_a) AS BIGINT) AS n_b
      FROM u GROUP BY 1
    )
    SELECT CAST(strftime(day, '%Y-%m-%d') AS VARCHAR) AS day, n_a, n_b,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE) AS srm_chi2,
           CAST(CASE WHEN 100 * (n_a - n_b) * (n_a - n_b)
                     > 384 * (n_a + n_b) THEN 1 ELSE 0 END AS INT)
             AS srm_alarm
    FROM c
    """,
)
def q_daily_srm_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily sample-ratio-mismatch chi-square for the md5 50/50 split: one exact division per day, integer cross-multiplied df=1 alarm."""
    e = read_table(spark, sf_dir, "events")
    lane = "conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
    u = e.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "user_id",
        F.when(F.expr(f"CAST({lane} AS BIGINT) % 2 = 0"), 1)
        .otherwise(0)
        .alias("arm_a"),
    ).distinct()
    c = u.groupBy("day").agg(
        F.sum("arm_a").cast("long").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("arm_a")).cast("long").alias("n_b"),
    )
    diff2 = (F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))
    tot = F.col("n_a") + F.col("n_b")
    return c.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_a",
        "n_b",
        (diff2.cast("double") / tot.cast("double")).alias("srm_chi2"),
        F.when(100 * diff2 > 384 * tot, 1)
        .otherwise(0)
        .cast("int")
        .alias("srm_alarm"),
    )


# ---------------------------------------------------------------------------
# Exact skewness by event type (r9): the third central moment's
# integer numerator n²Σx³ − 3nΣxΣx² + 2(Σx)³ over 4-decimal-scaled
# values in DECIMAL(38,0), standardized by m₂^{3/2} in one fixed
# double combine (m₂ from the same integers). Completes the moment
# ladder beside the variance-based diagnostics.
# ---------------------------------------------------------------------------
@query(
    "value_skewness_by_type",
    oracle="""
    WITH f AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS HUGEINT) AS x
      FROM events
    ),
    m AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS s1, sum(x * x) AS s2, sum(x * x * x) AS s3
      FROM f GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
                AS VARCHAR) AS DOUBLE) AS m3_num,
           CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE) AS m2_num,
           CASE WHEN n * s2 - s1 * s1 > 0 THEN
             CAST(CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
                  AS VARCHAR) AS DOUBLE)
             / (CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)
                * sqrt(CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)))
           END AS skewness
    FROM m
    """,
)
def q_value_skewness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact skewness per event type: integer third-central-moment numerator in DECIMAL(38,0), standardized in one fixed-order double combine."""
    e = read_table(spark, sf_dir, "events")
    f = e.select(
        "event_type",
        (F.col("value").cast("decimal(18,4)") * 10000)
        .cast("decimal(38,0)")
        .alias("x"),
    )
    m = f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
    )

    def dd_(c):
        return c.cast("string").cast("double")

    m3 = (
        F.col("n") * F.col("n") * F.col("s3")
        - 3 * F.col("n") * F.col("s1") * F.col("s2")
        + 2 * F.col("s1") * F.col("s1") * F.col("s1")
    )
    m2 = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        dd_(m3).alias("m3_num"),
        dd_(m2).alias("m2_num"),
        F.when(
            m2 > 0,
            dd_(m3) / (dd_(m2) * F.sqrt(dd_(m2))),
        ).alias("skewness"),
    )


# ---------------------------------------------------------------------------
# Exact excess kurtosis by type (r9): the fourth-central-moment
# integer numerator n³Σx⁴ − 4n²Σx·Σx³ + 6n(Σx)²Σx² − 3(Σx)⁴ over
# CENTI-scaled values (×100, not ×10000 — the fourth power must stay
# inside DECIMAL(38,0) at fleet row counts; the two dropped decimals
# cost nothing since the statistic is scale-invariant), standardized
# by m₂² with the −3 excess in one fixed combine. Completes the
# moment ladder: mean → variance → skewness → kurtosis.
# ---------------------------------------------------------------------------
@query(
    "value_kurtosis_by_type",
    oracle="""
    WITH f AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS x
      FROM events
    ),
    m AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS s1, sum(x * x) AS s2,
             sum(x * x * x) AS s3, sum(x * x * x * x) AS s4
      FROM f GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(CAST(n * n * n * s4 - 4 * n * n * s1 * s3
                + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
                AS VARCHAR) AS DOUBLE) AS m4_num,
           CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE) AS m2_num,
           CASE WHEN n * s2 - s1 * s1 > 0 THEN
             CAST(CAST(n * n * n * s4 - 4 * n * n * s1 * s3
                    + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
                    AS VARCHAR) AS DOUBLE)
             / (CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)
                * CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE))
             - 3 END AS excess_kurtosis
    FROM m
    """,
)
def q_value_kurtosis_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact excess kurtosis per event type: integer fourth-central-moment numerator (centi-scaled to stay inside DECIMAL38), standardized by m2 squared in one fixed combine."""
    e = read_table(spark, sf_dir, "events")
    f = e.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("decimal(38,0)")
        .alias("x"),
    )
    m = f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).alias(
            "s4"
        ),
    )

    def dd_(c):
        return c.cast("string").cast("double")

    m4 = (
        F.col("n") * F.col("n") * F.col("n") * F.col("s4")
        - 4 * F.col("n") * F.col("n") * F.col("s1") * F.col("s3")
        + 6 * F.col("n") * F.col("s1") * F.col("s1") * F.col("s2")
        - 3 * F.col("s1") * F.col("s1") * F.col("s1") * F.col("s1")
    )
    m2 = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        dd_(m4).alias("m4_num"),
        dd_(m2).alias("m2_num"),
        F.when(
            m2 > 0,
            dd_(m4) / (dd_(m2) * dd_(m2)) - 3,
        ).alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------------------
# Dynamic time warping between hour-of-day profiles (r12): the classic
# O(n·m) DP — D[i][j] = |a_i−b_j| + min(D[i−1][j], D[i−1][j−1],
# D[i][j−1]) — expressed ENTIRELY as nested functional folds over the
# 24-point profile arrays: the outer fold carries the previous DP row,
# the inner fold builds the next row left-to-right (Spark: nested
# F.aggregate with an array accumulator; DuckDB: nested list_reduce
# with the house prepend-the-init encoding, elements lifted to
# single-item lists so accumulator and element types unify). Every
# cell is an exact integer — both engines replay the identical DP
# bit-for-bit, no UDF, no driver loop, whole plan stays JVM-side.
# Profiles are dictionary-sized (5 types × 24 hours) after one fact
# scan; the 10 unordered pairs ride a broadcast nested-loop join of
# two 5-row dims. The same fold shape scales to any bounded-window
# series alignment (the warping band IS the array length).
# ---------------------------------------------------------------------------
@query(
    "dtw_profile_distance",
    oracle="""
    WITH ty AS (SELECT DISTINCT event_type AS t FROM events),
    hrs AS (SELECT unnest(range(0, 24)) AS h),
    cnt AS (
      SELECT event_type AS t, CAST(hour(ts) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    prof AS (
      SELECT ty.t, list(CAST(coalesce(c.c, 0) AS BIGINT) ORDER BY hrs.h) AS p
      FROM ty CROSS JOIN hrs
      LEFT JOIN cnt c ON c.t = ty.t AND c.h = hrs.h
      GROUP BY ty.t
    ),
    pairs AS (
      SELECT a.t AS type_a, b.t AS type_b, a.p AS pa, b.p AS pb
      FROM prof a JOIN prof b ON a.t < b.t
    ),
    r0 AS (
      SELECT type_a, type_b, pa, pb,
        list_reduce(
          list_prepend([abs(pa[1] - pb[1])], list_transform(pb[2:], x -> [x])),
          (acc, x) -> list_append(acc, abs(pa[1] - x[1]) + acc[len(acc)])
        ) AS row0
      FROM pairs
    )
    SELECT type_a, type_b,
      list_reduce(
        list_prepend(0, list_transform(range(1, 25),
                                       i -> abs(pa[i] - pb[i]))),
        (a, b) -> a + b) AS l1,
      list_reduce(
        list_prepend(row0, list_transform(pa[2:], x -> [x])),
        (prev, ai) -> list_reduce(
            list_prepend([abs(ai[1] - pb[1]) + prev[1]],
                         list_transform(pb[2:], x -> [x])),
            (acc, bj) -> list_append(acc,
              abs(ai[1] - bj[1]) + least(prev[len(acc) + 1],
                                         prev[len(acc)],
                                         acc[len(acc)]))
        )
      )[24] AS dtw
    FROM r0
    """,
)
def q_dtw_profile_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW distance between the hour-of-day count profiles of every event-type pair - the full O(24x24) DP as nested JVM-side array folds (no UDF, no driver loop), exact integer cells, plus the L1 distance for reference."""
    e = read_table(spark, sf_dir, "events")
    cnt = e.groupBy(
        F.col("event_type").alias("t"),
        F.hour("ts").cast("long").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    prof = cnt.groupBy("t").agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(23)),
            lambda h: F.coalesce(
                F.element_at(
                    F.map_from_entries(
                        F.collect_list(F.struct(F.col("h"), F.col("c")))
                    ),
                    h.cast("long"),
                ),
                F.lit(0).cast("long"),
            ),
        ).alias("p")
    )
    a = prof.select(F.col("t").alias("type_a"), F.col("p").alias("pa"))
    b = prof.select(F.col("t").alias("type_b"), F.col("p").alias("pb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(
        F.col("type_a") < F.col("type_b")
    )
    pa, pb = F.col("pa"), F.col("pb")
    l1 = F.aggregate(
        F.zip_with(pa, pb, lambda x, y: F.abs(x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    row0 = F.aggregate(
        F.slice(pb, 2, 23),
        F.array(F.abs(F.element_at(pa, 1) - F.element_at(pb, 1))),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.abs(F.element_at(pa, 1) - x)
                + F.element_at(acc, F.size(acc))
            ),
        ),
    )
    dtw_row = F.aggregate(
        F.slice(pa, 2, 23),
        row0,
        lambda prev, ai: F.aggregate(
            F.slice(pb, 2, 23),
            F.array(F.abs(ai - F.element_at(pb, 1)) + F.element_at(prev, 1)),
            lambda acc, bj: F.concat(
                acc,
                F.array(
                    F.abs(ai - bj)
                    + F.least(
                        F.element_at(prev, F.size(acc) + 1),
                        F.element_at(prev, F.size(acc)),
                        F.element_at(acc, F.size(acc)),
                    )
                ),
            ),
        ),
    )
    return pairs.select(
        "type_a",
        "type_b",
        l1.alias("l1"),
        F.element_at(dtw_row, 24).alias("dtw"),
    )


# ---------------------------------------------------------------------------
# Daily motif discovery (r12): matrix-profile-lite over the first
# seven day-long windows of the hourly event-count series — exact
# integer SSE between every pair of daily profiles, the closest pair
# flagged as the motif (ties broken by day indices). The 21-pair
# "profile" is tiny by construction; at 100 TB only the hourly
# aggregate scan grows. The pair explosion is a broadcast
# nested-loop of two 7-row dims — never a fact-sized join.
# ---------------------------------------------------------------------------
@query(
    "daily_motif_pairs",
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
      SELECT s.idx // 24 AS d, s.idx % 24 AS h,
             CAST(coalesce(hx.c, 0) AS BIGINT) AS x
      FROM spine s LEFT JOIN hx ON hx.idx = s.idx
    ),
    prof AS (
      SELECT d, list(x ORDER BY h) AS p FROM g GROUP BY d
    ),
    pairs AS (
      SELECT a.d AS day_a, b.d AS day_b,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, 25),
                 i -> (a.p[i] - b.p[i]) * (a.p[i] - b.p[i]))),
               (x, y) -> x + y) AS BIGINT) AS sse
      FROM prof a JOIN prof b ON a.d < b.d
    )
    SELECT day_a, day_b, sse,
           CAST(CASE WHEN row_number() OVER (ORDER BY sse, day_a, day_b)
                = 1 THEN 1 ELSE 0 END AS INT) AS is_motif
    FROM pairs
    """,
)
def q_daily_motif_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix-profile-lite motif discovery over the first 7 daily profiles of the hourly series - exact integer SSE for all 21 day pairs, closest pair flagged, broadcast pair join of two 7-row dims."""
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
        F.expr("idx div 24").alias("d"),
        (F.col("idx") % 24).alias("h"),
        F.coalesce("c", F.lit(0)).cast("long").alias("x"),
    )
    prof = g.groupBy("d").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("h"), F.col("x")))),
            lambda s: s["x"],
        ).alias("p")
    )
    a = prof.select(F.col("d").alias("day_a"), F.col("p").alias("pa"))
    b = prof.select(F.col("d").alias("day_b"), F.col("p").alias("pb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(
        F.col("day_a") < F.col("day_b")
    )
    sse = F.aggregate(
        F.zip_with(
            F.col("pa"), F.col("pb"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = W.orderBy("sse", "day_a", "day_b")
    return pairs.select("day_a", "day_b", sse.alias("sse")).select(
        "day_a",
        "day_b",
        "sse",
        F.when(F.row_number().over(w) == 1, 1)
        .otherwise(0)
        .cast("int")
        .alias("is_motif"),
    )


# ---------------------------------------------------------------------------
# SAX symbolization (r12): the classic symbolic TS representation —
# each of the first 7 days is PAA-reduced to 6 four-hour segments and
# each segment mean is mapped to one of 4 symbols (a..d) by the
# global quartile breakpoints of the 42 segment means. EXACT: segment
# sums are integers (means = sum/4 compared by cross-multiplication),
# the quartile breakpoints are order statistics of the 42 exact sums,
# and symbols compare sums directly — no float anywhere. The daily
# SAX words feed motif/novelty indexes; at scale only the hourly
# aggregate grows (42 segments is fixed by the window).
# ---------------------------------------------------------------------------
@query(
    "sax_daily_symbols",
    oracle="""
    WITH b AS (SELECT min(date_trunc('hour', ts)) AS lo FROM events),
    hx AS (
      SELECT CAST(epoch(date_trunc('hour', ts))
                  - epoch((SELECT lo FROM b)) AS BIGINT) // 3600 AS idx,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    spine AS (SELECT unnest(range(0, 168)) AS idx),
    seg AS (
      SELECT s.idx // 24 AS d, (s.idx % 24) // 4 AS sg,
             CAST(sum(coalesce(hx.c, 0)) AS BIGINT) AS ssum
      FROM spine s LEFT JOIN hx ON hx.idx = s.idx
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT d, sg, ssum,
             row_number() OVER (ORDER BY ssum, d, sg) AS rn,
             count(*) OVER () AS n
      FROM seg
    ),
    sym AS (
      SELECT d, sg, ssum,
             CAST(CASE WHEN rn * 4 <= n THEN 0
                       WHEN rn * 2 <= n THEN 1
                       WHEN rn * 4 <= 3 * n THEN 2
                       ELSE 3 END AS INT) AS q
      FROM rk
    )
    SELECT d AS day,
           string_agg(chr(97 + q), '' ORDER BY sg) AS sax_word,
           CAST(sum(ssum) AS BIGINT) AS day_total
    FROM sym GROUP BY d
    """,
)
def q_sax_daily_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic words for the first 7 days (PAA to 6 four-hour segments, 4-symbol alphabet by rank quartiles of the 42 exact segment sums) - pure integer arithmetic, rank-based breakpoints, no float."""
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
    seg = (
        spine.join(idx, "idx", "left")
        .groupBy(
            F.expr("idx div 24").alias("d"),
            F.expr("(idx % 24) div 4").alias("sg"),
        )
        .agg(F.sum(F.coalesce("c", F.lit(0))).cast("long").alias("ssum"))
    )
    wr = W.orderBy("ssum", "d", "sg")
    wall = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    rk = seg.select(
        "d",
        "sg",
        "ssum",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    q = (
        F.when(F.col("rn") * 4 <= F.col("n"), 0)
        .when(F.col("rn") * 2 <= F.col("n"), 1)
        .when(F.col("rn") * 4 <= 3 * F.col("n"), 2)
        .otherwise(3)
    )
    sym = rk.select("d", "sg", "ssum", q.cast("int").alias("q"))
    return sym.groupBy(F.col("d").alias("day")).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("sg"), F.col("q")))
                ),
                lambda s: F.char(s["q"] + 97),
            ),
        ).alias("sax_word"),
        F.sum("ssum").cast("long").alias("day_total"),
    )
