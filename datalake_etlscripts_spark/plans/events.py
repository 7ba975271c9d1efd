"""Event-stream query inventory over ``events``: sessionization,
tumbling windows, JSON extraction, as-of joins. The same logic is
exposed for Structured Streaming in streaming/ (SURVEY.md §2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.operators.events import as_of_join, sessionize
from datalake_etlscripts_spark.plans.registry import query

SESSION_GAP_MIN = 30


# ---------------------------------------------------------------------------
# gap-based sessionization: lag + cumulative session counter per user
# ---------------------------------------------------------------------------
@query(
    "sessionize_events",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_MIN} * 60 * 1000000
             OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marked
    )
    SELECT user_id, session_no, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, session_no
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute-gap session ids per user via a lag window + running session counter."""
    e = read_table(spark, sf_dir, "events")
    s = sessionize(e, gap_minutes=SESSION_GAP_MIN)
    return s.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# tumbling-window aggregation (batch shape of the streaming windowed agg)
# ---------------------------------------------------------------------------
@query(
    "tumbling_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event counts per type (batch twin of the streaming windowed aggregation)."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


# ---------------------------------------------------------------------------
# JSON property extraction (F5-adjacent: semi-structured payloads)
# ---------------------------------------------------------------------------
@query(
    "json_extract_props",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from a JSON properties column (get_json_object / from_json)."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("int").alias("k"), "value"
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# as-of join: each purchase matched to the user's most recent prior view
# (Spark lacks a native ASOF JOIN — union + last-value window, one
# shuffle on user_id, no range explosion; DuckDB verifies with its
# native ASOF JOIN)
# ---------------------------------------------------------------------------
@query(
    "asof_join_events",
    oracle="""
    SELECT l.event_id AS purchase_id, l.user_id,
           r.event_id AS matched_view_id,
           CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the latest reference row at-or-before its timestamp (union + last-value window, no inequality join)."""
    e = read_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase")
    right = e.filter(F.col("event_type") == "view")
    joined = as_of_join(
        left, right, on="user_id", ts_col="ts", suffix="_view"
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("event_id_view").alias("matched_view_id"),
        (F.unix_micros("ts") - F.unix_micros("ts_view")).alias("lag_us"),
    )


# ---------------------------------------------------------------------------
# top-k per group over sessions: longest session per user (windows over
# the sessionized result — composability check)
# ---------------------------------------------------------------------------
@query(
    "longest_session_per_user",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_MIN} * 60 * 1000000
             OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marked
    ),
    sized AS (
      SELECT user_id, session_no, count(*) AS n_events
      FROM sess GROUP BY user_id, session_no
    )
    SELECT user_id, session_no, n_events FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY n_events DESC, session_no) AS rk
      FROM sized
    ) WHERE rk = 1
    """,
)
def q_longest_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest session per user from the sessionized stream - argmax by duration with deterministic tie-break."""
    e = read_table(spark, sf_dir, "events")
    sized = (
        sessionize(e, gap_minutes=SESSION_GAP_MIN)
        .groupBy("user_id", "session_no")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"), "session_no")
    return (
        sized.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "session_no", "n_events")
    )


# ---------------------------------------------------------------------------
# range join: pairs of events by the same user within 5 minutes —
# bucketized equi-join (time bucket + neighbor bucket) + exact filter,
# never the per-user cross product; DuckDB verifies with a plain
# inequality join
# ---------------------------------------------------------------------------
@query(
    "range_join_events",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
           CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND b.ts >= a.ts AND epoch_us(b.ts) - epoch_us(a.ts) <= 300 * 1000000
     AND a.event_type = 'click' AND b.event_type = 'purchase'
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events to enclosing maintenance windows via coarse-bucket equi-join + neighbor explode (no inequality cross join)."""
    e = read_table(spark, sf_dir, "events")
    bucket_us = 300 * 1_000_000
    a = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("id_a"),
        "user_id",
        F.unix_micros("ts").alias("us_a"),
        (F.unix_micros("ts") / bucket_us).cast("long").alias("_b"),
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("id_b"),
        "user_id",
        F.unix_micros("ts").alias("us_b"),
        F.explode(
            F.array(
                (F.unix_micros("ts") / bucket_us).cast("long"),
                (F.unix_micros("ts") / bucket_us).cast("long") - 1,
            )
        ).alias("_b"),
    )
    pairs = a.join(b, ["user_id", "_b"]).filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("us_b") >= F.col("us_a"))
        & (F.col("us_b") - F.col("us_a") <= bucket_us)
    )
    return pairs.select(
        "id_a", "id_b", "user_id", (F.col("us_b") - F.col("us_a")).alias("gap_us")
    ).dropDuplicates(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# ordered-sequence funnel (view → click → purchase): per-user sorted
# fold advancing a step counter — ONE user-keyed shuffle, no k-way
# self-joins (operators/events.funnel_counts); DuckDB verifies with
# the identical list_reduce fold
# ---------------------------------------------------------------------------
@query(
    "funnel_conversion",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             list_transform(
               list_sort(list(struct_pack(ts := ts, id := event_id,
                                          t := event_type))),
               e -> e.t) AS ts_types
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY user_id
    ),
    steps AS (
      SELECT user_id,
             CAST(list_reduce(list_prepend('0', ts_types), (acc, t) ->
               CASE WHEN acc = '0' AND t = 'view' THEN '1'
                    WHEN acc = '1' AND t = 'click' THEN '2'
                    WHEN acc = '2' AND t = 'purchase' THEN '3'
                    ELSE acc END) AS INT) AS max_step
      FROM ev
    ),
    reached AS (
      SELECT unnest(range(1, max_step + 1)) AS step FROM steps
      WHERE max_step >= 1
    )
    SELECT CAST(step AS INT) AS step, count(*) AS n_users
    FROM reached GROUP BY 1
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: per-user sorted fold counts users reaching each stage in order."""
    from datalake_etlscripts_spark.operators.events import funnel_counts

    e = read_table(spark, sf_dir, "events")
    return funnel_counts(e, ["view", "click", "purchase"])


# ---------------------------------------------------------------------------
# per-group z-score outliers: moments in EXACT decimal (partitioning-
# order-independent), final mean/std/z in double where identical
# inputs give identical IEEE results (operators/events.zscore_outliers)
# ---------------------------------------------------------------------------
@query(
    "anomalous_events",
    oracle="""
    WITH vals AS (
      SELECT event_id, event_type, TRY_CAST(value AS DECIMAL(18,4)) AS dv
      FROM events
    ),
    stats AS (
      SELECT event_type, count(dv) AS n, sum(dv) AS s1, sum(dv * dv) AS s2
      FROM vals GROUP BY event_type
    ),
    scored AS (
      SELECT event_id, v.event_type, CAST(dv AS DOUBLE) AS value,
             CASE WHEN n > 0
                   AND CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) > 0
                  THEN (CAST(dv AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
                       / sqrt(CAST(s2 AS DOUBLE) / n
                              - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             END AS z
      FROM vals v JOIN stats USING (event_type)
      WHERE dv IS NOT NULL
    )
    SELECT event_id, event_type, value, z FROM scored WHERE abs(z) > 3.0
    """,
)
def q_anomalous_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers with zero-variance and overflow guards (exact decimal moments)."""
    from datalake_etlscripts_spark.operators.events import zscore_outliers

    e = read_table(spark, sf_dir, "events")
    return zscore_outliers(e, k=3.0)


# ---------------------------------------------------------------------------
# time-series resampling with forward fill: dense hourly grid per
# user, latest observation carried into gaps — the union + carry-last
# window shape of as_of_join (operators/events.resample_forward_fill);
# DuckDB verifies with its native ASOF join over the same grid
# ---------------------------------------------------------------------------
@query(
    "resample_forward_fill",
    oracle="""
    WITH obs AS (
      SELECT user_id, ts, max(value) AS value FROM events GROUP BY user_id, ts
    ),
    bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
      FROM obs GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS grid_ts
      FROM bounds
    )
    SELECT g.user_id, g.grid_ts, o.value AS value
    FROM grid g ASOF LEFT JOIN obs o
      ON g.user_id = o.user_id AND g.grid_ts >= o.ts
    """,
)
def q_resample_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid resampling with forward fill: step-floored grid origin, last observation carried forward per key."""
    from datalake_etlscripts_spark.operators.events import resample_forward_fill

    e = read_table(spark, sf_dir, "events")
    return resample_forward_fill(e, step="1 hour")


# ---------------------------------------------------------------------------
# cohort retention matrix (weekly cohorts × period offsets) — the
# third of the classic event-analytics trio with sessionize + funnel
# (operators/events.cohort_retention)
# ---------------------------------------------------------------------------
@query(
    "cohort_retention",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
    ),
    cohorts AS (SELECT user_id, min(p) AS cohort FROM activity GROUP BY user_id)
    SELECT c.cohort, CAST(date_diff('day', c.cohort, a.p) / 7 AS INT) AS period_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: first-activity cohort x period offset, distinct users retained."""
    from datalake_etlscripts_spark.operators.events import cohort_retention

    e = read_table(spark, sf_dir, "events")
    return cohort_retention(e, period="week")


# ---------------------------------------------------------------------------
# full ranking-window suite: rank / dense_rank / percent_rank /
# cume_dist / lead / lag / bounded-frame moving sum, all in ONE window
# partitioning (user_id) — a single shuffle serves every function.
# percent_rank and cume_dist are ratios of exact integers (bit-identical
# across engines); the moving sum runs in exact DECIMAL per the float
# policy (plans/registry.py).
# ---------------------------------------------------------------------------
@query(
    "window_functions_suite",
    oracle="""
    SELECT event_id, user_id,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cdist,
           lag(event_type, 1) OVER w AS prev_type,
           lead(event_type, 1) OVER w AS next_type,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,4)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS VARCHAR) AS DOUBLE) AS moving_sum3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank/cume_dist/lead/lag + bounded-frame decimal moving sum in one window partitioning."""
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-2, 0)
    return e.select(
        "event_id",
        "user_id",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.sum(F.col("value").cast("decimal(12,4)"))
        .over(frame)
        .cast("double")
        .alias("moving_sum3"),
    )


# ---------------------------------------------------------------------------
# sequence-pattern matching (MATCH_RECOGNIZE shape): regex over the
# per-user time-ordered event-type string — one user-keyed shuffle.
# ---------------------------------------------------------------------------
@query(
    "event_pattern_match",
    oracle="""
    WITH seq AS (
      SELECT user_id, count(*) AS n_events,
             string_agg('<' || event_type || '>', '' ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(len(regexp_extract_all(s, '<view>(<error>)?<purchase>')) AS INT)
             AS n_matches
    FROM seq
    """,
)
def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching: count view-(error?)-purchase runs per user via regex over the delimited time-ordered event string - one user-keyed shuffle, no k-way self-joins."""
    from datalake_etlscripts_spark.operators.events import event_pattern_matches

    e = read_table(spark, sf_dir, "events")
    return event_pattern_matches(e, r"<view>(<error>)?<purchase>")


# ---------------------------------------------------------------------------
# robust (median/MAD) outliers — the contaminated-data complement of
# anomalous_events; exact medians verified interpolation-identical to
# DuckDB's median(). Zero-MAD groups excluded on both sides.
# ---------------------------------------------------------------------------
@query(
    "robust_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS dv
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (SELECT event_type, median(dv) AS mad FROM dev GROUP BY 1)
    SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
           (d.value - d.med) / (CAST('1.4826' AS DOUBLE) * m.mad) AS rz
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0
      AND abs((d.value - d.med) / (CAST('1.4826' AS DOUBLE) * m.mad)) > 3.5
    """,
)
def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outliers per event type (|rz| > 3.5) - exact percentile medians, broadcast stats, zero-MAD groups excluded."""
    from datalake_etlscripts_spark.operators.events import robust_outliers

    e = read_table(spark, sf_dir, "events")
    return robust_outliers(e)


# ---------------------------------------------------------------------------
# grouped latency-style percentile summary: exact p50/p95/p99 per key —
# Spark percentile() interpolation verified identical to DuckDB
# quantile_cont (cf. robust_outliers).
# ---------------------------------------------------------------------------
@query(
    "percentile_summary",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.95) AS p95,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
)
def q_percentile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95/p99 of value per event type - one grouped percentile aggregate, scalar outputs.

    Scale note: exact percentile buffers each group's values (fine for
    bounded per-key cardinality — event types, tenants, days); for
    unbounded groups the engine's scale paths are approx_percentile
    (t-digest, approx_aggregates) and the mergeable histogram sketch
    state (approx_quantiles_incremental)."""
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


# ---------------------------------------------------------------------------
# top-k session paths: sessionize → ordered per-session path string →
# corpus-wide path counts → deterministic top-k.
# ---------------------------------------------------------------------------
@query(
    "top_session_paths",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
        CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_MIN} * 60 * 1000000
             OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    ranked AS (
      SELECT user_id, session_no, ts, event_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_no
                                ORDER BY ts, event_id) AS rn
      FROM sess
    ),
    paths AS (
      SELECT user_id, session_no,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
             count(*) AS len
      FROM ranked WHERE rn <= 1000 GROUP BY user_id, session_no
    ),
    counted AS (
      SELECT path, count(*) AS n_sessions, max(len) AS n_events
      FROM paths GROUP BY path
    )
    SELECT path, n_sessions, n_events FROM counted
    ORDER BY n_sessions DESC, path ASC LIMIT 20
    """,
)
def q_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most common session paths (sessionize, per-session ordered path string, corpus-wide counts) - session-bounded collects, deterministic cut."""
    from datalake_etlscripts_spark.operators.events import top_session_paths

    e = read_table(spark, sf_dir, "events")
    return top_session_paths(e, k=20, gap_minutes=SESSION_GAP_MIN, max_len=1000)


# ---------------------------------------------------------------------------
# Markov transition matrix: P(next event | current) from per-user
# time-ordered lead pairs — one user window + one pair count; the
# probability is a rational of two exact counts (deterministic double).
# ---------------------------------------------------------------------------
@query(
    "event_transition_matrix",
    oracle="""
    WITH nxt AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs AS (
      SELECT cur, nxt, count(*) AS n FROM nxt
      WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    tot AS (SELECT cur, sum(n) AS t FROM pairs GROUP BY cur)
    SELECT p.cur, p.nxt, p.n,
           CAST(p.n AS DOUBLE) / t.t AS p
    FROM pairs p JOIN tot t USING (cur)
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix P(next event | current) per event type - one user-ordered lead window, one pair count, rational probabilities."""
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("_t"))
    return pairs.join(F.broadcast(tot), "cur").select(
        "cur", "nxt", "n", (F.col("n").cast("double") / F.col("_t")).alias("p")
    )


# ---------------------------------------------------------------------------
# RANGE-frame rolling aggregate: trailing 1-hour mean per event type —
# the time-interval window shape (rows-frames live in
# window_functions_suite). Sum in exact decimal for the cross-engine
# hash; count is integer; the mean divides two exact numbers.
# ---------------------------------------------------------------------------
@query(
    "rolling_hour_mean",
    oracle="""
    SELECT event_id, event_type, ts,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE)
             / COUNT(*) OVER w AS rolling_mean,
           COUNT(*) OVER w AS n_window
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_hour_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling mean of value per event type - RANGE interval frame over epoch micros, decimal-exact sum."""
    e = read_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        "ts",
        (
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("rolling_mean"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )


# ---------------------------------------------------------------------------
# per-key least-squares trend — EXACT integer/decimal sums (built-in
# regr_* would sum doubles in partition order); only the final
# divisions are floating point, replayed in the same order here.
# ---------------------------------------------------------------------------
@query(
    "value_trend_per_type",
    oracle="""
    WITH x0 AS (
      SELECT event_type, min(epoch_us(ts) // 1000000) AS x0
      FROM events GROUP BY 1
    ),
    b AS (
      SELECT e.event_type,
             CAST(epoch_us(e.ts) // 1000000 - x0.x0 AS HUGEINT) AS x,
             CAST(CAST(e.value AS DECIMAL(12,4)) * 10000 AS HUGEINT) AS yi
      FROM events e JOIN x0 USING (event_type)
    ),
    m AS (
      SELECT event_type, count(*) AS n,
             SUM(x) AS sx, SUM(yi) AS sy,
             SUM(x * yi) AS sxy, SUM(x * x) AS sxx
      FROM b GROUP BY 1
    )
    SELECT event_type, n,
      (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)) / 10000.0 AS slope,
      CAST(sy AS DOUBLE) / 10000.0 / CAST(n AS DOUBLE)
        - ((CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
              / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)) / 10000.0)
          * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS intercept
    FROM m
    """,
)
def q_value_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares value trend (slope per second + intercept at first observation) - exact integer-scaled sums, float only in the final divisions."""
    from datalake_etlscripts_spark.operators.events import linear_trend

    e = read_table(spark, sf_dir, "events")
    return linear_trend(e)


# ---------------------------------------------------------------------------
# distributional drift between two snapshot halves: per-type binned
# value histograms compared with a chi-square-style statistic — every
# count is exact; the double terms fold in BIN ORDER (sorted collect)
# so the sum is partitioning-deterministic, same policy as the cosine
# folds. (PSI's ln() is not bit-portable across engines — the
# (pa−pb)²/(pa+pb) form needs only +,−,×,÷.)
# ---------------------------------------------------------------------------
@query(
    "distribution_drift",
    oracle="""
    WITH binned AS (
      SELECT event_type, event_id % 2 AS h,
             CAST(floor(value / 10.0) AS BIGINT) AS bin
      FROM events
    ),
    c AS (
      SELECT event_type, bin,
             SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS nb
      FROM binned GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, SUM(na) AS ta, SUM(nb) AS tb,
             list_sort(list(ROW(bin, na, nb))) AS arr
      FROM c GROUP BY 1
    )
    SELECT event_type, CAST(ta AS BIGINT) AS ta, CAST(tb AS BIGINT) AS tb,
      list_reduce(list_prepend(0.0, list_transform(arr, s ->
        (CAST(s[2] AS DOUBLE) / ta - CAST(s[3] AS DOUBLE) / tb)
          * (CAST(s[2] AS DOUBLE) / ta - CAST(s[3] AS DOUBLE) / tb)
          / (CAST(s[2] AS DOUBLE) / ta + CAST(s[3] AS DOUBLE) / tb))),
        (a, x) -> a + x) AS drift
    FROM t
    """,
)
def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square-style distribution drift between snapshot halves per event type - exact bin counts, bin-ordered double fold (no ln, bit-portable)."""
    from datalake_etlscripts_spark.operators.events import distribution_drift

    e = read_table(spark, sf_dir, "events")
    return distribution_drift(e)


# ---------------------------------------------------------------------------
# sliding-window EXACT distinct: rolling 3-hour active users per type
# ---------------------------------------------------------------------------
@query(
    "rolling_distinct_users",
    oracle="""
    WITH grain AS (
      SELECT DISTINCT event_type AS key, date_trunc('hour', ts) AS h, user_id AS e
      FROM events
    ),
    fanned AS (
      SELECT DISTINCT key, e,
             h + unnest([INTERVAL 0 HOUR, INTERVAL 1 HOUR, INTERVAL 2 HOUR])
               AS window_end
      FROM grain
    )
    SELECT key, window_end, count(*) AS n_entities
    FROM fanned GROUP BY key, window_end
    """,
)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-hour exact distinct users per event type - hourly grain dedup, window-width fan-out, one (key, window_end) aggregate; HLL sketch state is the wide-window path."""
    from datalake_etlscripts_spark.operators.events import rolling_distinct

    e = read_table(spark, sf_dir, "events")
    return rolling_distinct(
        e, key_col="event_type", ts_col="ts", entity_col="user_id", window_hours=3
    )


# ---------------------------------------------------------------------------
# winsorized per-type mean: clamp at exact [p5, p95] then decimal mean
# ---------------------------------------------------------------------------
@query(
    "winsorized_mean",
    oracle="""
    WITH stats AS (
      SELECT event_type AS key,
             quantile_cont(value, 0.05) AS p_lo,
             quantile_cont(value, 0.95) AS p_hi
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT e.event_type AS key, s.p_lo, s.p_hi,
             CAST(LEAST(GREATEST(e.value, s.p_lo), s.p_hi) AS DECIMAL(18,6)) AS v
      FROM events e JOIN stats s ON s.key = e.event_type
    )
    SELECT key, count(v) AS n, p_lo, p_hi,
           CAST(SUM(v) AS DOUBLE) / count(v) AS wmean
    FROM c GROUP BY key, p_lo, p_hi
    """,
)
def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust winsorized mean per event type - exact p5/p95 clamp, decimal-exact sum, one broadcast stats dim."""
    from datalake_etlscripts_spark.operators.events import winsorized_mean

    e = read_table(spark, sf_dir, "events")
    return winsorized_mean(e, key_col="event_type", value_col="value")


# ---------------------------------------------------------------------------
# time-weighted average (TWAP) per event type: duration-to-next weights
# ---------------------------------------------------------------------------
@query(
    "time_weighted_avg",
    oracle="""
    WITH d AS (
      SELECT event_type AS key,
             CAST(value AS DECIMAL(12,4)) AS v,
             epoch_us(lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id))
               - epoch_us(ts) AS dur
      FROM events
    ),
    a AS (
      SELECT key, count(*) AS n_obs,
             CAST(COALESCE(SUM(dur), 0) AS BIGINT) AS total_micros,
             SUM(v * CAST(dur AS DECIMAL(18,0))) AS wsum
      FROM d GROUP BY key
    )
    SELECT key, n_obs, total_micros,
           CASE WHEN total_micros > 0
                THEN CAST(CAST(wsum AS VARCHAR) AS DOUBLE) / CAST(total_micros AS DOUBLE)
           END AS twap
    FROM a
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type (TWAP) - duration-to-next weights from one lead window, decimal-exact weighted sum."""
    from datalake_etlscripts_spark.operators.events import time_weighted_avg

    e = read_table(spark, sf_dir, "events")
    return time_weighted_avg(e, key_col="event_type", ts_col="ts", value_col="value")


# ---------------------------------------------------------------------------
# inter-arrival-time distribution per event type: burstiness profile
# ---------------------------------------------------------------------------
@query(
    "interarrival_stats",
    oracle="""
    WITH g AS (
      SELECT event_type AS key,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT key, count(gap_us) AS n_gaps,
           CAST(COALESCE(SUM(gap_us), 0) AS BIGINT) AS total_us,
           CAST(SUM(gap_us) AS DOUBLE) / count(gap_us) AS mean_gap_us,
           quantile_cont(gap_us, 0.5) AS p50_gap_us,
           quantile_cont(gap_us, 0.95) AS p95_gap_us
    FROM g GROUP BY key
    """,
)
def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile per event type (mean/p50/p95 gaps in exact microseconds) - one lag window, exact integer sums, interpolation-identical percentiles."""
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = e.select(
        F.col("event_type").alias("key"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )
    return gaps.groupBy("key").agg(
        F.count("gap_us").alias("n_gaps"),
        F.coalesce(F.sum("gap_us"), F.lit(0)).cast("long").alias("total_us"),
        (F.sum("gap_us").cast("double") / F.count("gap_us")).alias("mean_gap_us"),
        F.expr("percentile(gap_us, 0.5)").alias("p50_gap_us"),
        F.expr("percentile(gap_us, 0.95)").alias("p95_gap_us"),
    )


# ---------------------------------------------------------------------------
# interval sweep: peak simultaneous users per (event_type, day)
# ---------------------------------------------------------------------------
@query(
    "peak_concurrency",
    oracle="""
    WITH iv AS (
      SELECT event_type AS key, date_trunc('day', ts) AS day, user_id AS e,
             min(ts) AS lo, max(ts) AS hi
      FROM events GROUP BY 1, 2, 3
    ),
    bounds AS (
      SELECT key, day, lo AS t, 1 AS d FROM iv
      UNION ALL
      SELECT key, day, hi AS t, -1 AS d FROM iv
    ),
    swept AS (
      SELECT key, day,
             SUM(d) OVER (PARTITION BY key, day
                          ORDER BY t, d DESC
                          ROWS UNBOUNDED PRECEDING) AS run
      FROM bounds
    )
    SELECT key, day, CAST(MAX(run) AS BIGINT) AS peak
    FROM swept GROUP BY key, day
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous users per event type and day - +1/-1 boundary sweep over presence intervals, one running-sum window, no interval self-join."""
    from datalake_etlscripts_spark.operators.events import peak_concurrency

    e = read_table(spark, sf_dir, "events")
    return peak_concurrency(e, key_col="event_type", ts_col="ts", entity_col="user_id")


# ---------------------------------------------------------------------------
# time-boxed funnel: convert within 1 hour of the first step. The
# oracle folds the same (step, first_ts) state machine with the state
# ENCODED AS 'step|first_us' strings — DuckDB's list_reduce has no
# heterogeneous initial accumulator (same workaround class as the
# Hilbert oracle's unrolled rounds).
# ---------------------------------------------------------------------------
@query(
    "funnel_deadline",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             list_transform(
               list_sort(list(struct_pack(ts := ts, id := event_id,
                                          t := event_type))),
               e -> CAST(epoch_us(e.ts) AS VARCHAR) || '|' || e.t) AS enc
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY user_id
    ),
    steps AS (
      SELECT user_id,
             CAST(split_part(list_reduce(list_prepend('0|0', enc), (acc, x) ->
               CASE
                 WHEN split_part(acc, '|', 1) = '0'
                      AND split_part(x, '|', 2) = 'view'
                   THEN '1|' || split_part(x, '|', 1)
                 WHEN split_part(acc, '|', 1) = '1'
                      AND split_part(x, '|', 2) = 'click'
                      AND CAST(split_part(x, '|', 1) AS BIGINT)
                          <= CAST(split_part(acc, '|', 2) AS BIGINT) + 3600000000
                   THEN '2|' || split_part(acc, '|', 2)
                 WHEN split_part(acc, '|', 1) = '2'
                      AND split_part(x, '|', 2) = 'purchase'
                      AND CAST(split_part(x, '|', 1) AS BIGINT)
                          <= CAST(split_part(acc, '|', 2) AS BIGINT) + 3600000000
                   THEN '3|' || split_part(acc, '|', 2)
                 ELSE acc END), '|', 1) AS INT) AS max_step
      FROM ev
    ),
    reached AS (
      SELECT unnest(range(1, max_step + 1)) AS step FROM steps
      WHERE max_step >= 1
    )
    SELECT CAST(step AS INT) AS step, count(*) AS n_users
    FROM reached GROUP BY 1
    """,
)
def q_funnel_deadline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-boxed funnel (convert within 1 hour of first touch) - the plain funnel's sorted fold carrying (step, first_ts) state, single-attempt semantics."""
    from datalake_etlscripts_spark.operators.events import funnel_counts_deadline

    e = read_table(spark, sf_dir, "events")
    return funnel_counts_deadline(
        e, ["view", "click", "purchase"], within_seconds=3600
    )


# ---------------------------------------------------------------------------
# interval×interval overlap join: user sessions against 10-minute
# outage windows opened by every error event — which sessions ran
# through an outage, and for how long. Bucketed equi-join + exact
# closed-interval test (operators/events.interval_overlap_join); the
# oracle is the plain inequality join.
# ---------------------------------------------------------------------------
@query(
    "interval_overlap",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_MIN} * 60 * 1000000
             OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marked
    ),
    s AS (
      SELECT user_id * 1000 + session_no AS id_a,
             epoch_us(min(ts)) AS s_a, epoch_us(max(ts)) AS e_a
      FROM sess GROUP BY user_id, session_no
    ),
    m AS (
      SELECT event_id AS id_b, epoch_us(ts) AS s_b,
             epoch_us(ts) + 600000000 AS e_b
      FROM events WHERE event_type = 'error'
    )
    SELECT id_a, id_b,
           least(e_a, e_b) - greatest(s_a, s_b) AS overlap_us
    FROM s JOIN m ON s_a <= e_b AND s_b <= e_a
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: user sessions x 10-minute outage windows from error events - bucketed equi-join plus exact interval test, never an inequality cross join."""
    from datalake_etlscripts_spark.operators.events import interval_overlap_join

    e = read_table(spark, sf_dir, "events")
    sess = sessionize(e, gap_minutes=SESSION_GAP_MIN)
    left = sess.groupBy("user_id", "session_no").agg(
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
    ).select(
        (F.col("user_id") * 1000 + F.col("session_no")).alias("id_a"),
        "start_us",
        "end_us",
    )
    right = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("id_b"),
        F.unix_micros("ts").alias("start_us"),
        (F.unix_micros("ts") + 600_000_000).alias("end_us"),
    )
    return interval_overlap_join(left, right)


# ---------------------------------------------------------------------------
# last-touch attribution: every purchase credits the latest click/view
# by the same user within 1 hour — the as-of join applied to marketing
# analytics; unattributed purchases land in the 'none' channel.
# Touches are deduped to one per (user, ts) first, so the as-of match
# has no same-timestamp tie ambiguity on either engine.
# ---------------------------------------------------------------------------
@query(
    "attribution_last_touch",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    t0 AS (
      SELECT user_id, ts, min(event_type) AS channel FROM events
      WHERE event_type IN ('click', 'view') GROUP BY 1, 2
    ),
    m AS (
      SELECT p.event_id, p.value,
             (SELECT channel FROM t0
              WHERE t0.user_id = p.user_id AND t0.ts <= p.ts
                AND epoch_us(p.ts) - epoch_us(t0.ts) <= 3600000000
              ORDER BY t0.ts DESC LIMIT 1) AS attr
      FROM p
    )
    SELECT coalesce(attr, 'none') AS channel,
           count(*) AS n_purchases,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             AS total_value
    FROM m GROUP BY 1
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: purchases credit the latest click/view within 1 hour via the union+carry as-of join - one user-keyed shuffle, no inequality join."""
    from datalake_etlscripts_spark.operators.events import as_of_join

    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    touches = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.min("event_type").alias("channel"))
    )
    j = as_of_join(purchases, touches, on="user_id")
    gap_ok = (
        F.col("ts_r").isNotNull()
        & (F.unix_micros("ts") - F.unix_micros("ts_r") <= 3_600_000_000)
    )
    attr = F.when(gap_ok, F.col("channel_r")).otherwise(F.lit("none"))
    return j.groupBy(attr.alias("channel")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
    )


# ---------------------------------------------------------------------------
# CUSUM rate-shift monitoring: integer-exact Page cusum over hourly
# counts per event type. Both engines first inject the same synthetic
# burst (every Jan-20 event re-appended 4x) so the detector has a real
# shift to find, then fold S_t = max(0, S + x_t·H − T) hour by hour.
# ---------------------------------------------------------------------------
@query(
    "cusum_rate_shift",
    oracle="""
    WITH corpus AS (
      SELECT event_type, ts FROM events
      UNION ALL
      SELECT event_type, ts FROM events, (VALUES (1), (2), (3), (4)) r(i)
      WHERE CAST(ts AS DATE) = DATE '2024-01-20'
    ),
    h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS c
      FROM corpus GROUP BY ALL
    ),
    p AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS total,
             count(*) AS n_hours, list(CAST(c AS BIGINT) ORDER BY hr) AS xs
      FROM h GROUP BY event_type
    )
    -- the fold carries the FULL S-series as a list, not a struct of
    -- running counters: DuckDB 1.0's list_reduce evaluates later
    -- struct fields against the partially-UPDATED accumulator (probe:
    -- {'s': acc.s+100, 'seen': acc.s} yields seen == the new s), so a
    -- struct-state cusum double-applies the recurrence. The list form
    -- reads only acc[len(acc)] — one value, no field-order hazard.
    SELECT event_type, n_hours, total,
           CAST(len(list_filter(sl, v -> v > 2 * total)) AS BIGINT)
             AS n_alarms,
           greatest(list_max(sl), CAST(0 AS BIGINT)) AS peak_s
    FROM (
      SELECT event_type, n_hours, total,
        list_reduce(
          list_prepend([CAST(0 AS BIGINT)], list_transform(xs, x -> [x])),
          (acc, x) -> list_append(acc,
            greatest(CAST(0 AS BIGINT),
                     acc[len(acc)] + x[1] * n_hours - total))
        )[2:] AS sl
      FROM p
    )
    """,
)
def q_cusum_rate_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM rate-shift monitoring per event type: integer-exact Page cusum over hourly counts, with an injected Jan-20 burst both engines share - alarms and peak excess, no floats anywhere."""
    from datalake_etlscripts_spark.operators.events import cusum_rate_shift

    e = read_table(spark, sf_dir, "events").select("event_type", "ts")
    burst = e.filter(F.col("ts").cast("date") == F.lit("2024-01-20").cast("date"))
    corpus = e
    for _ in range(4):
        corpus = corpus.unionByName(burst)
    return cusum_rate_shift(corpus)


# ---------------------------------------------------------------------------
# seasonality audit: lag-24h Pearson autocorrelation of the hourly
# count series per event type — "does this stream have a daily
# rhythm". Exact integer moments over the paired (x_t, x_{t+24})
# series (hour-aligned via a 24h-shifted self-join of the DENSE
# hourly grid, missing hours = 0), doubles only in the final fixed
# combine (the pearson_matrix policy).
# ---------------------------------------------------------------------------
@query(
    "seasonality_lag24",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS c
      FROM events GROUP BY ALL
    ),
    bounds AS (
      SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM h GROUP BY 1
    ),
    grid AS (
      SELECT b.event_type, g.hr FROM bounds b,
      LATERAL (SELECT unnest(generate_series(b.lo, b.hi,
                             INTERVAL 1 HOUR)) AS hr) g
    ),
    dense AS (
      SELECT g.event_type, g.hr, COALESCE(h.c, 0) AS c
      FROM grid g LEFT JOIN h ON h.event_type = g.event_type AND h.hr = g.hr
    ),
    paired AS (
      SELECT a.event_type, a.c AS x, b.c AS y
      FROM dense a JOIN dense b
        ON b.event_type = a.event_type AND b.hr = a.hr + INTERVAL 24 HOUR
    ),
    m AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM paired GROUP BY 1
    )
    SELECT event_type, n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
           END AS autocorr_24h
    FROM m
    """,
)
def q_seasonality_lag24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality audit: lag-24h Pearson autocorrelation of dense hourly counts per event type - exact integer moments, doubles only in the final fixed combine."""
    e = read_table(spark, sf_dir, "events")
    h = e.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("_hr")
    ).agg(F.count(F.lit(1)).alias("_c"))
    bounds = h.groupBy("event_type").agg(
        F.min("_hr").alias("_lo"), F.max("_hr").alias("_hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("_lo", "_hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("_hr"),
    )
    dense = grid.join(h, ["event_type", "_hr"], "left").select(
        "event_type", "_hr", F.coalesce("_c", F.lit(0)).alias("_c")
    )
    b = dense.select(
        "event_type",
        (F.col("_hr") - F.expr("INTERVAL 24 HOUR")).alias("_hr"),
        F.col("_c").alias("_y"),
    )
    paired = dense.join(b, ["event_type", "_hr"]).select(
        "event_type", F.col("_c").alias("_x"), "_y"
    )
    m = paired.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    num = n * F.col("_sxy").cast("double") - sx * F.col("_sy")
    vx = n * F.col("_sxx").cast("double") - sx * F.col("_sx")
    vy = n * F.col("_syy").cast("double") - sy * F.col("_sy")
    ac = F.when(
        (F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx") > 0)
        & (F.col("n") * F.col("_syy") - F.col("_sy") * F.col("_sy") > 0),
        num / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return m.select("event_type", "n", ac.alias("autocorr_24h"))


# ---------------------------------------------------------------------------
# changepoint detection: the single best binary split of each type's
# hourly count series, minimizing SSE_left + SSE_right — finds WHEN
# the rate shifted (cusum_rate_shift above answers THAT it shifted).
# Same injected Jan-20 burst as the cusum query so a true changepoint
# exists. Prefix sums are exact integers; each candidate's SSE is a
# fixed-order double expression of those ints, so the argmin (ties →
# earliest split) is engine-deterministic.
# ---------------------------------------------------------------------------
@query(
    "changepoint_detect",
    oracle="""
    WITH corpus AS (
      SELECT event_type, ts FROM events
      UNION ALL
      SELECT event_type, ts FROM events, (VALUES (1), (2), (3), (4)) r(i)
      WHERE CAST(ts AS DATE) = DATE '2024-01-20'
    ),
    h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS c
      FROM corpus GROUP BY ALL
    ),
    w AS (
      SELECT event_type, hr, c,
             CAST(row_number() OVER tw AS BIGINT) AS i,
             CAST(sum(c) OVER tw AS BIGINT) AS sx,
             CAST(sum(c * c) OVER tw AS BIGINT) AS sxx,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS tx,
             CAST(sum(c * c) OVER (PARTITION BY event_type) AS BIGINT) AS txx
      FROM h
      WINDOW tw AS (PARTITION BY event_type ORDER BY hr
                    ROWS UNBOUNDED PRECEDING)
    ),
    cand AS (
      SELECT event_type, hr AS split_hour, i, n,
             (sxx - CAST(sx AS DOUBLE) * sx / i)
           + ((txx - sxx) - CAST(tx - sx AS DOUBLE) * (tx - sx) / (n - i))
             AS sse_split,
             txx - CAST(tx AS DOUBLE) * tx / n AS sse_total
      FROM w WHERE i < n
    )
    SELECT event_type, split_hour, n AS n_hours, sse_total, sse_split,
           CASE WHEN sse_total > 0 THEN 1.0 - sse_split / sse_total END
             AS var_reduction
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY sse_split, i) AS rk
      FROM cand
    ) WHERE rk = 1
    """,
)
def q_changepoint_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint detection: best binary split of each type's hourly series by SSE reduction - exact integer prefix sums, fixed-order double SSEs, earliest-split tie-break."""
    e = read_table(spark, sf_dir, "events").select("event_type", "ts")
    burst = e.filter(F.col("ts").cast("date") == F.lit("2024-01-20").cast("date"))
    corpus = e
    for _ in range(4):
        corpus = corpus.unionByName(burst)
    h = corpus.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("_hr")
    ).agg(F.count(F.lit(1)).alias("_c"))
    tw = W.partitionBy("event_type").orderBy("_hr").rowsBetween(
        W.unboundedPreceding, 0
    )
    tot = W.partitionBy("event_type")
    w = h.select(
        "event_type",
        "_hr",
        F.row_number().over(W.partitionBy("event_type").orderBy("_hr"))
        .cast("bigint")
        .alias("i"),
        F.sum("_c").over(tw).alias("sx"),
        F.sum(F.col("_c") * F.col("_c")).over(tw).alias("sxx"),
        F.count(F.lit(1)).over(tot).cast("bigint").alias("n"),
        F.sum("_c").over(tot).alias("tx"),
        F.sum(F.col("_c") * F.col("_c")).over(tot).alias("txx"),
    )
    sse_split = (
        F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("i")
    ) + (
        (F.col("txx") - F.col("sxx"))
        - (F.col("tx") - F.col("sx")).cast("double")
        * (F.col("tx") - F.col("sx"))
        / (F.col("n") - F.col("i"))
    )
    sse_total = F.col("txx") - F.col("tx").cast("double") * F.col("tx") / F.col("n")
    cand = w.filter(F.col("i") < F.col("n")).select(
        "event_type",
        F.col("_hr").alias("split_hour"),
        "i",
        F.col("n").alias("n_hours"),
        sse_split.alias("sse_split"),
        sse_total.alias("sse_total"),
    )
    rk = W.partitionBy("event_type").orderBy("sse_split", "i")
    return (
        cand.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "split_hour",
            "n_hours",
            "sse_total",
            "sse_split",
            F.when(
                F.col("sse_total") > 0,
                F.lit(1.0) - F.col("sse_split") / F.col("sse_total"),
            ).alias("var_reduction"),
        )
    )


# ---------------------------------------------------------------------------
# exact two-sample Kolmogorov–Smirnov distance between the even/odd
# event-id halves of each type's value distribution: D = sup|ECDF
# difference|, computed as max|i·m − j·n| over the merged value grid —
# pure integers until ONE final division (the distribution-drift
# sibling of the chi-square query, no binning choice to defend).
# ---------------------------------------------------------------------------
@query(
    "ks_two_sample",
    oracle="""
    WITH v AS (
      SELECT event_type, value,
             CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS a,
             CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS b
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type, value,
             CAST(sum(a) AS BIGINT) AS ca0, CAST(sum(b) AS BIGINT) AS cb0
      FROM v GROUP BY event_type, value
    ),
    c AS (
      SELECT event_type, value,
             CAST(sum(ca0) OVER w AS BIGINT) AS ca,
             CAST(sum(cb0) OVER w AS BIGINT) AS cb,
             CAST(sum(ca0) OVER t AS BIGINT) AS n_a,
             CAST(sum(cb0) OVER t AS BIGINT) AS n_b
      FROM g
      WINDOW w AS (PARTITION BY event_type ORDER BY value
                   ROWS UNBOUNDED PRECEDING),
             t AS (PARTITION BY event_type)
    )
    SELECT event_type, n_a, n_b,
           max(abs(ca * n_b - cb * n_a)) AS d_num,
           CAST(max(abs(ca * n_b - cb * n_a)) AS DOUBLE) / (n_a * n_b)
             AS ks_stat
    FROM c GROUP BY event_type, n_a, n_b
    """,
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS distance between even/odd event-id halves per type - max|i*m - j*n| over the merged value grid, integers until one final division.

    Scale note: the exact statistic needs a per-type cumulative count
    over the DISTINCT-VALUE grid — one window partition per type, so
    this is the audit-scale form (fine while distinct values per type
    fit a task). The 100 TB forms are registered beside it:
    `ks_two_sample_quantized` (64-bin grid, window bounded at 64 rows
    per type) and the binned `distribution_drift` chi-square."""
    e = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = e.select(
        "event_type",
        "value",
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("_a"),
        F.when(F.col("event_id") % 2 == 1, 1).otherwise(0).alias("_b"),
    )
    g = v.groupBy("event_type", "value").agg(
        F.sum("_a").alias("_ca0"), F.sum("_b").alias("_cb0")
    )
    w = W.partitionBy("event_type").orderBy("value").rowsBetween(
        W.unboundedPreceding, 0
    )
    t = W.partitionBy("event_type")
    c = g.select(
        "event_type",
        F.sum("_ca0").over(w).alias("_ca"),
        F.sum("_cb0").over(w).alias("_cb"),
        F.sum("_ca0").over(t).alias("n_a"),
        F.sum("_cb0").over(t).alias("n_b"),
    )
    d = F.abs(F.col("_ca") * F.col("n_b") - F.col("_cb") * F.col("n_a"))
    return c.groupBy("event_type", "n_a", "n_b").agg(
        F.max(d).alias("d_num"),
        (F.max(d).cast("double") / (F.col("n_a") * F.col("n_b"))).alias("ks_stat"),
    )


# ---------------------------------------------------------------------------
# quantized-grid KS — the 100 TB form of ks_two_sample: instead of the
# per-type cumulative window over the UNBOUNDED distinct-value grid,
# values quantize onto 64 equal-width bins between each type's exact
# min/max (a broadcast 1-row-per-type dim), so the only window runs
# over ≤64 rows per type. The statistic is the ECDF sup-difference
# evaluated at the bin boundaries — a provable LOWER bound on the
# exact D that converges as the grid refines; the exact query above
# stays registered as the audit twin.
# ---------------------------------------------------------------------------
@query(
    "ks_two_sample_quantized",
    oracle="""
    WITH v AS (
      SELECT event_type, value,
             CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS a,
             CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS b
      FROM events WHERE value IS NOT NULL
    ),
    mm AS (
      SELECT event_type, min(value) AS lo, max(value) AS hi
      FROM v GROUP BY event_type
    ),
    binned AS (
      SELECT v.event_type,
             CASE WHEN mm.hi = mm.lo THEN 0
                  ELSE least(63, CAST(floor((v.value - mm.lo) * 64
                                            / (mm.hi - mm.lo)) AS BIGINT))
             END AS bin,
             v.a, v.b
      FROM v JOIN mm ON v.event_type = mm.event_type
    ),
    g AS (
      SELECT event_type, bin,
             CAST(sum(a) AS BIGINT) AS ca0, CAST(sum(b) AS BIGINT) AS cb0
      FROM binned GROUP BY event_type, bin
    ),
    c AS (
      SELECT event_type, bin,
             CAST(sum(ca0) OVER w AS BIGINT) AS ca,
             CAST(sum(cb0) OVER w AS BIGINT) AS cb,
             CAST(sum(ca0) OVER t AS BIGINT) AS n_a,
             CAST(sum(cb0) OVER t AS BIGINT) AS n_b
      FROM g
      WINDOW w AS (PARTITION BY event_type ORDER BY bin
                   ROWS UNBOUNDED PRECEDING),
             t AS (PARTITION BY event_type)
    )
    SELECT event_type, n_a, n_b,
           max(abs(ca * n_b - cb * n_a)) AS d_num,
           CAST(max(abs(ca * n_b - cb * n_a)) AS DOUBLE) / (n_a * n_b)
             AS ks_stat
    FROM c GROUP BY event_type, n_a, n_b
    """,
)
def q_ks_two_sample_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized two-sample KS per event type - ECDF sup-difference over a 64-bin equal-width grid (exact per-type min/max), cumulative window bounded at 64 rows per type.

    Bin boundaries are exact selections of input values (min/max via
    groupBy, broadcast back) and the bin index is a single IEEE754
    multiply/divide/floor chain — bit-identical on both engines, no
    approxQuantile nondeterminism. The quantized D is a lower bound
    on the exact statistic (sup over a 64-threshold subset); the
    exact `ks_two_sample` stays registered as the audit-scale twin."""
    e = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = e.select(
        "event_type",
        "value",
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("_a"),
        F.when(F.col("event_id") % 2 == 1, 1).otherwise(0).alias("_b"),
    )
    mm = v.groupBy("event_type").agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    )
    binned = v.join(F.broadcast(mm), "event_type").select(
        "event_type",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.lit(63).cast("bigint"),
                F.floor(
                    (F.col("value") - F.col("_lo"))
                    * 64
                    / (F.col("_hi") - F.col("_lo"))
                ),
            )
        )
        .alias("bin"),
        "_a",
        "_b",
    )
    g = binned.groupBy("event_type", "bin").agg(
        F.sum("_a").alias("_ca0"), F.sum("_b").alias("_cb0")
    )
    w = W.partitionBy("event_type").orderBy("bin").rowsBetween(
        W.unboundedPreceding, 0
    )
    t = W.partitionBy("event_type")
    c = g.select(
        "event_type",
        F.sum("_ca0").over(w).alias("_ca"),
        F.sum("_cb0").over(w).alias("_cb"),
        F.sum("_ca0").over(t).alias("n_a"),
        F.sum("_cb0").over(t).alias("n_b"),
    )
    d = F.abs(F.col("_ca") * F.col("n_b") - F.col("_cb") * F.col("n_a"))
    return c.groupBy("event_type", "n_a", "n_b").agg(
        F.max(d).alias("d_num"),
        (F.max(d).cast("double") / (F.col("n_a") * F.col("n_b"))).alias("ks_stat"),
    )


# ---------------------------------------------------------------------------
# Rolling distinct via HLL register state (r4): the wide-window scale
# path that rolling_distinct_users documents, registered. Hourly
# (type, hour) register tables merge by max into every trailing
# window they cover — the fan-out multiplies the 256-register STATE,
# never the entity grain, so a 30-day window over billions of users
# costs windows × 256 rows instead of windows × |users|. Raw-estimator
# regime note: below ~2.5·m distinct the raw HLL overestimates (the
# exact twin is the small-n answer); the oracle replays the registers
# bit-for-bit either way.
# ---------------------------------------------------------------------------
def _rolling_hll_oracle() -> str:
    from datalake_etlscripts_spark.operators.sketches import (
        HLL_BUCKETS,
        HLL_EST_NUM,
        HLL_WORD_BITS,
    )
    from datalake_etlscripts_spark.plans.registry import ddb_hex32

    ladder = " ".join(
        f"WHEN w >= {1 << i} THEN {HLL_WORD_BITS - i}"
        for i in range(HLL_WORD_BITS - 1, -1, -1)
    )
    scale = 1 << (HLL_WORD_BITS + 1)
    est = (
        f"{HLL_EST_NUM!r} / (sum(CAST(1 AS BIGINT) << ({HLL_WORD_BITS + 1} - reg))"
        f" + ({HLL_BUCKETS} - count(*)) * {scale})"
    )
    return f"""
    WITH e AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             {ddb_hex32("md5(CAST(user_id AS VARCHAR))")} AS hh
      FROM events WHERE user_id IS NOT NULL
    ),
    hb AS (
      SELECT event_type, h, hh & {HLL_BUCKETS - 1} AS bucket, hh >> 8 AS w
      FROM e
    ),
    regs AS (
      SELECT event_type, h, bucket,
             max(CASE {ladder} ELSE {HLL_WORD_BITS + 1} END) AS reg
      FROM hb GROUP BY 1, 2, 3
    ),
    fan AS (
      SELECT event_type,
             h + unnest([INTERVAL 0 HOUR, INTERVAL 1 HOUR, INTERVAL 2 HOUR])
               AS window_end,
             bucket, reg
      FROM regs
    ),
    m AS (
      SELECT event_type, window_end, bucket, max(reg) AS reg
      FROM fan GROUP BY 1, 2, 3
    )
    SELECT event_type, window_end, {est} AS est_users
    FROM m GROUP BY event_type, window_end
    """


@query("rolling_distinct_hll", oracle=_rolling_hll_oracle())
def q_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-hour distinct users from mergeable HLL register state: hourly sketches max-merge into each trailing window - state-sized fan-out (256 registers), the wide-window twin of the exact rolling distinct."""
    from datalake_etlscripts_spark.operators import sketches

    e = read_table(spark, sf_dir, "events").select("event_type", "ts", "user_id")
    hourly = e.withColumn("_h", F.date_trunc("hour", F.col("ts")))
    state = sketches.hll_register_table(hourly, ["event_type", "_h"], "user_id")
    fanned = state.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.col("_h") + F.make_interval(hours=F.lit(k))
                    for k in range(3)
                ]
            )
        ).alias("window_end"),
        "bucket",
        "register",
    )
    merged = fanned.groupBy("event_type", "window_end", "bucket").agg(
        F.max("register").alias("register")
    )
    return sketches.hll_register_estimate(merged, alias="est_users")


# ---------------------------------------------------------------------------
# Kaplan-Meier retention survival (r4): the product-limit estimator
# with right-censoring — cohort_retention's statistically-honest
# sibling (users still active at corpus end are censored, not
# churned). Day-grain grid only; survival is an ordered prefix
# product of (1 − d/n) factors, each a double division of exact
# integers, folded via a sorted array (products reorder like sums).
# ---------------------------------------------------------------------------
@query(
    "survival_retention_km",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS f, CAST(max(ts) AS DATE) AS l
      FROM events GROUP BY 1
    ),
    mx AS (SELECT max(l) AS m FROM u),
    lab AS (
      SELECT date_diff('day', f, l) AS t_days,
             CASE WHEN l >= m - 7 THEN 1 ELSE 0 END AS cen
      FROM u, mx
    ),
    g AS (
      SELECT t_days, CAST(sum(1 - cen) AS BIGINT) AS n_deaths,
             CAST(sum(cen) AS BIGINT) AS c
      FROM lab GROUP BY t_days
    ),
    tot AS (SELECT CAST(sum(n_deaths + c) AS BIGINT) AS n FROM g),
    r AS (
      SELECT t_days, n_deaths, c,
             CAST(tot.n - COALESCE(sum(n_deaths + c) OVER (
               ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS n_risk,
             CAST(row_number() OVER (ORDER BY t_days) AS BIGINT) AS rn
      FROM g, tot
    ),
    arr AS (
      SELECT list(struct_pack(t := t_days, d := n_deaths, n := n_risk)
                  ORDER BY t_days) AS a
      FROM r
    )
    SELECT r.t_days, r.n_risk, r.n_deaths,
           list_reduce(
             list_prepend(1.0, list_transform(
               list_slice(arr.a, 1, r.rn),
               x -> 1.0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),
             (p, q) -> p * q) AS survival
    FROM r, arr
    """,
)
def q_survival_retention_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention survival: per-lifetime-day risk set, deaths, and product-limit survival with 7-day right-censoring - day-grain grid, ordered prefix-product fold."""
    from datalake_etlscripts_spark.operators.events import survival_km

    e = read_table(spark, sf_dir, "events").select("user_id", "ts")
    return survival_km(e)


# ---------------------------------------------------------------------------
# PSI drift (r5): the industry-standard ln-based drift score beside
# the ln-free distribution_drift — Laplace-smoothed per-type value
# histograms of the two snapshot halves; all terms exact integers over
# one per-type denominator; ln quantized to micro-nats (driver-side in
# Spark, same-host libm in the oracle — the DSIR boundary).
# ---------------------------------------------------------------------------
@query(
    "psi_drift",
    oracle="""
    WITH b AS (
      SELECT event_type AS k, event_id % 2 AS h,
             CAST(floor(value / 10.0) AS BIGINT) AS bin
      FROM events
    ),
    c AS (
      SELECT k, bin,
             CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM b GROUP BY 1, 2
    ),
    t AS (
      SELECT k, CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
             CAST(count(*) AS BIGINT) AS nbins
      FROM c GROUP BY 1
    ),
    j AS (
      SELECT c.k, (ca + 1) * (nb + nbins) AS x, (cb + 1) * (na + nbins) AS y,
             (na + nbins) * (nb + nbins) AS d, nbins
      FROM c JOIN t USING (k)
    ),
    s AS (
      SELECT k, d, nbins,
             CAST(sum((x - y) *
               (CAST(floor(ln(CAST(x AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
                - CAST(floor(ln(CAST(y AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)))
               AS BIGINT) AS num
      FROM j GROUP BY 1, 2, 3
    )
    SELECT k AS event_type, nbins AS n_bins,
           CAST(CAST(num AS VARCHAR) AS DOUBLE)
             / (CAST(CAST(d AS VARCHAR) AS DOUBLE) * 1000000.0) AS psi,
           CAST(CAST(num AS VARCHAR) AS DOUBLE)
             / (CAST(CAST(d AS VARCHAR) AS DOUBLE) * 1000000.0) > 0.2 AS drift
    FROM s
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between snapshot halves (Laplace-smoothed histograms) - exact integer terms over one per-type denominator, driver-side micro-nat ln table, one double division per type."""
    from datalake_etlscripts_spark.operators.events import psi_drift

    e = read_table(spark, sf_dir, "events")
    return psi_drift(e)


# ---------------------------------------------------------------------------
# Position-based (U-shaped) attribution (r5): 40/20/40 multi-touch
# credit in integer micro-units beside last-touch — div-truncated
# middle shares documented and replayed identically.
# ---------------------------------------------------------------------------
@query(
    "attribution_position_based",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v4
      FROM events WHERE event_type = 'purchase'
    ),
    t0 AS (
      SELECT user_id, ts, min(event_type) AS channel FROM events
      WHERE event_type IN ('click', 'view') GROUP BY 1, 2
    ),
    j AS (
      SELECT p.event_id, p.v4, p.ts AS pts, t0.ts AS tts, t0.channel AS ch
      FROM p LEFT JOIN t0 USING (user_id)
    ),
    v AS (
      SELECT event_id, v4,
             CASE WHEN tts IS NOT NULL AND tts <= pts
                   AND epoch_us(pts) - epoch_us(tts) <= 3600000000
                  THEN tts END AS tts2,
             CASE WHEN tts IS NOT NULL AND tts <= pts
                   AND epoch_us(pts) - epoch_us(tts) <= 3600000000
                  THEN ch END AS ch2
      FROM j
    ),
    r AS (
      SELECT event_id, v4, tts2, ch2,
             row_number() OVER (PARTITION BY event_id
               ORDER BY tts2 ASC NULLS LAST, ch2 ASC NULLS LAST) AS rn,
             CAST(sum(CASE WHEN ch2 IS NOT NULL THEN 1 ELSE 0 END)
                  OVER (PARTITION BY event_id) AS BIGINT) AS k
      FROM v
    ),
    f AS (SELECT * FROM r WHERE ch2 IS NOT NULL OR (k = 0 AND rn = 1)),
    wgt AS (
      SELECT v4, COALESCE(ch2, 'none') AS channel,
             CASE WHEN k <= 1 THEN 1000000
                  WHEN k = 2 THEN 500000
                  WHEN rn = 1 THEN 400000
                  WHEN rn = k THEN 400000
                  ELSE 200000 // (k - 2) END AS w
      FROM f
    )
    SELECT channel, count(*) AS n_credits,
           CAST(CAST(sum(v4 * w) AS VARCHAR) AS DOUBLE) / 10000000000.0
             AS total_value
    FROM wgt GROUP BY 1
    """,
)
def q_attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution: 40% first / 40% last / 20% split middles in integer micro-credit units times decimal-scaled value - user-keyed join, purchase-sized windows, one division at the end."""
    from datalake_etlscripts_spark.operators.events import position_attribution

    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    touches = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.min("event_type").alias("channel"))
    )
    return position_attribution(purchases, touches)


# ---------------------------------------------------------------------------
# Seasonal-naive MASE (r5): is each event type's daily cycle real —
# the scale-free forecastability gate as a ratio of two exact integer
# error sums over the gap-filled hourly spine.
# ---------------------------------------------------------------------------
@query(
    "forecast_mase",
    oracle="""
    WITH hc AS (
      SELECT event_type AS k, date_trunc('hour', ts) AS h, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    rng AS (SELECT k, min(h) AS lo, max(h) AS hi FROM hc GROUP BY 1),
    spine AS (
      SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM rng
    ),
    g AS (
      SELECT spine.k, spine.h, CAST(COALESCE(hc.c, 0) AS BIGINT) AS c
      FROM spine LEFT JOIN hc ON hc.k = spine.k AND hc.h = spine.h
    ),
    l AS (
      SELECT k, h, c,
             row_number() OVER (PARTITION BY k ORDER BY h) AS rn,
             lag(c, 1) OVER (PARTITION BY k ORDER BY h) AS c1,
             lag(c, 24) OVER (PARTITION BY k ORDER BY h) AS cs
      FROM g
    )
    SELECT k AS event_type, count(*) AS n_eval,
           CAST(sum(abs(c - cs)) AS BIGINT) AS sae_seasonal,
           CAST(sum(abs(c - c1)) AS BIGINT) AS sae_naive,
           CAST(CAST(sum(abs(c - cs)) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(abs(c - c1)) AS BIGINT) AS DOUBLE) AS mase
    FROM l WHERE rn > 24 GROUP BY k
    """,
)
def q_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation per event type: MASE as a ratio of exact integer error sums over the gap-filled hourly spine - hour-grain windows only, one division per type."""
    from datalake_etlscripts_spark.operators.events import seasonal_mase

    e = read_table(spark, sf_dir, "events")
    return seasonal_mase(e)


# ---------------------------------------------------------------------------
# Burst smoothing (r6): Kleinberg 2-state Viterbi over the hourly
# spine — packed-integer DP, recursive-CTE oracle replaying the fold.
# ---------------------------------------------------------------------------
@query(
    "burst_detection",
    oracle="""
    WITH RECURSIVE hc AS (
      SELECT event_type AS k, date_trunc('hour', ts) AS h, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    rng AS (SELECT k, min(h) AS lo, max(h) AS hi FROM hc GROUP BY 1),
    spine AS (
      SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM rng
    ),
    g AS (
      SELECT spine.k, spine.h, CAST(COALESCE(hc.c, 0) AS BIGINT) AS c
      FROM spine LEFT JOIN hc ON hc.k = spine.k AND hc.h = spine.h
    ),
    seq AS (
      SELECT k, h,
             CAST(c * (count(*) OVER (PARTITION BY k))
                  > 2 * (sum(c) OVER (PARTITION BY k)) AS BIGINT) AS hi_bit,
             row_number() OVER (PARTITION BY k ORDER BY h) AS rn
      FROM g
    ),
    dp AS (
      SELECT k, rn,
             least(CAST(0 AS BIGINT), 2097152 + 2097152) + hi_bit * 1048576
               AS k0,
             least(CAST(2097152 AS BIGINT), 0 + 2097152)
               + (1 - hi_bit) * 1048576 + 1 AS k1
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.k, s.rn,
             least(d.k0, d.k1 + 2097152) + s.hi_bit * 1048576,
             least(d.k1, d.k0 + 2097152) + (1 - s.hi_bit) * 1048576 + 1
      FROM dp d JOIN seq s ON s.k = d.k AND s.rn = d.rn + 1
    ),
    last AS (
      SELECT k, k0, k1,
             row_number() OVER (PARTITION BY k ORDER BY rn DESC) AS rk
      FROM dp
    ),
    stats AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(hi_bit) AS BIGINT) AS n_high
      FROM seq GROUP BY k
    )
    SELECT s.k AS event_type, s.n_hours, s.n_high,
           least(l.k0, l.k1) // 1048576 AS smooth_cost,
           least(l.k0, l.k1) % 1048576 AS burst_hours
    FROM stats s JOIN last l ON l.k = s.k AND l.rk = 1
    """,
)
def q_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg-style burst smoothing per event type: 2-state Viterbi DP over the gap-filled hourly spine with packed-integer costs - mismatches cost 1, switches cost 2, ties resolve to fewer burst hours."""
    from datalake_etlscripts_spark.operators.events import burst_smoothing

    e = read_table(spark, sf_dir, "events")
    return burst_smoothing(e)


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (r6): the data-driven attribution
# model beside last-touch/position-based — integer-scaled K-step
# absorption DP per (intact chain + each removed channel), all on the
# dictionary-sized transition matrix. Oracle unrolls every variant.
# ---------------------------------------------------------------------------
def _markov_attr_oracle(
    channels: tuple[str, ...] = ("view", "click", "signup", "error"),
    steps: int = 4,
    scale: int = 1_000_000_000,
) -> str:
    parts = [
        """
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    pairs AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n FROM seq
      WHERE nxt IS NOT NULL AND cur <> 'purchase' GROUP BY 1, 2
    ),
    tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS t FROM pairs GROUP BY 1),
    nodes AS (SELECT DISTINCT cur AS node FROM pairs
              UNION SELECT 'purchase'),
    ft AS (SELECT cur AS et, CAST(count(*) AS BIGINT) AS nf
           FROM seq WHERE rn = 1 GROUP BY 1),
    nu AS (SELECT CAST(sum(nf) AS BIGINT) AS u FROM ft)"""
    ]
    variants = [("base", None)] + [(f"rm{i}", c) for i, c in enumerate(channels)]
    for v, c in variants:
        pv = "pairs" if c is None else f"(SELECT * FROM pairs WHERE nxt <> '{c}')"
        parts.append(f""",
    r_{v}_0 AS (SELECT node,
                CASE WHEN node = 'purchase' THEN CAST({scale} AS BIGINT)
                     ELSE 0 END AS val
                FROM nodes)""")
        for t in range(1, steps + 1):
            parts.append(f""",
    r_{v}_{t} AS (
      SELECT n.node,
             CASE WHEN n.node = 'purchase' THEN CAST({scale} AS BIGINT)
                  ELSE COALESCE(s.v, 0) END AS val
      FROM nodes n LEFT JOIN (
        SELECT p.cur, CAST(sum(p.n * r.val) AS BIGINT) // max(t.t) AS v
        FROM {pv} p
        JOIN r_{v}_{t - 1} r ON r.node = p.nxt
        JOIN tot t ON t.cur = p.cur
        GROUP BY p.cur
      ) s ON s.cur = n.node
    )""")
        ftw = "" if c is None else f" WHERE f.et <> '{c}'"
        parts.append(f""",
    cvr_{v} AS (
      SELECT CAST(COALESCE(sum(f.nf * r.val), 0) AS BIGINT)
               // (SELECT u FROM nu) AS cvr
      FROM ft f JOIN r_{v}_{steps} r ON r.node = f.et{ftw}
    )""")
    sel = [
        f"""
    SELECT '(none)' AS removed_channel, cvr AS cvr_scaled,
           CAST(NULL AS DOUBLE) AS removal_effect
    FROM cvr_base"""
    ]
    for i, c in enumerate(channels):
        sel.append(f"""
    SELECT '{c}', cvr,
           CAST((SELECT cvr FROM cvr_base) - cvr AS DOUBLE)
             / CAST((SELECT cvr FROM cvr_base) AS DOUBLE)
    FROM cvr_rm{i}""")
    return "".join(parts) + "\n    UNION ALL".join(sel)


@query("attribution_markov_removal", oracle=_markov_attr_oracle())
def q_attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: K-step absorption probability per channel-removed chain, integer nanoprobability DP on the dictionary-sized transition matrix - one event-grain window, everything after is broadcast-tiny."""
    from datalake_etlscripts_spark.operators.events import (
        markov_removal_attribution,
    )

    e = read_table(spark, sf_dir, "events")
    return markov_removal_attribution(
        e, channels=("view", "click", "signup", "error")
    )


# ---------------------------------------------------------------------------
# Frequent ordered 3-sequences (r6): GSP semantics via the greedy
# witness — user-grain joins only, never event-pair blowup.
# ---------------------------------------------------------------------------
@query(
    "frequent_sequences",
    oracle="""
    WITH ev AS (
      SELECT user_id AS u, event_type AS et,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pos
      FROM events
    ),
    fa AS (SELECT u, et AS a, min(pos) AS pa FROM ev GROUP BY 1, 2),
    j2 AS (
      SELECT fa.u, fa.a, ev.et AS b, min(ev.pos) AS pb
      FROM fa JOIN ev ON ev.u = fa.u AND ev.pos > fa.pa
      GROUP BY 1, 2, 3
    ),
    j3 AS (
      SELECT DISTINCT j2.u, j2.a, j2.b, ev.et AS c
      FROM j2 JOIN ev ON ev.u = j2.u AND ev.pos > j2.pb
    ),
    sup AS (
      SELECT a, b, c, CAST(count(*) AS BIGINT) AS support
      FROM j3 GROUP BY 1, 2, 3
    )
    SELECT a, b, c, support FROM sup
    WHERE support >= 2
    ORDER BY support DESC, a, b, c LIMIT 20
    """,
)
def q_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent ordered 3-sequences of event types (GSP, gaps allowed) via the greedy earliest-witness joins - user-grain intermediates bounded by the dictionary-sized type set."""
    from datalake_etlscripts_spark.operators.itemsets import frequent_sequences3

    e = read_table(spark, sf_dir, "events")
    return frequent_sequences3(e, minsup=2, topk=20)


# ---------------------------------------------------------------------------
# Arrow-UDAF weighted median (r6): the applyInPandas escape hatch on
# an operator the oracle can still replay exactly — the rare
# driver-checkable Pandas surface (others are unit-only by nature).
# ---------------------------------------------------------------------------
@query(
    "weighted_median_arrow",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS key,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
             CAST(floor(l_quantity) AS BIGINT) AS w
      FROM lineitem
    ),
    g AS (SELECT key, v, CAST(sum(w) AS BIGINT) AS w FROM b GROUP BY 1, 2),
    c AS (
      SELECT key, v,
             CAST(sum(w) OVER (PARTITION BY key ORDER BY v) AS BIGINT) AS cum,
             CAST(sum(w) OVER (PARTITION BY key) AS BIGINT) AS total
      FROM g
    )
    SELECT key, min(total) AS total_w, CAST(min(v) AS BIGINT) AS wmedian
    FROM c WHERE 2 * cum >= total GROUP BY key
    """,
)
def q_weighted_median_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted lower median price per return flag via an Arrow-batched applyInPandas UDAF - integer threshold rule (2*cumw >= W) that the SQL window oracle replays bit-for-bit."""
    from datalake_etlscripts_spark.operators.events import weighted_median_arrow

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).alias("vq"),
        F.floor(F.col("l_quantity")).alias("wq"),
    )
    return weighted_median_arrow(li, "l_returnflag", "vq", "wq")


# ---------------------------------------------------------------------------
# A/B z-test (r6): exact integer counts, fixed-order pooled-variance
# double expression, sqrt the one portable libm call.
# ---------------------------------------------------------------------------
@query(
    "ab_test_ztest",
    oracle="""
    WITH cnts AS (
      SELECT user_id AS u,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(k) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS nu FROM cnts),
    u AS (
      SELECT u, CASE WHEN k * (SELECT nu FROM tot) > (SELECT t FROM tot)
                     THEN 1 ELSE 0 END AS c
      FROM cnts
    ),
    a AS (
      SELECT CAST(sum(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN u % 2 = 0 THEN c ELSE 0 END) AS BIGINT)
               AS conv_a,
             CAST(sum(CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN u % 2 = 1 THEN c ELSE 0 END) AS BIGINT)
               AS conv_b
      FROM u
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
           CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
           CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
             (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                    * (1.0 - (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                               / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                    * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
           END AS z
    FROM a
    """,
)
def q_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B z-test on purchase conversion (variant = user parity): one user-grain aggregate, exact integer counts, fixed-order pooled-variance expression."""
    from datalake_etlscripts_spark.operators.events import ab_test_ztest

    e = read_table(spark, sf_dir, "events")
    return ab_test_ztest(e)


# ---------------------------------------------------------------------------
# Rolling EXACT distinct via bitmap state (r6): the exact twin of
# rolling_distinct_hll at the same window shape — hourly 62-bit word
# tables OR-merge into each trailing window; fan-out multiplies the
# word-grain state (≤ |id universe|/62 per hour), never the entity
# grain. Pick this over HLL when ids are dense integers; HLL when
# they are wide/sparse.
# ---------------------------------------------------------------------------
@query(
    "rolling_distinct_bitmap",
    oracle="""
    WITH state AS (
      SELECT event_type, date_trunc('hour', ts) AS h, user_id // 62 AS widx,
             bit_or(1::BIGINT << CAST(user_id % 62 AS INT)) AS word
      FROM events GROUP BY 1, 2, 3
    ),
    fan AS (
      SELECT event_type,
             h + unnest([INTERVAL 0 HOUR, INTERVAL 1 HOUR, INTERVAL 2 HOUR])
               AS window_end,
             widx, word
      FROM state
    ),
    m AS (
      SELECT event_type, window_end, widx, bit_or(word) AS word
      FROM fan GROUP BY 1, 2, 3
    )
    SELECT event_type, window_end,
           CAST(sum(bit_count(word)) AS BIGINT) AS distinct_users
    FROM m GROUP BY 1, 2
    """,
)
def q_rolling_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-hour EXACT distinct users from bitmap-word state: hourly 62-bit words OR-merge into each trailing window - word-grain fan-out, the exact dense-id twin of rolling_distinct_hll."""
    from datalake_etlscripts_spark.operators.sketches import bitmap_distinct_state

    e = read_table(spark, sf_dir, "events").select(
        F.struct("event_type", F.date_trunc("hour", F.col("ts")).alias("h")).alias(
            "key"
        ),
        "user_id",
    )
    state = bitmap_distinct_state(e, "key", "user_id").select(
        F.col("key.event_type").alias("event_type"),
        F.col("key.h").alias("_h"),
        "widx",
        "word",
    )
    fanned = state.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.col("_h") + F.make_interval(hours=F.lit(k))
                    for k in range(3)
                ]
            )
        ).alias("window_end"),
        "widx",
        "word",
    )
    m = fanned.groupBy("event_type", "window_end", "widx").agg(
        F.expr("bit_or(word)").alias("word")
    )
    return m.groupBy("event_type", "window_end").agg(
        F.sum(F.bit_count("word")).cast("long").alias("distinct_users")
    )


# ---------------------------------------------------------------------------
# Interval coalescing (r6): gaps-and-islands with the cummax carry —
# union length per user of 5-minute activity intervals.
# ---------------------------------------------------------------------------
@query(
    "interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
      FROM events
    ),
    c AS (
      SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS carry
      FROM iv
    ),
    m AS (
      SELECT user_id, s, e,
             sum(CASE WHEN carry IS NULL OR s > carry THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
      FROM c
    ),
    sp AS (
      SELECT user_id, span, CAST(count(*) AS BIGINT) AS n,
             min(s) AS lo, max(e) AS hi
      FROM m GROUP BY 1, 2
    )
    SELECT user_id, CAST(sum(n) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(hi - lo) AS BIGINT) AS covered_seconds
    FROM sp GROUP BY user_id
    """,
)
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user union length of 5-minute activity intervals: gaps-and-islands coalescing with the cummax carry (an early long interval can swallow later ones - lag() alone is wrong)."""
    from datalake_etlscripts_spark.operators.events import interval_coalesce

    e = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("ivs"),
        (F.col("ts") + F.make_interval(mins=F.lit(5))).alias("ive"),
    )
    return interval_coalesce(e, "user_id", "ivs", "ive")


# ---------------------------------------------------------------------------
# Bot detection by inter-arrival regularity (r7): schedulers tick like
# clocks — exact integer gap variance per user, flag decided by integer
# cross-multiplication. A 200-event metronome bot (60 s period) is
# injected identically in both engines to prove the detector fires.
# ---------------------------------------------------------------------------
@query(
    "bot_detection",
    oracle="""
    WITH bots AS (
      SELECT 999999999 AS user_id,
             make_timestamp(1704412800000000 + i * 60000000) AS ts
      FROM (SELECT unnest(range(0, 200)) AS i)
    ),
    ev AS (
      SELECT user_id, ts FROM events
      UNION ALL SELECT user_id, ts FROM bots
    ),
    g AS (SELECT user_id, epoch_us(ts) AS us FROM ev),
    l AS (
      SELECT user_id,
             CAST(us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                  AS HUGEINT) AS gp
      FROM g
    ),
    s AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(gp) AS HUGEINT) AS m, sum(gp) AS sg,
             sum(gp * gp) AS sg2
      FROM l GROUP BY 1
    )
    SELECT user_id, n_events,
           CAST(CAST(sg AS VARCHAR) AS DOUBLE)
             / CAST(CAST(m AS VARCHAR) AS DOUBLE) AS mean_gap_us,
           CAST(CAST(m * sg2 - sg * sg AS VARCHAR) AS DOUBLE)
             / CAST(CAST(m * m AS VARCHAR) AS DOUBLE) AS var_gap_us2,
           (n_events >= 50
              AND m * sg2 - sg * sg < 900000000000000 * (m * m)) AS is_bot
    FROM s WHERE n_events >= 20
    """,
)
def q_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot detection by inter-arrival regularity: exact integer gap variance per user (one lag window, one groupBy on the same key), flag std < 30s decided by integer cross-multiplication; planted 60s-metronome bot proves the detector."""
    from datalake_etlscripts_spark.operators.events import bot_regularity

    e = read_table(spark, sf_dir, "events")
    bots = spark.range(200).select(
        F.lit(999999999).cast("long").alias("user_id"),
        F.timestamp_micros(
            F.lit(1704412800000000) + F.col("id") * 60_000_000
        ).alias("ts"),
    )
    ev = e.select("user_id", "ts").unionByName(bots)
    return bot_regularity(ev)


# ---------------------------------------------------------------------------
# Time-decay multi-touch attribution (r9): each purchase credits its
# click/view touches within 24h by (3/4)^hours-before — the decay
# weights are 24 PRECOMPUTED INTEGER literals (3^h·4^(23−h), the
# cleared-denominator EWMA trick), credit shares are integer
# micro-credit divisions of decimal-scaled value, and untouched
# purchases land in an explicit '(none)' bucket. Completes the
# attribution family beside last-touch, U-shaped and Markov removal.
# One user-keyed join; purchase-sized windows.
# ---------------------------------------------------------------------------
_DECAY_W = "CASE h WHEN 0 THEN 70368744177664 WHEN 1 THEN 52776558133248 WHEN 2 THEN 39582418599936 WHEN 3 THEN 29686813949952 WHEN 4 THEN 22265110462464 WHEN 5 THEN 16698832846848 WHEN 6 THEN 12524124635136 WHEN 7 THEN 9393093476352 WHEN 8 THEN 7044820107264 WHEN 9 THEN 5283615080448 WHEN 10 THEN 3962711310336 WHEN 11 THEN 2972033482752 WHEN 12 THEN 2229025112064 WHEN 13 THEN 1671768834048 WHEN 14 THEN 1253826625536 WHEN 15 THEN 940369969152 WHEN 16 THEN 705277476864 WHEN 17 THEN 528958107648 WHEN 18 THEN 396718580736 WHEN 19 THEN 297538935552 WHEN 20 THEN 223154201664 WHEN 21 THEN 167365651248 WHEN 22 THEN 125524238436 WHEN 23 THEN 94143178827 ELSE 0 END"


@query(
    "attribution_time_decay",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, ts,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v4
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts, event_type AS ch FROM events
      WHERE event_type IN ('click', 'view')
    ),
    j AS (
      SELECT p.event_id, p.v4, t.ch,
             (epoch_us(p.ts) - epoch_us(t.ts)) // 3600000000 AS h
      FROM p JOIN t ON t.user_id = p.user_id
       AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 24 HOUR
    ),
    wgt AS (SELECT event_id, v4, ch, CAST({{w}} AS HUGEINT) AS w FROM j),
    tot AS (SELECT event_id, sum(w) AS sw FROM wgt GROUP BY 1),
    credit AS (
      SELECT wgt.ch,
             (CAST(wgt.v4 AS HUGEINT) * wgt.w * 1000000) // tot.sw
               AS micro
      FROM wgt JOIN tot USING (event_id)
    ),
    none_ AS (
      SELECT '(none)' AS ch,
             CAST(CAST(p.v4 AS HUGEINT) * 1000000 AS HUGEINT) AS micro
      FROM p WHERE NOT EXISTS (SELECT 1 FROM wgt WHERE wgt.event_id = p.event_id)
    ),
    allc AS (SELECT * FROM credit UNION ALL SELECT * FROM none_)
    SELECT ch AS channel, CAST(sum(micro) AS BIGINT) AS credit_micro,
           CAST(CAST(sum(micro) AS VARCHAR) AS DOUBLE) / 1e10
             AS credit_value
    FROM allc GROUP BY 1
    """.format(w=_DECAY_W),
)
def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution with 24 precomputed integer (3/4)^h weights: micro-credit integer divisions of decimal-scaled purchase value, explicit '(none)' bucket, one user-keyed join."""
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("pts"),
        (F.col("value").cast("decimal(18,4)") * 10000)
        .cast("long")
        .alias("v4"),
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("ch"),
    )
    j = p.join(
        t,
        (F.col("tu") == F.col("user_id"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 24 HOUR")),
    ).select(
        "event_id",
        "v4",
        "ch",
        F.expr(
            "(unix_micros(pts) - unix_micros(tts)) div 3600000000"
        ).alias("h"),
    )
    wgt = j.withColumn(
        "w", F.expr(_DECAY_W).cast("decimal(38,0)")
    )
    tot = wgt.groupBy("event_id").agg(F.sum("w").alias("sw"))
    credit = wgt.join(tot, "event_id").select(
        "ch",
        F.expr(
            "(CAST(v4 AS DECIMAL(38,0)) * w * 1000000) div sw"
        ).alias("micro"),
    )
    none_ = p.join(
        wgt.select("event_id").distinct(), "event_id", "left_anti"
    ).select(
        F.lit("(none)").alias("ch"),
        (F.col("v4").cast("decimal(38,0)") * 1000000).alias("micro"),
    )
    allc = credit.unionByName(none_)
    return allc.groupBy(F.col("ch").alias("channel")).agg(
        F.sum("micro").cast("long").alias("credit_micro"),
        (
            F.sum("micro").cast("string").cast("double") / F.lit(1e10)
        ).alias("credit_value"),
    )


# ---------------------------------------------------------------------------
# RANGE-interval window frames (r9): the trailing 2h window defined by
# EVENT TIME, not row count — the frame every SLA/rate query actually
# wants (ROWS frames silently break on gaps and ties). Both engines
# run the numeric RANGE frame over epoch seconds (identical tie
# semantics: all equal-key rows join the frame), values sum in exact
# DECIMAL. Per-type windows; no global ordering.
# ---------------------------------------------------------------------------
@query(
    "range_interval_window",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type, epoch_us(ts) AS ep,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS HUGEINT) AS v4
      FROM events
    )
    SELECT event_id, event_type,
           CAST(count(*) OVER w AS BIGINT) AS n_2h,
           CAST(CAST(sum(v4) OVER w AS VARCHAR) AS DOUBLE) / 1e4
             AS value_2h
    FROM e
    WINDOW w AS (PARTITION BY event_type ORDER BY ep
                 RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_range_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 2-hour RANGE frame by event time per type: gap- and tie-correct where ROWS frames break, exact DECIMAL value sums, numeric range over exact epoch microseconds in both engines (whole seconds would round vs floor differently)."""
    e = read_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ep"),
        (F.col("value").cast("decimal(18,4)") * 10000)
        .cast("decimal(38,0)")
        .alias("v4"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("ep")
        .rangeBetween(-7_200_000_000, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        F.count(F.lit(1)).over(w).cast("long").alias("n_2h"),
        (
            F.sum("v4").over(w).cast("string").cast("double") / F.lit(1e4)
        ).alias("value_2h"),
    )


# ---------------------------------------------------------------------------
# Two-level sessionization (r9): micro-sessions (5-min gaps) nested
# inside macro-visits (60-min gaps), both from ONE user-keyed ordered
# pass — two lag markers, two running sums, no self-joins. The
# hierarchy report (micro count / event count / exact duration per
# visit) is the engagement-depth shape single-level sessionize can't
# express.
# ---------------------------------------------------------------------------
@query(
    "nested_sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS ep FROM events
    ),
    marked AS (
      SELECT user_id, event_id, ts, ep,
             CASE WHEN lag(ep) OVER w IS NULL
                  OR ep - lag(ep) OVER w > 3600000000 THEN 1 ELSE 0 END
               AS macro_chg,
             CASE WHEN lag(ep) OVER w IS NULL
                  OR ep - lag(ep) OVER w > 300000000 THEN 1 ELSE 0 END
               AS micro_chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
    ),
    ids AS (
      SELECT user_id, ts, ep,
             CAST(sum(macro_chg) OVER w AS BIGINT) AS visit,
             CAST(sum(micro_chg) OVER w AS BIGINT) AS micro
      FROM marked
      WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
    )
    SELECT user_id, visit,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT micro) AS BIGINT) AS n_micro_sessions,
           CAST(max(ep) - min(ep) AS BIGINT) AS duration_us
    FROM ids GROUP BY 1, 2
    """,
)
def q_nested_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level sessionization in one user-keyed pass: 5-min micro-sessions nested in 60-min visits via two lag markers and running sums - per-visit depth report with exact microsecond durations."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ep")
    )
    w = W.partitionBy("user_id").orderBy("ep", "event_id")
    lag_ep = F.lag("ep").over(w)
    marked = e.select(
        "user_id",
        "event_id",
        "ep",
        F.when(
            lag_ep.isNull() | (F.col("ep") - lag_ep > 3_600_000_000), 1
        )
        .otherwise(0)
        .alias("macro_chg"),
        F.when(
            lag_ep.isNull() | (F.col("ep") - lag_ep > 300_000_000), 1
        )
        .otherwise(0)
        .alias("micro_chg"),
    )
    ids = marked.select(
        "user_id",
        "ep",
        F.sum("macro_chg").over(w).cast("long").alias("visit"),
        F.sum("micro_chg").over(w).cast("long").alias("micro"),
    )
    return ids.groupBy("user_id", "visit").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("micro").cast("long").alias("n_micro_sessions"),
        (F.max("ep") - F.min("ep")).cast("long").alias("duration_us"),
    )


# ---------------------------------------------------------------------------
# Order-to-ship cycle time (r9): per order, the makespan from order
# date to the LAST ship date in exact integer days; per priority the
# distribution report with the median picked by explicit rank (no
# interpolation) and the tail share past 90 days by integer
# comparison. One join, one order-grain aggregate, dictionary-sized
# percentile windows per priority.
# ---------------------------------------------------------------------------
@query(
    "order_cycle_time",
    oracle="""
    WITH m AS (
      SELECT o.o_orderkey, o.o_orderpriority AS pri,
             (epoch(max(l.l_shipdate)) - epoch(o.o_orderdate)) // 86400
               AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, o.o_orderdate
    ),
    r AS (
      SELECT pri, days,
             row_number() OVER (PARTITION BY pri ORDER BY days,
                                o_orderkey) AS rk,
             count(*) OVER (PARTITION BY pri) AS n
      FROM m
    )
    SELECT pri, CAST(max(n) AS BIGINT) AS n_orders,
           CAST(min(days) AS BIGINT) AS min_days,
           CAST(max(days) AS BIGINT) AS max_days,
           CAST(max(CASE WHEN rk = (n + 1) // 2 THEN days END) AS BIGINT)
             AS median_days,
           CAST(sum(CASE WHEN days > 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_over_90d
    FROM r GROUP BY 1
    """,
)
def q_order_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-last-ship cycle time per priority: exact integer days, rank-picked median (no interpolation), tail count past 90 days."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    m = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", F.col("o_orderpriority").alias("pri"),
                 "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderkey",
            "pri",
            F.expr(
                "(unix_seconds(last_ship) - unix_seconds(o_orderdate))"
                " div 86400"
            ).alias("days"),
        )
    )
    wr = W.partitionBy("pri").orderBy("days", "o_orderkey")
    r = (
        m.withColumn("rk", F.row_number().over(wr))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("pri")))
    )
    return r.groupBy("pri").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.min("days").cast("long").alias("min_days"),
        F.max("days").cast("long").alias("max_days"),
        F.max(
            F.when(F.expr("rk = (n + 1) div 2"), F.col("days"))
        ).cast("long").alias("median_days"),
        F.sum(F.when(F.col("days") > 90, 1).otherwise(0))
        .cast("long")
        .alias("n_over_90d"),
    )


# ---------------------------------------------------------------------------
# Event-type co-occurrence lift (r9): which event types show up in
# the same user-hour more often than independence predicts? Exact
# integer cell counts over the (user, hour) presence table, lift =
# n·n_ab/(n_a·n_b) as one cross-multiplied division, over-represented
# flag by pure integer comparison. A 5×5-bounded pair join AFTER the
# presence aggregate — facts are touched once.
# ---------------------------------------------------------------------------
@query(
    "type_cooccurrence_lift",
    oracle="""
    WITH pres AS (
      SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr, event_type
      FROM events
    ),
    cells AS (SELECT DISTINCT user_id, hr FROM pres),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_cells FROM cells),
    per AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
      FROM pres GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM pres a JOIN pres b
        ON b.user_id = a.user_id AND b.hr = a.hr
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.ta, p.tb, p.n_ab, pa.n_t AS n_a, pb.n_t AS n_b, n.n_cells,
           CAST(n.n_cells * p.n_ab AS DOUBLE)
             / CAST(pa.n_t * pb.n_t AS DOUBLE) AS lift,
           CAST(CASE WHEN n.n_cells * p.n_ab > pa.n_t * pb.n_t
                THEN 1 ELSE 0 END AS INT) AS over_represented
    FROM pairs p
    JOIN per pa ON pa.event_type = p.ta
    JOIN per pb ON pb.event_type = p.tb
    CROSS JOIN n
    """,
)
def q_type_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence lift within user-hours: exact presence-cell counts, cross-multiplied lift and over-representation flags, dictionary-bounded pair join after one fact aggregate."""
    e = read_table(spark, sf_dir, "events")
    pres = e.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        "event_type",
    ).distinct()
    n = pres.select("user_id", "hr").distinct().groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_cells")
    )
    per = pres.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    b = pres.select(
        F.col("user_id").alias("bu"),
        F.col("hr").alias("bh"),
        F.col("event_type").alias("tb"),
    )
    pairs = (
        pres.join(
            b,
            (F.col("user_id") == F.col("bu"))
            & (F.col("hr") == F.col("bh"))
            & (F.col("event_type") < F.col("tb")),
        )
        .groupBy(F.col("event_type").alias("ta"), "tb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    pa = per.select(F.col("event_type").alias("ka"), F.col("n_t").alias("n_a"))
    pb = per.select(F.col("event_type").alias("kb"), F.col("n_t").alias("n_b"))
    j = (
        pairs.join(F.broadcast(pa), F.col("ta") == F.col("ka"))
        .join(F.broadcast(pb), F.col("tb") == F.col("kb"))
        .crossJoin(F.broadcast(n))
    )
    return j.select(
        "ta",
        "tb",
        "n_ab",
        "n_a",
        "n_b",
        "n_cells",
        (
            (F.col("n_cells") * F.col("n_ab")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("lift"),
        F.when(
            F.col("n_cells") * F.col("n_ab") > F.col("n_a") * F.col("n_b"),
            1,
        ).otherwise(0).cast("int").alias("over_represented"),
    )


# ---------------------------------------------------------------------------
# Second-order Markov contexts (r9): the (prev2, prev1) → next
# transition counts and each context's argmax prediction — the
# next-best-action baseline one order above event_transition_matrix.
# Contexts come from two lags in ONE user-keyed window pass; the
# dictionary is ≤ |types|³ so the argmax window is bounded. Exact
# counts, one probability division per row.
# ---------------------------------------------------------------------------
@query(
    "markov2_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    c AS (
      SELECT p2, p1, event_type AS nxt, CAST(count(*) AS BIGINT) AS n
      FROM s WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
    ),
    t AS (
      SELECT p2, p1, CAST(sum(n) AS BIGINT) AS n_ctx FROM c GROUP BY 1, 2
    )
    SELECT c.p2, c.p1, c.nxt, c.n, t.n_ctx,
           CAST(c.n AS DOUBLE) / CAST(t.n_ctx AS DOUBLE) AS p,
           CAST(CASE WHEN row_number() OVER (PARTITION BY c.p2, c.p1
                ORDER BY c.n DESC, c.nxt ASC) = 1
                THEN 1 ELSE 0 END AS INT) AS is_prediction
    FROM c JOIN t ON t.p2 = c.p2 AND t.p1 = c.p1
    """,
)
def q_markov2_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order Markov transition table with per-context argmax predictions: two lags in one user-keyed pass, dictionary-bounded context windows, exact counts and one division per row."""
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    c = s.groupBy("p2", "p1", F.col("event_type").alias("nxt")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy(
        F.col("p2").alias("t2"), F.col("p1").alias("t1")
    ).agg(F.sum("n").cast("long").alias("n_ctx"))
    j = c.join(
        F.broadcast(t),
        (F.col("p2") == F.col("t2")) & (F.col("p1") == F.col("t1")),
    )
    wa = W.partitionBy("p2", "p1").orderBy(
        F.col("n").desc(), F.col("nxt").asc()
    )
    return j.select(
        "p2",
        "p1",
        "nxt",
        "n",
        "n_ctx",
        (F.col("n").cast("double") / F.col("n_ctx").cast("double")).alias(
            "p"
        ),
        F.when(F.row_number().over(wa) == 1, 1)
        .otherwise(0)
        .cast("int")
        .alias("is_prediction"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve (r9): cumulative purchases per signup-week cohort
# as a function of weeks-since-signup — the retention economics twin
# of cohort_retention. Signup = first event week per user; exact
# integer purchase counts cumulate over the ≤5-week age axis inside
# cohort-keyed windows (calendar-bounded). The per-user rate is one
# exact division.
# ---------------------------------------------------------------------------
@query(
    "cohort_ltv_curve",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT f.cohort, f.user_id,
             CAST((epoch(date_trunc('week', e.ts)) - epoch(f.cohort))
                  // 604800 AS BIGINT) AS age_w
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    ),
    sizes AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
      FROM first_seen GROUP BY 1
    ),
    cells AS (
      SELECT cohort, age_w, CAST(count(*) AS BIGINT) AS purchases
      FROM p GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort, age_w, purchases,
             CAST(sum(purchases) OVER (PARTITION BY cohort ORDER BY age_w
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_purchases
      FROM cells
    )
    SELECT CAST(strftime(c.cohort, '%Y-%m-%d') AS VARCHAR) AS cohort,
           c.age_w, c.purchases, c.cum_purchases, s.n_users,
           CAST(c.cum_purchases AS DOUBLE) / CAST(s.n_users AS DOUBLE)
             AS ltv_per_user
    FROM cum c JOIN sizes s ON s.cohort = c.cohort
    """,
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative purchases per signup-week cohort by weeks-since-signup: exact integer counts, cohort-keyed calendar-bounded windows, one division for the per-user LTV."""
    e = read_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "cohort",
            F.expr(
                "CAST((unix_seconds(date_trunc('week', ts))"
                " - unix_seconds(cohort)) div 604800 AS BIGINT)"
            ).alias("age_w"),
        )
    )
    sizes = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    ).withColumnRenamed("cohort", "scohort")
    cells = p.groupBy("cohort", "age_w").agg(
        F.count(F.lit(1)).cast("long").alias("purchases")
    )
    wc = (
        W.partitionBy("cohort")
        .orderBy("age_w")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = cells.withColumn(
        "cum_purchases", F.sum("purchases").over(wc).cast("long")
    )
    j = cum.join(sizes, F.col("cohort") == F.col("scohort"))
    return j.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
        "age_w",
        "purchases",
        "cum_purchases",
        "n_users",
        (
            F.col("cum_purchases").cast("double")
            / F.col("n_users").cast("double")
        ).alias("ltv_per_user"),
    )


# ---------------------------------------------------------------------------
# Longest activity streaks (r9): consecutive-active-day runs per user
# via the day-minus-dense-rank islands trick on DISTINCT active days —
# one user-keyed window pass, exact integer day arithmetic. Output:
# per user the longest and current streak and the island count — the
# engagement metric every product dashboard carries.
# ---------------------------------------------------------------------------
@query(
    "user_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS d
      FROM events
    ),
    isl AS (
      SELECT user_id, d,
             d - row_number() OVER (PARTITION BY user_id ORDER BY d)
               AS grp
      FROM days
    ),
    runs AS (
      SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
             CAST(max(d) AS BIGINT) AS last_d
      FROM isl GROUP BY 1, 2
    ),
    horizon AS (
      SELECT CAST(max(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
        AS hz
      FROM events
    )
    SELECT r.user_id,
           CAST(max(r.len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(coalesce(max(CASE WHEN r.last_d = h.hz THEN r.len END), 0)
                AS BIGINT) AS current_streak
    FROM runs r CROSS JOIN horizon h
    GROUP BY 1
    """,
)
def q_user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest and current consecutive-active-day streaks per user via day-minus-rank islands on distinct active days - one user-keyed pass, exact integer day arithmetic."""
    e = read_table(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.expr(
            "CAST(unix_seconds(date_trunc('day', ts)) AS BIGINT)"
            " div 86400"
        ).alias("d"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "grp", F.col("d") - F.row_number().over(w)
    )
    runs = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.max("d").cast("long").alias("last_d"),
    )
    hz = e.groupBy().agg(
        F.expr(
            "CAST(max(unix_seconds(date_trunc('day', ts))) AS BIGINT)"
            " div 86400"
        ).alias("hz")
    )
    j = runs.crossJoin(F.broadcast(hz))
    return j.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.coalesce(
            F.max(F.when(F.col("last_d") == F.col("hz"), F.col("len"))),
            F.lit(0),
        ).cast("long").alias("current_streak"),
    )


# ---------------------------------------------------------------------------
# New-vs-repeat purchaser mix (r9): per calendar day, how many
# purchasing users are first-timers vs returning — first purchase day
# per user from one aggregate, the daily mix from one more, shares
# exact. The acquisition/retention balance readout.
# ---------------------------------------------------------------------------
@query(
    "new_vs_repeat_mix",
    oracle="""
    WITH p AS (
      SELECT user_id, date_trunc('day', ts) AS d
      FROM events WHERE event_type = 'purchase'
    ),
    firsts AS (
      SELECT user_id, min(d) AS first_d FROM p GROUP BY 1
    ),
    daily AS (
      SELECT DISTINCT p.user_id, p.d, f.first_d
      FROM p JOIN firsts f ON f.user_id = p.user_id
    )
    SELECT CAST(strftime(d, '%Y-%m-%d') AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS purchasers,
           CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(sum(CASE WHEN d <> first_d THEN 1 ELSE 0 END) AS BIGINT)
             AS repeat_users,
           CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS new_share
    FROM daily GROUP BY 1
    """,
)
def q_new_vs_repeat_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-repeat purchaser mix: first purchase day per user from one aggregate, exact daily splits and one share division."""
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    )
    firsts = p.groupBy("user_id").agg(F.min("d").alias("first_d"))
    daily = p.join(firsts, "user_id").select(
        "user_id", "d", "first_d"
    ).distinct()
    return daily.groupBy(
        F.date_format("d", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("purchasers"),
        F.sum(F.when(F.col("d") == F.col("first_d"), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.sum(F.when(F.col("d") != F.col("first_d"), 1).otherwise(0))
        .cast("long")
        .alias("repeat_users"),
        (
            F.sum(
                F.when(F.col("d") == F.col("first_d"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("new_share"),
    )


# ---------------------------------------------------------------------------
# First-touch attribution (r9): the mirror of attribution_last_touch —
# each purchase credits its EARLIEST click/view inside the 1-hour
# lookback. The bounded window join (the time-decay query's shape)
# plus a per-purchase (ts ASC, channel ASC) argmin; '(none)' bucket
# for untouched purchases. Completes the attribution set: first,
# last, U-shaped, time-decay, Markov removal.
# ---------------------------------------------------------------------------
@query(
    "attribution_first_touch",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v4
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts, event_type AS ch FROM events
      WHERE event_type IN ('click', 'view')
    ),
    j AS (
      SELECT p.event_id, p.v4, t.ch, t.ts AS tts,
             row_number() OVER (PARTITION BY p.event_id
               ORDER BY t.ts ASC, t.ch ASC) AS rk
      FROM p JOIN t ON t.user_id = p.user_id
       AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 1 HOUR
    ),
    credit AS (
      SELECT ch, v4 FROM j WHERE rk = 1
    ),
    none_ AS (
      SELECT '(none)' AS ch, p.v4 FROM p
      WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.event_id = p.event_id)
    ),
    allc AS (SELECT * FROM credit UNION ALL SELECT * FROM none_)
    SELECT ch AS channel, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(v4) AS BIGINT) AS value4
    FROM allc GROUP BY 1
    """,
)
def q_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase credits its earliest click/view in the 1-hour lookback (deterministic argmin), '(none)' bucket for untouched purchases - the mirror of last-touch."""
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("pts"),
        (F.col("value").cast("decimal(18,4)") * 10000)
        .cast("long")
        .alias("v4"),
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("ch"),
    )
    j = p.join(
        t,
        (F.col("tu") == F.col("user_id"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")),
    )
    wr = W.partitionBy("event_id").orderBy(
        F.col("tts").asc(), F.col("ch").asc()
    )
    credit = (
        j.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("event_id", "ch", "v4")
    )
    none_ = p.join(
        credit.select(F.col("event_id").alias("ce")),
        F.col("event_id") == F.col("ce"),
        "left_anti",
    ).select(F.lit("(none)").alias("ch"), "v4")
    allc = credit.select("ch", "v4").unionByName(none_)
    return allc.groupBy(F.col("ch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("v4").cast("long").alias("value4"),
    )


# ---------------------------------------------------------------------------
# Multiplicative seasonal indices (r9): the ratio-to-moving-average
# method — each hour's count over its centered 25h MA as an EXACT
# RATIONAL (25·c / Σ25), the hour-of-day index picked as the
# rank-median ratio (ordered by the exact division double with an
# (idx) tie-break, so both engines pick the same element), and the
# indices' mean riding along for normalization. The multiplicative
# twin of the additive seasonal_decompose.
# ---------------------------------------------------------------------------
@query(
    "seasonal_index_table",
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
      SELECT s.hr, coalesce(h.c, 0) AS c,
             CAST(row_number() OVER (ORDER BY s.hr) AS BIGINT) AS i,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM spine s LEFT JOIN h ON h.hr = s.hr
    ),
    ma AS (
      SELECT hr, c, i, n,
             CAST(sum(c) OVER (ORDER BY i
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT)
               AS s25
      FROM dense
    ),
    ratio AS (
      SELECT CAST(hour(hr) AS INT) AS hod,
             CAST(25 * c AS BIGINT) AS num, s25 AS den,
             CAST(25 * c AS DOUBLE) / CAST(s25 AS DOUBLE) AS rv
      FROM ma WHERE i > 12 AND i <= n - 12 AND s25 > 0
    ),
    med AS (
      SELECT hod, num, den, rv FROM (
        SELECT hod, num, den, rv,
               row_number() OVER (PARTITION BY hod
                 ORDER BY rv, num, den) AS rk,
               count(*) OVER (PARTITION BY hod) AS m
        FROM ratio
      ) WHERE rk = (m + 1) // 2
    )
    SELECT hod, num AS med_num, den AS med_den, rv AS seasonal_index
    FROM med
    """,
)
def q_seasonal_index_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative seasonal indices by ratio-to-moving-average: exact 25c/S25 rationals, rank-picked median per hour-of-day with deterministic ordering - the multiplicative twin of the additive decomposition."""
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
        .select("hr", F.coalesce("c", F.lit(0)).alias("c"))
        .withColumn("i", F.row_number().over(wi).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy()))
    )
    wma = W.orderBy("i").rowsBetween(-12, 12)
    ma = dense.withColumn("s25", F.sum("c").over(wma).cast("long"))
    ratio = ma.filter(
        (F.col("i") > 12) & (F.col("i") <= F.col("n") - 12) & (F.col("s25") > 0)
    ).select(
        F.hour("hr").cast("int").alias("hod"),
        (25 * F.col("c")).cast("long").alias("num"),
        F.col("s25").alias("den"),
        ((25 * F.col("c")).cast("double") / F.col("s25").cast("double")).alias(
            "rv"
        ),
    )
    wm = W.partitionBy("hod").orderBy("rv", "num", "den")
    med = (
        ratio.withColumn("rk", F.row_number().over(wm))
        .withColumn("m", F.count(F.lit(1)).over(W.partitionBy("hod")))
        .filter(F.expr("rk = (m + 1) div 2"))
    )
    return med.select(
        "hod",
        F.col("num").alias("med_num"),
        F.col("den").alias("med_den"),
        F.col("rv").alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# Peak-hour profile (r9): per event type the hour-of-day with the
# highest total count (deterministic argmax), plus the exact
# peak-to-trough ratio decided by integer cross products — the
# capacity-planning one-liner on hour-of-day phase sums (never the
# raw spine).
# ---------------------------------------------------------------------------
@query(
    "peak_hour_profile",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(hour(ts) AS INT) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    pk AS (
      SELECT event_type, hod AS peak_hod, n AS peak_n FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
          ORDER BY n DESC, hod ASC) AS rk
        FROM c
      ) WHERE rk = 1
    ),
    tr AS (
      SELECT event_type, hod AS trough_hod, n AS trough_n FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
          ORDER BY n ASC, hod ASC) AS rk
        FROM c
      ) WHERE rk = 1
    )
    SELECT p.event_type, p.peak_hod, p.peak_n, t.trough_hod, t.trough_n,
           CAST(p.peak_n AS DOUBLE) / CAST(t.trough_n AS DOUBLE)
             AS peak_to_trough
    FROM pk p JOIN tr t ON t.event_type = p.event_type
    """,
)
def q_peak_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type peak and trough hour-of-day with deterministic argmax/argmin and the exact peak-to-trough ratio - capacity planning on 24-row phase sums."""
    e = read_table(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wpk = W.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("hod").asc()
    )
    wtr = W.partitionBy("event_type").orderBy(
        F.col("n").asc(), F.col("hod").asc()
    )
    pk = (
        c.withColumn("rk", F.row_number().over(wpk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("hod").alias("peak_hod"),
            F.col("n").alias("peak_n"),
        )
    )
    tr = (
        c.withColumn("rk", F.row_number().over(wtr))
        .filter(F.col("rk") == 1)
        .select(
            F.col("event_type").alias("et2"),
            F.col("hod").alias("trough_hod"),
            F.col("n").alias("trough_n"),
        )
    )
    return pk.join(tr, F.col("event_type") == F.col("et2")).select(
        "event_type",
        "peak_hod",
        "peak_n",
        "trough_hod",
        "trough_n",
        (F.col("peak_n").cast("double") / F.col("trough_n").cast("double")).alias(
            "peak_to_trough"
        ),
    )


# ---------------------------------------------------------------------------
# D1/D7/D28 retention (r9): per first-seen cohort day, the share of
# users active again EXACTLY at each offset — the growth-accounting
# standard. First-seen from one aggregate; the offset checks are one
# semi-join per literal offset against the distinct (user, day)
# presence table; shares are single divisions.
# ---------------------------------------------------------------------------
@query(
    "retention_d1_d7_d28",
    oracle="""
    WITH pres AS (
      SELECT DISTINCT user_id,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS d
      FROM events
    ),
    firsts AS (
      SELECT user_id, CAST(min(d) AS BIGINT) AS d0 FROM pres GROUP BY 1
    ),
    j AS (
      SELECT f.d0, f.user_id,
             max(CASE WHEN p.d = f.d0 + 1 THEN 1 ELSE 0 END) AS r1,
             max(CASE WHEN p.d = f.d0 + 7 THEN 1 ELSE 0 END) AS r7,
             max(CASE WHEN p.d = f.d0 + 28 THEN 1 ELSE 0 END) AS r28
      FROM firsts f JOIN pres p ON p.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT d0 AS cohort_day, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(r1) AS BIGINT) AS d1,
           CAST(sum(r7) AS BIGINT) AS d7,
           CAST(sum(r28) AS BIGINT) AS d28,
           CAST(sum(r1) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS d1_rate,
           CAST(sum(r7) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS d7_rate,
           CAST(sum(r28) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS d28_rate
    FROM j GROUP BY 1
    """,
)
def q_retention_d1_d7_d28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic D1/D7/D28 retention per first-seen cohort day: exact presence checks at literal offsets, one division per rate."""
    e = read_table(spark, sf_dir, "events")
    pres = e.select(
        "user_id",
        F.expr(
            "CAST(unix_seconds(date_trunc('day', ts)) AS BIGINT)"
            " div 86400"
        ).alias("d"),
    ).distinct()
    firsts = pres.groupBy("user_id").agg(
        F.min("d").cast("long").alias("d0")
    )
    j = (
        firsts.join(
            pres.withColumnRenamed("user_id", "pu"),
            F.col("pu") == F.col("user_id"),
        )
        .groupBy("d0", "user_id")
        .agg(
            F.max(
                F.when(F.col("d") == F.col("d0") + 1, 1).otherwise(0)
            ).alias("r1"),
            F.max(
                F.when(F.col("d") == F.col("d0") + 7, 1).otherwise(0)
            ).alias("r7"),
            F.max(
                F.when(F.col("d") == F.col("d0") + 28, 1).otherwise(0)
            ).alias("r28"),
        )
    )
    return j.groupBy(F.col("d0").alias("cohort_day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("r1").cast("long").alias("d1"),
        F.sum("r7").cast("long").alias("d7"),
        F.sum("r28").cast("long").alias("d28"),
        (F.sum("r1").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "d1_rate"
        ),
        (F.sum("r7").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "d7_rate"
        ),
        (F.sum("r28").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "d28_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Viterbi HMM decode of per-user daily activity (r12): a 2-state
# (idle/active) HMM over each user's 24-bit hour-of-day activity
# vector, decoded in EXACT max-plus integer arithmetic — emission and
# transition scores are integer decibans, the per-state best score
# AND its full traceback ride the fold state (the path is a packed
# bit field, one bit per hour, built by shifting in the winning
# predecessor's bits), ties broken toward state 0 in both engines.
# The fourth member of the nested-fold family, and the only one that
# is PER-ROW parallel: one fold per user row, no shuffle after the
# (user, hour) aggregate — a billion users decode embarrassingly
# parallel. Switch count is one XOR + bit_count on the packed path.
# ---------------------------------------------------------------------------
@query(
    "viterbi_user_state_path",
    oracle="""
    WITH a AS (
      SELECT user_id, CAST(hour(ts) AS BIGINT) AS h
      FROM events GROUP BY 1, 2
    ),
    ax AS (
      SELECT u.user_id,
             list_transform(range(0, 24), h ->
               CASE WHEN list_contains(u.hs, h) THEN CAST(1 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END) AS o
      FROM (SELECT user_id, list(h) AS hs FROM a GROUP BY 1) u
    ),
    st AS (
      SELECT user_id, o, list_reduce(
        list_prepend(
          [0 + CASE o[1] WHEN 0 THEN 2 ELSE -3 END, CAST(0 AS BIGINT),
           -1 + CASE o[1] WHEN 0 THEN -2 ELSE 1 END, CAST(1 AS BIGINT)],
          list_transform(o[2:], x -> [x])),
        (acc, xx) -> [
          greatest(acc[1] + 1, acc[3] + -2)
            + CASE xx[1] WHEN 0 THEN 2 ELSE -3 END,
          CASE WHEN acc[1] + 1 >= acc[3] + -2 THEN (acc[2] << 1) | 0
               ELSE (acc[4] << 1) | 0 END,
          greatest(acc[1] + -2, acc[3] + 1)
            + CASE xx[1] WHEN 0 THEN -2 ELSE 1 END,
          CASE WHEN acc[1] + -2 >= acc[3] + 1 THEN (acc[2] << 1) | 1
               ELSE (acc[4] << 1) | 1 END
        ]
      ) AS st FROM ax
    )
    SELECT user_id,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), o),
                            (x, y) -> x + y) AS BIGINT) AS n_active,
           CAST(CASE WHEN st[1] >= st[3] THEN st[1] ELSE st[3] END
                AS BIGINT) AS score,
           CAST(CASE WHEN st[1] >= st[3] THEN st[2] ELSE st[4] END
                AS BIGINT) AS path_bits,
           CAST(CASE WHEN st[1] >= st[3] THEN 0 ELSE 1 END AS INT)
             AS best_state,
           CAST(bit_count(
             xor((CASE WHEN st[1] >= st[3] THEN st[2] ELSE st[4] END),
                 ((CASE WHEN st[1] >= st[3] THEN st[2] ELSE st[4] END)
                  >> 1)) & 8388607) AS INT) AS switches
    FROM st
    """,
)
def q_viterbi_user_state_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi decode of a 2-state idle/active HMM over each user's 24-hour activity vector - exact max-plus integer scores, full traceback as packed path bits inside the fold state, per-user parallel (no shuffle after the (user, hour) aggregate)."""
    e = read_table(spark, sf_dir, "events")
    a = e.groupBy("user_id", F.hour("ts").cast("long").alias("h")).agg(
        F.lit(1)
    )
    ax = a.groupBy("user_id").agg(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(23).cast("long")),
            lambda h: F.when(
                F.array_contains(F.collect_list(F.col("h")), h),
                F.lit(1).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ).alias("o")
    )
    o = F.col("o")

    def em(state, x):
        if state == 0:
            return F.when(x == 0, F.lit(2)).otherwise(F.lit(-3)).cast("long")
        return F.when(x == 0, F.lit(-2)).otherwise(F.lit(1)).cast("long")

    def step(acc, xx):
        s0, p0 = F.element_at(acc, 1), F.element_at(acc, 2)
        s1, p1 = F.element_at(acc, 3), F.element_at(acc, 4)
        c00, c10 = s0 + 1, s1 + (-2)
        c01, c11 = s0 + (-2), s1 + 1
        return F.array(
            F.greatest(c00, c10) + em(0, xx),
            F.when(c00 >= c10, F.shiftleft(p0, 1)).otherwise(
                F.shiftleft(p1, 1)
            ),
            F.greatest(c01, c11) + em(1, xx),
            F.when(c01 >= c11, F.shiftleft(p0, 1) + 1).otherwise(
                F.shiftleft(p1, 1) + 1
            ),
        )

    x1 = F.element_at(o, 1)
    init = F.array(
        F.lit(0).cast("long") + em(0, x1),
        F.lit(0).cast("long"),
        F.lit(-1).cast("long") + em(1, x1),
        F.lit(1).cast("long"),
    )
    st = F.aggregate(F.slice(o, 2, 23), init, step)
    d = ax.select("user_id", o.alias("o"), st.alias("st"))
    s0, p0 = F.element_at("st", 1), F.element_at("st", 2)
    s1, p1 = F.element_at("st", 3), F.element_at("st", 4)
    best = F.when(s0 >= s1, s0).otherwise(s1)
    path = F.when(s0 >= s1, p0).otherwise(p1)
    return d.select(
        "user_id",
        F.aggregate(
            o, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("n_active"),
        best.cast("long").alias("score"),
        path.cast("long").alias("path_bits"),
        F.when(s0 >= s1, 0).otherwise(1).cast("int").alias("best_state"),
        F.bit_count(
            F.shiftright(path, 1)
            .bitwiseXOR(path)
            .bitwiseAND(F.lit(8388607).cast("long"))
        ).cast("int").alias("switches"),
    )


# ---------------------------------------------------------------------------
# Lead-lag cross-correlation (r13): does click activity LEAD purchase
# activity, and by how many hours? CCF between the two dense hourly
# series at lags −3..+3 — exact integer moments per lag over the
# overlap window (7 lag copies of a ≤744-row spine, all bounded), one
# fixed-order double per lag, zero-variance lags NULL in both
# engines, and the peak lag flagged by a 7-row window with a
# deterministic tiebreak. The companion of seasonality_lag24 (ACF)
# for CROSS-series structure — the lead-lag readout behind
# "clicks precede purchases by N hours" dashboards.
# ---------------------------------------------------------------------------
@query(
    "lead_lag_ccf",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS c
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY ALL
    ),
    bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
    grid AS (
      SELECT g.hr FROM bounds b,
      LATERAL (SELECT unnest(generate_series(b.lo, b.hi,
                             INTERVAL 1 HOUR)) AS hr) g
    ),
    xs AS (
      SELECT g.hr, COALESCE(h.c, 0) AS c FROM grid g
      LEFT JOIN h ON h.event_type = 'click' AND h.hr = g.hr
    ),
    ys AS (
      SELECT g.hr, COALESCE(h.c, 0) AS c FROM grid g
      LEFT JOIN h ON h.event_type = 'purchase' AND h.hr = g.hr
    ),
    lags(lag) AS (VALUES (-3), (-2), (-1), (0), (1), (2), (3)),
    paired AS (
      SELECT l.lag, x.c AS x, y.c AS y
      FROM lags l
      JOIN xs x ON true
      JOIN ys y ON y.hr = x.hr + l.lag * INTERVAL 1 HOUR
    ),
    m AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM paired GROUP BY 1
    ),
    r AS (
      SELECT CAST(lag AS INT) AS lag, n,
             CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
             THEN CAST(floor(
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
               * 1000000 + 0.5) AS BIGINT)
             END AS ccf_micros
      FROM m
    )
    SELECT lag, n, ccf_micros,
           CAST(CASE WHEN row_number() OVER
             (ORDER BY abs(coalesce(ccf_micros, -2000000)) DESC, lag) = 1
           THEN 1 ELSE 0 END AS INT) AS is_peak
    FROM r
    """,
)
def q_lead_lag_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of dense hourly click vs purchase counts at lags -3..+3 - exact integer moments per lag over the shared spine, one fixed-order double per lag (zero-variance lags NULL in both engines), peak lag flagged with a deterministic tiebreak."""
    e = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    h = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    b = h.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = b.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    ).localCheckpoint(eager=False)
    xs = grid.join(
        h.filter(F.col("event_type") == "click").select("hr", "c"),
        "hr",
        "left",
    ).select("hr", F.coalesce("c", F.lit(0)).alias("x"))
    ys = grid.join(
        h.filter(F.col("event_type") == "purchase").select("hr", "c"),
        "hr",
        "left",
    ).select(F.col("hr").alias("yhr"), F.coalesce("c", F.lit(0)).alias("y"))
    lags = spark.createDataFrame([(l,) for l in range(-3, 4)], "lag int")
    paired = (
        xs.crossJoin(F.broadcast(lags))
        .join(
            ys,
            F.col("yhr")
            == F.col("hr") + F.col("lag") * F.expr("INTERVAL 1 HOUR"),
        )
    )
    m = paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    rho = F.floor(
        (
            F.col("n").cast("double") * F.col("sxy")
            - F.col("sx").cast("double") * F.col("sy")
        )
        / (
            F.sqrt(
                F.col("n").cast("double") * F.col("sxx")
                - F.col("sx").cast("double") * F.col("sx")
            )
            * F.sqrt(
                F.col("n").cast("double") * F.col("syy")
                - F.col("sy").cast("double") * F.col("sy")
            )
        )
        * 1000000
        + 0.5
    ).cast("long")
    r = m.select(
        F.col("lag").cast("int").alias("lag"),
        "n",
        F.when((vx > 0) & (vy > 0), rho).alias("ccf_micros"),
    )
    wp = W.orderBy(
        F.abs(F.coalesce(F.col("ccf_micros"), F.lit(-2000000))).desc(),
        F.col("lag"),
    )
    return r.select(
        "lag",
        "n",
        "ccf_micros",
        F.when(F.row_number().over(wp) == 1, 1)
        .otherwise(0)
        .cast("int")
        .alias("is_peak"),
    )
