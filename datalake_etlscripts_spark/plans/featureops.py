"""Feature-engineering query plans (r7): target encoding, the hashing
trick, log-template mining, the mergeable moments sketch, seasonal
decomposition, EWMA anomaly flags, the A/B DiD readout, and item-item
co-occurrence similarity. Beyond-reference LLM/training-pipeline
surface (the reference has no feature layer); every entry is
oracle-backed under the house float-determinism policy."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.operators import features
from datalake_etlscripts_spark.plans.registry import MAX_BASKET, ddb_hex32, query

_D = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"


def _d(x: str) -> str:
    return _D.format(x=x)


# ---------------------------------------------------------------------------
# Leave-one-out target encoding — orders priority vs finished status.
# ---------------------------------------------------------------------------
@query(
    "target_encode_loo",
    oracle=f"""
    WITH f AS (
      SELECT o_orderkey AS id, o_orderpriority AS cat,
             CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS HUGEINT)
               AS y
      FROM orders
    ),
    c AS (
      SELECT cat, CAST(count(*) AS HUGEINT) AS n_c, sum(y) AS s_c
      FROM f GROUP BY 1
    ),
    g AS (SELECT CAST(count(*) AS HUGEINT) AS n_g, sum(y) AS s_g FROM f)
    SELECT f.id, f.cat, CAST(f.y AS BIGINT) AS y_int,
           CASE WHEN c.n_c - 1 <> 0 THEN
             {_d('c.s_c - f.y')} / {_d('c.n_c - 1')} END AS loo_encode,
           {_d('(c.s_c - f.y) * g.n_g + 20 * g.s_g')}
             / {_d('(c.n_c - 1 + 20) * g.n_g')} AS smoothed_encode
    FROM f JOIN c USING (cat) CROSS JOIN g
    """,
)
def q_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free leave-one-out target encoding of order priority against finished status, with m=20 shrinkage toward the global prior - exact DECIMAL sums, one integer division per output."""
    o = read_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    return features.target_encode_loo(
        base, "o_orderkey", "o_orderpriority", "y", smoothing=20
    )


# ---------------------------------------------------------------------------
# Hashing-trick feature vectors over documents.
# ---------------------------------------------------------------------------
@query(
    "feature_hash_vectors",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      FROM documents
    ),
    h AS (SELECT id, {ddb_hex32("md5(tok)")} AS lane FROM toks)
    SELECT id, CAST(lane % 64 AS BIGINT) AS bucket,
           CAST(sum(CASE WHEN (lane // 64) % 2 = 0 THEN 1 ELSE -1 END)
                AS BIGINT) AS feat,
           CAST(count(*) AS BIGINT) AS n_tok
    FROM h GROUP BY 1, 2
    """,
)
def q_feature_hash_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick sparse feature vectors: tokens land in md5-lane buckets with a sign bit, no vocabulary built and no dictionary shuffle - one explode plus one keyed groupBy."""
    d = read_table(spark, sf_dir, "documents")
    out = features.feature_hash_vectors(d, "doc_id", "text", n_buckets=64)
    return out.withColumn("bucket", F.col("bucket").cast("long"))


# ---------------------------------------------------------------------------
# Log-template mining over synthesized event log lines.
# ---------------------------------------------------------------------------
@query(
    "log_template_mining",
    oracle="""
    WITH lines AS (
      SELECT event_type || ' user ' || user_id || ' k '
             || json_extract_string(props, '$.k') || ' v '
             || CAST(CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS BIGINT)
                     AS VARCHAR) AS line
      FROM events
    ),
    t AS (
      SELECT list_filter(string_split(line, ' '), x -> x <> '') AS toks
      FROM lines
    ),
    g AS (SELECT toks, len(toks) AS n_tokens, toks[1] AS t1 FROM t),
    gc AS (
      SELECT n_tokens, t1, CAST(count(*) AS BIGINT) AS n_lines
      FROM g GROUP BY 1, 2
    ),
    ps AS (
      SELECT unnest(generate_series(1, (SELECT max(n_tokens) FROM g))) AS pos
    ),
    px AS (
      SELECT g.n_tokens, g.t1, ps.pos, g.toks[ps.pos] AS tok
      FROM g, ps WHERE ps.pos <= g.n_tokens
    ),
    sl AS (
      SELECT n_tokens, t1, pos,
             CASE WHEN count(DISTINCT tok) > 1 THEN '<*>' ELSE min(tok) END
               AS piece
      FROM px GROUP BY 1, 2, 3
    ),
    tp AS (
      SELECT n_tokens, t1, string_agg(piece, ' ' ORDER BY pos) AS template,
             CAST(sum(CASE WHEN piece = '<*>' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_wild
      FROM sl GROUP BY 1, 2
    )
    SELECT tp.template, CAST(tp.n_tokens AS INT) AS n_tokens, tp.n_wild,
           gc.n_lines
    FROM tp JOIN gc USING (n_tokens, t1)
    """,
)
def q_log_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain-lite relational log-template mining: lines grouped by (token count, first token), positions with >1 distinct value become wildcard slots, templates reassembled position-ordered with support counts."""
    e = read_table(spark, sf_dir, "events")
    cents = (
        (F.col("value").cast("decimal(12,4)") * 10000)
        .cast("bigint")
        .cast("string")
    )
    lines = e.select(
        F.concat_ws(
            " ",
            F.col("event_type"),
            F.lit("user"),
            F.col("user_id"),
            F.lit("k"),
            F.get_json_object("props", "$.k"),
            F.lit("v"),
            cents,
        ).alias("line")
    )
    return features.template_mine(lines, "line")


# ---------------------------------------------------------------------------
# Mergeable moments sketch over documents.n_chars by source.
# ---------------------------------------------------------------------------
@query(
    "moments_sketch_merge",
    oracle=f"""
    WITH b AS (
      SELECT source AS key, CAST(n_chars AS HUGEINT) AS x FROM documents
    ),
    st AS (
      SELECT key, CAST(count(*) AS HUGEINT) AS n, sum(x) AS s1,
             sum(x * x) AS s2, sum(x * x * x) AS s3,
             sum(x * x * x * x) AS s4
      FROM b GROUP BY 1
    ),
    u AS (
      SELECT * FROM st
      UNION ALL
      SELECT '__total__', sum(n), sum(s1), sum(s2), sum(s3), sum(s4) FROM st
    )
    SELECT key, CAST(n AS BIGINT) AS n,
           {_d('s1')} AS s1, {_d('s2')} AS s2, {_d('s3')} AS s3,
           {_d('s4')} AS s4,
           {_d('s1')} / {_d('n')} AS mean,
           {_d('n * s2 - s1 * s1')} / {_d('n * n')} AS variance
    FROM u
    """,
)
def q_moments_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable moments sketch per source plus a __total__ row built by ADDING the per-source states (facts never rescanned) - exact DECIMAL power sums, mean and variance as single integer divisions."""
    d = read_table(spark, sf_dir, "documents")
    return features.moments_state_merge(d, "source", "n_chars")


# ---------------------------------------------------------------------------
# Seasonal decomposition of the hourly event-count series.
# ---------------------------------------------------------------------------
@query(
    "seasonal_decompose",
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
    w AS (
      SELECT k, h, c, sum(c) OVER win AS s, count(*) OVER win AS wn
      FROM g
      WINDOW win AS (PARTITION BY k ORDER BY h
                     ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    d AS (
      SELECT k, h, c,
             CASE WHEN wn = 25 THEN CAST(s AS BIGINT) END AS s25,
             CASE WHEN wn = 25 THEN CAST(25 * c - s AS BIGINT) END AS dev25
      FROM w
    ),
    se AS (
      SELECT k, extract(hour FROM h) AS hod,
             CAST(sum(dev25) AS BIGINT) AS sn,
             CAST(25 * count(*) AS BIGINT) AS sd
      FROM d WHERE dev25 IS NOT NULL GROUP BY 1, 2
    )
    SELECT d.k AS event_type, d.h AS hour, d.c AS y,
           CAST(d.s25 AS DOUBLE) / CAST(25 AS DOUBLE) AS trend,
           CASE WHEN d.s25 IS NOT NULL THEN
             CAST(se.sn AS DOUBLE) / CAST(se.sd AS DOUBLE) END AS seasonal,
           CASE WHEN d.s25 IS NOT NULL THEN
             CAST(d.c AS DOUBLE) - CAST(d.s25 AS DOUBLE) / CAST(25 AS DOUBLE)
               - CAST(se.sn AS DOUBLE) / CAST(se.sd AS DOUBLE) END AS residual
    FROM d LEFT JOIN se
      ON se.k = d.k AND se.hod = extract(hour FROM d.h)
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition y = trend + seasonal + residual per event type: centered 25h moving average, hour-of-day means of the 25x-scaled INTEGER detrended series, three exact end divisions."""
    e = read_table(spark, sf_dir, "events")
    out = features.seasonal_decompose_hourly(e)
    return out.select("event_type", "hour", "y", "trend", "seasonal", "residual")


# ---------------------------------------------------------------------------
# Truncated-EWMA anomaly flags on the hourly series.
# ---------------------------------------------------------------------------
_EWMA_W = [3 ** (i - 1) * 4 ** (8 - i) for i in range(1, 9)]
_EWMA_NUM = " + ".join(
    f"COALESCE({w} * c{i}, 0)" for i, w in enumerate(_EWMA_W, start=1)
)
_EWMA_DEN = " + ".join(
    f"(CASE WHEN c{i} IS NOT NULL THEN {w} ELSE 0 END)"
    for i, w in enumerate(_EWMA_W, start=1)
)
_EWMA_LAGS = ",\n             ".join(
    f"lag(c, {i}) OVER win AS c{i}" for i in range(1, 9)
)


@query(
    "ewma_anomaly",
    oracle=f"""
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
             {_EWMA_LAGS}
      FROM g WINDOW win AS (PARTITION BY k ORDER BY h)
    ),
    e AS (
      SELECT k, h, c,
             CAST({_EWMA_NUM} AS BIGINT) AS num,
             CAST({_EWMA_DEN} AS BIGINT) AS den
      FROM l
    )
    SELECT k AS event_type, h AS hour, c AS y,
           CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
             END AS ewma_pred,
           CASE WHEN den > 0 THEN c * den > 3 * num END AS spike
    FROM e
    """,
)
def q_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EWMA forecast over the last 8 past hours with denominator-cleared integer weights 3^(i-1)*4^(8-i); spike flag y > 3*pred decided by integer cross-multiplication, never a float compare."""
    e = read_table(spark, sf_dir, "events")
    return features.ewma_anomaly_hourly(e)


# ---------------------------------------------------------------------------
# A/B diff-in-differences readout with SRM guard.
# ---------------------------------------------------------------------------
@query(
    "experiment_did",
    oracle=f"""
    WITH f AS (
      SELECT user_id, ts,
             ({ddb_hex32("md5(CAST(user_id AS VARCHAR))")} % 2 = 1) AS treat,
             (ts >= TIMESTAMP '2024-01-16 00:00:00') AS post,
             CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                  AS BIGINT) AS y
      FROM events
    ),
    a AS (
      SELECT
        CAST(sum(CASE WHEN NOT treat AND NOT post THEN y ELSE 0 END)
             AS BIGINT) AS s00,
        CAST(sum(CASE WHEN NOT treat AND NOT post THEN 1 ELSE 0 END)
             AS BIGINT) AS n00,
        CAST(sum(CASE WHEN NOT treat AND post THEN y ELSE 0 END)
             AS BIGINT) AS s01,
        CAST(sum(CASE WHEN NOT treat AND post THEN 1 ELSE 0 END)
             AS BIGINT) AS n01,
        CAST(sum(CASE WHEN treat AND NOT post THEN y ELSE 0 END)
             AS BIGINT) AS s10,
        CAST(sum(CASE WHEN treat AND NOT post THEN 1 ELSE 0 END)
             AS BIGINT) AS n10,
        CAST(sum(CASE WHEN treat AND post THEN y ELSE 0 END)
             AS BIGINT) AS s11,
        CAST(sum(CASE WHEN treat AND post THEN 1 ELSE 0 END)
             AS BIGINT) AS n11,
        CAST(count(DISTINCT CASE WHEN treat THEN user_id END) AS BIGINT)
          AS users_treat,
        CAST(count(DISTINCT CASE WHEN NOT treat THEN user_id END) AS BIGINT)
          AS users_ctrl
      FROM f
    )
    SELECT users_treat, users_ctrl,
           CAST((users_treat - users_ctrl) * (users_treat - users_ctrl)
                AS DOUBLE)
             / CAST(users_treat + users_ctrl AS DOUBLE) AS srm_chi2,
           CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) AS m_ctrl_pre,
           CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) AS m_ctrl_post,
           CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) AS m_treat_pre,
           CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) AS m_treat_post,
           (CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
              - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))
             - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
                  - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)) AS did
    FROM a
    """,
)
def q_experiment_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan A/B readout: md5-lane arm assignment, pre/post split, difference-in-differences over four exact cell means, and the sample-ratio-mismatch chi-square guard on distinct user counts."""
    e = read_table(spark, sf_dir, "events")
    return features.experiment_did(e)


# ---------------------------------------------------------------------------
# Item-item co-occurrence similarity over order baskets.
# ---------------------------------------------------------------------------
@query(
    "item_item_cf",
    oracle=f"""
    WITH oi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    sz AS (SELECT b, count(*) AS bs FROM oi GROUP BY 1),
    oif AS (SELECT oi.b, oi.i FROM oi JOIN sz USING (b) WHERE sz.bs <= __MAX_BASKET__),
    ni AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM oif GROUP BY 1),
    p AS (
      SELECT a.i AS ia, b2.i AS ib, CAST(count(*) AS BIGINT) AS cooc
      FROM oif a JOIN oif b2 ON a.b = b2.b AND a.i < b2.i GROUP BY 1, 2
    ),
    s AS (
      SELECT ia, ib, cooc FROM p
      UNION ALL
      SELECT ib, ia, cooc FROM p
    ),
    sc AS (
      SELECT s.ia, s.ib, s.cooc, na.n AS n_a, nb.n AS n_b,
             {_d('CAST(s.cooc AS HUGEINT) * s.cooc')}
               / {_d('CAST(na.n AS HUGEINT) * nb.n')} AS cosine_sq
      FROM s JOIN ni na ON na.i = s.ia JOIN ni nb ON nb.i = s.ib
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY ia
                                   ORDER BY cosine_sq DESC, ib) AS rnk
      FROM sc
    )
    SELECT ia AS item, ib AS neighbor, cooc, n_a, n_b, cosine_sq,
           CAST(rnk AS INT) AS rnk
    FROM r WHERE rnk <= 3
    """,
)
def q_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering from order-basket co-occurrence: cosine-squared ranking as one exact integer division per pair, mega-baskets capped at 64 items to bound the pair blowup, top-3 neighbors per part."""
    li = read_table(spark, sf_dir, "lineitem")
    return features.item_item_topk(
        li, "l_orderkey", "l_partkey", k=3, max_basket=MAX_BASKET
    )


# ---------------------------------------------------------------------------
# Quantile normalization across languages (r7): every language's
# n_chars distribution is mapped onto the pooled distribution by rank,
# so one global threshold means the same thing in every language.
# Integer index arithmetic; ranks from the distributed sort-rank plan.
# ---------------------------------------------------------------------------
@query(
    "quantile_normalize",
    oracle="""
    WITH b AS (SELECT doc_id, lang, n_chars FROM documents),
    g AS (
      SELECT doc_id, lang, n_chars,
             CAST(row_number() OVER (PARTITION BY lang
                                     ORDER BY n_chars, doc_id) AS BIGINT) AS r,
             CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS ng
      FROM b
    ),
    p AS (
      SELECT n_chars AS ref,
             CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
               AS idx
      FROM b
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM b)
    SELECT g.doc_id, g.lang, g.n_chars, p.ref AS qn_n_chars
    FROM g CROSS JOIN n
    JOIN p ON p.idx = (g.r * n.nn + g.ng - 1) // g.ng
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-language length distributions onto the pooled distribution: within-group rank mapped to the pooled value at ceil(r*N/n_g) - exact integer index arithmetic, distributed sort-rank windows, one equi-join lookup."""
    d = read_table(spark, sf_dir, "documents")
    return features.quantile_normalize(d, "lang", "n_chars", "doc_id")


# ---------------------------------------------------------------------------
# Item-item CF acceptance metric (r7): hit-rate@3 of the co-occurrence
# recommender under a leave-one-out basket split — the third
# acceptance-metric twin beside ann_recall_mrr and dedup_lsh_recall.
# Train/test split on the shared md5 lane; each test basket holds out
# its max item and asks whether any remaining item's top-3 neighbor
# list recovers it.
# ---------------------------------------------------------------------------
_ITEMCF_EVAL_ORACLE = f"""
    WITH lo AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    split AS (
      SELECT b, i,
             ({ddb_hex32("md5(CAST(b AS VARCHAR))")} % 5 = 0) AS is_test
      FROM lo
    ),
    oi AS (SELECT b, i FROM split WHERE NOT is_test),
    sz AS (SELECT b, count(*) AS bs FROM oi GROUP BY 1),
    oif AS (SELECT oi.b, oi.i FROM oi JOIN sz USING (b) WHERE sz.bs <= __MAX_BASKET__),
    ni AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM oif GROUP BY 1),
    pr AS (
      SELECT a.i AS ia, b2.i AS ib, CAST(count(*) AS BIGINT) AS cooc
      FROM oif a JOIN oif b2 ON a.b = b2.b AND a.i < b2.i GROUP BY 1, 2
    ),
    s AS (
      SELECT ia, ib, cooc FROM pr
      UNION ALL SELECT ib, ia, cooc FROM pr
    ),
    sc AS (
      SELECT s.ia, s.ib,
             CAST(CAST(CAST(s.cooc AS HUGEINT) * s.cooc AS VARCHAR) AS DOUBLE)
               / CAST(CAST(CAST(na.n AS HUGEINT) * nb.n AS VARCHAR) AS DOUBLE)
               AS cosine_sq
      FROM s JOIN ni na ON na.i = s.ia JOIN ni nb ON nb.i = s.ib
    ),
    nb3 AS (
      SELECT ia, ib FROM (
        SELECT ia, ib, row_number() OVER (PARTITION BY ia
                         ORDER BY cosine_sq DESC, ib) AS rnk
        FROM sc
      ) WHERE rnk <= 3
    ),
    tb AS (SELECT b, i FROM split WHERE is_test),
    tsz AS (SELECT b, count(*) AS n FROM tb GROUP BY 1 HAVING count(*) >= 2),
    held AS (SELECT tb.b, max(tb.i) AS held FROM tb JOIN tsz USING (b) GROUP BY 1),
    ctx AS (
      SELECT tb.b, tb.i, h.held FROM tb JOIN held h USING (b)
      WHERE tb.i <> h.held
    ),
    hits AS (
      SELECT DISTINCT c.b FROM ctx c JOIN nb3 ON nb3.ia = c.i
      WHERE nb3.ib = c.held
    )
    SELECT CAST((SELECT count(*) FROM tsz) AS BIGINT) AS n_test_baskets,
           CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
           CAST((SELECT count(*) FROM hits) AS DOUBLE)
             / CAST((SELECT count(*) FROM tsz) AS DOUBLE) AS hitrate
"""


@query("itemcf_hitrate", oracle=_ITEMCF_EVAL_ORACLE)
def q_itemcf_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance metric for the co-occurrence recommender: leave-one-out hit-rate@3 over md5-split held-out baskets - did any remaining item's top-3 neighbor list recover the held-out item."""
    from datalake_etlscripts_spark.functions.scalar import md5_hash32

    li = read_table(spark, sf_dir, "lineitem")
    # settle the distinct (order, item) base: train feeds the whole
    # recommender build (several consumers) and test feeds three
    # branches — without the cut each re-runs the scan + distinct
    # (guide §2.4). Lazy.
    lo = li.select(
        F.col("l_orderkey").alias("b"), F.col("l_partkey").alias("i")
    ).distinct().localCheckpoint(eager=False)
    is_test = md5_hash32(F.col("b").cast("string")) % 5 == 0
    train = lo.filter(~is_test)
    test = lo.filter(is_test)
    nb3 = features.item_item_topk(train, "b", "i", k=3, max_basket=MAX_BASKET).select(
        F.col("item").alias("ia"), F.col("neighbor").alias("ib")
    )
    tsz = test.groupBy("b").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") >= 2
    )
    held = (
        test.join(tsz.select("b"), "b")
        .groupBy("b")
        .agg(F.max("i").alias("held"))
    )
    ctx = test.join(held, "b").filter(F.col("i") != F.col("held"))
    hits = (
        ctx.join(nb3, ctx["i"] == nb3["ia"])
        .filter(F.col("ib") == F.col("held"))
        .select("b")
        .distinct()
    )
    n_test = tsz.agg(F.count(F.lit(1)).cast("long").alias("n_test_baskets"))
    n_hits = hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    return (
        n_test.crossJoin(n_hits)
        .select(
            "n_test_baskets",
            "n_hits",
            (
                F.col("n_hits").cast("double")
                / F.col("n_test_baskets").cast("double")
            ).alias("hitrate"),
        )
    )


# ---------------------------------------------------------------------------
# Robust trend twins of ols_trend_by_lang (r7): Mann-Kendall sign
# statistic + Theil-Sen median slope over the hourly spine — exact
# integers until one division each.
# ---------------------------------------------------------------------------
_SPINE_SQL = """
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
    )"""


@query(
    "mann_kendall_trend",
    oracle=_SPINE_SQL
    + """,
    p AS (
      SELECT a.k,
             CAST(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1
                  ELSE 0 END AS BIGINT) AS sgn
      FROM g a JOIN g b ON a.k = b.k AND a.h < b.h
    ),
    s AS (SELECT k, CAST(sum(sgn) AS BIGINT) AS s_stat FROM p GROUP BY 1),
    n AS (SELECT k, CAST(count(*) AS BIGINT) AS n_hours FROM g GROUP BY 1)
    SELECT n.k AS event_type, n.n_hours, s.s_stat,
           CAST(s.s_stat AS DOUBLE)
             / CAST(n.n_hours * (n.n_hours - 1) // 2 AS DOUBLE) AS tau_a
    FROM n JOIN s USING (k) WHERE n.n_hours >= 2
    """,
)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test per event type: exact integer sign statistic over all hour pairs of the gap-filled spine, tau-a as the single end division - the outlier-proof twin of the OLS fit."""
    e = read_table(spark, sf_dir, "events")
    return features.mann_kendall(e)


@query(
    "theil_sen_slope",
    oracle=_SPINE_SQL
    + """,
    hx AS (SELECT k, epoch_us(h) // 3600000000 AS x, c FROM g),
    p AS (
      SELECT a.k, b.c - a.c AS dy, b.x - a.x AS dx,
             CAST(b.c - a.c AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM hx a JOIN hx b ON a.k = b.k AND a.x < b.x
    ),
    r AS (
      SELECT k, slope,
             row_number() OVER (PARTITION BY k ORDER BY slope, dy, dx) AS rn,
             count(*) OVER (PARTITION BY k) AS n
      FROM p
    )
    SELECT k AS event_type, CAST(n AS BIGINT) AS n_pairs,
           slope AS slope_per_hour
    FROM r WHERE rn = (n + 1) // 2
    """,
)
def q_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope per event type: lower median of all pairwise exact-rational slopes over the hourly spine, selected by deterministic (slope, dy, dx) order - 29% breakdown point vs OLS's zero."""
    e = read_table(spark, sf_dir, "events")
    return features.theil_sen(e)


# ---------------------------------------------------------------------------
# Concentration metrics (r7): who owns the revenue — Gini from the
# sorted-rank identity + Herfindahl-Hirschman, per customer nation.
# ---------------------------------------------------------------------------
@query(
    "gini_concentration",
    oracle=f"""
    WITH ent AS (
      SELECT c.c_nationkey AS grp, o.o_custkey AS ent,
             CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100
                  AS HUGEINT)) AS HUGEINT) AS x
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT grp, x,
             CAST(row_number() OVER (PARTITION BY grp ORDER BY x, ent)
                  AS HUGEINT) AS i
      FROM ent
    ),
    st AS (
      SELECT grp, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
             sum(i * x) AS six, sum(x * x) AS sxx
      FROM r GROUP BY 1
    )
    SELECT CAST(grp AS BIGINT) AS c_nationkey,
           CAST(n AS BIGINT) AS n_entities,
           {_d('sx')} AS total_amount,
           {_d('2 * six - (n + 1) * sx')} / {_d('n * sx')} AS gini,
           {_d('sxx')} / {_d('sx * sx')} AS hhi
    FROM st
    """,
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per customer nation: Gini from the sorted-rank identity and Herfindahl index, integer cents in DECIMAL throughout, one exact division per metric."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    j = o.join(
        F.broadcast(c.select("c_custkey", "c_nationkey")),
        o["o_custkey"] == c["c_custkey"],
    ).select(
        "c_nationkey",
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("decimal(38,0)")
        .alias("cents"),
    )
    return features.concentration_metrics(
        j, "c_nationkey", "o_custkey", "cents"
    )


# ---------------------------------------------------------------------------
# Markov next-event predictor accuracy (r7): the acceptance metric for
# event_transition_matrix — train the argmax-next-type predictor on
# md5-split users, score it on held-out users' transitions. Exact
# counts; deterministic (count desc, type asc) argmax.
# ---------------------------------------------------------------------------
@query(
    "markov_next_accuracy",
    oracle=f"""
    WITH tr AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt,
             ({ddb_hex32("md5(CAST(user_id AS VARCHAR))")} % 4 = 0) AS is_test
      FROM events
    ),
    t AS (SELECT * FROM tr WHERE nxt IS NOT NULL),
    cnt AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      FROM t WHERE NOT is_test GROUP BY 1, 2
    ),
    model AS (
      SELECT cur, nxt AS pred FROM (
        SELECT cur, nxt,
               row_number() OVER (PARTITION BY cur ORDER BY n DESC, nxt) AS rn
        FROM cnt
      ) WHERE rn = 1
    ),
    ev AS (
      SELECT t.cur, (t.nxt = m.pred) AS ok
      FROM t JOIN model m ON m.cur = t.cur WHERE t.is_test
    ),
    per AS (
      SELECT cur, CAST(count(*) AS BIGINT) AS n_eval,
             CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
      FROM ev GROUP BY 1
    ),
    allr AS (
      SELECT '__all__' AS cur, CAST(sum(n_eval) AS BIGINT) AS n_eval,
             CAST(sum(n_correct) AS BIGINT) AS n_correct
      FROM per
    )
    SELECT cur, n_eval, n_correct,
           CAST(n_correct AS DOUBLE) / CAST(n_eval AS DOUBLE) AS accuracy
    FROM (SELECT * FROM per UNION ALL SELECT * FROM allr)
    """,
)
def q_markov_next_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance metric for the Markov transition model: argmax next-event predictor trained on md5-split users, exact accuracy per current type plus an __all__ row on held-out transitions."""
    from pyspark.sql import Window as W

    from datalake_etlscripts_spark.functions.scalar import md5_hash32

    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = e.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
        (md5_hash32(F.col("user_id").cast("string")) % 4 == 0).alias(
            "is_test"
        ),
    ).filter(F.col("nxt").isNotNull())
    cnt = (
        tr.filter(~F.col("is_test"))
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    mw = W.partitionBy("cur").orderBy(F.desc("n"), F.asc("nxt"))
    model = (
        cnt.withColumn("_rn", F.row_number().over(mw))
        .filter(F.col("_rn") == 1)
        .select("cur", F.col("nxt").alias("pred"))
    )
    ev = (
        tr.filter(F.col("is_test"))
        .join(F.broadcast(model), "cur")
        .select("cur", (F.col("nxt") == F.col("pred")).alias("ok"))
    )
    per = ev.groupBy("cur").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    )
    allr = per.agg(
        F.lit("__all__").alias("cur"),
        F.sum("n_eval").cast("long").alias("n_eval"),
        F.sum("n_correct").cast("long").alias("n_correct"),
    )
    u = per.unionByName(allr)
    return u.select(
        "cur",
        "n_eval",
        "n_correct",
        (F.col("n_correct").cast("double") / F.col("n_eval").cast("double")).alias(
            "accuracy"
        ),
    )


# ---------------------------------------------------------------------------
# Schema profiling (r7): intra-table functional dependencies (the
# fk_inference twin) and candidate-key audit with exact violation /
# duplicate mass over human-bounded candidate lists.
# ---------------------------------------------------------------------------
_FD_PAIRS = [
    ("o_orderkey", "o_custkey"),
    ("o_orderkey", "o_orderstatus"),
    ("o_custkey", "o_orderpriority"),
    ("o_custkey", "o_orderstatus"),
    ("o_orderdate", "o_orderstatus"),
    ("o_orderpriority", "o_orderstatus"),
]


def _fd_oracle() -> str:
    parts = [
        f"""
    SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(nd - 1) AS BIGINT) AS violations,
           (sum(nd - 1) = 0) AS holds
    FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS nd FROM orders GROUP BY 1)"""
        for lhs, rhs in _FD_PAIRS
    ]
    return "\n    UNION ALL\n".join(parts)


@query("fd_discovery", oracle=_fd_oracle())
def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit over a reviewer-bounded candidate list: A->B violation mass as the exact sum of (distinct-B-per-A minus 1) - one lhs-keyed shuffle per pair, almost-FDs visible, not just booleans."""
    o = read_table(spark, sf_dir, "orders")
    return features.fd_audit(o, _FD_PAIRS)


_KEY_CANDS = [
    ("o_orderkey",),
    ("o_custkey",),
    ("o_orderdate",),
    ("o_custkey", "o_orderdate"),
    ("o_custkey", "o_orderdate", "o_totalprice"),
]


def _key_oracle() -> str:
    parts = [
        f"""
    SELECT '{",".join(c)}' AS columns,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT ({", ".join(c)})) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT ({", ".join(c)})) AS BIGINT)
             AS dup_mass,
           (count(*) = count(DISTINCT ({", ".join(c)}))) AS is_key
    FROM orders"""
        for c in _KEY_CANDS
    ]
    return "\n    UNION ALL\n".join(parts)


@query("candidate_keys", oracle=_key_oracle())
def q_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key audit: distinct count vs row count with exact duplicate mass per candidate column set - one distinct aggregate per candidate over a single scan."""
    o = read_table(spark, sf_dir, "orders")
    return features.key_audit(o, _KEY_CANDS)


# ---------------------------------------------------------------------------
# Funnel latency quantiles (r7): exact p50/p90 of first-view →
# first-purchase conversion time, quantiles defined by explicit rank
# selection (engines disagree on interpolation) and ranked by the
# distributed sort-rank plan — no single-task global window.
# ---------------------------------------------------------------------------
@query(
    "funnel_latency_quantiles",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS pt
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.vt GROUP BY 1
    ),
    l AS (
      SELECT p.user_id,
             (epoch_us(pt) - epoch_us(vt)) // 1000000 AS lat
      FROM p JOIN v USING (user_id)
    ),
    r AS (
      SELECT user_id, lat, row_number() OVER (ORDER BY lat, user_id) AS rn,
             count(*) OVER () AS n
      FROM l
    )
    SELECT CAST(max(n) AS BIGINT) AS n_converters,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN lat END) AS BIGINT)
             AS p50_s,
           CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN lat END) AS BIGINT)
             AS p90_s
    FROM r
    """,
)
def q_funnel_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact conversion-latency quantiles for the view->purchase funnel: lower-median and ceil-rank p90 selected by explicit rank (no interpolation), ranks from the distributed sort-rank plan."""
    e = read_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    lat = (
        p.join(v, "user_id")
        .select(
            "user_id",
            F.expr("(unix_micros(pt) - unix_micros(vt)) div 1000000").alias(
                "lat"
            ),
        )
    )
    ranked = features.distributed_rank(lat, "lat", "user_id", "_r")
    n = lat.count()
    k50, k90 = (n + 1) // 2, (9 * n + 9) // 10
    return ranked.agg(
        F.lit(n).cast("long").alias("n_converters"),
        F.max(F.when(F.col("_r") == k50, F.col("lat")))
        .cast("long")
        .alias("p50_s"),
        F.max(F.when(F.col("_r") == k90, F.col("lat")))
        .cast("long")
        .alias("p90_s"),
    )


# ---------------------------------------------------------------------------
# GDPR erasure impact (r7): right-to-be-forgotten cascade — a
# deterministic forget-list of customers propagated through orders →
# lineitem and into the (shared-id-space) event log; exact affected
# row/key counts per table, the work list a deletion-vector writer
# consumes. Semi-joins only; fact tables never shuffle.
# ---------------------------------------------------------------------------
@query(
    "erasure_impact",
    oracle="""
    WITH forget AS (
      SELECT c_custkey AS id FROM customer WHERE c_custkey % 97 = 0
    ),
    o AS (
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_custkey IN (SELECT id FROM forget)
    ),
    li AS (
      SELECT l_orderkey FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM o)
    ),
    ev AS (
      SELECT user_id FROM events WHERE user_id IN (SELECT id FROM forget)
    )
    SELECT 'customer' AS table_name,
           CAST((SELECT count(*) FROM forget) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM forget) AS BIGINT) AS n_keys
    UNION ALL
    SELECT 'orders', CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT) FROM o
    UNION ALL
    SELECT 'lineitem', CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM li
    UNION ALL
    SELECT 'events', CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT user_id) AS BIGINT) FROM ev
    """,
)
def q_erasure_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: forget-list customers propagated customer->orders->lineitem plus the shared-id event log, exact affected rows and keys per table via semi-joins - the deletion-vector work list."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    e = read_table(spark, sf_dir, "events")
    forget = c.filter(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").alias("id")
    )
    fo = o.join(
        F.broadcast(forget), o["o_custkey"] == forget["id"], "left_semi"
    )
    fl = li.join(
        F.broadcast(fo.select("o_orderkey")),
        li["l_orderkey"] == fo["o_orderkey"],
        "left_semi",
    )
    fe = e.join(F.broadcast(forget), e["user_id"] == forget["id"], "left_semi")
    rows = [
        forget.agg(
            F.lit("customer").alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
        ),
        fo.agg(
            F.lit("orders").alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("o_custkey").cast("long").alias("n_keys"),
        ),
        fl.agg(
            F.lit("lineitem").alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("l_orderkey").cast("long").alias("n_keys"),
        ),
        fe.agg(
            F.lit("events").alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("user_id").cast("long").alias("n_keys"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Point-in-time training join (r7): the feature-store correctness
# shape — every label row sees each feature's value as of STRICTLY
# BEFORE the label timestamp (no leakage), via ONE union+carry pass
# per user: label rows sort before feature rows at equal timestamps,
# so an equal-ts feature can never leak into its own label. Two
# feature streams (running view count, last error time) carry
# independently in the same window — one user-keyed shuffle total,
# no inequality join, no per-feature passes.
# ---------------------------------------------------------------------------
@query(
    "pit_training_join",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id, ts, event_type FROM events
    ),
    u AS (
      SELECT event_id, user_id, ts, 0 AS tag,
             NULL::BIGINT AS vcnt, NULL::TIMESTAMP AS ets
      FROM base WHERE event_type = 'purchase'
      UNION ALL
      SELECT NULL, user_id, ts, 1,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id),
             NULL
      FROM base WHERE event_type = 'view'
      UNION ALL
      SELECT NULL, user_id, ts, 1, NULL, ts
      FROM base WHERE event_type = 'error'
    ),
    c AS (
      SELECT event_id, user_id, ts, tag,
             max(vcnt) OVER w AS n_views_before,
             max(ets) OVER w AS last_err
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           CAST(COALESCE(n_views_before, 0) AS BIGINT) AS n_views_before,
           CAST((epoch_us(ts) - epoch_us(last_err)) // 1000000 AS BIGINT)
             AS err_age_s
    FROM c WHERE tag = 0
    """,
)
def q_pit_training_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join for training labels: running view count and seconds-since-last-error as of strictly before each purchase, both features carried in ONE user-keyed union+carry window - the no-leakage feature-store shape without inequality joins."""
    e = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    c = features.pit_feature_rows(e)
    return c.select(
        "event_id",
        "user_id",
        "n_views_before",
        F.expr("(unix_micros(ts) - unix_micros(last_err)) div 1000000")
        .cast("long")
        .alias("err_age_s"),
    )


# ---------------------------------------------------------------------------
# Ingest coverage gaps (r7): the outage report — zero-count runs on
# the gap-filled hourly spine, islands found by the rn-difference
# trick; per type the gap mass, outage count, and longest outage.
# ---------------------------------------------------------------------------
@query(
    "coverage_gaps",
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
    z AS (
      SELECT k, h,
             row_number() OVER (PARTITION BY k ORDER BY h) AS rn
      FROM g WHERE c = 0
    ),
    isl AS (
      SELECT k, count(*) AS len
      FROM z GROUP BY k, h - rn * INTERVAL 1 HOUR
    ),
    agg AS (
      SELECT k, CAST(sum(len) AS BIGINT) AS n_gap_hours,
             CAST(count(*) AS BIGINT) AS n_outages,
             CAST(max(len) AS BIGINT) AS longest_outage_h
      FROM isl GROUP BY 1
    ),
    tot AS (SELECT k, CAST(count(*) AS BIGINT) AS n_hours FROM g GROUP BY 1)
    SELECT t.k AS event_type, t.n_hours,
           CAST(COALESCE(a.n_gap_hours, 0) AS BIGINT) AS n_gap_hours,
           CAST(COALESCE(a.n_outages, 0) AS BIGINT) AS n_outages,
           CAST(COALESCE(a.longest_outage_h, 0) AS BIGINT)
             AS longest_outage_h
    FROM tot t LEFT JOIN agg a ON a.k = t.k
    """,
)
def q_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest outage report per event type: zero-hour islands on the gap-filled spine via the rn-difference trick - gap mass, outage count, longest outage, all exact hour-grain integers."""
    from pyspark.sql import Window as W

    from datalake_etlscripts_spark.operators.features import (
        _hourly_counts_spine,
    )

    e = read_table(spark, sf_dir, "events")
    g = _hourly_counts_spine(e, "event_type", "ts")
    z = g.filter(F.col("c") == 0).withColumn(
        "rn", F.row_number().over(W.partitionBy("k").orderBy("h"))
    )
    isl = (
        z.withColumn(
            "grp", F.expr("h - make_interval(0, 0, 0, 0, rn, 0, 0)")
        )
        .groupBy("k", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    agg = isl.groupBy("k").agg(
        F.sum("len").cast("long").alias("n_gap_hours"),
        F.count(F.lit(1)).cast("long").alias("n_outages"),
        F.max("len").cast("long").alias("longest_outage_h"),
    )
    tot = g.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_hours"))
    return (
        tot.join(agg, "k", "left")
        .select(
            F.col("k").alias("event_type"),
            "n_hours",
            F.coalesce("n_gap_hours", F.lit(0)).cast("long").alias(
                "n_gap_hours"
            ),
            F.coalesce("n_outages", F.lit(0)).cast("long").alias("n_outages"),
            F.coalesce("longest_outage_h", F.lit(0)).cast("long").alias(
                "longest_outage_h"
            ),
        )
    )


# ---------------------------------------------------------------------------
# NDCG@10 ranking evaluation (r7): completes the IR-eval set beside
# average_precision and ann_recall_mrr. Graded relevance = number of
# distinct query terms present (gain 2^rel−1 ∈ {0,1,3}); the ranking
# under evaluation is the tf-sum scorer. The DCG fold is a FIXED-ORDER
# 10-term expression over literal 1/log2(i+1) discounts (identical
# literals both engines), so the float result is bit-deterministic —
# no order-dependent double summation anywhere.
# ---------------------------------------------------------------------------
_NDCG_W = [
    "1.0", "0.6309297535714575", "0.5", "0.43067655807339306",
    "0.38685280723454163", "0.3562071871080222", "0.3333333333333333",
    "0.31546487678572877", "0.3010299956639812", "0.2890648263178879",
]
_NDCG_QUERIES = [("q_hash_join", "hash", "join"), ("q_slow_scan", "slow", "scan")]


def _ndcg_fold(prefix: str) -> str:
    terms = " + ".join(
        f"CAST({w} AS DOUBLE) * {prefix}{i}" for i, w in enumerate(_NDCG_W, 1)
    )
    return f"({terms})"


def _ndcg_oracle() -> str:
    qvals = ", ".join(f"('{q}', '{a}', '{b}')" for q, a, b in _NDCG_QUERIES)
    g_cols = ",\n             ".join(
        f"CAST(COALESCE(max(CASE WHEN rnk = {i} THEN gain END), 0) AS BIGINT)"
        f" AS g{i}"
        for i in range(1, 11)
    )
    s_cols = ",\n             ".join(
        f"CAST(COALESCE(max(CASE WHEN srnk = {i} THEN gain END), 0) AS BIGINT)"
        f" AS s{i}"
        for i in range(1, 11)
    )
    return f"""
    WITH q(query, t1, t2) AS (VALUES {qvals}),
    d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    sc AS (
      SELECT q.query, d.doc_id,
             len(list_filter(d.tk, x -> x = q.t1))
               + len(list_filter(d.tk, x -> x = q.t2)) AS tf,
             CAST(CASE WHEN len(list_filter(d.tk, x -> x = q.t1)) > 0
                       THEN 1 ELSE 0 END
                + CASE WHEN len(list_filter(d.tk, x -> x = q.t2)) > 0
                       THEN 1 ELSE 0 END AS BIGINT) AS rel
      FROM q, d
    ),
    top AS (
      SELECT query, doc_id, rel,
             CASE WHEN rel = 2 THEN 3 WHEN rel = 1 THEN 1 ELSE 0 END AS gain,
             row_number() OVER (PARTITION BY query
                                ORDER BY tf DESC, doc_id) AS rnk
      FROM sc WHERE tf > 0
    ),
    t10 AS (SELECT * FROM top WHERE rnk <= 10),
    ideal AS (
      SELECT query, gain,
             row_number() OVER (PARTITION BY query
                                ORDER BY gain DESC, doc_id) AS srnk
      FROM t10
    ),
    gm AS (SELECT query, {g_cols} FROM t10 GROUP BY query),
    sm AS (SELECT query, {s_cols} FROM ideal GROUP BY query),
    f AS (
      SELECT gm.query, {_ndcg_fold('g')} AS dcg, {_ndcg_fold('s')} AS idcg
      FROM gm JOIN sm ON sm.query = gm.query
    )
    SELECT query, dcg, idcg,
           CASE WHEN idcg > 0 THEN dcg / idcg END AS ndcg
    FROM f
    """


@query("ndcg_at_k", oracle=_ndcg_oracle())
def q_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the tf-sum ranking against distinct-term graded relevance: fixed-order 10-term DCG fold over literal log2 discounts (bit-deterministic, no order-dependent double sums), ideal ordering re-ranked from the same top-10."""
    from pyspark.sql import Window as W

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    outs = []
    for qname, t1, t2 in _NDCG_QUERIES:
        c1 = F.size(F.filter(toks, lambda t: t == t1))
        c2 = F.size(F.filter(toks, lambda t: t == t2))
        sc = d.select(
            F.lit(qname).alias("query"),
            "doc_id",
            (c1 + c2).alias("tf"),
            (
                F.when(c1 > 0, 1).otherwise(0) + F.when(c2 > 0, 1).otherwise(0)
            ).cast("long").alias("rel"),
        ).filter(F.col("tf") > 0)
        top = sc.withColumn(
            "gain",
            F.when(F.col("rel") == 2, 3)
            .when(F.col("rel") == 1, 1)
            .otherwise(0)
            .cast("long"),
        ).withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("query").orderBy(F.desc("tf"), F.asc("doc_id"))
            ),
        ).filter(F.col("rnk") <= 10)
        ideal = top.withColumn(
            "srnk",
            F.row_number().over(
                W.partitionBy("query").orderBy(F.desc("gain"), F.asc("doc_id"))
            ),
        )
        gm = top.groupBy("query").agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("rnk") == i, F.col("gain"))), F.lit(0)
                )
                .cast("long")
                .alias(f"g{i}")
                for i in range(1, 11)
            ]
        )
        sm = ideal.groupBy("query").agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("srnk") == i, F.col("gain"))), F.lit(0)
                )
                .cast("long")
                .alias(f"s{i}")
                for i in range(1, 11)
            ]
        )
        dcg = None
        idcg = None
        for i, w in enumerate(_NDCG_W, 1):
            tg = F.lit(float(w)).cast("double") * F.col(f"g{i}")
            ts = F.lit(float(w)).cast("double") * F.col(f"s{i}")
            dcg = tg if dcg is None else dcg + tg
            idcg = ts if idcg is None else idcg + ts
        outs.append(
            gm.join(sm, "query").select(
                "query",
                dcg.alias("dcg"),
                idcg.alias("idcg"),
                F.when(idcg > 0, dcg / idcg).alias("ndcg"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Quantized Brier score (r7): calibration loss of a deterministic
# stopword-ratio probability, quantized to permille by INTEGER
# division so the squared-error sum is exact integers; one division.
# ---------------------------------------------------------------------------
@query(
    "brier_score_permille",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    p AS (
      SELECT doc_id,
             CAST(1000 * len(list_filter(tk, x -> x = 'the' OR x = 'a'))
                  // len(tk) AS BIGINT) AS p_pm,
             CAST(CASE WHEN lang = 'en' THEN 1000 ELSE 0 END AS BIGINT)
               AS y_pm
      FROM d WHERE len(tk) > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum((p_pm - y_pm) * (p_pm - y_pm)) AS BIGINT) AS sq_sum_pm2,
           CAST(sum((p_pm - y_pm) * (p_pm - y_pm)) AS DOUBLE)
             / (1000000.0 * count(*)) AS brier
    FROM p
    """,
)
def q_brier_score_permille(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier calibration score of the stopword-ratio english predictor with probabilities quantized to permille by integer division - exact integer squared-error sum, one end division."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    p = d.select(
        F.expr(
            "CAST(1000 * size(filter(filter(split(text, ' '), x -> x != ''),"
            " x -> x = 'the' OR x = 'a'))"
            " div size(filter(split(text, ' '), x -> x != '')) AS BIGINT)"
        ).alias("p_pm"),
        F.when(F.col("lang") == "en", 1000).otherwise(0).cast("long").alias(
            "y_pm"
        ),
        F.size(toks).alias("_nt"),
    ).filter(F.col("_nt") > 0)
    sq = (F.col("p_pm") - F.col("y_pm")) * (F.col("p_pm") - F.col("y_pm"))
    return p.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(sq).cast("long").alias("sq_sum_pm2"),
        (
            F.sum(sq).cast("double")
            / (F.lit(1000000.0) * F.count(F.lit(1)))
        ).alias("brier"),
    )


# ---------------------------------------------------------------------------
# Croston intermittent-demand forecast (r7): the forecast-family
# closer beside seasonal-naive MASE and the EWMA spike flag — for
# series that are mostly zeros, smooth the nonzero demand SIZES and
# the INTERVALS between them separately and forecast their ratio.
# Both EWMAs use the denominator-cleared integer weights
# 3^(i-1)*4^(8-i) over the 8 most recent observations, so the ratio
#   croston = size_ewma / interval_ewma
#           = (s_num * i_den) / (s_den * i_num)
# is ONE exact integer division.
# ---------------------------------------------------------------------------
_CRO_W = {i: 3 ** (i - 1) * 4 ** (8 - i) for i in range(1, 9)}
_CRO_CASE = (
    "CASE rn "
    + " ".join(f"WHEN {i} THEN {w}" for i, w in _CRO_W.items())
    + " ELSE 0 END"
)


@query(
    "croston_forecast",
    oracle=f"""
    WITH hc AS (
      SELECT event_type AS k, date_trunc('hour', ts) AS h, count(*) AS c
      FROM events WHERE event_type = 'purchase' OR event_type = 'error'
      GROUP BY 1, 2
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
    nz AS (
      SELECT k, h, c, epoch_us(h) // 3600000000 AS x,
             row_number() OVER (PARTITION BY k ORDER BY h DESC) AS rn
      FROM g WHERE c > 0
    ),
    sz AS (
      SELECT k,
             CAST(sum(({_CRO_CASE}) * c) AS BIGINT) AS s_num,
             CAST(sum({_CRO_CASE}) AS BIGINT) AS s_den,
             CAST(count(*) AS BIGINT) AS n_recent
      FROM nz WHERE rn <= 8 GROUP BY 1
    ),
    iv0 AS (
      SELECT k, h, x - lag(x) OVER (PARTITION BY k ORDER BY x) AS iv
      FROM nz
    ),
    ivr AS (
      SELECT k, iv,
             row_number() OVER (PARTITION BY k ORDER BY h DESC) AS rn
      FROM iv0 WHERE iv IS NOT NULL
    ),
    ia AS (
      SELECT k,
             CAST(sum(({_CRO_CASE}) * iv) AS BIGINT) AS i_num,
             CAST(sum({_CRO_CASE}) AS BIGINT) AS i_den
      FROM ivr WHERE rn <= 8 GROUP BY 1
    ),
    nn AS (SELECT k, CAST(count(*) AS BIGINT) AS n_nonzero FROM nz GROUP BY 1)
    SELECT nn.k AS event_type, nn.n_nonzero,
           CAST(sz.s_num AS DOUBLE) / CAST(sz.s_den AS DOUBLE) AS size_ewma,
           CAST(ia.i_num AS DOUBLE) / CAST(ia.i_den AS DOUBLE)
             AS interval_ewma,
           CASE WHEN ia.i_num > 0 THEN
             CAST(CAST(sz.s_num AS HUGEINT) * ia.i_den AS DOUBLE)
               / CAST(CAST(sz.s_den AS HUGEINT) * ia.i_num AS DOUBLE) END
             AS croston_rate
    FROM nn JOIN sz ON sz.k = nn.k LEFT JOIN ia ON ia.k = nn.k
    """,
)
def q_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston intermittent-demand forecast per sparse event type: separate integer-weight EWMAs of nonzero sizes and inter-demand intervals, the demand rate as one exact cross-multiplied division."""
    from pyspark.sql import Window as W

    from datalake_etlscripts_spark.operators.features import (
        _hourly_counts_spine,
    )

    e = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    g = _hourly_counts_spine(e, "event_type", "ts")
    nz = (
        g.filter(F.col("c") > 0)
        .withColumn("x", F.expr("unix_micros(h) div 3600000000"))
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("k").orderBy(F.desc("h")))
        )
    )
    wcase = F.expr(_CRO_CASE)
    sz = (
        nz.filter(F.col("rn") <= 8)
        .groupBy("k")
        .agg(
            F.sum(wcase * F.col("c")).cast("long").alias("s_num"),
            F.sum(wcase).cast("long").alias("s_den"),
        )
    )
    iv0 = nz.withColumn(
        "iv", F.col("x") - F.lag("x").over(W.partitionBy("k").orderBy("x"))
    )
    ivr = (
        iv0.filter(F.col("iv").isNotNull())
        .withColumn(
            "rn2",
            F.row_number().over(W.partitionBy("k").orderBy(F.desc("h"))),
        )
        .withColumn("rn", F.col("rn2"))
    )
    ia = (
        ivr.filter(F.col("rn2") <= 8)
        .groupBy("k")
        .agg(
            F.sum(wcase * F.col("iv")).cast("long").alias("i_num"),
            F.sum(wcase).cast("long").alias("i_den"),
        )
    )
    nn = g.filter(F.col("c") > 0).groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_nonzero")
    )
    dec = "decimal(38,0)"
    out = nn.join(sz, "k").join(ia, "k", "left")
    return out.select(
        F.col("k").alias("event_type"),
        "n_nonzero",
        (F.col("s_num").cast("double") / F.col("s_den").cast("double")).alias(
            "size_ewma"
        ),
        (F.col("i_num").cast("double") / F.col("i_den").cast("double")).alias(
            "interval_ewma"
        ),
        F.when(
            F.col("i_num") > 0,
            (F.col("s_num").cast(dec) * F.col("i_den"))
            .cast(dec)
            .cast("string")
            .cast("double")
            / (F.col("s_den").cast(dec) * F.col("i_num"))
            .cast(dec)
            .cast("string")
            .cast("double"),
        ).alias("croston_rate"),
    )


# ---------------------------------------------------------------------------
# Business-hours SLA latency (r7): view→purchase latency counted only
# inside Mon-Fri 09:00-17:00 UTC. No calendar functions at all — the
# weekday comes from pure epoch arithmetic (epoch day 0 was a
# Thursday; +3 anchors Monday=0), so both engines compute the SAME
# integers with no dayofweek-convention trap (Spark 1=Sunday vs
# DuckDB isodow 1=Monday):
#   days = epoch_s div 86400;  sod = epoch_s mod 86400
#   dow  = (days + 3) mod 7;   fw = (days + 3) div 7
#   bh(t) = fw*144000 + least(dow,5)*28800
#         + IF(dow<5, clamp(sod-32400, 0, 28800), 0)
#   business_latency = bh(t2) - bh(t1)
# ---------------------------------------------------------------------------
_BH_SQL = """(
      ((epoch_us({t}) // 1000000 // 86400 + 3) // 7) * 144000
      + least((epoch_us({t}) // 1000000 // 86400 + 3) % 7, 5) * 28800
      + CASE WHEN (epoch_us({t}) // 1000000 // 86400 + 3) % 7 < 5
          THEN least(greatest(epoch_us({t}) // 1000000 % 86400 - 32400, 0),
                     28800) ELSE 0 END
    )"""


@query(
    "business_hours_latency",
    oracle=f"""
    WITH v AS (
      SELECT user_id, min(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS pt
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.vt GROUP BY 1
    ),
    l AS (
      SELECT p.user_id,
             CAST({_BH_SQL.format(t='pt')} - {_BH_SQL.format(t='vt')}
                  AS BIGINT) AS bl,
             CAST((epoch_us(pt) - epoch_us(vt)) // 1000000 AS BIGINT)
               AS wall_s
      FROM p JOIN v USING (user_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converters,
           CAST(sum(bl) AS BIGINT) AS sum_business_s,
           CAST(sum(bl) AS DOUBLE) / count(*) AS mean_business_s,
           CAST(sum(wall_s) AS DOUBLE) / count(*) AS mean_wall_s
    FROM l
    """,
)
def q_business_hours_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-to-purchase latency counted only inside Mon-Fri 9-17 UTC: weekday from pure epoch arithmetic (Monday anchor, no engine dayofweek conventions), business-second accumulator as one closed-form integer expression per timestamp."""
    e = read_table(spark, sf_dir, "events")

    def bh(t: str):
        return F.expr(
            f"((unix_micros({t}) div 1000000 div 86400 + 3) div 7) * 144000"
            f" + least((unix_micros({t}) div 1000000 div 86400 + 3) % 7, 5)"
            f" * 28800"
            f" + CASE WHEN (unix_micros({t}) div 1000000 div 86400 + 3) % 7 < 5"
            f" THEN least(greatest(unix_micros({t}) div 1000000 % 86400"
            f" - 32400, 0), 28800) ELSE 0 END"
        )

    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    lat = p.join(v, "user_id").select(
        (bh("pt") - bh("vt")).cast("long").alias("bl"),
        F.expr("(unix_micros(pt) - unix_micros(vt)) div 1000000")
        .cast("long")
        .alias("wall_s"),
    )
    return lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_converters"),
        F.sum("bl").cast("long").alias("sum_business_s"),
        (F.sum("bl").cast("double") / F.count(F.lit(1))).alias(
            "mean_business_s"
        ),
        (F.sum("wall_s").cast("double") / F.count(F.lit(1))).alias(
            "mean_wall_s"
        ),
    )


# ---------------------------------------------------------------------------
# Hierarchy shares (r7): share-of-parent at every level of the
# region → nation → market-segment revenue hierarchy — the BI
# "percent of parent" readout as exact integer-cents ratios, one
# division per share. Aggregates once at the leaf grain; parents are
# map-side rollups of the leaf table, never a second fact scan.
# ---------------------------------------------------------------------------
@query(
    "hierarchy_shares",
    oracle="""
    WITH leaf AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             c.c_mktsegment AS segment,
             CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100
                  AS HUGEINT)) AS HUGEINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2, 3
    ),
    nat AS (
      SELECT region, nation, sum(cents) AS cents FROM leaf GROUP BY 1, 2
    ),
    reg AS (SELECT region, sum(cents) AS cents FROM nat GROUP BY 1),
    tot AS (SELECT sum(cents) AS cents FROM reg)
    SELECT leaf.region, leaf.nation, leaf.segment,
           CAST(CAST(leaf.cents AS VARCHAR) AS DOUBLE) / 100.0 AS revenue,
           CAST(CAST(leaf.cents AS VARCHAR) AS DOUBLE)
             / CAST(CAST(nat.cents AS VARCHAR) AS DOUBLE) AS share_of_nation,
           CAST(CAST(nat.cents AS VARCHAR) AS DOUBLE)
             / CAST(CAST(reg.cents AS VARCHAR) AS DOUBLE) AS share_of_region,
           CAST(CAST(reg.cents AS VARCHAR) AS DOUBLE)
             / CAST(CAST(tot.cents AS VARCHAR) AS DOUBLE) AS share_of_total
    FROM leaf
    JOIN nat USING (region, nation)
    JOIN reg USING (region)
    CROSS JOIN tot
    """,
)
def q_hierarchy_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent at every level of the region->nation->segment revenue hierarchy: one leaf-grain aggregate, parents rolled up from the leaf table (fact scanned once), exact integer-cents ratios."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    dec = "decimal(38,0)"
    leaf = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast(dec)
            )
            .cast(dec)
            .alias("cents")
        )
    )
    nat = leaf.groupBy("region", "nation").agg(
        F.sum("cents").cast(dec).alias("ncents")
    )
    reg = nat.groupBy("region").agg(F.sum("ncents").cast(dec).alias("rcents"))
    tot = reg.agg(F.sum("rcents").cast(dec).alias("tcents"))
    as_d = lambda c_: F.col(c_).cast("string").cast("double")  # noqa: E731
    return (
        leaf.join(F.broadcast(nat), ["region", "nation"])
        .join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            "segment",
            (as_d("cents") / F.lit(100.0)).alias("revenue"),
            (as_d("cents") / as_d("ncents")).alias("share_of_nation"),
            (as_d("ncents") / as_d("rcents")).alias("share_of_region"),
            (as_d("rcents") / as_d("tcents")).alias("share_of_total"),
        )
    )


# ---------------------------------------------------------------------------
# Time-series diagnostics (r7): the full ACF grid behind
# seasonality_lag24's single point, and a Holt-style level+trend fit
# made exact via integer-weight WLS.
# ---------------------------------------------------------------------------
@query(
    "acf_grid",
    oracle=_SPINE_SQL
    + """,
    hx AS (SELECT k, epoch_us(h) // 3600000000 AS x, c FROM g),
    st AS (
      SELECT k, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(c) AS HUGEINT) AS s,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS syy
      FROM hx GROUP BY 1
    ),
    lg AS (SELECT unnest(generate_series(1, 24)) AS lag),
    p AS (
      SELECT a.k, lg.lag, a.c AS ch, b.c AS ct
      FROM hx a CROSS JOIN lg
      JOIN hx b ON b.k = a.k AND b.x = a.x - lg.lag
    ),
    pk AS (
      SELECT k, lag, CAST(count(*) AS HUGEINT) AS m,
             CAST(sum(CAST(ch AS HUGEINT) * ct) AS HUGEINT) AS syyk,
             CAST(sum(ch) AS HUGEINT) AS hk, CAST(sum(ct) AS HUGEINT) AS tk
      FROM p GROUP BY 1, 2
    )
    SELECT pk.k AS event_type, CAST(pk.lag AS INT) AS lag,
           CAST(pk.m AS BIGINT) AS n_pairs,
           CASE WHEN st.n * (st.n * st.syy - st.s * st.s) <> 0 THEN
             CAST(CAST(st.n * st.n * pk.syyk
                       - st.n * st.s * (pk.hk + pk.tk)
                       + pk.m * st.s * st.s AS VARCHAR) AS DOUBLE)
               / CAST(CAST(st.n * (st.n * st.syy - st.s * st.s) AS VARCHAR)
                      AS DOUBLE) END AS r
    FROM pk JOIN st USING (k)
    """,
)
def q_acf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full autocorrelation grid r_1..r_24 per event type over the hourly spine: mean cleared of its denominator so every numerator and denominator is an exact integer, one division per (type, lag); lag pairing is one exploded equi-join."""
    e = read_table(spark, sf_dir, "events")
    return features.acf_grid(e, max_lag=24)


_HOLT_W = {a: 3 ** a * 4 ** (15 - a) for a in range(16)}
_HOLT_CASE = (
    "CASE age "
    + " ".join(f"WHEN {a} THEN {w}" for a, w in _HOLT_W.items())
    + " ELSE 0 END"
)


@query(
    "holt_trend_forecast",
    oracle=_SPINE_SQL
    + f""",
    rec AS (
      SELECT k, c,
             row_number() OVER (PARTITION BY k ORDER BY h DESC) - 1 AS age
      FROM g
    ),
    r AS (
      SELECT k, CAST({_HOLT_CASE} AS HUGEINT) AS w,
             CAST(-age AS HUGEINT) AS x, CAST(c AS HUGEINT) AS y
      FROM rec WHERE age < 16
    ),
    m AS (
      SELECT k, CAST(count(*) AS INT) AS nh, sum(w) AS sw,
             sum(w * x) AS sx, sum(w * y) AS sy,
             sum(w * x * y) AS sxy, sum(w * x * x) AS sxx
      FROM r GROUP BY 1
    )
    SELECT k AS event_type, nh AS n_hours_used,
           CASE WHEN nh >= 2 AND sw * sxx - sx * sx <> 0 THEN
             CAST(CAST(sy * sxx - sx * sxy AS VARCHAR) AS DOUBLE)
               / CAST(CAST(sw * sxx - sx * sx AS VARCHAR) AS DOUBLE) END
             AS level,
           CASE WHEN nh >= 2 AND sw * sxx - sx * sx <> 0 THEN
             CAST(CAST(sw * sxy - sx * sy AS VARCHAR) AS DOUBLE)
               / CAST(CAST(sw * sxx - sx * sx AS VARCHAR) AS DOUBLE) END
             AS trend,
           CASE WHEN nh >= 2 AND sw * sxx - sx * sx <> 0 THEN
             CAST(CAST((sy * sxx - sx * sxy) + (sw * sxy - sx * sy)
                       AS VARCHAR) AS DOUBLE)
               / CAST(CAST(sw * sxx - sx * sx AS VARCHAR) AS DOUBLE) END
             AS forecast_1h,
           CASE WHEN nh >= 2 AND sw * sxx - sx * sx <> 0 THEN
             CAST(CAST((sy * sxx - sx * sxy) + 24 * (sw * sxy - sx * sy)
                       AS VARCHAR) AS DOUBLE)
               / CAST(CAST(sw * sxx - sx * sx AS VARCHAR) AS DOUBLE) END
             AS forecast_24h
    FROM m
    """,
)
def q_holt_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-style level and trend from the last 16 hours as an exact integer-weight WLS fit (geometric (3/4)^age weights cleared of denominators, Cramer's rule) - the h-step forecast is still one exact division."""
    e = read_table(spark, sf_dir, "events")
    return features.holt_weighted_trend(e, window=16)


# ---------------------------------------------------------------------------
# Importance-sampling health (r7): effective sample size of
# length-proportional weights per source — (Σw)²/Σw², the standard
# collapse diagnostic, exact integers until one division.
# ---------------------------------------------------------------------------
@query(
    "ess_diagnostic",
    oracle="""
    WITH b AS (
      SELECT source AS key, CAST(n_chars AS HUGEINT) AS w FROM documents
    ),
    st AS (
      SELECT key, CAST(count(*) AS HUGEINT) AS n, sum(w) AS sw,
             sum(w * w) AS sww
      FROM b GROUP BY 1
      UNION ALL
      SELECT '__total__', CAST(count(*) AS HUGEINT), sum(w), sum(w * w)
      FROM b
    )
    SELECT key, CAST(n AS BIGINT) AS n,
           CAST(CAST(sw * sw AS VARCHAR) AS DOUBLE)
             / CAST(CAST(sww AS VARCHAR) AS DOUBLE) AS ess,
           CAST(CAST(sw * sw AS VARCHAR) AS DOUBLE)
             / CAST(CAST(n * sww AS VARCHAR) AS DOUBLE) AS ess_ratio
    FROM st
    """,
)
def q_ess_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of length-proportional sampling weights per source plus __total__: (sum w)^2 / sum w^2 with exact DECIMAL accumulation - the weight-collapse diagnostic every importance-sampling pipeline needs."""
    d = read_table(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    b = d.select(
        F.col("source").alias("key"), F.col("n_chars").cast(dec).alias("w")
    )
    st = b.groupBy("key").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("w").cast(dec).alias("sw"),
        F.sum(F.col("w") * F.col("w")).cast(dec).alias("sww"),
    )
    tot = b.agg(
        F.lit("__total__").alias("key"),
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("w").cast(dec).alias("sw"),
        F.sum(F.col("w") * F.col("w")).cast(dec).alias("sww"),
    )
    u = st.unionByName(tot)
    as_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    return u.select(
        "key",
        F.col("n").cast("long").alias("n"),
        (as_d((F.col("sw") * F.col("sw")).cast(dec)) / as_d(F.col("sww"))).alias(
            "ess"
        ),
        (
            as_d((F.col("sw") * F.col("sw")).cast(dec))
            / as_d((F.col("n") * F.col("sww")).cast(dec))
        ).alias("ess_ratio"),
    )


# ---------------------------------------------------------------------------
# Simpson's-paradox audit (r7): does the price-quantity association
# within each return-flag group point the OPPOSITE way from the pooled
# association? Sign of the covariance numerator n·Σxy − Σx·Σy — exact
# integers, no division at all.
# ---------------------------------------------------------------------------
@query(
    "simpsons_paradox_audit",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS grp,
             CAST(l_quantity AS HUGEINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT)
               AS y
      FROM lineitem
    ),
    g AS (
      SELECT grp, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
             sum(y) AS sy, sum(x * y) AS sxy
      FROM b GROUP BY 1
    ),
    p AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy
      FROM b
    )
    SELECT g.grp AS l_returnflag, CAST(g.n AS BIGINT) AS n_rows,
           CAST(CASE WHEN g.n * g.sxy > g.sx * g.sy THEN 1
                     WHEN g.n * g.sxy < g.sx * g.sy THEN -1
                     ELSE 0 END AS INT) AS sign_group,
           CAST(CASE WHEN p.n * p.sxy > p.sx * p.sy THEN 1
                     WHEN p.n * p.sxy < p.sx * p.sy THEN -1
                     ELSE 0 END AS INT) AS sign_pooled,
           ((g.n * g.sxy > g.sx * g.sy) <> (p.n * p.sxy > p.sx * p.sy))
             AS reversed
    FROM g CROSS JOIN p
    """,
)
def q_simpsons_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation-bias audit: sign of the quantity-price covariance numerator within each return-flag group vs pooled - exact integer cross products, zero divisions; a reversal flags a Simpson's-paradox slice."""
    li = read_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    b = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast(dec).alias("x"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast(dec)
        .alias("y"),
    )
    g = b.groupBy("grp").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
    )
    p = b.agg(
        F.count(F.lit(1)).cast(dec).alias("pn"),
        F.sum("x").cast(dec).alias("psx"),
        F.sum("y").cast(dec).alias("psy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("psxy"),
    )
    j = g.crossJoin(F.broadcast(p))
    gc = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    pc = F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy")
    sign = lambda c: F.when(c > 0, 1).when(c < 0, -1).otherwise(0)  # noqa: E731
    return j.select(
        F.col("grp").alias("l_returnflag"),
        F.col("n").cast("long").alias("n_rows"),
        sign(gc).cast("int").alias("sign_group"),
        sign(pc).cast("int").alias("sign_pooled"),
        ((gc > 0) != (pc > 0)).alias("reversed"),
    )


# ---------------------------------------------------------------------------
# Two-threshold hysteresis alerting (r7): enter alarm at c ≥ hi, leave
# at c < lo — the flapping-proof monitor. Relationally: the state at
# any hour is decided by the MOST RECENT crossing (a last-non-null
# carry), so no sequential fold is needed; crossings are sparse, the
# carry is one window.
# ---------------------------------------------------------------------------
@query(
    "hysteresis_alerts",
    oracle=_SPINE_SQL
    + """,
    cr AS (
      SELECT k, h, c,
             CASE WHEN c >= 25 THEN 1 WHEN c < 10 THEN 0 END AS cross_state
      FROM g
    ),
    st AS (
      SELECT k, h, c,
             COALESCE(max_by(cross_state, h) FILTER (cross_state IS NOT NULL)
               OVER (PARTITION BY k ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               0) AS alarm
      FROM cr
    ),
    ep AS (
      SELECT k, alarm,
             alarm - COALESCE(lag(alarm) OVER (PARTITION BY k ORDER BY h), 0)
               AS delta
      FROM st
    )
    SELECT k AS event_type,
           CAST(sum(alarm) AS BIGINT) AS alarm_hours,
           CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_episodes
    FROM ep GROUP BY 1
    """,
)
def q_hysteresis_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-threshold hysteresis monitor per event type: alarm enters at >=25 events/h and exits below 10, state decided by the most recent crossing via one last-non-null carry window - flap-proof alerting with exact episode counts."""
    from pyspark.sql import Window as W

    from datalake_etlscripts_spark.operators.features import (
        _hourly_counts_spine,
    )

    e = read_table(spark, sf_dir, "events")
    g = _hourly_counts_spine(e, "event_type", "ts")
    cross = F.when(F.col("c") >= 25, 1).when(F.col("c") < 10, 0)
    cw = (
        W.partitionBy("k")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    st = g.withColumn("cross_state", cross).withColumn(
        "alarm",
        F.coalesce(
            F.last("cross_state", ignorenulls=True).over(cw), F.lit(0)
        ),
    )
    ep = st.withColumn(
        "delta",
        F.col("alarm")
        - F.coalesce(
            F.lag("alarm").over(W.partitionBy("k").orderBy("h")), F.lit(0)
        ),
    )
    return ep.groupBy(F.col("k").alias("event_type")).agg(
        F.sum("alarm").cast("long").alias("alarm_hours"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_episodes"),
    )


# ---------------------------------------------------------------------------
# Leave-one-source-out data valuation (r7): each source's influence on
# the corpus-level calibration loss, computed from ONE pass — the
# excluded-source Brier is (total squared-error − source's) over
# (total n − source's), pure arithmetic on per-source partial sums.
# ---------------------------------------------------------------------------
@query(
    "loso_source_influence",
    oracle="""
    WITH d AS (
      SELECT source, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    p AS (
      SELECT source,
             CAST(1000 * len(list_filter(tk, x -> x = 'the' OR x = 'a'))
                  // len(tk) AS HUGEINT) AS p_pm,
             CAST(CASE WHEN lang = 'en' THEN 1000 ELSE 0 END AS HUGEINT)
               AS y_pm
      FROM d WHERE len(tk) > 0
    ),
    s AS (
      SELECT source, CAST(count(*) AS HUGEINT) AS n,
             sum((p_pm - y_pm) * (p_pm - y_pm)) AS sq
      FROM p GROUP BY 1
    ),
    t AS (SELECT sum(n) AS tn, sum(sq) AS tsq FROM s)
    SELECT s.source, CAST(s.n AS BIGINT) AS n_docs,
           CAST(CAST(s.sq AS VARCHAR) AS DOUBLE)
             / (1000000.0 * CAST(s.n AS BIGINT)) AS brier_source,
           CAST(CAST(t.tsq - s.sq AS VARCHAR) AS DOUBLE)
             / (1000000.0 * CAST(t.tn - s.n AS BIGINT)) AS brier_without,
           CAST(CAST(t.tsq AS VARCHAR) AS DOUBLE)
             / (1000000.0 * CAST(t.tn AS BIGINT))
             - CAST(CAST(t.tsq - s.sq AS VARCHAR) AS DOUBLE)
               / (1000000.0 * CAST(t.tn - s.n AS BIGINT)) AS influence
    FROM s CROSS JOIN t
    """,
)
def q_loso_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out influence on the corpus Brier calibration loss: excluded-source loss from total-minus-source partial sums (one scan, K sources evaluated with zero rescans); positive influence = the source makes calibration worse."""
    d = read_table(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    p = d.select(
        "source",
        F.expr(
            "CAST(1000 * size(filter(filter(split(text, ' '), x -> x != ''),"
            " x -> x = 'the' OR x = 'a'))"
            " div size(filter(split(text, ' '), x -> x != '')) AS BIGINT)"
        ).cast(dec).alias("p_pm"),
        F.when(F.col("lang") == "en", 1000).otherwise(0).cast(dec).alias(
            "y_pm"
        ),
        F.expr("size(filter(split(text, ' '), x -> x != ''))").alias("_nt"),
    ).filter(F.col("_nt") > 0)
    sq = (F.col("p_pm") - F.col("y_pm")) * (F.col("p_pm") - F.col("y_pm"))
    s = p.groupBy("source").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(sq).cast(dec).alias("sqs"),
    )
    t = s.agg(
        F.sum("n").cast(dec).alias("tn"), F.sum("sqs").cast(dec).alias("tsq")
    )
    j = s.crossJoin(F.broadcast(t))
    as_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    brier_src = as_d(F.col("sqs")) / (
        F.lit(1000000.0) * F.col("n").cast("long")
    )
    brier_wo = as_d((F.col("tsq") - F.col("sqs")).cast(dec)) / (
        F.lit(1000000.0) * (F.col("tn") - F.col("n")).cast("long")
    )
    brier_tot = as_d(F.col("tsq")) / (
        F.lit(1000000.0) * F.col("tn").cast("long")
    )
    return j.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        brier_src.alias("brier_source"),
        brier_wo.alias("brier_without"),
        (brier_tot - brier_wo).alias("influence"),
    )


# ---------------------------------------------------------------------------
# Dispersion index (r7): variance-to-mean ratio of the hourly counts —
# the Poisson-adequacy check that tells you whether threshold alerts
# (hysteresis_alerts) and z-based monitors are even valid for a key.
# VMR = (n·Σy² − S²) / (n·S): exact integers, ONE division; the
# overdispersion flag is an integer cross-multiplication.
# ---------------------------------------------------------------------------
@query(
    "dispersion_index",
    oracle=_SPINE_SQL
    + """,
    st AS (
      SELECT k, CAST(count(*) AS HUGEINT) AS n, CAST(sum(c) AS HUGEINT) AS s,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS syy
      FROM g GROUP BY 1
    )
    SELECT k AS event_type, CAST(n AS BIGINT) AS n_hours,
           CASE WHEN s > 0 THEN
             CAST(CAST(n * syy - s * s AS VARCHAR) AS DOUBLE)
               / CAST(CAST(n * s AS VARCHAR) AS DOUBLE) END AS vmr,
           (n * syy - s * s > 2 * n * s) AS overdispersed
    FROM st
    """,
)
def q_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean ratio of hourly counts per event type (Poisson adequacy): exact integer numerator and denominator, one division; overdispersed (VMR>2) decided by cross-multiplication."""
    from datalake_etlscripts_spark.operators.features import (
        _hourly_counts_spine,
    )

    e = read_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    g = _hourly_counts_spine(e, "event_type", "ts")
    st = g.groupBy("k").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("c").cast(dec).alias("s"),
        F.sum(F.col("c").cast(dec) * F.col("c")).cast(dec).alias("syy"),
    )
    num = (F.col("n") * F.col("syy") - F.col("s") * F.col("s")).cast(dec)
    den = (F.col("n") * F.col("s")).cast(dec)
    as_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    return st.select(
        F.col("k").alias("event_type"),
        F.col("n").cast("long").alias("n_hours"),
        F.when(F.col("s") > 0, as_d(num) / as_d(den)).alias("vmr"),
        (num > 2 * den).alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# Spatial neighbor join via grid bucketing — the geohash pattern: a
# same-cell equi-join on a COMPOSITE (cx, cy) key after exploding one
# side to its 3x3 neighbor cells (literal x9 fan-out), never an
# all-pairs distance join. At 100 TB the cell size tunes bucket
# occupancy exactly like LSH band width; coordinates here are exact
# centidegree integers derived from c_custkey so the oracle (which
# uses the direct quadratic form - fine at oracle scale) matches
# bit-for-bit. Reference has no spatial ops; beyond-reference surface.
# ---------------------------------------------------------------------------
@query(
    "spatial_neighbors_grid",
    oracle="""
    WITH p AS (
      SELECT c_custkey AS id,
             CAST((c_custkey * 7919) % 18000 AS BIGINT) AS la,
             CAST((c_custkey * 104729) % 36000 AS BIGINT) AS lo
      FROM customer
    )
    SELECT a.id AS a, b.id AS b,
           CAST((a.la - b.la) * (a.la - b.la)
                + (a.lo - b.lo) * (a.lo - b.lo) AS BIGINT) AS d2
    FROM p a JOIN p b ON a.id < b.id
    WHERE (a.la - b.la) * (a.la - b.la)
          + (a.lo - b.lo) * (a.lo - b.lo) <= 2500
    """,
)
def q_spatial_neighbors_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial neighbor pairs (distance <= 50 centidegrees): points keyed to 1-degree cells, one side exploded to its 3x3 neighborhood (literal bound), composite-key equi-join, exact integer distance filter - the geohash candidate-generation shape, never all-pairs."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 7919) % 18000).alias("la"),
        ((F.col("c_custkey") * 104729) % 36000).alias("lo"),
    )
    pts = c.select(
        "id", "la", "lo",
        F.expr("la div 100").alias("cx"),
        F.expr("lo div 100").alias("cy"),
    )
    nbr = pts.select(
        F.col("id").alias("a"),
        F.col("la").alias("la1"),
        F.col("lo").alias("lo1"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dx -> "
                "transform(sequence(-1, 1), dy -> "
                "struct(cx + dx AS ncx, cy + dy AS ncy))))"
            )
        ).alias("nc"),
    ).select("a", "la1", "lo1", "nc.ncx", "nc.ncy")
    right = pts.select(
        F.col("id").alias("b"),
        F.col("la").alias("la2"),
        F.col("lo").alias("lo2"),
        F.col("cx").alias("ncx"),
        F.col("cy").alias("ncy"),
    )
    d2 = (F.col("la1") - F.col("la2")) * (F.col("la1") - F.col("la2")) + (
        F.col("lo1") - F.col("lo2")
    ) * (F.col("lo1") - F.col("lo2"))
    return (
        nbr.join(right, ["ncx", "ncy"])
        .filter((F.col("a") < F.col("b")) & (d2 <= 2500))
        .select("a", "b", d2.cast("long").alias("d2"))
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal forecast (r12): REAL triple
# exponential smoothing — the recurrence holt_trend_forecast's
# closed-form WLS deliberately avoids — made oracle-checkable by the
# nested-fold technique proven on dtw_profile_distance: the 27-double
# state vector [t, level, trend, s_0..s_23] folds over the dense
# 168-hour series with IDENTICAL IEEE expression trees in Spark
# (F.aggregate) and DuckDB (list_reduce, elements lifted to
# single-item lists), so every double matches bit-for-bit — no
# quantization needed. α=1/4, β=1/8, γ=1/4 (dyadic rationals, exact
# in binary); init: level = mean of day 1, trend = (mean day 2 −
# mean day 1)/24, s_i = x_i − level. One fact scan → 168-row dense
# grid → single-row fold; the fold is O(period · horizon) driver-free
# JVM work regardless of data size.
# ---------------------------------------------------------------------------
def _hw_sql_fold() -> str:
    P = 24
    tmod = "CAST(acc[1] AS BIGINT) % 24"
    lvl_new = f"0.25*(xx[1] - acc[4 + {tmod}]) + 0.75*(acc[2] + acc[3])"
    return f"""
    st AS (
      SELECT list_reduce(
        list_prepend(
          list_concat([CAST({P} AS DOUBLE), lvl0, tr0],
                      list_transform(range(1, {P + 1}), k -> o[k] - lvl0)),
          list_transform(o[{P + 1}:], x -> [x])),
        (acc, xx) -> list_concat(
          [acc[1] + 1.0,
           {lvl_new},
           0.125*(({lvl_new}) - acc[2]) + 0.875*acc[3]],
          list_transform(range(1, {P + 1}), k ->
            CASE WHEN k - 1 = {tmod}
                 THEN 0.25*(xx[1] - ({lvl_new})) + 0.75*acc[4 + {tmod}]
                 ELSE acc[3 + k] END))
      ) AS st FROM i
    )"""


@query(
    "holt_winters_forecast",
    oracle=f"""
    WITH b AS (SELECT min(date_trunc('hour', ts)) AS lo FROM events),
    hx AS (
      SELECT CAST(epoch(date_trunc('hour', ts))
                  - epoch((SELECT lo FROM b)) AS BIGINT) // 3600 AS idx,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    spine AS (SELECT unnest(range(0, 168)) AS idx),
    g AS (
      SELECT s.idx, CAST(coalesce(hx.c, 0) AS DOUBLE) AS x
      FROM spine s LEFT JOIN hx ON hx.idx = s.idx
    ),
    arr AS (SELECT list(x ORDER BY idx) AS o FROM g),
    i AS (
      SELECT o,
        list_reduce(list_prepend(0.0, o[1:24]), (a, b) -> a + b)
          / 24.0 AS lvl0,
        (list_reduce(list_prepend(0.0, o[25:48]), (a, b) -> a + b)
         - list_reduce(list_prepend(0.0, o[1:24]), (a, b) -> a + b))
          / 576.0 AS tr0
      FROM arr
    ),{_hw_sql_fold()}
    SELECT CAST(h AS INT) AS h,
           st[2] + h * st[3]
             + st[4 + (CAST(st[1] AS BIGINT) + h - 1) % 24] AS forecast,
           st[2] AS level, st[3] AS trend
    FROM st, (SELECT unnest(range(1, 25)) AS h)
    """,
)
def q_holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive seasonal forecast (period 24, alpha=1/4 beta=1/8 gamma=1/4) of the next day from the first 168 hourly event counts - the REAL triple-exponential recurrence as a single JVM-side array fold, bit-identical doubles in both engines."""
    P, N = 24, 168
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
    arr = idx.groupBy().agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(N - 1)),
            lambda k: F.coalesce(
                F.element_at(
                    F.map_from_entries(
                        F.collect_list(F.struct(F.col("idx"), F.col("c")))
                    ),
                    k.cast("long"),
                ),
                F.lit(0).cast("long"),
            ).cast("double"),
        ).alias("o")
    )
    o = F.col("o")
    sum1 = F.aggregate(F.slice(o, 1, P), F.lit(0.0), lambda a, b: a + b)
    sum2 = F.aggregate(F.slice(o, P + 1, P), F.lit(0.0), lambda a, b: a + b)
    d1 = arr.select(
        o,
        (sum1 / float(P)).alias("lvl0"),
        ((sum2 - sum1) / float(P * P)).alias("tr0"),
    )
    init = F.concat(
        F.array(F.lit(float(P)), F.col("lvl0"), F.col("tr0")),
        F.transform(
            F.sequence(F.lit(1), F.lit(P)),
            lambda k: F.element_at(o, k) - F.col("lvl0"),
        ),
    )

    def step(acc, x):
        tmod = acc[0].cast("long") % P
        s_old = F.element_at(acc, (tmod + 4).cast("int"))
        lvl_new = 0.25 * (x - s_old) + 0.75 * (acc[1] + acc[2])
        tr_new = 0.125 * (lvl_new - acc[1]) + 0.875 * acc[2]
        return F.concat(
            F.array(acc[0] + 1.0, lvl_new, tr_new),
            F.transform(
                F.sequence(F.lit(1), F.lit(P)),
                lambda k: F.when(
                    (k - 1).cast("long") == tmod,
                    0.25 * (x - lvl_new) + 0.75 * s_old,
                ).otherwise(F.element_at(acc, (k + 3).cast("int"))),
            ),
        )

    st = F.aggregate(F.slice(o, P + 1, N - P), init, step)
    d2 = d1.select(st.alias("st"))
    hs = F.sequence(F.lit(1), F.lit(P))
    out = d2.select(
        F.explode(
            F.transform(
                hs,
                lambda hh: F.struct(
                    hh.cast("int").alias("h"),
                    (
                        F.element_at(F.col("st"), 2)
                        + hh.cast("double") * F.element_at(F.col("st"), 3)
                        + F.element_at(
                            F.col("st"),
                            (
                                (F.col("st")[0].cast("long")
                                 + hh.cast("long") - 1) % P + 4
                            ).cast("int"),
                        )
                    ).alias("forecast"),
                    F.element_at(F.col("st"), 2).alias("level"),
                    F.element_at(F.col("st"), 3).alias("trend"),
                ),
            )
        ).alias("r")
    )
    return out.select("r.h", "r.forecast", "r.level", "r.trend")


# ---------------------------------------------------------------------------
# Bradley-Terry preference scores over brands (r12): "which brand
# wins the basket" — pairwise comparisons are co-order brand pairs
# (winner = larger max line quantity, ties skipped), and the
# Bradley-Terry MM iteration p_i ← W_i / Σ_j (n_ij + n_ji)/(p_i + p_j)
# (Hunter 2004) runs TEN SYNCHRONOUS ROUNDS as a driver-free array
# fold over the K-vector of scores, with the K×K win matrix carried
# as one K²-double array column (map → dense positions) — the same
# nested-fold technique as holt_winters_forecast, so both engines
# produce bit-identical doubles. The pair self-join is brand-level
# per order (≤ |brands| = 25 rows a side), bounded by the brand
# dictionary, NOT by basket size. One fact scan → (order, brand)
# aggregate → pair counts → single-row fold; at 100 TB only the scan
# and the keyed aggregates grow.
# ---------------------------------------------------------------------------
@query(
    "bradley_terry_brands",
    oracle="""
    WITH ob AS (
      SELECT l_orderkey AS o, p.p_brand AS brand,
             CAST(max(l_quantity) AS BIGINT) AS q
      FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey
      GROUP BY 1, 2
    ),
    bidx AS (
      SELECT brand, CAST(row_number() OVER (ORDER BY brand) AS BIGINT) AS i
      FROM (SELECT DISTINCT brand FROM ob)
    ),
    oi AS (
      SELECT ob.o, b.i, ob.q FROM ob JOIN bidx b USING (brand)
    ),
    pr AS (
      SELECT a.i AS ia, b.i AS ib,
             CAST(sum(CASE WHEN a.q > b.q THEN 1 ELSE 0 END) AS BIGINT)
               AS wab,
             CAST(sum(CASE WHEN b.q > a.q THEN 1 ELSE 0 END) AS BIGINT)
               AS wba
      FROM oi a JOIN oi b ON a.o = b.o AND a.i < b.i
      GROUP BY 1, 2
    ),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM bidx),
    ent AS (
      SELECT (ia - 1) * kk.k + ib AS pos, CAST(wab AS DOUBLE) AS w
      FROM pr, kk
      UNION ALL
      SELECT (ib - 1) * kk.k + ia, CAST(wba AS DOUBLE) FROM pr, kk
    ),
    mrow AS (
      SELECT kk.k,
             list_transform(range(1, CAST(kk.k * kk.k + 1 AS BIGINT)),
               pos -> coalesce(mm.m[pos][1], 0.0)) AS m
      FROM kk, (SELECT map(list(pos ORDER BY pos),
                           list(w ORDER BY pos)) AS m FROM ent) mm
    ),
    wv AS (
      SELECT k, m,
             list_transform(range(1, k + 1), i ->
               list_reduce(list_prepend(0.0,
                 list_transform(range(1, k + 1), j -> m[(i - 1) * k + j])),
                 (a, b) -> a + b)) AS w
      FROM mrow
    ),
    ft AS (
      SELECT k, list_reduce(
        list_prepend(list_transform(range(1, k + 1), x -> 1.0),
                     list_transform(range(10), x -> [CAST(x AS DOUBLE)])),
        (p, _x) -> list_transform(range(1, k + 1), i ->
          CASE WHEN list_reduce(list_prepend(0.0,
                 list_transform(range(1, k + 1), j ->
                   CASE WHEN j = i THEN 0.0
                        ELSE (m[(i - 1) * k + j] + m[(j - 1) * k + i])
                             / (p[i] + p[j]) END)),
                 (a, b) -> a + b) = 0.0 THEN 0.0
               ELSE w[i] / list_reduce(list_prepend(0.0,
                 list_transform(range(1, k + 1), j ->
                   CASE WHEN j = i THEN 0.0
                        ELSE (m[(i - 1) * k + j] + m[(j - 1) * k + i])
                             / (p[i] + p[j]) END)),
                 (a, b) -> a + b) END)
      ) AS p FROM wv
    ),
    sc AS (
      SELECT CAST(unnest(range(1, k + 1)) AS BIGINT) AS i,
             unnest(list_transform(p, x -> x /
               list_reduce(list_prepend(0.0, p), (a, b) -> a + b))) AS score
      FROM ft
    )
    SELECT b.brand, sc.score FROM sc JOIN bidx b USING (i)
    """,
)
def q_bradley_terry_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry brand preference scores from co-order max-quantity wins - 10 MM rounds (Hunter 2004) as a driver-free array fold over the score vector with the KxK win matrix as one dense array column, bit-identical doubles in both engines."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), "l_partkey", "l_quantity"
    )
    pt = read_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    ob = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .groupBy("o", "brand")
        .agg(F.max("l_quantity").cast("long").alias("q"))
        # settle: feeds the brand index build AND the oi projection —
        # one lineitem-wide join + aggregate instead of two (guide
        # §2.4). Lazy.
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window as _W

    bidx = (
        ob.select("brand")
        .distinct()
        .select(
            "brand",
            F.row_number().over(_W.orderBy("brand")).cast("long").alias("i"),
        )
    )
    # settle: `oi` feeds both sides of the win-pair self-join, and
    # without the cut the (order, brand) max-quantity aggregate runs
    # once per side (guide §2.4). Lazy.
    oi = ob.join(F.broadcast(bidx), "brand").select("o", "i", "q").localCheckpoint(
        eager=False
    )
    a = oi.select(
        F.col("o"), F.col("i").alias("ia"), F.col("q").alias("qa")
    )
    b = oi.select(
        F.col("o").alias("ob_"), F.col("i").alias("ib"), F.col("q").alias("qb")
    )
    pr = (
        a.join(b, (a["o"] == b["ob_"]) & (a["ia"] < b["ib"]))
        .groupBy("ia", "ib")
        .agg(
            F.sum(F.when(F.col("qa") > F.col("qb"), 1).otherwise(0))
            .cast("long")
            .alias("wab"),
            F.sum(F.when(F.col("qb") > F.col("qa"), 1).otherwise(0))
            .cast("long")
            .alias("wba"),
        )
        # settle: the dense-position union below reads `pr` twice —
        # without the cut the pair join + win aggregate execute once
        # per branch (guide §2.4). Lazy.
        .localCheckpoint(eager=False)
    )
    kk = bidx.groupBy().agg(F.count(F.lit(1)).cast("long").alias("k"))
    ent = (
        pr.crossJoin(F.broadcast(kk))
        .select(
            ((F.col("ia") - 1) * F.col("k") + F.col("ib")).alias("pos"),
            F.col("wab").cast("double").alias("w"),
        )
        .unionByName(
            pr.crossJoin(F.broadcast(kk)).select(
                ((F.col("ib") - 1) * F.col("k") + F.col("ia")).alias("pos"),
                F.col("wba").cast("double").alias("w"),
            )
        )
    )
    mrow = (
        ent.groupBy()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("pos"), F.col("w")))
            ).alias("mm")
        )
        .crossJoin(F.broadcast(kk))
        .select(
            "k",
            F.transform(
                F.sequence(F.lit(1).cast("long"), F.col("k") * F.col("k")),
                lambda pos: F.coalesce(
                    F.element_at(F.col("mm"), pos), F.lit(0.0)
                ),
            ).alias("m"),
        )
    )
    m, k = F.col("m"), F.col("k")
    seq_k = F.sequence(F.lit(1).cast("long"), k)
    wv = mrow.select(
        "k",
        "m",
        F.transform(
            seq_k,
            lambda i: F.aggregate(
                seq_k,
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(m, ((i - 1) * k + j).cast("int")),
            ),
        ).alias("w"),
    )
    w = F.col("w")

    def den(p, i):
        return F.aggregate(
            seq_k,
            F.lit(0.0),
            lambda acc, j: acc
            + F.when(j == i, F.lit(0.0)).otherwise(
                (
                    F.element_at(m, ((i - 1) * k + j).cast("int"))
                    + F.element_at(m, ((j - 1) * k + i).cast("int"))
                )
                / (
                    F.element_at(p, i.cast("int"))
                    + F.element_at(p, j.cast("int"))
                )
            ),
        )

    p0 = F.transform(seq_k, lambda x: F.lit(1.0))
    fold = F.aggregate(
        F.sequence(F.lit(1), F.lit(10)),
        p0,
        lambda p, _x: F.transform(
            seq_k,
            lambda i: F.when(den(p, i) == 0.0, F.lit(0.0)).otherwise(
                F.element_at(w, i.cast("int")) / den(p, i)
            ),
        ),
    )
    ft = wv.select("k", fold.alias("p"))
    s = F.aggregate(F.col("p"), F.lit(0.0), lambda acc, x: acc + x)
    sc = ft.select(
        F.explode(
            F.zip_with(
                F.sequence(F.lit(1).cast("long"), F.col("k")),
                F.transform(F.col("p"), lambda x: x / s),
                lambda i, v: F.struct(i.alias("i"), v.alias("score")),
            )
        ).alias("r")
    ).select("r.i", "r.score")
    return sc.join(F.broadcast(bidx), "i").select("brand", "score")


# ---------------------------------------------------------------------------
# Recursive least squares AR(1) (r12): ONLINE regression — the
# Sherman-Morrison rank-1 update of the 2×2 inverse-covariance with
# forgetting λ = 63/64 (exact in binary), fitting x_t ≈ a + b·x_{t−1}
# over the 168-hour spine in a single array fold. The third member of
# the nested-fold family (dtw = alignment DP, holt_winters = smoothing
# recurrence, rls = recursive matrix update): state
# [prev_x, a, b, p00, p01, p11] folds once; every slot is computed
# from the PREVIOUS state (synchronous update), so both engines
# evaluate the identical IEEE tree and the doubles hash-match raw.
# At 100 TB only the hourly aggregate grows; the fold is O(spine) on
# one row.
# ---------------------------------------------------------------------------
_RLS_DEN = (
    "(0.984375 + (acc[4] + acc[5] * acc[1])"
    " + acc[1] * (acc[5] + acc[6] * acc[1]))"
)
_RLS_PU0 = "(acc[4] + acc[5] * acc[1])"
_RLS_PU1 = "(acc[5] + acc[6] * acc[1])"
_RLS_E = "(xx[1] - (acc[2] + acc[3] * acc[1]))"


@query(
    "rls_ar1_forecast",
    oracle=f"""
    WITH b AS (SELECT min(date_trunc('hour', ts)) AS lo FROM events),
    hx AS (
      SELECT CAST(epoch(date_trunc('hour', ts))
                  - epoch((SELECT lo FROM b)) AS BIGINT) // 3600 AS idx,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    spine AS (SELECT unnest(range(0, 168)) AS idx),
    g AS (
      SELECT s.idx, CAST(coalesce(hx.c, 0) AS DOUBLE) AS x
      FROM spine s LEFT JOIN hx ON hx.idx = s.idx
    ),
    arr AS (SELECT list(x ORDER BY idx) AS o FROM g),
    st AS (
      SELECT list_reduce(
        list_prepend([o[1], 0.0, 0.0, 1000.0, 0.0, 1000.0],
                     list_transform(o[2:], x -> [x])),
        (acc, xx) -> [
          xx[1],
          acc[2] + ({_RLS_PU0} / {_RLS_DEN}) * {_RLS_E},
          acc[3] + ({_RLS_PU1} / {_RLS_DEN}) * {_RLS_E},
          (acc[4] - ({_RLS_PU0} / {_RLS_DEN}) * {_RLS_PU0}) / 0.984375,
          (acc[5] - ({_RLS_PU0} / {_RLS_DEN}) * {_RLS_PU1}) / 0.984375,
          (acc[6] - ({_RLS_PU1} / {_RLS_DEN}) * {_RLS_PU1}) / 0.984375
        ]
      ) AS st FROM arr
    )
    SELECT st[2] AS intercept, st[3] AS ar_coef,
           st[2] + st[3] * st[1] AS forecast_next, st[1] AS last_x
    FROM st
    """,
)
def q_rls_ar1_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive least squares AR(1) with forgetting 63/64 over the first 168 hourly counts - Sherman-Morrison rank-1 inverse update as a single array fold, bit-identical doubles, one-step-ahead forecast emitted."""
    N = 168
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
    arr = idx.groupBy().agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(N - 1)),
            lambda k: F.coalesce(
                F.element_at(
                    F.map_from_entries(
                        F.collect_list(F.struct(F.col("idx"), F.col("c")))
                    ),
                    k.cast("long"),
                ),
                F.lit(0).cast("long"),
            ).cast("double"),
        ).alias("o")
    )
    o = F.col("o")
    lam = 0.984375

    def step(acc, xx):
        px = F.element_at(acc, 1)
        a, b = F.element_at(acc, 2), F.element_at(acc, 3)
        p00, p01, p11 = (
            F.element_at(acc, 4),
            F.element_at(acc, 5),
            F.element_at(acc, 6),
        )
        pu0 = p00 + p01 * px
        pu1 = p01 + p11 * px
        den = lam + (p00 + p01 * px) + px * (p01 + p11 * px)
        e_ = xx - (a + b * px)
        return F.array(
            xx,
            a + (pu0 / den) * e_,
            b + (pu1 / den) * e_,
            (p00 - (pu0 / den) * pu0) / lam,
            (p01 - (pu0 / den) * pu1) / lam,
            (p11 - (pu1 / den) * pu1) / lam,
        )

    init = F.array(
        F.element_at(o, 1),
        F.lit(0.0),
        F.lit(0.0),
        F.lit(1000.0),
        F.lit(0.0),
        F.lit(1000.0),
    )
    st = F.aggregate(F.slice(o, 2, N - 1), init, step)
    return arr.select(st.alias("st")).select(
        F.element_at("st", 2).alias("intercept"),
        F.element_at("st", 3).alias("ar_coef"),
        (
            F.element_at("st", 2)
            + F.element_at("st", 3) * F.element_at("st", 1)
        ).alias("forecast_next"),
        F.element_at("st", 1).alias("last_x"),
    )
