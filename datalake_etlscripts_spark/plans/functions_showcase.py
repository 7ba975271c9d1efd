"""Scalar function library showcase (SURVEY.md §2.7) + remaining
relational shapes (pivot, cube, approx aggregates, pointer chase)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_etlscripts_spark.functions.scalar import (
    basename,
    compose_file_name,
    format_ntp_id,
    is_valid_ntp_id,
    ntp_group,
    parse_ntp_id,
    split_file_name,
    truncate_ts,
    url_host,
)
from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.plans.registry import query


# ---------------------------------------------------------------------------
# F1/F2/F11/F12 + group decode: ntp-id round trip over derived ids
# ---------------------------------------------------------------------------
@query(
    "ntp_id_functions",
    oracle="""
    WITH ids AS (
      SELECT o_orderkey,
             printf('ntp%08d', o_orderkey + CASE WHEN o_orderkey % 2 = 0
                                                 THEN 10000000 ELSE 0 END) AS ntp_id
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT o_orderkey, ntp_id,
           CAST(substr(ntp_id, 4, 8) AS BIGINT) AS parsed_order,
           regexp_matches(ntp_id, '^ntp[0-9]{8}$') AS valid,
           CASE WHEN CAST(substr(ntp_id, 4, 8) AS BIGINT) >= 10000000
                THEN 'minors' ELSE 'contracts' END AS grp,
           ntp_id || '_Pliego.pdf' AS file_name,
           regexp_extract(ntp_id || '_Pliego.pdf', '^ntp[0-9]{8}_(.+)\\.[^.]+$', 1) AS field,
           regexp_extract(ntp_id || '_Pliego.pdf', '\\.([^.]+)$', 1) AS ext
    FROM ids
    """,
)
def q_ntp_id_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntp-id scalar library round trip: format, parse, validate, group decode, file-name compose/split (F1/F2/F11/F12)."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    order = F.col("o_orderkey") + F.when(F.col("o_orderkey") % 2 == 0, 10_000_000).otherwise(0)
    ids = o.select("o_orderkey", format_ntp_id(order).alias("ntp_id"))
    fname = compose_file_name(F.col("ntp_id"), F.lit("Pliego"), F.lit("pdf"))
    parts = split_file_name(fname)
    return ids.select(
        "o_orderkey",
        "ntp_id",
        parse_ntp_id(F.col("ntp_id")).alias("parsed_order"),
        is_valid_ntp_id(F.col("ntp_id")).alias("valid"),
        ntp_group(F.col("ntp_id")).alias("grp"),
        fname.alias("file_name"),
        parts["field"].alias("field"),
        parts["ext"].alias("ext"),
    )


# ---------------------------------------------------------------------------
# F7/F9/F10/F11: timestamp truncation + URL host/basename over derived URLs
# ---------------------------------------------------------------------------
@query(
    "url_and_ts_functions",
    oracle="""
    WITH urls AS (
      SELECT o_orderkey,
             'https://contrataciondelestado.es/notice/' ||
                CAST(o_custkey AS VARCHAR) || '/' || CAST(o_orderkey AS VARCHAR) AS url,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '.123456' AS raw_ts
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT o_orderkey,
           'contrataciondelestado.es' AS host,
           CAST(o_orderkey AS VARCHAR) AS place_id,
           substr(replace(raw_ts, 'T', ' '), 1, 19) AS ts19
    FROM urls
    """,
)
def q_url_and_ts_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL host/basename + canonical 19-char timestamp truncation over derived URLs (F7/F9/F10)."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    urls = o.select(
        "o_orderkey",
        F.concat(
            F.lit("https://contrataciondelestado.es/notice/"),
            F.col("o_custkey").cast("string"),
            F.lit("/"),
            F.col("o_orderkey").cast("string"),
        ).alias("url"),
        F.concat(
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"), F.lit(".123456")
        ).alias("raw_ts"),
    )
    return urls.select(
        "o_orderkey",
        url_host(F.col("url")).alias("host"),
        basename(F.col("url")).alias("place_id"),
        truncate_ts(F.col("raw_ts")).alias("ts19"),
    )


# ---------------------------------------------------------------------------
# pivot (wide counts) + unpivot equivalence
# ---------------------------------------------------------------------------
@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to wide per-status counts by priority with explicit value list."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
            F.coalesce("P", F.lit(0)).alias("p_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# cube: all grouping-set combinations of (status, priority)
# ---------------------------------------------------------------------------
@query(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all grouping-set combinations in one pass."""
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# approx aggregates — the LAST rows-only query, now oracle-backed
# (r4 verdict task): the primary path is the deterministic sketch
# machinery this repo already oracles — explicit-register HLL (md5
# lanes, raw estimator) for the distinct count and a 64-bin
# equal-width histogram (exact per-flag min/max) for the quantiles.
# The Spark-native DataSketches/KLL path (approx_count_distinct,
# percentile_approx) remains the production-ACCURACY variant,
# exercised in tests/test_modules.py — its values are
# algorithm-internal and can never hash-match a foreign engine.
# ---------------------------------------------------------------------------
def _approx_agg_oracle() -> str:
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
    return f"""
    WITH h0 AS (
      SELECT l_returnflag AS k,
             {ddb_hex32("md5(CAST(l_partkey AS VARCHAR))")} AS h
      FROM lineitem WHERE l_partkey IS NOT NULL
    ),
    h AS (SELECT k, h & {HLL_BUCKETS - 1} AS bucket, h >> 8 AS w FROM h0),
    regs AS (
      SELECT k, bucket, max(CASE {ladder} ELSE {HLL_WORD_BITS + 1} END) AS reg
      FROM h GROUP BY 1, 2
    ),
    hll AS (
      SELECT k, {HLL_EST_NUM!r} / (
               sum(CAST(1 AS BIGINT) << ({HLL_WORD_BITS + 1} - reg))
               + ({HLL_BUCKETS} - count(*)) * {scale}) AS approx_parts
      FROM regs GROUP BY 1
    ),
    mm AS (
      SELECT l_returnflag AS k, min(l_extendedprice) AS lo,
             max(l_extendedprice) AS hi
      FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
    ),
    binned AS (
      SELECT li.l_returnflag AS k, mm.lo, mm.hi,
             CASE WHEN mm.hi = mm.lo THEN 0
                  ELSE least(63, CAST(floor((li.l_extendedprice - mm.lo) * 64
                                            / (mm.hi - mm.lo)) AS BIGINT))
             END AS bin
      FROM lineitem li JOIN mm ON li.l_returnflag = mm.k
      WHERE li.l_extendedprice IS NOT NULL
    ),
    g AS (
      SELECT k, lo, hi, bin, count(*) AS n FROM binned GROUP BY 1, 2, 3, 4
    ),
    c AS (
      SELECT k, lo, hi, bin,
             CAST(sum(n) OVER (PARTITION BY k ORDER BY bin
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(n) OVER (PARTITION BY k) AS BIGINT) AS total
      FROM g
    ),
    qs AS (
      SELECT k,
             lo + min(CASE WHEN cum * 20 >= total * 10 THEN bin END)
                  * ((hi - lo) / 64) AS price_q50,
             lo + min(CASE WHEN cum * 20 >= total * 19 THEN bin END)
                  * ((hi - lo) / 64) AS price_q95
      FROM c GROUP BY k, lo, hi
    )
    SELECT hll.k AS l_returnflag, hll.approx_parts, qs.price_q50, qs.price_q95
    FROM hll JOIN qs ON hll.k = qs.k
    """


@query("approx_aggregates", oracle=_approx_agg_oracle())
def q_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx aggregates per returnflag, fully oracle-checked: explicit-register HLL raw estimate of distinct partkeys + 64-bin histogram quantile estimates (q50/q95 of extendedprice).

    Scale shape: one (flag, bucket) shuffle for the HLL registers, one
    (flag, bin) shuffle for the histogram; the cumulative window runs
    over <= 64 bins per flag — both states are summary-sized and
    mergeable (max / sum), so incremental maintenance never rescans
    history. Quantile estimate = left edge of the first bin whose
    cumulative share reaches q (error <= one bin width); the distinct
    estimate is the raw HLL form — pure integer arithmetic + one
    double division, replayed bit-for-bit by DuckDB."""
    from datalake_etlscripts_spark.operators import sketches

    li = read_table(spark, sf_dir, "lineitem")
    est = sketches.hll_register_estimate(
        sketches.hll_register_table(li, ["l_returnflag"], "l_partkey"),
        alias="approx_parts",
    )
    mm = (
        li.filter(F.col("l_extendedprice").isNotNull())
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("_lo"),
            F.max("l_extendedprice").alias("_hi"),
        )
    )
    binned = (
        li.filter(F.col("l_extendedprice").isNotNull())
        .join(F.broadcast(mm), "l_returnflag")
        .select(
            "l_returnflag",
            "_lo",
            "_hi",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("bigint"))
            .otherwise(
                F.least(
                    F.lit(63).cast("bigint"),
                    F.floor(
                        (F.col("l_extendedprice") - F.col("_lo"))
                        * 64
                        / (F.col("_hi") - F.col("_lo"))
                    ),
                )
            )
            .alias("bin"),
        )
    )
    g = binned.groupBy("l_returnflag", "_lo", "_hi", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window as W

    wc = W.partitionBy("l_returnflag").orderBy("bin").rowsBetween(
        W.unboundedPreceding, 0
    )
    wt = W.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "_lo",
        "_hi",
        "bin",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("total"),
    )
    width = (F.col("_hi") - F.col("_lo")) / 64
    qs = c.groupBy("l_returnflag", "_lo", "_hi").agg(
        F.min(F.when(F.col("cum") * 20 >= F.col("total") * 10, F.col("bin"))).alias(
            "_b50"
        ),
        F.min(F.when(F.col("cum") * 20 >= F.col("total") * 19, F.col("bin"))).alias(
            "_b95"
        ),
    ).select(
        "l_returnflag",
        (F.col("_lo") + F.col("_b50") * width).alias("price_q50"),
        (F.col("_lo") + F.col("_b95") * width).alias("price_q95"),
    )
    return est.join(qs, "l_returnflag")


@query(
    "exact_distinct_quantiles",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    med AS (
      SELECT l_returnflag, l_extendedprice AS median_price
      FROM ranked WHERE rn = (n + 1) // 2
    )
    SELECT g.l_returnflag, g.n_parts, m.median_price FROM (
      SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY l_returnflag
    ) g JOIN med m USING (l_returnflag)
    """,
)
def q_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct + exact lower-median (explicit rank selection —
    engines disagree on median interpolation, so the quantile is
    defined as the element at rank (n+1)/2, fully deterministic)."""
    from pyspark.sql import Window as W

    li = read_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wc = W.partitionBy("l_returnflag")
    med = (
        li.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == ((F.col("n") + 1) / 2).cast("long"))
        .select("l_returnflag", F.col("l_extendedprice").alias("median_price"))
    )
    counts = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts")
    )
    return counts.join(med, "l_returnflag")


# ---------------------------------------------------------------------------
# J8: pointer chase to fixpoint over an artificial 2-hop chain
# (follow_version semantics, ntp_entry.py:95-109) — chains built from
# orders keys: k → k+1 → k+2 for k % 100 == 0
# ---------------------------------------------------------------------------
@query(
    "pointer_chase",
    oracle="""
    WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderkey <= 3000),
    chain AS (
      SELECT printf('ntp%08d', k) AS _id,
             CASE WHEN k % 100 = 0 AND EXISTS (SELECT 1 FROM keys k2 WHERE k2.k = keys.k + 1)
                  THEN printf('ntp%08d', k + 1)
                  WHEN k % 100 = 1 AND EXISTS (SELECT 1 FROM keys k2 WHERE k2.k = keys.k + 1)
                  THEN printf('ntp%08d', k + 1)
                  ELSE NULL END AS updated_to
      FROM keys
    ),
    -- chase to fixpoint (chains here are ≤ 2 hops)
    step1 AS (
      SELECT c._id, coalesce(n.updated_to, c.updated_to, c._id) AS r
      FROM chain c LEFT JOIN chain n ON c.updated_to = n._id
    )
    SELECT _id, r AS resolved_id FROM step1
    """,
)
def q_pointer_chase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """updated_to pointer chase to fixpoint: iterative self-join resolves chains to their terminal version."""
    from datalake_etlscripts_spark.versioning import follow_version

    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    keys = o.select(F.col("o_orderkey").alias("k")).distinct()
    nxt = keys.select((F.col("k") - 1).alias("k_prev"))
    chain = (
        keys.join(nxt, keys.k == nxt.k_prev, "left")
        .select(
            format_ntp_id(F.col("k")).alias("_id"),
            F.when(
                ((F.col("k") % 100 == 0) | (F.col("k") % 100 == 1))
                & F.col("k_prev").isNotNull(),
                format_ntp_id(F.col("k") + 1),
            ).alias("updated_to"),
        )
    )
    state = chain.select(
        "_id",
        F.lit("x").alias("id"),
        F.lit(None).cast("array<string>").alias("updated"),
        F.col("updated_to").isNotNull().alias("obsolete_version"),
        "updated_to",
    )
    return follow_version(state).select("_id", "resolved_id")


# ---------------------------------------------------------------------------
# unpivot (stack): wide per-status counts back to long form —
# the inverse of pivot_status_by_priority
# ---------------------------------------------------------------------------
@query(
    "unpivot_counts",
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'F' AS status, f_cnt AS cnt FROM wide
    UNION ALL
    SELECT o_orderpriority, 'O', o_cnt FROM wide
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot of wide per-status counts back to long rows - inverse of the pivot query."""
    o = read_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
        )
    )
    return wide.unpivot(
        ["o_orderpriority"], ["f_cnt", "o_cnt"], "status_col", "cnt"
    ).select(
        "o_orderpriority",
        F.when(F.col("status_col") == "f_cnt", "F").otherwise("O").alias("status"),
        "cnt",
    )


# ---------------------------------------------------------------------------
# mergeable HLL state (operators/sketches.py): distinct customers per
# priority built INCREMENTALLY from two half-batches, grand total
# derived by max-merging the per-priority registers — the fact table
# is scanned once per batch, never re-scanned. Registered query uses
# the EXPLICIT-REGISTER HLL (md5 lanes, raw estimator — pure integer
# + one double division), so DuckDB replays the estimate bit-for-bit;
# the DataSketches path (distinct_sketch_table/hll_union) remains the
# production-accuracy variant, exercised in tests/test_modules.py.
# ---------------------------------------------------------------------------
def _hll_oracle() -> str:
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
    return f"""
    WITH src AS (
      SELECT o_orderpriority AS k, o_custkey AS v
      FROM orders WHERE o_custkey IS NOT NULL
    ),
    h0 AS (SELECT k, {ddb_hex32("md5(CAST(v AS VARCHAR))")} AS h FROM src),
    h AS (SELECT k, h & {HLL_BUCKETS - 1} AS bucket, h >> {8} AS w FROM h0),
    regs AS (
      SELECT k, bucket, max(CASE {ladder} ELSE {HLL_WORD_BITS + 1} END) AS reg
      FROM h GROUP BY 1, 2
    ),
    per AS (
      SELECT k, sum(CAST(1 AS BIGINT) << ({HLL_WORD_BITS + 1} - reg)) AS s,
             count(*) AS nb
      FROM regs GROUP BY 1
    ),
    regs_total AS (SELECT bucket, max(reg) AS reg FROM regs GROUP BY 1),
    tot AS (
      SELECT sum(CAST(1 AS BIGINT) << ({HLL_WORD_BITS + 1} - reg)) AS s,
             count(*) AS nb
      FROM regs_total
    )
    SELECT k AS o_orderpriority,
           {HLL_EST_NUM!r} / (s + ({HLL_BUCKETS} - nb) * {scale}) AS approx_distinct,
           'priority' AS level
    FROM per
    UNION ALL
    SELECT '__all__', {HLL_EST_NUM!r} / (s + ({HLL_BUCKETS} - nb) * {scale}), 'total'
    FROM tot
    """


@query("approx_distinct_incremental", oracle=_hll_oracle())
def q_approx_distinct_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-register HLL distinct state built from two half-batches, max-merged, with the raw estimator - plus an __all__ rollup."""
    from datalake_etlscripts_spark.operators import sketches

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_custkey"
    )
    halves = [o.filter(F.col("o_orderkey") % 2 == i) for i in (0, 1)]
    state = sketches.merge_hll_register_tables(
        *[
            sketches.hll_register_table(h, ["o_orderpriority"], "o_custkey")
            for h in halves
        ]
    )
    per = sketches.hll_register_estimate(state).withColumn("level", F.lit("priority"))
    total = (
        sketches.hll_register_estimate(sketches.rollup_hll_registers(state, []))
        .withColumn("o_orderpriority", F.lit("__all__"))
        .withColumn("level", F.lit("total"))
    )
    return per.unionByName(total)


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable FREQUENCY state (operators/sketches.py) —
# per-half-corpus sketches counter-sum into one state (exact merge:
# sketching halves and merging EQUALS sketching the whole, which is
# why the oracle can sketch the whole corpus in one pass), then the
# exact top-20 terms are point-estimated against the merged state.
# Estimates are deterministic given the hash lanes, so with the
# md5-derived lane scheme (DuckDB has no xxhash64) the twin below
# replays the exact bucket arithmetic — overcounts and all — and the
# query is fully oracle-checked, like the histogram sketch.
# ---------------------------------------------------------------------------
from datalake_etlscripts_spark.operators.sketches import (  # noqa: E402
    CMS_WIDTH as CMS_WIDTH_SQL,
)
from datalake_etlscripts_spark.plans.registry import ddb_hex32 as _ddb_hex32  # noqa: E402

_CMS_ORACLE = f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT term, count(*) AS exact_count FROM tok GROUP BY term),
    hh AS (
      SELECT term, exact_count,
             {_ddb_hex32("md5(term || '|101')")} AS h1,
             {_ddb_hex32("md5(term || '|202')")} AS h2
      FROM tf
    ),
    lanes AS (
      SELECT term, exact_count, d.d AS depth,
             (h1 + d.d * h2) % {CMS_WIDTH_SQL} AS bucket
      FROM hh CROSS JOIN (VALUES (0), (1), (2), (3), (4)) d(d)
    ),
    counters AS (
      SELECT depth, bucket, sum(exact_count) AS n FROM lanes GROUP BY 1, 2
    ),
    top AS (
      SELECT term, exact_count FROM tf
      ORDER BY exact_count DESC, term LIMIT 20
    )
    SELECT t.term, t.exact_count, CAST(min(c.n) AS BIGINT) AS approx_count
    FROM top t
    JOIN lanes l ON t.term = l.term
    JOIN counters c ON l.depth = c.depth AND l.bucket = c.bucket
    GROUP BY t.term, t.exact_count
"""


@query("approx_topk_terms", oracle=_CMS_ORACLE)
def q_approx_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min top-k terms (md5 lanes): mergeable counter state, min-over-depths estimates."""
    from datalake_etlscripts_spark.operators import sketches
    from datalake_etlscripts_spark.operators.text import tokens

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("term"))
    halves = [toks.filter(F.crc32(F.col("term")) % 2 == i) for i in (0, 1)]
    state = sketches.merge_cms_tables(
        *[sketches.cms_sketch_table(h, "term", scheme="md5") for h in halves]
    ).localCheckpoint()
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), "term")
        .limit(20)
    )
    return (
        sketches.cms_estimate(state, top.select("term"), "term", scheme="md5")
        .join(top, "term")
        .select("term", "exact_count", "approx_count")
    )


# ---------------------------------------------------------------------------
# Histogram-state quantiles (operators/sketches.py): mergeable (bin, n)
# counters; per-half sketches bin-sum into one state (exact merge,
# asserted in tests) and quantiles read off the cumulative bins. The
# integer binning + bin-edge arithmetic is deterministic, so this one
# IS oracle-checkable, unlike the HLL/CMS estimates.
# ---------------------------------------------------------------------------
_H_LO, _H_HI, _H_BINS = 0.0, 110000.0, 1024
_H_W = (_H_HI - _H_LO) / _H_BINS


@query(
    "approx_quantiles_incremental",
    oracle=f"""
    WITH h AS (
      SELECT least(greatest(CAST(floor(l_extendedprice / {_H_W!r}) AS INT), 0),
                   {_H_BINS - 1}) AS bin,
             count(*) AS n
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT bin, sum(n) OVER (ORDER BY bin) AS cum, sum(n) OVER () AS total
      FROM h
    )
    SELECT q, {_H_LO!r} + min_bin * {_H_W!r} AS estimate
    FROM (
      SELECT CAST(v.q AS DOUBLE) AS q, min(c.bin) AS min_bin
      FROM (VALUES (0.25), (0.5), (0.75), (0.9)) v(q)
      JOIN c ON c.cum >= ceil(CAST(v.q AS DOUBLE) * c.total)
      GROUP BY 1
    )
    """,
)
def q_approx_quantiles_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles built from two half-batches and merged - mergeable quantile state with exact bin arithmetic."""
    from datalake_etlscripts_spark.operators import sketches

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    halves = [li.filter(F.col("l_orderkey") % 2 == i) for i in (0, 1)]
    state = sketches.merge_histogram_tables(
        *[
            sketches.histogram_sketch_table(h, "l_extendedprice", _H_LO, _H_HI, _H_BINS)
            for h in halves
        ]
    )
    return sketches.histogram_quantiles(
        state, [0.25, 0.5, 0.75, 0.9], _H_LO, _H_HI, _H_BINS
    )


# ---------------------------------------------------------------------------
# Z-order key (io/layout.py): bit-interleave of integer-quantized
# columns — the clustering key behind cluster_write's data-skipping
# layout. Quantization here is integer modulo so DuckDB reproduces the
# key bit-exactly; the layout effect itself (fewer candidate files for
# box predicates) is asserted in tests/test_writers_skew.py.
# ---------------------------------------------------------------------------
_Z_TERMS = " | ".join(
    f"((((l_partkey % 256) >> {i}) & 1) << {2 * i})"
    f" | ((((l_suppkey % 256) >> {i}) & 1) << {2 * i + 1})"
    for i in range(8)
)


@query(
    "zorder_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_Z_TERMS} AS BIGINT) AS zkey
    FROM lineitem
    """,
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (bit-interleaved) clustering key for multi-column data skipping - pure integer expressions."""
    from datalake_etlscripts_spark.io.layout import interleave_bits

    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        interleave_bits(
            [F.col("l_partkey") % 256, F.col("l_suppkey") % 256], bits=8
        ).alias("zkey"),
    )


# ---------------------------------------------------------------------------
# Hilbert-curve clustering key: the locality-preserving alternative to
# zorder_key; the oracle replays the rotate/flip state machine with a
# list_reduce over the same bit weights
# ---------------------------------------------------------------------------
_H_BITS = 8


def _hilbert_oracle(bits: int = _H_BITS) -> str:
    """Unrolled rotate/flip rounds (DuckDB 1.0's list_reduce has no
    initial-accumulator form, so the fold unrolls to one CTE per bit
    level — each round materializes (x, y, d) columns, same integer
    arithmetic as the Spark-side struct fold)."""
    parts = [
        """
    WITH r0 AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_partkey % 256 AS BIGINT) AS x,
             CAST(l_suppkey % 256 AS BIGINT) AS y,
             CAST(0 AS BIGINT) AS d
      FROM lineitem
    )"""
    ]
    for r, i in enumerate(range(bits - 1, -1, -1), start=1):
        sv = 1 << i
        rx = f"(CASE WHEN (x & {sv}) <> 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {sv}) <> 0 THEN 1 ELSE 0 END)"
        parts.append(
            f""",
    r{r} AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN {ry} = 0
                  THEN CASE WHEN {rx} = 1 THEN {sv} - 1 - y ELSE y END
                  ELSE x END AS x,
             CASE WHEN {ry} = 0
                  THEN CASE WHEN {rx} = 1 THEN {sv} - 1 - x ELSE x END
                  ELSE y END AS y,
             d + {sv} * {sv} * xor(3 * {rx}, {ry}) AS d
      FROM r{r - 1}
    )"""
        )
    parts.append(
        f"\n    SELECT l_orderkey, l_linenumber, d AS hkey FROM r{bits}"
    )
    return "".join(parts)


@query("hilbert_key", oracle=_hilbert_oracle())
def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key (locality-preserving space-filling curve) - per-bit rotate/flip state machine as one integer fold."""
    from datalake_etlscripts_spark.io.layout import hilbert_index

    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        hilbert_index(
            F.col("l_partkey") % 256, F.col("l_suppkey") % 256, bits=_H_BITS
        ).alias("hkey"),
    )


# ---------------------------------------------------------------------------
# INCREMENTAL data card: the corpus_stats report maintained from CDC
# deltas instead of a rescan — counts add/subtract exactly, the length
# distribution lives in mergeable histogram bins (negate_histogram for
# deletes), the vocabulary in add-only HLL registers (deletes need a
# rebuild — the documented HLL limitation, so the vocab figure is
# "tokens ever seen"). Delta scenario: base = doc_id % 4 <> 3,
# adds = % 4 = 3, deletes = base rows with % 7 = 0.
# ---------------------------------------------------------------------------
_DC_LO, _DC_HI, _DC_BINS = 0.0, 256.0, 256
_DC_W = (_DC_HI - _DC_LO) / _DC_BINS


def _dc_oracle() -> str:
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
    return f"""
    WITH tk AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS dl,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    base AS (SELECT * FROM tk WHERE doc_id % 4 <> 3),
    added AS (SELECT * FROM tk WHERE doc_id % 4 = 3),
    removed AS (SELECT * FROM base WHERE doc_id % 7 = 0),
    live AS (
      SELECT * FROM base WHERE doc_id % 7 <> 0
      UNION ALL SELECT * FROM added
    ),
    counts AS (
      SELECT count(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_tokens FROM live
    ),
    h AS (
      SELECT least(greatest(CAST(floor(dl / {_DC_W!r}) AS INT), 0), {_DC_BINS - 1}) AS bin,
             count(*) AS n
      FROM live GROUP BY 1
    ),
    c AS (SELECT bin, sum(n) OVER (ORDER BY bin) AS cum, sum(n) OVER () AS total FROM h),
    p50 AS (SELECT {_DC_LO!r} + min(bin) * {_DC_W!r} AS p50_len FROM c
            WHERE cum >= ceil(0.5 * total)),
    p95 AS (SELECT {_DC_LO!r} + min(bin) * {_DC_W!r} AS p95_len FROM c
            WHERE cum >= ceil(0.95 * total)),
    seen AS (
      SELECT unnest(toks) AS v FROM base
      UNION ALL SELECT unnest(toks) FROM added
    ),
    h0 AS (SELECT {ddb_hex32("md5(v)")} AS hh FROM seen),
    hb AS (SELECT hh & {HLL_BUCKETS - 1} AS bucket, hh >> 8 AS w FROM h0),
    regs AS (SELECT bucket, max(CASE {ladder} ELSE {HLL_WORD_BITS + 1} END) AS reg
             FROM hb GROUP BY 1),
    hll AS (
      SELECT {HLL_EST_NUM!r} /
             (sum(CAST(1 AS BIGINT) << ({HLL_WORD_BITS + 1} - reg))
              + ({HLL_BUCKETS} - count(*)) * {scale}) AS vocab_seen_est
      FROM regs
    )
    SELECT counts.n_docs, counts.total_tokens,
           CAST(counts.total_tokens AS DOUBLE) / counts.n_docs AS mean_len,
           p50.p50_len, p95.p95_len, hll.vocab_seen_est
    FROM counts, p50, p95, hll
    """


@query("corpus_stats_incremental", oracle=_dc_oracle())
def q_corpus_stats_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental data card: counts/mean maintained exactly from CDC deltas, length quantiles from signed histogram bins, vocabulary from add-only HLL registers - the corpus is never rescanned."""
    from datalake_etlscripts_spark.operators import sketches, text

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = text.tokens(F.col("text"))
    dl = d.select("doc_id", F.size(toks).cast("long").alias("dl"), toks.alias("toks"))
    base = dl.filter(F.col("doc_id") % 4 != 3)
    added = dl.filter(F.col("doc_id") % 4 == 3)
    removed = base.filter(F.col("doc_id") % 7 == 0)

    def cnt(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("t")
        )

    counts = (
        cnt(base).crossJoin(F.broadcast(cnt(added).withColumnRenamed("n", "na").withColumnRenamed("t", "ta")))
        .crossJoin(F.broadcast(cnt(removed).withColumnRenamed("n", "nr").withColumnRenamed("t", "tr")))
        .select(
            (F.col("n") + F.col("na") - F.col("nr")).alias("n_docs"),
            (F.col("t") + F.col("ta") - F.col("tr")).alias("total_tokens"),
        )
    )
    hist = sketches.merge_histogram_tables(
        sketches.histogram_sketch_table(base, "dl", _DC_LO, _DC_HI, _DC_BINS),
        sketches.histogram_sketch_table(added, "dl", _DC_LO, _DC_HI, _DC_BINS),
        sketches.negate_histogram(
            sketches.histogram_sketch_table(removed, "dl", _DC_LO, _DC_HI, _DC_BINS)
        ),
    ).filter(F.col("n") != 0)
    quant = sketches.histogram_quantiles(hist, [0.5, 0.95], _DC_LO, _DC_HI, _DC_BINS)
    p50 = quant.filter(F.col("q") == 0.5).select(F.col("estimate").alias("p50_len"))
    p95 = quant.filter(F.col("q") == 0.95).select(F.col("estimate").alias("p95_len"))
    tokens_seen = base.unionByName(added).select(F.explode("toks").alias("v"))
    vocab_state = sketches.merge_hll_register_tables(
        sketches.hll_register_table(tokens_seen, [], "v")
    )
    vocab = sketches.hll_register_estimate(vocab_state, alias="vocab_seen_est")
    return (
        counts.crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p95))
        .crossJoin(F.broadcast(vocab))
        .select(
            "n_docs",
            "total_tokens",
            (F.col("total_tokens").cast("double") / F.col("n_docs")).alias("mean_len"),
            "p50_len",
            "p95_len",
            "vocab_seen_est",
        )
    )


# ---------------------------------------------------------------------------
# APPROXIMATE corpus overlap via HLL inclusion–exclusion: est(A∩B) ≈
# est(A) + est(B) − est(A∪B), where the union estimate comes from
# max-MERGING the two register states — never touching raw data again.
# The sketch-composition twin of corpus_overlap's exact semi-join: at
# 100 TB the two corpora summarize to 256 registers each and the
# overlap question costs one register merge. Same raw-estimator
# arithmetic as approx_distinct_incremental → oracle-checkable.
# ---------------------------------------------------------------------------
def _overlap_hll_oracle() -> str:
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
    WITH tk AS (
      SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    sh AS (
      SELECT source IN ('src0','src1','src2','src3','src4') AS in_a,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS s
      FROM tk
    ),
    h AS (SELECT in_a, {ddb_hex32("md5(s)")} AS hh FROM sh),
    hb AS (SELECT in_a, hh & {HLL_BUCKETS - 1} AS bucket, hh >> 8 AS w FROM h),
    regs AS (
      SELECT in_a, bucket, max(CASE {ladder} ELSE {HLL_WORD_BITS + 1} END) AS reg
      FROM hb GROUP BY 1, 2
    ),
    ea AS (SELECT {est} AS e FROM regs WHERE in_a),
    eb AS (SELECT {est} AS e FROM regs WHERE NOT in_a),
    eu AS (SELECT {est} AS e FROM (
             SELECT bucket, max(reg) AS reg FROM regs GROUP BY bucket) regs),
    m AS (SELECT ea.e AS est_a, eb.e AS est_b, eu.e AS est_union FROM ea, eb, eu)
    SELECT est_a, est_b, est_union,
           est_a + est_b - est_union AS est_overlap,
           (est_a + est_b - est_union) / est_a AS containment_a_in_b_est
    FROM m
    """


@query("corpus_overlap_approx", oracle=_overlap_hll_oracle())
def q_corpus_overlap_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate corpus overlap from HLL register states: est(A)+est(B)-est(union-of-merged-registers) - two 256-register sketches answer the overlap question without re-reading either corpus."""
    from datalake_etlscripts_spark.operators import sketches, text

    d = read_table(spark, sf_dir, "documents").select("source", "text")
    sh = d.select(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4").alias("in_a"),
        F.explode(text.shingles(F.col("text"), 5)).alias("s"),
    )
    state = sketches.hll_register_table(sh, ["in_a"], "s")

    def est(st, name):
        return sketches.hll_register_estimate(
            st.select("bucket", "register"), alias=name
        )

    ea = est(state.filter(F.col("in_a")), "est_a")
    eb = est(state.filter(~F.col("in_a")), "est_b")
    eu = est(sketches.rollup_hll_registers(state, []), "est_union")
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .select(
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias("est_overlap"),
            (
                (F.col("est_a") + F.col("est_b") - F.col("est_union")) / F.col("est_a")
            ).alias("containment_a_in_b_est"),
        )
    )


# ---------------------------------------------------------------------------
# layout pruning audit (r4): WHY the z-order key exists, measured. The
# same rows are laid out two ways — insertion order (l_orderkey
# ranges) vs z-key ranges (how cluster_write range-partitions) — and a
# 16x16 box predicate on the two quantized dims is tested against
# each file's min/max zone map. files_scanned / n_files is the
# fraction of the table a data-skipping reader must touch: the
# z-layout concentrates both dims, insertion order prunes (almost)
# nothing. Pure aggregates — no global sort; file ids come from key
# ranges exactly like a range-partitioned writer.
# ---------------------------------------------------------------------------
@query(
    "layout_pruning_audit",
    oracle=f"""
    WITH r AS (
      SELECT l_orderkey, l_partkey % 256 AS qp, l_suppkey % 256 AS qs,
             CAST({_Z_TERMS} AS BIGINT) AS zkey
      FROM lineitem
    ),
    files AS (
      SELECT 'natural' AS layout, l_orderkey // 256 AS file, qp, qs FROM r
      UNION ALL
      SELECT 'zorder', zkey // 256, qp, qs FROM r
    ),
    zones AS (
      SELECT layout, file, min(qp) AS min_p, max(qp) AS max_p,
             min(qs) AS min_s, max(qs) AS max_s, count(*) AS n_rows
      FROM files GROUP BY 1, 2
    )
    SELECT layout, count(*) AS n_files,
           CAST(sum(CASE WHEN max_p >= 16 AND min_p <= 31
                          AND max_s >= 32 AND min_s <= 47
                         THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(sum(CASE WHEN max_p >= 16 AND min_p <= 31
                          AND max_s >= 32 AND min_s <= 47
                         THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(sum(CASE WHEN max_p >= 16 AND min_p <= 31
                          AND max_s >= 32 AND min_s <= 47
                         THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
             AS scan_fraction
    FROM zones GROUP BY layout
    """,
)
def q_layout_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning audit: files_scanned for a 2-dim box predicate under insertion-order vs z-order range layout - the measured case for clustering keys, aggregates only (file ids = key ranges, no global sort)."""
    from datalake_etlscripts_spark.io.layout import interleave_bits

    li = read_table(spark, sf_dir, "lineitem")
    r = li.select(
        "l_orderkey",
        (F.col("l_partkey") % 256).alias("qp"),
        (F.col("l_suppkey") % 256).alias("qs"),
        interleave_bits(
            [F.col("l_partkey") % 256, F.col("l_suppkey") % 256], bits=8
        ).alias("zkey"),
    )
    files = r.select(
        F.lit("natural").alias("layout"),
        F.expr("l_orderkey div 256").alias("file"),
        "qp",
        "qs",
    ).unionByName(
        r.select(
            F.lit("zorder").alias("layout"),
            F.expr("zkey div 256").alias("file"),
            "qp",
            "qs",
        )
    )
    zones = files.groupBy("layout", "file").agg(
        F.min("qp").alias("min_p"),
        F.max("qp").alias("max_p"),
        F.min("qs").alias("min_s"),
        F.max("qs").alias("max_s"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    hit = (
        (F.col("max_p") >= 16)
        & (F.col("min_p") <= 31)
        & (F.col("max_s") >= 32)
        & (F.col("min_s") <= 47)
    )
    return zones.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("files_scanned"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).alias("rows_scanned"),
        (
            F.sum(F.when(hit, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("scan_fraction"),
    )


# ---------------------------------------------------------------------------
# KMV/theta-sketch corpus overlap (r4): the order-statistic sibling of
# corpus_overlap_approx. HLL can only reach an intersection through
# inclusion-exclusion (error grows with set sizes); the KMV sketches'
# common-hashes-below-θ* sample estimates the intersection DIRECTLY,
# and the whole sketch is deterministic (the k smallest 60-bit hashes
# are a property of the set), so DuckDB replays it bit-for-bit.
# ---------------------------------------------------------------------------
def _kmv_overlap_oracle(k: int = 256) -> str:
    from datalake_etlscripts_spark.operators.sketches import KMV_HASH_SPACE
    from datalake_etlscripts_spark.plans.registry import ddb_hex60

    return f"""
    WITH tk AS (
      SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    sh AS (
      SELECT source IN ('src0','src1','src2','src3','src4') AS in_a,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS s
      FROM tk
    ),
    h AS (SELECT DISTINCT in_a, {ddb_hex60("md5(s)")} AS h FROM sh),
    sk AS (
      SELECT in_a, h, row_number() OVER (PARTITION BY in_a ORDER BY h) AS pos
      FROM h QUALIFY pos <= {k}
    ),
    ka AS (SELECT max(h) AS kth_a, count(*) AS nka FROM sk WHERE in_a),
    kb AS (SELECT max(h) AS kth_b, count(*) AS nkb FROM sk WHERE NOT in_a),
    th AS (
      SELECT kth_a, kth_b,
             least(CASE WHEN nka < {k} THEN {KMV_HASH_SPACE} ELSE kth_a END,
                   CASE WHEN nkb < {k} THEN {KMV_HASH_SPACE} ELSE kth_b END)
               AS theta
      FROM ka, kb
    ),
    common AS (
      SELECT a.h FROM (SELECT h FROM sk WHERE in_a) a
      JOIN (SELECT h FROM sk WHERE NOT in_a) b USING (h)
    ),
    ncom AS (SELECT count(*) AS n_common FROM common, th WHERE h <= theta),
    nuni AS (
      SELECT count(*) AS n_union_theta
      FROM (SELECT DISTINCT h FROM sk) u, th WHERE u.h <= theta
    )
    SELECT kth_a, kth_b, theta, n_common, n_union_theta,
           CAST(CAST(CAST(n_common AS HUGEINT) * {KMV_HASH_SPACE} AS VARCHAR)
                AS DOUBLE)
             / CAST(theta AS DOUBLE) AS est_intersection,
           CAST(n_common AS DOUBLE) / CAST(n_union_theta AS DOUBLE)
             AS jaccard_est
    FROM th, ncom, nuni
    """


@query("kmv_overlap", oracle=_kmv_overlap_oracle())
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch corpus overlap: k=256 smallest 60-bit shingle hashes per corpus half, direct intersection estimate from common hashes below theta* - deterministic order-statistic sketch, exact distributed k-min, sketch-sized joins only."""
    from datalake_etlscripts_spark.operators import sketches, text

    d = read_table(spark, sf_dir, "documents").select("source", "text")
    sh = d.select(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4").alias("in_a"),
        F.explode(text.shingles(F.col("text"), 5)).alias("s"),
    )
    sk = sketches.kmv_sketch_table(sh, ["in_a"], "s", k=256)
    a = sk.filter(F.col("in_a")).select("pos", "h")
    b = sk.filter(~F.col("in_a")).select("pos", "h")
    return sketches.kmv_overlap_estimate(a, b, k=256)


# ---------------------------------------------------------------------------
# GDPR erasure planning (r4): the lakehouse delete-propagation shape.
# A right-to-be-forgotten batch (every 211th customer) must remove all
# its orders; per affected file the planner chooses Delta's two
# mechanisms — a DELETION VECTOR (tombstone the rows, cheap, read-time
# mask) when few rows die, a full REWRITE when the deleted fraction
# passes 20% (the point where dragging dead rows through every future
# scan costs more than one rewrite). Files derive from insertion-order
# key ranges (o_orderkey div 1024) like the layout audits — aggregates
# only, no global sort; the erasure keys are a broadcast semi-join.
# ---------------------------------------------------------------------------
@query(
    "deletion_vector_plan",
    oracle="""
    WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 211 = 0),
    o AS (
      SELECT o_orderkey // 1024 AS file_id,
             CASE WHEN d.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS dead
      FROM orders LEFT JOIN del d ON o_custkey = d.c_custkey
    ),
    files AS (
      SELECT file_id, count(*) AS n_rows,
             CAST(sum(dead) AS BIGINT) AS n_deleted
      FROM o GROUP BY file_id
    )
    SELECT file_id, n_rows, n_deleted,
           CASE WHEN n_deleted = 0 THEN 'untouched'
                WHEN n_deleted * 5 >= n_rows THEN 'rewrite'
                ELSE 'deletion_vector' END AS action
    FROM files
    """,
)
def q_deletion_vector_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR erasure plan: per insertion-range file, rows killed by the forget-batch and the Delta-style action (deletion vector vs rewrite at 20% dead) - broadcast semi-join + one aggregate, integer-only decision rule."""
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 211 == 0
    ).select(F.col("c_custkey").alias("o_custkey"))
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    flagged = o.join(
        F.broadcast(c.withColumn("_dead", F.lit(1))), "o_custkey", "left"
    ).select(
        F.expr("o_orderkey div 1024").alias("file_id"),
        F.coalesce(F.col("_dead"), F.lit(0)).alias("dead"),
    )
    files = flagged.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("dead").cast("bigint").alias("n_deleted"),
    )
    return files.select(
        "file_id",
        "n_rows",
        "n_deleted",
        F.when(F.col("n_deleted") == 0, F.lit("untouched"))
        .when(F.col("n_deleted") * 5 >= F.col("n_rows"), F.lit("rewrite"))
        .otherwise(F.lit("deletion_vector"))
        .alias("action"),
    )


# ---------------------------------------------------------------------------
# KMV rollup (r4): the order-statistic twin of rollup_hll_registers —
# distinct customers per nation as 64-hash KMV state, rolled to the
# region grain by re-taking the k smallest over each region's nation
# sketches (the sketch is a monoid: kmin(A ∪ B) = kmin(kmin(A) ∪
# kmin(B))), never re-touching the customer table. Estimates are
# (k−1)·2^60/h_(k), one double division of exact integers; sub-k
# groups estimate exactly.
# ---------------------------------------------------------------------------
def _kmv_rollup_oracle(k: int = 64) -> str:
    from datalake_etlscripts_spark.operators.sketches import KMV_HASH_SPACE
    from datalake_etlscripts_spark.plans.registry import ddb_hex60

    return f"""
    WITH f AS (
      SELECT n.n_regionkey AS region, c.c_nationkey AS nation,
             {ddb_hex60("md5(CAST(c.c_custkey AS VARCHAR))")} AS h
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    dh AS (SELECT DISTINCT region, nation, h FROM f),
    skn AS (
      SELECT region, nation, h,
             row_number() OVER (PARTITION BY region, nation ORDER BY h) AS pos
      FROM dh QUALIFY pos <= {k}
    ),
    skr AS (
      SELECT region, h,
             row_number() OVER (PARTITION BY region ORDER BY h) AS pos
      FROM (SELECT DISTINCT region, h FROM skn)
      QUALIFY pos <= {k}
    ),
    agg AS (
      SELECT region, count(*) AS n_k, max(h) AS kth FROM skr GROUP BY region
    )
    SELECT region, CAST(n_k AS BIGINT) AS n_k, kth,
           CASE WHEN n_k < {k} THEN CAST(n_k AS DOUBLE)
                ELSE CAST(CAST(CAST(n_k - 1 AS HUGEINT) * {KMV_HASH_SPACE}
                               AS VARCHAR) AS DOUBLE)
                     / CAST(kth AS DOUBLE)
           END AS est_distinct
    FROM agg
    """


@query("kmv_rollup_distinct", oracle=_kmv_rollup_oracle())
def q_kmv_rollup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch rollup: per-nation 64-hash customer sketches max-merge... k-min-merge to the region grain without re-scanning the fact table - monoid law, sketch-sized windows only."""
    from pyspark.sql import Window

    from datalake_etlscripts_spark.operators import sketches

    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_regionkey").alias("region"),
    )
    f = c.join(F.broadcast(n), "c_nationkey").select(
        "region", F.col("c_nationkey").alias("nation"), "c_custkey"
    )
    skn = sketches.kmv_sketch_table(f, ["region", "nation"], "c_custkey", k=64)
    w = Window.partitionBy("region").orderBy("h")
    skr = (
        skn.select("region", "h")
        .dropDuplicates()
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 64)
    )
    return sketches.kmv_estimate(skr, ["region"], k=64).select(
        "region",
        F.col("n_k").cast("long").alias("n_k"),
        "kth",
        "est_distinct",
    )


# ---------------------------------------------------------------------------
# CMS join-size estimation (r4): the optimizer's sketch trick — the
# inner product of two count-min states estimates |A ⋈ B| (AGMS-style
# Σ_k a_k·b_k), and a state's self-inner-product estimates the F2
# self-join size, without materializing either join. Estimates are
# min-over-depths of exact integer dot products, so the whole query is
# oracle-hashable. The deciding input for broadcast-vs-shuffle and
# skew-mitigation choices before a big join runs.
# ---------------------------------------------------------------------------
def _join_size_oracle() -> str:
    def lanes(src: str, name: str) -> str:
        h1 = _ddb_hex32(f"md5(CAST(k AS VARCHAR) || '|101')")
        h2 = _ddb_hex32(f"md5(CAST(k AS VARCHAR) || '|202')")
        return f"""
    {name}h AS (SELECT k, c, {h1} AS h1, {h2} AS h2 FROM {src}),
    {name}l AS (
      SELECT k, c, d.d AS depth, (h1 + d.d * h2) % {CMS_WIDTH_SQL} AS bucket
      FROM {name}h CROSS JOIN (VALUES (0), (1), (2), (3), (4)) d(d)
    ),
    {name}c AS (SELECT depth, bucket, CAST(sum(c) AS BIGINT) AS n
                FROM {name}l GROUP BY 1, 2)"""

    return f"""
    WITH af AS (SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
    bf AS (SELECT p_partkey AS k, count(*) AS c FROM part
           WHERE p_size >= 25 GROUP BY 1),
    exact AS (
      SELECT CAST(COALESCE(sum(af.c * bf.c), 0) AS BIGINT) AS exact_join_size
      FROM af JOIN bf USING (k)
    ),
    f2 AS (SELECT CAST(sum(c * c) AS BIGINT) AS exact_f2 FROM af),{lanes("af", "a")},{lanes("bf", "b")},
    dot AS (
      SELECT a.depth, CAST(sum(a.n * b.n) AS BIGINT) AS s
      FROM ac a JOIN bc b ON a.depth = b.depth AND a.bucket = b.bucket
      GROUP BY a.depth
    ),
    dot2 AS (SELECT depth, CAST(sum(n * n) AS BIGINT) AS s FROM ac GROUP BY depth)
    SELECT exact.exact_join_size,
           (SELECT CAST(min(s) AS BIGINT) FROM dot) AS cms_join_estimate,
           f2.exact_f2,
           (SELECT CAST(min(s) AS BIGINT) FROM dot2) AS cms_f2_estimate
    FROM exact, f2
    """


@query("join_size_estimate", oracle=_join_size_oracle())
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS join-size estimation: |lineitem x filtered part| and the lineitem F2 self-join size from count-min inner products (min over depths) beside the exact answers - the pre-join planning signal, counter-sized state only."""
    from datalake_etlscripts_spark.operators import sketches
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    # r07 (guide §2.5): the one-column projection scans as few tasks
    # and the per-row md5 CMS lanes dominated on one core; spread is a
    # no-op once the table has real splits.
    li = spread_small_input(
        read_table(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").alias("k")
        )
    )
    pf = read_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25).select(
        F.col("p_partkey").alias("k")
    )
    cms_a = sketches.cms_sketch_table(li, "k", scheme="md5")
    cms_b = sketches.cms_sketch_table(pf, "k", scheme="md5")
    a_counts = li.groupBy("k").agg(F.count(F.lit(1)).alias("_ca"))
    b_counts = pf.groupBy("k").agg(F.count(F.lit(1)).alias("_cb"))
    exact = a_counts.join(b_counts, "k").agg(
        F.coalesce(F.sum(F.col("_ca") * F.col("_cb")), F.lit(0))
        .cast("long")
        .alias("exact_join_size")
    )
    f2 = a_counts.agg(
        F.sum(F.col("_ca") * F.col("_ca")).cast("long").alias("exact_f2")
    )
    dot = (
        cms_a.select("depth", "bucket", F.col("n").alias("_na"))
        .join(
            cms_b.select("depth", "bucket", F.col("n").alias("_nb")),
            ["depth", "bucket"],
        )
        .groupBy("depth")
        .agg(F.sum(F.col("_na") * F.col("_nb")).cast("long").alias("_s"))
        .agg(F.min("_s").cast("long").alias("cms_join_estimate"))
    )
    dot2 = (
        cms_a.groupBy("depth")
        .agg(F.sum(F.col("n") * F.col("n")).cast("long").alias("_s"))
        .agg(F.min("_s").cast("long").alias("cms_f2_estimate"))
    )
    return (
        exact.crossJoin(F.broadcast(dot))
        .crossJoin(F.broadcast(f2))
        .crossJoin(F.broadcast(dot2))
        .select(
            "exact_join_size", "cms_join_estimate", "exact_f2", "cms_f2_estimate"
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit (r4): the classic fabricated-numbers /
# data-quality screen. Expected digit probabilities log10(1+1/d) are
# DATA-INDEPENDENT constants fixed once as integer micro-probabilities
# (they sum to exactly 1e6) and shared as literals by both engines —
# no runtime log anywhere. First digits extract via a pure-integer
# CASE ladder (no log10, no string form — double formatting is not a
# cross-engine contract). One scan, one 9-row aggregate.
# ---------------------------------------------------------------------------
_BENFORD_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _first_digit_sql(y: str) -> str:
    conds = " ".join(
        f"WHEN {y} < {10 ** (k + 1)} THEN {y} // {10 ** k}"
        for k in range(0, 12)
    )
    return f"(CASE {conds} END)"


@query(
    "benford_audit",
    oracle=f"""
    WITH v AS (
      SELECT CAST(floor(l_extendedprice) AS BIGINT) AS y
      FROM lineitem WHERE l_extendedprice >= 1
    ),
    d AS (SELECT {_first_digit_sql("y")} AS digit FROM v),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    exp AS (SELECT * FROM (VALUES
      {", ".join(f"({d}, {m})" for d, m in sorted(_BENFORD_MICRO.items()))}
      ) e(digit, benford_micro)),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
    SELECT e.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
           CAST(COALESCE(c.n, 0) AS DOUBLE) / tot.t AS share,
           e.benford_micro,
           (CAST(COALESCE(c.n, 0) AS DOUBLE) / tot.t
            - e.benford_micro / 1000000.0) AS excess
    FROM exp e LEFT JOIN c ON c.digit = e.digit, tot
    """,
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of extended prices: observed digit shares vs the log10(1+1/d) expectation (fixed micro-probability literals, integer CASE-ladder digit extraction) - the fabricated-numbers screen, one scan + 9-row aggregate."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice") >= 1
    )
    y = F.floor(F.col("l_extendedprice")).cast("long")

    def div_pow(k):
        return F.expr(f"CAST(floor(l_extendedprice) AS BIGINT) div {10 ** k}")

    digit = div_pow(11)
    for k in range(10, -1, -1):
        digit = F.when(y < F.lit(10 ** (k + 1)), div_pow(k)).otherwise(digit)
    c = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    spark_exp = li.sparkSession.createDataFrame(
        sorted(_BENFORD_MICRO.items()), "digit bigint, benford_micro bigint"
    )
    tot = c.agg(F.sum("n").cast("long").alias("_t"))
    return (
        spark_exp.join(c, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            (F.coalesce("n", F.lit(0)).cast("double") / F.col("_t")).alias(
                "share"
            ),
            "benford_micro",
            (
                F.coalesce("n", F.lit(0)).cast("double") / F.col("_t")
                - F.col("benford_micro") / F.lit(1000000.0)
            ).alias("excess"),
        )
    )


# ---------------------------------------------------------------------------
# Theta-sketch A-NOT-B (r5): which shingle mass is UNIQUE to corpus
# half A — the DataSketches difference operation beside kmv_overlap's
# intersection; same deterministic k-min sketches, anti-join of ≤k
# hashes below theta*.
# ---------------------------------------------------------------------------
def _kmv_anotb_oracle(k: int = 256) -> str:
    from datalake_etlscripts_spark.operators.sketches import KMV_HASH_SPACE
    from datalake_etlscripts_spark.plans.registry import ddb_hex60

    return f"""
    WITH tk AS (
      SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    sh AS (
      SELECT source IN ('src0','src1','src2','src3','src4') AS in_a,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS s
      FROM tk
    ),
    h AS (SELECT DISTINCT in_a, {ddb_hex60("md5(s)")} AS h FROM sh),
    sk AS (
      SELECT in_a, h, row_number() OVER (PARTITION BY in_a ORDER BY h) AS pos
      FROM h QUALIFY pos <= {k}
    ),
    ka AS (SELECT max(h) AS kth_a, count(*) AS nka FROM sk WHERE in_a),
    kb AS (SELECT max(h) AS kth_b, count(*) AS nkb FROM sk WHERE NOT in_a),
    th AS (
      SELECT kth_a, kth_b,
             least(CASE WHEN nka < {k} THEN {KMV_HASH_SPACE} ELSE kth_a END,
                   CASE WHEN nkb < {k} THEN {KMV_HASH_SPACE} ELSE kth_b END)
               AS theta
      FROM ka, kb
    ),
    onlya AS (
      SELECT a.h FROM (SELECT h FROM sk WHERE in_a) a
      WHERE a.h NOT IN (SELECT h FROM sk WHERE NOT in_a)
    ),
    nd AS (SELECT count(*) AS n_diff FROM onlya, th WHERE h <= theta)
    SELECT kth_a, kth_b, theta, n_diff,
           CAST(CAST(CAST(n_diff AS HUGEINT) * {KMV_HASH_SPACE} AS VARCHAR)
                AS DOUBLE)
             / CAST(theta AS DOUBLE) AS est_difference
    FROM th, nd
    """


@query("kmv_a_not_b", oracle=_kmv_anotb_oracle())
def q_kmv_a_not_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set difference (DataSketches AnotB): shingle mass unique to corpus half A from the k-min sketches alone - anti-join of <=k hashes below theta*, one double division."""
    from datalake_etlscripts_spark.operators import sketches, text

    d = read_table(spark, sf_dir, "documents").select("source", "text")
    sh = d.select(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4").alias("in_a"),
        F.explode(text.shingles(F.col("text"), 5)).alias("s"),
    )
    sk = sketches.kmv_sketch_table(sh, ["in_a"], "s", k=256)
    a = sk.filter(F.col("in_a")).select("pos", "h")
    b = sk.filter(~F.col("in_a")).select("pos", "h")
    return sketches.kmv_difference_estimate(a, b, k=256)


# ---------------------------------------------------------------------------
# Rendezvous sharding resize audit (r5): highest-random-weight
# placement of documents onto shards and the 8→9 resize plan —
# minimal movement is VISIBLE in the output (moved_in = 0 on every
# surviving shard; only the new shard receives keys).
# ---------------------------------------------------------------------------
def _rendezvous_oracle(n_old: int = 8, n_new: int = 9) -> str:
    from datalake_etlscripts_spark.plans.registry import ddb_hex32

    h = ddb_hex32("md5(CAST(doc_id AS VARCHAR) || ':' || CAST(u.s AS VARCHAR))")
    return f"""
    WITH so AS (
      SELECT doc_id, u.s AS s, {h} AS h
      FROM documents CROSS JOIN LATERAL unnest(range({n_old})) u(s)
    ),
    ao AS (SELECT doc_id, s FROM so
           QUALIFY row_number() OVER (PARTITION BY doc_id
                                      ORDER BY h DESC, s DESC) = 1),
    sn AS (
      SELECT doc_id, u.s AS s, {h} AS h
      FROM documents CROSS JOIN LATERAL unnest(range({n_new})) u(s)
    ),
    an AS (SELECT doc_id, s FROM sn
           QUALIFY row_number() OVER (PARTITION BY doc_id
                                      ORDER BY h DESC, s DESC) = 1),
    j AS (SELECT ao.doc_id, ao.s AS old_s, an.s AS new_s
          FROM ao JOIN an USING (doc_id)),
    po AS (SELECT old_s AS shard, count(*) AS n_old FROM j GROUP BY 1),
    pn AS (SELECT new_s AS shard, count(*) AS n_new FROM j GROUP BY 1),
    mv AS (SELECT new_s AS shard, count(*) AS m FROM j
           WHERE old_s <> new_s GROUP BY 1)
    SELECT pn.shard, CAST(COALESCE(po.n_old, 0) AS BIGINT) AS n_with_old,
           CAST(pn.n_new AS BIGINT) AS n_with_new,
           CAST(COALESCE(mv.m, 0) AS BIGINT) AS moved_in
    FROM pn LEFT JOIN po USING (shard) LEFT JOIN mv USING (shard)
    """


@query("rendezvous_sharding", oracle=_rendezvous_oracle())
def q_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous/HRW shard placement and the 8-to-9 resize audit: md5 argmax per key, arrivals concentrate on the new shard only (minimal movement) - pure per-row expressions, one tiny aggregate."""
    from datalake_etlscripts_spark.operators.skew import rendezvous_resize_audit

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    return rendezvous_resize_audit(d, "doc_id", 8, 9)


# ---------------------------------------------------------------------------
# Bitmap-index exact distinct (r6): the EXACT mergeable-state twin of
# the HLL/KMV rollups — roaring-style 62-bit words keyed by
# (key, word_idx), OR-monoid rollup, popcount readout. The oracle
# replays the identical bit arithmetic AND the rollup never re-reads
# the fact table.
# ---------------------------------------------------------------------------
@query(
    "bitmap_distinct_rollup",
    oracle="""
    WITH state AS (
      SELECT event_type AS key, user_id // 62 AS widx,
             bit_or(1::BIGINT << CAST(user_id % 62 AS INT)) AS word
      FROM events GROUP BY 1, 2
    ),
    rolled AS (
      SELECT '(all)' AS key, widx, bit_or(word) AS word
      FROM state GROUP BY widx
    ),
    u AS (SELECT * FROM state UNION ALL SELECT * FROM rolled)
    SELECT key, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(bit_count(word)) AS BIGINT) AS distinct_ids
    FROM u GROUP BY key
    """,
)
def q_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type AND rolled up globally from bitmap-index state alone: 62-bit words as an OR-monoid, popcount readout, fact table read once."""
    from datalake_etlscripts_spark.operators.sketches import (
        bitmap_distinct_counts,
        bitmap_distinct_state,
        bitmap_rollup,
    )

    e = read_table(spark, sf_dir, "events")
    state = bitmap_distinct_state(e, "event_type", "user_id").localCheckpoint(
        eager=False
    )
    return bitmap_distinct_counts(
        state.unionByName(bitmap_rollup(state))
    )


# ---------------------------------------------------------------------------
# HLL accuracy audit (r9): estimate-vs-exact side by side — distinct
# orders per return flag through the explicit-register HLL next to
# the exact COUNT(DISTINCT), with the signed relative error. The
# audit you run once per pipeline to decide whether m=256 registers
# are enough for the grain — kept in-registry so the error claim is
# itself hash-verified (both engines replay registers bit-for-bit).
# ---------------------------------------------------------------------------
def _hll_audit_oracle() -> str:
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
    return f"""
    WITH src AS (
      SELECT l_returnflag AS k, l_orderkey AS v FROM lineitem
      WHERE l_orderkey IS NOT NULL
    ),
    h0 AS (SELECT k, {ddb_hex32("md5(CAST(v AS VARCHAR))")} AS h FROM src),
    h AS (SELECT k, h & {HLL_BUCKETS - 1} AS bucket, h >> 8 AS w FROM h0),
    regs AS (
      SELECT k, bucket, max(CASE {ladder} ELSE {HLL_WORD_BITS + 1} END)
        AS reg
      FROM h GROUP BY 1, 2
    ),
    per AS (
      SELECT k, sum(CAST(1 AS BIGINT) << ({HLL_WORD_BITS + 1} - reg)) AS s,
             count(*) AS nb
      FROM regs GROUP BY 1
    ),
    ex AS (SELECT k, CAST(count(DISTINCT v) AS BIGINT) AS exact_distinct
           FROM src GROUP BY 1)
    SELECT per.k AS flag, ex.exact_distinct,
           {HLL_EST_NUM!r} / (s + ({HLL_BUCKETS} - nb) * {scale})
             AS approx_distinct,
           ({HLL_EST_NUM!r} / (s + ({HLL_BUCKETS} - nb) * {scale})
            - CAST(ex.exact_distinct AS DOUBLE))
             / CAST(ex.exact_distinct AS DOUBLE) AS rel_err
    FROM per JOIN ex ON ex.k = per.k
    """


@query("hll_accuracy_audit", oracle=_hll_audit_oracle())
def q_hll_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate vs exact distinct orders per return flag with the signed relative error - the per-grain register-budget audit, itself hash-verified."""
    from datalake_etlscripts_spark.operators import sketches

    li = read_table(spark, sf_dir, "lineitem")
    state = sketches.hll_register_table(li, ["l_returnflag"], "l_orderkey")
    est = sketches.hll_register_estimate(state)
    exact = li.groupBy(F.col("l_returnflag")).agg(
        F.countDistinct("l_orderkey").cast("long").alias("exact_distinct")
    ).withColumnRenamed("l_returnflag", "ek")
    j = est.join(exact, est["l_returnflag"] == F.col("ek"))
    return j.select(
        F.col("l_returnflag").alias("flag"),
        "exact_distinct",
        "approx_distinct",
        (
            (F.col("approx_distinct") - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# Quantile-sketch acceptance audit (r13): the histogram sketch's
# q50/q90/q95 estimates side-by-side with the EXACT rank quantiles
# off the cents dictionary, error in cents — the quantile sibling of
# ann_recall_mrr (an index is not "done" until its error against
# ground truth is a queryable number). Sketch side reuses the
# mergeable histogram state; exact side is explicit rank selection
# (smallest value whose cumulative count reaches ceil(q·N)) on the
# value dictionary — one fact aggregate each, dictionary-sized
# windows only.
# ---------------------------------------------------------------------------
@query(
    "quantile_sketch_error_audit",
    oracle=f"""
    WITH h AS (
      SELECT least(greatest(CAST(floor(l_extendedprice / {_H_W!r}) AS INT), 0),
                   {_H_BINS - 1}) AS bin,
             count(*) AS n
      FROM lineitem GROUP BY 1
    ),
    hc AS (
      SELECT bin, sum(n) OVER (ORDER BY bin) AS cum, sum(n) OVER () AS total
      FROM h
    ),
    qs(q) AS (VALUES (0.5), (0.9), (0.95)),
    sk AS (
      SELECT CAST(q AS DOUBLE) AS q,
             {_H_LO!r} + min(hc.bin) * {_H_W!r} AS estimate
      FROM qs JOIN hc ON hc.cum >= ceil(CAST(q AS DOUBLE) * hc.total)
      GROUP BY 1
    ),
    d AS (
      SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
             count(*) AS n
      FROM lineitem GROUP BY 1
    ),
    dc AS (
      SELECT v, sum(n) OVER (ORDER BY v) AS cum, sum(n) OVER () AS total
      FROM d
    ),
    ex AS (
      SELECT CAST(q AS DOUBLE) AS q, min(dc.v) AS exact_cents
      FROM qs JOIN dc ON dc.cum >= ceil(CAST(q AS DOUBLE) * dc.total)
      GROUP BY 1
    )
    SELECT sk.q,
           CAST(floor(sk.estimate * 100 + 0.5) AS BIGINT) AS sketch_cents,
           CAST(ex.exact_cents AS BIGINT) AS exact_cents,
           CAST(abs(CAST(floor(sk.estimate * 100 + 0.5) AS BIGINT)
                    - ex.exact_cents) AS BIGINT) AS abs_err_cents
    FROM sk JOIN ex ON sk.q = ex.q
    """,
)
def q_quantile_sketch_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance audit for the histogram quantile sketch: q50/q90/q95 estimates vs exact rank quantiles off the cents dictionary, absolute error in cents - the quantile analogue of the ANN recall/MRR acceptance metrics."""
    from pyspark.sql import Window as W

    from datalake_etlscripts_spark.operators import sketches

    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    state = sketches.histogram_sketch_table(
        li, "l_extendedprice", _H_LO, _H_HI, _H_BINS
    )
    sk = sketches.histogram_quantiles(
        state, [0.5, 0.9, 0.95], _H_LO, _H_HI, _H_BINS
    ).select(
        "q",
        F.floor(F.col("estimate") * 100 + 0.5).cast("long").alias("sketch_cents"),
    )
    d = li.groupBy(
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("v")
    ).agg(F.count(F.lit(1)).alias("n"))
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    dc = d.select(
        "v",
        F.sum("n").over(wv).alias("cum"),
        F.sum("n").over(W.orderBy("v").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).alias("total"),
    )
    qs = spark.createDataFrame([(0.5,), (0.9,), (0.95,)], "q double")
    ex = (
        dc.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy("q")
        .agg(F.min("v").cast("long").alias("exact_cents"))
    )
    return sk.join(ex, "q").select(
        "q",
        "sketch_cents",
        "exact_cents",
        F.abs(F.col("sketch_cents") - F.col("exact_cents"))
        .cast("long")
        .alias("abs_err_cents"),
    )
