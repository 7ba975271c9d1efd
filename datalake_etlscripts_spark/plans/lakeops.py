"""Lakehouse / data-engineering query plans (r9): exact proportional
allocation (Hamilton largest-remainder), RFM customer segmentation on
the distributed rank lane, SCD type-2 dimension build from a change
stream, FIFO lot allocation via the cumulative-interval sweep,
per-field survivorship (golden record), and SRE error-budget burn
rates. Beyond-reference warehouse surface; every entry is
oracle-backed under the house float-determinism policy (exact
integers / DECIMAL until one final division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.operators.features import (
    _as_double,
    distributed_rank,
)
from datalake_etlscripts_spark.plans.registry import query

_D = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"


def _d(x: str) -> str:
    return _D.format(x=x)


_CENTS = "CAST(CAST(CAST({x} AS DECIMAL(14,2)) * 100 AS HUGEINT) AS HUGEINT)"


# ---------------------------------------------------------------------------
# Hamilton largest-remainder apportionment: distribute EXACTLY S units
# across nations proportional to revenue. floor(S·x_i/T) seats first,
# then the S − Σfloor leftovers go to the largest remainders
# (ties → lower nationkey). Everything is integer arithmetic — the
# invariant Σseats = S holds bit-exactly in both engines. One
# fact-table aggregate, then dictionary-sized (25-row) window math.
# At 100 TB the only data-sized stage is the first groupBy; the
# apportionment itself is dimension-sized.
# ---------------------------------------------------------------------------
@query(
    "largest_remainder_alloc",
    oracle=f"""
    WITH rev AS (
      SELECT c.c_nationkey AS nationkey,
             sum({_CENTS.format(x='o.o_totalprice')}) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ),
    t AS (SELECT sum(cents) AS tot FROM rev),
    q AS (
      SELECT nationkey, cents,
             (10000 * cents) // t.tot AS floor_units,
             (10000 * cents) % t.tot AS rem
      FROM rev CROSS JOIN t
    ),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, nationkey ASC) AS rk,
             10000 - sum(floor_units) OVER () AS leftover
      FROM q
    )
    SELECT CAST(nationkey AS BIGINT) AS nationkey, n.n_name AS nation,
           CAST(cents AS BIGINT) AS cents,
           CAST(floor_units AS BIGINT) AS floor_units,
           CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS INT) AS extra,
           CAST(floor_units + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS units
    FROM r JOIN nation n ON n.n_nationkey = r.nationkey
    """,
)
def q_largest_remainder_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment of 10000 budget units across nations proportional to exact revenue cents - pure integer floor/remainder math, ties to the lower nationkey, sum-of-units invariant exact."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    rev = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            o["o_custkey"] == c["c_custkey"],
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast(
                    "decimal(38,0)"
                )
            ).alias("cents")
        )
    )
    tot = rev.groupBy().agg(F.sum("cents").alias("tot"))
    q = rev.crossJoin(F.broadcast(tot)).select(
        "nationkey",
        "cents",
        F.expr("(CAST(10000 AS DECIMAL(38,0)) * cents) div tot").alias(
            "floor_units"
        ),
        F.expr("(CAST(10000 AS DECIMAL(38,0)) * cents) % tot").alias("rem"),
    )
    w_rk = W.orderBy(F.col("rem").desc(), F.col("nationkey").asc())
    r = q.withColumn("rk", F.row_number().over(w_rk)).withColumn(
        "leftover",
        F.lit(10000) - F.sum("floor_units").over(W.partitionBy()),
    )
    extra = F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
    return r.join(
        F.broadcast(n), r["nationkey"] == n["n_nationkey"]
    ).select(
        F.col("nationkey").cast("long").alias("nationkey"),
        F.col("n_name").alias("nation"),
        F.col("cents").cast("long").alias("cents"),
        F.col("floor_units").cast("long").alias("floor_units"),
        extra.cast("int").alias("extra"),
        (F.col("floor_units") + extra).cast("long").alias("units"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation: quintile scores for Recency / Frequency / Monetary
# per customer, ranks from the distributed sort-rank plan (never a
# single-task global window), scores by pure integer index arithmetic
# 1 + ((rank−1)·5) div n. Recency in whole days from epoch arithmetic
# (no engine date-diff conventions). Output is the segment-grain
# report: customers per RFM cell with the exact average monetary.
# ---------------------------------------------------------------------------
_RFM_BASE = f"""
    base AS (
      SELECT o_custkey AS custkey,
             CAST((max(epoch(o_orderdate))) AS BIGINT) AS last_ep,
             CAST(count(*) AS BIGINT) AS freq,
             sum({_CENTS.format(x='o_totalprice')}) AS cents
      FROM orders GROUP BY 1
    ),
    ref AS (SELECT max(last_ep) AS ref_ep, count(*) AS n FROM base),
    m AS (
      SELECT custkey, freq, cents,
             (ref.ref_ep - last_ep) // 86400 AS rec_days, ref.n AS n
      FROM base CROSS JOIN ref
    ),
    ranked AS (
      SELECT custkey, n, rec_days, freq, cents,
             row_number() OVER (ORDER BY rec_days DESC, custkey ASC) AS r_rk,
             row_number() OVER (ORDER BY freq ASC, custkey ASC) AS f_rk,
             row_number() OVER (ORDER BY cents ASC, custkey ASC) AS m_rk
      FROM m
    ),
    scored AS (
      SELECT custkey, cents,
             1 + ((r_rk - 1) * 5) // n AS r_s,
             1 + ((f_rk - 1) * 5) // n AS f_s,
             1 + ((m_rk - 1) * 5) // n AS m_s
      FROM ranked
    )
"""


@query(
    "rfm_segments",
    oracle=f"""
    WITH {_RFM_BASE}
    SELECT CAST(r_s AS INT) AS r_score, CAST(f_s AS INT) AS f_score,
           CAST(m_s AS INT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS cents,
           {_d('sum(cents)')} / {_d('count(*)')} AS avg_cents
    FROM scored GROUP BY 1, 2, 3
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency/frequency/monetary quintiles from the distributed sort-rank lane with integer index arithmetic, epoch-exact recency days, segment-grain counts and exact average cents."""
    o = read_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.unix_timestamp("o_orderdate")).alias("last_ep"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast(
                "decimal(38,0)"
            )
        ).alias("cents"),
    )
    ref = base.groupBy().agg(
        F.max("last_ep").alias("ref_ep"), F.count(F.lit(1)).alias("n")
    )
    m = base.crossJoin(F.broadcast(ref)).select(
        "custkey",
        "freq",
        "cents",
        ((F.col("ref_ep") - F.col("last_ep")) / F.lit(86400))
        .cast("long")
        .alias("rec_days"),
        "n",
    )
    # three distributed rank passes — one per RFM dimension
    m = distributed_rank(
        m.withColumn("_neg_rec", -F.col("rec_days")),
        "_neg_rec",
        "custkey",
        out_col="r_rk",
    ).drop("_neg_rec")
    m = distributed_rank(m, "freq", "custkey", out_col="f_rk")
    m = distributed_rank(
        m.withColumn("_cd", F.col("cents").cast("double")),
        "_cd",
        "custkey",
        out_col="m_rk",
    ).drop("_cd")
    scored = m.select(
        "cents",
        F.expr("CAST(1 + ((r_rk - 1) * 5) div n AS INT)").alias("r_score"),
        F.expr("CAST(1 + ((f_rk - 1) * 5) div n AS INT)").alias("f_score"),
        F.expr("CAST(1 + ((m_rk - 1) * 5) div n AS INT)").alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
        (
            _as_double(F.sum("cents"))
            / _as_double(F.count(F.lit(1)))
        ).alias("avg_cents"),
    )


# ---------------------------------------------------------------------------
# SCD type-2 dimension build from a change stream: per user, collapse
# consecutive runs of the same event_type into versioned validity
# intervals [effective_from, effective_to), open-ended for the current
# run. The run detector is the lag≠current marker + running sum — one
# user-keyed shuffle, windows bounded per user, no self-joins. This is
# the warehouse twin of the versioned store's validity intervals
# (reference read_parquet.py assigns them at ingest; here they are
# DERIVED from an event log).
# ---------------------------------------------------------------------------
@query(
    "scd2_build",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, event_id, event_type,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version
      FROM e
    ),
    dim AS (
      SELECT user_id, CAST(version AS BIGINT) AS version,
             min(event_type) AS status,
             min(ts) AS effective_from,
             CAST(count(*) AS BIGINT) AS n_events
      FROM runs GROUP BY user_id, version
    )
    SELECT user_id, version, status, effective_from,
           lead(effective_from) OVER
             (PARTITION BY user_id ORDER BY version) AS effective_to,
           n_events,
           CAST(CASE WHEN lead(effective_from) OVER
                  (PARTITION BY user_id ORDER BY version) IS NULL
                THEN 1 ELSE 0 END AS INT) AS is_current
    FROM dim
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension from the event change stream: consecutive equal-status runs collapse to versioned validity intervals via the lag-marker running sum, open-ended current rows - one user-keyed shuffle."""
    return scd2_from_events(read_table(spark, sf_dir, "events"))


def scd2_from_events(e: DataFrame) -> DataFrame:
    """The SCD2 collapse over an event DataFrame (user_id, ts,
    event_id, event_type) — shared by the batch query above and the
    streaming twin's stream≡batch test (streaming/ingest.py
    run_streaming_scd2)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    runs = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("chg"),
    ).withColumn("version", F.sum("chg").over(w))
    dim = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("status"),
        F.min("ts").alias("effective_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = W.partitionBy("user_id").orderBy("version")
    eff_to = F.lead("effective_from").over(wv)
    return dim.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "status",
        "effective_from",
        eff_to.alias("effective_to"),
        F.col("n_events").cast("long").alias("n_events"),
        F.when(eff_to.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


# ---------------------------------------------------------------------------
# FIFO lot allocation — the classic inventory-costing shape: demands
# consume supply lots strictly in arrival order. Both sides get exact
# integer cumulative-quantity intervals; the sweep then partitions the
# matched range (0, M] at the union of breakpoints, and each segment
# finds its covering lot/demand by PURE COUNTING (receipt index =
# 1 + #lots with cum < hi) inside ONE part-keyed window over the
# unioned rows — no inequality join, no per-part quadratic pair join.
# At 100 TB: one shuffle on partkey, per-part state linear in lines.
# Supply = 'F' lines, demand = 'O' lines, FIFO order (shipdate,
# orderkey, linenumber).
# ---------------------------------------------------------------------------
_FIFO_BASE = """
    li AS (
      SELECT l_partkey AS part, l_orderkey AS okey, l_linenumber AS lno,
             l_shipdate AS sd, l_linestatus AS st,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem WHERE l_quantity > 0
    ),
    r AS (
      SELECT part, okey, lno, qty,
             CAST(row_number() OVER w AS BIGINT) AS rord,
             CAST(sum(qty) OVER w AS BIGINT) AS rcum
      FROM li WHERE st = 'F'
      WINDOW w AS (PARTITION BY part ORDER BY sd, okey, lno
                   ROWS UNBOUNDED PRECEDING)
    ),
    d AS (
      SELECT part, okey, lno, qty,
             CAST(row_number() OVER w AS BIGINT) AS dord,
             CAST(sum(qty) OVER w AS BIGINT) AS dcum
      FROM li WHERE st = 'O'
      WINDOW w AS (PARTITION BY part ORDER BY sd, okey, lno
                   ROWS UNBOUNDED PRECEDING)
    ),
    m AS (
      SELECT part, least(max(rcum), max(dcum)) AS matched
      FROM (SELECT part, max(rcum) AS rcum, NULL AS dcum FROM r GROUP BY 1
            UNION ALL
            SELECT part, NULL, max(dcum) FROM d GROUP BY 1)
      GROUP BY part HAVING count(*) = 2
    ),
    bp AS (
      SELECT DISTINCT part, key FROM (
        SELECT part, rcum AS key FROM r
        UNION ALL SELECT part, dcum FROM d
      ) u JOIN m USING (part) WHERE key <= m.matched
    ),
    ev AS (
      SELECT part, key, 0 AS tag, NULL::BIGINT AS idx FROM bp
      UNION ALL SELECT part, rcum, 1, rord FROM r
      UNION ALL SELECT part, dcum, 2, dord FROM d
    ),
    seg AS (
      SELECT part, key AS hi,
             1 + sum(CASE WHEN tag = 1 THEN 1 ELSE 0 END) OVER w AS ridx,
             1 + sum(CASE WHEN tag = 2 THEN 1 ELSE 0 END) OVER w AS didx,
             tag
      FROM ev
      WINDOW w AS (PARTITION BY part ORDER BY key, tag
                   ROWS UNBOUNDED PRECEDING)
    ),
    seg0 AS (
      SELECT part, hi, ridx, didx,
             hi - coalesce(lag(hi) OVER (PARTITION BY part ORDER BY hi), 0)
               AS seg_qty
      FROM seg WHERE tag = 0
    ),
    alloc AS (
      SELECT s.part, d.dord AS d_ord, r.rord AS r_ord, s.seg_qty
      FROM seg0 s
      JOIN r ON r.part = s.part AND r.rord = s.ridx
      JOIN d ON d.part = s.part AND d.dord = s.didx
      WHERE s.seg_qty > 0
    )
"""


# NOTE: (l_orderkey, l_linenumber) is NOT unique in the synthetic
# lineitem, so the demand identity is its FIFO sequence number dord
# (caught by the conservation invariant test, not the oracle — the
# oracle replicated the fan-out identically).
@query(
    "fifo_allocation",
    oracle=f"""
    WITH {_FIFO_BASE}
    SELECT d.part, d.dord AS demand_seq, d.okey AS d_orderkey,
           d.lno AS d_linenumber, d.qty AS demand_qty,
           CAST(coalesce(sum(a.seg_qty), 0) AS BIGINT) AS allocated_qty,
           CAST(count(DISTINCT a.r_ord) AS BIGINT) AS n_lots,
           CAST(CASE WHEN coalesce(sum(a.seg_qty), 0) = d.qty
                THEN 1 ELSE 0 END AS INT) AS fulfilled
    FROM d LEFT JOIN alloc a
      ON a.part = d.part AND a.d_ord = d.dord
    GROUP BY d.part, d.dord, d.okey, d.lno, d.qty
    """,
)
def q_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot allocation: demands consume supply lots in arrival order via the cumulative-interval sweep - segment-to-lot assignment by pure counting in one part-keyed window, never an inequality or pair join."""
    return fifo_allocation_frame(spark, sf_dir, qty_type="long")


def fifo_allocation_frame(
    spark: SparkSession, sf_dir: str, qty_type: str = "long"
) -> DataFrame:
    """The FIFO sweep plan with the quantity representation as a
    parameter: ``long`` is the registered exact lane (TPC-H quantities
    are integral); ``double`` is the bench-only A/B twin that carries
    native doubles through every window sum — the third
    (window-dominated) point on the exactness-tax curve beside the
    scan-heavy and join-heavy twins in bench.py."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select(
            F.col("l_partkey").alias("part"),
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").alias("lno"),
            F.col("l_shipdate").alias("sd"),
            F.col("l_linestatus").alias("st"),
            F.col("l_quantity").cast(qty_type).alias("qty"),
        )
    )
    # A/B'd against a combined (part, st)-keyed single window: that
    # form re-shuffles every branch back to (part) partitioning
    # downstream (14 exchanges vs 10, same wall-clock) — the
    # two-branch (part)-windowed form keeps its partitioning usable
    # by the breakpoint/segment stages, so it stays.
    w = (
        W.partitionBy("part")
        .orderBy("sd", "okey", "lno")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wr = W.partitionBy("part").orderBy("sd", "okey", "lno")
    # r07: settle r and d once (lazy) — each side feeds FOUR consumers
    # (matched-max, breakpoints, the event union, and the final
    # alloc/demand joins), and the scan + part-keyed sort + window
    # stack re-ran per consumer since only the exchange below the
    # window is shared by ReuseExchange (guide §2.4).
    r = (
        li.filter(F.col("st") == "F")
        .withColumn("rord", F.row_number().over(wr).cast("long"))
        .withColumn("rcum", F.sum("qty").over(w))
        .drop("sd", "st")
        .localCheckpoint(eager=False)
    )
    d = (
        li.filter(F.col("st") == "O")
        .withColumn("dord", F.row_number().over(wr).cast("long"))
        .withColumn("dcum", F.sum("qty").over(w))
        .drop("sd", "st")
        .localCheckpoint(eager=False)
    )
    m = (
        r.groupBy("part")
        .agg(F.max("rcum").alias("rmax"))
        .join(d.groupBy("part").agg(F.max("dcum").alias("dmax")), "part")
        .select("part", F.least("rmax", "dmax").alias("matched"))
    )
    bp = (
        r.select("part", F.col("rcum").alias("key"))
        .unionByName(d.select("part", F.col("dcum").alias("key")))
        .join(m, "part")
        .filter(F.col("key") <= F.col("matched"))
        .select("part", "key")
        .distinct()
    )
    ev = (
        bp.select(
            "part", "key", F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("idx"),
        )
        .unionByName(
            r.select(
                "part", F.col("rcum").alias("key"), F.lit(1).alias("tag"),
                F.col("rord").alias("idx"),
            )
        )
        .unionByName(
            d.select(
                "part", F.col("dcum").alias("key"), F.lit(2).alias("tag"),
                F.col("dord").alias("idx"),
            )
        )
    )
    we = (
        W.partitionBy("part")
        .orderBy("key", "tag")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    seg = ev.select(
        "part",
        F.col("key").alias("hi"),
        (1 + F.sum(F.when(F.col("tag") == 1, 1).otherwise(0)).over(we)).alias(
            "ridx"
        ),
        (1 + F.sum(F.when(F.col("tag") == 2, 1).otherwise(0)).over(we)).alias(
            "didx"
        ),
        "tag",
    )
    ws = W.partitionBy("part").orderBy("hi")
    seg0 = seg.filter(F.col("tag") == 0).select(
        "part",
        "hi",
        "ridx",
        "didx",
        (F.col("hi") - F.coalesce(F.lag("hi").over(ws), F.lit(0))).alias(
            "seg_qty"
        ),
    )
    r_keyed = r.select(
        F.col("part").alias("rpart"), F.col("rord").alias("r_ord")
    )
    alloc = (
        seg0.filter(F.col("seg_qty") > 0)
        .join(
            r_keyed,
            (F.col("part") == F.col("rpart"))
            & (F.col("ridx") == F.col("r_ord")),
        )
        .select("part", F.col("didx").alias("a_ord"), "r_ord", "seg_qty")
    )
    dem = d.select(
        F.col("part").alias("q_part"),
        F.col("dord").alias("demand_seq"),
        F.col("okey").alias("q_okey"),
        F.col("lno").alias("q_lno"),
        F.col("qty").alias("demand_qty"),
    )
    out = dem.join(
        alloc,
        (F.col("q_part") == alloc["part"])
        & (F.col("demand_seq") == F.col("a_ord")),
        "left",
    )
    return out.groupBy(
        "q_part", "demand_seq", "q_okey", "q_lno", "demand_qty"
    ).agg(
        F.coalesce(F.sum("seg_qty"), F.lit(0)).cast(qty_type).alias(
            "allocated_qty"
        ),
        F.countDistinct(F.col("r_ord")).cast("long").alias("n_lots"),
        F.when(
            F.coalesce(F.sum("seg_qty"), F.lit(0)) == F.col("demand_qty"), 1
        ).otherwise(0).cast("int").alias("fulfilled"),
    ).select(
        F.col("q_part").alias("part"),
        "demand_seq",
        F.col("q_okey").alias("d_orderkey"),
        F.col("q_lno").alias("d_linenumber"),
        "demand_qty",
        "allocated_qty",
        "n_lots",
        "fulfilled",
    )


# ---------------------------------------------------------------------------
# Golden-record survivorship: duplicate customer records (entity =
# custkey mod 499, the synthetic dup clustering) merge into ONE row by
# per-field rules — longest name (tie → lexicographic min), account
# balance from the latest record (max custkey), most frequent market
# segment (tie → lexicographic min). Three per-entity argmax branches,
# each ONE entity-keyed window or aggregate — never a self-join. At
# 100 TB: survivorship is a groupBy-shaped pass; rules compose as
# struct-ordered max/min so the whole merge is one shuffle per rule
# family.
# ---------------------------------------------------------------------------
@query(
    "golden_record_merge",
    oracle="""
    WITH c AS (
      SELECT c_custkey % 499 AS ent, c_custkey, c_name, c_acctbal,
             c_mktsegment
      FROM customer
    ),
    name_pick AS (
      SELECT ent, c_name AS golden_name FROM (
        SELECT ent, c_name,
               row_number() OVER (PARTITION BY ent
                 ORDER BY length(c_name) DESC, c_name ASC) AS rn
        FROM c
      ) WHERE rn = 1
    ),
    bal_pick AS (
      SELECT ent, c_acctbal AS golden_acctbal FROM (
        SELECT ent, c_acctbal,
               row_number() OVER (PARTITION BY ent
                 ORDER BY c_custkey DESC) AS rn
        FROM c
      ) WHERE rn = 1
    ),
    seg_pick AS (
      SELECT ent, c_mktsegment AS golden_segment FROM (
        SELECT ent, c_mktsegment,
               row_number() OVER (PARTITION BY ent
                 ORDER BY cnt DESC, c_mktsegment ASC) AS rn
        FROM (SELECT ent, c_mktsegment, count(*) AS cnt
              FROM c GROUP BY 1, 2)
      ) WHERE rn = 1
    ),
    stats AS (
      SELECT ent, CAST(count(*) AS BIGINT) AS n_records,
             CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
      FROM c GROUP BY 1
    )
    SELECT s.ent, s.n_records, s.n_segments, n.golden_name,
           b.golden_acctbal, g.golden_segment
    FROM stats s
    JOIN name_pick n USING (ent)
    JOIN bal_pick b USING (ent)
    JOIN seg_pick g USING (ent)
    """,
)
def q_golden_record_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship merge: per-field rules (longest name, latest balance, most frequent segment - deterministic tie-breaks) resolved by entity-keyed windows, one shuffle per rule family, no self-joins."""
    c = read_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 499).alias("ent"),
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_mktsegment",
    )
    wn = W.partitionBy("ent").orderBy(
        F.length("c_name").desc(), F.col("c_name").asc()
    )
    name_pick = (
        c.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select("ent", F.col("c_name").alias("golden_name"))
    )
    wb = W.partitionBy("ent").orderBy(F.col("c_custkey").desc())
    bal_pick = (
        c.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("ent", F.col("c_acctbal").alias("golden_acctbal"))
    )
    seg_cnt = c.groupBy("ent", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ws = W.partitionBy("ent").orderBy(
        F.col("cnt").desc(), F.col("c_mktsegment").asc()
    )
    seg_pick = (
        seg_cnt.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") == 1)
        .select("ent", F.col("c_mktsegment").alias("golden_segment"))
    )
    stats = c.groupBy("ent").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
    )
    return (
        stats.join(name_pick, "ent")
        .join(bal_pick, "ent")
        .join(seg_pick, "ent")
        .select(
            "ent",
            "n_records",
            "n_segments",
            "golden_name",
            "golden_acctbal",
            "golden_segment",
        )
    )


# ---------------------------------------------------------------------------
# SRE error-budget burn rate: multi-window (1h / 6h / 24h) burn of a
# 80%-success SLO over the dense hourly spine, alert flags decided by
# INTEGER cross-multiplication (5·err > k·tot) so both engines agree
# bit-exactly; the ratios themselves are one exact division each. The
# spine is time-bounded (~720 rows/month), so the single ordered
# window is dictionary-sized — the same bounded-series argument as
# the ACF/Holt diagnostics. Facts are touched once (one hourly
# aggregate).
# ---------------------------------------------------------------------------
@query(
    "slo_burn_rate",
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
      SELECT date_trunc('hour', ts) AS hr,
             CAST(count(*) AS BIGINT) AS tot,
             CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS err
      FROM events GROUP BY 1
    ),
    dense AS (
      SELECT s.hr, coalesce(h.tot, 0) AS tot, coalesce(h.err, 0) AS err
      FROM spine s LEFT JOIN h ON h.hr = s.hr
    ),
    w AS (
      SELECT hr, tot AS tot1, err AS err1,
             CAST(sum(tot) OVER w6 AS BIGINT) AS tot6,
             CAST(sum(err) OVER w6 AS BIGINT) AS err6,
             CAST(sum(tot) OVER w24 AS BIGINT) AS tot24,
             CAST(sum(err) OVER w24 AS BIGINT) AS err24
      FROM dense
      WINDOW w6 AS (ORDER BY hr ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
             w24 AS (ORDER BY hr ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT hr, tot1, err1, tot6, err6, tot24, err24,
           CASE WHEN tot1 > 0 THEN
             CAST(5 * err1 AS DOUBLE) / CAST(tot1 AS DOUBLE) END AS burn1,
           CASE WHEN tot6 > 0 THEN
             CAST(5 * err6 AS DOUBLE) / CAST(tot6 AS DOUBLE) END AS burn6,
           CASE WHEN tot24 > 0 THEN
             CAST(5 * err24 AS DOUBLE) / CAST(tot24 AS DOUBLE) END AS burn24,
           CAST(CASE WHEN 5 * err1 > 2 * tot1 AND 10 * err6 > 3 * tot6
                THEN 1 ELSE 0 END AS INT) AS page,
           CAST(CASE WHEN 50 * err24 > 12 * tot24
                THEN 1 ELSE 0 END AS INT) AS ticket
    FROM w
    """,
)
def q_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SRE error-budget burn rate (1h/6h/24h) on the dense hourly spine: alert flags by integer cross-multiplication, exact-division ratios, facts aggregated once."""
    e = read_table(spark, sf_dir, "events")
    h = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).alias("tot"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("err"),
    )
    b = h.groupBy().agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = b.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    dense = spine.join(h, "hr", "left").select(
        "hr",
        F.coalesce("tot", F.lit(0)).alias("tot"),
        F.coalesce("err", F.lit(0)).alias("err"),
    )
    w6 = W.orderBy("hr").rowsBetween(-5, 0)
    w24 = W.orderBy("hr").rowsBetween(-23, 0)
    w = dense.select(
        "hr",
        F.col("tot").alias("tot1"),
        F.col("err").alias("err1"),
        F.sum("tot").over(w6).alias("tot6"),
        F.sum("err").over(w6).alias("err6"),
        F.sum("tot").over(w24).alias("tot24"),
        F.sum("err").over(w24).alias("err24"),
    )
    def burn(err, tot):
        return F.when(
            F.col(tot) > 0,
            (5 * F.col(err)).cast("double") / F.col(tot).cast("double"),
        )
    return w.select(
        "hr",
        "tot1",
        "err1",
        "tot6",
        "err6",
        "tot24",
        "err24",
        burn("err1", "tot1").alias("burn1"),
        burn("err6", "tot6").alias("burn6"),
        burn("err24", "tot24").alias("burn24"),
        F.when(
            (5 * F.col("err1") > 2 * F.col("tot1"))
            & (10 * F.col("err6") > 3 * F.col("tot6")),
            1,
        ).otherwise(0).cast("int").alias("page"),
        F.when(50 * F.col("err24") > 12 * F.col("tot24"), 1)
        .otherwise(0)
        .cast("int")
        .alias("ticket"),
    )


# ---------------------------------------------------------------------------
# Maximum drawdown of the daily cumulative-revenue equity curve:
# running peak minus current equity, all in exact integer cents on the
# calendar-bounded day grid (one fact aggregate, then day-grain
# windows). The trough is the (drawdown DESC, day ASC) argmax; its
# peak day is recovered by an equi-join on the peak value — no struct
# window portability tricks. dd_frac is one exact division.
# ---------------------------------------------------------------------------
@query(
    "max_drawdown",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum({_CENTS.format(x='o_totalprice')}) AS cents
      FROM orders GROUP BY 1
    ),
    eq AS (
      SELECT d, CAST(sum(cents) OVER (ORDER BY d
                 ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS e
      FROM daily
    ),
    dd AS (
      SELECT d, e,
             CAST(max(e) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                  AS HUGEINT) AS p
      FROM eq
    ),
    trough AS (
      SELECT d AS trough_day, e AS trough_cents, p AS peak_cents,
             p - e AS max_dd
      FROM dd ORDER BY p - e DESC, d ASC LIMIT 1
    )
    SELECT CAST((SELECT min(d) FROM dd, trough
            WHERE dd.e = trough.peak_cents AND dd.d <= trough.trough_day)
             AS VARCHAR) AS peak_day,
           CAST(trough_day AS VARCHAR) AS trough_day,
           CAST(peak_cents AS BIGINT) AS peak_cents,
           CAST(trough_cents AS BIGINT) AS trough_cents,
           CAST(max_dd AS BIGINT) AS max_dd_cents,
           {_d('max_dd')} / {_d('peak_cents')} AS dd_frac
    FROM trough
    """,
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily revenue curve: exact integer cents on the calendar-bounded day grid, trough by deterministic argmax, peak day recovered by value equi-join, one exact division."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast(
                "decimal(38,0)"
            )
        ).alias("cents")
    )
    wd = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    dd = daily.select(
        "d", F.sum("cents").over(wd).alias("e")
    ).withColumn("p", F.max("e").over(wd))
    wt = W.orderBy((F.col("p") - F.col("e")).desc(), F.col("d").asc())
    trough = (
        dd.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") == 1)
        .select(
            F.col("d").alias("trough_day"),
            F.col("e").alias("trough_cents"),
            F.col("p").alias("peak_cents"),
            (F.col("p") - F.col("e")).alias("max_dd"),
        )
    )
    peak = (
        dd.crossJoin(F.broadcast(trough))
        .filter(
            (F.col("e") == F.col("peak_cents"))
            & (F.col("d") <= F.col("trough_day"))
        )
        .groupBy(
            "trough_day", "trough_cents", "peak_cents", "max_dd"
        )
        .agg(F.min("d").alias("peak_day"))
    )
    return peak.select(
        F.col("peak_day").cast("string").alias("peak_day"),
        F.col("trough_day").cast("string").alias("trough_day"),
        F.col("peak_cents").cast("long").alias("peak_cents"),
        F.col("trough_cents").cast("long").alias("trough_cents"),
        F.col("max_dd").cast("long").alias("max_dd_cents"),
        (_as_double(F.col("max_dd")) / _as_double(F.col("peak_cents"))).alias(
            "dd_frac"
        ),
    )


# ---------------------------------------------------------------------------
# ABC (Pareto) classification of parts by revenue: rank parts by exact
# cents descending, accumulate the ranked prefix with the SAME
# two-level distributed prefix scan as the watermark audit (4096-rank
# buckets + bucket-grain carry-in — never a single-task running sum at
# part grain), classify by integer cross-multiplication
# (100·cum ≤ 80·tot → A, ≤ 95 → B, else C). Output is the class-grain
# report.
# ---------------------------------------------------------------------------
@query(
    "abc_classification",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey AS part,
             sum({_CENTS.format(x='l_extendedprice')}) AS cents
      FROM lineitem GROUP BY 1
    ),
    t AS (SELECT sum(cents) AS tot FROM rev),
    ranked AS (
      SELECT part, cents,
             CAST(sum(cents) OVER (ORDER BY cents DESC, part ASC
                  ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cum
      FROM rev
    ),
    cls AS (
      SELECT part, cents,
             CASE WHEN 100 * cum <= 80 * t.tot THEN 'A'
                  WHEN 100 * cum <= 95 * t.tot THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked CROSS JOIN t
    )
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS cents,
           {_d('sum(cents)')} / {_d('(SELECT tot FROM t)')} AS share
    FROM cls GROUP BY 1
    """,
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification of parts by revenue: exact-cents ranking with a two-level distributed prefix sum (4096-rank buckets + carry-in), cross-multiplied 80/95 class boundaries, class-grain report."""
    li = read_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(14,2)") * 100).cast(
                "decimal(38,0)"
            )
        ).alias("cents")
    )
    tot = rev.groupBy().agg(F.sum("cents").alias("tot"))
    ranked = distributed_rank(
        rev.withColumn("_neg", -F.col("cents").cast("double")),
        "_neg",
        "part",
        out_col="rk",
    ).drop("_neg")
    # two-level prefix sum over the rank order (watermark-audit shape)
    ranked = ranked.withColumn("bkt", F.expr("rk div 4096"))
    bsum = ranked.groupBy("bkt").agg(F.sum("cents").alias("bs"))
    wb = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    carry = bsum.select(
        "bkt",
        F.coalesce(F.sum("bs").over(wb), F.lit(0).cast("decimal(38,0)")).alias(
            "carry"
        ),
    )
    ww = (
        W.partitionBy("bkt")
        .orderBy("rk")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = (
        ranked.join(F.broadcast(carry), "bkt")
        .withColumn("cum", F.col("carry") + F.sum("cents").over(ww))
    )
    cls = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.when(100 * F.col("cum") <= 80 * F.col("tot"), "A")
        .when(100 * F.col("cum") <= 95 * F.col("tot"), "B")
        .otherwise("C")
        .alias("abc"),
        "tot",
    )
    return cls.groupBy("abc").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("cents"),
        (_as_double(F.sum("cents")) / _as_double(F.first("tot"))).alias(
            "share"
        ),
    )


# ---------------------------------------------------------------------------
# BOM-style subtree rollup on the implicit part tree parent(k) =
# k div 8: every part's revenue propagates to ALL ancestors in one
# closed-form explode (ancestor_i = k div 8^i, i = 0..7) + one keyed
# aggregate — no iteration, no recursive join, depth from the same
# arithmetic. share_of_parent is subtree(k)/subtree(parent(k)) as one
# exact division. The hierarchical-rollup pattern for key-encoded
# trees (categories, org charts, file systems).
# ---------------------------------------------------------------------------
@query(
    "bom_subtree_rollup",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey AS k,
             sum({_CENTS.format(x='l_extendedprice')}) AS cents
      FROM lineitem GROUP BY 1
    ),
    lv AS (SELECT unnest(range(0, 8)) AS i),
    up AS (
      SELECT k // (1 << (3 * i)) AS node, cents
      FROM rev CROSS JOIN lv
      WHERE k // (1 << (3 * i)) > 0 OR i = 0
    ),
    sub AS (
      SELECT node, CAST(sum(cents) AS HUGEINT) AS subtree_cents
      FROM up GROUP BY 1
    )
    SELECT s.node,
           CAST((CASE WHEN s.node >= 8 THEN 1 ELSE 0 END
                 + CASE WHEN s.node >= 64 THEN 1 ELSE 0 END
                 + CASE WHEN s.node >= 512 THEN 1 ELSE 0 END
                 + CASE WHEN s.node >= 4096 THEN 1 ELSE 0 END
                 + CASE WHEN s.node >= 32768 THEN 1 ELSE 0 END
                 + CASE WHEN s.node >= 262144 THEN 1 ELSE 0 END
                 + CASE WHEN s.node >= 2097152 THEN 1 ELSE 0 END)
                AS INT) AS depth,
           CAST(s.subtree_cents AS BIGINT) AS subtree_cents,
           CAST(coalesce(r.cents, 0) AS BIGINT) AS own_cents,
           CASE WHEN s.node > 0 THEN
             {_d('s.subtree_cents')} / {_d('p.subtree_cents')}
           END AS share_of_parent
    FROM sub s
    LEFT JOIN rev r ON r.k = s.node
    LEFT JOIN sub p ON p.node = s.node // 8 AND s.node > 0
    """,
)
def q_bom_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOM-style subtree revenue rollup on the key-encoded part tree (parent = key div 8): closed-form ancestor explode, one keyed aggregate, exact-cents share-of-parent - no recursion or iteration."""
    li = read_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(14,2)") * 100).cast(
                "decimal(38,0)"
            )
        ).alias("cents")
    )
    lv = F.sequence(F.lit(0), F.lit(7))
    up = (
        rev.select(
            F.explode(lv).alias("i"), "k", "cents"
        )
        .withColumn("node", F.expr("k div CAST(pow(8, i) AS BIGINT)"))
        .filter((F.col("node") > 0) | (F.col("i") == 0))
    )
    sub = up.groupBy("node").agg(
        F.sum("cents").alias("subtree_cents")
    )
    depth = sum(
        F.when(F.col("node") >= 8**j, 1).otherwise(0) for j in range(1, 8)
    )
    parent = sub.select(
        F.col("node").alias("pnode"),
        F.col("subtree_cents").alias("parent_cents"),
    )
    own = rev.select(F.col("k").alias("onode"), F.col("cents").alias("own"))
    return (
        sub.join(own, sub["node"] == own["onode"], "left")
        .join(
            parent,
            (F.expr("node div 8") == F.col("pnode")) & (F.col("node") > 0),
            "left",
        )
        .select(
            "node",
            depth.cast("int").alias("depth"),
            F.col("subtree_cents").cast("long").alias("subtree_cents"),
            F.coalesce(F.col("own"), F.lit(0)).cast("long").alias(
                "own_cents"
            ),
            F.when(
                F.col("node") > 0,
                _as_double(F.col("subtree_cents"))
                / _as_double(F.col("parent_cents")),
            ).alias("share_of_parent"),
        )
    )


# ---------------------------------------------------------------------------
# Revenue waterfall (r9): gross → discount → net → tax decomposition
# per return flag, entirely in exact integer money units. TPC-H's
# charge expression price·(1−disc)·(1+tax) decomposes into additive
# components scaled to 1e-6 currency units (price cents × 4-decimal
# rate factors are exact integers) — the warehouse bridge report with
# zero float accumulation.
# ---------------------------------------------------------------------------
@query(
    "revenue_waterfall",
    oracle="""
    WITH f AS (
      SELECT l_returnflag AS flag,
             CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                  AS HUGEINT) AS cents,
             CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000 AS HUGEINT)
               AS disc4,
             CAST(CAST(l_tax AS DECIMAL(8,4)) * 10000 AS HUGEINT) AS tax4
      FROM lineitem
    ),
    c AS (
      SELECT flag,
             CAST(sum(cents * 10000) AS HUGEINT) AS gross_u,
             CAST(sum(cents * disc4) AS HUGEINT) AS discount_u,
             CAST(sum(cents * (10000 - disc4)) AS HUGEINT) AS net_u,
             CAST(sum(cents * (10000 - disc4) * tax4) AS HUGEINT)
               AS tax_u4
      FROM f GROUP BY 1
    )
    SELECT flag, CAST(gross_u AS BIGINT) AS gross_u,
           CAST(discount_u AS BIGINT) AS discount_u,
           CAST(net_u AS BIGINT) AS net_u,
           CAST(tax_u4 AS BIGINT) AS tax_u4,
           CAST(CAST(net_u * 10000 + tax_u4 AS VARCHAR) AS DOUBLE) / 1e10
             AS charged_total
    FROM c
    """,
)
def q_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gross-discount-net-tax revenue waterfall per return flag in exact scaled integer money units (price cents x 4-decimal rate factors) - the additive decomposition of the TPC-H charge expression, zero float accumulation."""
    li = read_table(spark, sf_dir, "lineitem")
    f = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(14,2)") * 100)
        .cast("decimal(38,0)")
        .alias("cents"),
        (F.col("l_discount").cast("decimal(8,4)") * 10000)
        .cast("decimal(38,0)")
        .alias("disc4"),
        (F.col("l_tax").cast("decimal(8,4)") * 10000)
        .cast("decimal(38,0)")
        .alias("tax4"),
    )
    c = f.groupBy("flag").agg(
        F.sum(F.col("cents") * 10000).alias("gross_u"),
        F.sum(F.col("cents") * F.col("disc4")).alias("discount_u"),
        F.sum(F.col("cents") * (10000 - F.col("disc4"))).alias("net_u"),
        F.sum(
            F.col("cents") * (10000 - F.col("disc4")) * F.col("tax4")
        ).alias("tax_u4"),
    )
    return c.select(
        "flag",
        F.col("gross_u").cast("long").alias("gross_u"),
        F.col("discount_u").cast("long").alias("discount_u"),
        F.col("net_u").cast("long").alias("net_u"),
        F.col("tax_u4").cast("long").alias("tax_u4"),
        (
            (F.col("net_u") * 10000 + F.col("tax_u4"))
            .cast("string")
            .cast("double")
            / F.lit(1e10)
        ).alias("charged_total"),
    )


# ---------------------------------------------------------------------------
# Price-volume-mix bridge (r9): the FP&A classic — decompose each
# brand's 1995→1996 revenue change into a PRICE effect
# ((S₁Q₀ − S₀Q₁)/Q₀, holding volume at current) and a VOLUME effect
# (S₀(Q₁ − Q₀)/Q₀, at base price), each ONE exact division of integer
# products; the two effects sum exactly to ΔS by construction (an
# identity the invariant test replays). Facts scan once; the bridge
# is brand-dimension sized.
# ---------------------------------------------------------------------------
@query(
    "pvm_bridge",
    oracle="""
    WITH f AS (
      SELECT p.p_brand AS brand,
             CAST(year(l.l_shipdate) AS INT) AS yr,
             CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100
                  AS HUGEINT) AS cents,
             CAST(l.l_quantity AS HUGEINT) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE year(l.l_shipdate) IN (1995, 1996)
    ),
    g AS (
      SELECT brand,
             CAST(sum(CASE WHEN yr = 1995 THEN cents ELSE 0 END)
                  AS HUGEINT) AS s0,
             CAST(sum(CASE WHEN yr = 1995 THEN qty ELSE 0 END)
                  AS HUGEINT) AS q0,
             CAST(sum(CASE WHEN yr = 1996 THEN cents ELSE 0 END)
                  AS HUGEINT) AS s1,
             CAST(sum(CASE WHEN yr = 1996 THEN qty ELSE 0 END)
                  AS HUGEINT) AS q1
      FROM f GROUP BY 1
    )
    SELECT brand, CAST(s0 AS BIGINT) AS s0, CAST(q0 AS BIGINT) AS q0,
           CAST(s1 AS BIGINT) AS s1, CAST(q1 AS BIGINT) AS q1,
           CAST(s1 - s0 AS BIGINT) AS delta_cents,
           CASE WHEN q0 > 0 THEN
             CAST(CAST(s1 * q0 - s0 * q1 AS VARCHAR) AS DOUBLE)
             / CAST(CAST(q0 AS VARCHAR) AS DOUBLE) END AS price_effect,
           CASE WHEN q0 > 0 THEN
             CAST(CAST(s0 * (q1 - q0) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(q0 AS VARCHAR) AS DOUBLE) END AS volume_effect
    FROM g
    """,
)
def q_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix revenue bridge per brand between 1995 and 1996: each effect one exact division of integer products, effects summing exactly to the revenue delta."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    f = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li["l_partkey"] == p["p_partkey"],
        )
        .filter(F.year("l_shipdate").isin(1995, 1996))
        .select(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").alias("yr"),
            (F.col("l_extendedprice").cast("decimal(14,2)") * 100)
            .cast("decimal(38,0)")
            .alias("cents"),
            F.col("l_quantity").cast("decimal(38,0)").alias("qty"),
        )
    )
    g = f.groupBy("brand").agg(
        F.sum(F.when(F.col("yr") == 1995, F.col("cents")).otherwise(0)).alias(
            "s0"
        ),
        F.sum(F.when(F.col("yr") == 1995, F.col("qty")).otherwise(0)).alias(
            "q0"
        ),
        F.sum(F.when(F.col("yr") == 1996, F.col("cents")).otherwise(0)).alias(
            "s1"
        ),
        F.sum(F.when(F.col("yr") == 1996, F.col("qty")).otherwise(0)).alias(
            "q1"
        ),
    )

    def dd_(c):
        return c.cast("string").cast("double")

    return g.select(
        "brand",
        F.col("s0").cast("long").alias("s0"),
        F.col("q0").cast("long").alias("q0"),
        F.col("s1").cast("long").alias("s1"),
        F.col("q1").cast("long").alias("q1"),
        (F.col("s1") - F.col("s0")).cast("long").alias("delta_cents"),
        F.when(
            F.col("q0") > 0,
            dd_(F.col("s1") * F.col("q0") - F.col("s0") * F.col("q1"))
            / dd_(F.col("q0")),
        ).alias("price_effect"),
        F.when(
            F.col("q0") > 0,
            dd_(F.col("s0") * (F.col("q1") - F.col("q0")))
            / dd_(F.col("q0")),
        ).alias("volume_effect"),
    )


# ---------------------------------------------------------------------------
# Weekend lift (r9): weekend vs weekday hourly-rate ratio per event
# type, the weekday derived from pure epoch arithmetic
# ((days+3) mod 7 ≥ 5 — the business_hours_latency convention, no
# engine dayofweek conventions), exact integer counts and hour
# denominators from the dense spine, the lift one cross-multiplied
# division.
# ---------------------------------------------------------------------------
@query(
    "weekend_lift",
    oracle="""
    WITH b AS (
      SELECT min(date_trunc('hour', ts)) AS lo,
             max(date_trunc('hour', ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b
    ),
    sp AS (
      SELECT hr, CASE WHEN ((epoch(hr) // 86400) + 3) % 7 >= 5
                 THEN 1 ELSE 0 END AS wk
      FROM spine
    ),
    hrs AS (
      SELECT CAST(sum(wk) AS BIGINT) AS wk_hours,
             CAST(count(*) - sum(wk) AS BIGINT) AS wd_hours
      FROM sp
    ),
    e AS (
      SELECT event_type,
             CASE WHEN ((epoch(date_trunc('hour', ts)) // 86400) + 3) % 7
                  >= 5 THEN 1 ELSE 0 END AS wk
      FROM events
    ),
    c AS (
      SELECT event_type, CAST(sum(wk) AS BIGINT) AS wk_cnt,
             CAST(count(*) - sum(wk) AS BIGINT) AS wd_cnt
      FROM e GROUP BY 1
    )
    SELECT c.event_type, c.wk_cnt, c.wd_cnt, h.wk_hours, h.wd_hours,
           CASE WHEN c.wd_cnt > 0 AND h.wk_hours > 0 THEN
             CAST(c.wk_cnt * h.wd_hours AS DOUBLE)
             / CAST(c.wd_cnt * h.wk_hours AS DOUBLE) END AS lift,
           CAST(CASE WHEN c.wk_cnt * h.wd_hours > c.wd_cnt * h.wk_hours
                THEN 1 ELSE 0 END AS INT) AS weekend_heavier
    FROM c CROSS JOIN hrs h
    """,
)
def q_weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend vs weekday hourly-rate lift per event type: epoch-arithmetic weekday, exact counts and spine hour denominators, one cross-multiplied division and integer comparison flag."""
    e = read_table(spark, sf_dir, "events")
    wk_expr = (
        "CASE WHEN ((unix_seconds(date_trunc('hour', ts)) div 86400) + 3)"
        " % 7 >= 5 THEN 1 ELSE 0 END"
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
    sp = spine.select(
        F.expr(
            "CASE WHEN ((unix_seconds(hr) div 86400) + 3) % 7 >= 5"
            " THEN 1 ELSE 0 END"
        ).alias("wk")
    )
    hrs = sp.groupBy().agg(
        F.sum("wk").cast("long").alias("wk_hours"),
        (F.count(F.lit(1)) - F.sum("wk")).cast("long").alias("wd_hours"),
    )
    c = e.select("event_type", F.expr(wk_expr).alias("wk")).groupBy(
        "event_type"
    ).agg(
        F.sum("wk").cast("long").alias("wk_cnt"),
        (F.count(F.lit(1)) - F.sum("wk")).cast("long").alias("wd_cnt"),
    )
    j = c.crossJoin(F.broadcast(hrs))
    return j.select(
        "event_type",
        "wk_cnt",
        "wd_cnt",
        "wk_hours",
        "wd_hours",
        F.when(
            (F.col("wd_cnt") > 0) & (F.col("wk_hours") > 0),
            (F.col("wk_cnt") * F.col("wd_hours")).cast("double")
            / (F.col("wd_cnt") * F.col("wk_hours")).cast("double"),
        ).alias("lift"),
        F.when(
            F.col("wk_cnt") * F.col("wd_hours")
            > F.col("wd_cnt") * F.col("wk_hours"),
            1,
        ).otherwise(0).cast("int").alias("weekend_heavier"),
    )


# ---------------------------------------------------------------------------
# Consistent-hash ring with virtual nodes (r9): 4 physical nodes × 8
# vnodes on the md5 ring; every customer key routes to the first
# vnode clockwise (the classic Karger ring, wraparound to the ring
# minimum). Assignment is a UNION+CARRY sweep over (vnodes ∪ keys)
# ordered by ring position — one window, no per-key vnode scan. The
# movement audit re-rings with a 5th node and reports exactly which
# share of keys move (the ~1/5 consistency promise, measured not
# assumed). All positions are integer md5 lanes.
# ---------------------------------------------------------------------------
def _ring_oracle() -> str:
    from datalake_etlscripts_spark.plans.registry import ddb_hex32

    def vnodes(n_nodes: int, alias: str) -> str:
        lane = ddb_hex32("md5('node-' || CAST(n.n AS VARCHAR) || '#' || CAST(v.v AS VARCHAR))")
        return f"""
    {alias} AS (
      SELECT n.n AS node, {lane} AS pos
      FROM (SELECT unnest(range(0, {n_nodes})) AS n) n
      CROSS JOIN (SELECT unnest(range(0, 8)) AS v) v
    )"""

    key_lane = ddb_hex32("md5('key-' || CAST(c_custkey AS VARCHAR))")

    return f"""
    WITH {vnodes(4, "vn4").strip()},
    {vnodes(5, "vn5").strip()},
    keys AS (
      SELECT c_custkey AS key, {key_lane} AS pos FROM customer
    ),
    u4 AS (
      SELECT pos, key, node, tag FROM (
        SELECT pos, NULL::BIGINT AS key, node, 1 AS tag FROM vn4
        UNION ALL SELECT pos, key, NULL, 0 FROM keys
      )
    ),
    a4 AS (
      SELECT key,
             coalesce(min(CASE WHEN tag = 1 THEN node END) OVER
                        (ORDER BY pos, tag
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                      (SELECT node FROM vn4 ORDER BY pos, node LIMIT 1))
               AS node, tag
      FROM u4
    ),
    r4 AS (SELECT key, node FROM a4 WHERE tag = 0),
    u5 AS (
      SELECT pos, key, node, tag FROM (
        SELECT pos, NULL::BIGINT AS key, node, 1 AS tag FROM vn5
        UNION ALL SELECT pos, key, NULL, 0 FROM keys
      )
    ),
    a5 AS (
      SELECT key,
             coalesce(min(CASE WHEN tag = 1 THEN node END) OVER
                        (ORDER BY pos, tag
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                      (SELECT node FROM vn5 ORDER BY pos, node LIMIT 1))
               AS node, tag
      FROM u5
    ),
    r5 AS (SELECT key, node FROM a5 WHERE tag = 0)
    SELECT r4.node AS node,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN r5.node <> r4.node THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_on_resize,
           CAST(CAST(sum(CASE WHEN r5.node <> r4.node THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS DOUBLE) AS move_share
    FROM r4 JOIN r5 ON r5.key = r4.key
    GROUP BY 1
    """


@query("consistent_hash_ring", oracle=_ring_oracle())
def q_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring with 8 vnodes per node: key routing by the ring's suffix-min lookup folded to a literal threshold chain (the vnode ring is a 32/40-entry constant), plus the measured key-movement share when a fifth node joins."""
    # r08 (guide §1.2/§2.4 — the 4-7s noise-band sweep, VERDICT item
    # 9): the union+carry sweep ran TWO single-partition global-order
    # windows over (keys ∪ vnodes) plus two orderBy().limit(1) wrap
    # jobs — ~12 job schedulings for a ring that is a LITERAL: vnode
    # positions depend only on the constants (4/5 nodes × 8 vnodes),
    # not on data. The positions are md5 lanes computable driver-side
    # (hashlib md5 == Spark md5 on the same bytes; int(hex[:8], 16) ==
    # conv(substring(md5, 1, 8), 16, 10)), and the carry
    #   min(node over vnodes at (pos, tag) ≥ the key row)
    # is exactly the suffix-min of node over the pos-ascending vnode
    # list at the first vnode pos ≥ key pos — a 32/40-arm literal
    # WHEN chain, wrap node as the otherwise arm. Both rings fold
    # into ONE projection over one customer scan (the old shape also
    # recomputed the key md5 lane once per ring), so the whole query
    # is scan → project → one groupBy exchange. Identical assignment
    # per key, identical output; at any data scale the ring stays a
    # constant, so the chain is the right shape at 100 TB too.
    import hashlib

    c = read_table(spark, sf_dir, "customer")
    key_lane = "CAST(conv(substring(md5(concat('key-', CAST(c_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT)"

    def ring_expr(n_nodes: int):
        vns = sorted(
            (
                int(
                    hashlib.md5(f"node-{n}#{v}".encode()).hexdigest()[:8], 16
                ),
                n,
            )
            for n in range(n_nodes)
            for v in range(8)
        )
        # suffix-min of node id over the pos-ascending vnode list:
        # sm[i] = min(node[i:]) == the old window's min(node) over
        # every vnode row at or after the key row in (pos, tag) order
        sm = [0] * len(vns)
        m: int | None = None
        for i in range(len(vns) - 1, -1, -1):
            m = vns[i][1] if m is None else min(m, vns[i][1])
            sm[i] = m
        wrap = vns[0][1]  # min (pos, node) vnode — the wraparound
        chain = None
        for (pos, _node), s in zip(vns, sm):
            cond = F.col("pos") <= F.lit(pos)
            chain = (
                F.when(cond, F.lit(s))
                if chain is None
                else chain.when(cond, F.lit(s))
            )
        return chain.otherwise(F.lit(wrap)).cast("int")

    j = c.select(
        F.col("c_custkey").alias("key"), F.expr(key_lane).alias("pos")
    ).select("key", ring_expr(4).alias("node4"), ring_expr(5).alias("node5"))
    return j.groupBy(F.col("node4").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(
            F.when(F.col("node5") != F.col("node4"), 1).otherwise(0)
        ).cast("long").alias("moved_on_resize"),
        (
            F.sum(
                F.when(F.col("node5") != F.col("node4"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("move_share"),
    )


# ---------------------------------------------------------------------------
# Idempotency-window dedup (r9): the at-least-once ingest cleaner —
# events identical in (user, type, permille-quantized value) within
# 10 s of the kept predecessor are retry duplicates. One content-keyed
# window; the "kept predecessor" is exact because duplicates chain:
# inside a content group, an event survives iff the gap to its
# PREVIOUS event exceeds 10 s (chained retries collapse to the run
# head). Output is the survivors + per-type drop accounting.
# ---------------------------------------------------------------------------
@query(
    "idempotency_window_dedup",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, ts,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v4,
             epoch_us(ts) AS ep
      FROM events
    ),
    marked AS (
      SELECT event_type,
             CASE WHEN lag(ep) OVER w IS NULL
                  OR ep - lag(ep) OVER w > 10000000 THEN 1 ELSE 0 END
               AS keep
      FROM e
      WINDOW w AS (PARTITION BY user_id, event_type, v4
                   ORDER BY ep, event_id)
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(keep) AS BIGINT) AS n_kept,
           CAST(count(*) - sum(keep) AS BIGINT) AS n_dropped
    FROM marked GROUP BY 1
    """,
)
def q_idempotency_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once retry dedup: same-content events within 10s of the previous one drop (chained retries collapse to the run head) - one content-keyed window, per-type drop accounting."""
    e = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        (F.col("value").cast("decimal(18,4)") * 10000)
        .cast("long")
        .alias("v4"),
        F.unix_micros("ts").alias("ep"),
    )
    w = W.partitionBy("user_id", "event_type", "v4").orderBy(
        "ep", "event_id"
    )
    lag_ep = F.lag("ep").over(w)
    marked = e.select(
        "event_type",
        F.when(
            lag_ep.isNull() | (F.col("ep") - lag_ep > 10_000_000), 1
        )
        .otherwise(0)
        .alias("keep"),
    )
    return marked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("keep").cast("long").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("keep")).cast("long").alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Top-N + OTHERS rollup (r9): the long-tail reporting collapse — the
# top 5 part types by exact revenue keep their names, everything else
# folds into one OTHER row, shares stay exact. Rank by (cents DESC,
# type ASC); the type dictionary is bounded so the rank window is
# dictionary-sized after the fact aggregate.
# ---------------------------------------------------------------------------
@query(
    "topn_with_others",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_type AS typ,
             sum({_CENTS.format(x='l.l_extendedprice')}) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    ),
    t AS (SELECT sum(cents) AS tot FROM rev),
    r AS (
      SELECT typ, cents,
             row_number() OVER (ORDER BY cents DESC, typ ASC) AS rk
      FROM rev
    ),
    g AS (
      SELECT CASE WHEN rk <= 5 THEN typ ELSE 'OTHER' END AS bucket,
             CAST(sum(cents) AS HUGEINT) AS cents,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(min(rk) AS BIGINT) AS best_rank
      FROM r GROUP BY 1
    )
    SELECT bucket, CAST(g.cents AS BIGINT) AS cents, n_types, best_rank,
           {_d('g.cents')} / {_d('t.tot')} AS share
    FROM g CROSS JOIN t
    """,
)
def q_topn_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 part types by exact revenue with the long tail folded into OTHER - dictionary-sized rank window after one fact aggregate, exact shares."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    rev = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_type")),
            li["l_partkey"] == p["p_partkey"],
        )
        .groupBy(F.col("p_type").alias("typ"))
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(14,2)") * 100).cast(
                    "decimal(38,0)"
                )
            ).alias("cents")
        )
    )
    tot = rev.groupBy().agg(F.sum("cents").alias("tot"))
    wr = W.orderBy(F.col("cents").desc(), F.col("typ").asc())
    r = rev.withColumn("rk", F.row_number().over(wr))
    g = r.groupBy(
        F.when(F.col("rk") <= 5, F.col("typ")).otherwise("OTHER").alias(
            "bucket"
        )
    ).agg(
        F.sum("cents").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.min("rk").cast("long").alias("best_rank"),
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.col("cents").cast("long").alias("cents"),
        "n_types",
        "best_rank",
        (_as_double(F.col("cents")) / _as_double(F.col("tot"))).alias(
            "share"
        ),
    )


# ---------------------------------------------------------------------------
# Governed masked view (r9): the row-filter + column-mask governance
# shape — BUILDING customers only, names masked to first char + '***',
# balances generalized to 1000-unit bands, keys pseudonymized on the
# md5 lane. Pure JVM expressions; the audit columns count what the
# mask destroyed (distinct names before/after) so the privacy/utility
# trade is measured, not asserted.
# ---------------------------------------------------------------------------
@query(
    "data_masking_view",
    oracle=f"""
    WITH m AS (
      SELECT substr(md5('pid-' || CAST(c_custkey AS VARCHAR)), 1, 12)
               AS pid,
             substr(c_name, 1, 1) || '***' AS masked_name,
             CAST(floor(CAST(c_acctbal AS DECIMAL(14,2)) / 1000)
                  AS BIGINT) * 1000 AS bal_band,
             c_mktsegment, c_name
      FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT bal_band, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT c_name) AS BIGINT) AS distinct_before,
           CAST(count(DISTINCT masked_name) AS BIGINT) AS distinct_after,
           min(pid) AS sample_pid
    FROM m GROUP BY 1
    """,
)
def q_data_masking_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-filtered, column-masked governance view: md5 pseudonyms, first-char name masks, 1000-unit balance bands, with before/after distinct counts measuring what the mask destroyed."""
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    m = c.select(
        F.expr(
            "substring(md5(concat('pid-', CAST(c_custkey AS STRING))), 1, 12)"
        ).alias("pid"),
        F.concat(F.substring("c_name", 1, 1), F.lit("***")).alias(
            "masked_name"
        ),
        (
            F.floor(F.col("c_acctbal").cast("decimal(14,2)") / 1000) * 1000
        ).cast("long").alias("bal_band"),
        "c_name",
    )
    return m.groupBy("bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("c_name").cast("long").alias("distinct_before"),
        F.countDistinct("masked_name").cast("long").alias("distinct_after"),
        F.min("pid").alias("sample_pid"),
    )


# ---------------------------------------------------------------------------
# Inventory aging (r9): the unmatched side of the FIFO sweep — supply
# lots (or tails of lots) beyond the matched quantity M are the
# remaining stock; each remnant ages from its ship date to the
# table's horizon and buckets into 0-30 / 31-90 / 91+ days. Remnant
# quantity is pure interval arithmetic on the same exact cumulative
# sums as fifo_allocation: leftover(i) = rcum − max(rcum − qty, M)
# when positive. One part-keyed window + one bucket aggregate.
# ---------------------------------------------------------------------------
@query(
    "inventory_aging",
    oracle="""
    WITH li AS (
      SELECT l_partkey AS part, l_orderkey AS okey, l_linenumber AS lno,
             l_shipdate AS sd, l_linestatus AS st,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem WHERE l_quantity > 0
    ),
    r AS (
      SELECT part, sd, qty,
             CAST(sum(qty) OVER w AS BIGINT) AS rcum
      FROM li WHERE st = 'F'
      WINDOW w AS (PARTITION BY part ORDER BY sd, okey, lno
                   ROWS UNBOUNDED PRECEDING)
    ),
    dsum AS (
      SELECT part, CAST(sum(qty) AS BIGINT) AS dtot
      FROM li WHERE st = 'O' GROUP BY 1
    ),
    m AS (
      SELECT r.part, least(max(r.rcum), coalesce(max(d.dtot), 0)) AS matched
      FROM r LEFT JOIN dsum d ON d.part = r.part
      GROUP BY 1
    ),
    horizon AS (SELECT max(sd) AS hz FROM li),
    rem AS (
      SELECT r.part, r.sd,
             r.rcum - greatest(r.rcum - r.qty, m.matched) AS leftover,
             (epoch(h.hz) - epoch(r.sd)) // 86400 AS age_days
      FROM r JOIN m ON m.part = r.part CROSS JOIN horizon h
      WHERE r.rcum > m.matched
    )
    SELECT CASE WHEN age_days <= 30 THEN '0-30'
                WHEN age_days <= 90 THEN '31-90'
                ELSE '91+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_lots,
           CAST(sum(leftover) AS BIGINT) AS leftover_qty,
           CAST(max(age_days) AS BIGINT) AS oldest_days
    FROM rem GROUP BY 1
    """,
)
def q_inventory_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining-stock aging report - the unmatched side of the FIFO sweep: remnant lot quantities by exact interval arithmetic on cumulative sums, aged to the table horizon, bucketed 0-30/31-90/91+ days."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select(
            F.col("l_partkey").alias("part"),
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").alias("lno"),
            F.col("l_shipdate").alias("sd"),
            F.col("l_linestatus").alias("st"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
    )
    w = (
        W.partitionBy("part")
        .orderBy("sd", "okey", "lno")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    r = li.filter(F.col("st") == "F").select(
        "part", "sd", "qty", F.sum("qty").over(w).alias("rcum")
    )
    dsum = (
        li.filter(F.col("st") == "O")
        .groupBy("part")
        .agg(F.sum("qty").alias("dtot"))
        .withColumnRenamed("part", "dpart")
    )
    m = (
        r.groupBy("part")
        .agg(F.max("rcum").alias("rmax"))
        .join(dsum, F.col("part") == F.col("dpart"), "left")
        .select(
            F.col("part").alias("mpart"),
            F.least(
                F.col("rmax"), F.coalesce(F.col("dtot"), F.lit(0))
            ).alias("matched"),
        )
    )
    hz = li.groupBy().agg(F.max("sd").alias("hz"))
    rem = (
        r.join(m, F.col("part") == F.col("mpart"))
        .filter(F.col("rcum") > F.col("matched"))
        .crossJoin(F.broadcast(hz))
        .select(
            (
                F.col("rcum")
                - F.greatest(F.col("rcum") - F.col("qty"), F.col("matched"))
            ).alias("leftover"),
            F.expr(
                "(unix_seconds(hz) - unix_seconds(sd)) div 86400"
            ).alias("age_days"),
        )
    )
    return rem.groupBy(
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .otherwise("91+")
        .alias("age_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lots"),
        F.sum("leftover").cast("long").alias("leftover_qty"),
        F.max("age_days").cast("long").alias("oldest_days"),
    )


# ---------------------------------------------------------------------------
# Revenue-recognition schedule (r9): each order's value spreads
# evenly across the calendar months from order date to its last ship
# date — cents div n_months per month with the REMAINDER recognized
# in the first month (the accounting convention, and the same
# largest-remainder integer discipline as the apportionment query:
# Σ recognized ≡ order cents exactly). Month explode is bounded by
# the order's span; output is the calendar-month ledger.
# ---------------------------------------------------------------------------
@query(
    "rev_recognition_schedule",
    oracle="""
    WITH o AS (
      SELECT o.o_orderkey AS okey,
             CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS HUGEINT)
               AS cents,
             date_trunc('month', o.o_orderdate) AS m0,
             date_trunc('month', max(l.l_shipdate)) AS m1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, 3
    ),
    span AS (
      SELECT okey, cents, m0,
             greatest(CAST(1 AS HUGEINT),
                      CAST((year(m1) - year(m0)) * 12
                           + (month(m1) - month(m0)) + 1 AS HUGEINT))
               AS n_m
      FROM o
    ),
    sched AS (
      SELECT s.okey,
             s.m0 + to_months(CAST(g.i AS INT)) AS month,
             s.cents // s.n_m
               + CASE WHEN g.i = 0 THEN s.cents % s.n_m ELSE 0 END
               AS recognized
      FROM span s,
           LATERAL (SELECT unnest(range(0, CAST(s.n_m AS BIGINT))) AS i) g
    )
    SELECT CAST(strftime(month, '%Y-%m') AS VARCHAR) AS month,
           CAST(count(DISTINCT okey) AS BIGINT) AS n_orders,
           CAST(sum(recognized) AS BIGINT) AS recognized_cents
    FROM sched GROUP BY 1
    """,
)
def q_rev_recognition_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Straight-line revenue recognition from order month to last-ship month: integer cents div months with the remainder in month one (sums reconcile exactly), calendar-month ledger."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_orderkey").alias("okey"),
            (F.col("o_totalprice").cast("decimal(14,2)") * 100)
            .cast("decimal(38,0)")
            .alias("cents"),
            F.date_trunc("month", F.col("o_orderdate")).alias("m0"),
        )
        .agg(F.date_trunc("month", F.max("l_shipdate")).alias("m1"))
    )
    span = base.select(
        "okey",
        "cents",
        "m0",
        # synthetic ship dates can precede the order month — clamp
        F.greatest(
            F.lit(1).cast("decimal(38,0)"),
            (
                (F.year("m1") - F.year("m0")) * 12
                + (F.month("m1") - F.month("m0"))
                + 1
            ).cast("decimal(38,0)"),
        ).alias("n_m"),
    )
    sched = span.select(
        "okey",
        "cents",
        "n_m",
        "m0",
        F.explode(
            F.sequence(F.lit(0), (F.col("n_m") - 1).cast("int"))
        ).alias("i"),
    ).select(
        "okey",
        F.add_months(F.col("m0"), F.col("i")).alias("month"),
        (
            F.expr("cents div n_m")
            + F.when(F.col("i") == 0, F.expr("cents % n_m")).otherwise(0)
        ).alias("recognized"),
    )
    return sched.groupBy(
        F.date_format("month", "yyyy-MM").alias("month")
    ).agg(
        F.countDistinct("okey").cast("long").alias("n_orders"),
        F.sum("recognized").cast("long").alias("recognized_cents"),
    )


# ---------------------------------------------------------------------------
# Weekly rank movers (r9): the BI "top movers" report — part types
# ranked by exact revenue in two adjacent January weeks, joined on
# type, biggest |Δrank| first. Ranks run per week on the
# dictionary-sized type table after one fact aggregate; ties are
# (cents DESC, type ASC) in both engines.
# ---------------------------------------------------------------------------
@query(
    "weekly_rank_movers",
    oracle=f"""
    WITH f AS (
      SELECT p.p_type AS typ, date_trunc('week', l.l_shipdate) AS wk,
             sum({_CENTS.format(x='l.l_extendedprice')}) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1996-01-15'
      GROUP BY 1, 2
    ),
    wks AS (SELECT DISTINCT wk FROM f ORDER BY wk LIMIT 2),
    r AS (
      SELECT typ, wk, cents,
             row_number() OVER (PARTITION BY wk
               ORDER BY cents DESC, typ ASC) AS rk
      FROM f WHERE wk IN (SELECT wk FROM wks)
    ),
    a AS (SELECT typ, cents AS cents_w1, rk AS rk_w1 FROM r
          WHERE wk = (SELECT min(wk) FROM wks)),
    b AS (SELECT typ, cents AS cents_w2, rk AS rk_w2 FROM r
          WHERE wk = (SELECT max(wk) FROM wks))
    SELECT a.typ, CAST(a.cents_w1 AS BIGINT) AS cents_w1,
           CAST(b.cents_w2 AS BIGINT) AS cents_w2,
           CAST(a.rk_w1 AS BIGINT) AS rk_w1,
           CAST(b.rk_w2 AS BIGINT) AS rk_w2,
           CAST(a.rk_w1 - b.rk_w2 AS BIGINT) AS rank_gain
    FROM a JOIN b ON b.typ = a.typ
    """,
)
def q_weekly_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week part-type rank movers in two adjacent weeks: exact-cents per-week rankings on the dictionary-sized type table, deterministic tie order, signed rank gains."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-15").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part")
    f = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_type")),
            li["l_partkey"] == p["p_partkey"],
        )
        .groupBy(
            F.col("p_type").alias("typ"),
            F.date_trunc("week", F.col("l_shipdate")).alias("wk"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(14,2)") * 100).cast(
                    "decimal(38,0)"
                )
            ).alias("cents")
        )
    )
    wks = [
        r["wk"]
        for r in f.select("wk").distinct().orderBy("wk").limit(2).collect()
    ]
    r = f.filter(F.col("wk").isin(wks)).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("wk").orderBy(
                F.col("cents").desc(), F.col("typ").asc()
            )
        ),
    )
    a = r.filter(F.col("wk") == wks[0]).select(
        "typ", F.col("cents").alias("cents_w1"), F.col("rk").alias("rk_w1")
    )
    b = r.filter(F.col("wk") == wks[1]).select(
        F.col("typ").alias("typ2"),
        F.col("cents").alias("cents_w2"),
        F.col("rk").alias("rk_w2"),
    )
    return a.join(b, F.col("typ") == F.col("typ2")).select(
        "typ",
        F.col("cents_w1").cast("long").alias("cents_w1"),
        F.col("cents_w2").cast("long").alias("cents_w2"),
        F.col("rk_w1").cast("long").alias("rk_w1"),
        F.col("rk_w2").cast("long").alias("rk_w2"),
        (F.col("rk_w1") - F.col("rk_w2")).cast("long").alias("rank_gain"),
    )


# ---------------------------------------------------------------------------
# Arc elasticity (r9): the midpoint price-elasticity of demand per
# brand between 1995 and 1996, with the average-price rationals'
# common denominators CANCELLED algebraically:
#   E = (q₁−q₀)(s₁q₀ + s₀q₁) / ((q₁+q₀)(s₁q₀ − s₀q₁))
# — pure integer products, ONE division, sign meaningful. The
# economics twin of pvm_bridge on the same moments.
# ---------------------------------------------------------------------------
@query(
    "arc_elasticity",
    oracle="""
    WITH f AS (
      SELECT p.p_brand AS brand, CAST(year(l.l_shipdate) AS INT) AS yr,
             CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100
                  AS HUGEINT) AS cents,
             CAST(l.l_quantity AS HUGEINT) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE year(l.l_shipdate) IN (1995, 1996)
    ),
    g AS (
      SELECT brand,
             CAST(sum(CASE WHEN yr = 1995 THEN cents ELSE 0 END)
                  AS HUGEINT) AS s0,
             CAST(sum(CASE WHEN yr = 1995 THEN qty ELSE 0 END)
                  AS HUGEINT) AS q0,
             CAST(sum(CASE WHEN yr = 1996 THEN cents ELSE 0 END)
                  AS HUGEINT) AS s1,
             CAST(sum(CASE WHEN yr = 1996 THEN qty ELSE 0 END)
                  AS HUGEINT) AS q1
      FROM f GROUP BY 1
    )
    SELECT brand, CAST(q0 AS BIGINT) AS q0, CAST(q1 AS BIGINT) AS q1,
           CAST(s0 AS BIGINT) AS s0, CAST(s1 AS BIGINT) AS s1,
           CASE WHEN q0 > 0 AND q1 > 0
                 AND (q1 + q0) * (s1 * q0 - s0 * q1) <> 0 THEN
             CAST(CAST((q1 - q0) * (s1 * q0 + s0 * q1) AS VARCHAR)
                  AS DOUBLE)
             / CAST(CAST((q1 + q0) * (s1 * q0 - s0 * q1) AS VARCHAR)
                    AS DOUBLE) END AS elasticity
    FROM g
    """,
)
def q_arc_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Midpoint arc price-elasticity per brand between 1995 and 1996: average-price denominators cancelled algebraically so the estimate is pure integer products and one division."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    f = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li["l_partkey"] == p["p_partkey"],
        )
        .filter(F.year("l_shipdate").isin(1995, 1996))
        .select(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").alias("yr"),
            (F.col("l_extendedprice").cast("decimal(14,2)") * 100)
            .cast("decimal(38,0)")
            .alias("cents"),
            F.col("l_quantity").cast("decimal(38,0)").alias("qty"),
        )
    )
    g = f.groupBy("brand").agg(
        F.sum(F.when(F.col("yr") == 1995, F.col("cents")).otherwise(0)).alias(
            "s0"
        ),
        F.sum(F.when(F.col("yr") == 1995, F.col("qty")).otherwise(0)).alias(
            "q0"
        ),
        F.sum(F.when(F.col("yr") == 1996, F.col("cents")).otherwise(0)).alias(
            "s1"
        ),
        F.sum(F.when(F.col("yr") == 1996, F.col("qty")).otherwise(0)).alias(
            "q1"
        ),
    )
    num = (F.col("q1") - F.col("q0")) * (
        F.col("s1") * F.col("q0") + F.col("s0") * F.col("q1")
    )
    den = (F.col("q1") + F.col("q0")) * (
        F.col("s1") * F.col("q0") - F.col("s0") * F.col("q1")
    )
    return g.select(
        "brand",
        F.col("q0").cast("long").alias("q0"),
        F.col("q1").cast("long").alias("q1"),
        F.col("s0").cast("long").alias("s0"),
        F.col("s1").cast("long").alias("s1"),
        F.when(
            (F.col("q0") > 0) & (F.col("q1") > 0) & (den != 0),
            num.cast("string").cast("double")
            / den.cast("string").cast("double"),
        ).alias("elasticity"),
    )


# ---------------------------------------------------------------------------
# Monthly ARPU / ARPPU (r9): revenue per active and per paying user
# by calendar month — exact cents, exact distinct counts, one
# division each. The unit-economics readout every subscription
# dashboard leads with.
# ---------------------------------------------------------------------------
@query(
    "arpu_monthly",
    oracle="""
    WITH a AS (
      SELECT date_trunc('month', ts) AS m, user_id,
             CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(CAST(value AS DECIMAL(18,4)) * 10000
                       AS BIGINT) ELSE 0 END) AS BIGINT) AS v4
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(strftime(m, '%Y-%m') AS VARCHAR) AS month,
           CAST(count(*) AS BIGINT) AS active_users,
           CAST(sum(CASE WHEN v4 > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS paying_users,
           CAST(sum(v4) AS BIGINT) AS revenue4,
           CAST(sum(v4) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS arpu4,
           CASE WHEN sum(CASE WHEN v4 > 0 THEN 1 ELSE 0 END) > 0 THEN
             CAST(sum(v4) AS DOUBLE)
             / CAST(sum(CASE WHEN v4 > 0 THEN 1 ELSE 0 END) AS DOUBLE)
           END AS arppu4
    FROM a GROUP BY 1
    """,
)
def q_arpu_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly ARPU and ARPPU: exact decimal-scaled revenue per active and per paying user, one division each."""
    e = read_table(spark, sf_dir, "events")
    a = e.groupBy(
        F.date_trunc("month", F.col("ts")).alias("m"), "user_id"
    ).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                (F.col("value").cast("decimal(18,4)") * 10000).cast("long"),
            ).otherwise(0)
        ).cast("long").alias("v4")
    )
    paying = F.sum(F.when(F.col("v4") > 0, 1).otherwise(0))
    return a.groupBy(F.date_format("m", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("active_users"),
        paying.cast("long").alias("paying_users"),
        F.sum("v4").cast("long").alias("revenue4"),
        (
            F.sum("v4").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("arpu4"),
        F.when(
            paying > 0,
            F.sum("v4").cast("double") / paying.cast("double"),
        ).alias("arppu4"),
    )


# ---------------------------------------------------------------------------
# Supplier concentration risk (r9): per part, the supplier HHI of
# shipped quantity — Σqᵢ²/Q² as ONE exact division — with sole-source
# flags and the risk roll-up (parts by supplier-count band). The
# supply-chain fragility audit, same exact-integer discipline as the
# customer-revenue HHI.
# ---------------------------------------------------------------------------
@query(
    "supplier_concentration",
    oracle="""
    WITH s AS (
      SELECT l_partkey AS part, l_suppkey AS supp,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    per AS (
      SELECT part, CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(q) AS HUGEINT) AS qt,
             CAST(sum(q * q) AS HUGEINT) AS qsq
      FROM s GROUP BY 1
    ),
    h AS (
      SELECT part, n_suppliers,
             CAST(CAST(qsq AS VARCHAR) AS DOUBLE)
               / (CAST(CAST(qt AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(qt AS VARCHAR) AS DOUBLE)) AS hhi
      FROM per
    )
    SELECT CASE WHEN n_suppliers = 1 THEN 'sole'
                WHEN n_suppliers <= 3 THEN '2-3'
                ELSE '4+' END AS supplier_band,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CASE WHEN hhi > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_concentrated,
           min(hhi) AS min_hhi, max(hhi) AS max_hhi
    FROM h GROUP BY 1
    """,
)
def q_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part supplier HHI of shipped quantity (one exact division), sole-source flags, and the fragility roll-up by supplier-count band."""
    li = read_table(spark, sf_dir, "lineitem")
    s = li.groupBy(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("decimal(38,0)").alias("q"))
    per = s.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("q").alias("qt"),
        F.sum(F.col("q") * F.col("q")).alias("qsq"),
    )

    def dd_(c):
        return c.cast("string").cast("double")

    h = per.select(
        "part",
        "n_suppliers",
        (dd_(F.col("qsq")) / (dd_(F.col("qt")) * dd_(F.col("qt")))).alias(
            "hhi"
        ),
    )
    return h.groupBy(
        F.when(F.col("n_suppliers") == 1, "sole")
        .when(F.col("n_suppliers") <= 3, "2-3")
        .otherwise("4+")
        .alias("supplier_band")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.when(F.col("hhi") > 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_concentrated"),
        F.min("hhi").alias("min_hhi"),
        F.max("hhi").alias("max_hhi"),
    )


# ---------------------------------------------------------------------------
# Brand return rates (r9): per-brand returned-line share with the
# above-fleet-average flag decided by integer cross-multiplication
# (n_ret·N_lines > n_lines·N_ret) — the product-quality screen on the
# same exact-integer discipline as the waterfall. One join, one
# aggregate, one division per brand.
# ---------------------------------------------------------------------------
@query(
    "brand_return_rates",
    oracle="""
    WITH f AS (
      SELECT p.p_brand AS brand,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ret
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n_lines) AS BIGINT) AS nl,
                 CAST(sum(n_ret) AS BIGINT) AS nr FROM f)
    SELECT f.brand, f.n_lines, f.n_ret,
           CAST(f.n_ret AS DOUBLE) / CAST(f.n_lines AS DOUBLE)
             AS return_rate,
           CAST(CASE WHEN f.n_ret * t.nl > f.n_lines * t.nr
                THEN 1 ELSE 0 END AS INT) AS above_average
    FROM f CROSS JOIN t
    """,
)
def q_brand_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand returned-line shares with cross-multiplied above-fleet-average flags - one broadcast join, exact integer counts, one division per brand."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    f = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li["l_partkey"] == p["p_partkey"],
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).cast("long").alias("n_ret"),
        )
    )
    t = f.groupBy().agg(
        F.sum("n_lines").cast("long").alias("nl"),
        F.sum("n_ret").cast("long").alias("nr"),
    )
    return f.crossJoin(F.broadcast(t)).select(
        "brand",
        "n_lines",
        "n_ret",
        (F.col("n_ret").cast("double") / F.col("n_lines").cast("double")).alias(
            "return_rate"
        ),
        F.when(
            F.col("n_ret") * F.col("nl") > F.col("n_lines") * F.col("nr"), 1
        ).otherwise(0).cast("int").alias("above_average"),
    )


# ---------------------------------------------------------------------------
# Discount response curve (r9): does deeper discounting move volume?
# Lines bucket by exact 4-decimal discount, each bucket reports exact
# quantity and revenue sums with single-division averages — the
# pricing-analytics input to the elasticity story (arc_elasticity is
# the two-period summary; this is the cross-sectional curve).
# ---------------------------------------------------------------------------
@query(
    "discount_response_curve",
    oracle="""
    WITH f AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000 AS BIGINT)
               AS disc4,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                  AS HUGEINT) AS cents
      FROM lineitem
    )
    SELECT disc4, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(qty) AS BIGINT) AS total_qty,
           CAST(sum(cents) AS BIGINT) AS cents,
           CAST(sum(qty) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS avg_qty,
           CAST(CAST(sum(cents) AS VARCHAR) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS avg_cents
    FROM f GROUP BY 1
    """,
)
def q_discount_response_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume and revenue response by exact 4-decimal discount bucket: integer sums, single-division averages - the cross-sectional pricing curve beside arc_elasticity."""
    li = read_table(spark, sf_dir, "lineitem")
    f = li.select(
        (F.col("l_discount").cast("decimal(8,4)") * 10000)
        .cast("long")
        .alias("disc4"),
        F.col("l_quantity").cast("long").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(14,2)") * 100)
        .cast("decimal(38,0)")
        .alias("cents"),
    )
    return f.groupBy("disc4").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("qty").cast("long").alias("total_qty"),
        F.sum("cents").cast("long").alias("cents"),
        (F.sum("qty").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_qty"
        ),
        (
            F.sum("cents").cast("string").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_cents"),
    )


# ---------------------------------------------------------------------------
# Brand cross-sell lift (r9): brand pairs co-purchased within one
# order vs independence — the frequent_pairs shape lifted to the
# dictionary-bounded brand grain (≤25², so the pair join runs on
# order-distinct brand sets after ONE fact join). Exact counts,
# cross-multiplied lift flags.
# ---------------------------------------------------------------------------
@query(
    "brand_cross_sell",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM ob),
    per AS (
      SELECT brand, CAST(count(*) AS BIGINT) AS n_b FROM ob GROUP BY 1
    ),
    pairs AS (
      SELECT a.brand AS ba, b.brand AS bb,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM ob a JOIN ob b ON b.okey = a.okey AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT p.ba, p.bb, p.n_ab, pa.n_b AS n_a, pb.n_b AS n_b, n.n_orders,
           CAST(n.n_orders * p.n_ab AS DOUBLE)
             / CAST(pa.n_b * pb.n_b AS DOUBLE) AS lift,
           CAST(CASE WHEN n.n_orders * p.n_ab > pa.n_b * pb.n_b
                THEN 1 ELSE 0 END AS INT) AS complements
    FROM pairs p
    JOIN per pa ON pa.brand = p.ba
    JOIN per pb ON pb.brand = p.bb
    CROSS JOIN n
    """,
)
def q_brand_cross_sell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand co-purchase lift within orders at the dictionary-bounded brand grain: exact pair counts over order-distinct brand sets, cross-multiplied complement flags."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    ob = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li["l_partkey"] == p["p_partkey"],
        )
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n = ob.select("okey").distinct().groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    per = ob.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_b")
    )
    b2 = ob.select(
        F.col("okey").alias("ok2"), F.col("brand").alias("bb")
    )
    pairs = (
        ob.join(
            b2,
            (F.col("okey") == F.col("ok2"))
            & (F.col("brand") < F.col("bb")),
        )
        .groupBy(F.col("brand").alias("ba"), "bb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    pa = per.select(F.col("brand").alias("ka"), F.col("n_b").alias("n_a"))
    pb = per.select(F.col("brand").alias("kb"), F.col("n_b").alias("n_b2"))
    j = (
        pairs.join(F.broadcast(pa), F.col("ba") == F.col("ka"))
        .join(F.broadcast(pb), F.col("bb") == F.col("kb"))
        .crossJoin(F.broadcast(n))
    )
    return j.select(
        "ba",
        "bb",
        "n_ab",
        "n_a",
        F.col("n_b2").alias("n_b"),
        "n_orders",
        (
            (F.col("n_orders") * F.col("n_ab")).cast("double")
            / (F.col("n_a") * F.col("n_b2")).cast("double")
        ).alias("lift"),
        F.when(
            F.col("n_orders") * F.col("n_ab")
            > F.col("n_a") * F.col("n_b2"),
            1,
        ).otherwise(0).cast("int").alias("complements"),
    )


# ---------------------------------------------------------------------------
# Order backlog curve (r9): open orders over time — cumulative orders
# placed minus cumulative orders fully shipped, on the calendar-
# bounded day spine. "Fully shipped" = the order's LAST ship date;
# both cumulatives are exact integers from day-grain aggregates.
# The operations-health curve behind cycle-time tails.
# ---------------------------------------------------------------------------
@query(
    "order_backlog_curve",
    oracle="""
    WITH placed AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             CAST(count(*) AS BIGINT) AS n_placed
      FROM orders GROUP BY 1
    ),
    shipped AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n_shipped FROM (
        SELECT o.o_orderkey, date_trunc('day', max(l.l_shipdate)) AS d
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
      ) GROUP BY 1
    ),
    b AS (
      SELECT min(d) AS lo, max(d) AS hi FROM (
        SELECT d FROM placed UNION ALL SELECT d FROM shipped
      )
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM b
    ),
    dense AS (
      SELECT s.d, coalesce(p.n_placed, 0) AS n_placed,
             coalesce(sh.n_shipped, 0) AS n_shipped
      FROM spine s
      LEFT JOIN placed p ON p.d = s.d
      LEFT JOIN shipped sh ON sh.d = s.d
    )
    SELECT CAST(strftime(d, '%Y-%m-%d') AS VARCHAR) AS day,
           CAST(n_placed AS BIGINT) AS n_placed,
           CAST(n_shipped AS BIGINT) AS n_shipped,
           CAST(sum(n_placed) OVER w - sum(n_shipped) OVER w AS BIGINT)
             AS backlog
    FROM dense
    WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)
    """,
)
def q_order_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over the day spine: cumulative placed minus cumulative fully-shipped (last ship date), exact integers throughout."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    placed = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_placed"))
    shipped = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.date_trunc("day", F.max("l_shipdate")).alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shipped"))
    )
    alld = placed.select("d").unionByName(shipped.select("d"))
    b = alld.groupBy().agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = b.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias(
            "d"
        )
    )
    dense = (
        spine.join(placed, "d", "left")
        .join(shipped, "d", "left")
        .select(
            "d",
            F.coalesce("n_placed", F.lit(0)).alias("n_placed"),
            F.coalesce("n_shipped", F.lit(0)).alias("n_shipped"),
        )
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    return dense.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n_placed").cast("long").alias("n_placed"),
        F.col("n_shipped").cast("long").alias("n_shipped"),
        (F.sum("n_placed").over(w) - F.sum("n_shipped").over(w))
        .cast("long")
        .alias("backlog"),
    )


# ---------------------------------------------------------------------------
# Price-dispersion audit (r9): the law-of-one-price screen — per part
# the min and max UNIT price (exact cents/qty rationals, rank-picked
# by the exact-division double with a deterministic line tie-break)
# and the dispersion ratio; top-20 most dispersed parts. One fact
# scan, part-keyed windows.
# ---------------------------------------------------------------------------
@query(
    "price_dispersion_audit",
    oracle="""
    WITH f AS (
      SELECT l_partkey AS part, l_orderkey AS okey, l_linenumber AS lno,
             CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                  AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                  AS BIGINT) AS DOUBLE) / CAST(l_quantity AS DOUBLE)
               AS up
      FROM lineitem WHERE l_quantity > 0
    ),
    r AS (
      SELECT part, cents, qty, up,
             row_number() OVER (PARTITION BY part
               ORDER BY up ASC, okey, lno) AS rlo,
             row_number() OVER (PARTITION BY part
               ORDER BY up DESC, okey, lno) AS rhi,
             count(*) OVER (PARTITION BY part) AS n
      FROM f
    ),
    lo AS (SELECT part, cents AS lo_cents, qty AS lo_qty, up AS lo_up, n
           FROM r WHERE rlo = 1),
    hi AS (SELECT part, cents AS hi_cents, qty AS hi_qty, up AS hi_up
           FROM r WHERE rhi = 1)
    SELECT lo.part, CAST(lo.n AS BIGINT) AS n_lines,
           lo.lo_up, hi.hi_up,
           hi.hi_up / lo.lo_up AS dispersion_ratio
    FROM lo JOIN hi ON hi.part = lo.part
    ORDER BY hi.hi_up / lo.lo_up DESC, lo.part ASC LIMIT 20
    """,
)
def q_price_dispersion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Law-of-one-price audit: per-part min/max unit price rank-picked with deterministic tie order, top-20 dispersion ratios via distributed TakeOrdered."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 0
    )
    f = li.select(
        F.col("l_partkey").alias("part"),
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lno"),
        (F.col("l_extendedprice").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    ).withColumn(
        "up", F.col("cents").cast("double") / F.col("qty").cast("double")
    )
    wlo = W.partitionBy("part").orderBy(
        F.col("up").asc(), F.col("okey"), F.col("lno")
    )
    whi = W.partitionBy("part").orderBy(
        F.col("up").desc(), F.col("okey"), F.col("lno")
    )
    r = (
        f.withColumn("rlo", F.row_number().over(wlo))
        .withColumn("rhi", F.row_number().over(whi))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("part")))
    )
    lo = r.filter(F.col("rlo") == 1).select(
        "part", F.col("up").alias("lo_up"), F.col("n")
    )
    hi = r.filter(F.col("rhi") == 1).select(
        F.col("part").alias("hpart"), F.col("up").alias("hi_up")
    )
    j = lo.join(hi, F.col("part") == F.col("hpart")).select(
        "part",
        F.col("n").cast("long").alias("n_lines"),
        "lo_up",
        "hi_up",
        (F.col("hi_up") / F.col("lo_up")).alias("dispersion_ratio"),
    )
    return j.orderBy(
        F.col("dispersion_ratio").desc(), F.col("part").asc()
    ).limit(20)


# ---------------------------------------------------------------------------
# Duplicate-invoice candidates (r9): same customer + same exact total
# within 3 days — the accounts-payable dedup screen. The pair join is
# BLOCKED on (custkey, cents) so only true amount-collisions ever
# pair, then the day-window predicate filters; counts + the earliest
# pair per group. Exact integers end-to-end.
# ---------------------------------------------------------------------------
@query(
    "dup_invoice_candidates",
    oracle="""
    WITH o AS (
      SELECT o_orderkey AS okey, o_custkey AS cust,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS cents,
             CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS d
      FROM orders
    ),
    pairs AS (
      SELECT a.cust, a.cents, a.okey AS okey_a, b.okey AS okey_b,
             CAST(abs(a.d - b.d) AS BIGINT) AS day_gap
      FROM o a JOIN o b
        ON b.cust = a.cust AND b.cents = a.cents AND a.okey < b.okey
      WHERE abs(a.d - b.d) <= 3
    )
    SELECT cust, cents, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(okey_a) AS BIGINT) AS first_okey,
           CAST(min(day_gap) AS BIGINT) AS min_day_gap
    FROM pairs GROUP BY 1, 2
    """,
)
def q_dup_invoice_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounts-payable duplicate screen: same customer and exact total within 3 days, pair join blocked on (customer, cents) so only amount-collisions pair - exact integers end-to-end."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("cust"),
        (F.col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.expr("CAST(unix_seconds(o_orderdate) AS BIGINT) div 86400").alias(
            "d"
        ),
    )
    b = o.select(
        F.col("okey").alias("okey_b"),
        F.col("cust").alias("cust_b"),
        F.col("cents").alias("cents_b"),
        F.col("d").alias("d_b"),
    )
    pairs = o.join(
        b,
        (F.col("cust_b") == F.col("cust"))
        & (F.col("cents_b") == F.col("cents"))
        & (F.col("okey") < F.col("okey_b")),
    ).filter(F.abs(F.col("d") - F.col("d_b")) <= 3)
    return pairs.groupBy("cust", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("okey").cast("long").alias("first_okey"),
        F.min(F.abs(F.col("d") - F.col("d_b"))).cast("long").alias(
            "min_day_gap"
        ),
    )


# ---------------------------------------------------------------------------
# Supplier lead-time variability (r9): per supplier the ship-delay
# (line ship date − order date, integer days) mean and the EXACT
# integer variance numerator m·Σd²−(Σd)², with the high-variability
# flag by cross-multiplication against the fleet's pooled variance —
# the vendor-reliability screen feeding reorder-point safety stock.
# ---------------------------------------------------------------------------
@query(
    "supplier_leadtime_stats",
    oracle="""
    WITH f AS (
      SELECT l.l_suppkey AS supp,
             (epoch(l.l_shipdate) - epoch(o.o_orderdate)) // 86400 AS d
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    per AS (
      SELECT supp, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(d) AS BIGINT) AS sd,
             CAST(sum(d * d) AS BIGINT) AS sdd
      FROM f GROUP BY 1
    ),
    fleet AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(d) AS HUGEINT) AS s,
             CAST(sum(d * d) AS HUGEINT) AS ss
      FROM f
    )
    SELECT p.supp, p.m,
           CAST(p.sd AS DOUBLE) / CAST(p.m AS DOUBLE) AS mean_days,
           CAST(p.m * p.sdd - p.sd * p.sd AS BIGINT) AS var_num,
           CAST(CASE WHEN p.m > 1 AND
                CAST(p.m * p.sdd - p.sd * p.sd AS HUGEINT)
                  * fleet.n * fleet.n
                > (fleet.n * fleet.ss - fleet.s * fleet.s)
                  * CAST(p.m AS HUGEINT) * CAST(p.m AS HUGEINT)
                THEN 1 ELSE 0 END AS INT) AS high_variability
    FROM per p CROSS JOIN fleet
    """,
)
def q_supplier_leadtime_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier ship-delay mean and exact integer variance numerator, with high-variability flags cross-multiplied against the fleet's pooled variance - the vendor-reliability screen."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    f = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_suppkey").alias("supp"),
        F.expr(
            "(unix_seconds(l_shipdate) - unix_seconds(o_orderdate))"
            " div 86400"
        ).alias("d"),
    )
    per = f.groupBy("supp").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("d").cast("long").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd"),
    )
    fleet = f.groupBy().agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("d").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("d") * F.col("d")).cast("decimal(38,0)").alias("ss"),
    )
    j = per.crossJoin(F.broadcast(fleet))
    vn = F.col("m") * F.col("sdd") - F.col("sd") * F.col("sd")
    lhs = vn.cast("decimal(38,0)") * F.col("n") * F.col("n")
    rhs = (
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        * F.col("m").cast("decimal(38,0)")
        * F.col("m").cast("decimal(38,0)")
    )
    return j.select(
        "supp",
        "m",
        (F.col("sd").cast("double") / F.col("m").cast("double")).alias(
            "mean_days"
        ),
        vn.cast("long").alias("var_num"),
        F.when((F.col("m") > 1) & (lhs > rhs), 1)
        .otherwise(0)
        .cast("int")
        .alias("high_variability"),
    )


# ---------------------------------------------------------------------------
# Customer frequency histogram (r9): orders-per-customer distribution
# with the one-and-done share — the loyalty-shape readout (a heavy
# freq-1 bar means acquisition without retention). Two exact
# aggregates; shares are single divisions.
# ---------------------------------------------------------------------------
@query(
    "customer_frequency_histogram",
    oracle="""
    WITH c AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    h AS (
      SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
      FROM c GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n_customers) AS BIGINT) AS nc FROM h)
    SELECT h.n_orders, h.n_customers,
           CAST(h.n_customers AS DOUBLE) / CAST(t.nc AS DOUBLE)
             AS customer_share,
           CAST(CASE WHEN h.n_orders = 1 THEN 1 ELSE 0 END AS INT)
             AS one_and_done
    FROM h CROSS JOIN t
    """,
)
def q_customer_frequency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders-per-customer histogram with one-and-done flags and exact customer shares - the loyalty-shape readout."""
    o = read_table(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    h = c.groupBy("n_orders").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    t = h.groupBy().agg(F.sum("n_customers").cast("long").alias("nc"))
    return h.crossJoin(F.broadcast(t)).select(
        "n_orders",
        "n_customers",
        (
            F.col("n_customers").cast("double") / F.col("nc").cast("double")
        ).alias("customer_share"),
        F.when(F.col("n_orders") == 1, 1)
        .otherwise(0)
        .cast("int")
        .alias("one_and_done"),
    )


# ---------------------------------------------------------------------------
# Temporal sanity audit (r9): the timestamp-contract checks every
# ingest should run — ship-before-order lines (REAL in this synthetic
# set; rev_recognition_schedule clamps for them), negative or
# over-long order-to-ship spans, and events outside the table's own
# [min, max] day envelope (structurally zero, asserted not assumed).
# Exact integer day arithmetic, one scan per table.
# ---------------------------------------------------------------------------
@query(
    "temporal_sanity_audit",
    oracle="""
    WITH ls AS (
      SELECT (epoch(l.l_shipdate) - epoch(o.o_orderdate)) // 86400 AS gap
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    line_audit AS (
      SELECT 'lineitem_ship_gap' AS check_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN gap < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations,
             CAST(min(gap) AS BIGINT) AS min_val,
             CAST(max(gap) AS BIGINT) AS max_val
      FROM ls
    ),
    ev AS (
      SELECT CAST(epoch(ts) AS BIGINT) // 86400 AS d,
             CAST((SELECT min(epoch(ts)) FROM events) AS BIGINT) // 86400
               AS lo,
             CAST((SELECT max(epoch(ts)) FROM events) AS BIGINT) // 86400
               AS hi
      FROM events
    ),
    ev_audit AS (
      SELECT 'events_in_envelope' AS check_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN d < lo OR d > hi THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations,
             CAST(min(d) AS BIGINT) AS min_val,
             CAST(max(d) AS BIGINT) AS max_val
      FROM ev
    )
    SELECT * FROM line_audit UNION ALL SELECT * FROM ev_audit
    """,
)
def q_temporal_sanity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-contract audit: ship-before-order violation counts with span extremes, and the events-in-envelope structural check - exact integer day arithmetic."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    ls = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.expr(
            "(unix_seconds(l_shipdate) - unix_seconds(o_orderdate))"
            " div 86400"
        ).alias("gap")
    )
    line_audit = ls.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("gap") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
        F.min("gap").cast("long").alias("min_val"),
        F.max("gap").cast("long").alias("max_val"),
    ).select(
        F.lit("lineitem_ship_gap").alias("check_name"),
        "n_rows",
        "n_violations",
        "min_val",
        "max_val",
    )
    e = read_table(spark, sf_dir, "events").select(
        F.expr("CAST(unix_seconds(ts) AS BIGINT) div 86400").alias("d")
    )
    env = e.groupBy().agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    ev = e.crossJoin(F.broadcast(env))
    ev_audit = ev.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.when(
                (F.col("d") < F.col("lo")) | (F.col("d") > F.col("hi")), 1
            ).otherwise(0)
        ).cast("long").alias("n_violations"),
        F.min("d").cast("long").alias("min_val"),
        F.max("d").cast("long").alias("max_val"),
    ).select(
        F.lit("events_in_envelope").alias("check_name"),
        "n_rows",
        "n_violations",
        "min_val",
        "max_val",
    )
    return line_audit.unionByName(ev_audit)


# ---------------------------------------------------------------------------
# Unit-value price index (r9): yearly price level vs the 1995 base as
# (S_t·Q_0)/(S_0·Q_t) — the unit-value index whose ratio form needs
# only integer revenue and quantity sums (no per-part price rationals
# to common-denominator), one division per year. The macro companion
# of arc_elasticity and pvm_bridge on the same moments.
# ---------------------------------------------------------------------------
@query(
    "price_index_unit_value",
    oracle="""
    WITH f AS (
      SELECT CAST(year(l_shipdate) AS INT) AS yr,
             CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                  AS HUGEINT) AS cents,
             CAST(l_quantity AS HUGEINT) AS qty
      FROM lineitem
    ),
    g AS (
      SELECT yr, CAST(sum(cents) AS HUGEINT) AS s,
             CAST(sum(qty) AS HUGEINT) AS q
      FROM f GROUP BY 1
    ),
    base AS (SELECT s AS s0, q AS q0 FROM g WHERE yr = 1995)
    SELECT g.yr, CAST(g.s AS BIGINT) AS cents, CAST(g.q AS BIGINT) AS qty,
           CAST(CAST(g.s * base.q0 AS VARCHAR) AS DOUBLE)
             / CAST(CAST(base.s0 * g.q AS VARCHAR) AS DOUBLE)
             AS unit_value_index
    FROM g CROSS JOIN base
    """,
)
def q_price_index_unit_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly unit-value price index vs the 1995 base: (S_t*Q_0)/(S_0*Q_t) from integer sums, one division per year."""
    li = read_table(spark, sf_dir, "lineitem")
    g = li.groupBy(F.year("l_shipdate").cast("int").alias("yr")).agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(14,2)") * 100).cast(
                "decimal(38,0)"
            )
        ).alias("s"),
        F.sum(F.col("l_quantity").cast("decimal(38,0)")).alias("q"),
    )
    base = g.filter(F.col("yr") == 1995).select(
        F.col("s").alias("s0"), F.col("q").alias("q0")
    )

    def dd_(c):
        return c.cast("string").cast("double")

    return g.crossJoin(F.broadcast(base)).select(
        "yr",
        F.col("s").cast("long").alias("cents"),
        F.col("q").cast("long").alias("qty"),
        (
            dd_(F.col("s") * F.col("q0")) / dd_(F.col("s0") * F.col("q"))
        ).alias("unit_value_index"),
    )


# ---------------------------------------------------------------------------
# Order reconciliation (r9): the close-the-books check — each order's
# header total vs the sum of its line charges (price·(1−disc)·(1+tax))
# in exact 1e-10 currency units, with the mismatch population and the
# total signed and absolute drift. On this synthetic set the columns
# are independent, so the drift is large — which is exactly what the
# report is for.
# ---------------------------------------------------------------------------
@query(
    "order_reconciliation",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey AS okey,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                  AS HUGEINT)
                  * (10000 - CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000
                     AS HUGEINT))
                  * (10000 + CAST(CAST(l_tax AS DECIMAL(8,4)) * 10000
                     AS HUGEINT))) AS HUGEINT) AS charge_u
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT o.o_orderkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS HUGEINT)
               * 100000000 AS header_u,
             l.charge_u
      FROM orders o JOIN lines l ON l.okey = o.o_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN header_u <> charge_u THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatched,
           CAST(CAST(sum(header_u - charge_u) AS VARCHAR) AS DOUBLE)
             / 1e12 AS signed_drift,
           CAST(CAST(sum(abs(header_u - charge_u)) AS VARCHAR) AS DOUBLE)
             / 1e12 AS abs_drift
    FROM j
    """,
)
def q_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close-the-books reconciliation: header totals vs exact line-charge sums in scaled integer units, mismatch population and signed/absolute drift."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    lines = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(14,2)") * 100)
            .cast("decimal(38,0)")
            * (
                10000
                - (F.col("l_discount").cast("decimal(8,4)") * 10000).cast(
                    "decimal(38,0)"
                )
            )
            * (
                10000
                + (F.col("l_tax").cast("decimal(8,4)") * 10000).cast(
                    "decimal(38,0)"
                )
            )
        ).alias("charge_u")
    )
    j = o.join(lines, o["o_orderkey"] == lines["okey"]).select(
        (
            (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast(
                "decimal(38,0)"
            )
            * 100000000
        ).alias("header_u"),
        "charge_u",
    )

    def dd_(c):
        return c.cast("string").cast("double")

    return j.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.when(F.col("header_u") != F.col("charge_u"), 1).otherwise(0)
        ).cast("long").alias("n_mismatched"),
        (
            dd_(F.sum(F.col("header_u") - F.col("charge_u"))) / F.lit(1e12)
        ).alias("signed_drift"),
        (
            dd_(F.sum(F.abs(F.col("header_u") - F.col("charge_u"))))
            / F.lit(1e12)
        ).alias("abs_drift"),
    )


# ---------------------------------------------------------------------------
# Quarterly growth (r9): revenue by fiscal quarter with QoQ and YoY
# rates — exact integer cents on the bounded quarter table, growth as
# one division per comparison (lag windows over ≤28 rows). The
# board-deck readout on the house exactness discipline.
# ---------------------------------------------------------------------------
@query(
    "quarterly_growth",
    oracle="""
    WITH q AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(quarter(o_orderdate) AS INT) AS qtr,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                  AS HUGEINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    w AS (
      SELECT yr, qtr, cents,
             lag(cents, 1) OVER (ORDER BY yr, qtr) AS prev_q,
             lag(cents, 4) OVER (ORDER BY yr, qtr) AS prev_y
      FROM q
    )
    SELECT yr, qtr, cents,
           CASE WHEN prev_q > 0 THEN
             CAST(cents - prev_q AS DOUBLE) / CAST(prev_q AS DOUBLE) END
             AS qoq_growth,
           CASE WHEN prev_y > 0 THEN
             CAST(cents - prev_y AS DOUBLE) / CAST(prev_y AS DOUBLE) END
             AS yoy_growth
    FROM w
    """,
)
def q_quarterly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarterly revenue with QoQ and YoY growth rates: exact integer cents on the bounded quarter table, one division per comparison."""
    o = read_table(spark, sf_dir, "orders")
    q = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast(
                "decimal(38,0)"
            )
        ).cast("long").alias("cents")
    )
    w = W.orderBy("yr", "qtr")
    t = q.withColumn("prev_q", F.lag("cents", 1).over(w)).withColumn(
        "prev_y", F.lag("cents", 4).over(w)
    )
    return t.select(
        "yr",
        "qtr",
        "cents",
        F.when(
            F.col("prev_q") > 0,
            (F.col("cents") - F.col("prev_q")).cast("double")
            / F.col("prev_q").cast("double"),
        ).alias("qoq_growth"),
        F.when(
            F.col("prev_y") > 0,
            (F.col("cents") - F.col("prev_y")).cast("double")
            / F.col("prev_y").cast("double"),
        ).alias("yoy_growth"),
    )


# ---------------------------------------------------------------------------
# Segment migration matrix (r9): customers move between frequency
# tiers (1 / 2-3 / 4+ orders) from the 1995-96 half to the 1997+
# half — pure integer tiers (no ranking), one aggregate per half, the
# transition matrix with per-origin shares. '(gone)' and '(new)'
# rows account for churn and acquisition exactly.
# ---------------------------------------------------------------------------
@query(
    "segment_migration_matrix",
    oracle="""
    WITH h1 AS (
      SELECT o_custkey AS c, CAST(count(*) AS BIGINT) AS n
      FROM orders WHERE year(o_orderdate) <= 1996 GROUP BY 1
    ),
    h2 AS (
      SELECT o_custkey AS c, CAST(count(*) AS BIGINT) AS n
      FROM orders WHERE year(o_orderdate) >= 1997 GROUP BY 1
    ),
    t AS (
      SELECT coalesce(h1.c, h2.c) AS c,
             CASE WHEN h1.n IS NULL THEN '(new)'
                  WHEN h1.n = 1 THEN '1'
                  WHEN h1.n <= 3 THEN '2-3' ELSE '4+' END AS tier_from,
             CASE WHEN h2.n IS NULL THEN '(gone)'
                  WHEN h2.n = 1 THEN '1'
                  WHEN h2.n <= 3 THEN '2-3' ELSE '4+' END AS tier_to
      FROM h1 FULL OUTER JOIN h2 ON h2.c = h1.c
    ),
    m AS (
      SELECT tier_from, tier_to, CAST(count(*) AS BIGINT) AS n_customers
      FROM t GROUP BY 1, 2
    ),
    o AS (
      SELECT tier_from, CAST(sum(n_customers) AS BIGINT) AS n_from
      FROM m GROUP BY 1
    )
    SELECT m.tier_from, m.tier_to, m.n_customers, o.n_from,
           CAST(m.n_customers AS DOUBLE) / CAST(o.n_from AS DOUBLE)
             AS share_of_origin
    FROM m JOIN o ON o.tier_from = m.tier_from
    """,
)
def q_segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-tier migration matrix between era halves with exact churn/acquisition rows and per-origin shares - pure integer tiers, one aggregate per half."""
    o = read_table(spark, sf_dir, "orders")
    h1 = (
        o.filter(F.year("o_orderdate") <= 1996)
        .groupBy(F.col("o_custkey").alias("c1"))
        .agg(F.count(F.lit(1)).cast("long").alias("n1"))
    )
    h2 = (
        o.filter(F.year("o_orderdate") >= 1997)
        .groupBy(F.col("o_custkey").alias("c2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n2"))
    )
    t = h1.join(h2, F.col("c1") == F.col("c2"), "full_outer").select(
        F.when(F.col("n1").isNull(), "(new)")
        .when(F.col("n1") == 1, "1")
        .when(F.col("n1") <= 3, "2-3")
        .otherwise("4+")
        .alias("tier_from"),
        F.when(F.col("n2").isNull(), "(gone)")
        .when(F.col("n2") == 1, "1")
        .when(F.col("n2") <= 3, "2-3")
        .otherwise("4+")
        .alias("tier_to"),
    )
    m = t.groupBy("tier_from", "tier_to").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    o2 = m.groupBy(F.col("tier_from").alias("tf2")).agg(
        F.sum("n_customers").cast("long").alias("n_from")
    )
    return m.join(o2, F.col("tier_from") == F.col("tf2")).select(
        "tier_from",
        "tier_to",
        "n_customers",
        "n_from",
        (
            F.col("n_customers").cast("double")
            / F.col("n_from").cast("double")
        ).alias("share_of_origin"),
    )


# ---------------------------------------------------------------------------
# Domestic-vs-international revenue (r9): per customer nation, the
# revenue split by whether the supplying nation matches — the
# one-glance trade-balance readout behind TPC-H Q7's bilateral
# detail. Two broadcast dim joins, exact cents, one division.
# ---------------------------------------------------------------------------
@query(
    "trade_domestic_share",
    oracle="""
    WITH f AS (
      SELECT c.c_nationkey AS cnat, s.s_nationkey AS snat,
             CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100
                  AS HUGEINT) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
    )
    SELECT CAST(cnat AS INT) AS customer_nation,
           CAST(sum(CASE WHEN cnat = snat THEN cents ELSE 0 END)
                AS BIGINT) AS domestic_cents,
           CAST(sum(CASE WHEN cnat <> snat THEN cents ELSE 0 END)
                AS BIGINT) AS international_cents,
           CAST(CAST(sum(CASE WHEN cnat = snat THEN cents ELSE 0 END)
                AS VARCHAR) AS DOUBLE)
             / CAST(CAST(sum(cents) AS VARCHAR) AS DOUBLE)
             AS domestic_share
    FROM f GROUP BY 1
    """,
)
def q_trade_domestic_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domestic vs international revenue per customer nation: two broadcast dim joins, exact cents, one share division."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    f = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            o["o_custkey"] == c["c_custkey"],
        )
        .join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            li["l_suppkey"] == s["s_suppkey"],
        )
        .select(
            F.col("c_nationkey").alias("cnat"),
            F.col("s_nationkey").alias("snat"),
            (F.col("l_extendedprice").cast("decimal(14,2)") * 100)
            .cast("decimal(38,0)")
            .alias("cents"),
        )
    )
    dom = F.sum(
        F.when(F.col("cnat") == F.col("snat"), F.col("cents")).otherwise(0)
    )
    intl = F.sum(
        F.when(F.col("cnat") != F.col("snat"), F.col("cents")).otherwise(0)
    )

    def dd_(x):
        return x.cast("string").cast("double")

    return f.groupBy(F.col("cnat").cast("int").alias("customer_nation")).agg(
        dom.cast("long").alias("domestic_cents"),
        intl.cast("long").alias("international_cents"),
        (dd_(dom) / dd_(F.sum("cents"))).alias("domestic_share"),
    )


# ---------------------------------------------------------------------------
# Small-file compaction planner (r10): the OPTIMIZE/bin-packing step
# every lakehouse table needs — concatenate each partition's files in
# (size desc, id) order and cut bins at a target byte budget, so a
# bin's id is just floor(start_offset / target): pure window
# arithmetic, no sequential loop, no driver state. Per (lang, bin):
# file count, total bytes, fill ratio. documents stands in as the
# file listing (doc_id = file, n_chars = bytes); at 100 TB the same
# plan runs over the real manifest with the window partitioned by
# table partition — one shuffle, bounded state.
# ---------------------------------------------------------------------------
_COMPACT_TARGET = 4096


@query(
    "compaction_bins",
    oracle=f"""
    WITH f AS (
      SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS bytes,
             sum(n_chars) OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents
    ),
    b AS (
      SELECT lang, doc_id, bytes,
             CAST((cum - bytes) // {_COMPACT_TARGET} AS BIGINT) AS bin_id
      FROM f
    )
    SELECT lang, bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           CAST(min(doc_id) AS BIGINT) AS first_file,
           CAST(sum(bytes) AS DOUBLE) / {_COMPACT_TARGET} AS fill_ratio
    FROM b GROUP BY 1, 2
    """,
)
def q_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction plan: pack each lang partition's files into target-size bins by start-offset arithmetic over one cumulative-sum window - the OPTIMIZE small-file planner with no sequential state."""
    d = read_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.col("n_chars").cast("long").alias("bytes")
    )
    w = (
        W.partitionBy("lang")
        .orderBy(F.desc("bytes"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # exact long `div`, never double division — cumulative byte sums
    # past 2^53 per partition would round and shift bin boundaries
    b = d.select(
        "lang",
        "doc_id",
        "bytes",
        (F.sum("bytes").over(w) - F.col("bytes")).alias("_start"),
    ).select(
        "lang",
        "doc_id",
        "bytes",
        F.expr(f"_start div {_COMPACT_TARGET}").cast("long").alias("bin_id"),
    )
    return b.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        F.min("doc_id").cast("long").alias("first_file"),
        (F.sum("bytes").cast("double") / F.lit(_COMPACT_TARGET)).alias(
            "fill_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Newsvendor stock levels (r12): the classic single-period inventory
# answer — per brand, the optimal stock is the critical-fractile
# quantile of weekly demand, q* = inf{q : F̂(q) ≥ cu/(cu+co)} with
# cu = 3, co = 1 (underage costs 3× overage → the 3/4 fractile).
# On the discrete empirical distribution that is EXACTLY the
# ⌈3n/4⌉-th order statistic of the weekly demand samples — integer
# rank arithmetic, no quantile interpolation. Weeks are
# floor(epoch/604800) (no calendar semantics to disagree on), demand
# sums are exact int64, the per-brand window is |weeks|-bounded.
# ---------------------------------------------------------------------------
@query(
    "newsvendor_stock_levels",
    oracle="""
    WITH d AS (
      SELECT p.p_brand AS brand,
             CAST(epoch(l_shipdate) AS BIGINT) // 604800 AS wk,
             CAST(sum(l_quantity) AS BIGINT) AS demand
      FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT brand, demand,
             row_number() OVER (PARTITION BY brand
                                ORDER BY demand, wk) AS rn,
             count(*) OVER (PARTITION BY brand) AS n
      FROM d
    )
    SELECT brand, CAST(n AS BIGINT) AS n_weeks,
           CAST((SELECT sum(demand) FROM d d2 WHERE d2.brand = r.brand)
                AS BIGINT) AS sum_demand,
           CAST(demand AS BIGINT) AS q_star_qty
    FROM r WHERE rn = (3 * n + 3) // 4
    """,
)
def q_newsvendor_stock_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor critical-fractile stock per brand (underage 3x overage -> the ceil(3n/4)-th order statistic of weekly demand) - exact integer ranks on the brand-week demand table, no interpolation."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_shipdate"
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    d = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.expr("unix_timestamp(l_shipdate) div 604800").alias("wk"),
        )
        .agg(F.sum("l_quantity").cast("long").alias("demand"))
    )
    wb = W.partitionBy("brand").orderBy("demand", "wk")
    wc = W.partitionBy("brand")
    r = d.select(
        "brand",
        "demand",
        F.row_number().over(wb).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
        F.sum("demand").over(wc).cast("long").alias("sum_demand"),
    )
    return r.filter(F.col("rn") == F.expr("(3 * n + 3) div 4")).select(
        "brand",
        F.col("n").cast("long").alias("n_weeks"),
        "sum_demand",
        F.col("demand").cast("long").alias("q_star_qty"),
    )
