"""Graph / retrieval / weighted-sampling queries.

Beyond-reference operators for large-corpus pipelines: link-authority
(PageRank) as a quality signal, positional-index phrase search, and
weighted sampling without replacement. All three are oracle-checked —
PageRank through an integer-scaled recurrence both engines replay
bit-for-bit (operators/graph.py), sampling through the md5
max-of-uniforms scheme, phrase search through a positional join twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_etlscripts_spark.functions.scalar import ordered_pairs
from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.operators.graph import (
    DAMPING_DEN,
    DAMPING_NUM,
    SCALE,
    pagerank,
)
from datalake_etlscripts_spark.operators.sampling import weighted_sample_topk
from datalake_etlscripts_spark.operators.text import phrase_matches
from datalake_etlscripts_spark.plans.registry import (
    MAX_BASKET,
    ddb_hex32,
    ddb_hex60,
    query,
)

_PR_ITER = 4
# one definition: the oracle replays whatever the operator defaults to
_PR_SCALE = SCALE
_PR_NUM = DAMPING_NUM
_PR_DEN = DAMPING_DEN


_PR_BASE_CTE = """
    WITH e0 AS (SELECT DISTINCT l_suppkey * 2 AS src,
                                l_partkey * 2 + 1 AS dst
                FROM lineitem),
    edges AS (SELECT src, dst FROM e0
              UNION SELECT dst AS src, src AS dst FROM e0)"""

_PR_FINAL = "\n    SELECT node, CAST(pr AS BIGINT) AS pr FROM r{n}"


def _pagerank_oracle(
    iterations: int = _PR_ITER,
    base_cte: str = _PR_BASE_CTE,
    final_select: str = _PR_FINAL,
) -> str:
    """Unrolled-CTE twin of operators/graph.pagerank: one (cN, dN, rN)
    stage per iteration. DuckDB's recursive CTEs forbid aggregates in
    the recursive term, so the fixed iteration count is unrolled
    textually — every step is the same integer arithmetic Spark runs
    (``//`` ≡ ``div`` for non-negative longs). ``base_cte`` must open
    the WITH list and end defining ``edges(src, dst)``;
    ``final_select`` consumes ``r{n}``."""
    scale, num, den = _PR_SCALE, _PR_NUM, _PR_DEN
    n_sql = "(SELECT count(*) FROM nodes)"
    init_sql = f"(CAST({scale} AS BIGINT) // {n_sql})"
    parts = [
        base_cte
        + f""",
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst AS node FROM edges),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, {init_sql} AS pr FROM nodes)"""
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(
            f""",
    c{i} AS (SELECT e.dst AS node, SUM(r.pr // d.deg) AS s
             FROM edges e
             JOIN deg d ON e.src = d.src
             JOIN r{p} r ON r.node = e.src
             GROUP BY e.dst),
    d{i} AS (SELECT COALESCE(SUM(r.pr), 0) AS dang FROM r{p} r
             WHERE r.node NOT IN (SELECT src FROM deg)),
    r{i} AS (SELECT n.node,
             (({den} - {num}) * {init_sql}) // {den}
             + ({num} * (COALESCE(c.s, 0)
                         + (SELECT dang FROM d{i}) // {n_sql})) // {den} AS pr
             FROM nodes n LEFT JOIN c{i} c ON c.node = n.node)"""
        )
    parts.append(final_select.format(n=iterations))
    return "".join(parts)


@query("graph_pagerank", oracle=_pagerank_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-scaled PageRank over the supplier-part co-purchase graph - per iteration one edge join + one dst-keyed aggregate, lineage checkpointed."""
    li = read_table(spark, sf_dir, "lineitem")
    # integer node keys (suppliers even, parts odd): hashing/shuffling
    # 8-byte longs measured ~2-3x faster than 'S123'/'P456' strings
    e0 = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).dropDuplicates()
    # the union of a distinct bipartite set with its reversal is
    # distinct by construction -> skip pagerank's dedup exchange
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(
        edges,
        iterations=_PR_ITER,
        damping=(_PR_NUM, _PR_DEN),
        scale=_PR_SCALE,
        dedup_shuffle="none",
        # symmetrized graph: every node has an out-edge, so the
        # dangling term is structurally zero (oracle's d_i CTEs
        # evaluate to 0 on this input — same recurrence)
        dangling="none",
    )
    return ranks.select("node", F.col("rank").alias("pr"))


_WSAMPLE_ORACLE = f"""
    WITH w AS (SELECT doc_id AS key,
                      CAST(GREATEST(1, n_chars // 32) AS INTEGER) AS weight
               FROM documents),
    wj AS (SELECT key, weight,
                  unnest(generate_series(1, weight)) AS j
           FROM w),
    u AS (SELECT key, weight,
                 CAST(MAX({ddb_hex32("md5(CAST(key AS VARCHAR) || ':' || CAST(j AS VARCHAR))")}) AS BIGINT)
                   AS sample_key
          FROM wj
          GROUP BY key, weight)
    SELECT key, weight, sample_key FROM u
    ORDER BY sample_key DESC, key ASC LIMIT 50
"""


@query("weighted_sample", oracle=_WSAMPLE_ORACLE)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis, integer max-of-uniforms form) - explode by bucketed weight, hash, top-k TakeOrdered."""
    docs = read_table(spark, sf_dir, "documents")
    return weighted_sample_topk(
        docs,
        key_col="doc_id",
        weight_col=F.greatest(F.lit(1), (F.col("n_chars") / 32).cast("int")),
        k=50,
    )


_PHRASE_ORACLE = """
    WITH d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
      FROM documents),
    o AS (SELECT doc_id, tl, unnest(generate_series(1, len(tl))) AS ord FROM d),
    toks AS (SELECT doc_id, tl[ord] AS tok, CAST(ord AS INTEGER) - 1 AS pos FROM o)
    SELECT a.doc_id, count(*) AS n_matches, MIN(a.pos) AS first_pos
    FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.tok = 'big' AND b.tok = 'data'
    GROUP BY a.doc_id
"""


@query("phrase_search", oracle=_PHRASE_ORACLE)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase search ('big data') - postings pruned to the phrase terms, then aligned-position equi-joins; no corpus self-join."""
    docs = read_table(spark, sf_dir, "documents")
    return phrase_matches(docs, ["big", "data"]).select(
        F.col("_did").alias("doc_id"), "n_matches", "first_pos"
    )


# A same-key self-join on l_orderkey emits B² edges for a basket of B
# distinct parts — quadratic output on ONE join key, the classic skew
# killer at 100 TB. Baskets above this cap are dropped entirely (the
# itemcf_hitrate policy, plans/featureops.py): TPC-H orders top out at
# 7 lines so results are unchanged at test scale, but a mega-basket in
# production data can no longer take down the whole family of co-order
# graph queries. Mirrored in every consuming oracle via the li0→li
# window-count CTE prefix.
_MAX_BASKET = MAX_BASKET  # single definition lives in registry.MAX_BASKET


def _capped_baskets(spark: SparkSession, sf_dir: str, max_basket: int | None) -> DataFrame:
    """Distinct (l_orderkey, l_partkey) with baskets larger than
    ``max_basket`` removed. The window count shuffles on l_orderkey —
    the same key the co-order self-join needs next, so the exchange is
    reused, not added."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
    )
    if max_basket is None:
        return li
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey")
    return (
        li.withColumn("_bs", F.count(F.lit(1)).over(w))
        .filter(F.col("_bs") <= max_basket)
        .drop("_bs")
    )


def _co_order_edges(
    spark: SparkSession, sf_dir: str, max_basket: int | None = _MAX_BASKET
) -> DataFrame:
    """Undirected part co-order graph (u < v, distinct): parts that
    appear in the same order share an edge. Shared by the triangle /
    label-propagation / link-prediction / k-truss / eccentricity /
    rich-club / density / modularity / conductance queries — and
    mirrored by the identical li0/li/e0 CTE prefix in their oracles.
    Baskets above ``max_basket`` are dropped before the self-join
    (see _MAX_BASKET); pass ``max_basket=None`` for the exact,
    uncapped graph on audited inputs."""
    # r07 optimization (guide §2.4): the basket SELF-JOIN form
    # (distinct → window count → join on l_orderkey → u<v filter)
    # spent ~4 exchanges + a sort-merge join to emit the same pairs a
    # sorted collect_set + map-side ordered_pairs explode emits after
    # ONE l_orderkey exchange. Pair volume is identical (cap-bounded,
    # ≤ C(cap, 2) per basket); the u < v order falls out of the
    # sorted-distinct array. Oracle unchanged — same edge set.
    arr = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("_items"))
    )
    if max_basket is not None:
        arr = arr.filter(F.size("_items") <= max_basket)
    return (
        arr.select(F.explode(ordered_pairs(F.col("_items"))).alias("_p"))
        .select(F.col("_p.x").alias("u"), F.col("_p.y").alias("v"))
        .dropDuplicates()
    )


_TRIANGLES_ORACLE = """
    WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM (
             SELECT l_orderkey, l_partkey,
                    count(*) OVER (PARTITION BY l_orderkey) AS bs
             FROM li0) WHERE bs <= __MAX_BASKET__),
    e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (SELECT node, count(*) AS degree FROM (
              SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
            GROUP BY node),
    tri AS (SELECT e1.u AS x, e1.v AS a, e2.v AS b
            FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
    tn AS (SELECT node, count(*) AS n_triangles FROM (
             SELECT x AS node FROM tri
             UNION ALL SELECT a FROM tri
             UNION ALL SELECT b FROM tri)
           GROUP BY node)
    SELECT d.node, d.degree,
           COALESCE(tn.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree > 1 THEN
             CAST(2 * COALESCE(tn.n_triangles, 0) AS DOUBLE)
             / CAST(d.degree * (d.degree - 1) AS DOUBLE)
           END AS clustering
    FROM deg d LEFT JOIN tn USING (node)
"""


@query("graph_triangles", oracle=_TRIANGLES_ORACLE)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-node triangle counts + clustering coefficient over the part co-order graph - degree-ordered orientation bounds wedges at O(m^1.5), never a naive deg^2 join."""
    from datalake_etlscripts_spark.operators.graph import triangle_counts

    return triangle_counts(_co_order_edges(spark, sf_dir))


def _lpa_oracle(iterations: int = 3) -> str:
    """Unrolled twin of operators/graph.label_propagation over the
    symmetrized part co-order graph: per round one neighbor-label
    count + (count desc, label asc) argmax."""
    parts = [
        """
    WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM (
             SELECT l_orderkey, l_partkey,
                    count(*) OVER (PARTITION BY l_orderkey) AS bs
             FROM li0) WHERE bs <= __MAX_BASKET__),
    e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM li a JOIN li b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    edges AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0
              UNION SELECT v, u FROM e0),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)"""
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(
            f""",
    c{i} AS (SELECT e.src AS node, l.label AS nl, count(*) AS c
             FROM edges e JOIN l{p} l ON l.node = e.dst
             GROUP BY 1, 2),
    l{i} AS (SELECT node, nl AS label FROM (
               SELECT *, row_number() OVER (PARTITION BY node
                         ORDER BY c DESC, nl ASC) AS rn FROM c{i})
             WHERE rn = 1)"""
        )
    parts.append(f"\n    SELECT node, label FROM l{iterations}")
    return "".join(parts)


@query("graph_label_propagation", oracle=_lpa_oracle())
def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (3 rounds, min tie-break) over the part co-order graph - one neighbor join + one argmax per round."""
    from datalake_etlscripts_spark.operators.graph import label_propagation

    e0 = _co_order_edges(spark, sf_dir)
    edges = e0.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        e0.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    return label_propagation(edges, iterations=3)


_LINKPRED_ORACLE = """
    WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM (
             SELECT l_orderkey, l_partkey,
                    count(*) OVER (PARTITION BY l_orderkey) AS bs
             FROM li0) WHERE bs <= __MAX_BASKET__),
    e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS MATERIALIZED (SELECT u AS x, v AS n FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT x, count(*) AS deg FROM adj GROUP BY x),
    cand AS (
      SELECT a.n AS id_a, b.n AS id_b, count(*) AS common_neighbors
      FROM adj a JOIN adj b ON a.x = b.x AND a.n < b.n
      GROUP BY 1, 2
    ),
    miss AS (
      SELECT c.* FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.id_a AND e.v = c.id_b)
    )
    SELECT id_a, id_b, common_neighbors,
           CAST(common_neighbors AS DOUBLE)
             / CAST(da.deg + db.deg - common_neighbors AS DOUBLE) AS jaccard
    FROM miss
    JOIN deg da ON da.x = id_a
    JOIN deg db ON db.x = id_b
    ORDER BY common_neighbors DESC, id_a, id_b LIMIT 50
"""


@query("graph_link_prediction", oracle=_LINKPRED_ORACLE)
def q_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the part co-order graph - wedge join for candidates, anti join removes existing edges, deterministic top-50."""
    from datalake_etlscripts_spark.operators.graph import link_prediction_topk

    return link_prediction_topk(_co_order_edges(spark, sf_dir), k=50)


# ---------------------------------------------------------------------------
# k-core decomposition by synchronous peeling over the weight-≥2
# co-order graph (the weight threshold sparsifies the dense random
# co-order graph so peeling actually has structure to remove). The
# oracle unrolls the rounds as chained CTEs — 4 rounds covers
# convergence at both test SFs (validated by the fixpoint unit test),
# so the registered result IS the true 2-core.
# ---------------------------------------------------------------------------
def _kcore_oracle(k: int = 2, rounds: int = 4) -> str:
    sql = """
    WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM (
             SELECT l_orderkey, l_partkey,
                    count(*) OVER (PARTITION BY l_orderkey) AS bs
             FROM li0) WHERE bs <= __MAX_BASKET__),
    p AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
    e0 AS MATERIALIZED (SELECT u AS src, v AS dst FROM p UNION ALL SELECT v, u FROM p)"""
    for r in range(1, rounds + 1):
        sql += f""",
    k{r} AS (SELECT src FROM e{r-1} GROUP BY src HAVING count(*) >= {k}),
    e{r} AS (SELECT e.src, e.dst FROM e{r-1} e
             JOIN k{r} a ON e.src = a.src JOIN k{r} b ON e.dst = b.src)"""
    sql += f"""
    SELECT src AS node, count(*) AS degree FROM e{rounds}
    GROUP BY src HAVING count(*) >= {k}"""
    return sql


def _co_order_edges_w2(
    spark: SparkSession, sf_dir: str, max_basket: int | None = _MAX_BASKET
) -> DataFrame:
    """Symmetrized co-order edges kept only when the pair shares >= 2
    orders — the sparsified variant with non-trivial k-core structure.
    Same mega-basket cap as _co_order_edges (mirrored in the oracle)."""
    # r07 optimization (guide §2.4): same array-pair rewrite as
    # _co_order_edges (one l_orderkey exchange replaces the basket
    # self-join), plus a lazy settle of the weighted pair table — the
    # symmetrizing union reads it twice and would otherwise run the
    # pair aggregation once per branch.
    arr = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("_items"))
    )
    if max_basket is not None:
        arr = arr.filter(F.size("_items") <= max_basket)
    p = (
        arr.select(F.explode(ordered_pairs(F.col("_items"))).alias("_p"))
        .groupBy(F.col("_p.x").alias("u"), F.col("_p.y").alias("v"))
        .agg(F.count(F.lit(1)).alias("_w"))
        .filter(F.col("_w") >= 2)
        .localCheckpoint(eager=False)
    )
    return p.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        p.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )


# ---------------------------------------------------------------------------
# Coreness classes (r10): the k-shell index — for each node the
# largest k ∈ {2,3,4} whose 4-round k-core still contains it (1 =
# in the graph but outside the 2-core). kcore answers "is v in THE
# k-core"; coreness ranks every node's structural depth in one table —
# the standard spreading-power / influence signal. Three peels share
# one sparsified edge build; the oracle chains the same unrolled
# rounds per k from one MATERIALIZED base.
# ---------------------------------------------------------------------------
def _coreness_oracle(ks=(2, 3, 4), rounds: int = 4) -> str:
    sql = """
    WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM (
             SELECT l_orderkey, l_partkey,
                    count(*) OVER (PARTITION BY l_orderkey) AS bs
             FROM li0) WHERE bs <= __MAX_BASKET__),
    p AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
    base AS MATERIALIZED (SELECT u AS src, v AS dst FROM p
                          UNION ALL SELECT v, u FROM p),
    nodes AS (SELECT DISTINCT src AS node FROM base)"""
    for k in ks:
        sql += f",\n    c{k}_e0 AS (SELECT src, dst FROM base)"
        for r in range(1, rounds + 1):
            sql += f""",
    c{k}_k{r} AS (SELECT src FROM c{k}_e{r-1}
                  GROUP BY src HAVING count(*) >= {k}),
    c{k}_e{r} AS MATERIALIZED (
      SELECT e.src, e.dst FROM c{k}_e{r-1} e
      JOIN c{k}_k{r} a ON e.src = a.src
      JOIN c{k}_k{r} b ON e.dst = b.src)"""
        sql += f""",
    core{k} AS (SELECT src AS node FROM c{k}_e{rounds}
                GROUP BY src HAVING count(*) >= {k})"""
    cases = " ".join(
        f"WHEN n.node IN (SELECT node FROM core{k}) THEN {k}"
        for k in sorted(ks, reverse=True)
    )
    return (
        sql
        + f"""
    SELECT n.node, CAST(CASE {cases} ELSE 1 END AS BIGINT) AS coreness
    FROM nodes n"""
    )


@query("graph_coreness_classes", oracle=_coreness_oracle())
def q_graph_coreness_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coreness (k-shell index) over the sparsified co-order graph: per node the deepest 4-round k-core (k in {2,3,4}) still containing it - three peels over one shared edge build, the structural-depth ranking kcore alone cannot give."""
    from datalake_etlscripts_spark.operators.graph import kcore

    e = _co_order_edges_w2(spark, sf_dir).localCheckpoint(eager=False)
    nodes = e.select(F.col("src").alias("node")).distinct()
    out = nodes
    for k in (2, 3, 4):
        mem = kcore(e, k=k, rounds=4).select(
            "node", F.lit(True).alias(f"_in{k}")
        )
        out = out.join(F.broadcast(mem), "node", "left")
    return out.select(
        "node",
        F.when(F.col("_in4"), 4)
        .when(F.col("_in3"), 3)
        .when(F.col("_in2"), 2)
        .otherwise(1)
        .cast("long")
        .alias("coreness"),
    )


@query("graph_kcore", oracle=_kcore_oracle())
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=2) of the weight->=2 part co-order graph - synchronous peeling, one degree aggregate + two semi joins per round, converged within the unrolled oracle rounds."""
    from datalake_etlscripts_spark.operators.graph import kcore

    return kcore(_co_order_edges_w2(spark, sf_dir), k=2, rounds=4)


# ---------------------------------------------------------------------------
# Personalized PageRank (r4): restart mass only at the seed suppliers
# — the "more like these" seed-expansion / crawl-frontier signal.
# Same unrolled integer recurrence as graph_pagerank, with teleport
# gated on the seed flag; the symmetrized co-purchase graph has no
# sinks, so no dangling CTEs.
# ---------------------------------------------------------------------------
_PPR_ITER = 3


def _ppr_oracle(iterations: int = _PPR_ITER) -> str:
    scale, num, den = _PR_SCALE, _PR_NUM, _PR_DEN
    ns = "(SELECT count(*) FROM seedset)"
    init = f"(CAST({scale} AS BIGINT) // {ns})"
    parts = [
        f"""
    WITH e0 AS (SELECT DISTINCT l_suppkey * 2 AS src,
                                l_partkey * 2 + 1 AS dst
                FROM lineitem),
    edges AS (SELECT src, dst FROM e0
              UNION SELECT dst AS src, src AS dst FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst AS node FROM edges),
    seedset AS (SELECT DISTINCT l_suppkey * 2 AS node FROM lineitem
                WHERE l_suppkey % 53 = 0),
    flagged AS (SELECT n.node, s.node IS NOT NULL AS seed
                FROM nodes n LEFT JOIN seedset s ON s.node = n.node),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, seed,
                  CASE WHEN seed THEN {init} ELSE 0 END AS pr
           FROM flagged)"""
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(
            f""",
    c{i} AS (SELECT e.dst AS node, SUM(r.pr // d.deg) AS s
             FROM edges e
             JOIN deg d ON e.src = d.src
             JOIN r{p} r ON r.node = e.src
             GROUP BY e.dst),
    r{i} AS (SELECT f.node, f.seed,
             CASE WHEN f.seed
                  THEN (({den} - {num}) * {init}) // {den} ELSE 0 END
             + ({num} * COALESCE(c.s, 0)) // {den} AS pr
             FROM flagged f LEFT JOIN c{i} c ON c.node = f.node)"""
        )
    parts.append(
        f"\n    SELECT node, CAST(pr AS BIGINT) AS ppr FROM r{iterations}"
    )
    return "".join(parts)


@query("graph_ppr_seeds", oracle=_ppr_oracle())
def q_graph_ppr_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from seed suppliers over the co-purchase graph: teleport mass only at seeds, integer-scaled ranks - the seed-expansion / crawl-frontier prioritization signal."""
    from datalake_etlscripts_spark.operators.graph import personalized_pagerank

    li = read_table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).dropDuplicates()
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = li.filter(F.col("l_suppkey") % 53 == 0).select(
        (F.col("l_suppkey") * 2).alias("node")
    )
    return personalized_pagerank(edges, seeds, iterations=_PPR_ITER)


# ---------------------------------------------------------------------------
# TextRank keyword extraction (r5): PageRank over the word
# co-occurrence graph (adjacent-token pairs, symmetrized) — Mihalcea &
# Tarau's unsupervised keyword ranker, composed from the existing
# integer-exact pagerank. Node ids are the 60-bit md5 lane (hash
# collisions, if any, collapse identically in both engines); the
# word↔node map joins back for labels; top-30 ties break on word.
# ---------------------------------------------------------------------------
_TR_BASE = f"""
    WITH tkl AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk
                 FROM documents),
    pr0 AS (SELECT tk[u.i] AS a, tk[u.i + 1] AS b
            FROM tkl CROSS JOIN LATERAL unnest(range(1, len(tk))) u(i)),
    e1 AS (SELECT DISTINCT a, b FROM pr0 WHERE a <> b),
    eh AS (SELECT {ddb_hex60("md5(a)")} AS src,
                  {ddb_hex60("md5(b)")} AS dst FROM e1),
    edges AS (SELECT src, dst FROM eh UNION SELECT dst, src FROM eh)"""

_TR_FINAL = """,
    wm AS (SELECT DISTINCT word FROM
             (SELECT a AS word FROM e1 UNION ALL SELECT b FROM e1)),
    wh AS (SELECT word, {hash60} AS node FROM wm)
    SELECT wh.word, CAST(r.pr AS BIGINT) AS pr
    FROM r{n} r JOIN wh ON wh.node = r.node
    ORDER BY pr DESC, word ASC LIMIT 30"""


@query(
    "textrank_keywords",
    oracle=_pagerank_oracle(
        base_cte=_TR_BASE,
        final_select=_TR_FINAL.replace("{hash60}", ddb_hex60("md5(word)")),
    ),
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords: integer-exact PageRank over the symmetrized adjacent-token co-occurrence graph, 60-bit md5 node ids, word map joined back - top 30 by rank."""
    from datalake_etlscripts_spark.functions.scalar import md5_hash60
    from datalake_etlscripts_spark.operators.text import tokens

    d = read_table(spark, sf_dir, "documents")
    tk = d.select(tokens(F.col("text")).alias("_tk")).filter(F.size("_tk") >= 2)
    pairs = tk.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(_tk)-1),"
                " i -> struct(_tk[i-1] AS a, _tk[i] AS b))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("wa"), F.col("p.b").alias("wb"))
    e1 = pairs.filter(F.col("wa") != F.col("wb")).distinct()
    eh = e1.select(
        md5_hash60(F.col("wa")).alias("src"), md5_hash60(F.col("wb")).alias("dst")
    )
    edges = eh.unionByName(
        eh.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(
        edges,
        iterations=_PR_ITER,
        damping=(_PR_NUM, _PR_DEN),
        scale=_PR_SCALE,
        dedup_shuffle="edge",
        dangling="none",
    )
    wm = (
        e1.select(F.col("wa").alias("word"))
        .unionByName(e1.select(F.col("wb").alias("word")))
        .distinct()
        .withColumn("node", md5_hash60(F.col("word")))
    )
    return (
        ranks.join(wm, "node")
        .select("word", F.col("rank").alias("pr"))
        .orderBy(F.col("pr").desc(), F.col("word").asc())
        .limit(30)
    )


# ---------------------------------------------------------------------------
# HyperBall neighborhood function (r5): per-node 2-hop ball-size
# estimates from mergeable HLL registers — state stays ≤ 256 rows per
# node however large the ball, so effective-diameter questions run at
# graph scale. Oracle replays the registers (md5 lanes + comparison
# ladder) and the integer-denominator estimate bit-for-bit.
# ---------------------------------------------------------------------------
def _hyperball_oracle(radius: int = 2) -> str:
    from datalake_etlscripts_spark.operators.sketches import (
        HLL_BUCKETS,
        HLL_EST_NUM,
        HLL_WORD_BITS,
    )

    ladder = " ".join(
        f"WHEN w >= {1 << i} THEN {HLL_WORD_BITS - i}"
        for i in range(HLL_WORD_BITS - 1, -1, -1)
    )
    scale = 1 << (HLL_WORD_BITS + 1)
    est = (
        f"{HLL_EST_NUM!r} / (sum(CAST(1 AS BIGINT) << ({HLL_WORD_BITS + 1} - reg))"
        f" + ({HLL_BUCKETS} - count(*)) * {scale})"
    )
    hh = ddb_hex32("md5(CAST(node AS VARCHAR))")
    parts = [
        f"""
    WITH e0 AS (SELECT DISTINCT l_suppkey * 2 AS src,
                                l_partkey * 2 + 1 AS dst
                FROM lineitem),
    edges AS (SELECT src, dst FROM e0
              UNION SELECT dst AS src, src AS dst FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    h AS (SELECT node, {hh} AS hh FROM nodes),
    s0 AS (SELECT node, hh & {HLL_BUCKETS - 1} AS bucket,
                  CASE {ladder.replace('w >=', f'(hh >> {8}) >=')} ELSE {HLL_WORD_BITS + 1} END AS reg
           FROM h)"""
    ]
    for i in range(1, radius + 1):
        p = i - 1
        parts.append(
            f""",
    s{i} AS (SELECT node, bucket, max(reg) AS reg FROM (
               SELECT node, bucket, reg FROM s{p}
               UNION ALL
               SELECT e.dst AS node, s.bucket, s.reg
               FROM edges e JOIN s{p} s ON s.node = e.src
             ) GROUP BY 1, 2)"""
        )
    parts.append(
        f"""
    SELECT node, {est} AS est_ball FROM s{radius} GROUP BY node"""
    )
    return "".join(parts)


@query("graph_neighborhood_hll", oracle=_hyperball_oracle())
def q_graph_neighborhood_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall: per-node 2-hop neighborhood-size estimates via mergeable HLL register state (<=256 rows per node regardless of ball size) - one edge join + one max-merge per round."""
    from datalake_etlscripts_spark.operators.graph import neighborhood_hll

    li = read_table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).dropDuplicates()
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return neighborhood_hll(edges, radius=2)


# ---------------------------------------------------------------------------
# Multi-source BFS (r6): hop distances from seed suppliers over the
# symmetrized supplier-part graph — the frontier/anti-join delta
# iteration beside personalized_pagerank's weighted expansion.
# ---------------------------------------------------------------------------
def _bfs_oracle(max_hops: int = 4, seeds: str = "2, 4") -> str:
    parts = [
        f"""
    WITH e0 AS (SELECT DISTINCT l_suppkey * 2 AS src,
                                l_partkey * 2 + 1 AS dst
                FROM lineitem),
    edges AS (SELECT src, dst FROM e0
              UNION SELECT dst AS src, src AS dst FROM e0),
    d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
           FROM edges WHERE src IN ({seeds})),
    f0 AS (SELECT node FROM d0)"""
    ]
    for t in range(1, max_hops + 1):
        p = t - 1
        parts.append(
            f""",
    n{t} AS (SELECT DISTINCT e.dst AS node
             FROM edges e JOIN f{p} f ON e.src = f.node
             WHERE e.dst NOT IN (SELECT node FROM d{p})),
    d{t} AS (SELECT node, dist FROM d{p}
             UNION ALL SELECT node, CAST({t} AS BIGINT) FROM n{t}),
    f{t} AS (SELECT node FROM n{t})"""
        )
    parts.append(f"\n    SELECT node, dist FROM d{max_hops}")
    return "".join(parts)


@query("graph_bfs_hops", oracle=_bfs_oracle())
def q_graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distances from seed suppliers over the supplier-part graph - frontier x edges delta iteration with anti-joined visited set, never visited x edges."""
    from datalake_etlscripts_spark.operators.graph import bfs_hops

    li = read_table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).dropDuplicates()
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        edges.filter(F.col("src").isin(2, 4))
        .select(F.col("src").alias("node"))
        .distinct()
    )
    return bfs_hops(edges, seeds, max_hops=4)


# ---------------------------------------------------------------------------
# Sampled stress centrality (r10): the integer-exact member of the
# betweenness family — Brandes' two passes with the backward step
# counting shortest-path CONTINUATIONS (T(v) = Σ_succ (1+T(w)))
# instead of summing fractional dependencies, so through(v) = σ(v)·T(v)
# = #bounded shortest seed-paths passing v is a pure integer both
# engines replay bit-for-bit. Two seed suppliers, depth 3, on the
# symmetrized supplier-part graph; the oracle unrolls forward σ levels
# and backward T levels per seed.
# ---------------------------------------------------------------------------
_STRESS_HOPS = 3
_STRESS_SEEDS = (2, 4)


def _stress_oracle(max_hops: int = _STRESS_HOPS, seeds=_STRESS_SEEDS) -> str:
    parts = [
        """
    WITH e0 AS (SELECT DISTINCT l_suppkey * 2 AS src,
                                l_partkey * 2 + 1 AS dst
                FROM lineitem),
    edges AS MATERIALIZED (SELECT src, dst FROM e0
              UNION SELECT dst AS src, src AS dst FROM e0)"""
    ]
    outs = []
    for i, s in enumerate(seeds):
        parts.append(
            f""",
    s{i}_d0 AS (SELECT CAST({s} AS BIGINT) AS node,
                       CAST(1 AS BIGINT) AS sig),
    s{i}_v0 AS (SELECT node FROM s{i}_d0)"""
        )
        for t in range(1, max_hops + 1):
            p = t - 1
            parts.append(
                f""",
    s{i}_d{t} AS MATERIALIZED (
      SELECT e.dst AS node, CAST(SUM(p.sig) AS BIGINT) AS sig
      FROM edges e JOIN s{i}_d{p} p ON p.node = e.src
      WHERE e.dst NOT IN (SELECT node FROM s{i}_v{p}) GROUP BY 1),
    s{i}_v{t} AS MATERIALIZED (
      SELECT node FROM s{i}_v{p}
      UNION ALL SELECT node FROM s{i}_d{t})"""
            )
        parts.append(
            f""",
    s{i}_c{max_hops} AS (SELECT node, CAST(0 AS BIGINT) AS t
                         FROM s{i}_d{max_hops})"""
        )
        for t in range(max_hops - 1, -1, -1):
            parts.append(
                f""",
    s{i}_c{t} AS (
      SELECT d.node, CAST(COALESCE(SUM(c.t + 1), 0) AS BIGINT) AS t
      FROM s{i}_d{t} d
      LEFT JOIN edges e ON e.src = d.node
      LEFT JOIN s{i}_c{t + 1} c ON c.node = e.dst
      GROUP BY 1)"""
            )
        outs.append(
            "\n      UNION ALL ".join(
                f"""SELECT CAST({s} AS BIGINT) AS seed, d.node,
             CAST({t} AS BIGINT) AS dist, d.sig AS sigma,
             CAST(d.sig * c.t AS BIGINT) AS through
      FROM s{i}_d{t} d JOIN s{i}_c{t} c ON c.node = d.node"""
                for t in range(max_hops + 1)
            )
        )
    parts.append(
        "\n    " + "\n    UNION ALL\n    ".join(outs)
    )
    return "".join(parts)


@query("graph_stress_centrality", oracle=_stress_oracle())
def q_graph_stress_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth stress centrality from two seed suppliers: forward BFS path counts sigma, backward integer continuation counts, through = sigma*T - the exact-integer betweenness cousin, one keyed join + aggregate per level each way."""
    from datalake_etlscripts_spark.operators.graph import stress_centrality

    li = read_table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).dropDuplicates()
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return stress_centrality(
        edges, list(_STRESS_SEEDS), max_hops=_STRESS_HOPS
    ).select("seed", "node", "dist", "sigma", "through")


# ---------------------------------------------------------------------------
# HITS hubs & authorities (r7): unnormalized integer alternation on the
# supplier→part bipartite graph — after t rounds scores are exact walk
# counts, ordering identically to the L2-normalized fixed point. Same
# per-round shape as pagerank: one edge⨝score join + one keyed
# aggregate; only the two top-k lists leave the cluster.
# ---------------------------------------------------------------------------
@query(
    "graph_hits_scores",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    h1 AS (SELECT s, CAST(count(*) AS HUGEINT) AS score FROM e GROUP BY 1),
    a1 AS (
      SELECT e.p, CAST(sum(h1.score) AS HUGEINT) AS score
      FROM e JOIN h1 USING (s) GROUP BY 1
    ),
    h2 AS (
      SELECT e.s, CAST(sum(a1.score) AS HUGEINT) AS score
      FROM e JOIN a1 USING (p) GROUP BY 1
    ),
    a2 AS (
      SELECT e.p, CAST(sum(h2.score) AS HUGEINT) AS score
      FROM e JOIN h2 USING (s) GROUP BY 1
    ),
    th AS (
      SELECT 'hub' AS side, CAST(s AS BIGINT) AS id,
             CAST(CAST(score AS VARCHAR) AS DOUBLE) AS score,
             CAST(row_number() OVER (ORDER BY score DESC, s) AS INT) AS rank
      FROM h2
    ),
    ta AS (
      SELECT 'authority' AS side, CAST(p AS BIGINT) AS id,
             CAST(CAST(score AS VARCHAR) AS DOUBLE) AS score,
             CAST(row_number() OVER (ORDER BY score DESC, p) AS INT) AS rank
      FROM a2
    )
    SELECT * FROM th WHERE rank <= 20
    UNION ALL
    SELECT * FROM ta WHERE rank <= 20
    """,
)
def q_graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs and authorities on the supplier-part bipartite graph: two unnormalized integer alternation rounds (scores are exact walk counts, same order as the normalized fixed point), top-20 per side."""
    from datalake_etlscripts_spark.operators.graph import hits_scores

    li = read_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    return hits_scores(edges, rounds=2, k=20)


# ---------------------------------------------------------------------------
# Degree assortativity (r9): Pearson correlation of endpoint degrees
# across the symmetrized supplier-part edge list — the one-number
# answer to "do hubs link to hubs?". Exact DECIMAL(38,0) moments from
# one edge scan (+ one degree join); r is a single fixed-order double
# combine. At 100 TB: two keyed shuffles (degree, moments), no
# iteration, scalars only to the driver.
# ---------------------------------------------------------------------------
@query(
    "graph_assortativity",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
      FROM lineitem
    ),
    edges AS (SELECT src, dst FROM e0
              UNION ALL SELECT dst, src FROM e0),
    deg AS (SELECT src AS node, CAST(count(*) AS HUGEINT) AS d
            FROM edges GROUP BY 1),
    pairs AS (
      SELECT ds.d AS x, dd.d AS y
      FROM edges e
      JOIN deg ds ON ds.node = e.src
      JOIN deg dd ON dd.node = e.dst
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS m_edges,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS num,
           CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS vx,
           CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS vy,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)))
           END AS assortativity
    FROM m
    """,
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the supplier-part graph: Pearson r of endpoint degrees over the symmetrized edge list - exact DECIMAL moments, one fixed-order double combine, scalars only to the driver."""
    li = read_table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).dropDuplicates()
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("d")
    )
    ds = deg.select(F.col("node").alias("sn"), F.col("d").alias("x"))
    dd = deg.select(F.col("node").alias("dn"), F.col("d").alias("y"))
    pairs = (
        edges.join(ds, edges["src"] == ds["sn"])
        .join(dd, edges["dst"] == dd["dn"])
        .select("x", "y")
    )
    m = pairs.groupBy().agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )

    def dd_(c):
        return c.cast("string").cast("double")

    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("n").cast("long").alias("m_edges"),
        dd_(num).alias("num"),
        dd_(vx).alias("vx"),
        dd_(vy).alias("vy"),
        F.when(
            (vx > 0) & (vy > 0),
            dd_(num) / (F.sqrt(dd_(vx)) * F.sqrt(dd_(vy))),
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Bounded-hop weighted shortest paths (r9): K Bellman-Ford relaxation
# rounds from seed suppliers over the symmetrized supplier-part graph,
# edge weight = min lineitem quantity for the pair (exact integers, no
# float path sums). The engine side is the delta-iteration sssp_rounds
# operator (frontier-only relaxation); the oracle unrolls the same K
# rounds as CTEs — bit-identical distances because min-fold order is
# irrelevant over integers.
# ---------------------------------------------------------------------------
def _sssp_oracle(rounds: int = 4) -> str:
    parts = [
        """
    WITH e0 AS (
      SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst,
             CAST(min(l_quantity) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    edges AS (SELECT src, dst, w FROM e0
              UNION ALL SELECT dst, src, w FROM e0),
    d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
           FROM edges WHERE src IN (2, 4))"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
    c{t} AS (SELECT e.dst AS node, d.dist + e.w AS dist
             FROM d{t - 1} d JOIN edges e ON e.src = d.node),
    d{t} AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM
             (SELECT * FROM d{t - 1} UNION ALL SELECT * FROM c{t})
             GROUP BY 1)"""
        )
    parts.append(f"\n    SELECT node, dist FROM d{rounds}")
    return "".join(parts)


@query("graph_shortest_paths", oracle=_sssp_oracle(4))
def q_graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop weighted shortest paths (4 Bellman-Ford rounds) from seed suppliers - delta-iteration frontier relaxation, exact integer path weights, min-fold per round."""
    from datalake_etlscripts_spark.operators.graph import sssp_rounds

    li = read_table(spark, sf_dir, "lineitem")
    e0 = li.groupBy(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).agg(F.min(F.col("l_quantity").cast("long")).alias("w"))
    edges = e0.unionByName(
        e0.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    seeds = (
        edges.filter(F.col("src").isin(2, 4))
        .select(F.col("src").alias("node"))
        .distinct()
    )
    return sssp_rounds(edges, seeds, rounds=4)


# ---------------------------------------------------------------------------
# Bounded-depth harmonic closeness (r12): H(s) = Σ 1/d(s,t) within 4
# hops on the symmetrized supplier-part graph, for four seed
# suppliers — the disconnected-safe centrality beside
# graph_stress_centrality (load) and graph_shortest_paths (weighted
# reach). EXACT: 1/d rides as lcm(1..4)/d = 12/d, an integer with
# zero remainder, so the aggregate is pure int64. The oracle unrolls
# the same 4 min-fold BFS rounds as CTEs keyed by seed (the
# _sssp_oracle pattern at unit weight); the engine side is the
# delta-iteration harmonic_closeness operator (broadcast node-sized
# frontiers, edges never shuffle — cluster fallback documented on the
# operator).
# ---------------------------------------------------------------------------
def _harmonic_oracle(max_hops: int = 4, scale: int = 12) -> str:
    parts = [
        """
    WITH e0 AS (
      SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
      FROM lineitem GROUP BY 1, 2
    ),
    edges AS (SELECT src, dst FROM e0
              UNION ALL SELECT dst, src FROM e0),
    seeds AS (SELECT unnest([2, 4, 6, 8]) AS seed),
    d0 AS (SELECT seed, CAST(seed AS BIGINT) AS node,
                  CAST(0 AS BIGINT) AS dist FROM seeds)"""
    ]
    for t in range(1, max_hops + 1):
        parts.append(
            f""",
    c{t} AS (SELECT d.seed, e.dst AS node, CAST({t} AS BIGINT) AS dist
             FROM d{t - 1} d JOIN edges e ON e.src = d.node),
    d{t} AS (SELECT seed, node, CAST(min(dist) AS BIGINT) AS dist FROM
             (SELECT * FROM d{t - 1} UNION ALL SELECT * FROM c{t})
             GROUP BY 1, 2)"""
        )
    parts.append(
        f"""
    SELECT seed, CAST(count(*) AS BIGINT) AS reached,
           CAST(sum({scale} // dist) AS BIGINT) AS harmonic_x{scale}
    FROM d{max_hops} WHERE dist > 0 GROUP BY seed"""
    )
    return "".join(parts)


@query("graph_harmonic_closeness", oracle=_harmonic_oracle(4, 12))
def q_graph_harmonic_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth harmonic closeness (4 hops, 4 seed suppliers) on the supplier-part graph - delta-iteration seeded BFS, 1/d kept exact as 12/d int64, min-fold oracle unroll."""
    from datalake_etlscripts_spark.operators.graph import harmonic_closeness

    li = read_table(spark, sf_dir, "lineitem")
    e0 = li.groupBy(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).agg(F.lit(1))
    e0 = e0.select("src", "dst")
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return harmonic_closeness(edges, [2, 4, 6, 8], max_hops=4)


# ---------------------------------------------------------------------------
# Greedy mutual-best maximal matching (r9): the distributed matching
# round — each alive node points at its best remaining neighbor by
# (weight DESC, id ASC); edges whose endpoints point at each other
# lock, matched nodes retire, repeat. Three rounds on the symmetrized
# min-quantity supplier-part graph. Per round: one per-src argmax
# window, one equi-self-join on the (node-sized) pointer table, two
# anti-joins — never a pair explosion; the alive subgraph only
# shrinks. The oracle unrolls identical rounds as CTEs; the
# deterministic tie order makes both engines lock the same edge set.
# ---------------------------------------------------------------------------
def _matching_oracle(rounds: int = 3) -> str:
    parts = [
        """
    WITH e0 AS (
      SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst,
             CAST(min(l_quantity) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    a1 AS (SELECT src, dst, w FROM e0
           UNION ALL SELECT dst, src, w FROM e0)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
    b{t} AS (
      SELECT src, dst, w FROM (
        SELECT src, dst, w, row_number() OVER (PARTITION BY src
          ORDER BY w DESC, dst ASC) AS rn
        FROM a{t}
      ) WHERE rn = 1
    ),
    m{t} AS (
      SELECT x.src AS u, x.dst AS v, x.w, {t} AS round
      FROM b{t} x JOIN b{t} y ON y.src = x.dst AND y.dst = x.src
      WHERE x.src < x.dst
    ),
    n{t} AS (SELECT u AS node FROM m{t} UNION SELECT v FROM m{t}),
    nn{t} AS (SELECT node FROM n{t}{''.join(f' UNION SELECT node FROM n{s}' for s in range(1, t))}),
    a{t + 1} AS (
      SELECT e.src, e.dst, e.w FROM a{t} e
      WHERE e.src NOT IN (SELECT node FROM nn{t})
        AND e.dst NOT IN (SELECT node FROM nn{t})
    )"""
        )
    sel = " UNION ALL ".join(
        f"SELECT u, v, w, CAST(round AS INT) AS round FROM m{t}"
        for t in range(1, rounds + 1)
    )
    parts.append("\n    " + sel)
    return "".join(parts)


@query("graph_mutual_matching", oracle=_matching_oracle(3))
def q_graph_mutual_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximal weighted matching via mutual-best pointer rounds (3) on the symmetrized supplier-part graph - per-src argmax window + pointer self-join + anti-join retirement, deterministic tie order, no pair explosion."""
    from datalake_etlscripts_spark.operators.graph import mutual_matching

    li = read_table(spark, sf_dir, "lineitem")
    e0 = li.groupBy(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).agg(F.min(F.col("l_quantity").cast("long")).alias("w"))
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    return mutual_matching(edges, rounds=3)


# ---------------------------------------------------------------------------
# k-truss (r9): the triangle-cohesion refinement of k-core on the
# part co-order graph — 4-truss peeling for 3 rounds (edges must sit
# in ≥2 triangles among SURVIVING edges). Each round is one ordered
# a<b<c triangle join + one 3-way explode aggregate + the filter; the
# oracle unrolls identical rounds. Output = surviving edges with
# their final-round support.
# ---------------------------------------------------------------------------
def _ktruss_oracle(rounds: int = 3) -> str:
    parts = [
        """
    WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM (
             SELECT l_orderkey, l_partkey,
                    count(*) OVER (PARTITION BY l_orderkey) AS bs
             FROM li0) WHERE bs <= __MAX_BASKET__),
    e1 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM li a JOIN li b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
    tri{t} AS MATERIALIZED (
      SELECT x.u AS a, x.v AS b, y.v AS c
      FROM e{t} x JOIN e{t} y ON y.u = x.v
      JOIN e{t} z ON z.u = x.u AND z.v = y.v
    ),
    supp{t} AS MATERIALIZED (
      SELECT u, v, CAST(count(*) AS BIGINT) AS support FROM (
        SELECT a AS u, b AS v FROM tri{t}
        UNION ALL SELECT b, c FROM tri{t}
        UNION ALL SELECT a, c FROM tri{t}
      ) GROUP BY 1, 2
    ),
    e{t + 1} AS MATERIALIZED (SELECT u, v FROM supp{t} WHERE support >= 2)"""
        )
    parts.append(
        f"""
    SELECT u, v, support FROM supp{rounds} WHERE support >= 2"""
    )
    return "".join(parts)


@query("graph_ktruss", oracle=_ktruss_oracle(3))
def q_graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss peeling (3 rounds) on the part co-order graph: ordered triangle join + explode-aggregate support per round, edges needing 2+ triangles among survivors - the cohesion refinement of k-core."""
    from datalake_etlscripts_spark.operators.graph import ktruss

    return ktruss(_co_order_edges(spark, sf_dir), k=4, rounds=3)


# ---------------------------------------------------------------------------
# Sampled eccentricity / closeness (r9): bounded-hop BFS from the
# three smallest part keys over the co-order graph — per seed the
# 4-hop eccentricity (a diameter lower-bound witness) and the exact
# closeness numerator Σdist. Engine side reuses the delta-iteration
# bfs_hops operator per seed; the oracle runs one bounded recursive
# CTE per seed (UNION-dedup keeps state ≤ hops·|nodes|).
# ---------------------------------------------------------------------------
def _ecc_oracle() -> str:
    seed_sel = (
        "(SELECT l_partkey FROM (SELECT DISTINCT l_partkey FROM lineitem"
        " ORDER BY 1 LIMIT 3) s ORDER BY 1 OFFSET {k} LIMIT 1)"
    )
    per_seed = []
    for k in range(3):
        s = seed_sel.format(k=k)
        per_seed.append(
            f"""
    r{k}(node, dist) AS (
      SELECT CAST({s} AS BIGINT), 0
      UNION
      SELECT e.dst, r.dist + 1
      FROM r{k} r JOIN edges e ON e.src = r.node
      WHERE r.dist < 4
    ),
    m{k} AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist
             FROM r{k} GROUP BY 1)"""
        )
    sel = " UNION ALL ".join(
        f"""SELECT CAST({seed_sel.format(k=k)} AS BIGINT) AS seed,
           CAST(count(*) AS BIGINT) AS n_reached,
           CAST(max(dist) AS BIGINT) AS ecc4,
           CAST(sum(dist) AS BIGINT) AS sum_dist
    FROM m{k}"""
        for k in range(3)
    )
    return f"""
    WITH RECURSIVE li0 AS (SELECT DISTINCT l_orderkey, l_partkey
                           FROM lineitem),
    li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM (
             SELECT l_orderkey, l_partkey,
                    count(*) OVER (PARTITION BY l_orderkey) AS bs
             FROM li0) WHERE bs <= __MAX_BASKET__),
    e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM li a JOIN li b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    edges AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0
              UNION ALL SELECT v, u FROM e0),{",".join(per_seed)}
    {sel}
    """


@query("graph_eccentricity_sample", oracle=_ecc_oracle())
def q_graph_eccentricity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop eccentricity and exact closeness numerator from three deterministic seeds on the co-order graph - per-seed delta-iteration BFS, diameter lower-bound witnesses."""
    from datalake_etlscripts_spark.operators.graph import bfs_hops_tagged

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    e0 = _co_order_edges(spark, sf_dir)
    edges = e0.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(
        e0.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    seeds = [
        r["l_partkey"]
        for r in li.select("l_partkey")
        .distinct()
        .orderBy("l_partkey")
        .limit(3)
        .collect()
    ]
    # r07 (guide §2.4): one seed-tagged delta iteration replaces three
    # independent 4-hop BFS loops — the edge table is traversed once
    # per hop instead of once per (seed, hop), and the edge build is
    # settled once inside the operator instead of re-deriving per
    # round. Per-seed (node, dist) sets are identical to the former
    # per-seed runs.
    seed_df = edges.sparkSession.createDataFrame(
        [(s, s) for s in seeds], "seed BIGINT, node BIGINT"
    )
    d = bfs_hops_tagged(edges, seed_df, max_hops=4)
    return d.groupBy("seed").agg(
        F.count(F.lit(1)).cast("long").alias("n_reached"),
        F.max("dist").cast("long").alias("ecc4"),
        F.sum("dist").cast("long").alias("sum_dist"),
    )


# ---------------------------------------------------------------------------
# Rich-club coefficient (r9): do high-degree nodes preferentially
# connect to each other? φ(k) = 2·E_k / (n_k(n_k−1)) over the nodes
# with degree > k, at k ∈ {4, 8, 16} — exact integer edge and node
# counts via one degree join per threshold (the thresholds are
# literals, so the three passes are three filters over the SAME
# degree-annotated edge list, not three graph builds).
# ---------------------------------------------------------------------------
@query(
    "graph_rich_club",
    oracle="""
    WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM (
             SELECT l_orderkey, l_partkey,
                    count(*) OVER (PARTITION BY l_orderkey) AS bs
             FROM li0) WHERE bs <= __MAX_BASKET__),
    e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM li a JOIN li b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
      ) GROUP BY 1
    ),
    ks AS (SELECT unnest([4, 8, 16]) AS k),
    nk AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_k
      FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1
    ),
    ek AS (
      SELECT ks.k, CAST(count(*) AS BIGINT) AS e_k
      FROM e0
      JOIN deg du ON du.node = e0.u
      JOIN deg dv ON dv.node = e0.v
      CROSS JOIN ks
      WHERE du.d > ks.k AND dv.d > ks.k
      GROUP BY 1
    )
    SELECT nk.k, nk.n_k, coalesce(ek.e_k, 0) AS e_k,
           CASE WHEN nk.n_k > 1 THEN
             CAST(2 * coalesce(ek.e_k, 0) AS DOUBLE)
             / CAST(nk.n_k * (nk.n_k - 1) AS DOUBLE) END AS phi
    FROM nk LEFT JOIN ek ON ek.k = nk.k
    """,
)
def q_graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) at k in {4,8,16} on the co-order graph: exact edge/node counts from one degree-annotated edge list, one division per threshold."""
    e0 = _co_order_edges(spark, sf_dir)
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionByName(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    anno = (
        e0.join(
            deg.select(F.col("node").alias("un"), F.col("d").alias("du")),
            F.col("u") == F.col("un"),
        )
        .join(
            deg.select(F.col("node").alias("vn"), F.col("d").alias("dv")),
            F.col("v") == F.col("vn"),
        )
        .select("u", "v", "du", "dv")
    )
    ks = spark.createDataFrame([(4,), (8,), (16,)], "k INT")
    nk = (
        deg.crossJoin(F.broadcast(ks))
        .filter(F.col("d") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    )
    ek = (
        anno.crossJoin(F.broadcast(ks))
        .filter((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
        .withColumnRenamed("k", "ek_k")
    )
    j = nk.join(ek, F.col("k") == F.col("ek_k"), "left")
    return j.select(
        "k",
        "n_k",
        F.coalesce("e_k", F.lit(0)).cast("long").alias("e_k"),
        F.when(
            F.col("n_k") > 1,
            (2 * F.coalesce("e_k", F.lit(0))).cast("double")
            / (F.col("n_k") * (F.col("n_k") - 1)).cast("double"),
        ).alias("phi"),
    )


# ---------------------------------------------------------------------------
# Graph density summary (r9): the one-row shape card for the co-order
# graph — nodes, edges, density 2E/(n(n−1)), exact mean degree as a
# fraction, max degree and its argmax node (deterministic tie), and
# the count of degree-1 leaves. All integer aggregates + two
# divisions; the first thing you look at before running anything
# iterative.
# ---------------------------------------------------------------------------
@query(
    "graph_density_summary",
    oracle="""
    WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM (
             SELECT l_orderkey, l_partkey,
                    count(*) OVER (PARTITION BY l_orderkey) AS bs
             FROM li0) WHERE bs <= __MAX_BASKET__),
    e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM li a JOIN li b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
      ) GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d) AS BIGINT) AS deg_sum,
             CAST(max(d) AS BIGINT) AS max_deg,
             CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaves
      FROM deg
    ),
    am AS (
      SELECT node AS argmax_node FROM deg
      ORDER BY d DESC, node ASC LIMIT 1
    ),
    e AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e0)
    SELECT m.n_nodes, e.n_edges, m.max_deg, am.argmax_node, m.n_leaves,
           CAST(2 * e.n_edges AS DOUBLE)
             / CAST(m.n_nodes * (m.n_nodes - 1) AS DOUBLE) AS density,
           CAST(m.deg_sum AS DOUBLE) / CAST(m.n_nodes AS DOUBLE)
             AS mean_degree
    FROM m CROSS JOIN e CROSS JOIN am
    """,
)
def q_graph_density_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row shape card for the co-order graph: nodes/edges/density/mean and max degree with a deterministic argmax, leaf count - integer aggregates and two divisions."""
    e0 = _co_order_edges(spark, sf_dir)
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionByName(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    m = deg.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("d").cast("long").alias("deg_sum"),
        F.max("d").cast("long").alias("max_deg"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_leaves"),
    )
    am = deg.orderBy(F.col("d").desc(), F.col("node").asc()).limit(1).select(
        F.col("node").alias("argmax_node")
    )
    e = e0.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    j = m.crossJoin(F.broadcast(e)).crossJoin(F.broadcast(am))
    return j.select(
        "n_nodes",
        "n_edges",
        "max_deg",
        "argmax_node",
        "n_leaves",
        (
            (2 * F.col("n_edges")).cast("double")
            / (F.col("n_nodes") * (F.col("n_nodes") - 1)).cast("double")
        ).alias("density"),
        (F.col("deg_sum").cast("double") / F.col("n_nodes").cast("double")).alias(
            "mean_degree"
        ),
    )


# ---------------------------------------------------------------------------
# LPA modularity (r9): Newman's Q for the 3-round label-propagation
# communities, computed EXACTLY — Q·4m² = Σ_c (4m·m_c − d_c²) is a
# pure integer sum over communities (order-free), so the only double
# is the final division. Composes the unrolled LPA oracle with the
# degree/within-edge aggregates; the quality readout that tells you
# whether the communities mean anything before you act on them.
# ---------------------------------------------------------------------------
def _lpa_modularity_oracle() -> str:
    base = _lpa_oracle(3)
    base = base.rsplit("SELECT node, label", 1)[0]
    return base + """,
    lab AS (SELECT node, label FROM l3),
    mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM e0),
    deg AS (SELECT src AS node, CAST(count(*) AS HUGEINT) AS d
            FROM edges GROUP BY 1),
    dc AS (SELECT lab.label, CAST(sum(deg.d) AS HUGEINT) AS d_c
           FROM deg JOIN lab ON lab.node = deg.node GROUP BY 1),
    mc AS (SELECT la.label, CAST(count(*) AS HUGEINT) AS m_c
           FROM e0
           JOIN lab la ON la.node = e0.u
           JOIN lab lb ON lb.node = e0.v AND lb.label = la.label
           GROUP BY 1),
    terms AS (
      SELECT dc.label,
             4 * mm.m * coalesce(mc.m_c, 0) - dc.d_c * dc.d_c AS t
      FROM dc LEFT JOIN mc ON mc.label = dc.label CROSS JOIN mm
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_communities,
             CAST(sum(t) AS HUGEINT) AS q_num
      FROM terms
    )
    SELECT CAST(mm.m AS BIGINT) AS m_edges, agg.n_communities,
           CAST(CAST(agg.q_num AS VARCHAR) AS DOUBLE) AS q_num,
           CAST(CAST(agg.q_num AS VARCHAR) AS DOUBLE)
             / CAST(CAST(4 * mm.m * mm.m AS VARCHAR) AS DOUBLE)
             AS modularity
    FROM agg CROSS JOIN mm
    """


@query("graph_lpa_modularity", oracle=_lpa_modularity_oracle())
def q_graph_lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the 3-round LPA communities computed exactly: Q times 4m-squared as a pure integer sum over communities, one final division."""
    from datalake_etlscripts_spark.operators.graph import label_propagation

    e0 = _co_order_edges(spark, sf_dir)
    edges = e0.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(
        e0.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    lab = label_propagation(edges, iterations=3).select("node", "label")
    mm = e0.groupBy().agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m")
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("d")
    )
    dc = (
        deg.join(lab, "node")
        .groupBy("label")
        .agg(F.sum("d").alias("d_c"))
    )
    la = lab.select(F.col("node").alias("ua"), F.col("label").alias("cla"))
    lb = lab.select(F.col("node").alias("vb"), F.col("label").alias("clb"))
    mc = (
        e0.join(la, F.col("u") == F.col("ua"))
        .join(
            lb,
            (F.col("v") == F.col("vb")) & (F.col("clb") == F.col("cla")),
        )
        .groupBy(F.col("cla").alias("mlabel"))
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("m_c"))
    )
    terms = (
        dc.join(mc, F.col("label") == F.col("mlabel"), "left")
        .crossJoin(F.broadcast(mm))
        .select(
            (
                4 * F.col("m")
                * F.coalesce(F.col("m_c"), F.lit(0).cast("decimal(38,0)"))
                - F.col("d_c") * F.col("d_c")
            ).alias("t")
        )
    )
    agg = terms.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.sum("t").alias("q_num"),
    )

    def dd_(c):
        return c.cast("string").cast("double")

    return agg.crossJoin(F.broadcast(mm)).select(
        F.col("m").cast("long").alias("m_edges"),
        "n_communities",
        dd_(F.col("q_num")).alias("q_num"),
        (dd_(F.col("q_num")) / dd_(4 * F.col("m") * F.col("m"))).alias(
            "modularity"
        ),
    )


# ---------------------------------------------------------------------------
# Community conductance (r9): per LPA community the cut share
# φ(C) = cut(C) / min(vol(C), 2m − vol(C)) — cut and volumes are
# exact integers from the same label joins as modularity; min by
# integer comparison; one division per community. Modularity scores
# the whole partition, conductance exposes WHICH communities leak.
# ---------------------------------------------------------------------------
def _conductance_oracle() -> str:
    base = _lpa_oracle(3)
    base = base.rsplit("SELECT node, label", 1)[0]
    return base + """,
    lab AS (SELECT node, label FROM l3),
    mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM e0),
    deg AS (SELECT src AS node, CAST(count(*) AS HUGEINT) AS d
            FROM edges GROUP BY 1),
    vol AS (SELECT lab.label, CAST(sum(deg.d) AS HUGEINT) AS v,
                   CAST(count(*) AS BIGINT) AS n_nodes
            FROM deg JOIN lab ON lab.node = deg.node GROUP BY 1),
    cut AS (
      SELECT la.cla AS label, CAST(count(*) AS HUGEINT) AS c
      FROM (SELECT e0.u, e0.v FROM e0) e
      JOIN (SELECT node AS un, label AS cla FROM lab) la ON la.un = e.u
      JOIN (SELECT node AS vn, label AS clb FROM lab) lb ON lb.vn = e.v
      WHERE la.cla <> lb.clb
      GROUP BY 1
      UNION ALL
      SELECT lb.clb, CAST(count(*) AS HUGEINT)
      FROM (SELECT e0.u, e0.v FROM e0) e
      JOIN (SELECT node AS un, label AS cla FROM lab) la ON la.un = e.u
      JOIN (SELECT node AS vn, label AS clb FROM lab) lb ON lb.vn = e.v
      WHERE la.cla <> lb.clb
      GROUP BY 1
    ),
    cc AS (SELECT label, CAST(sum(c) AS HUGEINT) AS cut_c
           FROM cut GROUP BY 1)
    SELECT v.label AS community, v.n_nodes,
           CAST(v.v AS BIGINT) AS volume,
           CAST(coalesce(cc.cut_c, 0) AS BIGINT) AS cut_edges,
           CASE WHEN least(v.v, 2 * mm.m - v.v) > 0 THEN
             CAST(CAST(coalesce(cc.cut_c, 0) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(least(v.v, 2 * mm.m - v.v) AS VARCHAR) AS DOUBLE)
           END AS conductance
    FROM vol v LEFT JOIN cc ON cc.label = v.label CROSS JOIN mm
    """


@query("graph_community_conductance", oracle=_conductance_oracle())
def q_graph_community_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community conductance of the LPA partition: exact integer cut and volume, min by comparison, one division - exposes which communities leak."""
    from datalake_etlscripts_spark.operators.graph import label_propagation

    e0 = _co_order_edges(spark, sf_dir)
    edges = e0.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(
        e0.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    lab = label_propagation(edges, iterations=3).select("node", "label")
    mm = e0.groupBy().agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m")
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("d")
    )
    vol = (
        deg.join(lab, "node")
        .groupBy("label")
        .agg(
            F.sum("d").alias("v"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
        )
    )
    la = lab.select(F.col("node").alias("ua"), F.col("label").alias("cla"))
    lb = lab.select(F.col("node").alias("vb"), F.col("label").alias("clb"))
    crossing = (
        e0.join(la, F.col("u") == F.col("ua"))
        .join(lb, F.col("v") == F.col("vb"))
        .filter(F.col("cla") != F.col("clb"))
        .localCheckpoint()
    )
    cut = (
        crossing.select(F.col("cla").alias("clabel"))
        .unionByName(crossing.select(F.col("clb").alias("clabel")))
        .groupBy("clabel")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("cut_c"))
    )
    j = vol.join(cut, F.col("label") == F.col("clabel"), "left").crossJoin(
        F.broadcast(mm)
    )
    denom = F.least(F.col("v"), 2 * F.col("m") - F.col("v"))
    zero = F.lit(0).cast("decimal(38,0)")

    def dd_(c):
        return c.cast("string").cast("double")

    return j.select(
        F.col("label").alias("community"),
        "n_nodes",
        F.col("v").cast("long").alias("volume"),
        F.coalesce(F.col("cut_c"), zero).cast("long").alias("cut_edges"),
        F.when(
            denom > 0,
            dd_(F.coalesce(F.col("cut_c"), zero)) / dd_(denom),
        ).alias("conductance"),
    )
