"""Graph operators over edge DataFrames — PageRank and degree stats.

A link-authority signal is a standard corpus-quality feature for
web-scale training-data pipelines (the reference has no graph ops;
this extends the engine's LLM-pipeline surface alongside dedup's
connected components, operators/dedup.py:692).

Design for 100 TB:
- Edges stay a distributed (src, dst) table; each PageRank iteration
  is ONE equi-join (edges ⨝ ranks on src) + ONE dst-keyed aggregate —
  shuffle volume linear in |edges|, never a cross product.
- The out-degree table is joined onto edges ONCE before the loop and
  the combined (src, dst, deg) table is materialized
  (localCheckpoint) so iterations re-read a settled input instead of
  re-running the dedup/degree subplan every round.
- Per-iteration lineage is truncated with a lazy localCheckpoint —
  without it the plan doubles per iteration (the classic iterative-
  algorithm lineage blowup).
- Only two scalars ever reach the driver: the node count and nothing
  else; ranks never collect.

Cross-engine determinism: ranks are SCALED 64-bit integers
(scale = 1e12) and every step uses integer division (Spark ``div`` ≡
DuckDB ``//`` for non-negative operands), so an external engine
replays the exact rank values — no float summation-order ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_etlscripts_spark.operators.checkpointing import cut_lineage

SCALE = 10**12
DAMPING_NUM = 85
DAMPING_DEN = 100


def degree_table(edges: DataFrame) -> DataFrame:
    """(src, deg): out-degree per source node of a distinct edge set."""
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))


def pagerank(
    edges: DataFrame,
    iterations: int = 4,
    damping: tuple[int, int] = (DAMPING_NUM, DAMPING_DEN),
    scale: int = SCALE,
    broadcast_nodes: int = 5_000_000,
    dedup_shuffle: str = "src",
    dangling: str = "redistribute",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Integer-scaled PageRank over directed ``edges`` (src, dst).

    rank'(v) = ((den-num)·init)//den
               + (num·(Σ_{u→v} rank(u)//deg(u) + dangling//n))//den

    with init = scale//n. Dangling mass (nodes with no out-edges) is
    redistributed uniformly, matching the classic formulation. All
    arithmetic is 64-bit integer — deterministic under any partitioning
    and replayable bit-for-bit by the DuckDB oracle twin
    (plans/graphops.py builds the same recurrence as unrolled CTEs).

    Join strategy: when the node count ≤ ``broadcast_nodes`` the rank
    table is BROADCAST into each iteration's edge join, so the settled
    edge table is never re-shuffled — per iteration the only exchange
    is the map-side-combined contribution aggregate (≤ one row per
    node per map partition). Web-scale graphs (nodes beyond broadcast
    reach) fall back to the shuffle join; results are identical either
    way (integer arithmetic).

    Returns (node, rank) with rank in units of 1/scale.
    """
    num, den = damping
    # Prep shuffle strategy (dedup_shuffle):
    #   "src"  — ONE src-partitioning serves the whole prep:
    #            HashPartitioning(src) satisfies the (src, dst) dedup,
    #            the degree aggregate, AND the join (5.1s → 3.1s at
    #            sf0.1). Tradeoff: the exchange ships duplicates as-is
    #            (no map-side partial dedup) and a hub's whole edge
    #            list lands in one task. Right when edges are mostly
    #            unique and out-degrees are moderate.
    #   "edge" — classic (src, dst)-keyed dedup: map-side partial
    #            combine absorbs duplication before the wire and hub
    #            edges spread across partitions; degree/join pay their
    #            own exchanges. Right for heavily duplicated input or
    #            power-law hub graphs.
    #   "none" — the caller GUARANTEES the edge set is already
    #            distinct (e.g. the union of a distinct set with its
    #            disjoint reversal); skips the dedup exchange
    #            entirely — the prep's single biggest cost at bench
    #            scale.
    if dedup_shuffle == "src":
        edges = edges.select("src", "dst").repartition("src").dropDuplicates()
    elif dedup_shuffle == "edge":
        edges = edges.select("src", "dst").dropDuplicates()
    elif dedup_shuffle == "none":
        edges = edges.select("src", "dst")
    else:
        raise ValueError(f"unknown dedup_shuffle {dedup_shuffle!r}")
    deg = degree_table(edges)
    if dangling == "none":
        # caller GUARANTEES every node has an out-edge (always true
        # for symmetrized/undirected graphs): nodes = degree keys, no
        # endpoint-explode aggregate, and the per-iteration dangling
        # scan disappears entirely (its sum is structurally zero)
        nodes = deg.select("src").withColumnRenamed("src", "node").withColumn(
            "_dang", F.lit(False)
        ).localCheckpoint()
    elif dangling == "redistribute":
        # nodes + static dangling flags in ONE aggregate: explode both
        # endpoints with an out-edge marker and take max — no separate
        # distinct + degree join (measured faster than
        # union∘distinct∘join at bench scale, same single exchange)
        nodes = (
            edges.select(
                F.explode(
                    F.array(
                        F.struct(F.col("src").alias("node"), F.lit(1).alias("out")),
                        F.struct(F.col("dst").alias("node"), F.lit(0).alias("out")),
                    )
                ).alias("e")
            )
            .select("e.node", "e.out")
            .groupBy("node")
            .agg((F.max("out") == 0).alias("_dang"))
            .localCheckpoint()
        )
    else:
        raise ValueError(f"unknown dangling mode {dangling!r}")
    # settle (src, dst, deg) once; every iteration re-reads this table
    edges_deg = edges.join(deg, "src").localCheckpoint()

    n_nodes = nodes.count()  # single scalar to the driver (cf. A1 max-id)
    init = scale // n_nodes
    base = ((den - num) * init) // den

    bcast = n_nodes <= broadcast_nodes
    ranks = nodes.select("node", "_dang", F.lit(init).cast("long").alias("rank"))
    for it in range(iterations):
        rank_side = ranks.withColumnRenamed("node", "src").drop("_dang")
        if bcast:
            rank_side = F.broadcast(rank_side)
        contrib = (
            edges_deg.join(rank_side, "src")
            .select(F.col("dst").alias("node"), F.expr("rank div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        joined = ranks.select("node", "_dang").join(contrib, "node", "left")
        if dangling == "none":
            # dangling mass is structurally zero: no scan, no broadcast
            ranks = joined.select(
                "node",
                "_dang",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({num} * coalesce(s, CAST(0 AS BIGINT))) div {den}"
                    )
                ).alias("rank"),
            )
        else:
            dang = ranks.filter(F.col("_dang")).agg(
                F.coalesce(F.sum("rank"), F.lit(0).cast("long")).alias("dang")
            )
            ranks = joined.crossJoin(F.broadcast(dang)).select(
                "node",
                "_dang",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({num} * (coalesce(s, CAST(0 AS BIGINT))"
                        f" + dang div {n_nodes})) div {den}"
                    )
                ).alias("rank"),
            )
        # truncate lineage; lazy → materializes on the final action
        # only. checkpoint_dir swaps every checkpoint_every-th cut for
        # a reliable DFS checkpoint (executor-loss recovery at scale —
        # see operators/checkpointing.py).
        ranks = cut_lineage(
            ranks, it, checkpoint_dir, checkpoint_every, eager=False
        )
    return ranks.select("node", "rank")


def triangle_counts(edges: DataFrame, broadcast_edges: int = 5_000_000) -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient
    over an undirected edge set (columns ``u``, ``v`` with u < v,
    distinct) — the standard cohesion/spam-farm signal for link
    graphs (triangle-free spam clusters vs dense organic communities).

    Scale shape — degree-ordered orientation (Cohen's MapReduce
    triangle algorithm / cf. Suri & Vassilvitskii 2011): every edge
    is directed toward its HIGHER (degree, id) endpoint, so wedges are
    only generated at each triangle's lowest-degree vertex — total
    wedge volume is O(m^1.5) regardless of skew (a star graph emits
    zero wedges at the hub), vs O(Σ deg²) for the naive wedge join.
    Three shuffles total: degree aggregate, wedge self-join on the
    oriented source, closing-edge equi-join. Counts are exact
    integers; the coefficient is one double division of exact ints
    (2·tri / deg·(deg−1)), NULL for degree ≤ 1 nodes.

    Returns (node, degree, n_triangles, clustering).
    """
    # r07 (guide §2.4/§3.1): settle the reused subtrees — ``edges``
    # feeds the degree aggregate and both attach joins, ``deg`` feeds
    # the two attaches + the final output join, ``oriented`` feeds
    # both wedge sides + the closing edge set; each was re-derived per
    # consumer. The edge count (one scalar) gates broadcasting the
    # closing side so the Σ-outdeg² wedge stream is filtered through a
    # broadcast hash probe instead of being exchanged + sorted for a
    # sort-merge semi-join; beyond broadcast reach the shuffle join
    # stays. Results identical either way.
    edges = edges.localCheckpoint(eager=False)
    bcast = edges.count() <= broadcast_edges
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=False)
    )
    deg_u = deg.select(F.col("node").alias("u"), F.col("degree").alias("_du"))
    deg_v = deg.select(F.col("node").alias("v"), F.col("degree").alias("_dv"))
    if bcast:
        deg_u, deg_v = F.broadcast(deg_u), F.broadcast(deg_v)
    e = edges.join(deg_u, "u").join(deg_v, "v")
    u_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("_dv")).otherwise(F.col("_du")).alias("_ddst"),
    ).localCheckpoint(eager=False)
    o1 = oriented.select("src", F.col("dst").alias("a"), F.col("_ddst").alias("_da"))
    o2 = oriented.select("src", F.col("dst").alias("b"), F.col("_ddst").alias("_db"))
    # r07 note: broadcasting one wedge side (o2) + spreading o1 was
    # A/B'd and REJECTED — min JVM CPU tripled (33.7 → 100.4 s at
    # sf0.1, wall flat). For a wedge-GENERATING join the output (the
    # O(m^1.5) stream) dwarfs both inputs, and the sort-merge path
    # emits each match group as a linear merge of sorted runs, while a
    # broadcast hash probe pays a hash lookup + bucket walk PER
    # OUTPUT ROW. Broadcast stays reserved for the closing semi-join,
    # where the probe stream is consumed, not multiplied.
    wedges = o1.join(o2, "src").filter(
        (F.col("_da") < F.col("_db"))
        | ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b")))
    )
    closing = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    if bcast:
        closing = F.broadcast(closing)
    tri = wedges.join(closing, ["a", "b"], "left_semi").select("src", "a", "b")
    tn = (
        tri.select(F.explode(F.array("src", "a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(tn, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0).cast("long")).alias("n_triangles"),
        F.try_divide(
            (2 * F.coalesce("n_triangles", F.lit(0).cast("long"))).cast("double"),
            (F.col("degree").cast("long") * (F.col("degree") - 1)).cast("double"),
        ).alias("clustering"),
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    broadcast_nodes: int = 5_000_000,
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts as its own label; each round it adopts the most frequent
    label among its neighbors, ties broken by SMALLEST label — fully
    deterministic (classic async LPA is order-dependent; the sync +
    min-tie-break variant is replayable bit-for-bit by an external
    engine, same policy as pagerank's integer recurrence).

    ``edges`` must be directed-symmetrized (both (u,v) and (v,u)) and
    distinct. Per round: ONE equi-join delivering neighbor labels +
    ONE (node, label) count aggregate + a per-node argmax window over
    label candidates (bounded by the node's distinct neighbor labels,
    never the graph). Lineage is truncated per round with a lazy
    localCheckpoint. Returns (node, label) after ``iterations``
    rounds; connected regions converge toward dense-community labels.
    """
    # r07 (guide §2.4): settle the edge table once — every round joins
    # it, and a derived edge set (the co-order build) re-ran per round;
    # the initial label table is one more consumer.
    edges = edges.localCheckpoint(eager=False)
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    # One scalar to the driver decides the per-round join strategy:
    # label tables are node-sized, so below the threshold they are
    # BROADCAST into the edge join (post-checkpoint label tables carry
    # no stats, so the planner would otherwise sort-merge, re-sorting
    # the full edge table every round — guide §3.1). Beyond broadcast
    # reach the shuffle join is kept; results identical either way.
    bcast = labels.count() <= broadcast_nodes

    for it in range(iterations):
        label_side = labels.select(
            F.col("node").alias("dst"), F.col("label").alias("_nl")
        )
        if bcast:
            label_side = F.broadcast(label_side)
        neigh = edges.join(label_side, "dst")
        counts = neigh.groupBy("src", "_nl").agg(F.count(F.lit(1)).alias("_c"))
        # r07 (guide §2.4): the per-node argmax used to be a
        # row_number window over the counts table — a SECOND full
        # exchange plus a sort of every (src, label) row, every round.
        # (count desc, label asc) is exactly min of the struct
        # (-count, label), so a second aggregate computes it instead:
        # its exchange carries at most one partial min per (src, map
        # partition) — label-dictionary-sized, not candidate-sized —
        # and nothing is sorted. Counts are degree-bounded, so the
        # negation cannot overflow; the label value itself is never
        # negated.
        best = counts.groupBy("src").agg(
            F.min(
                F.struct((-F.col("_c")).alias("_negc"), F.col("_nl").alias("_l"))
            ).alias("_m")
        )
        labels = cut_lineage(
            best.select(F.col("src").alias("node"), F.col("_m._l").alias("label")),
            it,
            checkpoint_dir,
            checkpoint_every,
            eager=False,
        )
    return labels


def link_prediction_topk(
    edges: DataFrame, k: int = 50, max_degree: int | None = None
) -> DataFrame:
    """Common-neighbor link prediction: score NON-adjacent node pairs
    by how many neighbors they share (plus the neighborhood Jaccard
    cn/(deg_a + deg_b − cn)) and return the top-k candidates — the
    classic 'suggested connection' / missing-edge audit.

    ``edges`` is undirected (u, v with u < v, distinct). Candidate
    pairs are the C(deg, 2) wedge pairs at each node, generated
    map-side from per-node sorted neighbor arrays — the same O(Σ deg²)
    work as the classic wedge self-join, minus the join itself. For
    skewed graphs pass ``max_degree`` to drop hub wedge-centers: a
    node with degree d emits d² candidate pairs, and one celebrity hub
    dominates both the shuffle and the scores while carrying almost no
    signal (everyone 'shares' the hub). With the cap, hubs still count
    toward node degrees (the Jaccard denominator stays exact); they
    just stop generating wedges, bounding the fan-out at max_degree²
    per node. An anti join removes existing edges, and a TakeOrdered
    cut keeps the top-k by (common_neighbors desc, id_a, id_b) — fully
    deterministic. Returns (id_a, id_b, common_neighbors, jaccard).

    NOTE: calling this function triggers computation (the packed-key
    gate collects a min/max scalar off the adjacency table, which also
    materializes the checkpointed edge/adjacency state) — it is not a
    lazy plan builder, same contract as the count-gated iterative
    operators in this module.
    """
    from datalake_etlscripts_spark.functions.scalar import (
        ordered_pairs,
        ordered_pairs_packed,
    )

    # r07 (guide §2.3-2.4): the wedge SELF-JOIN (adj ⋈ adj on the
    # shared neighbor) materialized Σ deg²/2 join rows through a
    # sort-merge before the pair aggregate — at sf0.1 that is 148M
    # wedge rows for 101M candidate pairs. The rewrite builds each
    # node's sorted neighbor array once and emits its C(deg, 2)
    # wedge pairs MAP-SIDE (ordered_pairs), feeding partial
    # aggregation directly: one exchange (the unavoidable pair
    # aggregate) instead of three. Per-row fan-out is deg²-bounded —
    # callers with hub-skewed graphs pass max_degree exactly as
    # before (here it simply filters the arrays).
    edges = edges.localCheckpoint(eager=False)  # reused by anti-join below
    adj = edges.select(F.col("u").alias("x"), F.col("v").alias("n")).unionAll(
        edges.select(F.col("v").alias("x"), F.col("u").alias("n"))
    )
    # The node-keyed repartition BEFORE the aggregate does double duty
    # (guide §2.4/§2.5): groupBy reuses its partitioning (no second
    # exchange), and — because an explicit repartition is exempt from
    # AQE coalescing — the tiny-in-bytes array table stays spread over
    # the cluster, so the deg²-heavy explode below runs wide instead
    # of on the 1-2 partitions AQE would coalesce a ~20 MB table to.
    n_spread = adj.sparkSession.sparkContext.defaultParallelism * 2
    adjarr = (
        adj.repartition(n_spread, "x")
        .groupBy("x")
        .agg(F.array_sort(F.collect_list("n")).alias("_nbrs"))
        .localCheckpoint(eager=False)  # feeds the explode + both deg broadcasts
    )
    # degree is just the array length — the separate degree aggregate
    # (one more exchange over the adjacency table) is gone.
    deg = adjarr.select("x", F.size("_nbrs").cast("long").alias("deg"))
    wedge_arr = adjarr
    if max_degree is not None:
        wedge_arr = adjarr.filter(F.size("_nbrs") <= max_degree)
    # r07 (guide §2.3: narrower shuffle keys): when every node id fits
    # in 31 bits (one scalar off the settled adjacency table decides),
    # a candidate pair rides the whole explode → count → anti-join →
    # TakeOrdered chain as ONE packed BIGINT (id_a·2³² + id_b) instead
    # of a two-long struct: the wedge arrays are primitive long arrays
    # (no per-element struct allocation in the deg²-sized explode), the
    # pair aggregate hashes 8 key bytes instead of a 16-byte row, and
    # the exchange ships one column. id_a,id_b < 2³¹ makes the packing
    # a bijection with (id_a, id_b) lexicographic order == packed
    # numeric order, so the cut is identical; ids are unpacked on the
    # k surviving rows. Wider ids keep the struct path — same result.
    # r08 (guide §5 memory/spill + §2.5): the pair aggregate's reduce
    # width was spark.sql.shuffle.partitions (= cores locally) — a
    # CONSTANT, so per-task group state grows linearly with data and
    # the hash aggregate tips into sort/spill at scale (measured on
    # the 3× disjoint-copy scale-up: min JVM CPU 274 s at sf0.1 →
    # 1705 s, 6.2× for 3× the wedges). The wedge-count scalar below
    # sizes an explicit (AQE-exempt) pair-keyed repartition so each
    # reduce task aggregates ~3M wedge rows (~2M groups ≈ 100 MB of
    # hash state) regardless of data size; the groupBy reuses the
    # partitioning, so the exchange count is unchanged — the exchange
    # just moves below the aggregate (raw 8-byte keys vs 16-byte
    # partial rows: partial aggregation only reduced this stream
    # 1.46×, measured in r07).
    bounds = adjarr.agg(
        F.min(F.col("x")).alias("lo"),
        F.max(F.col("x")).alias("hi"),
        F.sum(
            F.when(
                F.lit(max_degree is None) | (F.size("_nbrs") <= F.lit(max_degree or 0)),
                F.size("_nbrs").cast("long") * (F.size("_nbrs") - 1) / 2,
            ).otherwise(F.lit(0))
        ).alias("wedges"),
    ).collect()[0]
    packable = (
        bounds["lo"] is not None
        and bounds["lo"] >= 0
        and bounds["hi"] < (1 << 31)
    )
    agg_width = max(n_spread, int((bounds["wedges"] or 0) // 3_000_000) + 1)
    if packable:
        pk = F.col("_pk")
        cand = (
            wedge_arr.select(
                F.explode(ordered_pairs_packed(F.col("_nbrs"))).alias("_pk")
            )
            .repartition(agg_width, "_pk")
            .groupBy("_pk")
            .agg(F.count(F.lit(1)).alias("common_neighbors"))
            .join(
                F.broadcast(
                    edges.select(
                        (F.col("u") * F.lit(1 << 32) + F.col("v")).alias("_pk")
                    )
                ),
                ["_pk"],
                "left_anti",
            )
        )
        top = (
            cand.orderBy(F.desc("common_neighbors"), pk)
            .limit(k)
            .select(
                F.expr(f"_pk div {1 << 32}").alias("id_a"),
                F.expr(f"_pk % {1 << 32}").alias("id_b"),
                "common_neighbors",
            )
        )
    else:
        cand = (
            wedge_arr.select(F.explode(ordered_pairs(F.col("_nbrs"))).alias("_p"))
            .select(F.col("_p.x").alias("id_a"), F.col("_p.y").alias("id_b"))
            .repartition(agg_width, "id_a", "id_b")
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("common_neighbors"))
            .join(
                F.broadcast(
                    edges.select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
                ),
                ["id_a", "id_b"],
                "left_anti",
            )
        )
        # r07 (guide §1.2/§2.3): top-k membership is decided by
        # (common_neighbors desc, id_a, id_b) ALONE — the jaccard column
        # does not participate in the ordering — so the TakeOrdered cut
        # runs on the bare pair counts and the two degree attaches probe
        # k rows instead of every candidate pair (~101M at sf0.1; two
        # broadcast-hash probes plus a wide projection over the full
        # candidate set, all discarded by the cut).
        top = cand.orderBy(
            F.desc("common_neighbors"), F.col("id_a"), F.col("id_b")
        ).limit(k)
    scored = (
        top.join(
            F.broadcast(
                deg.select(F.col("x").alias("id_a"), F.col("deg").alias("_da"))
            ),
            "id_a",
        )
        .join(
            F.broadcast(
                deg.select(F.col("x").alias("id_b"), F.col("deg").alias("_db"))
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "common_neighbors",
            (
                F.col("common_neighbors").cast("double")
                / (F.col("_da") + F.col("_db") - F.col("common_neighbors")).cast("double")
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.desc("common_neighbors"), F.col("id_a"), F.col("id_b")
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    broadcast_edges: int = 5_000_000,
) -> DataFrame:
    """k-core decomposition by synchronous peeling: each round drops
    every node whose degree in the CURRENT subgraph is < k, then the
    edges touching dropped nodes. With ``rounds=None`` peels to the
    true fixpoint (driver checks one scalar per round — the node
    count); with ``rounds=N`` runs exactly N synchronous rounds, the
    replayable form an external engine can unroll as chained CTEs.

    ``edges`` must be directed-symmetrized and distinct (same contract
    as label_propagation). Per round: ONE degree aggregate + two semi
    joins pruning the edge table — shuffle linear in surviving edges;
    lineage truncated per round with a lazy localCheckpoint. Peeling
    round count is bounded by the peel depth (tiny for web-ish
    graphs), not the diameter. Returns (node, degree) of the k-core
    subgraph.
    """
    # settle the incoming edge set: round 0's degree aggregate and
    # its two pruning semi-joins each re-derive the caller's edge
    # build (for the registered query that is a weight-filtered
    # basket self-join + symmetrizing union) before the first
    # cut_lineage kicks in (guide §2.4). Lazy: materializes inside
    # the first action.
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    # r07 (guide §3.1): the surviving-node set is node-sized and
    # stats-less, so both pruning semi-joins sort-merge-joined —
    # re-exchanging AND re-sorting the edge table twice per round.
    # One scalar gates broadcasting it; the probe stream SHRINKS
    # through a semi-join, so the wedge-join broadcast rejection does
    # not apply. Beyond broadcast reach the shuffle joins stay.
    bcast = e.count() <= broadcast_edges
    i = 0
    prev_nodes = None
    while True:
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k)
        if rounds is None:
            n = keep.count()
            if prev_nodes is not None and n == prev_nodes:
                break
            prev_nodes = n
        keep_src = keep.select("src")
        keep_dst = keep.select(F.col("src").alias("dst"))
        if bcast:
            keep_src, keep_dst = F.broadcast(keep_src), F.broadcast(keep_dst)
        e = cut_lineage(
            e.join(keep_src, "src", "left_semi").join(
                keep_dst, "dst", "left_semi"
            ),
            i,
            checkpoint_dir,
            checkpoint_every,
            eager=False,
        )
        i += 1
        if rounds is not None and i >= rounds:
            break
    return e.groupBy("src").agg(F.count(F.lit(1)).alias("degree")).filter(
        F.col("degree") >= k
    ).select(F.col("src").alias("node"), "degree")


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: tuple[int, int] = (DAMPING_NUM, DAMPING_DEN),
    scale: int = SCALE,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    broadcast_nodes: int = 5_000_000,
) -> DataFrame:
    """Personalized PageRank: random walks RESTART at the seed set
    instead of everywhere, so rank mass concentrates in the seeds'
    neighborhood — the seed-expansion primitive behind crawl-frontier
    prioritization and "find more documents like these" corpus
    growth (the quality-propagation idea behind graph-based seed
    expansion of curated URL lists).

        rank'(v) = [v ∈ S]·((den−num)·init)//den
                   + (num · Σ_{u→v} rank(u)//deg(u)) // den

    with init = scale//|S|; only seeds get teleport mass (and the
    dangling redistribution when the caller's graph has sinks — this
    implementation expects a symmetrized/sink-free edge set like
    q_graph_pagerank's, where the dangling term is structurally
    zero). Same integer contract as pagerank: 64-bit scaled ranks,
    ``div`` arithmetic, bit-replayable externally.

    Scale shape identical to pagerank: the (src, dst, deg) table
    settles once, each iteration is one equi-join + one dst aggregate;
    the seed flag is a broadcast-joined boolean. ``edges`` must be
    DISTINCT (caller contract, like dedup_shuffle="none").
    Returns (node, ppr)."""
    num, den = damping
    edges = edges.select("src", "dst")
    deg = degree_table(edges)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    seed_nodes = seeds.select(F.col(seeds.columns[0]).alias("node")).dropDuplicates()
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    flagged = nodes.join(
        F.broadcast(seed_nodes.withColumn("_seed", F.lit(True))), "node", "left"
    ).select("node", F.coalesce("_seed", F.lit(False)).alias("_seed"))
    flagged = flagged.localCheckpoint()
    edges_deg = edges.join(deg, "src").localCheckpoint()

    init = scale // n_seeds
    base = ((den - num) * init) // den
    # r07 (guide §3.1): same node-count-gated broadcast as pagerank —
    # the per-iteration rank table is node-sized and stats-less after
    # checkpoints, so the planner re-exchanged + re-sorted the settled
    # (src, dst, deg) table every iteration. Beyond broadcast reach
    # the shuffle join is kept; integer results identical either way.
    bcast = flagged.count() <= broadcast_nodes
    ranks = flagged.select(
        "node",
        "_seed",
        F.when(F.col("_seed"), F.lit(init)).otherwise(F.lit(0))
        .cast("long")
        .alias("rank"),
    )
    for it in range(iterations):
        rank_side = ranks.select(F.col("node").alias("src"), "rank")
        if bcast:
            rank_side = F.broadcast(rank_side)
        contrib = (
            edges_deg.join(rank_side, "src")
            .select(F.col("dst").alias("node"), F.expr("rank div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            flagged.join(contrib, "node", "left")
            .select(
                "node",
                "_seed",
                (
                    F.when(F.col("_seed"), F.lit(base)).otherwise(F.lit(0)).cast(
                        "long"
                    )
                    + F.expr(f"({num} * coalesce(s, CAST(0 AS BIGINT))) div {den}")
                ).alias("rank"),
            )
        )
        ranks = cut_lineage(ranks, it, checkpoint_dir, checkpoint_every, eager=False)
    return ranks.select("node", F.col("rank").alias("ppr"))


def neighborhood_hll(
    edges: DataFrame,
    radius: int = 2,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    broadcast_nodes: int = 5_000_000,
) -> DataFrame:
    """HyperBall (Boldi & Vigna): per-node r-hop neighborhood-size
    estimates from mergeable HLL register state — the graph analogue
    of the sketch rollups. Ball state per node is ≤ 256 (bucket,
    register) rows NO MATTER how large the ball grows, so the whole
    iteration is state-sized:

        B_0(v)   = {v}
        B_{i+1}(v) = B_i(v) ∪ ⋃_{(u,v)∈E} B_i(u)

    as one edges⋈state join + one (node, bucket) max-merge per round.
    Exact ball materialization is Θ(Σ|B_r(v)|) — quadratic on dense
    graphs; the registers make the effective-diameter / neighborhood-
    function question answerable at 100 TB. Estimates use the
    integer-denominator raw HLL form (sketches.hll_register_estimate);
    small balls sit below the raw estimator's valid regime — the
    DETERMINISTIC register contract, not small-n accuracy, is what the
    oracle checks (same policy as rolling_distinct_hll).

    ``edges`` must contain (src, dst) with every undirected edge in
    both directions. Returns (node, est_ball)."""
    from datalake_etlscripts_spark.operators.sketches import (
        HLL_BUCKETS,
        HLL_EST_NUM,
        HLL_WORD_BITS,
        hll_register_table,
    )

    # r07 (guide §2.3: shuffle keys/metadata, not multiplied rows):
    # the row-form state (node, bucket, register) made each round's
    # edge join emit |state(src)| rows PER EDGE — at sf0.1 round 2
    # that is ~170M rows hashed twice through the (node, bucket)
    # max-merge, and partial aggregation cannot reduce it (groups ≫
    # rows per partition). The state now rides as ONE fixed
    # 256-slot register array per node (absent bucket = register 0),
    # so the join emits exactly one row per edge and the merge is an
    # element-wise max fold: per-edge work drops from ~|state| hashed
    # row updates to one vectorized 256-lane zip_with. The register
    # VALUES are identical — the array is just the dense layout of
    # the same (bucket, register) table, and the raw-estimate
    # arithmetic below is hll_register_estimate's expression with the
    # absent-bucket term folded in (register 0 contributes 2^25
    # exactly as (m − present)·2^25 did). A node-count scalar gates
    # broadcasting the ~node-sized state into the edge join (1:1
    # output — the stream is not multiplied, so the triangles/ktruss
    # broadcast rejection does not apply). NOTE for power-law graphs:
    # the per-node merge collects deg(v) arrays before folding; a hub
    # with extreme in-degree wants a deterministic salt pre-level
    # (groupBy(node, pmod(xxhash64(src), k)) fold, then fold the k
    # partials) — not added here because it doubles the fold work and
    # every caller is degree-bounded (same policy as max_degree caps).
    #
    # r08 (guide §2.3 narrower types; VERDICT item 3): registers ride
    # as TINYINT end-to-end (values are 1..25 = HLL_WORD_BITS+1 max,
    # so the cast is lossless): the per-edge register array shrinks
    # 4→1 byte per slot through the join stage, and the checkpointed
    # state and the broadcast build shrink 4x. A REJECTED r08
    # alternative (A/B'd twice, numbers in OPTIMIZATION_r08.md):
    # augmenting the edge table with per-node self-loops + an
    # AQE-exempt dst repartition to make the 256-column max-merge
    # exchange-free — the per-round wide-row exchange it removes is
    # CHEAPER than whatever the fused single-stage plan costs here
    # (min JVM CPU 46.6 -> 72-87 s at sf0.1); the exchange also
    # splits the >100-field interpreted expression chain across two
    # shorter pipelines. Lesson: an exchange of pre-aggregated rows
    # is not automatically the expensive part of a wide-row merge.
    nodes = edges.select(F.col("src").alias("node")).dropDuplicates()
    rows0 = hll_register_table(
        nodes.withColumn("member", F.col("node")), ["node"], "member"
    )
    zero = F.array_repeat(F.lit(0).cast("tinyint"), HLL_BUCKETS)
    state = (
        rows0.groupBy("node")
        .agg(
            F.aggregate(
                F.collect_list(
                    F.struct(
                        F.col("bucket").cast("int").alias("b"),
                        F.col("register").cast("tinyint").alias("r"),
                    )
                ),
                zero,
                lambda acc, x: F.transform(
                    acc,
                    lambda v, i: F.when(
                        i == x["b"], F.greatest(v, x["r"])
                    ).otherwise(v),
                ),
            ).alias("regs")
        )
        .localCheckpoint()
    )
    bcast = state.count() <= broadcast_nodes
    e = edges.localCheckpoint()
    for i in range(1, radius + 1):
        s_side = state.select(F.col("node").alias("_sn"), "regs")
        if bcast:
            s_side = F.broadcast(s_side)
        contrib = e.join(s_side, e["src"] == F.col("_sn")).select(
            F.col("dst").alias("node"), "regs"
        )
        # element-wise max as 256 plain max() aggregate columns (the
        # transposed form) rather than a collect_list + zip_with fold:
        # max() is partially aggregable, so the exchange carries at
        # most one 256-register row per (node, map partition) instead
        # of every contributed array, and no per-group list object is
        # ever allocated (the fold variant measured 23s wall with
        # ~1.2s GC per run from list churn).
        state = (
            state.unionByName(contrib)
            .select("node", *[F.col("regs")[j].alias(f"_r{j}") for j in range(HLL_BUCKETS)])
            .groupBy("node")
            .agg(*[F.max(f"_r{j}").alias(f"_r{j}") for j in range(HLL_BUCKETS)])
            .select(
                "node",
                F.array(*[F.col(f"_r{j}") for j in range(HLL_BUCKETS)]).alias("regs"),
            )
        )
        state = cut_lineage(state, i, checkpoint_dir, checkpoint_every, eager=True)
    denom = F.expr(
        f"aggregate(regs, CAST(0 AS BIGINT), (acc, r) ->"
        f" acc + shiftleft(CAST(1 AS BIGINT), {HLL_WORD_BITS + 1} - r))"
    )
    return state.select("node", (F.lit(HLL_EST_NUM) / denom).alias("est_ball"))


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    broadcast_edges: int = 5_000_000,
) -> DataFrame:
    """Multi-source BFS hop distance (the seed-expansion /
    blast-radius primitive beside personalized_pagerank's weighted
    form): ``seeds`` (node) start at distance 0; each round expands
    the CURRENT frontier one hop and anti-joins the visited set, so
    every edge partition is touched at most ``max_hops`` times and the
    per-round join is frontier × edges, never visited × edges —
    the delta-iteration shape that keeps late rounds cheap as the
    frontier shrinks. Distances are minimal by construction (a node
    enters on the first round that reaches it). Returns (node, dist)
    for nodes within ``max_hops``. Lineage is cut per round
    (localCheckpoint; ``checkpoint_dir`` swaps in reliable
    checkpoints for executor-loss recovery at scale)."""
    # r07 (guide §2.4): every round references ``edges`` — without a
    # settle the caller's edge build re-runs once per hop.
    edges = edges.localCheckpoint(eager=False)
    # r07 (guide §3.1): frontier and visited tables are node-bounded
    # and carry no stats after the per-round checkpoint, so the
    # planner sort-merge-joined them — re-exchanging AND re-sorting
    # the full edge table every hop. One scalar decides: below the
    # threshold both per-round joins broadcast the small state side
    # and the settled edge table is only ever streamed. Beyond
    # broadcast reach the shuffle joins are kept; identical results.
    bcast = edges.count() <= broadcast_edges
    dist = seeds.select("node", F.lit(0).cast("long").alias("dist")).distinct()
    frontier = dist
    for it in range(1, max_hops + 1):
        f_side = F.broadcast(frontier) if bcast else frontier
        nxt = (
            f_side.join(edges, f_side["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(F.broadcast(dist) if bcast else dist, "node", "left_anti")
            .select("node", F.lit(it).cast("long").alias("dist"))
        )
        nxt = cut_lineage(nxt, it, checkpoint_dir, checkpoint_every, eager=False)
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist


def bfs_hops_tagged(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    broadcast_edges: int = 5_000_000,
) -> DataFrame:
    """Per-seed multi-source BFS: like ``bfs_hops`` but the state is
    keyed (seed, node), so N independent single-seed BFS runs collapse
    into ONE delta iteration — each round touches the edge table once
    instead of once per seed (guide §2.4: fewer passes), at the cost
    of a frontier ≤ N× larger. Returns (seed, node, dist) — per seed
    exactly the rows ``bfs_hops`` would return for that seed alone."""
    edges = edges.localCheckpoint(eager=False)
    # r07 (guide §3.1): same gated broadcast as bfs_hops — the
    # (seed, node) state tables are seeds×nodes-bounded and stats-less
    # after checkpoints; without the hint every hop re-exchanged and
    # re-sorted the edge table for a sort-merge join.
    bcast = edges.count() <= broadcast_edges
    dist = (
        seeds.select("seed", "node", F.lit(0).cast("long").alias("dist")).distinct()
    )
    frontier = dist
    for it in range(1, max_hops + 1):
        f_side = F.broadcast(frontier) if bcast else frontier
        nxt = (
            f_side.join(edges, f_side["node"] == edges["src"])
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(F.broadcast(dist) if bcast else dist, ["seed", "node"], "left_anti")
            .select("seed", "node", F.lit(it).cast("long").alias("dist"))
        )
        nxt = cut_lineage(nxt, it, checkpoint_dir, checkpoint_every, eager=False)
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist


def harmonic_closeness(
    edges: DataFrame,
    seeds: list[int] | tuple[int, ...],
    max_hops: int = 4,
    scale: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Bounded-depth harmonic closeness centrality for a seed set:
    H(s) = Σ_{t ≠ s, d(s,t) ≤ max_hops} 1/d(s,t) — the
    disconnected-safe closeness variant (Boldi-Vigna axioms). Kept
    EXACT by scaling: 1/d is emitted as ``scale``/d where ``scale``
    defaults to lcm(1..max_hops), so every per-node term is an exact
    integer division with zero remainder and both engines hash-match
    bit-for-bit. Returns (seed, reached, harmonic_x{scale}).

    Same delta-iteration shape as stress_centrality's forward pass:
    all seeds advance in ONE level-synchronous pass, the (seed, node)
    frontier is BROADCAST into each edge join (seeded bounded-depth
    expansion keeps it node-sized ≪ edges, so edges never shuffle),
    and the visited anti-join keeps late rounds frontier-sized. For
    cluster-scale frontiers drop the hints and the identical plan
    runs as shuffle joins (the stress_centrality fallback note)."""
    from math import lcm

    if scale is None:
        scale = lcm(*range(1, max_hops + 1))
    seeds = list(dict.fromkeys(int(s) for s in seeds))
    sess = edges.sparkSession
    dist = sess.createDataFrame(
        [(s, s) for s in seeds], "seed bigint, node bigint"
    ).select("seed", "node", F.lit(0).cast("long").alias("dist"))
    frontier = dist
    for t in range(1, max_hops + 1):
        nxt = (
            F.broadcast(frontier.select("seed", "node"))
            .join(edges, F.col("node") == edges["src"])
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(
                F.broadcast(dist.select("seed", "node")),
                ["seed", "node"],
                "left_anti",
            )
            .select("seed", "node", F.lit(t).cast("long").alias("dist"))
        )
        nxt = cut_lineage(nxt, t, checkpoint_dir, checkpoint_every, eager=False)
        dist = dist.unionByName(nxt)
        frontier = nxt
    return (
        dist.filter(F.col("dist") > 0)
        .groupBy("seed")
        .agg(
            F.count(F.lit(1)).cast("long").alias("reached"),
            F.sum(F.expr(f"{int(scale)} div dist"))
            .cast("long")
            .alias(f"harmonic_x{scale}"),
        )
    )


def stress_centrality(
    edges: DataFrame,
    seed: int | list[int] | tuple[int, ...],
    max_hops: int = 3,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Bounded-depth stress centrality from one seed (Shimbel's
    integer cousin of betweenness — Brandes' backward pass kept EXACT
    by counting paths instead of summing fractional dependencies,
    so both engines hash-match bit-for-bit):

    - forward: level-synchronous BFS accumulating σ(v) = number of
      shortest seed→v paths (sum over predecessors, one frontier×edges
      join + one keyed aggregate per level — never visited×edges);
    - backward: T(v) = Σ_{w ∈ DAG-succ(v)} (1 + T(w)) = number of
      shortest-path continuations leaving v, unrolled from the depth
      bound toward the seed (one level×edges join per step);
    - through(v) = σ(v)·T(v) = number of bounded shortest paths from
      the seed PASSING v — the load signal hubs-vs-bridges audits
      read.

    Returns (seed, node, dist, sigma, through) for every node within
    ``max_hops`` of each seed. All integers; depth bounds the rounds.
    ALL seeds advance in ONE pass — the level tables carry a seed
    column and every join/aggregate keys on (seed, node), so adding
    seeds widens the (tiny) frontier instead of multiplying the stage
    count. Frontier/level tables are BROADCAST into every edge join
    (seeded bounded-depth expansion keeps them node-sized — ≪ the
    edge table — so edges never shuffle and each level is one
    map-side join + one keyed aggregate); for cluster-scale frontiers
    drop the hints and the same plan runs as shuffle joins."""
    # dedupe, order-preserving: a repeated seed would emit two identical
    # lvl0 rows and double sigma/through for that seed at every level
    seeds = [int(seed)] if isinstance(seed, int) else list(
        dict.fromkeys(int(s) for s in seed)
    )
    # settle the edge table once: every forward level and every
    # backward step probes it (2·max_hops+ joins), and the callers
    # hand a DERIVED set (scan + distinct + symmetrize) that would
    # otherwise be rebuilt per join — broadcast-frontier joins never
    # shuffle the probe side, so no exchange exists for ReuseExchange
    # to share (guide §2.4). Lazy: materializes inside the first
    # action.
    edges = edges.localCheckpoint(eager=False)
    sess = edges.sparkSession
    lvl0 = sess.createDataFrame(
        [(s, s) for s in seeds], "seed bigint, node bigint"
    ).select("seed", "node", F.lit(1).cast("long").alias("sigma"))
    levels = [lvl0]
    visited = lvl0.select("seed", "node")
    for t in range(1, max_hops + 1):
        prev = levels[t - 1].select(
            "seed", F.col("node").alias("_p"), F.col("sigma").alias("_ps")
        )
        nxt = (
            F.broadcast(prev)
            .join(edges, F.col("_p") == edges["src"])
            .groupBy("seed", F.col("dst").alias("node"))
            .agg(F.sum("_ps").cast("long").alias("sigma"))
            .join(F.broadcast(visited), ["seed", "node"], "left_anti")
        )
        nxt = cut_lineage(nxt, t, checkpoint_dir, checkpoint_every, eager=False)
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("seed", "node"))
    # backward: continuations. Deepest level has none.
    conts = [None] * (max_hops + 1)
    conts[max_hops] = levels[max_hops].select(
        "seed", "node", F.lit(0).cast("long").alias("t")
    )
    for t in range(max_hops - 1, -1, -1):
        succ = conts[t + 1].select(
            "seed", F.col("node").alias("_w"), F.col("t").alias("_wt")
        )
        inc = (
            edges.join(F.broadcast(succ), edges["dst"] == F.col("_w"))
            .groupBy("seed", F.col("src").alias("node"))
            .agg(F.sum(F.col("_wt") + 1).cast("long").alias("_tin"))
        )
        conts[t] = (
            levels[t]
            .select("seed", "node")
            .join(F.broadcast(inc), ["seed", "node"], "left")
            .select(
                "seed",
                "node",
                F.coalesce("_tin", F.lit(0)).cast("long").alias("t"),
            )
        )
        conts[t] = cut_lineage(
            conts[t], max_hops + (max_hops - t), checkpoint_dir,
            checkpoint_every, eager=False,
        )
    out = None
    for t in range(max_hops + 1):
        part = (
            levels[t]
            .join(F.broadcast(conts[t]), ["seed", "node"])
            .select(
                "seed",
                "node",
                F.lit(t).cast("long").alias("dist"),
                "sigma",
                (F.col("sigma") * F.col("t")).cast("long").alias("through"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


def hits_scores(
    edges: DataFrame,
    rounds: int = 2,
    k: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS (Kleinberg 1999) hubs-and-authorities on a directed /
    bipartite edge set, UNNORMALIZED so every score stays an exact
    integer: with hub⁰ ≡ 1, round t computes

        auth^t(p) = Σ_{s→p} hub^{t-1}(s)ᅟᅟhub^t(s) = Σ_{s→p} auth^t(p)

    — after t rounds the scores are path COUNTS (walks of length 2t
    alternating the two sides), which order identically to the
    L2-normalized fixed-point iterate, so the top-k is the real HITS
    answer with zero float drift. Same execution discipline as
    pagerank (operators/graph.py:45): one edge⨝score join + one
    destination-keyed aggregate per half-round, scores in
    DECIMAL(38,0) (degree^(2t) growth — rounds ≤ 3 at web scale), only
    the two top-k lists reach the driver. Returns
    (side, id, score, rank) for the top-k of each side."""
    dec = "decimal(38,0)"
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("p")).distinct()
    hub = e.groupBy("s").agg(F.count(F.lit(1)).cast(dec).alias("score"))
    auth = None
    for t in range(rounds):
        if t > 0:
            hub = (
                e.join(auth, "p")
                .groupBy("s")
                .agg(F.sum("score").cast(dec).alias("score"))
            )
        auth = (
            e.join(hub.select("s", "score"), "s")
            .groupBy("p")
            .agg(F.sum("score").cast(dec).alias("score"))
        )
    def topk(df, idc, side):
        t = df.orderBy(F.desc("score"), F.asc(idc)).limit(k)
        from pyspark.sql import Window as W

        return t.select(
            F.lit(side).alias("side"),
            F.col(idc).cast("long").alias("id"),
            F.col("score").cast("string").cast("double").alias("score"),
            F.row_number()
            .over(W.orderBy(F.desc("score"), F.asc(idc)))
            .cast("int")
            .alias("rank"),
        )

    return topk(hub, "s", "hub").unionByName(topk(auth, "p", "authority"))


def sssp_rounds(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    broadcast_edges: int = 5_000_000,
) -> DataFrame:
    """Multi-source weighted shortest paths, ``rounds`` Bellman-Ford
    relaxations (bounded-hop SSSP — the weighted twin of bfs_hops):
    ``edges`` carries (src, dst, w) with non-negative integer weights,
    ``seeds`` (node) start at distance 0. Each round relaxes ONLY the
    frontier (nodes whose distance improved last round) against the
    edge set, then folds candidates into the running minimum with one
    keyed aggregate — the delta-iteration shape: late rounds touch
    shrinking frontiers, never the whole visited set. Distances after
    round t are exact minimal t-hop-bounded path weights (integers;
    no float accumulation). Returns (node, dist). Lineage cut per
    round (localCheckpoint; ``checkpoint_dir`` swaps in reliable
    checkpoints for executor-loss recovery at scale)."""
    # r07 (guide §2.4/§3.1): settle the edge table (every round joins
    # it, and a derived edge build re-ran per round) and gate the
    # per-round frontier broadcast on one edge-count scalar — the
    # frontier is node-bounded and stats-less after checkpoints, so
    # the planner re-exchanged + re-sorted the edge table every round.
    edges = edges.localCheckpoint(eager=False)
    bcast = edges.count() <= broadcast_edges
    dist = (
        seeds.select("node", F.lit(0).cast("long").alias("dist"))
        .groupBy("node")
        .agg(F.min("dist").alias("dist"))
    )
    frontier = dist
    for it in range(rounds):
        fr = frontier.select(
            F.col("node").alias("fnode"), F.col("dist").alias("fdist")
        )
        if bcast:
            fr = F.broadcast(fr)
        cand = (
            fr.join(edges, fr["fnode"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("fdist") + F.col("w")).alias("dist"),
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        merged = cut_lineage(
            merged, it, checkpoint_dir, checkpoint_every, eager=False
        )
        # frontier = nodes that are new or strictly improved this round
        frontier = (
            merged.alias("m")
            .join(
                dist.select(
                    F.col("node").alias("pnode"),
                    F.col("dist").alias("pdist"),
                ),
                F.col("node") == F.col("pnode"),
                "left",
            )
            .filter(
                F.col("pdist").isNull() | (F.col("dist") < F.col("pdist"))
            )
            .select("node", "dist")
        )
        dist = merged
    return dist


def mutual_matching(
    edges: DataFrame,
    rounds: int = 3,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Greedy maximal weighted matching by mutual-best edges — the
    classic distributed matching round (each node points at its best
    alive neighbor by (w DESC, neighbor ASC); an edge locks when both
    endpoints point at each other), repeated ``rounds`` times on the
    shrinking alive subgraph. Expects a SYMMETRIZED (src, dst, w) edge
    set. Per round: one per-src argmax window + one self-equi-join on
    the best table + two anti-joins to retire matched endpoints — all
    keyed shuffles, no pair explosion. Deterministic: the tie order
    makes every round's pointer set unique, so both engines lock the
    same edges. Returns (u, v, w, round) with u < v."""
    from pyspark.sql import Window as W

    matched = None
    alive = edges
    out = None
    for it in range(1, rounds + 1):
        wb = W.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst").asc())
        # settle: the mutual-lock self-join reads `best` twice, and
        # the pointer window would otherwise run twice per round
        # (the two sides' exchanges are keyed differently — src vs
        # the swapped pair — so ReuseExchange cannot share them).
        # Lazy: materializes inside the round's first action.
        best = (
            alive.withColumn("rn", F.row_number().over(wb))
            .filter(F.col("rn") == 1)
            .select("src", "dst", "w")
            .localCheckpoint(eager=False)
        )
        b2 = best.select(
            F.col("src").alias("b2src"), F.col("dst").alias("b2dst")
        )
        lock = (
            best.join(
                b2,
                (F.col("b2src") == F.col("dst"))
                & (F.col("b2dst") == F.col("src")),
            )
            .filter(F.col("src") < F.col("dst"))
            .select(
                F.col("src").alias("u"),
                F.col("dst").alias("v"),
                "w",
                F.lit(it).cast("int").alias("round"),
            )
        )
        lock = cut_lineage(lock, it, checkpoint_dir, checkpoint_every, eager=False)
        out = lock if out is None else out.unionByName(lock)
        nodes = lock.select(F.col("u").alias("node")).unionByName(
            lock.select(F.col("v").alias("node"))
        )
        matched = (
            nodes if matched is None else matched.unionByName(nodes)
        ).distinct()
        alive = (
            alive.join(
                matched.select(F.col("node").alias("msrc")),
                F.col("src") == F.col("msrc"),
                "left_anti",
            )
            .join(
                matched.select(F.col("node").alias("mdst")),
                F.col("dst") == F.col("mdst"),
                "left_anti",
            )
        )
        alive = cut_lineage(alive, it, checkpoint_dir, checkpoint_every, eager=False)
    return out


def _triangles_oriented(edges_uv: DataFrame, bcast: bool = False) -> DataFrame:
    """Triangle enumeration via degree-ordered orientation (the
    triangle_counts plan shape, returned as node triples): direct every
    edge toward its higher-(degree, id) endpoint, generate wedges only
    at oriented sources, close against the canonical edge set. Emits
    each triangle exactly once as canonical (a < b < c)."""
    deg = (
        edges_uv.select(F.col("u").alias("node"))
        .unionAll(edges_uv.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e = edges_uv.join(
        deg.select(F.col("node").alias("u"), F.col("degree").alias("_du")),
        "u",
    ).join(
        deg.select(F.col("node").alias("v"), F.col("degree").alias("_dv")),
        "v",
    )
    u_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("_dv")).otherwise(F.col("_du")).alias("_dd"),
    )
    o1 = oriented.select(
        "src", F.col("dst").alias("x"), F.col("_dd").alias("_dx")
    )
    o2 = oriented.select(
        "src", F.col("dst").alias("y"), F.col("_dd").alias("_dy")
    )
    wedges = (
        o1.join(o2, "src")
        .filter(
            (F.col("_dx") < F.col("_dy"))
            | ((F.col("_dx") == F.col("_dy")) & (F.col("x") < F.col("y")))
        )
        .select("src", "x", "y")
    )
    closed = wedges.join(
        F.broadcast(edges_uv) if bcast else edges_uv,
        (F.least("x", "y") == F.col("u"))
        & (F.greatest("x", "y") == F.col("v")),
        "left_semi",
    )
    t = F.array_sort(F.array("src", "x", "y"))
    return closed.select(
        t[0].alias("a"), t[1].alias("b"), t[2].alias("c")
    )


def ktruss(
    edges_uv: DataFrame,
    k: int = 4,
    rounds: int = 3,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    oriented: bool = False,
    broadcast_edges: int = 5_000_000,
) -> DataFrame:
    """k-truss peeling on an undirected edge set given in canonical
    (u < v) form: count every edge's triangle support, drop edges
    supporting < k−2 triangles, repeat. The cohesion refinement of
    k-core: cores bound DEGREE, trusses bound TRIANGLE membership, so
    trusses reject hub-spoke noise that cores keep. Returns surviving
    edges with their support at the final round's count.

    The expensive step — the ordered a<b<c wedge join (Σ outdeg² rows,
    ~50M at sf0.1) — runs ONCE, not once per round: a triangle of
    round t+1 is exactly a triangle of round t none of whose three
    edges died, so the live triangle set is maintained by a
    side-explode + semi-join against the (small) dead-edge set each
    round instead of re-joining the whole graph. Identical round
    semantics to the naive re-enumeration (the DuckDB oracle unrolls
    that form); a round that kills no edge has reached the fixpoint
    and exits early with the same result. Lineage cut per round.

    ``oriented=True`` enumerates the one-time triangle set with the
    same degree-ordered orientation triangle_counts uses (wedges only
    at each triangle's lowest-degree vertex — O(m^1.5) wedge volume
    regardless of skew) instead of the id-ordered a<b<c wedge join
    (Σ id-outdeg² rows). The triangle SET is identical either way.
    Measured A/B on the capped sf0.1 co-order graph (NOTES_r11): the
    cap makes degrees near-regular, so orientation saves only 17% of
    wedges (49.3M → 41.1M) and its two degree-attach joins + computed-
    key closing join cost more than they save (16–20s vs 13.3–14.8s)
    — id-ordered stays the default HERE. Flip ``oriented=True`` for
    power-law graphs, where id-ordering's wedge volume explodes at the
    hubs and degree-ordering's O(m^1.5) bound is the only safe shape
    (a support-threshold pre-peel was also considered: provably sound
    — k-truss edges need endpoint degree ≥ k−1 — but vacuous at k=3,
    where it is a degree ≥ 2 filter on an avg-degree-120 graph)."""
    # settle the edge table once: it feeds three wedge-join scans
    # (e1/e2/e3) below, and when the caller hands us a DERIVED edge
    # set (the co-order graph is a capped-basket self-join + distinct)
    # only the two identically-keyed exchanges get ReuseExchange'd —
    # the third (two-column closing key) re-ran the whole build
    # (guide §2.4: remove shuffles outright). Lazy: materializes
    # inside the first action.
    edges_uv = edges_uv.localCheckpoint(eager=False)
    # r07 (guide §3.1): one scalar to the driver decides the join
    # strategy for every edge-set probe below. The settled edge table
    # carries no stats, so the planner was sort-merge-joining the
    # CLOSING join — i.e. exchanging + sorting the full Σ outdeg²
    # wedge stream (~49M rows at sf0.1) to filter it against a 1.2M-row
    # edge set that fits a broadcast hash relation many times over.
    # Same guard for the per-round dead-edge semi-joins (dead ⊆ edges).
    # Beyond broadcast reach everything stays sort-merge; results are
    # identical either way.
    #
    # r08 (guide §2.3; VERDICT item 6): when every node id fits in
    # 31 bits (one scalar agg decides — the same gate
    # link_prediction_topk uses), every edge key — the closing probe,
    # the per-round support aggregate, and the dead-edge semi-join —
    # rides as ONE packed BIGINT u·2³² + v (bijective;
    # order-irrelevant here: only equality is used), so the Σ outdeg²
    # probe stream hashes 8 key bytes instead of a two-long row.
    # Ids outside [0, 2³¹) keep the r07 shape — identical triangle
    # set and support counts either way. A/B at sf0.1 (min wall /
    # min JVM CPU, within-window): 17.1/135 -> 7.1/52 s, and vs the
    # best HEAD window 10.1/78 still 1.4x/1.5x. The VERDICT-item-6
    # MAP-SIDE wedge variant (lower x upper neighbor-array cross
    # product with an AQE-exempt spread, the link_prediction shape)
    # was built and REJECTED a third time: 8.3 wall / 102 CPU vs
    # variant-(a)'s 7.1/52 — the interpreted nested-transform explode
    # (higher-order functions are CodegenFallback, every packed long
    # boxed) costs more than the SMJ merge it replaces; link
    # prediction won with it only because it ALSO deleted a
    # 148M-row join intermediate, which ktruss's e1-e2 join does not
    # materialize.
    stats = edges_uv.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("u").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    bcast = (stats["n"] or 0) <= broadcast_edges
    packable = (
        not oriented
        and stats["lo"] is not None
        and stats["lo"] >= 0
        and stats["hi"] < (1 << 31)
    )
    P32 = F.lit(1 << 32)
    u_t = dict(edges_uv.dtypes)["u"]
    v_t = dict(edges_uv.dtypes)["v"]
    if oriented:
        tri = _triangles_oriented(edges_uv, bcast=bcast).localCheckpoint(eager=False)
    else:
        e1 = edges_uv.select(F.col("u").alias("a"), F.col("v").alias("b"))
        e2 = edges_uv.select(F.col("u").alias("b2"), F.col("v").alias("c2"))
        e3 = edges_uv.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
        if bcast:
            # r07 note: additionally broadcasting the wedge join's
            # middle side (e2) was A/B'd and REJECTED — min JVM CPU
            # doubled (86.8 → 197.6 s at sf0.1): a wedge-generating
            # join pays the broadcast hash probe per OUTPUT row
            # (Σ outdeg² of them) where sort-merge emits match groups
            # as a linear merge (same finding as triangle_counts).
            # Broadcast stays on the closing side only.
            e3 = F.broadcast(e3)
        if packable:
            # packed closing key: the SMJ wedge stream probes ONE
            # 8-byte key instead of a two-column (least, greatest) row
            epk = edges_uv.select((F.col("u") * P32 + F.col("v")).alias("_ac"))
            tri = (
                e1.join(e2, F.col("b") == F.col("b2"))
                .withColumn("_ac", F.col("a") * P32 + F.col("c2"))
                .join(F.broadcast(epk) if bcast else epk, "_ac", "left_semi")
                .select("a", "b", F.col("c2").alias("c"))
                .localCheckpoint(eager=False)
            )
        else:
            tri = (
                e1.join(e2, F.col("b") == F.col("b2"))
                .join(
                    e3,
                    (F.col("a") == F.col("a3")) & (F.col("c2") == F.col("c3")),
                )
                .select("a", "b", F.col("c2").alias("c"))
                .localCheckpoint(eager=False)
            )

    if packable:
        # r08: the three side keys of a triangle ride as packed
        # BIGINTs (only equality is ever used on them), so the
        # support aggregate and the dead-edge semi-join hash one
        # 8-byte key per row instead of a two-long row
        def _sides(t: DataFrame) -> DataFrame:
            return t.select(
                "a",
                "b",
                "c",
                F.explode(
                    F.array(
                        F.col("a") * P32 + F.col("b"),
                        F.col("b") * P32 + F.col("c"),
                        F.col("a") * P32 + F.col("c"),
                    )
                ).alias("_e"),
            )

        side_keys = ["_e"]
    else:
        def _sides(t: DataFrame) -> DataFrame:
            return t.select(
                "a",
                "b",
                "c",
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                        F.struct(F.col("b").alias("u"), F.col("c").alias("v")),
                        F.struct(F.col("a").alias("u"), F.col("c").alias("v")),
                    )
                ).alias("e"),
            ).select("a", "b", "c", "e.u", "e.v")

        side_keys = ["u", "v"]

    supp = None
    for it in range(rounds):
        supp = (
            _sides(tri)
            .groupBy(*side_keys)
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
            .localCheckpoint(eager=False)
        )
        if it == rounds - 1:
            break
        dead = supp.filter(F.col("support") < k - 2).select(*side_keys)
        # fixpoint: no edge died → every later round is identical
        if dead.isEmpty():
            break
        dead_tri = (
            _sides(tri)
            .join(F.broadcast(dead) if bcast else dead, side_keys, "left_semi")
            .select("a", "b", "c")
            .distinct()
        )
        tri = cut_lineage(
            tri.join(dead_tri, ["a", "b", "c"], "left_anti"),
            it,
            checkpoint_dir,
            checkpoint_every,
            eager=False,
        )
    out = supp.filter(F.col("support") >= k - 2)
    if packable:
        return out.select(
            F.shiftright("_e", 32).cast(u_t).alias("u"),
            F.col("_e").bitwiseAND(F.lit((1 << 32) - 1)).cast(v_t).alias("v"),
            "support",
        )
    return out.select("u", "v", "support")
