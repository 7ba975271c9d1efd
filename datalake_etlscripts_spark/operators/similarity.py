"""Similarity search over embedding columns (ARRAY<FLOAT>).

Two paths:

- brute-force cosine top-k: exact baseline. The query set is small →
  broadcast it; each partition of the corpus scores locally, then a
  per-query top-k window. Shuffle = corpus × 0 (broadcast) + one
  top-k aggregation — the right shape when |queries| ≪ |corpus|.
- LSH-bucketed ANN (random hyperplane signatures): corpus hashed once
  to b-bit signatures; candidates = same-bucket (multi-probe via
  bands), exact cosine only on candidates. The 100 TB path: turns the
  n×m cross product into equi-joins.

Dot products run in F.aggregate folds over zip_with — JVM-side, no
Python. An IVF variant (k-means coarse quantizer) would slot in the
same candidate-generation seam; LSH chosen because it needs no
training pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left fold → deterministic, engine-independent sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.
    Returns (query_id, neighbor_id, cos_sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _rh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane b-bit signature (sign of ⟨v, plane_i⟩)."""
    bits = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits = bits + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return bits


def random_planes(dim: int, bits: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG; no numpy RNG state
    so the plan is reproducible across sessions)."""
    state = seed
    planes = []
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sig_bits: int = 16,
    band_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets (banded →
    multi-probe) generate candidates; exact cosine re-ranks them.
    Returns (query_id, neighbor_id, cos_sim, rank) — rank within
    retrieved candidates."""
    planes = random_planes(dim, sig_bits)
    n_bands = sig_bits // band_bits
    mask = (1 << band_bits) - 1

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        sig = _rh_signature(F.col(vec_col), planes)
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"_{prefix}v"),
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(sig, b * band_bits).bitwiseAND(F.lit(mask))
                        for b in range(n_bands)
                    ]
                )
            ).alias("band", "bucket"),
        )

    c = banded(corpus, "neighbor")
    q = banded(queries, "query")
    cand = (
        c.join(q, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_queryv", "_neighborv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_queryv"), F.col("_neighborv")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iterations: int = 5,
    sample: int = 2048,
    seed: int = 7,
) -> list[list[float]]:
    """Tiny driver-side Lloyd's k-means over a bounded sample — the
    cheap quantizer bootstrap for IVF. The sample (not the corpus)
    comes to the driver; assignment of the full corpus stays
    distributed. When cluster quality matters, train with
    kmeans_train_distributed (full-corpus iterations) and pass the
    result via the ``centroids`` parameter of ivf_ann_topk /
    semantic_dedup."""
    rows = (
        corpus.select(vec_col)
        .sample(False, 1.0, seed=seed)
        .limit(sample)
        .collect()
    )
    vecs = [list(map(float, r[0])) for r in rows]
    if not vecs:
        raise ValueError("empty corpus")
    # deterministic init: evenly spaced sample points
    step = max(1, len(vecs) // k)
    cents = [vecs[i * step % len(vecs)] for i in range(k)]
    for _ in range(iterations):
        sums = [[0.0] * len(vecs[0]) for _ in range(k)]
        counts = [0] * k
        for v in vecs:
            best, best_d = 0, float("inf")
            for ci, c in enumerate(cents):
                d = sum((a - b) * (a - b) for a, b in zip(v, c))
                if d < best_d:
                    best, best_d = ci, d
            counts[best] += 1
            for j, a in enumerate(v):
                sums[best][j] += a
        cents = [
            [s / c for s in sums[i]] if (c := counts[i]) else cents[i]
            for i in range(k)
        ]
    return cents


def _nearest_centroids(vec: Column, centroids: list[list[float]], n: int) -> Column:
    """Array of the n nearest centroid ids (sq-distance argsort)."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(x) for x in c]),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(ci).alias("cid"),
            )
            for ci, c in enumerate(centroids)
        ]
    )
    return F.slice(F.transform(F.array_sort(scored), lambda s: s["cid"]), 1, n)


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 3,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus rows are assigned to their
    nearest centroid once (one narrow pass); each query probes its
    ``n_probe`` nearest cells and scores only those candidates with
    exact cosine. Candidates come from an equi-join on the cell id —
    the same linear-shuffle shape as LSH, but with a trained quantizer
    (better recall on clustered data). Returns (query_id, neighbor_id,
    cos_sim, rank).

    ``centroids`` overrides the trained quantizer with fixed literal
    cell centers — an external engine can then replay assignment,
    probing, and scoring bit-for-bit (the oracle-checkable variant;
    production default stays the trained k-means quantizer)."""
    cents = centroids if centroids is not None else kmeans_centroids(
        corpus, vec_col, k=n_centroids
    )
    c = ivf_corpus_cells(corpus, cents, id_col, vec_col)
    return ivf_topk_from_cells(c, queries, cents, k, n_probe, id_col, vec_col)


def ivf_corpus_cells(
    corpus: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The corpus side of ``ivf_ann_topk`` — every vector assigned to
    its nearest cell ONCE. Exposed (r07, guide §2.4) so probe sweeps
    (ann_ivf_nprobe_sweep: n_probe ∈ {1,2,4}) settle this table and
    reuse it per probe count: n_probe only changes how many cells a
    QUERY opens, never the corpus assignment."""
    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.element_at(_nearest_centroids(F.col(vec_col), cents, 1), 1).alias("cell"),
    )


def ivf_topk_from_cells(
    c: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe + score stage of ``ivf_ann_topk`` over an
    already-assigned ``ivf_corpus_cells`` table."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(_nearest_centroids(F.col(vec_col), cents, n_probe)).alias("cell"),
    )
    cand = c.join(q, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized twin of brute_force_topk: the query block broadcasts
    into a mapInPandas stage that scores each corpus batch with one
    numpy matmul (Arrow in, BLAS inside) — the high-throughput path
    when expression-folded dot products become the bottleneck. Not
    bit-identical to the fold version (BLAS reassociates the sums), so
    it backs the bench/scale path rather than the oracle query."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    qm = np.array([list(map(float, r[1])) for r in q_rows])
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            cm = np.array(pdf[vec_col].tolist(), dtype=float)
            cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cn @ qn.T  # (corpus_batch, n_queries)
            out = {
                "query_id": np.repeat(q_ids, len(pdf)),
                "neighbor_id": np.tile(pdf[id_col].values, len(q_ids)),
                "cos_sim": sims.T.reshape(-1),
            }
            yield pd.DataFrame(out)

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id bigint, neighbor_id bigint, cos_sim double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans_train_distributed(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iterations: int = 5,
    init_centroids: list[list[float]] | None = None,
    id_col: str | None = None,
) -> list[list[float]]:
    """Distributed Lloyd's k-means: the FULL corpus participates in
    every iteration (removing kmeans_centroids' bounded-sample cap —
    that one exists for cheap quantizer bootstraps; this one is the
    trainer you run when cluster quality matters at 100 TB).

    Per iteration: one corpus pass — argmin cell assignment against
    broadcast centroid literals, then per-(cell, dim) sum/count via
    posexplode + one shuffle of k x dim aggregate rows. Only the k x
    dim centroid matrix ever reaches the driver. Empty cells keep
    their previous centroid (standard Lloyd's degeneracy handling).
    Deterministic given init (same data, same partitioning modulo
    float-sum reassociation — the usual distributed-kmeans caveat);
    init defaults to the k lowest-id vectors, which is fully
    deterministic."""
    # each iteration is a collect() action over the corpus — persist
    # so upstream lineage (filters/joins/normalization) runs once, not
    # once per iteration
    corpus = corpus.select(*corpus.columns).persist()
    try:
        first = corpus.select(vec_col).first()
        if first is None:
            raise ValueError("empty corpus")
        dim = len(first[0])

        if init_centroids is not None:
            cents = [list(map(float, c)) for c in init_centroids]
        else:
            if id_col is None:
                others = [c for c in corpus.columns if c != vec_col]
                if not others:
                    raise ValueError(
                        "default seeding orders by an id column — pass id_col"
                        " or init_centroids when the corpus has only the"
                        " vector column"
                    )
                id_col = others[0]
            rows = corpus.orderBy(id_col).select(vec_col).limit(k).collect()
            cents = [list(map(float, r[0])) for r in rows]
        if len(cents) < k:
            raise ValueError(f"need >= {k} vectors to seed {k} centroids")

        return _lloyd_iterations(corpus, vec_col, k, iterations, cents, dim)
    finally:
        corpus.unpersist()


def _lloyd_iterations(
    corpus: DataFrame,
    vec_col: str,
    k: int,
    iterations: int,
    cents: list[list[float]],
    dim: int,
) -> list[list[float]]:
    for _ in range(iterations):
        # two selects: mixing the struct-sorting assignment expression
        # with a generator in ONE projection makes Catalyst's generator
        # rewrite drop the struct field aliases (FIELD_NOT_FOUND)
        cells = corpus.select(
            F.element_at(_nearest_centroids(F.col(vec_col), cents, 1), 1).alias(
                "_cell"
            ),
            F.col(vec_col).alias("_v"),
        )
        assigned = cells.select("_cell", F.posexplode("_v").alias("_dim", "_x"))
        stats = (
            assigned.groupBy("_cell", "_dim")
            .agg(
                F.sum(F.col("_x").cast("double")).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        )
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for r in stats:
            sums.setdefault(r["_cell"], [0.0] * dim)[r["_dim"]] = r["_s"]
            counts[r["_cell"]] = r["_n"]
        cents = [
            [s / counts[ci] for s in sums[ci]] if ci in counts else cents[ci]
            for ci in range(k)
        ]
    return cents


def project_vectors(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-projection (Johnson-Lindenstrauss) dimensionality
    reduction: out_j = <x, plane_j> for the fixed literal ``planes``
    (random_planes supplies deterministic LCG rows — no RNG state, so
    any engine regenerates the same matrix). Pairwise distances are
    preserved within (1±ε) at target_dim = O(log n / ε²); downstream
    ANN then folds over target_dim instead of dim — the standard
    cheapening step before billion-scale similarity search.

    Per-row expressions only (one left-fold per output dim), no
    shuffle, no UDF. Returns (id, proj ARRAY<DOUBLE>)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), v.alias("_v"))
    projs = [
        F.aggregate(
            F.zip_with(
                F.col("_v"),
                F.array(*[F.lit(float(x)) for x in p]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for p in planes
    ]
    return base.select(id_col, F.array(*projs).alias("proj"))


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column —
    the storage/serving compression step (17x smaller than FLOAT at
    dim 64 with one double of scale per vector). q_i = floor(x_i·127 /
    amax + 0.5) — floor(x+0.5), NOT round(): banker's-rounding
    semantics differ across engines, floor does not. amax = max |x_i|;
    an all-zero vector quantizes to zeros.

    Per-row expressions, no shuffle. Returns (id, amax, qvec
    ARRAY<BIGINT>, and the original _v ARRAY<DOUBLE> for callers that
    verify reconstruction error)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), v.alias("_v")).withColumn(
        "_amax", F.array_max(F.transform(F.col("_v"), F.abs))
    )
    qvec = F.when(
        F.col("_amax") > 0,
        F.transform(
            F.col("_v"),
            lambda x: F.floor(x * F.lit(127.0) / F.col("_amax") + F.lit(0.5)),
        ),
    ).otherwise(F.transform(F.col("_v"), lambda x: F.lit(0).cast("long")))
    return base.select(
        id_col,
        F.col("_amax").alias("amax"),
        qvec.alias("qvec"),
        "_v",
    )


def knn_label_vote(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN classification by neighbor majority vote — the standard
    embedding-quality / label-noise audit (predict each query's label
    from its k nearest corpus neighbors, excluding itself, and compare).
    Composes brute_force_topk (or any ANN variant with the same output
    contract) with a per-query vote: argmax neighbor-label count, ties
    broken by (count desc, label asc) so the verdict is deterministic.
    No float aggregation anywhere — votes are integer counts, so the
    result is partitioning-independent without decimal gymnastics.
    Returns (query_id, true_label, pred_label, votes)."""
    nn = brute_force_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("_nl")
    )
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "_nl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    # asc_nulls_last: DuckDB's ASC is NULLS LAST — a NULL corpus label
    # must never beat a real label on ties in one engine only
    w = W.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("_nl").asc_nulls_last()
    )
    best = (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("query_id", F.col("_nl").alias("pred_label"), "votes")
    )
    truth = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("true_label")
    )
    return best.join(truth, "query_id").select(
        "query_id", "true_label", "pred_label", "votes"
    )


def pq_codebooks(
    dim: int, m: int = 8, k: int = 16, seed: int = 13
) -> list[list[list[float]]]:
    """Deterministic literal PQ codebooks: m sub-quantizers of
    dim/m-dimensional centroids, k centroids each (LCG-derived like
    random_planes — reproducible across sessions and replayable by an
    external engine). Production would train them with k-means per
    subspace (kmeans_train_distributed on the sliced corpus); the
    fixed literals are the oracle-checkable variant, same policy as
    the IVF quantizer."""
    sub = dim // m
    return [random_planes(sub, k, seed=seed + 97 * j) for j in range(m)]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011): each vector
    becomes m small codes — argmin-L2 against each subspace codebook,
    ties broken by lowest code. Pure per-row expressions (no shuffle,
    no UDF): the codebooks are literal arrays folded in fixed index
    order, so assignment is bit-deterministic in any engine. A 64-dim
    float vector (256 bytes) compresses to m bytes — the memory shape
    that makes billion-vector ANN fit a cluster.

    Returns the input plus ``codes ARRAY<INT>``."""
    sub = len(codebooks[0][0])
    m = len(codebooks)
    # project every subvector ONCE: inlining the slice into each of the
    # m×k distance folds re-evaluates it k times per subspace (the
    # expression-in-lambda re-evaluation trap; measured ~2× on encode)
    out = df.select(
        "*", *[F.slice(F.col(vec_col), j * sub + 1, sub).alias(f"_sub{j}") for j in range(m)]
    )
    codes = []
    for j, cb in enumerate(codebooks):
        sv = F.col(f"_sub{j}")
        # per-centroid left folds (NOT unrolled element_at chains: an
        # A/B showed the 1024-term scalar expansion collapses the _sub
        # projections back into m×k slice copies and lands ~2× slower)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sv,
                        F.array(*[F.lit(x) for x in c]),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in cb
            ]
        )
        # argmin with first-occurrence (= lowest code) tie-break: the
        # min is bit-identical to one element, so equality is exact
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias(f"_c{j}")
        )
    return out.withColumn("codes", F.array(*codes)).drop(
        *[f"_sub{j}" for j in range(m)]
    )


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: corpus vectors are encoded
    ONCE to m-byte codes; each query scores candidates against the
    RECONSTRUCTED centroids (query side stays full-precision — the
    asymmetric variant loses half the quantization error of
    symmetric). Distance = one ordered fold over the reconstruction,
    bit-deterministic.

    Scale shape: the m·k centroid tables are plan literals; the scored
    side is a broadcast nested-loop of the (small) query block against
    the code table — same shape as brute_force_topk but touching
    m-byte codes instead of full vectors (the memory-bound win). A
    production variant would precompute the per-query m×k distance
    table; at expression level the reconstruction fold is the same
    arithmetic, kept explicit for oracle replay.

    Returns (query_id, neighbor_id, adc_dist, rank)."""
    sub = len(codebooks[0][0])
    enc = pq_encode(corpus, codebooks, id_col, vec_col)
    recon_parts = []
    for j, cb in enumerate(codebooks):
        table = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cb])
        recon_parts.append(F.element_at(table, F.col("codes")[j] + 1))
    recon = F.concat(*recon_parts)
    c = enc.select(
        F.col(id_col).alias("neighbor_id"), recon.alias("_rv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(
                    F.col("_qv"),
                    F.col("_rv"),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc_dist"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dist"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_centroid_drift(
    df: DataFrame,
    label_col: str,
    half_col,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label embedding drift between two data halves: the cosine
    between each half's SUM vector (cosine is scale-invariant, so the
    sum stands in for the mean with no division). The audit for "did
    this class's representation move between snapshots/batches" —
    drift pair #3 beside the value trend and the distribution drift.

    Determinism: per-dimension sums accumulate in DECIMAL(30,21),
    reached by parsing each float's SHORTEST-REPR STRING — both
    engines emit identical repr digits for a float and parse them to
    the identical decimal, where a direct double→decimal cast is NOT
    correctly rounded in DuckDB (measured: ~1% of casts off by one
    final digit). Decimal sums are partition-order-independent; the
    cosine then folds the per-dim sums IN DIMENSION ORDER as doubles.
    Shape: one posexplode → one (label, half, dim) aggregate
    (64·labels·2 rows) → dictionary-sized collects.
    Returns (label, n_a, n_b, drift_cosine).
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        half_col.alias("_half"),
        F.posexplode(F.col(vec_col)).alias("_dim", "_v"),
    )
    sums = exploded.groupBy("label", "_half", "_dim").agg(
        F.sum(F.col("_v").cast("string").cast("decimal(30,21)")).alias("_s")
    )
    vecs = sums.groupBy("label", "_half").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_dim", "_s"))),
            lambda s: s["_s"].cast("double"),
        ).alias("_vec")
    )
    counts = df.groupBy(F.col(label_col).alias("label"), half_col.alias("_half")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    halves = vecs.join(counts, ["label", "_half"])
    a = halves.filter(F.col("_half") == 0).select(
        "label", F.col("_vec").alias("_va"), F.col("_n").alias("n_a")
    )
    b = halves.filter(F.col("_half") == 1).select(
        "label", F.col("_vec").alias("_vb"), F.col("_n").alias("n_b")
    )
    return a.join(b, "label").select(
        "label",
        "n_a",
        "n_b",
        cosine(F.col("_va"), F.col("_vb")).alias("drift_cosine"),
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the k
    most cosine-similar corpus items with a DIFFERENT label — the
    near-miss negatives that make embedding models actually learn
    boundaries (the batch shape behind triplet/InfoNCE data prep).

    Same scale contract as brute_force_topk: the query block
    broadcasts (correct when |queries| ≪ |corpus|), the corpus streams
    once, per-query top-k rides a bounded window; the LSH/IVF
    candidate generators compose in front when queries grow.
    Returns (query_id, query_label, neighbor_id, neighbor_label,
    cos_sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("_cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("query_label") != F.col("neighbor_label"))
        )
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def label_outliers(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
) -> DataFrame:
    """Label-noise audit (Confident-Learning shape): each vector's
    cosine to its OWN label's centroid; the k least-similar members
    per label are the mislabel suspects a human reviews before
    training. Centroid = per-label SUM vector (cosine is
    scale-invariant) with the same decimal-exact per-dimension
    accumulation as embedding_centroid_drift — order-independent and
    externally replayable; the per-row cosine folds in dimension
    order.

    Shape: one posexplode → one (label, dim) aggregate (labels × dims
    rows — dictionary-sized) → broadcast centroids back onto the
    corpus → per-label bottom-k window over a corpus-linear scan.
    Returns (id, label, n_label, centroid_cos, rank).
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("_dim", "_v"),
    )
    sums = exploded.groupBy("label", "_dim").agg(
        F.sum(F.col("_v").cast("string").cast("decimal(30,21)")).alias("_s")
    )
    cents = sums.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_dim", "_s"))),
            lambda s: s["_s"].cast("double"),
        ).alias("_cent")
    )
    counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_label")
    )
    joined = df.select(
        F.col(id_col), F.col(label_col).alias("label"), F.col(vec_col).alias("_v")
    ).join(F.broadcast(cents.join(counts, "label")), "label")
    scored = joined.select(
        id_col,
        "label",
        "n_label",
        cosine(
            F.transform(F.col("_v"), lambda x: x.cast("double")), F.col("_cent")
        ).alias("centroid_cos"),
    )
    w = W.partitionBy("label").orderBy(F.asc("centroid_cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def feature_scaling_stats(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension standardization table (dim, n, mean, std) for an
    embedding column — the fit half of feature scaling before
    distance-based ops (k-means, PQ) where dimension variance skews
    the metric. One posexplode → one dim-keyed aggregate (dims rows).

    Determinism: Σx and Σx² accumulate in DECIMAL via each double's
    shortest-repr string (the embedding_centroid_drift policy — a
    direct double→decimal cast is mis-rounded in DuckDB); x² is formed
    in double first (IEEE-exact per row), so both engines feed
    identical decimals. mean/var/std are then a fixed sequence of
    double ops: mean = S/n, var = (Q - S·mean)/n, std = sqrt(var).
    """
    exploded = df.select(F.posexplode(F.col(vec_col)).alias("dim", "_v"))
    x = F.col("_v").cast("double")
    agg = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("string").cast("decimal(30,21)")).alias("_s"),
        F.sum((x * x).cast("string").cast("decimal(38,21)")).alias("_q"),
    )
    s = F.col("_s").cast("double")
    q = F.col("_q").cast("double")
    mean = s / F.col("n")
    var = (q - s * mean) / F.col("n")
    return agg.select(
        "dim",
        "n",
        mean.alias("mean"),
        F.sqrt(var).alias("std"),
    )


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sig_bits: int = 16,
    band_bits: int = 8,
) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al. 2007): the QUERY side probes its
    own bucket plus every bucket at Hamming distance 1 within each
    band — near-misses that flipped one hyperplane bit are recovered
    without extra hash tables. The corpus/index side stays ONE bucket
    per band (unchanged index size — the point of multi-probe); the
    probe fan-out ×(band_bits+1) lands on the query side only, which
    is the small side by contract. Exact cosine re-ranks candidates;
    recall ≥ the single-probe lsh_ann_topk by construction (its
    candidate set is a superset — property-tested).
    Returns (query_id, neighbor_id, cos_sim, rank)."""
    planes = random_planes(dim, sig_bits)
    n_bands = sig_bits // band_bits
    mask = (1 << band_bits) - 1
    sig_c = _rh_signature(F.col(vec_col), planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(sig_c, b * band_bits).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    sig_q = _rh_signature(F.col(vec_col), planes)
    probes = []
    for b in range(n_bands):
        base = F.shiftrightunsigned(sig_q, b * band_bits).bitwiseAND(F.lit(mask))
        probes.append(F.struct(F.lit(b).alias("band"), base.alias("bucket")))
        for i in range(band_bits):
            probes.append(
                F.struct(
                    F.lit(b).alias("band"),
                    base.bitwiseXOR(F.lit(1 << i)).alias("bucket"),
                )
            )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(F.array(*probes)).alias("_p"),
    ).select("query_id", "_qv", F.col("_p.band").alias("band"), F.col("_p.bucket").alias("bucket"))
    cand = (
        c.join(q, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def bitext_margin_topk(
    side_a: DataFrame,
    side_b: DataFrame,
    k: int = 4,
    top: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the LASER /
    CCMatrix alignment criterion): score every (a, b) cross-side pair
    by cos(a,b) normalized by the mean of each side's top-k neighbor
    cosines — raw cosine over-selects hub sentences; the margin ratio

        margin(a,b) = cos(a,b) / ((Σtopk_B(a) + Σtopk_A(b)) / 2k)

    suppresses them. Returns the ``top`` best candidate pairs per
    side-A row: (a_id, b_id, cos_ab, margin, rank).

    Scale shape: side A broadcasts as the query block (mine in
    A-sized chunks when both sides are corpus-scale, or put an LSH /
    IVF candidate generator in front — same composition contract as
    hard_negatives); side B streams once; both top-k folds are
    bounded per-key windows. Cross-engine determinism: the k window
    cosines sum in DECIMAL (order-free) and re-enter IEEE754 through
    one string-parse cast, so an external oracle replays every margin
    bit-for-bit.
    """
    a = side_a.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("_av"))
    b = side_b.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("_bv"))
    scored = b.crossJoin(F.broadcast(a)).select(
        "a_id", "b_id", cosine(F.col("_av"), F.col("_bv")).alias("cos_ab")
    )
    # double → shortest-repr string → decimal: DuckDB's direct
    # double→DECIMAL(20-digit) cast is lossy (multiplies in double);
    # the string hop is the proven cross-engine-exact route (same
    # convention as label_outliers' centroid accumulation)
    dec = F.col("cos_ab").cast("string").cast("decimal(22,20)")
    wa = W.partitionBy("a_id").orderBy(F.desc("cos_ab"), "b_id")
    sa = (
        scored.withColumn("_r", F.row_number().over(wa))
        .filter(F.col("_r") <= k)
        .groupBy("a_id")
        .agg(F.sum(dec).alias("_sa"))
    )
    wb = W.partitionBy("b_id").orderBy(F.desc("cos_ab"), "a_id")
    sb = (
        scored.withColumn("_r", F.row_number().over(wb))
        .filter(F.col("_r") <= k)
        .groupBy("b_id")
        .agg(F.sum(dec).alias("_sb"))
    )
    # direct decimal→double (Java BigDecimal, correctly rounded); the
    # DuckDB twin round-trips through VARCHAR to reproduce it exactly
    denom = (F.col("_sa") + F.col("_sb")).cast("double") / F.lit(2 * k)
    m = (
        scored.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", "cos_ab", (F.col("cos_ab") / denom).alias("margin"))
    )
    wt = W.partitionBy("a_id").orderBy(F.desc("margin"), "b_id")
    return m.withColumn("rank", F.row_number().over(wt)).filter(
        F.col("rank") <= top
    )


def knn_shapley(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 10**9,
    truncate_at: int | None = None,
) -> DataFrame:
    """Exact KNN-Shapley data valuation (Jia et al. 2019, "Efficient
    Task-Specific Data Valuation for Nearest Neighbor Algorithms"):
    each TRAINING point's Shapley value for a k-NN classifier over a
    held-out test block, via the closed-form recurrence over the
    per-test ranking (nearest = rank 1, n = |corpus|):

        s_n = 1[y_n = y_q] / n
        s_j = s_{j+1} + (1[y_j=y_q] − 1[y_{j+1}=y_q])/k · min(k,j)/j

    Points whose label agrees with nearby test points earn positive
    value; mislabeled or adversarial points go NEGATIVE — the
    principled "which training data helped" audit behind data-market
    and data-cleaning pipelines (drop the bottom tail before
    training). Callers pass DISJOINT corpus/queries (a leaked test
    point would value itself).

    Determinism: every per-rank term is integerized HALF-UP to
    nano-values — magnitude (2·scale·min(k,j) + k·j) // (2·k·j), sign
    applied AFTER the division so the integer division only ever sees
    non-negative operands (Spark ``div`` truncates, DuckDB ``//``
    floors; they agree exactly on non-negatives) — and the recurrence
    is a tail cumulative SUM of integers (one ordered window), so the
    whole valuation is replayable bit-for-bit.

    Scale shape: the test block broadcasts (|queries| ≪ |corpus|),
    the corpus streams once; the per-test full ranking rides ONE
    window per query — audit-scale like ks_two_sample's exact twin.
    The 100 TB paths: (a) per-query bucketed sort-rank (the
    quality_deciles plan) to split the rank window, or (b) truncated
    Shapley — ranks beyond M contribute ≤ Σ_{j>M} 1/(k·j) ≈ ln(n/M)/k
    total, so an LSH/IVF candidate front-end bounds the window at M
    candidates with a documented bias bound.

    ``truncate_at=M`` registers path (b) directly: each test point
    values only its top-M ranked candidates (the exact Shapley of the
    reduced M-candidate problem — what you get when an ANN front-end
    feeds the recurrence); points outside every test's top-M are
    exactly absent from the output.

    Returns (vec_id, label, n_tests, shapley_nano) — shapley_nano is
    the SUM over test points of the scaled per-test values (integer;
    divide by n_tests·scale for the average in [−1, 1]).
    """
    n = truncate_at if truncate_at is not None else corpus.count()
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("_ql"),
        F.col(vec_col).alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("_nl"),
        F.col(vec_col).alias("_cv"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "_ql",
        "neighbor_id",
        "_nl",
        cosine(F.col("_qv"), F.col("_cv")).alias("_cos"),
    )
    w_rank = W.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    ranked = scored.withColumn("_j", F.row_number().over(w_rank)).withColumn(
        "_m", (F.col("_ql") == F.col("_nl")).cast("int")
    )
    if truncate_at is not None:
        ranked = ranked.filter(F.col("_j") <= truncate_at)
    lead_m = F.lead("_m").over(w_rank)
    # 2·scale·min(k,j) exceeds int32 — force BIGINT before the products
    mag = F.expr(
        f"(CAST({2 * scale} AS BIGINT) * least({k}, _j) + {k} * _j)"
        f" div (2 * {k} * _j)"
    ).cast("long")
    base = F.expr(
        f"(CAST({2 * scale} AS BIGINT) + {n}) div (2 * {n})"
    ).cast("long")
    delta = F.when(F.col("_j") == n, F.col("_m") * base).otherwise(
        (F.col("_m") - lead_m).cast("long") * mag
    )
    w_tail = (
        W.partitionBy("query_id")
        .orderBy("_j")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    valued = ranked.withColumn("_delta", delta).withColumn(
        "_s", F.sum("_delta").over(w_tail)
    )
    return valued.groupBy(
        F.col("neighbor_id").alias(id_col), F.col("_nl").alias(label_col)
    ).agg(
        F.count(F.lit(1)).cast("int").alias("n_tests"),
        F.sum("_s").cast("long").alias("shapley_nano"),
    )


def rrf_fuse(
    ranked: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    c: int = 60,
    scale: int = 10**9,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of heterogeneous
    retrievers — the standard hybrid-search combiner (keyword BM25 ⊕
    embedding ANN) because it needs NO score calibration, only ranks:

        rrf(d) = Σ_retrievers 1 / (c + rank_r(d))

    Integerized exactly: each term is scale // (c + rank) — integer
    division of positive operands, identical in Spark and any external
    engine; the fused score is a SUM of integers, so the fusion is
    bit-deterministic with no float anywhere.

    ``ranked``: [(name, df)] where df carries (id_col, rank_col);
    each retriever's rank joins in as ``{name}_rank`` (NULL when that
    retriever missed the doc — contributing 0). Inputs are top-k
    result lists (bounded), so every join is broadcast-sized.
    Returns (id_col, *_rank..., rrf_nano, fused_rank ≤ k)."""
    out = None
    for name, df in ranked:
        side = df.select(
            F.col(id_col), F.col(rank_col).cast("int").alias(f"{name}_rank")
        )
        out = side if out is None else out.join(side, id_col, "full_outer")
    score = F.lit(0).cast("long")
    for name, _ in ranked:
        score = score + F.coalesce(
            F.expr(f"CAST({scale} AS BIGINT) div ({c} + {name}_rank)"),
            F.lit(0).cast("long"),
        )
    w = W.orderBy(F.desc("rrf_nano"), F.asc(id_col))
    return (
        out.withColumn("rrf_nano", score)
        .withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
    )


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding dimensions —
    the single-pass PCA/whitening fit (what RowMatrix.computeCovariance
    gives MLlib, re-expressed relationally): one posexplode, a
    vec-keyed self-join producing the d(d+1)/2 cross products per row,
    and one (dim_i, dim_j) aggregate — Θ(n·d²) work spread across the
    cluster with no driver involvement; eigendecomposition of the
    d×d result is driver-side by design. Cross products form in
    DOUBLE then accumulate via shortest-repr-string DECIMAL(38,21)
    (the feature_scaling_stats policy), so sums are
    partitioning-independent; cov is one fixed-order double
    expression. Returns (dim_i, dim_j, n, cov) for dim_i ≤ dim_j."""
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("_dim", "_x"),
    )
    # r07 (guide §2.5): the exploded table is tiny in BYTES (n·d rows)
    # but the _id self-join below multiplies it to n·d² cross-product
    # rows — AQE, sizing by bytes, coalesced the join to 1-2 partitions
    # and the whole Θ(n·d²) decimal accumulation ran near-serially
    # (wall ≈ JVM CPU on a 32-core host). An explicit _id-keyed
    # repartition is exempt from AQE coalescing AND pre-satisfies both
    # join sides' clustering, so the join runs wide with no extra
    # exchange.
    ex = ex.repartition(
        df.sparkSession.sparkContext.defaultParallelism * 2, "_id"
    )
    a = ex.select(
        F.col("_id"), F.col("_dim").alias("_di"), F.col("_x").alias("_xa")
    )
    b = ex.select(
        F.col("_id"), F.col("_dim").alias("_dj"), F.col("_x").alias("_xb")
    )
    g = (
        a.join(b, "_id")
        .filter(F.col("_dj") >= F.col("_di"))
        .groupBy("_di", "_dj")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("_xa") * F.col("_xb"))
                .cast("string")
                .cast("decimal(38,21)")
            ).alias("_sxy"),
        )
    )
    s = ex.groupBy(F.col("_dim")).agg(
        F.sum(F.col("_x").cast("string").cast("decimal(30,21)")).alias("_s")
    )
    si = s.select(F.col("_dim").alias("_di"), F.col("_s").alias("_si"))
    sj = s.select(F.col("_dim").alias("_dj"), F.col("_s").alias("_sj"))
    n_d = F.col("n").cast("double")
    cov = (
        n_d * F.col("_sxy").cast("string").cast("double")
        - F.col("_si").cast("string").cast("double")
        * F.col("_sj").cast("string").cast("double")
    ) / (n_d * n_d)
    return (
        g.join(F.broadcast(si), "_di")
        .join(F.broadcast(sj), "_dj")
        .select(
            F.col("_di").alias("dim_i"),
            F.col("_dj").alias("dim_j"),
            "n",
            cov.alias("cov"),
        )
    )


def kmeans_round_exact(
    df: DataFrame,
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
) -> DataFrame:
    """ONE Lloyd's iteration made EXACT and oracle-checkable — the
    verifiable core of kmeans_train_distributed (whose multi-round
    float trainer is deterministic only modulo sum reassociation):
    vectors quantize to integers (floor(x·scale + 0.5), the engine's
    quantizer idiom), the k lowest-id vectors seed integer centroids,
    assignment is the exact integer argmin of squared L2 (ties break
    on cell id), and the update is reported as RATIONALS — per
    (cell, dim) the exact sum and count, with the mean as one double
    division. Per-cell SSE rides along as the convergence metric.

    Plan shape: broadcast k seed rows × corpus (the canonical
    assignment cost), one argmin window keyed by point id, one
    posexplode shuffle of k·dim aggregate rows. Returns
    (cell, dim, s, n, mean, sse)."""
    from pyspark.sql import Window

    xq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
    )
    pts = df.select(F.col(id_col).alias("_pid"), xq.alias("_xq"))
    cents = pts.filter(F.col("_pid") < k).select(
        F.col("_pid").alias("cell"), F.col("_xq").alias("_cq")
    )
    d = pts.crossJoin(F.broadcast(cents)).withColumn(
        "_dist",
        F.aggregate(
            F.zip_with(F.col("_xq"), F.col("_cq"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    a = (
        d.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy("_dist", "cell")
            ),
        )
        .filter(F.col("_rk") == 1)
        .select("_pid", "cell", "_dist", "_xq")
        .localCheckpoint(eager=False)
    )
    cellstats = a.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_dist").cast("long").alias("sse"),
    )
    dims = (
        a.select("cell", F.posexplode("_xq").alias("dim", "_x"))
        .groupBy("cell", F.col("dim").cast("long").alias("dim"))
        .agg(F.sum("_x").cast("long").alias("s"))
    )
    return dims.join(F.broadcast(cellstats), "cell").select(
        "cell",
        "dim",
        "s",
        "n",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("mean"),
        "sse",
    )
