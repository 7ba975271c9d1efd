"""Vector-infrastructure queries: dimensionality reduction and
quantization over the embeddings table.

Both are per-row expression pipelines (no shuffle, no UDF) with exact
DuckDB twins: the projection replays the literal LCG plane matrix with
the same left-fold float arithmetic the cosine oracles hash-match, and
the quantizer uses floor(x+0.5) instead of round() so no
banker's-rounding divergence exists between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.operators.similarity import (
    brute_force_topk,
    project_vectors,
    quantize_int8,
    random_planes,
)
from datalake_etlscripts_spark.plans.registry import query

_PROJ_DIM = 16
_PLANES = random_planes(64, _PROJ_DIM, seed=11)


def _ddb_proj(vec_expr: str) -> str:
    """DuckDB: ARRAY of the 16 plane dot products (left folds)."""
    projs = []
    for p in _PLANES:
        # bare decimal literals parse as DECIMAL in DuckDB and the
        # DECIMAL->DOUBLE conversion rounds differently from a decimal
        # STRING parse; go through VARCHAR so both engines see the
        # exact repr-round-trip double
        lit = "[" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in p) + "]"
        projs.append(
            f"list_reduce(list_prepend(0.0, list_transform(list_zip({vec_expr},"
            f" {lit}), x -> CAST(x[1] AS DOUBLE) * x[2])), (a, b) -> a + b)"
        )
    return "[" + ", ".join(projs) + "]"


_ANN_PROJECTED_ORACLE = f"""
    WITH proj AS (
      SELECT vec_id, {_ddb_proj("embedding")} AS pv FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, pv AS qv FROM proj WHERE vec_id < 8),
    scored AS (
      SELECT query_id, vec_id AS neighbor_id,
        list_reduce(list_prepend(0.0, list_transform(list_zip(qv, pv),
            x -> x[1] * x[2])), (a, b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(qv,
             x -> x * x)), (a, b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(pv,
             x -> x * x)), (a, b) -> a + b))) AS cos_sim
      FROM proj, q WHERE query_id <> vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
"""


@query("ann_projected_topk", oracle=_ANN_PROJECTED_ORACLE)
def q_ann_projected_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection (64 to 16 dims, literal LCG planes) then exact top-5 cosine in the projected space - the cheapened-ANN pipeline."""
    e = read_table(spark, sf_dir, "embeddings")
    proj = project_vectors(e, _PLANES).withColumnRenamed("proj", "embedding")
    return brute_force_topk(proj, proj.filter(F.col("vec_id") < 8), k=5)


_QUANTIZE_ORACLE = """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    a AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS amax
      FROM v
    ),
    q AS (
      SELECT vec_id, v, amax,
             CASE WHEN amax > 0 THEN
               list_transform(v, x -> CAST(floor(x * 127.0 / amax + 0.5) AS BIGINT))
             ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv
      FROM a
    )
    SELECT vec_id, amax,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(qv, x -> abs(x))), (acc, x) -> acc + x) AS q_l1,
           list_max(list_transform(list_zip(v, qv),
               x -> abs(x[1] - CAST(x[2] AS DOUBLE) * amax / 127.0)))
             AS max_abs_err
    FROM q
"""


@query("embedding_quantize_int8", oracle=_QUANTIZE_ORACLE)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization with reconstruction-error audit - floor(x+0.5) rounding, scalar outputs (L1 mass + max abs error)."""
    e = read_table(spark, sf_dir, "embeddings")
    qd = quantize_int8(e)
    return qd.select(
        "vec_id",
        "amax",
        F.aggregate(
            F.col("qvec"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.abs(x),
        ).alias("q_l1"),
        F.array_max(
            F.zip_with(
                F.col("_v"),
                F.col("qvec"),
                lambda x, qv: F.abs(x - qv.cast("double") * F.col("amax") / F.lit(127.0)),
            )
        ).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# k-NN label-vote evaluation: the embedding-quality audit. The oracle
# reuses the ann_cosine_topk fold arithmetic and replays the integer
# vote with the same (count desc, label asc) tie-break.
# ---------------------------------------------------------------------------
_KNN_ORACLE = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS true_label
               FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS nl
          FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, nl,
        list_reduce(list_prepend(0.0, list_transform(list_zip(qv, cv),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (a,b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(qv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(cv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))) AS cos_sim
      FROM c, q WHERE query_id <> neighbor_id
    ),
    nn AS (
      SELECT query_id, neighbor_id, nl FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored
      ) WHERE rank <= 5
    ),
    votes AS (
      SELECT query_id, nl, count(*) AS votes FROM nn GROUP BY 1, 2
    ),
    best AS (
      SELECT query_id, nl AS pred_label, votes FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY votes DESC, nl ASC) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT b.query_id, q.true_label, b.pred_label, b.votes
    FROM best b JOIN q USING (query_id)
"""


@query("knn_label_vote", oracle=_KNN_ORACLE)
def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification audit: top-5 cosine neighbors vote each query's label, deterministic (count desc, label asc) tie-break - integer votes, no float aggregation."""
    from datalake_etlscripts_spark.operators.similarity import knn_label_vote

    e = read_table(spark, sf_dir, "embeddings")
    return knn_label_vote(e, e.filter(F.col("vec_id") < 50), k=5)


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011): encode once to m small
# codes, score queries against reconstructions (ADC). Codebooks are
# fixed LCG literals shared into the twin — same oracle policy as the
# IVF quantizer; production trains per-subspace k-means.
# ---------------------------------------------------------------------------
_PQ_M, _PQ_K, _PQ_SUB = 8, 16, 8


def _pq_cbs():
    from datalake_etlscripts_spark.operators.similarity import pq_codebooks

    return pq_codebooks(64, m=_PQ_M, k=_PQ_K, seed=13)


def _ddb_pq_values() -> str:
    rows = []
    for j, cb in enumerate(_pq_cbs()):
        for cid, c in enumerate(cb):
            lit = "[" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in c) + "]"
            rows.append(f"({j}, {cid}, {lit})")
    return ", ".join(rows)


_PQ_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    d AS (
      SELECT vec_id, cb.j AS j, cb.cid AS cid, cb.c AS c,
             list_reduce(list_prepend(0.0,
               list_transform(list_zip(v[(cb.j * {_PQ_SUB} + 1):(cb.j * {_PQ_SUB} + {_PQ_SUB})], cb.c),
                 x -> (x[1] - x[2]) * (x[1] - x[2]))), (a, b) -> a + b) AS d
      FROM v CROSS JOIN (VALUES {{PQ_VALUES}}) cb(j, cid, c)
    ),
    a AS (
      SELECT vec_id, j, cid, c,
             row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS r
      FROM d
    ),
    recon AS (
      SELECT vec_id, flatten(list(c ORDER BY j)) AS rv
      FROM a WHERE r = 1 GROUP BY vec_id
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 8),
    scored AS (
      SELECT query_id, recon.vec_id AS neighbor_id,
             list_reduce(list_prepend(0.0,
               list_transform(list_zip(qv, rv),
                 x -> (x[1] - x[2]) * (x[1] - x[2]))), (a, b) -> a + b) AS adc_dist
      FROM recon CROSS JOIN q WHERE query_id <> recon.vec_id
    )
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
"""


@query("ann_pq_topk", oracle=_PQ_ORACLE.replace("{PQ_VALUES}", _ddb_pq_values()))
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-5: vectors encoded once to 8 codes (argmin-L2 per subspace, literal codebooks), queries scored full-precision against reconstructions."""
    from datalake_etlscripts_spark.operators.similarity import pq_ann_topk

    # r07 note: spreading the single-task embeddings scan
    # (spread_small_input) was A/B'd and REJECTED here — min wall
    # 5.4 -> 6.2 s: the whole encode+score chain is ~6 s of work, and
    # the added exchange + task scheduling cost more than the
    # parallelism bought (unlike bootstrap_ci_poisson, where the same
    # spread cut wall 4.6x on a larger per-row md5 workload).
    e = read_table(spark, sf_dir, "embeddings")
    return pq_ann_topk(e, e.filter(F.col("vec_id") < 8), _pq_cbs(), k=5)


# ---------------------------------------------------------------------------
# per-label embedding drift between vec_id-parity halves: cosine of
# the halves' decimal-exact SUM vectors (scale-invariant ⇒ no mean
# division); dimension-ordered double fold, VARCHAR round-trip for the
# wide decimal→double cast (DuckDB's is not correctly rounded)
# ---------------------------------------------------------------------------
_DRIFT_ORACLE = """
    WITH o AS (
      SELECT label, vec_id % 2 AS half, embedding,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings
    ),
    s AS (
      SELECT label, half, CAST(i AS INT) - 1 AS dim,
             SUM(CAST(CAST(embedding[i] AS VARCHAR) AS DECIMAL(30,21))) AS sd
      FROM o GROUP BY 1, 2, 3
    ),
    v AS (
      SELECT label, half,
             list(CAST(CAST(sd AS VARCHAR) AS DOUBLE) ORDER BY dim) AS vec
      FROM s GROUP BY 1, 2
    ),
    n AS (
      SELECT label, vec_id % 2 AS half, count(*) AS n
      FROM embeddings GROUP BY 1, 2
    ),
    j AS (
      SELECT a.label, na.n AS n_a, nb.n AS n_b, a.vec AS va, b.vec AS vb
      FROM v a
      JOIN v b ON b.label = a.label AND a.half = 0 AND b.half = 1
      JOIN n na ON na.label = a.label AND na.half = 0
      JOIN n nb ON nb.label = a.label AND nb.half = 1
    )
    SELECT label, n_a, n_b,
           list_reduce(list_prepend(0.0, list_transform(list_zip(va, vb),
               x -> x[1] * x[2])), (p, q) -> p + q)
           / (sqrt(list_reduce(list_prepend(0.0, list_transform(va,
                x -> x * x)), (p, q) -> p + q))
            * sqrt(list_reduce(list_prepend(0.0, list_transform(vb,
                x -> x * x)), (p, q) -> p + q))) AS drift_cosine
    FROM j
"""


@query("embedding_drift", oracle=_DRIFT_ORACLE)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid drift between dataset halves - decimal-exact per-dim sums, scale-invariant cosine, dimension-ordered fold."""
    from datalake_etlscripts_spark.operators.similarity import embedding_centroid_drift

    e = read_table(spark, sf_dir, "embeddings")
    return embedding_centroid_drift(
        e, label_col="label", half_col=(F.col("vec_id") % 2), vec_col="embedding"
    )


# ---------------------------------------------------------------------------
# Hard-negative mining: per query, the top-3 most similar vectors with
# a DIFFERENT label — contrastive-training data prep (triplet/InfoNCE
# negatives). Same fold-cosine arithmetic as the kNN twin.
# ---------------------------------------------------------------------------
_HARDNEG_ORACLE = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS query_label
               FROM embeddings WHERE vec_id < 40),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS neighbor_label
          FROM embeddings),
    scored AS (
      SELECT query_id, query_label, neighbor_id, neighbor_label,
        list_reduce(list_prepend(0.0, list_transform(list_zip(qv, cv),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (a,b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(qv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(cv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))) AS cos_sim
      FROM c, q
      WHERE query_id <> neighbor_id AND query_label <> neighbor_label
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim, rank
    FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 3
"""


@query("hard_negatives", oracle=_HARDNEG_ORACLE)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: top-3 most similar different-label vectors per query - broadcast query block, bit-exact fold cosine."""
    from datalake_etlscripts_spark.operators.similarity import hard_negatives

    e = read_table(spark, sf_dir, "embeddings")
    return hard_negatives(e, e.filter(F.col("vec_id") < 40), k=3)


# ---------------------------------------------------------------------------
# Label-noise audit: bottom-3 own-centroid cosines per label — the
# mislabel-suspect review queue. Centroids reuse the drift query's
# decimal-exact accumulation (shortest-repr string → DECIMAL, cast
# back once), so the twin replays the exact same doubles.
# ---------------------------------------------------------------------------
_OUTLIER_ORACLE = """
    WITH o AS (
      SELECT label, embedding,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings
    ),
    s AS (
      SELECT label, CAST(i AS INT) - 1 AS dim,
             SUM(CAST(CAST(embedding[i] AS VARCHAR) AS DECIMAL(30,21))) AS sd
      FROM o GROUP BY 1, 2
    ),
    c AS (
      SELECT label, list(CAST(CAST(sd AS VARCHAR) AS DOUBLE) ORDER BY dim) AS cent
      FROM s GROUP BY 1
    ),
    n AS (SELECT label, count(*) AS n_label FROM embeddings GROUP BY 1),
    scored AS (
      SELECT e.vec_id, e.label, n.n_label,
        list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, c.cent),
            x -> CAST(x[1] AS DOUBLE) * x[2])), (a,b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(c.cent,
             x -> x * x)), (a,b) -> a + b))) AS centroid_cos
      FROM embeddings e JOIN c ON e.label = c.label JOIN n ON n.label = e.label
    )
    SELECT vec_id, label, n_label, centroid_cos, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY label
                   ORDER BY centroid_cos ASC, vec_id ASC) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 3
"""


@query("label_outliers", oracle=_OUTLIER_ORACLE)
def q_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit: bottom-3 own-centroid cosine per label (mislabel suspects) - decimal-exact centroids broadcast onto one corpus scan."""
    from datalake_etlscripts_spark.operators.similarity import label_outliers

    e = read_table(spark, sf_dir, "embeddings")
    return label_outliers(e, k=3)


# ---------------------------------------------------------------------------
# feature-scaling fit: per-dimension mean/std of the embedding corpus
# (decimal-exact moments, double math in a fixed op order).
# ---------------------------------------------------------------------------
@query(
    "feature_scaling_stats",
    oracle="""
    WITH o AS (
      SELECT unnest(generate_series(1, len(embedding))) AS i, embedding
      FROM embeddings
    ),
    a AS (
      SELECT CAST(i AS INT) - 1 AS dim, count(*) AS n,
             SUM(CAST(CAST(CAST(embedding[i] AS DOUBLE) AS VARCHAR)
                 AS DECIMAL(30,21))) AS s,
             SUM(CAST(CAST(CAST(embedding[i] AS DOUBLE)
                           * CAST(embedding[i] AS DOUBLE) AS VARCHAR)
                 AS DECIMAL(38,21))) AS q
      FROM o GROUP BY 1
    )
    SELECT dim, n,
           CAST(CAST(s AS VARCHAR) AS DOUBLE) / n AS mean,
           sqrt((CAST(CAST(q AS VARCHAR) AS DOUBLE)
                 - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                   * (CAST(CAST(s AS VARCHAR) AS DOUBLE) / n)) / n) AS std
    FROM a
    """,
)
def q_feature_scaling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-scaling fit: per-dimension mean/std of embeddings from decimal-exact moments - one posexplode + one dim-keyed aggregate."""
    from datalake_etlscripts_spark.operators.similarity import feature_scaling_stats

    e = read_table(spark, sf_dir, "embeddings")
    return feature_scaling_stats(e)


# ---------------------------------------------------------------------------
# margin-based bitext mining (r4): sides are the even/odd halves of
# the embeddings table (the two-languages stand-in); side A limited to
# a 20-vector query block (the broadcast contract). The oracle replays
# the cosine folds, both DECIMAL top-k sums, the string-parse
# re-entry to DOUBLE, and the margin ratio.
# ---------------------------------------------------------------------------
_COS_AB = """
        list_reduce(list_prepend(0.0, list_transform(list_zip(av, bv),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (a,b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(av,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(bv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b)))
"""

_BITEXT_ORACLE = f"""
    WITH a AS (SELECT vec_id AS a_id, embedding AS av FROM embeddings
               WHERE vec_id % 2 = 0 AND vec_id < 40),
    b AS (SELECT vec_id AS b_id, embedding AS bv FROM embeddings
          WHERE vec_id % 2 = 1),
    scored AS (
      SELECT a_id, b_id, {_COS_AB} AS cos_ab FROM a, b
    ),
    sa AS (
      SELECT a_id, SUM(CAST(CAST(cos_ab AS VARCHAR) AS DECIMAL(22,20))) AS s FROM (
        SELECT *, row_number() OVER (PARTITION BY a_id
                 ORDER BY cos_ab DESC, b_id) AS r FROM scored
      ) WHERE r <= 4 GROUP BY a_id
    ),
    sb AS (
      SELECT b_id, SUM(CAST(CAST(cos_ab AS VARCHAR) AS DECIMAL(22,20))) AS s FROM (
        SELECT *, row_number() OVER (PARTITION BY b_id
                 ORDER BY cos_ab DESC, a_id) AS r FROM scored
      ) WHERE r <= 4 GROUP BY b_id
    ),
    m AS (
      SELECT sc.a_id, sc.b_id, sc.cos_ab,
             sc.cos_ab / (CAST(CAST(sa.s + sb.s AS VARCHAR) AS DOUBLE) / 8)
               AS margin
      FROM scored sc JOIN sa USING (a_id) JOIN sb USING (b_id)
    )
    SELECT a_id, b_id, cos_ab, margin, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY a_id
               ORDER BY margin DESC, b_id) AS rank FROM m
    ) WHERE rank <= 1
"""


@query("bitext_margin_mining", oracle=_BITEXT_ORACLE)
def q_bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe-Schwenk ratio margin): best cross-side pair per query vector, cosine normalized by both sides' mean top-4 neighbor cosine - hub suppression, decimal-exact neighborhood sums."""
    from datalake_etlscripts_spark.operators.similarity import bitext_margin_topk

    e = read_table(spark, sf_dir, "embeddings")
    side_a = e.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 40))
    side_b = e.filter(F.col("vec_id") % 2 == 1)
    return bitext_margin_topk(side_a, side_b, k=4, top=1)


# ---------------------------------------------------------------------------
# KNN-Shapley data valuation (r4): which training points HELP a k-NN
# classifier on the held-out block, exactly (Jia et al. 2019 closed
# form). Every per-rank term is half-up integer nano-values with the
# sign applied AFTER the division (Spark div truncates, DuckDB //
# floors — they agree only on non-negatives), so the whole valuation
# is one integer tail-cumsum, replayed bit-for-bit by the oracle.
# ---------------------------------------------------------------------------
_SHAPLEY_ORACLE = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id % 97 = 0),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS nl
          FROM embeddings WHERE vec_id % 97 <> 0),
    nn AS (SELECT count(*) AS n FROM c),
    scored AS (
      SELECT query_id, ql, neighbor_id, nl,
        list_reduce(list_prepend(0.0, list_transform(list_zip(qv, cv),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (a,b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(qv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(cv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))) AS cos_sim
      FROM c, q
    ),
    ranked AS (
      SELECT query_id, neighbor_id, nl,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS j,
             CASE WHEN ql = nl THEN 1 ELSE 0 END AS m
      FROM scored
    ),
    d AS (
      SELECT query_id, neighbor_id, nl, j,
             CASE WHEN j = nn.n
                  THEN m * ((2000000000 + nn.n) // (2 * nn.n))
                  ELSE (m - lead(m) OVER (PARTITION BY query_id ORDER BY j))
                       * ((2000000000 * least(5, j) + 5 * j) // (2 * 5 * j))
             END AS delta
      FROM ranked, nn
    ),
    s AS (
      SELECT neighbor_id, nl,
             sum(delta) OVER (PARTITION BY query_id ORDER BY j
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS sv
      FROM d
    )
    SELECT neighbor_id AS vec_id, nl AS label,
           CAST(count(*) AS INT) AS n_tests,
           CAST(sum(sv) AS BIGINT) AS shapley_nano
    FROM s GROUP BY 1, 2
"""


@query("knn_shapley_values", oracle=_SHAPLEY_ORACLE)
def q_knn_shapley_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN-Shapley data valuation: exact closed-form Shapley value of every training vector for a 5-NN classifier over the held-out test block - integer nano-value recurrence, one ranking window + one tail cumsum per test point."""
    from datalake_etlscripts_spark.operators.similarity import knn_shapley

    e = read_table(spark, sf_dir, "embeddings")
    return knn_shapley(
        e.filter(F.col("vec_id") % 97 != 0),
        e.filter(F.col("vec_id") % 97 == 0),
        k=5,
    )


# Truncated KNN-Shapley: the registered 100 TB path beside the exact
# baseline — each test point values only its top-64 candidates (what
# an LSH/IVF front-end would feed), tail contribution bound ln(n/M)/k.
_SHAPLEY_TRUNC_ORACLE = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id % 97 = 0),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS nl
          FROM embeddings WHERE vec_id % 97 <> 0),
    scored AS (
      SELECT query_id, ql, neighbor_id, nl,
        list_reduce(list_prepend(0.0, list_transform(list_zip(qv, cv),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (a,b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(qv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(cv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))) AS cos_sim
      FROM c, q
    ),
    ranked AS (
      SELECT query_id, neighbor_id, nl,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS j,
             CASE WHEN ql = nl THEN 1 ELSE 0 END AS m
      FROM scored
    ),
    trunc AS (SELECT * FROM ranked WHERE j <= 64),
    d AS (
      SELECT query_id, neighbor_id, nl, j,
             CASE WHEN j = 64
                  THEN m * ((2000000000 + 64) // (2 * 64))
                  ELSE (m - lead(m) OVER (PARTITION BY query_id ORDER BY j))
                       * ((2000000000 * least(5, j) + 5 * j) // (2 * 5 * j))
             END AS delta
      FROM trunc
    ),
    s AS (
      SELECT neighbor_id, nl,
             sum(delta) OVER (PARTITION BY query_id ORDER BY j
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS sv
      FROM d
    )
    SELECT neighbor_id AS vec_id, nl AS label,
           CAST(count(*) AS INT) AS n_tests,
           CAST(sum(sv) AS BIGINT) AS shapley_nano
    FROM s GROUP BY 1, 2
"""


@query("knn_shapley_truncated", oracle=_SHAPLEY_TRUNC_ORACLE)
def q_knn_shapley_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated KNN-Shapley (top-64 candidates per test point): the ANN-front-end scale path registered beside the exact baseline - identical integer recurrence on the reduced candidate problem."""
    from datalake_etlscripts_spark.operators.similarity import knn_shapley

    e = read_table(spark, sf_dir, "embeddings")
    return knn_shapley(
        e.filter(F.col("vec_id") % 97 != 0),
        e.filter(F.col("vec_id") % 97 == 0),
        k=5,
        truncate_at=64,
    )


# ---------------------------------------------------------------------------
# Embedding covariance (r5): the single-pass PCA/whitening fit —
# n·d²/2 cross products distributed, d×d result for driver-side
# eigendecomposition; shortest-repr decimal accumulation.
# ---------------------------------------------------------------------------
@query(
    "embedding_covariance",
    oracle="""
    WITH o AS (
      SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i, embedding
      FROM embeddings
    ),
    ex AS (
      SELECT vec_id, CAST(i AS INT) - 1 AS dim,
             CAST(embedding[i] AS DOUBLE) AS x
      FROM o
    ),
    g AS (
      SELECT a.dim AS di, b.dim AS dj, count(*) AS n,
             SUM(CAST(CAST(a.x * b.x AS VARCHAR) AS DECIMAL(38,21))) AS sxy
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.dim >= a.dim
      GROUP BY 1, 2
    ),
    s AS (
      SELECT dim, SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(30,21))) AS sv
      FROM ex GROUP BY 1
    )
    SELECT g.di AS dim_i, g.dj AS dim_j, g.n AS n,
           (CAST(g.n AS DOUBLE) * CAST(CAST(g.sxy AS VARCHAR) AS DOUBLE)
            - CAST(CAST(si.sv AS VARCHAR) AS DOUBLE)
              * CAST(CAST(sj.sv AS VARCHAR) AS DOUBLE))
           / (CAST(g.n AS DOUBLE) * CAST(g.n AS DOUBLE)) AS cov
    FROM g JOIN s si ON si.dim = g.di JOIN s sj ON sj.dim = g.dj
    """,
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass embedding covariance matrix (PCA fit input): distributed n*d^2 cross products with decimal-exact accumulation, d x d upper triangle out - eigendecomposition stays driver-side by design."""
    from datalake_etlscripts_spark.operators.similarity import embedding_covariance

    e = read_table(spark, sf_dir, "embeddings")
    return embedding_covariance(e)


# ---------------------------------------------------------------------------
# Exact Lloyd's round (r6): integer-quantized assignment + rational
# centroid update — the oracle-checkable core of the k-means trainer.
# ---------------------------------------------------------------------------
@query(
    "kmeans_round_exact",
    oracle="""
    WITH pts AS (
      SELECT vec_id AS pid,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))
               AS xq
      FROM embeddings
    ),
    cents AS (SELECT pid AS cell, xq AS cq FROM pts WHERE pid < 4),
    d AS (
      SELECT p.pid, c.cell, p.xq,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(list_zip(p.xq, c.cq),
                 x -> (x[1] - x[2]) * (x[1] - x[2]))),
               (a, b) -> a + b) AS dist
      FROM pts p CROSS JOIN cents c
    ),
    a AS (
      SELECT pid, cell, dist, xq FROM (
        SELECT *, row_number() OVER (PARTITION BY pid
                                     ORDER BY dist, cell) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    cellstats AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dist) AS BIGINT) AS sse
      FROM a GROUP BY 1
    ),
    o AS (SELECT cell, unnest(generate_series(1, len(xq))) AS i, xq FROM a),
    dims AS (
      SELECT cell, CAST(i - 1 AS BIGINT) AS dim,
             CAST(sum(xq[i]) AS BIGINT) AS s
      FROM o GROUP BY 1, 2
    )
    SELECT d.cell, d.dim, d.s, cs.n,
           CAST(d.s AS DOUBLE) / CAST(cs.n AS DOUBLE) AS mean, cs.sse
    FROM dims d JOIN cellstats cs USING (cell)
    """,
)
def q_kmeans_round_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd's k-means round over quantized embeddings: integer argmin assignment against the k seed centroids, rational centroid update (sum, count, one division), per-cell SSE convergence metric."""
    from datalake_etlscripts_spark.operators.similarity import kmeans_round_exact

    e = read_table(spark, sf_dir, "embeddings")
    return kmeans_round_exact(e, k=4)


# ---------------------------------------------------------------------------
# Cluster purity against labels (r9): how well do the exact-k-means
# cells recover the embedding labels? Assignment replays
# kmeans_round_exact's integer argmin (quantized L2 against the k
# lowest-id seed centroids, ties to the lower cell); purity is
# Σ_cell max_label-count / n — exact integer majority counts, one
# division per cell + one overall. The unsupervised-vs-ground-truth
# audit beside knn_label_vote.
# ---------------------------------------------------------------------------
@query(
    "kmeans_cluster_purity",
    oracle="""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)
                         AS BIGINT)) AS xq
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cell, xq AS cq FROM q WHERE vec_id < 4),
    d AS (
      SELECT q.vec_id, q.label, c.cell,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(list_zip(q.xq, c.cq),
                 p -> (CAST(p[1] AS BIGINT) - CAST(p[2] AS BIGINT))
                      * (CAST(p[1] AS BIGINT) - CAST(p[2] AS BIGINT)))),
               (a, b) -> a + b) AS dist
      FROM q CROSS JOIN cents c
    ),
    a AS (
      SELECT vec_id, label, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY dist, cell) AS rk
        FROM d
      ) WHERE rk = 1
    ),
    cl AS (
      SELECT cell, label, CAST(count(*) AS BIGINT) AS c
      FROM a GROUP BY 1, 2
    ),
    maj AS (
      SELECT cell, CAST(sum(c) AS BIGINT) AS n_cell,
             CAST(max(c) AS BIGINT) AS n_majority
      FROM cl GROUP BY 1
    )
    SELECT cell, n_cell, n_majority,
           CAST(n_majority AS DOUBLE) / CAST(n_cell AS DOUBLE) AS purity,
           CAST((SELECT sum(n_majority) FROM maj) AS DOUBLE)
             / CAST((SELECT sum(n_cell) FROM maj) AS DOUBLE)
             AS overall_purity
    FROM maj
    """,
)
def q_kmeans_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster purity of the exact integer k-means assignment against embedding labels: majority counts per cell, one division each, plus the overall purity."""
    from pyspark.sql import Window as W

    e = read_table(spark, sf_dir, "embeddings")
    xq = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
    )
    q = e.select("vec_id", "label", xq.alias("xq"))
    cents = q.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell"), F.col("xq").alias("cq")
    )
    d = q.crossJoin(F.broadcast(cents)).withColumn(
        "dist",
        F.aggregate(
            F.zip_with(
                F.col("xq"), F.col("cq"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    a = (
        d.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy("dist", "cell")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("vec_id", "label", "cell")
    )
    cl = a.groupBy("cell", "label").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    maj = cl.groupBy("cell").agg(
        F.sum("c").cast("long").alias("n_cell"),
        F.max("c").cast("long").alias("n_majority"),
    )
    tot = maj.groupBy().agg(
        (
            F.sum("n_majority").cast("double")
            / F.sum("n_cell").cast("double")
        ).alias("overall_purity")
    )
    return maj.crossJoin(F.broadcast(tot)).select(
        "cell",
        "n_cell",
        "n_majority",
        (
            F.col("n_majority").cast("double")
            / F.col("n_cell").cast("double")
        ).alias("purity"),
        "overall_purity",
    )
