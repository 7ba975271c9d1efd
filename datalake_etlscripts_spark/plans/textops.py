"""Text-analysis / dedup / similarity / multimodal query inventory —
the LLM-training-data-pipeline operators over ``documents`` and
``embeddings`` (BASELINE.json north star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.operators import (
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)
from datalake_etlscripts_spark.plans.registry import ddb_hex32, query

# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------
@query(
    "token_counts",
    oracle=r"""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_re_tokens
    FROM documents
    """,
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace and BPE-ish regex token counts per document."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_ws_tokens"),
        text.regex_token_count(F.col("text")).alias("n_re_tokens"),
    )


# ---------------------------------------------------------------------------
# quality scoring (corpus-filter features)
# ---------------------------------------------------------------------------
@query(
    "text_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text, length(text) AS n_chars,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
             len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS n_distinct,
             len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
             len(regexp_extract_all(text, '[A-Z]')) AS n_upper
      FROM documents
    )
    SELECT doc_id, n_chars AS n_chars_calc, n_tokens,
           CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
           n_punct, CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
           CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
           CAST(n_upper AS DOUBLE) / n_chars AS upper_ratio
    FROM t
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token counts, average token length, punctuation/distinct/uppercase ratios."""
    d = read_table(spark, sf_dir, "documents")
    return text.quality_features(d).select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "avg_token_len",
        "n_punct",
        "punct_ratio",
        "distinct_ratio",
        "upper_ratio",
    )


# ---------------------------------------------------------------------------
# language ID (stopword-hit argmax; docs salted with stopwords by
# doc_id so every branch of the classifier is exercised)
# ---------------------------------------------------------------------------
@query(
    "lang_id",
    oracle="""
    WITH salted AS (
      SELECT doc_id,
             text || CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN ' the and of to the'
               WHEN 1 THEN ' el la de que y'
               ELSE '' END AS text
      FROM documents
    ),
    hits AS (
      SELECT doc_id,
        len(list_filter(list_filter(string_split(text,' '), x -> x <> ''),
            x -> list_contains(['der','die','und','das','von','zu','mit','den','ist','ein'], x))) AS h_de,
        len(list_filter(list_filter(string_split(text,' '), x -> x <> ''),
            x -> list_contains(['the','and','of','to','a','in','is','it','for','on'], x))) AS h_en,
        len(list_filter(list_filter(string_split(text,' '), x -> x <> ''),
            x -> list_contains(['el','la','de','que','y','en','un','los','por','con'], x))) AS h_es,
        len(list_filter(list_filter(string_split(text,' '), x -> x <> ''),
            x -> list_contains(['le','la','de','et','les','des','un','une','du','est'], x))) AS h_fr
      FROM salted
    )
    SELECT doc_id,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                ELSE 'fr' END AS pred_lang
    FROM hits
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: argmax stopword hits across 4 languages with deterministic tie-break."""
    d = read_table(spark, sf_dir, "documents")
    salt = (
        F.when(
            (F.col("doc_id") % 3).cast("int") == 0, F.lit(" the and of to the")
        )
        .when((F.col("doc_id") % 3).cast("int") == 1, F.lit(" el la de que y"))
        .otherwise(F.lit(""))
    )
    salted = d.select("doc_id", F.concat(F.col("text"), salt).alias("text"))
    return salted.select(
        "doc_id", text.detect_language(F.col("text")).alias("pred_lang")
    )


# ---------------------------------------------------------------------------
# document fingerprinting (exact + bag-of-words)
# ---------------------------------------------------------------------------
@query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id, md5(text) AS fp_exact,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split(text,' '), x -> x <> ''))), ' ')) AS fp_bow
    FROM documents
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content md5, bag-of-words hash, and first rolling-shingle fingerprints per document."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text.content_fingerprint(F.col("text")).alias("fp_exact"),
        text.bow_fingerprint(F.col("text")).alias("fp_bow"),
    )


# ---------------------------------------------------------------------------
# dedup — exact (hash groupBy); synthetic corpus is all-distinct, so
# duplicates are injected deterministically by re-appending docs with
# doc_id % 10 == 0 under shifted ids (both engines do the same).
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT fp, n_docs, doc_ids FROM (
      SELECT md5(text) AS fp, count(*) AS n_docs,
             array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
      FROM corpus GROUP BY md5(text)
    ) WHERE n_docs > 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical duplicate groups by content fingerprint - one hash-groupBy shuffle."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return dedup.exact_duplicates(corpus).withColumn(
        "doc_ids", F.array_join("doc_ids", ",")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, lang, CAST(floor(length(text) / 100) AS INT) AS lb,
             list_distinct(list_transform(
               range(1, greatest(len(list_filter(string_split(text,' '), x -> x <> '')) - 1, 1)),
               i -> list_filter(string_split(text,' '), x -> x <> '')[i] || ' ' ||
                    list_filter(string_split(text,' '), x -> x <> '')[i+1] || ' ' ||
                    list_filter(string_split(text,' '), x -> x <> '')[i+2]
             )) AS sh
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM base a JOIN base b ON a.lang = b.lang AND a.lb = b.lb
    WHERE a.doc_id < b.doc_id
      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.04
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-token-shingle Jaccard inside (lang x length-bucket) blocks - never an all-pairs join."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(d, threshold=0.04)


_CLUSTERS_ORACLE = r"""
    WITH RECURSIVE base AS (
      SELECT doc_id, lang, CAST(floor(length(text) / 100) AS INT) AS lb,
             list_distinct(list_transform(
               range(1, greatest(len(list_filter(string_split(text,' '), x -> x <> '')) - 1, 1)),
               i -> list_filter(string_split(text,' '), x -> x <> '')[i] || ' ' ||
                    list_filter(string_split(text,' '), x -> x <> '')[i+1] || ' ' ||
                    list_filter(string_split(text,' '), x -> x <> '')[i+2]
             )) AS sh
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM base a JOIN base b ON a.lang = b.lang AND a.lb = b.lb
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.04
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node, min(lab) AS component FROM reach GROUP BY node
    """


@query("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate clusters (transitive closure). The
    engine iterates hash-min label propagation; the oracle replays it
    as a recursive CTE over the identical edge set."""
    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.04)
    return dedup.connected_components(pairs)


@query("dedup_clusters_star", oracle=_CLUSTERS_ORACLE)
def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical clusters via alternating large-star/small-star
    (Kiveris et al.) — O(log n) rounds regardless of component
    DIAMETER, where hash-min label propagation needs O(diameter)
    rounds. This is the 100 TB path for pathological near-dup graphs
    (boilerplate chains); oracle = the same recursive CTE."""
    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.04)
    return dedup.connected_components_star(pairs)


# MinHash-LSH IS oracle-checkable with the md5 hash scheme (cf.
# simhash below): the DuckDB twin replays 3-token string shingles,
# Kirsch-Mitzenmacher lane bases h1/h2 from md5 hex slices 1-8/9-16,
# per-lane minima, the masked-polynomial band bucket, the within-
# bucket pair join, and exact-Jaccard verification over the md5
# shingle-hash sets — bit-for-bit, including the double division.
_MINHASH_ORACLE = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS s
      FROM toks WHERE len(t) >= 3
    ),
    h AS (
      SELECT doc_id, {h1} AS h1, {h2} AS h2 FROM sh
    ),
    lanes AS (
      SELECT doc_id, l.i AS lane, min(h1 + l.i * h2) AS m
      FROM h CROSS JOIN (SELECT unnest(range(32)) AS i) l
      GROUP BY 1, 2
    ),
    lanecols AS (
      SELECT doc_id, lane // 4 AS band,
             max(CASE WHEN lane % 4 = 0 THEN m END) AS m0,
             max(CASE WHEN lane % 4 = 1 THEN m END) AS m1,
             max(CASE WHEN lane % 4 = 2 THEN m END) AS m2,
             max(CASE WHEN lane % 4 = 3 THEN m END) AS m3
      FROM lanes GROUP BY 1, 2
    ),
    banded AS (
      SELECT doc_id, band,
             ((((((m0 & 4294967295) * 1000003 + m1) & 4294967295)
                * 1000003 + m2) & 4294967295)
                * 1000003 + m3) & 4294967295 AS bucket
      FROM lanecols
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    hs AS (SELECT DISTINCT doc_id, {hv} AS hv FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY 1),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS i
      FROM cand c
      JOIN hs a ON a.doc_id = c.id_a
      JOIN hs b ON b.doc_id = c.id_b AND b.hv = a.hv
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT c.id_a, c.id_b,
             CAST(coalesce(i.i, 0) AS DOUBLE)
               / (sa.n + sb.n - coalesce(i.i, 0)) AS jaccard
      FROM cand c
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b
      LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
    )
    SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.04
""".format(
    h1=ddb_hex32("md5(s)"),
    h2=ddb_hex32("md5(s)", 8),
    hv=ddb_hex32("md5(s)"),
)


@query("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (md5 scheme) to banded LSH buckets to candidate pairs to exact-Jaccard verification."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    d = spread_small_input(read_table(spark, sf_dir, "documents"))
    return dedup.minhash_lsh_pairs(d, threshold=0.04, scheme="md5")


# SimHash IS oracle-checkable with the md5 hash scheme: signatures,
# banding, and hamming are all integer arithmetic an external engine
# can replay (cf. the CMS twin in plans/functions_showcase.py). The
# twin rebuilds 3-token shingles, 32-bit md5-prefix hashes, per-bit
# majority votes, 4×8-bit band blocking, and the hamming filter.
_SIMHASH_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS s
      FROM toks WHERE len(t) >= 3
      UNION ALL
      SELECT doc_id, '___EMPTY___' AS s FROM toks WHERE len(t) < 3
    ),
    h AS (SELECT doc_id, {{hex32}} AS h FROM sh),
    votes AS (
      SELECT doc_id, b.b AS bit,
             sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h CROSS JOIN (SELECT unnest(range(32)) AS b) b
      GROUP BY 1, 2
    ),
    word AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                      ELSE 0 END) AS BIGINT) AS sw
      FROM votes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, sw, b.band AS band, (sw >> (b.band * 8)) & 255 AS bucket
      FROM word CROSS JOIN (SELECT unnest(range(4)) AS band) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.sw AS sw_a, b.sw AS sw_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sw_a, sw_b)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sw_a, sw_b)) <= 3
""".format(hex32=ddb_hex32("md5(s)"))


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: per-bit majority signatures (md5 scheme), band blocking, Hamming verification."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(d, max_hamming=3, bits=32, band_bits=8, scheme="md5")


@query("dedup_incremental_lsh", oracle=_MINHASH_ORACLE)
def q_dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch incremental LSH dedup: batch 2 probes the persisted
    bucket index built from batch 1 — no re-signaturing of ingested
    docs. Equals a full recompute (asserted in tests/test_modules.py::
    test_incremental_minhash_dedup_equals_full_recompute) because
    banding is deterministic per doc — so the oracle is the SAME
    full-corpus md5-scheme twin as dedup_minhash_lsh: the driver
    hash-checks that two incremental batches reproduce the one-shot
    answer bit-for-bit."""
    d = read_table(spark, sf_dir, "documents")
    b1 = d.filter(F.col("doc_id") % 2 == 0)
    b2 = d.filter(F.col("doc_id") % 2 == 1)
    empty_index = spark.createDataFrame([], "band int, bucket bigint, _did bigint")
    p1, idx1 = dedup.incremental_minhash_dedup(
        empty_index, d.limit(0), b1, threshold=0.04, scheme="md5"
    )
    p2, _ = dedup.incremental_minhash_dedup(
        idx1, b1, b2, threshold=0.04, scheme="md5"
    )
    return p1.unionByName(p2)


# ---------------------------------------------------------------------------
# deterministic sampling / splits / sequence packing
# ---------------------------------------------------------------------------
@query(
    "train_test_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '1a' THEN 'test'
                ELSE 'train' END AS split
    FROM documents
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split: md5(doc_id) against a hex threshold - no RNG, stable across runs and partitionings."""
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    return sampling.train_test_split(d, "doc_id", test_threshold_hex="1a")


@query(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) <
          CASE lang WHEN 'en' THEN '40' WHEN 'es' THEN '80' ELSE '10' END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language hash sampling at different rates - deterministic, no corpus shuffle."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.stratified_hash_sample(
        d, "doc_id", "lang", {"en": "40", "es": "80"}, default_threshold_hex="10"
    ).select("doc_id", "lang")


@query(
    "pack_sequences",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
      FROM documents
    ),
    runs AS (
      SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok
      FROM toks
    )
    SELECT doc_id, lang, n_tokens,
           CAST(floor(start_tok / 512) AS BIGINT) AS seq_bin,
           start_tok % 512 AS bin_offset
    FROM runs
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing of token counts into fixed-capacity training bins per (bucket) - deterministic order."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", text.token_count(F.col("text")).alias("n_tokens")
    )
    return sampling.pack_sequences(
        toks, "n_tokens", capacity=512, order_col="doc_id", partition_cols=("lang",)
    )


def _near_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings plus injected near-duplicates: every 20th vector is
    re-appended under a shifted id with +0.001 added to each component
    (cosine vs the original ≈ 1, vs everything else ≤ ~0.52). The
    DuckDB oracle performs the identical double arithmetic."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bumped = e.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") + F.lit(0.001)).alias(
            "embedding"
        ),
    )
    return e.unionByName(bumped)


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM embeddings
      UNION ALL
      SELECT vec_id + 100000,
             list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.001)
      FROM embeddings WHERE vec_id % 20 = 0
    ),
    unit AS (
      SELECT vec_id,
             list_transform(embedding, x -> x /
               sqrt(list_reduce(list_prepend(0.0,
                 list_transform(embedding, y -> y * y)), (a, b) -> a + b))) AS uv
      FROM corpus
    )
    SELECT id_a, id_b, cos_sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_reduce(list_prepend(0.0,
               list_transform(list_zip(a.uv, b.uv), x -> x[1] * x[2])),
               (acc, v) -> acc + v) AS cos_sim
      FROM unit a JOIN unit b ON a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.9
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs by exact cosine over the injected-near-dup corpus (fold dot products, bit-exact)."""
    return dedup.embedding_near_dup_pairs(_near_dup_corpus(spark, sf_dir), threshold=0.9)


# Random-hyperplane LSH IS oracle-checkable: the planes are
# deterministic LCG literals (similarity.random_planes), so the twin
# embeds the SAME 16×64 doubles and replays signature bits, banding,
# candidate join, and the exact-cosine verify with the identical
# left-fold float arithmetic the cosine oracles already hash-match.
def _ddb_rh_sig(vec_expr: str, dim: int = 64, sig_bits: int = 16) -> str:
    from datalake_etlscripts_spark.operators.similarity import random_planes

    projs = []
    for i, p in enumerate(random_planes(dim, sig_bits)):
        # string-parse each double: DuckDB's bare-decimal DECIMAL->DOUBLE
        # conversion can be a ulp off the repr round-trip (cf. vectorops)
        lit = "[" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in p) + "]"
        proj = (
            f"list_reduce(list_prepend(0.0, list_transform(list_zip({vec_expr},"
            f" {lit}), x -> CAST(x[1] AS DOUBLE) * x[2])), (a, b) -> a + b)"
        )
        projs.append(f"(CASE WHEN {proj} > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(projs) + ")"


_EMB_LSH_ORACLE = f"""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM embeddings
      UNION ALL
      SELECT vec_id + 100000,
             list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.001)
      FROM embeddings WHERE vec_id % 20 = 0
    ),
    sigs AS (
      SELECT vec_id,
             list_transform(embedding, x -> x /
               sqrt(list_reduce(list_prepend(0.0,
                 list_transform(embedding, y -> y * y)), (a, b) -> a + b))) AS uv,
             {{sig}} AS sig
      FROM corpus
    ),
    banded AS (
      SELECT vec_id, uv, b.b AS band, (sig >> (b.b * 8)) & 255 AS bucket
      FROM sigs CROSS JOIN (VALUES (0), (1)) b(b)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                      a.uv AS uv_a, b.uv AS uv_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM (
      SELECT id_a, id_b,
             list_reduce(list_prepend(0.0,
               list_transform(list_zip(uv_a, uv_b), x -> x[1] * x[2])),
               (acc, v) -> acc + v) AS cos_sim
      FROM cand
    ) WHERE cos_sim >= 0.9
""".format(sig=_ddb_rh_sig("embedding"))


@query("dedup_embedding_lsh", oracle=_EMB_LSH_ORACLE)
def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH bands, exact-cosine verification of candidates only."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    # r07 (guide §2.5): single-task embeddings scan -> the per-row
    # hyperplane signature folds ran on one core (wall ~= JVM CPU).
    return dedup.embedding_near_dup_lsh(
        spread_small_input(_near_dup_corpus(spark, sf_dir)), threshold=0.9
    )


# SemDeDup IS oracle-checkable with a FIXED literal quantizer (the
# same 16 LCG cell centers as the IVF twin below): DuckDB replays the
# argmin cell assignment, the unit-normalize, the within-cell cosine
# pairs, the connected components (recursive CTE, cf. the clusters
# oracle), and the min-id representative choice. The trained-kmeans
# quantizer stays the production default of dedup.semantic_dedup
# (recall property tested in test_modules).
def _ivf_literal_centroids() -> list[list[float]]:
    """The shared fixed quantizer of dedup_semantic and ann_ivf_topk —
    ONE definition, used by both Spark queries and both oracles, so
    query and twin can never quantize with different centroids."""
    from datalake_etlscripts_spark.operators.similarity import random_planes

    # scale the ±1 LCG values toward the embedding range (±0.3)
    return [[0.1 * x for x in row] for row in random_planes(64, 16, seed=11)]


def _semantic_oracle() -> str:
    rows = []
    for ci, c in enumerate(_ivf_literal_centroids()):
        lit = "[" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in c) + "]"
        rows.append(f"({ci}, {lit})")
    cells = ", ".join(rows)
    return f"""
    WITH RECURSIVE corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + 100000,
             list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.001)
      FROM embeddings WHERE vec_id % 20 = 0
    ),
    dists AS (
      SELECT vec_id, v, cent.cid AS cid,
             list_reduce(list_prepend(0.0,
               list_transform(list_zip(v, cent.c),
                 x -> (x[1] - x[2]) * (x[1] - x[2]))), (a, b) -> a + b) AS d
      FROM corpus CROSS JOIN (VALUES {cells}) cent(cid, c)
    ),
    assigned AS (
      SELECT vec_id, v, cid FROM (
        SELECT vec_id, v, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS r
        FROM dists
      ) WHERE r = 1
    ),
    un AS (
      SELECT vec_id, cid,
             list_transform(v, x -> x /
               sqrt(list_reduce(list_prepend(0.0,
                 list_transform(v, y -> y * y)), (a, b) -> a + b))) AS uv
      FROM assigned
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM un a JOIN un b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE list_reduce(list_prepend(0.0,
              list_transform(list_zip(a.uv, b.uv), x -> x[1] * x[2])),
              (p, q) -> p + q) >= 0.9
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node)
    SELECT c.vec_id,
           coalesce(comp.component, c.vec_id) AS component,
           coalesce(comp.component, c.vec_id) = c.vec_id AS keep
    FROM corpus c LEFT JOIN comp ON comp.node = c.vec_id
    """


@query("dedup_semantic", oracle=_semantic_oracle())
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the injected-near-dup corpus: cluster, pair within
    cells, keep one representative per duplicate group (operators/
    dedup.semantic_dedup; recall property tested in test_modules)."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    # r07 (guide §2.5): single-row-group embeddings scan -> the
    # centroid-assignment folds and within-cell pair scoring ran on
    # one core; spread is a no-op once the input has real splits.
    return dedup.semantic_dedup(
        spread_small_input(_near_dup_corpus(spark, sf_dir)),
        threshold=0.9,
        centroids=_ivf_literal_centroids(),
    )


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------
@query(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
        list_reduce(list_prepend(0.0, list_transform(list_zip(qv, cv),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (a,b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(qv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(cv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))) AS cos_sim
      FROM c, q WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors per query vector - broadcast query block, per-query top-k window."""
    e = read_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(e, e.filter(F.col("vec_id") < 8), k=5)


_ANN_LSH_ORACLE = f"""
    WITH sigs AS (
      SELECT vec_id, {{sig}} AS sig FROM embeddings
    ),
    banded AS (
      SELECT vec_id, b.b AS band, (sig >> (b.b * 8)) & 255 AS bucket
      FROM sigs CROSS JOIN (VALUES (0), (1)) b(b)
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM banded q JOIN banded c ON q.band = c.band AND q.bucket = c.bucket
      WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
        list_reduce(list_prepend(0.0, list_transform(list_zip(qe.embedding, ce.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (a, b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(qe.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(ce.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))) AS cos_sim
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
""".format(sig=_ddb_rh_sig("embedding"))


_ANN_MP_ORACLE = f"""
    WITH sigs AS (
      SELECT vec_id, {{sig}} AS sig FROM embeddings
    ),
    cb AS (
      SELECT vec_id, b.b AS band, (sig >> (b.b * 8)) & 255 AS bucket
      FROM sigs CROSS JOIN (VALUES (0), (1)) b(b)
    ),
    qb AS (
      SELECT vec_id, b.b AS band,
             xor((sig >> (b.b * 8)) & 255, f.f) AS bucket
      FROM sigs
      CROSS JOIN (VALUES (0), (1)) b(b)
      CROSS JOIN (VALUES (0), (1), (2), (4), (8), (16), (32), (64), (128)) f(f)
      WHERE vec_id < 8
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM qb q JOIN cb c ON q.band = c.band AND q.bucket = c.bucket
      WHERE q.vec_id <> c.vec_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
        list_reduce(list_prepend(0.0, list_transform(list_zip(qe.embedding, ce.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (a, b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(qe.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(ce.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))) AS cos_sim
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
""".format(sig=_ddb_rh_sig("embedding"))


@query("ann_multiprobe_topk", oracle=_ANN_MP_ORACLE)
def q_ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: queries probe their bucket plus every 1-bit-flip bucket per band - extra-hash-table recall from ONE index, fan-out on the query side only; exact cosine re-rank."""
    e = read_table(spark, sf_dir, "embeddings")
    return similarity.lsh_multiprobe_topk(e, e.filter(F.col("vec_id") < 8), k=5)


@query("ann_lsh_topk", oracle=_ANN_LSH_ORACLE)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors: random-hyperplane signature bands generate candidates, exact cosine re-ranks."""
    e = read_table(spark, sf_dir, "embeddings")
    return similarity.lsh_ann_topk(e, e.filter(F.col("vec_id") < 8), k=5)


# ---------------------------------------------------------------------------
# multimodal plumbing: text→binary, mapInPandas decode + frame sampling
# ---------------------------------------------------------------------------
@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id AS id,
           CAST(16 + octet_length(encode(text)) % 240 AS INT) AS width,
           CAST(16 + (octet_length(encode(text)) * 7) % 240 AS INT) AS height,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing: attach bytes, extract (width, height, n_bytes, sha256) via the mapInPandas Arrow seam."""
    d = read_table(spark, sf_dir, "documents")
    return multimodal.decode_metadata(multimodal.attach_binary(d))


@query(
    "multimodal_frames",
    oracle="""
    SELECT doc_id AS id, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames
    FROM documents
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary columns: 1-to-N fixed-size byte slices via mapInPandas, counted per doc."""
    d = read_table(spark, sf_dir, "documents")
    frames = multimodal.frame_sample(multimodal.attach_binary(d))
    return frames.groupBy("id").agg(F.count(F.lit(1)).alias("n_frames"))


# ---------------------------------------------------------------------------
# REAL codec path (r4): synthesize genuine BMP/PPM bytes per doc
# (pure-Python encoders) and decode them with parse_image_header —
# actual header arithmetic on actual image bytes, not the fake
# length-derived stub. The oracle predicts width/height/byte-count
# from the id arithmetic: BMP = 54-byte headers + 4-byte-padded BGR
# rows; P6 = "P6\\n{w} {h}\\n255\\n" + 3wh.
# ---------------------------------------------------------------------------
@query(
    "multimodal_decode_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id AS id,
             CAST(1 + doc_id % 16 AS BIGINT) AS w,
             CAST(1 + (doc_id * 3) % 16 AS BIGINT) AS h
      FROM documents
    )
    SELECT id,
           CASE WHEN id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS fmt,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CASE WHEN id % 2 = 0
                THEN 54 + ((3 * w + 3) // 4 * 4) * h
                ELSE 3 + length(CAST(w AS VARCHAR)) + 1
                     + length(CAST(h AS VARCHAR)) + 1 + 4 + 3 * w * h
           END AS n_bytes
    FROM dims
    """,
)
def q_multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec decode: render a genuine BMP (even ids) or binary PPM (odd ids) per doc, then parse actual format headers for dimensions - mapInPandas both ways, no fake arithmetic."""
    d = read_table(spark, sf_dir, "documents")
    imgs = multimodal.synthesize_images(d)
    meta = multimodal.decode_metadata(
        imgs, decoder=multimodal.parse_image_header
    ).select("id", "width", "height", "n_bytes")
    return imgs.select("id", "fmt").join(meta, "id")


# ---------------------------------------------------------------------------
# Pixel-path closure of the multimodal story (r4 verdict task #8):
# decode the REAL pixel bytes (BMP stride/padding/offset honored, P6
# body parsed) and measure per-image luminance. The synthesized pixel
# byte j of image id is (id*31 + j) % 256, so the oracle predicts the
# exact integer channel sum by replaying that arithmetic over
# generate_series — while Spark's number comes from decoding the
# actual encoded bytes (a padding/stride bug would shift the sum).
# Mean luminance = sum_px / (3·n_px), one exact division.
# ---------------------------------------------------------------------------
@query(
    "image_pixel_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id AS id,
             CAST(1 + doc_id % 16 AS BIGINT) AS w,
             CAST(1 + (doc_id * 3) % 16 AS BIGINT) AS h,
             CAST((doc_id * 31) % 256 AS BIGINT) AS a,
             CAST(3 * (1 + doc_id % 16) * (1 + (doc_id * 3) % 16) AS BIGINT)
               AS n
      FROM documents
    ),
    exploded AS (
      SELECT id, a, unnest(generate_series(0, n - 1)) AS j FROM px
    ),
    sums AS (
      SELECT id, CAST(sum((a + j) % 256) AS BIGINT) AS sum_px
      FROM exploded GROUP BY 1
    )
    SELECT p.id,
           CASE WHEN p.id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS fmt,
           p.w * p.h AS n_px,
           s.sum_px,
           CAST(s.sum_px AS DOUBLE) / CAST(p.n AS DOUBLE) AS mean_lum
    FROM px p JOIN sums s USING (id)
    """,
)
def q_image_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real pixel statistics: decode the synthesized BMP/PPM images' actual pixel bytes (stride and padding handled) and report per-image channel sum + mean luminance - the oracle replays the synthesis arithmetic, the engine decodes real bytes."""
    d = read_table(spark, sf_dir, "documents")
    imgs = multimodal.synthesize_images(d)
    px = multimodal.decode_pixels(imgs)
    return (
        imgs.select("id", "fmt")
        .join(px, "id")
        .select(
            "id",
            "fmt",
            "n_px",
            "sum_px",
            (
                F.col("sum_px").cast("double")
                / (3 * F.col("n_px")).cast("double")
            ).alias("mean_lum"),
        )
    )


# PNG closes for real (round-5 verdict #5): stdlib zlib inflate + the
# five scanline unfilters (operators/multimodal.decode_png_pixels,
# validated against foreign-encoder PNGs). Same oracle scheme as
# image_pixel_stats — byte j of image id is (id*31 + j) % 256 over
# channels·w·h bytes, so DuckDB replays the arithmetic while Spark
# inflates and unfilters genuine PNG bytes (the encoder cycles filter
# r mod 5 per scanline, so a bug in ANY unfilter branch shifts sum_px).
@query(
    "png_pixel_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id AS id,
             CAST(CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 6 END
                  AS INT) AS color_type,
             CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
                  AS BIGINT) AS ch,
             CAST(1 + doc_id % 16 AS BIGINT) AS w,
             CAST(1 + (doc_id * 3) % 16 AS BIGINT) AS h,
             CAST((doc_id * 31) % 256 AS BIGINT) AS a
      FROM documents
    ),
    exploded AS (
      SELECT id, a, unnest(generate_series(0, ch * w * h - 1)) AS j
      FROM px
    ),
    sums AS (
      SELECT id, CAST(sum((a + j) % 256) AS BIGINT) AS sum_px
      FROM exploded GROUP BY 1
    )
    SELECT p.id, p.color_type, p.w * p.h AS n_px, s.sum_px,
           CAST(s.sum_px AS DOUBLE) / CAST(p.ch * p.w * p.h AS DOUBLE)
             AS mean_lum
    FROM px p JOIN sums s USING (id)
    """,
)
def q_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG pixel statistics: synthesize a genuine PNG per doc (gray/RGB/RGBA cycling with id mod 3, per-scanline filters cycling through all five types), inflate + unfilter the actual bytes, and report exact channel sums - the oracle replays the synthesis arithmetic, the engine decodes real compressed bytes."""
    d = read_table(spark, sf_dir, "documents")
    imgs = multimodal.synthesize_png_images(d)
    px = multimodal.decode_pixels(imgs)
    ch = F.when(F.col("id") % 3 == 0, 1).when(
        F.col("id") % 3 == 1, 3
    ).otherwise(4).cast("long")
    ct = F.when(F.col("id") % 3 == 0, 0).when(
        F.col("id") % 3 == 1, 2
    ).otherwise(6).cast("int")
    return px.select(
        "id",
        ct.alias("color_type"),
        "n_px",
        "sum_px",
        (
            F.col("sum_px").cast("double")
            / (ch * F.col("n_px")).cast("double")
        ).alias("mean_lum"),
    )


# Skip-gram co-occurrence (word2vec-style window statistics) WITHOUT
# the quadratic token self-join: pairs at distance d are a zip of the
# token array with its own d-shifted slice — pure per-row JVM array
# ops, zero shuffles until the pair count. The window bound (d ≤ 3) is
# structural, so the explode-join guard has nothing to flag.
@query(
    "skipgram_pmi",
    oracle="""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    uni AS (
      SELECT t AS term, count(*) AS n FROM (SELECT unnest(tk) AS t FROM tk)
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tokens FROM uni),
    pr AS (
      SELECT p.a AS a, p.b AS b, count(*) AS n_ab FROM (
        SELECT unnest(flatten(list_transform(range(1, 4), d ->
          list_transform(range(1, greatest(len(tk) - d + 1, 1)),
                         i -> struct_pack(a := tk[i], b := tk[i + d])))))
          AS p
        FROM tk) s(p)
      GROUP BY 1, 2
    )
    SELECT pr.a, pr.b, CAST(pr.n_ab AS BIGINT) AS n_ab,
           CAST(pr.n_ab AS DOUBLE) * tot.n_tokens
             / (CAST(ua.n AS DOUBLE) * ub.n) AS lift
    FROM pr, tot
    JOIN uni ua ON ua.term = pr.a
    JOIN uni ub ON ub.term = pr.b
    WHERE pr.n_ab >= 4
      AND CAST(pr.n_ab AS DOUBLE) * tot.n_tokens
            / (CAST(ua.n AS DOUBLE) * ub.n) >= 1.2
    """,
)
def q_skipgram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram lift (window <= 3): ordered co-occurrence pairs from shifted-slice zips of each doc's token array - shuffle-free pair generation, exact integer counts, broadcast unigram dims; the log-free PMI twin of collocations for word2vec-style windows."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = text.tokens(F.col("text"))
    uni = (
        d.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = uni.agg(F.sum("n").alias("n_tokens"))

    def pairs_at(tk):
        return F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda dd: F.zip_with(
                    F.slice(
                        tk, F.lit(1), F.greatest(F.size(tk) - dd, F.lit(0))
                    ),
                    F.slice(
                        tk, dd + 1, F.greatest(F.size(tk) - dd, F.lit(0))
                    ),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )

    pr = (
        d.select(F.explode(pairs_at(toks)).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    ua = uni.select(F.col("term").alias("a"), F.col("n").alias("_na"))
    ub = uni.select(F.col("term").alias("b"), F.col("n").alias("_nb"))
    lift = (
        F.col("n_ab").cast("double")
        * F.col("n_tokens")
        / (F.col("_na").cast("double") * F.col("_nb"))
    )
    return (
        pr.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .filter((F.col("n_ab") >= 4) & (lift >= 1.2))
        .select("a", "b", "n_ab", lift.alias("lift"))
    )


# GIF closes as the SECOND compressed format: pure-Python LZW
# (operators/multimodal._lzw_decode — full variable-width decoder with
# CLEAR/EOI/KwKwK, validated against 9 foreign GIFs incl. interlaced
# and local-color-table ones). Pixel index j of image id is
# (id*31 + j) % 16 over a 16-entry palette with entry k =
# (5k, 11k, 17k) mod 256, so the oracle replays the palette-resolved
# RGB sum while the engine LZW-decodes genuine GIF bytes.
@query(
    "gif_pixel_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id AS id,
             CAST(1 + doc_id % 16 AS BIGINT) AS w,
             CAST(1 + (doc_id * 3) % 16 AS BIGINT) AS h,
             CAST((doc_id * 31) % 16 AS BIGINT) AS a
      FROM documents
    ),
    e AS (
      SELECT id, a, unnest(generate_series(0, w * h - 1)) AS j FROM px
    ),
    s AS (
      SELECT id,
             CAST(sum(((a + j) % 16 * 5) % 256
                      + ((a + j) % 16 * 11) % 256
                      + ((a + j) % 16 * 17) % 256) AS BIGINT) AS sum_px
      FROM e GROUP BY 1
    )
    SELECT p.id, p.w * p.h AS n_px, s.sum_px
    FROM px p JOIN s USING (id)
    """,
)
def q_gif_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real GIF pixel statistics: synthesize genuine LZW-coded GIF bytes per doc, decompress and palette-resolve the actual indices, and report exact RGB sums - the oracle replays the synthesis arithmetic, the engine runs a full LZW decoder on real bytes."""
    d = read_table(spark, sf_dir, "documents")
    imgs = multimodal.synthesize_gif_images(d)
    return multimodal.decode_pixels(imgs).select("id", "n_px", "sum_px")


# The resize stub closes too: nn_resize is a REAL nearest-neighbor
# resampler over genuinely decoded BMP/PPM/PNG pixels (out pixel (x,y)
# samples source (x·w div 4, y·h div 4) — pure integer mapping), so
# the oracle replays byte index arithmetic while the engine decodes,
# remaps, and re-emits real pixel bytes through the same resize seam
# production uses (fake_resize/set_resizer stays for codec formats).
@query(
    "image_resize_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id AS id,
             CAST(1 + doc_id % 16 AS BIGINT) AS w,
             CAST(1 + (doc_id * 3) % 16 AS BIGINT) AS h,
             CAST((doc_id * 31) % 256 AS BIGINT) AS a
      FROM documents
    ),
    g AS (
      SELECT id, w, h, a, unnest(generate_series(0, 47)) AS t FROM px
    ),
    m AS (
      SELECT id, a,
             (((t // 12) * h // 4) * w + ((t % 12) // 3) * w // 4) * 3
               + t % 3 AS j
      FROM g
    ),
    s AS (
      SELECT id, CAST(sum((a + j) % 256) AS BIGINT) AS sum_out
      FROM m GROUP BY 1
    )
    SELECT p.id, CAST(4 AS INT) AS out_w, CAST(4 AS INT) AS out_h,
           CAST(48 AS BIGINT) AS n_bytes_out, s.sum_out
    FROM px p JOIN s USING (id)
    """,
)
def q_image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image resize: synthesize genuine BMP/PPM bytes, nearest-neighbor-resample the DECODED pixels to 4x4 through the production resize seam, and report exact output byte sums - the oracle replays the integer source-index mapping, the engine decodes and remaps real bytes."""
    d = read_table(spark, sf_dir, "documents")
    imgs = multimodal.synthesize_images(d)
    rs = multimodal.resize_images(
        imgs, target_w=4, target_h=4, resizer=multimodal.nn_resize
    )
    stats = multimodal.binary_byte_stats(rs)
    return (
        rs.select("id", "out_w", "out_h", "n_bytes_out")
        .join(stats.select("id", F.col("sum_bytes").alias("sum_out")), "id")
    )


# Video completes the multimodal trifecta: RIFF/AVI with uncompressed
# 24-bpp DIB frames decodes for real (container walk → strf dims →
# movi frame chunks → stride strip + bottom-up flip;
# operators/multimodal.decode_avi_frames). Frame f's byte j of clip id
# is (id*31 + f*7 + j) % 256, so the oracle replays the arithmetic
# while the engine walks genuine RIFF structure (a stride or flip bug
# shifts sum_px). Compressed codecs stay behind set_decoder.
@query(
    "video_frame_stats",
    oracle="""
    WITH v AS (
      SELECT doc_id AS id,
             CAST(1 + doc_id % 8 AS INT) AS w,
             CAST(1 + (doc_id * 3) % 8 AS INT) AS h,
             CAST(1 + doc_id % 4 AS BIGINT) AS nf,
             CAST((doc_id * 31) % 256 AS BIGINT) AS a
      FROM documents
    ),
    fr AS (
      SELECT id, w, h, a,
             unnest(generate_series(0, nf - 1)) AS f
      FROM v
    ),
    b AS (
      SELECT id, f, a,
             unnest(generate_series(0, 3 * w * h - 1)) AS j
      FROM fr
    ),
    fs AS (
      SELECT id, f, CAST(sum((a + f * 7 + j) % 256) AS BIGINT) AS s
      FROM b GROUP BY 1, 2
    ),
    agg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(s) AS BIGINT) AS sum_px,
             CAST(max(s) AS BIGINT) AS max_frame_sum
      FROM fs GROUP BY 1
    )
    SELECT v.id, v.w AS width, v.h AS height,
           g.n_frames, g.sum_px, g.max_frame_sum
    FROM v JOIN agg g USING (id)
    """,
)
def q_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video statistics: synthesize a genuine RIFF/AVI per doc (1-4 uncompressed DIB frames), walk the actual container bytes, strip stride padding and flip rows, and report exact per-clip frame sums - the oracle replays the synthesis arithmetic, the engine decodes real bytes."""
    d = read_table(spark, sf_dir, "documents")
    clips = multimodal.synthesize_avi_videos(d)
    return multimodal.decode_video_stats(clips)


# Audio closes for real too (the WAV twin of the PNG path): RIFF/PCM
# is uncompressed, so the full chunk walk + 16-bit signed LE sample
# decode is honest in-sandbox (operators/multimodal.decode_wav_samples,
# cross-validated against stdlib `wave` in tests). Sample j of clip id
# is ((id*7 + j*13) % 65536) - 32768 over (64 + id%256)·channels
# frames, so the oracle replays the arithmetic while the engine
# decodes genuine RIFF bytes (a sign/endianness bug shifts sum_abs).
@query(
    "audio_sample_stats",
    oracle="""
    WITH a AS (
      SELECT doc_id AS id,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT)
               AS channels,
             CAST((64 + doc_id % 256)
                  * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END)
                  AS BIGINT) AS n
      FROM documents
    ),
    s AS (
      SELECT id,
             abs(CAST((id * 7 + unnest(generate_series(0, n - 1)) * 13)
                      % 65536 AS BIGINT) - 32768) AS v
      FROM a
    ),
    agg AS (
      SELECT id, CAST(sum(v) AS BIGINT) AS sum_abs,
             CAST(max(v) AS BIGINT) AS peak
      FROM s GROUP BY 1
    )
    SELECT a.id, CAST(8000 AS INT) AS sample_rate, a.channels,
           a.n AS n_samples, g.sum_abs, g.peak
    FROM a JOIN agg g USING (id)
    """,
)
def q_audio_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio statistics: synthesize a genuine RIFF/PCM WAV per doc (mono/stereo alternating), decode the actual bytes (chunk walk, 16-bit signed LE), and report exact per-clip sample sums and peaks - the oracle replays the synthesis arithmetic, the engine decodes real bytes."""
    d = read_table(spark, sf_dir, "documents")
    clips = multimodal.synthesize_wav_audio(d)
    return multimodal.decode_audio_stats(clips)


# REAL baseline TIFF decode (r12): both byte orders (II for even ids,
# MM for odd), gray/RGB, multi-strip layouts (rows_per_strip = 1+id%4
# forces the strip walk). The oracle replays the synthesis arithmetic;
# the engine walks genuine IFDs — an endianness, inline-value or
# strip-offset bug shifts sum_px.
@query(
    "tiff_pixel_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id AS id,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END AS INT)
               AS channels,
             CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END
               AS byte_order,
             CAST(1 + doc_id % 16 AS BIGINT) AS w,
             CAST(1 + (doc_id * 5) % 16 AS BIGINT) AS h
      FROM documents
    ),
    exploded AS (
      SELECT id,
             (id * 37 + unnest(generate_series(0, channels * w * h - 1))
              * 11) % 256 AS b
      FROM px
    ),
    sums AS (
      SELECT id, CAST(sum(b) AS BIGINT) AS sum_px FROM exploded GROUP BY 1
    )
    SELECT p.id, p.channels, p.byte_order, p.w * p.h AS n_px, s.sum_px
    FROM px p JOIN sums s USING (id)
    """,
)
def q_tiff_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real baseline TIFF pixel statistics: synthesize a genuine TIFF per doc (II/MM byte orders alternating, gray/RGB, multi-strip), walk the actual IFD and strips, and report exact channel sums - the oracle replays the synthesis arithmetic, the engine decodes real bytes."""
    d = read_table(spark, sf_dir, "documents")
    imgs = multimodal.synthesize_tiff_images(d)
    px = multimodal.decode_pixels(imgs)
    return px.select(
        "id",
        F.when(F.col("id") % 3 == 0, 1).otherwise(3)
        .cast("int")
        .alias("channels"),
        F.when(F.col("id") % 2 == 0, F.lit("II"))
        .otherwise(F.lit("MM"))
        .alias("byte_order"),
        "n_px",
        "sum_px",
    )


# REAL QOI decode (r12): the modern lossless raster format whose
# bitstream is pure byte arithmetic — runs, 64-slot index hits, 2-bit
# diffs, luma deltas, literal RGB(A). The quadratic pixel pattern
# makes every op type appear; the oracle replays the synthesis
# arithmetic while the engine walks genuine QOI streams.
@query(
    "qoi_pixel_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id AS id,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS INT)
               AS channels,
             CAST(1 + doc_id % 16 AS BIGINT) AS w,
             CAST(1 + (doc_id * 7) % 16 AS BIGINT) AS h
      FROM documents
    ),
    exploded AS (
      SELECT id,
             (id * 13 + unnest(generate_series(0, channels * w * h - 1))
              * unnest(generate_series(0, channels * w * h - 1))) % 256 AS b
      FROM px
    ),
    sums AS (
      SELECT id, CAST(sum(b) AS BIGINT) AS sum_px FROM exploded GROUP BY 1
    )
    SELECT p.id, p.channels, p.w * p.h AS n_px, s.sum_px
    FROM px p JOIN sums s USING (id)
    """,
)
def q_qoi_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real QOI pixel statistics: synthesize a genuine QOI per doc (RGB/RGBA alternating, quadratic pixel pattern exercising every op type), decode the actual bitstream, and report exact channel sums - the oracle replays the synthesis arithmetic."""
    d = read_table(spark, sf_dir, "documents")
    imgs = multimodal.synthesize_qoi_images(d)
    px = multimodal.decode_pixels(imgs)
    return px.select(
        "id",
        F.when(F.col("id") % 2 == 0, 3).otherwise(4)
        .cast("int")
        .alias("channels"),
        "n_px",
        "sum_px",
    )


# REAL G.711 µ-law expansion (r12): same synthesis scheme as the PCM
# WAV path but companded through the µ-law encoder, so the engine's
# decode exercises the real lossy segment arithmetic — and the oracle
# REPLAYS THE FULL COMPANDING ROUND-TRIP IN SQL (clip, bias, segment
# CASE ladder, mantissa shift, inverse expansion), every sample an
# exact integer on both sides.
@query(
    "mulaw_audio_stats",
    oracle="""
    WITH a AS (
      SELECT doc_id AS id,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT)
               AS channels,
             CAST((64 + doc_id % 256)
                  * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END)
                  AS BIGINT) AS n
      FROM documents
    ),
    s AS (
      SELECT id,
             CAST((id * 7 + unnest(generate_series(0, n - 1)) * 13)
                  % 65536 AS BIGINT) - 32768 AS x
      FROM a
    ),
    enc AS (
      SELECT id, least(abs(x), 32635) + 132 AS v FROM s
    ),
    ee AS (
      SELECT id, v,
             CASE WHEN (v >> 7) >= 128 THEN 7
                  WHEN (v >> 7) >= 64 THEN 6
                  WHEN (v >> 7) >= 32 THEN 5
                  WHEN (v >> 7) >= 16 THEN 4
                  WHEN (v >> 7) >= 8 THEN 3
                  WHEN (v >> 7) >= 4 THEN 2
                  WHEN (v >> 7) >= 2 THEN 1
                  ELSE 0 END AS e
      FROM enc
    ),
    dec AS (
      SELECT id,
             (((v >> (e + 3)) & 15) * 8 + 132) * (1 << e) - 132 AS mag
      FROM ee
    ),
    agg AS (
      SELECT id, CAST(sum(mag) AS BIGINT) AS sum_abs,
             CAST(max(mag) AS BIGINT) AS peak
      FROM dec GROUP BY 1
    )
    SELECT a.id, CAST(8000 AS INT) AS sample_rate, a.channels,
           a.n AS n_samples, g.sum_abs, g.peak
    FROM a JOIN agg g USING (id)
    """,
)
def q_mulaw_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real G.711 mu-law audio statistics: synthesize a genuine format-7 RIFF clip per doc, expand the actual companded bytes, and report exact decoded sums and peaks - the oracle replays clip/bias/segment/mantissa companding in pure SQL."""
    d = read_table(spark, sf_dir, "documents")
    clips = multimodal.synthesize_mulaw_audio(d)
    return multimodal.decode_audio_stats(clips)


# IVF IS oracle-checkable with a FIXED literal coarse quantizer: the
# 16 cell centers are deterministic LCG literals shared into the twin
# (same trick as the hyperplane planes above), so DuckDB replays the
# argmin cell assignment, the 3-cell probe, the candidate equi-join,
# and the exact-cosine rerank bit-for-bit. The trained-kmeans
# quantizer stays the production default of similarity.ivf_ann_topk
# (recall-tested in tests/test_modules.py) — training samples are not
# an external engine's to replay.
def _ddb_ivf_cells() -> str:
    """VALUES list: (cid, 64-double centroid literal)."""
    rows = []
    for ci, c in enumerate(_ivf_literal_centroids()):
        lit = "[" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in c) + "]"
        rows.append(f"({ci}, {lit})")
    return ", ".join(rows)


_ANN_IVF_ORACLE = f"""
    WITH c AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    dists AS (
      SELECT vec_id, v, cent.cid AS cid,
             list_reduce(list_prepend(0.0,
               list_transform(list_zip(v, cent.c),
                 x -> (x[1] - x[2]) * (x[1] - x[2]))), (a, b) -> a + b) AS d
      FROM c CROSS JOIN (VALUES {_ddb_ivf_cells()}) cent(cid, c)
    ),
    ranked AS (
      SELECT vec_id, v, cid, d,
             row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS r
      FROM dists
    ),
    corpus AS (SELECT vec_id AS neighbor_id, v AS cv, cid AS cell FROM ranked WHERE r = 1),
    probes AS (SELECT vec_id AS query_id, v AS qv, cid AS cell
               FROM ranked WHERE vec_id < 8 AND r <= 3),
    scored AS (
      SELECT query_id, neighbor_id,
        list_reduce(list_prepend(0.0, list_transform(list_zip(qv, cv),
            x -> x[1] * x[2])), (a, b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(qv,
             x -> x * x)), (a, b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(cv,
             x -> x * x)), (a, b) -> a + b))) AS cos_sim
      FROM corpus JOIN probes ON corpus.cell = probes.cell
      WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
"""


@query("ann_ivf_topk", oracle=_ANN_IVF_ORACLE)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the fixed literal quantizer: argmin cell assignment, 3-cell probe, exact-cosine rerank."""
    e = read_table(spark, sf_dir, "embeddings")
    return similarity.ivf_ann_topk(
        e, e.filter(F.col("vec_id") < 8), k=5, centroids=_ivf_literal_centroids()
    )


@query(
    "dedup_bow",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- shuffled-token twin: same token SET, different order
      SELECT doc_id + 2000000,
             array_to_string(list_reverse(list_filter(string_split(text,' '), x -> x <> '')), ' ')
      FROM documents WHERE doc_id % 25 = 0
    )
    SELECT fp, n_docs, doc_ids FROM (
      SELECT md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split(text,' '), x -> x <> ''))), ' ')) AS fp,
             count(*) AS n_docs,
             array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
      FROM corpus GROUP BY 1
    ) WHERE n_docs > 1
    """,
)
def q_dedup_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words duplicate groups: same token SET regardless of order/repetition."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    shuffled = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(F.reverse(text.tokens(F.col("text"))), " ").alias("text"),
    )
    corpus = d.unionByName(shuffled)
    return dedup.bow_duplicates(corpus).withColumn(
        "doc_ids", F.array_join("doc_ids", ",")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (corpus filtering)
# ---------------------------------------------------------------------------
@query(
    "text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    grams AS (
      SELECT doc_id, tk,
             list_transform(range(1, greatest(len(tk), 1)),
                            i -> tk[i] || ' ' || tk[i+1]) AS g2,
             list_transform(range(1, greatest(len(tk) - 1, 1)),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS g3
      FROM toks
    )
    SELECT doc_id,
      CAST(list_max(list_transform(list_distinct(tk),
           d -> len(list_filter(tk, x -> x = d)))) AS DOUBLE) / len(tk) AS top_token_frac,
      CAST(list_max(list_transform(list_distinct(g2),
           d -> len(list_filter(g2, x -> x = d)))) AS DOUBLE) / len(g2) AS top_2gram_frac,
      CAST(list_max(list_transform(list_distinct(g3),
           d -> len(list_filter(g3, x -> x = d)))) AS DOUBLE) / len(g3) AS top_3gram_frac
    FROM grams
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals: fraction of the most common token / 2-gram / 3-gram per document."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    d = spread_small_input(read_table(spark, sf_dir, "documents"))
    return text.repetition_features(d).select(
        "doc_id", "top_token_frac", "top_2gram_frac", "top_3gram_frac"
    )


# ---------------------------------------------------------------------------
# PII detection + redaction (documents salted deterministically with
# synthetic PII so every pattern fires; both engines salt identically)
# ---------------------------------------------------------------------------
@query(
    "pii_redaction",
    oracle=r"""
    WITH salted AS (
      SELECT doc_id,
             text || CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN ' contact john.doe@example.com now'
               WHEN 1 THEN ' call +34 612 345 678 ok'
               WHEN 2 THEN ' iban ES91 2100 0418 4502 0005 1332 end'
               ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
      len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
      len(regexp_extract_all(text, '\+[0-9]{2} [0-9]{3} [0-9]{3} [0-9]{3}')) AS n_phone,
      len(regexp_extract_all(text, '[A-Z]{2}[0-9]{2}( [0-9]{4}){5}')) AS n_iban,
      regexp_replace(regexp_replace(regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\+[0-9]{2} [0-9]{3} [0-9]{3} [0-9]{3}', '<PHONE>', 'g'),
        '[A-Z]{2}[0-9]{2}( [0-9]{4}){5}', '<IBAN>', 'g') AS redacted
    FROM salted
    """,
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII counts (email/phone/IBAN) and typed-placeholder redaction, pure regexp_replace."""
    d = read_table(spark, sf_dir, "documents")
    salt = (
        F.when(
            (F.col("doc_id") % 4).cast("int") == 0,
            F.lit(" contact john.doe@example.com now"),
        )
        .when((F.col("doc_id") % 4).cast("int") == 1, F.lit(" call +34 612 345 678 ok"))
        .when(
            (F.col("doc_id") % 4).cast("int") == 2,
            F.lit(" iban ES91 2100 0418 4502 0005 1332 end"),
        )
        .otherwise(F.lit(""))
    )
    salted = d.select("doc_id", F.concat(F.col("text"), salt).alias("text"))
    counts = text.pii_counts(F.col("text"))
    return salted.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["iban"].alias("n_iban"),
        text.redact_pii(F.col("text")).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination: corpus docs sharing a 5-gram with the
# benchmark set (benchmark = doc_id % 97 == 0; contamination injected
# as prefixed twins of benchmark docs, identically in both engines)
# ---------------------------------------------------------------------------
@query(
    "decontaminate",
    oracle="""
    WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
    corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT doc_id + 3000000, 'copied doc ' || text FROM bench
    ),
    btk AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM bench),
    bsh AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS sh
      FROM btk
    ),
    ctk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM corpus
    ),
    csh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS sh
      FROM ctk
    )
    SELECT doc_id, count(*) AS n_hit_shingles
    FROM csh WHERE sh IN (SELECT sh FROM bsh)
    GROUP BY doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: 5-gram overlap against a broadcast benchmark shingle set (semi-join, corpus never shuffles)."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0).unionByName(
        bench.select(
            (F.col("doc_id") + 3000000).alias("doc_id"),
            F.concat(F.lit("copied doc "), F.col("text")).alias("text"),
        )
    )
    return dedup.contamination_hits(corpus, bench, k=5)


# ---------------------------------------------------------------------------
# Decontamination n-gram sweep (r10): the 4th tuning-curve axis beside
# the band/nprobe/matryoshka sweeps — how the shingle size k trades
# contamination recall against false positives. One summary row per k
# over the SAME planted-contamination corpus the decontaminate query
# uses: shorter shingles flag more docs (k=3 catches common phrases —
# false positives), longer ones only near-verbatim copies. Evidence
# BEFORE fixing the production k, exactly like dedup_lsh_band_sweep.
# ---------------------------------------------------------------------------
def _ddb_shingle(k: int) -> str:
    cat = "||' '||".join(f"tk[i+{j}]" if j else "tk[i]" for j in range(k))
    return (
        f"list_distinct(list_transform(range(1, greatest(len(tk) - {k - 2},"
        f" 1)), i -> {cat}))"
    )


def _decon_sweep_oracle(ks=(3, 5, 8)) -> str:
    parts = [
        """
    WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
    corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT doc_id + 3000000, 'copied doc ' || text FROM bench
    ),
    btk AS MATERIALIZED (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM bench),
    ctk AS MATERIALIZED (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM corpus)"""
    ]
    sels = []
    for k in ks:
        parts.append(
            f""",
    bsh{k} AS (SELECT DISTINCT unnest({_ddb_shingle(k)}) AS sh FROM btk),
    csh{k} AS (SELECT doc_id, unnest({_ddb_shingle(k)}) AS sh FROM ctk),
    hit{k} AS (
      SELECT doc_id, count(*) AS h FROM csh{k}
      WHERE sh IN (SELECT sh FROM bsh{k}) GROUP BY 1)"""
        )
        sels.append(
            f"""SELECT CAST({k} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_docs_flagged,
           CAST(sum(h) AS BIGINT) AS total_hit_shingles
    FROM hit{k}"""
        )
    parts.append("\n    " + "\n    UNION ALL ".join(sels))
    return "".join(parts)


@query("decontamination_ngram_sweep", oracle=_decon_sweep_oracle())
def q_decontamination_ngram_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuning curve for the decontamination shingle size: per k in {3,5,8} how many docs get flagged and how many shingles hit, over the planted-contamination corpus - pick k from the curve, not folklore. Tuning-time audit: three corpus passes here; at 100 TB run it on a sample (the curve's SHAPE is what's read) or tokenize once with positions and build all widths in one pass."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0).unionByName(
        bench.select(
            (F.col("doc_id") + 3000000).alias("doc_id"),
            F.concat(F.lit("copied doc "), F.col("text")).alias("text"),
        )
    )
    out = None
    for k in (3, 5, 8):
        hits = dedup.contamination_hits(corpus, bench, k=k)
        row = hits.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_flagged"),
            F.sum("n_hit_shingles").cast("long").alias("total_hit_shingles"),
        ).select(
            F.lit(k).cast("long").alias("k"),
            "n_docs_flagged",
            "total_hit_shingles",
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# quality-decile bucketing (audit the worst slices of the corpus)
# ---------------------------------------------------------------------------
@query(
    "quality_deciles",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_distinct(list_filter(string_split(text,' '), x -> x <> ''))) AS DOUBLE)
             / len(list_filter(string_split(text,' '), x -> x <> '')) AS distinct_ratio
      FROM documents
    )
    SELECT doc_id, distinct_ratio,
           ntile(10) OVER (ORDER BY distinct_ratio, doc_id) AS decile
    FROM t
    """,
)
def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global deciles WITHOUT a global single-partition sort
    (the r1 plan used ntile over a global orderBy — the scale-killer).

    Scale shape (distributed sort-rank): (1) approxQuantile picks
    range-bucket boundaries — approximation only affects bucket SIZE
    BALANCE, never correctness; (2) rows bucket by value with a
    broadcast literal when-chain, equal values always share a bucket;
    (3) row_number windows run PER BUCKET (parallel, bounded state) and
    a driver-side cumsum of the ≤17 bucket counts converts them to
    exact global ranks; (4) ntile's first-r-groups-larger arithmetic
    maps rank → decile. Identical total order (distinct_ratio, doc_id)
    and identical ntile semantics to the SQL oracle — hash-exact — but
    every window is bucket-partitioned. The two extra driver actions
    are tiny aggregates (15 doubles, ≤17 longs)."""
    from pyspark.sql import Window as W

    d = read_table(spark, sf_dir, "documents")
    scored = text.quality_features(d).select("doc_id", "distinct_ratio")

    probes = [i / 16 for i in range(1, 16)]
    bounds = sorted(set(scored.approxQuantile("distinct_ratio", probes, 0.01)))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col("distinct_ratio") > b, 1).otherwise(0)
    bucketed = scored.withColumn("_bkt", bucket)

    counts = {
        r["_bkt"]: r["cnt"]
        for r in bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = sum(counts.values())
    offsets, acc = {}, 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    off = F.lit(0)
    for k, v in offsets.items():
        off = F.when(F.col("_bkt") == k, v).otherwise(off)

    wb = W.partitionBy("_bkt").orderBy("distinct_ratio", "doc_id")
    ranked = bucketed.withColumn("_rank", off + F.row_number().over(wb))
    q, r = divmod(n, 10)
    rank = F.col("_rank")
    if q == 0:  # n < 10: every row its own tile
        decile = rank - 1
    else:
        decile = F.when(
            rank <= r * (q + 1), ((rank - 1) / (q + 1)).cast("long")
        ).otherwise(r + ((rank - 1 - r * (q + 1)) / q).cast("long"))
    return ranked.select(
        "doc_id", "distinct_ratio", (decile + F.lit(1)).cast("int").alias("decile")
    )


# ---------------------------------------------------------------------------
# curriculum phases (r4): the training-ORDER planner on top of the
# decile machinery — docs split into 4 exact quality quartiles
# (cleanest first), reported as the per-phase schedule a curriculum
# trainer consumes: doc count, token budget, token share, quality
# range. Same distributed sort-rank plan as quality_deciles (bucketed
# windows, ≤9-long driver cumsum), one extra per-phase aggregate.
# ---------------------------------------------------------------------------
@query(
    "curriculum_phases",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_distinct(list_filter(string_split(text,' '), x -> x <> ''))) AS DOUBLE)
             / len(list_filter(string_split(text,' '), x -> x <> '')) AS dr,
             len(list_filter(string_split(text,' '), x -> x <> '')) AS ntoks
      FROM documents
    ),
    r AS (
      SELECT *, ntile(4) OVER (ORDER BY dr DESC, doc_id) AS phase FROM t
    ),
    g AS (
      SELECT phase, count(*) AS n_docs, CAST(sum(ntoks) AS BIGINT) AS n_tokens,
             min(dr) AS min_quality, max(dr) AS max_quality
      FROM r GROUP BY phase
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM g)
    SELECT phase, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / total AS token_share,
           min_quality, max_quality
    FROM g, tot
    """,
)
def q_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule over exact quality quartiles (cleanest-first ntile(4) on distinct-token ratio): per-phase doc count, token budget + share, quality range - the distributed sort-rank plan, no global window.

    Phase 1 = highest distinct-token ratio (least repetitive) — the
    'clean first, noisy later' curriculum ordering; token budgets are
    exact integer sums, the share one double division of exact ints."""
    from pyspark.sql import Window as W

    d = read_table(spark, sf_dir, "documents")
    scored = text.quality_features(d).select("doc_id", "distinct_ratio", "n_tokens")

    probes = [i / 16 for i in range(1, 16)]
    bounds = sorted(set(scored.approxQuantile("distinct_ratio", probes, 0.01)))
    # DESCENDING quality order: bucket 0 holds the HIGHEST ratios
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col("distinct_ratio") <= b, 1).otherwise(0)
    bucketed = scored.withColumn("_bkt", bucket)

    counts = {
        r["_bkt"]: r["cnt"]
        for r in bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = sum(counts.values())
    offsets, acc = {}, 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    off = F.lit(0)
    for k, v in offsets.items():
        off = F.when(F.col("_bkt") == k, v).otherwise(off)
    wb = W.partitionBy("_bkt").orderBy(F.desc("distinct_ratio"), "doc_id")
    ranked = bucketed.withColumn("_rank", off + F.row_number().over(wb))
    q, r = divmod(n, 4)
    rank = F.col("_rank")
    if q == 0:
        phase = rank - 1
    else:
        phase = F.when(
            rank <= r * (q + 1), ((rank - 1) / (q + 1)).cast("long")
        ).otherwise(r + ((rank - 1 - r * (q + 1)) / q).cast("long"))
    g = (
        ranked.withColumn("phase", (phase + F.lit(1)).cast("int"))
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("distinct_ratio").alias("min_quality"),
            F.max("distinct_ratio").alias("max_quality"),
        )
    )
    tot = g.agg(F.sum("n_tokens").alias("_total"))
    return g.crossJoin(F.broadcast(tot)).select(
        "phase",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("_total")).alias("token_share"),
        "min_quality",
        "max_quality",
    )


# ---------------------------------------------------------------------------
# vocabulary statistics (corpus term/document frequencies)
# ---------------------------------------------------------------------------
@query(
    "vocab_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      FROM documents
    )
    SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_tf
    FROM tok GROUP BY term
    ORDER BY doc_freq DESC, total_tf DESC, term LIMIT 100
    """,
)
def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary with deterministic tie-break - dictionary-sized window only."""
    d = read_table(spark, sf_dir, "documents")
    return (
        text.term_stats(d)
        .orderBy(F.col("doc_freq").desc(), F.col("total_tf").desc(), "term")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# vocabulary id assignment + corpus encoding (text → token ids): the
# dictionary step of the training pipeline. Ids are frequency-rank
# (deterministic tie-break) so the mapping is engine-stable; OOV → 0.
# ---------------------------------------------------------------------------
@query(
    "vocab_encode",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      FROM documents
    ),
    stats AS (
      SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_tf
      FROM tok GROUP BY term
    ),
    vocab AS (
      SELECT term,
             row_number() OVER (ORDER BY doc_freq DESC, total_tf DESC, term)
               AS token_id
      FROM stats
    ),
    pos AS (
      SELECT doc_id,
             unnest(list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                                   (x, i) -> struct_pack(ord := i, term := x))) AS p
      FROM documents
    )
    SELECT doc_id,
           string_agg(CAST(v.token_id AS VARCHAR), ',' ORDER BY p.ord) AS ids
    FROM pos JOIN vocab v ON p.term = v.term
    GROUP BY doc_id
    """,
)
def q_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoding to token ids via the broadcast frequency-ranked vocabulary (OOV to 0)."""
    d = read_table(spark, sf_dir, "documents")
    vocab = text.vocab_table(d)
    enc = text.encode_corpus(d, vocab)
    return enc.filter(F.size("token_ids") > 0).select(
        "doc_id",
        F.concat_ws(",", F.transform("token_ids", lambda x: x.cast("string"))).alias(
            "ids"
        ),
    )


# ---------------------------------------------------------------------------
# END-TO-END corpus preparation: the canonical training-data pipeline
# composed from the operators above — inject dups (deterministic, both
# engines) → quality filter → exact dedup keep-first → overlapping
# chunking. One query proving the stages compose; each stage's scale
# shape is documented/tested at its own operator.
# ---------------------------------------------------------------------------
@query(
    "prepare_training_corpus",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    ),
    q AS (
      SELECT doc_id, text,
             len(list_filter(string_split(text,' '), x -> x <> '')) AS n_tokens,
             len(list_distinct(list_filter(string_split(text,' '), x -> x <> ''))) AS n_distinct
      FROM corpus
    ),
    filtered AS (
      SELECT doc_id, text FROM q
      WHERE n_tokens >= 10 AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.2
    ),
    keep AS (SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)),
    deduped AS (
      SELECT f.doc_id, f.text FROM filtered f
      WHERE f.doc_id IN (SELECT doc_id FROM keep)
    ),
    c AS (
      SELECT doc_id, text,
             range(1, greatest(length(text) - 40, 1) + 1, 160) AS starts
      FROM deduped WHERE length(text) > 0
    ),
    e AS (
      SELECT doc_id, text, unnest(starts) AS s,
             unnest(range(0, len(starts))) AS chunk_no
      FROM c
    )
    SELECT doc_id, CAST(chunk_no AS INT) AS chunk_no,
           substr(text, CAST(s AS INT), 200) AS chunk_text,
           CAST(s AS INT) AS chunk_start
    FROM e
    """,
)
def q_prepare_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus prep: quality filter, exact-dedup keep-first, chunking - composed in one query."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    filtered = (
        text.quality_features(corpus)
        .filter((F.col("n_tokens") >= 10) & (F.col("distinct_ratio") >= 0.2))
        .select("doc_id", "text")
    )
    deduped = dedup.dedup_keep_first(filtered)
    return sampling.chunk_documents(deduped, chunk_chars=200, overlap=40)


# ---------------------------------------------------------------------------
# fixed-size overlapping character chunks (RAG / context-window prep);
# pure per-row expression work, no shuffle (operators/sampling.chunk_documents)
# ---------------------------------------------------------------------------
@query(
    "chunk_documents",
    oracle="""
    WITH c AS (
      SELECT doc_id, text,
             range(1, greatest(length(text) - 40, 1) + 1, 160) AS starts
      FROM documents WHERE length(text) > 0
    ),
    e AS (
      SELECT doc_id, text, unnest(starts) AS s,
             unnest(range(0, len(starts))) AS chunk_no
      FROM c
    )
    SELECT doc_id, CAST(chunk_no AS INT) AS chunk_no,
           substr(text, CAST(s AS INT), 200) AS chunk_text,
           CAST(s AS INT) AS chunk_start
    FROM e
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size character chunking with overlap, pure per-row expressions."""
    d = read_table(spark, sf_dir, "documents")
    return sampling.chunk_documents(d, chunk_chars=200, overlap=40)


# ---------------------------------------------------------------------------
# n-gram language-model count tables (KenLM-shape) with Kneser-Ney
# continuation counts; corpus scanned once, continuation derived from
# the count table (operators/text.ngram_lm_counts)
# ---------------------------------------------------------------------------
@query(
    "ngram_lm_counts",
    oracle="""
    WITH tok AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
    ),
    grams AS (
      SELECT 1 AS ord, unnest(t) AS gram FROM tok
      UNION ALL
      SELECT 2, unnest(list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i+1])) FROM tok
      UNION ALL
      SELECT 3, unnest(list_transform(range(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      FROM tok
    ),
    counts AS (SELECT ord, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
    conts AS (
      SELECT ord - 1 AS ord,
             substr(gram, length(split_part(gram, ' ', 1)) + 2) AS gram,
             count(*) AS n_left
      FROM counts WHERE ord > 1 GROUP BY 1, 2
    )
    SELECT c.ord AS "order", c.gram AS gram, c.cnt AS count,
           CASE WHEN c.ord < 3 THEN coalesce(n.n_left, 0) END AS n_left_contexts
    FROM counts c LEFT JOIN conts n ON c.ord = n.ord AND c.gram = n.gram
    ORDER BY count DESC, "order", c.gram LIMIT 500
    """,
)
def q_ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-shape n-gram count tables for orders 1-3 with Kneser-Ney continuation counts, one corpus scan."""
    d = read_table(spark, sf_dir, "documents")
    return (
        text.ngram_lm_counts(d, max_order=3)
        .orderBy(F.desc("count"), "order", "gram")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# rare-token quality signal: corpus-frequency head broadcast, per-doc
# rare fraction (operators/text.rare_token_stats)
# ---------------------------------------------------------------------------
@query(
    "rare_token_ratio",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      FROM documents
    ),
    freq AS (SELECT term FROM tok GROUP BY term HAVING count(*) >= 5),
    per AS (
      SELECT t.doc_id, count(*) AS n_tokens,
             CAST(sum(CASE WHEN f.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
      FROM tok t LEFT JOIN freq f USING (term) GROUP BY t.doc_id
    )
    SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
           coalesce(p.n_rare, 0) AS n_rare,
           CAST(p.n_rare AS DOUBLE) / p.n_tokens AS rare_ratio
    FROM documents d LEFT JOIN per p USING (doc_id)
    """,
)
def q_rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-token quality signal: fraction of tokens outside the Zipf-head frequent set."""
    d = read_table(spark, sf_dir, "documents")
    return text.rare_token_stats(d, min_count=5)


# ---------------------------------------------------------------------------
# per-document tf-idf top terms (log-free score — see operator docstring)
# ---------------------------------------------------------------------------
@query(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      FROM documents
    ),
    counts AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    lens AS (
      SELECT doc_id, term, tf,
             CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS doc_len
      FROM counts
    ),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, tf, doc_freq,
             (CAST(tf AS DOUBLE) / doc_len) * (CAST(n_docs AS DOUBLE) / doc_freq) AS score
      FROM lens JOIN dfreq USING (term), n
    )
    SELECT doc_id, term, tf, doc_freq, score FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF terms per document (log-free rational score for cross-engine exactness)."""
    d = read_table(spark, sf_dir, "documents")
    return text.tfidf_top_terms(d, k=3)


# ---------------------------------------------------------------------------
# paragraph-level exact dedup (C4 recipe). The synthetic documents are
# single-line, so both engines first synthesize identical paragraph
# breaks: 8-token chunks joined with newlines.
# ---------------------------------------------------------------------------
@query(
    "dedup_paragraphs",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    chunked AS (
      SELECT doc_id,
             list_transform(range(0, CAST(ceil(len(tk) / 8.0) AS INT)),
               i -> struct_pack(ord := i,
                                p := array_to_string(tk[(i*8+1):(i*8+8)], ' '))) AS cs
      FROM toks
    ),
    paras AS (SELECT doc_id, unnest(cs) AS u FROM chunked),
    flat AS (SELECT doc_id, u.ord AS ord, u.p AS p FROM paras WHERE u.p <> ''),
    kept AS (
      SELECT doc_id, ord, p FROM (
        SELECT *, row_number() OVER (PARTITION BY p ORDER BY doc_id, ord) AS rn
        FROM flat
      ) WHERE rn = 1
    )
    SELECT d.doc_id,
           coalesce((SELECT string_agg(k.p, chr(10) ORDER BY k.ord)
                     FROM kept k WHERE k.doc_id = d.doc_id), '') AS text
    FROM documents d
    """,
)
def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide paragraph dedup: first occurrence by (doc_id, position) wins, one paragraph-keyed shuffle."""
    d = read_table(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    nc = F.ceil(F.size(toks) / F.lit(8.0)).cast("int")
    chunks = F.when(
        nc > 0,
        F.transform(
            F.sequence(F.lit(0), nc - 1),
            lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    synth = d.select("doc_id", F.array_join(chunks, "\n").alias("text"))
    return dedup.dedup_paragraphs(synth)


# ---------------------------------------------------------------------------
# domain/language mixture resampling (pretraining-mix rebalancing)
# ---------------------------------------------------------------------------
@query(
    "domain_mixture_sample",
    oracle="""
    WITH n AS (SELECT count(*) AS total FROM documents),
    rates AS (
      SELECT lang, least(1.0, (0.2 * total) / count(*)) AS rate
      FROM documents, n GROUP BY lang, total
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
          / 4294967296.0 < r.rate
    """,
)
def q_domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample each source domain toward target mixture weights via broadcast rate dims + hash-uniform keep."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    weights = {lang: 0.2 for lang in ["de", "en", "es", "fr", "zh"]}
    return sampling.mixture_sample(d, "doc_id", "lang", weights)


# ---------------------------------------------------------------------------
# BPE-style adjacent-pair counts (the inner counting step of tokenizer
# training): corpus-wide frequency of every adjacent token pair, top-100.
# One explode of the 2-gram array → one map-side-combined shuffle; at
# 100 TB the Zipfian head pairs are AQE-skew-split like any hot key.
# ---------------------------------------------------------------------------
@query(
    "bpe_pair_counts",
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, greatest(len(tk), 1)),
                    i -> tk[i] || ' ' || tk[i+1])) AS pair
      FROM toks
    )
    SELECT pair, count(*) AS n FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 100
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-symbol pair frequencies over word-frequency space - the inner aggregate of BPE training."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(text.ngrams(F.col("text"), 2)).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# full BPE tokenizer training (operators/bpe.py): the iterative
# generalization of bpe_pair_counts. Corpus touched ONCE (word-freq
# shuffle); every merge round runs on the distinct-word vocab table.
# The fixed 6-round training IS SQL-expressible after all: each round
# unrolls to (pair-count, thresholded argmax, list-fold merge-apply)
# CTEs — the greedy left-to-right non-overlapping merge is a
# list_reduce whose accumulator tail is checked against the round's
# best pair (NULL-safe when a round finds no pair ≥ min_freq, which
# freezes the vocab exactly like the Spark loop's break). Also
# bit-identical to the classic algorithm by
# tests/test_modules.py::test_bpe_train_matches_reference_and_encode_applies.
# ---------------------------------------------------------------------------
def _bpe_oracle(num_merges: int = 6, min_freq: int = 2) -> str:
    parts = [
        """
    WITH words AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        FROM documents) GROUP BY word
    ),
    vocab0 AS (
      SELECT list_append(list_transform(generate_series(1, length(word)),
               i -> substr(word, CAST(i AS INT), 1)), '</w>') AS sym, freq
      FROM words
    )"""
    ]
    for i in range(1, num_merges + 1):
        p = i - 1
        parts.append(
            f""",
    pairs{i} AS (
      SELECT freq, sym, unnest(generate_series(1, len(sym) - 1)) AS j
      FROM vocab{p}
    ),
    cnt{i} AS (
      SELECT sym[j] AS a, sym[j + 1] AS b, SUM(freq) AS cnt
      FROM pairs{i} GROUP BY 1, 2
    ),
    best{i} AS (
      SELECT a, b, cnt FROM cnt{i} WHERE cnt >= {min_freq}
      ORDER BY cnt DESC, a, b LIMIT 1
    ),
    vocab{i} AS (
      SELECT list_reduce(
               list_prepend(CAST([] AS VARCHAR[]),
                            list_transform(v.sym, s -> [s])),
               (acc, x) -> CASE WHEN len(acc) > 0
                                 AND acc[len(acc)] = b.a AND x[1] = b.b
                           THEN list_append(acc[1:len(acc) - 1], b.a || b.b)
                           ELSE list_append(acc, x[1]) END) AS sym,
             v.freq
      FROM vocab{p} v LEFT JOIN best{i} b ON TRUE
    )"""
        )
    union = "\n    UNION ALL ".join(
        f"SELECT CAST({i - 1} AS INT) AS step, a, b, CAST(cnt AS BIGINT) AS freq"
        f" FROM best{i}"
        for i in range(1, num_merges + 1)
    )
    parts.append("\n    " + union)
    return "".join(parts)


@query("bpe_learned_merges", oracle=_bpe_oracle())
def q_bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training merges (6 rounds, min_freq 2) - corpus-once word counts, per-round vocab-sized argmax + fold merge; oracle unrolls the rounds as CTEs."""
    from datalake_etlscripts_spark.operators.bpe import bpe_train

    d = read_table(spark, sf_dir, "documents")
    merges = bpe_train(d, num_merges=6, min_freq=2)
    return spark.createDataFrame(
        [(i, a, b, int(n)) for i, (a, b, n) in enumerate(merges)],
        "step int, a string, b string, freq bigint",
    )


# ---------------------------------------------------------------------------
# composed Gopher-style quality filter + URL-canonicalization dedup —
# the two cheapest corpus passes a training pipeline runs before any
# content-level dedup. Both are pure-expression / one-shuffle ops; the
# oracles replay every rule expression.
# ---------------------------------------------------------------------------
@query(
    "quality_filter_gopher",
    oracle=r"""
    WITH feat AS (
      SELECT doc_id, lang, source, n_chars,
             length(text) AS nc,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk,
             len(regexp_extract_all(text, '[^\w\s]')) AS np
      FROM documents
    ),
    f2 AS (
      SELECT doc_id, lang, source, n_chars, nc, np,
             len(tk) AS nt,
             len(list_distinct(tk)) AS nd,
             list_transform(range(1, greatest(len(tk) - 1, 1)),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS g3
      FROM feat
    ),
    sig AS (
      SELECT doc_id, lang, source, n_chars,
        coalesce(nt >= 20 AND nt <= 100000, false) AS c_tokens,
        coalesce(CASE WHEN nt > 0 THEN CAST(nc - (nt - 1) AS DOUBLE) / nt END
                 BETWEEN 2.0 AND 12.0, false) AS c_avg,
        coalesce(CASE WHEN nc > 0 THEN CAST(np AS DOUBLE) / nc END <= 0.3,
                 false) AS c_punct,
        coalesce(CASE WHEN nt > 0 THEN CAST(nd AS DOUBLE) / nt END >= 0.3,
                 false) AS c_distinct,
        coalesce(CASE WHEN len(g3) > 0 THEN
            CAST(list_max(list_transform(list_distinct(g3),
                 d -> len(list_filter(g3, x -> x = d)))) AS DOUBLE) / len(g3)
          END <= 0.18, false) AS c_rep3
      FROM f2
    )
    SELECT doc_id, lang, source, n_chars,
      (c_tokens AND c_avg AND c_punct AND c_distinct AND c_rep3) AS keep,
      (CAST(NOT c_tokens AS INT) + CAST(NOT c_avg AS INT)
       + CAST(NOT c_punct AS INT) + CAST(NOT c_distinct AS INT)
       + CAST(NOT c_rep3 AS INT)) AS n_failed,
      concat_ws(',',
        CASE WHEN NOT c_tokens THEN 'tokens' END,
        CASE WHEN NOT c_avg THEN 'avg_token_len' END,
        CASE WHEN NOT c_punct THEN 'punct' END,
        CASE WHEN NOT c_distinct THEN 'distinct' END,
        CASE WHEN NOT c_rep3 THEN 'rep3' END) AS fail_reasons
    FROM sig
    """,
)
def q_quality_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed Gopher-style quality filter: five rules, NULL-safe keep + failed-rule names."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    d = spread_small_input(read_table(spark, sf_dir, "documents"))
    return text.gopher_quality_filter(d)


@query(
    "dedup_urls",
    oracle=r"""
    WITH urls AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END) || '://' ||
        (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
        'Site' || CAST(doc_id % 7 AS VARCHAR) || '.example/page/' ||
        CAST(doc_id % 50 AS VARCHAR) ||
        (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x' ELSE '' END) ||
        (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END) AS url
      FROM documents
    )
    SELECT doc_id,
      regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
                     '^www\.', '')
        || regexp_replace(regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1),
                          '/+$', '') AS canonical,
      doc_id = min(doc_id) OVER (PARTITION BY
        regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
                       '^www\.', '')
        || regexp_replace(regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1),
                          '/+$', '')) AS keep
    FROM urls
    """,
)
def q_dedup_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL dedup over scheme/www/query/fragment/trailing-slash variants
    of the same logical page — the canonicalization collapses them to
    one key; min-id doc survives."""
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    urls = d.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("http")).otherwise(F.lit("https")),
            F.lit("://"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
            F.lit("Site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example/page/"),
            (F.col("doc_id") % 50).cast("string"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 4 == 0, F.lit("?utm_source=x")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 6 == 0, F.lit("#frag")).otherwise(F.lit("")),
        ).alias("url"),
    )
    return dedup.url_duplicates(urls)


# ---------------------------------------------------------------------------
# winnowing-fingerprint substring dedup (Schleimer et al. / MOSS; the
# distributed-join answer to Lee et al. 2022's suffix-array substring
# dedup). The md5-scheme twin replays every k-char gram hash, the
# w-row sliding-window minimum, the distinct fingerprint set, and the
# shared-fingerprint pair counts.
# ---------------------------------------------------------------------------
_WINNOW_ORACLE = """
    WITH g0 AS (
      SELECT doc_id, unnest(range(1, greatest(length(text) - {km2}, 1))) AS pos,
             text
      FROM documents
    ),
    g AS (SELECT doc_id, pos, {h} AS h FROM g0),
    fp0 AS (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {wm1} FOLLOWING) AS fp,
             count(*) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {wm1} FOLLOWING) AS c
      FROM g
    ),
    fps AS (SELECT DISTINCT doc_id, fp FROM fp0 WHERE c = {w}),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT id_a, id_b, n_shared FROM pairs
""".format(
    km2=20 - 2,  # range(1, len - (k-1) + 1) == range(1, len - 18)
    wm1=16 - 1,
    w=16,
    h=ddb_hex32("md5(substr(text, pos, 20))"),
)


@query("dedup_substrings_winnow", oracle=_WINNOW_ORACLE)
def q_dedup_substrings_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint substring dedup: pairs sharing w+k-1-char repeated substrings via fingerprint equi-join."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    d = spread_small_input(read_table(spark, sf_dir, "documents"))
    return dedup.substring_duplicate_pairs(d, k=20, w=16, scheme="md5")


@query(
    "multimodal_features",
    oracle="""
    WITH b AS (
      SELECT doc_id AS id, text, octet_length(encode(text)) AS n
      FROM documents
    ),
    h AS (
      SELECT id, n,
        {cols}
      FROM b
    )
    SELECT id, {outs}
    FROM h
    """.format(
        cols=",\n        ".join(
            "len(list_filter(range(1, length(text) + 1),"
            f" i -> ord(substr(text, i, 1)) % 8 = {j})) AS h{j}"
            for j in range(8)
        ),
        # the featurizer emits ARRAY<FLOAT> (realistic fp32 features) —
        # replicate the float32 rounding, then widen exactly
        outs=", ".join(
            f"CAST(CAST(CAST(h{j} AS DOUBLE) / n AS FLOAT) AS DOUBLE) AS f{j}"
            for j in range(8)
        ),
    ),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature-extraction plumbing (mapInPandas, Arrow batches)
    over the stub byte-histogram featurizer; the oracle replays the
    histogram from the text's bytes (corpus is ASCII, so ord == byte —
    the same device multimodal_decode's oracle uses via
    octet_length(encode(text))). Output unpacked to scalar columns
    (driver-hasher compatibility: no array outputs)."""
    d = read_table(spark, sf_dir, "documents")
    feats = multimodal.feature_extract(multimodal.attach_binary(d))
    return feats.select(
        "id",
        *[F.col("feature")[j].cast("double").alias(f"f{j}") for j in range(8)],
    )


@query(
    "length_bucketed_batches",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
      FROM documents
    ),
    b AS (
      -- floor, not CAST: DuckDB CAST(double AS INT) rounds to nearest
      -- where Spark's cast truncates
      SELECT doc_id, n_tokens, CAST(floor(n_tokens / 32.0) AS INT) AS bucket,
             CAST(floor((row_number() OVER (
                    PARTITION BY CAST(floor(n_tokens / 32.0) AS INT)
                    ORDER BY n_tokens, doc_id) - 1) / 8.0) AS INT)
               AS batch_seq
      FROM base
    )
    SELECT doc_id, n_tokens, bucket, batch_seq,
           max(n_tokens) OVER (PARTITION BY bucket, batch_seq) AS pad_to
    FROM b
    """,
)
def q_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching: fixed-size batches inside token-length buckets, pad_to = per-batch max."""
    d = read_table(spark, sf_dir, "documents")
    return sampling.length_bucketed_batches(d)


# ---------------------------------------------------------------------------
# hashing-trick linear quality classifier (fastText/DCLM shape): the
# 256 bucket weights are deterministic LCG literals shared into the
# twin, so DuckDB replays token hashing, bucket lookup, the ordered
# contribution fold, and the mean — bit-for-bit.
# ---------------------------------------------------------------------------
def _clf_weights() -> list[float]:
    from datalake_etlscripts_spark.operators.similarity import random_planes

    return [row[0] for row in random_planes(1, 256, seed=23)]


def _clf_oracle() -> str:
    from datalake_etlscripts_spark.plans.registry import ddb_hex32

    # DuckDB parses plain decimal literals as DECIMAL and overflows the
    # inferred scale when summing — force DOUBLE[]
    wlit = "[" + ", ".join(f"CAST('{w!r}' AS DOUBLE)" for w in _clf_weights()) + "]"
    h = ddb_hex32("md5(t)")
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    )
    SELECT doc_id,
      CASE WHEN len(tk) > 0 THEN
        list_reduce(list_prepend(0.0,
          list_transform(tk, t -> {wlit}[CAST(({h}) % 256 AS INT) + 1])),
          (a, b) -> a + b) / len(tk)
      END AS quality_score
    FROM toks
    """


@query("classifier_quality_score", oracle=_clf_oracle())
def q_classifier_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear classifier score per document (fastText/
    DCLM quality-classifier shape) with deterministic literal weights;
    raw margin output (no sigmoid - not bit-portable)."""
    d = read_table(spark, sf_dir, "documents")
    return text.hashed_linear_score(d, _clf_weights()).select(
        "doc_id", "quality_score"
    )


@query(
    "lm_fluency_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    g2 AS (
      SELECT doc_id, u.i AS pos,
             tk[u.i + 1] || ' ' || tk[u.i + 2] AS gram,
             tk[u.i + 1] AS ctx
      FROM toks CROSS JOIN LATERAL unnest(range(0, greatest(len(tk) - 1, 0))) u(i)
    ),
    c2 AS (SELECT gram, count(*) AS c FROM g2 GROUP BY gram),
    c1 AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(tk) AS w FROM toks
      ) GROUP BY w
    ),
    p AS (
      SELECT g2.doc_id, g2.pos,
             coalesce(CAST(c2.c AS DOUBLE) / c1.c, 0.0) AS p
      FROM g2 LEFT JOIN c2 USING (gram) LEFT JOIN c1 ON c1.w = g2.ctx
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_bigrams,
             list_reduce(list_prepend(0.0, list(p ORDER BY pos)),
                         (a, b) -> a + b) AS total
      FROM p GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           a.total / a.n_bigrams AS lm_score
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def q_lm_fluency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: mean MLE bigram probability of each
    document under the corpus's own ngram_lm_counts table - rational
    arithmetic, position-ordered fold (no log, bit-portable)."""
    d = read_table(spark, sf_dir, "documents")
    # the count table feeds BOTH the bigram and the context join —
    # materialize once (in production this is a persisted LM table,
    # not a per-query recompute); A/B: 3.9s -> 2.2s cold at sf0.1
    lm = text.ngram_lm_counts(d, max_order=2).localCheckpoint()
    return text.lm_avg_prob_score(d, lm)


@query(
    "boilerplate_prefixes",
    oracle="""
    WITH heads AS (
      SELECT source,
             array_to_string(
               list_filter(string_split(text, ' '), x -> x <> '')[1:5], ' ')
               AS prefix
      FROM documents
    ),
    c AS (SELECT source, prefix, count(*) AS n_docs FROM heads GROUP BY 1, 2),
    t AS (SELECT source, count(*) AS tt FROM heads GROUP BY 1)
    SELECT c.source, c.prefix, c.n_docs,
           CAST(c.n_docs AS DOUBLE) / t.tt AS frac
    FROM c JOIN t USING (source)
    WHERE CAST(c.n_docs AS DOUBLE) / t.tt >= 0.002
    """,
)
def q_boilerplate_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source k-token document-prefix frequency (crawl-template
    boilerplate detection, RefinedWeb-style) - threshold low enough to
    return rows on the random-text corpus."""
    d = read_table(spark, sf_dir, "documents")
    return text.boilerplate_prefixes(d, min_frac=0.002)


@query(
    "decontaminate_remove",
    oracle="""
    WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
    corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT doc_id + 3000000, 'copied doc ' || text FROM bench
    ),
    btk AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM bench),
    bsh AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS sh
      FROM btk
    ),
    ctk AS (
      SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM corpus
    ),
    csh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS sh
      FROM ctk
    ),
    bad AS (
      SELECT DISTINCT doc_id FROM csh WHERE sh IN (SELECT sh FROM bsh)
    )
    SELECT c.doc_id, c.text FROM corpus c
    WHERE c.doc_id NOT IN (SELECT doc_id FROM bad)
    """,
)
def q_decontaminate_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination REMOVAL (the user-facing composition): corpus
    minus every document sharing any 5-gram with the benchmark set -
    broadcast-semi hit detection, one anti join."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0).unionByName(
        bench.select(
            (F.col("doc_id") + 3000000).alias("doc_id"),
            F.concat(F.lit("copied doc "), F.col("text")).alias("text"),
        )
    )
    return dedup.decontaminate_corpus(corpus, bench, k=5)


@query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id AS id, 16 AS out_w, 16 AS out_h,
           CAST(256 AS BIGINT) AS n_bytes_out,
           md5(CASE
             WHEN octet_length(encode(text)) >= 256 THEN
               (SELECT string_agg(substr(text,
                   1 + i.i * (octet_length(encode(text)) // 256), 1), '')
                FROM (SELECT unnest(range(256)) AS i) i)
             ELSE text || repeat(chr(0), 256 - octet_length(encode(text)))
           END) AS content_md5
    FROM documents
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing through the injectable mapInPandas seam: the
    deterministic byte-stride fake resamples every document's bytes to
    a 16x16 payload; the oracle rebuilds the strided bytes from the
    (ASCII) text and compares an md5 of the content - binary columns
    cannot go to the driver hasher, a digest can."""
    d = read_table(spark, sf_dir, "documents")
    out = multimodal.resize_images(multimodal.attach_binary(d))
    return out.select(
        "id", "out_w", "out_h", "n_bytes_out", F.md5("data").alias("content_md5")
    )


# ---------------------------------------------------------------------------
# per-group deterministic reservoir: balanced per-language audit sample
# ---------------------------------------------------------------------------
@query(
    "sample_per_group",
    oracle="""
    SELECT lang, doc_id, sample_rank FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('spg:' || CAST(doc_id AS VARCHAR)),
                        CAST(doc_id AS VARCHAR)) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 5
    """,
)
def q_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group reservoir: exactly 5 docs per language by md5-hash order - identical sample under any partitioning or retry, one window shuffle."""
    d = read_table(spark, sf_dir, "documents").select("lang", "doc_id")
    return sampling.sample_per_group(d, key_col="doc_id", group_col="lang", n=5)


# ---------------------------------------------------------------------------
# n-gram novelty vs a reference corpus (memorization audit): corpus =
# non-reference docs + verbatim twins of reference docs (novelty 0 by
# construction); reference = doc_id % 3 = 0
# ---------------------------------------------------------------------------
@query(
    "ngram_novelty",
    oracle="""
    WITH ref AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
    corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
      UNION ALL
      SELECT doc_id + 4000000, text FROM ref
    ),
    rtk AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM ref),
    rsh AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS sh
      FROM rtk
    ),
    ctk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM corpus
    ),
    csh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS sh
      FROM ctk
    ),
    j AS (
      SELECT c.doc_id, c.sh, r.sh AS seen
      FROM csh c LEFT JOIN rsh r ON c.sh = r.sh
    ),
    a AS (
      SELECT doc_id, count(sh) AS n_shingles,
             count(sh) - count(seen) AS n_novel
      FROM j GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_shingles, 0) AS n_shingles,
           COALESCE(a.n_novel, 0) AS n_novel,
           CASE WHEN COALESCE(a.n_shingles, 0) > 0
                THEN CAST(a.n_novel AS DOUBLE) / CAST(a.n_shingles AS DOUBLE)
           END AS novelty
    FROM (SELECT doc_id FROM corpus) d LEFT JOIN a USING (doc_id)
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 5-gram novelty vs a reference corpus (memorization audit) - linear shingle join, exact-int ratio; verbatim twins score 0."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ref = d.filter(F.col("doc_id") % 3 == 0)
    corpus = d.filter(F.col("doc_id") % 3 != 0).unionByName(
        ref.select((F.col("doc_id") + 4000000).alias("doc_id"), "text")
    )
    return dedup.ngram_novelty_scores(corpus, ref, k=5)


# ---------------------------------------------------------------------------
# BM25-shaped ranked retrieval (log-free Robertson idf ratio — exact
# integer products, one double division per term, term-ordered fold)
# ---------------------------------------------------------------------------
_BM25_TERMS = ["data", "join", "spark"]
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

_BM25_ORACLE = f"""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tk),
    stats AS (SELECT count(*) AS n, sum(dl) AS l FROM dl),
    hits AS (
      SELECT doc_id, t, count(*) AS tf FROM (
        SELECT doc_id, unnest(tk) AS t FROM tk
      ) WHERE t IN ({_BM25_TERMS_SQL})
      GROUP BY doc_id, t
    ),
    dft AS (SELECT t, count(*) AS dft FROM hits GROUP BY t),
    sc AS (
      SELECT h.doc_id, h.t,
             CAST((2 * s.n - 2 * d.dft + 1) * 22 * h.tf * s.l AS DOUBLE)
             / CAST((2 * d.dft + 1)
                    * (10 * h.tf * s.l + 3 * s.l + 9 * dl.dl * s.n) AS DOUBLE)
               AS sc
      FROM hits h
      JOIN dft d USING (t)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_hit,
             list_reduce(list_prepend(0.0, list(sc ORDER BY t)),
                         (a, b) -> a + b) AS score
      FROM sc GROUP BY doc_id
    )
    SELECT doc_id, n_hit, score FROM agg
    ORDER BY score DESC, doc_id LIMIT 20
"""


@query("bm25_topk", oracle=_BM25_ORACLE)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-shaped top-20 retrieval for a 3-term query - log-free integer idf ratio, broadcast stats dims, corpus never shuffled full-width."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.bm25_topk(d, _BM25_TERMS, k=20)


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing (µ = 2000) —
# the language-modelling ranking beside bm25_topk, same exactness
# policy: per-term p = (tf·C + µ·cf)/((|d|+µ)·C) is one double
# division of exact int64 products; the document score is the product
# of the per-term doubles folded in TERM ORDER (the monotone stand-in
# for Σ log p — no ln(), no libm portability hazard). Docs with ≥1
# hit are candidates; absent terms contribute the smoothed background
# mass through the broadcast (term, cf) dim.
# ---------------------------------------------------------------------------
_QL_ORACLE = f"""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tk),
    stats AS (SELECT CAST(sum(dl) AS BIGINT) AS c FROM dl),
    tok AS (
      SELECT doc_id, t FROM (SELECT doc_id, unnest(tk) AS t FROM tk)
      WHERE t IN ({_BM25_TERMS_SQL})
    ),
    cf AS (SELECT t, CAST(count(*) AS BIGINT) AS cf FROM tok GROUP BY t),
    hits AS (
      SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, t
    ),
    cand AS (SELECT DISTINCT doc_id FROM hits),
    sc AS (
      SELECT ca.doc_id, f.t, coalesce(h.tf, 0) AS tf0,
             CAST(coalesce(h.tf, 0) * s.c + 2000 * f.cf AS DOUBLE)
             / CAST((d.dl + 2000) * s.c AS DOUBLE) AS sc
      FROM cand ca CROSS JOIN cf f
      LEFT JOIN hits h ON h.doc_id = ca.doc_id AND h.t = f.t
      JOIN dl d ON d.doc_id = ca.doc_id
      CROSS JOIN stats s
    ),
    agg AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit,
             list_reduce(list_prepend(1.0, list(sc ORDER BY t)),
                         (a, b) -> a * b) AS score
      FROM sc GROUP BY doc_id
    )
    SELECT doc_id, n_hit, score FROM agg
    ORDER BY score DESC, doc_id LIMIT 20
"""


@query("query_likelihood_lm", oracle=_QL_ORACLE)
def q_query_likelihood_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood top-20 retrieval for the same 3-term query as bm25_topk - exact int64 per-term products, one double division each, product-fold in term order (log-free)."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.query_likelihood_topk(d, _BM25_TERMS, mu=2000, k=20)


# ---------------------------------------------------------------------------
# EXACT all-pairs similarity join (AllPairs/PPJoin prefix filter) —
# the oracle brute-forces every pair; the Spark plan generates
# candidates only from rarest-token prefixes yet returns the
# identical pair set (prefix filtering is lossless)
# ---------------------------------------------------------------------------
@query(
    "dedup_allpairs_prefix",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 5000000, text || ' xyzzy tailtok'
      FROM documents WHERE doc_id % 110 = 0
    ),
    d AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS ts
      FROM corpus
    ),
    p AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             len(list_intersect(a.ts, b.ts)) AS inter,
             len(a.ts) AS la, len(b.ts) AS lb
      FROM d a JOIN d b ON a.doc_id < b.doc_id
    )
    SELECT id1, id2,
           CAST(inter AS DOUBLE) / CAST(la + lb - inter AS DOUBLE) AS jaccard
    FROM p WHERE 5 * inter >= 3 * (la + lb - inter)
    """,
)
def q_dedup_allpairs_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 3/5 similarity self-join via AllPairs prefix filtering - rarest-token prefixes generate candidates, integer cross-multiplied threshold, no LSH loss.

    Registered on a 1-in-10 document sample: the template-generated
    test corpus is CLIQUE-dense (at sf0.1 even J >= 0.9 holds for ~2%
    of ALL pairs), so the full self-join's OUTPUT is quadratic — a
    property of this corpus, not the algorithm. Real web corpora have
    sparse near-dup structure; for clique-heavy data compose with
    connected_components and emit (doc, representative) instead of
    pairs."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 10 == 0).unionByName(
        d.filter(F.col("doc_id") % 110 == 0).select(
            (F.col("doc_id") + 5000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" xyzzy tailtok")).alias("text"),
        )
    )
    return dedup.allpairs_jaccard_pairs(corpus, threshold=(3, 5))


# ---------------------------------------------------------------------------
# multimodal near-dup: perceptual average-hash over the binary seam.
# The oracle replays the byte-stride fake resize (ASCII text = bytes)
# and the integer bit rule n*b > sum(b), split into 32-bit halves.
# ---------------------------------------------------------------------------
@query(
    "multimodal_ahash_dupes",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 6000000, text FROM documents WHERE doc_id % 13 = 0
    ),
    src AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM corpus),
    g AS (SELECT doc_id, text, n, unnest(range(64)) AS i FROM src),
    c AS (
      SELECT doc_id, CAST(i AS BIGINT) AS i,
             CASE WHEN n >= 64
                  THEN ascii(substr(text, 1 + CAST(i AS INT) * CAST(n // 64 AS INT), 1))
                  WHEN i < n THEN ascii(substr(text, CAST(i AS INT) + 1, 1))
                  ELSE 0 END AS code
      FROM g
    ),
    s AS (SELECT doc_id, SUM(code) AS s FROM c GROUP BY doc_id),
    h AS (
      SELECT c.doc_id,
             CAST(COALESCE(SUM(CASE WHEN 64 * code > s.s AND i >= 32
                          THEN CAST(1 AS BIGINT) << CAST(i - 32 AS INT) END), 0)
               AS BIGINT) AS ahash_hi,
             CAST(COALESCE(SUM(CASE WHEN 64 * code > s.s AND i < 32
                          THEN CAST(1 AS BIGINT) << CAST(i AS INT) END), 0)
               AS BIGINT) AS ahash_lo
      FROM c JOIN s USING (doc_id) GROUP BY c.doc_id
    )
    SELECT ahash_hi, ahash_lo, count(*) AS n_imgs,
           array_to_string(list_sort(list(doc_id)), ',') AS ids
    FROM h GROUP BY 1, 2 HAVING count(*) > 1
    """,
)
def q_multimodal_ahash_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash duplicate groups over the binary seam - stride-resample to an 8x8 grid, integer brighter-than-mean bits, one hash-keyed shuffle."""
    d = read_table(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 13 == 0).select(
            (F.col("doc_id") + 6000000).alias("doc_id"), "text"
        )
    )
    return multimodal.ahash_duplicate_groups(
        multimodal.attach_binary(corpus)
    )


# ---------------------------------------------------------------------------
# epoch-style upsampling: rational repetition factors per language
# (en 5/2 = 2.5 epochs, es 1/3 = hash downsample, rest 1 copy)
# ---------------------------------------------------------------------------
from datalake_etlscripts_spark.plans.registry import ddb_hex32 as _hex32  # noqa: E402

_UPS_H = _hex32("md5('ups:' || CAST(doc_id AS VARCHAR))")

_UPSAMPLE_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, lang, {_UPS_H} AS h32 FROM documents
    ),
    c AS (
      SELECT doc_id, lang,
             CASE WHEN lang = 'en'
                    THEN 2 + CASE WHEN h32 * 2 < 4294967296 THEN 1 ELSE 0 END
                  WHEN lang = 'es'
                    THEN CASE WHEN h32 * 3 < 4294967296 THEN 1 ELSE 0 END
                  ELSE 1 END AS n
      FROM h
    )
    SELECT doc_id, lang, CAST(unnest(range(n)) AS INT) AS epoch FROM c
"""


@query("mixture_upsample", oracle=_UPSAMPLE_ORACLE)
def q_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-style rational upsampling (en x2.5, es x1/3, rest x1) - integer hash membership for fractional copies, pure per-row explode, no shuffle."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.mixture_upsample(
        d, key_col="doc_id", stratum_col="lang", factors={"en": (5, 2), "es": (1, 3)}
    )


# ---------------------------------------------------------------------------
# corpus data card: one pass for doc counts + length distribution,
# one token pass for vocabulary / type-token ratio
# ---------------------------------------------------------------------------
@query(
    "corpus_stats",
    oracle="""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tk),
    d AS (
      SELECT count(*) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_tokens,
             CAST(SUM(dl) AS DOUBLE) / count(*) AS mean_len,
             quantile_cont(dl, 0.5) AS p50_len,
             quantile_cont(dl, 0.95) AS p95_len
      FROM dl
    ),
    v AS (
      SELECT count(DISTINCT t) AS vocab_size
      FROM (SELECT unnest(tk) AS t FROM tk)
    )
    SELECT n_docs, total_tokens, mean_len, p50_len, p95_len, vocab_size,
           CAST(vocab_size AS DOUBLE) / total_tokens AS type_token_ratio
    FROM d CROSS JOIN v
    """,
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data card in two scans: doc/length stats from one aggregate, exact vocabulary from one token explode - the summary block of a dataset datasheet."""
    d = read_table(spark, sf_dir, "documents").select("text")
    return text.corpus_data_card(d)


# ---------------------------------------------------------------------------
# corpus-overlap audit: distinct-shingle containment between sources
# (did the new crawl re-collect the old corpus?)
# ---------------------------------------------------------------------------
@query(
    "corpus_overlap",
    oracle="""
    WITH tk AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS s
      FROM tk
    ),
    a AS (SELECT DISTINCT s FROM sh WHERE source IN ('src0','src1','src2','src3','src4')),
    b AS (SELECT DISTINCT s FROM sh WHERE source NOT IN ('src0','src1','src2','src3','src4')),
    m AS (
      SELECT (SELECT count(*) FROM a) AS n_shingles_a,
             (SELECT count(*) FROM b) AS n_shingles_b,
             (SELECT count(*) FROM a WHERE s IN (SELECT s FROM b)) AS n_shared
    )
    SELECT n_shingles_a, n_shingles_b, n_shared,
           CAST(n_shared AS DOUBLE) / CAST(n_shingles_a AS DOUBLE) AS containment_a_in_b
    FROM m
    """,
)
def q_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-overlap audit: 5-gram containment of sources src0-4 inside the rest - distinct shingle sets, one semi-join count, exact-int ratio."""
    d = read_table(spark, sf_dir, "documents").select("source", "text")
    sh = d.select(
        "source", F.explode(text.shingles(F.col("text"), 5)).alias("s")
    )
    in_a = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    a = sh.filter(in_a).select("s").distinct()
    b = sh.filter(~in_a).select("s").distinct()
    na = a.agg(F.count(F.lit(1)).alias("n_shingles_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_shingles_b"))
    shared = a.join(b, "s", "left_semi").agg(F.count(F.lit(1)).alias("n_shared"))
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(shared))
        .select(
            "n_shingles_a",
            "n_shingles_b",
            "n_shared",
            (
                F.col("n_shared").cast("double") / F.col("n_shingles_a").cast("double")
            ).alias("containment_a_in_b"),
        )
    )


# ---------------------------------------------------------------------------
# cluster-representative selection: near-dup clusters keep their BEST
# member (longest text, tie lowest id) — what a pipeline actually
# deletes against, composed from pairs → components → argmax
# ---------------------------------------------------------------------------
@query(
    "dedup_keep_best",
    oracle=_CLUSTERS_ORACLE.replace(
        "SELECT node, min(lab) AS component FROM reach GROUP BY node",
        """, comp0 AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
    len AS (SELECT doc_id, length(text) AS n_chars_t FROM documents),
    scored AS (
      SELECT c.component, c.node, l.n_chars_t,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY l.n_chars_t DESC, c.node ASC) AS rn
      FROM comp0 c JOIN len l ON l.doc_id = c.node
    )
    SELECT component, count(*) AS n_members,
           MAX(CASE WHEN rn = 1 THEN node END) AS keep_id,
           MAX(CASE WHEN rn = 1 THEN n_chars_t END) AS keep_len
    FROM scored GROUP BY component""",
    ),
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster representative selection: near-dup components keep their longest member (tie lowest id) - the delete-list generator composed from pairs, components, argmax."""
    from pyspark.sql import Window as W

    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.04)
    comp = dedup.connected_components_star(pairs)
    scored = comp.join(
        d.select(F.col("doc_id").alias("node"), F.length("text").alias("n_chars_t")),
        "node",
    )
    w = W.partitionBy("component").orderBy(F.desc("n_chars_t"), F.asc("node"))
    ranked = scored.withColumn("_rn", F.row_number().over(w))
    return ranked.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(F.when(F.col("_rn") == 1, F.col("node"))).alias("keep_id"),
        F.max(F.when(F.col("_rn") == 1, F.col("n_chars_t"))).alias("keep_len"),
    )


# ---------------------------------------------------------------------------
# per-language corpus scorecard: the grouped data card
# ---------------------------------------------------------------------------
@query(
    "corpus_stats_by_lang",
    oracle="""
    WITH tk AS (
      SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    dl AS (SELECT lang, CAST(len(tk) AS BIGINT) AS dl, tk FROM tk),
    d AS (
      SELECT lang, count(*) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_tokens,
             CAST(SUM(dl) AS DOUBLE) / count(*) AS mean_len,
             quantile_cont(dl, 0.5) AS p50_len,
             quantile_cont(dl, 0.95) AS p95_len
      FROM dl GROUP BY lang
    ),
    v AS (
      SELECT lang, count(DISTINCT t) AS vocab
      FROM (SELECT lang, unnest(tk) AS t FROM tk) GROUP BY lang
    )
    SELECT d.lang, n_docs, total_tokens, mean_len, p50_len, p95_len, v.vocab,
           CAST(v.vocab AS DOUBLE) / total_tokens AS type_token_ratio
    FROM d JOIN v ON v.lang = d.lang
    """,
)
def q_corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus scorecard: doc/token counts, exact length percentiles, exact vocabulary, type-token ratio - the grouped data card behind mixture decisions."""
    d = read_table(spark, sf_dir, "documents").select("lang", "text")
    toks = text.tokens(F.col("text"))
    dl = d.select("lang", F.size(toks).cast("long").alias("_dl"), toks.alias("_tk"))
    stats = dl.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_dl").alias("total_tokens"),
        (F.sum("_dl").cast("double") / F.count(F.lit(1))).alias("mean_len"),
        F.expr("percentile(_dl, 0.5)").alias("p50_len"),
        F.expr("percentile(_dl, 0.95)").alias("p95_len"),
    )
    vocab = (
        dl.select("lang", F.explode("_tk").alias("_t"))
        .groupBy("lang")
        .agg(F.count_distinct("_t").alias("vocab"))
    )
    return stats.join(vocab, "lang").select(
        "lang",
        "n_docs",
        "total_tokens",
        "mean_len",
        "p50_len",
        "p95_len",
        "vocab",
        (F.col("vocab").cast("double") / F.col("total_tokens")).alias(
            "type_token_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# image near-dup PAIRS: aHash hamming <= 3 via 16-bit band blocking
# (the simhash recall argument applied to the image hash)
# ---------------------------------------------------------------------------
@query(
    "multimodal_ahash_near_dups",
    oracle="""
    WITH src AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
    g AS (SELECT doc_id, text, n, unnest(range(64)) AS i FROM src),
    c AS (
      SELECT doc_id, CAST(i AS BIGINT) AS i,
             CASE WHEN n >= 64
                  THEN ascii(substr(text, 1 + CAST(i AS INT) * CAST(n // 64 AS INT), 1))
                  WHEN i < n THEN ascii(substr(text, CAST(i AS INT) + 1, 1))
                  ELSE 0 END AS code
      FROM g
    ),
    s AS (SELECT doc_id, SUM(code) AS s FROM c GROUP BY doc_id),
    h AS (
      SELECT c.doc_id,
             CAST(COALESCE(SUM(CASE WHEN 64 * code > s.s AND i >= 32
                          THEN CAST(1 AS BIGINT) << CAST(i - 32 AS INT) END), 0)
               AS BIGINT) AS hi,
             CAST(COALESCE(SUM(CASE WHEN 64 * code > s.s AND i < 32
                          THEN CAST(1 AS BIGINT) << CAST(i AS INT) END), 0)
               AS BIGINT) AS lo
      FROM c JOIN s USING (doc_id) GROUP BY c.doc_id
    ),
    banded AS (
      SELECT doc_id, hi, lo, b.band AS band,
             CASE b.band
               WHEN 0 THEN lo & 65535
               WHEN 1 THEN (lo >> 16) & 65535
               WHEN 2 THEN hi & 65535
               ELSE (hi >> 16) & 65535 END AS bucket
      FROM h CROSS JOIN (SELECT unnest(range(4)) AS band) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
    """,
)
def q_multimodal_ahash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs: aHash hamming <= 3 with 16-bit band blocking - the simhash pigeonhole recall argument on the binary seam's perceptual hashes."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return multimodal.ahash_near_dup_pairs(
        multimodal.attach_binary(d), max_hamming=3
    )


# ---------------------------------------------------------------------------
# per-source quality scorecard: the Gopher filter aggregated by source
# — which feeds are worth crawling (keep rate + which rule kills them)
# ---------------------------------------------------------------------------
@query(
    "source_quality_report",
    oracle=r"""
    WITH feat AS (
      SELECT doc_id, source,
             length(text) AS nc,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk,
             len(regexp_extract_all(text, '[^\w\s]')) AS np
      FROM documents
    ),
    f2 AS (
      SELECT doc_id, source, nc, np,
             len(tk) AS nt,
             len(list_distinct(tk)) AS nd,
             list_transform(range(1, greatest(len(tk) - 1, 1)),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS g3
      FROM feat
    ),
    sig AS (
      SELECT doc_id, source,
        coalesce(nt >= 20 AND nt <= 100000, false) AS c_tokens,
        coalesce(CASE WHEN nt > 0 THEN CAST(nc - (nt - 1) AS DOUBLE) / nt END
                 BETWEEN 2.0 AND 12.0, false) AS c_avg,
        coalesce(CASE WHEN nc > 0 THEN CAST(np AS DOUBLE) / nc END <= 0.3,
                 false) AS c_punct,
        coalesce(CASE WHEN nt > 0 THEN CAST(nd AS DOUBLE) / nt END >= 0.3,
                 false) AS c_distinct,
        coalesce(CASE WHEN len(g3) > 0 THEN
            CAST(list_max(list_transform(list_distinct(g3),
                 d -> len(list_filter(g3, x -> x = d)))) AS DOUBLE) / len(g3)
          END <= 0.18, false) AS c_rep3
      FROM f2
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(COALESCE(SUM(CASE WHEN c_tokens AND c_avg AND c_punct
                          AND c_distinct AND c_rep3 THEN 1 END), 0) AS BIGINT)
             AS n_keep,
           CAST(COALESCE(SUM(CASE WHEN c_tokens AND c_avg AND c_punct
                          AND c_distinct AND c_rep3 THEN 1 END), 0) AS DOUBLE)
             / count(*) AS keep_rate,
           CAST(COALESCE(SUM(CASE WHEN NOT c_tokens THEN 1 END), 0) AS BIGINT) AS n_fail_tokens,
           CAST(COALESCE(SUM(CASE WHEN NOT c_avg THEN 1 END), 0) AS BIGINT) AS n_fail_avg_token_len,
           CAST(COALESCE(SUM(CASE WHEN NOT c_punct THEN 1 END), 0) AS BIGINT) AS n_fail_punct,
           CAST(COALESCE(SUM(CASE WHEN NOT c_distinct THEN 1 END), 0) AS BIGINT) AS n_fail_distinct,
           CAST(COALESCE(SUM(CASE WHEN NOT c_rep3 THEN 1 END), 0) AS BIGINT) AS n_fail_rep3
    FROM sig GROUP BY source
    """,
)
def q_source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality scorecard: Gopher keep rate + per-rule failure counts in one aggregate over the filter output - which feeds are worth crawling."""
    d = read_table(spark, sf_dir, "documents")
    filt = text.gopher_quality_filter(d)
    reasons = F.split(F.col("fail_reasons"), ",")

    def fails(rule):
        return F.coalesce(
            F.sum(F.when(F.array_contains(reasons, rule), 1)), F.lit(0)
        ).cast("long")

    return filt.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.when(F.col("keep"), 1)), F.lit(0)).cast("long").alias("n_keep"),
        (
            F.coalesce(F.sum(F.when(F.col("keep"), 1)), F.lit(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("keep_rate"),
        fails("tokens").alias("n_fail_tokens"),
        fails("avg_token_len").alias("n_fail_avg_token_len"),
        fails("punct").alias("n_fail_punct"),
        fails("distinct").alias("n_fail_distinct"),
        fails("rep3").alias("n_fail_rep3"),
    )


# ---------------------------------------------------------------------------
# SoftDeDup: duplication-aware reweighting — keep every document, train
# the duplicated ones less. The soft twin of dedup_keep_best's hard
# delete list.
# ---------------------------------------------------------------------------
@query(
    "soft_dedup_weights",
    oracle="""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram
      FROM tk
    ),
    pd AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
    fr AS (SELECT gram, CAST(sum(c) AS BIGINT) AS freq FROM pd GROUP BY gram),
    a AS (
      SELECT pd.doc_id,
             CAST(sum(pd.c) AS BIGINT) AS n_grams,
             CAST(sum(pd.c * fr.freq) AS BIGINT) AS mass
      FROM pd JOIN fr USING (gram) GROUP BY pd.doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_grams, 0) AS n_grams,
           CAST(a.mass AS DOUBLE) / a.n_grams AS commonness,
           COALESCE(CAST(1 AS DOUBLE) / (CAST(a.mass AS DOUBLE) / a.n_grams),
                    CAST(1 AS DOUBLE)) AS weight
    FROM documents d LEFT JOIN a USING (doc_id)
    """,
)
def q_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup reweighting: per-document training weight = 1 / mean corpus frequency of its 3-grams - duplicates train less instead of being deleted; all-linear shuffles, never a pair join."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.soft_dedup_weights(d, k=3)


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece) Viterbi tokenization against a literal
# integer-cost piece vocabulary. The DP per distinct word is one
# aggregate fold in Spark and a recursive CTE in the DuckDB twin —
# identical packed-key arithmetic ((cost << 4) | 15-len, min resolves
# the longer-piece tie-break), so segmentations match bit-for-bit.
# ---------------------------------------------------------------------------
_UNI_VOCAB = {
    "the": 1600,
    "ta": 1700,
    "ble": 2500,
    "scan": 2400,
    "dow": 2500,
    "in": 1600,
    "st": 1600,
    "er": 1500,
    "or": 1550,
    "ar": 1650,
    "row": 2300,
    "key": 2200,
    "part": 2600,
    "all": 2400,
    "ue": 1800,
}


def _uni_cands_sql() -> str:
    terms = [
        "(costs[j+1] + CASE WHEN substr(word, j+1, 1) BETWEEN 'a' AND 'z'"
        " THEN 1000 ELSE 10000 END) * 16 + 14"
    ]
    for p, cost in sorted(_UNI_VOCAB.items()):
        pl = len(p)
        terms.append(
            f"CASE WHEN j+1 >= {pl} AND substr(word, j - {pl} + 2, {pl}) = '{p}'"
            f" THEN (costs[j - {pl} + 2] + {cost}) * 16 + {15 - pl} END"
        )
    return ",\n        ".join(terms)


def _uni_dp_sql(group: str | None = None) -> str:
    """The unigram-DP CTE chain (word counts → forward DP → backtrack),
    optionally carrying one extra group column through every CTE."""
    g = f"{group}, " if group else ""
    return f"""
    WITH RECURSIVE w AS (
      SELECT {g}w AS word, count(*) AS freq FROM (
        SELECT {g}unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents) GROUP BY ALL
    ),
    dp AS (
      SELECT {g}word, freq, length(word) AS len, 0 AS j,
             [CAST(0 AS BIGINT)] AS costs, [CAST(0 AS INT)] AS backs
      FROM w
      UNION ALL
      SELECT {g}word, freq, len, j + 1,
             list_append(costs, best >> 4),
             list_append(backs, CAST(15 - (best & 15) AS INT))
      FROM (
        SELECT *, least(
        {_uni_cands_sql()}
        ) AS best
        FROM dp WHERE j < len
      )
    ),
    fin AS (SELECT {g}word, freq, len, costs, backs FROM dp WHERE j = len),
    bt AS (
      SELECT {g}word, freq, len, costs, backs, len AS pos, '' AS s, 0 AS np
      FROM fin
      UNION ALL
      SELECT {g}word, freq, len, costs, backs,
             pos - backs[pos + 1],
             substr(word, pos - backs[pos + 1] + 1, backs[pos + 1])
               || CASE WHEN s = '' THEN '' ELSE ' ' END || s,
             np + 1
      FROM bt WHERE pos > 0
    )
    """


_UNI_ORACLE = (
    _uni_dp_sql()
    + """
    SELECT word, freq, s AS pieces, np AS n_pieces,
           costs[len + 1] AS total_cost
    FROM bt WHERE pos = 0
"""
)


@query("unigram_tokenize", oracle=_UNI_ORACLE)
def q_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece) Viterbi tokenization of every distinct corpus word against a literal integer-cost vocabulary - exact packed-key DP, corpus touched once for the word count."""
    from datalake_etlscripts_spark.operators import bpe

    d = read_table(spark, sf_dir, "documents").select("text")
    return bpe.unigram_viterbi_encode(d, _UNI_VOCAB)


@query(
    "tokenizer_fertility",
    oracle=_uni_dp_sql("lang")
    + """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           CAST(sum(freq) AS BIGINT) AS n_tokens,
           CAST(sum(freq * np) AS BIGINT) AS n_pieces,
           CAST(sum(freq * np) AS DOUBLE) / CAST(sum(freq) AS BIGINT)
             AS fertility
    FROM bt WHERE pos = 0 GROUP BY lang
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (pieces emitted per corpus word under the unigram vocab) - the audit behind vocabulary-allocation decisions; DP on distinct (lang, word) only."""
    from datalake_etlscripts_spark.operators import bpe

    d = read_table(spark, sf_dir, "documents").select("lang", "text")
    enc = bpe.unigram_viterbi_encode(d, _UNI_VOCAB, group_cols=("lang",))
    return enc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.sum("freq").alias("n_tokens"),
        F.sum(F.col("freq") * F.col("n_pieces")).alias("n_pieces"),
        (
            F.sum(F.col("freq") * F.col("n_pieces")).cast("double")
            / F.sum("freq")
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# LSH threshold-tuning curve: the exact-Jaccard DISTRIBUTION of the
# banded candidate pairs (threshold 0 — every candidate verified),
# bucketed into deciles. This is the plot you read before committing a
# dedup threshold: how much mass sits just under the cut, and how much
# the banding's s-curve lets through at low similarity.
# ---------------------------------------------------------------------------
_LSH_HIST_ORACLE = _MINHASH_ORACLE.rsplit("SELECT id_a", 1)[0] + """
    SELECT CAST(floor(jaccard * 10) AS BIGINT) AS bucket,
           count(*) AS n_pairs
    FROM jac GROUP BY 1
"""


@query("dedup_similarity_histogram", oracle=_LSH_HIST_ORACLE)
def q_dedup_similarity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH threshold-tuning curve: exact-Jaccard decile histogram of ALL banded candidate pairs (threshold 0) - the s-curve evidence behind choosing a dedup cut."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    d = spread_small_input(read_table(spark, sf_dir, "documents"))
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.0, scheme="md5")
    return pairs.groupBy(
        F.floor(F.col("jaccard") * 10).cast("bigint").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


# ---------------------------------------------------------------------------
# THE end-to-end web-corpus recipe (RefinedWeb/DataComp shape): scored
# URL filter → Gopher quality rules → exact dedup → fuzzy-dedup
# keep-best → benchmark decontamination, reported as a per-stage
# funnel. Every stage reuses an operator whose scale shape is tested
# on its own; this query proves they COMPOSE and gives the doc-count
# attrition curve a pipeline owner actually reads.
# ---------------------------------------------------------------------------
# stage-4 fuzzy pairs come from the minhash-LSH machinery (linear in
# corpus — blocked exact Jaccard's per-block pair count grows
# quadratically with block size, which does NOT survive a corpus-wide
# pipeline); the oracle splices the md5-scheme minhash CTE chain,
# re-pointed at s3, into the funnel.
_RW_MINHASH_FRAGMENT = (
    _MINHASH_ORACLE.split("WITH ", 1)[1]
    .rsplit("SELECT id_a, id_b, jaccard", 1)[0]
    .replace("FROM documents", "FROM s3")
    .rstrip()
    + ","
)

_RW_ORACLE = r"""
    WITH RECURSIVE d AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents
    ),
    t1 AS (
      SELECT *, list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM d
    ),
    u AS (
      SELECT *, lower(
        (CASE WHEN doc_id % 17 = 0 THEN 'ftp://' ELSE 'http://' END)
        || 'src' || CAST(doc_id % 5 AS VARCHAR) || '.example/'
        || coalesce(tk[1], 'x') || '/p' || CAST(doc_id AS VARCHAR)
        || (CASE WHEN doc_id % 13 = 0 THEN '.js' ELSE '.html' END)) AS url
      FROM t1
    ),
    s1 AS (
      SELECT * FROM u
      WHERE regexp_matches(url, '^https?://')
        AND NOT (url LIKE '%.css' OR url LIKE '%.js' OR url LIKE '%.ico'
                 OR url LIKE '%.woff')
        AND CAST((length(url) - length(replace(url, 'dup', ''))) / 3 AS BIGINT) * 4 < 4
    ),
    f2 AS (
      SELECT doc_id, text, lang, tk,
             length(text) AS nc,
             len(regexp_extract_all(text, '[^\w\s]')) AS np,
             len(tk) AS nt, len(list_distinct(tk)) AS nd,
             list_transform(range(1, greatest(len(tk) - 1, 1)),
                            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]) AS g3
      FROM s1
    ),
    s2 AS (
      SELECT doc_id, text, lang, tk FROM f2
      WHERE coalesce(nt >= 20 AND nt <= 100000, false)
        AND coalesce(CASE WHEN nt > 0 THEN CAST(nc - (nt-1) AS DOUBLE)/nt END
                     BETWEEN 2.0 AND 12.0, false)
        AND coalesce(CASE WHEN nc > 0 THEN CAST(np AS DOUBLE)/nc END <= 0.3, false)
        AND coalesce(CASE WHEN nt > 0 THEN CAST(nd AS DOUBLE)/nt END >= 0.3, false)
        AND coalesce(CASE WHEN len(g3) > 0 THEN
              CAST(list_max(list_transform(list_distinct(g3),
                   dd -> len(list_filter(g3, x -> x = dd)))) AS DOUBLE)/len(g3)
            END <= 0.18, false)
    ),
    s3 AS (
      SELECT s.* FROM s2 s
      JOIN (SELECT md5(text) AS fp, min(doc_id) AS mid FROM s2 GROUP BY 1) k
        ON s.doc_id = k.mid
    ),
MINHASH_FRAGMENT
    pairs AS (
      SELECT id_a, id_b FROM jac WHERE jaccard >= 0.04
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp0 AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
    scored AS (
      SELECT c.component, c.node,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY length(s.text) DESC, c.node ASC) AS rn
      FROM comp0 c JOIN s3 s ON s.doc_id = c.node
    ),
    s4 AS (
      SELECT * FROM s3
      WHERE doc_id NOT IN (SELECT node FROM scored WHERE rn > 1)
    ),
    bsh AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS sh
      FROM t1 WHERE doc_id % 97 = 0
    ),
    csh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]))) AS sh
      FROM s4
    ),
    s5 AS (
      SELECT * FROM s4 WHERE doc_id NOT IN (
        SELECT DISTINCT doc_id FROM csh WHERE sh IN (SELECT sh FROM bsh))
    )
    SELECT 0 AS stage_no, 'raw' AS stage, count(*) AS n_docs FROM d
    UNION ALL SELECT 1, 'url_filtered', count(*) FROM s1
    UNION ALL SELECT 2, 'quality', count(*) FROM s2
    UNION ALL SELECT 3, 'exact_dedup', count(*) FROM s3
    UNION ALL SELECT 4, 'fuzzy_dedup', count(*) FROM s4
    UNION ALL SELECT 5, 'decontaminated', count(*) FROM s5
""".replace("MINHASH_FRAGMENT", _RW_MINHASH_FRAGMENT)


@query("refinedweb_pipeline", oracle=_RW_ORACLE)
def q_refinedweb_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end web-corpus funnel: scored URL filter -> Gopher rules -> exact dedup -> fuzzy keep-best -> decontamination, doc counts per stage - the attrition curve of the whole recipe."""
    from pyspark.sql import Window as W

    from datalake_etlscripts_spark.crawl import url_quality_filter

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    first_tok = F.element_at(text.tokens(F.col("text")), 1)
    urls = d.withColumn(
        "url",
        F.concat(
            F.when(F.col("doc_id") % 17 == 0, F.lit("ftp://")).otherwise(
                F.lit("http://")
            ),
            F.lit("src"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".example/"),
            F.coalesce(first_tok, F.lit("x")),
            F.lit("/p"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 13 == 0, F.lit(".js")).otherwise(
                F.lit(".html")
            ),
        ),
    )
    s1 = (
        url_quality_filter(urls, strict_words=("dup",))
        .filter(F.col("keep"))
        .select(d.columns)
    )
    gq = text.gopher_quality_filter(s1).filter(F.col("keep")).select("doc_id")
    # six count branches share this lineage — settle the two stages
    # every later branch re-reads (lazy: no job until the first action)
    s2 = s1.join(gq, "doc_id", "left_semi").localCheckpoint(eager=False)
    s3 = dedup.dedup_keep_first(s2).localCheckpoint(eager=False)
    pairs = dedup.minhash_lsh_pairs(s3, threshold=0.04, scheme="md5")
    comp = dedup.connected_components_star(pairs)
    scored = comp.join(
        s3.select(F.col("doc_id").alias("node"), F.length("text").alias("_len")),
        "node",
    )
    w = W.partitionBy("component").orderBy(F.desc("_len"), F.asc("node"))
    drop = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select(F.col("node").alias("doc_id"))
    )
    # s4 feeds BOTH its own count branch and the decontamination
    # stage — without settling it, the fuzzy pairs + components
    # lineage (the expensive part) executes twice
    s4 = s3.join(drop, "doc_id", "left_anti").localCheckpoint(eager=False)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    s5 = dedup.decontaminate_corpus(s4, bench, k=5)

    def cnt(df: DataFrame, i: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(i).alias("stage_no"), F.lit(name).alias("stage"), "n_docs"
        )

    return (
        cnt(d, 0, "raw")
        .unionByName(cnt(s1, 1, "url_filtered"))
        .unionByName(cnt(s2, 2, "quality"))
        .unionByName(cnt(s3, 3, "exact_dedup"))
        .unionByName(cnt(s4, 4, "fuzzy_dedup"))
        .unionByName(cnt(s5, 5, "decontaminated"))
    )


@query(
    "unigram_piece_usage",
    oracle=_uni_dp_sql()
    + f"""
    SELECT piece,
           count(*) AS n_words,
           CAST(sum(freq) AS BIGINT) AS n_uses,
           piece IN ({", ".join(f"'{p}'" for p in sorted(_UNI_VOCAB))}) AS in_vocab
    FROM (SELECT word, freq, unnest(string_split(s, ' ')) AS piece
          FROM bt WHERE pos = 0)
    GROUP BY piece
    """,
)
def q_unigram_piece_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-vocab usage audit: corpus-weighted piece frequencies out of the Viterbi segmentation - the prune signal of unigram-LM training rounds (drop the pieces nobody's best path uses)."""
    from datalake_etlscripts_spark.operators import bpe

    d = read_table(spark, sf_dir, "documents").select("text")
    enc = bpe.unigram_viterbi_encode(d, _UNI_VOCAB)
    return (
        enc.select(
            "word", "freq", F.explode(F.split("pieces", " ")).alias("piece")
        )
        .groupBy("piece")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("freq").alias("n_uses"),
        )
        .withColumn("in_vocab", F.col("piece").isin(*sorted(_UNI_VOCAB)))
    )


# ---------------------------------------------------------------------------
# unigram-LM hard-EM TRAINING (r4): two full E/M rounds. Round 1 runs
# the literal-cost DP; the M-step re-costs pieces as
# max(1, floor(-1000·ln(uses/total) + 0.5)) and prunes unused ones;
# round 2 re-runs the DP against the COMPUTED costs (a one-row wide
# cross-joined cost table replaces the literals — the only structural
# difference from the round-1 CTE chain). floor(+0.5) is the
# engine-portable half-up convention (Python round() is banker's);
# ln() is the same-host libm on both engines — the documented
# portability boundary of the float re-costing story.
# ---------------------------------------------------------------------------
def _uni_train_oracle() -> str:
    in_list = ", ".join(f"'{p}'" for p in sorted(_UNI_VOCAB))
    cw_cols = ", ".join(
        f"max(CASE WHEN piece = '{p}' THEN cost END) AS c_{p}"
        for p in sorted(_UNI_VOCAB)
    )
    dyn_terms = [
        "(costs[j+1] + CASE WHEN substr(word, j+1, 1) BETWEEN 'a' AND 'z'"
        " THEN 1000 ELSE 10000 END) * 16 + 14"
    ]
    for p in sorted(_UNI_VOCAB):
        pl = len(p)
        dyn_terms.append(
            f"CASE WHEN c_{p} IS NOT NULL AND j+1 >= {pl}"
            f" AND substr(word, j - {pl} + 2, {pl}) = '{p}'"
            f" THEN (costs[j - {pl} + 2] + c_{p}) * 16 + {15 - pl} END"
        )
    dyn_cands = ",\n        ".join(dyn_terms)
    return (
        _uni_dp_sql()
        + f""",
    u1 AS (
      SELECT piece, CAST(sum(freq) AS BIGINT) AS uses
      FROM (SELECT freq, unnest(string_split(s, ' ')) AS piece
            FROM bt WHERE pos = 0)
      WHERE piece IN ({in_list})
      GROUP BY piece
    ),
    t1 AS (SELECT CAST(sum(uses) AS BIGINT) AS total FROM u1),
    c1 AS (
      SELECT piece,
             greatest(1, CAST(floor(-1000 * ln(CAST(uses AS DOUBLE) / total)
                                    + 0.5) AS BIGINT)) AS cost
      FROM u1, t1
    ),
    cw AS (SELECT {cw_cols} FROM c1),
    dp2 AS (
      SELECT word, freq, length(word) AS len, 0 AS j,
             [CAST(0 AS BIGINT)] AS costs, [CAST(0 AS INT)] AS backs
      FROM w
      UNION ALL
      SELECT word, freq, len, j + 1,
             list_append(costs, best >> 4),
             list_append(backs, CAST(15 - (best & 15) AS INT))
      FROM (
        SELECT dp2.*, least(
        {dyn_cands}
        ) AS best
        FROM dp2, cw WHERE j < len
      )
    ),
    fin2 AS (SELECT word, freq, len, costs, backs FROM dp2 WHERE j = len),
    bt2 AS (
      SELECT word, freq, len, costs, backs, len AS pos, '' AS s, 0 AS np
      FROM fin2
      UNION ALL
      SELECT word, freq, len, costs, backs,
             pos - backs[pos + 1],
             substr(word, pos - backs[pos + 1] + 1, backs[pos + 1])
               || CASE WHEN s = '' THEN '' ELSE ' ' END || s,
             np + 1
      FROM bt2 WHERE pos > 0
    ),
    u2 AS (
      SELECT piece, CAST(sum(freq) AS BIGINT) AS uses
      FROM (SELECT freq, unnest(string_split(s, ' ')) AS piece
            FROM bt2 WHERE pos = 0)
      WHERE piece IN (SELECT piece FROM c1)
      GROUP BY piece
    ),
    t2 AS (SELECT CAST(sum(uses) AS BIGINT) AS total FROM u2),
    c2 AS (
      SELECT piece, uses,
             greatest(1, CAST(floor(-1000 * ln(CAST(uses AS DOUBLE) / total)
                                    + 0.5) AS BIGINT)) AS cost
      FROM u2, t2
    )
    SELECT c2.piece, c1.cost AS cost_r1, c2.uses AS uses_r2,
           c2.cost AS cost_r2
    FROM c2 JOIN c1 ON c2.piece = c1.piece
    """
    )


@query("unigram_train_rounds", oracle=_uni_train_oracle())
def q_unigram_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two hard-EM rounds of unigram-LM training: per round one distributed Viterbi E-step + dictionary-sized driver M-step (floor-half-up milli-nat re-costing, unused pieces pruned) - the SentencePiece training loop, trajectory verified piece-by-piece."""
    from datalake_etlscripts_spark.operators import bpe

    d = read_table(spark, sf_dir, "documents").select("text")
    (c1, _u1), (c2, u2) = bpe.unigram_train(d, _UNI_VOCAB, rounds=2)
    rows = [(p, c1[p], u2[p], c2[p]) for p in sorted(c2)]
    return spark.createDataFrame(
        rows, "piece string, cost_r1 bigint, uses_r2 bigint, cost_r2 bigint"
    )


# ---------------------------------------------------------------------------
# pre-tokenization text canonicalization: the corpus is synthetic-clean,
# so both engines first inject the same mess (curly quotes, NBSP,
# dashes, ellipsis, Spanish accents, uppercase) by doc_id — then the
# normalize pass must fold every variant back.
# ---------------------------------------------------------------------------
@query(
    "normalize_corpus",
    oracle="""
    WITH messy AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END)
        || (CASE doc_id % 4
              WHEN 0 THEN ' “Hola Señor” '
              WHEN 1 THEN '   –dash— '
              WHEN 2 THEN ' Ándale… '
              ELSE '' END) AS raw
      FROM documents
    ),
    n AS (
      SELECT doc_id, raw,
        trim(regexp_replace(
          lower(replace(translate(raw,
            '‘’“”–— áéíóúüñÁÉÍÓÚÜÑ',
            '''''""-- aeiouunAEIOUUN'),
          '…', '...')),
          '\\s+', ' ', 'g')) AS text_norm
      FROM messy
    )
    SELECT doc_id, text_norm,
           length(raw) AS n_chars_raw,
           length(text_norm) AS n_chars_norm
    FROM n
    """,
)
def q_normalize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenization canonicalization pass: curly quotes/NBSP/dashes/ellipsis unified, accents stripped, lowercased, whitespace collapsed - pure expressions riding the scan."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    suffix = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(" “Hola Señor” "))
        .when(F.col("doc_id") % 4 == 1, F.lit("   –dash— "))
        .when(F.col("doc_id") % 4 == 2, F.lit(" Ándale… "))
        .otherwise(F.lit(""))
    )
    raw = F.concat(
        F.when(F.col("doc_id") % 5 == 0, F.upper("text")).otherwise(F.col("text")),
        suffix,
    )
    messy = d.select("doc_id", raw.alias("_raw"))
    return messy.select(
        "doc_id",
        text.normalize_text(F.col("_raw")).alias("text_norm"),
        F.length("_raw").alias("n_chars_raw"),
        F.length(text.normalize_text(F.col("_raw"))).alias("n_chars_norm"),
    )


@query(
    "temperature_mixture_sample",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
    d AS (
      SELECT list_reduce(list_prepend(0.0,
               list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang)),
               (a, b) -> a + b) AS den,
             CAST(sum(n) AS BIGINT) AS total
      FROM c
    ),
    r AS (
      SELECT lang,
             least(CAST(1 AS DOUBLE),
                   sqrt(CAST(n AS DOUBLE)) / den * total / n) AS rate
      FROM c, d
    )
    SELECT t.doc_id, t.lang, t.source
    FROM documents t JOIN r USING (lang)
    WHERE CAST(('0x' || substring(md5(CAST(t.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
          / 4294967296.0 < r.rate
    """,
)
def q_temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced multilingual sampling (alpha=1/2): sqrt-flattened language shares via broadcast rate dims + deterministic hash keep - low-resource languages over-represented, corpus never shuffled."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sampling.temperature_mixture_sample(d, "doc_id", "lang")


# ---------------------------------------------------------------------------
# incremental embedding near-dup: odd/injected ids arrive as the new
# batch and PROBE the persisted index of the even half — ingested
# vectors are never re-signatured. Equivalent to the full recompute
# restricted to pairs touching the batch (same planes, same bands), so
# the oracle is the batch-LSH twin with that restriction.
# ---------------------------------------------------------------------------
_EMB_INC_ORACLE = f"""
    SELECT id_a, id_b, cos_sim FROM ({_EMB_LSH_ORACLE})
    WHERE id_a % 2 = 1 OR id_a >= 100000 OR id_b % 2 = 1 OR id_b >= 100000
"""


@query("dedup_embedding_incremental", oracle=_EMB_INC_ORACLE)
def q_dedup_embedding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding near-dup: the new batch probes the persisted LSH bucket index - corpus never re-signatured, ingest cost linear in batch size."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    # r07 (guide §2.5): spread the single-task scan so the hyperplane
    # signature folds of both the index build and the batch probe run
    # wide (no-op once the input has real splits).
    corpus = spread_small_input(_near_dup_corpus(spark, sf_dir))
    is_batch = (F.col("vec_id") % 2 == 1) | (F.col("vec_id") >= 100000)
    batch = corpus.filter(is_batch)
    existing = corpus.filter(~is_batch)
    index = dedup.embedding_lsh_index(existing)
    pairs, _new_index = dedup.incremental_embedding_lsh(
        index, existing, batch, threshold=0.9
    )
    return pairs


# ---------------------------------------------------------------------------
# C4 badwords filter: exact-token blocklist as a broadcast join over
# the exploded corpus — the thousands-of-patterns scale path (a
# regex union is quadratic in pattern count; a token join is linear).
# ---------------------------------------------------------------------------
_BLOCK_TERMS = ["dup", "slow", "hash"]


@query(
    "badwords_filter",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id, count(*) AS n_blocked FROM (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS term
        FROM documents
      ) WHERE term IN ({", ".join(f"'{t}'" for t in _BLOCK_TERMS)})
      GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(h.n_blocked, 0) AS n_blocked,
           COALESCE(h.n_blocked, 0) = 0 AS keep
    FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
)
def q_badwords_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist-term filter: drop documents containing any blocked token - exploded-token broadcast join, linear in corpus and pattern count."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = spark.createDataFrame([(t,) for t in _BLOCK_TERMS], ["term"])
    return text.blocklist_term_filter(d, terms).select(
        "doc_id", "n_blocked", "keep"
    )


# ---------------------------------------------------------------------------
# collocation mining: adjacent-token pair LIFT (observed/expected under
# independence) — the log-free PMI twin, exact integer counts, two
# double divisions in fixed order. Min supports keep the Zipf tail out.
# ---------------------------------------------------------------------------
@query(
    "collocations",
    oracle="""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    uni AS (
      SELECT t AS term, count(*) AS n FROM (SELECT unnest(tk) AS t FROM tk)
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tokens FROM uni),
    bi AS (
      SELECT a, b, count(*) AS n_ab FROM (
        SELECT unnest(list_transform(range(1, greatest(len(tk), 1)),
                      i -> struct_pack(a := tk[i], b := tk[i+1]))) AS p
        FROM tk
      ) s(p), LATERAL (SELECT p.a AS a, p.b AS b) q
      WHERE b IS NOT NULL GROUP BY 1, 2
    )
    SELECT bi.a, bi.b, bi.n_ab,
           CAST(bi.n_ab AS DOUBLE) * tot.n_tokens
             / (CAST(ua.n AS DOUBLE) * ub.n) AS lift
    FROM bi, tot
    JOIN uni ua ON ua.term = bi.a
    JOIN uni ub ON ub.term = bi.b
    WHERE bi.n_ab >= 5
      AND CAST(bi.n_ab AS DOUBLE) * tot.n_tokens
            / (CAST(ua.n AS DOUBLE) * ub.n) >= 1.2
    """,
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: adjacent-pair lift (observed over expected-under-independence) - exact integer counts, the log-free PMI; broadcast unigram dims onto one pair-count shuffle."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = text.tokens(F.col("text"))
    uni = (
        d.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = uni.agg(F.sum("n").alias("n_tokens"))
    bi = (
        d.select(F.explode(text.ngrams(F.col("text"), 2)).alias("g"))
        .select(
            F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("a"),
            F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ua = uni.select(F.col("term").alias("a"), F.col("n").alias("_na"))
    ub = uni.select(F.col("term").alias("b"), F.col("n").alias("_nb"))
    lift = (
        F.col("n_ab").cast("double")
        * F.col("n_tokens")
        / (F.col("_na").cast("double") * F.col("_nb"))
    )
    return (
        bi.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .filter((F.col("n_ab") >= 5) & (lift >= 1.2))
        .select("a", "b", "n_ab", lift.alias("lift"))
    )


# ---------------------------------------------------------------------------
# cross-source duplication matrix: which feeds copy from which — every
# exact-duplicate group contributes its unordered source pairs. The
# provenance view behind "stop crawling feed X, it's a mirror of Y".
# ---------------------------------------------------------------------------
@query(
    "source_duplication_matrix",
    oracle="""
    WITH fp AS (SELECT doc_id, source, md5(text) AS fp FROM documents),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    )
    SELECT least(source_a, source_b) AS source_a,
           greatest(source_a, source_b) AS source_b,
           count(*) AS n_dup_pairs
    FROM pairs GROUP BY 1, 2
    """,
)
def q_source_duplication_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: exact-duplicate pairs rolled up by unordered source pair - the provenance audit behind dropping mirror feeds; fingerprint-keyed self-join, never all-pairs."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", text.content_fingerprint(F.col("text")).alias("_fp")
    )
    a = d.select(F.col("_fp"), F.col("doc_id").alias("_ida"), F.col("source").alias("_sa"))
    b = d.select(F.col("_fp"), F.col("doc_id").alias("_idb"), F.col("source").alias("_sb"))
    pairs = a.join(b, "_fp").filter(F.col("_ida") < F.col("_idb"))
    return pairs.groupBy(
        F.least("_sa", "_sb").alias("source_a"),
        F.greatest("_sa", "_sb").alias("source_b"),
    ).agg(F.count(F.lit(1)).alias("n_dup_pairs"))


# ---------------------------------------------------------------------------
# asymmetric containment dedup (Broder's containment vs resemblance):
# the synthetic corpus gets excerpt twins injected (first 12 tokens of
# every 9th doc re-appended as a new doc) so containment has real
# excerpt structure to find.
# ---------------------------------------------------------------------------
@query(
    "dedup_containment",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 2000000,
             array_to_string(list_filter(string_split(text, ' '),
                             x -> x <> '')[1:12], ' '),
             lang
      FROM documents WHERE doc_id % 9 = 0
    ),
    base AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(list_filter(string_split(text,' '), x -> x <> '')) - 1, 1)),
               i -> list_filter(string_split(text,' '), x -> x <> '')[i] || ' ' ||
                    list_filter(string_split(text,' '), x -> x <> '')[i+1] || ' ' ||
                    list_filter(string_split(text,' '), x -> x <> '')[i+2])) AS sh
      FROM corpus
    ),
    pairs AS (
      SELECT a.doc_id AS id_contained, b.doc_id AS id_container,
             CASE WHEN len(a.sh) > 0 THEN
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh)
             END AS containment
      FROM base a JOIN base b
        ON a.lang = b.lang AND a.doc_id <> b.doc_id
    )
    SELECT id_contained, id_container, containment
    FROM pairs WHERE containment >= 0.6
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (|A∩B|/|A| >= 0.6): excerpt/quote detection that symmetric Jaccard misses - lang-blocked self-join over injected excerpt twins."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    excerpt = d.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(F.slice(text.tokens(F.col("text")), 1, 12), " ").alias("text"),
        "lang",
    )
    corpus = d.unionByName(excerpt)
    return dedup.containment_pairs(corpus, threshold=0.6)


# ---------------------------------------------------------------------------
# leakage-aware split: the train/test hash is taken on the near-dup
# COMPONENT representative, not the document — a near-duplicate of a
# test document can never land in train (the eval-contamination bug in
# naive per-doc splits). Singletons are their own component.
# ---------------------------------------------------------------------------
@query(
    "leakage_aware_split",
    oracle=_CLUSTERS_ORACLE.replace(
        "SELECT node, min(lab) AS component FROM reach GROUP BY node",
        """, comp0 AS (SELECT node, min(lab) AS component FROM reach GROUP BY node)
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS component,
           CASE WHEN md5(CAST(COALESCE(c.component, d.doc_id) AS VARCHAR)) < '2a'
                THEN 'test' ELSE 'train' END AS split
    FROM documents d LEFT JOIN comp0 c ON c.node = d.doc_id""",
    ),
)
def q_leakage_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-aware train/test split: the hash membership is decided on the near-dup component representative, so no near-duplicate pair straddles the split - the eval-contamination guard naive per-doc splits lack."""
    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.04)
    comp = dedup.connected_components_star(pairs)
    out = d.select("doc_id").join(
        comp.select(F.col("node").alias("doc_id"), "component"), "doc_id", "left"
    )
    comp_id = F.coalesce(F.col("component"), F.col("doc_id"))
    return out.select(
        "doc_id",
        comp_id.alias("component"),
        F.when(F.md5(comp_id.cast("string")) < "2a", F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling (r4): hashed bag-of-words importance
# weights steering the raw corpus toward the benchmark slice
# (doc_id % 97 = 0 — the decontaminate convention's "target"). Both
# engines fix the per-bucket ln-ratio to integer micro-nats; doc
# scoring is pure BIGINT.
# ---------------------------------------------------------------------------
_DSIR_CTES = f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      FROM documents
    ),
    b AS (SELECT doc_id, {ddb_hex32("md5(term)")} % 1024 AS bucket FROM tok),
    ct AS (SELECT bucket, count(*) AS n FROM b WHERE doc_id % 97 = 0 GROUP BY bucket),
    cr AS (SELECT bucket, count(*) AS n FROM b WHERE doc_id % 97 <> 0 GROUP BY bucket),
    tt AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS t FROM ct),
    tr AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS t FROM cr),
    grid AS (SELECT range AS bucket FROM range(1024)),
    w AS (
      SELECT g.bucket,
             CAST(floor((ln((coalesce(ct.n, 0) + 1) / (tt.t + 1024))
                         - ln((coalesce(cr.n, 0) + 1) / (tr.t + 1024)))
                        * 1000000 + 0.5) AS BIGINT) AS lnr
      FROM grid g LEFT JOIN ct ON g.bucket = ct.bucket
                  LEFT JOIN cr ON g.bucket = cr.bucket, tt, tr
    ),
    pd AS (
      SELECT doc_id, bucket, count(*) AS n FROM b
      WHERE doc_id % 97 <> 0 GROUP BY 1, 2
    )
    """


_DSIR_ORACLE = (
    _DSIR_CTES
    + """
    SELECT doc_id,
           CAST(sum(n * w.lnr) AS BIGINT) AS log_weight_micro,
           sum(n * w.lnr) > 0 AS keep
    FROM pd JOIN w ON pd.bucket = w.bucket
    GROUP BY doc_id
"""
)


@query("dsir_importance_weights", oracle=_DSIR_ORACLE)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: per-doc hashed-bag ln-likelihood-ratio vs the benchmark slice, integer micro-nats end to end - the cheap corpus-steering selector (keep = more target-like than raw-like)."""
    from datalake_etlscripts_spark.operators.sampling import dsir_logweights

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    target = d.filter(F.col("doc_id") % 97 == 0)
    raw = d.filter(F.col("doc_id") % 97 != 0)
    return dsir_logweights(raw, target)


# ---------------------------------------------------------------------------
# small-file compaction planner (r4): the lakehouse OPTIMIZE shape.
# Files (one per doc here; a real lake feeds its manifest/inventory
# table) bin into ~64 KB output groups by running-total next-fit —
# exactly how Spark's own file coalescing packs splits. Windows run
# PER TABLE PARTITION (lang), matching how compaction is actually
# scheduled; per-partition file counts are bounded operationally
# (thousands), never corpus-scale.
# ---------------------------------------------------------------------------
@query(
    "compaction_plan",
    oracle="""
    WITH f AS (
      SELECT lang, doc_id, octet_length(encode(text)) AS n_bytes FROM documents
    ),
    c AS (
      SELECT lang, doc_id, n_bytes,
             CAST(sum(n_bytes) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM f
    )
    SELECT lang, CAST((cum - n_bytes) // 65536 AS BIGINT) AS bin,
           count(*) AS n_files, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY 1, 2
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: next-fit running-total binning of per-partition files into ~64 KB output groups - the OPTIMIZE/coalesce planner, windows bounded per table partition."""
    from pyspark.sql import Window as W

    d = read_table(spark, sf_dir, "documents")
    f = d.select(
        "lang", "doc_id", F.octet_length("text").alias("n_bytes")
    )
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    c = f.withColumn("cum", F.sum("n_bytes").over(w))
    return (
        c.withColumn("bin", F.expr("(cum - n_bytes) div 65536"))
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# in-engine classifier TRAINING (r4): distributed integer batch
# perceptron over hashed bag-of-words — the trainable twin of
# classifier_quality_score. Label: does the doc contain the token
# 'spark' (a learnable signal on the synthetic corpus — the
# perceptron must drive bucket('spark')'s weight positive). Three
# rounds unroll as chained CTEs; every weight is a 64-bit int.
# ---------------------------------------------------------------------------
def _perceptron_oracle() -> str:
    bkt = ddb_hex32("md5(term)")
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      FROM documents
    ),
    f0 AS (
      SELECT doc_id, {bkt} % 64 AS bucket, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY 1, 2
    ),
    feats AS (
      SELECT * FROM f0
      UNION ALL
      SELECT doc_id, CAST(-1 AS BIGINT), CAST(1 AS BIGINT) FROM documents
    ),
    labels AS (
      SELECT doc_id,
             CASE WHEN list_contains(list_filter(string_split(text, ' '),
                                                 x -> x <> ''), 'spark')
                  THEN 1 ELSE -1 END AS y
      FROM documents
    ),
    w1 AS (
      SELECT bucket, CAST(sum(y * n) AS BIGINT) AS w
      FROM feats JOIN labels USING (doc_id) GROUP BY bucket
    ),
    s2 AS (
      SELECT f.doc_id, CAST(sum(f.n * coalesce(w1.w, 0)) AS BIGINT) AS sc
      FROM feats f LEFT JOIN w1 ON f.bucket = w1.bucket GROUP BY 1
    ),
    m2 AS (
      SELECT l.doc_id, l.y FROM labels l JOIN s2 USING (doc_id)
      WHERE l.y * s2.sc <= 0
    ),
    u2 AS (
      SELECT bucket, CAST(sum(y * n) AS BIGINT) AS dw
      FROM feats JOIN m2 USING (doc_id) GROUP BY bucket
    ),
    w2 AS (
      SELECT coalesce(w1.bucket, u2.bucket) AS bucket,
             coalesce(w1.w, 0) + coalesce(u2.dw, 0) AS w
      FROM w1 FULL JOIN u2 ON w1.bucket = u2.bucket
    ),
    s3 AS (
      SELECT f.doc_id, CAST(sum(f.n * coalesce(w2.w, 0)) AS BIGINT) AS sc
      FROM feats f LEFT JOIN w2 ON f.bucket = w2.bucket GROUP BY 1
    ),
    m3 AS (
      SELECT l.doc_id, l.y FROM labels l JOIN s3 USING (doc_id)
      WHERE l.y * s3.sc <= 0
    ),
    u3 AS (
      SELECT bucket, CAST(sum(y * n) AS BIGINT) AS dw
      FROM feats JOIN m3 USING (doc_id) GROUP BY bucket
    ),
    w3 AS (
      SELECT coalesce(w2.bucket, u3.bucket) AS bucket,
             coalesce(w2.w, 0) + coalesce(u3.dw, 0) AS w
      FROM w2 FULL JOIN u3 ON w2.bucket = u3.bucket
    ),
    grid AS (SELECT range - 1 AS bucket FROM range(65))
    SELECT g.bucket, CAST(coalesce(w3.w, 0) AS BIGINT) AS weight
    FROM grid g LEFT JOIN w3 ON g.bucket = w3.bucket
    """


@query("perceptron_train_rounds", oracle=_perceptron_oracle())
def q_perceptron_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed integer batch-perceptron training of a hashed-bag quality filter (3 rounds, contains-'spark' label) - exact weight trajectory, dictionary-sized driver handoff per round."""
    from datalake_etlscripts_spark.operators.text import perceptron_train, tokens

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    label = F.when(
        F.array_contains(tokens(F.col("text")), "spark"), F.lit(1)
    ).otherwise(F.lit(-1))
    return perceptron_train(d, label, rounds=3)


# ---------------------------------------------------------------------------
# DSIR step 2 (r4): Gumbel-top-k RESAMPLING over the importance
# weights — selection ∝ weight without replacement, fully
# deterministic: per-doc md5-uniform quantizes to 1024 levels whose
# integer micro-nat Gumbel values are fixed driver-side (same
# floor-half-up + same-host-libm contract as the weights).
# ---------------------------------------------------------------------------
_GUMBEL_ORACLE = (
    _DSIR_CTES
    + f""",
    dsirout AS (
      SELECT doc_id, CAST(sum(n * w.lnr) AS BIGINT) AS log_weight_micro
      FROM pd JOIN w ON pd.bucket = w.bucket
      GROUP BY doc_id
    ),
    gdim AS (
      SELECT range AS lvl,
             CAST(floor(-ln(-ln((range + 0.5) / 1024)) * 1000000 + 0.5)
                  AS BIGINT) AS gumbel_micro
      FROM range(1024)
    ),
    keyed AS (
      SELECT d.doc_id, d.log_weight_micro, g.gumbel_micro,
             d.log_weight_micro + g.gumbel_micro AS key
      FROM dsirout d
      JOIN gdim g
        ON {ddb_hex32("md5('gumbel1' || CAST(d.doc_id AS VARCHAR))")} % 1024
           = g.lvl
    )
    SELECT doc_id, log_weight_micro, gumbel_micro, key,
           CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INT) AS rank
    FROM (SELECT * FROM keyed ORDER BY key DESC, doc_id LIMIT 100)
    """
)


@query("dsir_gumbel_resample", oracle=_GUMBEL_ORACLE)
def q_dsir_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: Gumbel-top-100 resampling over the importance weights - quantized integer Gumbel noise (1024 driver-fixed micro-nat levels), distributed TakeOrdered, no global sort."""
    from datalake_etlscripts_spark.operators.sampling import (
        dsir_logweights,
        gumbel_topk_resample,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    target = d.filter(F.col("doc_id") % 97 == 0)
    raw = d.filter(F.col("doc_id") % 97 != 0)
    weighted = dsir_logweights(raw, target).select("doc_id", "log_weight_micro")
    return gumbel_topk_resample(weighted, k=100)


# ---------------------------------------------------------------------------
# Hybrid retrieval via reciprocal-rank fusion (r4): keyword BM25 ⊕
# embedding ANN without score calibration — each retriever contributes
# scale // (60 + rank), integer division both engines, fused score a
# pure integer sum. The RAG-stack retrieval shape.
# ---------------------------------------------------------------------------
_RRF_ORACLE = f"""
    WITH bm AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
               AS r
      FROM ({_BM25_ORACLE})
    ),
    qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
    ann0 AS (
      SELECT vec_id AS doc_id,
        list_reduce(list_prepend(0.0, list_transform(list_zip(qv, embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (a,b) -> a + b)
        / (sqrt(list_reduce(list_prepend(0.0, list_transform(qv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))
         * sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b)))
          AS cs
      FROM embeddings, qv WHERE vec_id <> 7
    ),
    ann AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY cs DESC, doc_id) AS INT)
               AS r
      FROM ann0 QUALIFY r <= 20
    ),
    f AS (
      SELECT COALESCE(bm.doc_id, ann.doc_id) AS doc_id,
             bm.r AS bm25_rank, ann.r AS ann_rank,
             CAST(COALESCE(1000000000 // (60 + bm.r), 0)
                  + COALESCE(1000000000 // (60 + ann.r), 0) AS BIGINT)
               AS rrf_nano
      FROM bm FULL JOIN ann ON bm.doc_id = ann.doc_id
    )
    SELECT doc_id, bm25_rank, ann_rank, rrf_nano,
           CAST(row_number() OVER (ORDER BY rrf_nano DESC, doc_id) AS INT)
             AS fused_rank
    FROM f QUALIFY fused_rank <= 10
"""


@query("hybrid_search_rrf", oracle=_RRF_ORACLE)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 and embedding-ANN top-20 fused by reciprocal-rank fusion - integer scale//(60+rank) terms, no score calibration, fused top-10."""
    from datalake_etlscripts_spark.operators.similarity import (
        brute_force_topk,
        rrf_fuse,
    )

    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    bm = text.bm25_topk(d, _BM25_TERMS, k=20)
    wbm = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm_ranked = bm.withColumn("rank", F.row_number().over(wbm)).select(
        "doc_id", "rank"
    )
    e = read_table(spark, sf_dir, "embeddings")
    ann = brute_force_topk(e, e.filter(F.col("vec_id") == 7), k=20).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([("bm25", bm_ranked), ("ann", ann)], k=10)


# ---------------------------------------------------------------------------
# Exact ROC-AUC (r4): how much of the Gopher keep decision does raw
# length alone explain — the filter-ablation question, answered with
# the Mann-Whitney identity so the whole metric is exact integers +
# one division. The ordered window runs over the distinct TOKEN-COUNT
# grid (dictionary-sized), not the corpus.
# ---------------------------------------------------------------------------
_AUC_ORACLE = r"""
    WITH feat AS (
      SELECT doc_id, length(text) AS nc,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk,
             len(regexp_extract_all(text, '[^\w\s]')) AS np
      FROM documents
    ),
    f2 AS (
      SELECT doc_id, nc, np, len(tk) AS nt,
             len(list_distinct(tk)) AS nd,
             list_transform(range(1, greatest(len(tk) - 1, 1)),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS g3
      FROM feat
    ),
    sig AS (
      SELECT nt,
        CASE WHEN
          coalesce(nt >= 20 AND nt <= 100000, false)
          AND coalesce(CASE WHEN nt > 0 THEN CAST(nc - (nt - 1) AS DOUBLE) / nt END
                       BETWEEN 2.0 AND 12.0, false)
          AND coalesce(CASE WHEN nc > 0 THEN CAST(np AS DOUBLE) / nc END <= 0.3,
                       false)
          AND coalesce(CASE WHEN nt > 0 THEN CAST(nd AS DOUBLE) / nt END >= 0.3,
                       false)
          AND coalesce(CASE WHEN len(g3) > 0 THEN
                CAST(list_max(list_transform(list_distinct(g3),
                     d -> len(list_filter(g3, x -> x = d)))) AS DOUBLE) / len(g3)
              END <= 0.18, false)
        THEN 1 ELSE 0 END AS pos
      FROM f2
    ),
    grid AS (
      SELECT nt AS s, CAST(sum(pos) AS BIGINT) AS p,
             CAST(sum(1 - pos) AS BIGINT) AS q
      FROM sig GROUP BY nt
    ),
    cum AS (
      SELECT s, p, q,
             CAST(COALESCE(sum(q) OVER (ORDER BY s ROWS BETWEEN
               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cq
      FROM grid
    )
    SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(q) AS BIGINT) AS n_neg,
           CAST(sum(p * (2 * cq + q)) AS BIGINT) AS u2,
           CAST(CAST(sum(p * (2 * cq + q)) AS BIGINT) AS DOUBLE)
             / CAST(2 * CAST(sum(p) AS BIGINT) * CAST(sum(q) AS BIGINT)
                    AS DOUBLE) AS auc
    FROM cum
"""


@query("gopher_length_auc", oracle=_AUC_ORACLE)
def q_gopher_length_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of token count at predicting the Gopher keep decision (Mann-Whitney rank identity) - filter ablation as exact integers plus one division, distinct-token-count grid window."""
    from datalake_etlscripts_spark.operators.expectations import rank_auc

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = d.select(
        "doc_id", F.size(text.tokens(F.col("text"))).alias("n_tokens")
    )
    keep = text.gopher_quality_filter(d).select("doc_id", "keep")
    joined = scored.join(keep, "doc_id").select(
        "n_tokens", F.col("keep").cast("int").alias("label")
    )
    return rank_auc(joined, "n_tokens", "label")


# ---------------------------------------------------------------------------
# chi-square feature selection (r5): which vocabulary terms carry
# label signal — the pruning step in front of every hashed-bag
# classifier here (perceptron / DSIR / NB-style filters). Exact
# integer contingency tables; chi2 is one fixed-order double
# expression; top-k is TakeOrdered, never a global sort.
# ---------------------------------------------------------------------------
_CHI2_ORACLE = """
    WITH lab AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))
               AS tk
      FROM documents
    ),
    tot AS (
      SELECT CAST(sum(y) AS BIGINT) AS npos,
             CAST(sum(1 - y) AS BIGINT) AS nneg
      FROM lab
    ),
    pt AS (SELECT unnest(tk) AS term, y FROM lab),
    ag AS (
      SELECT term, CAST(sum(y) AS BIGINT) AS df_pos,
             CAST(sum(1 - y) AS BIGINT) AS df_neg
      FROM pt GROUP BY term
    ),
    x AS (
      SELECT term, df_pos, df_neg, npos, nneg,
             CAST(df_pos AS HUGEINT) * (nneg - df_neg)
               - CAST(df_neg AS HUGEINT) * (npos - df_pos) AS delta,
             df_pos + df_neg AS dfq, npos + nneg AS n
      FROM ag CROSS JOIN tot
    )
    SELECT term, df_pos, df_neg,
           ((CAST(n AS DOUBLE) * CAST(CAST(delta AS VARCHAR) AS DOUBLE))
              * CAST(CAST(delta AS VARCHAR) AS DOUBLE))
           / ((CAST(dfq AS DOUBLE) * CAST(n - dfq AS DOUBLE))
              * (CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE))) AS chi2
    FROM x
    WHERE dfq >= 3 AND n - dfq > 0
    ORDER BY chi2 DESC, term ASC LIMIT 50
"""


@query("chi2_feature_select", oracle=_CHI2_ORACLE)
def q_chi2_feature_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square term-label feature selection (the vocabulary-pruning step in front of hashed-bag classifiers) - exact integer contingency tables, one fixed-order double expression, TakeOrdered top-k."""
    d = read_table(spark, sf_dir, "documents")
    return text.chi2_term_label(d, F.col("lang") == "en")


# ---------------------------------------------------------------------------
# Average precision (r5): the PR-curve twin of gopher_length_auc —
# does English-stopword density retrieve the English slice? Exact
# integer grid counts, per-threshold precision as one fixed-order
# double term, terms folded in descending-score order (bounded grid).
# ---------------------------------------------------------------------------
_AP_ORACLE = """
    WITH g AS (
      SELECT len(list_filter(list_filter(string_split(text, ' '),
                                         x -> x <> ''),
                 t -> list_contains(['the','and','of','to','a','in','is',
                                     'it','for','on'], t))) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    grid AS (
      SELECT s, CAST(sum(y) AS BIGINT) AS p,
             CAST(sum(1 - y) AS BIGINT) AS q
      FROM g GROUP BY s
    ),
    cum AS (
      SELECT s, p, q,
             CAST(sum(p) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
             CAST(sum(q) OVER (ORDER BY s DESC) AS BIGINT) AS fp
      FROM grid
    )
    SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(q) AS BIGINT) AS n_neg,
           list_reduce(
             list_prepend(0.0,
               list((CAST(p AS DOUBLE) * CAST(tp AS DOUBLE))
                      / CAST(tp + fp AS DOUBLE) ORDER BY s DESC)),
             (a, b) -> a + b) / CAST(sum(p) AS DOUBLE) AS ap
    FROM cum
"""


@query("average_precision", oracle=_AP_ORACLE)
def q_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision of English-stopword density at retrieving the English slice (PR-curve area, step integration) - integer grid counts, descending-score ordered fold."""
    from datalake_etlscripts_spark.operators.expectations import average_precision

    d = read_table(spark, sf_dir, "documents")
    scored = d.select(
        text.stopword_hits(F.col("text"), "en").alias("sw_hits"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return average_precision(scored, "sw_hits", "is_en")


# ---------------------------------------------------------------------------
# Calibration audit (r5): reliability diagram + per-bin Brier score of
# the stopword-density "probability" at predicting the English slice.
# Micro-probability integers end to end; squared sums in DECIMAL;
# every double is one fixed-order division chain.
# ---------------------------------------------------------------------------
_CALIB_ORACLE = """
    WITH g AS (
      SELECT least(least(len(list_filter(list_filter(string_split(text, ' '),
                                                     x -> x <> ''),
                        t -> list_contains(['the','and','of','to','a','in',
                                            'is','it','for','on'], t)))
                     , 10) * 100000, 999999) AS p,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM documents
    ),
    agg AS (
      SELECT p // 100000 AS bin, count(*) AS n,
             CAST(sum(p) AS HUGEINT) AS sp,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(CAST(p - y * 1000000 AS HUGEINT)
                      * CAST(p - y * 1000000 AS HUGEINT)) AS HUGEINT) AS sq
      FROM g GROUP BY 1
    )
    SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n, n_pos,
           (CAST(CAST(sp AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
             / 1000000.0 AS avg_pred,
           CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
           (CAST(CAST(sq AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
             / 1000000000000.0 AS brier
    FROM agg
"""


@query("calibration_bins", oracle=_CALIB_ORACLE)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + per-bin Brier score (classifier calibration audit) - micro-probability integers, DECIMAL squared sums, fixed-order division chains."""
    from datalake_etlscripts_spark.operators.expectations import calibration_table

    d = read_table(spark, sf_dir, "documents")
    scored = d.select(
        (F.least(text.stopword_hits(F.col("text"), "en"), F.lit(10)) * 100000)
        .cast("long")
        .alias("p_micro"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return calibration_table(scored, "p_micro", "is_en")


# ---------------------------------------------------------------------------
# Decision-stump training (r5): the boosting weak learner / filter
# baseline trained in-engine — exact integer Gini split search over
# quantized (n_chars, n_tokens) grids predicting the English slice.
# ---------------------------------------------------------------------------
_STUMP_ORACLE = """
    WITH base AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             n_chars // 16 AS xc,
             len(list_filter(string_split(text, ' '), x -> x <> '')) // 4 AS xt
      FROM documents
    ),
    u AS (
      SELECT 'n_chars_div16' AS feature, xc AS x, y FROM base
      UNION ALL
      SELECT 'n_tokens_div4' AS feature, xt AS x, y FROM base
    ),
    g AS (
      SELECT feature, x, CAST(sum(y) AS BIGINT) AS p,
             CAST(sum(1 - y) AS BIGINT) AS q
      FROM u GROUP BY 1, 2
    ),
    c AS (
      SELECT feature, x, p, q,
             CAST(sum(p) OVER (PARTITION BY feature ORDER BY x) AS BIGINT) AS lp,
             CAST(sum(q) OVER (PARTITION BY feature ORDER BY x) AS BIGINT) AS ln,
             CAST(sum(p) OVER (PARTITION BY feature) AS BIGINT) AS tp,
             CAST(sum(q) OVER (PARTITION BY feature) AS BIGINT) AS tq
      FROM g
    ),
    s AS (
      SELECT feature, x, lp + ln AS l, (tp + tq) - (lp + ln) AS r,
             (lp + ln) * (lp + ln) - lp * lp - ln * ln AS a,
             ((tp + tq) - (lp + ln)) * ((tp + tq) - (lp + ln))
               - (tp - lp) * (tp - lp) - (tq - ln) * (tq - ln) AS b
      FROM c
    ),
    k AS (
      SELECT feature, x, l, r,
             (CAST(a AS DOUBLE) * CAST(r AS DOUBLE)
                + CAST(b AS DOUBLE) * CAST(l AS DOUBLE))
               / (CAST(l AS DOUBLE) * CAST(r AS DOUBLE)) AS cost,
             row_number() OVER (PARTITION BY feature
                                ORDER BY (CAST(a AS DOUBLE) * CAST(r AS DOUBLE)
                + CAST(b AS DOUBLE) * CAST(l AS DOUBLE))
               / (CAST(l AS DOUBLE) * CAST(r AS DOUBLE)) ASC, x ASC) AS rk
      FROM s WHERE r > 0
    )
    SELECT feature, CAST(x AS BIGINT) AS threshold, l AS n_left, r AS n_right,
           cost
    FROM k WHERE rk = 1
"""


@query("decision_stump_train", oracle=_STUMP_ORACLE)
def q_decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-1 decision-tree training by exact integer Gini split search over quantized feature grids (the boosting weak learner) - one grid shuffle, fixed-order double cost, deterministic argmin."""
    from datalake_etlscripts_spark.operators.expectations import decision_stump

    d = read_table(spark, sf_dir, "documents")
    y = (F.col("lang") == "en").cast("int").alias("y")
    f1 = d.select(
        F.lit("n_chars_div16").alias("feature"),
        F.expr("n_chars div 16").alias("x"),
        y,
    )
    f2 = d.select(
        F.lit("n_tokens_div4").alias("feature"),
        F.expr("size(filter(split(text, ' '), t -> t != '')) div 4").alias("x"),
        y,
    )
    return decision_stump(f1.unionByName(f2))


# ---------------------------------------------------------------------------
# Boolean retrieval (r5): (scan AND join) AND NOT window, scored by
# should-hits on {merge, sort} — the inverted-index Boolean operator
# beside phrase_search/bm25; postings pruned to query terms before
# any shuffle.
# ---------------------------------------------------------------------------
@query(
    "boolean_retrieval",
    oracle="""
    WITH post0 AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(string_split(text, ' '),
                                              x -> x <> ''))) AS term
      FROM documents
    ),
    p AS (SELECT doc_id, term FROM post0
          WHERE term IN ('scan','join','merge','sort','window')),
    m AS (SELECT doc_id FROM p WHERE term IN ('scan','join')
          GROUP BY doc_id HAVING count(DISTINCT term) = 2),
    nn AS (SELECT DISTINCT doc_id FROM p WHERE term = 'window'),
    s AS (SELECT doc_id, count(DISTINCT term) AS n_should FROM p
          WHERE term IN ('merge','sort') GROUP BY 1)
    SELECT m.doc_id, CAST(COALESCE(s.n_should, 0) AS BIGINT) AS n_should
    FROM m LEFT JOIN s USING (doc_id)
    WHERE m.doc_id NOT IN (SELECT doc_id FROM nn)
    """,
)
def q_boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean inverted-index retrieval: must={scan, join}, must_not={window}, scored by should-hits on {merge, sort} - postings pruned to query terms, keyed reductions only."""
    d = read_table(spark, sf_dir, "documents")
    return text.boolean_retrieval(
        d, must=["scan", "join"], should=["merge", "sort"], must_not=["window"]
    )


# ---------------------------------------------------------------------------
# Per-source unigram entropy (r5): the diversity signal that flags
# template-heavy sources before mixing weights are chosen — exact
# integer numerator via the distinct-count micro-nat ln table.
# ---------------------------------------------------------------------------
@query(
    "source_token_entropy",
    oracle="""
    WITH tok AS (
      SELECT source AS k,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ),
    c AS (SELECT k, t, count(*) AS c FROM tok GROUP BY 1, 2),
    tt AS (SELECT k, CAST(sum(c) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS types
           FROM c GROUP BY 1),
    s AS (
      SELECT k, CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5)
                                  AS BIGINT)) AS BIGINT) AS s
      FROM c GROUP BY 1
    )
    SELECT tt.k AS source, tt.n AS n_tokens, tt.types AS n_types,
           CAST(CAST(tt.n * CAST(floor(ln(CAST(tt.n AS DOUBLE)) * 1000000 + 0.5)
                                 AS BIGINT) - s.s AS VARCHAR) AS DOUBLE)
             / (CAST(tt.n AS DOUBLE) * 1000000.0) AS entropy_nats
    FROM tt JOIN s USING (k)
    """,
)
def q_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's unigram distribution (template/boilerplate detector) - exact BIGINT numerator from a distinct-count micro-nat ln table, one division per source."""
    d = read_table(spark, sf_dir, "documents")
    return text.source_token_entropy(d)


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes (r5): the multi-class lang-id classifier
# trained in-engine on the even half, evaluated on the odd half as a
# confusion matrix — bucket-sized models only at the driver, micro-nat
# ln weights, pure-BIGINT scoring, window argmax with deterministic
# ties.
# ---------------------------------------------------------------------------
def _nb_oracle(n_buckets: int = 512) -> str:
    from datalake_etlscripts_spark.plans.registry import ddb_hex32

    h = ddb_hex32("md5(t)")
    return f"""
    WITH tr AS (SELECT lang, text FROM documents WHERE doc_id % 2 = 0),
    te AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 1),
    trb AS (
      SELECT lang AS c, {h} % {n_buckets} AS bucket
      FROM (SELECT lang, unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS t FROM tr)
    ),
    cb AS (SELECT c, bucket, count(*) AS n FROM trb GROUP BY 1, 2),
    tc AS (SELECT c, CAST(sum(n) AS BIGINT) AS tot FROM cb GROUP BY 1),
    dc AS (SELECT lang AS c, count(*) AS d FROM tr GROUP BY 1),
    dt AS (SELECT CAST(sum(d) AS BIGINT) AS dtot FROM dc),
    grid AS (SELECT tc.c, gs.b AS bucket FROM tc
             CROSS JOIN (SELECT unnest(range({n_buckets})) AS b) gs),
    w AS (
      SELECT grid.c, grid.bucket,
             CAST(floor(ln((COALESCE(cb.n, 0) + 1)
                           / CAST(tc.tot + {n_buckets} AS DOUBLE))
                        * 1000000 + 0.5) AS BIGINT) AS lnp
      FROM grid JOIN tc ON tc.c = grid.c
      LEFT JOIN cb ON cb.c = grid.c AND cb.bucket = grid.bucket
    ),
    pr AS (SELECT c, CAST(floor(ln(d / CAST(dtot AS DOUBLE)) * 1000000 + 0.5)
                          AS BIGINT) AS lnprior
           FROM dc, dt),
    feats AS (
      SELECT doc_id, bucket, count(*) AS n FROM (
        SELECT doc_id, {h} % {n_buckets} AS bucket
        FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                                x -> x <> '')) AS t FROM te)
      ) GROUP BY 1, 2
    ),
    sc AS (SELECT f.doc_id, w.c, CAST(sum(f.n * w.lnp) AS BIGINT) AS s
           FROM feats f JOIN w ON f.bucket = w.bucket GROUP BY 1, 2),
    sc2 AS (SELECT sc.doc_id, sc.c, sc.s + pr.lnprior AS score
            FROM sc JOIN pr ON pr.c = sc.c),
    p AS (SELECT doc_id, c FROM sc2
          QUALIFY row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, c ASC) = 1)
    SELECT te.lang AS actual, p.c AS predicted, count(*) AS n
    FROM te JOIN p USING (doc_id) GROUP BY 1, 2
    """


@query("naive_bayes_confusion", oracle=_nb_oracle())
def q_naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes lang-id trained on the even half, confusion matrix on the odd half - bounded class-bucket models, micro-nat ln weights, pure-BIGINT scoring with deterministic argmax."""
    from datalake_etlscripts_spark.operators.sampling import naive_bayes_confusion

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    return naive_bayes_confusion(train, test)


# ---------------------------------------------------------------------------
# Per-slice AUC (r5): gopher_length_auc disaggregated by language —
# the robustness-evaluation practice of never trusting one global
# metric; same exact Mann-Whitney integers per slice.
# ---------------------------------------------------------------------------
_AUC_BY_ORACLE = r"""
    WITH feat AS (
      SELECT lang, length(text) AS nc,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk,
             len(regexp_extract_all(text, '[^\w\s]')) AS np
      FROM documents
    ),
    f2 AS (
      SELECT lang, nc, np, len(tk) AS nt,
             len(list_distinct(tk)) AS nd,
             list_transform(range(1, greatest(len(tk) - 1, 1)),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS g3
      FROM feat
    ),
    sig AS (
      SELECT lang, nt,
        CASE WHEN
          coalesce(nt >= 20 AND nt <= 100000, false)
          AND coalesce(CASE WHEN nt > 0 THEN CAST(nc - (nt - 1) AS DOUBLE) / nt END
                       BETWEEN 2.0 AND 12.0, false)
          AND coalesce(CASE WHEN nc > 0 THEN CAST(np AS DOUBLE) / nc END <= 0.3,
                       false)
          AND coalesce(CASE WHEN nt > 0 THEN CAST(nd AS DOUBLE) / nt END >= 0.3,
                       false)
          AND coalesce(CASE WHEN len(g3) > 0 THEN
                CAST(list_max(list_transform(list_distinct(g3),
                     d -> len(list_filter(g3, x -> x = d)))) AS DOUBLE) / len(g3)
              END <= 0.18, false)
        THEN 1 ELSE 0 END AS pos
      FROM f2
    ),
    grid AS (
      SELECT lang, nt AS s, CAST(sum(pos) AS BIGINT) AS p,
             CAST(sum(1 - pos) AS BIGINT) AS q
      FROM sig GROUP BY 1, 2
    ),
    cum AS (
      SELECT lang, s, p, q,
             CAST(COALESCE(sum(q) OVER (PARTITION BY lang ORDER BY s ROWS
               BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cq
      FROM grid
    )
    SELECT lang, CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(q) AS BIGINT) AS n_neg,
           CAST(sum(p * (2 * cq + q)) AS BIGINT) AS u2,
           CASE WHEN sum(p) > 0 AND sum(q) > 0 THEN
             CAST(CAST(sum(p * (2 * cq + q)) AS BIGINT) AS DOUBLE)
               / CAST(2 * CAST(sum(p) AS BIGINT) * CAST(sum(q) AS BIGINT)
                      AS DOUBLE)
           END AS auc
    FROM cum GROUP BY lang
"""


@query("auc_by_language", oracle=_AUC_BY_ORACLE)
def q_auc_by_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disaggregated exact ROC-AUC: token count vs the Gopher keep decision scored PER LANGUAGE (slice-based model evaluation) - Mann-Whitney integers per slice, try_divide degenerate slices."""
    from datalake_etlscripts_spark.operators.expectations import rank_auc_by

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = d.select(
        "doc_id", "lang", F.size(text.tokens(F.col("text"))).alias("n_tokens")
    )
    keep = text.gopher_quality_filter(d).select("doc_id", "keep")
    joined = scored.join(keep, "doc_id").select(
        "lang", "n_tokens", F.col("keep").cast("int").alias("label")
    )
    return rank_auc_by(joined, "lang", "n_tokens", "label")


# ---------------------------------------------------------------------------
# Water-filling mixture plan (r5): realize target source weights under
# a total budget with saturation redistribution — the exact relational
# solve (integer cross-multiplications, no floats, no driver loop).
# ---------------------------------------------------------------------------
_WATERFILL_ORACLE = """
    WITH src AS (SELECT source AS k, CAST(count(*) AS BIGINT) AS n
                 FROM documents GROUP BY 1),
    wts AS (SELECT k, n,
                   CAST(row_number() OVER (ORDER BY k) * 100000 AS BIGINT) AS w
            FROM src),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(w) AS BIGINT) AS tw
            FROM wts),
    bud AS (SELECT CAST(tn * 3 // 5 AS BIGINT) AS b, tw FROM tot),
    rk AS (
      SELECT k, n, w,
             row_number() OVER (ORDER BY CAST(n AS DOUBLE) / CAST(w AS DOUBLE)
                                ASC, k ASC) AS rn,
             CAST(sum(n) OVER (ORDER BY CAST(n AS DOUBLE) / CAST(w AS DOUBLE)
                  ASC, k ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cumn,
             CAST(sum(w) OVER (ORDER BY CAST(n AS DOUBLE) / CAST(w AS DOUBLE)
                  ASC, k ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cumw,
             lead(n) OVER (ORDER BY CAST(n AS DOUBLE) / CAST(w AS DOUBLE)
                           ASC, k ASC) AS nn,
             lead(w) OVER (ORDER BY CAST(n AS DOUBLE) / CAST(w AS DOUBLE)
                           ASC, k ASC) AS nw
      FROM wts
    ),
    cand AS (
      SELECT rn AS key_rn, b - cumn AS num, tw - cumw AS den,
             n AS bn, w AS bw, nn, nw
      FROM rk, bud
      UNION ALL
      SELECT 0, b, tw, CAST(0 AS BIGINT), CAST(1 AS BIGINT), f.n, f.w
      FROM bud, (SELECT n, w FROM rk WHERE rn = 1) f
    ),
    valid AS (
      SELECT * FROM cand
      WHERE num * bw >= bn * den
        AND (nn IS NULL OR num * nw <= nn * den)
    ),
    ch AS (SELECT key_rn AS kstar, num, den FROM valid
           ORDER BY key_rn ASC LIMIT 1)
    SELECT rk.k AS source, rk.n AS n_docs, rk.w AS w_micro,
           CAST(CASE WHEN rk.rn <= ch.kstar THEN rk.n
                     ELSE (ch.num * rk.w) // ch.den END AS BIGINT) AS kept,
           rk.rn <= ch.kstar AS saturated
    FROM rk, ch
"""


@query("mixture_waterfill", oracle=_WATERFILL_ORACLE)
def q_mixture_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling mixture realization: allocate a 60% corpus budget across sources proportional to target weights with exact saturation redistribution - integer cross-multiplication solve, sources-sized table, no driver loop."""
    from pyspark.sql import Window

    from datalake_etlscripts_spark.operators.sampling import mixture_waterfill

    d = read_table(spark, sf_dir, "documents")
    src = d.groupBy(F.col("source")).agg(F.count(F.lit(1)).alias("n_docs"))
    wts = src.withColumn(
        "w_micro",
        (F.row_number().over(Window.orderBy("source")) * 100000).cast("long"),
    )
    budget = d.count() * 3 // 5
    return mixture_waterfill(wts, budget)


# ---------------------------------------------------------------------------
# ANN quality evaluation (r5): recall@5 and MRR of the IVF index
# against the exact brute-force ground truth — THE standard ANN
# acceptance metric, composed by nesting the two already-registered
# oracles, so the eval can never drift from what the queries compute.
# Reciprocal ranks are exact integers via the LCM(1..5)=60 scaling.
# ---------------------------------------------------------------------------
from datalake_etlscripts_spark.plans import registry as _registry  # noqa: E402

_RECALL_ORACLE = f"""
    WITH brute AS (
      SELECT query_id, neighbor_id AS true_nn
      FROM ({_registry.ORACLES["ann_cosine_topk"]}) WHERE rank = 1
    ),
    appr AS (
      SELECT query_id, neighbor_id, rank
      FROM ({_registry.ORACLES["ann_ivf_topk"]})
    ),
    j AS (
      SELECT b.query_id, a.rank
      FROM brute b LEFT JOIN appr a
        ON a.query_id = b.query_id AND a.neighbor_id = b.true_nn
    )
    SELECT count(*) AS n_queries,
           CAST(count(rank) AS BIGINT) AS n_found,
           CAST(count(rank) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_at_5,
           CAST(CAST(COALESCE(sum(60 // rank), 0) AS BIGINT) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 60.0) AS mrr
    FROM j
"""


@query("ann_recall_mrr", oracle=_RECALL_ORACLE)
def q_ann_recall_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index acceptance metrics: recall@5 and MRR of IVF against exact brute-force ground truth - reciprocal ranks exact via LCM-60 integers, oracles composed from the registered twins."""
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    brute1 = (
        similarity.brute_force_topk(e, q, k=5)
        .filter(F.col("rank") == 1)
        .select("query_id", F.col("neighbor_id").alias("true_nn"))
    )
    appr = similarity.ivf_ann_topk(
        e, q, k=5, centroids=_ivf_literal_centroids()
    ).select(F.col("query_id").alias("_qid"), "neighbor_id", "rank")
    j = brute1.join(
        appr,
        (brute1["query_id"] == appr["_qid"])
        & (brute1["true_nn"] == appr["neighbor_id"]),
        "left",
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.count("rank").cast("long").alias("n_found"),
        (
            F.count("rank").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("recall_at_5"),
        (
            F.coalesce(F.sum(F.expr("60 div rank")), F.lit(0))
            .cast("long")
            .cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(60.0))
        ).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# AdaBoost rounds (r6): the boosting loop over the stump weak learner
# — exact integer reweighting ((W−err)/err ratio as two integer
# factors), unrolled-CTE oracle mirroring every argmin.
# ---------------------------------------------------------------------------
def _adaboost_oracle(rounds: int = 3) -> str:
    parts = [
        """
    WITH base AS (
      SELECT doc_id AS id,
             CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS ypm,
             n_chars // 16 AS xc,
             len(list_filter(string_split(text, ' '), x -> x <> '')) // 4 AS xt
      FROM documents
    ),
    feats AS (
      SELECT id, 'n_chars_div16' AS feature, xc AS x, ypm FROM base
      UNION ALL
      SELECT id, 'n_tokens_div4' AS feature, xt AS x, ypm FROM base
    ),
    w0 AS (SELECT id, CAST(1 AS HUGEINT) AS w FROM base)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(f""",
    g{t} AS (
      SELECT f.feature, f.x,
             CAST(sum(CASE WHEN f.ypm = 1 THEN w.w ELSE 0 END) AS HUGEINT) AS wp,
             CAST(sum(CASE WHEN f.ypm = -1 THEN w.w ELSE 0 END) AS HUGEINT) AS wn
      FROM feats f JOIN w{t - 1} w USING (id) GROUP BY 1, 2
    ),
    c{t} AS (
      SELECT feature, x,
             sum(wp) OVER (PARTITION BY feature ORDER BY x) AS cwp,
             sum(wn) OVER (PARTITION BY feature ORDER BY x) AS cwn,
             sum(wp) OVER (PARTITION BY feature) AS tp,
             sum(wn) OVER (PARTITION BY feature) AS tn
      FROM g{t}
    ),
    e{t} AS (
      SELECT feature, x AS thr,
             CASE WHEN cwn + (tp - cwp) <= cwp + (tn - cwn)
                  THEN 1 ELSE -1 END AS pol,
             CASE WHEN cwn + (tp - cwp) <= cwp + (tn - cwn)
                  THEN cwn + (tp - cwp) ELSE cwp + (tn - cwn) END AS err,
             tp + tn AS tot
      FROM c{t}
    ),
    b{t} AS (
      SELECT feature, thr, pol, err, tot FROM (
        SELECT *, row_number() OVER (ORDER BY err ASC, feature ASC, thr ASC) AS rk
        FROM e{t}
      ) WHERE rk = 1
    ),
    h{t} AS (
      SELECT f.id, f.ypm,
             CASE WHEN f.x <= b.thr THEN b.pol ELSE -b.pol END AS h
      FROM feats f JOIN b{t} b ON f.feature = b.feature
    ),
    w{t} AS (
      SELECT h.id,
             CAST(w.w * (CASE WHEN h.h <> h.ypm
                    THEN b.tot - (CASE WHEN b.err > 0 THEN b.err ELSE 1 END)
                    ELSE (CASE WHEN b.err > 0 THEN b.err ELSE 1 END) END)
               AS HUGEINT) AS w
      FROM w{t - 1} w JOIN h{t} h USING (id) CROSS JOIN b{t} b
    ),
    out{t} AS (
      SELECT CAST({t} AS BIGINT) AS round, b.feature,
             CAST(b.thr AS BIGINT) AS threshold,
             CAST(b.pol AS BIGINT) AS polarity,
             CAST(CAST(b.err AS VARCHAR) AS DOUBLE)
               / CAST(CAST(b.tot AS VARCHAR) AS DOUBLE) AS err_rate,
             (SELECT CAST(sum(CASE WHEN h <> ypm THEN 1 ELSE 0 END) AS BIGINT)
              FROM h{t}) AS n_mis
      FROM b{t} b
    )""")
    union = "\n    UNION ALL\n    ".join(
        f"SELECT * FROM out{t}" for t in range(1, rounds + 1)
    )
    return "".join(parts) + "\n    " + union


@query("adaboost_train_rounds", oracle=_adaboost_oracle())
def q_adaboost_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdaBoost over decision stumps trained in-engine (3 rounds): exact integer reweighting via the (W-err)/err ratio as two integer factors, DECIMAL(38,0) weights, deterministic global argmin per round."""
    from datalake_etlscripts_spark.operators.expectations import adaboost_stumps

    d = read_table(spark, sf_dir, "documents")
    base = d.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("lang") == "en", 1).otherwise(-1).alias("ypm"),
        F.expr("n_chars div 16").alias("xc"),
        F.expr("size(filter(split(text, ' '), t -> t != '')) div 4").alias("xt"),
    )
    feats = base.select(
        "id", F.lit("n_chars_div16").alias("feature"), F.col("xc").alias("x")
    ).unionByName(
        base.select(
            "id", F.lit("n_tokens_div4").alias("feature"), F.col("xt").alias("x")
        )
    )
    labels = base.select("id", "ypm")
    return adaboost_stumps(feats, labels, rounds=3)


# ---------------------------------------------------------------------------
# Closed-form grouped OLS (r6): the trend/scaling-law fit beside
# correlation_matrix — per-language chars-on-tokens regression.
# ---------------------------------------------------------------------------
@query(
    "ols_trend_by_lang",
    oracle="""
    WITH base AS (
      SELECT lang,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                  AS HUGEINT) AS x,
             CAST(n_chars AS HUGEINT) AS y
      FROM documents
    ),
    m AS (
      SELECT lang, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM base GROUP BY 1
    )
    SELECT lang, CAST(n AS BIGINT) AS n,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
               / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) END AS slope,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             CAST(CAST(sy * sxx - sx * sxy AS VARCHAR) AS DOUBLE)
               / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) END
             AS intercept,
           CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
             (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                * CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE))
               / (CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)) END
             AS r2
    FROM m
    """,
)
def q_ols_trend_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language OLS fit of n_chars on n_tokens solved in closed form: exact DECIMAL(38,0) moments from one scan, Cramer's rule, one division per coefficient."""
    from datalake_etlscripts_spark.operators.expectations import grouped_ols

    d = read_table(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        F.expr("size(filter(split(text, ' '), t -> t != ''))").alias("x"),
        F.col("n_chars").alias("y"),
    )
    return grouped_ols(base, "lang", "x", "y")


# ---------------------------------------------------------------------------
# Dedup acceptance metrics (r6): the ann_recall_mrr twin for the
# fuzzy-dedup stack — minhash-LSH's verified pair set cross-audited
# against the blocked exact-Jaccard join's pair set. Each side is an
# approximation with a DIFFERENT blind spot (banding's s-curve can
# drop a true pair; (lang × length)-blocking can't see cross-block
# pairs), so the full-outer comparison reports both: lsh_misses =
# pairs only the blocked join found, blocking_misses = pairs only LSH
# found. Composed from the two registered oracle twins.
# ---------------------------------------------------------------------------
_LSH_RECALL_ORACLE = _MINHASH_ORACLE.rsplit("SELECT id_a", 1)[0] + r"""
    , lshp AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.04),
    base2 AS (
      SELECT doc_id, lang, CAST(floor(length(text) / 100) AS INT) AS lb,
             list_distinct(list_transform(
               range(1, greatest(len(list_filter(string_split(text,' '), x -> x <> '')) - 1, 1)),
               i -> list_filter(string_split(text,' '), x -> x <> '')[i] || ' ' ||
                    list_filter(string_split(text,' '), x -> x <> '')[i+1] || ' ' ||
                    list_filter(string_split(text,' '), x -> x <> '')[i+2]
             )) AS sh2
      FROM documents
    ),
    blocked AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM base2 a JOIN base2 b ON a.lang = b.lang AND a.lb = b.lb
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.sh2, b.sh2)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh2, b.sh2))) >= 0.04
    ),
    fj AS (
      SELECT l.id_a IS NOT NULL AS in_lsh, b.id_a IS NOT NULL AS in_blocked
      FROM lshp l FULL JOIN blocked b
        ON l.id_a = b.id_a AND l.id_b = b.id_b
    )
    SELECT CAST(sum(CASE WHEN in_blocked THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocked,
           CAST(sum(CASE WHEN in_lsh THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh,
           CAST(sum(CASE WHEN in_lsh AND in_blocked THEN 1 ELSE 0 END)
                AS BIGINT) AS n_common,
           CAST(sum(CASE WHEN in_lsh AND in_blocked THEN 1 ELSE 0 END)
                AS DOUBLE)
             / CAST(sum(CASE WHEN in_blocked THEN 1 ELSE 0 END) AS DOUBLE)
             AS lsh_recall,
           CAST(sum(CASE WHEN in_blocked AND NOT in_lsh THEN 1 ELSE 0 END)
                AS BIGINT) AS lsh_misses,
           CAST(sum(CASE WHEN in_lsh AND NOT in_blocked THEN 1 ELSE 0 END)
                AS BIGINT) AS blocking_misses
    FROM fj
"""


@query("dedup_lsh_recall", oracle=_LSH_RECALL_ORACLE)
def q_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup acceptance metrics: minhash-LSH verified pairs cross-audited against the blocked exact-Jaccard pair set via one full outer join - reports each approximation's blind spot (s-curve drops vs cross-block pairs)."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    d = read_table(spark, sf_dir, "documents")
    lsh = (
        dedup.minhash_lsh_pairs(
            spread_small_input(d), threshold=0.04, scheme="md5"
        )
        .select("id_a", "id_b", F.lit(True).alias("in_lsh"))
    )
    blocked = dedup.ngram_jaccard_pairs(d, threshold=0.04).select(
        "id_a", "id_b", F.lit(True).alias("in_blocked")
    )
    fj = lsh.join(blocked, ["id_a", "id_b"], "full_outer").select(
        F.coalesce("in_lsh", F.lit(False)).alias("in_lsh"),
        F.coalesce("in_blocked", F.lit(False)).alias("in_blocked"),
    )
    both = F.sum(F.when(F.col("in_lsh") & F.col("in_blocked"), 1).otherwise(0))
    n_blk = F.sum(F.when(F.col("in_blocked"), 1).otherwise(0))
    return fj.agg(
        n_blk.cast("long").alias("n_blocked"),
        F.sum(F.when(F.col("in_lsh"), 1).otherwise(0)).cast("long").alias("n_lsh"),
        both.cast("long").alias("n_common"),
        (both.cast("double") / n_blk.cast("double")).alias("lsh_recall"),
        F.sum(F.when(F.col("in_blocked") & ~F.col("in_lsh"), 1).otherwise(0))
        .cast("long")
        .alias("lsh_misses"),
        F.sum(F.when(F.col("in_lsh") & ~F.col("in_blocked"), 1).otherwise(0))
        .cast("long")
        .alias("blocking_misses"),
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking (r6): the diversity stage after
# retrieval — greedy argmax of lam*rel - (1-lam)*max Jaccard to the
# already-selected set, unrolled k rounds over the BM25 top-20.
# ---------------------------------------------------------------------------
def _mmr_oracle(k: int = 5) -> str:
    base = _BM25_ORACLE.rsplit("SELECT doc_id, n_hit, score", 1)[0]
    parts = [
        base
        + """,
    cand AS MATERIALIZED (
      SELECT doc_id, score FROM agg ORDER BY score DESC, doc_id LIMIT 20
    ),
    post AS MATERIALIZED (
      SELECT t.doc_id, unnest(list_distinct(t.tk)) AS tok
      FROM tk t JOIN cand USING (doc_id)
    ),
    sz AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM post GROUP BY 1),
    s1 AS (
      SELECT CAST(1 AS BIGINT) AS rank, doc_id, score,
             0.7 * score - 0.3 * 0.0 AS mmr
      FROM (SELECT * FROM cand ORDER BY score DESC, doc_id LIMIT 1)
    ),
    sel1 AS MATERIALIZED (SELECT doc_id FROM s1)"""
    ]
    for t in range(2, k + 1):
        p = t - 1
        parts.append(f""",
    rem{t} AS (SELECT c.* FROM cand c
               WHERE c.doc_id NOT IN (SELECT doc_id FROM sel{p})),
    i{t} AS (
      SELECT pa.doc_id AS a, pb.doc_id AS b, CAST(count(*) AS BIGINT) AS i
      FROM post pa
      JOIN rem{t} r ON r.doc_id = pa.doc_id
      JOIN post pb ON pb.tok = pa.tok
      JOIN sel{p} s ON s.doc_id = pb.doc_id
      GROUP BY 1, 2
    ),
    ms{t} AS (
      SELECT a AS doc_id,
             max(CAST(i.i AS DOUBLE) / CAST(za.sz + zb.sz - i.i AS DOUBLE))
               AS maxsim
      FROM i{t} i JOIN sz za ON za.doc_id = i.a JOIN sz zb ON zb.doc_id = i.b
      GROUP BY 1
    ),
    s{t} AS MATERIALIZED (
      SELECT CAST({t} AS BIGINT) AS rank, doc_id, score, mmr FROM (
        SELECT r.doc_id, r.score,
               0.7 * r.score - 0.3 * COALESCE(ms.maxsim, 0.0) AS mmr
        FROM rem{t} r LEFT JOIN ms{t} ms USING (doc_id)
        ORDER BY mmr DESC, doc_id LIMIT 1
      )
    ),
    sel{t} AS MATERIALIZED (SELECT doc_id FROM sel{p}
                            UNION ALL SELECT doc_id FROM s{t})""")
    union = "\n    UNION ALL ".join(
        f"SELECT rank, doc_id, score, mmr FROM s{t}" for t in range(1, k + 1)
    )
    return "".join(parts) + "\n    " + union


@query("mmr_diversified_topk", oracle=_mmr_oracle())
def q_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-5 re-ranking of the BM25 top-20: greedy lam*rel - (1-lam)*max-Jaccard argmax per round, candidate-sized joins only, postings pruned before any shuffle."""
    from datalake_etlscripts_spark.operators.text import mmr_rerank

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    cands = (
        text.bm25_topk(d, _BM25_TERMS, k=20)
        .select("doc_id", "score")
        .localCheckpoint(eager=False)
    )
    postings = (
        d.join(F.broadcast(cands.select("doc_id")), "doc_id", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.filter(F.split("text", " "), lambda x: x != "")
                )
            ).alias("tok"),
        )
        .localCheckpoint(eager=False)
    )
    return mmr_rerank(cands, postings, k=5)


# ---------------------------------------------------------------------------
# Stratified k-fold (r6): exact per-stratum fold parity via hash-order
# row numbering — the CV-split guarantee hash-mod can't give.
# ---------------------------------------------------------------------------
@query(
    "stratified_kfold",
    oracle="""
    WITH a AS (
      SELECT lang,
             (row_number() OVER (PARTITION BY lang
                                 ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                          doc_id) - 1) % 5 AS fold
      FROM documents
    ),
    g AS (SELECT lang, CAST(fold AS BIGINT) AS fold,
                 CAST(count(*) AS BIGINT) AS n
          FROM a GROUP BY 1, 2)
    SELECT lang, fold, n,
           CAST(max(n) OVER (PARTITION BY lang)
                - min(n) OVER (PARTITION BY lang) AS BIGINT) AS spread
    FROM g
    """,
)
def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-balanced stratified 5-fold CV assignment per language: md5-ordered row numbering mod k, per-stratum fold spread <= 1 made visible in the audit."""
    from datalake_etlscripts_spark.operators.sampling import (
        kfold_balance_audit,
        stratified_kfold,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return kfold_balance_audit(stratified_kfold(d, "doc_id", "lang", k=5), "lang")


# ---------------------------------------------------------------------------
# Flesch reading ease (r6): vowel-run syllable heuristic, exact
# integer counts, two fixed-order divisions.
# ---------------------------------------------------------------------------
@query(
    "readability_flesch",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                  AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN
             206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
           END AS flesch
    FROM c
    """,
)
def q_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease score per document: vowel-run syllable heuristic, punctuation-run sentences floored at 1, exact integer counts with two fixed-order divisions - a pure JVM-expression quality feature."""
    from datalake_etlscripts_spark.operators.text import flesch_readability

    d = read_table(spark, sf_dir, "documents")
    return flesch_readability(d)


# ---------------------------------------------------------------------------
# Rocchio PRF (r6): two-pass pseudo-relevance-feedback retrieval —
# feedback docs from BM25, expansion terms by tf x rarity ratio,
# expanded re-score. Shared CTEs MATERIALIZED (cf. the MMR lesson).
# ---------------------------------------------------------------------------
_PRF_ORACLE = """
    WITH tok AS MATERIALIZED (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS t
      FROM documents
    ),
    dl AS MATERIALIZED (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1
    ),
    stats AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS l
      FROM dl
    ),
    h0 AS (
      SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok
      WHERE t IN ('data', 'join', 'spark') GROUP BY 1, 2
    ),
    df0 AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM h0 GROUP BY 1),
    sc0 AS (
      SELECT h.doc_id, h.t,
             CAST((2 * s.n - 2 * d.df + 1) * 22 * h.tf * s.l AS DOUBLE)
             / CAST((2 * d.df + 1)
                    * (10 * h.tf * s.l + 3 * s.l + 9 * dl.dl * s.n) AS DOUBLE)
               AS sc
      FROM h0 h JOIN df0 d USING (t) JOIN dl USING (doc_id) CROSS JOIN stats s
    ),
    fb AS MATERIALIZED (
      SELECT doc_id FROM (
        SELECT doc_id,
               list_reduce(list_prepend(0.0, list(sc ORDER BY t)),
                           (a, b) -> a + b) AS score
        FROM sc0 GROUP BY doc_id
      ) ORDER BY score DESC, doc_id LIMIT 3
    ),
    cand AS MATERIALIZED (
      SELECT t, CAST(count(*) AS BIGINT) AS fbtf
      FROM tok JOIN fb USING (doc_id)
      WHERE length(t) >= 3 AND t NOT IN ('data', 'join', 'spark')
      GROUP BY 1
    ),
    cdf AS (
      SELECT t, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok WHERE t IN (SELECT t FROM cand) GROUP BY 1
    ),
    exp AS MATERIALIZED (
      SELECT t FROM (
        SELECT c.t,
               CAST(c.fbtf * (2 * s.n - 2 * cdf.df + 1) AS DOUBLE)
                 / CAST(2 * cdf.df + 1 AS DOUBLE) AS es
        FROM cand c JOIN cdf USING (t) CROSS JOIN stats s
      ) ORDER BY es DESC, t ASC LIMIT 5
    ),
    terms AS MATERIALIZED (
      SELECT t FROM exp
      UNION ALL SELECT unnest(['data', 'join', 'spark'])
    ),
    h1 AS (
      SELECT tok.doc_id, tok.t, CAST(count(*) AS BIGINT) AS tf
      FROM tok JOIN terms USING (t) GROUP BY 1, 2
    ),
    df1 AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM h1 GROUP BY 1),
    sc1 AS (
      SELECT h.doc_id, h.t,
             CAST((2 * s.n - 2 * d.df + 1) * 22 * h.tf * s.l AS DOUBLE)
             / CAST((2 * d.df + 1)
                    * (10 * h.tf * s.l + 3 * s.l + 9 * dl.dl * s.n) AS DOUBLE)
               AS sc
      FROM h1 h JOIN df1 d USING (t) JOIN dl USING (doc_id) CROSS JOIN stats s
    )
    SELECT doc_id, n_hit, score FROM (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit,
             list_reduce(list_prepend(0.0, list(sc ORDER BY t)),
                         (a, b) -> a + b) AS score
      FROM sc1 GROUP BY doc_id
    ) ORDER BY score DESC, doc_id LIMIT 10
"""


@query("rocchio_prf_topk", oracle=_PRF_ORACLE)
def q_rocchio_prf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback retrieval: BM25 top-3 feedback docs mine 5 expansion terms (tf x log-free rarity ratio), corpus re-scored with the expanded query - one token explode feeds both passes, every dim broadcast."""
    from datalake_etlscripts_spark.operators.text import rocchio_prf_topk

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return rocchio_prf_topk(d, _BM25_TERMS, k_feedback=3, k_expansion=5, k=10)


# ---------------------------------------------------------------------------
# WordPiece greedy encoding (r7): the third tokenizer beside BPE
# merge-replay and unigram Viterbi — BERT's longest-match-first rule
# against a literal (piece, is_continuation) vocabulary shared
# verbatim by both engines. 'q' is deliberately absent from the char
# fallback, so 'query' exercises the whole-word [UNK] collapse. The
# greedy walk is a bounded pointer chase on the distinct-word table;
# the oracle replays it as a recursive CTE over the same argmax table.
# ---------------------------------------------------------------------------
_WP_CHARS = [c for c in "abcdefghijklmnoprstuvwxyz"]  # no 'q'
_WP_VOCAB: list[tuple[str, bool]] = (
    [
        (w, False)
        for w in (
            "the", "scan", "order", "sort", "merge", "batch", "stream",
            "wind", "win", "cust", "col", "row", "key", "part", "small",
            "fast", "slow", "big", "data", "agg", "val", "group", "line",
            "join", "hash", "filt", "vec", "spark", "dup", "tab",
        )
    ]
    + [
        ("##" + s, True)
        for s in (
            "er", "om", "dow", "ow", "umn", "eam", "le", "ue", "ter",
            "tor", "ta", "up", "an", "ery",
        )
    ]
    + [(c, False) for c in _WP_CHARS]
    + [("##" + c, True) for c in _WP_CHARS]
)


def _wp_oracle() -> str:
    vals = ",\n      ".join(
        "('{t}', {c}, {n}, '{d}')".format(
            t=t[2:] if t.startswith("##") else t,
            c="TRUE" if t.startswith("##") else "FALSE",
            n=len(t[2:]) if t.startswith("##") else len(t),
            d=t,
        )
        for t, _ in _WP_VOCAB
    )
    return f"""
    WITH RECURSIVE v(txt, cont, vlen, disp) AS (
      VALUES {vals}
    ),
    wf AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
             CAST(length(w) AS INT) AS wl
      FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents
      ) GROUP BY 1
    ),
    ps AS (
      SELECT word, wl, unnest(generate_series(1, wl)) AS pos FROM wf
    ),
    cand AS (
      SELECT p.word, p.pos, v.vlen, v.disp
      FROM ps p JOIN v
        ON substr(p.word, CAST(p.pos AS INT), v.vlen) = v.txt
       AND v.cont = (p.pos > 1)
       AND p.pos + v.vlen - 1 <= p.wl
    ),
    best AS (
      SELECT word, pos, max(vlen) AS blen,
             max_by(disp, vlen) AS bdisp
      FROM cand GROUP BY 1, 2
    ),
    chase AS (
      SELECT word, wl, freq, CAST(1 AS BIGINT) AS pos,
             CAST(0 AS BIGINT) AS np, CAST('' AS VARCHAR) AS pieces
      FROM wf
      UNION ALL
      SELECT c.word, c.wl, c.freq, c.pos + b.blen, c.np + 1,
             CASE WHEN c.pieces = '' THEN b.bdisp
                  ELSE c.pieces || ' ' || b.bdisp END
      FROM chase c JOIN best b ON b.word = c.word AND b.pos = c.pos
      WHERE c.pos <= c.wl
    ),
    fin AS (
      SELECT word, freq, wl, pos, np, pieces,
             row_number() OVER (PARTITION BY word ORDER BY pos DESC) AS rn
      FROM chase
    )
    SELECT word, freq,
           CAST(CASE WHEN pos = wl + 1 THEN np ELSE 1 END AS BIGINT)
             AS n_pieces,
           CASE WHEN pos = wl + 1 THEN pieces ELSE '[UNK]' END AS pieces,
           (pos <> wl + 1) AS is_unk
    FROM fin WHERE rn = 1
    """


@query("wordpiece_encode", oracle=_wp_oracle())
def q_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy longest-match-first encoding of every distinct corpus word against a literal continuation-aware vocabulary - bounded pointer chase on the distinct-word table, whole-word [UNK] collapse when the tiling fails."""
    from datalake_etlscripts_spark.operators import bpe

    d = read_table(spark, sf_dir, "documents").select("text")
    return bpe.wordpiece_encode(d, _WP_VOCAB)


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth (r9): distinct-vocabulary size after
# the first N documents, at doubling cutoffs — WITHOUT re-scanning
# per cutoff: each token's FIRST document (one min aggregate) places
# it on the growth curve, each doc's token count places the x-axis,
# and every cutoff reads two bounded aggregates. The sub-linearity of
# V(N) vs N is the Heaps exponent evidence corpora are judged by.
# ---------------------------------------------------------------------------
@query(
    "heaps_law_points",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), t -> t <> ''))
               AS tok
      FROM documents
    ),
    firsts AS (
      SELECT tok, CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM toks GROUP BY 1
    ),
    dlen AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok
      FROM toks GROUP BY 1
    ),
    cuts AS (SELECT unnest([50, 100, 200, 400, 800]) AS cutoff)
    SELECT c.cutoff,
           CAST(coalesce((SELECT sum(n_tok) FROM dlen
                          WHERE doc_id < c.cutoff), 0) AS BIGINT)
             AS total_tokens,
           CAST((SELECT count(*) FROM firsts
                 WHERE first_doc < c.cutoff) AS BIGINT) AS vocab
    FROM cuts c
    """,
)
def q_heaps_law_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law growth curve: vocabulary size vs total tokens at doubling document cutoffs, from ONE corpus scan (token first-doc + doc length aggregates) - no per-cutoff rescan."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("tok"),
    )
    firsts = toks.groupBy("tok").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    dlen = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    cuts = spark.createDataFrame(
        [(50,), (100,), (200,), (400,), (800,)], "cutoff INT"
    )
    tt = (
        dlen.crossJoin(F.broadcast(cuts))
        .filter(F.col("doc_id") < F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.sum("n_tok").cast("long").alias("total_tokens"))
        .withColumnRenamed("cutoff", "tcut")
    )
    vv = (
        firsts.crossJoin(F.broadcast(cuts))
        .filter(F.col("first_doc") < F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
        .withColumnRenamed("cutoff", "vcut")
    )
    return (
        cuts.join(tt, F.col("cutoff") == F.col("tcut"), "left")
        .join(vv, F.col("cutoff") == F.col("vcut"), "left")
        .select(
            "cutoff",
            F.coalesce("total_tokens", F.lit(0)).cast("long").alias(
                "total_tokens"
            ),
            F.coalesce("vocab", F.lit(0)).cast("long").alias("vocab"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf doubling ratios (r9): the rank-frequency law checked WITHOUT
# logarithms — under Zipf with exponent s, freq(r)/freq(2r) ≈ 2^s, so
# the ratio table at doubling ranks r ∈ {1..64} reads the exponent
# off directly (ratio ≈ 2 ⇔ s ≈ 1), and the s=1 adequacy flag is an
# integer cross-multiplication |f(r) − 2·f(2r)| ≤ f(2r) (ratio in
# [1.?, 3]). Ranks come from one term aggregate + a dictionary-sized
# rank window; each ratio is one exact division.
# ---------------------------------------------------------------------------
@query(
    "zipf_doubling_ratios",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
        AS tok
      FROM documents
    ),
    tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY 1),
    ranked AS (
      SELECT tok, f, row_number() OVER (ORDER BY f DESC, tok ASC) AS r
      FROM tf
    ),
    rs AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64]) AS r0)
    SELECT rs.r0 AS rank, a.tok AS term, a.f AS freq,
           b.f AS freq_2r,
           CAST(a.f AS DOUBLE) / CAST(b.f AS DOUBLE) AS doubling_ratio,
           CAST(CASE WHEN abs(a.f - 2 * b.f) <= b.f THEN 1 ELSE 0 END
                AS INT) AS zipf1_adequate
    FROM rs
    JOIN ranked a ON a.r = rs.r0
    JOIN ranked b ON b.r = 2 * rs.r0
    """,
)
def q_zipf_doubling_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's law without logarithms: freq(r)/freq(2r) at doubling ranks reads the exponent directly, with an integer cross-multiplied s=1 adequacy flag - one term aggregate, one rank window, one division per point."""
    d = read_table(spark, sf_dir, "documents")
    tf = d.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("tok")
    ).groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("f"))
    from pyspark.sql import Window as W

    wr = W.orderBy(F.col("f").desc(), F.col("tok").asc())
    ranked = tf.withColumn("r", F.row_number().over(wr))
    rs = spark.createDataFrame(
        [(1,), (2,), (4,), (8,), (16,), (32,), (64,)], "r0 INT"
    )
    a = ranked.select(
        F.col("r").alias("ra"), F.col("tok").alias("term"),
        F.col("f").alias("freq"),
    )
    b = ranked.select(
        F.col("r").alias("rb"), F.col("f").alias("freq_2r")
    )
    j = (
        rs.join(a, F.col("ra") == F.col("r0"))
        .join(b, F.col("rb") == 2 * F.col("r0"))
    )
    return j.select(
        F.col("r0").alias("rank"),
        "term",
        "freq",
        "freq_2r",
        (F.col("freq").cast("double") / F.col("freq_2r").cast("double")).alias(
            "doubling_ratio"
        ),
        F.when(
            F.abs(F.col("freq") - 2 * F.col("freq_2r")) <= F.col("freq_2r"),
            1,
        ).otherwise(0).cast("int").alias("zipf1_adequate"),
    )


# ---------------------------------------------------------------------------
# Salted skew-safe term counts (r9): the Zipf-head answer as a
# REGISTERED query — term counting through the two-phase salted
# aggregate (operators/skew.salted_aggregate: partials per
# (term, salt), then merge per term), so the hottest stopword never
# lands on one task. The salt assignment is partitioning-dependent
# but sum partials are salt-INVARIANT, which is exactly why the
# plain-GROUP-BY oracle hash-matches: correctness is independent of
# the physical spreading. Top-50 by (count desc, term asc).
# ---------------------------------------------------------------------------
@query(
    "salted_term_counts",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
        AS tok
      FROM documents
    ),
    tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1)
    SELECT tok, n FROM tf ORDER BY n DESC, tok ASC LIMIT 50
    """,
)
def q_salted_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe term counting through the two-phase salted aggregate - sum partials are salt-invariant, so the plain GROUP BY oracle hash-matches while no single task ever owns a stopword's full mass."""
    from datalake_etlscripts_spark.operators.skew import salted_aggregate

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("tok")
    )
    counts = salted_aggregate(
        toks,
        "tok",
        [F.count(F.lit(1)).alias("n")],
        n_salts=16,
        merge_aggs=[F.sum("n").cast("long").alias("n")],
    )
    return counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(50)


# ---------------------------------------------------------------------------
# Stylometrics by source (r9): punctuation and sentence-shape
# fingerprints per corpus source — exact integer counts of periods,
# commas and tokens with single-division rates. The provenance
# fingerprint beside source_quality_report (machine-generated feeds
# show up as punctuation-rate outliers long before content checks).
# ---------------------------------------------------------------------------
@query(
    "stylometrics_by_source",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(len(string_split(text, '.')) - 1 AS BIGINT) AS periods,
             CAST(len(string_split(text, ',')) - 1 AS BIGINT) AS commas,
             CAST(len(list_filter(string_split(text, ' '),
                  t -> t <> '')) AS BIGINT) AS toks
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS tokens,
           CAST(sum(periods) AS BIGINT) AS periods,
           CAST(sum(commas) AS BIGINT) AS commas,
           CAST(sum(periods) AS DOUBLE) / CAST(sum(toks) AS DOUBLE)
             AS period_rate,
           CAST(sum(commas) AS DOUBLE) / CAST(sum(toks) AS DOUBLE)
             AS comma_rate
    FROM d GROUP BY 1
    """,
)
def q_stylometrics_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source punctuation stylometrics: exact integer period/comma/token counts with single-division rates - the provenance fingerprint beside the quality report."""
    d = read_table(spark, sf_dir, "documents")
    f = d.select(
        "source",
        (F.size(F.split(F.col("text"), "\\.")) - 1)
        .cast("long")
        .alias("periods"),
        (F.size(F.split(F.col("text"), ",")) - 1)
        .cast("long")
        .alias("commas"),
        F.expr(
            "CAST(size(filter(split(text, ' '), t -> t != ''))"
            " AS BIGINT)"
        ).alias("toks"),
    )
    return f.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("tokens"),
        F.sum("periods").cast("long").alias("periods"),
        F.sum("commas").cast("long").alias("commas"),
        (
            F.sum("periods").cast("double") / F.sum("toks").cast("double")
        ).alias("period_rate"),
        (
            F.sum("commas").cast("double") / F.sum("toks").cast("double")
        ).alias("comma_rate"),
    )


# ---------------------------------------------------------------------------
# Hapax report (r9): per language the vocabulary size, the hapax-
# legomena share (freq-1 terms — the OCR/noise tell when it spikes),
# and the head concentration (top term's share of tokens) — exact
# integer term stats, single divisions. The vocabulary-health card
# beside Heaps' growth and the Zipf ratios.
# ---------------------------------------------------------------------------
@query(
    "hapax_report",
    oracle="""
    WITH toks AS (
      SELECT lang,
             unnest(list_filter(string_split(text, ' '), t -> t <> ''))
               AS tok
      FROM documents
    ),
    tf AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS f
      FROM toks GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(f) AS BIGINT) AS tokens,
           CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           CAST(max(f) AS BIGINT) AS top_freq,
           CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS hapax_share,
           CAST(max(f) AS DOUBLE) / CAST(sum(f) AS DOUBLE)
             AS head_share
    FROM tf GROUP BY 1
    """,
)
def q_hapax_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary health: hapax-legomena share and head concentration from exact term frequencies, single divisions."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("tok"),
    )
    tf = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    return tf.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("f").cast("long").alias("tokens"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax"),
        F.max("f").cast("long").alias("top_freq"),
        (
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("hapax_share"),
        (F.max("f").cast("double") / F.sum("f").cast("double")).alias(
            "head_share"
        ),
    )


# ---------------------------------------------------------------------------
# Weighted vocabulary overlap (r9): Ruzicka (weighted Jaccard)
# similarity between source pairs' term-frequency profiles, using the
# identity Σmax(f_a,f_b) = T_a + T_b − Σmin(f_a,f_b) so only the
# INNER term join is ever computed (no full-outer union of
# vocabularies). Sources src0..src4 (10 pairs); exact integer mins
# and totals, one division per pair. The frequency-aware mirror-feed
# detector beside the exact-pair source_duplication_matrix.
# ---------------------------------------------------------------------------
@query(
    "source_vocab_overlap",
    oracle="""
    WITH tf AS (
      SELECT source,
             unnest(list_filter(string_split(text, ' '), t -> t <> ''))
               AS tok
      FROM documents
      WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
    ),
    f AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS n
      FROM tf GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, CAST(sum(n) AS BIGINT) AS t FROM f GROUP BY 1
    ),
    inner_ AS (
      SELECT a.source AS sa, b.source AS sb,
             CAST(sum(least(a.n, b.n)) AS BIGINT) AS smin
      FROM f a JOIN f b ON b.tok = a.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.sa, i.sb, i.smin, ta.t AS tot_a, tb.t AS tot_b,
           CAST(i.smin AS DOUBLE)
             / CAST(ta.t + tb.t - i.smin AS DOUBLE) AS ruzicka
    FROM inner_ i
    JOIN tot ta ON ta.source = i.sa
    JOIN tot tb ON tb.source = i.sb
    """,
)
def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ruzicka weighted-Jaccard overlap between source term-frequency profiles via the inner-join-only identity (sum-max = totals minus sum-min), exact integers and one division per pair."""
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    )
    tf = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("tok"),
    )
    f = tf.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = f.groupBy("source").agg(F.sum("n").cast("long").alias("t"))
    b = f.select(
        F.col("source").alias("sb"),
        F.col("tok").alias("tok_b"),
        F.col("n").alias("nb"),
    )
    inner = (
        f.join(
            b,
            (F.col("tok_b") == F.col("tok"))
            & (F.col("source") < F.col("sb")),
        )
        .groupBy(F.col("source").alias("sa"), "sb")
        .agg(F.sum(F.least("n", "nb")).cast("long").alias("smin"))
    )
    ta = tot.select(F.col("source").alias("ka"), F.col("t").alias("tot_a"))
    tb = tot.select(F.col("source").alias("kb"), F.col("t").alias("tot_b"))
    return (
        inner.join(F.broadcast(ta), F.col("sa") == F.col("ka"))
        .join(F.broadcast(tb), F.col("sb") == F.col("kb"))
        .select(
            "sa",
            "sb",
            "smin",
            "tot_a",
            "tot_b",
            (
                F.col("smin").cast("double")
                / (F.col("tot_a") + F.col("tot_b") - F.col("smin")).cast(
                    "double"
                )
            ).alias("ruzicka"),
        )
    )


# ---------------------------------------------------------------------------
# IVF nprobe recall curve (r9): the tuning-knob evidence — recall@5
# of the literal-quantizer IVF against the exact answer at n_probe ∈
# {1, 2, 4}. Each probe level is the SAME IVF plan with a wider cell
# fan-out; overlap counts are exact integers per (n_probe, query).
# This is the curve you read before spending memory on more probes at
# corpus scale (the matryoshka_recall of the candidate-budget axis).
# ---------------------------------------------------------------------------
def _ivf_sweep_oracle() -> str:
    from datalake_etlscripts_spark.plans import registry as _registry

    base = _ANN_IVF_ORACLE
    sels = []
    for np_ in (1, 2, 4):
        sub = base.replace("r <= 3", f"r <= {np_}").strip()
        assert sub.startswith("WITH ")
        sub = sub[len("WITH "):]
        sels.append((np_, sub))
    body = ["WITH exact AS (", _registry.ORACLES["ann_cosine_topk"], ")"]
    sel_parts = []
    for np_, sub in sels:
        sel_parts.append(
            f"""SELECT {np_} AS n_probe, e.query_id,
           CAST(count(i.neighbor_id) AS BIGINT) AS overlap,
           CAST(count(i.neighbor_id) AS DOUBLE) / 5.0 AS recall_at_5
    FROM exact e LEFT JOIN (
      WITH {sub}
    ) i ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
    GROUP BY 1, 2"""
        )
    return "".join(body) + "\n" + "\n    UNION ALL ".join(sel_parts)


@query("ann_ivf_nprobe_sweep", oracle=_ivf_sweep_oracle())
def q_ann_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall-vs-nprobe curve at {1,2,4} probes against the exact top-5: exact integer overlaps per (n_probe, query) - the candidate-budget tuning evidence."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    # r07 (guide §2.4/§2.5): (a) spread the single-row-group scan so
    # the cosine/assignment folds run wide; (b) the exact top-5 fed
    # all three probe branches but was re-derived per branch — settle
    # it; (c) the corpus cell ASSIGNMENT is probe-count-independent,
    # so it is settled once and each n_probe only re-derives the
    # 8-row query side (ivf_corpus_cells / ivf_topk_from_cells split).
    e_wide = spread_small_input(e)
    cents = _ivf_literal_centroids()
    cells = similarity.ivf_corpus_cells(e_wide, cents).localCheckpoint()
    exact = similarity.brute_force_topk(e_wide, q, k=5).select(
        F.col("query_id").alias("eq"), F.col("neighbor_id").alias("en")
    ).localCheckpoint()
    out = None
    for np_ in (1, 2, 4):
        ivf = similarity.ivf_topk_from_cells(
            cells, q, cents, k=5, n_probe=np_
        ).select(
            F.col("query_id").alias("iq"), F.col("neighbor_id").alias("in_")
        )
        j = exact.join(
            ivf,
            (F.col("eq") == F.col("iq")) & (F.col("en") == F.col("in_")),
            "left",
        ).groupBy(F.col("eq").alias("query_id")).agg(
            F.count("in_").cast("long").alias("overlap"),
            (F.count("in_").cast("double") / F.lit(5.0)).alias(
                "recall_at_5"
            ),
        ).select(
            F.lit(np_).alias("n_probe"), "query_id", "overlap", "recall_at_5"
        )
        out = j if out is None else out.unionByName(j)
    return out


# ---------------------------------------------------------------------------
# LSH band-count sweep (r9): candidate recall of the md5 minhash
# pipeline vs the blocked exact-Jaccard pair set at bands ∈ {4, 8, 16}
# (rows/band 8, 4, 2 — the s-curve slides left as bands grow). The
# oracle GENERALIZES the 8-band twin: a Python builder emits the
# r-column band fold per level, so every level is replayed
# bit-for-bit. Completes the tuning-curve family with
# matryoshka_recall (dimension axis) and ann_ivf_nprobe_sweep
# (probe axis): this is the collision-budget axis.
# ---------------------------------------------------------------------------
def _minhash_verified_sql(bands: int) -> str:
    from datalake_etlscripts_spark.plans.registry import ddb_hex32

    r = 32 // bands
    mcols = ",\n             ".join(
        f"max(CASE WHEN lane % {r} = {j} THEN m END) AS m{j}"
        for j in range(r)
    )
    acc = "0"
    for j in range(r):
        acc = f"(({acc} * 1000003 + m{j}) & 4294967295)"
    return f"""toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS s
      FROM toks WHERE len(t) >= 3
    ),
    h AS (
      SELECT doc_id, {ddb_hex32('md5(s)')} AS h1,
             {ddb_hex32('md5(s)', 8)} AS h2 FROM sh
    ),
    lanes AS (
      SELECT doc_id, l.i AS lane, min(h1 + l.i * h2) AS m
      FROM h CROSS JOIN (SELECT unnest(range(32)) AS i) l
      GROUP BY 1, 2
    ),
    lanecols AS (
      SELECT doc_id, lane // {r} AS band,
             {mcols}
      FROM lanes GROUP BY 1, 2
    ),
    banded AS (SELECT doc_id, band, {acc} AS bucket FROM lanecols),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    hs AS (SELECT DISTINCT doc_id, {ddb_hex32('md5(s)')} AS hv FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY 1),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS i
      FROM cand c
      JOIN hs a ON a.doc_id = c.id_a
      JOIN hs b ON b.doc_id = c.id_b AND b.hv = a.hv
      GROUP BY 1, 2
    )
    SELECT c.id_a, c.id_b
    FROM cand c
    JOIN sizes sa ON sa.doc_id = c.id_a
    JOIN sizes sb ON sb.doc_id = c.id_b
    LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
    WHERE CAST(coalesce(i.i, 0) AS DOUBLE)
            / (sa.n + sb.n - coalesce(i.i, 0)) >= 0.04"""


def _band_sweep_oracle() -> str:
    blocked = """
    base2 AS (
      SELECT doc_id, lang, CAST(floor(length(text) / 100) AS INT) AS lb,
             list_distinct(list_transform(
               range(1, greatest(len(list_filter(string_split(text,' '), x -> x <> '')) - 1, 1)),
               i -> list_filter(string_split(text,' '), x -> x <> '')[i] || ' ' ||
                    list_filter(string_split(text,' '), x -> x <> '')[i+1] || ' ' ||
                    list_filter(string_split(text,' '), x -> x <> '')[i+2]
             )) AS sh2
      FROM documents
    ),
    blocked AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM base2 a JOIN base2 b ON a.lang = b.lang AND a.lb = b.lb
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.sh2, b.sh2)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh2, b.sh2))) >= 0.04
    ),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_blocked FROM blocked)
    """
    sels = []
    for b in (4, 8, 16):
        sels.append(
            f"""SELECT {b} AS bands,
           CAST((SELECT count(*) FROM (WITH {_minhash_verified_sql(b)}) x)
                AS BIGINT) AS n_lsh,
           CAST((SELECT count(*) FROM (WITH {_minhash_verified_sql(b)}) x
                 JOIN blocked bl ON bl.id_a = x.id_a AND bl.id_b = x.id_b)
                AS BIGINT) AS n_common,
           nb.n_blocked,
           CAST((SELECT count(*) FROM (WITH {_minhash_verified_sql(b)}) x
                 JOIN blocked bl ON bl.id_a = x.id_a AND bl.id_b = x.id_b)
                AS DOUBLE) / CAST(nb.n_blocked AS DOUBLE) AS recall
    FROM nb"""
        )
    return "WITH " + blocked + "\n" + "\n    UNION ALL ".join(sels)


@query("dedup_lsh_band_sweep", oracle=_band_sweep_oracle())
def q_dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash-LSH recall vs band count (4/8/16 bands on 32 hashes) against the blocked exact-Jaccard pair set - the collision-budget tuning curve beside the dimension and probe sweeps."""
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    d = read_table(spark, sf_dir, "documents")
    blocked = dedup.ngram_jaccard_pairs(d, threshold=0.04).select(
        F.col("id_a").alias("ba"), F.col("id_b").alias("bb")
    ).localCheckpoint()
    nb = blocked.count()
    # r07 (guide §2.4): the three band configs previously each ran the
    # FULL minhash pipeline (shingle explode + 32-lane min aggregate +
    # hash-set collect) via minhash_lsh_pairs; a band count only
    # regroups the same 32 minima, so the per-doc signature table is
    # settled once and every config reuses it.
    per_doc = dedup.minhash_per_doc(spread_small_input(d), scheme="md5")
    out = None
    for b in (4, 8, 16):
        lsh = dedup.lsh_pairs_from_per_doc(
            per_doc, 32, b, threshold=0.04, scheme="md5"
        ).select("id_a", "id_b").localCheckpoint()
        n_lsh = lsh.count()
        n_common = lsh.join(
            blocked,
            (F.col("id_a") == F.col("ba")) & (F.col("id_b") == F.col("bb")),
        ).count()
        row = spark.createDataFrame(
            [(b, n_lsh, n_common, nb, n_common / nb)],
            "bands INT, n_lsh BIGINT, n_common BIGINT,"
            " n_blocked BIGINT, recall DOUBLE",
        )
        out = row if out is None else out.unionByName(row)
    return out


# REAL IMA ADPCM decode (r13): the stateful audio codec — every 4-bit
# code updates a (predictor, step-index) recurrence, so the oracle
# replays the decode as an exact-integer LIST FOLD (the viterbi/rls
# nested-fold lane) while the engine parses genuine format-17 RIFF
# blocks and runs the same shift/add arithmetic in the Arrow-batched
# decode seam. The quadratic code pattern hits every nibble value;
# the step/index tables ride the SQL as literal lists shared from the
# one Python source of truth.
def _adpcm_fold_sql() -> str:
    step = "stept[CAST(acc[2] + 1 AS INT)]"
    diff = (
        f"(({step}) >> 3)"
        f" + CASE WHEN (xx[1] & 1) = 1 THEN ({step}) >> 2 ELSE 0 END"
        f" + CASE WHEN (xx[1] & 2) = 2 THEN ({step}) >> 1 ELSE 0 END"
        f" + CASE WHEN (xx[1] & 4) = 4 THEN {step} ELSE 0 END"
    )
    pred = (
        "greatest(CAST(-32768 AS BIGINT), least(CAST(32767 AS BIGINT), "
        f"acc[1] + CASE WHEN (xx[1] & 8) = 8 THEN -({diff}) "
        f"ELSE ({diff}) END))"
    )
    idx = (
        "greatest(CAST(0 AS BIGINT), least(CAST(88 AS BIGINT), "
        "acc[2] + idxt[CAST((xx[1] & 7) + 1 AS INT)]))"
    )
    return (
        f"list_reduce(list_prepend([pred0, idx0, abs(pred0), abs(pred0)], "
        f"list_transform(nibs, nb -> [nb, CAST(0 AS BIGINT), 0, 0])), "
        f"(acc, xx) -> [{pred}, {idx}, acc[3] + abs({pred}), "
        f"greatest(acc[4], abs({pred}))])"
    )


_ADPCM_STEPT = "[" + ", ".join(
    f"CAST({v} AS BIGINT)" for v in multimodal.ADPCM_STEPS
) + "]"
_ADPCM_IDXT = "[" + ", ".join(
    f"CAST({v} AS BIGINT)" for v in multimodal.ADPCM_INDEX
) + "]"


@query(
    "adpcm_audio_stats",
    oracle=f"""
    WITH a AS (
      SELECT doc_id AS id,
             CAST(64 + doc_id % 128 AS BIGINT) AS n_nib,
             CAST((doc_id * 31) % 65536 - 32768 AS BIGINT) AS pred0,
             CAST(doc_id % 89 AS BIGINT) AS idx0
      FROM documents
    ),
    nb AS (
      SELECT id, n_nib, pred0, idx0,
             list_transform(range(0, n_nib),
               j -> CAST((id * 7 + j * j) % 16 AS BIGINT)) AS nibs,
             {_ADPCM_STEPT} AS stept,
             {_ADPCM_IDXT} AS idxt
      FROM a
    ),
    st AS (
      SELECT id, n_nib, {_adpcm_fold_sql()} AS st FROM nb
    )
    SELECT id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
           CAST(n_nib + 1 AS BIGINT) AS n_samples,
           CAST(st[3] AS BIGINT) AS sum_abs,
           CAST(st[4] AS BIGINT) AS peak
    FROM st
    """,
)
def q_adpcm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real IMA ADPCM audio statistics: synthesize a genuine format-17 RIFF block per doc (quadratic nibble pattern, per-doc initial predictor and step index), run the actual stateful shift/add decode, and report exact sums and peaks - the oracle replays the recurrence as an integer list fold."""
    d = read_table(spark, sf_dir, "documents")
    clips = multimodal.synthesize_adpcm_audio(d)
    return multimodal.decode_audio_stats(clips)


# ---------------------------------------------------------------------------
# Gopher rejection-reason histogram (r13): which rule kills how many
# documents, and how many docs ONLY that rule kills (the marginal
# value of each threshold — the number a pipeline owner looks at
# before loosening one). Reads the SAME fail_reasons column the
# production filter emits; the oracle recomputes the five rule flags
# independently in SQL. One scan, per-row expressions, one bounded
# (≤5-row) aggregate.
# ---------------------------------------------------------------------------
@query(
    "gopher_rejection_reasons",
    oracle=r"""
    WITH t1 AS (
      SELECT doc_id, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    f2 AS (
      SELECT doc_id,
             length(text) AS nc,
             len(regexp_extract_all(text, '[^\w\s]')) AS np,
             len(tk) AS nt, len(list_distinct(tk)) AS nd,
             list_transform(range(1, greatest(len(tk) - 1, 1)),
                            i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]) AS g3
      FROM t1
    ),
    flags AS (
      SELECT doc_id,
        NOT coalesce(nt >= 20 AND nt <= 100000, false) AS f_tokens,
        NOT coalesce(CASE WHEN nt > 0
              THEN CAST(nc - (nt-1) AS DOUBLE)/nt END
              BETWEEN 2.0 AND 12.0, false) AS f_avg_token_len,
        NOT coalesce(CASE WHEN nc > 0
              THEN CAST(np AS DOUBLE)/nc END <= 0.3, false) AS f_punct,
        NOT coalesce(CASE WHEN nt > 0
              THEN CAST(nd AS DOUBLE)/nt END >= 0.3, false) AS f_distinct,
        NOT coalesce(CASE WHEN len(g3) > 0 THEN
              CAST(list_max(list_transform(list_distinct(g3),
                   dd -> len(list_filter(g3, x -> x = dd)))) AS DOUBLE)
                /len(g3) END <= 0.18, false) AS f_rep3
      FROM f2
    ),
    n AS (
      SELECT doc_id,
             CAST(f_tokens AS INT) + CAST(f_avg_token_len AS INT)
             + CAST(f_punct AS INT) + CAST(f_distinct AS INT)
             + CAST(f_rep3 AS INT) AS n_failed,
             f_tokens, f_avg_token_len, f_punct, f_distinct, f_rep3
      FROM flags
    ),
    u AS (
      SELECT 'tokens' AS rule, n_failed FROM n WHERE f_tokens
      UNION ALL
      SELECT 'avg_token_len', n_failed FROM n WHERE f_avg_token_len
      UNION ALL SELECT 'punct', n_failed FROM n WHERE f_punct
      UNION ALL SELECT 'distinct', n_failed FROM n WHERE f_distinct
      UNION ALL SELECT 'rep3', n_failed FROM n WHERE f_rep3
    )
    SELECT rule, CAST(count(*) AS BIGINT) AS n_failed_docs,
           CAST(sum(CASE WHEN n_failed = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sole_failures
    FROM u GROUP BY rule
    """,
)
def q_gopher_rejection_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule rejection histogram from the production filter's own fail_reasons column: documents killed per rule and documents ONLY that rule kills (the marginal threshold value) - one scan, a bounded 5-row aggregate."""
    d = read_table(spark, sf_dir, "documents")
    gq = text.gopher_quality_filter(d)
    exploded = (
        gq.filter(F.col("n_failed") > 0)
        .select(
            F.explode(F.split(F.col("fail_reasons"), ",")).alias("rule"),
            "n_failed",
        )
        .filter(F.col("rule") != "")
    )
    return exploded.groupBy("rule").agg(
        F.count(F.lit(1)).cast("long").alias("n_failed_docs"),
        F.sum(F.when(F.col("n_failed") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_sole_failures"),
    )


# Exact-integer audio clip features (r13): zero-crossing count (the
# classic voiced/unvoiced discriminator), energy Σs², peak — decoded
# from REAL RIFF bytes engine-side while the oracle regenerates every
# sample from the synthesis formula and counts sign flips with a
# per-channel lag window (zeros carry the previous sign on both
# sides: the SQL filters zero samples before the lag, which is the
# same carry rule the decoder applies).
@query(
    "audio_zcr_features",
    oracle="""
    WITH a AS (
      SELECT doc_id AS id,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT)
               AS channels,
             CAST((64 + doc_id % 256)
                  * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END)
                  AS BIGINT) AS n
      FROM documents
    ),
    s AS (
      SELECT id, channels, n, j.j AS j,
             CAST((id * 7 + j.j * 13) % 65536 AS BIGINT) - 32768 AS x
      FROM a, LATERAL (SELECT unnest(range(0, n)) AS j) j
    ),
    nz AS (
      SELECT id, channels, j % channels AS chan, j,
             CASE WHEN x > 0 THEN 1 ELSE -1 END AS sg
      FROM s WHERE x <> 0
    ),
    flips AS (
      SELECT id,
             CASE WHEN sg <> lag(sg) OVER
               (PARTITION BY id, chan ORDER BY j) THEN 1 ELSE 0 END AS f
      FROM nz
    ),
    z AS (SELECT id, CAST(sum(f) AS BIGINT) AS zero_crossings
          FROM flips GROUP BY 1),
    agg AS (
      SELECT id, CAST(sum(x * x) AS BIGINT) AS energy,
             CAST(max(abs(x)) AS BIGINT) AS peak
      FROM s GROUP BY 1
    )
    SELECT a.id, a.channels, a.n AS n_samples,
           coalesce(z.zero_crossings, 0) AS zero_crossings,
           g.energy, g.peak
    FROM a JOIN agg g USING (id) LEFT JOIN z USING (id)
    """,
)
def q_audio_zcr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer audio features from real RIFF decode: per-channel zero-crossing count (zeros carry the previous sign), energy sum-of-squares, and peak per clip - the oracle regenerates every sample from the synthesis formula and counts sign flips with a lag window."""
    d = read_table(spark, sf_dir, "documents")
    clips = multimodal.synthesize_wav_audio(d)
    return multimodal.decode_audio_features(clips)


# ---------------------------------------------------------------------------
# nDCG@5 acceptance for the IVF index (r13): binary relevance = "in
# the exact top-5", discounts 1/log2(r+1) carried as INTEGER
# micro-units (log2 literals precomputed — transcendentals never run
# in-engine), so DCG sums are exact and only the final mean divides.
# Third acceptance metric beside recall@5/MRR — rank-position-aware
# where recall is set-based.
# ---------------------------------------------------------------------------
_NDCG_W = [1000000, 630930, 500000, 430677, 386853]  # 1e6/log2(r+1)
_NDCG_IDEAL = sum(_NDCG_W)
_NDCG_CASE = "CASE a.rank " + " ".join(
    f"WHEN {r + 1} THEN {w}" for r, w in enumerate(_NDCG_W)
) + " ELSE 0 END"

_NDCG_ORACLE = f"""
    WITH brute AS (
      SELECT query_id, neighbor_id
      FROM ({{brute}}) WHERE rank <= 5
    ),
    appr AS (
      SELECT query_id, neighbor_id, rank FROM ({{appr}})
    ),
    dcg AS (
      SELECT a.query_id,
             CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL
                      THEN {_NDCG_CASE} ELSE 0 END) AS BIGINT) AS dcg_micro
      FROM appr a LEFT JOIN brute b
        ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
      GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(dcg_micro) AS BIGINT) AS sum_dcg_micro,
           CAST(sum(dcg_micro) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * {_NDCG_IDEAL}.0) AS mean_ndcg_at_5
    FROM dcg
"""


@query(
    "ann_ndcg_acceptance",
    oracle=_NDCG_ORACLE.format(
        brute=_registry.ORACLES["ann_cosine_topk"],
        appr=_registry.ORACLES["ann_ivf_topk"],
    ),
)
def q_ann_ndcg_acceptance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@5 acceptance of the IVF index against exact brute-force top-5 (binary relevance): integer micro-unit log discounts keep DCG sums exact, one double division for the mean - the rank-position-aware third metric beside recall and MRR."""
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    brute = (
        similarity.brute_force_topk(e, q, k=5)
        .filter(F.col("rank") <= 5)
        .select(F.col("query_id").alias("_bq"), F.col("neighbor_id").alias("_bn"))
    )
    appr = similarity.ivf_ann_topk(
        e, q, k=5, centroids=_ivf_literal_centroids()
    ).select("query_id", "neighbor_id", "rank")
    w = F.lit(0)
    for r, wt in enumerate(_NDCG_W):
        w = F.when(F.col("rank") == r + 1, wt).otherwise(w)
    j = appr.join(
        brute,
        (F.col("_bq") == F.col("query_id"))
        & (F.col("_bn") == F.col("neighbor_id")),
        "left",
    )
    dcg = j.groupBy("query_id").agg(
        F.sum(F.when(F.col("_bn").isNotNull(), w).otherwise(0))
        .cast("long")
        .alias("dcg_micro")
    )
    return dcg.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("dcg_micro").cast("long").alias("sum_dcg_micro"),
        (
            F.sum("dcg_micro").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(float(_NDCG_IDEAL)))
        ).alias("mean_ndcg_at_5"),
    )
