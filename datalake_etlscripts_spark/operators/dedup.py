"""Deduplication operators for training-data pipelines, at 100 TB scale.

Five strategies, cheapest first:

  exact          hash-groupBy on the content fingerprint — one shuffle
  bag-of-words   same, on the sorted-token-set fingerprint
  ngram-jaccard  exact Jaccard over k-token shingles within blocking
                 groups (language × length bucket) — self-join per
                 block, never all-pairs
  minhash-lsh    shingle → minhash signature → banded LSH buckets →
                 candidate pairs → exact-Jaccard verification. The
                 scale path: candidates come from equi-joins on
                 (band, bucket-hash), so the shuffle is linear in data
                 size, not quadratic
  simhash        64-bit simhash from token hashes; near-dup = small
                 Hamming distance within same simhash band
  embedding      cosine similarity over an embedding column — exact
                 all-pairs baseline (unit-normalize once per row, one
                 fold dot per pair) and an LSH-bucketed scale path
                 (random-hyperplane bands → equi-join candidates →
                 exact-cosine verification)

MinHash/SimHash use xxhash64/crc32 (deterministic JVM-side hashes) —
no Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.operators.checkpointing import cut_lineage
from datalake_etlscripts_spark.operators.text import (
    bow_fingerprint,
    content_fingerprint,
    shingles,
    tokens,
)

_MASK32 = 0xFFFFFFFF


# the shared cross-engine md5 hash lane lives in functions/scalar.py;
# re-exported here because every dedup scheme call site reads it
from datalake_etlscripts_spark.functions.scalar import md5_hash32  # noqa: E402,F401


def md5_shingle_hashes(text: Column, k: int = 3) -> Column:
    """ARRAY<BIGINT>: distinct 32-bit md5-prefix hashes of the k-token
    string shingles — the md5-scheme twin of shingle_hashes."""
    return F.array_distinct(F.transform(shingle_strings(text, k), md5_hash32))


def shingle_hashes(text: Column, k: int = 3) -> Column:
    """ARRAY<BIGINT> of k-shingle hashes built arithmetically: one
    xxhash64 per TOKEN, then a masked polynomial combine over k shifted
    slices — no per-shingle string concatenation (the string version
    dominates signature cost on long documents). Distinct per doc."""
    th = F.transform(tokens(text), lambda t: F.xxhash64(t).bitwiseAND(F.lit(_MASK32)))
    n = F.size(th)
    m = F.greatest(n - (k - 1), F.lit(0))
    out = F.slice(th, 1, m)
    for j in range(1, k):
        out = F.zip_with(
            out,
            F.slice(th, 1 + j, m),
            lambda a, b: (a * 31 + b).bitwiseAND(F.lit(_MASK32)),
        )
    return F.array_distinct(out)


def shingle_strings(text: Column, k: int = 3) -> Column:
    """ARRAY<STRING> of distinct k-token shingles ('tok1 tok2 tok3').
    Slower than the arithmetic shingle_hashes (per-shingle string
    concat) — used by the md5 hash scheme, which must hash a value an
    external engine can reconstruct (DuckDB oracle twin).

    Delegates to text.shingles (zip_with over k shifted slices —
    each slice evaluates the token split once; an earlier
    element_at-per-lambda version here re-tokenized the text per
    element, 15× slower at bench scale)."""
    return shingles(text, k)


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, n_docs, doc_ids)."""
    return (
        df.select(F.col(id_col), content_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.array_sort(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def bow_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups sharing the same token SET (order/repetition-insensitive)."""
    return (
        df.select(F.col(id_col), bow_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.array_sort(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_keep_first(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus after exact dedup: lowest id per fingerprint survives.
    One shuffle (groupBy fp + min id) + semi join back."""
    keep = (
        df.select(F.col(id_col), content_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep.select(id_col), id_col, "left_semi")


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    # two empty shingle sets → undefined similarity → NULL (dropped by
    # every >= threshold filter), not an ANSI divide-by-zero crash
    return F.try_divide(inter.cast("double"), union)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    block_cols: tuple[str, ...] = ("lang",),
    length_bucket: int = 100,
) -> DataFrame:
    """Near-duplicate pairs by exact shingle Jaccard, blocked so the
    candidate space is per-block (block = lang × length bucket), never
    the full n² cross product. Returns (id_a, id_b, jaccard).

    r07 (guide §2.3): candidates come from a shared-shingle INVERTED
    INDEX instead of the former blocked all-pairs self-join — explode
    shingles, equi-join postings on (block, shingle), count shared
    shingles per pair, then jaccard = inter / (|A| + |B| − inter)
    (exact for distinct shingle sets). Equivalent for threshold > 0:
    a pair with J ≥ t > 0 shares ≥ 1 shingle so it appears in the
    index join, and zero-overlap / empty-set pairs fail the threshold
    in both shapes (empty∩empty is NULL-jaccard in the old form,
    absent here — both filtered). Contract note: pairs sharing NO
    shingle are never emitted (their jaccard is 0), so a threshold ≤ 0
    behaves like an infinitesimal positive one. The all-pairs form
    materialized every same-block pair with both full arrays; the
    index join's fan-out is Σ df² over per-(block, shingle) doc
    frequencies, far smaller on natural text, and ships 4 scalars per
    row."""
    blocks = [*block_cols, "_lb"]
    base = df.select(
        F.col(id_col).alias("_did"),
        *[F.col(c) for c in block_cols],
        (F.length(text_col) / F.lit(length_bucket)).cast("int").alias("_lb"),
        shingles(F.col(text_col), k).alias("_sh"),
    ).localCheckpoint(eager=False)  # postings + both size lookups
    posts = base.select("_did", *blocks, F.explode("_sh").alias("_s"))
    a = posts.select(F.col("_did").alias("id_a"), *blocks, "_s")
    b = posts.select(F.col("_did").alias("id_b"), *blocks, "_s")
    inter = (
        a.join(b, [*blocks, "_s"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sizes = base.select(F.col("_did"), F.size("_sh").cast("long").alias("_n"))
    jac = F.try_divide(
        F.col("_inter").cast("double"),
        (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("_did").alias("id_a"), F.col("_n").alias("_na"))),
            "id_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("_did").alias("id_b"), F.col("_n").alias("_nb"))),
            "id_b",
        )
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    scheme: str = "xxhash64",
    with_hash_sets: bool = False,
) -> DataFrame:
    """(id, sig ARRAY<BIGINT>): minhash over k-shingles. Hash family:
    xxhash64(shingle, seed_i) — JVM-side, no UDF.

    Shape: explode shingles ONCE, compute all hash lanes per shingle
    row, then a map-side-combined min-agg per doc — the shingle array
    is built once per document (an expression-level ``array_min(
    transform(...))`` per lane would rebuild it num_hashes times).
    Shingle-less docs explode a single sentinel token instead, so ONE
    scan + ONE shuffle covers every document — no separate
    empties anti-join/union pass; all empty docs share one constant
    signature and bucket together harmlessly.

    ``scheme='md5'`` hashes the shingle STRING once via md5 and takes
    the two K-M bases from hex digits 1-8 / 9-16, so an external
    engine can replay the signature bit-for-bit (DuckDB oracle twin,
    cf. simhash_table).

    ``with_hash_sets=True`` additionally collects the distinct
    verification-hash set per doc (``hset``) in the SAME aggregate —
    the exact-Jaccard set that _verify_jaccard would otherwise
    rebuild from the raw texts. One shuffle buys both; callers
    materialize the result and the whole corpus-wide hash work runs
    exactly once (see minhash_lsh_pairs)."""
    if scheme == "xxhash64":
        sh = shingle_hashes(F.col(text_col), k)
        exploded = df.select(
            F.col(id_col).alias("_did"),
            F.explode(
                F.coalesce(
                    F.nullif(sh, F.array().cast("array<bigint>")),
                    F.array(F.lit(-(1 << 62)).cast("bigint")),
                )
            ).alias("_s"),
        ).select(
            "_did",
            # the combined shingle hash IS the verification-set value
            # (shingle_hashes output) — carried for with_hash_sets
            F.col("_s").alias("_hv"),
            # Kirsch-Mitzenmacher: all hash lanes derived from two base
            # hashes h1 + i*h2 — 2 hashes per shingle instead of
            # num_hashes. Bases masked to 32 bits so no lane overflows a
            # long under ANSI arithmetic
            F.xxhash64("_s", F.lit(1)).bitwiseAND(F.lit(0xFFFFFFFF)).alias("_h1"),
            F.xxhash64("_s", F.lit(2)).bitwiseAND(F.lit(0xFFFFFFFF)).alias("_h2"),
        )
    elif scheme == "md5":
        sh = shingle_strings(F.col(text_col), k)
        exploded = df.select(
            F.col(id_col).alias("_did"),
            F.explode(
                F.coalesce(
                    F.nullif(sh, F.array().cast("array<string>")),
                    F.array(F.lit("___EMPTY___")),
                )
            ).alias("_s"),
        ).select(
            "_did", F.md5("_s").alias("_m")
        ).select(
            # ONE md5 per shingle: the Kirsch-Mitzenmacher bases are
            # independent 32-bit slices of the same digest (hex digits
            # 1-8 and 9-16) — halves the hash work vs two seeded md5s
            "_did",
            F.conv(F.substring("_m", 1, 8), 16, 10).cast("long").alias("_h1"),
            F.conv(F.substring("_m", 9, 8), 16, 10).cast("long").alias("_h2"),
        ).withColumn(
            # md5_hash32(shingle) ≡ _h1 — the verification-set value
            "_hv",
            F.col("_h1"),
        )
    else:
        raise ValueError(f"unknown minhash scheme {scheme!r}")
    aggs = [
        F.min(F.col("_h1") + F.lit(i) * F.col("_h2")).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    if with_hash_sets:
        aggs.append(F.collect_set("_hv").alias("hset"))
    mins = exploded.groupBy("_did").agg(*aggs)
    sig = F.array(*[F.col(f"_h{i}") for i in range(num_hashes)])
    cols = ["_did", sig.alias("sig")] + (["hset"] if with_hash_sets else [])
    return mins.select(*cols)


# within-bucket ordered pairs via per-bucket collect + explode, NOT a
# banded self-join: a self-join evaluates the (expensive) shingle
# explode + min-agg signature pipeline once per side — Catalyst can't
# reuse the exchange across the join's probe/broadcast subplans — and
# at 100 TB the broadcast side (docs × bands rows) stops fitting,
# degrading to a sort-merge join with two more exchanges ON TOP of the
# duplicated signature compute. This shape runs the pipeline once and
# adds only one shuffle of the banded keys. Bucket sizes are
# s-curve-small once shingle-less docs are excluded.
def _pair_expr() -> Column:
    # built lazily — F.expr needs an active session, and this module
    # imports before any SparkSession exists in tests/CLI startup
    return F.expr(
        """
        flatten(transform(ids, (x, i) ->
          transform(slice(ids, i + 2, size(ids) - i - 1), y ->
            struct(x AS id_a, y AS id_b))))
        """
    )


def lsh_bucket_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    scheme: str = "xxhash64",
) -> DataFrame:
    """(band, bucket, _did): banded-LSH index rows for ``df`` — the
    persistable state of incremental dedup (incremental_minhash_dedup
    appends each batch's rows). Shingle-less docs are excluded up
    front: a real pair needs a shared shingle, and their common
    sentinel bucket would be the one genuinely quadratic bucket.

    Under ``scheme='md5'`` the band bucket is a masked polynomial fold
    of the r lane minima (pure integer arithmetic an external engine
    replays) instead of xxhash64."""
    r = num_hashes // bands
    df = df.filter(F.size(tokens(F.col(text_col))) >= F.lit(k))
    sigs = minhash_signatures(df, text_col, id_col, k, num_hashes, scheme)
    return _band_explode(sigs, bands, r, scheme).select("band", "bucket", "_did")


def _band_bucket(scheme: str, r: int, b: int) -> Column:
    """Bucket value of band ``b`` from the ``sig`` array column."""
    if scheme == "md5":
        acc = F.lit(0).cast("long")
        for j in range(r):
            acc = (acc * F.lit(1000003) + F.col("sig")[b * r + j]).bitwiseAND(
                F.lit(_MASK32)
            )
        return acc
    return F.xxhash64(*[F.col("sig")[b * r + j] for j in range(r)])


def _band_explode(sigs: DataFrame, bands: int, r: int, scheme: str) -> DataFrame:
    return sigs.select(
        "_did",
        F.posexplode(
            F.array(*[_band_bucket(scheme, r, b) for b in range(bands)])
        ).alias("band", "bucket"),
    )


def _verify_jaccard(
    cand: DataFrame,
    texts: DataFrame,
    k: int,
    threshold: float,
    scheme: str = "xxhash64",
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs (id_a, id_b)
    against ``texts`` (_did, _t). Jaccard runs over the ARITHMETIC
    shingle-hash sets (same value as string-shingle Jaccard modulo
    negligible 32-bit collisions) and only for docs appearing in some
    pair — at scale candidates ≪ corpus, so the expensive shingle
    build is semi-join-pruned to the candidate support set. ``cand``
    is tiny and referenced three times — callers pass it
    materialized (localCheckpoint / staged table)."""
    support = (
        cand.select(F.col("id_a").alias("_did"))
        .unionByName(cand.select(F.col("id_b").alias("_did")))
        .distinct()
    )
    hash_fn = md5_shingle_hashes if scheme == "md5" else shingle_hashes
    sh = (
        texts.join(support, "_did", "left_semi")
        .select("_did", hash_fn(F.col("_t"), k).alias("hset"))
    )
    return _verify_pairs_against_sets(cand, sh, threshold)


def _verify_pairs_against_sets(
    cand: DataFrame, hs: DataFrame, threshold: float
) -> DataFrame:
    """THE verification contract — one definition for both the batch
    (minhash_lsh_pairs, sets carried through the signature aggregate)
    and incremental (_verify_jaccard, sets rebuilt for the candidate
    support) paths, so threshold/NULL-divide semantics cannot drift
    between them. ``hs`` is (_did, hset ARRAY<...>)."""
    verified = (
        cand.join(hs.select(F.col("_did").alias("id_a"), F.col("hset").alias("_hs_a")), "id_a")
        .join(hs.select(F.col("_did").alias("id_b"), F.col("hset").alias("_hs_b")), "id_b")
        .select("id_a", "id_b", _jaccard(F.col("_hs_a"), F.col("_hs_b")).alias("jaccard"))
    )
    return verified.filter(F.col("jaccard") >= threshold)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    scheme: str = "xxhash64",
) -> DataFrame:
    """MinHash + banded LSH candidate generation, then exact-Jaccard
    verification of candidates only. rows/band = num_hashes/bands; with
    32 hashes × 8 bands (r=4) the s-curve crosses ~0.5 ≈ (1/8)^(1/4).

    Scale shape: explode to (band, bucket) keys → per-bucket pair
    explode (see _PAIR_EXPR note) → candidates ~ linear; only
    candidate pairs pay the exact-Jaccard verification. Returns
    (id_a, id_b, jaccard) verified ≥ threshold.

    ``scheme='md5'`` makes the whole pipeline (signatures, banding,
    verification hashes) replayable by an external engine — the
    oracle-checkable variant; production default stays xxhash64.

    Execution shape (the fold-the-chain fix, r2): the per-doc
    (signature, verification-hash set) table is built in ONE
    corpus-wide shuffle and materialized; banding/candidate pairing
    AND exact-Jaccard verification both read the settled table, so
    the shingle/hash pipeline — the dominant cost — runs exactly once
    instead of once for candidates plus twice for verification.
    Tradeoff: carrying the hash sets grows the signature shuffle and
    checkpoint by O(corpus tokens). That wins when verification would
    otherwise re-scan a meaningful fraction of the corpus (duplicates
    are common — the training-data case); for a corpus with very few
    near-dups the incremental path's support-pruned text verification
    (_verify_jaccard over lsh_bucket_table) recomputes less. Both
    funnel into _verify_pairs_against_sets, so the verdict semantics
    are a single definition.
    """
    per_doc = minhash_per_doc(df, text_col, id_col, k, num_hashes, scheme)
    return lsh_pairs_from_per_doc(per_doc, num_hashes, bands, threshold, scheme)


def minhash_per_doc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    scheme: str = "xxhash64",
) -> DataFrame:
    """The settled per-doc (signature, verification-hash-set) table
    minhash_lsh_pairs builds — exposed so sweeps that band the SAME
    signatures several ways (dedup_lsh_band_sweep: 4/8/16 bands over
    32 hashes) compute the corpus-wide shingle/hash pipeline ONCE and
    reuse it per band config (guide §2.4: a band count only changes
    how minima are grouped, never the minima themselves)."""
    filtered = df.filter(F.size(tokens(F.col(text_col))) >= F.lit(k))
    return minhash_signatures(
        filtered, text_col, id_col, k, num_hashes, scheme, with_hash_sets=True
    ).localCheckpoint()


def lsh_pairs_from_per_doc(
    per_doc: DataFrame,
    num_hashes: int,
    bands: int,
    threshold: float,
    scheme: str = "xxhash64",
) -> DataFrame:
    """Band + pair + verify stage of minhash_lsh_pairs over an
    already-settled ``minhash_per_doc`` table."""
    r = num_hashes // bands
    cand = (
        _band_explode(per_doc, bands, r, scheme)
        .groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("_did")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(_pair_expr()).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates()
    )
    return _verify_pairs_against_sets(
        cand, per_doc.select("_did", "hset"), threshold
    )


def incremental_minhash_dedup(
    index: DataFrame,
    existing_docs: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    scheme: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """Incremental near-dup detection — the 100 TB shape where the
    corpus is ingested in batches and NEVER re-signatured: ``index``
    is the persisted (band, bucket, _did) state (lsh_bucket_table
    rows of everything ingested so far), ``existing_docs`` the stored
    corpus (for verification text lookup), ``batch`` the new
    documents. Returns (verified pairs touching the batch, updated
    index rows to persist).

    Candidates are (a) batch×existing via an equi-join probe of the
    index on (band, bucket) — shuffle linear in batch size, the index
    side is hash-partitioned state — and (b) within-batch pairs via
    the same per-bucket explode as the batch path. Only candidates
    pay verification; union-of-batches equals a full recompute
    (asserted in tests) because banding is deterministic per doc."""
    bt = lsh_bucket_table(batch, text_col, id_col, k, num_hashes, bands, scheme)
    bt = bt.localCheckpoint()  # feeds probe, within-pairs and the new index
    probe = (
        bt.join(index.withColumnRenamed("_did", "_old"), ["band", "bucket"])
        .filter(F.col("_did") != F.col("_old"))
        .select(
            F.least("_did", "_old").alias("id_a"),
            F.greatest("_did", "_old").alias("id_b"),
        )
    )
    within = (
        bt.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("_did")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(_pair_expr()).alias("p"))
        .select("p.id_a", "p.id_b")
    )
    cand = probe.unionByName(within).dropDuplicates().localCheckpoint()
    texts = (
        existing_docs.select(F.col(id_col).alias("_did"), F.col(text_col).alias("_t"))
        .unionByName(
            batch.select(F.col(id_col).alias("_did"), F.col(text_col).alias("_t"))
        )
        .dropDuplicates(["_did"])
    )
    pairs = _verify_jaccard(cand, texts, k, threshold, scheme)
    return pairs, index.unionByName(bt)


def simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 1,
    bits: int = 64,
    scheme: str = "xxhash64",
) -> DataFrame:
    """(id, simhash BIGINT): per-bit majority vote over shingle hashes.

    Same scalable shape as minhash: explode shingles once, per-bit ±1
    contributions as columns, map-side-combined sums per doc, then the
    bit word reassembled from the votes — fully JVM-side.

    ``scheme='xxhash64'`` (default, 64-bit) is the fast production
    path; ``scheme='md5'`` (use bits=32) hashes the shingle STRING via
    an md5 hex prefix so any engine with md5 can replay the signature
    bit-for-bit — the oracle-checkable variant (cf. the CMS lanes in
    operators/sketches.py)."""
    if scheme == "xxhash64":
        sh = shingle_hashes(F.col(text_col), k)
        exploded = df.select(
            F.col(id_col).alias("_did"),
            F.explode(
                F.coalesce(
                    F.nullif(sh, F.array().cast("array<bigint>")),
                    F.array(F.lit(-(1 << 62)).cast("bigint")),
                )
            ).alias("_s"),
        ).select("_did", F.xxhash64("_s").alias("_h"))
    elif scheme == "md5":
        sh = shingle_strings(F.col(text_col), k)
        exploded = df.select(
            F.col(id_col).alias("_did"),
            F.explode(
                F.coalesce(
                    F.nullif(sh, F.array().cast("array<string>")),
                    F.array(F.lit("___EMPTY___")),
                )
            ).alias("_s"),
        ).select("_did", md5_hash32(F.col("_s")).alias("_h"))
    else:
        raise ValueError(f"unknown simhash scheme {scheme!r}")
    votes = exploded.groupBy("_did").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"_b{i}")
            for i in range(bits)
        ]
    )
    word = F.lit(0).cast("long")
    for i in range(bits):
        word = word + F.when(
            F.col(f"_b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("_did", word.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    band_bits: int = 16,
    shingle_k: int = 3,
    bits: int = 64,
    scheme: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: block on bit bands (a pair within
    hamming < n_bands shares at least one exact band), verify Hamming
    distance on candidates. Returns (id_a, id_b, hamming)."""
    hashed = simhash_table(
        df, text_col, id_col, k=shingle_k, bits=bits, scheme=scheme
    ).select("_did", F.col("simhash").alias("_sh"))
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    banded = hashed.select(
        "_did",
        "_sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("_sh", b * band_bits).bitwiseAND(F.lit(mask))
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    l_ = banded.select(F.col("_did").alias("id_a"), F.col("_sh").alias("sh_a"), "band", "bucket")
    r_ = banded.select(F.col("_did").alias("id_b"), F.col("_sh").alias("sh_b"), "band", "bucket")
    cand = (
        l_.join(r_, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def _unit(vec: Column) -> Column:
    """Unit-normalize once per row so the pair join needs a single
    fold dot product instead of dot + two norms per pair."""
    n = F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.transform(vec, lambda x: x.cast("double") / n)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: (id_a, id_b, cos_sim)
    for every unordered pair with cosine ≥ threshold.

    Correctness baseline (reference scope: OLD/get_entities.py-style
    entity matching generalized to vectors): O(n²/2) self-join — use
    embedding_near_dup_lsh for the linear-shuffle scale path. Unit
    vectors are computed once per row BEFORE the join; the per-pair
    work is one zip_with/aggregate fold, JVM-side.
    """
    # r07 (guide §1.2 "per-task work" + §3): the all-pairs nested-loop
    # evaluated the FULL 64-dim zip_with/aggregate fold (three array
    # allocations per pair) on every pair, then filtered. The join
    # condition now carries an exact Cauchy-Schwarz prefilter on a
    # 16-dim head: dot ≤ dot(head_a, head_b) + ||tail_a||·||tail_b||,
    # so ~99% of pairs are rejected after a 16-element fold and the
    # full-width fold (unchanged arithmetic — the emitted cos_sim is
    # the identical left fold) runs on survivors only. The 1e-9 margin
    # dominates the ≤ ~1e-13 float deviation between the real-valued
    # bound and the evaluated folds, so no qualifying pair can be
    # pruned; the final ≥ threshold filter is exact as before.
    from datalake_etlscripts_spark.operators.skew import spread_small_input

    head = 16
    margin = 1e-9
    # spread the STREAM side: a small single-row-group parquet scans as
    # ONE task, so the nested-loop probe (the O(n²) work) would run on
    # one core regardless of cluster size (guide §2.5 input skew); the
    # build side is explicitly broadcast below so the planner never
    # streams the unspread copy instead.
    unit = df.select(F.col(id_col).alias("_eid"), _unit(F.col(vec_col)).alias("_ev"))
    pre = unit.select(
        "_eid",
        "_ev",
        F.slice("_ev", 1, head).alias("_hd"),
        F.sqrt(
            F.aggregate(
                F.slice("_ev", head + 1, F.greatest(F.size("_ev") - head, F.lit(0))),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        ).alias("_tn"),
    )
    l_ = spread_small_input(pre).select(
        F.col("_eid").alias("id_a"),
        F.col("_ev").alias("_va"),
        F.col("_hd").alias("_hda"),
        F.col("_tn").alias("_tna"),
    )
    r_ = pre.select(
        F.col("_eid").alias("id_b"),
        F.col("_ev").alias("_vb"),
        F.col("_hd").alias("_hdb"),
        F.col("_tn").alias("_tnb"),
    )
    head_dot = F.aggregate(
        F.zip_with("_hda", "_hdb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    bound = head_dot + F.col("_tna") * F.col("_tnb")
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        l_.join(
            F.broadcast(r_),
            (F.col("id_a") < F.col("id_b")) & (bound >= F.lit(threshold - margin)),
        )
        .select("id_a", "id_b", dot.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sig_bits: int = 16,
    band_bits: int = 8,
) -> DataFrame:
    """Scale path for embedding near-dup: random-hyperplane signatures
    banded into equi-join buckets (shuffle linear in rows, not pairs),
    then exact cosine ≥ threshold verified on candidates only. Output
    schema matches embedding_near_dup_pairs; recall < 1 by design
    (pairs agreeing in no band are never compared)."""
    from datalake_etlscripts_spark.operators.similarity import _rh_signature, random_planes

    planes = random_planes(dim, sig_bits)
    n_bands = sig_bits // band_bits
    mask = (1 << band_bits) - 1
    sig = _rh_signature(F.col(vec_col), planes)
    banded = df.select(
        F.col(id_col).alias("_eid"),
        _unit(F.col(vec_col)).alias("_ev"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(sig, b * band_bits).bitwiseAND(F.lit(mask))
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    l_ = banded.select(F.col("_eid").alias("id_a"), F.col("_ev").alias("_va"), "band", "bucket")
    r_ = banded.select(F.col("_eid").alias("id_b"), F.col("_ev").alias("_vb"), "band", "bucket")
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        l_.join(r_, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", dot.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.92,
    n_clusters: int | None = None,
    rows_per_cell: int = 1024,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): k-means the
    embedding space into cells, find near-duplicate pairs ONLY within a
    cell, resolve pairs to clusters, keep the min-id representative per
    cluster. Returns (vec_id, component, keep).

    Cost model (be precise — shuffle volume and compare work differ):
    the cell equi-join SHUFFLES linear in rows, but the within-cell
    pairwise COMPARE is O(Σ |cell|²) ≈ N²/k. A fixed k is therefore
    quadratic at corpus scale; SemDeDup itself runs tens of thousands
    of clusters over billions of embeddings. Default n_clusters=None
    sizes k ≈ N / rows_per_cell (one count job), making total compare
    work ~N·rows_per_cell/2 — linear. k is capped at 256 because this
    quantizer assigns cells with a per-centroid literal expression
    (operators/similarity._nearest_centroids); beyond that cap the
    assignment step must become a broadcast-centroid numpy matmul in
    mapInPandas (same shape as similarity.ann_pandas) — the cap is an
    implementation ceiling of the expression quantizer, not of the
    algorithm.

    The coarse quantizer is the same bounded-sample Lloyd's as IVF ANN
    (operators/similarity.py) — centroids come from a driver-side
    sample, full-corpus cell assignment stays distributed. Recall < 1
    by design: a pair split across cells is never compared (IVF-style
    n_probe > 1 on one side would trade shuffle for recall)."""
    from datalake_etlscripts_spark.operators.similarity import (
        _nearest_centroids,
        kmeans_centroids,
    )

    if centroids is not None:
        # fixed literal quantizer — the oracle-checkable variant (an
        # external engine replays assignment; cf. similarity.ivf_ann_topk)
        cents = centroids
    else:
        if n_clusters is None:
            n = df.count()
            n_clusters = min(256, max(16, -(-n // rows_per_cell)))
        cents = kmeans_centroids(df, vec_col, k=n_clusters)
    cells = df.select(
        F.col(id_col).alias("_eid"),
        _unit(F.col(vec_col)).alias("_ev"),
        F.element_at(_nearest_centroids(F.col(vec_col), cents, 1), 1).alias("_cell"),
    )
    l_ = cells.select(F.col("_eid").alias("id_a"), F.col("_ev").alias("_va"), "_cell")
    r_ = cells.select(F.col("_eid").alias("id_b"), F.col("_ev").alias("_vb"), "_cell")
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    pairs = (
        l_.join(r_, "_cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    comp = connected_components(pairs)
    return (
        df.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", "node").alias("component"),
            (F.coalesce("component", "node") == F.col("node")).alias("keep"),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: connected
    components by iterative hash-min label propagation. Returns
    (node, component) where component = min node id in the cluster.

    Each round is one shuffle (edge join + min-agg); the label front
    converges in O(log diameter) rounds for near-dup graphs, whose
    components are tiny. Lineage is cut per round (localCheckpoint) so
    the plan stays constant-size — an uncheckpointed loop compounds
    the plan ~4× per round. At 100 TB — or whenever component diameter
    can exceed the round budget — use connected_components_star below
    (same join shapes, provably O(log n) rounds; equivalence + the
    round-complexity difference are tested) and checkpoint to the
    object store instead of executor memory.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    e = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("src").alias("node")).distinct().withColumn("lab", F.col("node"))
    )
    for it in range(max_iter):
        nbr = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        new = labels.join(nbr, "node", "left").select(
            "node", F.least("lab", F.coalesce("nlab", "lab")).alias("lab")
        )
        new = cut_lineage(new, it, checkpoint_dir, checkpoint_every, eager=True)
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select("node", F.col("lab").alias("component"))


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the scale path promised in connected_components' docstring:
    provably O(log n) rounds regardless of component DIAMETER, where
    hash-min needs O(diameter) rounds (a 10^6-node chain: ~20 rounds
    vs 10^6). Same output contract: (node, component = min node id).

    Each half-round is one groupBy + one join on the edge list, both
    hash-partitioned on the node id — no new shuffle shapes. Edges are
    kept canonically big→small; at convergence they form stars rooted
    at each component's minimum.
    """
    e = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("src"),
            F.least(F.col(id_a), F.col(id_b)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def _mins(edges: DataFrame) -> DataFrame:
        # per node u: m = min(N(u) ∪ {u}) over the given neighbor set
        return edges.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )

    for it in range(max_iter):
        # large-star: every neighbor v > u links to m(u)
        und = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        ls = (
            und.join(_mins(und), "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # small-star: every neighbor v ≤ u (all of them — edges are
        # big→small) and u itself link to m(u)
        mins = _mins(ls)
        ss = cut_lineage(
            ls.join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(mins.select("src", F.col("m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct(),
            it,
            checkpoint_dir,
            checkpoint_every,
            eager=True,
        )
        done = ss.exceptAll(e).isEmpty() and e.exceptAll(ss).isEmpty()
        e = ss
        if done:
            break
    return nodes.join(
        e.select(F.col("src").alias("node"), F.col("dst").alias("lab")), "node", "left"
    ).select("node", F.coalesce("lab", "node").alias("component"))


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least one
    k-token shingle with the benchmark/eval set. Returns
    (doc_id, n_hit_shingles) for contaminated documents only.

    Scale shape: the benchmark side is tiny relative to a 100 TB
    corpus, so its distinct shingle set is BROADCAST — the corpus-side
    explode joins map-side with no shuffle of corpus data; the only
    shuffle is the per-doc hit-count aggregation (hit rows ≪ corpus).
    For very large benchmark suites swap the shingle strings for
    xxhash64 values on both sides (8-byte keys, same join shape).
    """
    bench_sh = (
        benchmark.select(F.explode(shingles(F.col(text_col), k)).alias("_sh"))
        .distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("_sh")
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "_sh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_shingles"))
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Paragraph-level exact dedup (the C4 recipe: drop every repeat of
    a paragraph corpus-wide, keeping its first occurrence). "First" is
    deterministic — min (doc_id, position) — not arrival order, so the
    result is stable under any partitioning. Returns (doc_id, text)
    with surviving paragraphs rejoined in original order; documents
    whose every paragraph was dropped come back with ''.

    Shape: posexplode → ONE shuffle on the paragraph value (window
    row_number keeps the arg-min occurrence) → per-doc reassembly
    (second shuffle, map-side combinable collect_list) → left join
    back to the id spine. Skewed boilerplate paragraphs are bounded:
    the window only ranks within one paragraph's occurrences, and AQE
    skew-split handles the heavy keys."""
    from pyspark.sql import Window as W

    paras = df.select(
        F.col(id_col).alias("_did"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_ord", "_p"),
    ).filter(F.col("_p") != "")
    first = F.row_number().over(
        W.partitionBy("_p").orderBy("_did", "_ord")
    )
    kept = paras.withColumn("_rn", first).filter(F.col("_rn") == 1)
    rebuilt = kept.groupBy("_did").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_ord", "_p"))), lambda s: s["_p"]
            ),
            sep,
        ).alias("_clean")
    )
    return (
        df.select(F.col(id_col).alias("_did"))
        .join(rebuilt, "_did", "left")
        .select(
            F.col("_did").alias(id_col),
            F.coalesce("_clean", F.lit("")).alias(text_col),
        )
    )


def url_duplicates(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup (the cheapest corpus-dedup pass — CCNet dedupes
    by canonicalized URL before touching content): per-row canonical
    key, keep the min-id document per key. One shuffle on the
    canonical key; returns (id, canonical, keep)."""
    from datalake_etlscripts_spark.functions.scalar import canonical_url

    keyed = df.select(
        F.col(id_col), canonical_url(F.col(url_col)).alias("canonical")
    )
    w = W.partitionBy("canonical")
    # NULL canonical = unparseable URL: no dedup evidence — keep the
    # document (the window would otherwise pool every bad URL into one
    # NULL group and drop all but one unrelated doc)
    return keyed.select(
        id_col,
        "canonical",
        F.when(F.col("canonical").isNull(), F.lit(True))
        .otherwise(F.col(id_col) == F.min(id_col).over(w))
        .alias("keep"),
    )


def char_gram_hashes(text: Column, k: int = 20, scheme: str = "xxhash64") -> Column:
    """Position-ORDERED (not distinct) hashes of every k-CHAR gram —
    the winnowing alphabet. Per-element substr is O(k) on the already-
    loaded row value (unlike the re-tokenizing pitfall fixed in
    shingle_strings)."""
    n = F.length(text)
    idx = F.when(
        n >= k, F.sequence(F.lit(1), n - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    if scheme == "md5":
        return F.transform(idx, lambda i: md5_hash32(text.substr(i, F.lit(k))))
    if scheme == "xxhash64":
        return F.transform(idx, lambda i: F.xxhash64(text.substr(i, F.lit(k))))
    raise ValueError(f"unknown char-gram scheme {scheme!r}")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 16,
    scheme: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., the MOSS
    scheme): hash every k-char gram, keep the MINIMUM hash of each
    w-gram sliding window, distinct per document. Guarantee: any
    substring match of length >= w + k - 1 chars shares at least one
    fingerprint — the index-friendly form of exact-substring dedup
    (Lee et al. 2022 use suffix arrays; a suffix array is not a
    distributed-join shape, winnowing is).

    Shape: the whole winnow is a PER-ROW array computation — gram
    hashes projected once as a column, then array_min over each w-wide
    slice (O(n·w) arithmetic per document, no explode, NO shuffle; the
    earlier explode + sliding-window-over-rows version paid a full
    per-doc shuffle for what one row already holds). distinct (id, fp)
    is the only shuffle, and only of the winnowed fingerprints
    (~2/(w+1) density). Returns (id, fp)."""
    gh = df.select(
        F.col(id_col).alias("_did"),
        char_gram_hashes(F.col(text_col), k, scheme).alias("_gh"),
    )
    n = F.size(F.col("_gh"))
    starts = F.when(n >= w, F.sequence(F.lit(1), n - (w - 1))).otherwise(
        F.array().cast("array<int>")
    )
    # _gh is an attribute reference (projected above), so the slice
    # reads the materialized array — no per-element recompute of the
    # gram pipeline (the expression-in-lambda pitfall)
    fps = F.array_distinct(
        F.transform(starts, lambda i: F.array_min(F.slice(F.col("_gh"), i, w)))
    )
    # array_distinct above already makes (id, fp) unique — no
    # distinct() shuffle needed
    return gh.select("_did", F.explode(fps).alias("fp"))


def substring_duplicate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 16,
    min_shared: int = 2,
    scheme: str = "xxhash64",
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs sharing >= min_shared winnowing fingerprints —
    i.e. pairs with (at least) repeated substrings of ~w+k-1 chars.
    The pair join is an equi-join on the fingerprint (linear shuffle,
    same scale shape as LSH banding); a fingerprint shared by B docs
    contributes B^2 candidate rows, so at corpus scale pass ``max_df``
    to drop boilerplate fingerprints above that document frequency
    before the join (the stop-shingle mitigation; a fingerprint in
    thousands of docs is boilerplate, not a duplicate signal —
    dropping it loses only pairs whose every shared substring is
    boilerplate). Returns (id_a, id_b, n_shared)."""
    fps = winnow_fingerprints(df, text_col, id_col, k, w, scheme)
    if max_df is not None:
        keep = fps.groupBy("fp").count().filter(F.col("count") <= max_df).select("fp")
        fps = fps.join(keep, "fp", "left_semi")
    a = fps.select(F.col("_did").alias("id_a"), "fp")
    b = fps.select(F.col("_did").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate_corpus(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    max_hits: int = 0,
) -> DataFrame:
    """The REMOVAL composition of contamination_hits: return the corpus
    with every document whose benchmark-shingle overlap exceeds
    ``max_hits`` anti-joined away — what a user actually runs before
    training. Same broadcast-semi shape: the corpus shuffles only its
    (tiny) hit set."""
    hits = contamination_hits(corpus, benchmark, text_col, id_col, k)
    bad = hits.filter(F.col("n_hit_shingles") > max_hits).select(id_col)
    return corpus.join(bad, id_col, "left_anti")


def ngram_novelty_scores(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Per-document n-gram novelty vs a reference corpus: the fraction
    of a document's DISTINCT k-token shingles that do NOT occur
    anywhere in ``reference`` — the memorization/novelty audit run on
    generated or newly-crawled data against the training corpus
    (contamination_hits' per-doc ratio generalization; cf. Carlini et
    al.'s memorization overlap metrics).

    Scale shape: the reference's distinct shingle set is the small
    side only when auditing against benchmarks; against a full
    training corpus BOTH sides are large, so the membership probe is a
    plain left join on the shingle hash (linear shuffle on 8-byte
    keys, never a broadcast). Per-doc totals ride one id-keyed
    aggregate. Ratio = exact ints divided once in double (engine-
    deterministic). Documents too short for one shingle score NULL.

    Contract: ``id_col`` is unique per corpus row — shingles() is
    already distinct per document, so (id, shingle) needs no dedup
    exchange; duplicate ids would double-count their shingles.

    Returns (id, n_shingles, n_novel, novelty).
    """
    ref_sh = (
        reference.select(F.explode(shingles(F.col(text_col), k)).alias("_sh"))
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    # shingles() is array_distinct per document and ids are unique by
    # the operator's contract, so the exploded (id, shingle) rows are
    # already unique — no dedup exchange needed over the corpus-sized
    # intermediate (a prior dropDuplicates here was pure waste)
    doc_sh = corpus.select(
        F.col(id_col), F.explode_outer(shingles(F.col(text_col), k)).alias("_sh")
    )
    probed = doc_sh.join(ref_sh, "_sh", "left")
    return (
        probed.groupBy(id_col)
        .agg(
            F.count(F.col("_sh")).alias("n_shingles"),
            (F.count(F.col("_sh")) - F.count(F.col("_seen"))).alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.try_divide(
                F.col("n_novel").cast("double"), F.col("n_shingles").cast("double")
            ),
        )
    )


def allpairs_jaccard_pairs(
    df: DataFrame,
    threshold: tuple[int, int] = (3, 5),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT all-pairs similarity join (AllPairs / PPJoin prefix
    filtering, Bayardo et al. 2007): every pair of documents with
    token-set Jaccard ≥ threshold — no approximation, unlike
    minhash-LSH, and no blocking assumptions, unlike the
    (lang × length) ngram join.

    Why it scales: each document's tokens are ordered by ASCENDING
    global frequency and only the first l − ⌈t·l⌉ + 1 of them (the
    prefix) generate candidates — two sets with J ≥ t provably share
    a prefix token under a common global order. Prefixes are built
    from the RAREST tokens, so the candidate equi-join keys are
    low-skew by construction (a stopword never lands in a prefix of a
    long document); a size-ratio filter (t ≤ |B|/|A| ≤ 1/t) prunes
    before verification. Exact verification intersects the two
    distinct-token arrays per surviving candidate.

    The threshold is a RATIONAL (num, den) and the keep decision is
    integer cross-multiplication (den·inter ≥ num·union) — no float
    boundary ambiguity between engines; the reported jaccard is one
    double division of exact ints.

    Returns (id1, id2, jaccard) with id1 < id2.
    """
    tnum, tden = threshold
    tok = df.select(
        F.col(id_col).alias("_did"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("_tok"),
    )
    freq = tok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_n"))
    ordered = (
        tok.join(freq, "_tok")
        .groupBy("_did")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_n", "_tok"))),
                lambda s: s["_tok"],
            ).alias("_toks")
        )
        .withColumn("_l", F.size("_toks").cast("long"))
        .withColumn(
            "_p",
            F.col("_l")
            - F.floor((tnum * F.col("_l") + tden - 1) / tden).cast("long")
            + 1,
        )
    )
    pref = ordered.select(
        "_did",
        "_l",
        F.explode(F.slice("_toks", 1, F.greatest(F.col("_p"), F.lit(0)).cast("int"))).alias(
            "_tok"
        ),
    )
    a = pref.select(
        F.col("_did").alias("id1"), F.col("_l").alias("_l1"), "_tok"
    )
    b = pref.select(
        F.col("_did").alias("id2"), F.col("_l").alias("_l2"), "_tok"
    )
    cand = (
        a.join(b, "_tok")
        .filter(F.col("id1") < F.col("id2"))
        .filter(
            (tnum * F.col("_l1") <= tden * F.col("_l2"))
            & (tnum * F.col("_l2") <= tden * F.col("_l1"))
        )
        .select("id1", "id2")
        .dropDuplicates()
    )
    s1 = ordered.select(
        F.col("_did").alias("id1"), F.col("_toks").alias("_s1"), F.col("_l").alias("_l1")
    )
    s2 = ordered.select(
        F.col("_did").alias("id2"), F.col("_toks").alias("_s2"), F.col("_l").alias("_l2")
    )
    verified = (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "_inter", F.size(F.array_intersect("_s1", "_s2")).cast("long")
        )
        .withColumn("_union", F.col("_l1") + F.col("_l2") - F.col("_inter"))
        .filter(tden * F.col("_inter") >= tnum * F.col("_union"))
    )
    return verified.select(
        "id1",
        "id2",
        (F.col("_inter").cast("double") / F.col("_union").cast("double")).alias(
            "jaccard"
        ),
    )


def soft_dedup_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """SoftDeDup-style duplication-aware reweighting: instead of
    DELETING near-duplicates, every document keeps a training weight
    inversely proportional to its n-gram *commonness* — the mean
    corpus frequency of its k-gram multiset (She et al. 2024 reweight
    duplicated data down rather than dropping it; cf. the reference's
    hard delete in purge_documents.py — this is the soft twin).
    Verbatim-unique text has commonness 1 → weight 1; text whose grams
    appear in ~c documents gets weight ~1/c.

    Scale shape (all linear, never a pair join):
      1. one explode + (doc, gram) map-side combine,
      2. one gram-keyed count shuffle (Zipf-head grams are hot keys —
         AQE skew handling applies, same as any corpus term count),
      3. the frequency table joins back on gram — linear in distinct
         (doc, gram) pairs, both sides corpus-scale so a plain
         shuffle join, never a broadcast,
      4. one id-keyed aggregate: exact integer sums; commonness and
         weight are two IEEE double divisions of exact ints
         (bit-deterministic across engines).

    Documents shorter than k tokens carry no grams: commonness NULL,
    weight 1.0 (nothing to judge them on, so they train at full
    weight). Returns (id, n_grams, commonness, weight).

    Rejected variant (A/B'd ~1.5× faster at sf0.1): a count window
    over partitionBy(gram) folds steps 2-3 into one shuffle — but a
    window partition cannot split a key, so every occurrence of a
    Zipf-head gram lands on ONE task; at corpus scale that task is the
    straggler. The groupBy+join form keeps map-side combine and lets
    AQE skew-split the hot grams, so it is the shape that survives
    100 TB.
    """
    from datalake_etlscripts_spark.operators.text import ngrams

    g = df.select(F.col(id_col), F.explode(ngrams(F.col(text_col), k)).alias("_gram"))
    # freq is DERIVED from per_doc and joined back onto it — settle the
    # (doc, gram) table once (lazy: no job at plan-construction time)
    # so the explode+combine shuffle doesn't run twice
    per_doc = (
        g.groupBy(id_col, "_gram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )
    freq = per_doc.groupBy("_gram").agg(F.sum("_c").alias("_freq"))
    agg = (
        per_doc.join(freq, "_gram")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_grams"),
            F.sum(F.col("_c") * F.col("_freq")).alias("_mass"),
        )
    )
    commonness = F.col("_mass").cast("double") / F.col("n_grams")
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            commonness.alias("commonness"),
            F.coalesce(F.lit(1.0) / commonness, F.lit(1.0)).alias("weight"),
        )
    )


def incremental_embedding_lsh(
    index: DataFrame,
    existing_vecs: DataFrame,
    batch: DataFrame,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sig_bits: int = 16,
    band_bits: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Incremental embedding near-dup — the vector twin of
    incremental_minhash_dedup: ``index`` is the persisted
    (band, bucket, vec_id) table of everything ingested so far,
    ``existing_vecs`` the stored vectors (verification lookup),
    ``batch`` the new vectors. Only the BATCH is signatured; the
    corpus is probed through the index equi-join, so ingest cost is
    linear in batch size no matter how large the corpus grows.

    Candidates = batch×index probe ∪ batch×batch bands; exact-cosine
    verification touches only candidate ids (semi-join prunes the
    stored-vector lookup to the candidates' ids, not the corpus).
    Generates exactly the full-recompute pairs that touch the batch
    (same planes, same bands — equivalence property-tested).

    Returns (verified pairs touching the batch, new index rows to
    persist — append to ``index`` for the next batch).
    """
    from datalake_etlscripts_spark.operators.similarity import (
        _rh_signature,
        random_planes,
    )

    planes = random_planes(dim, sig_bits)
    n_bands = sig_bits // band_bits
    mask = (1 << band_bits) - 1
    sig = _rh_signature(F.col(vec_col), planes)
    batch_banded = batch.select(
        F.col(id_col).alias("_bid"),
        _unit(F.col(vec_col)).alias("_bv"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(sig, b * band_bits).bitwiseAND(F.lit(mask))
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    ).localCheckpoint(eager=False)

    probe = (
        batch_banded.join(
            index.select(F.col(id_col).alias("_eid"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("_bid", "_eid")
        .dropDuplicates()
    )
    ex_unit = existing_vecs.join(
        probe.select(F.col("_eid").alias(id_col)).dropDuplicates(), id_col, "left_semi"
    ).select(F.col(id_col).alias("_eid"), _unit(F.col(vec_col)).alias("_ev"))
    dot_be = F.aggregate(
        F.zip_with("_bv", "_ev", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    bu = batch_banded.select("_bid", "_bv").dropDuplicates(["_bid"])
    cross = (
        probe.join(bu, "_bid")
        .join(ex_unit, "_eid")
        .select(
            F.least("_bid", "_eid").alias("id_a"),
            F.greatest("_bid", "_eid").alias("id_b"),
            dot_be.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    l_ = batch_banded.select(
        F.col("_bid").alias("id_a"), F.col("_bv").alias("_va"), "band", "bucket"
    )
    r_ = batch_banded.select(
        F.col("_bid").alias("id_b"), F.col("_bv").alias("_vb"), "band", "bucket"
    )
    dot_bb = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    within = (
        l_.join(r_, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", dot_bb.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    pairs = cross.unionByName(within).dropDuplicates(["id_a", "id_b"])
    new_index = batch_banded.select(
        F.col("_bid").alias(id_col), "band", "bucket"
    )
    return pairs, new_index


def embedding_lsh_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sig_bits: int = 16,
    band_bits: int = 8,
) -> DataFrame:
    """Persistable (id, band, bucket) random-hyperplane LSH index rows
    for a vector corpus — the state table incremental_embedding_lsh
    probes. Same planes/banding as embedding_near_dup_lsh, so a
    full-recompute and an index-probe see identical candidates."""
    from datalake_etlscripts_spark.operators.similarity import (
        _rh_signature,
        random_planes,
    )

    planes = random_planes(dim, sig_bits)
    n_bands = sig_bits // band_bits
    mask = (1 << band_bits) - 1
    sig = _rh_signature(F.col(vec_col), planes)
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(sig, b * band_bits).bitwiseAND(F.lit(mask))
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    block_cols: tuple[str, ...] = ("lang",),
    length_bucket: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup: shingle containment |A∩B| / |A| — catches
    excerpts and quote-heavy pages that symmetric Jaccard misses (a
    200-token quote inside a 5000-token page has Jaccard ≈ 0.04 but
    containment ≈ 1.0 from the quote's side). Broder's containment
    measure beside the resemblance the other dedup ops use.

    Same blocked self-join shape as ngram_jaccard_pairs, but length
    blocking is OFF by default: an excerpt and its container sit in
    very different length buckets by nature, so bucketing would hide
    exactly the pairs this measure exists to find. Pass
    ``length_bucket`` to restore it for same-scale-page workloads; at
    corpus scale the lang-only block is wide — put a
    shared-rare-shingle candidate index in front (the AllPairs prefix
    machinery) before running this corpus-wide. Emits each qualifying
    DIRECTION: (id_contained, id_container, containment).
    """
    blocks = list(block_cols)
    sel = [
        F.col(id_col).alias("_did"),
        *[F.col(c) for c in block_cols],
        shingles(F.col(text_col), k).alias("_sh"),
    ]
    if length_bucket is not None:
        sel.insert(
            -1,
            (F.length(text_col) / F.lit(length_bucket)).cast("int").alias("_lb"),
        )
        blocks.append("_lb")
    # r07 (guide §2.3): the blocked ALL-PAIRS self-join materialized
    # every same-block doc pair with BOTH full shingle arrays and ran
    # array_intersect per pair — at sf0.1 that is 8M pairs × ~50-string
    # arrays for under 1M pairs that share any shingle at all. The
    # shared-shingle inverted index computes the same |A∩B|: explode
    # shingles, equi-join postings on (block, shingle), count per
    # ordered pair. Exactly equivalent for threshold > 0 — a pair with
    # containment ≥ t > 0 shares ≥ 1 shingle, so it appears in the
    # index join; zero-overlap and empty-A pairs fail the threshold in
    # both shapes (pairs sharing no shingle are never emitted, so
    # threshold ≤ 0 behaves like an infinitesimal positive one).
    # Join fan-out is Σ_shingle df² (df ≤ 15 at sf0.1 —
    # shingle df has no hot keys, unlike unigrams), ~8× below the
    # all-pairs row count and carrying 3 scalar columns instead of two
    # arrays.
    base = df.select(*sel).localCheckpoint(eager=False)  # postings + |A| lookup
    posts = base.select("_did", *blocks, F.explode("_sh").alias("_s"))
    a = posts.select(F.col("_did").alias("id_a"), *blocks, "_s")
    b = posts.select(F.col("_did").alias("id_b"), *blocks, "_s")
    inter = (
        a.join(b, [*blocks, "_s"])
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sizes = base.select(
        F.col("_did").alias("id_a"), F.size("_sh").cast("long").alias("_na")
    )
    cont = F.try_divide(F.col("_inter").cast("double"), F.col("_na"))
    return (
        inter.join(F.broadcast(sizes), "id_a")
        .select(
            F.col("id_a").alias("id_contained"),
            F.col("id_b").alias("id_container"),
            cont.alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
