"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen) — no Python in the hot
path; a 100 TB documents table never leaves Tungsten. Operators:

- tokenization (whitespace + BPE-ish regex token counting)
- quality scoring (length / punctuation / stopword / repetition)
- language ID (stopword-hit n-gram heuristic)
- document fingerprinting (md5 content hash + bag-of-words hash +
  rolling-shingle fingerprints)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the heuristic language ID
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "por", "con"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
}

BPE_ISH_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space split; filter empties)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_TOKEN_RE), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def detect_language(text: Column) -> Column:
    """Heuristic language ID: argmax stopword hits; deterministic
    tie-break on language code order; 'und' when no hits at all."""
    scored = F.array(
        *[
            F.struct(
                stopword_hits(text, lang).alias("hits"),
                # ties pick the alphabetically-first language: higher
                # rank for earlier languages wins under array_max
                F.lit(-i).alias("rank"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(sorted(STOPWORDS))
        ]
    )
    best = F.array_max(scored)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring features used for corpus filtering:
    n_chars, n_tokens, avg token length, punctuation count + ratio,
    distinct-token ratio (repetition detector), uppercase ratio."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_upper = F.size(F.regexp_extract_all(t, F.lit(r"[A-Z]"), 0))
    n_distinct = F.size(F.array_distinct(toks))
    # try_divide: empty / whitespace-only documents have undefined
    # ratios → NULL, not an ANSI divide-by-zero job abort (at corpus
    # scale empty docs are a certainty, and one row must never kill
    # the stage)
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            F.try_divide((n_chars - (n_tokens - 1)).cast("double"), n_tokens),
        )
        .withColumn("n_punct", n_punct)
        .withColumn("punct_ratio", F.try_divide(n_punct.cast("double"), n_chars))
        .withColumn("distinct_ratio", F.try_divide(n_distinct.cast("double"), n_tokens))
        .withColumn("upper_ratio", F.try_divide(n_upper.cast("double"), n_chars))
    )


def content_fingerprint(text: Column) -> Column:
    """Exact-content fingerprint (md5 hex)."""
    return F.md5(text)


def bow_fingerprint(text: Column) -> Column:
    """Bag-of-words fingerprint: md5 of the sorted distinct token set —
    catches token-order shuffles as duplicates."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def ngrams(text: Column, k: int = 3) -> Column:
    """All k-token grams in document order (duplicates kept).

    Built with zip_with over k shifted slices of the token array —
    NOT per-index element_at, which would re-evaluate the tokenizer
    expression for every element after projection collapse (measured
    ~10× slower on the dedup path)."""
    toks = tokens(text)
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))
    out = F.slice(toks, 1, m)
    for j in range(1, k):
        out = F.zip_with(
            out,
            F.slice(toks, 1 + j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return out


def shingles(text: Column, k: int = 3) -> Column:
    """k-token shingles (distinct), the unit for Jaccard/MinHash dedup."""
    return F.array_distinct(ngrams(text, k))


def _top_fraction(arr: Column) -> Column:
    """Fraction of array elements taken by the single most frequent
    element: sort, then ONE fold tracking the longest equal-run. The
    input expression is evaluated once — the previous distinct×filter
    form re-evaluated the whole upstream ngram pipeline per distinct
    element (measured 40s+ on the composed quality filter at bench
    scale vs <1s for this shape). Empty array → NULL fraction (not an
    ANSI divide-by-zero abort)."""
    s = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    best = F.aggregate(s, init, step, lambda acc: acc["best"])
    return F.try_divide(best.cast("double"), F.size(arr))


def repetition_features(
    df: DataFrame, text_col: str = "text", grams: tuple[int, ...] = (1, 2, 3)
) -> DataFrame:
    """Gopher-style repetition signals for corpus filtering (Rae et al.
    2021 §A1.1): fraction of tokens in the most common token / 2-gram /
    3-gram. High values flag boilerplate and degenerate generations.
    ``grams`` selects which orders to compute — the fold per order is
    the dominant per-row cost, so consumers that use one signal should
    ask for only that one (gopher_quality_filter uses (3,))."""
    t = F.col(text_col)
    names = {1: "top_token_frac", 2: "top_2gram_frac", 3: "top_3gram_frac"}
    out = df
    for k in grams:
        arr = tokens(t) if k == 1 else ngrams(t, k)
        out = out.withColumn(names[k], _top_fraction(arr))
    return out


# PII patterns chosen to be regex-dialect-portable (same semantics in
# Java regex and RE2): no backreferences, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{2} [0-9]{3} [0-9]{3} [0-9]{3}",
    "iban": r"[A-Z]{2}[0-9]{2}( [0-9]{4}){5}",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (emails / intl phones / IBANs)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder ('<EMAIL>',
    '<PHONE>', '<IBAN>'). Pure regexp_replace chain — JVM-side, the
    whole 100 TB corpus is redacted without leaving Tungsten."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def term_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary statistics: (term, doc_freq, total_tf).

    One explode + one shuffle on term; both aggregates are map-side
    combined (the distinct doc count runs as Spark's two-phase partial
    distinct). At 100 TB the term key space is Zipfian — the heavy
    head terms are exactly what AQE skew-split handles; nothing here
    collects to the driver."""
    ex = df.select(
        F.col(id_col).alias("_did"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    return ex.groupBy("term").agg(
        F.countDistinct("_did").alias("doc_freq"),
        F.count(F.lit(1)).alias("total_tf"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k terms by a log-free tf-idf score:
    (tf/doc_len) × (n_docs/doc_freq). The score is a product of two
    ratios of exact integers, so it is bit-identical across engines
    (no transcendental log whose last ULP differs per libm).

    Shape: explode once → per-(doc,term) counts (shuffle 1) → doc
    length as a window sum over the same partitioning (no extra join)
    → term-keyed join against the doc-frequency aggregate (shuffle 2)
    → per-doc top-k window (shuffle 3, partitioned by doc — never a
    global sort). n_docs rides a broadcast 1-row aggregate."""
    from pyspark.sql import Window as W

    ex = df.select(
        F.col(id_col).alias("_did"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    counts = ex.groupBy("_did", "term").agg(F.count(F.lit(1)).alias("tf"))
    counts = counts.withColumn(
        "doc_len", F.sum("tf").over(W.partitionBy("_did")).cast("bigint")
    )
    dfreq = ex.groupBy("term").agg(F.countDistinct("_did").alias("doc_freq"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        counts.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf").cast("double") / F.col("doc_len"))
            * (F.col("n_docs").cast("double") / F.col("doc_freq")),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("_did").orderBy(F.col("score").desc(), F.col("term"))
    )
    return (
        scored.withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .select(F.col("_did").alias(id_col), "term", "tf", "doc_freq", "score")
    )


def ngram_lm_counts(
    df: DataFrame, text_col: str = "text", max_order: int = 3
) -> DataFrame:
    """KenLM-style n-gram count tables for language-model training /
    perplexity filtering: (order, gram, count, n_left_contexts) for
    every order 1..max_order, where n_left_contexts is the
    Kneser-Ney continuation count N1+(·g) — the number of DISTINCT
    single-word left contexts the gram appears after (NULL at the top
    order, which has no (order+1) table to derive from).

    Scale shape: the corpus is scanned ONCE — every order's grams
    explode out of the same row (flatten of per-order transform
    arrays) into one (order, gram) shuffle. Continuation counts then
    derive from the COUNT TABLE, not the corpus: a distinct
    (k+1)-gram decomposes uniquely into (first word, k-gram suffix),
    so N1+(·g) is a count(*) per suffix over the order-k+1 rows —
    gram-table-sized work. Zipfian head grams are exactly what AQE
    skew-split handles."""
    tc = F.col(text_col)

    # NB: a factory, not a default-arg lambda — F.transform treats a
    # two-parameter lambda as (element, index)
    def _tagged(k: int):
        return F.transform(
            ngrams(tc, k),
            lambda g: F.struct(F.lit(k).cast("int").alias("order"), g.alias("gram")),
        )

    per_order = [_tagged(k) for k in range(1, max_order + 1)]
    counts = (
        df.select(F.explode(F.flatten(F.array(*per_order))).alias("x"))
        .select("x.order", "x.gram")
        .groupBy("order", "gram")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    # each distinct (k+1)-gram decomposes uniquely into (first word,
    # k-gram suffix), so row-count per suffix == distinct left contexts
    suffix = F.expr("substring(gram, length(substring_index(gram, ' ', 1)) + 2)")
    conts = (
        counts.filter(F.col("order") > 1)
        .select((F.col("order") - 1).alias("order"), suffix.alias("gram"))
        .groupBy("order", "gram")
        .agg(F.count(F.lit(1)).alias("n_left_contexts"))
    )
    return counts.join(conts, ["order", "gram"], "left").select(
        "order",
        "gram",
        "count",
        F.when(
            F.col("order") < max_order, F.coalesce("n_left_contexts", F.lit(0))
        ).alias("n_left_contexts"),
    )


def rare_token_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
) -> DataFrame:
    """Per-document rare-token quality signal: (doc_id, n_tokens,
    n_rare, rare_ratio) where a token is rare when its CORPUS
    frequency < min_count. High ratios flag OCR noise, mojibake and
    codey boilerplate; near-zero ratios flag templated text.

    Scale shape: the frequent set (count ≥ min_count) is the Zipf
    HEAD — vocabulary-head-sized, so it broadcasts; tokens mark
    rareness map-side against it (left join, no corpus shuffle on the
    term key beyond the head count itself) and one doc-keyed shuffle
    aggregates the ratio. Docs with no tokens keep NULL ratio."""
    ex = df.select(
        F.col(id_col).alias("_did"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    frequent = (
        ex.groupBy("term")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("term", F.lit(True).alias("_freq"))
    )
    per_doc = (
        ex.join(F.broadcast(frequent), "term", "left")
        .groupBy("_did")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_freq").isNull(), 1).otherwise(0)).alias("n_rare"),
        )
    )
    return (
        df.select(F.col(id_col).alias("_did"))
        .join(per_doc, "_did", "left")
        .select(
            F.col("_did").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_rare", F.lit(0)).alias("n_rare"),
            (F.col("n_rare").cast("double") / F.col("n_tokens")).alias("rare_ratio"),
        )
    )


def vocab_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic token dictionary: (term, token_id) with ids
    assigned by frequency rank (doc_freq desc, total_tf desc, term) —
    id 1 is the most document-frequent term, ties broken
    lexicographically so the mapping is stable across runs and
    engines. The ranking window runs over the VOCABULARY (Zipf: ~10 M
    rows at 100 TB — dictionary-sized, not corpus-sized); the corpus
    itself is touched only by term_stats' one explode + shuffle."""
    from pyspark.sql import Window as W

    stats = term_stats(df, text_col, id_col)
    rank = F.row_number().over(
        W.orderBy(F.desc("doc_freq"), F.desc("total_tf"), "term")
    )
    return stats.select("term", rank.alias("token_id"))


def encode_corpus(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents as token-id sequences against a dictionary:
    (doc_id, token_ids ARRAY<INT>) in original token order;
    out-of-vocabulary tokens map to 0. The dictionary side broadcasts
    (vocabulary ≪ corpus); order is restored by a per-doc sort of
    (position, id) after the join — one doc-keyed shuffle."""
    toks = df.select(
        F.col(id_col).alias("_did"),
        F.posexplode(tokens(F.col(text_col))).alias("_ord", "term"),
    )
    joined = toks.join(F.broadcast(vocab), "term", "left").select(
        "_did", "_ord", F.coalesce("token_id", F.lit(0)).alias("_tid")
    )
    return (
        joined.groupBy("_did")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_ord", "_tid"))),
                lambda s: s["_tid"],
            ).alias("token_ids")
        )
        .select(F.col("_did").alias(id_col), "token_ids")
    )


# Gopher-style quality rule bounds (Rae et al. 2021 §A1.1, adapted to
# the signals above and this corpus's short documents). Every rule is
# a pure expression over already-oracle-checked features, so the
# composed filter replays in any SQL engine.
GOPHER_RULES = {
    "tokens": "20 <= n_tokens <= 100000",
    "avg_token_len": "2 <= avg_token_len <= 12",
    "punct": "punct_ratio <= 0.3",
    "distinct": "distinct_ratio >= 0.3",
    "rep3": "top_3gram_frac <= 0.18",
}


def gopher_quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composed corpus filter: per-document keep/drop with the failed
    rule names. NULL signals (empty docs, too-short for 3-grams) fail
    their rule — a document the signal can't vouch for is dropped, and
    NULL never leaks into ``keep``. Per-row expressions only: no
    shuffle, scales embarrassingly."""
    feat = repetition_features(quality_features(df, text_col), text_col, grams=(3,))
    checks = {
        "tokens": (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 100000),
        "avg_token_len": (F.col("avg_token_len") >= 2.0)
        & (F.col("avg_token_len") <= 12.0),
        "punct": F.col("punct_ratio") <= 0.3,
        "distinct": F.col("distinct_ratio") >= 0.3,
        "rep3": F.col("top_3gram_frac") <= 0.18,
    }
    safe = {n: F.coalesce(c, F.lit(False)) for n, c in checks.items()}
    keep = F.lit(True)
    for c in safe.values():
        keep = keep & c
    n_failed = sum((~c).cast("int") for c in safe.values())
    reasons = F.concat_ws(
        ",", *[F.when(~c, F.lit(n)) for n, c in safe.items()]
    )
    id_cols = [c for c in df.columns if c != text_col]
    return feat.select(
        *id_cols,
        keep.alias("keep"),
        n_failed.cast("int").alias("n_failed"),
        reasons.alias("fail_reasons"),
    )


def hashed_linear_score(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    scheme: str = "md5",
) -> DataFrame:
    """Hashing-trick linear classifier score (the fastText/DCLM-style
    quality-classifier shape): each token hashes into one of
    ``len(weights)`` buckets and contributes that bucket's weight; the
    document score is the mean contribution (raw margin — no sigmoid:
    transcendentals are not bit-portable across engines, and
    thresholding the margin is equivalent). Real trained weights drop
    into the same operator; the registered query uses deterministic
    literal weights so an external engine replays the score.

    Shape notes: the weight table is projected ONCE as an array column
    and indexed with element_at per token — embedding the 256-literal
    array inside the fold lambda would re-build it per token (the
    expression-in-lambda pitfall). Pure per-row expressions, no
    shuffle, no UDF."""
    d = len(weights)
    if scheme == "md5":
        from datalake_etlscripts_spark.functions.scalar import md5_hash32

        def bucket(t: Column) -> Column:
            return (md5_hash32(t) % d).cast("int") + 1
    elif scheme == "xxhash64":
        def bucket(t: Column) -> Column:
            return (F.pmod(F.xxhash64(t), F.lit(d))).cast("int") + 1
    else:
        raise ValueError(f"unknown scheme {scheme!r}")

    out = df.withColumn("_w", F.array(*[F.lit(float(w)) for w in weights]))
    toks = tokens(F.col(text_col))
    contrib = F.transform(toks, lambda t: F.element_at(F.col("_w"), bucket(t)))
    total = F.aggregate(contrib, F.lit(0.0), lambda acc, x: acc + x)
    score = F.try_divide(total, F.size(toks))
    return out.withColumn("quality_score", score).drop("_w")


def lm_avg_prob_score(
    df: DataFrame,
    lm_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Language-model fluency score: the mean MLE bigram probability
    p(w|ctx) = c(ctx w)/c(ctx) of the document's bigrams under an
    ngram_lm_counts table — the classic model-based quality filter
    (train counts on the corpus, score each document against them).
    Rational per-gram probabilities (no log — not bit-portable); the
    per-document mean folds the probabilities IN POSITION ORDER over a
    collected array, so the double sum is deterministic under any
    partitioning (same policy as the cosine folds).

    OOV semantics: a bigram absent from the table (or with an unseen
    context) contributes probability 0 — gibberish LOWERS the score;
    n_bigrams counts ALL of the document's bigrams, matched or not.
    (Self-scoring a corpus against its own counts has no OOV, but the
    operator's contract covers held-out count tables.)

    Shape: bigram explode → a shuffle join against the bigram counts
    (corpus-vocabulary-sized — NOT force-broadcast; AQE may still
    choose broadcast when it fits) + a broadcast join against the
    dictionary-sized unigram counts → one doc-keyed shuffle for the
    ordered fold. Returns (id, n_bigrams, lm_score); documents with no
    bigrams score NULL."""
    c2 = lm_counts.filter(F.col("order") == 2).select(
        F.col("gram"), F.col("count").alias("_c2")
    )
    c1 = lm_counts.filter(F.col("order") == 1).select(
        F.col("gram").alias("_ctx"), F.col("count").alias("_c1")
    )
    grams = df.select(
        F.col(id_col),
        F.posexplode(ngrams(F.col(text_col), 2)).alias("_pos", "gram"),
    ).withColumn("_ctx", F.substring_index(F.col("gram"), " ", 1))
    scored = (
        grams.join(c2, "gram", "left")
        .join(F.broadcast(c1), "_ctx", "left")
        .select(
            id_col,
            "_pos",
            F.coalesce(
                F.col("_c2").cast("double") / F.col("_c1"), F.lit(0.0)
            ).alias("_p"),
        )
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_p"))),
                lambda s: s["_p"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_total"),
    )
    out = per.select(
        id_col,
        "n_bigrams",
        F.try_divide(F.col("_total"), F.col("n_bigrams")).alias("lm_score"),
    )
    ids = df.select(id_col)
    return ids.join(out, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "lm_score",
    )


def boilerplate_prefixes(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    k: int = 5,
    min_frac: float = 0.05,
) -> DataFrame:
    """Per-source boilerplate header detection: the k-token document
    PREFIX shared by at least ``min_frac`` of a source's documents —
    the crawl-template signal that drives prefix-strip cleanup
    (RefinedWeb-style per-domain boilerplate removal). One
    (source, prefix) shuffle + a broadcast-sized per-source total.
    Returns (source, prefix, n_docs, frac) ordered facts."""
    prefix = F.array_join(F.slice(tokens(F.col(text_col)), 1, k), " ")
    heads = df.select(F.col(source_col).alias("source"), prefix.alias("prefix"))
    counts = heads.groupBy("source", "prefix").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # totals fold out of the (tiny) counts table — summing n_docs per
    # source equals counting heads, without re-scanning/re-tokenizing
    # the corpus a second time
    totals = counts.groupBy("source").agg(F.sum("n_docs").alias("_t"))
    return (
        counts.join(F.broadcast(totals), "source")
        .select(
            "source",
            "prefix",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("_t")).alias("frac"),
        )
        .filter(F.col("frac") >= min_frac)
    )


def phrase_matches(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional-index phrase search: find documents containing the
    exact token sequence ``phrase``. The classic IR shape — build the
    positional postings (doc, pos, token) via ONE posexplode, keep only
    postings of the phrase's terms (the inverted-index prune: at scale
    this is a tiny fraction of the corpus), then intersect postings by
    equi-join on (doc, aligned start position) — term i must appear at
    start+i, so its postings join with pos−i = start. No self-join of
    the corpus, no regex over text; shuffle volume is the pruned
    postings only. The pruned postings are MATERIALIZED once
    (localCheckpoint) before the per-term joins — each join side is
    otherwise a separate full tokenize+posexplode scan of the corpus
    (Catalyst does not share the subplan across self-join arms), which
    would multiply the dominant cost by phrase length. Returns
    (doc_id, n_matches, first_pos), positions 0-based."""
    if not phrase:
        raise ValueError("phrase must have at least one token")
    toks = (
        df.select(
            F.col(id_col).alias("_did"),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
        )
        .filter(F.col("tok").isin(list(dict.fromkeys(phrase))))
        .localCheckpoint()
    )
    cur = toks.filter(F.col("tok") == phrase[0]).select(
        "_did", F.col("pos").alias("start")
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = toks.filter(F.col("tok") == term).select(
            "_did", (F.col("pos") - F.lit(i)).alias("start")
        )
        cur = cur.join(nxt, ["_did", "start"])
    return cur.groupBy("_did").agg(
        F.count(F.lit(1)).alias("n_matches"), F.min("start").alias("first_pos")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """BM25-shaped ranked retrieval for a fixed term query, in EXACT
    integer arithmetic (k1 = 6/5, b = 3/4). The idf is the log-free
    Robertson ratio (2N − 2df + 1)/(2df + 1) — same monotonicity and
    saturation behaviour as BM25's ln(idf), but every per-term score
    is one division of two exact int64 products, so any engine replays
    it bit-for-bit (the same policy as the log-free tfidf score; ln()
    is not bit-portable across libm builds). Per-document score =
    fold of the per-term doubles in TERM ORDER — deterministic under
    any partitioning.

    Scale shape: one token explode filtered to the |q| query terms
    (map-side — hit rows ≪ corpus), a |q|-row broadcast df dim, a
    1-row broadcast (N, L) stats dim, one doc-keyed aggregate, and a
    TakeOrdered top-k. The corpus is never shuffled full-width.
    Int64 headroom: products stay < 2^63 for corpora up to ~10^7 docs
    × 10^9 total tokens; beyond that, swap the exact ints for doubles
    (audit path stays at test scale). Returns (id, n_hit, score) for
    the top-k matching documents (ties broken by id).
    """
    toks = tokens(F.col(text_col))
    dl = df.select(F.col(id_col), F.size(toks).cast("long").alias("_dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_dl").alias("_l")
    )
    # filter INSIDE the array before exploding: the explode output is
    # |hits|, not |tokens| — at corpus scale the generator never
    # materializes the non-matching tokens as rows
    hit_arr = F.filter(toks, lambda t: t.isin(list(query_terms)))
    hits = (
        df.select(F.col(id_col), hit_arr.alias("_ha"))
        .filter(F.size("_ha") > 0)
        .select(id_col, F.explode("_ha").alias("_t"))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dft = hits.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    sc = (
        hits.join(F.broadcast(dft), "_t")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("_t"),
            (
                (
                    (2 * F.col("_n") - 2 * F.col("_df") + 1)
                    * 22
                    * F.col("_tf")
                    * F.col("_l")
                ).cast("double")
                / (
                    (2 * F.col("_df") + 1)
                    * (
                        10 * F.col("_tf") * F.col("_l")
                        + 3 * F.col("_l")
                        + 9 * F.col("_dl") * F.col("_n")
                    )
                ).cast("double")
            ).alias("_sc"),
        )
    )
    agg = sc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_t", "_sc"))),
                lambda s: s["_sc"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    return agg.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def query_likelihood_topk(
    df: DataFrame,
    query_terms: list[str],
    mu: int = 2000,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Query-likelihood ranked retrieval with Dirichlet smoothing
    (Zhai & Lafferty), the language-modelling counterpart of
    bm25_topk and under the same exactness policy: the per-term
    probability (tf·C + µ·cf) / ((|d|+µ)·C) is ONE double division of
    two exact int64 products, and the per-document score is the
    PRODUCT of the per-term doubles folded in term order — the
    monotone equivalent of the usual Σ log p without ln()'s libm
    portability hazard. Candidate docs are those containing ≥1 query
    term (declared semantics: zero-hit docs are not ranked), each
    joined against the |q|-row broadcast (term, cf) dim so missing
    terms still contribute their smoothed background mass.

    Scale shape mirrors bm25_topk: one token explode filtered to the
    query terms (map-side), broadcast |q|-row cf dim + 1-row C dim,
    one doc-keyed aggregate, TakeOrdered top-k — the corpus is never
    shuffled full-width. Int64 headroom: tf·C and (|d|+µ)·C stay
    < 2^63 for corpora up to ~10^9 total tokens × 10^3 tf; beyond
    that swap the exact ints for doubles (audit path stays at test
    scale). Returns (id, n_hit, score) for the top-k, ties by id."""
    toks = tokens(F.col(text_col))
    dl = df.select(F.col(id_col), F.size(toks).cast("long").alias("_dl"))
    stats = dl.agg(F.sum("_dl").cast("long").alias("_c"))
    # same filter-inside-the-array shape as bm25_topk: explode |hits|,
    # never |tokens|
    tok = (
        df.select(
            F.col(id_col),
            F.filter(toks, lambda t: t.isin(list(query_terms))).alias("_ha"),
        )
        .filter(F.size("_ha") > 0)
        .select(id_col, F.explode("_ha").alias("_t"))
    )
    cf = tok.groupBy("_t").agg(F.count(F.lit(1)).cast("long").alias("_cf"))
    hits = tok.groupBy(id_col, "_t").agg(
        F.count(F.lit(1)).cast("long").alias("_tf")
    )
    cand = hits.select(id_col).distinct()
    sc = (
        cand.crossJoin(F.broadcast(cf))
        .join(hits, [id_col, "_t"], "left")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("_t"),
            F.coalesce("_tf", F.lit(0)).alias("_tf0"),
            (
                (
                    F.coalesce("_tf", F.lit(0)) * F.col("_c")
                    + mu * F.col("_cf")
                ).cast("double")
                / ((F.col("_dl") + mu) * F.col("_c")).cast("double")
            ).alias("_sc"),
        )
    )
    agg = sc.groupBy(id_col).agg(
        F.sum(F.when(F.col("_tf0") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_hit"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_t", "_sc"))),
                lambda s: s["_sc"],
            ),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ).alias("score"),
    )
    return agg.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def corpus_data_card(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus data card: doc/token counts, mean + exact
    p50/p95 token lengths, exact vocabulary, type-token ratio — shared
    by the corpus_stats query and the `stats` CLI so the metrics can
    never diverge. Two scans: one doc-level aggregate, one token
    explode for the distinct count. Empty corpora yield a row of
    0 counts and NULL distribution stats."""
    toks = tokens(F.col(text_col))
    dl = df.select(F.size(toks).cast("long").alias("_dl"), toks.alias("_tk"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("_dl"), F.lit(0)).alias("total_tokens"),
        F.try_divide(F.sum("_dl").cast("double"), F.count(F.lit(1))).alias("mean_len"),
        F.expr("percentile(_dl, 0.5)").alias("p50_len"),
        F.expr("percentile(_dl, 0.95)").alias("p95_len"),
    )
    vocab = (
        dl.select(F.explode("_tk").alias("_t"))
        .agg(F.count_distinct("_t").alias("vocab_size"))
    )
    return stats.crossJoin(F.broadcast(vocab)).select(
        "n_docs",
        "total_tokens",
        "mean_len",
        "p50_len",
        "p95_len",
        "vocab_size",
        F.try_divide(
            F.col("vocab_size").cast("double"), F.col("total_tokens").cast("double")
        ).alias("type_token_ratio"),
    )


def normalize_text(text: Column) -> Column:
    """Pre-tokenization canonicalization (the NFKC-lite pass every web
    pipeline runs before fingerprinting — without it, curly-quote /
    NBSP / case variants of the same sentence defeat exact dedup):
    unify unicode punctuation (curly quotes, dashes, ellipsis, NBSP),
    strip the Spanish accent set (ntp_utils.py:43-49 semantics, same
    table as sanitize_field_name), lowercase, collapse whitespace
    runs, trim. Pure per-row expressions — rides the scan, no shuffle,
    no regex beyond one whitespace collapse."""
    t = F.translate(
        text,
        "‘’“”–— "  # ‘ ’ “ ” – — nbsp
        "áéíóúüñÁÉÍÓÚÜÑ",
        "''\"\"--" + " " + "aeiouunAEIOUUN",
    )
    t = F.replace(t, F.lit("…"), F.lit("..."))
    t = F.lower(t)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def blocklist_term_filter(
    df: DataFrame,
    terms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style "bad words" document filter: a document is dropped when
    ANY of its tokens appears in the blocklist (Raffel et al. 2020 §2.2
    drop pages with any word on the badwords list). ``terms`` is a
    one-column DataFrame ('term') — a TABLE, not a regex union: at
    thousands of patterns the scale path is an explode + broadcast
    semi/inner join per token, which stays JVM-side and linear, where a
    mega-regex is quadratic in pattern count to compile and match.

    Appends (n_blocked BIGINT, keep BOOLEAN). Exact token equality —
    substring variants belong in url_quality_filter's occurrence
    scorer; normalize_text upstream catches case/accents variants."""
    hits = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .join(F.broadcast(terms.select("term")), "term")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_blocked"))
    )
    return (
        df.join(hits, id_col, "left")
        .withColumn("n_blocked", F.coalesce("n_blocked", F.lit(0)))
        .withColumn("keep", F.col("n_blocked") == 0)
    )


def perceptron_train(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    rounds: int = 3,
) -> DataFrame:
    """Train a hashing-trick linear quality filter IN the engine: a
    distributed batch perceptron over hashed bag-of-words features
    (plus a bias feature), the trainable twin of hashed_linear_score.
    Labels are ±1 (``label`` column expression). Per round, every
    misclassified doc (y·score ≤ 0) adds y·x to the weights — pure
    64-bit INTEGER arithmetic end to end, so training is deterministic
    under any partitioning and an external engine replays the exact
    weight trajectory (no learning-rate floats, no sigmoid).

    Scale shape: the (doc, bucket, n) feature table settles once
    (localCheckpoint) and is re-read each round; a round is one
    broadcast join against the ≤ n_buckets+1 weight rows + two
    map-side-combined aggregates; only the dictionary-sized per-bucket
    delta reaches the driver (the bpe_train / unigram_train handoff
    convention). Returns (bucket, weight) after ``rounds`` — bucket -1
    is the bias."""
    from datalake_etlscripts_spark.functions.scalar import md5_hash32

    spark = df.sparkSession
    docs = df.select(F.col(id_col), label.alias("_y"), F.col(text_col))
    feats = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t"))
        .select(F.col(id_col), (md5_hash32(F.col("_t")) % n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .unionByName(
            docs.select(
                F.col(id_col),
                F.lit(-1).cast("bigint").alias("bucket"),
                F.lit(1).cast("bigint").alias("_n"),
            )
        )
        .localCheckpoint()
    )
    labels = docs.select(id_col, "_y").localCheckpoint()
    w = {b: 0 for b in range(-1, n_buckets)}
    for _ in range(rounds):
        wdf = spark.createDataFrame(
            sorted(w.items()), "bucket bigint, _w bigint"
        )
        sc = (
            feats.join(F.broadcast(wdf), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("_n") * F.col("_w")).alias("_sc"))
        )
        mis = labels.join(sc, id_col).filter(
            F.col("_y") * F.col("_sc") <= 0
        )
        delta = (
            feats.join(mis.select(id_col, "_y"), id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("_y") * F.col("_n")).alias("_d"))
            .collect()
        )
        for r in delta:
            w[r["bucket"]] += r["_d"]
    return spark.createDataFrame(
        sorted(w.items()), "bucket bigint, weight bigint"
    )


def chi2_term_label(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    min_df: int = 3,
    top_k: int = 50,
) -> DataFrame:
    """Chi-square feature selection: rank vocabulary terms by how
    strongly document-level PRESENCE associates with a binary label —
    the classic filter for pruning a hashed-classifier vocabulary
    (fastText-style quality/domain filters) before training.

    Per term the 2x2 contingency table (a = pos docs containing it,
    b = neg docs containing it, c/d = the complements) gives

        chi2 = N * (a*d - b*c)^2 / ((a+b)(c+d)(a+c)(b+d))

    Scale + portability shape: one corpus scan -> distinct-terms
    explode -> one term-keyed shuffle; the two class totals are a
    1-row broadcast. All counts and the cross-product delta are exact
    integers (delta in DECIMAL to survive a*d at web-corpus N); chi2
    itself is doubles multiplied/divided in ONE fixed parenthesization
    both engines replay bit-for-bit. Top-k is TakeOrdered (no global
    sort), ties broken by term.
    """
    base = df.select(label.cast("int").alias("_y"), F.col(text_col).alias("_t"))
    totals = base.agg(
        F.sum("_y").cast("long").alias("_npos"),
        F.sum(1 - F.col("_y")).cast("long").alias("_nneg"),
    )
    per_term = (
        base.select(
            "_y", F.explode(F.array_distinct(tokens(F.col("_t")))).alias("term")
        )
        .groupBy("term")
        .agg(
            F.sum("_y").cast("long").alias("df_pos"),
            F.sum(1 - F.col("_y")).cast("long").alias("df_neg"),
        )
    )
    j = per_term.crossJoin(F.broadcast(totals))
    dec = "decimal(19,0)"
    a, b = F.col("df_pos"), F.col("df_neg")
    c = (F.col("_npos") - a).alias("_c")
    d = (F.col("_nneg") - b).alias("_d")
    j = j.withColumn("_c", c).withColumn("_d", d)
    delta = (
        a.cast(dec) * F.col("_d").cast(dec) - b.cast(dec) * F.col("_c").cast(dec)
    )
    n = (F.col("_npos") + F.col("_nneg")).alias("_n")
    df_q = (a + b).alias("_df")
    j = j.withColumn("_delta", delta).withColumn("_n", n).withColumn("_df", df_q)
    delta_d = F.col("_delta").cast("string").cast("double")
    chi2 = (F.col("_n").cast("double") * delta_d * delta_d) / (
        (F.col("_df").cast("double") * (F.col("_n") - F.col("_df")).cast("double"))
        * (F.col("_npos").cast("double") * F.col("_nneg").cast("double"))
    )
    return (
        j.filter((F.col("_df") >= min_df) & (F.col("_n") - F.col("_df") > 0))
        .select("term", "df_pos", "df_neg", chi2.alias("chi2"))
        .orderBy(F.col("chi2").desc(), F.col("term").asc())
        .limit(top_k)
    )


def boolean_retrieval(
    df: DataFrame,
    must: list[str],
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boolean inverted-index retrieval (AND / OR / NOT): documents
    containing ALL ``must`` terms and NONE of ``must_not``, scored by
    how many ``should`` terms they also hit. The postings list is
    pruned to the query's terms BEFORE any shuffle, so downstream work
    is (query terms × matching docs)-sized — in production the
    postings table is persisted once (the phrase_search index) and
    this operator only runs the three keyed reductions. AND is a
    distinct-term count reaching |must|, NOT a left-anti join,
    OR/scoring a left join — no corpus self-joins anywhere."""
    should = should or []
    must_not = must_not or []
    all_terms = [*must, *should, *must_not]
    post = (
        df.select(
            F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term")
        )
        .filter(F.col("term").isin(all_terms))
    )
    cand = (
        post.filter(F.col("term").isin(must))
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("term")).alias("_nm"))
        .filter(F.col("_nm") == len(must))
        .select(id_col)
    )
    if must_not:
        nn = post.filter(F.col("term").isin(must_not)).select(id_col).distinct()
        cand = cand.join(nn, id_col, "left_anti")
    sh = (
        post.filter(F.col("term").isin(should))
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("term")).alias("n_should"))
        if should
        else None
    )
    if sh is not None:
        out = cand.join(sh, id_col, "left").select(
            id_col, F.coalesce(F.col("n_should"), F.lit(0)).cast("long").alias("n_should")
        )
    else:
        out = cand.select(id_col, F.lit(0).cast("long").alias("n_should"))
    return out


def source_token_entropy(
    df: DataFrame, key_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Shannon entropy of each source's unigram distribution — the
    diversity signal that separates template/boilerplate-heavy crawl
    sources (low H) from genuinely varied text before mixing weights
    are chosen. Exact-integer decomposition:

        H = ln N − (Σ_t c_t · ln c_t) / N
          = (N·lnμ(N) − Σ c·lnμ(c)) / (N · 1e6)

    with lnμ = micro-nat ln over the DISTINCT count values only
    (Zipf counts repeat massively — the lookup table is tiny), built
    driver-side and broadcast (the DSIR/PSI ln-portability pattern;
    same-host libm is the documented boundary). One term-keyed
    shuffle + one source-keyed reduce; the numerator is an exact
    BIGINT, one double division per source. Returns (key, n_tokens,
    n_types, entropy_nats)."""
    import math

    tok = df.select(
        F.col(key_col).alias("_k"), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    c = tok.groupBy("_k", "_t").agg(F.count(F.lit(1)).alias("_c"))
    t = c.groupBy("_k").agg(
        F.sum("_c").cast("long").alias("_n"),
        F.count(F.lit(1)).alias("_types"),
    )
    args = sorted(
        {r["v"] for r in c.select(F.col("_c").alias("v")).distinct().collect()}
        | {r["v"] for r in t.select(F.col("_n").alias("v")).distinct().collect()}
    )
    spark = df.sparkSession
    lt = spark.createDataFrame(
        [(a, int(math.floor(math.log(a) * 1_000_000 + 0.5))) for a in args],
        "arg bigint, lnm bigint",
    )
    s = (
        c.join(F.broadcast(lt), c["_c"] == lt["arg"])
        .groupBy("_k")
        .agg(F.sum(F.col("_c") * F.col("lnm")).alias("_s"))
    )
    out = (
        t.join(s, "_k")
        .join(F.broadcast(lt.withColumnRenamed("lnm", "_lnn")), t["_n"] == lt["arg"])
        .drop("arg")
    )
    ent = (
        (F.col("_n") * F.col("_lnn") - F.col("_s")).cast("string").cast("double")
        / (F.col("_n").cast("double") * F.lit(1_000_000.0))
    )
    return out.select(
        F.col("_k").alias(key_col),
        F.col("_n").alias("n_tokens"),
        F.col("_types").cast("long").alias("n_types"),
        ent.alias("entropy_nats"),
    )


def mmr_rerank(
    cands: DataFrame,
    postings: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    score_col: str = "score",
    lam: float = 0.7,
    mu: float = 0.3,
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein) —
    the diversity stage a RAG stack runs AFTER retrieval: greedily pick
    the candidate maximizing ``lam·rel − (1−lam)·max_sim(selected)``
    where similarity is exact token-set Jaccard. ``cands`` is the
    retrieval top-N (id, score) — N is small by contract (the
    retriever already cut to top-N), so the k unrolled greedy rounds
    join candidate-sized tables only; ``postings`` is (id, tok)
    DISTINCT, pruned to the candidates before any shuffle. Every
    Jaccard is one division of exact ints, the greedy argmax breaks
    ties (mmr desc, id asc), and missing pairs coalesce to similarity
    0 — fully deterministic cross-engine. Returns (rank, id, score,
    mmr)."""
    from pyspark.sql import Window

    # lam and mu are SEPARATE literals on purpose: 1.0 - 0.7 in IEEE754
    # is 0.30000000000000004, one ulp off the SQL literal 0.3 an
    # external oracle would write.
    sz = postings.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("_sz"))
    first = (
        cands.withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.desc(score_col), F.asc(id_col))
            ),
        )
        .filter(F.col("_rk") == 1)
        .select(
            F.lit(1).cast("long").alias("rank"),
            id_col,
            score_col,
            (
                F.lit(lam) * F.col(score_col) - F.lit(mu) * F.lit(0.0)
            ).alias("mmr"),
        )
    )
    out = first
    sel = first.select(id_col)
    for t in range(2, k + 1):
        rem = cands.join(sel, id_col, "left_anti")
        pa = postings.join(
            F.broadcast(rem.select(id_col)), id_col, "left_semi"
        ).select(F.col(id_col).alias("_a"), "tok")
        pb = postings.join(F.broadcast(sel), id_col, "left_semi").select(
            F.col(id_col).alias("_b"), "tok"
        )
        inter = (
            pa.join(pb, "tok")
            .groupBy("_a", "_b")
            .agg(F.count(F.lit(1)).cast("long").alias("_i"))
        )
        ms = (
            inter.join(sz.select(F.col(id_col).alias("_a"), F.col("_sz").alias("_za")), "_a")
            .join(sz.select(F.col(id_col).alias("_b"), F.col("_sz").alias("_zb")), "_b")
            .groupBy("_a")
            .agg(
                F.max(
                    F.col("_i").cast("double")
                    / (F.col("_za") + F.col("_zb") - F.col("_i")).cast("double")
                ).alias("_maxsim")
            )
        )
        scored = rem.join(
            ms, rem[id_col] == ms["_a"], "left"
        ).select(
            id_col,
            score_col,
            (
                F.lit(lam) * F.col(score_col)
                - F.lit(mu) * F.coalesce(F.col("_maxsim"), F.lit(0.0))
            ).alias("mmr"),
        )
        pick = (
            scored.withColumn(
                "_rk",
                F.row_number().over(Window.orderBy(F.desc("mmr"), F.asc(id_col))),
            )
            .filter(F.col("_rk") == 1)
            .select(F.lit(t).cast("long").alias("rank"), id_col, score_col, "mmr")
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(pick)
        sel = sel.unionByName(pick.select(id_col))
    return out


def flesch_readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    feature beside the Gopher/fluency quality scores: 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words), with syllables
    approximated as maximal vowel runs (the standard cheap heuristic)
    and sentences as terminal-punctuation runs floored at 1. All three
    counts are exact integers from per-row JVM expressions (no
    shuffle, no UDF); the score is two divisions + fixed literals, so
    an external engine reproduces it bit-for-bit. Zero-word docs
    return NULL. Returns (id, n_words, n_sentences, n_syllables,
    flesch)."""
    words = F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
    syll = F.size(
        F.expr(f"regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)")
    )
    sent = F.greatest(
        F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")),
        F.lit(1),
    )
    out = df.select(
        id_col,
        words.cast("long").alias("n_words"),
        sent.cast("long").alias("n_sentences"),
        syll.cast("long").alias("n_syllables"),
    )
    w = F.col("n_words").cast("double")
    return out.withColumn(
        "flesch",
        F.when(
            F.col("n_words") > 0,
            F.lit(206.835)
            - F.lit(1.015) * (w / F.col("n_sentences").cast("double"))
            - F.lit(84.6) * (F.col("n_syllables").cast("double") / w),
        ),
    )


def rocchio_prf_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k_feedback: int = 3,
    k_expansion: int = 5,
    min_term_len: int = 3,
    k: int = 10,
) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio's query expansion,
    the classic two-pass trick): BM25 rank the original query, assume
    the top ``k_feedback`` docs are relevant, mine their
    ``k_expansion`` most characteristic terms (feedback term frequency
    × the log-free Robertson rarity ratio, one double division per
    term, ties on term text), and re-score the corpus with the
    expanded term set at uniform weight (β=1 — documented
    simplification of Rocchio's weighted centroid).

    Scale shape: ONE corpus token explode feeds both passes (settled
    with a lazy checkpoint); every per-term dim (feedback hits,
    document frequencies, the expanded term set) is query-sized and
    broadcast; per-doc scores fold per-term doubles in TERM ORDER so
    the result is partitioning-independent. Returns (id, n_hit,
    score) for the top-k under the expanded query."""
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    tok = df.select(
        F.col(id_col), F.explode(toks).alias("_t")
    ).localCheckpoint(eager=False)
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("_dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_dl").cast("long").alias("_l"),
    )

    def score_terms(hits):
        dft = hits.groupBy("_t").agg(F.count(F.lit(1)).cast("long").alias("_df"))
        return (
            hits.join(F.broadcast(dft), "_t")
            .join(dl, id_col)
            .crossJoin(F.broadcast(stats))
            .select(
                F.col(id_col),
                "_t",
                (
                    (
                        (2 * F.col("_n") - 2 * F.col("_df") + 1)
                        * 22
                        * F.col("_tf")
                        * F.col("_l")
                    ).cast("double")
                    / (
                        (2 * F.col("_df") + 1)
                        * (
                            10 * F.col("_tf") * F.col("_l")
                            + 3 * F.col("_l")
                            + 9 * F.col("_dl") * F.col("_n")
                        )
                    ).cast("double")
                ).alias("_sc"),
            )
        )

    def fold_scores(sc):
        return sc.groupBy(id_col).agg(
            F.count(F.lit(1)).cast("long").alias("n_hit"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_t", "_sc"))),
                    lambda s: s["_sc"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score"),
        )

    hits0 = (
        tok.filter(F.col("_t").isin(list(query_terms)))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_tf"))
    )
    fb = (
        fold_scores(score_terms(hits0))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k_feedback)
        .select(id_col)
    )
    cand = (
        tok.join(F.broadcast(fb), id_col, "left_semi")
        .filter(
            (F.length("_t") >= min_term_len)
            & ~F.col("_t").isin(list(query_terms))
        )
        .groupBy("_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_fbtf"))
    )
    cdf = (
        tok.join(F.broadcast(cand.select("_t")), "_t", "left_semi")
        .select("_t", id_col)
        .distinct()
        .groupBy("_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
    )
    exp = (
        cand.join(cdf, "_t")
        .crossJoin(F.broadcast(stats))
        .select(
            "_t",
            (
                (F.col("_fbtf") * (2 * F.col("_n") - 2 * F.col("_df") + 1)).cast(
                    "double"
                )
                / (2 * F.col("_df") + 1).cast("double")
            ).alias("_es"),
        )
        .withColumn(
            "_rk",
            F.row_number().over(Window.orderBy(F.desc("_es"), F.asc("_t"))),
        )
        .filter(F.col("_rk") <= k_expansion)
        .select("_t")
    )
    terms = exp.unionByName(
        df.sparkSession.createDataFrame([(t,) for t in query_terms], "_t string")
    ).localCheckpoint(eager=False)
    hits1 = (
        tok.join(F.broadcast(terms), "_t")
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_tf"))
    )
    return (
        fold_scores(score_terms(hits1))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
