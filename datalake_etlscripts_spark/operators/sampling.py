"""Deterministic sampling and sequence packing for training-data
pipelines.

Random `df.sample()` is useless at 100 TB: it is non-reproducible
across retries, speculative tasks, and engine versions, and a re-run
silently changes the corpus. Everything here keys off a content hash
(md5 of the stable id) instead:

  hash_sample        keep rows whose hex hash sorts below a threshold
                     prefix — the same rows forever, on any engine,
                     with no RNG state and no shuffle (pure filter,
                     fully pushed down next to the scan)
  train_test_split   disjoint, exhaustive split from the same hash —
                     membership is a property of the ROW, so late-
                     arriving data lands in a stable bucket
  stratified_hash_sample
                     per-stratum thresholds (e.g. downsample the
                     dominant language) via a broadcast threshold dim
  pack_sequences     GPT-style packing: concatenate documents in a
                     deterministic order and chunk the token stream
                     every `capacity` tokens; a document belongs to
                     the bin where it starts. One window cumsum per
                     partition — no stateful loop.

Reference scope note: the reference repo samples nothing (full-scan
batch ETL, read_parquet.py:85); these are the beyond-reference
operators the engine adds for LLM-corpus work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _hex_key(key: Column) -> Column:
    """Lowercase md5 hex of the stringified key — identical in Spark
    and DuckDB, so oracle queries can replay the exact membership."""
    return F.md5(key.cast("string"))


def hash_sample(df: DataFrame, key_col: str, threshold_hex: str) -> DataFrame:
    """Deterministic ~(int(threshold,16)/16^len) sample: rows where
    md5(key) < threshold_hex. '1a' ≈ 10.2%, '0d' ≈ 5.1%."""
    return df.filter(_hex_key(F.col(key_col)) < F.lit(threshold_hex))


def train_test_split(
    df: DataFrame, key_col: str, test_threshold_hex: str = "1a"
) -> DataFrame:
    """Adds a `split` column: 'test' below the hash threshold, 'train'
    otherwise. Disjoint and exhaustive by construction."""
    return df.withColumn(
        "split",
        F.when(_hex_key(F.col(key_col)) < F.lit(test_threshold_hex), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    thresholds: dict[str, str],
    default_threshold_hex: str = "00",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps rows
    under its own hex threshold (strata absent from the map use the
    default — '00' drops them). The thresholds ride a broadcast join,
    so the plan is scan → broadcast hash join → filter: no shuffle of
    the fact side."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(k, v) for k, v in thresholds.items()], [stratum_col, "_thr"]
    )
    return (
        df.join(F.broadcast(dim), stratum_col, "left")
        .withColumn("_thr", F.coalesce("_thr", F.lit(default_threshold_hex)))
        .filter(_hex_key(F.col(key_col)) < F.col("_thr"))
        .drop("_thr")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    capacity: int,
    order_col: str,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each document to a training-sequence bin: documents are
    concatenated in (partition_cols, order_col) order and the token
    stream is chunked every `capacity` tokens; a document's bin is
    where its first token lands. Adds `seq_bin` and `bin_offset`.

    One window cumulative sum per partition. At scale, partition by a
    corpus shard key so each window fits an executor; the stream is
    chunked independently per shard, which is exactly how packed
    pretraining shards are built."""
    w = (
        W.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(order_col)
        if partition_cols
        else W.partitionBy().orderBy(order_col)
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("bigint")
    return df.withColumn("seq_bin", F.floor(start / F.lit(capacity))).withColumn(
        "bin_offset", (start % F.lit(capacity)).cast("bigint")
    )


def uniform_hash(key: Column) -> Column:
    """Deterministic uniform [0,1) from the key: first 8 md5 hex chars
    as an integer / 2^32. Engine-portable (DuckDB:
    CAST('0x'||substr(md5(k),1,8) AS UBIGINT) / 4294967296.0)."""
    return F.conv(F.substring(_hex_key(key), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Downsample strata to a target mixture: stratum s keeps rate
    min(1, weight_s × N / n_s) of its rows, chosen by the deterministic
    uniform hash — the way pretraining mixes rebalance domains/languages
    without an RNG. Strata absent from ``weights`` are dropped.

    Two passes over the data (count aggregate, then filter) but the
    expensive side is the second scan: rates ride a BROADCAST dim onto
    a pure scan→filter plan, no shuffle of the corpus. At 100 TB the
    count pass is a column-pruned scan of the stratum column only."""
    spark = df.sparkSession
    wdim = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()], [stratum_col, "_w"]
    )
    counts = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(wdim, stratum_col, "inner")
    )
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    rates = counts.crossJoin(F.broadcast(total)).select(
        stratum_col,
        F.least(
            F.lit(1.0), F.col("_w") * F.col("_total") / F.col("_n").cast("double")
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), stratum_col, "inner")
        .filter(uniform_hash(F.col(key_col)) < F.col("_rate"))
        .drop("_rate")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 200,
    overlap: int = 40,
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap —
    the RAG / context-window preprocessing shape. Returns (doc_id,
    chunk_no, chunk_text, chunk_start) with chunk_start 1-based;
    chunks step by (chunk_chars - overlap) and the final partial chunk
    is kept. Empty documents yield no chunks.

    Scale shape: pure per-row expression work (sequence + transform +
    posexplode) — no shuffle at all; chunking composes with any
    downstream repartition. Substring on the JVM; no Python."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError("overlap must be in [0, chunk_chars)")
    step = chunk_chars - overlap
    t = F.col(text_col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(t) - F.lit(overlap), F.lit(1)),
        F.lit(step),
    )
    chunks = F.transform(
        starts, lambda s: F.struct(s.alias("start"), F.substring(t, s, chunk_chars).alias("txt"))
    )
    return (
        df.filter(F.length(t) > 0)
        .select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_no", "_c"),
        )
        .select(
            id_col,
            "chunk_no",
            F.col("_c.txt").alias("chunk_text"),
            F.col("_c.start").alias("chunk_start"),
        )
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_tokens: int = 32,
    batch_size: int = 8,
) -> DataFrame:
    """Inference/training batching by similar length: bucket documents
    by token count, then number off fixed-size batches inside each
    bucket — a batch pads to ITS OWN max length (``pad_to``), not the
    corpus max, which is where batched-inference throughput comes
    from. Deterministic order (n_tokens, id) inside the bucket; both
    windows are BUCKET-partitioned — nothing global. Returns
    (id, n_tokens, bucket, batch_seq, pad_to)."""
    from datalake_etlscripts_spark.operators.text import token_count

    base = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
    ).withColumn("bucket", (F.col("n_tokens") / bucket_tokens).cast("int"))
    w = W.partitionBy("bucket").orderBy("n_tokens", id_col)
    batched = base.withColumn(
        "batch_seq",
        ((F.row_number().over(w) - 1) / batch_size).cast("int"),
    )
    wb = W.partitionBy("bucket", "batch_seq")
    return batched.withColumn("pad_to", F.max("n_tokens").over(wb))


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: Column | str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis),
    deterministic-integer form: a row with integer weight w gets
    key = max_{j=1..w} U_j, which is distributed exactly as U^(1/w)
    (max of w uniforms ⇔ the A-ES exponent trick), and the k largest
    keys are the weighted sample. The uniforms are hash-derived
    (md5 of "id:j"), so membership is reproducible on any engine and
    any partitioning — no RNG, no floats, no pow()/ln() whose last
    bit differs across libm builds.

    Scale shape: the explode is linear in TOTAL WEIGHT — callers pass
    small integer weights (bucketed, e.g. chars//32+1, as the
    registered query does), keeping the blow-up a small constant per
    row. The top-k is a TakeOrdered (per-partition heads, never a full
    sort). Returns (key, weight, sample_key) for the k sampled rows,
    ties broken by key ascending.
    """
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.greatest(F.lit(1), wcol.cast("int"))
    keyed = (
        df.select(F.col(key_col).alias("key"), w.alias("weight"))
        .select(
            "key",
            "weight",
            F.explode(F.sequence(F.lit(1), F.col("weight"))).alias("_j"),
        )
        .select(
            "key",
            "weight",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("key").cast("string"), F.lit(":"), F.col("_j").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("_u"),
        )
        .groupBy("key", "weight")
        .agg(F.max("_u").alias("sample_key"))
    )
    return keyed.orderBy(F.col("sample_key").desc(), F.col("key").asc()).limit(k)


def sample_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    n: int,
    salt: str = "spg",
) -> DataFrame:
    """Deterministic per-group reservoir: keep exactly min(n, |group|)
    rows from every group, chosen by md5-hash order of the key — the
    distributed, re-runnable replacement for per-group reservoir
    sampling (balanced eval sets, per-language audit samples).

    Because the rank key is a pure function of the row, the sample is
    identical under any partitioning, engine, or retry — unlike
    ``df.sample``/reservoirs seeded per task. One window over the
    group partitioning (single shuffle on the group key); the salt
    decorrelates this sample from other hash-keyed decisions on the
    same ids (e.g. train_test_split).

    Returns the sampled rows plus ``sample_rank`` (1..n within group).
    """
    hk = _hex_key(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = W.partitionBy(group_col).orderBy(hk, F.col(key_col).cast("string"))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


def mixture_upsample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    factors: dict[str, tuple[int, int]],
    salt: str = "ups",
) -> DataFrame:
    """Epoch-style UP-sampling: stratum s is repeated factor_s times —
    the other half of mixture rebalancing (mixture_sample only
    downsamples). A factor of 5/2 gives every row 2 copies plus a
    deterministic hash-chosen half of rows a 3rd; pretraining mixes
    state domain weights exactly this way ("2.5 epochs of books").

    Factors are RATIONALS (num, den): the fractional-copy membership
    test is integer cross-multiplication on the 32-bit md5 prefix
    (hash·den < 2³²·(num − base·den)) — no float threshold, identical
    membership on any engine. Rows carry ``epoch`` (0-based copy
    number) so shard writers can interleave copies. Strata absent from
    ``factors`` keep exactly one copy (epoch 0).

    Scale: pure per-row explode by a small integer — no shuffle, no
    RNG state; the blow-up is exactly the target token multiplier.
    """
    hash32 = F.conv(
        F.substring(
            _hex_key(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    n_copies = None
    for stratum, (num, den) in factors.items():
        if num <= 0 or den <= 0:
            raise ValueError(f"factor for {stratum!r} must be positive, got {num}/{den}")
        base = num // den
        frac_num = num - base * den  # fractional part = frac_num/den
        copies = F.lit(base) + F.when(
            F.lit(frac_num > 0) & (hash32 * den < F.lit(frac_num) * F.lit(1 << 32)),
            F.lit(1),
        ).otherwise(F.lit(0))
        cond = F.col(stratum_col) == F.lit(stratum)
        n_copies = F.when(cond, copies) if n_copies is None else n_copies.when(cond, copies)
    n_copies = (n_copies.otherwise(F.lit(1)) if n_copies is not None else F.lit(1))
    # Spark's sequence(0, -1) DESCENDS instead of being empty — a
    # factor < 1 (pure fractional copies = hash downsampling) must
    # yield zero rows, so guard with an explicit empty array
    epochs = F.when(n_copies > 0, F.sequence(F.lit(0), n_copies - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("epoch", F.explode(epochs))


def temperature_mixture_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
) -> DataFrame:
    """Temperature-balanced mixture sampling (the XLM-R/mBERT recipe):
    target share of stratum s ∝ (n_s)^α with α = 1/2, flattening the
    size distribution so low-resource strata are over-represented
    relative to their raw share. α is FIXED at 1/2 because sqrt is
    IEEE-correctly-rounded on every engine — an arbitrary pow(x, α)
    is not reproducible bit-for-bit across engines, and this module's
    contract is hash-deterministic sampling an external engine can
    replay exactly.

    The normalizing Σ_s sqrt(n_s) is a DIMENSION-ORDERED fold over the
    stratum-sorted list (doubles sum is order-dependent; the stratum
    table is dictionary-sized so the ordered fold is free). Keep rate
    = min(1, target_share × N / n_s), applied via the uniform md5
    hash — same broadcast-dim scan→filter shape as mixture_sample:
    the corpus never shuffles.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    den = counts.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(stratum_col).alias("s"),
                        F.sqrt(F.col("_n")).alias("q"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["q"],
        ).alias("_den"),
        F.sum("_n").alias("_total"),
    )
    rates = counts.crossJoin(F.broadcast(den)).select(
        stratum_col,
        F.least(
            F.lit(1.0),
            F.sqrt(F.col("_n"))
            / F.col("_den")
            * F.col("_total")
            / F.col("_n").cast("double"),
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), stratum_col, "inner")
        .filter(uniform_hash(F.col(key_col)) < F.col("_rate"))
        .drop("_rate")
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    scale: int = 1_000_000,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw doc
    by how target-like its hashed bag-of-words is,

        log w(doc) = Σ_f n_f(doc) · [ln p_target(f) − ln p_raw(f)]

    over ``n_buckets`` hashed token features with +1 Laplace
    smoothing. Selecting the highest-weight docs (or Gumbel-resampling
    on the weights) is the classic cheap way to steer a 100 TB crawl
    toward a benchmark/domain distribution without a trained filter.

    Scale + portability shape: both feature models are BUCKET-sized
    aggregates (one corpus scan each); only those ≤ n_buckets rows
    reach the driver, where the two ln() calls per bucket happen in
    Python and are fixed to INTEGER micro-nats (floor(x·1e6 + 0.5) —
    half-up, no banker's rounding), the unigram-trainer convention.
    Doc scoring is then pure BIGINT arithmetic: one hash-bucket
    explode, a broadcast join against the tiny weight table, one
    map-side-combined per-doc sum — no float summation order anywhere,
    replayable bit-for-bit by an external engine (same-host libm ln is
    the one documented boundary). Returns (doc_id, log_weight_micro,
    keep) with keep = weight > 0 (more target-like than raw-like).
    """
    import math

    from datalake_etlscripts_spark.functions.scalar import md5_hash32
    from datalake_etlscripts_spark.operators.text import tokens

    def bucketize(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_term")
        ).select(
            F.col(id_col), (md5_hash32(F.col("_term")) % n_buckets).alias("bucket")
        )

    def model_counts(df: DataFrame) -> dict[int, int]:
        return {
            r["bucket"]: r["n"]
            for r in bucketize(df)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    ct, cr = model_counts(target), model_counts(raw)
    tt, tr = sum(ct.values()), sum(cr.values())
    rows = []
    for b in range(n_buckets):
        lnr = math.log((ct.get(b, 0) + 1) / (tt + n_buckets)) - math.log(
            (cr.get(b, 0) + 1) / (tr + n_buckets)
        )
        rows.append((b, int(math.floor(lnr * scale + 0.5))))
    spark = raw.sparkSession
    weights = spark.createDataFrame(rows, "bucket bigint, lnr_micro bigint")

    per_doc = (
        bucketize(raw)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("_n") * F.col("lnr_micro")).alias("log_weight_micro"))
    )
    return per_doc.select(
        id_col,
        "log_weight_micro",
        (F.col("log_weight_micro") > 0).alias("keep"),
    )


def gumbel_topk_resample(
    weighted: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    weight_col: str = "log_weight_micro",
    n_levels: int = 1024,
    scale: int = 1_000_000,
    seed: str = "gumbel1",
) -> DataFrame:
    """Gumbel-top-k importance RESAMPLING over integer log-weights —
    the selection step DSIR actually prescribes (top-k of
    log w + Gumbel noise ~ sampling WITHOUT replacement ∝ w). The
    noise is deterministic and engine-portable: each row's md5-uniform
    quantizes to one of ``n_levels`` levels, and the ≤ n_levels Gumbel
    values  g(u) = -ln(-ln(u))  are fixed to integer micro-nats ON THE
    DRIVER (same floor-half-up + same-host-libm contract as the DSIR
    weights themselves), broadcast back as a lookup dim. Quantized
    noise is still a valid Gumbel-max scheme (documented: ties within
    a level resolve by id — a 1/n_levels-granularity floor on the
    noise, not a bias). Selection is one TakeOrdered — never a global
    sort. Returns (id, log_weight_micro, gumbel_micro, key, rank)."""
    import math

    from datalake_etlscripts_spark.functions.scalar import md5_hash32

    spark = weighted.sparkSession
    levels = [
        (
            lv,
            int(
                math.floor(
                    -math.log(-math.log((lv + 0.5) / n_levels)) * scale + 0.5
                )
            ),
        )
        for lv in range(n_levels)
    ]
    gdim = spark.createDataFrame(levels, "lvl bigint, gumbel_micro bigint")
    keyed = (
        weighted.withColumn(
            "lvl", md5_hash32(F.concat(F.lit(seed), F.col(id_col).cast("string")))
            % n_levels
        )
        .join(F.broadcast(gdim), "lvl")
        .select(
            id_col,
            weight_col,
            "gumbel_micro",
            (F.col(weight_col) + F.col("gumbel_micro")).alias("key"),
        )
    )
    w = W.orderBy(F.desc("key"), F.asc(id_col))
    # orderBy+limit compiles to TakeOrderedAndProject (distributed
    # partial top-k, no single-partition sort)
    ranked = keyed.orderBy(F.desc("key"), F.asc(id_col)).limit(k)
    return ranked.withColumn("rank", F.row_number().over(w))


def naive_bayes_confusion(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    scale: int = 1_000_000,
) -> DataFrame:
    """Multinomial Naive Bayes trained IN-ENGINE and evaluated as a
    confusion matrix — the multi-class sibling of the binary DSIR /
    perceptron filters (fastText-style lang-id / domain routing).
    Per class c and hashed token bucket b:

        score(d, c) = lnμ P(c) + Σ_b n_b(d) · lnμ P(b|c)

    with +1 Laplace smoothing. Both models are (classes × buckets)
    aggregates; ONLY those bounded tables reach the driver, where ln
    is fixed to integer micro-nats (the DSIR convention). Document
    scoring is pure BIGINT: one bucket explode, a broadcast weight
    join fanning each doc's buckets across the class axis, one
    (doc, class) sum, argmax by a class-count-sized window (score
    desc, class asc — deterministic ties). Returns
    (actual, predicted, n)."""
    import math

    from datalake_etlscripts_spark.functions.scalar import md5_hash32
    from datalake_etlscripts_spark.operators.text import tokens
    from pyspark.sql import Window

    def bucketize(df: DataFrame, extra_expr, extra_name: str) -> DataFrame:
        return df.select(
            extra_expr.alias(extra_name),
            F.explode(tokens(F.col(text_col))).alias("_term"),
        ).select(
            extra_name, (md5_hash32(F.col("_term")) % n_buckets).alias("bucket")
        )

    cls_counts = (
        bucketize(train, F.col(label_col), "_c")
        .groupBy("_c", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    doc_counts = {
        r["_c"]: r["n"]
        for r in train.groupBy(F.col(label_col).alias("_c"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    classes = sorted(doc_counts)
    d_total = sum(doc_counts.values())
    tok_totals = {c: 0 for c in classes}
    by_cb = {}
    for r in cls_counts:
        by_cb[(r["_c"], r["bucket"])] = r["n"]
        tok_totals[r["_c"]] += r["n"]

    def mn(x: float) -> int:
        return int(math.floor(math.log(x) * scale + 0.5))

    spark = train.sparkSession
    weights = spark.createDataFrame(
        [
            (c, b, mn((by_cb.get((c, b), 0) + 1) / (tok_totals[c] + n_buckets)))
            for c in classes
            for b in range(n_buckets)
        ],
        "cls string, bucket bigint, lnp bigint",
    )
    priors = spark.createDataFrame(
        [(c, mn(doc_counts[c] / d_total)) for c in classes],
        "cls string, lnprior bigint",
    )
    feats = (
        bucketize(test, F.col(id_col), id_col)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    scores = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col, "cls")
        .agg(F.sum(F.col("_n") * F.col("lnp")).alias("_s"))
        .join(F.broadcast(priors), "cls")
        .withColumn("_score", F.col("_s") + F.col("lnprior"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_score").desc(), F.col("cls").asc()
    )
    pred = (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("cls").alias("predicted"))
    )
    return (
        test.select(id_col, F.col(label_col).alias("actual"))
        .join(pred, id_col)
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def mixture_waterfill(
    counts: DataFrame,
    budget: int,
    key_col: str = "source",
    n_col: str = "n_docs",
    w_col: str = "w_micro",
) -> DataFrame:
    """Water-filling mixture planner: given per-source sizes n_s and
    target mixture weights w_s, allocate a total document budget B as

        kept_s = min(n_s, C · w_s)

    with the water level C chosen so Σ kept_s = B — the exact solve
    behind "sample sources ∝ target weights, but a small source can't
    give more than it has; redistribute its shortfall" (the
    DoReMi/Pile mixture-realization step). C is found RELATIONALLY:
    sort sources by saturation point n_s/w_s, and for each saturated
    prefix k the candidate C_k = (B − Σ_{j≤k} n_j) / Σ_{j>k} w_j is
    valid iff t_k ≤ C_k ≤ t_{k+1} — every check an exact integer
    cross-multiplication (n·w products need DECIMAL beyond ~1e12·1e6),
    no floats, no driver solve. The table is #sources-sized
    throughout; kept uses integer div (≤ 1 doc lost per unsaturated
    source, documented). Returns (key, n_docs, w_micro, kept,
    saturated)."""
    from pyspark.sql import Window

    src = counts.select(
        F.col(key_col).alias("_k"),
        F.col(n_col).cast("long").alias("_n"),
        F.col(w_col).cast("long").alias("_w"),
    )
    # saturation order: t_s = n_s/w_s ascending (double sort key is
    # order-identical across engines; ties break on the key)
    w_ord = Window.orderBy(
        (F.col("_n").cast("double") / F.col("_w").cast("double")).asc(),
        F.col("_k").asc(),
    )
    tot = src.agg(
        F.sum("_n").cast("long").alias("_tn"), F.sum("_w").cast("long").alias("_tw")
    )
    ranked = (
        src.withColumn("_rn", F.row_number().over(w_ord))
        .withColumn(
            "_cumn",
            F.sum("_n").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "_cumw",
            F.sum("_w").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("_nn", F.lead("_n").over(w_ord))
        .withColumn("_nw", F.lead("_w").over(w_ord))
    )
    cand = (
        ranked.crossJoin(F.broadcast(tot))
        # virtual k=0 row (nothing saturated): num=B, den=total w,
        # lower bound t_0 = 0 — expressed by unioning a synthetic row
        .select(
            F.col("_rn").alias("_key_rn"),
            (F.lit(budget) - F.col("_cumn")).alias("_num"),
            (F.col("_tw") - F.col("_cumw")).alias("_den"),
            F.col("_n").alias("_bn"),
            F.col("_w").alias("_bw"),
            F.col("_nn"),
            F.col("_nw"),
        )
        .unionByName(
            tot.select(
                F.lit(0).alias("_key_rn"),
                F.lit(budget).cast("long").alias("_num"),
                F.col("_tw").alias("_den"),
                F.lit(0).cast("long").alias("_bn"),
                F.lit(1).cast("long").alias("_bw"),
                F.lit(None).cast("long").alias("_nn"),
                F.lit(None).cast("long").alias("_nw"),
            ).join(
                src.orderBy(
                    (F.col("_n").cast("double") / F.col("_w").cast("double")).asc(),
                    F.col("_k").asc(),
                )
                .limit(1)
                .select(
                    F.col("_n").alias("_nn0"), F.col("_w").alias("_nw0")
                ),
                how="cross",
            )
            .select(
                "_key_rn",
                "_num",
                "_den",
                "_bn",
                "_bw",
                F.col("_nn0").alias("_nn"),
                F.col("_nw0").alias("_nw"),
            )
        )
    )
    # validity: C_k ≥ t_k  (num·w_k ≥ n_k·den)  and, unless last,
    # C_k ≤ t_{k+1}  (num·w_{k+1} ≤ n_{k+1}·den)
    valid = cand.filter(
        (F.col("_num") * F.col("_bw") >= F.col("_bn") * F.col("_den"))
        & (
            F.col("_nn").isNull()
            | (F.col("_num") * F.col("_nw") <= F.col("_nn") * F.col("_den"))
        )
    )
    chosen = valid.orderBy(F.col("_key_rn").asc()).limit(1).select(
        F.col("_key_rn").alias("_kstar"), "_num", "_den"
    )
    out = ranked.crossJoin(F.broadcast(chosen)).select(
        F.col("_k").alias(key_col),
        F.col("_n").alias(n_col),
        F.col("_w").alias(w_col),
        F.when(F.col("_rn") <= F.col("_kstar"), F.col("_n"))
        .otherwise(F.expr("(_num * _w) div _den"))
        .cast("long")
        .alias("kept"),
        (F.col("_rn") <= F.col("_kstar")).alias("saturated"),
    )
    return out


def stratified_kfold(
    df: DataFrame, key_col: str, stratum_col: str, k: int = 5
) -> DataFrame:
    """Exactly-balanced stratified k-fold assignment: within each
    stratum, rows order by their md5 hash (deterministic, key-driven)
    and fold = row_number % k — every stratum's folds differ by AT
    MOST ONE row, the parity guarantee plain hash-mod can't give
    (hash-mod is the shuffle-free approximate path; this is the
    exact-balance path for when fold parity matters — CV on imbalanced
    labels). One window per stratum; at corpus scale pre-split hot
    strata with a salt bucket and run the window per (stratum, salt) —
    balance then holds within ±n_salts. Adds ``fold``."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return df.withColumn(
        "fold", ((F.row_number().over(w) - 1) % k).cast("long")
    )


def kfold_balance_audit(assigned: DataFrame, stratum_col: str) -> DataFrame:
    """Per-(stratum, fold) counts plus the stratum's fold spread
    (max n − min n) — the ≤1 guarantee made visible. Two tiny
    aggregates over the assignment."""
    from pyspark.sql import Window

    g = assigned.groupBy(stratum_col, "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy(stratum_col)
    return g.withColumn(
        "spread", (F.max("n").over(w) - F.min("n").over(w)).cast("long")
    )
