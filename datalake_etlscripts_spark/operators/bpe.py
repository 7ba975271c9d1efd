"""Distributed BPE tokenizer training (byte-pair encoding, Sennrich et
al. 2016) — the iterative generalization of the single-round
bpe_pair_counts query.

Scale shape (the part that matters at 100 TB): the ONLY corpus-scale
operation is the word-frequency count — one explode + one map-side-
combined shuffle. Every merge iteration after that runs on the
DISTINCT-WORD table (Zipf: ~10 M rows for a 100 TB corpus — thousands
of times smaller than the corpus), so the training loop never touches
the corpus again. Per iteration: one adjacent-pair aggregate over the
vocab (argmax pair collected to the driver — a single scalar, like the
reference's id-counter handoff) and one JVM-side fold that rewrites
each word's symbol array. The vocab table is localCheckpoint()ed per
round, so each round's plan is constant-size and nothing recomputes.

No UDFs anywhere: the merge-application is a pyspark.sql.functions
``aggregate`` fold (greedy non-overlapping left-to-right, exactly the
classic algorithm's ``re``-free formulation), and pair counting is
zip_with over shifted slices.

Determinism: ties on pair frequency break to the lexicographically
smallest (a, b) — both here and in the pure-Python reference the tests
compare against, so merge sequences are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datalake_etlscripts_spark.operators.text import tokens

END_OF_WORD = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the one corpus-scale shuffle."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbols(word: Column) -> Column:
    """A word's starting symbol sequence: characters + the end-of-word
    marker (so merges can learn suffixes distinctly)."""
    chars = F.filter(F.split(word, ""), lambda c: c != F.lit(""))
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def adjacent_pairs(symbols: Column) -> Column:
    """ARRAY<STRUCT<a,b>> of adjacent symbol pairs."""
    n = F.size(symbols)
    return F.zip_with(
        F.slice(symbols, 1, n - 1),
        F.slice(symbols, 2, n - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )


def merge_pair(symbols: Column, a: str, b: str) -> Column:
    """Replace every non-overlapping adjacent (a, b) with the merged
    symbol a+b, greedy left-to-right — one JVM-side fold, no UDF.
    (Literal parameters are deliberate: a broadcast 1-row parameter
    table was tried to share one compiled plan across training rounds
    and did NOT beat per-round literal codegen — the broadcast
    exchange per round cost more than the compile.)"""
    merged = F.lit(a + b)
    a, b = F.lit(a), F.lit(b)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc, x):
        out, carry = acc["out"], acc["carry"]
        return (
            F.when(
                carry.isNotNull() & (carry == a) & (x == b),
                F.struct(
                    F.concat(out, F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .when(carry.isNull(), F.struct(out.alias("out"), x.alias("carry")))
            .otherwise(
                F.struct(F.concat(out, F.array(carry)).alias("out"), x.alias("carry"))
            )
        )

    def finish(acc):
        return F.when(acc["carry"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["carry"]))
        )

    return F.aggregate(symbols, init, step, finish)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` merges; stops early when the best
    pair's corpus frequency drops below ``min_freq``. Returns the
    ordered merge list [(a, b, freq), ...]."""
    vocab = (
        word_frequencies(df, text_col)
        .select(initial_symbols(F.col("word")).alias("sym"), "freq")
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = (
            vocab.select(F.explode(adjacent_pairs(F.col("sym"))).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .first()
        )
        if best is None or best["cnt"] < min_freq:
            break
        a, b = best["a"], best["b"]
        merges.append((a, b, best["cnt"]))
        # rewrite + LAZY re-materialize: the checkpoint still cuts
        # lineage (no re-execution of previous folds), but it
        # materializes inside the NEXT round's argmax action instead
        # of as its own blocking job — one job per round, not two
        # (measured ~2× faster warm; merge sequence identical)
        vocab = vocab.select(
            merge_pair(F.col("sym"), a, b).alias("sym"), "freq"
        ).localCheckpoint(eager=False)
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Apply a learned merge list to a corpus: per token, chars +
    end-of-word marker folded through each merge in training order,
    then flattened to one token stream per document. Chained folds are
    pure column expressions; the plan is cut every ``checkpoint_every``
    merges so codegen never sees an unboundedly deep expression."""
    # NB: factory, not default-arg lambdas — F.transform dispatches on
    # lambda arity ((element) vs (element, index)), so extra default
    # parameters break the call
    def _apply(a: str, b: str):
        return lambda w: merge_pair(w, a, b)

    out = df.withColumn(out_col, F.transform(tokens(F.col(text_col)), initial_symbols))
    for i, (a, b, _) in enumerate(merges):
        out = out.withColumn(out_col, F.transform(F.col(out_col), _apply(a, b)))
        if (i + 1) % checkpoint_every == 0 and i + 1 < len(merges):
            out = out.localCheckpoint()
    return out.withColumn(out_col, F.flatten(F.col(out_col)))


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) Viterbi ENCODING. The training EM is
# float-heavy; encoding against a given piece vocabulary is pure DP and
# is what the corpus-scale tokenization job actually runs. Costs are
# integer (think -log p in milli-nats, rounded once when the vocab is
# exported), so the whole DP is exact 64-bit arithmetic — deterministic
# across engines and partitionings.
# ---------------------------------------------------------------------------

_LCAP = 15  # backlen nibble: pieces up to 15 chars


def unigram_viterbi_encode(
    df: DataFrame,
    vocab: dict[str, int],
    text_col: str = "text",
    char_cost: int = 1000,
    unk_cost: int = 10000,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Viterbi-segment every distinct corpus word against an integer-
    cost piece vocabulary (Kudo 2018's unigram LM tokenizer, encode
    side). min-cost segmentation; cost ties break to the LONGER final
    piece (encoded in the key's low nibble, so the tie-break costs no
    extra comparison). Any single [a-z] char is a fallback piece at
    ``char_cost``; anything else segments at ``unk_cost`` — the DP is
    total, no word can fail.

    Scale shape: the ONLY corpus-scale operation is the word-frequency
    count (one explode + map-side-combined shuffle). The DP itself runs
    on the DISTINCT-WORD table (Zipf: dictionary-sized) as one
    ``aggregate`` fold per word — position j appends
    best[j] = min over pieces p ending at j of best[j-|p|] + cost(p),
    packed as (cost << 4) | (15 - |p|) so min() resolves both the cost
    and the tie-break. No UDF, no shuffle beyond the word count.

    Returns (word, freq, pieces, n_pieces, total_cost); with
    ``group_cols`` the word count (and the DP fan-out) is per group —
    the shape behind per-language fertility audits.

    Cost note: the fold appends to the best[] array per position, so a
    single word costs O(len²) array copies — fine for natural-language
    tokens (≤ ~50 chars), a straggler on degenerate kilobyte "words"
    (URLs, DNA). Cap those upstream (split or hash-bucket them), the
    same policy SentencePiece applies with its max input length.
    """
    if any(len(p) > _LCAP or len(p) < 2 for p in vocab):
        raise ValueError(f"vocab pieces must be 2..{_LCAP} chars")
    if any(c < 0 or c >= (1 << 58) for c in vocab.values()):
        raise ValueError("vocab costs must be non-negative small ints")

    words = (
        df.select(*group_cols, F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word", *group_cols)
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    word = F.col("word")
    ln = F.length(word)

    def step(acc: Column, jn: Column) -> Column:
        ch = word.substr(jn, F.lit(1))
        cands = [
            (
                F.element_at(acc, jn)["c"]
                + F.when(ch.between("a", "z"), F.lit(char_cost)).otherwise(
                    F.lit(unk_cost)
                )
            )
            * 16
            + F.lit(_LCAP - 1)
        ]
        for p, cost in sorted(vocab.items()):
            pl = len(p)
            cands.append(
                F.when(
                    jn >= pl,
                    F.when(
                        word.substr(jn - F.lit(pl) + 1, F.lit(pl)) == p,
                        (F.element_at(acc, jn - F.lit(pl) + 1)["c"] + F.lit(cost))
                        * 16
                        + F.lit(_LCAP - pl),
                    ),
                )
            )
        best = F.least(*cands) if len(cands) > 1 else cands[0]
        return F.struct(
            F.shiftright(best, 4).alias("c"),
            (F.lit(_LCAP) - best.bitwiseAND(F.lit(15))).cast("int").alias("b"),
        )

    dp = F.aggregate(
        F.sequence(F.lit(1), ln),
        F.array(
            F.struct(F.lit(0).cast("bigint").alias("c"), F.lit(0).alias("b"))
        ),
        lambda acc, jn: F.concat(acc, F.array(step(acc, jn))),
    )
    with_dp = words.withColumn("_dp", dp)

    dpc = F.col("_dp")

    def back(acc: Column, _: Column) -> Column:
        bl = F.element_at(dpc, acc["pos"] + 1)["b"]
        piece = word.substr(acc["pos"] - bl + 1, bl)
        return F.when(
            acc["pos"] > 0,
            F.struct(
                (acc["pos"] - bl).alias("pos"),
                F.concat(
                    piece,
                    F.when(acc["s"] == "", F.lit("")).otherwise(F.lit(" ")),
                    acc["s"],
                ).alias("s"),
                (acc["np"] + 1).alias("np"),
            ),
        ).otherwise(acc)

    bt = F.aggregate(
        F.sequence(F.lit(1), ln),
        F.struct(
            ln.alias("pos"), F.lit("").alias("s"), F.lit(0).alias("np")
        ),
        back,
    )
    return with_dp.select(
        *group_cols,
        "word",
        "freq",
        bt["s"].alias("pieces"),
        bt["np"].alias("n_pieces"),
        F.element_at(dpc, ln + 1)["c"].alias("total_cost"),
    )


def unigram_hard_em_round(
    df: DataFrame,
    vocab: dict[str, int],
    text_col: str = "text",
    char_cost: int = 1000,
    unk_cost: int = 10000,
    scale: int = 1000,
) -> dict[str, int]:
    """One hard-EM round of unigram-LM training (Kudo 2018, Viterbi
    E-step): segment the corpus with the current costs, count
    corpus-weighted piece usage, re-estimate cost(p) =
    max(1, round(-scale·ln(uses_p / total))) and PRUNE pieces no best
    path uses — exactly the loop SentencePiece runs (soft-EM's
    forward-backward replaced by the Viterbi hard assignment).

    Distribution contract: the cluster does the corpus-scale work
    (word count + DP + usage aggregate); only the dictionary-sized
    (piece, uses) table reaches the driver, where the log/round
    happens in Python — the same id-counter-sized handoff as
    bpe_train's per-round argmax. The returned costs are ints, so a
    subsequent encode round is again exact DP. Single-char fallback
    costs stay fixed (they are the smoothing floor, not vocab).
    """
    return _recost(
        piece_usage_counts(df, vocab, text_col, char_cost, unk_cost), scale
    )


def piece_usage_counts(
    df: DataFrame,
    vocab: dict[str, int],
    text_col: str = "text",
    char_cost: int = 1000,
    unk_cost: int = 10000,
) -> dict[str, int]:
    """Corpus-weighted piece usage under the current costs — the
    E-step's sufficient statistic. The cluster does the corpus-scale
    work (word count + DP + usage aggregate); only the
    dictionary-sized (piece, uses) table reaches the driver."""
    enc = unigram_viterbi_encode(df, vocab, text_col, char_cost, unk_cost)
    usage = (
        enc.select(F.explode(F.split("pieces", " ")).alias("piece"), "freq")
        .join(
            df.sparkSession.createDataFrame(
                [(p,) for p in vocab], ["piece"]
            ),
            "piece",
            "left_semi",
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("uses"))
        .collect()
    )
    return {r["piece"]: r["uses"] for r in usage}


def _recost(counts: dict[str, int], scale: int = 1000) -> dict[str, int]:
    """M-step: cost(p) = max(1, floor(-scale·ln(uses/total) + 0.5)),
    unused pieces pruned. floor(x + 0.5) instead of Python round():
    banker's rounding is a Python-ism no SQL engine replicates —
    floor(+0.5) is the one half-up convention every engine shares, so
    an external oracle replays the integer costs exactly (given the
    same libm ln(), which holds for any same-host comparison)."""
    import math

    total = sum(counts.values())
    return {
        p: max(1, math.floor(-scale * math.log(n / total) + 0.5))
        for p, n in sorted(counts.items())
    }


def unigram_train(
    df: DataFrame,
    vocab: dict[str, int],
    rounds: int = 2,
    text_col: str = "text",
    char_cost: int = 1000,
    unk_cost: int = 10000,
    scale: int = 1000,
) -> list[tuple[dict[str, int], dict[str, int]]]:
    """N hard-EM rounds of unigram-LM training: per round, one
    corpus-scale Viterbi E-step (distributed) + the dictionary-sized
    M-step re-costing on the driver. Returns per-round
    (costs_after_round, uses_in_round) — the training trajectory,
    pieces pruned as soon as no best path uses them (Kudo 2018's
    prune-and-re-estimate loop with Viterbi hard assignment)."""
    costs = dict(vocab)
    out: list[tuple[dict[str, int], dict[str, int]]] = []
    for _ in range(rounds):
        uses = piece_usage_counts(df, costs, text_col, char_cost, unk_cost)
        costs = _recost(uses, scale)
        out.append((costs, uses))
    return out


def wordpiece_encode(
    df: DataFrame,
    vocab: list[tuple[str, bool]],
    text_col: str = "text",
) -> DataFrame:
    """WordPiece ENCODING — greedy longest-match-first (the BERT
    tokenizer's inference rule; Wu et al. 2016), the third tokenizer
    beside BPE merge-replay (bpe_encode) and unigram Viterbi
    (unigram_viterbi_encode). ``vocab`` is (piece_text, is_cont):
    continuation pieces only match at positions > 1 and display with
    the ``##`` prefix. Any word the chase cannot tile end-to-end
    collapses to ``[UNK]`` — whole-word, exactly like BERT.

    Plan: the DP never touches the corpus — one corpus-scale shuffle
    builds (word, freq), then everything runs on the DISTINCT-word
    table: (word, position, piece-length) candidates equi-join the
    broadcast vocab on the substring VALUE (explode over the vocab's
    distinct lengths keeps it a hash join, never a nested-loop on a
    computed predicate), one argmax picks the longest match per
    position, and the greedy walk is a bounded pointer chase — at most
    max-word-length iterations of distinct-word-sized joins, each step
    advancing every unfinished word by ≥ 1 character. Returns
    (word, freq, n_pieces, pieces, is_unk)."""
    spark = df.sparkSession
    # settle the distinct-word table: it seeds the candidate build,
    # the max-word-length scalar AND the chase's base state — without
    # the cut the corpus-scale word-frequency shuffle re-runs for
    # each consumer (guide §2.4). Lazy.
    wf = (
        word_frequencies(df, text_col)
        .withColumn("_wl", F.length("word"))
        .localCheckpoint(eager=False)
    )
    vrows = [
        (t[2:] if t.startswith("##") else t, t.startswith("##"))
        for t, _ in [(t, c) for t, c in vocab]
    ]
    vrows = [
        (txt, cont, len(txt), ("##" + txt) if cont else txt)
        for txt, cont in {(t, c) for t, c in vrows}
    ]
    vdf = spark.createDataFrame(
        vrows, "txt string, cont boolean, vlen int, disp string"
    )
    lens = sorted({r[2] for r in vrows})
    pos = wf.select(
        "word",
        "_wl",
        F.explode(F.sequence(F.lit(1), F.col("_wl"))).alias("pos"),
    ).select(
        "word",
        "_wl",
        "pos",
        F.explode(F.array(*[F.lit(L) for L in lens])).alias("plen"),
    ).filter(F.col("pos") + F.col("plen") - 1 <= F.col("_wl"))
    cand = pos.withColumn(
        "_sub", F.expr("substring(word, pos, plen)")
    ).join(
        F.broadcast(vdf),
        (F.col("_sub") == F.col("txt"))
        & (F.col("cont") == (F.col("pos") > 1))
        & (F.col("plen") == F.col("vlen")),
    ).select("word", "pos", F.col("vlen").alias("blen"), "disp")
    # settle the per-position best-match table: EVERY chase iteration
    # (up to max-word-length of them) equi-joins it — without the cut
    # the position-explode + vocab join + argmax rebuild once per
    # iteration inside the un-checkpointed lineage windows (guide
    # §2.4). Lazy.
    best = cand.groupBy("word", "pos").agg(
        F.max(F.struct(F.col("blen"), F.col("disp"))).alias("_b")
    ).select(
        "word", "pos", F.col("_b.blen").alias("blen"), F.col("_b.disp").alias("bdisp")
    ).localCheckpoint(eager=False)
    max_wl = wf.agg(F.max("_wl")).collect()[0][0] or 0
    state = wf.select(
        "word",
        "freq",
        "_wl",
        F.lit(1).alias("pos"),
        F.lit(0).alias("np"),
        F.lit("").alias("pieces"),
        F.lit(False).alias("stuck"),
    )
    for i in range(int(max_wl)):
        st = state.join(best, ["word", "pos"], "left")
        active = (~F.col("stuck")) & (F.col("pos") <= F.col("_wl"))
        adv = active & F.col("blen").isNotNull()
        state = st.select(
            "word",
            "freq",
            "_wl",
            F.when(adv, F.col("pos") + F.col("blen"))
            .otherwise(F.col("pos"))
            .alias("pos"),
            F.when(adv, F.col("np") + 1).otherwise(F.col("np")).alias("np"),
            F.when(adv, F.concat_ws(" ", F.col("pieces"), F.col("bdisp")))
            .otherwise(F.col("pieces"))
            .alias("pieces"),
            (F.col("stuck") | (active & F.col("blen").isNull())).alias("stuck"),
        )
        if i % 6 == 5:
            state = state.localCheckpoint(eager=False)
    ok = F.col("pos") == F.col("_wl") + 1
    return state.select(
        "word",
        "freq",
        F.when(ok, F.col("np")).otherwise(F.lit(1)).cast("long").alias("n_pieces"),
        F.when(ok, F.expr("trim(pieces)")).otherwise(F.lit("[UNK]")).alias("pieces"),
        (~ok).alias("is_unk"),
    )
