"""Record-linkage / training-pair query plans (r9): phonetic
(soundex) blocking for fuzzy entity matching, deterministic negative
sampling for recommender/contrastive training pairs, and Cohen's
kappa inter-rater agreement. Every op is pure JVM expressions or
keyed joins — no UDFs, no backreference regexes (RE2-safe so the
DuckDB oracle runs the IDENTICAL chain)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.plans.registry import query

# SQL-soundex: letters → digit classes (A..Z), vowels/H/W/Y → 0.
_SND_FROM = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SND_TO = "01230120022455012623010202"


def _soundex_sql(col: str) -> str:
    """The soundex chain as ANSI expressions BOTH engines run
    verbatim: letters-only upper → translate to digit classes →
    collapse digit runs with ten chained regexp_replace calls (RE2
    has no backreferences, so no '(\\d)\\1+') → drop zeros → drop the
    first letter's own surviving class digit → first letter + 3
    digits right-padded with zeros."""
    letters = f"regexp_replace(upper({col}), '[^A-Z]', '')"
    d = f"translate({letters}, '{_SND_FROM}', '{_SND_TO}')"
    for i in range(10):
        d = f"regexp_replace({d}, '{i}{{2,}}', '{i}')"
    z = f"replace({d}, '0', '')"
    first = f"substring({letters}, 1, 1)"
    first_cls = f"translate({first}, '{_SND_FROM}', '{_SND_TO}')"
    rest = (
        f"CASE WHEN {first_cls} <> '0' THEN substring({z}, 2) ELSE {z} END"
    )
    return (
        f"CASE WHEN length({letters}) = 0 THEN '' "
        f"ELSE {first} || rpad(substring({rest}, 1, 3), 3, '0') END"
    )


# ---------------------------------------------------------------------------
# Phonetic blocking: soundex codes over distinct part-name first
# words — names that sound alike land in one block, the classic
# cheap blocking key in front of expensive pair comparison (the
# q-gram blocking twin in fuzzy_name_match; soundex catches
# transcription variants q-grams miss). Blocks with >1 distinct name
# are the candidate sets. One scan + one code-keyed aggregate.
# ---------------------------------------------------------------------------
_NAME_SQL = "lower(string_split(p_name, ' ')[1])"
_NAME_SPARK = "lower(split(p_name, ' ')[0])"


@query(
    "phonetic_blocking",
    oracle=f"""
    WITH names AS (
      SELECT DISTINCT {_NAME_SQL} AS name FROM part
      WHERE length({_NAME_SQL}) > 0
    ),
    coded AS (
      SELECT name, {_soundex_sql("name")} AS code FROM names
    )
    SELECT code, CAST(count(*) AS BIGINT) AS n_names,
           min(name) AS first_name, max(name) AS last_name,
           CAST(CASE WHEN count(*) > 1 THEN 1 ELSE 0 END AS INT)
             AS needs_review
    FROM coded GROUP BY 1
    """,
)
def q_phonetic_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex phonetic blocking over distinct part-name first words: RE2-safe translate/collapse chain identical in both engines, blocks with >1 name flagged as candidate duplicate sets."""
    p = read_table(spark, sf_dir, "part")
    names = (
        p.select(F.expr(_NAME_SPARK).alias("name"))
        .filter(F.length("name") > 0)
        .distinct()
    )
    coded = names.withColumn("code", F.expr(_soundex_sql("name")))
    return coded.groupBy("code").agg(
        F.count(F.lit(1)).cast("long").alias("n_names"),
        F.min("name").alias("first_name"),
        F.max("name").alias("last_name"),
        F.when(F.count(F.lit(1)) > 1, 1).otherwise(0).cast("int").alias(
            "needs_review"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling: for every positive (customer, part)
# purchase pair, derive up to 3 negatives from the md5 lane
# (candidate_i = lane(u,p,i) mod max_part + 1, i < 5), rejecting
# candidates the customer actually bought (anti-join against the
# user's positive set) and keeping the first 3 surviving candidates
# in i-order. The contrastive-training-pair generator: one fact scan,
# a 5-way explode, one broadcast max, one keyed anti-join — no
# rejection loop, no RNG state.
# ---------------------------------------------------------------------------
@query(
    "negative_sampling_pairs",
    oracle="""
    WITH pos AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    mx AS (SELECT max(p_partkey) AS mp FROM part),
    cand AS (
      SELECT pos.u, pos.p, i.i,
             1 + ((SELECT
               (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456
             + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216
             + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576
             + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536
             + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096
             + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256
             + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1)
               FROM (SELECT md5(CAST(pos.u AS VARCHAR) || ':'
                      || CAST(pos.p AS VARCHAR) || ':'
                      || CAST(i.i AS VARCHAR)) AS h)) % mx.mp) AS neg
      FROM pos CROSS JOIN (SELECT unnest(range(0, 5)) AS i) i
      CROSS JOIN mx
    ),
    ok AS (
      SELECT c.u, c.p, c.i, c.neg
      FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM pos q
                        WHERE q.u = c.u AND q.p = c.neg)
    )
    SELECT u, p AS pos_part, neg AS neg_part, CAST(i AS INT) AS try_idx
    FROM (
      SELECT *, row_number() OVER (PARTITION BY u, p ORDER BY i) AS rn
      FROM ok
    ) WHERE rn <= 3
    """,
)
def q_negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-lane negative sampling: up to 3 non-purchased parts per positive pair via modular candidates + one anti-join rejection - no RNG state, no rejection loop."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    pos = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    mx = p.groupBy().agg(F.max("p_partkey").alias("mp"))
    i = spark.range(0, 5).select(F.col("id").cast("int").alias("i"))
    lane = (
        "CAST(conv(substring(md5(concat(CAST(u AS STRING), ':',"
        " CAST(p AS STRING), ':', CAST(i AS STRING))), 1, 8), 16, 10)"
        " AS BIGINT)"
    )
    cand = (
        pos.crossJoin(F.broadcast(i))
        .crossJoin(F.broadcast(mx))
        .withColumn("neg", F.expr(f"1 + ({lane} % mp)"))
    )
    anti = pos.select(
        F.col("u").alias("qu"), F.col("p").alias("qp")
    )
    ok = cand.join(
        anti,
        (F.col("u") == F.col("qu")) & (F.col("neg") == F.col("qp")),
        "left_anti",
    )
    wr = W.partitionBy("u", "p").orderBy("i")
    return (
        ok.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select(
            "u",
            F.col("p").alias("pos_part"),
            F.col("neg").alias("neg_part"),
            F.col("i").cast("int").alias("try_idx"),
        )
    )


# ---------------------------------------------------------------------------
# Cohen's kappa between two rule-based language raters — the 2×2
# identity κ = 2(n11·n00 − n10·n01) / ((n11+n10)(n10+n00) +
# (n11+n01)(n01+n00)): pure integer confusion cells from one scan,
# one exact division. Rater A: stopword permille ≥ 100; rater B:
# contains ' the '. The agreement primitive behind double-annotation
# quality audits of labeling pipelines.
# ---------------------------------------------------------------------------
@query(
    "cohens_kappa",
    oracle="""
    WITH d AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk,
             text
      FROM documents
    ),
    r AS (
      SELECT CASE WHEN 1000 * len(list_filter(tk, x -> x = 'the'
                       OR x = 'a')) >= 100 * len(tk)
                  THEN 1 ELSE 0 END AS ra,
             CASE WHEN strpos(text, ' the ') > 0 THEN 1 ELSE 0 END AS rb
      FROM d WHERE len(tk) > 0
    ),
    m AS (
      SELECT CAST(sum(ra * rb) AS BIGINT) AS n11,
             CAST(sum(ra * (1 - rb)) AS BIGINT) AS n10,
             CAST(sum((1 - ra) * rb) AS BIGINT) AS n01,
             CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS n00
      FROM r
    )
    SELECT n11, n10, n01, n00,
           CAST(2 * (n11 * n00 - n10 * n01) AS DOUBLE)
           / CAST((n11 + n10) * (n10 + n00)
                  + (n11 + n01) * (n01 + n00) AS DOUBLE) AS kappa
    FROM m
    """,
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two rule-based raters via the exact 2x2 integer identity - confusion cells from one scan, one division."""
    d = read_table(spark, sf_dir, "documents")
    tk = "filter(split(text, ' '), x -> x != '')"
    ra = F.expr(
        f"CASE WHEN 1000 * size(filter({tk}, x -> x = 'the' OR x = 'a'))"
        f" >= 100 * size({tk}) THEN 1 ELSE 0 END"
    )
    rb = F.when(F.instr(F.col("text"), " the ") > 0, 1).otherwise(0)
    r = d.filter(F.expr(f"size({tk}) > 0")).select(
        ra.alias("ra"), rb.alias("rb")
    )
    m = r.groupBy().agg(
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("n11"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("long").alias("n10"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("long").alias("n01"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb")))
        .cast("long")
        .alias("n00"),
    )
    num = 2 * (F.col("n11") * F.col("n00") - F.col("n10") * F.col("n01"))
    den = (F.col("n11") + F.col("n10")) * (F.col("n10") + F.col("n00")) + (
        F.col("n11") + F.col("n01")
    ) * (F.col("n01") + F.col("n00"))
    return m.select(
        "n11",
        "n10",
        "n01",
        "n00",
        (num.cast("double") / den.cast("double")).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# RAKE keyphrase extraction (r9): candidate phrases are maximal
# stopword-free token runs (the pos-minus-rank islands trick), each
# word scores deg/freq over the candidate set, and a phrase's RAKE
# score Σ deg(w)/freq(w) is carried as ONE EXACT FRACTION —
# num = Σ degᵢ·Π_{j≠i} freqⱼ, den = Π freqᵢ over ≤4 words — so the
# ranking double is a single division. Top-20 via orderBy+limit
# (TakeOrdered, distributed-safe), deterministic (score, phrase) tie
# order. The unsupervised cousin of textrank_keywords.
# ---------------------------------------------------------------------------
_RAKE_STOPS = "('the', 'a', 'of', 'and', 'in', 'to', 'is')"


@query(
    "rake_keyphrases",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, u.tok, u.pos
      FROM documents,
           LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
                           generate_subscripts(string_split(text, ' '), 1)
                             AS pos) u
    ),
    ns AS (
      SELECT doc_id, tok, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS island
      FROM toks WHERE tok <> '' AND tok NOT IN {_RAKE_STOPS}
    ),
    phr AS (
      SELECT doc_id, island,
             string_agg(tok, ' ' ORDER BY pos) AS phrase,
             CAST(count(*) AS BIGINT) AS plen
      FROM ns GROUP BY 1, 2 HAVING count(*) <= 4
    ),
    winst AS (
      SELECT ns.tok, phr.plen
      FROM ns JOIN phr ON phr.doc_id = ns.doc_id
       AND phr.island = ns.island
    ),
    wstat AS (
      SELECT tok, CAST(count(*) AS HUGEINT) AS freq,
             CAST(sum(plen) AS HUGEINT) AS deg
      FROM winst GROUP BY 1
    ),
    dphr AS (
      SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
             string_split(phrase, ' ') AS ws
      FROM phr GROUP BY 1
    ),
    scored AS (
      SELECT p.phrase, p.n_occurrences,
             CAST(coalesce(w1.deg, 0) * coalesce(w2.freq, 1)
                    * coalesce(w3.freq, 1) * coalesce(w4.freq, 1)
                + coalesce(w2.deg, 0) * coalesce(w1.freq, 1)
                    * coalesce(w3.freq, 1) * coalesce(w4.freq, 1)
                + coalesce(w3.deg, 0) * coalesce(w1.freq, 1)
                    * coalesce(w2.freq, 1) * coalesce(w4.freq, 1)
                + coalesce(w4.deg, 0) * coalesce(w1.freq, 1)
                    * coalesce(w2.freq, 1) * coalesce(w3.freq, 1)
               AS HUGEINT) AS num,
             CAST(coalesce(w1.freq, 1) * coalesce(w2.freq, 1)
                    * coalesce(w3.freq, 1) * coalesce(w4.freq, 1)
               AS HUGEINT) AS den
      FROM dphr p
      LEFT JOIN wstat w1 ON w1.tok = ws[1]
      LEFT JOIN wstat w2 ON w2.tok = ws[2]
      LEFT JOIN wstat w3 ON w3.tok = ws[3]
      LEFT JOIN wstat w4 ON w4.tok = ws[4]
    )
    SELECT phrase, n_occurrences, CAST(num AS BIGINT) AS num,
           CAST(den AS BIGINT) AS den,
           CAST(CAST(num AS VARCHAR) AS DOUBLE)
             / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS rake_score
    FROM scored
    ORDER BY rake_score DESC, phrase ASC LIMIT 20
    """,
)
def q_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrases: stopword-free island phrases, deg/freq word scores carried as one exact fraction per phrase (<=4 words), single-division ranking double, top-20 via distributed TakeOrdered."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    stops = ["the", "a", "of", "and", "in", "to", "is"]
    wn = W.partitionBy("doc_id").orderBy("pos")
    ns = (
        toks.filter((F.col("tok") != "") & ~F.col("tok").isin(stops))
        .withColumn("island", F.col("pos") - F.row_number().over(wn))
    )
    phr = (
        ns.groupBy("doc_id", "island")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("plen"),
        )
        .filter(F.col("plen") <= 4)
    )
    winst = ns.join(
        phr.select(
            F.col("doc_id").alias("pd"),
            F.col("island").alias("pi"),
            "plen",
        ),
        (F.col("doc_id") == F.col("pd")) & (F.col("island") == F.col("pi")),
    ).select("tok", "plen")
    wstat = winst.groupBy("tok").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("freq"),
        F.sum("plen").cast("decimal(38,0)").alias("deg"),
    )
    dphr = phr.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    ).withColumn("ws", F.split(F.col("phrase"), " "))
    j = dphr
    for i in range(1, 5):
        wi = wstat.select(
            F.col("tok").alias(f"t{i}"),
            F.col("freq").alias(f"f{i}"),
            F.col("deg").alias(f"d{i}"),
        )
        j = j.join(
            wi, F.try_element_at(F.col("ws"), F.lit(i)) == F.col(f"t{i}"),
            "left",
        )
    one = F.lit(1).cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    f = [F.coalesce(F.col(f"f{i}"), one) for i in range(1, 5)]
    dg = [F.coalesce(F.col(f"d{i}"), zero) for i in range(1, 5)]
    num = (
        dg[0] * f[1] * f[2] * f[3]
        + dg[1] * f[0] * f[2] * f[3]
        + dg[2] * f[0] * f[1] * f[3]
        + dg[3] * f[0] * f[1] * f[2]
    )
    den = f[0] * f[1] * f[2] * f[3]
    scored = j.select(
        "phrase",
        "n_occurrences",
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
        (
            num.cast("string").cast("double")
            / den.cast("string").cast("double")
        ).alias("rake_score"),
    )
    return scored.orderBy(
        F.col("rake_score").desc(), F.col("phrase").asc()
    ).limit(20)


# ---------------------------------------------------------------------------
# Fleiss' kappa (r9): chance-corrected agreement for THREE rule-based
# raters (stopword ratio / ' the ' / ' a ') on the binary english
# call — the multi-annotator generalization of cohens_kappa. With
# n = 3 raters and votes v ∈ {0..3} per item, the per-item agreement
# P_i = (v² + (3−v)² − 3)/6 folds to integer sums (Σv, Σv²), and P̄,
# P̄_e, κ are a fixed-order double combine of those exact integers —
# one scan, no per-item float math.
# ---------------------------------------------------------------------------
@query(
    "fleiss_kappa",
    oracle="""
    WITH d AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk,
             text
      FROM documents
    ),
    r AS (
      SELECT (CASE WHEN 1000 * len(list_filter(tk, x -> x = 'the'
                        OR x = 'a')) >= 100 * len(tk)
                   THEN 1 ELSE 0 END
            + CASE WHEN strpos(text, ' the ') > 0 THEN 1 ELSE 0 END
            + CASE WHEN strpos(text, ' a ') > 0 THEN 1 ELSE 0 END)
               AS v
      FROM d WHERE len(tk) > 0
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(v * v) AS BIGINT) AS svv
      FROM r
    )
    SELECT n_items, sv, svv,
           CAST(2 * svv - 6 * sv + 9 * n_items - 3 * n_items AS DOUBLE)
             / CAST(6 * n_items AS DOUBLE) AS p_bar,
           (CAST(sv AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
             * (CAST(sv AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
           + (1 - CAST(sv AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
             * (1 - CAST(sv AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
             AS p_e,
           ((CAST(2 * svv - 6 * sv + 9 * n_items - 3 * n_items AS DOUBLE)
               / CAST(6 * n_items AS DOUBLE))
            - ((CAST(sv AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
                 * (CAST(sv AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
               + (1 - CAST(sv AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
                 * (1 - CAST(sv AS DOUBLE)
                        / CAST(3 * n_items AS DOUBLE))))
           / (1 - ((CAST(sv AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
                     * (CAST(sv AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
                   + (1 - CAST(sv AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
                     * (1 - CAST(sv AS DOUBLE)
                            / CAST(3 * n_items AS DOUBLE))))
             AS kappa
    FROM m
    """,
)
def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa for three rule-based raters: per-item agreement folded to integer vote sums ((v^2+(3-v)^2-3)/6), chance correction and kappa as one fixed-order combine."""
    d = read_table(spark, sf_dir, "documents")
    tk = "filter(split(text, ' '), x -> x != '')"
    v = (
        F.expr(
            f"CASE WHEN 1000 * size(filter({tk}, x -> x = 'the' OR"
            f" x = 'a')) >= 100 * size({tk}) THEN 1 ELSE 0 END"
        )
        + F.when(F.instr(F.col("text"), " the ") > 0, 1).otherwise(0)
        + F.when(F.instr(F.col("text"), " a ") > 0, 1).otherwise(0)
    )
    r = d.filter(F.expr(f"size({tk}) > 0")).select(v.alias("v"))
    m = r.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
    )
    n = F.col("n_items")
    p_bar = (
        2 * F.col("svv") - 6 * F.col("sv") + 9 * n - 3 * n
    ).cast("double") / (6 * n).cast("double")
    p1 = F.col("sv").cast("double") / (3 * n).cast("double")
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    return m.select(
        "n_items",
        "sv",
        "svv",
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (1 - p_e)).alias("kappa"),
    )
