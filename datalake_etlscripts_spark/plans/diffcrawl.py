"""Field-diff, crawl, and version-history queries (F17/F18, S10, A3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.crawl import crawl, extract_urls, prune_urls
from datalake_etlscripts_spark.functions.scalar import format_ntp_id
from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.operators.diffpatch import diff_columns
from datalake_etlscripts_spark.plans.registry import query


# ---------------------------------------------------------------------------
# F17: field-level diff between two derived versions of each customer's
# order profile (old = orders %3!=0 latest, new = %3==0 latest)
# ---------------------------------------------------------------------------
@query(
    "field_diff",
    oracle="""
    WITH base AS (
      SELECT CAST(o_custkey AS VARCHAR) AS id, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts,
             o_orderpriority AS prio,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price
      FROM orders
    ),
    oldv AS (
      SELECT id, prio AS old_title, price AS old_price FROM (
        SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts DESC, o_orderkey DESC) rn
        FROM base WHERE o_orderkey % 3 <> 0) WHERE rn = 1
    ),
    newv AS (
      SELECT id, prio AS new_title, price AS new_price FROM (
        SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts DESC, o_orderkey DESC) rn
        FROM base WHERE o_orderkey % 3 = 0) WHERE rn = 1
    ),
    j AS (SELECT * FROM oldv JOIN newv USING (id)),
    d AS (
      SELECT id, 'title' AS field, old_title AS old_value, new_title AS new_value FROM j
      UNION ALL
      SELECT id, 'price', old_price, new_price FROM j
    )
    SELECT id, field, old_value, new_value,
           CASE WHEN (old_value IS NULL OR old_value = '')
                     AND new_value IS NOT NULL AND new_value <> '' THEN 'add'
                WHEN old_value IS NOT NULL AND old_value <> ''
                     AND (new_value IS NULL OR new_value = '') THEN 'del'
                ELSE 'mod' END AS kind
    FROM d
    WHERE NOT (coalesce(old_value,'') = coalesce(new_value,''))
    """,
)
def q_field_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-field diff between two record versions: (field, old, new) rows for changed fields only (F17)."""
    o = read_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_custkey").cast("string").alias("id"),
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price"),
    )
    w = W.partitionBy("id").orderBy(F.desc("ts"), F.desc("o_orderkey"))

    def latest(df, prefix):
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "id",
                F.col("prio").alias(f"{prefix}title"),
                F.col("price").alias(f"{prefix}price"),
            )
        )

    oldv = latest(base.filter(F.col("o_orderkey") % 3 != 0), "old_")
    newv = latest(base.filter(F.col("o_orderkey") % 3 == 0), "new_")
    joined = oldv.join(newv, "id")
    return diff_columns(joined, ["title", "price"], ["id"])


# ---------------------------------------------------------------------------
# S10: offline crawl over URLs derived from part rows — the fake fetcher
# is deterministic (status/type/bytes from the URL text), so even the
# external-I/O operator gets a SQL oracle
# ---------------------------------------------------------------------------
@query(
    "crawl_fetch",
    oracle="""
    WITH docs AS (
      SELECT printf('ntp%08d', p_partkey) AS ntp_id,
             'http://docs' || CAST(p_partkey % 5 AS VARCHAR) ||
                '.example/files/' ||
                CASE WHEN p_partkey % 11 = 0 THEN 'missing' ELSE 'doc' END ||
                CAST(p_partkey AS VARCHAR) AS url
      FROM part WHERE p_partkey <= 1000
    )
    SELECT ntp_id, 'doc_url' AS field, url,
           CASE WHEN url LIKE '%missing%' THEN -1 ELSE 200 END AS status,
           CASE WHEN url LIKE '%missing%' THEN ''
                WHEN length(url) % 2 = 0 THEN 'pdf' ELSE 'docx' END AS doc_type,
           CASE WHEN url LIKE '%missing%' THEN 0
                ELSE length('content-of:' || url) END AS n_bytes
    FROM docs
    """,
)
def q_crawl_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline crawl pipeline: URL extract, prune, host-partitioned mapInPandas fetch against a deterministic fake fetcher."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    docs = p.select(
        format_ntp_id(F.col("p_partkey")).alias("_id"),
        F.concat(
            F.lit("http://docs"),
            (F.col("p_partkey") % 5).cast("string"),
            F.lit(".example/files/"),
            F.when(F.col("p_partkey") % 11 == 0, F.lit("missing")).otherwise(F.lit("doc")),
            F.col("p_partkey").cast("string"),
        ).alias("doc_url"),
    )
    urls = prune_urls(extract_urls(docs, scalar_cols=("doc_url",)))
    return crawl(urls).drop("idx")


# ---------------------------------------------------------------------------
# S10/F14/F15: the PRODUCTION fetch policy (fetchpolicy.py — redirect
# loop ≤30 hops, HTML meta-refresh chase with relative resolve,
# content-type/disposition sniffing, accepted-extension whitelist,
# SSL/timeout classification) driven through the crawl mapInPandas
# over a deterministic fake transport. Every policy path is exercised
# by construction (p_partkey % 10 selects the scenario), so the whole
# state machine gets a SQL oracle.
# ---------------------------------------------------------------------------
def _fake_policy_transport(url: str):
    """Offline transport: behavior chosen by the URL's path segment.
    Deterministic — the oracle below replays each scenario in SQL."""
    from datalake_etlscripts_spark.fetchpolicy import (
        Response,
        TransportSSLError,
        TransportTimeout,
    )

    if "/ssl/" in url:
        raise TransportSSLError(url)
    if "/timeout/" in url:
        raise TransportTimeout(url)
    if "/missing/" in url:
        return Response(404)
    if "/redirloop/" in url:  # never lands — exercises the hop cap
        return Response(302, {"location": url})
    if "/redir3/" in url:
        return Response(301, {"location": url.replace("/redir3/", "/redir2/")})
    if "/redir2/" in url:
        return Response(302, {"location": url.replace("/redir2/", "/redir1/")})
    if "/redir1/" in url:
        return Response(307, {"location": url.replace("/redir1/", "/file/")})
    if "/meta/" in url or "/metabad/" in url:
        # html page whose only content is a meta refresh to a RELATIVE
        # path — the policy must resolve it against scheme://host
        seg = "/metabad/" if "/metabad/" in url else "/meta/"
        target = "/missing/" if seg == "/metabad/" else "/pdf/"
        path = url.split(".example", 1)[1].replace(seg, target)
        body = f'<html><meta http-equiv="refresh" content="0;url={path}"></html>'
        return Response(200, {"content-type": "text/html; charset=utf-8"}, body.encode())
    if "/html/" in url:
        return Response(200, {"content-type": "text/html"}, b"<html>plain</html>")
    if "/exe/" in url:
        return Response(
            200, {"content-disposition": "attachment; filename=setup.exe"}, b"MZ"
        )
    if "/disp/" in url:  # disposition wins; ' .' cleanup path
        return Response(
            200,
            {"content-disposition": "attachment; filename=data .xlsx"},
            f"file-of:{url}".encode(),
        )
    if "/file/" in url or "/pdf/" in url:
        return Response(
            200, {"content-type": "application/pdf"}, f"file-of:{url}".encode()
        )
    return Response(404)


_POLICY_SEGMENTS = [
    "/redir3/", "/redirloop/", "/meta/", "/metabad/", "/html/",
    "/exe/", "/ssl/", "/timeout/", "/disp/", "/missing/",
]


@query(
    "crawl_fetch_policy",
    oracle="""
    WITH docs AS (
      SELECT printf('ntp%08d', p_partkey) AS ntp_id, p_partkey AS k,
             'http://site' || CAST(p_partkey % 7 AS VARCHAR) || '.example' ||
             CASE p_partkey % 10
               WHEN 0 THEN '/redir3/'  WHEN 1 THEN '/redirloop/'
               WHEN 2 THEN '/meta/'    WHEN 3 THEN '/metabad/'
               WHEN 4 THEN '/html/'    WHEN 5 THEN '/exe/'
               WHEN 6 THEN '/ssl/'     WHEN 7 THEN '/timeout/'
               WHEN 8 THEN '/disp/'    ELSE '/missing/' END
             || 'file' || CAST(p_partkey AS VARCHAR) AS url
      FROM part WHERE p_partkey <= 1000
    )
    SELECT ntp_id, 'doc_url' AS field, url,
      CASE k % 10
        WHEN 0 THEN 200 WHEN 1 THEN 302 WHEN 2 THEN 200 WHEN 3 THEN 404
        WHEN 4 THEN 2   WHEN 5 THEN 2   WHEN 6 THEN 3   WHEN 7 THEN -1
        WHEN 8 THEN 200 ELSE 404 END AS status,
      CASE k % 10
        WHEN 0 THEN 'pdf' WHEN 2 THEN 'pdf' WHEN 4 THEN 'html'
        WHEN 5 THEN 'exe' WHEN 8 THEN 'xlsx' ELSE '' END AS doc_type,
      CAST(CASE k % 10
        WHEN 0 THEN length('file-of:' || replace(url, '/redir3/', '/file/'))
        WHEN 2 THEN length('file-of:' || replace(url, '/meta/', '/pdf/'))
        WHEN 8 THEN length('file-of:' || url)
        ELSE 0 END AS BIGINT) AS n_bytes
    FROM docs
    """,
)
def q_crawl_fetch_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production fetch policy through the crawl mapInPandas: redirect loop, meta-refresh chase, content-type map, extension whitelist, SSL classes - against a deterministic offline transport."""
    from datalake_etlscripts_spark.fetchpolicy import policy_fetcher

    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    seg = F.element_at(
        F.array(*[F.lit(s) for s in _POLICY_SEGMENTS]),
        (F.col("p_partkey") % 10 + 1).cast("int"),
    )
    docs = p.select(
        format_ntp_id(F.col("p_partkey")).alias("_id"),
        F.concat(
            F.lit("http://site"),
            (F.col("p_partkey") % 7).cast("string"),
            F.lit(".example"),
            seg,
            F.lit("file"),
            F.col("p_partkey").cast("string"),
        ).alias("doc_url"),
    )
    urls = prune_urls(extract_urls(docs, scalar_cols=("doc_url",)))
    return crawl(urls, fetcher=policy_fetcher(_fake_policy_transport)).drop("idx")


# ---------------------------------------------------------------------------
# A3: version history per natural key (clean_place.py:112-120,174):
# sorted list of (first_update, _id) pairs + version count
# ---------------------------------------------------------------------------
@query(
    "version_history",
    oracle="""
    WITH ex_rows AS (
      SELECT CAST(o_custkey AS VARCHAR) AS id,
             CASE WHEN o_custkey % 50 = 0 THEN o_orderkey % 2 ELSE 0 END AS part,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    ex_groups AS (
      SELECT id, part, min(ts) AS first_upd FROM ex_rows GROUP BY id, part
    ),
    store AS (
      SELECT printf('ntp%08d', row_number() OVER (ORDER BY id, part)) AS _id,
             id, first_upd
      FROM ex_groups
    )
    SELECT id, count(*) AS n_versions,
           array_to_string(list_sort(list(first_upd || '|' || _id)), ';') AS updates_dates_list
    FROM store GROUP BY id
    """,
)
def q_version_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key version history: ordered struct set of (order, _id, obsolete) collected per natural key."""
    o = read_table(spark, sf_dir, "orders")
    ex = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_custkey").cast("string").alias("id"),
        F.when(F.col("o_custkey") % 50 == 0, F.col("o_orderkey") % 2)
        .otherwise(F.lit(0))
        .alias("part"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )
    groups = ex.groupBy("id", "part").agg(F.min("ts").alias("first_upd"))
    store = groups.select(
        format_ntp_id(F.row_number().over(W.orderBy("id", "part"))).alias("_id"),
        "id",
        "first_upd",
    )
    return store.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.array_join(
            F.array_sort(F.collect_list(F.concat_ws("|", "first_upd", "_id"))), ";"
        ).alias("updates_dates_list"),
    )


# ---------------------------------------------------------------------------
# F16: debug DNS resolve (ntp_utils.py:185-191 get_ips), distinct-host
# mapInPandas with an injectable resolver. The registered query runs a
# DETERMINISTIC fake resolver (IP octets carved from md5 hex pairs of
# the host; a second address present when the 32-bit prefix is odd) so
# DuckDB replays every resolved row; production drops in
# crawl.default_resolver (stdlib getaddrinfo).
# ---------------------------------------------------------------------------
def _fake_resolver(host: str) -> list[str]:
    import hashlib

    d = hashlib.md5(host.encode()).hexdigest()

    def ip(off: int) -> str:
        return ".".join(str(int(d[off + 2 * i : off + 2 * i + 2], 16)) for i in range(4))

    ips = [ip(0)]
    if int(d[:8], 16) & 1:
        ips.append(ip(8))
    return ips


def _ddb_octet(pos: int) -> str:
    """DuckDB: hex digit pair of md5(host) at 1-based ``pos`` → 0-255."""
    return (
        f"CAST((strpos('0123456789abcdef', substr(d, {pos}, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr(d, {pos + 1}, 1)) - 1) AS VARCHAR)"
    )


def _ddb_fake_ip(off: int) -> str:
    return " || '.' || ".join(_ddb_octet(off + 2 * i) for i in range(4))


def _dns_oracle() -> str:
    from datalake_etlscripts_spark.plans.registry import ddb_hex32

    return f"""
    WITH hosts AS (
      SELECT DISTINCT 'docs' || CAST(p_partkey % 5 AS VARCHAR) || '.example' AS host
      FROM part WHERE p_partkey <= 1000
    ),
    m AS (SELECT host, md5(host) AS d, {ddb_hex32('md5(host)')} AS h FROM hosts)
    SELECT host, 0 AS idx, {_ddb_fake_ip(1)} AS ip FROM m
    UNION ALL
    SELECT host, 1 AS idx, {_ddb_fake_ip(9)} AS ip FROM m WHERE (h & 1) = 1
    """


@query("dns_resolve", oracle=_dns_oracle())
def q_dns_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-host DNS resolution (F16) through an injectable resolver; the registered run uses a deterministic md5-derived fake."""
    from datalake_etlscripts_spark.crawl import resolve_hosts

    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    urls = p.select(
        F.concat(
            F.lit("http://docs"),
            (F.col("p_partkey") % 5).cast("string"),
            F.lit(".example/files/doc"),
            F.col("p_partkey").cast("string"),
        ).alias("url")
    )
    return resolve_hosts(urls, resolver=_fake_resolver)


# ---------------------------------------------------------------------------
# Mergeable Bloom-filter membership state (operators/sketches.py): the
# crawl-recovery pre-filter — "was this document name already stored?"
# answered from broadcast-sized bit words before any exact anti-join.
# Built INCREMENTALLY from two half-batches (union + bit_or merge);
# md5 hash lanes → DuckDB replays bit placement and the probe verdicts
# bit-for-bit, false positives included.
# ---------------------------------------------------------------------------
def _bloom_oracle() -> str:
    from datalake_etlscripts_spark.operators.sketches import (
        BLOOM_BITS,
        BLOOM_HASHES,
    )
    from datalake_etlscripts_spark.plans.registry import ddb_hex32

    h1 = ddb_hex32("md5(name)")
    h2 = ddb_hex32("md5(name)", 8)
    return f"""
    WITH members AS (
      SELECT printf('ntp%08d_doc.pdf', p_partkey) AS name
      FROM part WHERE p_partkey <= 1000 AND p_partkey % 3 <> 0
    ),
    mh AS (SELECT name, {h1} AS h1, {h2} AS h2 FROM members),
    mpos AS (
      SELECT ((h1 + i.i * h2) % {BLOOM_BITS}) AS p
      FROM mh CROSS JOIN (SELECT unnest(range({BLOOM_HASHES})) AS i) i
    ),
    words AS (
      SELECT CAST(p // 32 AS INT) AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
      FROM mpos GROUP BY 1
    ),
    probes AS (
      SELECT printf('ntp%08d_doc.pdf', p_partkey) AS name
      FROM part WHERE p_partkey <= 1000
    ),
    ph AS (SELECT name, {h1} AS h1, {h2} AS h2 FROM probes),
    ppos AS (
      SELECT name, ((h1 + i.i * h2) % {BLOOM_BITS}) AS p
      FROM ph CROSS JOIN (SELECT unnest(range({BLOOM_HASHES})) AS i) i
    ),
    hits AS (
      SELECT name,
             CASE WHEN ((coalesce(w.bits, 0) >> CAST(p % 32 AS INT)) & 1) = 1
                  THEN 1 ELSE 0 END AS hit
      FROM ppos LEFT JOIN words w ON w.word_idx = CAST(p // 32 AS INT)
    )
    SELECT name, sum(hit) = {BLOOM_HASHES} AS maybe_member
    FROM hits GROUP BY name
    """


@query("bloom_prefilter", oracle=_bloom_oracle())
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership pre-filter: word table built incrementally from two half-batches (bit_or merge), broadcast-probed by candidate names."""
    from datalake_etlscripts_spark.operators import sketches

    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    names = p.select(
        F.concat(format_ntp_id(F.col("p_partkey")), F.lit("_doc.pdf")).alias("name"),
        F.col("p_partkey"),
    )
    members = names.filter(F.col("p_partkey") % 3 != 0).select("name")
    halves = [
        members.filter(F.crc32(F.col("name")) % 2 == i) for i in (0, 1)
    ]
    state = sketches.merge_bloom_tables(
        *[sketches.bloom_table(h, "name") for h in halves]
    )
    return sketches.bloom_probe(names.select("name"), state, "name")


# ---------------------------------------------------------------------------
# per-host crawl accounting: the politeness/ops dashboard the reference
# logs by hand (get_documents.py outcome tallies), as one aggregate
# ---------------------------------------------------------------------------
@query(
    "crawl_host_stats",
    oracle="""
    WITH docs AS (
      SELECT printf('ntp%08d', p_partkey) AS ntp_id,
             'http://docs' || CAST(p_partkey % 5 AS VARCHAR) ||
                '.example/files/' ||
                CASE WHEN p_partkey % 11 = 0 THEN 'missing' ELSE 'doc' END ||
                CAST(p_partkey AS VARCHAR) AS url
      FROM part WHERE p_partkey <= 1000
    ),
    fetched AS (
      SELECT 'docs' || CAST(p AS VARCHAR) || '.example' AS host, url,
             CASE WHEN url LIKE '%missing%' THEN -1 ELSE 200 END AS status,
             CASE WHEN url LIKE '%missing%' THEN 0
                  ELSE length('content-of:' || url) END AS n_bytes
      FROM (SELECT url, CAST(substr(url, 12, 1) AS INT) AS p FROM docs)
    )
    SELECT host,
           count(*) AS n_urls,
           CAST(COALESCE(SUM(CASE WHEN status = 200 THEN 1 END), 0) AS BIGINT) AS n_ok,
           CAST(COALESCE(SUM(CASE WHEN status <> 200 THEN 1 END), 0) AS BIGINT) AS n_err,
           CAST(COALESCE(SUM(n_bytes), 0) AS BIGINT) AS total_bytes,
           CAST(COALESCE(SUM(CASE WHEN status <> 200 THEN 1 END), 0) AS DOUBLE)
             / count(*) AS err_rate
    FROM fetched GROUP BY host
    """,
)
def q_crawl_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl accounting (urls, ok/err, bytes, error rate) from one aggregate over the fetch results - the politeness dashboard behind per-server delays and skip lists."""
    from datalake_etlscripts_spark.functions.scalar import url_host

    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    docs = p.select(
        format_ntp_id(F.col("p_partkey")).alias("_id"),
        F.concat(
            F.lit("http://docs"),
            (F.col("p_partkey") % 5).cast("string"),
            F.lit(".example/files/"),
            F.when(F.col("p_partkey") % 11 == 0, F.lit("missing")).otherwise(F.lit("doc")),
            F.col("p_partkey").cast("string"),
        ).alias("doc_url"),
    )
    fetched = crawl(prune_urls(extract_urls(docs, scalar_cols=("doc_url",))))
    return fetched.groupBy(url_host(F.col("url")).alias("host")).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.coalesce(
            F.sum(F.when(F.col("status") == 200, 1)), F.lit(0)
        ).cast("long").alias("n_ok"),
        F.coalesce(
            F.sum(F.when(F.col("status") != 200, 1)), F.lit(0)
        ).cast("long").alias("n_err"),
        F.coalesce(F.sum("n_bytes"), F.lit(0)).cast("long").alias("total_bytes"),
        (
            F.coalesce(F.sum(F.when(F.col("status") != 200, 1)), F.lit(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("err_rate"),
    )


# ---------------------------------------------------------------------------
# RefinedWeb-style scored URL filter: weighted bad-word occurrences
# (substring, half-unit integer weights) + scheme / asset-extension
# gates. The word lists come from the part-name vocabulary so every
# policy path fires by construction.
# ---------------------------------------------------------------------------
_URLF = dict(strict=("hot",), hard=("red", "gear"), soft=("small", "blue"))


@query(
    "url_filter_scored",
    oracle="""
    WITH urls AS (
      SELECT p_partkey AS key,
             CASE WHEN p_partkey % 17 = 0 THEN 'ftp://' ELSE 'http://' END
             || 'files' || CAST(p_partkey % 5 AS VARCHAR) || '.example/'
             || replace(p_name, ' ', '-') || '/page'
             || CAST(p_partkey AS VARCHAR)
             || CASE WHEN p_partkey % 13 = 0 THEN '.js' ELSE '.html' END AS url
      FROM part
    ),
    scored AS (
      SELECT key, url, lower(url) AS u,
             CAST((length(u) - length(replace(u, 'hot', ''))) / 3 AS BIGINT) * 4
           + CAST((length(u) - length(replace(u, 'red', ''))) / 3 AS BIGINT) * 2
           + CAST((length(u) - length(replace(u, 'gear', ''))) / 4 AS BIGINT) * 2
           + CAST((length(u) - length(replace(u, 'small', ''))) / 5 AS BIGINT) * 1
           + CAST((length(u) - length(replace(u, 'blue', ''))) / 4 AS BIGINT) * 1
             AS half,
             regexp_matches(u, '^https?://') AS scheme_ok,
             (u LIKE '%.css' OR u LIKE '%.js' OR u LIKE '%.ico'
              OR u LIKE '%.woff') AS ext_bad
      FROM urls
    )
    SELECT key, url,
           CAST(half AS DOUBLE) / 2.0 AS score,
           (scheme_ok AND NOT ext_bad AND half < 4) AS keep,
           concat_ws(',',
             CASE WHEN NOT scheme_ok THEN 'scheme' END,
             CASE WHEN ext_bad THEN 'ext' END,
             CASE WHEN half >= 4 THEN 'score' END) AS fail_reasons
    FROM scored
    """,
)
def q_url_filter_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style scored URL filter: weighted bad-word substring score (exact half-unit integers) + scheme and asset-extension gates - pure per-row expressions, no shuffle."""
    from datalake_etlscripts_spark.crawl import url_quality_filter

    p = read_table(spark, sf_dir, "part")
    urls = p.select(
        F.col("p_partkey").alias("key"),
        F.concat(
            F.when(F.col("p_partkey") % 17 == 0, F.lit("ftp://")).otherwise(
                F.lit("http://")
            ),
            F.lit("files"),
            (F.col("p_partkey") % 5).cast("string"),
            F.lit(".example/"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("-")),
            F.lit("/page"),
            F.col("p_partkey").cast("string"),
            F.when(F.col("p_partkey") % 13 == 0, F.lit(".js")).otherwise(
                F.lit(".html")
            ),
        ).alias("url"),
    )
    return url_quality_filter(
        urls,
        strict_words=_URLF["strict"],
        hard_words=_URLF["hard"],
        soft_words=_URLF["soft"],
    )


# ---------------------------------------------------------------------------
# Bloom-filter acceptance audit (r13): the MEASURED false-positive
# rate of the crawl-recovery Bloom filter against ground truth — the
# sketch-acceptance sibling of ann_recall_mrr / quantile_sketch_
# error_audit. Members must all hit (zero false negatives is the
# Bloom guarantee — asserted as a count the driver hashes), known
# non-members that hit are false positives; one exact division for
# the permille rate. Composes the registered bloom_prefilter oracle.
# ---------------------------------------------------------------------------
@query(
    "bloom_fpr_audit",
    oracle=f"""
    WITH probe AS ({_bloom_oracle()}),
    lab AS (
      SELECT maybe_member,
             CAST(substr(name, 4, 8) AS BIGINT) % 3 <> 0 AS is_member
      FROM probe
    )
    SELECT CAST(count(*) FILTER (is_member) AS BIGINT) AS n_members,
           CAST(count(*) FILTER (is_member AND maybe_member) AS BIGINT)
             AS n_member_hits,
           CAST(count(*) FILTER (NOT is_member) AS BIGINT) AS n_nonmembers,
           CAST(count(*) FILTER (NOT is_member AND maybe_member) AS BIGINT)
             AS n_false_positives,
           CAST(count(*) FILTER (NOT is_member AND maybe_member) * 1000
                // count(*) FILTER (NOT is_member) AS BIGINT)
             AS fpr_permille
    FROM lab
    """,
)
def q_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured Bloom false-positive rate against ground truth: members must all hit (the zero-false-negative guarantee as a checked count), non-member hits are false positives, permille rate by exact integer division - the sketch-acceptance audit for the membership lane."""
    from datalake_etlscripts_spark.operators import sketches

    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    names = p.select(
        F.concat(format_ntp_id(F.col("p_partkey")), F.lit("_doc.pdf")).alias(
            "name"
        ),
        (F.col("p_partkey") % 3 != 0).alias("is_member"),
    )
    state = sketches.bloom_table(
        names.filter(F.col("is_member")).select("name"), "name"
    )
    probed = sketches.bloom_probe(names.select("name"), state, "name").join(
        names, "name"
    )
    mm = F.col("maybe_member")
    im = F.col("is_member")
    return probed.agg(
        F.sum(F.when(im, 1).otherwise(0)).cast("long").alias("n_members"),
        F.sum(F.when(im & mm, 1).otherwise(0))
        .cast("long")
        .alias("n_member_hits"),
        F.sum(F.when(~im, 1).otherwise(0)).cast("long").alias("n_nonmembers"),
        F.sum(F.when((~im) & mm, 1).otherwise(0))
        .cast("long")
        .alias("n_false_positives"),
        F.expr(
            "CAST(sum(CASE WHEN NOT is_member AND maybe_member THEN 1 "
            "ELSE 0 END) * 1000 div "
            "sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("fpr_permille"),
    )
