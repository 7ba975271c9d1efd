"""Document-crawl plumbing — get_documents.py semantics, Spark-shaped.

The reference walks notices sequentially, extracts URLs from document
fields, sleeps between same-host requests, and stores fetched files
(get_documents.py:156-214, ntp_entry.py:124-216). The Spark shape:

  1. URL table: stack the URL-bearing string columns + posexplode the
     array ones → (ntp_id, field, idx, url) rows (F8 semantics,
     ntp_entry.py:111-121)
  2. prune: skip-listed fields/servers anti-joined away
     (get_documents.py:170-184); already-fetched files anti-joined
     against the documents metadata table (ntp_entry.py:143-149)
  3. repartition by host so each partition holds whole hosts →
     per-host politeness delay inside the fetch UDF is LOCAL to a
     partition (per-key rate limiting without coordination)
  4. fetch via mapInPandas (Arrow batches); the HTTP client is
     injectable — tests use a deterministic fake, production drops in
     ``requests`` with the reference's timeout/redirect policy
     (ntp_constants.py:10-13: 10 s timeout, ≤30 hops)

No live HTTP in this repo's tests (SURVEY.md §7 Phase 4).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_etlscripts_spark.functions.scalar import clean_url, url_host

FETCH_SCHEMA = (
    "ntp_id string, field string, url string, status int, "
    "doc_type string, n_bytes bigint"
)

# reference status codes (nextplib/ntp_constants.py:15-20)
STATUS_OK = 200
STATUS_SKIPPED = 1
STATUS_UNWANTED = 2
STATUS_SSL_ERROR = 3
STATUS_ERROR = -1


def extract_urls(
    df: DataFrame,
    id_col: str = "_id",
    scalar_cols: tuple[str, ...] = (),
    array_cols: tuple[str, ...] = (),
) -> DataFrame:
    """F8: (ntp_id, field, idx, url) from URL-bearing columns; arrays
    address elements as 'field:idx' like the reference
    (ntp_entry.py:111-121)."""
    parts = []
    for c in scalar_cols:
        parts.append(
            df.select(
                F.col(id_col).alias("ntp_id"),
                F.lit(c).alias("field"),
                F.lit(None).cast("int").alias("idx"),
                F.col(c).alias("url"),
            )
        )
    for c in array_cols:
        parts.append(
            df.select(F.col(id_col).alias("ntp_id"), F.posexplode(c).alias("idx", "url"))
            .select(
                "ntp_id",
                F.concat_ws(":", F.lit(c), F.col("idx")).alias("field"),
                "idx",
                "url",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("url").startswith("http")).withColumn(
        "url", clean_url(F.col("url"))
    )


def prune_urls(
    urls: DataFrame,
    skip_fields: DataFrame | None = None,
    skip_servers: DataFrame | None = None,
    already_fetched: DataFrame | None = None,
) -> DataFrame:
    """P10 + skip-early: anti-join the three exclusion sets
    (get_documents.py:170-184; ntp_entry.py:143-149)."""
    out = urls.withColumn("host", url_host(F.col("url")))
    if skip_fields is not None:
        out = out.join(F.broadcast(skip_fields), "field", "left_anti")
    if skip_servers is not None:
        out = out.join(F.broadcast(skip_servers), "host", "left_anti")
    if already_fetched is not None:
        out = out.join(already_fetched, ["ntp_id", "field"], "left_anti")
    return out


def default_resolver(host: str) -> list[str]:
    """Production DNS lookup (stdlib getaddrinfo — the reference uses
    dns.resolver, ntp_utils.py:185-191; same observable contract:
    host → list of address strings, empty on failure)."""
    import socket

    try:
        infos = socket.getaddrinfo(host, None)
    except OSError:
        return []
    return sorted({i[4][0] for i in infos})


def resolve_hosts(
    urls: DataFrame,
    url_col: str = "url",
    resolver: Callable[[str], list[str]] | None = None,
) -> DataFrame:
    """F16 (debug DNS resolve, ntp_utils.py:185-191), Spark-shaped:
    resolution is per-HOST, so the URL table collapses to distinct
    hosts first (tiny — never one lookup per URL), then a mapInPandas
    stage runs the injectable ``resolver`` per host. Returns
    (host, idx, ip) rows — one row per resolved address, no array
    output. Distributed and de-duplicated; at scale the distinct-host
    shuffle is the only data movement."""
    res = resolver or default_resolver
    hosts = (
        urls.select(url_host(F.col(url_col)).alias("host"))
        .filter(F.col("host").isNotNull() & (F.col("host") != ""))
        .distinct()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"host": [], "idx": [], "ip": []}
            for h in pdf["host"]:
                for i, ip in enumerate(res(h)):
                    out["host"].append(h)
                    out["idx"].append(i)
                    out["ip"].append(ip)
            yield pd.DataFrame(out, columns=["host", "idx", "ip"])

    return hosts.mapInPandas(run, "host string, idx int, ip string")


def fake_fetcher(url: str) -> tuple[int, str, bytes]:
    """Deterministic offline fetcher for tests: status/type/bytes
    derived from the URL text."""
    if "missing" in url:
        return STATUS_ERROR, "", b""
    body = f"content-of:{url}".encode()
    ext = "pdf" if len(url) % 2 == 0 else "docx"
    return STATUS_OK, ext, body


def crawl(
    urls: DataFrame,
    fetcher: Callable[[str], tuple[int, str, bytes]] = fake_fetcher,
    delay_s: float = 0.0,
    host_partitions: int | None = None,
    store=None,
) -> DataFrame:
    """Fetch stage: repartition by host (politeness locality), then
    mapInPandas batches call the fetcher with a same-host delay
    (get_documents.py:177-180). Returns FETCH_SCHEMA rows.

    ``store`` (optional, e.g. storage.DiskStorage) receives each
    accepted body as '{ntp_id}_{field}.{doc_type}' INSIDE the fetch
    task — the reference's store_document shape (ntp_entry.py:199-204)
    where fetch and store share the request; the field's ':' array
    addressing becomes '_' in file names like the reference's
    get_file_name. Without a store, bodies are summarized as n_bytes
    and the write stays in a sink callback (K3), keeping fetch and
    store composable."""
    parts = urls.repartition(
        *( [host_partitions] if host_partitions else [] ), F.col("host")
    ).sortWithinPartitions("host", "url")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_host = None
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if delay_s and row.host == last_host:
                    time.sleep(delay_s)
                last_host = row.host
                try:
                    status, doc_type, body = fetcher(row.url)
                except Exception:  # noqa: BLE001 — fetch errors are data
                    status, doc_type, body = STATUS_ERROR, "", b""
                if store is not None and status == STATUS_OK and body:
                    field = row.field.replace(":", "_")
                    store.file_store(f"{row.ntp_id}_{field}.{doc_type}", body)
                out.append(
                    (row.ntp_id, row.field, row.url, status, doc_type, len(body))
                )
            yield pd.DataFrame(
                out,
                columns=["ntp_id", "field", "url", "status", "doc_type", "n_bytes"],
            )

    return parts.select("ntp_id", "field", "url", "host").mapInPandas(
        run, FETCH_SCHEMA
    )


# RefinedWeb-style scored URL filtering (Penedo et al. 2023 §3.1):
# an explicit blocklist is the anti-join in prune_urls above; this is
# the SOFT path — a weighted bad-word score over the URL string plus
# scheme and resource-extension gates. Weights are half-units so the
# score stays exact integer arithmetic until one final /2.
_URL_W_STRICT = 4  # one hit alone rejects
_URL_W_HARD = 2    # two hits reject
_URL_W_SOFT = 1    # four hits reject
_URL_BLOCKED_EXTS = (".css", ".js", ".ico", ".woff")


def url_quality_filter(
    urls: DataFrame,
    url_col: str = "url",
    strict_words: tuple[str, ...] = (),
    hard_words: tuple[str, ...] = (),
    soft_words: tuple[str, ...] = (),
    threshold: float = 2.0,
    blocked_exts: tuple[str, ...] = _URL_BLOCKED_EXTS,
) -> DataFrame:
    """Scored URL filter: substring occurrences of weighted word lists
    (strict 2.0 / hard 1.0 / soft 0.5 per occurrence — subword matches
    count, as in the RefinedWeb recipe), plus two hard gates: scheme
    must be http(s) and the resource extension must not be a
    non-document asset. keep = gates pass AND score < threshold.

    Pure per-row expressions (occurrence counting is two lengths and a
    replace per word — no regex engine, no UDF), so the filter rides
    the scan with zero shuffle at any corpus size. Appends
    (score DOUBLE, keep BOOLEAN, fail_reasons CSV-string)."""
    u = F.lower(F.col(url_col))

    def occurrences(w: str):
        return (
            (F.length(u) - F.length(F.replace(u, F.lit(w.lower()))))
            / F.lit(len(w))
        ).cast("long")

    half = F.lit(0)
    for w in strict_words:
        half = half + occurrences(w) * _URL_W_STRICT
    for w in hard_words:
        half = half + occurrences(w) * _URL_W_HARD
    for w in soft_words:
        half = half + occurrences(w) * _URL_W_SOFT
    score = (half.cast("double") / F.lit(2.0)).alias("score")
    scheme_ok = u.rlike("^https?://")
    ext_bad = F.lit(False)
    for ext in blocked_exts:
        ext_bad = ext_bad | u.endswith(ext)
    score_bad = half >= F.lit(int(threshold * 2))
    reasons = F.concat_ws(
        ",",
        F.when(~scheme_ok, F.lit("scheme")),
        F.when(ext_bad, F.lit("ext")),
        F.when(score_bad, F.lit("score")),
    )
    return (
        urls.withColumn("score", score)
        .withColumn("keep", scheme_ok & ~ext_bad & ~score_bad)
        .withColumn("fail_reasons", reasons)
    )
