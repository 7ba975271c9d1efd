"""End-to-end ingest pipeline (reference §3.1 shape): raw parquet-ish
batch with original Spanish headers → mapping-table normalization →
versioned merge → compaction view → summary counts → invariants."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datalake_etlscripts_spark.normalize import apply_mapping, normalize_updated
from datalake_etlscripts_spark.summary import summary_counts
from datalake_etlscripts_spark.versioning import (
    check_pointers_resolve,
    check_unique_active,
    current_versions,
    empty_state,
    merge_batch,
)

MAPPING = [
    ("id", "id"),
    ("updated", "updated"),
    ("title", "title"),
    ("Tipo de Contrato (Datos Generales del Expediente)", "Tipo_Contrato"),
    ("Clasificación CPV", "Clasificacion_CPV"),
]
FIELDS = ["title", "Tipo_Contrato", "Clasificacion_CPV"]

RAW_COLS = [
    "id",
    "updated",
    "title",
    "Tipo de Contrato (Datos Generales del Expediente)",
    "Clasificación CPV",
    "Columna Sorpresa",
]


def _ingest(spark, state, raw_rows):
    raw = spark.createDataFrame(raw_rows, RAW_COLS)
    mapped = apply_mapping(raw, MAPPING, keep_extra=True)
    batch = normalize_updated(mapped).select(
        "id",
        "updated",
        *[F.col(f"`{f}`").alias(f) for f in FIELDS],
    )
    # stringified CPV lists arrive as text; the engine stores the raw
    # string field here and parses on demand (list columns are separate)
    return merge_batch(state, batch, FIELDS).localCheckpoint()


def test_full_ingest_pipeline(spark):
    state = empty_state(spark, FIELDS)

    # batch 1: two notices, one with accent headers + stringified CPV
    state = _ingest(
        spark,
        state,
        [
            (
                "https://place.es/entry/1001",
                "2024-01-05T10:00:00.123",
                "Obras A",
                "Obras",
                "['45000000','45100000']",
                "x",
            ),
            (
                "https://place.es/entry/1002",
                "2024-01-06T11:00:00",
                "Suministros B",
                "Suministros",
                "09100000",
                "y",
            ),
        ],
    )
    assert state.count() == 2
    m = {r["id"]: r for r in state.collect()}
    r1 = m["https://place.es/entry/1001"]
    assert r1["_id"] == "ntp00000001"
    assert r1["updated"] == ["2024-01-05 10:00:00"]
    assert r1["Tipo_Contrato"] == "Obras"

    # batch 2: re-ingest 1001 with overlap + new ts + changed field;
    # brand-new 1003
    state = _ingest(
        spark,
        state,
        [
            (
                "https://place.es/entry/1001",
                "2024-02-01T09:00:00",
                "Obras A v2",
                "",
                "['45000000']",
                "x",
            ),
            (
                "https://place.es/entry/1003",
                "2024-02-02T08:00:00",
                "Servicios C",
                "Servicios",
                "50000000",
                "z",
            ),
        ],
    )
    m = {r["id"]: r for r in state.collect()}
    assert len(m) == 3
    r1 = m["https://place.es/entry/1001"]
    assert r1["_id"] == "ntp00000001"  # merged in place (reference rule)
    assert r1["updated"] == ["2024-01-05 10:00:00", "2024-02-01 09:00:00"]
    assert r1["title"] == "Obras A v2"
    assert r1["Tipo_Contrato"] == "Obras"  # empty incoming didn't clobber
    assert m["https://place.es/entry/1003"]["_id"] == "ntp00000003"

    # invariants + compaction + summary over the final state
    assert check_unique_active(state).count() == 0
    assert check_pointers_resolve(state).count() == 0
    current = current_versions(state)
    assert current.count() == 3
    summary = {
        (r["field"], r["value"]): r["cnt"]
        for r in summary_counts(current, ["Tipo_Contrato"]).collect()
    }
    assert summary[("__total__", None)] == 3
    assert summary[("Tipo_Contrato", "Obras")] == 1
    assert summary[("Tipo_Contrato", "Servicios")] == 1


def test_cli_dedup_minhash_clusters(spark, tmp_path):
    """CLI dedup subcommand: minhash pairs resolved to components with
    a keep-list; every doc appears exactly once and each component
    keeps exactly one representative."""
    from datalake_etlscripts_spark.__main__ import main

    src = str(tmp_path / "corpus")
    out = str(tmp_path / "pairs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    docs.write.parquet(src)
    rc = main(
        [
            "dedup",
            "--table",
            src,
            "--out",
            out,
            "--strategy",
            "minhash",
            "--threshold",
            "0.04",
            "--clusters",
        ]
    )
    assert rc == 0
    res = spark.read.parquet(out)
    n_docs = docs.count()
    assert res.count() == n_docs
    assert res.filter("keep").count() == res.select("component").distinct().count()


@pytest.mark.slow
def test_full_corpus_preparation_chain(spark, tmp_path):
    """The complete training-data path a reference user would run,
    composed from the real operators: quality filter -> URL dedup ->
    near-dup clustering keep-list -> classifier + LM scoring ->
    deterministic shard export. Asserts monotone row counts, schema
    sanity, and that the exported shards round-trip the surviving
    corpus exactly."""
    import os

    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.io.writers import write_training_shards
    from datalake_etlscripts_spark.operators import dedup, text
    from datalake_etlscripts_spark.operators.text import (
        gopher_quality_filter,
        hashed_linear_score,
        lm_avg_prob_score,
        ngram_lm_counts,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = docs.count()

    # 1. quality filter
    kept_flags = gopher_quality_filter(docs)
    survivors = docs.join(
        kept_flags.filter("keep").select("doc_id"), "doc_id", "left_semi"
    )
    n1 = survivors.count()
    assert 0 < n1 <= n0

    # 2. URL dedup on synthesized source URLs (doc_id % 40 collides)
    urls = survivors.withColumn(
        "url",
        F.concat(
            F.lit("https://site.example/p/"), (F.col("doc_id") % 40).cast("string")
        ),
    )
    url_keep = dedup.url_duplicates(urls).filter("keep").select("doc_id")
    survivors = survivors.join(url_keep, "doc_id", "left_semi")
    n2 = survivors.count()
    assert 0 < n2 <= min(n1, 40)

    # 3. near-dup clusters -> one representative per cluster
    pairs = dedup.minhash_lsh_pairs(survivors, threshold=0.04)
    comp = dedup.connected_components_star(pairs.select("id_a", "id_b"))
    drop = comp.filter("node != component").select(F.col("node").alias("doc_id"))
    survivors = survivors.join(drop, "doc_id", "left_anti")
    n3 = survivors.count()
    assert 0 < n3 <= n2

    # 4. model scores attach to every surviving row
    lm = ngram_lm_counts(survivors, max_order=2)
    scored = lm_avg_prob_score(survivors, lm).join(
        hashed_linear_score(survivors, [0.1] * 32).select(
            "doc_id", "quality_score"
        ),
        "doc_id",
    )
    assert scored.count() == n3
    assert scored.filter(F.col("lm_score").isNull()).count() == 0

    # 5. deterministic shard export round-trips the survivors
    out = str(tmp_path / "shards")
    n_shards = write_training_shards(
        survivors.select("doc_id", "text"), out, rows_per_shard=10
    )
    back = spark.read.json(out)
    assert back.count() == n3
    assert back.select("shard").distinct().count() <= n_shards
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in survivors.collect()
    )
