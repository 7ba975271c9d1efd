"""Structured Streaming smoke tests: file-source versioned ingest via
foreachBatch + watermarked windowed aggregation (SURVEY.md §2.9)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_etlscripts_spark.streaming import (
    run_streaming_ingest,
    windowed_event_counts,
)

FIELDS = ["title"]
SCHEMA = "id string, updated array<string>, title string"


def test_streaming_ingest_merges_batches(spark):
    tmp = tempfile.mkdtemp(prefix="strm_")
    incoming, state = os.path.join(tmp, "in"), os.path.join(tmp, "state")
    os.makedirs(incoming)
    try:
        b1 = spark.createDataFrame(
            [("url/a", ["2024-01-01 00:00:00"], "A"), ("url/b", ["2024-01-02 00:00:00"], "B")],
            SCHEMA,
        )
        b1.write.parquet(os.path.join(incoming, "batch1"))
        q = run_streaming_ingest(spark, incoming + "/*", state, FIELDS, SCHEMA)
        q.awaitTermination(120)

        s1_rows = spark.read.parquet(state).collect()
        assert len(s1_rows) == 2
        assert {r["title"] for r in s1_rows} == {"A", "B"}

        # second drop: one idempotent overlap-merge + one new id
        b2 = spark.createDataFrame(
            [("url/a", ["2024-01-01 00:00:00"], "A2"), ("url/c", ["2024-01-03 00:00:00"], "C")],
            SCHEMA,
        )
        b2.write.parquet(os.path.join(incoming, "batch2"))
        q = run_streaming_ingest(spark, incoming + "/*", state, FIELDS, SCHEMA)
        q.awaitTermination(120)

        s2 = spark.read.parquet(state)
        rows = {r["id"]: r for r in s2.collect()}
        assert len(rows) == 3
        assert rows["url/a"]["title"] == "A2"  # merged onto same _id
        assert rows["url/a"]["_id"] == [r for r in s1_rows if r["id"] == "url/a"][0]["_id"]
        assert rows["url/c"]["obsolete_version"] is False
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_counts_streaming_matches_batch(spark, sf_dir):
    from datalake_etlscripts_spark.io.readers import read_table

    events = read_table(spark, sf_dir, "events")
    batch_out = windowed_event_counts(events).collect()

    # drive the same aggregation as a stream from a parquet copy
    tmp = tempfile.mkdtemp(prefix="strm_ev_")
    try:
        events.write.parquet(os.path.join(tmp, "ev"))
        stream = (
            spark.readStream.schema(events.schema).parquet(os.path.join(tmp, "ev"))
        )
        agg = windowed_event_counts(stream)
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("win_counts")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        stream_out = spark.sql("SELECT * FROM win_counts").collect()
        key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
        assert sorted((key(r), r["n"], r["total_value"]) for r in stream_out) == sorted(
            (key(r), r["n"], r["total_value"]) for r in batch_out
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
