"""Structured Streaming smoke tests: file-source versioned ingest via
foreachBatch + watermarked windowed aggregation (SURVEY.md §2.9)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from datalake_etlscripts_spark.streaming import (
    run_streaming_ingest,
    windowed_event_counts,
)

FIELDS = ["title"]
SCHEMA = "id string, updated array<string>, title string"


@pytest.mark.slow
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


@pytest.mark.slow
def test_watermark_drops_late_rows(spark):
    """Late-data semantics: rows older than the watermark are excluded
    from finalized windows (append mode only emits closed windows)."""
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="strm_wm_")
    try:
        rows = [
            (1, "2024-01-01 00:05:00", "click", 1.0),  # on-time
            (2, "2024-01-01 03:30:00", "click", 1.0),  # advances watermark to 01:30
            (3, "2024-01-01 03:40:00", "click", 1.0),  # triggers eviction/emission of the 00:00 window
            (4, "2024-01-01 00:10:00", "click", 1.0),  # late: window end 01:00 < watermark
        ]
        df = spark.createDataFrame(rows, "event_id long, ts_s string, event_type string, value double")
        df = df.select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
        src = os.path.join(tmp, "src")
        # three files/micro-batches: on-time row, watermark advancer,
        # then the late row — input filtering uses the PREVIOUS batch's
        # watermark, so the late row must arrive after the window closed
        import time as _time

        for fid in (1, 2, 3, 4):
            df.filter(f"event_id = {fid}").coalesce(1).write.parquet(f"{src}/f{fid}")
            _time.sleep(1.2)

        stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src + "/*")
        agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("wm_counts")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (str(r["window_start"]), r["n"])
            for r in spark.sql("SELECT * FROM wm_counts").collect()
        }
        # the 00:00 window is finalized once the watermark (01:30) passes
        # its end (emitted during the third batch); the late arrival in
        # the fourth batch is dropped — count stays 1, no re-emission
        assert got == {("2024-01-01 00:00:00", 1)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
def test_stateful_running_totals(spark):
    import os
    import shutil
    import tempfile

    from datalake_etlscripts_spark.streaming.ingest import running_user_totals

    tmp = tempfile.mkdtemp(prefix="strm_st_")
    try:
        schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
        b1 = spark.createDataFrame(
            [(1, "2024-01-01 00:00:01", 7, "click", 2.0), (2, "2024-01-01 00:00:02", 7, "view", 3.0)],
            "event_id long, ts string, user_id long, event_type string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        b2 = spark.createDataFrame(
            [(3, "2024-01-01 00:00:03", 7, "click", 5.0), (4, "2024-01-01 00:00:04", 9, "view", 1.0)],
            "event_id long, ts string, user_id long, event_type string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        src = os.path.join(tmp, "src")
        b1.coalesce(1).write.parquet(src + "/a")
        b2.coalesce(1).write.parquet(src + "/b")

        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        out = running_user_totals(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("running_totals")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.sql("SELECT * FROM running_totals").collect()
        final = {}
        for r in rows:
            final[r["user_id"]] = max(
                final.get(r["user_id"], (0, 0.0)), (r["n_events"], r["total_value"])
            )
        assert final[7] == (3, 10.0)  # state accumulated across batches
        assert final[9] == (1, 1.0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
def test_stream_dedup_drops_in_horizon_duplicates(spark, tmp_path):
    """dedup_stream suppresses re-deliveries of the same key arriving
    within the watermark; distinct keys all pass through."""
    import time as _time

    from datalake_etlscripts_spark.streaming.ingest import dedup_stream

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    schema = "event_id bigint, ts timestamp, value double"
    rows1 = [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 10:01:00", 2.0)]
    rows2 = [(1, "2024-01-01 10:00:00", 1.0), (3, "2024-01-01 10:02:00", 3.0)]  # 1 is a dup
    spark.createDataFrame(
        [(i, __import__("datetime").datetime.fromisoformat(t), v) for i, t, v in rows1],
        schema,
    ).write.mode("overwrite").parquet(str(src / "b1"))
    spark.createDataFrame(
        [(i, __import__("datetime").datetime.fromisoformat(t), v) for i, t, v in rows2],
        schema,
    ).write.mode("overwrite").parquet(str(src / "b2"))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = (
        dedup_stream(stream, ["event_id"], watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.read.parquet(str(out)).collect())
    assert got == [1, 2, 3]  # each key exactly once, duplicate suppressed


def test_session_window_matches_batch_sessionize(spark, sf_dir):
    """session_window (native) and sessionize (lag+cumsum) agree on
    session membership: same number of sessions and events per user."""
    from datalake_etlscripts_spark.io.readers import read_table
    from datalake_etlscripts_spark.operators.events import sessionize
    from datalake_etlscripts_spark.streaming.ingest import session_window_counts

    e = read_table(spark, sf_dir, "events")
    native = session_window_counts(e, gap="30 minutes").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events")
    )
    manual = (
        sessionize(e, gap_minutes=30)
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_no").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    diff = native.exceptAll(manual).count() + manual.exceptAll(native).count()
    assert diff == 0


@pytest.mark.slow
def test_stream_stream_join_matches_batch(spark, tmp_path, sf_dir):
    """The watermarked interval join produces the same pairs running
    as two file streams as it does as a plain batch join."""
    from datalake_etlscripts_spark.io.readers import read_table
    from datalake_etlscripts_spark.streaming.ingest import stream_stream_join

    e = read_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    left_b = e.filter(F.col("event_type") == "click")
    right_b = e.filter(F.col("event_type") == "purchase")
    expected = stream_stream_join(left_b, right_b).collect()

    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left_b.write.parquet(lp)
    right_b.write.parquet(rp)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ls = spark.readStream.schema(schema).parquet(lp)
    rs = spark.readStream.schema(schema).parquet(rp)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream_stream_join(ls, rs)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
    assert len(expected) > 0  # the fixture actually produces pairs


@pytest.mark.slow
def test_streaming_ingest_maintains_views(spark):
    """foreachBatch ingest + continuous materialized views: after two
    file drops the running summary equals a full recompute over ALL
    ingested rows, and the distinct sketch matches the exact count —
    without either view ever rescanning the ingest history."""
    from datalake_etlscripts_spark.streaming import run_streaming_ingest_with_views
    from datalake_etlscripts_spark.summary import summary_counts

    tmp = tempfile.mkdtemp(prefix="strmv_")
    incoming = os.path.join(tmp, "in")
    state = os.path.join(tmp, "state")
    views = os.path.join(tmp, "views")
    os.makedirs(incoming)
    try:
        b1 = spark.createDataFrame(
            [("url/a", ["2024-01-01 00:00:00"], "A"), ("url/b", ["2024-01-02 00:00:00"], "B")],
            SCHEMA,
        )
        b2 = spark.createDataFrame(
            [("url/a", ["2024-01-05 00:00:00"], "A"), ("url/c", ["2024-01-03 00:00:00"], "C")],
            SCHEMA,
        )
        for i, b in enumerate([b1, b2]):
            b.write.parquet(os.path.join(incoming, f"batch{i}"))
            q = run_streaming_ingest_with_views(
                spark, incoming + "/*", state, FIELDS, SCHEMA, views,
                summary_fields=["title"], sketch_keys=[], sketch_value="id",
            )
            q.awaitTermination(120)

        got = {
            (r["field"], r["value"]): r["cnt"]
            for r in spark.read.parquet(os.path.join(views, "summary")).collect()
        }
        want = {
            (r["field"], r["value"]): r["cnt"]
            for r in summary_counts(b1.unionByName(b2), ["title"]).collect()
        }
        assert got == want  # incl. ('title','A')→2 across batches, total→4

        from datalake_etlscripts_spark.operators import sketches

        est = sketches.estimate_distinct(
            spark.read.parquet(os.path.join(views, "distinct_sketch"))
        ).collect()[0]["approx_distinct"]
        assert est == 3  # url/a,b,c — tiny cardinality: HLL exact
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_static_enrich_matches_batch(spark, tmp_path, sf_dir):
    """Stream-static broadcast enrichment: streaming result over a
    file source equals the plain batch join, and the stream side
    holds no state (stateless plan)."""
    import os

    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.io.readers import read_table
    from datalake_etlscripts_spark.streaming.ingest import stream_static_enrich

    events = read_table(spark, sf_dir, "events").limit(500)
    src = str(tmp_path / "src")
    events.write.parquet(src)
    dim = spark.createDataFrame(
        [(i, f"tier{i % 3}") for i in range(100)], "user_id bigint, tier string"
    )

    stream = spark.readStream.schema(events.schema).parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        stream_static_enrich(stream, dim)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).select("event_id", "user_id", "tier")
    want = stream_static_enrich(events, dim).select("event_id", "user_id", "tier")
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    assert got.count() == events.count()


@pytest.mark.slow
def test_streaming_lsh_dedup_matches_batch_recompute(spark, sf_dir):
    """Two document drops through the streaming LSH dedup must emit
    exactly the pairs a one-shot batch recompute finds (deterministic
    banding; the second batch only probes persisted index state)."""
    import tempfile

    from datalake_etlscripts_spark.operators.dedup import minhash_lsh_pairs
    from datalake_etlscripts_spark.streaming.ingest import run_streaming_lsh_dedup

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 300)
    )
    tmp = tempfile.mkdtemp(prefix="strmlsh_")
    incoming, state = os.path.join(tmp, "in"), os.path.join(tmp, "state")
    os.makedirs(incoming)
    try:
        docs.filter(F.col("doc_id") % 2 == 0).write.parquet(
            os.path.join(incoming, "batch1")
        )
        q = run_streaming_lsh_dedup(spark, incoming + "/*", state, threshold=0.04)
        q.awaitTermination(180)
        docs.filter(F.col("doc_id") % 2 == 1).write.parquet(
            os.path.join(incoming, "batch2")
        )
        q = run_streaming_lsh_dedup(spark, incoming + "/*", state, threshold=0.04)
        q.awaitTermination(180)

        streamed = {
            (r["id_a"], r["id_b"])
            for r in spark.read.parquet(os.path.join(state, "pairs")).collect()
        }
        full = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(docs, threshold=0.04).collect()
        }
        assert streamed == full
        assert len(full) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
def test_streaming_cdc_mirror_matches_sequential_apply(spark, tmp_path):
    """Two changeset drops streamed through run_streaming_cdc_mirror
    must leave the mirror identical to applying both changesets
    sequentially in batch."""
    from datalake_etlscripts_spark.io.txstore import apply_changeset
    from datalake_etlscripts_spark.streaming import run_streaming_cdc_mirror

    changes_dir = str(tmp_path / "changes")
    mirror = str(tmp_path / "mirror")
    os.makedirs(changes_dir)
    cs_schema = "k BIGINT, change_type STRING, _new STRUCT<v: STRING>"
    batch1 = spark.createDataFrame(
        [(1, "insert", ("one",)), (2, "insert", ("two",))], cs_schema
    )
    batch2 = spark.createDataFrame(
        [(2, "update", ("TWO",)), (3, "insert", ("three",)), (1, "delete", None)],
        cs_schema,
    )
    # drop batch 1, drain, then drop batch 2, drain again — two
    # micro-batches through the same checkpoint
    batch1.coalesce(1).write.mode("append").parquet(changes_dir)
    q = run_streaming_cdc_mirror(spark, changes_dir, mirror, cs_schema, key="k")
    q.awaitTermination(120)
    batch2.coalesce(1).write.mode("append").parquet(changes_dir)
    q = run_streaming_cdc_mirror(spark, changes_dir, mirror, cs_schema, key="k")
    q.awaitTermination(120)

    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(mirror).collect())
    empty = batch1.filter(F.lit(False)).select("k", "_new.v")
    expected_df = apply_changeset(apply_changeset(empty, batch1, "k"), batch2, "k")
    expected = sorted((r["k"], r["v"]) for r in expected_df.collect())
    assert got == expected == [(2, "TWO"), (3, "three")]


@pytest.mark.slow
def test_streaming_cdc_mirror_backlog_drain_preserves_order(spark, tmp_path):
    """Both changeset files already present when the stream starts:
    maxFilesPerTrigger=1 must replay them as separate ordered batches,
    not merge them into one corrupting batch."""
    import time as _time

    from datalake_etlscripts_spark.streaming import run_streaming_cdc_mirror

    changes_dir = str(tmp_path / "changes")
    mirror = str(tmp_path / "mirror")
    os.makedirs(changes_dir)
    cs_schema = "k BIGINT, change_type STRING, _new STRUCT<v: STRING>"
    b1 = spark.createDataFrame([(1, "insert", ("one",)), (2, "insert", ("two",))], cs_schema)
    b2 = spark.createDataFrame([(2, "update", ("TWO",)), (1, "delete", None)], cs_schema)
    b1.coalesce(1).write.mode("append").parquet(changes_dir)
    _time.sleep(1.1)  # distinct modification times -> deterministic file order
    b2.coalesce(1).write.mode("append").parquet(changes_dir)
    q = run_streaming_cdc_mirror(spark, changes_dir, mirror, cs_schema, key="k")
    q.awaitTermination(120)
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(mirror).collect())
    assert got == [(2, "TWO")]


def test_streaming_cdc_mirror_seq_col_last_wins(spark, tmp_path):
    """With seq_col, one coalesced batch holding several changes per
    key reduces to each key's highest-sequence change."""
    from datalake_etlscripts_spark.streaming import run_streaming_cdc_mirror

    changes_dir = str(tmp_path / "changes")
    mirror = str(tmp_path / "mirror")
    os.makedirs(changes_dir)
    cs_schema = "k BIGINT, seq BIGINT, change_type STRING, _new STRUCT<v: STRING>"
    batch = spark.createDataFrame(
        [
            (1, 1, "insert", ("one",)),
            (1, 2, "update", ("ONE",)),
            (2, 1, "insert", ("two",)),
            (2, 2, "delete", None),
        ],
        cs_schema,
    )
    batch.coalesce(1).write.mode("append").parquet(changes_dir)
    q = run_streaming_cdc_mirror(
        spark, changes_dir, mirror, cs_schema, key="k", seq_col="seq"
    )
    q.awaitTermination(120)
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(mirror).collect())
    assert got == [(1, "ONE")]


@pytest.mark.slow
def test_streaming_trending_terms_matches_batch(spark, tmp_path):
    from datetime import datetime

    from datalake_etlscripts_spark.streaming import run_streaming_trending_terms
    from datalake_etlscripts_spark.streaming.ingest import (
        trending_topk_from_counts,
        windowed_token_counts,
    )

    docs_dir = str(tmp_path / "docs")
    state = str(tmp_path / "counts")
    os.makedirs(docs_dir)
    schema = "doc_id BIGINT, ts TIMESTAMP, text STRING"
    T = datetime
    b1 = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 5), "spark spark flink"),
            (2, T(2024, 1, 1, 10, 40), "spark beam"),
            (3, T(2024, 1, 1, 11, 10), "flink flink flink"),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (4, T(2024, 1, 1, 10, 55), "beam beam beam beam"),
            (5, T(2024, 1, 1, 11, 20), "spark"),
        ],
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(docs_dir)
    q = run_streaming_trending_terms(spark, docs_dir, state, schema, k=2)
    q.awaitTermination(120)
    b2.coalesce(1).write.mode("append").parquet(docs_dir)
    q = run_streaming_trending_terms(spark, docs_dir, state, schema, k=2)
    q.awaitTermination(120)

    streamed = sorted(
        (r["window_start"], r["token"], r["n"], r["rank"])
        for r in spark.read.parquet(f"{state}__topk").collect()
    )
    batch = sorted(
        (r["window_start"], r["token"], r["n"], r["rank"])
        for r in trending_topk_from_counts(
            windowed_token_counts(b1.unionByName(b2)), k=2
        ).collect()
    )
    assert streamed == batch
    # hour 10: beam(5) > spark(3); hour 11: flink(3) > spark(1)
    by_win = {}
    for w, tok, n, rank in streamed:
        by_win.setdefault(w.hour, []).append((rank, tok, n))
    assert sorted(by_win[10]) == [(1, "beam", 5), (2, "spark", 3)]
    assert sorted(by_win[11]) == [(1, "flink", 3), (2, "spark", 1)]

    # Forced re-fire: wipe the checkpoint so the stream replays every
    # drop as a fresh epoch 0. The state's folded_through watermark
    # (epoch 1 after two folds) detects 0 <= 1 and skips the fold —
    # counts must be byte-identical, not doubled.
    before = sorted(
        (r["window_start"], r["token"], r["n"])
        for r in spark.read.parquet(state).drop("folded_through").collect()
    )
    shutil.rmtree(f"{state}__checkpoint")
    q = run_streaming_trending_terms(spark, docs_dir, state, schema, k=2)
    q.awaitTermination(120)
    after = sorted(
        (r["window_start"], r["token"], r["n"])
        for r in spark.read.parquet(state).drop("folded_through").collect()
    )
    assert after == before
    replayed_topk = sorted(
        (r["window_start"], r["token"], r["n"], r["rank"])
        for r in spark.read.parquet(f"{state}__topk").collect()
    )
    assert replayed_topk == streamed


@pytest.mark.slow
def test_streaming_embedding_dedup_matches_batch_recompute(spark, sf_dir):
    """Two vector drops through the streaming embedding dedup emit
    exactly the pairs a one-shot batch LSH recompute finds."""
    import tempfile

    from datalake_etlscripts_spark.operators.dedup import embedding_near_dup_lsh
    from datalake_etlscripts_spark.streaming.ingest import (
        run_streaming_embedding_dedup,
    )

    base = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    )
    bumped = base.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias("embedding"),
    )
    vecs = base.unionByName(bumped)
    tmp = tempfile.mkdtemp(prefix="strmemb_")
    incoming, state = os.path.join(tmp, "in"), os.path.join(tmp, "state")
    os.makedirs(incoming)
    try:
        vecs.filter(F.col("vec_id") % 2 == 0).write.parquet(
            os.path.join(incoming, "batch1")
        )
        q = run_streaming_embedding_dedup(spark, incoming + "/*", state, threshold=0.9)
        q.awaitTermination(180)
        vecs.filter(F.col("vec_id") % 2 == 1).write.parquet(
            os.path.join(incoming, "batch2")
        )
        q = run_streaming_embedding_dedup(spark, incoming + "/*", state, threshold=0.9)
        q.awaitTermination(180)

        streamed = {
            (r["id_a"], r["id_b"])
            for r in spark.read.parquet(os.path.join(state, "pairs")).collect()
        }
        full = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_lsh(vecs, threshold=0.9).collect()
        }
        assert streamed == full
        assert len(full) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_funnel_matches_batch(spark, sf_dir):
    """Two event-time-ordered drops through the streaming funnel must
    leave exactly the batch funnel's per-user steps and curve."""
    import tempfile

    from datalake_etlscripts_spark.operators.events import funnel_counts
    from datalake_etlscripts_spark.streaming.ingest import run_streaming_funnel

    steps = ["view", "click", "purchase"]
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "ts", "user_id", "event_type"
    )
    cut = F.lit("2024-01-15").cast("timestamp")
    tmp = tempfile.mkdtemp(prefix="strmfun_")
    incoming, state = os.path.join(tmp, "in"), os.path.join(tmp, "state")
    os.makedirs(incoming)
    try:
        e.filter(F.col("ts") < cut).write.parquet(os.path.join(incoming, "b1"))
        q = run_streaming_funnel(spark, incoming + "/*", state, steps)
        q.awaitTermination(180)
        e.filter(F.col("ts") >= cut).write.parquet(os.path.join(incoming, "b2"))
        q = run_streaming_funnel(spark, incoming + "/*", state, steps)
        q.awaitTermination(180)

        import glob

        last = sorted(glob.glob(os.path.join(state, "curve", "epoch=*")))[-1]
        streamed = {
            r["step"]: r["n_users"] for r in spark.read.parquet(last).collect()
        }
        want = {
            r["step"]: r["n_users"] for r in funnel_counts(e, steps).collect()
        }
        assert streamed == want and len(want) == 3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_drift_monitor_matches_batch(spark, tmp_path, sf_dir):
    """Streamed drift report ≡ batch drift over the union of all
    drops; self-drift is exactly 0; replayed micro-batches (wiped
    checkpoint) leave counts and report byte-identical."""
    from datalake_etlscripts_spark.io.readers import read_table
    from datalake_etlscripts_spark.streaming.ingest import (
        binned_value_counts,
        drift_report_from_counts,
        run_streaming_drift_monitor,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ref = ev.filter(F.col("event_id") % 2 == 0)
    obs = ev.filter(F.col("event_id") % 2 == 1)
    ref_path = str(tmp_path / "ref_counts")
    binned_value_counts(ref).write.parquet(ref_path)

    # self-drift: a distribution compared against itself is exactly 0
    self_drift = drift_report_from_counts(
        binned_value_counts(ref), binned_value_counts(ref)
    ).collect()
    assert self_drift and all(r["drift"] == 0.0 for r in self_drift)

    incoming = str(tmp_path / "incoming")
    state = str(tmp_path / "drift_state")
    os.makedirs(incoming)
    d1 = obs.filter(F.col("event_id") < 500)
    d2 = obs.filter(F.col("event_id") >= 500)
    d1.coalesce(1).write.mode("append").parquet(incoming)
    run_streaming_drift_monitor(spark, incoming, state, ref_path).awaitTermination(120)
    d2.coalesce(1).write.mode("append").parquet(incoming)
    run_streaming_drift_monitor(spark, incoming, state, ref_path).awaitTermination(120)

    def report_rows():
        return sorted(
            (r["event_type"], r["n_ref"], r["n_obs"], r["drift"])
            for r in spark.read.parquet(os.path.join(state, "report")).collect()
        )

    streamed = report_rows()
    batch = sorted(
        (r["event_type"], r["n_ref"], r["n_obs"], r["drift"])
        for r in drift_report_from_counts(
            spark.read.parquet(ref_path), binned_value_counts(obs)
        ).collect()
    )
    assert streamed == batch
    assert all(0.0 <= d < 2.0 for (_, _, _, d) in streamed)
    # n_obs column really is the streamed half
    assert sum(n for (_, _, n, _) in streamed) == obs.count()

    shutil.rmtree(f"{state}__checkpoint")
    run_streaming_drift_monitor(spark, incoming, state, ref_path).awaitTermination(120)
    assert report_rows() == streamed


@pytest.mark.slow
def test_streaming_compaction_bounds_fragments(spark, tmp_path):
    """7 drops at max_fragments=2: two folds fire, reads stay bounded
    at base + ≤2 fragment dirs, no row lost or duplicated — including
    after a wiped-checkpoint full replay."""
    from datalake_etlscripts_spark.streaming.ingest import (
        read_compacted_table,
        run_streaming_compaction,
    )

    schema = "event_id bigint, value double"
    incoming = str(tmp_path / "in")
    table = str(tmp_path / "table")
    os.makedirs(incoming)
    for i in range(7):
        spark.createDataFrame(
            [(i * 10 + j, float(j)) for j in range(10)], schema
        ).coalesce(1).write.mode("append").parquet(incoming)
        run_streaming_compaction(
            spark, incoming, table, schema, max_fragments=2
        ).awaitTermination(120)

    got = read_compacted_table(spark, table)
    assert got.count() == 70
    assert sorted(r["event_id"] for r in got.collect()) == list(range(0, 70))
    frag_dirs = [
        d for d in os.listdir(os.path.join(table, "frag")) if d.startswith("epoch=")
    ]
    assert len(frag_dirs) <= 2, frag_dirs
    assert os.path.exists(os.path.join(table, "base"))
    # compacted base holds everything through the last fold
    assert (
        spark.read.parquet(os.path.join(table, "base"))
        .agg(F.max("compacted_through"))
        .first()[0]
        == 5
    )

    # full replay under a fresh checkpoint: every drop re-fires as one
    # epoch-0 batch; compacted_through detects it and skips — no dupes
    shutil.rmtree(f"{table}__checkpoint")
    run_streaming_compaction(
        spark, incoming, table, schema, max_fragments=2
    ).awaitTermination(120)
    again = read_compacted_table(spark, table)
    assert again.count() == 70
    assert sorted(r["event_id"] for r in again.collect()) == list(range(0, 70))


@pytest.mark.slow
def test_streaming_zone_stats_manifest_prunes_reads(spark, tmp_path):
    """Manifest-pruned reads: 6 drops with disjoint value ranges; a
    narrow range predicate reads 1 of 6 epochs via the stats table,
    returns exactly the full-scan answer, and a replay (wiped
    checkpoint) leaves data + manifest byte-stable."""
    from datalake_etlscripts_spark.streaming.ingest import (
        read_zone_pruned,
        run_streaming_zone_stats,
    )

    schema = "event_id bigint, value double"
    incoming = str(tmp_path / "in")
    table = str(tmp_path / "t")
    os.makedirs(incoming)
    for i in range(6):
        spark.createDataFrame(
            [(i * 100 + j, float(i * 1000 + j)) for j in range(50)], schema
        ).coalesce(1).write.mode("append").parquet(incoming)
        run_streaming_zone_stats(
            spark, incoming, table, schema, ["value"]
        ).awaitTermination(120)

    df, read, total = read_zone_pruned(spark, table, "value", 3000.0, 3010.0)
    assert total == 6 and read == 1
    got = sorted(r["event_id"] for r in df.collect())
    assert got == list(range(300, 311))
    # advisory, never lossy: full-scan filter agrees
    alldata = spark.read.parquet(os.path.join(table, "data"))
    expect = sorted(
        r["event_id"]
        for r in alldata.filter(
            (F.col("value") >= 3000.0) & (F.col("value") <= 3010.0)
        ).collect()
    )
    assert got == expect
    # out-of-range predicate: zero epochs read, empty result
    none_df, read0, _ = read_zone_pruned(spark, table, "value", 99999.0, 99999.5)
    assert read0 == 0 and none_df.count() == 0

    before = sorted(
        (r["event_id"], r["value"]) for r in spark.read.parquet(
            os.path.join(table, "data")
        ).collect()
    )
    shutil.rmtree(f"{table}__checkpoint")
    run_streaming_zone_stats(
        spark, incoming, table, schema, ["value"]
    ).awaitTermination(120)
    after = sorted(
        (r["event_id"], r["value"]) for r in spark.read.parquet(
            os.path.join(table, "data")
        ).collect()
    )
    assert after == before


@pytest.mark.slow
def test_streaming_zone_stats_wiped_checkpoint_with_new_drops_raises(
    spark, tmp_path
):
    """A wiped checkpoint while NEW un-ingested drops wait in the
    backlog must RAISE, not silently skip the replay batch (which
    would drop the new rows forever): the replay batch then holds
    more rows than the manifest ever ingested, and the audit refuses
    to guess."""
    from pyspark.sql.streaming import StreamingQueryException

    from datalake_etlscripts_spark.streaming.ingest import (
        run_streaming_zone_stats,
    )

    schema = "event_id bigint, value double"
    incoming = str(tmp_path / "in")
    table = str(tmp_path / "t")
    os.makedirs(incoming)
    for i in range(2):
        spark.createDataFrame(
            [(i * 100 + j, float(i * 1000 + j)) for j in range(20)], schema
        ).coalesce(1).write.mode("append").parquet(incoming)
        run_streaming_zone_stats(
            spark, incoming, table, schema, ["value"]
        ).awaitTermination(120)
    # checkpoint wiped AND a new, never-ingested drop arrives
    shutil.rmtree(f"{table}__checkpoint")
    spark.createDataFrame(
        [(900 + j, float(9000 + j)) for j in range(20)], schema
    ).coalesce(1).write.mode("append").parquet(incoming)
    q = run_streaming_zone_stats(spark, incoming, table, schema, ["value"])
    with pytest.raises(StreamingQueryException, match="never ingested"):
        q.awaitTermination(120)


@pytest.mark.slow
def test_streaming_late_quarantine(spark, tmp_path):
    """Late rows (older than the advancing watermark) land in the
    auditable quarantine table instead of mutating closed windows;
    on-time counts match a batch recompute over on-time rows only;
    wiped-checkpoint replay leaves every output identical."""
    import datetime

    from datalake_etlscripts_spark.streaming.ingest import (
        read_quarantined_late,
        run_streaming_late_quarantine,
    )

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )
    t = lambda s: datetime.datetime.fromisoformat(f"2024-01-01 {s}")  # noqa: E731
    incoming = str(tmp_path / "in")
    state = str(tmp_path / "lq_state")
    os.makedirs(incoming)

    b1 = spark.createDataFrame(
        [
            (1, t("10:00"), 1, "click", 1.0),
            (2, t("11:10"), 1, "click", 1.0),
            (3, t("12:00"), 2, "view", 1.0),
        ],
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(incoming)
    run_streaming_late_quarantine(spark, incoming, state).awaitTermination(120)
    # watermark after b1 = 12:00 - 30min = 11:30
    wm = spark.read.parquet(os.path.join(state, "wm")).collect()[0]
    assert wm["watermark"] == t("11:30")

    b2 = spark.createDataFrame(
        [
            (4, t("10:15"), 3, "click", 1.0),  # late: < 11:30
            (5, t("11:45"), 3, "view", 1.0),   # on time
            (6, t("13:00"), 4, "click", 1.0),  # on time, advances wm
        ],
        schema,
    )
    b2.coalesce(1).write.mode("append").parquet(incoming)
    run_streaming_late_quarantine(spark, incoming, state).awaitTermination(120)

    late = read_quarantined_late(spark, state).collect()
    assert [(r["event_id"], r["epoch"], r["rejected_by_watermark"]) for r in late] == [
        (4, 1, t("11:30"))
    ]

    def agg_rows():
        return sorted(
            (r["event_type"], r["hour"], r["n"])
            for r in spark.read.parquet(os.path.join(state, "agg")).collect()
        )

    streamed = agg_rows()
    ontime = b1.unionByName(b2.filter(F.col("event_id") != 4))
    batch = sorted(
        (r["event_type"], r["hour"], r["n"])
        for r in ontime.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert streamed == batch
    wm2 = spark.read.parquet(os.path.join(state, "wm")).collect()[0]
    assert wm2["watermark"] == t("12:30")

    # wiped-checkpoint full replay: everything byte-stable
    shutil.rmtree(f"{state}__checkpoint")
    run_streaming_late_quarantine(spark, incoming, state).awaitTermination(120)
    assert agg_rows() == streamed
    late2 = read_quarantined_late(spark, state).collect()
    assert [(r["event_id"], r["epoch"]) for r in late2] == [(4, 1)]
    assert spark.read.parquet(os.path.join(state, "wm")).collect()[0][
        "watermark"
    ] == t("12:30")


@pytest.mark.slow
def test_streaming_feature_store_matches_batch_pit(spark, tmp_path):
    """Stream≡batch for the point-in-time feature store under
    time-ordered drops, plus replay idempotence (wiped checkpoint →
    identical training table, state not double-folded)."""
    from datetime import datetime

    from datalake_etlscripts_spark.operators.features import pit_feature_rows
    from datalake_etlscripts_spark.streaming import run_streaming_feature_store
    from pyspark.sql import functions as F

    events_dir = str(tmp_path / "events")
    root = str(tmp_path / "fs")
    os.makedirs(events_dir)
    schema = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING"
    T = datetime
    b1 = spark.createDataFrame(
        [
            (1, 7, T(2024, 1, 1, 9, 0), "view"),
            (2, 7, T(2024, 1, 1, 9, 30), "error"),
            (3, 7, T(2024, 1, 1, 10, 0), "purchase"),   # 1 view, err 30m ago
            (4, 8, T(2024, 1, 1, 10, 0), "view"),
            (5, 7, T(2024, 1, 1, 10, 0), "view"),       # equal-ts w/ label 3? no: same user later batch check
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (6, 7, T(2024, 1, 1, 11, 0), "purchase"),   # sees 2 views (1+5)
            (7, 8, T(2024, 1, 1, 11, 30), "purchase"),  # 1 view, no error
            (8, 8, T(2024, 1, 1, 11, 30), "view"),      # equal-ts: not counted
        ],
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(events_dir)
    q = run_streaming_feature_store(spark, events_dir, root, schema)
    q.awaitTermination(120)
    b2.coalesce(1).write.mode("append").parquet(events_dir)
    q = run_streaming_feature_store(spark, events_dir, root, schema)
    q.awaitTermination(120)

    streamed = sorted(
        (r["event_id"], r["user_id"], r["n_views_before"], r["err_age_s"])
        for r in spark.read.parquet(f"{root}/training").collect()
    )
    batch_rows = pit_feature_rows(b1.unionByName(b2)).select(
        "event_id",
        "user_id",
        "n_views_before",
        F.expr("(unix_micros(ts) - unix_micros(last_err)) div 1000000")
        .cast("long")
        .alias("err_age_s"),
    )
    batch = sorted(
        (r["event_id"], r["user_id"], r["n_views_before"], r["err_age_s"])
        for r in batch_rows.collect()
    )
    assert streamed == batch
    got = {e: (u, v, a) for e, u, v, a in streamed}
    assert got[3] == (7, 1, 1800)
    assert got[6] == (7, 2, 5400)
    assert got[7] == (8, 1, None)  # equal-ts view 8 not counted, no error

    # replay: wipe the checkpoint; folded_through must skip the fold
    state_before = sorted(
        (r["user_id"], r["n_views"])
        for r in spark.read.parquet(f"{root}/state").collect()
    )
    shutil.rmtree(f"{root}/checkpoint")
    q = run_streaming_feature_store(spark, events_dir, root, schema)
    q.awaitTermination(120)
    assert (
        sorted(
            (r["user_id"], r["n_views"])
            for r in spark.read.parquet(f"{root}/state").collect()
        )
        == state_before
    )
    assert (
        sorted(
            (r["event_id"], r["user_id"], r["n_views_before"], r["err_age_s"])
            for r in spark.read.parquet(f"{root}/training").collect()
        )
        == streamed
    )


@pytest.mark.slow
def test_streaming_scd2_matches_batch(spark, tmp_path):
    """Stream≡batch for SCD2 maintenance under time-ordered drops:
    the maintained dimension equals rebuilding from the union of all
    drops (extend / close+new / fresh-user paths all exercised), and
    a replayed run (wiped checkpoint) leaves the dimension unchanged."""
    from datetime import datetime

    from datalake_etlscripts_spark.plans.lakeops import scd2_from_events
    from datalake_etlscripts_spark.streaming import run_streaming_scd2

    events_dir = str(tmp_path / "events")
    root = str(tmp_path / "scd2")
    os.makedirs(events_dir)
    schema = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING"
    T = datetime
    b1 = spark.createDataFrame(
        [
            (1, 7, T(2024, 1, 1, 9, 0), "view"),
            (2, 7, T(2024, 1, 1, 9, 30), "view"),
            (3, 7, T(2024, 1, 1, 10, 0), "error"),
            (4, 8, T(2024, 1, 1, 10, 0), "view"),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (5, 7, T(2024, 1, 1, 11, 0), "error"),   # extends open run
            (6, 8, T(2024, 1, 1, 11, 30), "click"),  # closes view, opens click
            (7, 9, T(2024, 1, 1, 12, 0), "signup"),  # fresh user
            (8, 7, T(2024, 1, 1, 12, 30), "view"),   # closes error, opens view
        ],
        schema,
    )

    def dim_rows():
        return sorted(
            (
                r["user_id"],
                r["version"],
                r["status"],
                r["effective_from"],
                r["effective_to"],
                r["n_events"],
                r["is_current"],
            )
            for r in spark.read.parquet(f"{root}/dim").collect()
        )

    b1.coalesce(1).write.mode("append").parquet(events_dir)
    q = run_streaming_scd2(spark, events_dir, root, schema)
    q.awaitTermination(120)
    b2.coalesce(1).write.mode("append").parquet(events_dir)
    q = run_streaming_scd2(spark, events_dir, root, schema)
    q.awaitTermination(120)

    streamed = dim_rows()
    batch = sorted(
        (
            r["user_id"],
            r["version"],
            r["status"],
            r["effective_from"],
            r["effective_to"],
            r["n_events"],
            r["is_current"],
        )
        for r in scd2_from_events(b1.unionByName(b2)).collect()
    )
    assert streamed == batch
    # spot-check the three paths
    by_user = {}
    for row in streamed:
        by_user.setdefault(row[0], []).append(row)
    assert [r[2] for r in by_user[7]] == ["view", "error", "view"]
    assert by_user[7][1][5] == 2  # error run extended across the boundary
    assert [r[2] for r in by_user[8]] == ["view", "click"]
    assert by_user[8][0][6] == 0 and by_user[8][1][6] == 1
    assert by_user[9] == [
        (9, 1, "signup", T(2024, 1, 1, 12, 0), None, 1, 1)
    ]

    # replay: wipe the checkpoint; folded_through must skip the fold
    shutil.rmtree(f"{root}/checkpoint")
    q = run_streaming_scd2(spark, events_dir, root, schema)
    q.awaitTermination(120)
    assert dim_rows() == streamed


@pytest.mark.slow
def test_python_streaming_datasource_batches_and_resume(spark, tmp_path):
    """Spark 4 Python streaming DataSource: micro-batches advance the
    offset by STREAM_STEP ticks, rows equal the deterministic
    generation rule, and a RESTARTED query resumes from the
    checkpointed offset (no re-emission, no gap)."""
    from datalake_etlscripts_spark.io import pysource

    pysource.register_stream(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.format("synthetic_sensor_stream").load()
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    first = spark.read.parquet(out).collect()
    ticks1 = {r["tick"] for r in first}
    assert ticks1 and min(ticks1) == 0
    hi1 = max(ticks1) + 1
    assert hi1 % pysource.STREAM_STEP == 0
    for r in first:
        assert r["reading"] == pysource.sensor_reading(
            r["sensor_id"], r["tick"]
        )
    assert len(first) == hi1 * pysource.N_SENSORS  # no dup, no gap

    # restart: resumes from the committed offset — strictly new ticks
    q = (
        spark.readStream.format("synthetic_sensor_stream")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    both = spark.read.parquet(out).collect()
    ticks2 = {r["tick"] for r in both}
    assert min(ticks2) == 0 and max(ticks2) >= hi1
    assert len(both) == (max(ticks2) + 1) * pysource.N_SENSORS


@pytest.mark.slow
def test_streaming_sensor_alerts_stream_equals_batch(spark, tmp_path):
    """The custom-source alert service's maintained state equals a
    batch aggregate over the generated tick range, alert rows replay
    the generation rule, and a wiped-checkpoint replay leaves both
    state and alerts unchanged."""
    from datalake_etlscripts_spark.io import pysource
    from datalake_etlscripts_spark.streaming import (
        run_streaming_sensor_alerts,
    )

    root = str(tmp_path / "sensors")
    q = run_streaming_sensor_alerts(spark, root)
    q.awaitTermination(120)

    state = {
        r["sensor_id"]: (r["n"], r["total"], r["n_alerts"])
        for r in spark.read.parquet(f"{root}/state").collect()
    }
    ticks_done = state[0][0]  # rows per sensor == ticks folded
    # batch twin from the shared generation rule
    expect = {}
    for s in range(pysource.N_SENSORS):
        readings = [
            pysource.sensor_reading(s, t) for t in range(ticks_done)
        ]
        expect[s] = (
            len(readings),
            sum(readings),
            sum(1 for r in readings if r >= 900),
        )
    assert state == expect

    alerts = spark.read.parquet(f"{root}/alerts").collect()
    for r in alerts:
        assert r["reading"] >= 900
        assert r["reading"] == pysource.sensor_reading(
            r["sensor_id"], r["tick"]
        )
    assert len(alerts) == sum(v[2] for v in expect.values())

    # replay: wipe checkpoint; folded_through skips the fold
    shutil.rmtree(f"{root}/checkpoint")
    q = run_streaming_sensor_alerts(spark, root)
    q.awaitTermination(120)
    state2 = {
        r["sensor_id"]: (r["n"], r["total"], r["n_alerts"])
        for r in spark.read.parquet(f"{root}/state").collect()
    }
    assert state2 == state


def test_streaming_minibatch_kmeans_matches_python_replay(spark, tmp_path):
    """The streaming mini-batch k-means state (integer sums/counts)
    is bit-identical to a sequential pure-Python replay of the same
    fold over the same drops — quantize, argmin vs evolving integer
    centroids (s // n), accumulate. Replay idempotence included."""
    import math

    from datalake_etlscripts_spark.streaming import (
        run_streaming_minibatch_kmeans,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vec_dir = str(tmp_path / "vecs")
    root = str(tmp_path / "km")
    os.makedirs(vec_dir)
    b1 = emb.filter("vec_id < 250")
    b2 = emb.filter("vec_id >= 250")
    b1.coalesce(1).write.mode("append").parquet(vec_dir)
    q = run_streaming_minibatch_kmeans(spark, vec_dir, root)
    q.awaitTermination(180)
    b2.coalesce(1).write.mode("append").parquet(vec_dir)
    q = run_streaming_minibatch_kmeans(spark, vec_dir, root)
    q.awaitTermination(180)

    got = {
        (r["cell"], r["dim"]): (r["s"], r["n"])
        for r in spark.read.parquet(f"{root}/state").collect()
    }

    # pure-Python sequential replay
    def quant(vec):
        return [math.floor(float(x) * 1000 + 0.5) for x in vec]

    batches = []
    for b in (b1, b2):
        rows = sorted(
            ((r["vec_id"], quant(r["embedding"])) for r in b.collect())
        )
        batches.append(rows)
    sums: dict = {}
    ns: dict = {}
    cents = {pid: xq for pid, xq in batches[0][:4]}
    for bi, rows in enumerate(batches):
        if bi > 0:
            cents = {
                c: [
                    sums[(c, d)] // ns[c]
                    for d in range(len(batches[0][0][1]))
                ]
                for c in ns
            }
        for pid, xq in rows:
            best = min(
                (
                    (
                        sum((a - b) ** 2 for a, b in zip(xq, cq)),
                        cell,
                    )
                    for cell, cq in cents.items()
                )
            )
            cell = best[1]
            ns[cell] = ns.get(cell, 0) + 1
            for d, x in enumerate(xq):
                sums[(cell, d)] = sums.get((cell, d), 0) + x
    expect = {
        (c, d): (sums[(c, d)], ns[c]) for (c, d) in sums
    }
    assert got == expect

    # replay: wiped checkpoint leaves the state unchanged
    shutil.rmtree(f"{root}/checkpoint")
    q = run_streaming_minibatch_kmeans(spark, vec_dir, root)
    q.awaitTermination(180)
    got2 = {
        (r["cell"], r["dim"]): (r["s"], r["n"])
        for r in spark.read.parquet(f"{root}/state").collect()
    }
    assert got2 == got


def test_running_user_totals_tws_env_gate(spark):
    """The Spark-4 transformWithStateInPandas lane is gated on a
    working google.protobuf (the JVM<->Python state-server protocol);
    in this container the gate must raise the actionable remedy
    IMMEDIATELY instead of crashing mid-query. If the image ever grows
    protobuf, the plan must instead build (same totals as the
    applyInPandasWithState twin)."""
    from datalake_etlscripts_spark.streaming.ingest import (
        running_user_totals_tws,
    )

    events = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS user_id", "CAST(value AS DOUBLE) AS value")
    )
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="protobuf"):
            running_user_totals_tws(events)
    else:
        df = running_user_totals_tws(events)
        assert set(df.columns) == {"user_id", "n_events", "total_value"}


def test_stage_swap_crash_window_recovers_old_state(spark, tmp_path):
    """A crash between _stage_swap's two renames leaves only the
    __old_* sibling; the next load must restore it instead of reading
    the missing path as empty first-batch state (round-5 advice)."""
    import os

    from datalake_etlscripts_spark.streaming.ingest import (
        _fs_path_exists,
        _recover_swap,
        _stage_swap,
    )

    path = str(tmp_path / "state")
    df1 = spark.createDataFrame([(1, "a")], "id bigint, v string")
    _stage_swap(spark, df1, path, "epoch0")
    assert spark.read.parquet(path).count() == 1

    # simulate the crash window: path renamed away, new state not yet in
    os.rename(path, f"{path}__old_epoch1")
    assert not os.path.exists(path)
    assert _fs_path_exists(spark, path), "recovery must restore the state"
    assert [r.v for r in spark.read.parquet(path).collect()] == ["a"]

    # a subsequent swap proceeds normally over the recovered state
    df2 = spark.createDataFrame([(2, "b")], "id bigint, v string")
    _stage_swap(spark, df2, path, "epoch1")
    assert [r.v for r in spark.read.parquet(path).collect()] == ["b"]

    # two leftovers is ambiguous — must raise, never guess
    os.rename(path, f"{path}__old_x")
    os.makedirs(f"{path}__old_y")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="manual"):
        _recover_swap(path)
