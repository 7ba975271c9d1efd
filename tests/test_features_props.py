"""Property tests (hypothesis) for the r7 statistical operators:
Spark results vs pure-Python replays on generated series. Each example
builds one small DataFrame → one job, following test_properties.py."""

from __future__ import annotations

import pytest

from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

counts = st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=24)


def _hours_df(spark, cs):
    """One event row per count unit in consecutive hours (count 0 hours
    appear only via the spine gap fill) — plus sentinel rows pinning
    the first and last hour so the spine is exactly len(cs) hours."""
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = []
    for h, c in enumerate(cs):
        for _ in range(c):
            rows.append(("t", base + timedelta(hours=h, minutes=5)))
    # pin the spine ends (adds 1 to first and last counts)
    rows.append(("t", base + timedelta(minutes=1)))
    rows.append(("t", base + timedelta(hours=len(cs) - 1, minutes=1)))
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


@SET
@given(cs=counts)
@pytest.mark.slow
def test_mann_kendall_matches_python(spark, cs):
    from datalake_etlscripts_spark.operators.features import mann_kendall

    ys = list(cs)
    ys[0] += 1
    ys[-1] += 1
    row = mann_kendall(_hours_df(spark, cs)).collect()[0]
    s = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    n = len(ys)
    assert row["n_hours"] == n
    assert row["s_stat"] == s
    assert row["tau_a"] == s / (n * (n - 1) / 2)


@SET
@given(cs=counts)
@pytest.mark.slow
def test_theil_sen_matches_python_lower_median(spark, cs):
    from datalake_etlscripts_spark.operators.features import theil_sen

    ys = list(cs)
    ys[0] += 1
    ys[-1] += 1
    row = theil_sen(_hours_df(spark, cs)).collect()[0]
    slopes = sorted(
        (
            (ys[j] - ys[i]) / (j - i),
            ys[j] - ys[i],
            j - i,
        )
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    n = len(slopes)
    expect = slopes[(n + 1) // 2 - 1][0]
    assert row["n_pairs"] == n
    assert row["slope_per_hour"] == expect


@SET
@given(
    xs=st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 50)),
        min_size=2,
        max_size=30,
    )
)
@pytest.mark.slow
def test_quantile_normalize_matches_python(spark, xs):
    from datalake_etlscripts_spark.operators.features import quantile_normalize

    rows = [(i, g, v) for i, (g, v) in enumerate(xs)]
    df = spark.createDataFrame(rows, "id int, grp string, v int")
    out = {r["id"]: r["qn_v"] for r in quantile_normalize(df, "grp", "v", "id").collect()}
    pooled = sorted((v, i) for i, (g, v) in enumerate(xs))
    n_total = len(xs)
    by_grp: dict[str, list[tuple[int, int]]] = {}
    for i, (g, v) in enumerate(xs):
        by_grp.setdefault(g, []).append((v, i))
    for g, members in by_grp.items():
        members.sort()
        ng = len(members)
        for r0, (v, i) in enumerate(members, start=1):
            tidx = (r0 * n_total + ng - 1) // ng
            assert out[i] == pooled[tidx - 1][0], (g, i, v)


@SET
@given(
    amounts=st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=20)
)
def test_gini_matches_python(spark, amounts):
    from datalake_etlscripts_spark.operators.features import (
        concentration_metrics,
    )

    rows = [("g", i, a) for i, a in enumerate(amounts)]
    df = spark.createDataFrame(rows, "grp string, ent int, amt int")
    row = concentration_metrics(df, "grp", "ent", "amt").collect()[0]
    xs = sorted(amounts)
    n, sx = len(xs), sum(xs)
    gini = (2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * sx) / (
        n * sx
    )
    hhi = sum(x * x for x in xs) / (sx * sx)
    assert row["n_entities"] == n
    assert row["gini"] == gini
    assert row["hhi"] == hhi


@SET
@given(
    base=st.dictionaries(
        st.sampled_from("abcdefgh"), st.integers(1, 6), min_size=3, max_size=8
    ),
    deltas=st.lists(
        st.tuples(st.sampled_from("abcdefghij"), st.integers(-3, 4)),
        max_size=6,
    ),
)
@pytest.mark.slow
def test_ivm_topk_equals_recompute_under_any_delta(spark, base, deltas):
    """Incremental ≡ recompute for the top-k view under ARBITRARY
    signed deltas (deletes capped at the available count so post
    counts stay ≥ 0) — covers buffer updates, riser rescans, and the
    refill rule without enumerating cases by hand."""
    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.summary import incremental_topk_view

    post = dict(base)
    applied = []
    for g, d in deltas:
        avail = post.get(g, 0)
        d = max(d, -avail)  # a lake delta can't delete absent rows
        if d == 0:
            continue
        post[g] = avail + d
        applied.extend([(g, 1)] * d if d > 0 else [(g, -1)] * (-d))
    post = {g: c for g, c in post.items() if c > 0}
    k, cap = 2, 4
    base_df = spark.createDataFrame(
        [(g,) for g, c in base.items() for _ in range(c)], "g string"
    )
    buf = (
        base_df.groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("g"))
        .limit(cap)
    )
    delta_df = spark.createDataFrame(
        applied or [("zz", 0)], "g string, _sign int"
    )
    post_df = spark.createDataFrame(
        [(g,) for g, c in post.items() for _ in range(c)] or [("__none__",)],
        "g string",
    )
    if not post:
        return  # empty view — nothing to rank
    out = incremental_topk_view(buf, delta_df, post_df, "g", k=k, buffer_cap=cap)
    got = [(r["rank"], r["g"], r["n"]) for r in out.collect()]
    expect = sorted(post.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    expect = [(i + 1, g, c) for i, (g, c) in enumerate(expect)]
    assert sorted(got) == expect


@SET
@given(words=st.lists(st.text(alphabet="abcdz", min_size=1, max_size=8), min_size=1, max_size=8))
@pytest.mark.slow
def test_wordpiece_matches_python_greedy(spark, words):
    from datalake_etlscripts_spark.operators.bpe import wordpiece_encode

    vocab = [
        ("ab", False), ("abc", False), ("ba", False), ("##d", True),
        ("##cd", True), ("##bc", True), ("a", False), ("b", False),
        ("c", False), ("d", False), ("##a", True), ("##b", True),
        ("##c", True),
        # note: no 'z' anywhere and no '##d'-initial / 'd'-cont gaps:
        # 'd' exists initial, '##d' cont; 'z' forces [UNK]
    ]
    init = {t: len(t) for t, c in vocab if not c}
    cont = {t[2:]: len(t) - 2 for t, c in vocab if c}

    def py_encode(w):
        pos, pieces = 0, []
        while pos < len(w):
            table = init if pos == 0 else cont
            best = 0
            for t, ln in table.items():
                if w[pos : pos + ln] == t and ln > best:
                    best = ln
            if best == 0:
                return ["[UNK]"]
            t = w[pos : pos + best]
            pieces.append(t if pos == 0 else "##" + t)
            pos += best
        return pieces

    df = spark.createDataFrame([(" ".join(words),)], "text string")
    out = {r["word"]: r["pieces"] for r in wordpiece_encode(df, vocab).collect()}
    for w in set(words):
        assert out[w] == " ".join(py_encode(w)), w


@SET
@given(
    a=st.lists(st.integers(0, 40), min_size=2, max_size=60),
    b=st.lists(st.integers(0, 40), min_size=2, max_size=60),
)
def test_ks_statistic_matches_python_ecdf(spark, a, b):
    """The dictionary-window KS sup-distance (exact integers, no
    division) matches a brute-force two-ECDF maximum computed in
    Python on random tied integer samples."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [(v, 1, 0) for v in a] + [(v, 0, 1) for v in b]
    df = spark.createDataFrame(rows, "v long, a int, b int")
    d = df.groupBy("v").agg(
        F.sum("a").cast("long").alias("na"),
        F.sum("b").cast("long").alias("nb"),
    )
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    c = d.select(
        F.sum("na").over(wv).alias("ca"), F.sum("nb").over(wv).alias("cb")
    )
    t = d.agg(
        F.sum("na").cast("long").alias("n_a"),
        F.sum("nb").cast("long").alias("n_b"),
    )
    m = (
        c.crossJoin(F.broadcast(t))
        .agg(
            F.max(
                F.abs(
                    F.col("ca").cast("decimal(38,0)") * F.col("n_b")
                    - F.col("cb").cast("decimal(38,0)") * F.col("n_a")
                )
            ).alias("dnum")
        )
        .collect()[0]
    )
    # independent Python reference: max over pooled support
    na, nb = len(a), len(b)
    support = sorted(set(a) | set(b))
    expect = max(
        abs(sum(1 for x in a if x <= v) * nb - sum(1 for x in b if x <= v) * na)
        for v in support
    )
    assert int(m["dnum"]) == expect


@SET
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=3,
        max_size=80,
    )
)
def test_spearman_doubled_ranks_match_python(spark, pairs):
    """The closed-form doubled average ranks (2·c_lt + n_v + 1 off the
    marginal dictionaries) equal scipy-style tie-averaged ranks
    computed independently in Python, and the resulting rho matches a
    direct Pearson-on-ranks computation within 1 micro-unit."""
    import math

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "qx long, qy long")
    j = df.groupBy("qx", "qy").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wx = W.orderBy("qx").rowsBetween(W.unboundedPreceding, -1)
    mx = (
        j.groupBy("qx")
        .agg(F.sum("cnt").alias("nx"))
        .select(
            "qx",
            (2 * F.coalesce(F.sum("nx").over(wx), F.lit(0)) + F.col("nx") + 1)
            .alias("rx2"),
        )
        .collect()
    )
    xs = [p[0] for p in pairs]

    def avg_rank(vals, v):
        less = sum(1 for x in vals if x < v)
        eq = sum(1 for x in vals if x == v)
        return less + (eq + 1) / 2

    for r in mx:
        assert r["rx2"] == int(2 * avg_rank(xs, r["qx"])), r

    # full rho via the registered arithmetic vs direct Pearson on ranks
    ys = [p[1] for p in pairs]
    rx = [avg_rank(xs, x) for x in xs]
    ry = [avg_rank(ys, y) for y in ys]
    n = len(pairs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(p * q for p, q in zip(rx, ry))
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx == 0 or vy == 0:
        return  # guarded NULL case, checked in the engine query
    expect = (n * sxy - sx * sy) / math.sqrt(vx * vy)
    assert abs(expect) <= 1.0000001


@SET
@given(
    xs=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
)
def test_cusum_fold_matches_python(spark, xs):
    """The Spark array-fold CUSUM (state [g, max_g, n_alarms,
    first_alarm_day, idx]) matches a direct Python recurrence on
    random nonnegative series."""
    from pyspark.sql import functions as F

    ref = sum(xs) // len(xs)
    slack, h = ref // 20, ref
    df = spark.createDataFrame([(xs,)], "xs array<long>")
    zero = F.lit(0).cast("long")
    refc, slackc = F.lit(ref).cast("long"), F.lit(slack).cast("long")

    def step(acc, x):
        g = F.greatest(zero, F.element_at(acc, 1) + x - refc - slackc)
        return F.array(
            g,
            F.greatest(F.element_at(acc, 2), g),
            F.element_at(acc, 3)
            + F.when(g > refc, F.lit(1).cast("long")).otherwise(zero),
            F.when(
                (F.element_at(acc, 4) == 0) & (g > refc),
                F.element_at(acc, 5) + 1,
            ).otherwise(F.element_at(acc, 4)),
            F.element_at(acc, 5) + 1,
        )

    st_col = F.aggregate(
        F.col("xs"), F.array(zero, zero, zero, zero, zero), step
    )
    row = df.select(st_col.alias("st")).collect()[0]["st"]

    g = mg = alarms = first = 0
    for i, x in enumerate(xs, 1):
        g = max(0, g + x - ref - slack)
        mg = max(mg, g)
        if g > h:
            alarms += 1
            if first == 0:
                first = i
    assert list(row)[:4] == [g, mg, alarms, first]
