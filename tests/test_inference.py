"""Unit tests for the hypothesis-testing lane (plans/inference.py) and
its companions (query_likelihood_topk, harmonic_closeness): Spark
results vs independent pure-Python models on small constructed inputs.
The DuckDB parity suite covers the registered queries end-to-end; these
pin the STATISTICS themselves against hand-computable references."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _mann_whitney_py(xs: list[int], ys: list[int]):
    """Exact tie-corrected Mann-Whitney on integers (2x-rank model)."""
    pooled = sorted(xs + ys)
    # 2*avg rank per value
    from collections import Counter

    cnt = Counter(pooled)
    two_rank = {}
    below = 0
    for v in sorted(cnt):
        two_rank[v] = 2 * below + cnt[v] + 1
        below += cnt[v]
    r2a = sum(two_rank[v] for v in xs)
    na, nb = len(xs), len(ys)
    n = na + nb
    u2 = r2a - na * (na + 1)
    tie = sum(t**3 - t for t in cnt.values())
    var = (na * nb) * ((n + 1) * n * (n - 1) - tie) / (12 * n * (n - 1))
    z = (u2 - na * nb) / (2 * math.sqrt(var))
    return u2, tie, math.floor(z * 1e6 + 0.5)


def test_mann_whitney_matches_python_model(spark):
    from datalake_etlscripts_spark.plans.inference import q_mann_whitney_u

    row = q_mann_whitney_u(spark, SF0001).collect()[0]
    import duckdb

    con = duckdb.connect()
    vals = con.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT) FROM "
        f"'{SF0001}/events.parquet' WHERE event_type IN ('click','purchase')"
    ).fetchall()
    xs = [v for t, v in vals if t == "click"]
    ys = [v for t, v in vals if t == "purchase"]
    u2, tie, zmic = _mann_whitney_py(xs, ys)
    assert row["n_a"] == len(xs) and row["n_b"] == len(ys)
    assert row["u2_a"] == u2
    assert row["tie_term"] == tie
    assert row["z_micros"] == zmic


def test_bh_stepup_invariants(spark):
    """discovered == (rank <= kmax) for the EXACT step-up kmax, and the
    adjusted p is nondecreasing in rank (min-from-the-bottom)."""
    from datalake_etlscripts_spark.plans.inference import q_bh_fdr_discoveries

    rows = sorted(
        q_bh_fdr_discoveries(spark, SF0001).collect(), key=lambda r: r["rnk"]
    )
    m = rows[0]["m"]
    assert len(rows) == m
    kmax = max(
        (r["rnk"] for r in rows if r["p32"] * m * 20 <= r["rnk"] * 2**32),
        default=0,
    )
    for r in rows:
        assert r["discovered"] == (1 if r["rnk"] <= kmax else 0)
    padj = [r["padj_micros"] for r in rows]
    assert padj == sorted(padj)
    assert all(0 <= p <= 1_000_000 for p in padj)
    # the planted purchase signal must be discovered first if anything is
    if kmax:
        assert rows[0]["event_type"] == "purchase"


def test_mcnemar_matches_python_model(spark):
    from datalake_etlscripts_spark.plans.inference import q_mcnemar_paired
    import duckdb

    row = q_mcnemar_paired(spark, SF0001).collect()[0]
    con = duckdb.connect()
    pairs = con.execute(
        "SELECT user_id, CAST(epoch(ts) AS BIGINT)//604800,"
        " max(CASE WHEN event_type='click' THEN 1 ELSE 0 END),"
        " max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        f" FROM '{SF0001}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    b = sum(1 for *_, cl, pu in pairs if cl == 1 and pu == 0)
    c = sum(1 for *_, cl, pu in pairs if cl == 0 and pu == 1)
    assert row["n_units"] == len(pairs)
    assert row["b_click_only"] == b
    assert row["c_purchase_only"] == c
    if b + c:
        assert row["stat_micros"] == ((b - c) * (b - c) * 1_000_000) // (b + c)


def test_brown_forsythe_matches_python_model(spark):
    from datalake_etlscripts_spark.plans.inference import (
        q_brown_forsythe_variance,
    )
    import duckdb

    rows = q_brown_forsythe_variance(spark, SF0001).collect()
    con = duckdb.connect()
    vals = con.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT) FROM "
        f"'{SF0001}/events.parquet'"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for g, v in vals:
        groups.setdefault(g, []).append(v)
    gs = {}
    for g, xs in groups.items():
        xs.sort()
        med = xs[(len(xs) + 1) // 2 - 1]
        z = [abs(x - med) for x in xs]
        gs[g] = (len(z), med, sum(z), sum(t * t for t in z))
    for r in rows:
        n_g, med, s_g, q_g = gs[r["event_type"]]
        assert (r["n_g"], r["med_cents"], r["s_g"], r["q_g"]) == (
            n_g,
            med,
            s_g,
            q_g,
        )
    n = sum(v[0] for v in gs.values())
    s = sum(v[2] for v in gs.values())
    k = len(gs)
    sg2 = 0.0
    for g in sorted(gs):  # fixed group order, as the engine folds
        sg2 += (gs[g][2] ** 2) / gs[g][0]
    q = sum(v[3] for v in gs.values())
    f = ((n - k) / (k - 1)) * ((sg2 - s * s / n) / (q - sg2))
    assert rows[0]["f_micros"] == math.floor(f * 1e6 + 0.5)


def test_query_likelihood_matches_python_model(spark):
    """Top-20 QL ranking replayed in pure Python over the sf0.001
    corpus: same candidates, same ordering, same scores."""
    from datalake_etlscripts_spark.operators.text import query_likelihood_topk

    d = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "text"
    )
    terms = ["data", "join", "spark"]
    got = query_likelihood_topk(d, terms, mu=2000, k=20).collect()
    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in d.collect()
    }
    c = sum(len(t) for t in docs.values())
    cf = {
        t: sum(toks.count(t) for toks in docs.values()) for t in terms
    }
    scored = []
    for did, toks in docs.items():
        tfs = {t: toks.count(t) for t in terms}
        if not any(tfs.values()):
            continue
        score = 1.0
        for t in sorted(terms):
            score *= (tfs[t] * c + 2000 * cf[t]) / ((len(toks) + 2000) * c)
        scored.append((did, sum(1 for t in terms if tfs[t]), score))
    scored.sort(key=lambda x: (-x[2], x[0]))
    want = scored[:20]
    assert [(r["doc_id"], r["n_hit"], r["score"]) for r in got] == want


def test_harmonic_closeness_matches_python_bfs(spark):
    """Seeded BFS replayed sequentially in Python on the sf0.001
    supplier-part graph: reached counts and exact 12/d sums match."""
    from datalake_etlscripts_spark.operators.graph import harmonic_closeness

    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    e0 = (
        li.select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
        .dropDuplicates()
        .collect()
    )
    adj: dict[int, set[int]] = {}
    for r in e0:
        adj.setdefault(r["src"], set()).add(r["dst"])
        adj.setdefault(r["dst"], set()).add(r["src"])
    edges = spark.createDataFrame(
        [(r["src"], r["dst"]) for r in e0]
        + [(r["dst"], r["src"]) for r in e0],
        "src bigint, dst bigint",
    )
    got = {
        r["seed"]: (r["reached"], r["harmonic_x12"])
        for r in harmonic_closeness(
            edges, [2, 4, 6, 8, 4], max_hops=4
        ).collect()  # duplicate seed must be deduped, not double-counted
    }
    for s in (2, 4, 6, 8):
        dist = {s: 0}
        frontier = [s]
        for d_ in range(1, 5):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = d_
                        nxt.append(v)
            frontier = nxt
        want_reached = sum(1 for v, dd in dist.items() if dd > 0)
        want_h = sum(12 // dd for v, dd in dist.items() if dd > 0)
        assert got[s] == (want_reached, want_h)


def test_kruskal_wallis_matches_python_model(spark):
    from datalake_etlscripts_spark.plans.inference import q_kruskal_wallis
    import duckdb

    rows = q_kruskal_wallis(spark, SF0001).collect()
    con = duckdb.connect()
    vals = con.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT) FROM "
        f"'{SF0001}/events.parquet'"
    ).fetchall()
    from collections import Counter

    groups: dict[str, list[int]] = {}
    for g, v in vals:
        groups.setdefault(g, []).append(v)
    pooled = Counter(v for _, v in vals)
    two_rank, below = {}, 0
    for v in sorted(pooled):
        two_rank[v] = 2 * below + pooled[v] + 1
        below += pooled[v]
    n = sum(len(xs) for xs in groups.values())
    tie = sum(t**3 - t for t in pooled.values())
    s = 0.0
    for g in sorted(groups):  # fixed group order, as the engine folds
        r2 = sum(two_rank[v] for v in groups[g])
        s += (r2 * r2) / (4 * len(groups[g]))
    h = 12.0 * s / (n * (n + 1)) - 3.0 * (n + 1)
    hc = h / (1.0 - tie / (n**3 - n))
    import math

    for r in rows:
        assert r["n_g"] == len(groups[r["event_type"]])
        assert r["r2_g"] == sum(two_rank[v] for v in groups[r["event_type"]])
        assert r["h_micros"] == math.floor(h * 1e6 + 0.5)
        assert r["h_tied_micros"] == math.floor(hc * 1e6 + 0.5)


def _dtw_py(a: list[int], b: list[int]) -> int:
    n, m = len(a), len(b)
    D = [[0] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                D[i][j] = c
            elif i == 0:
                D[i][j] = c + D[i][j - 1]
            elif j == 0:
                D[i][j] = c + D[i - 1][j]
            else:
                D[i][j] = c + min(
                    D[i - 1][j], D[i - 1][j - 1], D[i][j - 1]
                )
    return D[n - 1][m - 1]


def test_dtw_matches_python_dp(spark):
    """The nested-fold DTW must equal the classic imperative DP on the
    real sf0.001 hour-of-day profiles AND be symmetric."""
    from datalake_etlscripts_spark.plans.statops import (
        q_dtw_profile_distance,
    )
    import duckdb

    rows = q_dtw_profile_distance(spark, SF0001).collect()
    con = duckdb.connect()
    cnt = con.execute(
        "SELECT event_type, CAST(hour(ts) AS INT), count(*) FROM "
        f"'{SF0001}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    prof: dict[str, list[int]] = {}
    for g, h, c in cnt:
        prof.setdefault(g, [0] * 24)[h] = c
    assert len(rows) == 10  # 5 choose 2
    for r in rows:
        pa, pb = prof[r["type_a"]], prof[r["type_b"]]
        assert r["l1"] == sum(abs(x - y) for x, y in zip(pa, pb))
        assert r["dtw"] == _dtw_py(pa, pb)
        assert r["dtw"] == _dtw_py(pb, pa)  # symmetry of the DP
        assert r["dtw"] <= r["l1"]  # warping can only help


def test_holt_winters_matches_python_recurrence(spark):
    """The declarative fold must equal the imperative triple-exponential
    recurrence (alpha=1/4, beta=1/8, gamma=1/4) on the real sf0.001
    series — bit-for-bit, since both are IEEE doubles in the same
    operation order."""
    from datalake_etlscripts_spark.plans.featureops import (
        q_holt_winters_forecast,
    )
    import duckdb

    rows = {r["h"]: r for r in q_holt_winters_forecast(spark, SF0001).collect()}
    con = duckdb.connect()
    cnt = dict(
        con.execute(
            "SELECT CAST(epoch(date_trunc('hour', ts)) - epoch((SELECT"
            " min(date_trunc('hour', ts)) FROM"
            f" '{SF0001}/events.parquet')) AS BIGINT) // 3600, count(*)"
            f" FROM '{SF0001}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    obs = [float(cnt.get(i, 0)) for i in range(168)]
    P = 24
    lvl = sum_ = 0.0
    for x in obs[:P]:
        sum_ += x
    lvl = sum_ / float(P)
    s2 = 0.0
    for x in obs[P : 2 * P]:
        s2 += x
    tr = (s2 - sum_) / float(P * P)
    seas = [obs[i] - lvl for i in range(P)]
    t = P
    for x in obs[P:]:
        idx = t % P
        s_old = seas[idx]
        lvl_new = 0.25 * (x - s_old) + 0.75 * (lvl + tr)
        tr_new = 0.125 * (lvl_new - lvl) + 0.875 * tr
        seas[idx] = 0.25 * (x - lvl_new) + 0.75 * s_old
        lvl, tr = lvl_new, tr_new
        t += 1
    for h in range(1, P + 1):
        want = lvl + h * tr + seas[(t + h - 1) % P]
        assert rows[h]["forecast"] == want
        assert rows[h]["level"] == lvl and rows[h]["trend"] == tr


def test_conformal_matches_python_replay(spark):
    """Exact Python replay of the md5 split, the rational residuals,
    the order-statistic radius, and the coverage count."""
    from datalake_etlscripts_spark.plans.inference import (
        q_conformal_interval_coverage,
    )
    import duckdb
    import hashlib
    import math

    row = q_conformal_interval_coverage(spark, SF0001).collect()[0]
    con = duckdb.connect()
    ev = con.execute(
        "SELECT event_id, event_type, CAST(hour(ts) AS INT),"
        " CAST(floor(value*100+0.5) AS BIGINT) FROM"
        f" '{SF0001}/events.parquet'"
    ).fetchall()
    S = 4294967296
    split = []
    for eid, g, h, y in ev:
        p32 = int(hashlib.md5(str(eid).encode()).hexdigest()[:8], 16)
        lane = (
            "tr" if p32 * 10 < S * 6 else "cal" if p32 * 10 < S * 8 else "te"
        )
        split.append((lane, g, h, y))
    cells: dict[tuple, list[int]] = {}
    for lane, g, h, y in split:
        if lane == "tr":
            cells.setdefault((g, h), []).append(y)
    tr = {k: (len(v), sum(v)) for k, v in cells.items()}
    cal = sorted(
        abs(y * tr[(g, h)][0] - tr[(g, h)][1]) / tr[(g, h)][0]
        for lane, g, h, y in split
        if lane == "cal" and (g, h) in tr
    )
    qhat = cal[math.ceil(0.9 * (len(cal) + 1)) - 1]
    te = [
        abs(y * tr[(g, h)][0] - tr[(g, h)][1]) / tr[(g, h)][0]
        for lane, g, h, y in split
        if lane == "te" and (g, h) in tr
    ]
    covered = sum(1 for r in te if r <= qhat)
    assert row["n_train"] == sum(n for n, _ in tr.values())
    assert row["n_cal"] == len(cal)
    assert row["n_test"] == len(te)
    assert row["q_micros"] == math.floor(qhat * 1e6 + 0.5)
    assert row["covered"] == covered
    assert row["coverage_permille"] == covered * 1000 // len(te)


def test_yuen_matches_python_model(spark):
    """Trimmed/winsorized statistics replayed with plain Python sorts
    — validates the dictionary partial-tie rank-band arithmetic."""
    from datalake_etlscripts_spark.plans.inference import q_yuen_trimmed_test
    import duckdb

    row = q_yuen_trimmed_test(spark, SF0001).collect()[0]
    con = duckdb.connect()
    vals = con.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT) FROM "
        f"'{SF0001}/events.parquet' WHERE event_type IN"
        " ('click','purchase')"
    ).fetchall()

    def stats(name):
        xs = sorted(v for g, v in vals if g == name)
        n = len(xs)
        g = n // 5
        h = n - 2 * g
        mid = xs[g : n - g]
        lo, hi = xs[g], xs[n - g - 1]
        w = [min(max(x, lo), hi) for x in xs]
        a = n * sum(t * t for t in w) - sum(w) ** 2
        return n, h, lo, hi, sum(mid), float(a)

    n_a, h_a, lo_a, hi_a, sm_a, aa = stats("click")
    n_b, h_b, lo_b, hi_b, sm_b, ab_ = stats("purchase")
    assert (row["n_a"], row["h_a"], row["lo_a"], row["hi_a"]) == (
        n_a, h_a, lo_a, hi_a,
    )
    assert (row["n_b"], row["h_b"], row["lo_b"], row["hi_b"]) == (
        n_b, h_b, lo_b, hi_b,
    )
    assert (row["summid_a"], row["summid_b"]) == (sm_a, sm_b)
    t = (sm_a / h_a - sm_b / h_b) / math.sqrt(
        aa / (n_a * h_a * (h_a - 1)) + ab_ / (n_b * h_b * (h_b - 1))
    )
    assert row["t_micros"] == math.floor(t * 1e6 + 0.5)


def test_bradley_terry_matches_python_mm(spark):
    """Ten synchronous MM rounds replayed in Python from the raw
    pairwise win counts (DuckDB recomputes the comparisons)."""
    from datalake_etlscripts_spark.plans.featureops import (
        q_bradley_terry_brands,
    )
    import duckdb

    rows = {
        r["brand"]: r["score"]
        for r in q_bradley_terry_brands(spark, SF0001).collect()
    }
    con = duckdb.connect()
    pr = con.execute(
        f"""
        WITH ob AS (
          SELECT l_orderkey AS o, p.p_brand AS brand,
                 CAST(max(l_quantity) AS BIGINT) AS q
          FROM '{SF0001}/lineitem.parquet' li
          JOIN '{SF0001}/part.parquet' p ON p.p_partkey = li.l_partkey
          GROUP BY 1, 2
        )
        SELECT a.brand, b.brand,
               sum(CASE WHEN a.q > b.q THEN 1 ELSE 0 END),
               sum(CASE WHEN b.q > a.q THEN 1 ELSE 0 END)
        FROM ob a JOIN ob b ON a.o = b.o AND a.brand < b.brand
        GROUP BY 1, 2
        """
    ).fetchall()
    brands = sorted(rows)
    idx = {br: i for i, br in enumerate(brands)}
    K = len(brands)
    n = [[0.0] * K for _ in range(K)]
    for ba, bb, wab, wba in pr:
        n[idx[ba]][idx[bb]] = float(wab)
        n[idx[bb]][idx[ba]] = float(wba)
    w = []
    for i in range(K):
        s = 0.0
        for j in range(K):
            s += n[i][j]
        w.append(s)
    p = [1.0] * K
    for _ in range(10):
        nxt = []
        for i in range(K):
            den = 0.0
            for j in range(K):
                den += 0.0 if j == i else (n[i][j] + n[j][i]) / (p[i] + p[j])
            nxt.append(0.0 if den == 0.0 else w[i] / den)
        p = nxt
    s = 0.0
    for x in p:
        s += x
    for br in brands:
        assert rows[br] == p[idx[br]] / s


def test_motif_and_sax_match_python(spark):
    """Motif SSE pairs and SAX words replayed in plain Python."""
    from datalake_etlscripts_spark.plans.statops import (
        q_daily_motif_pairs,
        q_sax_daily_symbols,
    )
    import duckdb

    con = duckdb.connect()
    cnt = dict(
        con.execute(
            "SELECT CAST(epoch(date_trunc('hour', ts)) - epoch((SELECT"
            " min(date_trunc('hour', ts)) FROM"
            f" '{SF0001}/events.parquet')) AS BIGINT) // 3600, count(*)"
            f" FROM '{SF0001}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    obs = [cnt.get(i, 0) for i in range(168)]
    days = [obs[d * 24 : (d + 1) * 24] for d in range(7)]

    want_sse = {}
    for i in range(7):
        for j in range(i + 1, 7):
            want_sse[(i, j)] = sum(
                (x - y) ** 2 for x, y in zip(days[i], days[j])
            )
    motif = min(want_sse, key=lambda k: (want_sse[k], k))
    rows = q_daily_motif_pairs(spark, SF0001).collect()
    assert len(rows) == 21
    for r in rows:
        assert r["sse"] == want_sse[(r["day_a"], r["day_b"])]
        assert r["is_motif"] == (
            1 if (r["day_a"], r["day_b"]) == motif else 0
        )

    segs = [
        (d, sg, sum(days[d][sg * 4 : sg * 4 + 4]))
        for d in range(7)
        for sg in range(6)
    ]
    order = sorted(segs, key=lambda t: (t[2], t[0], t[1]))
    n = len(order)
    qof = {}
    for rn, (d, sg, s) in enumerate(order, 1):
        qof[(d, sg)] = (
            0 if rn * 4 <= n else 1 if rn * 2 <= n else 2
            if rn * 4 <= 3 * n else 3
        )
    want_words = {
        d: "".join(chr(97 + qof[(d, sg)]) for sg in range(6))
        for d in range(7)
    }
    got = {r["day"]: r for r in q_sax_daily_symbols(spark, SF0001).collect()}
    for d in range(7):
        assert got[d]["sax_word"] == want_words[d]
        assert got[d]["day_total"] == sum(days[d])


def test_rls_matches_python_recurrence(spark):
    """The declarative RLS fold equals the imperative Sherman-Morrison
    recurrence bit-for-bit on the real sf0.001 series."""
    from datalake_etlscripts_spark.plans.featureops import q_rls_ar1_forecast
    import duckdb

    row = q_rls_ar1_forecast(spark, SF0001).collect()[0]
    con = duckdb.connect()
    cnt = dict(
        con.execute(
            "SELECT CAST(epoch(date_trunc('hour', ts)) - epoch((SELECT"
            " min(date_trunc('hour', ts)) FROM"
            f" '{SF0001}/events.parquet')) AS BIGINT) // 3600, count(*)"
            f" FROM '{SF0001}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    obs = [float(cnt.get(i, 0)) for i in range(168)]
    lam = 0.984375
    px, a, b = obs[0], 0.0, 0.0
    p00, p01, p11 = 1000.0, 0.0, 1000.0
    for t in range(1, len(obs)):
        y = obs[t]
        pu0 = p00 + p01 * px
        pu1 = p01 + p11 * px
        den = lam + (p00 + p01 * px) + px * (p01 + p11 * px)
        e = y - (a + b * px)
        a2 = a + (pu0 / den) * e
        b2 = b + (pu1 / den) * e
        p00n = (p00 - (pu0 / den) * pu0) / lam
        p01n = (p01 - (pu0 / den) * pu1) / lam
        p11n = (p11 - (pu1 / den) * pu1) / lam
        a, b, p00, p01, p11, px = a2, b2, p00n, p01n, p11n, y
    assert row["intercept"] == a
    assert row["ar_coef"] == b
    assert row["forecast_next"] == a + b * px
    assert row["last_x"] == px


def test_viterbi_matches_python_backtrack(spark):
    """The packed-path fold must equal a classic Viterbi with explicit
    backpointer arrays, including the decoded state sequence."""
    from datalake_etlscripts_spark.plans.events import (
        q_viterbi_user_state_path,
    )
    import duckdb

    got = {
        r["user_id"]: r
        for r in q_viterbi_user_state_path(spark, SF0001).collect()
    }
    con = duckdb.connect()
    act = con.execute(
        "SELECT user_id, CAST(hour(ts) AS INT) FROM"
        f" '{SF0001}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    hours: dict[int, set[int]] = {}
    for u, h in act:
        hours.setdefault(u, set()).add(h)
    E = {(0, 0): 2, (0, 1): -3, (1, 0): -2, (1, 1): 1}
    T = {(0, 0): 1, (1, 0): -2, (0, 1): -2, (1, 1): 1}
    for u, hs in hours.items():
        xs = [1 if h in hs else 0 for h in range(24)]
        score = [[0] * 2 for _ in range(24)]
        back = [[0] * 2 for _ in range(24)]
        score[0][0] = 0 + E[(0, xs[0])]
        score[0][1] = -1 + E[(1, xs[0])]
        for t in range(1, 24):
            for s in range(2):
                c0 = score[t - 1][0] + T[(0, s)]
                c1 = score[t - 1][1] + T[(1, s)]
                if c0 >= c1:  # tie toward state 0, as the engine
                    score[t][s] = c0 + E[(s, xs[t])]
                    back[t][s] = 0
                else:
                    score[t][s] = c1 + E[(s, xs[t])]
                    back[t][s] = 1
        best = 0 if score[23][0] >= score[23][1] else 1
        path = [best]
        for t in range(23, 0, -1):
            path.append(back[t][path[-1]])
        path.reverse()
        bits = 0
        for s in path:
            bits = (bits << 1) | s
        r = got[u]
        assert r["score"] == max(score[23])
        assert r["best_state"] == best
        assert r["path_bits"] == bits
        assert r["n_active"] == sum(xs)
        assert r["switches"] == sum(
            1 for i in range(23) if path[i] != path[i + 1]
        )


def test_good_turing_matches_python(spark):
    from datalake_etlscripts_spark.plans.inference import (
        q_good_turing_counts,
    )
    import duckdb
    from collections import Counter

    rows = {r["r"]: r for r in q_good_turing_counts(spark, SF0001).collect()}
    con = duckdb.connect()
    texts = [
        t for (t,) in con.execute(
            f"SELECT text FROM '{SF0001}/documents.parquet'"
        ).fetchall()
    ]
    tc = Counter()
    for t in texts:
        tc.update(w for w in t.split(" ") if w)
    ff = Counter(tc.values())
    n_tokens = sum(tc.values())
    for r, n_r in ff.items():
        row = rows[r]
        assert row["n_r"] == n_r
        assert row["n_r_plus_1"] == ff.get(r + 1, 0)
        if ff.get(r + 1):
            assert row["r_star_micros"] == ((r + 1) * ff[r + 1] * 10**6) // n_r
        else:
            assert row["r_star_micros"] is None
        assert row["mass_micros"] == (r * n_r * 10**6) // n_tokens


def test_eb_shrinkage_invariants(spark):
    """Shrinkage must pull every cell toward the prior mean, more for
    small cells; raw == x/n exactly."""
    from datalake_etlscripts_spark.plans.inference import q_eb_shrunken_rates

    rows = q_eb_shrunken_rates(spark, SF0001).collect()
    assert rows
    s1 = sum(r["raw_rate"] for r in rows)
    mu = s1 / len(rows)
    for r in rows:
        assert r["raw_rate"] == r["x"] / r["n"]
        # shrunk lies between raw and (approximately) the prior mean
        lo, hi = sorted((r["raw_rate"], mu))
        assert lo - 0.15 <= r["shrunk_rate"] <= hi + 0.15
        # shrinkage is strictly between raw and prior unless degenerate
        if abs(r["raw_rate"] - mu) > 1e-9:
            assert abs(r["shrunk_rate"] - mu) < abs(r["raw_rate"] - mu) + 1e-9


def test_turning_points_and_cramers_v_match_python(spark):
    from datalake_etlscripts_spark.plans.inference import (
        q_cramers_v_type_dow,
        q_turning_points_test,
    )
    import duckdb

    con = duckdb.connect()
    cnt = dict(
        con.execute(
            "SELECT CAST(epoch(date_trunc('hour', ts)) - epoch((SELECT"
            " min(date_trunc('hour', ts)) FROM"
            f" '{SF0001}/events.parquet')) AS BIGINT) // 3600, count(*)"
            f" FROM '{SF0001}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    obs = [cnt.get(i, 0) for i in range(168)]
    tp = sum(
        1
        for i in range(1, 167)
        if (obs[i] > obs[i - 1] and obs[i] > obs[i + 1])
        or (obs[i] < obs[i - 1] and obs[i] < obs[i + 1])
    )
    row = q_turning_points_test(spark, SF0001).collect()[0]
    n = 168
    assert (row["n"], row["tp"]) == (n, tp)
    z = ((3 * tp - 2 * (n - 2)) / 3.0) / math.sqrt((16 * n - 29) / 90.0)
    assert row["z_micros"] == math.floor(z * 1e6 + 0.5)

    cells = con.execute(
        "SELECT event_type, dayofweek(ts), count(*) FROM"
        f" '{SF0001}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    rr: dict[str, int] = {}
    cc: dict[int, int] = {}
    for g, dw, c in cells:
        rr[g] = rr.get(g, 0) + c
        cc[dw] = cc.get(dw, 0) + c
    N = sum(rr.values())
    chi2 = 0.0
    for g, dw, o in sorted(cells):
        num = o * N - rr[g] * cc[dw]
        chi2 += (num * num) / (N * rr[g] * cc[dw])
    v = math.sqrt(chi2 / (N * min(len(rr) - 1, len(cc) - 1)))
    crow = q_cramers_v_type_dow(spark, SF0001).collect()[0]
    assert crow["chi2_micros"] == math.floor(chi2 * 1e6 + 0.5)
    assert crow["v_micros"] == math.floor(v * 1e6 + 0.5)
