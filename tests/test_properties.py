"""Property-based tests (hypothesis): Spark column expressions vs
pure-Python reference implementations on generated inputs.

The reference repo has no tests at all (SURVEY.md §5); beyond the
golden/invariant suites, these pin the engine's scalar/array semantics
against an independent Python model with shrinking counterexamples.
Each example batches all generated rows into ONE DataFrame → one Spark
job, so the suite stays fast despite JVM round-trips.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# words over a small alphabet, joined with single spaces (the engine's
# tokenizer splits on single spaces and drops empties)
word = st.text(alphabet="abXé9.", min_size=1, max_size=4)
doc = st.lists(word, min_size=0, max_size=12).map(" ".join)


def _py_tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


def _py_shingles(text: str, k: int) -> list[str]:
    toks = _py_tokens(text)
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    seen: list[str] = []
    for g in grams:
        if g not in seen:
            seen.append(g)  # array_distinct keeps first-occurrence order
    return seen


@SET
@given(docs=st.lists(doc, min_size=1, max_size=30), k=st.integers(1, 4))
def test_shingles_match_python_reference(spark, docs, k):
    from datalake_etlscripts_spark.operators.text import shingles

    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i int, t string")
    got = {
        r["i"]: r["s"] for r in df.select("i", shingles(F.col("t"), k).alias("s")).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == _py_shingles(d, k), (d, k)


@SET
@given(orders=st.lists(st.integers(0, 19_999_999), min_size=1, max_size=50))
def test_ntp_id_format_parse_roundtrip(spark, orders):
    from datalake_etlscripts_spark.functions.scalar import (
        format_ntp_id,
        is_valid_ntp_id,
        ntp_group,
        parse_ntp_id,
    )

    df = spark.createDataFrame([(o,) for o in orders], "o long")
    out = df.select(
        "o",
        parse_ntp_id(format_ntp_id(F.col("o"))).alias("back"),
        is_valid_ntp_id(format_ntp_id(F.col("o"))).alias("ok"),
        ntp_group(format_ntp_id(F.col("o"))).alias("grp"),
    ).collect()
    for r in out:
        assert r["back"] == r["o"]
        assert r["ok"] is True
        # id space partition: minors start at 10,000,000 (ntp1…)
        assert r["grp"] == ("minors" if r["o"] >= 10_000_000 else "contracts")


ts_str = st.datetimes(
    min_value=__import__("datetime").datetime(2000, 1, 1),
    max_value=__import__("datetime").datetime(2030, 1, 1),
).map(lambda d: d.strftime("%Y-%m-%d %H:%M:%S") + (".123" if d.second % 2 else ""))


@SET
@given(
    a=st.lists(ts_str, min_size=0, max_size=6),
    b=st.lists(ts_str, min_size=0, max_size=6),
)
@pytest.mark.slow
def test_merge_updates_union_truncate_sort(spark, a, b):
    """A8 (ntp_utils.py:257-265 semantics): merged timestamp set =
    sorted distinct union of the 19-char-truncated strings."""
    from datalake_etlscripts_spark.functions.scalar import truncate_ts

    df = spark.createDataFrame([(a, b)], "a array<string>, b array<string>")
    merged = df.select(
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.transform("a", lambda x: truncate_ts(x)),
                    F.transform("b", lambda x: truncate_ts(x)),
                )
            )
        ).alias("m")
    ).first()["m"]
    assert merged == sorted({x[:19] for x in a} | {x[:19] for x in b})


@SET
@given(docs=st.lists(doc, min_size=2, max_size=12))
@pytest.mark.slow
def test_ngram_jaccard_matches_python(spark, docs):
    from datalake_etlscripts_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, d, "xx") for i, d in enumerate(docs)], "doc_id long, text string, lang string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, k=2, threshold=0.0, length_bucket=10**9
        ).collect()
    }
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            sa, sb = set(_py_shingles(docs[i], 2)), set(_py_shingles(docs[j], 2))
            if not sa and not sb:
                continue  # no shingles on either side: pair is undefined/absent
            expect = len(sa & sb) / len(sa | sb) if (sa | sb) else 0.0
            assert abs(got.get((i, j), 0.0) - expect) < 1e-12, (docs[i], docs[j])


EDGE_DOCS = ["", " ", "   ", "a", ".", "A B", "é", "a a a", "\t", "x " * 200]


@pytest.mark.slow
def test_text_operators_survive_degenerate_documents(spark):
    """Empty / whitespace / single-token documents must produce NULL
    ratios, never an ANSI divide-by-zero job abort — at 100 TB a
    degenerate row is a certainty and one row must not kill a stage."""
    from datalake_etlscripts_spark.operators.dedup import (
        minhash_signatures,
        ngram_jaccard_pairs,
        simhash_table,
    )
    from datalake_etlscripts_spark.operators.text import (
        bow_fingerprint,
        content_fingerprint,
        detect_language,
        quality_features,
        repetition_features,
        tfidf_top_terms,
    )

    df = spark.createDataFrame(
        [(i, d, "xx") for i, d in enumerate(EDGE_DOCS)],
        "doc_id long, text string, lang string",
    )
    q = quality_features(df).collect()
    empty = {r["doc_id"]: r for r in q}
    assert empty[0]["punct_ratio"] is None  # '' → undefined, not a crash
    assert empty[1]["distinct_ratio"] is None  # ' ' → zero tokens
    rep = repetition_features(df).collect()
    assert {r["doc_id"] for r in rep} == set(range(len(EDGE_DOCS)))
    # fingerprints, language id: total functions, defined everywhere
    df.select(
        content_fingerprint(F.col("text")), bow_fingerprint(F.col("text")), detect_language(F.col("text"))
    ).collect()
    # pair/signature pipelines: run end-to-end without raising
    ngram_jaccard_pairs(df, k=2, threshold=0.0, length_bucket=10**9).collect()
    assert minhash_signatures(df).count() == len(EDGE_DOCS)
    assert simhash_table(df).count() == len(EDGE_DOCS)
    assert tfidf_top_terms(df, k=2).count() > 0

    # round-2 ops: total functions over degenerate docs, never a crash
    from datalake_etlscripts_spark.operators.dedup import (
        substring_duplicate_pairs,
        winnow_fingerprints,
    )
    from datalake_etlscripts_spark.operators.sampling import length_bucketed_batches
    from datalake_etlscripts_spark.operators.text import (
        gopher_quality_filter,
        hashed_linear_score,
    )

    g = {r["doc_id"]: r for r in gopher_quality_filter(df).collect()}
    assert set(g) == set(range(len(EDGE_DOCS)))
    assert g[0]["keep"] is False and g[0]["fail_reasons"]  # '' fails, named
    sc = {r["doc_id"]: r["quality_score"] for r in
          hashed_linear_score(df, [0.5] * 16).collect()}
    assert sc[0] is None  # empty doc → NULL score, not divide-by-zero
    assert winnow_fingerprints(df, k=4, w=3).filter("_did = 0").count() == 0
    substring_duplicate_pairs(df, k=4, w=3, min_shared=1).collect()
    b = {r["doc_id"]: r for r in length_bucketed_batches(df).collect()}
    # the empty doc shares bucket 0 with other short docs; its batch
    # pads to the batch max, which is >= its own length
    assert b[0]["n_tokens"] == 0 and b[0]["pad_to"] >= 0


@SET
@given(
    texts=st.lists(st.text(alphabet="ab c\n", min_size=0, max_size=300), min_size=1, max_size=15),
    chunk=st.integers(5, 60),
    overlap=st.integers(0, 4),
)
def test_chunking_reconstructs_text(spark, texts, chunk, overlap):
    """Chunk coverage invariant: stripping the overlap from every
    chunk but the last and concatenating reconstructs the document
    exactly — no characters lost or duplicated."""
    from datalake_etlscripts_spark.operators.sampling import chunk_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    out = chunk_documents(df, chunk_chars=chunk, overlap=overlap)
    rows = out.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_no"], r["chunk_text"]))
    step = chunk - overlap
    for i, t in enumerate(texts):
        if t == "":
            assert i not in by_doc
            continue
        chunks = [c for _, c in sorted(by_doc[i])]
        rebuilt = "".join(c[:step] for c in chunks[:-1]) + chunks[-1]
        assert rebuilt == t, (t, chunk, overlap, chunks)


@SET
@given(
    events=st.lists(
        st.tuples(st.integers(0, 4), st.sampled_from(["view", "click", "purchase", "other"])),
        min_size=0,
        max_size=40,
    )
)
def test_funnel_matches_python_reference(spark, events):
    """Funnel fold vs a pure-Python ordered scan over the same
    (ts, event_id)-sorted event sequence per user."""
    from datetime import datetime, timedelta

    from datalake_etlscripts_spark.operators.events import funnel_steps

    steps = ["view", "click", "purchase"]
    rows = [
        (eid, datetime(2024, 1, 1) + timedelta(minutes=eid % 7), user, typ)
        for eid, (user, typ) in enumerate(events)
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {r["user_id"]: r["max_step"] for r in funnel_steps(df, steps).collect()}

    by_user: dict[int, list] = {}
    for eid, ts, user, typ in rows:
        if typ in steps:
            by_user.setdefault(user, []).append((ts, eid, typ))
    for user, evs in by_user.items():
        acc = 0
        for _, _, typ in sorted(evs):
            if acc < len(steps) and typ == steps[acc]:
                acc += 1
        assert got[user] == acc, (user, evs)
    for user in got:
        assert user in by_user


def _py_canonical_url(url: str) -> str:
    from urllib.parse import urlsplit

    p = urlsplit(url)
    host = (p.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    path = p.path.rstrip("/")
    return host + path


url_path_seg = st.text(alphabet="abz09-_", min_size=1, max_size=6)


@SET
@given(
    urls=st.lists(
        st.tuples(
            st.sampled_from(["http", "https"]),
            st.sampled_from(["", "www."]),
            st.text(alphabet="abcXYZ09", min_size=1, max_size=8),
            st.lists(url_path_seg, min_size=0, max_size=3),
            st.sampled_from(["", "/", "?q=1&utm_source=x", "#frag", "/?a=b#c"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_canonical_url_matches_urllib_reference(spark, urls):
    """canonical_url (parse_url-based) agrees with a urllib reference
    across generated scheme/www/case/path/query/fragment variants."""
    from datalake_etlscripts_spark.functions.scalar import canonical_url

    full = [
        f"{scheme}://{www}{host}.example" + "".join("/" + s for s in segs) + tail
        for scheme, www, host, segs, tail in urls
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(full)], "i int, u string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("u")).alias("c")).collect()
    }
    for i, u in enumerate(full):
        assert got[i] == _py_canonical_url(u), u


def _py_winnow(text: str, k: int, w: int) -> set:
    import hashlib

    grams = [text[i : i + k] for i in range(len(text) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


@SET
@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=120), min_size=1, max_size=12
    ),
    k=st.integers(2, 6),
    w=st.integers(2, 8),
)
def test_winnow_fingerprints_match_python_reference(spark, texts, k, w):
    """Winnowing fingerprint SETS (md5 scheme) equal an independent
    Python model for arbitrary text/k/w, including too-short inputs
    (no fingerprints, never a crash)."""
    from datalake_etlscripts_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    fps = winnow_fingerprints(df, k=k, w=w, scheme="md5")
    got: dict[int, set] = {}
    for r in fps.collect():
        got.setdefault(r["_did"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _py_winnow(t, k, w), (t, k, w)


@SET
@given(
    docs=st.lists(doc, min_size=1, max_size=20),
    phrase=st.lists(st.sampled_from(["a", "b", "ab", "X"]), min_size=1, max_size=3),
)
@pytest.mark.slow
def test_phrase_matches_python_reference(spark, docs, phrase):
    from datalake_etlscripts_spark.operators.text import phrase_matches

    # docs over the same tiny alphabet; phrase terms deliberately
    # overlap token prefixes so substring false-matches would surface
    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["_did"]: (r["n_matches"], r["first_pos"])
        for r in phrase_matches(df, list(phrase)).collect()
    }
    want = {}
    for i, d in rows:
        toks = _py_tokens(d)
        hits = [
            j
            for j in range(len(toks) - len(phrase) + 1)
            if toks[j : j + len(phrase)] == list(phrase)
        ]
        if hits:
            want[i] = (len(hits), hits[0])
    assert got == want


def _py_lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[0], i
        for j, cb in enumerate(b, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
    return d[len(b)]


@SET
@given(
    names=st.lists(
        st.text(alphabet="abcde", min_size=6, max_size=10),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
@pytest.mark.slow
def test_fuzzy_match_complete_vs_brute_force(spark, names):
    """Every name ≥ q·(d+1) = 6 chars → the q-gram count-filter
    blocking is COMPLETE: the blocked join must equal brute force."""
    import itertools

    from datalake_etlscripts_spark.operators.enrichment import fuzzy_match_pairs

    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_match_pairs(df, "name", max_dist=2).collect()
    }
    want = {
        (a, b, _py_lev(a, b))
        for a, b in itertools.combinations(sorted(names), 2)
        if _py_lev(a, b) <= 2
    }
    assert got == want


@SET
@given(
    old_rows=st.dictionaries(
        st.integers(0, 12), st.text(alphabet="abc", min_size=0, max_size=3), max_size=10
    ),
    new_rows=st.dictionaries(
        st.integers(0, 12), st.text(alphabet="abc", min_size=0, max_size=3), max_size=10
    ),
)
@pytest.mark.slow
def test_cdc_diff_apply_roundtrip(spark, old_rows, new_rows):
    """apply_changeset(old, dataframe_diff(old, new)) ≡ new for any
    pair of keyed tables — the CDC pair is lossless by construction."""
    from datalake_etlscripts_spark.io.txstore import apply_changeset, dataframe_diff

    schema = "k INT, v STRING"
    old = spark.createDataFrame(list(old_rows.items()) or [], schema)
    new = spark.createDataFrame(list(new_rows.items()) or [], schema)
    diff = dataframe_diff(old, new, "k")
    got = sorted((r["k"], r["v"]) for r in apply_changeset(old, diff, "k").collect())
    assert got == sorted(new_rows.items())


@SET
@given(docs=st.lists(doc, min_size=1, max_size=20))
@pytest.mark.slow
def test_bm25_matches_python_model(spark, docs):
    """bm25_topk replays a pure-Python model of the same integer
    arithmetic exactly (scores compared bit-for-bit)."""
    from datalake_etlscripts_spark.operators.text import bm25_topk

    terms = ["ab", "X9"]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id INT, text STRING"
    )
    got = {
        r["doc_id"]: (r["n_hit"], r["score"])
        for r in bm25_topk(df, terms, k=100).collect()
    }

    toks = {i: _py_tokens(d) for i, d in enumerate(docs)}
    n = len(docs)
    total = sum(len(t) for t in toks.values())
    dft = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    expected = {}
    for i, tk in toks.items():
        score, hits = 0.0, 0
        for t in sorted(terms):  # term-ordered fold, same as the engine
            tf = tk.count(t)
            if tf == 0:
                continue
            hits += 1
            num = (2 * n - 2 * dft[t] + 1) * 22 * tf * total
            den = (2 * dft[t] + 1) * (10 * tf * total + 3 * total + 9 * len(tk) * n)
            score += num / den
        if hits:
            expected[i] = (hits, score)
    assert got == expected


@SET
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
        max_size=20,
    )
)
@pytest.mark.slow
def test_triangle_counts_match_brute_force(spark, edges):
    from itertools import combinations

    from datalake_etlscripts_spark.operators.graph import triangle_counts

    und = {(min(u, v), max(u, v)) for u, v in edges}
    if not und:
        return
    df = spark.createDataFrame(sorted(und), "u INT, v INT")
    got = {r["node"]: (r["degree"], r["n_triangles"]) for r in triangle_counts(df).collect()}

    nodes = {x for e in und for x in e}
    deg = {x: sum(1 for e in und if x in e) for x in nodes}
    tri_count = dict.fromkeys(nodes, 0)
    for a, b, c in combinations(sorted(nodes), 3):
        if ((a, b) in und and (a, c) in und and (b, c) in und):
            for x in (a, b, c):
                tri_count[x] += 1
    assert got == {x: (deg[x], tri_count[x]) for x in nodes}


@SET
@given(docs=st.lists(doc, min_size=1, max_size=16))
@pytest.mark.slow
def test_allpairs_prefix_lossless_vs_brute_force(spark, docs):
    """Prefix filtering must be LOSSLESS: the candidate pruning can
    never drop a qualifying pair on any corpus."""
    from itertools import combinations

    from datalake_etlscripts_spark.operators.dedup import allpairs_jaccard_pairs

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id INT, text STRING"
    )
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in allpairs_jaccard_pairs(df, threshold=(1, 2)).collect()
    }
    expected = {}
    for (i, a), (j, b) in combinations(enumerate(docs), 2):
        sa, sb = set(_py_tokens(a)), set(_py_tokens(b))
        union = sa | sb
        if union and 2 * len(sa & sb) >= len(union):
            expected[(i, j)] = len(sa & sb) / len(union)
    assert got == expected


@SET
@given(
    keys=st.lists(st.integers(0, 50), min_size=1, max_size=25, unique=True),
    num=st.integers(1, 7),
    den=st.integers(1, 3),
)
def test_mixture_upsample_matches_python_model(spark, keys, num, den):
    import hashlib

    from datalake_etlscripts_spark.operators.sampling import mixture_upsample

    df = spark.createDataFrame([(k, "s") for k in keys], ["k", "g"])
    got = sorted(
        (r["k"], r["epoch"])
        for r in mixture_upsample(df, "k", "g", {"s": (num, den)}).collect()
    )
    expected = []
    base, frac_num = num // den, num - (num // den) * den
    for k in keys:
        h32 = int(hashlib.md5(f"ups:{k}".encode()).hexdigest()[:8], 16)
        copies = base + (1 if frac_num > 0 and h32 * den < frac_num * (1 << 32) else 0)
        expected.extend((k, e) for e in range(copies))
    assert got == sorted(expected)


@SET
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(0, 4)),
        min_size=1,
        max_size=40,
    ),
    w=st.integers(1, 4),
)
@pytest.mark.slow
def test_rolling_distinct_matches_python_model(spark, events, w):
    from datetime import datetime, timedelta

    from datalake_etlscripts_spark.operators.events import rolling_distinct

    base = datetime(2024, 1, 1)
    rows = [
        (f"k{k}", base + timedelta(hours=h, minutes=7), e) for k, h, e in events
    ]
    df = spark.createDataFrame(rows, "key STRING, ts TIMESTAMP, e BIGINT")
    got = {
        (r["key"], r["window_end"]): r["n_entities"]
        for r in rolling_distinct(df, "key", "ts", "e", window_hours=w).collect()
    }
    hours = {}
    for k, h, e in events:
        hours.setdefault((f"k{k}", h), set()).add(e)
    expected = {}
    for (k, h), _ in hours.items():
        for end in range(h, h + w):
            seen = set()
            for back in range(w):
                seen |= hours.get((k, end - back), set())
            expected[(k, base + timedelta(hours=end))] = len(seen)
    assert got == expected


@given(
    words=st.lists(
        st.text(alphabet="abektrsc_9", min_size=1, max_size=12),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.slow
def test_unigram_viterbi_matches_python_dp(spark, words):
    from datalake_etlscripts_spark.operators.bpe import unigram_viterbi_encode

    vocab = {"ta": 1700, "ble": 2500, "abe": 2100, "be": 1900, "kt": 2600,
             "rs": 1800, "st": 1600, "cr": 2050}

    def py_encode(word):
        lcap = 15
        best = [(0, 0)]  # (cost, backlen)
        for jn in range(1, len(word) + 1):
            ch = word[jn - 1]
            cands = [((best[jn - 1][0] + (1000 if "a" <= ch <= "z" else 10000)) * 16
                      + (lcap - 1))]
            for p, c in sorted(vocab.items()):
                pl = len(p)
                if jn >= pl and word[jn - pl:jn] == p:
                    cands.append((best[jn - pl][0] + c) * 16 + (lcap - pl))
            k = min(cands)
            best.append((k >> 4, lcap - (k & 15)))
        pos, pieces = len(word), []
        while pos > 0:
            bl = best[pos][1]
            pieces.insert(0, word[pos - bl:pos])
            pos -= bl
        return " ".join(pieces), len(pieces), best[len(word)][0]

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], ["text"])
    got = {
        r["word"]: (r["pieces"], r["n_pieces"], r["total_cost"])
        for r in unigram_viterbi_encode(df, vocab).collect()
    }
    from collections import Counter
    freqs = Counter(w for w in words if w)
    assert set(got) == set(freqs)
    for w in freqs:
        assert got[w] == py_encode(w), w


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 5000), st.integers(0, 800)), min_size=1, max_size=12
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 5000), st.integers(0, 800)), min_size=1, max_size=12
    ),
    bucket=st.sampled_from([100, 250, 1000]),
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.slow
def test_interval_overlap_join_matches_bruteforce(spark, lefts, rights, bucket):
    from datalake_etlscripts_spark.operators.events import interval_overlap_join

    L = [(i, s, s + d) for i, (s, d) in enumerate(lefts)]
    R = [(i, s, s + d) for i, (s, d) in enumerate(rights)]
    ldf = spark.createDataFrame(L, ["id_a", "start_us", "end_us"])
    rdf = spark.createDataFrame(R, ["id_b", "start_us", "end_us"])
    got = {
        (r["id_a"], r["id_b"]): r["overlap_us"]
        for r in interval_overlap_join(ldf, rdf, bucket_us=bucket).collect()
    }
    want = {
        (a, b): min(ea, eb) - max(sa, sb)
        for a, sa, ea in L
        for b, sb, eb in R
        if sa <= eb and sb <= ea
    }
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=12).map(
            lambda ts: " ".join(ts)
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.slow
def test_soft_dedup_weights_matches_python(spark, docs):
    from collections import Counter

    from datalake_etlscripts_spark.operators.dedup import soft_dedup_weights

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["commonness"], r["weight"])
        for r in soft_dedup_weights(df, k=3).collect()
    }

    def grams(t):
        tk = [w for w in t.split(" ") if w]
        return [" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)]

    freq = Counter(g for _, t in rows for g in grams(t))
    want = {}
    for i, t in rows:
        gs = grams(t)
        if not gs:
            want[i] = (0, None, 1.0)
        else:
            mass = sum(freq[g] for g in gs)
            c = mass / len(gs)
            want[i] = (len(gs), c, 1.0 / c)
    assert got == want


@given(
    counts=st.lists(st.integers(0, 50), min_size=2, max_size=40),
    mult=st.sampled_from([1, 2, 3]),
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.slow
def test_cusum_matches_python_replay(spark, counts, mult):
    from datetime import datetime, timedelta

    from datalake_etlscripts_spark.operators.events import cusum_rate_shift

    base = datetime(2024, 6, 1)
    rows = []
    for h, c in enumerate(counts):
        rows += [("k", base + timedelta(hours=h, minutes=m % 60, seconds=m // 60))
                 for m in range(c)]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    r = cusum_rate_shift(df, alarm_mult=mult).collect()[0]
    xs = [c for c in counts if c > 0]  # empty hours are not observed
    H, T = len(xs), sum(xs)
    s = a = p = 0
    for x in xs:
        s = max(0, s + x * H - T)
        a += 1 if s > mult * T else 0
        p = max(p, s)
    assert (r["n_hours"], r["total"], r["n_alarms"], r["peak_s"]) == (H, T, a, p)


def _py_stress(und_edges, seed, max_hops):
    """Pure-Python replay of bounded-depth stress centrality: BFS
    levels with path counts, then backward continuation counts."""
    adj: dict[int, set[int]] = {}
    for a, b in und_edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if seed not in adj:
        return {seed: (0, 1, 0)}
    dist = {seed: 0}
    sigma = {seed: 1}
    frontier = [seed]
    for d in range(1, max_hops + 1):
        nxt: dict[int, int] = {}
        for v in frontier:
            for w in adj.get(v, ()):  # noqa: B905
                if w in dist:
                    continue
                nxt[w] = nxt.get(w, 0) + sigma[v]
        for w, s in nxt.items():
            dist[w] = d
            sigma[w] = s
        frontier = list(nxt)
    t = {v: 0 for v in dist}
    for d in range(max_hops - 1, -1, -1):
        for v in [x for x in dist if dist[x] == d]:
            t[v] = sum(
                1 + t[w]
                for w in adj.get(v, ())
                if dist.get(w) == d + 1
            )
    return {v: (dist[v], sigma[v], sigma[v] * t[v]) for v in dist}


@SET
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=25,
    ),
    hops=st.integers(1, 4),
)
@pytest.mark.slow
def test_stress_centrality_matches_python_reference(spark, edges, hops):
    """Operator ≡ sequential replay on random ≤10-node graphs: dist,
    sigma, and through agree for every reached node (independent
    implementation — catches semantic mistakes oracle parity can't)."""
    from datalake_etlscripts_spark.operators.graph import stress_centrality

    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    seed = und[0][0]
    sym = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(sym, "src bigint, dst bigint")
    got = {
        r["node"]: (r["dist"], r["sigma"], r["through"])
        for r in stress_centrality(df, seed=seed, max_hops=hops).collect()
    }
    assert got == _py_stress(und, seed, hops)


def _py_ktruss(und_edges, k, rounds):
    """Naive re-enumerating k-truss replay (the pre-delta semantics
    the oracle unrolls): per round, count each edge's triangles among
    CURRENT edges, keep support >= k-2."""
    e = set(und_edges)
    supp: dict[tuple[int, int], int] = {}
    for _ in range(rounds):
        supp = {}
        es = sorted(e)
        for i, (a, b) in enumerate(es):
            for (c, d) in es[i + 1:]:
                if c != b:
                    continue
                # wedge a<b=c<d: close with (a, d)
                if (a, d) in e:
                    for pair in ((a, b), (b, d), (a, d)):
                        supp[pair] = supp.get(pair, 0) + 1
        e = {p for p, s in supp.items() if s >= k - 2}
    return {p: s for p, s in supp.items() if s >= k - 2}


@SET
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=3,
        max_size=22,
    ),
    rounds=st.integers(1, 3),
)
@pytest.mark.slow
def test_ktruss_delta_matches_naive_reenumeration(spark, edges, rounds):
    """The delta-maintained peeling (triangles enumerated once, dead
    edges subtracted per round) must equal the naive recompute-
    everything form on random graphs — including the fixpoint
    early-exit path."""
    from datalake_etlscripts_spark.operators.graph import ktruss

    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    df = spark.createDataFrame(und, "u bigint, v bigint")
    got = {
        (r["u"], r["v"]): r["support"]
        for r in ktruss(df, k=4, rounds=rounds).collect()
    }
    assert got == _py_ktruss(und, 4, rounds)


@SET
@given(
    data=st.binary(min_size=0, max_size=400),
    w=st.integers(1, 20),
    ch=st.sampled_from([3, 4]),
)
def test_qoi_roundtrip_random_pixels(data, w, ch):
    """QOI encode→decode is the identity on arbitrary pixel bytes
    (padded to a whole number of pixels)."""
    from datalake_etlscripts_spark.operators.multimodal import (
        decode_qoi_pixels,
        encode_qoi,
    )

    n_px = max(1, len(data) // ch)
    px = (data + bytes(ch * n_px))[: ch * n_px]
    h = (n_px + w - 1) // w
    px = (px + bytes(ch * w * h))[: ch * w * h]
    assert decode_qoi_pixels(encode_qoi(w, h, px, channels=ch)) == (
        w,
        h,
        ch,
        px,
    )


@SET
@given(
    data=st.binary(min_size=0, max_size=300),
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    ch=st.sampled_from([1, 3]),
    bo=st.sampled_from(["<", ">"]),
    rps=st.integers(1, 13),
)
def test_tiff_roundtrip_random(data, w, h, ch, bo, rps):
    from datalake_etlscripts_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    px = (data + bytes(ch * w * h))[: ch * w * h]
    raw = encode_tiff(w, h, px, channels=ch, byte_order=bo, rows_per_strip=rps)
    assert decode_tiff_pixels(raw) == (w, h, ch, px)


@SET
@given(samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=200))
def test_mulaw_quantizer_properties(samples):
    """µ-law decode∘encode is a projection (idempotent on values) and
    sign-preserving; quantization error is bounded by the segment
    step."""
    from datalake_etlscripts_spark.operators.multimodal import (
        mulaw_decode,
        mulaw_encode,
    )

    dec = mulaw_decode(mulaw_encode(samples))
    assert mulaw_decode(mulaw_encode(dec)) == dec
    for s, d in zip(samples, dec):
        assert (d == 0) or (d > 0) == (s > 0)
        step = 2 ** max(
            (min(abs(s), 32635) + 132).bit_length() - 8, 0
        ) * 8
        assert abs(d - s) <= max(step, 8)


@SET
@given(
    nibbles=st.lists(st.integers(0, 15), min_size=0, max_size=300),
    pred0=st.integers(-32768, 32767),
    idx0=st.integers(0, 88),
)
def test_adpcm_container_roundtrip_random(nibbles, pred0, idx0):
    """The format-17 RIFF container carries any nibble stream + block
    header losslessly: parsing the encoded WAV reproduces exactly the
    direct recurrence's samples (odd counts exercise the pad nibble),
    every sample clamped to int16."""
    from datalake_etlscripts_spark.operators.multimodal import (
        adpcm_decode_nibbles,
        decode_wav_samples,
        encode_wav_adpcm,
    )

    raw = encode_wav_adpcm(8000, nibbles, pred0, idx0)
    rate, ch, samples = decode_wav_samples(raw)
    assert (rate, ch) == (8000, 1)
    assert samples == adpcm_decode_nibbles(nibbles, pred0, idx0)
    assert len(samples) == 1 + len(nibbles)
    assert all(-32768 <= s <= 32767 for s in samples)


@SET
@given(nibbles=st.lists(st.integers(0, 15), min_size=4, max_size=60))
def test_adpcm_malformed_blocks_raise(nibbles):
    """Truncated data chunks and out-of-range step indices raise the
    codec layer's ValueError contract, never IndexError."""
    import pytest

    from datalake_etlscripts_spark.operators.multimodal import (
        decode_wav_adpcm,
        encode_wav_adpcm,
    )

    raw = encode_wav_adpcm(8000, nibbles, 0, 0)
    fmt = raw[20:40]
    data_len = 4 + (len(nibbles) + 1) // 2
    data = raw[48 : 48 + data_len]
    assert len(decode_wav_adpcm(fmt, data)) == 1 + len(nibbles)
    with pytest.raises(ValueError):
        decode_wav_adpcm(fmt, data[:3])  # shorter than the header
    with pytest.raises(ValueError):
        decode_wav_adpcm(fmt, data[: 4 + (len(nibbles) - 1) // 4])
    bad = bytes([data[0], data[1], 89, 0]) + data[4:]
    with pytest.raises(ValueError):
        decode_wav_adpcm(fmt, bad)  # step index out of range


@SET
@given(
    coords=st.lists(
        st.tuples(
            st.integers(-90000000, 90000000),
            st.integers(-180000000, 180000000),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_geohash_engine_matches_python_reference(spark, coords):
    """The closed-form Spark geohash (one multiply-divide per axis +
    interleave) matches an independent bisection-loop reference on
    random micro-degree coordinates, and neighboring points share
    prefixes no shorter than the reference's."""
    from datalake_etlscripts_spark.plans.geoops import (
        _gh_chars_sql,
        _interleave_terms,
    )

    def ref_geohash(latm, lonm):
        # classic bisection, independent of the closed-form engine path
        alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_lo, lat_hi = -90e6, 90e6
        lon_lo, lon_hi = -180e6, 180e6
        bits = []
        for k in range(40):
            if k % 2 == 0:
                mid = (lon_lo + lon_hi) / 2
                if lonm >= mid:
                    bits.append(1)
                    lon_lo = mid
                else:
                    bits.append(0)
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if latm >= mid:
                    bits.append(1)
                    lat_lo = mid
                else:
                    bits.append(0)
                    lat_hi = mid
        v = 0
        for b in bits:
            v = (v << 1) | b
        return "".join(alpha[(v >> (35 - 5 * i)) & 31] for i in range(8))

    df = spark.createDataFrame(coords, "lat_micro long, lon_micro long")
    rows = (
        df.selectExpr(
            "lat_micro",
            "lon_micro",
            "least((lat_micro + 90000000) * 1048576 div 180000000, 1048575)"
            " AS latq",
            "least((lon_micro + 180000000) * 1048576 div 360000000, 1048575)"
            " AS lonq",
        )
        .selectExpr(
            "lat_micro",
            "lon_micro",
            f"{_interleave_terms('lonq', 'latq')} AS gh_int",
        )
        .selectExpr(
            "lat_micro", "lon_micro", f"{_gh_chars_sql('gh_int')} AS geohash"
        )
        .collect()
    )
    for r in rows:
        expect = ref_geohash(r["lat_micro"], r["lon_micro"])
        # the closed-form quantizer floors where the float bisection
        # can epsilon-disagree exactly ON a bucket boundary; both are
        # valid geohash cells, so compare through the integer path
        assert r["geohash"] == expect, (r["lat_micro"], r["lon_micro"])


@SET
@given(
    pts=st.lists(
        st.tuples(
            st.integers(0, 180_000_000), st.integers(0, 360_000_000)
        ),
        min_size=1,
        max_size=200,
    ),
    hub=st.tuples(
        st.integers(0, 180_000_000), st.integers(0, 360_000_000)
    ),
)
def test_geo_cell_blocking_has_no_false_negatives(pts, hub):
    """The radius join's correctness invariant: with cell size C = R,
    every point within R of the hub lies in one of the hub's 9
    neighbor cells — so the cell equi-join can only ADD candidates
    (removed by the exact verify), never lose a true match. Mirrors
    the exact integer arithmetic of q_geo_radius_join."""
    R = 5_000_000
    hlat, hlon = hub
    hcells = {
        (hlat // R + da, hlon // R + dc)
        for da in (-1, 0, 1)
        for dc in (-1, 0, 1)
    }
    for lat, lon in pts:
        d2 = (lat - hlat) ** 2 + (lon - hlon) ** 2
        if d2 <= R * R:
            assert (lat // R, lon // R) in hcells, (lat, lon, hub)
