"""Engine-wide physical-plan guards.

Every registered query's executed plan is swept for the two
scale-killers the 100 TB design bans outright:

- ``CartesianProduct`` — an unkeyed cross join that explodes
  quadratically. Deliberate 1-row scalar joins compile to
  BroadcastNestedLoopJoin instead, which is allowed.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan; the
  engine's only sanctioned Python surfaces are Arrow-batched
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).

Catching these in the plan (not in timings) keeps the guarantee even
for queries whose test data is too small to show the blow-up.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

BANNED = ("CartesianProduct", "BatchEvalPython")


def _plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Skew guard: static sweep of the optimized logical plan for SAME-KEY
# SELF-JOINS — a join whose two subtrees scan the same table and whose
# condition has exactly ONE column equality. Output is quadratic in
# the key's multiplicity, so one mega-key (a giant basket, a celebrity
# hub) explodes it — the uncapped co-order edge builder was exactly
# this shape. A candidate is cleared when the analysis can prove a
# bound:
#   - semi/anti joins (output ≤ one side, never quadratic);
#   - ≥2 equalities (a composite key bounds multiplicity);
#   - either side provably ≤1 row per key: a wrapper chain down to
#     Aggregate/Deduplicate grouped by the key alone (aliases are
#     traced through Projects) or a LIMIT 1;
#   - an intervening literal size cap: a Filter with a `<= N` bound
#     in either subtree (the _MAX_BASKET pattern, prefix-filter length
#     bands, etc.).
# Anything else must appear in SKEW_ALLOWLIST with a one-line reason —
# a NEW uncapped self-join therefore fails this suite until it is
# either capped or explicitly justified.
# ---------------------------------------------------------------------------
_REL = re.compile(r"Relation \[([^\]]*)\]")
_EQ = re.compile(r"(\w+)#\d+L?\s*=\s*(\w+)#\d+L?")
_CAPF = re.compile(r"Filter .*<=? ?\d")
_UNIQ_WRAPPERS = (
    "Project", "Filter", "Sort", "SubqueryAlias", "Repartition",
    "ResolvedHint", "GlobalLimit", "LocalLimit", "Window",
)

# Queries whose flagged self-joins are bounded by construction. Every
# entry documents WHY the join cannot explode; remove the entry and
# the suite fails if the bound ever regresses into an open self-join.
SKEW_ALLOWLIST = {
    # versioned/state merges: the key is unique per snapshot side by
    # construction (one row per id in state and in the batch aggregate)
    "field_diff": "both sides one row per id (two version snapshots)",
    "txstore_snapshot_diff": "full-outer merge of two per-id snapshots",
    "summary_incremental": "state⊕delta merge, one row per id each side",
    "storage_sync_plan": "store listings are one row per file_name",
    "golden_record_merge": "survivorship joins one row per ent per rule",
    "enrichment_resolved": "annotation table is one row per id",
    "enrichment_nested": "annotation table is one row per id",
    "multimodal_decode_real": "decoded side is one row per image id",
    "image_pixel_stats": "decoded side is one row per image id",
    "image_resize_stats": (
        "resize output and its byte-stats map are one row per image id"
    ),
    # blocked/banded similarity joins: the equi-key IS the bucket and
    # bucket sizes are bounded by the banding scheme (LSH bands,
    # winnow fingerprints, prefix-filter tokens)
    "dedup_incremental_lsh": "banded (band,bucket) join, LSH-bounded",
    "dedup_substrings_winnow": "fingerprint buckets from winnowing",
    "dedup_allpairs_prefix": "prefix-filter + length-band bounded",
    "source_duplication_matrix": "fingerprint-bucket join",
    # dictionary-bounded joins: the key has a small fixed domain or
    # one side is dictionary-sized (per-term/per-doc/per-label stats)
    "approx_aggregates": "l_returnflag has 3 values, quantile dict",
    "exact_distinct_quantiles": "l_returnflag has 3 values",
    "markov_next_accuracy": "per-state transition dictionary, top-1",
    "embedding_drift": "per-label centroid table",
    "label_outliers": "per-label centroid table",
    "embedding_covariance": "dim-pair join, d² rows per id, d fixed",
    "bm25_topk": "per-doc length table (one row per doc_id)",
    "query_likelihood_lm": "per-doc length table (one row per doc_id)",
    "bradley_terry_brands": (
        "brand-index dim is one row per i (row_number over the "
        "distinct-brand dictionary, |brands| = 25); the co-order pair "
        "join is brand-level per order, bounded by the same dictionary"
    ),
    "hybrid_search_rrf": "per-doc rank tables (one row per doc_id)",
    "gopher_length_auc": "per-doc score table (one row per doc_id)",
    "naive_bayes_confusion": "per-doc argmax table",
    "auc_by_language": "per-doc score table",
    "domain_mixture_sample": "broadcast per-source rate dim",
    "temperature_mixture_sample": "broadcast per-source rate dim",
    # spine/window joins bounded by the time dictionary or block size
    "interval_overlap": "range join blocked on _b, block-bounded",
    "attribution_position_based": "per-user first/mid/last shares",
    "fifo_allocation": "interval sweep, ≤1 matched lot per segment",
    "acf_grid": "lag join on (k, t−lag) composite",
    "fuzzy_name_match": "first-letter block + |len Δ|≤2 band in join cond",
    "adaboost_train_rounds": "per-id weight table, one row per id/round",
    "theil_sen_slope": "pairwise over hourly spine, dictionary-bounded n",
    "mann_kendall_trend": "pairwise over hourly spine, dictionary-bounded n",
}


def _parse_plan_tree(plan: str) -> list:
    nodes = []
    for ln in plan.splitlines():
        if not ln.strip():
            continue
        m = re.match(r"^([: ]*)(?:\+- |:- )?(.*)$", ln)
        depth = (
            0
            if not re.match(r"^[: ]*(\+-|:-)", ln)
            else len(m.group(1)) // 3 + 1
        )
        nodes.append((depth, m.group(2)))
    roots, stack = [], []
    for d, text in nodes:
        node = {"d": d, "t": text, "ch": []}
        while stack and stack[-1]["d"] >= d:
            stack.pop()
        (stack[-1]["ch"] if stack else roots).append(node)
        stack.append(node)
    return roots


def _leaf_relations(node, acc):
    m = _REL.search(node["t"])
    if m:
        acc.add(re.sub(r"#\d+L?", "", m.group(1)))
    for c in node["ch"]:
        _leaf_relations(c, acc)
    return acc


def _has_literal_cap(node) -> bool:
    return bool(_CAPF.search(node["t"])) or any(
        _has_literal_cap(c) for c in node["ch"]
    )


def _unique_on(node, key: str) -> bool:
    t = node["t"]
    m = re.match(r"(Aggregate|Deduplicate) \[([^\]]*)\],?", t)
    if m:
        groups = [g.strip() for g in m.group(2).split(",") if g.strip()]
        names = {re.sub(r"#\d+L?", "", g) for g in groups}
        if names <= {key}:
            return True
        # ONE group expression makes the key unique only if the key IS
        # that expression (aliased in the aggregate output) — grouping
        # by an unrelated column must NOT clear the flag
        if len(groups) == 1:
            line = re.sub(r"#\d+L?", "", t)
            g0 = re.sub(r"#\d+L?", "", groups[0])
            return g0 == key or f"{g0} AS {key}" in line
        return False
    if re.match(r"(GlobalLimit|LocalLimit) 1\b", t):
        return True
    head = t.split(" ", 1)[0].split("[", 1)[0]
    if head == "Project":
        pm = re.match(r"Project \[(.*)\]$", t)
        if pm:
            for part in re.split(r",(?![^(]*\))", pm.group(1)):
                am = re.match(
                    r"\s*(\w+)#\d+L?\s+AS\s+(\w+)#\d+L?\s*$", part
                )
                if am and am.group(2) == key:
                    key = am.group(1)
                    break
    if head in _UNIQ_WRAPPERS and node["ch"]:
        return _unique_on(node["ch"][0], key)
    return False


def _sweep_joins(node, risks):
    t = node["t"]
    if (
        t.startswith("Join ")
        and len(node["ch"]) == 2
        and "LeftSemi" not in t
        and "LeftAnti" not in t
    ):
        cond = t.split(", ", 1)[1] if ", " in t else ""
        eqs = _EQ.findall(cond)
        if cond.count(" = ") == 1 and len(eqs) == 1 and eqs[0][0] == eqs[0][1]:
            key = eqs[0][0]
            left, right = node["ch"]
            if _leaf_relations(left, set()) & _leaf_relations(right, set()):
                if not (
                    _unique_on(left, key)
                    or _unique_on(right, key)
                    or _has_literal_cap(left)
                    or _has_literal_cap(right)
                ):
                    risks.append(t[:110])
    for c in node["ch"]:
        _sweep_joins(c, risks)
    return risks


def self_join_skew_risks(df) -> list[str]:
    """Uncapped single-key self-joins in ``df``'s optimized plan."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    risks = []
    for root in _parse_plan_tree(plan):
        _sweep_joins(root, risks)
    return risks


# ---------------------------------------------------------------------------
# Explode guard (round-5 verdict #7): the OTHER quadratic-output shape
# — explode an unbounded array column on BOTH sides of an equi-join on
# the exploded value (shingle→shingle pair generation). Output per
# bucket is |side1| × |side2|, so one hot shingle/token explodes it
# exactly like a skewed self-join. A candidate is cleared by a literal
# `slice(...)`/`<= N` cap in the subtree (bounded shingle windows), or
# an EXPLODE_ALLOWLIST entry stating the bound.
# ---------------------------------------------------------------------------
_GEN_OUT = re.compile(r"Generate (?:pos)?explode\([^\n]*\[([^\]]*)\]\s*$")
# fan-out absorbers: below one of these, an explode's multiplicity has
# been collapsed to the group/limit dictionary — the join input is no
# longer the raw exploded stream
_GEN_STOPS = ("Aggregate", "Deduplicate", "GlobalLimit", "LocalLimit")


def _subtree_has(node, needle: str) -> bool:
    return needle in node["t"] or any(
        _subtree_has(c, needle) for c in node["ch"]
    )


def _gen_keys(node, acc):
    """Names generated by UNBOUNDED Generate-explode nodes reachable
    without crossing a fan-out absorber. A `slice(` anywhere in the
    Generate's subtree is a literal window bound and clears it."""
    head = node["t"].split(" ", 1)[0].split("[", 1)[0]
    if head in _GEN_STOPS:
        return acc
    m = _GEN_OUT.search(node["t"])
    if m and not _subtree_has(node, "slice("):
        for out in m.group(1).split(","):
            acc.add(re.sub(r"#\d+L?", "", out.strip()))
    for c in node["ch"]:
        _gen_keys(c, acc)
    return acc


def _sweep_explode_joins(node, risks):
    t = node["t"]
    if (
        t.startswith("Join ")
        and len(node["ch"]) == 2
        and "LeftSemi" not in t
        and "LeftAnti" not in t
    ):
        cond = t.split(", ", 1)[1] if ", " in t else ""
        eqs = _EQ.findall(cond)
        if cond.count(" = ") == 1 and len(eqs) == 1:
            lk, rk = eqs[0]
            left, right = node["ch"]
            if (
                lk in _gen_keys(left, set())
                and rk in _gen_keys(right, set())
                and not _has_literal_cap(left)
                and not _has_literal_cap(right)
            ):
                risks.append(t[:110])
    for c in node["ch"]:
        _sweep_explode_joins(c, risks)
    return risks


def explode_join_risks(df) -> list[str]:
    """Double-sided uncapped explode→equi-join shapes in ``df``'s
    optimized plan."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    risks = []
    for root in _parse_plan_tree(plan):
        _sweep_explode_joins(root, risks)
    return risks


# Queries whose flagged explode-joins are bounded by construction.
EXPLODE_ALLOWLIST: dict[str, str] = {
    # blocked range join: each interval explodes into the _b block ids
    # it spans (span/block_size per row, spans bounded by the event
    # horizon), and the join carries the overlap inequalities beside
    # the _b equality — per-block pairing is the range-join algorithm,
    # not an unbounded shingle blow-up
    "interval_overlap": "sequence() blocks bounded by interval span",
}


def _sweep_plans(spark, sf_dir, names=None):
    import __spark_entry__ as entry

    failures = {}
    skew = {}
    exploded = {}
    for name, fn in entry.queries().items():
        if names is not None and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = _plan_text(df)
        except Exception as ex:  # noqa: BLE001 — surface as a failure
            failures[name] = f"explain failed: {ex}"
            continue
        hits = [b for b in BANNED if b in plan]
        if hits:
            failures[name] = f"banned operators in plan: {hits}"
        risks = self_join_skew_risks(df)
        if risks and name not in SKEW_ALLOWLIST:
            skew[name] = risks
        erisks = explode_join_risks(df)
        if erisks and name not in EXPLODE_ALLOWLIST:
            exploded[name] = erisks
    assert not failures, f"pathological plans: {failures}"
    assert not skew, (
        "uncapped single-key self-joins (cap the key, prove uniqueness, "
        f"or annotate SKEW_ALLOWLIST with the bound): {skew}"
    )
    assert not exploded, (
        "uncapped explode→equi-join pair generation (slice the array, "
        f"or annotate EXPLODE_ALLOWLIST with the bound): {exploded}"
    )


# r08: the all-494-plans sweep (~6 min) is the builder-side marathon
# tier; the driver-run default tier sweeps the 50+ headline queries,
# which span every operator module.
@pytest.mark.slow
def test_no_pathological_plans(spark, sf_dir):
    _sweep_plans(spark, sf_dir)


def test_no_pathological_plans_headline(spark, sf_dir):
    import bench

    _sweep_plans(spark, sf_dir, names=set(bench.HEADLINE))


def test_skew_guard_catches_planted_uncapped_self_join(spark, sf_dir):
    """The sweep itself is tested: a naive lineitem self-join on
    l_orderkey (the exact shape the co-order cap removed) must be
    flagged, and the capped edge builder must be clean."""
    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.io.readers import read_table
    from datalake_etlscripts_spark.plans.graphops import _co_order_edges

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    planted = (
        li.join(
            li.select(
                F.col("l_orderkey"), F.col("l_partkey").alias("p2")
            ),
            "l_orderkey",
        )
        .filter(F.col("l_partkey") < F.col("p2"))
        .select("l_partkey", "p2")
    )
    assert self_join_skew_risks(planted), "planted join must be flagged"
    assert self_join_skew_risks(_co_order_edges(spark, sf_dir)) == []

    # grouping ONE side by a column UNRELATED to the join key must not
    # clear the flag (round-5 advice: the single-group shortcut was a
    # false negative) …
    grouped = li.groupBy("l_partkey").agg(
        F.max("l_orderkey").alias("l_orderkey")
    )
    unrelated = li.join(grouped.select("l_orderkey"), "l_orderkey")
    assert self_join_skew_risks(unrelated), (
        "group-by on a non-key column must not clear the skew flag"
    )
    # … while grouping by the join key itself still does
    keyed = li.join(
        li.groupBy("l_orderkey").agg(F.count("*").alias("n")),
        "l_orderkey",
    )
    assert self_join_skew_risks(keyed) == []


def test_explode_guard_catches_planted_uncapped_shingle_join(spark, sf_dir):
    """Uncapped shingle pair generation — explode(split(text)) on both
    sides of an equi-join on the token — must be flagged; slicing the
    array to a literal bound clears it."""
    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.io.readers import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    pairs = toks.join(
        toks.select(F.col("doc_id").alias("d2"), F.col("tok").alias("tok")),
        "tok",
    ).filter(F.col("doc_id") < F.col("d2"))
    assert explode_join_risks(pairs), "planted explode-join must be flagged"

    capped = d.select(
        "doc_id",
        F.explode(F.slice(F.split("text", " "), 1, 8)).alias("tok"),
    )
    cpairs = capped.join(
        capped.select(
            F.col("doc_id").alias("d2"), F.col("tok").alias("tok")
        ),
        "tok",
    ).filter(F.col("doc_id") < F.col("d2"))
    assert explode_join_risks(cpairs) == [], "sliced explode must clear"


def test_winnow_has_no_shuffle_before_pair_join(spark, sf_dir):
    """winnow_fingerprints is a pure per-row computation — its plan
    must contain NO Exchange (the pair join is the first and only
    shuffle of the substring-dedup pipeline)."""
    from pyspark.sql import functions as F

    from datalake_etlscripts_spark.io.readers import read_table
    from datalake_etlscripts_spark.operators.dedup import winnow_fingerprints

    d = read_table(spark, sf_dir, "documents")
    plan = _plan_text(winnow_fingerprints(d))
    assert "Exchange" not in plan, plan


def test_lm_score_does_not_force_broadcast_bigrams(spark, sf_dir):
    """The bigram count side of lm_avg_prob_score is corpus-vocabulary
    sized — the operator must not force-broadcast it (AQE may still
    pick broadcast at runtime; the guard is against the explicit hint,
    visible as ResolvedHint/broadcast in the optimized logical plan)."""
    from datalake_etlscripts_spark.io.readers import read_table
    from datalake_etlscripts_spark.operators.text import (
        lm_avg_prob_score,
        ngram_lm_counts,
    )

    d = read_table(spark, sf_dir, "documents")
    df = lm_avg_prob_score(d, ngram_lm_counts(d, max_order=2))
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    # exactly ONE broadcast hint may survive: the unigram (dictionary)
    # side. Two would mean the bigram table is hinted too.
    assert logical.count("ResolvedHint") <= 1, logical


def test_gopher_filter_is_shuffle_free(spark, sf_dir):
    """The composed quality filter is per-row only (after the optional
    input spread) — no aggregation/join Exchange in its plan."""
    from datalake_etlscripts_spark.io.readers import read_table
    from datalake_etlscripts_spark.operators.text import gopher_quality_filter

    d = read_table(spark, sf_dir, "documents")
    plan = _plan_text(gopher_quality_filter(d))
    assert "Exchange" not in plan, plan
