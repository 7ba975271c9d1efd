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
from contextlib import redirect_stdout

import pytest

BANNED = ("CartesianProduct", "BatchEvalPython")


def _plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_pathological_plans(spark, sf_dir):
    import __spark_entry__ as entry

    failures = {}
    for name, fn in entry.queries().items():
        try:
            plan = _plan_text(fn(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — surface as a failure
            failures[name] = f"explain failed: {ex}"
            continue
        hits = [b for b in BANNED if b in plan]
        if hits:
            failures[name] = f"banned operators in plan: {hits}"
    assert not failures, f"pathological plans: {failures}"


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
