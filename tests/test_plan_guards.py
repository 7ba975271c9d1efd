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
