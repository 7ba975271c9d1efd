"""Driver-replica correctness gate: every queries() entry with an
oracle must hash-match DuckDB at the oracle scale factor."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as e  # noqa: E402
from oracle_harness import compare, duckdb_conn  # noqa: E402


def _names():
    return sorted(e.queries())


@pytest.fixture(scope="module")
def con(sf_oracle_dir):
    return duckdb_conn(sf_oracle_dir)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, spark, con, sf_oracle_dir):
    qs, oracles = e.queries(), e.oracle_sql()
    sdf = qs[name](spark, sf_oracle_dir)
    if name not in oracles:
        assert sdf.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    issues = compare(sdf, con.execute(oracles[name]).df())
    assert not issues, f"{name}: {issues}"


def test_entry_smoke(spark):
    df = e.entry(spark)
    assert df.count() > 0
