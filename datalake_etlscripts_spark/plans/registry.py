"""Query registry backing ``__spark_entry__.py``.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame``
paired (when SQL-expressible) with an ANSI-SQL oracle string DuckDB can
run against the same parquet tables. Column names are aliased
identically on both sides — the driver's compare hashes values after
sorting columns by name.

Float determinism policy: any aggregate over DOUBLE columns is summed
in DECIMAL (exact, engine-independent) and cast back to DOUBLE, so the
value hash matches DuckDB bit-for-bit. Ratios divide two such exact
numbers in IEEE754 double — also bit-deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
