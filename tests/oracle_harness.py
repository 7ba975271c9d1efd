"""Local replica of the driver's DuckDB-oracle comparison.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin on the
same parquet tables, then compares row count, schema (column names)
and an order-insensitive value hash — strict equality, including
float bit-patterns, because the driver hashes values.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    canon = df.copy()
    for c in canon.columns:
        canon[c] = canon[c].map(_canon_value)
    canon = canon.sort_values(by=list(canon.columns), kind="mergesort").reset_index(drop=True)
    return canon


def _canon_value(v):
    import numpy as np

    if v is None:
        return "\x00NULL"
    if isinstance(v, float) and math.isnan(v):
        return "\x00NULL"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(str(_canon_value(x)) for x in v) + "]"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    return str(v)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    issues: list[str] = []
    spark_pdf = spark_df.toPandas()
    if len(spark_pdf) != len(oracle_pdf):
        issues.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        issues.append(f"schema: spark={s_cols} oracle={o_cols}")
        return issues
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    if len(a) == len(b):
        neq = (a != b)
        if neq.any().any():
            bad_cols = [c for c in a.columns if neq[c].any()]
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                issues.append(
                    f"value col={c} row={idx}: spark={a[c][idx]!r} oracle={b[c][idx]!r}"
                )
    return issues


def run_all(sf_dir: str, only: list[str] | None = None) -> dict[str, list[str]]:
    import __spark_entry__ as e
    from datalake_etlscripts_spark.session import get_spark

    spark = get_spark("oracle-harness")
    con = duckdb_conn(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    results: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                opdf = con.execute(oracles[name]).df()
                results[name] = compare(sdf, opdf)
            else:
                n = sdf.count()
                results[name] = [] if n >= 0 else ["negative rowcount?"]
                results[name].append(f"(rows-only check: {n} rows)") if False else None
        except Exception as ex:  # noqa: BLE001
            results[name] = [f"EXCEPTION: {type(ex).__name__}: {ex}"]
    return results


if __name__ == "__main__":
    import sys

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    res = run_all(sf, only=sys.argv[1:] or None)
    n_bad = 0
    for name, issues in sorted(res.items()):
        status = "PASS" if not issues else "FAIL"
        n_bad += bool(issues)
        print(f"{status} {name}")
        for i in issues:
            print(f"      {i}")
    print(f"{len(res) - n_bad}/{len(res)} pass")
    sys.exit(1 if n_bad else 0)
