"""One-shot timing sweep over EVERY registered query (not just the
bench headliners) so optimization rounds can rank the whole registry
by cost instead of guessing from the 50-query bench. Single run per
query (cold-ish: codegen compile included), full-width forcing via
the same xxhash64-over-all-columns action bench.py uses. Emits one
JSON line {name: sec} sorted descending.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/sweep_all_queries.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(df) -> int:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.try_sum(F.xxhash64(*df.columns)).alias("h"),
    ).collect()[0]
    return row["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from datalake_etlscripts_spark.session import get_spark

    spark = get_spark("sweep-all")
    qs = e.queries()
    names = sys.argv[1:] or list(qs)
    timings: dict[str, float] = {}
    # warm the JVM once
    _force(qs["summary_counts"](spark, sf_dir))
    for name in names:
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.perf_counter()
        try:
            _force(qs[name](spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# ERROR {name}: {ex}", file=sys.stderr)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
    ordered = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"sf_dir": sf_dir, "n": len(ordered), "total": round(sum(timings.values()), 2), "queries": ordered}))


if __name__ == "__main__":
    main()
