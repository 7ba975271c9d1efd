"""Capture .explain('formatted') output for named queries into
plans/$SPARK_GRAFT_PLANS_SUBDIR/<query>_<tag>.txt (default r08) — the
optimization round's plan evidence.

Usage: python scripts/capture_plans.py <tag> <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_SUBDIR", "r08"),
    )
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as e
    from datalake_etlscripts_spark.session import get_spark

    spark = get_spark("capture-plans")
    qs = e.queries()
    import bench

    qs = dict(qs) | bench.BENCH_ONLY
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} bytes, {n_ex} Exchange mentions -> {path}")


if __name__ == "__main__":
    main()
