"""Best-of-N timing for named queries — the bench.py methodology
(xxhash64-over-all-columns forcing, min of N runs) on an arbitrary
subset, for optimization A/Bs.

Usage: python scripts/abtime.py [-nN] <query> [<query> ...]
"""

from __future__ import annotations

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
    args = sys.argv[1:]
    n_runs = 4
    if args and args[0].startswith("-n"):
        n_runs = int(args[0][2:])
        args = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from datalake_etlscripts_spark.session import get_spark

    spark = get_spark("abtime")
    import bench

    qs = dict(e.queries()) | bench.BENCH_ONLY
    _force(qs["summary_counts"](spark, sf_dir))  # JVM warmup
    for name in args:
        spark.sparkContext.setJobDescription(f"abtime: {name}")
        samples = []
        cpus = []
        gcs = []
        for _ in range(n_runs):
            c0, g0 = bench._jvm_meters(spark)
            t0 = time.perf_counter()
            n = _force(qs[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
            c1, g1 = bench._jvm_meters(spark)
            cpus.append((c1 - c0) if c0 is not None and c1 is not None else -1.0)
            gcs.append((g1 - g0) if g0 is not None and g1 is not None else -1)
        # JVM CPU (utime+stime of the local-mode JVM) is steal-immune:
        # on this host wall-clock swings ±5x under hypervisor noise
        # (see bench.py), so A/B decisions key on min CPU, not wall.
        print(
            f"{name}: min={min(samples):.3f}s cpu_at_best="
            f"{cpus[samples.index(min(samples))]:.1f}s min_cpu={min(cpus):.1f}s "
            f"runs={[round(s, 2) for s in samples]} "
            f"cpu={[round(c, 1) for c in cpus]} gc_ms={gcs} rows={n}"
        )


if __name__ == "__main__":
    main()
