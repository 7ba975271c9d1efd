"""Mergeable distinct-count sketch state (HLL).

The reference's calc_summary.py:53-81 recomputes counts over the full
collection every run; summary.incremental_summary fixes that for plain
counts, but DISTINCT counts are not self-maintainable from deltas —
you cannot decrement a distinct count. The standard 100 TB answer is
mergeable sketch state: keep a per-group HyperLogLog sketch (Apache
DataSketches, built into Spark 4 as ``hll_sketch_agg``/``hll_union``),
fold each new batch's sketches in with a union-merge, and estimate on
read. The base table is scanned once per batch — never re-scanned —
and the stored state is a few KB per group.

Union-merge also gives hierarchy rollups for free: nation-level
sketches union into region-level without touching the fact table
(the "hypertable rollup" shape — coarse grains derived from fine).

All operators are JVM-side built-ins: one shuffle per groupBy, sketch
payloads are small binary columns, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH_COL = "sketch"


def distinct_sketch_table(
    df: DataFrame, keys: list[str], value: str, lgk: int = 12
) -> DataFrame:
    """Build per-group HLL sketch state: (*keys, sketch BINARY).
    lgk=12 → ~1.6% relative standard error, ≤ 4 KB per group."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value), F.lit(lgk)).alias(SKETCH_COL)
    )


def merge_sketch_tables(*tables: DataFrame) -> DataFrame:
    """Union-merge sketch states (the incremental-maintenance step:
    yesterday's state ∪ today's batch state). Groups present in any
    input survive; same keys' sketches union losslessly."""
    keys = [c for c in tables[0].columns if c != SKETCH_COL]
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*keys).agg(
        F.hll_union_agg(F.col(SKETCH_COL), F.lit(True)).alias(SKETCH_COL)
    )


def rollup_sketches(state: DataFrame, coarser_keys: list[str]) -> DataFrame:
    """Derive a coarser-grain sketch table by union-merging the fine
    grain — no fact-table access."""
    return state.groupBy(*coarser_keys).agg(
        F.hll_union_agg(F.col(SKETCH_COL), F.lit(True)).alias(SKETCH_COL)
    )


def estimate_distinct(state: DataFrame, alias: str = "approx_distinct") -> DataFrame:
    """Readable view of sketch state: keys + estimated distinct count."""
    keys = [c for c in state.columns if c != SKETCH_COL]
    return state.select(
        *keys, F.hll_sketch_estimate(F.col(SKETCH_COL)).alias(alias)
    )
