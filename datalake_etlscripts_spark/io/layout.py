"""File-layout clustering (Z-order) for data skipping.

The reference stores documents unordered and relies on Mongo indexes;
a lakehouse at 100 TB relies on FILE-LEVEL min/max statistics instead:
a scan can skip a parquet file whose stats exclude the predicate. That
only works if writes CLUSTER correlated values into the same files.
Sorting handles one column; multi-column point/box queries need a
space-filling curve — Z-order (bit-interleave of quantized columns),
the same recipe as Delta's OPTIMIZE ... ZORDER BY.

Everything is built-in Column arithmetic (unrolled literal shifts →
whole-stage codegen); the only extra pass is one min/max aggregate to
quantize, broadcast onto the plan like versioning's id counter.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def interleave_bits(cols: list, bits: int = 12):
    """Z-value of already-quantized non-negative ints: bit i of col c
    lands at position i*len(cols)+c. Unrolled to 2·bits·n literal
    shift/mask terms — static plan, no higher-order functions."""
    n = len(cols)
    terms = [
        F.shiftleft(F.shiftright(F.col(c) if isinstance(c, str) else c, i).bitwiseAND(F.lit(1)), i * n + ci)
        for i in range(bits)
        for ci, c in enumerate(cols)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("bigint")


def _quantize(df: DataFrame, cols: list[str], bits: int):
    """(df ⨯ broadcast min/max ranges, [quantized int columns]):
    min/max range quantization to [0, 2^bits) shared by the Z-order
    and Hilbert writers — one definition of the rounding/degenerate-
    range rules."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    with_r = df.crossJoin(F.broadcast(df.agg(*aggs)))
    hi = (1 << bits) - 1
    quantized = [
        F.least(
            F.lit(hi),
            F.floor(
                (F.col(c) - F.col(f"_min_{c}"))
                * hi
                / F.greatest(F.col(f"_max_{c}") - F.col(f"_min_{c}"), F.lit(1))
            ),
        ).cast("bigint")
        for c in cols
    ]
    return with_r, quantized


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12):
    """Quantize each column to [0, 2^bits) by min/max range (one
    broadcast aggregate — no per-row driver lookup) and interleave.
    Returns (df_with_ranges, key_column); quantization rounding only
    affects layout quality, never correctness."""
    with_r, quantized = _quantize(df, cols, bits)
    return with_r, interleave_bits(quantized, bits)


def cluster_write(
    df: DataFrame, path: str, cols: list[str], n_files: int, bits: int = 12
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the Z-value of ``cols`` — each file covers a compact
    hyper-rectangle-ish region, so min/max stats prune multi-column
    predicates. Range partitioning samples the key distribution, so
    skewed spaces still split evenly."""
    with_r, key = zorder_key(df, cols, bits)
    (
        with_r.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .select(*df.columns)
        .write.mode("overwrite")
        .parquet(path)
    )


def candidate_files(
    spark: SparkSession, path: str, box: dict[str, tuple]
) -> tuple[int, int]:
    """Data-skipping measure: (files whose per-file min/max ranges
    intersect ``box``, total files). A real reader gets this pruning
    from parquet footer stats; computing it from the data itself keeps
    the measure format-independent for tests."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    aggs = []
    for c in box:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    stats = df.groupBy("_f").agg(*aggs)
    cond = reduce(
        lambda a, b: a & b,
        [
            (F.col(f"_max_{c}") >= F.lit(lo)) & (F.col(f"_min_{c}") <= F.lit(hi))
            for c, (lo, hi) in box.items()
        ],
    )
    return stats.filter(cond).count(), stats.count()


def hilbert_index(x, y, bits: int = 8):
    """2D Hilbert-curve index of two already-quantized non-negative
    ints in [0, 2^bits) — the locality-preserving alternative to
    Z-order (adjacent curve positions are always adjacent cells, so
    file ranges cover more compact regions; Z-order jumps at quadrant
    boundaries).

    The classic per-bit rotate/flip state machine runs as ONE
    ``aggregate`` fold over the literal array of bit weights
    [2^(bits−1) … 1], carrying (x, y, d) as a struct — linear
    expression size (an unrolled when-chain would re-nest x and y ~4×
    per round and explode the expression tree). Pure integer
    arithmetic: a DuckDB twin replays it with list_reduce.
    """
    xs = (x if not isinstance(x, str) else F.col(x)).cast("bigint")
    ys = (y if not isinstance(y, str) else F.col(y)).cast("bigint")
    levels = F.array(*[F.lit(1 << i).cast("bigint") for i in range(bits - 1, -1, -1)])
    init = F.struct(
        xs.alias("x"), ys.alias("y"), F.lit(0).cast("bigint").alias("d")
    )

    def step(acc, s):
        rx = F.when(acc["x"].bitwiseAND(s) != 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        ry = F.when(acc["y"].bitwiseAND(s) != 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        d = acc["d"] + s * s * (F.lit(3) * rx).bitwiseXOR(ry)
        flip = (ry == 0) & (rx == 1)
        fx = F.when(flip, s - 1 - acc["x"]).otherwise(acc["x"])
        fy = F.when(flip, s - 1 - acc["y"]).otherwise(acc["y"])
        nx = F.when(ry == 0, fy).otherwise(acc["x"])
        ny = F.when(ry == 0, fx).otherwise(acc["y"])
        return F.struct(nx.alias("x"), ny.alias("y"), d.alias("d"))

    return F.aggregate(levels, init, step, lambda acc: acc["d"])


def hilbert_cluster_write(
    df: DataFrame, path: str, cols: list[str], n_files: int, bits: int = 8
) -> None:
    """cluster_write's Hilbert twin for exactly two columns: quantize
    by min/max range (same broadcast aggregate as zorder_key) and
    range-partition + sort by the Hilbert index."""
    if len(cols) != 2:
        raise ValueError("hilbert_cluster_write clusters exactly two columns")
    with_r, (qx, qy) = _quantize(df, cols, bits)
    (
        with_r.withColumn("_hkey", hilbert_index(qx, qy, bits))
        .repartitionByRange(n_files, "_hkey")
        .sortWithinPartitions("_hkey")
        .select(*df.columns)
        .write.mode("overwrite")
        .parquet(path)
    )
