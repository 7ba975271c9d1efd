"""Event-stream operators: sessionization and as-of joins.

Both are compositions of windows over one shuffle on the entity key —
the shapes that survive a 100 TB event table (no range-join explosion,
no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_minutes``.
    Appends ``session_no`` (1-based per user). One shuffle on the user
    key; both windows share it."""
    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    new_session = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn("_new_session", new_session).withColumn(
        "session_no",
        F.sum("_new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    ).drop("_new_session")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row matched to the right row with the
    greatest ``ts`` ≤ left.ts (backward) per key — merge_asof
    semantics without a range join.

    Implementation: tag + union both sides, sort within the key
    window, carry the last-seen right row forward with last(...,
    ignorenulls) — ONE shuffle on the key, linear in rows. The
    classic bucketed-range-join alternative shuffles the same data
    but pays candidate multiplication; this shape never does.

    Right columns come back suffixed; right rows themselves are not
    emitted. ``direction='forward'`` matches the next right row ≥ ts.
    """
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    tagged_l = left.select(
        F.col(on),
        F.col(ts_col).alias("_ats"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(_struct_type_of(right, rcols)).alias("_r"),
    )
    tagged_r = right.select(
        F.col(on),
        F.col(ts_col).alias("_ats"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(_struct_type_of(left, lcols)).alias("_l"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
    )
    unioned = tagged_l.select(on, "_ats", "_is_left", "_l", "_r").unionByName(tagged_r)

    if direction == "backward":
        # right rows sort BEFORE a left row at the same ts (ties match)
        w = W.partitionBy(on).orderBy("_ats", "_is_left").rowsBetween(
            W.unboundedPreceding, 0
        )
        carried = F.last("_r", ignorenulls=True).over(w)
    else:
        w = W.partitionBy(on).orderBy(F.desc("_ats"), "_is_left").rowsBetween(
            W.unboundedPreceding, 0
        )
        carried = F.last("_r", ignorenulls=True).over(w)

    out = (
        unioned.withColumn("_matched", carried)
        .filter(F.col("_is_left") == 1)
        .select(
            F.col(on),
            *[F.col(f"_l.{c}").alias(c) for c in lcols if c != on],
            *[F.col(f"_matched.{c}").alias(f"{c}{suffix}") for c in rcols],
        )
    )
    return out


def _struct_type_of(df: DataFrame, cols: list[str]):
    from pyspark.sql.types import StructType

    return StructType([df.schema[c] for c in cols])
