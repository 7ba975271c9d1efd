"""Group-by count summaries (reference calc_summary.py:53-81 semantics).

The reference loops six configured fields, each a separate Mongo
aggregation ($group count) plus an estimated total, and upserts one
summary document. Here a single pass computes all field summaries via
grouping sets so the 100 TB table is scanned once, not once per field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def field_counts(df: DataFrame, field: str) -> DataFrame:
    """A2: value → count for one field, plus Catalyst-pruned scan."""
    return df.groupBy(field).agg(F.count(F.lit(1)).alias("cnt"))


def summary_counts(df: DataFrame, fields: list[str]) -> DataFrame:
    """A2 generalized: one scan → (field, value, cnt) for every
    configured field, using GROUPING SETS instead of N scans.

    Output: field STRING, value STRING, cnt BIGINT — plus a
    ('__total__', NULL, count(*)) row standing in for the reference's
    estimated_document_count() (calc_summary.py:76-78).
    """
    # grouping sets over the N single-field sets + the grand total
    gs = df.groupingSets(
        [[F.col(f)] for f in fields] + [[]],
        *[F.col(f) for f in fields],
    ).agg(F.count(F.lit(1)).alias("cnt"), *[F.grouping(f).alias(f"_g_{f}") for f in fields])

    # decode which grouping set each row belongs to
    field_col = F.lit("__total__")
    value_col = F.lit(None).cast("string")
    for f in fields:
        is_this = (F.col(f"_g_{f}") == 0)
        for g in fields:
            if g != f:
                is_this = is_this & (F.col(f"_g_{g}") == 1)
        field_col = F.when(is_this, F.lit(f)).otherwise(field_col)
        value_col = F.when(is_this, F.col(f).cast("string")).otherwise(value_col)
    return gs.select(
        field_col.alias("field"), value_col.alias("value"), F.col("cnt")
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance for the summary (A2 at 100 TB)
# ---------------------------------------------------------------------------


def cdc_images(diff: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a ``snapshot_diff`` result (io/txstore.snapshot_diff:
    change_type + ``_old``/``_new`` row structs) into its before/after
    row images: ``removed`` = rows leaving the table (delete + update
    pre-image), ``added`` = rows entering (insert + update post-image).
    """
    removed = diff.filter(F.col("change_type").isin("update", "delete")).select("_old.*")
    added = diff.filter(F.col("change_type").isin("insert", "update")).select("_new.*")
    return removed, added


def incremental_summary(
    old_summary: DataFrame,
    removed: DataFrame,
    added: DataFrame,
    fields: list[str],
) -> DataFrame:
    """Maintain a ``summary_counts`` view from a CDC delta WITHOUT
    rescanning the base table (the reference recomputes calc_summary.py
    over the full collection every run; at 100 TB the recompute scans
    everything to refresh counts a batch barely moved).

    Count sketches are self-maintainable: the new summary is

        old  ∪  (+1 per added row)  ∪  (−1 per removed row)
        → groupBy (field, value) → sum → drop zeros

    so the only inputs are the (small) summary table and the
    (batch-sized) delta images — one shuffle over summary-sized data,
    never the base. Delta counts reuse the same grouping-sets plan as
    the full recompute, so ``__total__`` maintains itself too.
    """
    plus = summary_counts(added, fields)
    minus = summary_counts(removed, fields).withColumn("cnt", -F.col("cnt"))
    return (
        old_summary.unionByName(plus)
        .unionByName(minus)
        .groupBy("field", "value")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )


def incremental_join_view(
    old_view: DataFrame,
    delta: DataFrame,
    dim: DataFrame,
    join_key: str,
    view_keys: list[str],
    measure: str,
    sign_col: str = "_sign",
) -> DataFrame:
    """Incremental maintenance of a JOIN-aggregate view (the counting
    algorithm of classical IVM, e.g. DBToaster/Materialize): the view

        V = fact ⋈ dim GROUP BY view_keys → (n, total)

    is refreshed from a SIGNED fact delta (+1 inserts, −1 deletes)
    alone:

        ΔV = Δfact ⋈ dim GROUP BY view_keys → (Σs, Σs·measure)
        V' = merge(V, ΔV) dropping groups whose count reaches 0

    The dim side broadcasts (it must be the small side for this to be
    delta-sized work); the base fact table is NEVER rescanned — the
    whole refresh shuffles view-sized + batch-sized data. Deletes are
    first-class: a group vanishes exactly when its maintained count
    hits zero, which is why the count column must ride along even when
    only the sum is wanted. Measures stay DECIMAL end to end so
    increments commute exactly."""
    dv = (
        delta.join(F.broadcast(dim), join_key)
        .groupBy(*view_keys)
        .agg(
            F.sum(sign_col).cast("long").alias("n"),
            F.sum(F.col(sign_col) * F.col(measure))
            .cast("decimal(26,2)")
            .alias("_tot"),
        )
    )
    old = old_view.select(
        *view_keys, F.col("n").cast("long"), F.col("_tot").cast("decimal(26,2)")
    )
    return (
        old.unionByName(dv)
        .groupBy(*view_keys)
        .agg(F.sum("n").cast("long").alias("n"), F.sum("_tot").alias("_tot"))
        .filter(F.col("n") > 0)
    )
