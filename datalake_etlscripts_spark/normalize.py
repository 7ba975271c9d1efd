"""Batch normalization: raw source columns → engine schema.

Implements the reference's parse_parquet/import pipeline semantics
(nextplib/ntp_utils.py:71-112) as one declarative transformation:

- column rename via a mapping table (ORIGINAL → DBFIELD), reference
  read_parquet.py:72 + ntp_utils.py:101-107. The mapping is tiny —
  the rename plan is computed on the driver (a column-name rewrite is
  metadata, not data; nothing to shuffle).
- two source columns mapping to the same DBFIELD merge into an array
  (ntp_utils.py:102-105).
- unknown columns are NOT silently dropped: they're collected into an
  ``extra`` MAP<STRING,STRING> and a suggested mapping is derivable
  via functions.sanitize_field_name (ntp_utils.py:43-49,108-110).
- NaN/NULL → '' for mapped string fields (ntp_utils.py:95-99).
- stringified lists parsed with from_json, never eval
  (ntp_utils.py:79-94).
- ``updated`` normalized to an always-sorted ARRAY<STRING> of 19-char
  'yyyy-MM-dd HH:mm:ss' strings (ntp_utils.py:231-246, 257-265) —
  the scalar-vs-list dynamism of the reference is removed by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_etlscripts_spark.functions.scalar import (
    null_to_empty,
    parse_stringified_list,
    truncate_ts,
)


def build_rename_plan(mapping_rows: list[tuple[str, str]]) -> dict[str, list[str]]:
    """ORIGINAL→DBFIELD pairs → {dbfield: [original, ...]} plan.
    Multiple originals per dbfield → list-merge on apply."""
    plan: dict[str, list[str]] = {}
    for original, dbfield in mapping_rows:
        plan.setdefault(dbfield, []).append(original)
    return plan


def apply_mapping(
    df: DataFrame,
    mapping_rows: list[tuple[str, str]],
    list_fields: set[str] | None = None,
    keep_extra: bool = True,
) -> DataFrame:
    """Rename raw columns to DBFIELDs; unmapped → ``extra`` map.

    ``list_fields``: DBFIELDs whose values may arrive as stringified
    lists — parsed to ARRAY<STRING>.
    """
    list_fields = list_fields or set()
    plan = build_rename_plan(mapping_rows)
    mapped_originals = {o for os_ in plan.values() for o in os_}
    cols = []
    for dbfield, originals in plan.items():
        present = [o for o in originals if o in df.columns]
        if not present:
            continue
        if len(present) == 1:
            c = F.col(f"`{present[0]}`")
        else:
            # collision: merge the values into an array (ntp_utils.py:102-105)
            c = F.array(*[F.col(f"`{o}`").cast("string") for o in present])
        if dbfield in list_fields:
            c = parse_stringified_list(c.cast("string"))
        elif len(present) == 1:
            c = null_to_empty(c)
        cols.append(c.alias(dbfield))
    if keep_extra:
        unmapped = [c for c in df.columns if c not in mapped_originals]
        if unmapped:
            cols.append(
                F.map_from_arrays(
                    F.array(*[F.lit(c) for c in unmapped]),
                    F.array(*[null_to_empty(F.col(f"`{c}`")) for c in unmapped]),
                ).alias("extra")
            )
    return df.select(*cols)


def normalize_updated(df: DataFrame, col: str = "updated") -> DataFrame:
    """``updated`` (scalar string/timestamp OR array) → sorted distinct
    ARRAY<STRING> of 19-char canonical timestamps."""
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    arr = c if dt.startswith("array") else F.array(c.cast("string"))
    canon = F.array_sort(
        F.array_distinct(F.transform(arr, lambda x: truncate_ts(x)))
    )
    return df.withColumn(col, canon)


def rename_fields(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    """K5-style field migration (checking/clean_fields_place.py:81-97):
    the reference renames fields document-by-document with $set/$unset;
    here it is a metadata-only column rename — zero data movement."""
    for old, new in renames.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df


def normalize_to_list(df: DataFrame, field: str) -> DataFrame:
    """K5-style type repair (checking/fix_contracter_ids.py:69-88):
    scalar-or-list dynamism collapsed to ARRAY<STRING> — a full-column
    rewrite instead of per-document update_one round trips."""
    dt = dict(df.dtypes).get(field)
    if dt is None or dt.startswith("array"):
        return df
    c = F.col(field)
    return df.withColumn(
        field, F.when(c.isNull() | (c == ""), F.array()).otherwise(F.array(c))
    )
