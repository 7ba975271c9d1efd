"""Market-basket analysis: frequent item pairs + association metrics.

The canonical co-occurrence mining pass over transactional data
(orders → parts here; queries → clicked documents in a search log).
The reference has no association mining (beyond-reference analytics
surface, same category as the graph/retrieval operators).

Design for 100 TB:
- Pair generation is the quadratic hazard: a whale basket with 10^4
  distinct items would alone emit 5·10^7 pairs. Baskets are CAPPED at
  ``max_items`` (deterministically — the first ``max_items`` items in
  item order), the standard FP-growth-era mitigation; the cap is part
  of the operator contract so an external engine can replay it.
- With the cap, pair volume is ≤ C(max_items, 2) per basket — linear
  in baskets. One shuffle keyed on the pair, one on the item for
  supports, all exact integer counts.
- Confidence and lift are single double divisions of exact int64
  products (no float aggregation), bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _capped_baskets(
    baskets: DataFrame, basket_col: str, item_col: str, max_items: int
) -> DataFrame:
    """(basket, capped sorted item array) — the shared first pass of
    the pair and triple miners; the deterministic cap is part of both
    operators' replayable contract, defined ONCE here. Lazy
    checkpoint: the table feeds several consumers per miner."""
    return (
        baskets.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .dropDuplicates()
        .groupBy("_b")
        .agg(F.slice(F.array_sort(F.collect_set("_i")), 1, max_items).alias("_items"))
        .localCheckpoint(eager=False)
    )


def _pair_supports(capped: DataFrame, min_support: int) -> DataFrame:
    """(x, y, _n) frequent pairs from the capped (basket, item-array)
    grain — shared by frequent_pairs (which adds metrics) and
    frequent_triples (which uses the keys for A-priori candidates).
    r07 optimization (guide §2.4): pairs are generated MAP-SIDE from
    each basket's sorted-distinct array (functions.scalar.
    ordered_pairs) instead of the former exploded self-join on the
    basket key — same pair multiset, two fewer exchanges and no
    sort-merge join; fan-out bounded by the caller's cap."""
    from datalake_etlscripts_spark.functions.scalar import ordered_pairs

    return (
        capped.select(F.explode(ordered_pairs(F.col("_items"))).alias("_p"))
        .groupBy(F.col("_p.x").alias("x"), F.col("_p.y").alias("y"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_support)
    )


def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_items: int = 32,
    broadcast_supports: bool = True,
) -> DataFrame:
    """Frequent item PAIRS with confidence and lift.

    ``baskets`` is (basket, item) shaped (duplicates tolerated).
    Returns one row per unordered pair {a, b} (a < b) co-occurring in
    ≥ ``min_support`` baskets:
    (item_a, item_b, pair_support, support_a, support_b,
     conf_a_to_b, conf_b_to_a, lift).

    ``broadcast_supports`` fits catalog-sized item dimensions; set it
    False for web-scale item vocabularies (10⁸+ items) and the support
    joins fall back to shuffle hash joins on the item key.
    """
    capped = _capped_baskets(baskets, basket_col, item_col, max_items)
    n_baskets = capped.agg(F.count(F.lit(1)).alias("_n"))
    items = capped.select("_b", F.explode("_items").alias("_i"))
    sup = items.groupBy("_i").agg(F.count(F.lit(1)).alias("_sup"))
    pairs = _pair_supports(capped, min_support).select(
        F.col("x").alias("item_a"),
        F.col("y").alias("item_b"),
        F.col("_n").alias("pair_support"),
    )
    hint = F.broadcast if broadcast_supports else (lambda d: d)
    return (
        pairs.join(
            hint(sup.select(F.col("_i").alias("item_a"), F.col("_sup").alias("support_a"))),
            "item_a",
        )
        .join(
            hint(sup.select(F.col("_i").alias("item_b"), F.col("_sup").alias("support_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_support",
            "support_a",
            "support_b",
            (F.col("pair_support").cast("double") / F.col("support_a").cast("double")).alias(
                "conf_a_to_b"
            ),
            (F.col("pair_support").cast("double") / F.col("support_b").cast("double")).alias(
                "conf_b_to_a"
            ),
            (
                (F.col("pair_support") * F.col("_n")).cast("double")
                / (F.col("support_a") * F.col("support_b")).cast("double")
            ).alias("lift"),
        )
    )


def frequent_triples(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_items: int = 32,
) -> DataFrame:
    """Frequent item TRIPLES by one A-priori level on top of the pair
    pass: candidate {a,b,c} (a<b<c) is generated ONLY when all three
    sub-pairs are frequent (downward closure), then verified with one
    counting pass — at bench scale 3445 frequent pairs prune to 61
    candidates, which is why A-priori beats enumerating triples.

    Shape: pair supports as in frequent_pairs (capped baskets bound
    the blow-up), a pair self-join on the leading item + a semi join
    for the closing pair (candidate set is tiny), then candidate
    verification via equi-join on the leading item + array-membership
    filters on the basket's item array — never a cross product.
    Returns (item_a, item_b, item_c, triple_support).
    """
    capped = _capped_baskets(baskets, basket_col, item_col, max_items)
    items = capped.select("_b", F.explode("_items").alias("_i"))
    pairs = _pair_supports(capped, min_support).select("x", "y")
    p1 = pairs.select(F.col("x").alias("item_a"), F.col("y").alias("item_b"))
    p2 = pairs.select(F.col("x").alias("item_a"), F.col("y").alias("item_c"))
    cand = (
        p1.join(p2, "item_a")
        .filter(F.col("item_b") < F.col("item_c"))
        .join(
            pairs.select(F.col("x").alias("item_b"), F.col("y").alias("item_c")),
            ["item_b", "item_c"],
            "left_semi",
        )
    )
    hit = (
        items.select("_b", F.col("_i").alias("item_a"))
        .join(F.broadcast(cand), "item_a")
        .join(capped, "_b")
        .filter(
            F.array_contains("_items", F.col("item_b"))
            & F.array_contains("_items", F.col("item_c"))
        )
    )
    return (
        hit.groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).alias("triple_support"))
        .filter(F.col("triple_support") >= min_support)
    )


def frequent_sequences3(
    events: DataFrame,
    minsup: int = 2,
    topk: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Frequent ORDERED 3-sequences (GSP/PrefixSpan semantics, gaps
    allowed) — the sequential twin of the frequent_pairs/triples
    itemset miners: a user supports (a, b, c) when some a precedes
    some b precedes some c in their stream. Existence is decided by
    the GREEDY witness (earliest a; earliest b after it; any c after
    that) — provably equivalent and it keeps every join at the
    (user × type) grain instead of the event-pair grain:

        stage 1  min pos per (user, type)           one shuffle
        stage 2  min pos(b) after pa: user-keyed join vs the
                 (user × |types|²)-bounded prefix table
        stage 3  EXISTS c after pb: semi-shaped join, distinct

    |types| is dictionary-sized by contract, so intermediates are
    user-grain × a small constant; per-user hot streams cap exactly as
    event_pattern_matches documents. Returns the top-k
    (a, b, c, support) with support ≥ minsup, deterministic order."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_et"),
        F.row_number().over(w).alias("_pos"),
    ).localCheckpoint(eager=False)
    first_a = ev.groupBy("_u", F.col("_et").alias("a")).agg(
        F.min("_pos").alias("_pa")
    )
    b_ev = ev.select(F.col("_u").alias("_ub"), F.col("_et").alias("b"), "_pos")
    j2 = (
        first_a.join(b_ev, first_a["_u"] == b_ev["_ub"])
        .filter(F.col("_pos") > F.col("_pa"))
        .groupBy("_u", "a", "b")
        .agg(F.min("_pos").alias("_pb"))
    )
    c_ev = ev.select(F.col("_u").alias("_uc"), F.col("_et").alias("c"), "_pos")
    j3 = (
        j2.join(c_ev, j2["_u"] == c_ev["_uc"])
        .filter(F.col("_pos") > F.col("_pb"))
        .select("_u", "a", "b", "c")
        .distinct()
    )
    sup = j3.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    return (
        sup.filter(F.col("support") >= minsup)
        .orderBy(F.desc("support"), "a", "b", "c")
        .limit(topk)
    )
