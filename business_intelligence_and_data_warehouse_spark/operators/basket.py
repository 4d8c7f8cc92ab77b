"""Market-basket co-occurrence: support / confidence / lift over
item pairs within a transaction key.

The classic association-mining first stage, DataFrame-first:

1. distinct (basket, item) — an item repeated inside one basket
   counts once (set semantics, deduped map-side per basket before any
   shuffle widens);
2. pair generation is a SELF-JOIN ON THE BASKET KEY with ``a < b`` —
   fan-out per basket is C(k, 2) where k is the basket size.  Basket
   sizes are bounded (TPC-H lineitem: <= 7 lines; retail baskets:
   dozens), so the join output is LINEAR in the number of baskets
   with a small constant — this is NOT the unbounded shingle-style
   self-join, and needs no frequency cap;
3. item-frequency table is aggregated once and joined back to the
   pairs twice (item_a, item_b).  No broadcast hint is forced: AQE
   broadcasts the frequency table while it fits (testdata scale) and
   degrades to a shuffle join on item id at a 100-TB catalog — both
   sides are aggregates, already small relative to the fact.

Lift = (n_ab * N) / (n_a * n_b): pure integer products (< 2^53)
divided once — bit-identical across engines, no decimal snap needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .caching import pin


def basket_pair_lift(
    facts: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """(item_a, item_b, n_baskets_a, n_baskets_b, n_baskets_both,
    support, confidence_a_to_b, lift) for every unordered item pair
    co-occurring in >= min_pair_count baskets."""
    # five consumers (pair sides a+b, freq twice, totals): pin so the
    # distinct basket-item table materializes once
    items = pin(
        facts.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        ).distinct()
    )
    # 1-row basket total: broadcast scalar, no driver-side action
    totals = items.agg(F.countDistinct("basket").alias("n_baskets"))
    freq = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= int(min_pair_count))
    )
    fa = freq.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    fb = freq.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    # no broadcast hint on the frequency joins: a forced hint would
    # override autoBroadcastJoinThreshold and OOM on a huge catalog
    # instead of falling back to the documented item-id shuffle join
    joined = (
        pairs.join(fa, "item_a")
        .join(fb, "item_b")
        .crossJoin(F.broadcast(totals))
    )
    return joined.select(
        "item_a",
        "item_b",
        F.col("n_a").alias("n_baskets_a"),
        F.col("n_b").alias("n_baskets_b"),
        F.col("n_both").alias("n_baskets_both"),
        (F.col("n_both") / F.col("n_baskets").cast("double")).alias("support"),
        (F.col("n_both") / F.col("n_a").cast("double")).alias(
            "confidence_a_to_b"
        ),
        (
            (F.col("n_both") * F.col("n_baskets"))
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("lift"),
    )
