"""Incremental maintenance of algebraic aggregates.

The 100 TB ETL reality: you never recompute a warehouse aggregate from
scratch — you combine yesterday's partials with today's delta. Any
ALGEBRAIC aggregate (sum, count, min, max, and everything derivable
from power sums: avg, stddev, corr) maintains exactly under
partial-combine; this module states the pattern declaratively.

Exactness: partials keep DECIMAL sums (never the final double) — the
decimal combine is associative, so ``merge(partial(base), partial(delta))``
is bit-identical to ``partial(base ∪ delta)``; the double cast happens
once, at presentation. Combining already-cast doubles would drift.

Scale notes: the merge shuffles |groups| rows per side (the partials),
not the fact rows — the whole point. The delta side partial-aggregates
map-side before its one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parity import DEC


def partial_aggs(
    df: DataFrame, keys: list[str], money_col: str
) -> DataFrame:
    """Per-key DECIMAL partial state: (sum_dec, n) — the mergeable
    form (NOT presentation doubles)."""
    return df.groupBy(*keys).agg(
        F.sum(F.col(money_col).cast(DEC)).alias("sum_dec"),
        F.count(F.lit(1)).alias("n"),
    )


def merge_partial_aggs(parts: list[DataFrame]) -> DataFrame:
    """Combine partial states (same schema) into one; exact because
    decimal addition and count addition are associative."""
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    keys = [c for c in merged.columns if c not in ("sum_dec", "n")]
    return merged.groupBy(*keys).agg(
        F.sum("sum_dec").alias("sum_dec"), F.sum("n").alias("n")
    )


def present(aggs: DataFrame) -> DataFrame:
    """Presentation projection: decimal state -> (revenue double, n)."""
    keys = [c for c in aggs.columns if c not in ("sum_dec", "n")]
    return aggs.select(
        *keys,
        F.col("sum_dec").cast("double").alias("revenue"),
        F.col("n").alias("n_orders"),
    )


def join_delta(
    base_left: DataFrame,
    delta_left: DataFrame,
    base_right: DataFrame,
    delta_right: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Incremental view maintenance of an inner equi-join under
    inserts: the NEW result rows of ``(L ∪ dL) ⋈ (R ∪ dR)`` are
    exactly ``dL⋈R ∪ L⋈dR ∪ dL⋈dR`` — three joins whose probe or
    build side is DELTA-sized, so maintaining a 100 TB join view
    costs delta-proportional work instead of a full recompute (the
    classical counting/DBToaster delta rule, insert-only case; the
    base sides still scan but never join base-against-base).

    Requires the deltas to be disjoint from their bases (insert-only
    IVM); a ``src`` column labels which term produced each row, so
    the disjoint union is auditable.
    """
    keys = [on] if isinstance(on, str) else list(on)

    def tag(df: DataFrame, label: str) -> DataFrame:
        return df.withColumn("src", F.lit(label))

    return (
        tag(delta_left.join(base_right, keys), "dL_R")
        .unionByName(tag(base_left.join(delta_right, keys), "L_dR"))
        .unionByName(tag(delta_left.join(delta_right, keys), "dL_dR"))
    )
