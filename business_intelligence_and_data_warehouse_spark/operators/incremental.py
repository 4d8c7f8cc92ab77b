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
