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
    the disjoint union is auditable (inputs must not already carry a
    ``src`` column — guarded below).
    """
    keys = [on] if isinstance(on, str) else list(on)
    for df, who in (
        (base_left, "join_delta base_left"),
        (delta_left, "join_delta delta_left"),
        (base_right, "join_delta base_right"),
        (delta_right, "join_delta delta_right"),
    ):
        _require_free_columns(df, ("src",), who)

    def tag(df: DataFrame, label: str) -> DataFrame:
        return df.withColumn("src", F.lit(label))

    return (
        tag(delta_left.join(base_right, keys), "dL_R")
        .unionByName(tag(base_left.join(delta_right, keys), "L_dR"))
        .unionByName(tag(delta_left.join(delta_right, keys), "dL_dR"))
    )


def _require_free_columns(df: DataFrame, names: tuple[str, ...], who: str) -> None:
    """Reserved-name guard: tag/multiplicity columns this module adds
    must not silently overwrite caller data."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"{who}: input already has reserved column(s) {clash}; "
            "rename them before calling"
        )


def join_delta_counting(
    base_left: DataFrame,
    delta_left: DataFrame,
    base_right: DataFrame,
    delta_right: DataFrame,
    on: list[str] | str,
    m_col: str = "_m",
) -> DataFrame:
    """Counting (multiset) IVM of an inner equi-join: every frame
    carries a signed multiplicity column ``m_col`` (+1 insert, -1
    delete; an update is a -1 old row plus a +1 new row), and the
    returned frame is the SIGNED DELTA of the join view —
    ``dL⋈R ∪ L⋈dR ∪ dL⋈dR`` with multiplicities multiplied (the
    classical counting algebra; DBToaster's first-order delta).

    Unlike the insert-only :func:`join_delta`, this handles deletes
    and updates: a view row disappears when its summed multiplicity
    reaches zero in :func:`apply_multiset_delta`.  Cross terms
    compose correctly — deleting an L row AND its matching R row
    yields -1 -1 +1 = -1 against the view's +1, net zero.

    Scale shape unchanged from the insert-only rule: every term joins
    a delta-sized side; base⋈base never runs.
    """
    keys = [on] if isinstance(on, str) else list(on)
    for df, who in (
        (base_left, "join_delta_counting base_left"),
        (delta_left, "join_delta_counting delta_left"),
        (base_right, "join_delta_counting base_right"),
        (delta_right, "join_delta_counting delta_right"),
    ):
        if m_col not in df.columns:
            raise ValueError(f"{who}: missing multiplicity column {m_col!r}")

    return (
        join_multiplied(delta_left, base_right, keys, m_col)
        .unionByName(join_multiplied(base_left, delta_right, keys, m_col))
        .unionByName(join_multiplied(delta_left, delta_right, keys, m_col))
    )


def join_multiplied(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    m_col: str = "_m",
) -> DataFrame:
    """Inner equi-join of two signed multisets: result multiplicity is
    the PRODUCT of the sides' — the single algebra rule every term of
    :func:`join_delta_counting` and the base-view materialization
    share (one definition, so the delta terms and the view they fold
    into cannot drift)."""
    keys = [on] if isinstance(on, str) else list(on)
    l2 = left.withColumnRenamed(m_col, "_ml")
    r2 = right.withColumnRenamed(m_col, "_mr")
    return (
        l2.join(r2, keys)
        .withColumn(m_col, F.col("_ml") * F.col("_mr"))
        .drop("_ml", "_mr")
    )


def apply_multiset_delta(
    view: DataFrame, delta: DataFrame, m_col: str = "_m"
) -> DataFrame:
    """Fold a signed delta into a multiset view: group on the payload,
    sum multiplicities, drop rows that cancel to zero.  The shuffle
    carries |view groups| + |delta| rows — delta-proportional when the
    view is already aggregated storage."""
    cols = [c for c in view.columns if c != m_col]
    return (
        view.unionByName(delta.select(*view.columns))
        .groupBy(*cols)
        .agg(F.sum(m_col).alias(m_col))
        .filter(F.col(m_col) != 0)
    )
