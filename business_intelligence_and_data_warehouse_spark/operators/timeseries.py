"""Time-series spine generation and gap filling.

The reference's reporting layer assumes a dense calendar (its
`dim_time` rows exist for every day whether or not a fact row landed
there — Kettle `T1 ETL Time.ktr` generates the full range).  This
module generalizes that to any keyed series: build the dense
key x period spine, mark the holes, and forward-fill carried measures.

Scale design (100 TB):
* the spine is `distinct keys  x  sequence(min_period, max_period)` —
  the bounds aggregate is ONE row (broadcast by construction via a
  1-row cross join, the engine's scalar-broadcast pattern), and the
  per-key `explode(sequence(...))` is map-side;
* there is NO spine<-actuals equi-join at all.  Joining on
  (key, period) costs a co-partitioned shuffle of both sides on BOTH
  keys (`requireAllClusterKeysForCoPartition`), and the forward-fill
  window then reshuffles on the key alone.  Instead the spine and the
  actuals are UNIONed with a side tag and merged by ONE running
  window over (key) ordered by (period, side) — the same merge-based
  decomposition as operators/asof.py.  Actual rows sort before their
  period's spine row, so the running `last(..., ignorenulls)` at a
  spine row has already absorbed that period's observation; a spine
  row whose last-observed period equals its own period is an observed
  slot, anything else is a gap.  Total: one real shuffle (the window)
  plus a tiny distinct-keys aggregate;
* `last(..., ignorenulls=True)` over rowsBetween(unboundedPreceding,
  0) is a running carry — single pass, no self-join, no quadratic
  frame re-scan (Spark evaluates running frames incrementally);
* ``actuals`` feeds three consumers (bounds, key list, union) — it is
  pinned so the upstream aggregation runs once (the engine-wide
  multi-consumer rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .caching import pin


def period_spine_fill(
    actuals: DataFrame,
    key_col: str,
    period_col: str,
    measure_col: str,
    step_days: int = 7,
) -> DataFrame:
    """Dense (key, period) grid with forward-filled measure.

    ``actuals`` must have ONE row per observed (key, period); the
    output has one row per (key, period) in the dense grid spanning
    the GLOBAL [min, max] period range, with:

    * ``<measure>``        — the observed value (NULL on gap rows),
    * ``<measure>_filled`` — last observed value at or before the
                             period (NULL until the key's first
                             observation),
    * ``is_gap``           — true where no actual row existed.

    Periods must be aligned dates (e.g. ``date_trunc`` output) with a
    fixed ``step_days`` stride so `sequence()` regenerates exactly the
    truncated grid (every actual period is then a spine slot).
    """
    actuals = pin(actuals)
    bounds = actuals.agg(
        F.min(period_col).alias("_lo"), F.max(period_col).alias("_hi")
    )
    keys = actuals.select(key_col).distinct()
    spine = (
        # 1-row bounds: Catalyst plans this cross join as a broadcast
        # of the scalar row, not a shuffle.
        keys.crossJoin(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("_lo"),
                    F.col("_hi"),
                    F.expr(f"interval {int(step_days)} days"),
                )
            ).alias(period_col),
            F.lit(None).cast(actuals.schema[measure_col].dataType).alias(
                measure_col
            ),
            F.lit(1).alias("_side"),
        )
    )
    merged = actuals.select(
        key_col, period_col, measure_col, F.lit(0).alias("_side")
    ).unionByName(spine)
    carry = (
        W.partitionBy(key_col)
        .orderBy(period_col, "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = F.last(measure_col, ignorenulls=True).over(carry)
    last_obs = F.last(
        F.when(F.col(measure_col).isNotNull(), F.col(period_col)),
        ignorenulls=True,
    ).over(carry)
    return (
        # both running-last expressions share one Window node (same
        # partitioning + ordering, one projection)
        merged.select(
            key_col,
            period_col,
            "_side",
            filled.alias("_filled"),
            last_obs.alias("_lastp"),
        )
        .filter(F.col("_side") == 1)
        .withColumn(
            "_obs",
            F.coalesce(F.col("_lastp") == F.col(period_col), F.lit(False)),
        )
        .select(
            key_col,
            period_col,
            F.when(F.col("_obs"), F.col("_filled")).alias(measure_col),
            F.col("_filled").alias(f"{measure_col}_filled"),
            (~F.col("_obs")).alias("is_gap"),
        )
    )
