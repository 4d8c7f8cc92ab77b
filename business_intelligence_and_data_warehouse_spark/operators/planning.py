"""Sketch-driven join planning: broadcast / shuffle / salt advice from
bounded-state statistics.

Reference parity: none — the reference executes whatever its engine
picks.  This is the LLM-pipeline extension's AQE-adjacent layer: at
100 TB the question "can this side broadcast?", "is this key skewed
enough to salt?" must be answered WITHOUT scanning either table again,
and the count-min / HLL sketches the engine already maintains carry
exactly the needed statistics in O(depth x width) state:

* ``cms_stream_total`` — any depth row of a CMS sums to the exact
  number of key occurrences (every occurrence increments exactly one
  cell per row), so the build-side row count is free.
* ``cms_max_key_upper`` — the hottest cell of a depth row counts AT
  LEAST every occurrence of the hottest key; the min over rows is the
  standard CMS point-estimate bound applied to the (unknown) max key:
  an UPPER bound on the true max frequency, never under.  Skew
  detection from an upper bound errs toward salting — the safe side
  (an unnecessary salt costs a second tiny aggregate; a missed hot key
  costs a straggler task).
* ``cms_join_size_estimate`` (operators/sketches.py) — the expected
  output size, for sizing the shuffle downstream.

``choose_join_strategy`` is a DRIVER-SIDE decision over a handful of
integers (like Catalyst's own statistics-based strategy choice, or
AQE's runtime demotion) — it does not touch data.  The sketch-stat
helpers aggregate a <= depth x width grid to ONE row; reading that row
is a bounded metadata lookup, not a data collect.

Decision rules (mirroring Spark's own planner, made explicit so they
are testable):

1. If either side's estimated bytes fit the broadcast threshold,
   broadcast the smaller side — a broadcast hash join shuffles
   NOTHING, and probe-side skew is irrelevant (every task owns its
   own hash map).
2. Else if the hotter side's max-key frequency exceeds
   ``skew_factor`` x the mean frequency (mean = occurrences /
   distinct keys, the HLL estimate), advise a salted shuffle join
   with enough buckets to split the hottest key into
   ``target_rows_per_task`` chunks (capped — beyond the cap the merge
   overhead wins; AQE's skew split handles the residual).
3. Else a plain shuffle hash/sort-merge join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Spark's own default for spark.sql.autoBroadcastJoinThreshold
DEFAULT_BROADCAST_THRESHOLD = 10 * 1024 * 1024


def cms_stream_total(cms: DataFrame) -> DataFrame:
    """One row ``(total,)``: the EXACT number of key occurrences the
    sketch summarizes — every occurrence increments exactly one cell
    per depth row, so any row's cell sum is the stream length (row 0
    used; all rows agree by construction)."""
    return cms.filter(F.col("row") == 0).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("total")
    )


def cms_max_key_upper(cms: DataFrame) -> DataFrame:
    """One row ``(max_key_freq_upper,)``: an upper bound on the
    frequency of the HOTTEST key — per depth row the hottest cell
    counts at least every occurrence of the hottest key, and the min
    over rows tightens collisions away exactly like a CMS point
    estimate.  Never under the true max frequency."""
    per_row = cms.groupBy("row").agg(F.max("cnt").alias("mx"))
    return per_row.agg(
        F.coalesce(F.min("mx"), F.lit(0))
        .cast("long")
        .alias("max_key_freq_upper")
    )


@dataclass(frozen=True)
class JoinSideStats:
    """Bounded-state statistics for one join side, all derivable
    without rescanning the table: ``rows`` and ``max_key_freq`` from
    the side's CMS (:func:`cms_stream_total`,
    :func:`cms_max_key_upper`), ``distinct_keys`` from its HLL
    (operators/sketches.hll_cardinality), ``avg_row_bytes`` from
    storage metadata (file size / row count)."""

    rows: int
    avg_row_bytes: int
    distinct_keys: int
    max_key_freq: int

    @property
    def bytes_estimate(self) -> int:
        return self.rows * self.avg_row_bytes

    @property
    def skew_ratio(self) -> float:
        """Hottest key's frequency over the mean key frequency."""
        if self.rows <= 0 or self.distinct_keys <= 0:
            return 1.0
        return self.max_key_freq / (self.rows / self.distinct_keys)


@dataclass(frozen=True)
class JoinAdvice:
    strategy: str  # broadcast_left | broadcast_right | salted | shuffle
    salt_buckets: int  # 0 unless strategy == "salted"
    reason: str
    # which side the decisive statistic points at: the broadcast-able
    # side for broadcast_*, the SKEWED side for salted (the one to
    # salt / split — without this a caller would have to re-derive the
    # comparison the planner just made), "" for plain shuffle
    side: str = ""


def choose_join_strategy(
    left: JoinSideStats,
    right: JoinSideStats,
    broadcast_threshold: int = DEFAULT_BROADCAST_THRESHOLD,
    skew_factor: float = 8.0,
    target_rows_per_task: int = 1_000_000,
    max_salt_buckets: int = 64,
) -> JoinAdvice:
    """Broadcast / salt / shuffle advice from two sides' bounded-state
    statistics — the planning loop closed over the engine's own
    sketches (see module docstring for the rules and why each bound is
    safe).  Pure driver-side arithmetic: property-tested across the
    broadcast-threshold and skew boundaries in tests/test_skew.py."""
    smaller, side = (
        (left, "left")
        if left.bytes_estimate <= right.bytes_estimate
        else (right, "right")
    )
    if smaller.bytes_estimate <= broadcast_threshold:
        return JoinAdvice(
            strategy=f"broadcast_{side}",
            salt_buckets=0,
            reason=(
                f"{side} side ~{smaller.bytes_estimate}B fits the "
                f"{broadcast_threshold}B broadcast threshold; broadcast "
                "hash join shuffles nothing and probe skew is irrelevant"
            ),
            side=side,
        )
    hot, hot_side = max(
        ((left, "left"), (right, "right")), key=lambda p: p[0].skew_ratio
    )
    if hot.skew_ratio > skew_factor:
        buckets = max(
            2,
            min(
                max_salt_buckets,
                -(-hot.max_key_freq // target_rows_per_task),  # ceil
            ),
        )
        return JoinAdvice(
            strategy="salted",
            salt_buckets=buckets,
            reason=(
                f"{hot_side} side's hottest key <= {hot.max_key_freq} rows "
                f"vs mean {hot.rows / max(hot.distinct_keys, 1):.1f} "
                f"(ratio {hot.skew_ratio:.1f} > {skew_factor}); salt the "
                f"{hot_side} side into {buckets} buckets (or split its "
                "hot keys, operators/skew.hot_key_split_join)"
            ),
            side=hot_side,
        )
    return JoinAdvice(
        strategy="shuffle",
        salt_buckets=0,
        reason=(
            "neither side broadcasts and max/mean key-frequency ratio "
            f"{hot.skew_ratio:.1f} <= {skew_factor}; plain shuffle join "
            "(AQE still splits residual runtime skew)"
        ),
    )


def side_stats_from_sketches(
    cms: DataFrame, distinct_keys: int, avg_row_bytes: int
) -> JoinSideStats:
    """Assemble :class:`JoinSideStats` from a side's count-min sketch
    plus externally-known cardinality/row-width.  ONE action: both
    statistics come out of a single aggregate over the <= depth x width
    grid (an unpinned sketch's build lineage therefore executes once,
    not once per statistic), and the final read is a one-row lookup —
    the same class as reading a file footer, not a data collect."""
    per_row = cms.groupBy("row").agg(
        F.sum("cnt").alias("_s"), F.max("cnt").alias("_m")
    )
    row = per_row.agg(
        # every occurrence increments exactly one cell per depth row,
        # so any row's cell sum is the exact stream length (row 0 read)
        F.coalesce(
            F.max(F.when(F.col("row") == 0, F.col("_s"))), F.lit(0)
        ).cast("long").alias("total"),
        # min over rows of the hottest cell: the CMS point-estimate
        # bound applied to the (unknown) hottest key — never under
        F.coalesce(F.min("_m"), F.lit(0)).cast("long").alias("mx"),
    ).first()
    return JoinSideStats(
        rows=int(row["total"]),
        avg_row_bytes=avg_row_bytes,
        distinct_keys=distinct_keys,
        max_key_freq=int(row["mx"]),
    )
