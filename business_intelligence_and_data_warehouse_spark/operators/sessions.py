"""Batch sessionization: assign gap-based session ordinals to an
event stream.

Structured Streaming's ``session_window`` (streaming/windows.py) gives
session AGGREGATES; this operator gives the row-level session
ASSIGNMENT (each event tagged with its session) — the form needed to
build per-session features, funnels, and training sequences.

The classic declarative decomposition, two windows over one shuffle:

1. ``new_session = (ts - lag(ts)) > gap`` per key — a gap larger than
   `gap` starts a new session;
2. ``session_seq = running sum of new_session`` — the per-key session
   ordinal.

Scale notes: one exchange on the key, state per row is O(1) (lag +
running sum are streaming window evaluations over the sorted
partition); no self-join, no explode. Skewed keys cost sort time
only. Ties on ts break on the id column so assignment is total-order
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def sessionize(
    events: DataFrame,
    gap_seconds: int,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Adds ``session_seq`` (1-based per-key session ordinal) and
    ``session_id`` ('<key>#<seq>') to each event."""
    order = W.partitionBy(key).orderBy(ts_col, id_col)
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    prev_ts = F.lag(F.unix_micros(F.col(ts_col))).over(order)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_ts) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = (
        W.partitionBy(key)
        .orderBy(ts_col, id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        events.withColumn("is_new", new_session)
        .withColumn("session_seq", F.sum("is_new").over(running).cast("int"))
        .withColumn(
            "session_id",
            F.concat_ws("#", F.col(key).cast("string"), F.col("session_seq")),
        )
        .drop("is_new")
    )
