"""Streaming exact deduplication (at-least-once -> exactly-once).

The reference stack is batch-only (SURVEY §2.11); this is the streaming
half of the exact-dedup operator family (`operators/dedup.py`): an
event stream delivered at-least-once (some events redelivered) is
restored to exactly-once semantics by key-based dedup.

Scale notes: `dropDuplicatesWithinWatermark` is the right primitive at
100 TB — it keys state on the dedup key only (not event time), and the
watermark bounds how long each key is retained, so state is
O(keys within horizon) instead of O(all keys ever seen). Plain
streaming `dropDuplicates` without the event-time column in the key
would grow state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def redeliver(events: DataFrame, every: int = 10) -> DataFrame:
    """Simulate at-least-once delivery: events whose id is divisible by
    `every` arrive twice. Works identically on batch and streaming
    frames (union of two streams is a supported streaming op)."""
    dup = events.filter(F.col("event_id") % every == 0)
    return events.unionByName(dup)


def dedup_batch(noisy: DataFrame) -> DataFrame:
    """Batch-mode exact dedup by event_id. Duplicate rows are full
    copies, so which copy survives is immaterial — output is
    deterministic."""
    return noisy.dropDuplicates(["event_id"])


def dedup_stream(noisy: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: watermark bounds the dedup state; a
    redelivery later than the horizon would NOT be caught (documented
    trade-off — state cannot be unbounded on an infinite stream)."""
    return noisy.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def delivery_counts(deduped: DataFrame) -> DataFrame:
    """Post-dedup per-type totals (decimal-summed for cross-engine
    parity; see plans/queries.py docstring)."""
    return (
        deduped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("event_type")
    )
