"""Stream-static enrichment: join a stream against a slowly-changing
dimension snapshot, then window-aggregate on dimension attributes.

The most common production streaming topology (enrich clickstream
with user/product attributes, aggregate per attribute) and the one
Structured Streaming executes cheapest: a stream-STATIC inner join
has no join state at all — the static side broadcasts to every task
and each micro-batch probes it map-side. Only the downstream windowed
aggregate keeps (bounded, watermarked) state.

At 100 TB/day stream scale the same plan holds: the dimension is
broadcast (or a storage-side lookup join); the stream is never
shuffled for the join itself, only for the window aggregate on the
(window × attribute) key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enriched_segment_windows(
    events: DataFrame,
    dim: DataFrame,
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-(day window, market segment) event counts and exact value
    sums, with the customer dimension broadcast into the stream."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    joined = src.join(
        F.broadcast(dim.select("c_custkey", "c_mktsegment")),
        src["user_id"] == F.col("c_custkey"),
    )
    return (
        joined.groupBy(F.window("ts", window).alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "value_sum",
        )
    )
