"""Watermarked stream-stream interval join (click-to-conversion).

Joins each `view` event to the same user's `purchase` events landing
within the following hour — the classic attribution join. Written once
against DataFrames: in batch mode Catalyst plans an equi-join on
user_id with the time range as a join residual; in streaming mode the
same expression becomes a watermarked stream-stream inner join whose
state store holds only events inside the watermark horizon.

Scale notes: the equi-key (user_id) hash-partitions both sides, so
state and compute distribute across executors; the time-range bound
plus both-side watermarks let Spark evict state, keeping it
O(events per horizon) rather than O(stream length). Without the range
condition a stream-stream inner join cannot evict anything — that is
the design rule this module pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_views_purchases(
    events: DataFrame, watermark: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Filter the event stream into the two join sides with disjoint
    column names (required for self-joins of the same source). When
    `watermark` is given (streaming mode) both sides are watermarked —
    a stream-stream inner join requires it on each input."""
    v = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        F.col("user_id").alias("view_user"),
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("user_id").alias("purchase_user"),
        F.col("value").alias("purchase_value"),
    )
    if watermark is not None:
        v = v.withWatermark("view_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    return v, p


def attribution_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Purchases within (view_ts, view_ts + 1h] for the same user.
    delay_sec is an integer floor-division of the microsecond gap —
    exact cross-engine (no float arithmetic)."""
    cond = (
        (views["view_user"] == purchases["purchase_user"])
        & (purchases["purchase_ts"] > views["view_ts"])
        & (
            purchases["purchase_ts"]
            <= views["view_ts"] + F.expr("INTERVAL 1 HOUR")
        )
    )
    return views.join(purchases, cond, "inner").select(
        F.col("view_user").alias("user_id"),
        "view_id",
        "purchase_id",
        (
            (
                F.unix_micros("purchase_ts") - F.unix_micros("view_ts")
            )
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("delay_sec"),
        F.col("purchase_value")
        .cast("decimal(18,6)")
        .cast("double")
        .alias("purchase_value"),
    )
