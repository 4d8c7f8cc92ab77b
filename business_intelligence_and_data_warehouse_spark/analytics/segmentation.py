"""Customer value x frequency segmentation + action matrix.

Mirrors the reference's prescriptive segmentation (`PythonAnalysis.py:
443-506`: qcut terciles on spend and order count, 3x3 matrix with an
action label per cell). Tercile assignment uses ntile(3) over a TOTAL
order (customer id tiebreak) — the deterministic equivalent of
pandas's rank(method='first') qcut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.parity import DEC_MONEY2

ACTION_MATRIX = {
    (3, 3): "Champions: reward and retain",
    (3, 2): "Loyal high-spenders: upsell",
    (3, 1): "Big-ticket occasionals: re-engage",
    (2, 3): "Frequent mid-spenders: increase basket",
    (2, 2): "Core: maintain",
    (2, 1): "Warming up: nurture",
    (1, 3): "Frequent low-spenders: price-sensitive offers",
    (1, 2): "Casual: activate",
    (1, 1): "Dormant low-value: win-back or let go",
}


def customer_value_frequency(mart: DataFrame) -> DataFrame:
    """Per-customer spend/frequency + tercile assignments."""
    cust = mart.groupBy("customer_id").agg(
        F.sum(F.col("revenue").cast(DEC_MONEY2)).cast("double").alias("total_spend"),
        F.count(F.lit(1)).alias("order_count"),
    )
    w_value = W.orderBy(F.col("total_spend"), F.col("customer_id"))
    w_freq = W.orderBy(F.col("order_count"), F.col("customer_id"))
    return cust.select(
        "customer_id",
        "total_spend",
        "order_count",
        F.ntile(3).over(w_value).cast("int").alias("value_tercile"),
        F.ntile(3).over(w_freq).cast("int").alias("freq_tercile"),
    )


def segment_matrix(mart: DataFrame) -> DataFrame:
    """3x3 segment matrix: counts, average spend, action label."""
    segmented = customer_value_frequency(mart)
    label = F.lit(None).cast("string")
    for (v, f), action in sorted(ACTION_MATRIX.items()):
        label = F.when(
            (F.col("value_tercile") == v) & (F.col("freq_tercile") == f),
            F.lit(action),
        ).otherwise(label)
    return (
        segmented.groupBy("value_tercile", "freq_tercile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("total_spend").cast(DEC_MONEY2))
            .cast("double")
            .alias("segment_spend"),
        )
        .withColumn("action", label)
        .orderBy("value_tercile", "freq_tercile")
    )


def oracle_segment_matrix(mart_cte: str) -> str:
    """DuckDB twin of segment_matrix."""
    cases = " ".join(
        f"WHEN value_tercile = {v} AND freq_tercile = {f} THEN '{a}'"
        for (v, f), a in sorted(ACTION_MATRIX.items())
    )
    return f"""
WITH {mart_cte},
cust AS (
  SELECT customer_id,
         CAST(SUM(CAST(revenue AS DECIMAL(28,4))) AS DOUBLE) AS total_spend,
         COUNT(*) AS order_count
  FROM mart GROUP BY customer_id
),
terciles AS (
  SELECT customer_id, total_spend,
         CAST(ntile(3) OVER (ORDER BY total_spend, customer_id) AS INTEGER)
           AS value_tercile,
         CAST(ntile(3) OVER (ORDER BY order_count, customer_id) AS INTEGER)
           AS freq_tercile
  FROM cust
)
SELECT value_tercile, freq_tercile,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(total_spend AS DECIMAL(28,4))) AS DOUBLE) AS segment_spend,
       CASE {cases} END AS action
FROM terciles
GROUP BY value_tercile, freq_tercile
ORDER BY value_tercile, freq_tercile
"""
