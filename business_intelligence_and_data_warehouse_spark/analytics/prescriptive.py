"""Prescriptive analytics: freight optimization bands + delivery risk.

Mirrors the reference's prescriptive block (`PythonAnalysis.py:
380-552`): freight rate per km by distance band with a discount
recommendation where service quality allows (:404-432), and risk
flagging above p75 distance/freight thresholds (:515-552).

Distances come from the deterministic synthetic coordinates
(functions/geo.py) since the driver schema has no geography; the
haversine result is snapped to DECIMAL(18,4) pre-aggregation (JVM vs
libm trig differs by ~1 ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import (
    haversine_km,
    oracle_haversine,
    oracle_synth_coords,
    synth_coords,
)
from ..functions.parity import DEC, dpctl, o_dsum
from ..sources.testdata import load_table

BAND_EDGES = (0, 2000, 5000, 10000, 20000)
ON_TIME_TARGET = 0.9
RATE_CUT = 0.08


def _pair_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(customer, supplier) pair grain: freight, distance, on-time."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
    lat1, lng1 = synth_coords(F.col("o_custkey"), 0)
    lat2, lng2 = synth_coords(F.col("l_suppkey"), 1)
    due = F.date_add(F.to_date("o_orderdate"), 90)
    return (
        joined.select(
            F.col("o_custkey").alias("customer_id"),
            F.col("l_suppkey").alias("supplier_id"),
            (F.col("l_extendedprice") * F.col("l_tax")).alias("freight_value"),
            haversine_km(lat1, lng1, lat2, lng2)
            .cast("decimal(18,4)")
            .cast("double")
            .alias("distance_km"),
            (F.col("l_shipdate").cast("date") <= due).cast("int").alias("on_time"),
        )
        .groupBy("customer_id", "supplier_id", "distance_km")
        .agg(
            F.sum(F.col("freight_value").cast(DEC)).cast("double").alias("freight"),
            F.count(F.lit(1)).alias("n_lines"),
            F.avg("on_time").alias("on_time_rate"),
        )
    )


_O_PAIRS = f"""
pairs AS (
  SELECT o_custkey AS customer_id, l_suppkey AS supplier_id,
         CAST(CAST({oracle_haversine(*oracle_synth_coords('o_custkey', 0), *oracle_synth_coords('l_suppkey', 1))}
              AS DECIMAL(18,4)) AS DOUBLE) AS distance_km,
         {o_dsum('l_extendedprice * l_tax')} AS freight,
         COUNT(*) AS n_lines,
         AVG(CASE WHEN CAST(l_shipdate AS DATE) <= CAST(o_orderdate AS DATE) + 90
                  THEN 1 ELSE 0 END) AS on_time_rate
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1, 2, 3
)
"""


def _band(col) -> "F.Column":
    b = F.lit("20000+")
    for lo, hi in zip(BAND_EDGES, BAND_EDGES[1:]):
        b = F.when((col >= lo) & (col < hi), F.lit(f"{lo}-{hi}")).otherwise(b)
    return b


def freight_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-per-km stats by distance band + discount recommendation
    where the band's on-time rate clears the service target."""
    pairs = _pair_facts(spark, sf_dir)
    rated = pairs.withColumn(
        "rate_per_km",
        F.col("freight") / F.nullif(F.col("distance_km"), F.lit(0.0)),
    ).withColumn("band", _band(F.col("distance_km")))
    return (
        rated.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("freight").cast("decimal(28,4)")).cast("double").alias(
                "total_freight"
            ),
            (
                F.sum(F.col("rate_per_km").cast("decimal(28,8)")).cast("double")
                / F.count("rate_per_km")
            ).alias("avg_rate_per_km"),
            # on_time_rate is an arbitrary double (k/n); snap before the
            # order-dependent sum for cross-engine parity
            (
                F.sum(F.col("on_time_rate").cast("decimal(28,8)")).cast("double")
                / F.count("on_time_rate")
            ).alias("band_on_time_rate"),
        )
        .withColumn(
            "recommend_rate_cut", F.col("band_on_time_rate") >= ON_TIME_TARGET
        )
        .withColumn(
            "optimized_freight",
            F.when(
                F.col("recommend_rate_cut"),
                F.col("total_freight") * (1 - RATE_CUT),
            ).otherwise(F.col("total_freight")),
        )
        .orderBy("band")
    )


def oracle_freight_bands() -> str:
    cases = " ".join(
        f"WHEN distance_km >= {lo} AND distance_km < {hi} THEN '{lo}-{hi}'"
        for lo, hi in zip(BAND_EDGES, BAND_EDGES[1:])
    )
    return f"""
WITH {_O_PAIRS},
rated AS (
  SELECT *,
         freight / NULLIF(distance_km, 0.0) AS rate_per_km,
         CASE {cases} ELSE '20000+' END AS band
  FROM pairs
),
agg AS (
  SELECT band, COUNT(*) AS n_pairs,
         CAST(SUM(CAST(freight AS DECIMAL(28,4))) AS DOUBLE) AS total_freight,
         CAST(SUM(CAST(rate_per_km AS DECIMAL(28,8))) AS DOUBLE)
           / COUNT(rate_per_km) AS avg_rate_per_km,
         CAST(SUM(CAST(on_time_rate AS DECIMAL(28,8))) AS DOUBLE)
           / COUNT(on_time_rate) AS band_on_time_rate
  FROM rated GROUP BY band
)
SELECT *,
       band_on_time_rate >= {ON_TIME_TARGET} AS recommend_rate_cut,
       CASE WHEN band_on_time_rate >= {ON_TIME_TARGET}
            THEN total_freight * (1 - {RATE_CUT})
            ELSE total_freight END AS optimized_freight
FROM agg
ORDER BY band
"""


def risk_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation delivery-risk roll-up: pairs above p75 distance OR
    p75 freight (exact percentiles, snapped for parity).

    The pair table feeds both the percentile scalar and the flag scan,
    but both consumers live in ONE plan (the threshold is a broadcast
    crossJoin input), so Catalyst's ReuseExchange already shares the
    pair subtree — measured: adding an explicit pin only added
    cache-write overhead. The multi-consumer pin rule applies to
    subtrees consumed by SEPARATE actions, not within one plan."""
    pairs = _pair_facts(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    thresholds = pairs.agg(
        dpctl("distance_km", 0.75).alias("p75_distance"),
        dpctl("freight", 0.75).alias("p75_freight"),
    )
    flagged = (
        pairs.crossJoin(F.broadcast(thresholds))
        .withColumn(
            "risky",
            (
                (F.col("distance_km") > F.col("p75_distance"))
                | (F.col("freight") > F.col("p75_freight"))
            ).cast("int"),
        )
        .join(customer, pairs.customer_id == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        flagged.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("risky").alias("n_risky"),
            (F.sum("risky") * 1.0 / F.count(F.lit(1))).alias("risky_share"),
        )
        .orderBy("nation")
    )


def oracle_risk_flags() -> str:
    return f"""
WITH {_O_PAIRS},
th AS (
  SELECT CAST(CAST(quantile_cont(distance_km, 0.75) AS DECIMAL(18,6)) AS DOUBLE)
           AS p75_distance,
         CAST(CAST(quantile_cont(freight, 0.75) AS DECIMAL(18,6)) AS DOUBLE)
           AS p75_freight
  FROM pairs
),
flagged AS (
  SELECT p.*, n.n_name AS nation,
         CASE WHEN p.distance_km > th.p75_distance
                OR p.freight > th.p75_freight THEN 1 ELSE 0 END AS risky
  FROM pairs p
  CROSS JOIN th
  JOIN customer c ON c.c_custkey = p.customer_id
  JOIN nation n ON n.n_nationkey = c.c_nationkey
)
SELECT nation, COUNT(*) AS n_pairs,
       CAST(SUM(risky) AS BIGINT) AS n_risky,
       SUM(risky) * 1.0 / COUNT(*) AS risky_share
FROM flagged
GROUP BY nation
ORDER BY nation
"""
