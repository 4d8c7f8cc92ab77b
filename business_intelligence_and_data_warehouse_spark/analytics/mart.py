"""Order-grain analytics mart.

The reference pulls one denormalized order-grain dataframe into pandas
and runs every analysis on it (`Python Analytics/PythonAnalysis.py:
30-149`: an 8-CTE SQL mart -> pd.read_sql). Here the mart is a
DataFrame built once from the star schema and shared by the
descriptive/predictive/prescriptive layers — it stays distributed;
only final small results leave the JVM.

Scale: one shuffle (lineitem rolled to order grain on l_orderkey) +
one shuffle for the orders join; customer/nation broadcast. Callers
that fan out into several analyses should .cache() the mart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import DEC, davg, dsum
from ..sources.testdata import load_table

ON_TIME_DAYS = 90


def build_order_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per order with measures + customer geography."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    order_lines = lineitem.groupBy("l_orderkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("l_quantity").alias("total_qty"),
        davg(F.col("l_discount")).alias("avg_discount"),
        dsum(F.col("l_extendedprice") * F.col("l_tax")).alias("freight"),
        F.max("l_shipdate").cast("date").alias("last_ship_day"),
    )
    due = F.date_add(F.col("order_date"), ON_TIME_DAYS)
    return (
        orders.join(order_lines, orders.o_orderkey == order_lines.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .withColumn("order_date", F.to_date("o_orderdate"))
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
            F.col("n_name").alias("nation"),
            "order_date",
            F.year("order_date").alias("year"),
            F.month("order_date").alias("month"),
            "revenue",
            "n_lines",
            "total_qty",
            "avg_discount",
            "freight",
            "last_ship_day",
            (F.col("last_ship_day") <= due).alias("on_time"),
            F.when(
                F.col("last_ship_day") > due,
                F.datediff("last_ship_day", due),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("delay_days"),
        )
    )


# DuckDB twin of the mart, kept in lockstep with build_order_mart (the
# downstream analytics oracles all start from this CTE).
ORACLE_MART = f"""
mart AS (
  SELECT
    o.o_orderkey AS order_id,
    o.o_custkey AS customer_id,
    n.n_name AS nation,
    CAST(o.o_orderdate AS DATE) AS order_date,
    CAST(year(o.o_orderdate) AS INTEGER) AS year,
    CAST(month(o.o_orderdate) AS INTEGER) AS month,
    ol.revenue, ol.n_lines, ol.total_qty, ol.avg_discount, ol.freight,
    ol.last_ship_day,
    ol.last_ship_day <= CAST(o.o_orderdate AS DATE) + {ON_TIME_DAYS} AS on_time,
    CAST(CASE WHEN ol.last_ship_day > CAST(o.o_orderdate AS DATE) + {ON_TIME_DAYS}
              THEN date_diff('day', CAST(o.o_orderdate AS DATE) + {ON_TIME_DAYS},
                             ol.last_ship_day)
              ELSE 0 END AS INTEGER) AS delay_days
  FROM orders o
  JOIN (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC.upper()})) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines,
           SUM(l_quantity) AS total_qty,
           (CAST(SUM(CAST(l_discount AS {DEC.upper()})) AS DOUBLE) / COUNT(l_discount)) AS avg_discount,
           CAST(SUM(CAST(l_extendedprice * l_tax AS {DEC.upper()})) AS DOUBLE) AS freight,
           CAST(MAX(l_shipdate) AS DATE) AS last_ship_day
    FROM lineitem GROUP BY l_orderkey
  ) ol ON ol.l_orderkey = o.o_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
)
"""
