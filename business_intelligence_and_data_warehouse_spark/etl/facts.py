"""Fact-table builders over the synthetic star schema.

Spark-first re-expression of the reference's fact ETL shape
(`ETL/etl for fact_orderlines.ktr:495-560` hop graph: CSV inputs ->
sort-merge join -> chain of dimension key lookups -> constants ->
table output). In Spark the lookups are broadcast hash joins against
already-built dims, the whole chain is one lazy plan, and the
"table output" is a partitioned parquet write.

Scale notes (100 TB):
* lineitem|orders join shuffles on the natural key (orderkey) — both
  sides need that partitioning anyway; at warehouse scale the two
  tables would be bucketed on orderkey to make this co-located.
* Every dim lookup is a broadcast join (calendar is O(days); part/
  customer/supplier are O(1e6) rows at 100 TB fact scale — still far
  below the fact side; Spark picks broadcast from stats, we hint it).
* The dense date surrogate (time_key) is computed over DISTINCT dates
  (a few thousand rows), never over the fact data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.testdata import load_table


def build_dim_date_from_orders(orders: DataFrame) -> DataFrame:
    """Dense, date-ordered surrogate key over the distinct order dates.

    Mirrors the reference's dense time_key semantics (SURVEY §1.5):
    contiguous 1..N in date order, so key subtraction == day distance
    only where the calendar is dense — downstream day-count measures
    therefore use datediff on real dates instead.
    """
    return (
        orders.select(F.to_date("o_orderdate").alias("date"))
        .distinct()
        .withColumn("time_key", F.row_number().over(W.orderBy("date")).cast("int"))
    )


def build_fact_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-line-grain fact with dimension keys resolved.

    Column roles (reference `Database Creation.sql:183-196`):
    surrogate keys for time; natural keys for customer/part/supplier
    (already integers in the synthetic schema); measures price/freight
    analogs; `quantity` from the source (the reference hard-codes 1 per
    line via a Calculator step; the synthetic schema carries a real
    quantity).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    dim_date = build_dim_date_from_orders(orders)

    enriched = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .withColumn("order_date", F.to_date("o_orderdate"))
        .join(F.broadcast(dim_date), F.col("order_date") == dim_date.date, "left")
    )
    return enriched.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("order_line_number"),
        F.col("time_key"),
        F.col("order_date"),
        F.col("o_custkey").alias("customer_key"),
        F.col("l_partkey").alias("product_key"),
        F.col("l_suppkey").alias("seller_key"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("discount_value"),
        F.col("o_orderstatus").alias("order_status"),
    )


def write_fact(df: DataFrame, path: str, partition_cols: tuple[str, ...] = ()) -> None:
    """Warehouse sink: partitioned columnar parquet (the Spark
    equivalent of the reference's batched JDBC TableOutput)."""
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
