"""Bound the approximate sketches against exact answers (no cross-
engine oracle exists for HLL/KLL, so accuracy is pinned here).

The registry query now also self-validates in-row (``*_within_bounds``
columns against the sketches' published error bounds); this test pins
both those booleans and an independent out-of-band exact comparison."""

from __future__ import annotations

from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.plans.coverage_queries import (
    approx_sketches,
)
from business_intelligence_and_data_warehouse_spark.sources.testdata import load_table


def test_approx_sketches_within_bounds(spark, sf_dir):
    row = approx_sketches(spark, sf_dir).first()
    lineitem = load_table(spark, sf_dir, "lineitem")
    exact = lineitem.agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        F.countDistinct("l_orderkey").alias("orders"),
    ).first()
    # HLL++ default rsd is 5%
    assert abs(row.approx_parts - exact.parts) <= 0.1 * exact.parts
    assert abs(row.approx_orders - exact.orders) <= 0.1 * exact.orders
    # KLL median within 5% of the exact interpolated median
    assert (
        abs(row.approx_median_price - exact.median_price)
        <= 0.05 * exact.median_price
    )
    # the in-row self-validation must agree
    assert row.hll_parts_within_bounds
    assert row.hll_orders_within_bounds
    assert row.kll_median_within_bounds
