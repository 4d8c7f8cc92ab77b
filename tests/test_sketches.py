"""Bound the approximate sketches against exact answers (no cross-
engine oracle exists for HLL/KLL, so accuracy is pinned here)."""

from __future__ import annotations

from business_intelligence_and_data_warehouse_spark.plans.coverage_queries import (
    approx_sketches,
)


def test_approx_sketches_within_bounds(spark, sf_dir):
    row = approx_sketches(spark, sf_dir).first()
    # HLL++ default rsd is 5%
    assert abs(row.approx_parts - row.exact_parts) <= 0.1 * row.exact_parts
    assert abs(row.approx_orders - row.exact_orders) <= 0.1 * row.exact_orders
    # KLL median within 5% of the exact interpolated median
    assert (
        abs(row.approx_median_price - row.exact_median_price)
        <= 0.05 * row.exact_median_price
    )
