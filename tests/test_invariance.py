"""Partitioning-invariance: results must be bit-identical no matter
how the data is shuffled or parallelized.

This is the test that backs the float-determinism engineering (decimal
power sums, floor-snapped products, integer scores): a raw-double SUM
would pass the oracle at one partition count by luck and drift at
another. Each query here runs under two different
`spark.sql.shuffle.partitions` settings and must collect the exact
same rows.
"""

from __future__ import annotations

import pytest

from business_intelligence_and_data_warehouse_spark.plans.queries import QUERIES

from .conftest import SF_DIR

# float-heavy / aggregation-heavy representatives of each family
INVARIANCE_SET = [
    "q1a_yoy_growth",
    "q5b_monthly_kpis",
    "analytics_descriptive_stats",
    "analytics_correlation",
    "dedup_ngram_jaccard",
    "sim_ann_lsh",
    "search_bm25",
    "incremental_agg_merge",
    "analytics_elasticity",
    # round-3 float-producing additions
    "dedup_semantic",
    "analytics_winsorized",
    "region_snowflake_rollup",
    "corpus_source_report",
    # round-3 advanced ops: forward fill, Arrow recurrence, interval
    # join, score-ranked resolution — all must not depend on layout
    "ts_gap_fill",
    "corpus_pack_sequences",
    "events_lookback_join",
    "dedup_keep_best",
    "events_hourly_ohlc",
    "basket_pair_lift",
    "embedding_label_centroids",
    "events_anomaly_daily",
]


@pytest.mark.parametrize("name", INVARIANCE_SET)
def test_result_invariant_under_repartitioning(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name} result depends on shuffle partitioning"
