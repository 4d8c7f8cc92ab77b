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
    # round-4 additions: quintile ties, full-outer diff, asymmetric
    # jaccard best-match, salted join, decimal revenue off buckets
    "orders_rfm",
    "scd2_snapshot_diff",
    "dedup_incremental",
    "skew_salted_join",
    "warehouse_bucketed_join",
    # round-5 additions: log-snap scores, interval-merge windows,
    # prefix-truncated cosine ranking
    "text_lm_perplexity",
    "dsir_importance_weights",
    "dedup_repeated_ngrams",
    "sim_matryoshka_topk",
    "text_substring_trim",
    "corpus_temperature_mixture",
    "search_hybrid_rrf",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    # round-5 behavioral ops: exact-float EWMA fan-out, hash-assigned
    # experiment scalars, window cumulative shares
    "events_ewma",
    "events_ab_test",
    "events_transition_matrix",
    "orders_abc_pareto",
    "graph_pagerank",
    "sim_binary_hamming",
    "search_bm25_indexed",
    "text_line_dedup",
    "data_quality_checks",
    # round-5 physical/sketch batch: hash-sketch flags and estimates,
    # interleaved-bit buckets, k-bounded buffers, cascade counts
    "contamination_bloom",
    "events_heavy_hitters",
    "warehouse_zorder_layout",
    "topk_revenue_per_nation",
    "warehouse_tombstone_delete",
    # round-5 tokenizer-prep batch: df-boundary vocab cut, snapped-log
    # entropy, integer projection sums
    "corpus_vocab_coverage",
    "text_char_entropy",
    "embedding_random_projection",
    "events_hll_cardinality",
    "incremental_join_delta",
    "dedup_lsh_recall_report",
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


def test_event_order_key_total_order_across_epochs(spark, oracle_con):
    """The fixed-width sortable key's lexicographic==numeric guarantee
    must hold for PRE-1970 timestamps too (the epoch bias keeps the
    padded value strictly positive — an unbiased negative epoch lpads
    to '-000…' which sorts in REVERSED magnitude order), and the
    DuckDB twin must produce byte-identical keys."""
    import datetime

    from pyspark.sql import functions as F

    from business_intelligence_and_data_warehouse_spark.functions.parity import (
        event_order_key,
        o_event_order_key,
    )

    rows = [
        (i, ts)
        for i, ts in enumerate(
            [
                datetime.datetime(1905, 1, 1, 0, 0, 0),
                datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),
                datetime.datetime(1970, 1, 1, 0, 0, 0),
                datetime.datetime(1970, 1, 1, 0, 0, 0, 1),
                datetime.datetime(2000, 6, 15, 12, 0, 0),
                datetime.datetime(2099, 12, 31, 23, 59, 59),
            ]
        )
        for _ in (0, 1)  # two ids per ts exercise the id tiebreak
    ]
    rows = [(eid, ts) for eid, (i, ts) in enumerate(rows)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = (
        df.select(
            "event_id",
            "ts",
            event_order_key("ts", "event_id").alias("k"),
        )
        .collect()
    )
    # lexicographic key order == numeric (ts, id) order
    by_key = [(r["ts"], r["event_id"]) for r in sorted(got, key=lambda r: r["k"])]
    assert by_key == sorted(by_key)
    # DuckDB twin: byte-identical keys for the same rows
    oracle_con.execute("CREATE OR REPLACE TEMP TABLE evk (event_id BIGINT, ts TIMESTAMP)")
    oracle_con.executemany("INSERT INTO evk VALUES (?, ?)", rows)
    want = dict(
        oracle_con.execute(
            f"SELECT event_id, {o_event_order_key('ts', 'event_id')} FROM evk"
        ).fetchall()
    )
    for r in got:
        assert r["k"] == want[r["event_id"]], r["event_id"]
    oracle_con.execute("DROP TABLE evk")
