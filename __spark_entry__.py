"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``business_intelligence_and_data_warehouse_spark``;
this module only adapts them to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from business_intelligence_and_data_warehouse_spark.plans.queries import (
    ORACLES,
    QUERIES,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver hash-checks the first 50 entries of ``queries()`` in dict
# order.  The registry holds 93 queries (90 oracled), so we rotate
# which ones occupy that window each round until every query has been
# driver-checked at least once.  Round 3 window = 17 section-2 anchor
# sentinels (kept so the core battery stays continuously verified,
# incl. sim_ann_ivf whose perf fix lands this round) + the 31 queries
# that had no driver row in CORRECTNESS_r01/r02 + 2 of the 7 queries
# new in round 3 (q2b_rollup and q3a_rank_ntile rotate out — both were
# driver-green in r01 AND r02).  The other 5 round-3 queries queue for
# the r04 window: region_snowflake_rollup, stream_session_live,
# dedup_semantic, doc_chunk_windows, ml_kmeans_embeddings.  Names
# missing from the registry are skipped; everything else follows in
# registration order, so the local oracle harness
# (tests/test_queries_oracle.py) still covers all 93.
_DRIVER_WINDOW: list[str] = [
    # -- sentinels: one anchor per SURVEY §2 family --
    "q1a_yoy_growth",
    "q2a_grouping_sets",
    "q4a_multi_exists",
    "q5b_monthly_kpis",
    "etl_dim_time",
    "etl_fact_order_lines",
    "etl_quality_quarantine",
    "scd1_last_wins",
    "scd2_merge_batch",
    "scd2_asof_lookup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "corpus_curation",
    "analytics_mart",
    # -- never driver-checked before round 3 --
    "stream_dedup_exactly_once",
    "stream_dedup_live",
    "stream_attribution_join",
    "stream_attribution_live",
    "stream_enrich_join",
    "stream_enrich_live",
    "share_of_total",
    "approx_sketches",
    "pivot_event_matrix",
    "skew_salted_agg",
    "text_repetition_filter",
    "contamination_check",
    "search_bm25",
    "embedding_quantize",
    "sim_quantized_topk",
    "events_asof_join",
    "events_sessionize",
    "corpus_mixture_sample",
    "incremental_agg_merge",
    "tfidf_top_terms",
    "unpivot_monthly_measures",
    "intersect_repeat_buyers",
    "profile_orders",
    "fuzzy_match_customers",
    "window_battery",
    "q2c_cube",
    "multimodal_frame_sample",
    "events_funnel",
    "corpus_sample_fixed_k",
    "cohort_retention",
    "analytics_winsorized",
    # -- new in round 3 --
    "text_boilerplate_strip",
    "corpus_source_report",
]


def _windowed(mapping: dict) -> dict:
    """Reorder ``mapping`` so `_DRIVER_WINDOW` names come first."""
    front = {k: mapping[k] for k in _DRIVER_WINDOW if k in mapping}
    rest = {k: v for k, v in mapping.items() if k not in front}
    return {**front, **rest}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1a_yoy_growth"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _windowed(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return _windowed(dict(ORACLES))
