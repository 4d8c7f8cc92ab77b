"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

The headline set covers every operator family (the 10 reference
analytical queries + the heaviest representative of each extension
family); set SPARK_GRAFT_BENCH_ALL=1 to time the full registry.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    # the reference's analytical battery
    "q1a_yoy_growth",
    "q1b_seasonal_index",
    "q2a_grouping_sets",
    "q2b_rollup",
    "q3a_rank_ntile",
    "q3b_moving_cumulative",
    "q4a_multi_exists",
    "q4b_above_category_avg",
    "q5a_ltv_top20",
    "q5b_monthly_kpis",
    # ETL / warehouse build
    "etl_fact_order_lines",
    "etl_dim_time",
    "scd2_merge_batch",
    # analytics layer
    "analytics_mart",
    "analytics_segmentation",
    # training-data pipeline
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_embedding_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "text_quality_score",
    # coverage queries (VERDICT r01 §9: keep their cost visible)
    "share_of_total",
    "pivot_event_matrix",
    "skew_salted_agg",
    "skew_split_join",
    "approx_sketches",
    "corpus_curation",
    "churn_rolling_window",
    "dedup_ngram_jaccard",
    # streaming (batch mode)
    "stream_tumbling_counts",
    "stream_session_windows",
    "stream_dedup_exactly_once",
    "stream_attribution_join",
    "stream_enrich_join",
    # r2 extension operators
    "text_repetition_filter",
    "contamination_check",
    "search_bm25",
    "sim_quantized_topk",
    "events_asof_join",
    "events_sessionize",
    "tfidf_top_terms",
    "incremental_agg_merge",
    # r3 extension operators
    "text_boilerplate_strip",
    "corpus_source_report",
    "region_snowflake_rollup",
    "stream_session_live",
    "dedup_semantic",
    "doc_chunk_windows",
    "ts_gap_fill",
    "events_lookback_join",
    "dedup_keep_best",
    "corpus_pack_sequences",
    # r7: end-to-end composite (curation funnel -> sequence packing)
    "pipeline_curate_pack",
    "events_hourly_ohlc",
    "basket_pair_lift",
    "stream_ohlc_live",
    "stream_upsert_sink",
    "embedding_label_centroids",
    "events_anomaly_daily",
    # r4 figure/what-if surfaces + shared-tokenize dedup report
    "whatif_churn_scenarios",
    "analytics_delay_histogram",
    "analytics_top_states",
    "dedup_multi_signal",
    "stream_tumbling_append_live",
    # r4 physical-design + BI segmentation + incremental dedup
    "warehouse_bucketed_join",
    "orders_rfm",
    "dedup_incremental",
    # r5 data-selection / substring-dedup family
    "dedup_repeated_ngrams",
    "dedup_max_dup_spans",
    "text_lm_perplexity",
    "dsir_importance_weights",
    "sim_matryoshka_topk",
    "text_substring_trim",
    "search_hybrid_rrf",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "stream_dedup_neardup",
    "multimodal_audio_features",
    # r5 physical-design + sketch batch
    "warehouse_zorder_layout",
    "contamination_bloom",
    "events_heavy_hitters",
    "topk_revenue_per_nation",
    "warehouse_tombstone_delete",
    # r5 tokenizer-prep + projection batch
    "corpus_vocab_coverage",
    "corpus_domain_quota",
    "text_char_entropy",
    "bpe_top_pairs",
    "bpe_train_32k",
    # r7: full BPE encoder (train 8 merges + corpus encode)
    "bpe_encode_corpus",
    "embedding_random_projection",
    "stream_heavy_hitters",
    "stream_quantile_sketch",
    "events_hll_cardinality",
    "events_hll_by_type",
    "events_hll_overlap",
    "events_quantile_by_type",
    # r7: bench times the PRODUCTION estimate-only sketch form; the
    # exact-side accuracy companions stay registered for the driver
    "quantile_prices_production",
    "incremental_join_delta",
    "incremental_join_counting",
    # r8: production ANN — trained sqrt(N)-cell IVF quantizer, plus
    # FIXED 50-probe serving panels so battery timings track a constant
    # probe batch (the scaling-probe sim_ann_* forms above stay for the
    # scale ramp / ratio comparability with earlier rounds)
    "sim_ann_ivf_trained",
    "sim_ann_ivf_serving",
    "sim_ann_ivfpq_fixed",
    "sim_ann_lsh_fixed",
    # r8: incremental ingest lifecycle — train+build on 2/3, append the
    # late 1/3 against frozen centroids (batch form and the exactly-once
    # streaming sink form)
    "sim_ann_ivf_append",
    "stream_ann_ingest",
    # r8: size-aware band keys — the linear all-pairs LSH (the fixed
    # 10-bit-key sim_ann_lsh above is the measured-quadratic ramp
    # subject it replaces in production)
    "sim_ann_lsh_sized",
    # r11: the full FAISS serving shape — ADC shortlist, exact rerank
    # of 3k candidates; shares the memoized family encode, so its
    # timing isolates the rerank stage's marginal cost over
    # sim_ann_ivfpq_fixed
    "sim_ann_ivfpq_rerank",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from business_intelligence_and_data_warehouse_spark.plans.queries import QUERIES
    from business_intelligence_and_data_warehouse_spark.session import (
        get_spark,
        shuffle_partitions_for,
    )
    from business_intelligence_and_data_warehouse_spark.sources.testdata import sf_of

    # scale initial shuffle partitions with the ACTUAL input size so a
    # larger SF dir (scale-ramp runs) gets proportionally more reducers
    # instead of the fixed local floor.  *.parquet entries are FILES in
    # the driver-generated dirs but DIRECTORIES in Spark-written ones
    # (scale-ramp output) — walk recursively so the sizing is not
    # silently inert in exactly the scaled case it exists for
    data_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(sf_dir)
        for f in files
        if not f.startswith((".", "_"))
    )
    spark = get_spark(
        app_name="bidw-bench",
        cpus=cpus,
        shuffle_partitions=shuffle_partitions_for(data_bytes, cpus),
    )

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not first-touch JIT/IO setup.
    QUERIES["q1a_yoy_growth"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Warm best-of-2 per query: the first execution includes JIT/codegen
    # compilation and parquet footer caching; the reported number is the
    # steady-state plan cost (min of two runs). Results are materialized
    # through the noop sink so the timing measures engine execution, not
    # row shipping into the Python driver.
    names = (
        sorted(QUERIES)
        if os.environ.get("SPARK_GRAFT_BENCH_ALL")
        else [n for n in HEADLINE if n in QUERIES]
    )
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        best = None
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as exc:  # keep the bench line parseable
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0
            continue
        timings[name] = round(best, 3)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    _write_detail(timings, total, sf_dir, cpus=cpus)
    print(
        json.dumps(
            {
                "metric": "battery_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": 2,  # per-query minimum of 2 warm executions
                "sf": sf_of(sf_dir),
            }
        )
    )
    # r13 (VERDICT r12 item 2), additions-only: the one-line map above
    # exceeds the driver's ~2 KB tail capture once the battery passed
    # ~60 queries (BENCH_r05+ recorded parsed:null; r12's parsed tail
    # held only the headline), so the per-query history only survived
    # as the committed BENCH_DETAIL files.  Re-emit the map as SHORT
    # self-describing chunk lines AFTER it — whatever suffix of stdout
    # the driver keeps is then a run of complete, parseable JSON lines
    # (compact separators, ~10 queries each) instead of the clipped
    # middle of one giant line.  The short headline stays LAST so the
    # driver's existing last-line scan parses exactly what it did
    # before; chunk lines carry their own metric name and part/of so a
    # partial window is recognizable as partial.
    items = sorted(timings.items())
    chunk = 10
    n_parts = (len(items) + chunk - 1) // chunk
    for i in range(0, len(items), chunk):
        print(
            json.dumps(
                {
                    "metric": "battery_query_seconds",
                    "part": i // chunk + 1,
                    "of": n_parts,
                    "queries": dict(items[i:i + chunk]),
                },
                separators=(",", ":"),
            )
        )
    print(
        json.dumps(
            {
                "metric": "battery_wall_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf_of(sf_dir),
                "n_queries": len(timings),
                "n_failed": sum(1 for t in timings.values() if t < 0),
            }
        )
    )
    spark.stop()


def _write_detail(
    timings: dict[str, float],
    total: float,
    sf_dir: str,
    cpus: int | None = None,
) -> None:
    """Persist the FULL per-query map as a committed artifact.

    The driver's tail capture clips the one-line JSON map once the
    battery passed ~60 queries (BENCH_r05–r09 lost the first half of
    the per-query history, including the 10 reference queries — r9
    verdict item 1).  The round number is inferred as max(existing
    BENCH_r{N}.json) + 1, so mid-round reruns overwrite the same file
    and the driver's end-of-round run is what lands in git.

    r13 (VERDICT r12 item 3): the round inference mislabeled the
    driver's EXTRA runs — its 8-core scaling pass of the r12 code
    wrote BENCH_DETAIL_r13.json.  Non-default-core runs now carry a
    ``_c{cpus}`` suffix so they never collide with the canonical
    round file, and ``SPARK_GRAFT_BENCH_TAG`` pins the artifact name
    outright (``BENCH_DETAIL_{tag}.json``) for ad-hoc runs.
    """
    import glob
    import re

    from business_intelligence_and_data_warehouse_spark.sources.testdata import sf_of

    repo = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p)))
    ]
    n = max(rounds, default=0) + 1
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG")
    if tag:
        stem = f"BENCH_DETAIL_{re.sub(r'[^A-Za-z0-9._-]', '_', tag)}.json"
    else:
        suffix = "" if cpus in (None, os.cpu_count()) else f"_c{cpus}"
        stem = f"BENCH_DETAIL_r{n:02d}{suffix}.json"
    detail = {
        "round": n,
        "metric": "battery_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf_of(sf_dir),
        "cpus": cpus,
        "n_queries": len(timings),
        "n_failed": sum(1 for t in timings.values() if t < 0),
        "queries": timings,
    }
    try:
        with open(os.path.join(repo, stem), "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as exc:  # never let bookkeeping fail the bench
        print(f"bench: detail write failed: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
