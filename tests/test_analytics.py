"""Semantics tests for the analytics layer (the oracles check parity;
these check meaning on small crafted data + the ML path end-to-end)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.analytics.descriptive import (
    corr_pairs,
    summary_stats,
)
from business_intelligence_and_data_warehouse_spark.analytics.mart import (
    build_order_mart,
)
from business_intelligence_and_data_warehouse_spark.analytics.predictive import (
    churn_random_forest,
    elasticity_by_category,
    stratified_split,
    with_balanced_weights,
)
from business_intelligence_and_data_warehouse_spark.analytics.segmentation import (
    segment_matrix,
)


def test_summary_stats_known_values(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4, 5]], "x double")
    row = summary_stats(df, ["x"]).first()
    assert row.n == 5
    assert row.mean == 3.0
    assert abs(row.std - math.sqrt(2.5)) < 1e-5  # std rounds at 6 decimals
    assert (row.min_value, row.median, row.max_value) == (1.0, 3.0, 5.0)
    assert (row.p25, row.p75) == (2.0, 4.0)


def test_corr_perfect_linear(spark):
    df = spark.createDataFrame(
        [(float(i), 2.0 * i + 1, -3.0 * i) for i in range(10)],
        "x double, y double, z double",
    )
    rows = {(r.var_x, r.var_y): r.corr for r in corr_pairs(df, ["x", "y", "z"]).collect()}
    assert abs(rows[("x", "y")] - 1.0) < 1e-6
    assert abs(rows[("x", "z")] + 1.0) < 1e-6


def test_elasticity_recovers_slope(spark):
    # construct q = p^(-2) exactly: ln q = -2 ln p  ->  slope -2, r2 1
    lineitem = spark.createDataFrame(
        [(i, 1, float(p * q), float(q)) for i, (p, q) in enumerate(
            [(2, 1.0 / 4), (4, 1.0 / 16), (8, 1.0 / 64), (16, 1.0 / 256)]
        )],
        "l_orderkey long, l_partkey long, l_extendedprice double, l_quantity double",
    )
    part = spark.createDataFrame([(1, "B1")], "p_partkey long, p_brand string")
    row = elasticity_by_category(lineitem, part).first()
    assert abs(row.elasticity + 2.0) < 1e-3
    assert abs(row.r2 - 1.0) < 1e-3


def test_segment_matrix_shape(spark, sf_dir):
    mart = build_order_mart(spark, sf_dir)
    rows = segment_matrix(mart).collect()
    assert 1 <= len(rows) <= 9
    assert sum(r.n_customers for r in rows) == mart.select("customer_id").distinct().count()
    assert all(r.action is not None for r in rows)


def test_churn_rf_trains_and_scores(spark, sf_dir):
    mart = build_order_mart(spark, sf_dir)
    metrics = churn_random_forest(spark, mart, num_trees=10).first()
    assert metrics.n_train > 0 and metrics.n_test > 0
    assert 0.0 <= metrics.auc <= 1.0
    assert 0.0 <= metrics.accuracy <= 1.0
    # classification-report fields (reference PythonAnalysis.py:292-300)
    for m in (metrics.precision, metrics.recall, metrics.f1):
        assert 0.0 <= m <= 1.0
    if metrics.precision + metrics.recall:
        want_f1 = (
            2 * metrics.precision * metrics.recall
            / (metrics.precision + metrics.recall)
        )
        assert abs(metrics.f1 - want_f1) < 1e-12
    assert metrics.top_features


def test_stratified_split_holds_per_class(spark):
    # 1000 majority / 100 minority: a plain randomSplit only holds the
    # ratio globally; the stratified split holds it per class
    data = spark.createDataFrame(
        [(i, 0.0) for i in range(1000)] + [(1000 + i, 1.0) for i in range(100)],
        "customer_id long, label double",
    )
    train, test = stratified_split(data, "label", 0.7, seed=42)
    tr = {r[0]: r[1] for r in train.groupBy("label").count().collect()}
    te = {r[0]: r[1] for r in test.groupBy("label").count().collect()}
    for lbl, total in [(0.0, 1000), (1.0, 100)]:
        assert tr[lbl] + te[lbl] == total  # partition, no loss/dup
        assert 0.55 * total <= tr[lbl] <= 0.85 * total, (lbl, tr[lbl])


def test_balanced_weights_equalize_class_mass(spark):
    train = spark.createDataFrame(
        [(i, 0.0) for i in range(900)] + [(900 + i, 1.0) for i in range(100)],
        "customer_id long, label double",
    )
    weighted = with_balanced_weights(train, "label", "weight")
    mass = {
        r[0]: r[1]
        for r in weighted.groupBy("label")
        .agg(F.sum("weight").alias("m"))
        .collect()
    }
    # each class carries equal total weight == n/2
    assert abs(mass[0.0] - 500.0) < 1e-6
    assert abs(mass[1.0] - 500.0) < 1e-6


def test_kmeans_clusters_deterministic_and_cover_corpus(spark, sf_dir):
    from business_intelligence_and_data_warehouse_spark.analytics.predictive import (
        kmeans_embedding_clusters,
    )
    from business_intelligence_and_data_warehouse_spark.sources.testdata import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = [tuple(r) for r in kmeans_embedding_clusters(spark, emb).collect()]
    b = [tuple(r) for r in kmeans_embedding_clusters(spark, emb).collect()]
    assert a == b, "seeded KMeans must be run-to-run deterministic"
    # KMeans may converge with empty clusters -> at most k result rows
    assert 1 <= len(a) <= 8
    assert sum(n for _cid, n, _mid, _opt in a) == emb.count()
    # the in-result invariant: every member's centroid is its argmin
    assert all(opt for _cid, _n, _mid, opt in a)


def test_churn_roc_points_invariants(spark, sf_dir):
    """The ROC-points query must be a true ROC curve: monotone rates,
    (0,0)/(1,1) endpoints, and trapezoid area equal to the exact
    Mann-Whitney AUC of the underlying scores."""
    from business_intelligence_and_data_warehouse_spark.analytics.predictive import (
        churn_roc_points,
        fit_churn_model,
    )

    mart = build_order_mart(spark, sf_dir)
    curve = churn_roc_points(spark, mart, num_trees=10).collect()
    assert curve[0].threshold > 1.0  # anchor row first (desc threshold)
    assert (curve[0].fpr, curve[0].tpr) == (0.0, 0.0)
    assert abs(curve[-1].fpr - 1.0) < 1e-12
    assert abs(curve[-1].tpr - 1.0) < 1e-12
    fprs = [r.fpr for r in curve]
    tprs = [r.tpr for r in curve]
    assert fprs == sorted(fprs), "fpr must be nondecreasing"
    assert tprs == sorted(tprs), "tpr must be nondecreasing"
    # trapezoid over the curve == exact rank AUC of the same scores
    trap = sum(
        (fprs[i] - fprs[i - 1]) * (tprs[i] + tprs[i - 1]) / 2.0
        for i in range(1, len(curve))
    )
    from pyspark.ml.functions import vector_to_array

    _m, _t, pred = fit_churn_model(mart, num_trees=10)
    pairs = [
        (float(r.score), int(r.label))
        for r in pred.select(
            vector_to_array("probability")[1].alias("score"), "label"
        ).collect()
    ]
    pos = sorted(s for s, y in pairs if y == 1)
    neg = sorted(s for s, y in pairs if y == 0)
    import bisect

    wins = sum(bisect.bisect_left(neg, s) for s in pos)
    ties = sum(
        bisect.bisect_right(neg, s) - bisect.bisect_left(neg, s) for s in pos
    )
    exact_auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(trap - exact_auc) < 1e-9, (trap, exact_auc)
