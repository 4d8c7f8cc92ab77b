"""Connected-components behavior: chains, multiple components,
determinism under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.operators.graph import (
    connected_components,
    dedup_cluster_assignments,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, needs several propagation rounds
    out = connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    rows = {r.node: r.comp for r in out.collect()}
    assert rows == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_multiple_components(spark):
    out = connected_components(
        _edges(spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)])
    )
    rows = {r.node: r.comp for r in out.collect()}
    assert rows == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_partitioning_invariance(spark):
    edges = _edges(spark, [(i, i + 1) for i in range(1, 20)]).repartition(7)
    out = connected_components(edges)
    assert {r.comp for r in out.collect()} == {1}


def test_two_phase_matches_propagation(spark):
    # random-ish mixed graph: both methods must produce identical labels
    pairs = [(1, 2), (2, 3), (7, 9), (9, 8), (8, 7), (40, 41), (50, 50)]
    e = _edges(spark, pairs)
    prop = {r.node: r.comp for r in connected_components(e).collect()}
    two = {
        r.node: r.comp
        for r in connected_components(e, method="two_phase").collect()
    }
    assert prop == two


def test_two_phase_chain_converges_in_log_rounds(spark):
    # 256-node path: diameter 255, so plain propagation needs ~255
    # rounds. Large-star/small-star contracts geometrically — cap the
    # round budget at 10 (~2·log2 n) and require full convergence.
    n = 256
    edges = _edges(spark, [(i, i + 1) for i in range(n - 1)]).repartition(5)
    out = connected_components(edges, max_iter=10, method="two_phase")
    rows = {r.node: r.comp for r in out.collect()}
    assert rows == {i: 0 for i in range(n)}


def test_mixed_width_edge_types_coerce(spark):
    # int src joined to bigint dst: the explode/struct symmetrize
    # requires one common type — both methods must coerce, not fail
    # at analysis time (r4 ADVICE, operators/graph.py).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src int, dst long"
    )
    for method in ("propagation", "two_phase"):
        out = connected_components(edges, method=method)
        rows = {r.node: r.comp for r in out.collect()}
        assert rows == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cluster_assignments_mark_keeper(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (2, 3)], "doc_a long, doc_b long"
    )
    out = dedup_cluster_assignments(pairs).orderBy("doc_id").collect()
    assert [(r.doc_id, r.cluster_id, r.is_kept) for r in out] == [
        (2, 2, True),
        (3, 2, False),
        (5, 5, True),
        (7, 5, False),
        (9, 5, False),
    ]


def test_propagation_raises_on_diameter_over_budget(spark):
    import pytest

    edges = _edges(spark, [(i, i + 1) for i in range(30)])
    with pytest.raises(RuntimeError, match="two_phase"):
        connected_components(edges, max_iter=3)


def test_two_phase_raises_on_round_budget_exhaustion(spark):
    import pytest

    edges = _edges(spark, [(i, i + 1) for i in range(256)])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=1, method="two_phase")
