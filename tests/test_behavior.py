"""Semantic tests for the behavioral-analytics operators
(operators/behavior.py) beyond the oracle hash checks: recurrence
exactness, row-stochastic structure, experiment-scalar consistency,
and banding monotonicity."""

from __future__ import annotations

import math

from business_intelligence_and_data_warehouse_spark.plans.queries import QUERIES

from .conftest import SF_DIR


def test_ewma_matches_python_recurrence(spark):
    """The fan-out/groupBy formulation must equal the truncated
    recurrence computed sequentially in Python — EXACT double
    equality, because every term is an exponent shift and every
    partial sum fits the significand (the operator's whole design
    claim)."""
    rows = QUERIES["events_ewma"](spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["rn"])):
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, seq in by_user.items():
        cents = [r["cents"] for r in seq]
        for i, r in enumerate(seq):
            want = 0.0
            # sum smallest terms first for an exact accumulation order
            for k in range(min(i, 30), -1, -1):
                want += cents[i - k] / float(1 << (k + 1))
            assert r["ewma"] == want, (user, i, r["ewma"], want)
        # rn is dense 1..n per user
        assert [r["rn"] for r in seq] == list(range(1, len(seq) + 1))


def test_transition_matrix_is_row_stochastic(spark):
    rows = QUERIES["events_transition_matrix"](spark, SF_DIR).collect()
    assert rows
    by_from: dict[str, list] = {}
    for r in rows:
        by_from.setdefault(r["from_state"], []).append(r)
    for state, group in by_from.items():
        total = sum(r["n_transitions"] for r in group)
        for r in group:
            assert r["n_from_total"] == total
            assert r["p"] == r["n_transitions"] / total  # same IEEE op
        assert math.isclose(sum(r["p"] for r in group), 1.0, rel_tol=1e-12)


def test_ab_report_scalars_consistent(spark):
    rows = {r["variant"]: r for r in QUERIES["events_ab_test"](spark, SF_DIR).collect()}
    assert set(rows) == {"treatment", "control"}
    t, c = rows["treatment"], rows["control"]
    # conversion_rate is the single-division of the row's own counts
    for r in (t, c):
        assert r["conversion_rate"] == r["n_converted"] / r["n_units"]
        assert 0 <= r["n_converted"] <= r["n_units"]
    # the cross-variant scalars repeat identically on both rows and
    # reproduce the documented IEEE chain exactly
    assert t["lift_pct"] == c["lift_pct"] and t["z_score"] == c["z_score"]
    pt, pc = t["conversion_rate"], c["conversion_rate"]
    pool = (t["n_converted"] + c["n_converted"]) / (t["n_units"] + c["n_units"])
    se = math.sqrt(
        (pool * (1.0 - pool)) * (1.0 / t["n_units"] + 1.0 / c["n_units"])
    )
    if pc != 0:
        assert t["lift_pct"] == (pt - pc) / pc * 100.0
    if se != 0:
        assert t["z_score"] == (pt - pc) / se


def test_ab_assignment_is_pure_function_of_unit(spark):
    """Variant assignment must be derivable from the unit key alone
    (audit property): recompute the md5 bucket in Python."""
    import hashlib

    rows = QUERIES["events_ab_test"](spark, SF_DIR).collect()
    n_total = sum(r["n_units"] for r in rows)

    from business_intelligence_and_data_warehouse_spark.sources.testdata import (
        load_table,
    )

    users = [
        r["user_id"]
        for r in load_table(spark, SF_DIR, "events").select("user_id").distinct().collect()
    ]
    assert n_total == len(users)
    n_treat = sum(
        1
        for u in users
        if int(hashlib.md5(f"exp1{u}".encode()).hexdigest()[:3], 16) < 2048
    )
    by_variant = {r["variant"]: r["n_units"] for r in rows}
    assert by_variant["treatment"] == n_treat
    assert by_variant["control"] == len(users) - n_treat


def test_pareto_bands_are_monotone(spark):
    rows = sorted(
        QUERIES["orders_abc_pareto"](spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    assert rows
    # ranks dense, cum_share nondecreasing, ends exactly at 1.0
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    shares = [r["cum_share"] for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    assert shares[-1] == 1.0
    # revenue sorted descending and bands in A->B->C order
    revs = [r["revenue"] for r in rows]
    assert all(a >= b for a, b in zip(revs, revs[1:]))
    order = {"A": 0, "B": 1, "C": 2}
    bands = [order[r["abc_class"]] for r in rows]
    assert all(a <= b for a, b in zip(bands, bands[1:]))
    assert bands[0] == 0 and bands[-1] == 2
