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


def test_heap_bytes_parses_every_spark_legal_memory_string(monkeypatch):
    """SPARK_GRAFT_DRIVER_MEM must accept everything spark.driver.memory
    accepts — unitless bytes, k/m/g/t suffixes (either case, optional
    trailing 'b'), fractional values — and fall back to the 4 GiB
    default on garbage instead of raising (a bad env var must not
    brick every get_spark call; r9 ADVICE item 1)."""
    from business_intelligence_and_data_warehouse_spark import session as s

    cases = {
        "4g": 4 << 30,
        "8G": 8 << 30,
        "512m": 512 << 20,
        "2t": 2 << 40,
        "4294967296": 4 << 30,
        "4.5g": int(4.5 * (1 << 30)),
        "4gb": 4 << 30,
        " 6g ": 6 << 30,
        "bogus": 4 << 30,
        "": 4 << 30,
        "-2g": 4 << 30,
    }
    for raw, want in cases.items():
        monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", raw)
        assert s._heap_bytes() == want, raw
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM")
    assert s._heap_bytes() == 4 << 30


def test_bench_detail_artifact_written(tmp_path, monkeypatch):
    """bench.py must persist the FULL per-query map to
    BENCH_DETAIL_r{N}.json (N inferred from existing BENCH_r files) —
    the one-line stdout map is tail-clipped by the driver past ~60
    queries (r9 verdict item 1)."""
    import json

    import bench

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    (tmp_path / "BENCH_r03.json").write_text("{}")
    timings = {"q1": 1.5, "q2": -1.0}
    bench._write_detail(timings, 1.5, "/root/testdata/sf0.1")
    detail = json.loads((tmp_path / "BENCH_DETAIL_r04.json").read_text())
    assert detail["queries"] == timings
    assert detail["round"] == 4
    assert detail["n_failed"] == 1 and detail["n_queries"] == 2
    assert detail["sf"] == 0.1

    # r13 (VERDICT r12 item 3): a non-default-core run must NOT claim
    # the canonical round file (the driver's 8-core r12 scaling run
    # overwrote BENCH_DETAIL_r13.json) — it carries a _c{cpus} suffix
    bench._write_detail(timings, 1.5, "/root/testdata/sf0.1", cpus=8)
    c8 = json.loads((tmp_path / "BENCH_DETAIL_r04_c8.json").read_text())
    assert c8["cpus"] == 8 and c8["queries"] == timings
    # the machine's full core count IS the default run -> no suffix
    bench._write_detail(
        timings, 1.5, "/root/testdata/sf0.1", cpus=bench.os.cpu_count()
    )
    assert json.loads(
        (tmp_path / "BENCH_DETAIL_r04.json").read_text()
    )["cpus"] == bench.os.cpu_count()
    # explicit tag pins the artifact name outright (sanitized)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_TAG", "r99 base/A")
    bench._write_detail(timings, 1.5, "/root/testdata/sf0.1")
    assert (tmp_path / "BENCH_DETAIL_r99_base_A.json").exists()
    monkeypatch.delenv("SPARK_GRAFT_BENCH_TAG")
