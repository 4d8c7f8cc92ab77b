"""Every registered analytical query must hash-match its DuckDB oracle
(the same check the driver runs at sf0.01, here at the test SF)."""

from __future__ import annotations

import pytest

from business_intelligence_and_data_warehouse_spark.plans.queries import (
    ORACLES,
    QUERIES,
)

from .conftest import assert_matches_oracle

ORACLED = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, oracle_con, ORACLES[name])


def test_all_queries_have_impls():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.schema is not None
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_driver_window_rotation():
    """The computed first-50 window: sentinels always in, then
    never-driver-checked queries in registry order, then
    least-recently-checked — so coverage converges and keeps cycling."""
    import __spark_entry__ as e

    registry = list(QUERIES)
    # real repo history: window is full and sentinels lead
    w = list(e.queries())[:50]
    assert len(w) == 50 and w[: len(e._SENTINELS)] == [
        s for s in e._SENTINELS if s in registry
    ]
    # the oracle dict leads with the same window (minus rows-only names)
    in_window_oracled = [n for n in w if n in ORACLES]
    assert list(e.oracle_sql())[: len(in_window_oracled)] == in_window_oracled
    # synthetic history: unseen names outrank stale ones, stale
    # outrank fresh
    names = [f"q{i:03d}" for i in range(60)]
    last = {n: 1 for n in names[:30]} | {n: 2 for n in names[30:55]}
    # names[55:] never checked
    w2 = e._build_window(names, last=dict(last))
    sent = [s for s in e._SENTINELS if s in names]  # none
    assert sent == []
    assert w2[:5] == names[55:60]  # never-checked first
    assert w2[5:35] == names[:30]  # round-1 (stalest) next
    assert w2[35:50] == names[30:45]  # then round-2, registry order


def test_failed_driver_rows_stay_priority(tmp_path):
    """A hash-mismatch/error row must NOT count as driver-checked, so
    the fixed query re-enters the window immediately next round."""
    import json

    import __spark_entry__ as e

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "good": {"hash_match": True, "err": None},
        "rows_only": {"hash_match": None, "err": "no_oracle"},
        "broken": {"hash_match": False, "err": None},
        "crashed": {"hash_match": None, "err": "SomeException"},
    }))
    last = e._last_checked_round(str(tmp_path))
    assert last == {"good": 1, "rows_only": 1}
    # window priority: never/failed-checked ahead of the green ones
    w = e._build_window(["good", "rows_only", "broken", "crashed"], last=last)
    assert w[:2] == ["broken", "crashed"]
