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
