"""Property tests for the shared exact-percentile helper (dpctl):
Spark and DuckDB must agree bit-for-bit after the decimal snap, the
value must interpolate like numpy, and it must sit inside the
percentile_approx error envelope."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.functions.parity import (
    dpctl,
    o_dpctl,
)

CASES = [
    # (seed, n, scale) — mix of sizes incl. tiny lists where
    # interpolation endpoints matter
    (1, 7, 100.0),
    (2, 100, 1.0),
    (3, 1001, 25000.0),
    (4, 2, 0.5),
]
PS = [0.05, 0.25, 0.5, 0.75, 0.95]


def _values(seed, n, scale):
    rng = np.random.default_rng(seed)
    # 4-decimal "money" values: exactly representable post-snap
    return np.round(rng.uniform(0, scale, n), 4)


@pytest.mark.parametrize("seed,n,scale", CASES)
def test_dpctl_matches_duckdb_and_numpy(spark, seed, n, scale):
    import duckdb

    vals = _values(seed, n, scale)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = df.agg(*[dpctl("x", p).alias(f"p{i}") for i, p in enumerate(PS)]).first()

    con = duckdb.connect()
    con.register("tv", pd.DataFrame({"x": vals}))
    dd = con.execute(
        "SELECT " + ", ".join(o_dpctl("x", p) for p in PS) + " FROM tv"
    ).fetchone()

    for i, p in enumerate(PS):
        spark_v = got[f"p{i}"]
        # bit-identical cross-engine after the snap
        assert spark_v == dd[i], (p, spark_v, dd[i])
        # linear interpolation semantics == numpy
        np_v = float(np.percentile(vals, p * 100, method="linear"))
        assert abs(spark_v - np_v) <= 1e-6 * max(1.0, abs(np_v)) + 1e-6
        # within the data range
        assert vals.min() - 1e-6 <= spark_v <= vals.max() + 1e-6


def test_dpctl_within_percentile_approx_bounds(spark):
    # percentile_approx(accuracy=a) guarantees rank error <= n/a; the
    # exact value must fall between the approx values at p +/- n/a.
    vals = _values(5, 5000, 1000.0)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    acc = 100
    eps = 1.0 / acc
    row = df.agg(
        dpctl("x", 0.5).alias("exact"),
        F.expr(f"percentile_approx(x, {0.5 - 2 * eps}, {acc})").alias("lo"),
        F.expr(f"percentile_approx(x, {min(0.5 + 2 * eps, 1.0)}, {acc})").alias("hi"),
    ).first()
    assert row.lo <= row.exact <= row.hi
