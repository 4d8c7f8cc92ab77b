"""Salting must move rows, never change results."""

from __future__ import annotations

from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.operators.skew import (
    salted_agg,
    salted_broadcast_left,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_agg_equals_plain_groupby(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("k"),  # 3 hot keys
        (F.col("id") * 7 % 100).alias("v"),
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"),
        F.sum(F.lit(1)).alias("n"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    salted = salted_agg(
        df,
        keys=["k"],
        aggs={
            "s": F.sum("v"),
            "n": F.sum(F.lit(1)),
            "mn": F.min("v"),
            "mx": F.max("v"),
        },
        merges={"mn": "min", "mx": "max"},
        salt_buckets=8,
    )
    cols = ["k", "s", "n", "mn", "mx"]
    assert _rows(salted, *cols) == _rows(plain, *cols)


def test_salted_broadcast_join_equals_plain_join(spark):
    big = spark.range(0, 2000).select(
        (F.col("id") % 4).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "d"), (9, "unmatched")], "k long, tag string"
    )
    plain = big.join(small, ["k"], "inner")
    salted = salted_broadcast_left(big, small, ["k"], salt_buckets=4)
    cols = ["k", "payload", "tag"]
    assert _rows(salted, *cols) == _rows(plain, *cols)
    assert salted.count() == 2000
