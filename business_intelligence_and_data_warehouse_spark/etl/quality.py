"""Data-quality gates: validation filters + quarantine channel.

The reference routes rows failing NOT-NULL checks to an error CSV and
loads only the clean branch (`ETL/etl for customer with scd2.ktr:779-832`
+ `customer_upsert_errors.csv` sink); the warehouse DDL adds CHECK /
UNIQUE constraints (`Database/Database Creation.sql:11-12,35,98,120`).

Spark-first shape: one pass computes a `violations` array column from
declared rules; `filter(size == 0)` is the clean branch and
`filter(size > 0)` the quarantine branch. Catalyst collapses both
branches onto the same scan when written from one cached/linearized
DataFrame, and the rule expressions are all codegen'd — no UDFs.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_violations(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Append a `violations` array naming every failed rule.

    `rules` maps rule-name -> boolean Column that is True when the row
    PASSES. NULL predicate results count as failures (SQL three-valued
    logic would otherwise let NULLs slip through a `filter`).
    """
    checks = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in rules.items()
    ]
    return df.withColumn(
        "violations", F.array_compact(F.array(*checks))
    )


def split_quality(
    df: DataFrame, rules: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) pair; quarantined rows keep `violations`."""
    flagged = with_violations(df, rules)
    clean = flagged.filter(F.size("violations") == 0).drop("violations")
    bad = flagged.filter(F.size("violations") > 0)
    return clean, bad


def write_quarantine(bad: DataFrame, path: str) -> None:
    """Error-row sink (reference: TextFileOutput to errors CSV)."""
    bad.withColumn("violations", F.concat_ws(";", "violations")).write.mode(
        "overwrite"
    ).option("header", True).csv(path)
