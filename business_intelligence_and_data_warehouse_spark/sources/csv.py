"""Declared-schema CSV ingest (reference operator S1: Kettle CsvInput
with explicit per-column name/type/format, e.g. `ETL/etl for customer
with scd2.ktr:635`).

Principles carried over:
* schemas are DECLARED, never inferred (no `inferSchema` double pass —
  at 100 TB an inference pass is a full extra scan);
* malformed rows are quarantined, not dropped silently (PERMISSIVE mode
  + `columnNameOfCorruptRecord`, the Spark-native version of the
  reference's error-row channel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    encoding: str = "UTF-8",
    **options: str,
) -> DataFrame:
    """Typed CSV scan with a corrupt-record capture column appended."""
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    return (
        spark.read.schema(full_schema)
        .options(
            header=str(header).lower(),
            encoding=encoding,
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=CORRUPT_COL,
            **options,
        )
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) split. Spark requires the corrupt column to be
    referenced through a materialized plan, hence the persist — pinned
    through the cache ledger so the blocks release at the next registry
    query instead of leaking for the session."""
    from ..operators.caching import pin

    df = pin(df)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
