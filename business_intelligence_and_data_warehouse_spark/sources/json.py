"""Declared-schema JSON-lines ingest.

The reference ingests only CSV (operator S1, `ETL/*.ktr` CsvInput
steps); JSONL is the equivalent source for event/log-shaped data and
follows the same principles as `sources/csv.py`:

* schemas are DECLARED, never inferred — at 100 TB a `spark.read.json`
  schema-inference pass is a full extra scan of the data;
* malformed records are quarantined, not silently nulled or dropped
  (PERMISSIVE + `columnNameOfCorruptRecord`, the Spark-native version
  of the reference's error-row channel,
  `ETL/etl for customer with scd2.ktr:779-832`).

`split_corrupt` from `sources.csv` works on the result unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .csv import CORRUPT_COL


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> DataFrame:
    """Typed JSON-lines scan with a corrupt-record capture column."""
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    return (
        spark.read.schema(full_schema)
        .options(
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=CORRUPT_COL,
            **options,
        )
        .json(path)
    )
