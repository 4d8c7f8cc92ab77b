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

from .csv import CORRUPT_COL, _reject_pinned_options, append_corrupt_field


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> DataFrame:
    """Typed JSON-lines scan with a corrupt-record capture column."""
    _reject_pinned_options(options, "read_jsonl")
    return (
        spark.read.schema(append_corrupt_field(schema))
        .options(
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=CORRUPT_COL,
            **options,
        )
        .json(path)
    )
