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


def append_corrupt_field(schema: T.StructType) -> T.StructType:
    """``schema`` + the corrupt-record capture column — the ONE place
    the quarantine schema is built (csv and jsonl ingest share it)."""
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


# Options the ingest functions PIN — the quarantine contract depends on
# them, so a caller passing their own gets a clear error instead of a
# TypeError from duplicated keyword arguments (r10 review finding).
_PINNED_OPTIONS = ("mode", "columnNameOfCorruptRecord")


def _reject_pinned_options(options: dict, who: str) -> None:
    clash = [k for k in _PINNED_OPTIONS if k in options]
    if clash:
        raise ValueError(
            f"{who} pins {clash} (PERMISSIVE quarantine into "
            f"{CORRUPT_COL!r} is its contract); use spark.read directly "
            "for FAILFAST/DROPMALFORMED ingest"
        )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    encoding: str = "UTF-8",
    **options: str,
) -> DataFrame:
    """Typed CSV scan with a corrupt-record capture column appended."""
    _reject_pinned_options(options, "read_csv")
    return (
        spark.read.schema(append_corrupt_field(schema))
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
    """(clean, corrupt) split off one eager local checkpoint.

    The materialization is a CORRECTNESS requirement, not a cache:
    Spark's PERMISSIVE corrupt capture only detects errors in columns
    the recomputed plan actually parses, so if the underlying scan were
    ever re-executed with pruned columns the corrupt row set would
    silently CHANGE (a clean re-read of only ``id`` never sees the bad
    ``amount``), and a corrupt-only consumer would hit
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN.  That is
    exactly what routing this through the auto-releasing pin ledger
    did: release_pinned at the next query boundary un-persisted the
    split while the returned handles were still live (r10 review
    finding, repro'd).  ``localCheckpoint(eager=True)`` truncates the
    lineage instead — the handles can never recompute the scan, at any
    later time, and the blocks are reclaimed when the DataFrames are
    garbage-collected.  (On a cluster, executor loss invalidates local
    checkpoints; quarantine splits feeding long-lived downstream jobs
    should write the two channels out promptly — which the ETL layer's
    quarantine sink does.)"""
    df = df.localCheckpoint(eager=True)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
