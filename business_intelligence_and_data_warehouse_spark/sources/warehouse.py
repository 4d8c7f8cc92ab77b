"""Warehouse-layer table management: partitioned + bucketed storage.

The reference's physical tuning is B-tree indexes and batched JDBC
inserts (SURVEY §4); the Spark-native equivalents are:

* partitionBy(date-ish column)  -> partition pruning on scan
* bucketBy(N, join key)         -> co-located joins: two tables
  bucketed on the same key join WITHOUT a shuffle exchange — the
  difference between an O(data) network step and none at 100 TB.

Delta/Iceberg are the production table formats for this layer
(ACID + MERGE + Z-order); their jars are not in this environment, so
tables use the session catalog's parquet with an import-guarded Delta
hook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table (hash-partitioned files +
    bucket metadata in the catalog, so later equi-joins/aggregations on
    `bucket_col` skip the shuffle)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def delta_available(spark: SparkSession) -> bool:
    """True when the Delta Lake runtime is on the classpath (not in this
    environment; warehouse writes fall back to parquet tables)."""
    try:
        # py4j resolves missing packages lazily, so force a class load
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    table: str,
    partition_cols: tuple[str, ...] = (),
    fmt: str | None = None,
) -> None:
    """Warehouse table write: Delta when available, else parquet."""
    if fmt is None:
        fmt = "delta" if delta_available(df.sparkSession) else "parquet"
    writer = df.write.format(fmt).mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.saveAsTable(table)


def write_orc(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """ORC sink (native in Spark, no extra jar): the columnar
    alternative where the surrounding lake is Hive/ORC-based. Same
    partition-pruning behavior as the parquet sink."""
    w = df.write.mode("overwrite").format("orc")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.save(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — pushdown/pruning work as with parquet (both formats
    carry column statistics the reader exploits)."""
    return spark.read.format("orc").load(path)
