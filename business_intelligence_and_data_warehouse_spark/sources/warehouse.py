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


def compact_parquet(
    spark: SparkSession,
    path: str,
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    target_files: int | None = None,
) -> tuple[int, int]:
    """Small-files compaction (the jar-free twin of Delta/Iceberg
    `OPTIMIZE`): rewrite a parquet directory into few large files,
    optionally range-clustered on ``sort_cols`` (the Z-order stand-in —
    range clustering on the dominant filter column gives parquet
    row-group min/max stats real skipping power).

    Streaming sinks and incremental loads accrete one-file-per-batch;
    at 100 TB a million 1 MB files turn every scan into a metadata
    storm (footer reads, task scheduling) long before data IO matters.
    Returns (files_before, files_after).

    The rewrite stages into a sibling temp dir and swaps it over the
    original only after success. The swap is TWO renames (old aside,
    staging in), not one atomic op: a concurrent reader can observe the
    dataset briefly missing, so run compaction in a maintenance window
    (Delta/Iceberg `OPTIMIZE` is the transactional answer at scale). A
    failed rewrite cleans its staging dir; a failure between the two
    renames restores the original directory before re-raising.
    """
    import os
    import shutil
    import uuid

    def _count_files(p: str) -> int:
        return sum(
            1
            for root, _, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    before = _count_files(path)
    df = spark.read.parquet(path)
    if sort_cols:
        n = target_files or max(1, before // 64)
        df = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    elif target_files:
        df = df.repartition(target_files)
    tmp = path.rstrip("/") + f"__compact_{uuid.uuid4().hex[:8]}"
    try:
        (
            df.write.mode("overwrite")
            .option("maxRecordsPerFile", max_records_per_file)
            .parquet(tmp)
        )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    old = path.rstrip("/") + f"__old_{uuid.uuid4().hex[:8]}"
    try:
        os.rename(path, old)
    except BaseException:
        # first rename failed (path yanked concurrently / parent-dir
        # perms): the staging copy is a full duplicate of the dataset —
        # clean it up before propagating
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.rename(tmp, path)
    except BaseException:
        # Put the original back so readers never see the path missing
        # longer than the failed instant.
        os.rename(old, path)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)
    return before, _count_files(path)
