"""Physical-design registry queries: the warehouse layer's bucketed
co-located join as a driver-checkable query.

The reference tunes physical access with B-tree indexes and batched
JDBC loads (`Database/Database Creation.sql`, SURVEY §4); the
Spark-native equivalent for its fact⋈fact joins is bucketing
(`sources/warehouse.py`): both fact tables hash-clustered into the
same number of buckets on the join key so the join runs WITHOUT a
shuffle exchange on either side. At 100 TB that is the difference
between re-shuffling two fact tables over the network on every load
and none — the bucketed layout is written once and every downstream
equi-join or aggregation on the key reuses it.

`tests/test_plans.py::test_bucketed_join_plan_is_shuffle_free` pins
the plan property (no `Exchange hashpartitioning` on the join keys);
`tests/test_warehouse.py` covers the operator API directly.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, DataFrameWriter, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .queries import REVENUE, _rev, dsum, o_dsum, query_fn

_N_BUCKETS = 8

_LAYOUT_PARENT: str | None = None


def _layout_dir(spark: SparkSession, table: str) -> str:
    """Per-process AND per-SparkContext external-table location.

    A shared fixed path would let two concurrent processes on the same
    sf_dir race (the second's rmtree+rewrite yanks files out from under
    the first's live scan — the aliasing hazard
    streaming_queries._fresh_result_dir documents). Keying the subdir
    by applicationId closes the same hazard WITHIN a process: a
    stop/restart cycle gets a fresh application id and therefore a
    fresh dir, so its rewrite can never unlink files a prior session's
    still-live lazy DataFrame is scanning. Sibling `newSession()`s
    share both the appId and the catalog, so their `tableExists` guard
    stays consistent. The parent is removed at interpreter exit so
    layouts don't leak across runs."""
    global _LAYOUT_PARENT
    if _LAYOUT_PARENT is None:
        _LAYOUT_PARENT = tempfile.mkdtemp(prefix="bidw_warehouse_")
        atexit.register(shutil.rmtree, _LAYOUT_PARENT, ignore_errors=True)
    return os.path.join(
        _LAYOUT_PARENT, spark.sparkContext.applicationId, table
    )


def _replace_external_table(
    spark: SparkSession,
    table: str,
    writer: DataFrameWriter,
) -> None:
    """(Re)create an external table at its per-process location.

    The catalog is per-session but a location outlives it, so the
    table name AND any stale dir must both be cleared before
    saveAsTable (a stale dir alone raises LOCATION_ALREADY_EXISTS).
    Shared by the bucketed and partitioned layout writers so the
    stale-location handling cannot diverge between them.
    """
    path = _layout_dir(spark, table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(path, ignore_errors=True)
    writer.option("path", path).saveAsTable(table)


def _bucketed_fact_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Write (once per sf_dir per session) and read back the two fact
    tables bucketed on the order key.

    Table names carry an sf_dir tag so different scale factors in one
    session never read each other's layout. The write is the one-time
    layout cost the bucketing strategy amortizes across every later
    co-located join.
    """
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    li_name, ord_name = f"wb_lineitem_{tag}", f"wb_orders_{tag}"
    if not spark.catalog.tableExists(li_name):
        lineitem = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        _replace_external_table(
            spark,
            li_name,
            lineitem.write.mode("overwrite").bucketBy(
                _N_BUCKETS, "l_orderkey"
            ),
        )
    if not spark.catalog.tableExists(ord_name):
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        )
        _replace_external_table(
            spark,
            ord_name,
            orders.write.mode("overwrite").bucketBy(_N_BUCKETS, "o_orderkey"),
        )
    return spark.table(li_name), spark.table(ord_name)


_PRUNE_YEARS = (1996, 1997)


@query_fn(
    "warehouse_partition_prune",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(month(o_orderdate) AS INTEGER) AS o_month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM orders
WHERE year(o_orderdate) IN {_PRUNE_YEARS}
GROUP BY 1, 2
ORDER BY o_year, o_month
""",
)
def warehouse_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order totals off the DATE-PARTITIONED fact layout,
    filtered to two years: the scan must prune to those partitions'
    directories (PartitionFilters in the plan — gated in
    tests/test_plans.py), reading 2/N of the data instead of all of
    it.  partitionBy(year) is the standard warehouse layout for a
    100 TB time-series fact: every dashboard/report query carries a
    date predicate, and partition pruning turns it into IO savings
    BEFORE any row is read (coarser than parquet row-group stats,
    which still require opening every file's footer).
    """
    od = _partitioned_orders(spark, sf_dir)
    return (
        od.filter(F.col("o_year").isin(*_PRUNE_YEARS))
        .groupBy(
            F.col("o_year").cast("int").alias("o_year"),
            F.month("o_orderdate").cast("int").alias("o_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_year", "o_month")
    )


def _partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write (once per sf_dir per session) and read back orders
    partitioned by order year — the pruning twin of
    :func:`_bucketed_fact_tables`."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    name = f"wp_orders_{tag}"
    if not spark.catalog.tableExists(name):
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderdate",
            "o_totalprice",
            F.year("o_orderdate").alias("o_year"),
        )
        _replace_external_table(
            spark, name, orders.write.mode("overwrite").partitionBy("o_year")
        )
    return spark.table(name)


@query_fn(
    "warehouse_bucketed_join",
    oracle=f"""
SELECT o_orderpriority AS order_priority,
       CAST(year(o_orderdate) AS INTEGER) AS year,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {o_dsum(REVENUE)} AS revenue
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1, 2
ORDER BY order_priority, year
""",
)
def warehouse_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority × year off the BUCKETED fact layout.

    The `merge` hint keeps the join a sort-merge join at every scale
    factor (at sf0.01 Catalyst would otherwise broadcast the orders
    side and never exercise the bucketed path); because both tables
    are bucketed `_N_BUCKETS`-ways on the key, the SMJ reads the
    buckets directly — the plan's only exchanges are the small
    post-aggregation and final-sort ones.
    """
    li, od = _bucketed_fact_tables(spark, sf_dir)
    return (
        li.hint("merge")
        .join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("order_priority"),
            F.year("o_orderdate").cast("int").alias("year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(_rev()).alias("revenue"),
        )
        .orderBy("order_priority", "year")
    )
