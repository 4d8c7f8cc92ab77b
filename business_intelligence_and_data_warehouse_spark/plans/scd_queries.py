"""Driver-checkable SCD operator queries.

The generic SCD operators (operators/scd.py) are exercised with
DETERMINISTIC change batches derived from the customer table (key-modulo
rules), so the DuckDB oracle can state the expected post-merge dimension
directly with CASE/UNION — while the Spark side runs the real generic
operator. Any divergence in merge semantics (close dates, versioning,
new-key handling, window compression) breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd import (
    scd1_upsert,
    scd2_asof_lookup,
    scd2_initial_load,
    scd2_merge,
    scd2_rebuild_from_snapshots,
    scd2_snapshot_diff as scd2_dim_diff,
)
from ..sources.testdata import load_table
from .queries import query_fn

# Synthetic "brand-new" keys are real keys shifted by +1_000_000. That
# is collision-free only while max(c_custkey) < 1_000_000 (~SF 7 for
# TPC-H-ish customer); beyond that the shifted keys would alias real
# ones and the merge would silently diverge from the oracle's closed
# form. The guard below fails the job loudly instead, with no extra
# driver-side action (raise_error evaluates inside the scan).
_NEW_KEY_OFFSET = 1_000_000


def _offset_key(col: str = "c_custkey"):
    return F.when(
        F.col(col) < F.lit(_NEW_KEY_OFFSET), F.col(col) + F.lit(_NEW_KEY_OFFSET)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "scd_queries: synthetic-key offset collision — "
                    f"{col}="
                ),
                F.col(col).cast("string"),
                F.lit(
                    f" >= {_NEW_KEY_OFFSET}; regenerate the batch with a "
                    "larger offset for this scale factor"
                ),
            )
        ).cast("long")
    )


# ---------------------------------------------------------------------------
# SCD1: last-wins upsert (reference InsertUpdate on dim_location)
# ---------------------------------------------------------------------------

@query_fn(
    "scd1_last_wins",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_custkey % 4 = 0 THEN c_mktsegment || '_V2'
            ELSE c_mktsegment END AS c_mktsegment
FROM customer
ORDER BY c_custkey
""",
)
def scd1_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a modified extract over the base dimension; incoming wins."""
    customer = load_table(spark, sf_dir, "customer")
    existing = customer.select("c_custkey", "c_mktsegment")
    incoming = (
        customer.filter(F.col("c_custkey") % 4 == 0)
        .select(
            "c_custkey",
            F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("c_mktsegment"),
        )
    )
    return scd1_upsert(existing, incoming, ["c_custkey"]).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# SCD2 merge: one incremental load over an initial dimension
# ---------------------------------------------------------------------------

_LOAD = "2020-06-01"


@query_fn(
    "scd2_merge_batch",
    oracle=f"""
-- expected dimension after merging a batch where keys %5==0 changed
-- segment and keys %100==0 arrive as brand-new (+1000000) keys
SELECT c_custkey, c_mktsegment,
       DATE '2016-01-01' AS effective_from,
       CASE WHEN c_custkey % 5 = 0 THEN DATE '{_LOAD}'
            ELSE DATE '2099-12-31' END AS effective_to,
       1 AS version
FROM customer
UNION ALL
SELECT c_custkey, 'SEG_CHANGED' AS c_mktsegment,
       DATE '{_LOAD}', DATE '2099-12-31', 2
FROM customer WHERE c_custkey % 5 = 0
UNION ALL
SELECT c_custkey + 1000000, c_mktsegment,
       DATE '{_LOAD}', DATE '2099-12-31', 1
FROM customer WHERE c_custkey % 100 = 0
ORDER BY c_custkey, version
""",
)
def scd2_merge_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial load + one SCD2 merge (changed keys close + version 2;
    new keys enter at version 1)."""
    customer = load_table(spark, sf_dir, "customer")
    base = customer.select("c_custkey", "c_mktsegment")
    dim = scd2_initial_load(base, "2016-01-01")
    changed = customer.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey", F.lit("SEG_CHANGED").alias("c_mktsegment")
    )
    unchanged = customer.filter(F.col("c_custkey") % 5 != 0).select(
        "c_custkey", "c_mktsegment"
    )
    new_keys = customer.filter(F.col("c_custkey") % 100 == 0).select(
        _offset_key().alias("c_custkey"), "c_mktsegment"
    )
    batch = unchanged.unionByName(changed).unionByName(new_keys)
    merged = scd2_merge(dim, batch, ["c_custkey"], ["c_mktsegment"], _LOAD)
    # cast version for engine parity (oracle literal ints are INTEGER)
    return merged.withColumn("version", F.col("version").cast("int")).orderBy(
        "c_custkey", "version"
    )


# ---------------------------------------------------------------------------
# SCD2 as-of lookup: validity-window key resolution for fact loads
# ---------------------------------------------------------------------------

_SPLIT = "1998-06-01"

_ORACLE_DIM2 = f"""
  SELECT c_custkey, c_mktsegment, DATE '1990-01-01' AS effective_from,
         CASE WHEN c_custkey % 3 = 0 THEN DATE '{_SPLIT}'
              ELSE DATE '2099-12-31' END AS effective_to,
         1 AS version
  FROM customer
  UNION ALL
  SELECT c_custkey, 'MOVED', DATE '{_SPLIT}', DATE '2099-12-31', 2
  FROM customer WHERE c_custkey % 3 = 0
"""


@query_fn(
    "scd2_asof_lookup",
    oracle=f"""
WITH dim AS ({_ORACLE_DIM2})
SELECT o.o_orderkey AS order_id,
       CAST(o.o_orderdate AS DATE) AS order_date,
       o.o_custkey AS customer_id,
       d.c_mktsegment AS segment,
       CAST(d.version AS INTEGER) AS version
FROM orders o
LEFT JOIN dim d
  ON d.c_custkey = o.o_custkey
 AND CAST(o.o_orderdate AS DATE) >= d.effective_from
 AND CAST(o.o_orderdate AS DATE) <  d.effective_to
ORDER BY order_id
""",
)
def scd2_asof_lookup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve each order against the dimension version valid at order
    date (as-of/interval join; SURVEY §2.3-J non-equi form)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    v1 = customer.select(
        "c_custkey",
        "c_mktsegment",
        F.to_date(F.lit("1990-01-01")).alias("effective_from"),
        F.when(
            F.col("c_custkey") % 3 == 0, F.to_date(F.lit(_SPLIT))
        ).otherwise(F.to_date(F.lit("2099-12-31"))).alias("effective_to"),
        F.lit(1).cast("int").alias("version"),
    )
    v2 = customer.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        F.to_date(F.lit(_SPLIT)).alias("effective_from"),
        F.to_date(F.lit("2099-12-31")).alias("effective_to"),
        F.lit(2).cast("int").alias("version"),
    )
    dim = v1.unionByName(v2)
    facts = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.to_date("o_orderdate").alias("order_date"),
        F.col("o_custkey").alias("c_custkey"),
    )
    out = scd2_asof_lookup(
        facts, dim, ["c_custkey"], "order_date", ["c_mktsegment", "version"]
    )
    return out.select(
        "order_id",
        "order_date",
        F.col("c_custkey").alias("customer_id"),
        F.col("c_mktsegment").alias("segment"),
        "version",
    ).orderBy("order_id")


# ---------------------------------------------------------------------------
# SCD2 rebuild from snapshots: window-function bootstrap of a dimension
# ---------------------------------------------------------------------------

@query_fn(
    "scd2_rebuild_snapshots",
    oracle="""
-- three yearly snapshots; keys %7==0 change segment in the 1997 snapshot
SELECT c_custkey, c_mktsegment,
       DATE '1990-01-01' AS effective_from,
       CASE WHEN c_custkey % 7 = 0 THEN DATE '1997-01-01'
            ELSE DATE '2099-12-31' END AS effective_to,
       1 AS version
FROM customer
UNION ALL
SELECT c_custkey, c_mktsegment || '_X',
       DATE '1997-01-01', DATE '2099-12-31', 2
FROM customer WHERE c_custkey % 7 = 0
ORDER BY c_custkey, version
""",
)
def scd2_rebuild_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compress periodic snapshots into SCD2 validity windows."""
    customer = load_table(spark, sf_dir, "customer")

    def snap(date: str, mutate: bool) -> DataFrame:
        seg = (
            F.when(
                F.col("c_custkey") % 7 == 0,
                F.concat(F.col("c_mktsegment"), F.lit("_X")),
            ).otherwise(F.col("c_mktsegment"))
            if mutate
            else F.col("c_mktsegment")
        )
        return customer.select(
            "c_custkey",
            seg.alias("c_mktsegment"),
            F.to_date(F.lit(date)).alias("snapshot_date"),
        )

    snapshots = (
        snap("1996-01-01", False)
        .unionByName(snap("1997-01-01", True))
        .unionByName(snap("1998-01-01", True))
    )
    dim = scd2_rebuild_from_snapshots(
        snapshots,
        ["c_custkey"],
        ["c_mktsegment"],
        "snapshot_date",
        initial_from="1990-01-01",
    )
    return dim.withColumn("version", F.col("version").cast("int")).orderBy(
        "c_custkey", "version"
    )


# ---------------------------------------------------------------------------
# SCD2 snapshot diff: what changed in the dimension between two dates
# ---------------------------------------------------------------------------

_DIFF_A = "2016-06-01"  # after the initial load, before _LOAD
_DIFF_B = "2020-07-01"  # after the _LOAD merge


@query_fn(
    "scd2_snapshot_diff",
    oracle=f"""
-- closed form of the dimension built by scd2_merge_batch: between
-- {_DIFF_A} and {_DIFF_B} keys %5==0 changed segment and keys %100==0
-- entered as brand-new (+1000000) keys; SCD2 never deletes, so the
-- 'removed' branch is structurally empty here (kept for API parity)
SELECT c_custkey, 'changed' AS change_type,
       c_mktsegment AS old_segment,
       'SEG_CHANGED' AS new_segment
FROM customer WHERE c_custkey % 5 = 0
UNION ALL
SELECT c_custkey + 1000000, 'added', CAST(NULL AS VARCHAR), c_mktsegment
FROM customer WHERE c_custkey % 100 = 0
ORDER BY c_custkey
""",
)
def scd2_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit diff of the SCD2 dimension between two as-of dates —
    the warehouse-ops question "what changed in this dimension since
    the last audit?" answered from the dimension alone via the
    generic `operators/scd.scd2_snapshot_diff` classifier, run on the
    REAL merged dimension (`scd2_initial_load` + `scd2_merge`) so the
    oracle's closed form cross-checks the merge machinery end-to-end.
    The `removed` branch is structurally empty here (merges never
    delete); `tests/test_scd.py` exercises it on a dimension with a
    closed-out key."""
    customer = load_table(spark, sf_dir, "customer")
    base = customer.select("c_custkey", "c_mktsegment")
    dim = scd2_initial_load(base, "2016-01-01")
    changed = customer.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey", F.lit("SEG_CHANGED").alias("c_mktsegment")
    )
    unchanged = customer.filter(F.col("c_custkey") % 5 != 0).select(
        "c_custkey", "c_mktsegment"
    )
    new_keys = customer.filter(F.col("c_custkey") % 100 == 0).select(
        _offset_key().alias("c_custkey"), "c_mktsegment"
    )
    batch = unchanged.unionByName(changed).unionByName(new_keys)
    merged = scd2_merge(dim, batch, ["c_custkey"], ["c_mktsegment"], _LOAD)
    diff = scd2_dim_diff(
        merged, _DIFF_A, _DIFF_B, ["c_custkey"], ["c_mktsegment"]
    )
    return diff.select(
        "c_custkey",
        "change_type",
        F.col("old_c_mktsegment").alias("old_segment"),
        F.col("new_c_mktsegment").alias("new_segment"),
    ).orderBy("c_custkey")
