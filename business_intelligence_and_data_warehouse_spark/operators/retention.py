"""Tombstone-delete propagation (right-to-be-forgotten / retention
sweeps) across a foreign-key chain, with an audit trail.

Reference parity: the reference warehouse (`Database Creation/*.sql`)
declares the FK chain (customer → orders → order line facts) but has
no delete workflow; compliance deletes are a first-class warehouse
operation the extension surface owes (GDPR art. 17 erasure sweeps run
exactly this shape over a lakehouse).

Scale design (100 TB): the tombstone key set is small relative to the
facts (an erasure batch), so the ROOT table and any table carrying the
root key directly are pruned by a BROADCAST left join — map-side, no
fact shuffle. Tables one hop removed (line items keyed by order, not
customer) are pruned by the key set their parent actually lost; that
set is NOT always small at scale, and its join is the honest shuffle —
a Bloom filter over the deleted keys (operators/sketches.py) is the
standard runtime-filter to cut the shuffled volume when the deleted
fraction is low. Each table is MARKED once (left join sets a delete
flag), and both audit counts come out of ONE aggregate over the marked
scan — no separate before/deleted scans per table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def propagate_deletes(
    root: DataFrame,
    root_name: str,
    root_key: str,
    tombstones: DataFrame,
    children: list[tuple[str, DataFrame, str, str, str]],
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Delete ``tombstones`` (a 1-column DataFrame of root keys) from
    ``root`` and cascade through ``children``: a list of
    (name, df, parent_name, parent_key, child_key) entries, each
    pruned by its already-processed parent's deleted slice
    (``parent.parent_key`` matched against ``child.child_key``).

    Returns (cleaned tables by name, audit DataFrame with one row per
    table: table_name, rows_before, rows_deleted, rows_after).

    The deleted slice of each parent is what cascades — a child is
    pruned by the keys its parent actually lost, not by re-deriving
    the tombstone predicate per table. Internally each table carries
    a ``_del`` marker from one left join, so the cleaned slice, the
    cascade keys, and both audit counts all read the same marked
    lineage.
    """
    for name, df in [(root_name, root)] + [
        (name, df) for name, df, *_ in children
    ]:
        if "_del" in df.columns:
            raise ValueError(
                f"propagate_deletes: table {name!r} already has a '_del' "
                "column (reserved for the delete marker); rename it first"
            )
    ts = F.broadcast(
        tombstones.select(F.col(root_key))
        .distinct()
        .withColumn("_del", F.lit(1))
    )
    marked: dict[str, DataFrame] = {root_name: root.join(ts, root_key, "left")}
    order: list[str] = [root_name]
    for name, df, parent_name, parent_key, child_key in children:
        lost_keys = (
            marked[parent_name]
            .filter(F.col("_del").isNotNull())
            .select(F.col(parent_key).alias(child_key))
            .distinct()
            .withColumn("_del", F.lit(1))
        )
        marked[name] = df.join(lost_keys, child_key, "left")
        order.append(name)

    cleaned = {
        name: m.filter(F.col("_del").isNull()).drop("_del")
        for name, m in marked.items()
    }
    audits = [
        marked[name]
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("rows_before"),
            F.count("_del").alias("rows_deleted"),
        )
        .select(
            F.lit(name).alias("table_name"),
            "rows_before",
            "rows_deleted",
            (F.col("rows_before") - F.col("rows_deleted")).alias(
                "rows_after"
            ),
        )
        for name in order
    ]
    audit = audits[0]
    for a in audits[1:]:
        audit = audit.unionByName(a)
    return cleaned, audit
