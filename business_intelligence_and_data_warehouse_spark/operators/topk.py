"""Bounded-state per-group top-k.

Reference parity: the reference takes global top-k only
(`TASK 2A SQL Analytical Queries.sql` 5A LIMIT 20; pandas
``sort_values().head()``). Per-group top-k is the missing general
form (top customers per nation, top documents per query, top
neighbors per probe) and is everywhere in the extension surface.

Scale design (100 TB): the window-function form
(``row_number() OVER (PARTITION BY g ORDER BY v) <= k``) shuffles and
SORTS every row of every group; state per key is the whole group.
This operator instead aggregates a k-bounded sorted buffer in two
phases: phase 1 groups on (group, salt) — the salt splits a group's
rows across ``salt_parts`` reducers so no single aggregation buffer
sees more than ~|group|/parts rows, and its per-bucket result is
already cut to k; phase 2 merges ``salt_parts`` k-buffers per group
(≤ parts·k rows each — bounded, skew-immune) and re-cuts to k. Both
aggregates partial-combine map-side, so the exchange carries k-row
buffers, not groups.

Determinism: ordering is (order column desc, tie column asc) encoded
as an ascending struct sort — ties never depend on layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    tie_col: str,
    k: int,
    payload_cols: list[str] | None = None,
    salt_parts: int = 16,
) -> DataFrame:
    """Top ``k`` rows per group by ``order_col`` DESC (ties broken by
    ``tie_col`` ASC), with a 1-based ``rank`` column.

    ``order_col`` must be numeric (it is negated to express DESC via
    an ascending struct sort — exact for integral/decimal types).
    NULL order values rank LAST (after every non-null, ties by
    ``tie_col``) — the same placement as the window form's
    ``ORDER BY order_col DESC`` (Spark desc = NULLS LAST), so the two
    forms are interchangeable even on null-bearing measures; a bare
    negated-struct sort would have put NULLs FIRST and let them evict
    real top-k rows.

    CONTRACT on ties and payloads: the k-buffer struct sort compares
    payload columns AFTER the tie field, so (a) every payload type
    must be orderable (no maps), and (b) ``tie_col`` must be UNIQUE
    within each group — otherwise which tied row ranks first depends
    on payload values, which the window form (that stops comparing at
    ``tie_col``) does not reproduce.  Callers here key ties on a
    primary key; pass a unique tie column or accept the divergence.
    """
    payload_cols = payload_cols or []
    item = F.struct(
        F.col(order_col).isNull().alias("_isnull"),  # false < true
        F.coalesce(-F.col(order_col), F.lit(0)).alias("_neg"),
        F.col(tie_col).alias("_tie"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    salt = F.pmod(F.hash(F.col(tie_col)), F.lit(salt_parts))
    partial = (
        df.groupBy(*group_cols, salt.alias("_salt"))
        .agg(
            F.slice(F.sort_array(F.collect_list(item)), 1, k).alias("_buf")
        )
    )
    merged = (
        partial.select(*group_cols, F.explode("_buf").alias("_it"))
        .groupBy(*group_cols)
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.col("_it"))), 1, k
            ).alias("_top")
        )
    )
    return merged.select(
        *group_cols, F.posexplode("_top").alias("_pos", "_it")
    ).select(
        *group_cols,
        (F.col("_pos") + 1).alias("rank"),
        F.when(F.col("_it._isnull"), F.lit(None))
        .otherwise(-F.col("_it._neg"))
        .alias(order_col),
        F.col("_it._tie").alias(tie_col),
        *[F.col(f"_it.{c}").alias(c) for c in payload_cols],
    )
