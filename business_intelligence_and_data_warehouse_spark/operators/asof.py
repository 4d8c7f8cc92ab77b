"""Backward as-of join and bounded lookback-window join: temporal
joins Spark lacks as operators, decomposed into shuffle-friendly plans.

`asof_join_backward`: attach to each left row the most recent right
row (same key, right_ts <= left_ts).

Spark has no ASOF JOIN operator (DuckDB/QuestDB/kdb do), but the
semantics decompose into a plan Spark executes WITHOUT any range or
nested-loop join: union both sides tagged, sort within key by
(ts, side, tiebreak), and carry the last right payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding running
window. One shuffle on the key, linear in |left| + |right| — the
standard merge-based as-of plan, expressed declaratively.

Determinism: several right rows can share (key, ts). Callers must
pre-dedupe the right side to one row per (key, ts) (e.g. keep the max
tiebreak id); the right side sorts BEFORE the left at equal ts (so an
equal-timestamp right row IS visible, matching the <= bound), and the
remaining order ties on the id column.

Scale notes: state per key is one payload struct (the running last),
so skewed keys cost sort time, not memory; at 100 TB the union sorts
within hash partitions of the key — no global sort, no broadcast of
either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    payload_cols: list[str],
    left_id: str,
) -> DataFrame:
    """(left_id, key, ts, asof_<payload>...) — one row per left row,
    with the matched right payload (NULL when no right row precedes).

    `right` must be unique per (key, ts_col); `left_id` orders ties
    among equal-timestamp left rows (output determinism only).
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    # _lid keeps the LEFT id column's own type (it only needs to be
    # orderable) — casting to long would silently NULL string/UUID ids
    # and destroy both the output ids and the tie order.
    lid_type = left.schema[left_id].dataType
    r = right.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("side"),
        F.lit(None).cast(lid_type).alias("_lid"),
        payload.alias("_pay"),
    )
    l = left.select(
        F.col(key),
        F.col(ts_col),
        F.lit(1).alias("side"),
        F.col(left_id).alias("_lid"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
    )
    w = (
        W.partitionBy(key)
        .orderBy(ts_col, "side", "_lid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "_match", F.last("_pay", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("side") == 1).select(
        F.col("_lid").alias(left_id),
        F.col(key),
        F.col(ts_col),
        *[F.col("_match").getField(c).alias(f"asof_{c}") for c in payload_cols],
    )
    return out


def lookback_window_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback_seconds: int,
) -> DataFrame:
    """Candidate pairs (left row, right row) where both share ``key``
    and ``left_ts - lookback < right_ts <= left_ts``.

    A naive formulation — join on the equality key with the range as
    the only temporal predicate — is correct but unbounded: one hot
    key joins its full history against every probe.  This operator
    TILES time into buckets exactly ``lookback_seconds`` wide, so a
    right row can only match left rows in its own bucket or the next
    one.  The right side therefore emits exactly TWO (key, bucket)
    rows map-side, the join is a pure equality hash/sort-merge join on
    (key, bucket) — Catalyst never falls back to a nested-loop/range
    scan — and the exact interval predicate is applied as a post-join
    filter on candidates that are already bucket-local.

    Scale notes (100 TB): shuffle key is (key, time-bucket), so even a
    pathologically hot key spreads across the time axis — the skew
    bound per task is one key-bucket's traffic, not one key's history.
    Cost is linear: |right| x 2 emitted rows, candidates bounded by
    per-bucket density.  Suffixes: left columns keep their names,
    right payload columns arrive with ``r_`` prefix.
    """
    bucket = lambda c: F.floor(  # noqa: E731
        F.unix_timestamp(F.col(c)) / F.lit(int(lookback_seconds))
    )
    l = left.withColumn("_b", bucket(left_ts))
    r_base = right.select(
        F.col(key),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c != key
        ],
    ).withColumn("_rb", bucket(f"r_{right_ts}"))
    # a right row at bucket b can serve probes in buckets {b, b+1}
    r = r_base.withColumn(
        "_b", F.explode(F.array(F.col("_rb"), F.col("_rb") + 1))
    ).drop("_rb")
    pairs = l.join(r, [key, "_b"]).filter(
        (F.col(f"r_{right_ts}") <= F.col(left_ts))
        & (
            F.col(f"r_{right_ts}")
            > F.col(left_ts) - F.expr(f"interval {int(lookback_seconds)} seconds")
        )
    )
    return pairs.drop("_b")
