"""foreachBatch sinks: the production path for streaming writes that
need transactional MERGE semantics Spark's built-in sinks don't offer.

`run_upsert_stream` drives a keyed last-state UPSERT: every
micro-batch merges into a snapshot table keeping, per key, the row
with the highest (order key).  The classic exactly-once recipe:

* the batch handler is IDEMPOTENT — a batch-id ledger records the
  last applied micro-batch, and a redelivered batch id is skipped
  outright (foreachBatch gives at-least-once delivery on restart;
  idempotence upgrades it to effectively-exactly-once);
* the merge itself is pure DataFrame logic (union + row_number keep
  latest), so replaying the SAME batch through the merge is also a
  no-op by construction — the ledger saves the re-read cost, not
  correctness;
* the snapshot swaps atomically: the merged table is staged to a new
  versioned directory first, the current-pointer file is updated
  last, so a crash mid-write never corrupts the readable snapshot.

Scale notes (100 TB): the parquet rewrite is O(|snapshot|) per batch
— the honest fallback. With Delta/Iceberg present, the handler body
becomes `DeltaTable.merge` (file-level pruning + transaction log,
O(|touched files|)); the import-guarded hook in sources/warehouse.py
is the seam. The merge shuffle is keyed on the upsert key — the
minimum any keyed merge needs.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def merge_last_state(
    current: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Union + keep the max-``order_col`` row per key (deterministic:
    callers pass an order column that is unique per key, e.g. a
    fixed-width ts||id string)."""
    merged = batch if current is None else current.unionByName(batch)
    w = W.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


class _SnapshotStore:
    """Versioned parquet snapshot with an atomic current-pointer."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _pointer(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def read(self) -> DataFrame | None:
        try:
            with open(self._pointer()) as fh:
                state = json.load(fh)
        except FileNotFoundError:
            return None
        return self.spark.read.parquet(state["path"])

    def last_batch_id(self) -> int:
        try:
            with open(self._pointer()) as fh:
                return int(json.load(fh)["batch_id"])
        except FileNotFoundError:
            return -1

    def commit(self, df: DataFrame, batch_id: int) -> None:
        path = os.path.join(self.root, f"v{batch_id}_{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(path)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"path": path, "batch_id": batch_id}, fh)
        os.replace(tmp, self._pointer())  # atomic pointer swap


def run_upsert_stream(
    stream_df: DataFrame,
    spark: SparkSession,
    key_cols: list[str],
    order_col: str,
    root: str,
) -> DataFrame:
    """Drive ``stream_df`` to completion through a foreachBatch
    last-state upsert into a snapshot store at ``root``; returns the
    final snapshot."""
    store = _SnapshotStore(spark, root)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= store.last_batch_id():
            return  # redelivered batch: idempotent skip
        merged = merge_last_state(store.read(), batch_df, key_cols, order_col)
        store.commit(merged, batch_id)

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option(
            "checkpointLocation",
            os.path.join(root, "_checkpoint"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    out = store.read()
    assert out is not None, "stream produced no batches"
    return out
