"""Greedy sequence packing: concatenate documents into fixed-budget
training sequences (the "sample packing" pass of an LLM data
pipeline).

Semantics (per group, docs visited in ascending ``doc_id`` order):
keep a running fill; if adding the next document would exceed
``budget`` tokens and the current sequence is non-empty, close it and
start the next.  A single oversized document (> budget tokens) still
occupies its own sequence — packing never splits documents (chunking
is a separate pass, operators/corpus_quality.chunk_documents).

Why not pure SQL: greedy packing is a sequential recurrence — the bin
boundary RESETS the accumulator, so it is not a prefix-sum/floor-div
reshape (that variant, "quantized packing", overfills bins by up to
one document).  The recurrence is exactly the per-partition
imperative case the guide reserves for Arrow-batched
``applyInPandas``: token counts are computed JVM-side first, so only
(group, doc_id, n_tokens) — three narrow columns — cross the Arrow
boundary, never the text.

Scale design (100 TB):
* one shuffle on the group column; the Python stage is O(n) per group
  over a 3-column frame (~24 bytes/doc — a 1-billion-doc source is
  ~24 GB, too big for ONE group but fine sharded);
* ``shards > 1`` subdivides each group by a deterministic id hash
  (xxhash64 of ``id_col`` % shards) and packs each (group, shard)
  independently — full parallelism, bounded per-task state, at the
  cost of at most one underfilled sequence per shard.  Sequence ids
  are then unique per (group, shard) — globally qualified by both
  columns;
* determinism: the visit order inside a pack unit is ``doc_id`` ASC,
  independent of partitioning (the pandas group arrives whole and is
  sorted in-process).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StructField,
    StructType,
)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shards: int = 1,
) -> DataFrame:
    """(group, [shard,] doc_id, n_tokens, seq_id, seq_fill) — greedy
    first-fit-in-order packing of each group's documents into
    sequences of at most ``budget`` tokens.

    ``seq_fill`` is the running token count of the sequence AFTER
    placing the document (the last row of a sequence carries its
    final length).
    """
    if not 0 < int(budget) <= 2**31 - 1:
        # seq_fill/n_tokens are int32 columns; a larger budget would
        # silently wrap the fill counter instead of packing wide
        raise ValueError(f"budget must be in (0, 2^31): {budget}")
    if not (isinstance(shards, int) and shards >= 1):
        # shards=0/-4 would silently take the UNSHARDED path (the
        # unbounded per-task-state case the knob exists to prevent)
        # and a float would feed fractional buckets into pmod
        raise ValueError(f"shards must be an integer >= 1: {shards!r}")
    # group/id field types come from the input schema, not hardcoded —
    # an int source key or a string doc id must round-trip unchanged
    schema_fields = [
        StructField(group_col, docs.schema[group_col].dataType),
        StructField(id_col, docs.schema[id_col].dataType),
        StructField(tokens_col, IntegerType()),
        StructField("seq_id", IntegerType()),
        StructField("seq_fill", IntegerType()),
    ]
    keys = [group_col]
    # null token counts (e.g. size() of a null token array) would break
    # the pandas astype('int64'); treat them as zero-length documents
    slim = docs.select(
        group_col,
        id_col,
        F.coalesce(F.col(tokens_col).cast("int"), F.lit(0)).alias(tokens_col),
    )
    if shards > 1:
        from ..functions.hashing import hash_bucket

        slim = slim.withColumn("shard", hash_bucket([id_col], shards))
        keys = [group_col, "shard"]
        schema_fields.insert(1, StructField("shard", IntegerType()))
    schema = StructType(schema_fields)

    cap = int(budget)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # total order: (id, tokens) with a stable sort — with id ties
        # alone, pandas' unstable quicksort made the visit order (and
        # therefore every later seq_id) depend on shuffle arrival
        # (r10 review finding); duplicate (id, tokens) rows are
        # interchangeable, so this is fully deterministic
        pdf = pdf.sort_values(
            [id_col, tokens_col], kind="mergesort"
        ).reset_index(drop=True)
        seq_ids, fills = [], []
        seq, fill, in_seq = 0, 0, 0
        # .to_numpy().tolist(): plain ints, no per-element numpy boxing
        # on the operator's one Python-side hot loop
        for n in pdf[tokens_col].to_numpy().tolist():
            if n < 0:
                # a negative count would DECREASE the fill and emit an
                # overfilled sequence with no error — the one input
                # class the budget invariant cannot survive silently
                raise ValueError(
                    f"negative token count {n} (doc ordering key "
                    f"{pdf[id_col].iloc[len(seq_ids)]!r})"
                )
            # non-empty is tracked by DOC count, not fill: a
            # zero-token document still opens a sequence, matching
            # both the docstring contract and the recursive-CTE
            # oracle (which applies the boundary test to every
            # non-anchor row)
            if in_seq > 0 and fill + n > cap:
                seq += 1
                fill = 0
                in_seq = 0
            fill += n
            in_seq += 1
            seq_ids.append(seq)
            fills.append(fill)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int32")
        pdf["seq_fill"] = pd.Series(fills, dtype="int32")
        return pdf[[f.name for f in schema.fields]]

    return slim.groupBy(*keys).applyInPandas(_pack, schema)
