"""Deterministic hash-bucket assignment — THE shared copy of the
``pmod(xxhash64(keys...), n)`` contract ("a key's bucket never moves"):
used by the bucketed snapshot store (streaming/sinks), sequence-packing
shards (operators/packing), and anywhere else that needs a stable,
partitioning-independent bucket.  Three independent re-implementations
of this expression had accumulated (r10 review finding); one copy means
the hash function or modulus semantics cannot drift between modules
that assume each other's assignments.

(operators/skew.py keeps its own SEEDED variant deliberately — salting
wants a different bucket assignment per run, the opposite contract.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket(key_cols: list[str], bucket_count: int) -> Column:
    """Stable bucket in [0, bucket_count) from the key columns —
    deterministic across batches, restarts, partitionings, and
    engines that share Spark's xxhash64."""
    return F.pmod(F.xxhash64(*key_cols), F.lit(bucket_count)).cast("int")
