"""Session-scoped cache bookkeeping for multi-consumer intermediates.

Operators persist derived tables (minhash/simhash/LSH signatures,
shingle tables, grouping-detail levels, normed embedding corpora) so a
self-join or re-aggregation doesn't recompute an Arrow UDF or shuffle
twice.  Those ``persist()`` calls used to be fire-and-forget: in a
long session that invokes many queries (the bench battery, the driver's
50-query correctness sweep, the oracle pytest over all registered
queries) the cached blocks accumulated until the JVM ContextCleaner
happened to collect them.

``pin`` registers every such DataFrame in a module-level ledger;
``release_pinned`` unpersists everything in it.  The query registry
(`plans.queries.query_fn`) calls ``release_pinned`` at the START of
each query invocation, so at most one query's working set is ever
cached — the previous query's blocks are dropped the moment the next
query begins, with no cooperation needed from the driver or bench
harness.  Unpersisting is non-blocking and safe even if the earlier
DataFrame is re-collected later: Spark just recomputes the lineage
(deterministically — every pinned intermediate here is built from
deterministic expressions/UDFs).

At 100 TB the same discipline matters more, not less: executor storage
memory evicts lazily, and a battery of pipeline stages that each pin a
signature table would otherwise thrash the unified memory region.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PINNED: list[DataFrame] = []


def pin(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` and remember it for the next ``release_pinned``."""
    df.persist(level if level is not None else StorageLevel.MEMORY_AND_DISK)
    _PINNED.append(df)
    return df


def release_pinned() -> int:
    """Unpersist every ledgered DataFrame; returns how many."""
    n = len(_PINNED)
    while _PINNED:
        try:
            _PINNED.pop().unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass
    return n
