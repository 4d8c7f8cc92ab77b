"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (a viral document, a default user id,
a null-ish sentinel) can put an entire aggregation or join on one
executor while the rest of the cluster idles. AQE's skew-join split
(`spark.sql.adaptive.skewJoin.enabled`, on in `session.get_spark`)
handles the JOIN case at runtime; these operators handle the cases AQE
does not:

* `salted_agg` — two-phase aggregation for skewed GROUP BY keys: a
  random salt spreads each hot key over `salt_buckets` partial groups
  (map-side + first shuffle), then a second tiny aggregation merges
  the partials. Works for any algebraic aggregate (sum/count/min/max;
  avg = sum+count merged at the end). Results are EXACTLY equal to the
  plain groupBy — salting changes the partitioning, not the algebra —
  so the same oracle SQL verifies both.
* `salted_broadcast_left` — replicate-broadcast pattern for a skewed
  join where the big side's hot keys would overload single tasks and
  the small side fits in memory ×`salt_buckets`: big rows get a random
  salt, the broadcast side is exploded once per salt value, and the
  join key becomes (key, salt). Equivalent to a plain inner join.

WHEN TO SALT — measured, not asserted (r7, `tools/skew_stress.py` at
20M–60M rows with a 10–50% hot key; full table in SCALE.md): do NOT
salt algebraic aggregates (map-side partials already collapse the hot
key; salting measured 6x WORSE) or count_distinct (Catalyst's rewrite
shuffles on (key, value), which de-skews by itself; ~1.4x worse).
Salting pays for (a) holistic per-group state that cannot
partial-aggregate — collect-like aggregates measured 1.14x faster
salted even on local[32] — and (b) straggler amplification on real
clusters, where one hot task idles every other executor (local mode
caps that loss at the core count and so understates the win).  For
joins, broadcast is the first answer whenever a side fits
(`operators/planning.choose_join_strategy` encodes the decision).

The salt is DETERMINISTIC per row content (`xxhash64` over all
columns, mod buckets) — never `rand()`. A non-deterministic expression
feeding a shuffle is the SPARK-23207 failure class: under a fetch
failure / stage retry a row can be recomputed with a different salt
and land in a partition that was already consumed, silently dropping
or duplicating it on real clusters (invisible in local tests). The
hash salt re-derives identically on retry. Fully identical rows share
a salt, which only means exact duplicates don't spread further — the
aggregate stays exact either way. Tests assert exact equality against
the unsalted form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, seed: int = 42) -> DataFrame:
    """Append a uniform int salt column in [0, salt_buckets), derived
    deterministically from the row's content so stage retries
    recompute the same salt (see module docstring)."""
    return df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.lit(seed), *df.columns), F.lit(salt_buckets)).cast(
            "int"
        ),
    )


_MERGES = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    merges: dict[str, str] | None = None,
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """groupBy(keys).agg(...) computed skew-proof in two phases.

    ``aggs`` maps output column name -> the phase-1 aggregate (a
    :mod:`pyspark.sql.functions` expression); ``merges`` maps the same
    name -> how phase 2 combines partials ("sum", "min", "max";
    default "sum"). Callers express COUNT as ``F.sum(F.lit(1))`` so
    the partials merge by summing (a count of counts would be wrong);
    AVG as separate sum+count merged by the caller afterwards.

    Phase 1 groups on (keys + salt): a key with f rows is spread over
    min(f, salt_buckets) tasks. Phase 2 groups the ≤ salt_buckets
    partials per key — trivially small. Spark's partial aggregation
    already does this for the MAP side; salting extends it through the
    REDUCE side, which is where a hot key concentrates.
    """
    merges = merges or {}
    phase1 = with_salt(df, salt_buckets, seed).groupBy(*keys, "_salt").agg(
        *[a.alias(name) for name, a in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _MERGES[merges.get(name, "sum")](name).alias(name)
            for name in aggs
        ]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Inner join big ⋈ small on ``on``, with the big side salted and
    the small side replicated once per salt value, so a hot join key's
    rows land on `salt_buckets` tasks instead of one.

    Column contract matches ``big.join(small, on, "inner")``.
    """
    b = with_salt(big, salt_buckets, seed)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(F.broadcast(s), on + ["_salt"], "inner").drop("_salt")


def hot_key_split_join(
    big: DataFrame,
    dim: DataFrame,
    on: list[str],
    hot_keys: DataFrame,
) -> DataFrame:
    """Inner join big ⋈ dim on ``on`` with the classic hot-key SPLIT:
    rows whose key is in the (small) ``hot_keys`` set join against a
    BROADCAST of the dim's hot slice; everything else takes the normal
    shuffle join; the two streams union.  Result is exactly
    ``big.join(dim, on, "inner")`` (oracle-checked) — only the routing
    changes.

    Why this still exists next to AQE's skew split: AQE splits an
    oversized shuffle PARTITION by replicating the matching dim
    partition — both sides still shuffle in full.  The explicit split
    never shuffles the hot rows at all (map-side broadcast probe) and
    ships only the dim's HOT SLICE, which is the interesting case when
    the dim is too big to broadcast whole but its hot keys are a
    handful — exactly what `operators/planning.choose_join_strategy`'s
    inputs (CMS max-key bound + HLL cardinality) detect.  At 100 TB
    the hot set comes from those sketches (heavy hitters), not a
    count of the data.

    ``hot_keys``: a SMALL DataFrame holding the hot key values (any
    extra columns ignored); it is broadcast three times for the
    semi/anti routing, all map-side.
    """
    hk = F.broadcast(hot_keys.select(*on).distinct())
    hot = big.join(hk, on, "left_semi").join(
        F.broadcast(dim.join(hk, on, "left_semi")), on, "inner"
    )
    cold = big.join(hk, on, "left_anti").join(dim, on, "inner")
    return hot.unionByName(cold)
