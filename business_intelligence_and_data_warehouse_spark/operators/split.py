"""Deterministic hash-based train/val/test assignment.

`randomSplit` is the wrong tool for corpus-scale ML splits: its
assignment depends on partitioning and sampler seed-per-partition, so
adding one input file reshuffles everyone's split, and re-running on a
recomputed upstream can move rows between train and test (leakage).
The industry-standard fix is a *content hash* split: bucket =
hash(stable id) mod N, split by bucket range. Properties:

* deterministic and partitioning-invariant — a document's split is a
  pure function of its id, stable across reruns, re-partitions, and
  cluster sizes;
* incremental — new documents get a split without touching old ones;
* exactly reproducible in any other engine (the md5 hex parse below
  uses only md5/substring/ascii arithmetic, portable to DuckDB/
  Postgres/Trino for audit queries).

Fractions are bucket-granular: with 4096 buckets the realized split
differs from the requested fraction by < 0.025% of the corpus, and the
per-class realized counts concentrate tightly (binomial) — at 100 TB
this is far more accurate than sampler-based splits.

The reference splits with sklearn train_test_split(stratify=...)
(`PythonAnalysis.py:281-283`, random_state=42) — fine for one pandas
frame, not reproducible across engines or runs on growing data; the
stratified variant of THAT is in analytics/predictive.py. This module
is the scale-native split for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_BUCKETS = 4096  # 3 hex digits of md5


def _hex_val(c: Column) -> Column:
    """Integer value of one lowercase hex digit (ascii arithmetic —
    portable to any SQL engine, no conv/from_hex needed)."""
    a = F.ascii(c)
    return F.when(a >= 97, a - 87).otherwise(a - 48)


def hash_bucket(id_col: Column) -> Column:
    """Bucket in [0, 4096) from the first 3 hex digits of md5(id)."""
    h = F.md5(id_col.cast("string"))
    return (
        _hex_val(F.substring(h, 1, 1)) * 256
        + _hex_val(F.substring(h, 2, 1)) * 16
        + _hex_val(F.substring(h, 3, 1))
    ).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.70,
    val: float = 0.15,
) -> DataFrame:
    """Adds `bucket` and `split` ('train'/'val'/'test') columns.

    Thresholds are floor(fraction * NUM_BUCKETS) — exact integers, so
    the boundary is engine-independent.
    """
    train_end = int(train * NUM_BUCKETS)
    val_end = int((train + val) * NUM_BUCKETS)
    b = hash_bucket(F.col(id_col))
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train_end, F.lit("train"))
        .when(F.col("bucket") < val_end, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.5,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the domain-mixing
    primitive of training-data pipelines (keep X% of stratum A, Y% of
    stratum B, ...).

    Keep iff ``hash_bucket(id) < floor(rate(stratum) * NUM_BUCKETS)``:
    the same content-hash properties as :func:`hash_split` — a row's
    fate is a pure function of (id, stratum rate), stable under
    repartitioning, reruns, and corpus growth, and reproducible in any
    SQL engine for audit. Entirely map-side (the rate lookup is a
    literal CASE chain, not a join).
    """
    b = hash_bucket(F.col(id_col))
    threshold = None
    for stratum, rate in sorted(rates.items()):
        cut = F.lit(int(rate * NUM_BUCKETS))
        threshold = (
            F.when(F.col(stratum_col) == stratum, cut)
            if threshold is None
            else threshold.when(F.col(stratum_col) == stratum, cut)
        )
    threshold = (
        threshold.otherwise(F.lit(int(default_rate * NUM_BUCKETS)))
        if threshold is not None
        else F.lit(int(default_rate * NUM_BUCKETS))
    )
    return df.withColumn("bucket", b).filter(F.col("bucket") < threshold)


def stratified_fixed_k(
    df: DataFrame,
    k: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-SIZE sample: the k rows with the smallest
    content-hash buckets per stratum (ties on id) — the reproducible
    replacement for per-group reservoir sampling.

    Rate-based sampling (:func:`mixture_sample`) keeps a fraction;
    this keeps an exact count per stratum (eval sets, few-shot pools,
    per-domain quotas). Same invariances: a row's membership depends
    only on (its id, its stratum's k-th hash threshold), so adding
    rows to OTHER strata never changes a stratum's sample, and reruns
    are identical. One shuffle on the stratum key; the per-stratum
    rank is a window over stratum-sized groups.
    """
    from pyspark.sql import Window as W

    b = hash_bucket(F.col(id_col))
    w = W.partitionBy(stratum_col).orderBy("bucket", id_col)
    return (
        df.withColumn("bucket", b)
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
        .drop("bucket")
    )


def domain_token_quota(
    df: DataFrame,
    cap_tokens: int,
    tokens_col: str = "n_tokens",
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain TOKEN caps with deterministic smallest-hash
    retention — the C4/RefinedWeb-style volume control: no single
    domain may contribute more than ``cap_tokens`` tokens to the
    corpus, and which documents survive is a pure function of their
    content hashes, not arrival order.

    Keep a document iff the RUNNING token total over its domain —
    accumulated in (hash bucket, id) order — stays ≤ the cap: the
    greedy hash-ordered prefix. Properties inherited from the
    hash_bucket family: reruns and repartitions are identical, adding
    documents to OTHER domains never changes a domain's kept set, and
    any SQL engine replays the decision for audit. (Adding a
    smaller-hash document to the SAME domain can displace later ones
    — inherent to any fixed cap.)

    Adds ``cum_tokens`` (the running total including the row itself).
    One shuffle on the domain key; the window is domain-partitioned.
    At 100 TB domains are the natural partition and per-domain state
    is one running integer — no skew beyond the domain histogram
    itself, which the cap is precisely there to flatten.
    """
    from pyspark.sql import Window as W

    clash = [c for c in ("bucket", "cum_tokens") if c in df.columns]
    if clash:
        raise ValueError(
            f"domain_token_quota: input already has reserved column(s) "
            f"{clash}; rename them before calling"
        )
    w = (
        W.partitionBy(stratum_col)
        .orderBy("bucket", id_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        df.withColumn("bucket", hash_bucket(F.col(id_col)))
        .withColumn("cum_tokens", F.sum(tokens_col).over(w).cast("long"))
        .filter(F.col("cum_tokens") <= cap_tokens)
        .drop("bucket")
    )
