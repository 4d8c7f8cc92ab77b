"""Similarity search over embedding columns (array<float>).

Three paths:
* brute-force cosine top-k — the exact baseline; probe set × corpus,
  partial top-k per partition via window rank;
* hyperplane-LSH bucketed ANN — the scale path for similarity *joins*:
  32-bit random-hyperplane signatures, banded OR-blocking (4 bands x
  8 bits), verify candidates only;
* IVF (inverted-file) top-k — the scale path for *query* workloads: a
  small deterministic centroid set partitions the corpus into cells
  (each vector assigned to its nearest centroid); a probe scans only
  its nprobe nearest cells, so per-query cost is corpus/cells × nprobe
  instead of the full corpus.

Float determinism: cosine terms are exploded to an element table and
each per-element product is snapped to DECIMAL(18,6) before the sum —
decimal sums are order-independent, so Spark and an oracle engine get
bit-identical cosines (verified: summing raw doubles mismatches on
100% of pairs; see plans/queries.py docstring for the theory).
Snapping costs ~3e-5 absolute cosine error — identically in every
engine, so rankings stay consistent.

Scale notes:
* the element table is (n_vectors × dim) rows keyed by position — the
  position join broadcasts nothing and shuffles at most probe×corpus
  rows; for production ANN the LSH path bounds candidates per probe.
* hyperplanes are generated arithmetically from (bit, position) — no
  stored model state, identical on every executor, no broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# precision <= 18 keeps Spark's Decimal on the compact long fast path;
# per-element products are < 1e3 so scale-6 units fit comfortably
DOT_DEC = "decimal(18,6)"


def element_table(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, pos 1-based, value double) long form of the vectors."""
    return vectors.select(
        F.col(id_col).alias("vid"), F.posexplode(vec_col).alias("pos", "val")
    ).select("vid", (F.col("pos") + 1).alias("pos"), F.col("val").cast("double").alias("val"))


def norms(elements: DataFrame) -> DataFrame:
    """(id, l2 norm) with the decimal-snapped deterministic sum."""
    return elements.groupBy("vid").agg(
        F.sqrt(F.sum((F.col("val") * F.col("val")).cast(DOT_DEC)).cast("double")).alias(
            "norm"
        )
    )


def cosine_pairs(
    probe_elements: DataFrame,
    corpus_elements: DataFrame,
) -> DataFrame:
    """(probe vid, corpus vid, cosine) for the full probe × corpus set
    (joined on vector position; self-pairs NOT excluded here)."""
    p = probe_elements.alias("p")
    c = corpus_elements.alias("c")
    dots = (
        p.join(c, F.col("p.pos") == F.col("c.pos"))
        .groupBy(F.col("p.vid").alias("qid"), F.col("c.vid").alias("cid"))
        .agg(
            F.sum((F.col("p.val") * F.col("c.val")).cast(DOT_DEC))
            .cast("double")
            .alias("dot")
        )
    )
    np_ = norms(probe_elements).withColumnRenamed("vid", "qid").withColumnRenamed(
        "norm", "qnorm"
    )
    nc = norms(corpus_elements).withColumnRenamed("vid", "cid").withColumnRenamed(
        "norm", "cnorm"
    )
    return (
        dots.join(F.broadcast(np_), "qid")
        .join(nc, "cid")
        .select(
            "qid",
            "cid",
            (
                F.col("dot")
                / F.nullif(F.col("qnorm") * F.col("cnorm"), F.lit(0.0))
            ).alias("cosine"),
        )
    )


def cosine_for_pairs(pairs: DataFrame, elements: DataFrame) -> DataFrame:
    """Exact cosine for an explicit (qid, cid) pair set — cost is
    O(|pairs| × dim), independent of corpus size (the verify step of
    every LSH/blocking pipeline)."""
    q = elements.alias("q")
    c = elements.alias("c")
    dots = (
        pairs.join(q, pairs.qid == F.col("q.vid"))
        .join(c, (pairs.cid == F.col("c.vid")) & (F.col("q.pos") == F.col("c.pos")))
        .groupBy("qid", "cid")
        .agg(
            F.sum((F.col("q.val") * F.col("c.val")).cast(DOT_DEC))
            .cast("double")
            .alias("dot")
        )
    )
    n = norms(elements)
    nq = n.withColumnRenamed("vid", "qid").withColumnRenamed("norm", "qnorm")
    nc = n.withColumnRenamed("vid", "cid").withColumnRenamed("norm", "cnorm")
    return (
        dots.join(nq, "qid")
        .join(nc, "cid")
        .select(
            "qid",
            "cid",
            (
                F.col("dot")
                / F.nullif(F.col("qnorm") * F.col("cnorm"), F.lit(0.0))
            ).alias("cosine"),
        )
    )


def brute_force_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest (cosine) corpus vectors per probe vector.

    Deterministic ranking: cosine DESC, then corpus id ASC as the
    tiebreaker. Self-matches (same id) are excluded.
    """
    corpus_el = element_table(vectors, id_col, vec_col)
    probe_el = element_table(probes, id_col, vec_col)
    pairs = cosine_pairs(probe_el, corpus_el).filter(F.col("qid") != F.col("cid"))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate top-k
# ---------------------------------------------------------------------------

def _nearest_centroids(
    elements: DataFrame, centroid_elements: DataFrame, n: int
) -> DataFrame:
    """(vid, cvid) of each vector's n nearest centroids by cosine.

    The centroid element table is tiny (cells << corpus) and broadcast,
    so the assignment is a map-side join: corpus×centroids dot products
    with no shuffle of the corpus beyond its own groupBy key — the same
    plan shape IVF coarse quantization has on a 1000-executor cluster.
    Ties break on centroid id for cross-engine determinism.
    """
    v = elements.alias("v")
    c = centroid_elements.alias("c")
    dots = (
        v.join(F.broadcast(c), F.col("v.pos") == F.col("c.pos"))
        .groupBy(F.col("v.vid").alias("vid"), F.col("c.vid").alias("cvid"))
        .agg(
            F.sum((F.col("v.val") * F.col("c.val")).cast(DOT_DEC))
            .cast("double")
            .alias("dot")
        )
    )
    nv = norms(elements)
    ncn = (
        norms(centroid_elements)
        .withColumnRenamed("vid", "cvid")
        .withColumnRenamed("norm", "cnorm")
    )
    scored = (
        dots.join(nv, "vid")
        .join(F.broadcast(ncn), "cvid")
        .select(
            "vid",
            "cvid",
            (
                F.col("dot") / F.nullif(F.col("norm") * F.col("cnorm"), F.lit(0.0))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("vid").orderBy(F.desc("cosine"), F.col("cvid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("vid", "cvid")
    )


def ivf_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int,
    centroid_stride: int = 25,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: centroids are the deterministic corpus
    subset ``id % centroid_stride == 0`` (a fixed coarse quantizer —
    the Spark analogue of IVF training on a uniform sample); every
    corpus vector lands in exactly one cell (nearest centroid), and a
    probe searches only its ``nprobe`` nearest cells exactly.

    Same output contract as :func:`brute_force_topk`
    (query_id, neighbor_id, rank, cosine; self-matches excluded), but
    per-probe work is ~nprobe/cells of the corpus. At 100 TB the cell
    assignment is the only corpus-wide pass and it broadcasts just the
    centroid set; the probe-side join shuffles on cell id, which is
    uniformly loaded when ids are hash-distributed.
    """
    corpus_el = element_table(vectors, id_col, vec_col).cache()
    cent_el = corpus_el.filter(F.col("vid") % centroid_stride == 0)
    assign = _nearest_centroids(corpus_el, cent_el, 1)
    probe_el = element_table(probes, id_col, vec_col)
    probe_cells = _nearest_centroids(probe_el, cent_el, nprobe).withColumnRenamed(
        "vid", "qid"
    )
    candidates = (
        probe_cells.join(assign, "cvid")
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", F.col("vid").alias("cid"))
        .distinct()
    )
    pairs = cosine_for_pairs(candidates, corpus_el)
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )


# ---------------------------------------------------------------------------
# Hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplane_component(bit: int, pos: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-9, 9]:
    a fixed integer mix of (bit, position). Identical across engines
    and executors; no stored model."""
    return ((F.lit(bit * 2654435761 % 1013) + pos * 2246822519) % 19) - 9


def hyperplane_signatures(
    elements: DataFrame, num_bits: int = 32
) -> DataFrame:
    """num_bits sign-of-dot-product bits per vector, as one integer."""
    sums = elements.groupBy("vid").agg(
        *[
            F.sum(
                (F.col("val") * _hyperplane_component(b, F.col("pos"))).cast(DOT_DEC)
            )
            .cast("double")
            .alias(f"h{b}")
            for b in range(num_bits)
        ]
    )
    sig = None
    for b in range(num_bits):
        bit = F.when(F.col(f"h{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sums.select("vid", sig.cast("long").alias("sig"))


def lsh_ann_pairs(
    vectors: DataFrame,
    num_bits: int = 32,
    bands: int = 4,
    min_cosine: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-neighbor pairs via banded hyperplane LSH + exact verify.

    Candidates = pairs agreeing on all bits of at least one band
    (num_bits/bands bits each); verification computes the exact
    (decimal-snapped) cosine and keeps pairs >= min_cosine. Recall
    follows 1-(1-p^r)^b with p = 1 - angle/pi.
    """
    # elements feed signatures, the verify dots and both norm lookups —
    # cache so the explode happens once
    elements = element_table(vectors, id_col, vec_col).cache()
    sigs = hyperplane_signatures(elements, num_bits)
    r = num_bits // bands
    band_rows = sigs.select(
        "vid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        ((F.col("sig") / F.lit(2 ** (b * r))).cast("long") % (2**r)).alias(
                            "key"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("vid", "bk.band", "bk.key")
    x = band_rows.alias("x")
    y = band_rows.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.vid") < F.col("y.vid")),
        )
        .select(F.col("x.vid").alias("qid"), F.col("y.vid").alias("cid"))
        .distinct()
    )
    pairs = cosine_for_pairs(candidates, elements)
    return pairs.filter(F.col("cosine") >= min_cosine).select(
        F.col("qid").alias("vec_a"), F.col("cid").alias("vec_b"), "cosine"
    )
