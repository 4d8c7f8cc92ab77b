"""Keyword search scoring over a document corpus: BM25 with a
rational idf.

Classic BM25 multiplies each term's tf-saturation by
``ln((N - df + 0.5) / (df + 0.5) + 1)``. The log is the one piece
whose last-ulp rounding is libm-implementation-specific, so the
cross-engine-deterministic variant here drops the log and uses the
rational odds idf ``(N - df + 0.5) / (df + 0.5)`` directly — the same
document ordering per term, computed purely from IEEE add/mul/div
(each correctly rounded, hence bit-identical in any engine). Per-term
scores are floor-snapped to 1e-9 and summed as integers so the
per-document total is order-independent.

Scale design: the term list is a handful of constants, so the token
explode filters to query terms BEFORE any shuffle (the exchange
carries |docs| x |terms| rows at most, not the token stream); df and
the corpus stats (N, avgdl) are 1-row/`|terms|`-row aggregates joined
back by broadcast. No UDFs, no windows over the corpus; the top-k is
a TakeOrdered, not a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens_ws
from .caching import pin

SCORE_SCALE = 1e9


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under rational-idf
    BM25. Ties break on doc_id ascending."""
    # ONE tokenize pass, projected to narrow rows (doc length + the
    # query-term hits only — never the full token array): both the
    # corpus stats and the tf table read this, so the text column is
    # scanned and tokenized once, and the persisted base is a few
    # bytes per document even at corpus scale.
    toks = tokens_ws(normalize_text(F.col(text_col)))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.filter(F.col("toks"), lambda t: t.isin(*terms)).alias("hits"),
    )
    base = pin(base)

    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )

    tf = (
        base.select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )

    scored = tf.join(F.broadcast(df_tbl), "term").crossJoin(
        F.broadcast(stats)
    )
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    sat = (tfd * F.lit(k1 + 1.0)) / (
        tfd
        + F.lit(k1)
        * (F.lit(1.0 - b) + (F.lit(b) * dld) / F.col("avgdl"))
    )
    term_score = F.floor(idf * sat * F.lit(SCORE_SCALE)).cast("long")
    return (
        scored.select("doc_id", term_score.alias("ts"))
        .groupBy("doc_id")
        .agg(
            (F.sum("ts").cast("double") / F.lit(SCORE_SCALE)).alias("bm25"),
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-n characteristic terms per document by tf × rational idf
    (same log-free idf as :func:`bm25_topk` — see module docstring).

    Plan shape: tf shuffles on (doc, term) with map-side combine; the
    df table is vocabulary-sized and joins tf by broadcast (a corpus
    vocabulary is millions of rows — broadcastable — while the tf
    stream is |corpus|×|doc vocab|); the per-doc top-n is a window
    over doc-sized groups. Ties break on the term string.
    """
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_ws(normalize_text(F.col(text_col))).alias("toks"),
    )
    tf = (
        toked.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = toked.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    score = (
        F.floor(F.col("tf").cast("double") * idf * F.lit(SCORE_SCALE)).cast(
            "long"
        )
    )
    scored = (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (score.cast("double") / F.lit(SCORE_SCALE)).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "rank", "term", "tfidf")
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion
# ---------------------------------------------------------------------------

def rrf_fuse(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two rankings over the same id space
    (Cormack et al., "Reciprocal Rank Fusion outperforms Condorcet
    and individual rank learning methods") — the standard way to
    combine a lexical (BM25) and a dense (embedding) retriever
    without score calibration:

    ``rrf = sum over lists containing the id of 1 / (k_rrf + rank)``.

    Output: (id, rank_a, rank_b, rrf_score) for the fused top
    ``topk`` (rank 0 = absent from that list, keeping the column
    int-typed). Input ranks must therefore be 1-BASED — a 0-based
    ranking would make its top hit indistinguishable from "absent",
    so any rank < 1 fails the job loudly (in-scan ``raise_error``, no
    driver-side pass). Parity: each reciprocal is one IEEE division
    and the fused score adds at most TWO terms in a fixed expression
    order — commutative, engine-identical, no snapping needed.

    Scale: both inputs are already top-k lists (bounded rows), so the
    full-outer join and the TakeOrdered top-k are trivially small;
    fusing full corpus-sized rankings would instead shuffle on id —
    still a narrow two-int row.
    """
    def _checked(src: DataFrame) -> "F.Column":
        rank = F.col(rank_col)
        return F.when(rank >= 1, rank).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "rrf_fuse: ranks must be 1-based (0 is the "
                        "absent sentinel), got rank="
                    ),
                    rank.cast("string"),
                )
            ).cast(src.schema[rank_col].dataType)
        )

    a = ranks_a.select(
        F.col(id_col).alias("id"), _checked(ranks_a).alias("rank_a")
    )
    b = ranks_b.select(
        F.col(id_col).alias("id"), _checked(ranks_b).alias("rank_b")
    )
    fused = a.join(b, "id", "full_outer").select(
        "id",
        F.coalesce("rank_a", F.lit(0)).cast("int").alias("rank_a"),
        F.coalesce("rank_b", F.lit(0)).cast("int").alias("rank_b"),
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_a")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_b")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), "id").limit(topk)


# ---------------------------------------------------------------------------
# build-once / probe-many BM25 index lifecycle
# ---------------------------------------------------------------------------


def build_search_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """BUILD-ONCE half of the serving-search lifecycle: materialize a
    query-agnostic inverted index to ``index_dir`` — ``postings``
    (term, doc_id, tf, dl; dl denormalized onto the posting so scoring
    needs no doc-length join), ``dfs`` (term -> document frequency),
    and one-row ``stats`` (n_docs, sum_dl as exact BIGINTs; avgdl is
    derived at probe time with the same double division
    :func:`bm25_topk` uses, so scores are bit-identical to the
    from-scratch path).

    :func:`bm25_topk` re-tokenizes the corpus per query — right for a
    one-shot; a serving deployment pays the corpus scan once per
    snapshot and answers every query from the index. ``postings`` is
    repartitioned by term at write so a probe's term-filter prunes to
    term-clustered files; on a catalog-backed deployment write it
    ``bucketBy(term)`` and per-query reads touch only the probed
    terms' buckets.
    """
    toks = pin(
        docs.select(
            F.col(id_col).alias("doc_id"),
            tokens_ws(normalize_text(F.col(text_col))).alias("toks"),
        ).select("doc_id", F.size("toks").alias("dl"), "toks")
    )
    postings = (
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    postings = pin(postings)
    postings.repartition("term").write.mode("overwrite").parquet(
        index_dir + "/postings"
    )
    (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .write.mode("overwrite")
        .parquet(index_dir + "/dfs")
    )
    (
        toks.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("sum_dl"),
        )
        .write.mode("overwrite")
        .parquet(index_dir + "/stats")
    )


def probe_search_index(
    spark,
    index_dir: str,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """PROBE-MANY half: answer a bag-of-terms query from a prebuilt
    :func:`build_search_index` with the SAME output contract (and
    bit-identical scores) as :func:`bm25_topk`.

    Per-query cost is the term-filtered postings read (the filter
    pushes into the term-clustered parquet scan — never a corpus
    re-tokenize), a broadcast of the |terms| df rows, and one
    per-document aggregate over the hit postings.
    """
    postings = spark.read.parquet(index_dir + "/postings").filter(
        F.col("term").isin(*terms)
    )
    dfs = (
        spark.read.parquet(index_dir + "/dfs")
        .filter(F.col("term").isin(*terms))
        .select("term", F.col("df").cast("double").alias("df"))
    )
    stats = spark.read.parquet(index_dir + "/stats").select(
        F.col("n_docs").cast("double").alias("n_docs"),
        (
            F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
        ).alias("avgdl"),
    )
    scored = postings.join(F.broadcast(dfs), "term").crossJoin(
        F.broadcast(stats)
    )
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    sat = (tfd * F.lit(k1 + 1.0)) / (
        tfd
        + F.lit(k1)
        * (F.lit(1.0 - b) + (F.lit(b) * dld) / F.col("avgdl"))
    )
    term_score = F.floor(idf * sat * F.lit(SCORE_SCALE)).cast("long")
    return (
        scored.select("doc_id", term_score.alias("ts"))
        .groupBy("doc_id")
        .agg(
            (F.sum("ts").cast("double") / F.lit(SCORE_SCALE)).alias("bm25"),
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )
