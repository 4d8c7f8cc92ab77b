"""Vocabulary induction and out-of-vocabulary reporting — the
tokenizer-prep pass of a training-data pipeline.

Reference parity: the reference has no text surface; this belongs to
the LLM-pipeline extension mandate (before training a tokenizer or
fixing a vocab, you measure corpus coverage: which V words cover the
token stream, and which documents are OOV-heavy — a strong
foreign-language / garbage signal).

Scale design (100 TB): the document-frequency aggregate shuffles the
token table once with map-side partial aggregation (key space is the
vocabulary, not the corpus); the induced top-V table is small by
construction (V rows) so the OOV scoring pass is a BROADCAST left
join on the token stream — the corpus is never reshuffled to be
scored, only its per-doc aggregate shuffles on doc_id. The top-V cut
is a global sort of the distinct-token table (vocabulary-sized, not
corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens_ws


def occurrences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, w) one row per token OCCURRENCE (not distinct) — the
    ONE corpus scan both the induction and the scoring pass read;
    callers running both should pin it (the shared-tokenize rule,
    SCALE.md) rather than let each consumer re-derive the corpus
    normalize+split."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_ws(normalize_text(F.col(text_col))).alias("toks"),
    ).select("doc_id", F.explode("toks").alias("w"))


def induce_vocab_from_occ(occ: DataFrame, v: int = 500) -> DataFrame:
    """Top ``v`` tokens by DOCUMENT frequency from an occurrence table
    (ties broken by token asc — fully deterministic): (w, df)."""
    dfreq = occ.groupBy("w").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return dfreq.orderBy(F.desc("df"), "w").limit(v)


def induce_vocab(
    docs: DataFrame,
    v: int = 500,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`induce_vocab_from_occ` over a raw document table."""
    return induce_vocab_from_occ(occurrences(docs, id_col, text_col), v)


def oov_report_from_occ(occ: DataFrame, vocab: DataFrame) -> DataFrame:
    """Per-document OOV stats against ``vocab`` (a (w, ...) table)
    from an occurrence table: (doc_id, n_tokens, n_oov, oov_rate)."""
    scored = occ.join(
        F.broadcast(vocab.select("w").withColumn("_in", F.lit(1))),
        "w",
        "left",
    )
    oov = F.col("_in").isNull().cast("long")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(oov).alias("n_oov"),
        (F.sum(oov).cast("double") / F.count(F.lit(1))).alias("oov_rate"),
    )


def oov_report(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`oov_report_from_occ` over a raw document table."""
    return oov_report_from_occ(occurrences(docs, id_col, text_col), vocab)
