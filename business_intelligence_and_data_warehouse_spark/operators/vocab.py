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


def word_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(w, freq) corpus occurrence counts per distinct word — the BPE
    working set: one partial-aggregated shuffle keyed on the
    vocabulary, after which every merge iteration runs over WORD TYPES
    weighted by frequency, never over the corpus again (the classic
    Sennrich/GPT-2 trainer shape; at 100 TB the corpus is scanned once
    and the iterative phase touches only the vocabulary table)."""
    return (
        docs.select(
            tokens_ws(normalize_text(F.col(text_col))).alias("toks")
        )
        .select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, pair_count) adjacent-symbol pair statistics over a
    (w, freq) word-frequency table — iteration-1 BPE merge counts,
    symbols = single characters.

    Character pairs are read positionally (``substring`` over an
    exploded index sequence — portable to any SQL engine, no
    empty-separator split semantics to disagree on); each word type
    contributes its pairs weighted by corpus frequency. The aggregate
    is keyed on the pair alphabet — tiny — with map-side partials.
    """
    pairs = words.filter(F.length("w") >= 2).select(
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        F.col("w"),
    )
    return (
        pairs.select(
            F.substring(F.col("w"), F.col("i").cast("int"), 1).alias("a"),
            F.substring(F.col("w"), F.col("i").cast("int") + 1, 1).alias("b"),
            "freq",
        )
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_apply_merge(symbols, a: str, b: str):
    """Greedy left-to-right BPE merge of pair (a, b) over a symbol
    array column — the re-segmentation step between merge iterations,
    expressed as ONE ``aggregate`` fold (no Python, no loop jobs):
    append each symbol, but when the accumulator ends in ``a`` and the
    incoming symbol is ``b``, replace the tail with ``a||b``.  Matches
    the reference trainer's non-overlapping greedy semantics
    ("aaa" + (a,a) -> [aa, a]); property-tested against a pure-Python
    fold in tests/test_tokenizer_prep.py."""
    merged = a + b
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


# ---------------------------------------------------------------------------
# full BPE: train a merge list, then encode the corpus with it
# ---------------------------------------------------------------------------

# New symbols live in the BMP private-use area (U+E000..U+F8FF, 6400
# codepoints).  normalize_text only lowercases and collapses
# whitespace — it does NOT strip private-use characters, so the
# trainer VALIDATES the contract instead of assuming it: bpe_train
# raises if any input word carries a PUA codepoint (a word containing
# one would silently collide with merge symbols and corrupt every
# pair count downstream).  Keeping every symbol (initial char or
# merged pair) EXACTLY ONE character is what makes greedy
# left-to-right merging equal to a plain literal ``replace`` in any
# engine (both Spark's ``replace`` and DuckDB's scan left-to-right
# over non-overlapping occurrences, the Sennrich trainer's
# semantics).
BPE_SYMBOL_BASE = 0xE000
# Last PUA codepoint: merge ranks beyond this would walk into real
# CJK-compatibility codepoints and could collide with corpus text.
BPE_MAX_MERGES = 0xF8FF - BPE_SYMBOL_BASE + 1  # 6400

# One-character class matching any BMP private-use codepoint — the
# symbol alphabet; corpus words must not contain these.
_PUA_RE = "[\\uE000-\\uF8FF]"


def bpe_new_symbol(rank: int) -> str:
    """The single private-use character standing for merge ``rank``
    (1-based) — deterministic, so any engine regenerates the same
    symbol table from the same merge ranks.  Bounded to the PUA block:
    rank > 6400 would leave private-use space and collide with real
    corpus codepoints."""
    if not 1 <= rank <= BPE_MAX_MERGES:
        raise ValueError(
            f"BPE merge rank {rank} outside the private-use symbol "
            f"space (1..{BPE_MAX_MERGES})"
        )
    return chr(BPE_SYMBOL_BASE + rank - 1)


def bpe_train(
    words: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges over a (w, freq) word table and
    return ``(merges, encoded_words)``: merges as
    (rank, a, b, new_symbol, pair_count) in training order, and the
    word table with ``w`` carrying the fully re-segmented symbol
    string (one char per symbol) plus the original word in ``w0``.

    Scale shape (100 TB): the corpus is scanned ONCE into the
    vocabulary-sized (w, freq) table (``word_frequencies``), which is
    pinned here; every training iteration is then one pair-count
    aggregate over word TYPES weighted by frequency plus a ONE-ROW
    collect — the trainer's inherent synchronization point (each merge
    decision feeds the next iteration's re-segmentation; the classic
    Sennrich/GPT-2 trainer loop).  Nothing corpus-sized moves after
    the first scan, and the driver state is N five-tuples.

    Tie-break: highest pair_count, then (a, b) ascending — fully
    deterministic, mirrored by the DuckDB oracle's ORDER BY.

    Contract guards: ``n_merges`` must fit the private-use symbol
    block (≤ 6400), and no input word may contain a private-use
    codepoint (it would collide with merge symbols and corrupt pair
    counts) — validated with ONE vocabulary-sized check over the
    already-pinned word table, raising ``ValueError`` with an
    offending sample.
    """
    from .caching import pin

    if n_merges > BPE_MAX_MERGES:
        raise ValueError(
            f"n_merges={n_merges} exceeds the {BPE_MAX_MERGES}-symbol "
            "private-use block (U+E000..U+F8FF); larger vocabularies "
            "need a multi-char symbol encoding"
        )
    work = pin(words.select(F.col("w").alias("w0"), "w", "freq"))
    tainted = work.filter(F.col("w").rlike(_PUA_RE)).select("w").limit(3)
    bad = [r.w for r in tainted.collect()]
    if bad:
        raise ValueError(
            "BPE input words contain private-use codepoints (the merge "
            f"symbol alphabet); pre-strip them: {bad!r}"
        )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            bpe_pair_counts(work)
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(1).collect()
        )
        if not top:  # every word is a single symbol; nothing to merge
            break
        a, b, cnt = top[0].a, top[0].b, int(top[0].pair_count)
        new = bpe_new_symbol(rank)
        merges.append((rank, a, b, new, cnt))
        work = work.withColumn(
            "w", F.replace(F.col("w"), F.lit(a + b), F.lit(new))
        )
    return merges, work


def bpe_encode_words(
    words: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    word_col: str = "w",
    out_col: str = "enc",
) -> DataFrame:
    """Apply a trained merge list to a word table: ``out_col`` is the
    symbol string (one char per symbol) after every merge, applied in
    rank order — the tokenizer-APPLICATION step.  A chain of literal
    ``replace`` expressions, entirely codegen'd JVM-side: no Python,
    no loop jobs, no shuffle (narrow projection over whatever
    partitioning ``words`` already has).

    Same symbol-space contract as :func:`bpe_train`: at most 6400
    merges, and callers must not feed words containing private-use
    codepoints (this narrow projection adds no validation job; train
    is where the corpus-side check runs)."""
    if len(merges) > BPE_MAX_MERGES:
        raise ValueError(
            f"{len(merges)} merges exceed the {BPE_MAX_MERGES}-symbol "
            "private-use block (U+E000..U+F8FF)"
        )
    enc = F.col(word_col)
    for _rank, a, b, new, _cnt in merges:
        enc = F.replace(enc, F.lit(a + b), F.lit(new))
    return words.withColumn(out_col, enc)
