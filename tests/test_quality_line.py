"""Semantic tests for the constraint suite (operators/profile.py
quality_report) and C4-style line dedup
(operators/corpus_quality.line_dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.plans.queries import QUERIES

from .conftest import SF_DIR


def test_quality_report_on_crafted_rows(spark):
    from business_intelligence_and_data_warehouse_spark.operators.profile import (
        quality_report,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", -1.0), (3, None, 5.0), (3, "b", 2.0)],
        "id long, name string, amount double",
    )
    rows = {
        r["check"]: r
        for r in quality_report(
            df,
            row_checks={
                "complete_name": F.col("name").isNotNull(),
                "positive_amount": F.col("amount") > 0,
            },
            unique_cols=["id"],
            thresholds={"positive_amount": 0.5},
        ).collect()
    }
    assert rows["complete_name"]["metric"] == 3 / 4
    assert not rows["complete_name"]["passed"]  # default threshold 1.0
    assert rows["positive_amount"]["metric"] == 3 / 4
    assert rows["positive_amount"]["passed"]  # threshold 0.5
    assert rows["unique_id"]["metric"] == 3 / 4  # 3 distinct of 4
    assert not rows["unique_id"]["passed"]


def test_registry_quality_checks_exercise_both_verdicts(spark):
    rows = {
        r["check"]: r for r in QUERIES["data_quality_checks"](spark, SF_DIR).collect()
    }
    assert len(rows) == 6
    # the date-bounds check is the designed failure (orders run to 2001)
    assert not rows["orderdate_in_range"]["passed"]
    assert rows["orderdate_in_range"]["metric"] < 1.0
    for name in (
        "completeness_o_custkey",
        "accepted_status",
        "positive_totalprice",
        "ref_custkey_in_customer",
        "unique_o_orderkey",
    ):
        assert rows[name]["passed"] and rows[name]["metric"] == 1.0


def test_line_dedup_keeps_exactly_distinct_segments(spark):
    """Corpus-wide: kept segments == distinct segment count, and every
    document's segment count is ceil(tokens/8) (>= 1)."""
    import math

    from business_intelligence_and_data_warehouse_spark.functions.text import (
        normalize_text,
        tokens_ws,
    )
    from business_intelligence_and_data_warehouse_spark.sources.testdata import (
        load_table,
    )

    out = {r["doc_id"]: r for r in QUERIES["text_line_dedup"](spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents")
    tok_counts = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(tokens_ws(normalize_text(F.col("text")))).alias("n")
        ).collect()
    }
    assert set(out) == set(tok_counts)
    for doc_id, r in out.items():
        assert r["n_segments"] == max(math.ceil(tok_counts[doc_id] / 8), 1)
        assert 0 <= r["n_removed"] <= r["n_segments"]

    # distinct segments across the corpus == total kept
    n_distinct = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.greatest(
                            F.ceil(
                                F.size(tokens_ws(normalize_text(F.col("text")))) / 8
                            ).cast("int"),
                            F.lit(1),
                        )
                        - 1,
                    ),
                    lambda i: F.concat_ws(
                        " ",
                        F.slice(
                            tokens_ws(normalize_text(F.col("text"))),
                            i * 8 + 1,
                            8,
                        ),
                    ),
                )
            ).alias("i", "seg"),
        )
        .select("seg")
        .distinct()
        .count()
    )
    total_kept = sum(r["n_segments"] - r["n_removed"] for r in out.values())
    assert total_kept == n_distinct


def test_line_dedup_reassembly_is_subsequence(spark):
    """Each clean_text must be the original token stream with the
    removed segments excised — verify a sample doc by recomputing in
    Python."""
    from business_intelligence_and_data_warehouse_spark.sources.testdata import (
        load_table,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").limit(2000).collect()
    }
    out = {r["doc_id"]: r for r in QUERIES["text_line_dedup"](spark, SF_DIR).collect()}

    # python reference: first-occurrence-wins over (doc_id, seg_idx)
    seen: set[str] = set()
    want: dict[int, list[str]] = {}
    for doc_id in sorted(docs):
        toks = " ".join(docs[doc_id].lower().split()).split(" ")
        segs = [
            " ".join(toks[i : i + 8]) for i in range(0, max(len(toks), 1), 8)
        ]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        want[doc_id] = kept
    for doc_id, r in out.items():
        assert r["clean_text"] == " ".join(want[doc_id]), doc_id
