"""Behavioral tests for the corpus-curation pipeline on crafted
documents (the testdata table has no exact duplicates, so stage 3's
keep-min-id rule is pinned here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.operators.curation import (
    curate_corpus,
    flag_stages,
)

# quality-passing English filler (many stopwords, no punctuation)
_EN = (
    "the project is moving to a new phase and the team is ready for "
    "the launch of the system in a steady and careful way for everyone"
)


def _docs(spark):
    rows = [
        (1, _EN),                                # survives everything
        (2, _EN + " extra tail words here"),     # near-dup of 1 -> dropped
        (3, "El la los que y en un por " * 4),   # not English
        (4, "the " + "!!!! " * 12),              # English-markered junk: low quality
        (5, _EN.upper()),                        # exact dup of 1 (normalizes equal)
        (6, "a completely different document about the weather and the "
            "sea and the long quiet road to the north of the old town "
            "where the light is soft in the morning for a while"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stage_flags(spark):
    flags = {
        r.doc_id: r
        for r in flag_stages(_docs(spark), min_quality=0.4, min_tokens=10).collect()
    }
    assert flags[3].lang_pred != "en" and not flags[3].pass_lang
    assert not flags[4].pass_quality  # junk fails quality/token floor
    # doc 5 normalizes to doc 1's text: only the min id survives exact dedup
    assert flags[1].pass_exact and not flags[5].pass_exact
    assert flags[6].pass_exact


def test_curate_keeps_min_id_and_funnel_adds_up(spark):
    curated, funnel = curate_corpus(
        _docs(spark), min_quality=0.4, min_tokens=10, jaccard_threshold=0.5
    )
    kept = {r.doc_id for r in curated.collect()}
    # 2 is a near-dup of 1 (higher id dropped); 5 an exact dup of 1
    assert kept == {1, 6}
    stages = {r.stage: r.n_docs for r in funnel.collect()}
    assert stages == {
        "0_input": 6,
        "1_lang": 5,   # doc 3 out (Spanish markers win)
        "2_quality": 4,  # doc 4 out (punctuation junk)
        "3_exact_dedup": 3,  # doc 5 out
        "4_near_dedup": 2,  # doc 2 out
    }
    # funnel is monotone non-increasing in stage order
    ordered = [stages[s] for s in sorted(stages)]
    assert ordered == sorted(ordered, reverse=True)


def test_curation_edge_contracts(spark):
    """r10 review edges: NULL text predicts 'und' (not the first
    sorted language); an unsupported target_lang fails fast instead of
    silently curating nothing; an empty corpus reports 0 (not NULL)
    at every funnel stage; non-English targets score stopwords in
    their own language."""
    import pytest

    from business_intelligence_and_data_warehouse_spark.operators.curation import (
        curate_corpus,
        flag_stages,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "the of and to a in is it you that " * 4)],
        "doc_id long, text string",
    )
    flags = {r.doc_id: r for r in flag_stages(docs).collect()}
    assert flags[1].lang_pred == "und"
    assert flags[2].lang_pred == "en"

    with pytest.raises(ValueError, match="target_lang"):
        curate_corpus(docs, target_lang="it")

    empty = spark.createDataFrame([], "doc_id long, text string")
    _curated, funnel = curate_corpus(empty)
    counts = {r.stage: r.n_docs for r in funnel.collect()}
    assert all(v == 0 for v in counts.values()), counts

    # Portuguese text must not be quality-penalized by EN stopwords:
    # same structure, target-language stopwords present
    pt = spark.createDataFrame(
        [(1, "de a o que e do da em um para com uma os no " * 4)],
        "doc_id long, text string",
    )
    q_en_target = flag_stages(pt, target_lang="en").collect()[0].quality
    q_pt_target = flag_stages(pt, target_lang="pt").collect()[0].quality
    assert q_pt_target > q_en_target
