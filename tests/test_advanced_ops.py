"""Edge-case unit tests for the round-3 advanced operators — the
behaviors the DuckDB oracle battery can't isolate: packing boundary
rules, spine fill before the first observation, interval-join boundary
inclusivity across tile edges, and best-copy tie-breaking."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.operators.asof import (
    lookback_window_join,
)
from business_intelligence_and_data_warehouse_spark.operators.dedup import (
    keep_best_dedup,
)
from business_intelligence_and_data_warehouse_spark.operators.packing import (
    pack_sequences,
)
from business_intelligence_and_data_warehouse_spark.operators.timeseries import (
    period_spine_fill,
)


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def _pack_rows(spark, sizes, budget, shards=1):
    df = spark.createDataFrame(
        [("s", i, n) for i, n in enumerate(sizes)],
        "source string, doc_id long, n_tokens int",
    )
    out = pack_sequences(df, budget=budget, shards=shards)
    return {r.doc_id: (r.seq_id, r.seq_fill) for r in out.collect()}


def test_pack_exact_fit_stays_in_bin(spark):
    # 100 + 100 == budget: second doc stays (boundary is >, not >=)
    got = _pack_rows(spark, [100, 100, 1], budget=200)
    assert got[0] == (0, 100)
    assert got[1] == (0, 200)
    assert got[2] == (1, 1)


def test_pack_zero_token_doc_still_opens_its_sequence(spark):
    # "non-empty" is doc count, not fill: a zero-token doc opens seq 0,
    # and the next oversized doc must still split (matches the
    # recursive-CTE oracle, which boundary-tests every non-anchor row)
    got = _pack_rows(spark, [0, 300, 0, 5], budget=200)
    assert got[0] == (0, 0)
    assert got[1] == (1, 300)
    assert got[2] == (2, 0)
    assert got[3] == (2, 5)


def test_pack_oversized_doc_gets_own_sequence(spark):
    got = _pack_rows(spark, [50, 500, 50], budget=200)
    assert got[0] == (0, 50)
    assert got[1] == (1, 500)  # never split, never merged
    assert got[2] == (2, 50)


def test_pack_sharded_respects_budget_within_shard(spark):
    df = spark.range(200).select(
        F.lit("s").alias("source"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 90 + 10).cast("int").alias("n_tokens"),
    )
    out = pack_sequences(df, budget=200, shards=4).collect()
    assert {r.shard for r in out} <= {0, 1, 2, 3}
    # every multi-doc sequence respects the budget (oversized
    # singletons are allowed by contract; none exist here: max 99)
    fills = {}
    for r in out:
        fills.setdefault((r.shard, r.seq_id), []).append(r.n_tokens)
    for docs in fills.values():
        assert sum(docs) <= 200
    # no document lost or duplicated across shards
    assert sorted(r.doc_id for r in out) == list(range(200))


# ---------------------------------------------------------------------------
# period_spine_fill
# ---------------------------------------------------------------------------

def test_spine_fill_null_before_first_observation(spark):
    d = dt.date
    actuals = spark.createDataFrame(
        [
            ("a", d(2024, 1, 1), 10.0),
            ("a", d(2024, 1, 15), 20.0),
            ("b", d(2024, 1, 15), 7.0),
        ],
        "k string, p date, m double",
    )
    out = period_spine_fill(actuals, "k", "p", "m", step_days=7)
    rows = {(r.k, str(r.p)): (r.m, r.m_filled, r.is_gap) for r in out.collect()}
    # dense grid: 3 weeks x 2 keys
    assert len(rows) == 6
    # key b has no observation before Jan 15: filled stays NULL
    assert rows[("b", "2024-01-01")] == (None, None, True)
    assert rows[("b", "2024-01-08")] == (None, None, True)
    assert rows[("b", "2024-01-15")] == (7.0, 7.0, False)
    # key a carries 10.0 across its gap week
    assert rows[("a", "2024-01-08")] == (None, 10.0, True)
    assert rows[("a", "2024-01-15")] == (20.0, 20.0, False)


# ---------------------------------------------------------------------------
# lookback_window_join
# ---------------------------------------------------------------------------

def test_lookback_boundaries_and_tile_crossing(spark):
    ts = dt.datetime
    left = spark.createDataFrame(
        [(1, 7, ts(2024, 1, 1, 10, 0, 30))], "event_id long, u long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (100, 7, ts(2024, 1, 1, 9, 0, 30)),   # == lower bound: excluded
            (101, 7, ts(2024, 1, 1, 9, 0, 31)),   # just inside, previous tile
            (102, 7, ts(2024, 1, 1, 9, 59, 0)),   # previous hour tile
            (103, 7, ts(2024, 1, 1, 10, 0, 30)),  # == left ts: included
            (104, 7, ts(2024, 1, 1, 10, 0, 31)),  # after: excluded
            (105, 8, ts(2024, 1, 1, 10, 0, 0)),   # other key: excluded
        ],
        "rid long, u long, ts timestamp",
    )
    got = lookback_window_join(
        left, right, key="u", left_ts="ts", right_ts="ts", lookback_seconds=3600
    )
    assert sorted(r.r_rid for r in got.collect()) == [101, 102, 103]


# ---------------------------------------------------------------------------
# keep_best_dedup
# ---------------------------------------------------------------------------

def test_keep_best_prefers_score_then_priority(spark):
    docs = spark.createDataFrame(
        [
            (1, "same text", 5, 0.5),
            (2, "same text", 3, 0.9),   # highest score wins
            (3, "same text", 1, 0.9),   # equal score: lower priority wins
            (9, "unique", 2, 0.1),
        ],
        "doc_id long, text string, prio int, score double",
    )
    out = keep_best_dedup(
        docs, score=F.col("score"), priority=F.col("prio")
    ).collect()
    groups = {r.n_copies: r for r in out}
    trio = groups[3]
    assert trio.kept_id == 3  # score 0.9 tie -> prio 1 beats prio 3
    assert trio.kept_priority == 1
    assert trio.dropped_ids == "1,2"
    assert groups[1].kept_id == 9
    assert groups[1].dropped_ids == ""


# ---------------------------------------------------------------------------
# randomized property: packing invariants for any size sequence
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SIZES = st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=24)


def _greedy_reference(sizes, cap):
    """Independent plain-Python reimplementation of the contract."""
    out, seq, fill, ndocs = [], 0, 0, 0
    for n in sizes:
        if ndocs > 0 and fill + n > cap:
            seq, fill, ndocs = seq + 1, 0, 0
        fill += n
        ndocs += 1
        out.append((seq, fill))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sizes=_SIZES)
def test_pack_matches_reference_and_invariants(spark, sizes):
    cap = 200
    got = _pack_rows(spark, sizes, budget=cap)
    ref = _greedy_reference(sizes, cap)
    assert [got[i] for i in range(len(sizes))] == ref
    # invariants: seq ids dense + non-decreasing in doc order; every
    # multi-doc sequence within budget; no doc lost
    seqs = [got[i][0] for i in range(len(sizes))]
    assert seqs[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))
    by_seq: dict[int, list[int]] = {}
    for i, n in enumerate(sizes):
        by_seq.setdefault(seqs[i], []).append(n)
    for docs in by_seq.values():
        if len(docs) > 1:
            assert sum(docs) <= cap


def test_pack_int_group_and_null_tokens(spark):
    """The ADVICE r03 fixes: a NON-STRING group column must round-trip
    through the applyInPandas schema unchanged, and null token counts
    (e.g. size() of a null token array) pack as zero-length documents
    instead of breaking the pandas astype."""
    df = spark.createDataFrame(
        [(7, 0, 100), (7, 1, None), (7, 2, 150), (8, 3, None)],
        "source int, doc_id long, n_tokens int",
    )
    out = pack_sequences(df, budget=200).collect()
    assert {type(r.source) for r in out} == {int}
    got = {r.doc_id: (r.source, r.seq_id, r.seq_fill) for r in out}
    # null -> 0 tokens: doc 1 packs into seq 0 without advancing fill
    assert got[0] == (7, 0, 100)
    assert got[1] == (7, 0, 100)
    # 100 + 150 > budget: doc 2 opens sequence 1
    assert got[2] == (7, 1, 150)
    assert got[3] == (8, 0, 0)


def test_pack_sequences_guards_and_tie_determinism(spark):
    """r10 review edges: negative token counts fail loud (they would
    silently overfill a sequence), shards is validated, and colliding
    ordering keys pack deterministically (total (id, tokens) order)
    regardless of input arrival order."""
    import pytest

    from business_intelligence_and_data_warehouse_spark.operators.packing import (
        pack_sequences,
    )

    neg = spark.createDataFrame(
        [("s", 1, 180), ("s", 2, -100)], "src string, doc_id int, n int"
    )
    with pytest.raises(Exception, match="negative token count"):
        pack_sequences(
            neg, budget=200, group_col="src", id_col="doc_id", tokens_col="n"
        ).collect()

    ok = spark.createDataFrame(
        [("s", 1, 10)], "src string, doc_id int, n int"
    )
    with pytest.raises(ValueError, match="shards"):
        pack_sequences(
            ok, budget=200, group_col="src", id_col="doc_id",
            tokens_col="n", shards=0,
        )

    # id collision: both arrival orders must produce the same packing
    rows = [("s", 1, 150), ("s", 1, 100), ("s", 2, 60)]
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(
            perm, "src string, doc_id int, n int"
        ).repartition(3)
        out = sorted(
            (r.doc_id, r.n, r.seq_id, r.seq_fill)
            for r in pack_sequences(
                df, budget=200, group_col="src", id_col="doc_id",
                tokens_col="n",
            ).collect()
        )
        # total order visits (1,100),(1,150),(2,60): 150+60 > 200 so
        # the last doc opens its own sequence
        assert out == [(1, 100, 0, 100), (1, 150, 1, 150), (2, 60, 2, 60)]
