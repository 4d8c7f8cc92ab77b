"""Behavioral tests for the round-2 extension operators, checked
against INDEPENDENT reference implementations (pandas merge_asof, a
per-row python sessionizer, full-recompute aggregation) rather than
the same SQL restated."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.operators.asof import (
    asof_join_backward,
)
from business_intelligence_and_data_warehouse_spark.operators.incremental import (
    merge_partial_aggs,
    partial_aggs,
    present,
)
from business_intelligence_and_data_warehouse_spark.operators.sessions import (
    sessionize,
)

T0 = dt.datetime(2024, 1, 1)


def _random_events(rng, n, n_users=5):
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                T0 + dt.timedelta(minutes=rng.randrange(0, 10_000)),
                rng.randrange(n_users),
                rng.choice(["view", "purchase"]),
                float(rng.randrange(100)),
            )
        )
    return rows


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    rng = random.Random(seed)
    rows = _random_events(rng, 300)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    views = (
        df.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    purchases = df.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    got = {
        r.event_id: r.asof_view_event_id
        for r in asof_join_backward(
            purchases, views, "user_id", "ts", ["view_event_id"], "event_id"
        ).collect()
    }

    vp = views.toPandas().sort_values(["ts", "user_id"])
    pp = purchases.toPandas().sort_values(["ts", "event_id"])
    if len(vp) and len(pp):
        merged = pd.merge_asof(
            pp, vp, on="ts", by="user_id", direction="backward"
        )
        expect = {
            int(r.event_id): (
                None if pd.isna(r.view_event_id) else int(r.view_event_id)
            )
            for r in merged.itertuples()
        }
        assert got == expect


@pytest.mark.parametrize("seed", [3, 11])
def test_sessionize_matches_per_row_reference(spark, seed):
    rng = random.Random(seed)
    rows = _random_events(rng, 200, n_users=3)
    gap_s = 3600
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {
        r.event_id: r.session_seq
        for r in sessionize(df, gap_seconds=gap_s).collect()
    }
    # independent per-row reference
    by_user: dict[int, list] = {}
    for eid, ts, uid, _, _ in rows:
        by_user.setdefault(uid, []).append((ts, eid))
    expect = {}
    for uid, evs in by_user.items():
        seq, prev = 0, None
        for ts, eid in sorted(evs):
            if prev is None or (ts - prev).total_seconds() > gap_s:
                seq += 1
            expect[eid] = seq
            prev = ts
    assert got == expect


@pytest.mark.parametrize("cut", [0.0, 0.3, 0.5, 1.0])
def test_incremental_merge_equals_full_recompute(spark, cut):
    """Partial(base) ⊕ partial(delta) == partial(all) for EVERY split
    point — including empty base and empty delta."""
    rng = random.Random(13)
    rows = [
        (rng.randrange(5), float(rng.randrange(10_000)) / 100) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "k int, amount double")
    n_base = int(len(rows) * cut)
    base = spark.createDataFrame(rows[:n_base] or [], "k int, amount double")
    delta = spark.createDataFrame(rows[n_base:] or [], "k int, amount double")
    merged = present(
        merge_partial_aggs(
            [partial_aggs(base, ["k"], "amount"), partial_aggs(delta, ["k"], "amount")]
        )
    )
    full = present(partial_aggs(df, ["k"], "amount"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_chunk_documents_overlap_invariants(spark):
    from business_intelligence_and_data_warehouse_spark.operators.corpus_quality import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(70))),  # 3 windows
            (2, "only five little tokens here"),  # shorter than one window
            (3, " ".join(f"x{i}" for i in range(32))),  # exactly one window
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=32, overlap=8)
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens) for r in out.collect())
    )
    by_doc = {}
    for d, i, t, n in rows:
        by_doc.setdefault(d, []).append((i, t.split(" "), n))
    # doc 1: ceil((70-8)/24) = 3 chunks; consecutive chunks share 8 toks
    assert [i for i, _, _ in by_doc[1]] == [0, 1, 2]
    assert by_doc[1][0][1][24:] == by_doc[1][1][1][:8]
    assert by_doc[1][1][1][24:] == by_doc[1][2][1][:8]
    # full coverage: last chunk ends at token 69 with length 70-48=22
    assert by_doc[1][2][2] == 22 and by_doc[1][2][1][-1] == "w69"
    # short doc -> exactly one whole-doc chunk
    assert by_doc[2] == [(0, "only five little tokens here".split(), 5)]
    # exact-fit doc -> one chunk, no empty tail window
    assert len(by_doc[3]) == 1 and by_doc[3][0][2] == 32


@pytest.mark.parametrize("cut", [0.0, 0.3, 0.7, 1.0])
def test_counting_ivm_equals_full_recompute(spark, cut):
    """apply(view(base), delta(insert+delete+update)) == view(final)
    for EVERY split point, including empty base and empty delta —
    the multiset algebra must converge to the recompute exactly."""
    import random

    from business_intelligence_and_data_warehouse_spark.operators.incremental import (
        apply_multiset_delta,
        join_delta_counting,
    )

    rng = random.Random(29)
    n = 300
    # final left rows; base = a prefix of them plus soon-to-be-deleted
    # and pre-update rows, delta = the signed difference
    final_l = [(i, rng.randrange(40), f"p{rng.randrange(5)}") for i in range(n)]
    n_base = int(n * cut)
    deleted = [(10_000 + i, rng.randrange(40), "dead") for i in range(20)]
    upd_ids = [i for i in range(n_base) if i % 9 == 0]
    base_l = (
        [
            (i, k, ("old" if i in set(upd_ids) else p))
            for i, k, p in final_l[:n_base]
        ]
        + deleted
    )
    delta_l = (
        [(i, k, p, 1) for i, k, p in final_l[n_base:]]
        + [(i, k, p, -1) for i, k, p in deleted]
        + [
            (i, k, "old", -1)
            for i, k, p in final_l[:n_base]
            if i in set(upd_ids)
        ]
        + [(i, k, p, 1) for i, k, p in final_l[:n_base] if i in set(upd_ids)]
    )
    final_r = [(k, f"seg{k % 3}") for k in range(40)]
    base_r = final_r[: int(40 * cut)] + [(90 + j, "gone") for j in range(4)]
    delta_r = [(k, s, 1) for k, s in final_r[int(40 * cut):]] + [
        (90 + j, "gone", -1) for j in range(4)
    ]

    L_SCHEMA, R_SCHEMA = "id long, k long, p string", "k long, seg string"
    bl = spark.createDataFrame(base_l or [], L_SCHEMA).withColumn("_m", F.lit(1).cast("long"))
    dl = spark.createDataFrame(delta_l or [], L_SCHEMA + ", _m long")
    br = spark.createDataFrame(base_r or [], R_SCHEMA).withColumn("_m", F.lit(1).cast("long"))
    dr = spark.createDataFrame(delta_r or [], R_SCHEMA + ", _m long")

    view0 = (
        bl.withColumnRenamed("_m", "_ml")
        .join(br.withColumnRenamed("_m", "_mr"), "k")
        .withColumn("_m", F.col("_ml") * F.col("_mr"))
        .drop("_ml", "_mr")
    )
    delta = join_delta_counting(bl, dl, br, dr, on="k")
    got = apply_multiset_delta(view0, delta)

    fl = spark.createDataFrame(final_l, L_SCHEMA)
    fr = spark.createDataFrame(final_r, R_SCHEMA)
    want = fl.join(fr, "k").withColumn("_m", F.lit(1).cast("long"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_counting_ivm_reserved_column_guards(spark):
    from business_intelligence_and_data_warehouse_spark.operators.incremental import (
        join_delta,
        join_delta_counting,
    )

    df = spark.createDataFrame([(1, 1)], "k int, v int")
    tagged = df.withColumn("src", F.lit("x"))
    with pytest.raises(ValueError, match="reserved column"):
        join_delta(tagged, df, df, df, on="k")
    with pytest.raises(ValueError, match="missing multiplicity"):
        join_delta_counting(df, df, df, df, on="k")
