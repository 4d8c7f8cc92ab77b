"""Streaming-layer behavior tests: micro-batch equivalence, watermark
late-data drops, and the custom stateful operator."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.streaming.stateful import (
    user_running_stats,
)
from business_intelligence_and_data_warehouse_spark.streaming.windows import (
    run_stream_to_table,
    session_windows,
    tumbling_counts,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def _stream(spark, path):
    return spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(path)


T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_streaming_matches_batch(spark, tmp_path):
    path = str(tmp_path / "ev")
    rows = [
        (1, _t(0), 1, "click", 1.0),
        (2, _t(10), 1, "click", 2.0),
        (3, _t(70), 2, "view", 3.0),
    ]
    _write_events(spark, path, rows)
    batch = tumbling_counts(spark.read.parquet(path)).collect()
    stream = run_stream_to_table(
        tumbling_counts(_stream(spark, path)), mode="complete"
    ).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))
    assert len(batch) == 2  # two distinct hours


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode aggregation with a watermark: an event far behind the
    watermark arriving in a later micro-batch is dropped."""
    path = str(tmp_path / "late")
    _write_events(spark, path, [(1, _t(0), 1, "click", 1.0)])

    stream = tumbling_counts(_stream(spark, path), watermark="30 minutes")
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: advance event time far ahead -> watermark passes hour 10
        _write_events(spark, path, [(2, _t(600), 1, "click", 1.0)])
        q.processAllAvailable()
        # batch 3: a LATE event for hour 10 (behind the watermark)
        _write_events(spark, path, [(3, _t(5), 1, "click", 100.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        (r.window_start, r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # hour-10 window was finalized by the watermark with ONE event; the
    # late value=100 event must not appear anywhere
    assert (T0, 1, 1.0) in out
    assert all(r[2] != 100.0 for r in out)


def test_stateful_running_stats_across_batches(spark, tmp_path):
    path = str(tmp_path / "stateful")
    _write_events(spark, path, [(1, _t(0), 7, "click", 1.5), (2, _t(1), 7, "click", 2.5)])
    q = (
        user_running_stats(_stream(spark, path))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_events(spark, path, [(3, _t(2), 7, "click", 6.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT * FROM stateful_out ORDER BY n_events DESC"
    ).collect()
    # state accumulated across micro-batches: final row has all 3 events
    assert rows[0].n_events == 3
    assert abs(rows[0].value_sum - 10.0) < 1e-9


def test_session_window_merge_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0), 1, "a", 1.0),
            (2, dt.datetime(2024, 1, 1, 0, 30), 1, "a", 1.0),   # same session
            (3, dt.datetime(2024, 1, 3, 0, 0), 1, "a", 1.0),    # new session
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = session_windows(df, gap="1 day").orderBy("session_start").collect()
    assert len(out) == 2
    assert out[0].n_events == 2
    # session end = last event + gap
    assert out[0].session_end == dt.datetime(2024, 1, 2, 0, 30)


def test_stream_dedup_across_micro_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps state across micro-batches: a
    redelivery arriving in a LATER batch (within the watermark horizon)
    is still suppressed."""
    from business_intelligence_and_data_warehouse_spark.streaming.dedup import dedup_stream

    path = str(tmp_path / "dedup")
    _write_events(spark, path, [(1, _t(0), 1, "click", 1.0)])
    _write_events(spark, path, [(1, _t(0), 1, "click", 1.0),  # redelivery
                                (2, _t(5), 2, "view", 2.0)])
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")  # force one file per micro-batch
        .parquet(path)
    )
    out = run_stream_to_table(dedup_stream(stream, watermark="1 hour"), mode="append")
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2]


def test_attribution_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join produces exactly the batch result."""
    from business_intelligence_and_data_warehouse_spark.streaming.joins import (
        attribution_join,
        split_views_purchases,
    )

    path = str(tmp_path / "attrib")
    rows = [
        (1, _t(0), 1, "view", 0.0),
        (2, _t(30), 1, "purchase", 9.0),    # within 1h of view 1 -> match
        (3, _t(90), 1, "purchase", 5.0),    # > 1h after view 1 -> no match
        (4, _t(0), 2, "purchase", 7.0),     # other user, no view
        (5, _t(40), 2, "view", 0.0),
        (6, _t(50), 2, "purchase", 3.0),    # within 1h of view 5 -> match
    ]
    _write_events(spark, path, rows)
    batch_df = spark.read.parquet(path)
    b = attribution_join(*split_views_purchases(batch_df)).collect()
    s = run_stream_to_table(
        attribution_join(*split_views_purchases(_stream(spark, path), watermark="2 hours")),
        mode="append",
    ).collect()
    assert sorted(map(tuple, b)) == sorted(map(tuple, s))
    assert sorted((r.view_id, r.purchase_id) for r in b) == [(1, 2), (5, 6)]


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Kill a stream, append more input, restart from the SAME
    checkpoint: the output must contain every input row exactly once
    (no reprocessing of the first batch, no loss of the second)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_events(spark, src, [(1, _t(0), 1, "click", 1.0),
                               (2, _t(1), 1, "view", 2.0)])

    def run_once():
        q = (
            _stream(spark, src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        q.stop()

    run_once()
    # second wave arrives while the stream is down
    _write_events(spark, src, [(3, _t(2), 2, "click", 3.0)])
    run_once()

    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]


# ---------------------------------------------------------------------------
# foreachBatch idempotent upsert sink
# ---------------------------------------------------------------------------

def test_foreach_batch_upsert_accumulates_and_is_idempotent(spark, tmp_path):
    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        _SnapshotStore,
        merge_last_state,
        run_upsert_stream,
    )

    src = str(tmp_path / "src")
    root = str(tmp_path / "sink")
    # two files -> two micro-batches with maxFilesPerTrigger=1: the
    # upsert must accumulate state ACROSS batches
    _write_events(spark, src, [(1, _t(0), 7, "view", 1.0),
                               (2, _t(1), 8, "view", 2.0)])
    _write_events(spark, src, [(3, _t(2), 7, "click", 3.0)])
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    out = run_upsert_stream(
        stream.withColumn("_ord", key), spark,
        key_cols=["user_id"], order_col="_ord", root=root,
    )
    state = {r.user_id: (r.event_id, r.event_type) for r in out.collect()}
    assert state == {7: (3, "click"), 8: (2, "view")}

    store = _SnapshotStore(spark, root)
    state_file = store._state()
    assert state_file is not None and int(state_file["batch_id"]) >= 1
    before = sorted(map(tuple, store.read().collect()))

    # re-running the SAME stream over the same checkpoint is a no-op
    stream2 = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out2 = run_upsert_stream(
        stream2.withColumn("_ord", key), spark,
        key_cols=["user_id"], order_col="_ord", root=root,
    )
    assert sorted(map(tuple, out2.collect())) == before

    # merge_last_state replay of an ALREADY-APPLIED batch is also a
    # no-op by construction (belt and braces under the ledger)
    replay = merge_last_state(
        store.read(),
        spark.createDataFrame(
            [(3, _t(2), 7, "click", 3.0)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        ).withColumn("_ord", key),
        ["user_id"],
        "_ord",
    )
    assert sorted(map(tuple, replay.drop("_rn", "_ord").collect())) == sorted(
        map(tuple, store.read().drop("_ord").collect())
    )


def test_foreach_batch_upsert_survives_checkpoint_reset(spark, tmp_path):
    """Batch ids restart at 0 when the checkpoint is wiped; the
    lineage-scoped ledger must APPLY those batches (new lineage), not
    skip them as 'already seen ids'."""
    import shutil

    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        run_upsert_stream,
    )

    src = str(tmp_path / "src")
    root = str(tmp_path / "sink")
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        return run_upsert_stream(
            stream.withColumn("_ord", key), spark,
            key_cols=["user_id"], order_col="_ord", root=root,
        )

    _write_events(spark, src, [(1, _t(0), 7, "view", 1.0)])
    run()
    # ops recovery: checkpoint wiped, snapshot survives, new data lands
    shutil.rmtree(str(tmp_path / "sink" / "_checkpoint"))
    _write_events(spark, src, [(2, _t(5), 7, "click", 2.0)])
    out = run()  # fresh lineage re-reads src from scratch: ids 0..N again
    state = {r.user_id: (r.event_id, r.event_type) for r in out.collect()}
    # the new event must NOT have been dropped by a stale-id skip
    assert state == {7: (2, "click")}


def test_checkpoint_lineage_fallback_is_per_checkpoint(tmp_path):
    """When checkpoint metadata is unreadable, the fallback must mint a
    DISTINCT persistent token per checkpoint — a shared constant would
    merge two rebuilt lineages into one ledger scope and silently skip
    the second stream's early batches."""
    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        _checkpoint_lineage,
    )

    a = str(tmp_path / "ckpt_a")
    b = str(tmp_path / "ckpt_b")
    la1, la2 = _checkpoint_lineage(a), _checkpoint_lineage(a)
    lb = _checkpoint_lineage(b)
    assert la1 == la2, "token must be stable for the same checkpoint"
    assert la1 != lb, "distinct checkpoints must never share a lineage"
    assert la1 and la1 != "unknown-lineage"


def test_scd2_stream_incremental_loads_version_correctly(spark, tmp_path):
    """The streaming SCD2 sink must version across RESUMED runs: a
    second run from the same checkpoint sees only the new file, merges
    its load periods on top of the committed snapshot, and produces
    the same dimension a single batch replay would."""
    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        run_scd2_stream,
    )

    src = str(tmp_path / "src")
    root = str(tmp_path / "dim")
    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )

    def run():
        updates = _stream(spark, src).select(
            "user_id",
            "event_type",
            "value",
            F.to_date(F.date_trunc("week", F.col("ts"))).alias("load_date"),
            key.alias("_ord"),
        )
        return run_scd2_stream(
            updates, spark,
            nat_key=["user_id"], tracked=["event_type", "value"],
            load_date_col="load_date", order_col="_ord", root=root,
        )

    # week 1: two updates for user 7 in one period -> last one wins
    _write_events(spark, src, [
        (1, _t(0), 7, "view", 1.0),
        (2, _t(5), 7, "click", 2.0),
    ])
    dim1 = {(r.user_id, r.version): r for r in run().collect()}
    assert set(dim1) == {(7, 1)}
    assert dim1[(7, 1)].event_type == "click"
    assert str(dim1[(7, 1)].effective_to) == "2099-12-31"

    # week 2 (7 days later): changed state -> close v1, open v2;
    # plus a brand-new user
    _write_events(spark, src, [
        (3, _t(7 * 24 * 60), 7, "purchase", 9.0),
        (4, _t(7 * 24 * 60 + 1), 8, "view", 0.5),
    ])
    dim2 = {(r.user_id, r.version): r for r in run().collect()}
    assert set(dim2) == {(7, 1), (7, 2), (8, 1)}
    v1, v2 = dim2[(7, 1)], dim2[(7, 2)]
    assert v1.effective_to == v2.effective_from  # window chains
    assert v2.event_type == "purchase"
    assert str(v2.effective_to) == "2099-12-31"
    assert dim2[(8, 1)].event_type == "view"

    # a LATER batch redelivering an OLDER week-2 event for user 7 must
    # NOT regress the open version: the persisted last-per-period state
    # resolves max order ACROSS batches, not within one
    # week 2 begins at _t(7*24*60 - 600) (T0 is Mon 10:00); this event
    # is inside week 2 but BEFORE event 3, so its order key is lower
    _write_events(spark, src, [
        (5, _t(7 * 24 * 60 - 300), 7, "stale", -1.0),
    ])
    dim3 = {(r.user_id, r.version): r for r in run().collect()}
    assert dim3[(7, 2)].event_type == "purchase", (
        "stale cross-batch redelivery regressed the dimension"
    )
    assert set(dim3) == set(dim2)


# ---------------------------------------------------------------------------
# streaming near-dup gate: accept-novel crawl loop + idempotence
# ---------------------------------------------------------------------------

def _write_docs(spark, src_dir, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("append").parquet(src_dir)


def test_neardup_gate_accept_novel_across_batches(spark, tmp_path):
    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        run_neardup_filter_stream,
    )

    src = str(tmp_path / "docs")
    root = str(tmp_path / "gate")
    corpus = spark.createDataFrame(
        [(100, "the quick brown fox jumps over dogs")],
        "doc_id long, text string",
    )
    # batch 1: one novel doc; batch 2: a near-copy of BATCH 1's doc —
    # only the accept-novel loop can classify it as a near_dup
    novel_text = "completely new content alpha beta gamma delta"
    _write_docs(spark, src, [(1, novel_text)])
    _write_docs(spark, src, [(2, novel_text + " epsilon")])
    schema = spark.read.parquet(src).schema

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return run_neardup_filter_stream(
            stream, spark, corpus, root,
            k=3, threshold=0.5, max_df=50, accept_novel=True,
        )

    got = {r.doc_id: r for r in run().collect()}
    assert got[1].verdict == "novel"
    # doc 2 arrives in the SECOND micro-batch (maxFilesPerTrigger=1,
    # one file per write) and must near-dup against batch 1's ACCEPTED
    # novel doc — the corpus-growth half of the crawl loop
    assert got[2].verdict == "near_dup"
    assert got[2].match_id == 1

    # re-run over the same checkpoint: everything is already applied,
    # verdicts must not duplicate
    again = run().collect()
    assert len(again) == len(got)


def test_neardup_gate_fixed_corpus_matches_batch_classifier(spark, tmp_path):
    from business_intelligence_and_data_warehouse_spark.operators.dedup import (
        incremental_dedup,
    )
    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        run_neardup_filter_stream,
    )

    src = str(tmp_path / "docs")
    root = str(tmp_path / "gate")
    corpus = spark.createDataFrame(
        [
            (100, "aa bb cc dd ee ff"),
            (101, "gg hh ii jj kk ll"),
        ],
        "doc_id long, text string",
    )
    batch_rows = [
        (1, "aa bb cc dd ee ff"),        # exact dup of 100
        (2, "aa bb cc dd ee zz"),        # near dup of 100
        (3, "mm nn oo pp qq rr"),        # novel
    ]
    _write_docs(spark, src, batch_rows)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    got = sorted(
        run_neardup_filter_stream(
            stream, spark, corpus, root, k=3, threshold=0.3, max_df=50
        ).collect()
    )
    want = sorted(
        incremental_dedup(
            spark.createDataFrame(batch_rows, "doc_id long, text string"),
            corpus,
            k=3,
            threshold=0.3,
            max_df=50,
        ).collect()
    )
    assert got == want


def test_neardup_gate_survives_checkpoint_reset(spark, tmp_path):
    """Deleting the checkpoint (lineage reset) defeats the batch-id
    ledger — the KEYED verdict append must still converge: no
    duplicate verdict rows, no self-exact-dup reclassification of
    replayed docs, and the accepted corpus unchanged."""
    import shutil as sh

    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        run_neardup_filter_stream,
    )

    src = str(tmp_path / "docs")
    root = str(tmp_path / "gate")
    corpus = spark.createDataFrame(
        [(100, "the quick brown fox jumps over dogs")],
        "doc_id long, text string",
    )
    _write_docs(spark, src, [(1, "completely new content alpha beta gamma")])
    schema = spark.read.parquet(src).schema

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        return run_neardup_filter_stream(
            stream, spark, corpus, root, k=3, threshold=0.5,
            max_df=50, accept_novel=True,
        )

    first = sorted(map(tuple, run().collect()))
    assert len(first) == 1 and first[0][1] == "novel"

    # reset the lineage: batch ids restart at 0, already_applied is
    # False for the replayed batch
    sh.rmtree(str(tmp_path / "gate" / "_checkpoint"), ignore_errors=True)
    second = sorted(map(tuple, run().collect()))
    assert second == first, (
        "checkpoint-reset replay duplicated or re-classified verdicts"
    )


def test_quantile_sketch_stream_equals_batch_and_survives_reset(spark, tmp_path):
    """The streamed bottom-k sketch must equal the one-shot batch
    sketch after all batches, and a checkpoint-lineage reset (batch
    ids restart, source replays) must rebuild to the SAME sketch —
    the counting-class reset discards state instead of double-merging."""
    import shutil as sh

    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        quantile_sketch_build,
    )
    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        run_quantile_sketch_stream,
    )

    rows = [(i, float((i * 37) % 500)) for i in range(400)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    src = str(tmp_path / "src")
    root = str(tmp_path / "store")
    df.repartition(3).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return run_quantile_sketch_stream(
            stream, spark, "value", "event_id", 64, root
        )

    want = sorted(
        (r.priority, r.value)
        for r in quantile_sketch_build(df, "value", F.col("event_id"), k=64).collect()
    )
    got1 = sorted((r.priority, r.value) for r in run().collect())
    assert got1 == want
    # no new files: re-running the stream must not change the sketch
    got2 = sorted((r.priority, r.value) for r in run().collect())
    assert got2 == want
    # lineage reset: replayed batches rebuild the identical sketch
    sh.rmtree(str(tmp_path / "store" / "_checkpoint"), ignore_errors=True)
    got3 = sorted((r.priority, r.value) for r in run().collect())
    assert got3 == want


def test_neardup_gate_accept_novel_off_preserves_accepted_corpus(
    spark, tmp_path
):
    """A later run with accept_novel=False (the default) against a root
    whose corpus snapshot holds accepted novel docs must NOT destroy
    that corpus: the TwinStore commit carries forward snapshots it does
    not overwrite."""
    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        _TwinStore,
        run_neardup_filter_stream,
    )

    root = str(tmp_path / "gate")
    corpus = spark.createDataFrame(
        [(100, "the quick brown fox jumps over dogs")],
        "doc_id long, text string",
    )
    novel_text = "completely new content alpha beta gamma delta"
    src1 = str(tmp_path / "docs1")
    _write_docs(spark, src1, [(1, novel_text)])
    schema = spark.read.parquet(src1).schema
    run_neardup_filter_stream(
        spark.readStream.schema(schema).parquet(src1), spark, corpus, root,
        accept_novel=True,
    )
    accepted = {r.doc_id for r in _TwinStore(spark, root).read("corpus").collect()}
    assert accepted == {100, 1}

    # a NEW batch appended to the same source (the root's checkpoint
    # pins the source path), processed with accept_novel omitted:
    # the commit names only the verdicts frame
    _write_docs(spark, src1, [(2, "unrelated brand new words zeta eta")])
    run_neardup_filter_stream(
        spark.readStream.schema(schema).parquet(src1), spark, corpus, root,
    )
    # the accepted corpus snapshot must still exist and be readable
    after = _TwinStore(spark, root).read("corpus")
    assert after is not None
    assert {r.doc_id for r in after.collect()} == {100, 1}


def test_cms_stream_merged_sketch_keeps_build_metadata(spark, tmp_path):
    """The multi-batch cellwise-add merge must re-attach depth/width
    metadata so persisted stream sketches keep the hard probe-side
    parameter assert (a bare re-alias strips it)."""
    import pytest as _pytest

    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        cms_estimate,
    )
    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        run_cms_stream,
    )

    src = str(tmp_path / "events")
    root = str(tmp_path / "cms")
    for batch in range(2):  # two files -> two micro-batches
        spark.createDataFrame(
            [(f"k{i % 5}",) for i in range(batch * 20, batch * 20 + 20)],
            "user_id string",
        ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cms = run_cms_stream(stream, spark, "user_id", 4, 1024, root)
    meta = cms.schema["cnt"].metadata
    assert meta == {"depth": 4, "width": 1024}
    # and therefore a mismatched probe fails LOUDLY, not structurally
    probes = spark.createDataFrame([("k0",)], "user_id string")
    with _pytest.raises(ValueError, match="build"):
        cms_estimate(probes, "user_id", cms, 4, 2048)


def test_bucketed_upsert_matches_plain_and_skips_untouched_buckets(
    spark, tmp_path
):
    """The bucketed partial-rewrite store must (a) produce IDENTICAL
    final state to the plain full-rewrite store, and (b) leave every
    UNTOUCHED bucket's files byte-identical across a batch — the
    property that bounds per-batch IO by |touched buckets| instead of
    |state| (the SCALE.md ~25-30M-row crossover mitigation)."""
    import hashlib
    import os

    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        _BucketStore,
        run_upsert_stream,
    )

    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )

    def run(root, src, bucket_count):
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return run_upsert_stream(
            stream.withColumn("_ord", key), spark,
            key_cols=["user_id"], order_col="_ord", root=root,
            bucket_count=bucket_count,
        )

    # batch 1: users 1..40 (spread over the 16 buckets); batch 2
    # updates ONE user, so most buckets must go untouched
    src = str(tmp_path / "src")
    _write_events(
        spark, src,
        [(u, _t(u), u, "view", float(u)) for u in range(1, 41)],
    )
    _write_events(spark, src, [(100, _t(100), 7, "click", 9.0)])

    plain = run(str(tmp_path / "plain"), src, None)
    brt = str(tmp_path / "bucketed")
    bucketed = run(brt, src, 16)
    want = sorted(map(tuple, plain.drop("_ord").collect()))
    assert sorted(map(tuple, bucketed.drop("_ord").collect())) == want
    assert {r.user_id: r.event_id for r in bucketed.collect()}[7] == 100

    # replay the second run over the same root/checkpoint: ledger no-op
    again = run(brt, src, 16)
    assert sorted(map(tuple, again.drop("_ord").collect())) == want

    # now drive a THIRD batch through the same root and prove the
    # untouched buckets' files are the SAME BYTES at the same paths
    store = _BucketStore(spark, brt, 16)
    paths_before = store.bucket_paths()

    def dir_digest(d):
        out = {}
        for r, _, fs in os.walk(d):
            for f in sorted(fs):
                p = os.path.join(r, f)
                out[os.path.relpath(p, d)] = hashlib.md5(
                    open(p, "rb").read()
                ).hexdigest()
        return out

    digests_before = {b: dir_digest(p) for b, p in paths_before.items()}
    _write_events(spark, src, [(101, _t(101), 8, "click", 10.0)])
    run(brt, src, 16)

    touched_bucket = spark.createDataFrame(
        [(8,)], "user_id long"
    ).select(
        F.pmod(F.xxhash64("user_id"), F.lit(16)).cast("int").alias("b")
    ).collect()[0].b
    paths_after = store.bucket_paths()
    changed = {
        b for b in paths_before
        if paths_after[b] != paths_before[b]
        or dir_digest(paths_after[b]) != digests_before[b]
    }
    assert changed == {touched_bucket}, changed
    # untouched buckets carried forward BY REFERENCE (same path)
    for b, p in paths_before.items():
        if b != touched_bucket:
            assert paths_after[b] == p
    # and the merged state is still right
    final = {r.user_id: r.event_id for r in store.read().collect()}
    assert final[8] == 101 and final[7] == 100 and len(final) == 40


def test_bucket_store_rejects_geometry_and_layout_mismatch(spark, tmp_path):
    """Reopening a bucketed root with a DIFFERENT bucket_count would
    look keys up in the wrong bucket and silently break the one-row-
    per-key contract (the stale row stays referenced in its old
    bucket); a root written by the PLAIN store is equally foreign.
    Both must fail loud (r10 review finding)."""
    import pytest

    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        _BucketStore,
        run_upsert_stream,
    )

    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )

    def run(root, src, bucket_count):
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return run_upsert_stream(
            stream.withColumn("_ord", key), spark,
            key_cols=["user_id"], order_col="_ord", root=root,
            bucket_count=bucket_count,
        )

    src = str(tmp_path / "src")
    _write_events(spark, src, [(1, _t(0), 7, "view", 1.0)])

    broot = str(tmp_path / "bucketed")
    run(broot, src, 16)
    with pytest.raises(ValueError, match="bucket_count=16"):
        _BucketStore(spark, broot, 8)._state()
    # same count reopens fine
    assert _BucketStore(spark, broot, 16)._state() is not None

    proot = str(tmp_path / "plain")
    run(proot, src, None)
    with pytest.raises(ValueError, match="not a bucketed"):
        _BucketStore(spark, proot, 16)._state()


def test_rebucket_snapshot_resizes_and_stream_resumes(spark, tmp_path):
    """The offline resize the geometry guard points at: rebucket the
    root, state identical row-for-row under the new layout, ledger
    carried over (no batch replays), and the stream RESUMES against
    the resized root with the new bucket_count."""
    import pytest

    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        _BucketStore,
        rebucket_snapshot,
        run_upsert_stream,
    )

    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )

    def run(root, src, bucket_count):
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return run_upsert_stream(
            stream.withColumn("_ord", key), spark,
            key_cols=["user_id"], order_col="_ord", root=root,
            bucket_count=bucket_count,
        )

    src = str(tmp_path / "src")
    _write_events(
        spark, src, [(u, _t(u), u, "view", float(u)) for u in range(1, 21)]
    )
    root = str(tmp_path / "sink")
    before = sorted(
        map(tuple, run(root, src, 16).drop("_ord").collect())
    )

    old, new = rebucket_snapshot(spark, root, 4)
    assert (old, new) == (16, 4)
    store = _BucketStore(spark, root, 4, key_cols=["user_id"])
    assert sorted(map(tuple, store.read().drop("_ord").collect())) == before
    assert len(store.bucket_paths()) <= 4
    # old geometry now correctly refuses
    with pytest.raises(ValueError, match="bucket_count=4"):
        _BucketStore(spark, root, 16)._state()
    # a different key set refuses too
    with pytest.raises(ValueError, match="keyed on"):
        _BucketStore(spark, root, 4, key_cols=["event_id"])._state()

    # the stream resumes with the NEW count: deliver one more file
    _write_events(spark, src, [(100, _t(100), 7, "click", 9.0)])
    after = run(root, src, 4)
    final = {r.user_id: r.event_id for r in after.collect()}
    assert final[7] == 100 and len(final) == 20


# ---------------------------------------------------------------------------
# randomized property: bucketed == plain == reference for ANY batch sequence
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_UKEYS = st.integers(min_value=1, max_value=9)
_UVALS = st.integers(min_value=0, max_value=99)
_UBATCH = st.dictionaries(_UKEYS, _UVALS, min_size=1, max_size=5)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(_UBATCH, min_size=1, max_size=4))
def test_bucketed_upsert_equals_plain_for_any_batch_sequence(
    spark, tmp_path_factory, batches
):
    """For ANY batch sequence the bucketed partial-rewrite store must
    end in exactly the state the plain full-rewrite store ends in,
    which must equal the last-write-wins dict — including redelivery
    (every batch is applied twice under the same (lineage, batch_id),
    which the ledger must no-op) and multi-bucket spreads."""
    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        _BucketStore,
        _SnapshotStore,
        _upsert_batch_bucketed,
        merge_last_state,
    )

    tmp = tmp_path_factory.mktemp("ubx")
    plain = _SnapshotStore(spark, str(tmp / "plain"))
    bucketed = _BucketStore(spark, str(tmp / "bucketed"), 4, key_cols=["k"])
    reference: dict[int, tuple[int, str]] = {}
    for i, batch in enumerate(batches):
        rows = [(k, v, f"{i:04d}-{k:04d}") for k, v in batch.items()]
        bdf = spark.createDataFrame(rows, "k int, v int, _ord string")
        for _redelivery in range(2):  # second apply must be a no-op
            if not plain.already_applied("L", i):
                plain.commit(
                    merge_last_state(plain.read(), bdf, ["k"], "_ord"),
                    "L",
                    i,
                )
            _upsert_batch_bucketed(bucketed, bdf, ["k"], "_ord", "L", i)
        for k, v in batch.items():
            reference[k] = (v, f"{i:04d}-{k:04d}")

    want = sorted((k, v, o) for k, (v, o) in reference.items())
    got_plain = sorted(map(tuple, plain.read().collect()))
    got_bucketed = sorted(map(tuple, bucketed.read().collect()))
    assert got_plain == want
    assert got_bucketed == want
