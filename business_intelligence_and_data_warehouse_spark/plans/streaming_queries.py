"""Driver-checkable streaming-layer queries.

The windowed operators run in BATCH mode against the same DuckDB
oracle (unified Dataset semantics), and `stream_tumbling_live`
additionally executes the real readStream -> watermark -> memory-sink
path and must produce the identical result — the strongest check that
the streaming plumbing computes what the batch semantics promise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from ..streaming.dedup import (
    dedup_batch,
    dedup_stream,
    delivery_counts,
    redeliver,
)
from ..streaming.joins import attribution_join, split_views_purchases
from ..streaming.windows import (
    read_event_stream,
    run_stream_to_table,
    session_windows,
    sliding_sums,
    tumbling_counts,
)
from .queries import ORACLES, query_fn

def _fresh_result_dir(tag: str) -> str:
    """Unique materialization dir PER INVOCATION — see
    operators/caching.scratch_dir (the one shared copy of the
    per-process scratch-parent pattern)."""
    from ..operators.caching import scratch_dir

    return scratch_dir(tag)

_O_EV = "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)"
_O_VSUM = "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"

_O_TUMBLING = f"""
WITH {_O_EV}
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {_O_VSUM} AS value_sum
FROM ev
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


@query_fn("stream_tumbling_counts", oracle=_O_TUMBLING)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window counts/sums per event type (batch mode)."""
    events = load_table(spark, sf_dir, "events")
    return tumbling_counts(events).orderBy("window_start", "event_type")


@query_fn("stream_tumbling_live", oracle=_O_TUMBLING)
def stream_tumbling_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME tumbling aggregation executed as a real Structured
    Streaming query (readStream -> watermark -> memory sink, availableNow
    trigger) — results must match the batch oracle exactly."""
    stream = read_event_stream(spark, sf_dir)
    out = run_stream_to_table(tumbling_counts(stream), mode="complete")
    return out.orderBy("window_start", "event_type")


@query_fn(
    "stream_tumbling_append_live",
    oracle=f"""
WITH {_O_EV},
mx AS (SELECT MAX(ts) AS m FROM ev),
agg AS (
  SELECT date_trunc('hour', ts) AS window_start,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
         event_type,
         COUNT(*) AS n_events,
         {_O_VSUM} AS value_sum
  FROM ev
  GROUP BY 1, 2, 3
)
SELECT window_start, window_end, event_type, n_events, value_sum
FROM agg CROSS JOIN mx
WHERE window_end <= m - INTERVAL 30 MINUTE
ORDER BY window_start, event_type
""",
)
def stream_tumbling_append_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling aggregation in APPEND output mode — the PRODUCTION
    streaming path: a window is emitted exactly once, when the
    watermark (max event time − 30 min) passes its end, and its state
    is evicted.  Complete mode (stream_tumbling_live) re-emits the
    whole result table per trigger and keeps all windows in state —
    fine for a dashboard sink, unbounded for a pipeline; append is
    what a parquet/kafka sink consumes.  Determinism: with
    availableNow the final watermark is max(ts) − 30 min, so the
    emitted set is exactly the windows whose end precedes it — which
    is what the oracle computes (the still-open tail windows are
    correctly withheld)."""
    stream = read_event_stream(spark, sf_dir)
    out = run_stream_to_table(tumbling_counts(stream), mode="append")
    return out.orderBy("window_start", "event_type")


# slide expansion shared by the batch/complete and append oracles —
# ONE copy so the window/slide arithmetic cannot desynchronize
_O_SLIDE_EXPANDED = """
expanded AS (
  SELECT make_timestamp(
           (epoch_us(ts) // 900000000) * 900000000 - k.k * 900000000
         ) AS window_start,
         value
  FROM ev CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
)"""

_O_SLIDING = f"""
WITH {_O_EV},{_O_SLIDE_EXPANDED}
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS n_events,
       {_O_VSUM} AS value_sum
FROM expanded
GROUP BY 1, 2
ORDER BY window_start
"""


@query_fn("stream_sliding_sums", oracle=_O_SLIDING)
def stream_sliding_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/15min window totals (each event in 4 windows)."""
    events = load_table(spark, sf_dir, "events")
    return sliding_sums(events).orderBy("window_start")


@query_fn("stream_sliding_live", oracle=_O_SLIDING)
def stream_sliding_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME sliding aggregation executed as a real Structured
    Streaming query (readStream -> memory sink, availableNow trigger,
    complete mode) — the overlapping-window state path that
    stream_tumbling_live exercises for tumbling windows; results must
    match the batch oracle exactly."""
    stream = read_event_stream(spark, sf_dir)
    out = run_stream_to_table(sliding_sums(stream), mode="complete")
    return out.orderBy("window_start")


@query_fn(
    "stream_sliding_append_live",
    oracle=f"""
WITH {_O_EV},
mx AS (SELECT MAX(ts) AS m FROM ev),{_O_SLIDE_EXPANDED}
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS n_events,
       {_O_VSUM} AS value_sum
FROM expanded CROSS JOIN mx
WHERE window_start + INTERVAL 1 HOUR <= m - INTERVAL 30 MINUTE
GROUP BY window_start, mx.m
ORDER BY window_start
""",
)
def stream_sliding_append_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows in APPEND output mode — overlapping windows
    close STAGGERED: each slide's window is emitted exactly once when
    the watermark (max event time − 30 min) passes its end, so at any
    moment window/slide windows are open concurrently and state is
    bounded by that overlap count, not history length.  With
    availableNow the emitted set is exactly the windows whose end
    precedes the final watermark — the oracle's cut (the same
    emission contract stream_tumbling_append_live pins for the
    non-overlapping case)."""
    stream = read_event_stream(spark, sf_dir)
    out = run_stream_to_table(sliding_sums(stream), mode="append")
    return out.orderBy("window_start")


_O_SESSION = f"""
WITH {_O_EV},
seq AS (
  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM ev
),
flags AS (
  SELECT *, CASE WHEN prev IS NULL
                   OR epoch_us(ts) - epoch_us(prev) >= 86400000000
                 THEN 1 ELSE 0 END AS new_s
  FROM seq
),
sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flags
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 1 DAY AS session_end,
       COUNT(*) AS n_events,
       {_O_VSUM} AS value_sum
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@query_fn("stream_session_windows", oracle=_O_SESSION)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window sessionization (1-day gap), checked against
    a hand-rolled lag/cumsum oracle — pins the merge semantics."""
    events = load_table(spark, sf_dir, "events")
    return session_windows(events, gap="1 day").orderBy(
        "user_id", "session_start"
    )


@query_fn("stream_session_live", oracle=_O_SESSION)
def stream_session_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME session_window sessionization executed as a real
    watermarked stream (readStream -> session_window merge state ->
    memory sink). Must match the batch lag/cumsum oracle exactly.

    Output-mode honesty: this harness runs COMPLETE mode (the memory
    sink keeps every session so the one-shot result is comparable to
    the batch oracle), and complete mode retains ALL aggregation state
    — the watermark does not evict here. The watermark added by
    session_windows bounds state in the APPEND/UPDATE modes a
    production deployment would use (sessions finalize and evict once
    the watermark passes their end); complete mode is the test-harness
    trade-off, not the scale posture."""
    stream = read_event_stream(spark, sf_dir)
    out = run_stream_to_table(
        session_windows(stream, gap="1 day"), mode="complete"
    )
    return out.orderBy("user_id", "session_start")


@query_fn(
    "events_json_props",
    oracle=r"""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)) AS BIGINT)
         AS k_total,
       CAST(MAX(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)) AS INTEGER)
         AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON props column (from_json on the
    Spark side; the oracle uses a portable regexp so no JSON extension
    is required in the oracle engine)."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn(
        "k", F.from_json("props", "k INT").getField("k")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_total"),
            F.max("k").cast("int").alias("k_max"),
        )
        .orderBy("event_type")
    )


# The oracle is the per-type totals of the ORIGINAL event stream: the
# dedup queries inject duplicate deliveries (redeliver) and must restore
# exactly-once semantics, so their output equals the clean aggregate.
_O_DEDUP = f"""
WITH {_O_EV}
SELECT event_type,
       COUNT(*) AS n_events,
       {_O_VSUM} AS value_sum
FROM ev
GROUP BY event_type
ORDER BY event_type
"""


@query_fn("stream_dedup_exactly_once", oracle=_O_DEDUP)
def stream_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once -> exactly-once dedup (batch mode): every 10th
    event is delivered twice; key-based dedup must restore the original
    per-type totals exactly."""
    events = load_table(spark, sf_dir, "events")
    return delivery_counts(dedup_batch(redeliver(events)))


@query_fn("stream_dedup_live", oracle=_O_DEDUP)
def stream_dedup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME dedup executed as a real streaming query:
    readStream -> self-union (redelivery) -> dropDuplicatesWithinWatermark
    -> append-mode memory sink. State is bounded by the watermark horizon
    (see streaming/dedup.py scale notes)."""
    stream = read_event_stream(spark, sf_dir)
    deduped = dedup_stream(redeliver(stream), watermark="90 days")
    out = run_stream_to_table(deduped, mode="append")
    return delivery_counts(out)


_O_ATTRIB = f"""
WITH {_O_EV},
v AS (SELECT event_id AS view_id, ts AS view_ts, user_id
      FROM ev WHERE event_type = 'view'),
p AS (SELECT event_id AS purchase_id, ts AS purchase_ts, user_id, value
      FROM ev WHERE event_type = 'purchase')
SELECT v.user_id AS user_id,
       view_id,
       purchase_id,
       (epoch_us(purchase_ts) - epoch_us(view_ts)) // 1000000 AS delay_sec,
       CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS purchase_value
FROM v JOIN p
  ON v.user_id = p.user_id
 AND p.purchase_ts > v.view_ts
 AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
ORDER BY user_id, view_id, purchase_id
"""


@query_fn("stream_attribution_join", oracle=_O_ATTRIB)
def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View->purchase attribution interval join (batch mode): purchases
    within 1 hour after a view by the same user."""
    events = load_table(spark, sf_dir, "events")
    v, p = split_views_purchases(events)
    return attribution_join(v, p).orderBy("user_id", "view_id", "purchase_id")


@query_fn("stream_attribution_live", oracle=_O_ATTRIB)
def stream_attribution_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME attribution join as a real watermarked stream-stream
    inner join (both sides watermarked + time-range bound => evictable
    state; see streaming/joins.py scale notes)."""
    stream = read_event_stream(spark, sf_dir)
    v, p = split_views_purchases(stream, watermark="90 days")
    out = run_stream_to_table(attribution_join(v, p), mode="append")
    return out.orderBy("user_id", "view_id", "purchase_id")


_O_ENRICH = f"""
WITH {_O_EV}
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       c_mktsegment,
       COUNT(*) AS n_events,
       {_O_VSUM} AS value_sum
FROM ev JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
ORDER BY window_start, c_mktsegment
"""


@query_fn("stream_enrich_join", oracle=_O_ENRICH)
def stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (batch mode): events x broadcast
    customer dim -> per-(day, segment) windows."""
    from ..streaming.enrich import enriched_segment_windows

    events = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer")
    return enriched_segment_windows(events, dim).orderBy(
        "window_start", "c_mktsegment"
    )


@query_fn("stream_enrich_live", oracle=_O_ENRICH)
def stream_enrich_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME enrichment topology as a live readStream: stream-STATIC
    inner join (zero join state — the dim broadcasts per micro-batch)
    feeding a watermarked windowed aggregate."""
    from ..streaming.enrich import enriched_segment_windows
    from ..streaming.windows import read_event_stream, run_stream_to_table

    stream = read_event_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer")
    out = run_stream_to_table(
        enriched_segment_windows(stream, dim), mode="complete"
    )
    return out.orderBy("window_start", "c_mktsegment")


# ---------------------------------------------------------------------------
# foreachBatch idempotent upsert sink (round 3)
# ---------------------------------------------------------------------------

@query_fn(
    "stream_upsert_sink",
    oracle=f"""
WITH {_O_EV},
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn
  FROM ev
)
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_event_type,
       ts AS last_ts,
       value AS last_value
FROM r WHERE rn = 1
ORDER BY user_id
""",
)
def stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed last-state UPSERT through a real foreachBatch sink: every
    micro-batch merges into a versioned parquet snapshot with an
    atomic current-pointer and a batch-id ledger (idempotent replay —
    the production exactly-once recipe; streaming/sinks.py).  The
    final snapshot must equal the batch last-row-per-user query.

    Runs through the BUCKETED partial-rewrite store (bucket_count=8):
    each batch rewrites only the key-hash buckets it touches and
    carries the rest forward by reference — the O(touched) commit
    that replaces the O(state) full rewrite past SCALE.md's ~25-30M-row
    crossover.  The oracle is unchanged from the plain store's: the
    commit strategy may not change a row."""
    import tempfile

    from ..streaming.sinks import run_upsert_stream
    from ..streaming.windows import read_event_stream

    stream = read_event_stream(spark, sf_dir)
    from ..functions.parity import event_order_key

    order = event_order_key()
    root = tempfile.mkdtemp(prefix="bidw_upsert_sink_")
    try:
        snap = run_upsert_stream(
            stream.withColumn("_ord", order),
            spark,
            key_cols=["user_id"],
            order_col="_ord",
            root=root,
            bucket_count=8,
        )
        out = snap.select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
        # materialize DISTRIBUTED (executor-side parquet rewrite, never
        # through the driver) before pruning the snapshot dir the lazy
        # plan reads from — at 100-TB keyed state a collect() here would
        # OOM the driver; a parquet copy is one narrow stage
        out_dir = _fresh_result_dir("upsert_out")
        out.write.mode("overwrite").parquet(out_dir)
        return spark.read.parquet(out_dir).orderBy("user_id")
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# streaming SCD2: dimension maintenance from a change stream
# ---------------------------------------------------------------------------

def _o_scd2_stream() -> str:
    from ..functions.parity import o_event_order_key

    return f"""
WITH {_O_EV},
wk AS (
  SELECT user_id, event_type, value,
         CAST(date_trunc('week', ts) AS DATE) AS load_date,
         {o_event_order_key()} AS ord
  FROM ev
),
lastp AS (
  SELECT user_id, load_date,
         arg_max(event_type, ord) AS event_type,
         arg_max(value, ord) AS value
  FROM wk GROUP BY 1, 2
),
seq AS (
  SELECT *,
         LAG(load_date) OVER w AS prev_load,
         LAG(event_type) OVER w AS pet,
         LAG(value) OVER w AS pv
  FROM lastp WINDOW w AS (PARTITION BY user_id ORDER BY load_date)
),
changes AS (
  -- drop no-op loads (same tracked values as the previous load; a
  -- dropped row always EQUALS its predecessor, so comparing against
  -- the immediate predecessor equals comparing against the last KEPT
  -- change)
  SELECT user_id, event_type, value, load_date FROM seq
  WHERE prev_load IS NULL
     OR NOT (event_type IS NOT DISTINCT FROM pet
             AND value IS NOT DISTINCT FROM pv)
)
SELECT user_id, event_type, value,
       load_date AS effective_from,
       COALESCE(LEAD(load_date) OVER (PARTITION BY user_id ORDER BY load_date),
                DATE '2099-12-31') AS effective_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY load_date)
            AS INTEGER) AS version
FROM changes
ORDER BY user_id, effective_from
"""


@query_fn("stream_scd2_sink", oracle=_o_scd2_stream())
def stream_scd2_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension maintenance driven FROM A STREAM: weekly user
    state (last event per user per ISO week) flows through a
    foreachBatch sink that applies operators/scd.scd2_merge per load
    period against a versioned snapshot (streaming/sinks.py
    run_scd2_stream — same idempotence ledger as the upsert sink).

    The oracle derives the same dimension directly with window
    functions (change rows -> LEAD validity windows, dense versions),
    so this checks a REAL equivalence: folding scd2_merge over the
    load periods == the closed-form window construction.  The
    reference's SCD2 is batch Kettle (`ETL/etl for customer with
    scd2.ktr:833-914`); this is its streaming extension."""
    import shutil
    import tempfile

    from ..functions.parity import event_order_key
    from ..streaming.sinks import run_scd2_stream
    from ..streaming.windows import read_event_stream

    stream = read_event_stream(spark, sf_dir)
    updates = stream.select(
        "user_id",
        "event_type",
        "value",
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("load_date"),
        event_order_key().alias("_ord"),
    )
    root = tempfile.mkdtemp(prefix="bidw_scd2_sink_")
    try:
        dim = run_scd2_stream(
            updates,
            spark,
            nat_key=["user_id"],
            tracked=["event_type", "value"],
            load_date_col="load_date",
            order_col="_ord",
            root=root,
        )
        out_dir = _fresh_result_dir("scd2_out")
        dim.write.mode("overwrite").parquet(out_dir)
        return spark.read.parquet(out_dir).orderBy(
            "user_id", "effective_from"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# streaming near-duplicate gate (the crawl-ingest dedup loop)
# ---------------------------------------------------------------------------

@query_fn("stream_dedup_neardup")
def stream_dedup_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-crawl increment (doc_id % 10 == 0) classified against
    the standing corpus BY A REAL STREAM: documents flow through a
    foreachBatch near-dup gate (streaming/sinks.run_neardup_filter_stream
    — incremental_dedup per micro-batch + the twin-snapshot idempotence
    ledger). With a fixed reference corpus the verdicts are
    batch-grouping-independent, so the oracle is dedup_incremental's
    closed form verbatim; the accept-novel crawl loop (novel docs join
    the corpus between batches) is exercised by the two-batch pytest
    in tests/test_streaming.py."""
    import shutil
    import tempfile

    from ..streaming.sinks import run_neardup_filter_stream
    from ..streaming.windows import read_document_stream

    docs = load_table(spark, sf_dir, "documents")
    stream = read_document_stream(spark, sf_dir).filter(
        F.col("doc_id") % 10 == 0
    )
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    root = tempfile.mkdtemp(prefix="bidw_neardup_gate_")
    try:
        verdicts = run_neardup_filter_stream(
            stream,
            spark,
            existing,
            root,
            k=3,
            threshold=0.5,
            max_df=50,
        )
        out_dir = _fresh_result_dir("neardup_out")
        verdicts.write.mode("overwrite").parquet(out_dir)
        return spark.read.parquet(out_dir).orderBy("doc_id")
    finally:
        shutil.rmtree(root, ignore_errors=True)


# the same closed form as the batch classifier — register it as the
# oracle (fixed corpus => batch boundaries cannot change verdicts)
from .pipeline_queries import _O_INCREMENTAL as _O_INC_STREAM  # noqa: E402

ORACLES["stream_dedup_neardup"] = _O_INC_STREAM
