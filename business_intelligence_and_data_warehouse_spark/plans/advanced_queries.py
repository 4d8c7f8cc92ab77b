"""Round-3 advanced operator queries:

* ts_gap_fill            — dense calendar spine + forward fill
* events_lookback_join   — bounded interval join via time-bucket tiling
* dedup_keep_best        — exact-dup resolution by quality + source rank
* corpus_pack_sequences  — greedy token packing (applyInPandas recurrence)

Each pairs a Spark-first plan with a DuckDB oracle.  Oracle-parity
notes: event values and order totals are 2/4-decimal money doubles,
so DECIMAL(18,6)-cast sums are exact and order-independent (the
engine-wide rule, plans/queries.py module docstring); the packing
oracle replays the greedy recurrence with a recursive CTE — sequential
semantics the Spark side computes in Arrow-batched ``applyInPandas``
because a bin boundary RESETS the accumulator (not expressible as a
prefix-sum window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import (
    dsum,
    event_order_key,
    o_dsum,
    o_event_order_key,
)
from ..operators.caching import pin
from ..functions.text import (
    EN_STOPWORDS,
    normalize_text,
    punct_ratio,
    tokens_ws,
)
from ..operators.asof import lookback_window_join
from ..operators.dedup import keep_best_dedup
from ..operators.packing import pack_sequences
from ..operators.timeseries import period_spine_fill
from ..sources.testdata import load_table
from .pipeline_queries import _O_NORM
from .queries import query_fn

# ---------------------------------------------------------------------------
# time-series gap fill: dense nation x week revenue with forward fill
# ---------------------------------------------------------------------------

@query_fn(
    "ts_gap_fill",
    oracle=f"""
WITH weekly AS (
  SELECT n_name AS nation,
         CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
         {o_dsum("o_totalprice")} AS revenue
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2
),
bounds AS (SELECT min(week) AS lo, max(week) AS hi FROM weekly),
spine AS (
  SELECT k.nation, CAST(unnest(generate_series(
           CAST(b.lo AS TIMESTAMP), CAST(b.hi AS TIMESTAMP),
           INTERVAL 7 DAY)) AS DATE) AS week
  FROM (SELECT DISTINCT nation FROM weekly) k, bounds b
)
SELECT s.nation AS nation,
       s.week AS week,
       w.revenue,
       LAST_VALUE(w.revenue IGNORE NULLS) OVER (
         PARTITION BY s.nation ORDER BY s.week
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS revenue_filled,
       w.revenue IS NULL AS is_gap
FROM spine s LEFT JOIN weekly w ON w.nation = s.nation AND w.week = s.week
ORDER BY s.nation, s.week
""",
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense nation x week revenue grid: the spine regenerates every
    week in the global order-date range per nation, gap weeks carry
    the last observed revenue forward (operators/timeseries.py — the
    spine explode is map-side, the fill window shares the join's
    (nation, week) shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    weekly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week"),
        )
        .agg(dsum(F.col("o_totalprice")).alias("revenue"))
    )
    return period_spine_fill(
        weekly, key_col="nation", period_col="week",
        measure_col="revenue", step_days=7,
    ).orderBy("nation", "week")


# ---------------------------------------------------------------------------
# bounded lookback interval join: views within 1h before each purchase
# ---------------------------------------------------------------------------

_LOOKBACK_S = 3600


@query_fn(
    "events_lookback_join",
    oracle=f"""
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'view'
)
SELECT p.event_id, p.user_id, p.ts,
       CAST(COUNT(v.ts) AS BIGINT) AS n_prior_views,
       {o_dsum("v.value")} AS prior_view_value
FROM p LEFT JOIN v
  ON v.user_id = p.user_id
 AND v.ts <= p.ts
 AND v.ts > p.ts - INTERVAL {_LOOKBACK_S} SECOND
GROUP BY 1, 2, 3
ORDER BY event_id
""",
)
def events_lookback_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: count + value of the same user's views in the
    preceding hour.  Both sides are the (large) events table; the
    interval predicate is executed as an EQUALITY join on
    (user_id, hour-tile) with the exact range as a residual filter
    (operators/asof.lookback_window_join) — never a nested-loop range
    join, and a hot user spreads across time tiles."""
    events = load_table(spark, sf_dir, "events")
    # two consumers (lookback-join probe side + the final left join
    # back): pin so the events scan+filter runs once
    purchases = pin(
        events.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    pairs = lookback_window_join(
        purchases, views,
        key="user_id", left_ts="ts", right_ts="ts",
        lookback_seconds=_LOOKBACK_S,
    )
    matched = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("_cnt"),
        dsum(F.col("r_value")).alias("prior_view_value"),
    )
    return (
        purchases.join(matched, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce(F.col("_cnt"), F.lit(0)).alias("n_prior_views"),
            "prior_view_value",
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# exact-dup resolution: keep the best copy across sources
# ---------------------------------------------------------------------------

_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"


@query_fn(
    "dedup_keep_best",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         CAST(substr(source, 4) AS INTEGER) AS prio,
         text,
         string_split({_O_NORM}, ' ') AS toks,
         md5({_O_NORM}) AS h
  FROM documents
),
q AS (
  SELECT doc_id, prio, h,
         0.4 * (len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1))
         + 0.4 * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
                        / greatest(length(text), 1))
         + 0.2 * (len(list_filter(toks, x -> x IN {_STOP_SQL})) * 1.0
                  / greatest(len(toks), 1)) AS score
  FROM t
),
r AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY h ORDER BY score DESC, prio ASC, doc_id ASC
         ) AS rn
  FROM q
)
SELECT h AS content_hash,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(COUNT(DISTINCT prio) AS BIGINT) AS n_sources,
       MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_id,
       MAX(CASE WHEN rn = 1 THEN prio END) AS kept_priority,
       COALESCE(string_agg(CASE WHEN rn > 1 THEN CAST(doc_id AS VARCHAR) END,
                           ',' ORDER BY doc_id), '') AS dropped_ids
FROM r
GROUP BY h
ORDER BY content_hash
""",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate resolution for curation: within each
    identical-content group keep the copy with the highest composite
    quality score (same formula as text_quality_score), ties to the
    lowest-numbered source then id.  One content-hash shuffle;
    score/priority evaluated map-side (operators/dedup.keep_best_dedup)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_ws(normalize_text(F.col("text")))
    n = F.greatest(F.size(toks), F.lit(1))
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))) * 1.0 / n
    )
    uniq = F.size(F.array_distinct(toks)) * 1.0 / n
    score = 0.4 * uniq + 0.4 * (1.0 - punct_ratio(F.col("text"))) + 0.2 * stop_ratio
    priority = F.substring(F.col("source"), 4, 10).cast("int")
    return keep_best_dedup(docs, score=score, priority=priority).orderBy(
        "content_hash"
    )


# ---------------------------------------------------------------------------
# greedy token packing into fixed-budget training sequences
# ---------------------------------------------------------------------------

_PACK_BUDGET = 200


@query_fn(
    "corpus_pack_sequences",
    oracle=f"""
WITH RECURSIVE toks AS (
  SELECT source, doc_id,
         CAST(len(string_split({_O_NORM}, ' ')) AS INTEGER) AS n_tokens
  FROM documents
),
t AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM toks
),
pack AS (
  SELECT source, doc_id, n_tokens, rn,
         0 AS seq_id, n_tokens AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.doc_id, t.n_tokens, t.rn,
         CASE WHEN p.fill + t.n_tokens > {_PACK_BUDGET}
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.fill + t.n_tokens > {_PACK_BUDGET}
              THEN t.n_tokens ELSE p.fill + t.n_tokens END
  FROM t JOIN pack p ON t.source = p.source AND t.rn = p.rn + 1
)
SELECT source, doc_id, n_tokens,
       CAST(seq_id AS INTEGER) AS seq_id,
       CAST(fill AS INTEGER) AS seq_fill
FROM pack
ORDER BY source, doc_id
""",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit-in-order packing of each source's documents
    into <=200-token training sequences.  Token counts are computed
    JVM-side; only (source, doc_id, n_tokens) crosses the Arrow
    boundary into the per-group recurrence
    (operators/packing.pack_sequences; shard knob for 100-TB groups)."""
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "source",
        "doc_id",
        F.size(tokens_ws(normalize_text(F.col("text")))).alias("n_tokens"),
    )
    return pack_sequences(
        with_tokens, budget=_PACK_BUDGET, group_col="source",
        id_col="doc_id", tokens_col="n_tokens", shards=1,
    ).orderBy("source", "doc_id")


# ---------------------------------------------------------------------------
# hourly OHLC candles: arg-min/arg-max (first/last-by-order) aggregates
# ---------------------------------------------------------------------------

# fixed-width sortable event key (functions/parity.event_order_key)
_O_EVKEY = o_event_order_key()


_O_OHLC = f"""
SELECT event_type,
       CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       arg_min(value, {_O_EVKEY}) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, {_O_EVKEY}) AS close,
       {o_dsum("value")} AS value_sum
FROM events
GROUP BY 1, 2
ORDER BY event_type, hour
"""


def _ohlc_candles(events: DataFrame) -> DataFrame:
    """The unified batch/stream OHLC aggregation (one grouped agg)."""
    evkey = event_order_key()
    return events.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("value", evkey).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", evkey).alias("close"),
        dsum(F.col("value")).alias("value_sum"),
    )


@query_fn("events_hourly_ohlc", oracle=_O_OHLC)
def events_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, hour) OHLC candle: open/close are the values
    of the chronologically first/last event (ties broken by event_id
    via a fixed-width sortable key), high/low are exact double
    min/max.  min_by/max_by are single-pass map-side-combining
    aggregates — the whole candle table is ONE shuffle on the group
    key, no window, no self-join.  (Their string-typed buffer makes
    Spark pick SortAggregate over HashAggregate: a per-partition sort
    by group key, still partial-aggregated before the exchange — no
    extra shuffle at any scale.)"""
    events = load_table(spark, sf_dir, "events")
    return _ohlc_candles(events).orderBy("event_type", "hour")


@query_fn("stream_ohlc_live", oracle=_O_OHLC)
def stream_ohlc_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME OHLC aggregation executed as a real Structured
    Streaming query (readStream -> memory sink, availableNow trigger,
    complete mode) — min_by/max_by run incrementally inside the
    streaming aggregate, and the result must match the batch oracle
    exactly.  In production append mode the grouping key becomes an
    event-time window + watermark so candle state is bounded by the
    horizon (same shape as streaming/windows.tumbling_counts)."""
    from ..streaming.windows import read_event_stream, run_stream_to_table

    stream = read_event_stream(spark, sf_dir)
    out = run_stream_to_table(_ohlc_candles(stream), mode="complete")
    return out.orderBy("event_type", "hour")


# ---------------------------------------------------------------------------
# market-basket pair lift: bounded self-join association mining
# ---------------------------------------------------------------------------

_BASKET_MIN_PAIRS = 2
_BASKET_TOPK = 50


@query_fn(
    "basket_pair_lift",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
totals AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM items),
freq AS (SELECT item, COUNT(*) AS n_item FROM items GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_both
  FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_BASKET_MIN_PAIRS}
)
SELECT p.item_a, p.item_b,
       fa.n_item AS n_baskets_a,
       fb.n_item AS n_baskets_b,
       p.n_both AS n_baskets_both,
       p.n_both / CAST(t.n_baskets AS DOUBLE) AS support,
       p.n_both / CAST(fa.n_item AS DOUBLE) AS confidence_a_to_b,
       (CAST(p.n_both AS DOUBLE) * t.n_baskets)
         / (CAST(fa.n_item AS DOUBLE) * fb.n_item) AS lift
FROM pairs p
JOIN freq fa ON fa.item = p.item_a
JOIN freq fb ON fb.item = p.item_b
CROSS JOIN totals t
ORDER BY lift DESC, item_a, item_b
LIMIT {_BASKET_TOPK}
""",
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 part pairs by lift over order baskets.  The pair
    self-join fans out C(k,2) per basket with k bounded by basket
    size, so candidate volume stays linear in baskets
    (operators/basket.py); lift is pure integer products divided once
    — bit-identical cross-engine."""
    from ..operators.basket import basket_pair_lift as pair_lift

    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        pair_lift(
            lineitem,
            basket_col="l_orderkey",
            item_col="l_partkey",
            min_pair_count=_BASKET_MIN_PAIRS,
        )
        .orderBy(F.col("lift").desc(), "item_a", "item_b")
        .limit(_BASKET_TOPK)
    )


# ---------------------------------------------------------------------------
# per-label embedding centroids: element-wise vector mean
# ---------------------------------------------------------------------------

@query_fn(
    "embedding_label_centroids",
    oracle="""
WITH el AS (
  SELECT label, CAST(i AS INTEGER) AS pos,
         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN range(1, 65) t(i)
)
SELECT label,
       pos,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CAST(FLOOR(val * 1e6) AS BIGINT)) AS DOUBLE)
         / (1e6 * COUNT(*)) AS centroid
FROM el
GROUP BY 1, 2
ORDER BY label, pos
""",
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label (class centroids /
    mean-pooling): posexplode to (label, pos, val) rows, one grouped
    aggregate.  The 64x explode is map-side and Catalyst's partial
    aggregation collapses it to labels x dims rows per partition
    BEFORE the shuffle, so the exchange is tiny at any corpus scale
    (for 1000+-dim embeddings the same partial-sum runs as an
    Arrow-batched mapInPandas — the plumbing similarity.py already
    uses).  Sums are floor-quantized (FLOOR(val*1e6) as BIGINT — the
    engine's embedding parity rule: decimal casts of float32 values
    are NOT exact, integer floors are)."""
    emb = load_table(spark, sf_dir, "embeddings")
    el = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "label",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("val").cast("double").alias("val"),
    )
    return (
        el.groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (
                F.sum(F.floor(F.col("val") * 1e6).cast("long")).cast("double")
                / (1e6 * F.count(F.lit(1)))
            ).alias("centroid"),
        )
        .orderBy("label", "pos")
    )


# ---------------------------------------------------------------------------
# monitoring: trailing-window z-score anomaly flags on daily volumes
# ---------------------------------------------------------------------------

_ANOM_W = 7  # trailing observed days
_ANOM_Z = 2.0


@query_fn(
    "events_anomaly_daily",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY 1, 2
),
trail AS (
  SELECT *,
         SUM(n_events) OVER w AS s,
         CAST(SUM(CAST(n_events AS DECIMAL(19,0))
                  * CAST(n_events AS DECIMAL(19,0))) OVER w
              AS DOUBLE) AS ssd,
         COUNT(*) OVER w AS wn
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {_ANOM_W} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n_events,
       CAST(wn AS INTEGER) AS trail_days,
       CASE WHEN wn >= 2 THEN CAST(s AS DOUBLE) / wn END AS trail_mean,
       CASE WHEN wn >= 2 THEN
         (n_events - CAST(s AS DOUBLE) / wn)
         / NULLIF(sqrt(greatest(
             (ssd - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / wn) / (wn - 1),
             0e0)), 0e0)
       END AS z,
       COALESCE(abs(
         (n_events - CAST(s AS DOUBLE) / wn)
         / NULLIF(sqrt(greatest(
             (ssd - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / wn) / (wn - 1),
             0e0)), 0e0)
       ) >= {_ANOM_Z}e0 AND wn >= 2, FALSE) AS is_anomaly
FROM trail
ORDER BY event_type, day
""",
)
def events_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type event volumes flagged against a trailing
    7-observed-day z-score.  Parity design: mean/variance come from
    EXACT window sums (s BIGINT; squares summed as DECIMAL(38,0) —
    a BIGINT square wraps once daily counts pass ~3e9) pushed through
    the IDENTICAL expression tree in both engines — s*s squares AFTER
    the double cast for the same overflow reason; IEEE double ops in
    a fixed order plus sqrt (correctly rounded by the standard) are
    bit-identical, where each engine's own stddev_samp would not be.
    One shuffle (the day aggregate); the trailing window reuses the
    same event_type partitioning."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_ANOM_W, -1)
    )
    # overflow discipline: s*s squares AFTER the double cast (a
    # BIGINT square wraps once the 7-day count sum passes ~3e9), and
    # ss sums exact DECIMAL(38,0) squares — both expression trees are
    # verbatim in the oracle, so parity survives any count magnitude
    s = F.sum("n_events").over(w)
    dec_n = F.col("n_events").cast("decimal(19,0)")
    ssd = F.sum(dec_n * dec_n).over(w).cast("double")
    wn = F.count(F.lit(1)).over(w)
    mean = s.cast("double") / wn
    var = (ssd - s.cast("double") * s.cast("double") / wn) / (wn - 1)
    z = (F.col("n_events") - mean) / F.nullif(
        F.sqrt(F.greatest(var, F.lit(0.0))), F.lit(0.0)
    )
    base = daily.select(
        "event_type",
        "day",
        "n_events",
        wn.cast("int").alias("trail_days"),
        F.when(wn >= 2, mean).alias("trail_mean"),
        F.when(wn >= 2, z).alias("z"),
    )
    return base.withColumn(
        "is_anomaly",
        F.coalesce(
            (F.abs(F.col("z")) >= F.lit(_ANOM_Z)) & (F.col("trail_days") >= 2),
            F.lit(False),
        ),
    ).orderBy("event_type", "day")
