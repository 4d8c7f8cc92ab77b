"""Behavioral-analytics registry queries (round 5): Markov transition
matrix, deterministic A/B experiment readout, exact EWMA smoothing,
and Pareto/ABC classification.

These close the classic clickstream/BI surface around the reference's
behavioral analytics (churn windows, what-if scenarios, segmentation —
`Python Analytics/PythonAnalysis.py`, `Final Report.docx` §7): next-
event transition structure, experiment lift, smoothed per-user signal,
and the 80/15/5 revenue concentration view. All four are oracled
hash-exact; determinism arguments live in operators/behavior.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .queries import query_fn

# ---------------------------------------------------------------------------
# first-order Markov transition matrix over the event stream
# ---------------------------------------------------------------------------


@query_fn(
    "events_transition_matrix",
    oracle="""
WITH pairs AS (
  SELECT event_type AS from_state,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_state
  FROM events
),
m AS (
  SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM pairs WHERE to_state IS NOT NULL GROUP BY 1, 2
)
SELECT from_state, to_state, n_transitions,
       CAST(SUM(n_transitions) OVER (PARTITION BY from_state) AS BIGINT)
         AS n_from_total,
       CAST(n_transitions AS DOUBLE)
         / CAST(SUM(n_transitions) OVER (PARTITION BY from_state) AS DOUBLE)
         AS p
FROM m
ORDER BY from_state, to_state
""",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-stochastic next-event transition matrix: one LEAD window on
    the user key, one groupBy over the bounded |event_type|^2 pair
    space; per-from totals re-aggregate the matrix rows, never the
    events (operators/behavior.py transition_matrix)."""
    from ..operators.behavior import transition_matrix

    events = load_table(spark, sf_dir, "events")
    return transition_matrix(events).orderBy("from_state", "to_state")


# ---------------------------------------------------------------------------
# deterministic A/B experiment report (hash-assigned variants)
# ---------------------------------------------------------------------------

_O_HEX1 = (
    "(CASE WHEN ascii(substr(hx, {i}, 1)) >= 97 "
    "THEN ascii(substr(hx, {i}, 1)) - 87 "
    "ELSE ascii(substr(hx, {i}, 1)) - 48 END)"
)


@query_fn(
    "events_ab_test",
    oracle=f"""
WITH units AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END) AS unit_value_cents,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                            ELSE CAST(0 AS BIGINT) END) > 200000
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
hx AS (
  SELECT *, md5('exp1' || CAST(user_id AS VARCHAR)) AS hx FROM units
),
assigned AS (
  SELECT *, CASE WHEN {_O_HEX1.format(i=1)} * 256
                    + {_O_HEX1.format(i=2)} * 16
                    + {_O_HEX1.format(i=3)} < 2048
                 THEN 'treatment' ELSE 'control' END AS variant
  FROM hx
),
variants AS (
  SELECT variant,
         CAST(COUNT(*) AS BIGINT) AS n_units,
         CAST(SUM(converted) AS BIGINT) AS n_converted,
         CAST(SUM(unit_value_cents) AS BIGINT) AS value_cents_total
  FROM assigned GROUP BY variant
),
v AS (
  SELECT *, CAST(n_converted AS DOUBLE) / CAST(n_units AS DOUBLE)
              AS conversion_rate
  FROM variants
),
s AS (
  SELECT SUM(CASE WHEN variant = 'treatment' THEN n_units END) AS nt,
         SUM(CASE WHEN variant = 'treatment' THEN n_converted END) AS ct,
         SUM(CASE WHEN variant = 'control' THEN n_units END) AS nc,
         SUM(CASE WHEN variant = 'control' THEN n_converted END) AS cc
  FROM variants
),
z AS (
  SELECT ((CAST(ct AS DOUBLE) / CAST(nt AS DOUBLE)
           - CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE))
          / NULLIF(CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE), 0.0) * 100.0)
           AS lift_pct,
         ((CAST(ct AS DOUBLE) / CAST(nt AS DOUBLE)
           - CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE))
          / NULLIF(
              sqrt((CAST(ct + cc AS DOUBLE) / CAST(nt + nc AS DOUBLE)
                    * (1.0 - CAST(ct + cc AS DOUBLE) / CAST(nt + nc AS DOUBLE)))
                   * (1.0 / CAST(nt AS DOUBLE) + 1.0 / CAST(nc AS DOUBLE))),
              0.0))
           AS z_score
  FROM s
)
SELECT v.variant, v.n_units, v.n_converted, v.value_cents_total,
       v.conversion_rate, z.lift_pct, z.z_score
FROM v CROSS JOIN z
ORDER BY v.variant
""",
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-variant experiment readout: hash-assigned variants (the
    mixture-sampling bucket pattern — no assignment table), unit-grain
    conversion collapse, pooled two-proportion z-score as a chain of
    single IEEE ops (sqrt is correctly rounded by the standard, so the
    z value is bit-identical cross-engine)."""
    from ..operators.behavior import ab_test_report

    events = load_table(spark, sf_dir, "events")
    return ab_test_report(events).orderBy("variant")


# ---------------------------------------------------------------------------
# exact truncated EWMA (alpha = 1/2) per user
# ---------------------------------------------------------------------------


@query_fn(
    "events_ewma",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, ts,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS INTEGER) AS rn,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
contrib AS (
  SELECT user_id, rn + CAST(k AS INTEGER) AS target_rn,
         CAST(cents AS DOUBLE)
           / CAST(CAST(1 AS BIGINT) << (CAST(k AS INTEGER) + 1) AS DOUBLE)
           AS term
  FROM base CROSS JOIN range(0, 31) t(k)
),
sums AS (
  SELECT user_id, target_rn, SUM(term) AS ewma
  FROM contrib GROUP BY 1, 2
)
SELECT b.user_id, b.event_id, b.ts, b.rn, b.cents, s.ewma
FROM base b
JOIN sums s ON s.user_id = b.user_id AND s.target_rn = b.rn
ORDER BY b.event_id
""",
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event value (alpha = 1/2, 30-step horizon).
    Every term is an exponent shift of an integer cent count and every
    partial sum fits the double significand, so the windowed float sum
    is EXACT and order-independent — a float aggregate that hash-
    matches cross-engine with no decimal snap
    (operators/behavior.py ewma_smooth)."""
    from ..operators.behavior import ewma_smooth

    events = load_table(spark, sf_dir, "events")
    return ewma_smooth(events).orderBy("event_id")


# ---------------------------------------------------------------------------
# Pareto / ABC revenue concentration over customers
# ---------------------------------------------------------------------------


@query_fn(
    "orders_abc_pareto",
    oracle="""
WITH m AS (
  SELECT o_custkey AS custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS revenue
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT custkey, revenue,
         CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, custkey) AS INTEGER)
           AS rank,
         CAST(SUM(revenue) OVER (ORDER BY revenue DESC, custkey
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST(SUM(revenue) OVER () AS DOUBLE) AS cum_share
  FROM m
)
SELECT custkey, CAST(revenue AS DOUBLE) AS revenue, rank, cum_share,
       CASE WHEN cum_share <= 0.8 THEN 'A'
            WHEN cum_share <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
ORDER BY rank
""",
)
def orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC classification of customers by exact-decimal revenue:
    aggregate to entity grain (the only fact-sized stage), then rank +
    exact cumulative share over |entities| rows; the A/B/C banding
    compares a deterministic double ratio to literal cuts
    (operators/behavior.py pareto_abc)."""
    from ..operators.behavior import pareto_abc

    orders = load_table(spark, sf_dir, "orders")
    measures = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("revenue")
    )
    out = pareto_abc(measures, "custkey", "revenue")
    return out.select(
        "custkey",
        F.col("revenue").cast("double").alias("revenue"),
        "rank",
        "cum_share",
        "abc_class",
    ).orderBy("rank")
