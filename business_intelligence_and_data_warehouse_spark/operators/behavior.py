"""User-behavior analytics over event streams: Markov transition
matrices, deterministic A/B experiment reports, exact EWMA smoothing,
and Pareto/ABC classification.

These are the remaining classic clickstream/BI operators the
reference's analytics layer implies but does not name (its DAX/Power
BI layer computes churn windows and what-if scenarios; transition and
cohort views are the same family — reference `Final Report.docx` §7,
`Python Analytics/PythonAnalysis.py` behavioral features). All four
are pure DataFrame compositions — no UDFs, no driver loops.

Cross-engine determinism notes
------------------------------
* transition probabilities and conversion rates are single IEEE
  divisions of exact BIGINT counts — deterministic in both engines;
* the two-proportion z-score chains individual IEEE ops (+, -, *, /,
  sqrt); sqrt is correctly rounded by IEEE-754 *requirement* (unlike
  ln/exp), so the full expression is bit-identical cross-engine when
  written with the same association order — the oracle mirrors the
  exact parenthesization;
* EWMA uses alpha = 1/2 with a 30-step truncated horizon: every term
  is ``cents * 2^-(k+1)`` (an exponent shift — exact), and with
  cents < 2^25 and grain 2^-31 every partial sum fits in 53
  significand bits, so the windowed double sum is EXACT and therefore
  order-independent. No snapping needed anywhere.

Scale notes
-----------
* ``transition_matrix``: one exchange for the per-key LEAD window,
  one partial-aggregated groupBy((from,to)) over a bounded
  event-type vocabulary — the matrix is |types|^2 rows whatever the
  event volume. Per-type totals derive by re-aggregating the matrix
  (rows, not events), never by a second event scan.
* ``ab_test_report``: variant assignment is a map-side md5 bucket of
  the unit key (the mixture-sampling pattern — deterministic,
  partitioning-invariant, no assignment table to join); the report is
  one groupBy(user) collapse + one groupBy(variant) over |users|
  rows; the 2-row variant table broadcast-crosses its 1-row pooled
  summary.
* ``ewma_smooth``: the truncated-horizon rewrite turns the sequential
  recurrence into a bounded 31x map-side fan-out + one
  partial-aggregated groupBy((key, rn)) + an equi-join back on the
  same key — no applyInPandas, no per-row Python state. The horizon
  bounds both the fan-out constant and the approximation error
  (2^-31 of the signal — below the cent grain it reports).
* ``pareto_abc``: one aggregate to entity grain, then a window over
  |entities| rows (exact DECIMAL cumulative share; rank-based tie
  handling keeps the banding total-order deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def transition_matrix(
    events: DataFrame,
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts and probabilities.

    Returns (from_state, to_state, n_transitions, n_from_total, p) —
    one row per observed ordered state pair; ``p`` is the
    row-stochastic transition probability n_transitions /
    n_from_total.
    """
    order = W.partitionBy(key).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(order).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
    )
    matrix = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    # per-from totals re-aggregate the |types|^2 matrix, not the events
    totals = (
        W.partitionBy("from_state")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return matrix.select(
        "from_state",
        "to_state",
        "n_transitions",
        F.sum("n_transitions").over(totals).alias("n_from_total"),
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(totals).cast("double")
        ).alias("p"),
    )


# -- A/B experiment report -------------------------------------------------

_AB_BUCKETS = 4096


def assign_variant(
    df: DataFrame, unit_col: str, treat_fraction: float = 0.5,
    salt: str = "exp1",
) -> DataFrame:
    """Deterministic unit->variant assignment: md5(salt || unit) first
    3 hex digits -> bucket in [0, 4096); bucket < frac*4096 is
    'treatment'. Map-side, partitioning-invariant, re-derivable by
    any engine (the mixture-sampling hash pattern)."""
    from .split import hash_bucket

    bucket = hash_bucket(F.concat(F.lit(salt), F.col(unit_col).cast("string")))
    cut = int(treat_fraction * _AB_BUCKETS)
    return df.withColumn(
        "variant",
        F.when(bucket < F.lit(cut), F.lit("treatment")).otherwise(
            F.lit("control")
        ),
    )


def ab_test_report(
    events: DataFrame,
    unit_col: str = "user_id",
    convert_cents_threshold: int = 200_000,
    value_cents: F.Column | None = None,
    treat_fraction: float = 0.5,
    salt: str = "exp1",
) -> DataFrame:
    """Two-variant experiment readout with a pooled two-proportion
    z-score.

    Collapses events to unit grain (value = exact BIGINT cent sum of
    ``value_cents``; converted = the unit's total exceeds
    ``convert_cents_threshold`` — a UNIT-level metric, so conversion
    varies across units even when every unit has some qualifying
    event), assigns variants by hash, and emits one row per variant
    carrying (n_units, n_converted, conversion_rate,
    value_cents_total, lift_pct, z_score). ``lift_pct``/``z_score``
    compare treatment against control and repeat on both rows (the
    broadcast-scalar pattern — no driver round-trip); both divisions
    NULL out (never raise) on a degenerate experiment — a missing
    variant, zero control conversions, or an all-or-nothing pooled
    rate.
    """
    if value_cents is None:
        value_cents = F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100, 0).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))

    units = (
        events.groupBy(unit_col)
        .agg(F.sum(value_cents).alias("unit_value_cents"))
        .withColumn(
            "converted",
            F.when(
                F.col("unit_value_cents") > F.lit(int(convert_cents_threshold)),
                1,
            ).otherwise(0),
        )
    )
    variants = (
        assign_variant(units, unit_col, treat_fraction, salt)
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            F.sum("unit_value_cents").alias("value_cents_total"),
        )
        .withColumn(
            "conversion_rate",
            F.col("n_converted").cast("double")
            / F.col("n_units").cast("double"),
        )
    )
    # 1-row scalar: both variants' counts side by side (broadcast)
    scalars = variants.groupBy().agg(
        F.sum(F.when(F.col("variant") == "treatment", F.col("n_units"))).alias("nt"),
        F.sum(F.when(F.col("variant") == "treatment", F.col("n_converted"))).alias("ct"),
        F.sum(F.when(F.col("variant") == "control", F.col("n_units"))).alias("nc"),
        F.sum(F.when(F.col("variant") == "control", F.col("n_converted"))).alias("cc"),
    )
    pt = F.col("ct").cast("double") / F.col("nt").cast("double")
    pc = F.col("cc").cast("double") / F.col("nc").cast("double")
    pool = (F.col("ct") + F.col("cc")).cast("double") / (
        F.col("nt") + F.col("nc")
    ).cast("double")
    # mirror this association order EXACTLY in any oracle: each step is
    # one IEEE op (sqrt is correctly rounded), so the chain is
    # bit-identical cross-engine
    se = F.sqrt(
        (pool * (F.lit(1.0) - pool))
        * (
            F.lit(1.0) / F.col("nt").cast("double")
            + F.lit(1.0) / F.col("nc").cast("double")
        )
    )
    enriched = scalars.select(
        ((pt - pc) / F.nullif(pc, F.lit(0.0)) * F.lit(100.0)).alias("lift_pct"),
        ((pt - pc) / F.nullif(se, F.lit(0.0))).alias("z_score"),
    )
    return variants.crossJoin(F.broadcast(enriched))


# -- exact truncated EWMA --------------------------------------------------

EWMA_HORIZON = 30  # alpha = 1/2; truncation error <= signal * 2^-31


def ewma_smooth(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2) per key,
    exact and order-independent.

    ewma_i = sum_{k=0..30} cents_{i-k} * 2^-(k+1): each term is an
    exponent shift of an integer cent count, and every partial sum
    fits in the double significand, so the result is EXACT — no
    float-order nondeterminism to snap. The recurrence becomes a
    bounded 31x fan-out: row rn contributes to targets rn..rn+30,
    grouped on (key, target), joined back on the same key pair.

    Returns the input columns plus ``rn`` (per-key dense order) and
    ``ewma`` (double, exact multiple of 2^-31).
    """
    order = W.partitionBy(key).orderBy(ts_col, id_col)
    base = df.select(
        key,
        id_col,
        ts_col,
        F.row_number().over(order).alias("rn"),
        F.round(F.col(value_col) * 100, 0).cast("bigint").alias("cents"),
    )
    ks = F.explode(F.sequence(F.lit(0), F.lit(EWMA_HORIZON))).alias("k")
    # 2^-(k+1) as an exponent shift: shift a BIGINT 1 left then divide
    # (division by a power of two is exact); shiftleft's PySpark
    # wrapper only takes a literal bit count, so this stays SQL
    contribs = base.select(F.col(key), "rn", "cents", ks).select(
        F.col(key),
        (F.col("rn") + F.col("k")).alias("target_rn"),
        F.expr(
            "CAST(cents AS DOUBLE)"
            " / CAST(shiftleft(CAST(1 AS BIGINT), k + 1) AS DOUBLE)"
        ).alias("term"),
    )
    sums = (
        contribs.groupBy(key, "target_rn")
        .agg(F.sum("term").alias("ewma"))
        .withColumnRenamed(key, "__ewma_key")
    )
    return (
        base.join(
            sums,
            on=(F.col(key) == F.col("__ewma_key"))
            & (F.col("rn") == F.col("target_rn")),
        )
        .select(key, id_col, ts_col, "rn", "cents", "ewma")
    )


# -- Pareto / ABC classification ------------------------------------------


def pareto_abc(
    measures: DataFrame,
    entity_col: str,
    measure_col: str,
    a_cut: float = 0.80,
    b_cut: float = 0.95,
) -> DataFrame:
    """Classic ABC analysis: rank entities by a DECIMAL measure,
    compute the exact cumulative share of total, band A/B/C at the
    ``a_cut``/``b_cut`` cumulative thresholds.

    ``measures`` must already be at entity grain with ``measure_col``
    DECIMAL (exact cumulative sums; the share division is one IEEE
    op). Banding compares cum_share to the cuts — the comparison
    operand is exact decimal / exact decimal, deterministic in both
    engines.
    """
    rank_w = W.orderBy(F.col(measure_col).desc(), F.col(entity_col))
    total_w = rank_w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cum_w = rank_w.rowsBetween(W.unboundedPreceding, W.currentRow)
    cum_share = (
        F.sum(measure_col).over(cum_w).cast("double")
        / F.sum(measure_col).over(total_w).cast("double")
    )
    return measures.select(
        entity_col,
        F.col(measure_col),
        F.row_number().over(rank_w).alias("rank"),
        cum_share.alias("cum_share"),
        F.when(cum_share <= F.lit(a_cut), F.lit("A"))
        .when(cum_share <= F.lit(b_cut), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
