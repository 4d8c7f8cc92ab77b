"""Cross-engine float-determinism helpers (exact decimal aggregation).

See the design notes in plans/queries.py: raw double sums are order-
dependent and diverge between Spark and an oracle engine; casting to a
value-class-appropriate DECIMAL before aggregating makes the sum exact
and therefore order-independent. These helpers are the shared
vocabulary for every oracled query and the analytics layer.

Caveat: once a decimal sum's raw integer units (value * 10^scale)
exceed 2^53, the final decimal->double conversion itself rounds
differently across engines (correctly-rounded vs two-step). Keep
magnitudes under that bound or round the derived statistic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DEC = "decimal(18,6)"        # first-level money aggregation
DEC_MONEY2 = "decimal(28,4)"  # second level over 4-decimal money doubles
DEC_RATIO2 = "decimal(28,8)"  # second level over small ratio doubles


def dsum(col):
    """Order-independent SUM of a money expression -> double."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col):
    """Order-independent AVG of a money expression -> double."""
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def davg_money2(col):
    """Order-independent AVG over already-computed money doubles -> double."""
    return F.sum(col.cast(DEC_MONEY2)).cast("double") / F.count(col)


def davg_ratio2(col):
    """Order-independent AVG over already-computed ratio doubles -> double."""
    return F.sum(col.cast(DEC_RATIO2)).cast("double") / F.count(col)


def o_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def o_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}))"


def o_davg_money2(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(28,4))) AS DOUBLE) / COUNT({expr}))"


def o_davg_ratio2(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(28,8))) AS DOUBLE) / COUNT({expr}))"

def dpctl(col_expr: str, p: float):
    """Exact interpolated percentile, decimal-snapped for cross-engine
    parity: Spark's ``percentile`` and DuckDB's ``quantile_cont`` both
    compute lower + frac*(upper-lower) over the sorted values, but the
    interpolation arithmetic can differ in the last double bit — the
    DECIMAL(18,6) snap (micro precision, far above money ulp) makes
    the value identical in both engines.  Shared by every exact-
    percentile consumer (winsorized caps, risk-flag p75 thresholds) so
    the convention cannot drift per query."""
    return (
        F.expr(f"percentile({col_expr}, {p!r})")
        .cast(DEC)
        .cast("double")
    )


def o_dpctl(expr: str, p: float) -> str:
    """DuckDB twin of :func:`dpctl` (quantile_cont + the same snap)."""
    return f"CAST(CAST(quantile_cont({expr}, {p!r}e0) AS DECIMAL(18,6)) AS DOUBLE)"


# epoch-micros bias so PRE-1970 timestamps stay totally ordered: an
# unbiased negative value lpads to "-000…" which sorts before all
# positives but in REVERSED magnitude order.  5e18 keeps every
# representable timestamp (year 1 .. 9999, |epoch_us| < 3e17) strictly
# positive without overflowing int64 (max ~9.22e18), and the biased
# value always fits the 20-digit pad; both twins apply it.
_EVKEY_EPOCH_BIAS = 5 * 10**18


def event_order_key(ts_col="ts", id_col="event_id"):
    """Fixed-width sortable event key: zero-padded biased epoch-micros
    || id.  Lexicographic VARCHAR order == (ts, id) numeric order in
    both engines — the scalar ordering key min_by/arg_min need
    (structs don't bind in DuckDB's arg_min).  Keep widths/bias in
    sync with ``o_event_order_key``.

    Precondition (id side): ``0 <= id < 10^12``.  A negative or
    13+-digit id breaks the lexicographic==numeric guarantee for ties
    on ts; the ts side needs no precondition (bias covers the full
    timestamp range)."""
    return F.concat(
        F.lpad(
            (F.unix_micros(F.col(ts_col)) + F.lit(_EVKEY_EPOCH_BIAS))
            .cast("string"),
            20,
            "0",
        ),
        F.lpad(F.col(id_col).cast("string"), 12, "0"),
    )


def o_event_order_key(ts_expr: str = "ts", id_expr: str = "event_id") -> str:
    """DuckDB twin of ``event_order_key`` (same bias, widths)."""
    return (
        f"lpad(CAST(epoch_us(CAST({ts_expr} AS TIMESTAMP)) + {_EVKEY_EPOCH_BIAS} AS VARCHAR), 20, '0') || "
        f"lpad(CAST({id_expr} AS VARCHAR), 12, '0')"
    )
