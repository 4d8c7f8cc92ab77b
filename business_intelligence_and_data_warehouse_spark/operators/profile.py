"""Single-pass data profiling: per-column null counts, exact distinct
counts, and min/max, as one long-format result.

The warehouse data-quality primitive (what Kettle's "data validator" /
profiling steps produce): run after every load to catch schema drift,
null explosions, and key-cardinality regressions.

Plan shape: ONE aggregate over one scan computes every column's
n/nulls/distinct/min/max simultaneously — Catalyst lowers the
multi-distinct into a single Expand (|columns| replicas of each row,
map-side) + two-level aggregate, which beats |columns| separate scans
at any scale. The wide 1-row aggregate is then melted to long format
with a literal stack — no second pass.

Presentation parity: min/max are rendered per type class — numerics
through DECIMAL (canonical cross-engine string form; raw double
stringification is engine-specific around E-notation thresholds),
timestamps through an explicit format pattern, strings as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# type classes with deterministic string rendering
NUM, STR, TS = "num", "str", "ts"


def _render(col, kind: str):
    if kind == NUM:
        return col.cast("decimal(18,2)").cast("string")
    if kind == TS:
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_table(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """(column, n, n_null, n_distinct, min_repr, max_repr) — one row
    per profiled column, from a single aggregate pass.

    `cols` is [(name, kind)] with kind in {'num', 'str', 'ts'}.
    """
    aggs = []
    for name, kind in cols:
        c = F.col(name)
        aggs += [
            F.count(F.lit(1)).alias(f"{name}__n"),
            F.sum(c.isNull().cast("long")).alias(f"{name}__nulls"),
            F.count_distinct(c).alias(f"{name}__distinct"),
            _render(F.min(c), kind).alias(f"{name}__min"),
            _render(F.max(c), kind).alias(f"{name}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', {name}__n, {name}__nulls, {name}__distinct, "
        f"{name}__min, {name}__max"
        for name, _ in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n, n_null, n_distinct, min_repr, max_repr)"
        )
    )


def oracle_profile_sql(table: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`profile_table` (same rendering rules)."""

    def render(expr: str, kind: str) -> str:
        if kind == NUM:
            return f"CAST(CAST({expr} AS DECIMAL(18,2)) AS VARCHAR)"
        if kind == TS:
            return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"
        return f"CAST({expr} AS VARCHAR)"

    parts = [
        f"""
SELECT '{name}' AS "column",
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT {name}) AS n_distinct,
       {render(f"MIN({name})", kind)} AS min_repr,
       {render(f"MAX({name})", kind)} AS max_repr
FROM {table}"""
        for name, kind in cols
    ]
    return "\nUNION ALL\n".join(parts) + '\nORDER BY "column"'


# ---------------------------------------------------------------------------
# declarative constraint suite (deequ-style checks)
# ---------------------------------------------------------------------------


def with_ref_flag(
    df: DataFrame, keys: DataFrame, key_col: str, ref_key_col: str, flag: str
) -> DataFrame:
    """Adds boolean ``flag``: the row's ``key_col`` exists in
    ``keys[ref_key_col]`` (NULL keys count as present — completeness
    is its own check). The key set joins by broadcast: dimension key
    sets are small by design; for a fact-sized reference swap in a
    left-semi + union instead."""
    k = keys.select(F.col(ref_key_col).alias("__ref_key")).distinct()
    return (
        df.join(
            F.broadcast(k), df[key_col] == F.col("__ref_key"), "left"
        )
        .withColumn(
            flag,
            F.col(key_col).isNull() | F.col("__ref_key").isNotNull(),
        )
        .drop("__ref_key")
    )


def quality_report(
    df: DataFrame,
    row_checks: dict[str, F.Column],
    unique_cols: list[str] | None = None,
    thresholds: dict[str, float] | None = None,
    default_threshold: float = 1.0,
) -> DataFrame:
    """Constraint-suite report (the deequ/'expectations' pattern): one
    row per check with (check, metric, threshold, passed).

    ``row_checks`` maps check name -> boolean per-row Column; the
    metric is the passing fraction (exact BIGINT count / BIGINT count,
    one IEEE division). ``unique_cols`` adds a uniqueness check per
    column (metric = exact distinct / count). ``passed`` compares the
    deterministic metric to the check's threshold.

    Plan: every row check folds into ONE aggregate over one scan
    (map-side partial); melting the 1-row wide aggregate to long form
    is a map-side explode. Each unique col adds a DISTINCT aggregate —
    ONE stays Expand-free (two-stage aggregate); two+ trigger the
    multi-distinct Expand replication (see SCALE.md round-5 note), so
    split reports rather than listing many unique cols in one.
    """
    unique_cols = unique_cols or []
    thresholds = thresholds or {}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, expr in row_checks.items():
        aggs.append(F.sum(expr.cast("long")).alias(f"__c_{name}"))
    for col in unique_cols:
        aggs.append(F.count_distinct(F.col(col)).alias(f"__d_{col}"))
    wide = df.agg(*aggs)

    entries = []
    for name in row_checks:
        entries.append((name, F.col(f"__c_{name}")))
    for col in unique_cols:
        entries.append((f"unique_{col}", F.col(f"__d_{col}")))
    structs = [
        F.struct(
            F.lit(name).alias("check"),
            (num.cast("double") / F.col("__n").cast("double")).alias(
                "metric"
            ),
            F.lit(
                float(thresholds.get(name, default_threshold))
            ).alias("threshold"),
        )
        for name, num in entries
    ]
    return (
        wide.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.check", "r.metric", "r.threshold")
        .withColumn("passed", F.col("metric") >= F.col("threshold"))
    )
