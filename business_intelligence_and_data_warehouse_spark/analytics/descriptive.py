"""Descriptive statistics, engine-parity safe.

Mirrors the reference's pandas descriptive block (`PythonAnalysis.py:
160-240`: describe(), correlation matrix, histogram) — but instead of
built-in AVG/STDDEV/CORR (whose streaming implementations accumulate
doubles in engine-specific orders), every statistic is derived from
EXACT decimal power sums (Σx, Σx², Σxy): the sums are order-
independent, and the closed-form combination is identical IEEE double
arithmetic in any engine. Percentiles use the exact interpolated
percentile and are snapped to DECIMAL(18,6) (inputs have <= 4 true
decimals, so interpolation at quartile fractions is exact at scale 6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUM_DEC = "decimal(38,8)"  # x and x*y have <= 8 true decimals for money


def _s(col: Column) -> Column:
    """Exact power-sum term."""
    return F.sum(col.cast(SUM_DEC)).cast("double")


def _pct(col_name: str, p: float) -> Column:
    """Exact interpolated percentile, snapped for cross-engine parity."""
    return (
        F.expr(f"percentile({col_name}, {p})").cast("decimal(18,6)").cast("double")
    )


def summary_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format describe(): one row per measure with
    n/mean/std/min/p25/median/p75/max."""
    parts = []
    for c in cols:
        x = F.col(c)
        agg = df.agg(
            F.count(x).alias("n"),
            _s(x).alias("sx"),
            _s(x * x).alias("sxx"),
            F.min(x).cast("double").alias("min_value"),
            _pct(c, 0.25).alias("p25"),
            _pct(c, 0.5).alias("median"),
            _pct(c, 0.75).alias("p75"),
            F.max(x).cast("double").alias("max_value"),
        ).select(
            F.lit(c).alias("measure"),
            "n",
            # power-sum decimals can exceed 2^53 raw units; engines then
            # disagree by ~1 ulp on the decimal->double conversion, so
            # derived statistics are rounded to absorb the gap
            F.round(F.col("sx") / F.col("n"), 6).alias("mean"),
            F.round(
                F.sqrt(
                    (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                    / F.nullif(F.col("n") - 1, F.lit(0))
                ),
                6,
            ).alias("std"),
            "min_value",
            "p25",
            "median",
            "p75",
            "max_value",
        )
        parts.append(agg)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def oracle_summary_stats(mart_cte: str, table: str, cols: list[str]) -> str:
    """DuckDB twin of summary_stats."""
    selects = []
    for c in cols:
        selects.append(
            f"""
SELECT '{c}' AS measure,
       COUNT({c}) AS n,
       round(CAST(SUM(CAST({c} AS DECIMAL(38,8))) AS DOUBLE) / COUNT({c}), 6) AS mean,
       round(sqrt((CAST(SUM(CAST({c} * {c} AS DECIMAL(38,8))) AS DOUBLE)
             - CAST(SUM(CAST({c} AS DECIMAL(38,8))) AS DOUBLE)
               * CAST(SUM(CAST({c} AS DECIMAL(38,8))) AS DOUBLE) / COUNT({c}))
            / NULLIF(COUNT({c}) - 1, 0)), 6) AS std,
       CAST(MIN({c}) AS DOUBLE) AS min_value,
       CAST(CAST(quantile_cont({c}, 0.25) AS DECIMAL(18,6)) AS DOUBLE) AS p25,
       CAST(CAST(quantile_cont({c}, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS median,
       CAST(CAST(quantile_cont({c}, 0.75) AS DECIMAL(18,6)) AS DOUBLE) AS p75,
       CAST(MAX({c}) AS DOUBLE) AS max_value
FROM {table}"""
        )
    body = "\nUNION ALL\n".join(selects)
    return f"WITH {mart_cte}\nSELECT * FROM (\n{body}\n) ORDER BY measure"


def corr_pairs(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations (long format), from exact sums."""
    parts = []
    for i, cx in enumerate(cols):
        for cy in cols[i + 1 :]:
            x, y = F.col(cx), F.col(cy)
            agg = df.agg(
                F.count(F.lit(1)).alias("n"),
                _s(x).alias("sx"),
                _s(y).alias("sy"),
                _s(x * y).alias("sxy"),
                _s(x * x).alias("sxx"),
                _s(y * y).alias("syy"),
            ).select(
                F.lit(cx).alias("var_x"),
                F.lit(cy).alias("var_y"),
                (
                    (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                    / F.nullif(
                        F.sqrt(
                            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                        ),
                        F.lit(0.0),
                    )
                ).alias("corr_raw"),
            ).select("var_x", "var_y", F.round(F.col("corr_raw"), 9).alias("corr"))
            parts.append(agg)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def oracle_corr_pairs(mart_cte: str, table: str, cols: list[str]) -> str:
    """DuckDB twin of corr_pairs."""
    def s(expr: str) -> str:
        return f"CAST(SUM(CAST({expr} AS DECIMAL(38,8))) AS DOUBLE)"

    selects = []
    for i, cx in enumerate(cols):
        for cy in cols[i + 1 :]:
            selects.append(
                f"""
SELECT '{cx}' AS var_x, '{cy}' AS var_y,
       (COUNT(*) * {s(f'{cx} * {cy}')} - {s(cx)} * {s(cy)})
       / NULLIF(sqrt((COUNT(*) * {s(f'{cx} * {cx}')} - {s(cx)} * {s(cx)})
                     * (COUNT(*) * {s(f'{cy} * {cy}')} - {s(cy)} * {s(cy)})), 0.0)
         AS corr_raw
FROM {table}"""
            )
    body = "\nUNION ALL\n".join(selects)
    return (
        f"WITH {mart_cte}\nSELECT var_x, var_y, round(corr_raw, 9) AS corr "
        f"FROM (\n{body}\n) ORDER BY var_x, var_y"
    )


def histogram(df: DataFrame, col: str, width: float) -> DataFrame:
    """Fixed-width histogram: bin ordinal, range bounds, count."""
    bin_ = F.floor(F.col(col) / width).cast("long")
    return (
        df.groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("bin") * width).alias("bin_lo"),
            ((F.col("bin") + 1) * width).alias("bin_hi"),
            "n",
        )
        .orderBy("bin")
    )
