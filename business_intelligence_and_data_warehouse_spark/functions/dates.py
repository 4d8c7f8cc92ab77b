"""Calendar attribute derivation — all native Catalyst expressions.

The reference derives these with a JavaScript row-UDF
(`ETL/ETL for time.ktr:816-962`: ISO day-of-week, English day/month
names, ISO week, quarter, year, southern-hemisphere season). Every one
maps to a built-in Spark function, so the whole derivation stays inside
whole-stage codegen — no UDF, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def season_southern(month: Column) -> Column:
    """Southern-hemisphere season (reference: Dec-Feb Summer, Mar-May
    Autumn, Jun-Aug Winter, Sep-Nov Spring)."""
    return (
        F.when(month.isin(12, 1, 2), "Summer")
        .when(month.isin(3, 4, 5), "Autumn")
        .when(month.isin(6, 7, 8), "Winter")
        .otherwise("Spring")
    )


def with_calendar_attributes(df: DataFrame, date_col: str = "date") -> DataFrame:
    """Append the reference's dim_time attribute set to `date_col`."""
    d = F.col(date_col)
    month = F.month(d)
    return (
        df.withColumn("day", F.dayofmonth(d))
        .withColumn("day_of_week", (F.weekday(d) + 1).cast("int"))  # ISO 1=Mon
        .withColumn("day_name", F.date_format(d, "EEEE"))
        .withColumn("week_of_year", F.weekofyear(d).cast("int"))
        .withColumn("month", month.cast("int"))
        .withColumn("month_name", F.date_format(d, "MMMM"))
        .withColumn("quarter", F.quarter(d).cast("int"))
        .withColumn("year", F.year(d).cast("int"))
        .withColumn("season", season_southern(month))
    )


# The same attribute set for a DuckDB oracle, parameterized on the
# date expression. Keep in lockstep with with_calendar_attributes().
ORACLE_CALENDAR_COLS = """
  CAST(dayofmonth({d}) AS INTEGER)  AS day,
  CAST(isodow({d}) AS INTEGER)      AS day_of_week,
  dayname({d})                      AS day_name,
  CAST(weekofyear({d}) AS INTEGER)  AS week_of_year,
  CAST(month({d}) AS INTEGER)       AS month,
  monthname({d})                    AS month_name,
  CAST(quarter({d}) AS INTEGER)     AS quarter,
  CAST(year({d}) AS INTEGER)        AS year,
  CASE WHEN month({d}) IN (12, 1, 2) THEN 'Summer'
       WHEN month({d}) IN (3, 4, 5)  THEN 'Autumn'
       WHEN month({d}) IN (6, 7, 8)  THEN 'Winter'
       ELSE 'Spring' END             AS season
"""
