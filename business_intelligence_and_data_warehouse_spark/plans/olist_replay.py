"""Byte-parity replay of the reference's golden result CSVs.

The reference ships 9 full result CSVs (`Database/Results from Task 2A
Analytical Queries/`) that pin the semantics a cross-engine value
oracle can't: exact label strings ('Grand total', 'Uncategorized',
'Category Subtotal'), NULL display, and display rounding. Its raw
Olist inputs are NOT in the repo — but four goldens publish their own
finest aggregation grain, which algebraically determines every other
row in the file:

* 2A (grouping sets)  — detail rows (year, month, category, revenue)
  determine the monthly/yearly/grand-total rows.
* 2B (rollup)         — detail rows (category, product, revenue)
  determine the category subtotals and grand total.
* 1A (YoY growth)     — its monthly revenues ARE the 2A details rolled
  up (verified exact to the cent for all 24 months), and the
  LAG/growth columns derive per row.
* 3B (moving/cumulative) — the (day, revenue) columns are the input
  grain; moving_avg_7d and year_to_date_revenue derive per row.

So the harness ingests the published grain as the fact fixture, reruns
the reference's aggregation/label/window logic through THIS engine,
and asserts every output row — labels, NULLs, decimal digit strings —
matches the golden byte-for-byte (after canonical re-sort: the golden
export order uses the reference DB's locale collation for text ties,
which is exporter configuration, not query semantics).

Reference SQL being replayed: `Database/TASK 2A SQL Analytical
Queries.sql:5-37` (1A), `:73-105` (2A), `:108-123` (2B), `:147-166`
(3B). Golden CSVs: `Database/Results from Task 2A Analytical
Queries/*.csv`.

All revenue arithmetic is DECIMAL end-to-end: Olist prices have two
decimals, so sums are exact in cents and the goldens' printed values
are exact, not rounded — which is what makes byte-parity a meaningful
assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

MONTH_NAMES = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]

# grouping-set row labels (TASK 2A SQL Analytical Queries.sql:96-101)
LABEL_GRAND = "Grand total"
LABEL_YEARLY = "All categories yearly total"
LABEL_MONTHLY = "All categories monthly total"
LABEL_UNCAT = "Uncategorized"
TOTAL_LABELS_2A = {LABEL_GRAND, LABEL_YEARLY, LABEL_MONTHLY}

# rollup labels (sql:109-114)
LABEL_ALL_CATS = "All Categories"
LABEL_CAT_SUBTOTAL = "Category Subtotal"
LABEL_GRAND_2B = "Grand Total"


def replay_2a(detail: DataFrame) -> DataFrame:
    """Reference 2A (sql:73-105): revenue by (year, month, category)
    plus monthly / yearly / grand totals via GROUPING SETS, with the
    reference's exact CASE labels. `detail` columns: year int,
    month int, category string (NULL = uncategorized),
    revenue decimal(18,2)."""
    spark = detail.sparkSession
    detail.createOrReplaceTempView("golden_2a_detail")
    return spark.sql(f"""
WITH agg AS (
  SELECT year, month, category, SUM(revenue) AS revenue,
         CAST(GROUPING(year) AS INT) AS g_year,
         CAST(GROUPING(month) AS INT) AS g_month,
         CAST(GROUPING(category) AS INT) AS g_cat
  FROM golden_2a_detail
  GROUP BY GROUPING SETS ((year, month, category), (year, month), (year), ())
)
SELECT year, month,
  CASE
    WHEN g_year = 1 AND g_month = 1 AND g_cat = 1 THEN '{LABEL_GRAND}'
    WHEN g_year = 0 AND g_month = 1 AND g_cat = 1 THEN '{LABEL_YEARLY}'
    WHEN g_year = 0 AND g_month = 0 AND g_cat = 1 THEN '{LABEL_MONTHLY}'
    ELSE COALESCE(category, '{LABEL_UNCAT}')
  END AS category_label,
  revenue, g_year, g_month, g_cat
FROM agg
ORDER BY g_year, year, g_month, month, g_cat, category_label
""")


def replay_2b(detail: DataFrame) -> DataFrame:
    """Reference 2B (sql:108-123): category -> product ROLLUP with
    subtotal/grand-total labels. `detail` columns: category string
    (NULL = uncategorized), product_id string, revenue decimal(18,2)."""
    rolled = detail.rollup("category", "product_id").agg(
        F.sum("revenue").alias("revenue"),
        F.grouping("category").cast("int").alias("g_cat"),
        F.grouping("product_id").cast("int").alias("g_prod"),
    )
    # reference orders on the RAW rollup columns (sql:121-123), where
    # Postgres ASC puts NULLs last — so the NULL-category block lands
    # after every named category, and subtotals after their products
    ordered = rolled.orderBy(
        "g_cat",
        F.col("category").asc_nulls_last(),
        "g_prod",
        F.col("product_id").asc_nulls_last(),
    )
    return (
        ordered.select(
            F.when(F.col("g_cat") == 1, F.lit(LABEL_ALL_CATS))
            .otherwise(F.coalesce(F.col("category"), F.lit(LABEL_UNCAT)))
            .alias("category"),
            F.when(
                (F.col("g_prod") == 1) & (F.col("g_cat") == 0),
                F.lit(LABEL_CAT_SUBTOTAL),
            )
            .when(
                (F.col("g_prod") == 1) & (F.col("g_cat") == 1),
                F.lit(LABEL_GRAND_2B),
            )
            .otherwise(F.col("product_id"))
            .alias("product_or_total"),
            "revenue",
            "g_cat",
            "g_prod",
        )
    )


def replay_1a(detail_2a: DataFrame) -> DataFrame:
    """Reference 1A (sql:5-37): monthly revenue (the 2A details rolled
    up), LAG over the same calendar month across years, YoY growth pct
    rounded at 2 decimals (decimal arithmetic throughout — the division
    happens at scale >= 6 in both engines, and the +-5e-7 window where
    a second rounding at scale 2 could flip is unreachable for exact
    cent sums)."""
    monthly = detail_2a.groupBy("year", "month").agg(
        F.sum("revenue").alias("revenue")
    )
    month_name = F.element_at(
        F.array(*[F.lit(m) for m in MONTH_NAMES]), F.col("month")
    )
    w = W.partitionBy("month").orderBy("year")
    base = monthly.select(
        "year",
        "month",
        month_name.alias("month_name"),
        "revenue",
        F.lag("revenue").over(w).alias("last_year_revenue"),
    )
    growth = F.round(
        (F.col("revenue") - F.col("last_year_revenue"))
        * 100
        / F.nullif(F.col("last_year_revenue"), F.lit(0).cast("decimal(18,2)")),
        2,
    )
    return base.select(
        "year", "month", "month_name", "revenue", "last_year_revenue",
        growth.alias("yoy_growth_pct"),
    ).orderBy("year", "month")


def replay_3b(daily: DataFrame) -> DataFrame:
    """Reference 3B (sql:147-166): trailing 7-day moving average
    (ROUND 2) and year-to-date cumulative sum over daily revenue.
    `daily` columns: day date, revenue decimal(18,2)."""
    w_ma = W.orderBy("day").rowsBetween(-6, 0)
    w_ytd = (
        W.partitionBy(F.year("day")).orderBy("day").rowsBetween(
            W.unboundedPreceding, 0
        )
    )
    return daily.select(
        "day",
        "revenue",
        F.round(F.avg("revenue").over(w_ma), 2).alias("moving_avg_7d"),
        F.sum("revenue").over(w_ytd).alias("year_to_date_revenue"),
    ).orderBy("day")
