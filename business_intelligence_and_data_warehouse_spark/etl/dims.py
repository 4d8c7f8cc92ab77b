"""Dimension builders.

Spark-first re-expressions of the reference's dimension ETLs:

* dim_time — the reference emits one row per day 2016-2020 from a
  JS generator loop (`ETL/ETL for time.ktr:567-637`), derives calendar
  attributes in a JS UDF (:816-962) and flags Brazilian holidays with an
  embedded computus (:681-815). Here: ``explode(sequence(...))`` +
  native date functions + the generated holiday calendar folded into a
  constant IN-list (a few dozen dates — cheaper than a broadcast join).
  The dense, date-ordered surrogate ``time_key`` (Kettle ``Sequence``
  step, :532-566) becomes ``row_number()`` over the date order —
  deterministic and contiguous, unlike ``monotonically_increasing_id``.
* dim_category — distinct category values + dense surrogate key
  (reference `ETL/ETL for category.ktr:521-760`).

Scale note: dimension tables here are tiny by construction (a calendar
is O(days); category domains are small), so a single window over an
un-partitioned row_number is not a bottleneck — the input to the window
is already the *aggregated/distinct* set, never the fact data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.cleansing import underscores_to_spaces
from ..functions.dates import with_calendar_attributes
from ..functions.holidays import brazilian_holidays

DIM_TIME_START = "2016-01-01"
DIM_TIME_END = "2020-12-31"


def build_dim_time(
    spark: SparkSession,
    start: str = DIM_TIME_START,
    end: str = DIM_TIME_END,
) -> DataFrame:
    """Dense daily calendar dimension with holiday flag.

    Matches the reference dim_time column set
    (`Database/Database Creation.sql:22-36`).
    """
    days = spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'), "
        f"interval 1 day)) AS date"
    )
    cal = with_calendar_attributes(days, "date")
    start_year, end_year = int(start[:4]), int(end[:4])
    # The holiday calendar for any realistic range is a few dozen dates,
    # so it folds into an IN-list literal: zero extra jobs (the previous
    # broadcast-join form paid a createDataFrame + broadcast build every
    # run), and Catalyst compiles it to a constant set membership test.
    holidays = [d for d, _ in brazilian_holidays(start_year, end_year)]
    flagged = cal.withColumn("is_holiday", F.col("date").isin(holidays))
    return (
        flagged.withColumn(
            "time_key", F.row_number().over(W.orderBy("date")).cast("int")
        )
        .select(
            "time_key",
            "date",
            "day",
            "day_of_week",
            "day_name",
            "week_of_year",
            "month",
            "month_name",
            "quarter",
            "year",
            "is_holiday",
            "season",
        )
    )


def build_dim_category(
    df: DataFrame, category_col: str, clean: bool = True
) -> DataFrame:
    """Distinct category dimension with a dense surrogate key.

    The reference loads a category translation CSV, replaces
    underscores with spaces and assigns a sequence key
    (`ETL/ETL for category.ktr`). The surrogate is row_number over the
    sorted domain — deterministic across runs (idempotent reload).
    """
    name = F.col(category_col)
    if clean:
        name = underscores_to_spaces(F.trim(name))
    domain = df.select(name.alias("category_name")).where(
        F.col("category_name").isNotNull()
    ).distinct()
    return domain.withColumn(
        "category_key", F.row_number().over(W.orderBy("category_name")).cast("int")
    ).select("category_key", "category_name")
