"""Driver-checkable ETL operator queries.

Each entry exercises one ETL operator family from SURVEY.md §2.1-2.2
(sources, projections, cleansing, surrogate keys, quality gates,
haversine) end-to-end over the synthetic tables, paired with a DuckDB
oracle. Registered into the same QUERIES/ORACLES registries as the
analytical battery (plans.queries) via the shared decorator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..etl.dims import DIM_TIME_END, DIM_TIME_START, build_dim_category, build_dim_time
from ..etl.facts import build_fact_order_lines
from ..etl.quality import split_quality
from ..functions.dates import ORACLE_CALENDAR_COLS
from ..functions.geo import (
    haversine_km,
    oracle_haversine,
    oracle_synth_coords,
    synth_coords,
)
from ..functions.holidays import holiday_values_sql
from ..sources.testdata import load_table
from .queries import query_fn

# ---------------------------------------------------------------------------
# dim_time: generated calendar + holiday flag (reference ETL for time.ktr;
# operators S2 row-generator, P9 calendar UDF, P10 holiday UDF, P12 sequence)
# ---------------------------------------------------------------------------

_ORACLE_DIM_TIME = f"""
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '{DIM_TIME_START}', DATE '{DIM_TIME_END}',
                                     INTERVAL 1 DAY)) AS DATE) AS date
),
holidays(holiday_date) AS {holiday_values_sql(2016, 2020)}
SELECT
  CAST(row_number() OVER (ORDER BY date) AS INTEGER) AS time_key,
  date,
  {ORACLE_CALENDAR_COLS.format(d='date')},
  (date IN (SELECT holiday_date FROM holidays)) AS is_holiday
FROM days
ORDER BY date
"""


@query_fn("etl_dim_time", oracle=_ORACLE_DIM_TIME)
def etl_dim_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full generated calendar dimension (1,827 rows, 2016-2020)."""
    return build_dim_time(spark).select(
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
        "season",
        "is_holiday",
    )


# ---------------------------------------------------------------------------
# dim_category: distinct domain + dense surrogate key (P12 sequence,
# reference ETL for category.ktr)
# ---------------------------------------------------------------------------

@query_fn(
    "etl_dim_category",
    oracle="""
WITH domain AS (
  SELECT DISTINCT regexp_replace(trim(p_type), '_', ' ', 'g') AS category_name
  FROM part WHERE p_type IS NOT NULL
)
SELECT CAST(row_number() OVER (ORDER BY category_name) AS INTEGER) AS category_key,
       category_name
FROM domain ORDER BY category_key
""",
)
def etl_dim_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category dimension built from the part type domain."""
    part = load_table(spark, sf_dir, "part")
    return build_dim_category(part, "p_type")


# ---------------------------------------------------------------------------
# fact_order_lines: the full fact-build pipeline (S1 scan, J1 join,
# J2 dim lookups, P1 project/rename, P7 date copy, P12 dense time key)
# ---------------------------------------------------------------------------

@query_fn(
    "etl_fact_order_lines",
    oracle="""
WITH dim_date AS (
  SELECT date, CAST(row_number() OVER (ORDER BY date) AS INTEGER) AS time_key
  FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date FROM orders)
)
SELECT
  l_orderkey AS order_id,
  l_linenumber AS order_line_number,
  d.time_key,
  CAST(o_orderdate AS DATE) AS order_date,
  o_custkey AS customer_key,
  l_partkey AS product_key,
  l_suppkey AS seller_key,
  l_quantity AS quantity,
  l_extendedprice AS price,
  l_extendedprice * l_discount AS discount_value,
  o_orderstatus AS order_status
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
LEFT JOIN dim_date d ON d.date = CAST(o_orderdate AS DATE)
""",
)
def etl_fact_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-line fact with resolved dimension keys (full table)."""
    return build_fact_order_lines(spark, sf_dir)


# ---------------------------------------------------------------------------
# Quality gate: constraint validation + quarantine channel (P2 filter
# routing, S5 error sink; reference customer_upsert_errors.csv)
# ---------------------------------------------------------------------------

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")


@query_fn(
    "etl_quality_quarantine",
    oracle=f"""
SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
       concat_ws(';',
         CASE WHEN NOT COALESCE(c_acctbal >= 0, FALSE) THEN 'acctbal_non_negative' END,
         CASE WHEN NOT COALESCE(length(trim(c_name)) > 0, FALSE) THEN 'name_present' END,
         CASE WHEN NOT COALESCE(c_mktsegment IN {_SEGMENTS!r}, FALSE) THEN 'segment_known' END
       ) AS violations
FROM customer
WHERE NOT COALESCE(c_acctbal >= 0, FALSE)
   OR NOT COALESCE(length(trim(c_name)) > 0, FALSE)
   OR NOT COALESCE(c_mktsegment IN {_SEGMENTS!r}, FALSE)
ORDER BY c_custkey
""",
)
def etl_quality_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows failing declared constraints, with the failed-rule list."""
    customer = load_table(spark, sf_dir, "customer")
    rules = {
        "acctbal_non_negative": F.col("c_acctbal") >= 0,
        "name_present": F.length(F.trim("c_name")) > 0,
        "segment_known": F.col("c_mktsegment").isin(*_SEGMENTS),
    }
    _, bad = split_quality(customer, rules)
    return bad.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_mktsegment",
        F.concat_ws(";", "violations").alias("violations"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Haversine distance (P13; reference PythonAnalysis.py:63-79). Trig
# results differ by ~1 ulp between JVM and libm, so the per-pair
# distance is snapped to DECIMAL(18,4) before aggregation.
# ---------------------------------------------------------------------------

_LAT1, _LNG1 = oracle_synth_coords("c_custkey", 0)
_LAT2, _LNG2 = oracle_synth_coords("s_suppkey", 1)


@query_fn(
    "etl_haversine_distance",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c_custkey, l_suppkey AS s_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
coords AS (
  SELECT c_custkey, s_suppkey,
         CAST({oracle_haversine(_LAT1, _LNG1, _LAT2, _LNG2)} AS DECIMAL(18,4))
           AS distance_km
  FROM pairs
)
SELECT c_custkey AS customer_id,
       COUNT(*) AS n_suppliers,
       CAST(SUM(distance_km) AS DOUBLE) AS total_distance_km,
       CAST(MIN(distance_km) AS DOUBLE) AS nearest_km,
       CAST(MAX(distance_km) AS DOUBLE) AS farthest_km
FROM coords
GROUP BY c_custkey
ORDER BY customer_id
""",
)
def etl_haversine_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-to-supplier great-circle distances (synthetic coords)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    pairs = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_suppkey").alias("s_suppkey"),
        )
        .distinct()
    )
    lat1, lng1 = synth_coords(F.col("c_custkey"), 0)
    lat2, lng2 = synth_coords(F.col("s_suppkey"), 1)
    coords = pairs.withColumn(
        "distance_km", haversine_km(lat1, lng1, lat2, lng2).cast("decimal(18,4)")
    )
    return (
        coords.groupBy(F.col("c_custkey").alias("customer_id"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("distance_km").cast("double").alias("total_distance_km"),
            F.min("distance_km").cast("double").alias("nearest_km"),
            F.max("distance_km").cast("double").alias("farthest_km"),
        )
        .orderBy("customer_id")
    )


# ---------------------------------------------------------------------------
# String cleansing battery (P3 regex/literal replace, P4 trim/case)
# ---------------------------------------------------------------------------

@query_fn(
    "etl_string_cleansing",
    oracle="""
SELECT doc_id,
       upper(trim(lang)) AS lang_code,
       regexp_replace(source, '^src', 'source-', 'g') AS source_id,
       trim(substr(text, 1, 40)) AS head,
       CASE WHEN trim(source) = '' THEN 'unknown' ELSE source END AS source_defaulted
FROM documents
ORDER BY doc_id
""",
)
def etl_string_cleansing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trim/case/regex-replace cleansing over the documents table."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.trim("lang")).alias("lang_code"),
        F.regexp_replace("source", "^src", "source-").alias("source_id"),
        F.trim(F.substring("text", 1, 40)).alias("head"),
        F.when(F.trim(F.col("source")) == "", F.lit("unknown"))
        .otherwise(F.col("source"))
        .alias("source_defaulted"),
    ).orderBy("doc_id")
