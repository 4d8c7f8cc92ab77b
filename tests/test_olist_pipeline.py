"""End-to-end warehouse build on reference-shaped (Olist-like) inputs.

Exercises the full ETL surface the reference implements (FIXTURES.md §A):
raw CSVs with quality problems -> declared-schema ingest -> cleansing ->
SCD1 location dim -> SCD2 customer dim (initial + change batch) ->
generated calendar -> fact load with dimension lookups -> an analytical
query over the star — proving a reference user can run their pipeline
here end-to-end.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from business_intelligence_and_data_warehouse_spark.etl.dims import build_dim_time
from business_intelligence_and_data_warehouse_spark.etl.facts import write_fact
from business_intelligence_and_data_warehouse_spark.etl.quality import (
    split_quality,
    write_quarantine,
)
from business_intelligence_and_data_warehouse_spark.functions.cleansing import (
    canonicalize,
    trim_initcap,
    trim_upper,
)
from business_intelligence_and_data_warehouse_spark.operators.scd import (
    scd1_upsert,
    scd2_asof_lookup,
    scd2_initial_load,
    scd2_merge,
)
from business_intelligence_and_data_warehouse_spark.sources.csv import (
    read_csv,
    split_corrupt,
)

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.StringType()),
        T.StructField("customer_unique_id", T.StringType()),
        T.StructField("zip", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
    ]
)


def test_full_star_build(spark, tmp_path):
    # --- raw CSVs with the reference's data problems -------------------
    cust_csv = tmp_path / "customers.csv"
    cust_csv.write_text(
        "customer_id,customer_unique_id,zip,city,state\n"
        "c1,u1,01001,  sao paulo ,sp\n"
        "c2,u2,01002,Rio De Janeiro,RJ\n"
        "c3,,01003,Campinas,SP\n"  # NULL unique id -> quarantine
        "c4,u4,01001,säo paulo,SP\n"
    )
    geo_csv = tmp_path / "geo.csv"
    geo_csv.write_text(
        "zip,lat,lng,city\n"
        "01001,-23.55,-46.63,sao paulo\n"
        "01001,-23.56,-46.64,sao paulo\n"  # duplicate zip: SCD1 last-wins
        "01002,-22.90,-43.20,rio de janeiro\n"
        ",0.0,0.0,nowhere\n"  # NULL zip: filtered
    )

    # --- ingest with declared schemas + corrupt capture ----------------
    customers, corrupt = split_corrupt(
        read_csv(spark, str(cust_csv), CUSTOMER_SCHEMA)
    )
    assert corrupt.count() == 0

    # --- cleansing (P3/P4): trim/case + spelling canonicalization ------
    sp_variants = {"Sao Paulo": "São Paulo", "Säo Paulo": "São Paulo"}
    cleansed = customers.select(
        "customer_id",
        "customer_unique_id",
        "zip",
        canonicalize(trim_initcap(F.col("city")), sp_variants).alias("city"),
        trim_upper(F.col("state")).alias("state"),
    )

    # --- quality gate: NOT-NULL rules with quarantine channel ----------
    clean, bad = split_quality(
        cleansed,
        {
            "unique_id_present": F.col("customer_unique_id").isNotNull(),
            "zip_present": F.col("zip").isNotNull(),
        },
    )
    assert bad.count() == 1 and bad.first().customer_id == "c3"
    write_quarantine(bad, str(tmp_path / "errors"))
    assert spark.read.option("header", True).csv(
        str(tmp_path / "errors")
    ).count() == 1

    cities = {r.customer_id: r.city for r in clean.collect()}
    assert cities["c1"] == "São Paulo" and cities["c4"] == "São Paulo"
    assert cities["c2"] == "Rio De Janeiro"

    # --- dim_location: SCD1 last-wins on duplicate zips -----------------
    geo_schema = T.StructType(
        [
            T.StructField("zip", T.StringType()),
            T.StructField("lat", T.DoubleType()),
            T.StructField("lng", T.DoubleType()),
            T.StructField("city", T.StringType()),
        ]
    )
    geo, _ = split_corrupt(read_csv(spark, str(geo_csv), geo_schema))
    geo = geo.filter(F.col("zip").isNotNull())
    dim_location = scd1_upsert(None, geo, ["zip"], order_col="lat")
    locs = {r.zip: r.lat for r in dim_location.collect()}
    assert len(locs) == 2 and locs["01001"] == -23.55  # last-wins by order

    # --- dim_customer: SCD2 initial load + change batch -----------------
    dim_customer = scd2_initial_load(clean, "2016-01-01")
    moved = clean.filter(F.col("customer_id") == "c1").withColumn(
        "city", F.lit("Campinas")
    )
    batch = clean.filter(F.col("customer_id") != "c1").unionByName(moved)
    dim_customer = scd2_merge(
        dim_customer,
        batch,
        ["customer_id"],
        ["customer_unique_id", "zip", "city", "state"],
        "2017-06-01",
    )
    assert dim_customer.filter("customer_id = 'c1'").count() == 2

    # --- dim_time + fact load with as-of key lookup ---------------------
    dim_time = build_dim_time(spark, "2016-01-01", "2018-12-31")
    orders = spark.createDataFrame(
        [
            ("o1", "c1", dt.date(2016, 5, 1), 100.0),   # before the move
            ("o2", "c1", dt.date(2018, 1, 15), 150.0),  # after the move
            ("o3", "c2", dt.date(2017, 1, 1), 200.0),
        ],
        "order_id string, customer_id string, order_date date, price double",
    )
    fact = scd2_asof_lookup(
        orders, dim_customer, ["customer_id"], "order_date", ["city", "version"]
    ).join(F.broadcast(dim_time.select("date", "time_key")),
           F.col("order_date") == F.col("date"), "left")
    rows = {r.order_id: r for r in fact.collect()}
    assert rows["o1"].city == "São Paulo" and rows["o1"].version == 1
    assert rows["o2"].city == "Campinas" and rows["o2"].version == 2
    assert all(r.time_key is not None for r in rows.values())

    # --- warehouse sink: partitioned parquet -----------------------------
    out = str(tmp_path / "fact_orders")
    write_fact(
        fact.withColumn("year", F.year("order_date")), out, ("year",)
    )
    reread = spark.read.parquet(out)
    assert reread.count() == 3
    assert {r.year for r in reread.select("year").distinct().collect()} == {
        2016, 2017, 2018,
    }

    # --- analytical query over the built star ---------------------------
    dt_lookup = dim_time.select(F.col("time_key").alias("tk"), "month")
    monthly = (
        reread.join(F.broadcast(dt_lookup), reread.time_key == dt_lookup.tk)
        .groupBy("year", "month")
        .agg(F.sum(F.col("price").cast("decimal(18,6)")).cast("double").alias("rev"))
    )
    assert monthly.count() == 3
