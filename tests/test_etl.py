"""Engine-side ETL behavior tests (properties the DuckDB oracle can't
express: calendar density, holiday computus, quality routing, CSV
quarantine)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from business_intelligence_and_data_warehouse_spark.etl.dims import build_dim_time
from business_intelligence_and_data_warehouse_spark.etl.quality import split_quality
from business_intelligence_and_data_warehouse_spark.functions.holidays import (
    brazilian_holidays,
    easter_date,
)
from business_intelligence_and_data_warehouse_spark.sources.csv import (
    read_csv,
    split_corrupt,
)


def test_easter_computus_known_dates():
    # public reference dates for Gregorian Easter
    assert easter_date(2016) == dt.date(2016, 3, 27)
    assert easter_date(2018) == dt.date(2018, 4, 1)
    assert easter_date(2020) == dt.date(2020, 4, 12)
    assert easter_date(2024) == dt.date(2024, 3, 31)


def test_holiday_calendar_gating():
    hol = dict(brazilian_holidays(2016, 2024))
    assert hol[dt.date(2016, 3, 25)] == "Sexta-feira Santa"  # Good Friday 2016
    assert dt.date(2023, 11, 20) not in hol  # national only from 2024
    assert hol[dt.date(2024, 11, 20)] == "Consciencia Negra"


def test_dim_time_dense_and_ordered(spark):
    dim = build_dim_time(spark).cache()
    n = dim.count()
    assert n == 1827  # 2016-01-01..2020-12-31 incl. leap day
    # dense contiguous keys in date order
    agg = dim.agg(
        F.min("time_key").alias("lo"),
        F.max("time_key").alias("hi"),
        F.countDistinct("time_key").alias("nk"),
    ).first()
    assert (agg.lo, agg.hi, agg.nk) == (1, n, n)
    # key arithmetic == day distance (the reference's load-bearing quirk)
    a, b = dim.filter(F.col("date").isin("2016-01-01", "2019-07-15")).collect()
    assert abs(a.time_key - b.time_key) == abs((a.date - b.date).days)
    # holidays flagged
    jan1 = dim.filter(F.col("date") == "2018-01-01").first()
    assert jan1.is_holiday and jan1.day_name == "Monday" and jan1.season == "Summer"


def test_quality_split_routes_all_rows(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 5.0), (3, "c", -1.0), (4, "", None)],
        "id int, name string, bal double",
    )
    rules = {
        "name_present": F.length(F.coalesce(F.col("name"), F.lit(""))) > 0,
        "bal_positive": F.col("bal") > 0,
    }
    clean, bad = split_quality(df, rules)
    assert clean.count() + bad.count() == 4
    assert {r.id for r in clean.collect()} == {1}
    viol = {r.id: list(r.violations) for r in bad.collect()}
    assert viol[2] == ["name_present"]
    assert viol[3] == ["bal_positive"]
    assert viol[4] == ["name_present", "bal_positive"]


def test_csv_declared_schema_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name,amount\n1,ok,10.5\n2,bad,notanumber\n3,fine,2.0\n")
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    clean, bad = split_corrupt(read_csv(spark, str(p), schema))
    assert {r.id for r in clean.collect()} == {1, 3}
    assert bad.count() == 1
    assert "notanumber" in bad.first()._corrupt_record


def test_jsonl_declared_schema_and_quarantine(spark, tmp_path):
    from business_intelligence_and_data_warehouse_spark.sources.json import read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok", "amount": 10.5}\n'
        '{"id": 2, "name": "bad", "amount": "notanumber"}\n'
        "this is not json at all\n"
        '{"id": 3, "name": "fine", "amount": 2.0}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    clean, bad = split_corrupt(read_jsonl(spark, str(p), schema))
    assert {r.id for r in clean.collect()} == {1, 3}
    assert bad.count() == 2


def test_load_table_adapts_events_ts_generations(spark, tmp_path):
    """The driver regenerates testdata between rounds and events.ts has
    shipped as TIMESTAMP(NANOS), TIMESTAMP(MICROS) without UTC flag
    (NTZ), and plain micros — load_table must normalize every
    generation to the same session-TZ timestamp values."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from business_intelligence_and_data_warehouse_spark.sources.testdata import (
        load_table,
    )

    when = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    base = {
        "event_id": pa.array([1], pa.int64()),
        "user_id": pa.array([7], pa.int64()),
        "event_type": pa.array(["click"], pa.string()),
        "value": pa.array([1.5], pa.float64()),
        "props": pa.array(["{}"], pa.string()),
    }
    variants = {
        "nanos": pa.array([when], pa.timestamp("ns")),
        "ntz_us": pa.array([when], pa.timestamp("us")),
        "utc_us": pa.array([when], pa.timestamp("us", tz="UTC")),
    }
    got = {}
    for tag, ts_arr in variants.items():
        d = tmp_path / tag
        d.mkdir()
        pq.write_table(
            pa.table({**base, "ts": ts_arr}),
            str(d / "events.parquet"),
            use_deprecated_int96_timestamps=False,
            coerce_timestamps=None,
        )
        df = load_table(spark, str(d), "events")
        assert [f.name for f in df.schema.fields] == [
            "event_id", "ts", "user_id", "event_type", "value", "props",
        ]
        assert df.schema["ts"].simpleString() == "ts:timestamp"
        got[tag] = df.first().ts
    assert got["nanos"] == got["ntz_us"] == got["utc_us"] == when


def test_split_corrupt_survives_release_pinned_and_rejects_pinned_options(
    spark, tmp_path
):
    """The quarantine split is a CORRECTNESS materialization: after
    release_pinned (which every registry query fires at start), the
    clean/corrupt handles must still return the SAME split — the old
    ledger-pinned form silently re-admitted the corrupt row on
    recompute and crashed the corrupt-only consumer (r10 review
    finding).  And the pinned ingest options error clearly instead of
    TypeError-ing."""
    import pytest

    from business_intelligence_and_data_warehouse_spark.operators.caching import (
        release_pinned,
    )
    from business_intelligence_and_data_warehouse_spark.sources.csv import (
        read_csv,
        split_corrupt,
    )
    from pyspark.sql import types as T

    path = str(tmp_path / "in.csv")
    with open(path, "w") as fh:
        fh.write("id,amount\n1,10.5\n2,notanumber\n3,2.0\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    clean, bad = split_corrupt(read_csv(spark, path, schema))
    assert sorted(r.id for r in clean.select("id").collect()) == [1, 3]
    assert bad.count() == 1
    release_pinned()
    spark.catalog.clearCache()
    # the split must NOT change and the corrupt-only read must NOT
    # crash after the ledger released everything
    assert sorted(r.id for r in clean.select("id").collect()) == [1, 3]
    assert bad.count() == 1

    with pytest.raises(ValueError, match="pins"):
        read_csv(spark, path, schema, mode="FAILFAST")
    with pytest.raises(ValueError, match="pins"):
        read_csv(spark, path, schema, columnNameOfCorruptRecord="_x")
