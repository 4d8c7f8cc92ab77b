"""PySpark-native BI / data-warehouse analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference stack ``sarinang92/Business-Intelligence-and-Data-Warehouse``
(Kimball star-schema warehouse + Pentaho-Kettle ETL + PostgreSQL
analytical queries + pandas/sklearn analytics), extended with
large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) and a Structured
Streaming layer.

Layout:
    session      -- tuned SparkSession factory
    schemas      -- explicit StructType schemas (never inferSchema)
    sources/     -- testdata star-schema loader, CSV ingest, sinks
    functions/   -- scalar/column function library (datetime, geo, text, ...)
    operators/   -- engine operators Spark lacks natively (SCD, dedup, ANN, ...)
    plans/       -- the reference's 10 analytical query patterns + mart
    etl/         -- warehouse build: dims, facts, data quality
    analytics/   -- descriptive / predictive / prescriptive layers
    streaming/   -- watermarked windowed aggregations over event streams
"""

__version__ = "0.1.0"
