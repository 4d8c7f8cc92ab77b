"""Oracle-verify a NAMED subset of registry queries the way the
driver does (vanilla session, sf0.01, DuckDB hash compare).

Usage: python tools/drive_subset.py q1,q2,...  [SF_DIR]
"""

import sys

from drive_driver_contract import SF, TABLES, vhash  # noqa: F401


def main():
    names = [n for n in sys.argv[1].split(",") if n]
    sf = sys.argv[2] if len(sys.argv) > 2 else SF

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf).toPandas()
            if name not in oracles:
                print(f"{name}: rows={len(sdf)} (no_oracle)", flush=True)
                continue
            odf = con.execute(oracles[name]).df()
            ok = (
                len(sdf) == len(odf)
                and sorted(sdf.columns) == sorted(odf.columns)
                and vhash(sdf) == vhash(odf)
            )
            if ok:
                print(f"{name}: OK rows={len(sdf)}", flush=True)
            else:
                failures += 1
                print(f"{name}: FAIL rows {len(sdf)}/{len(odf)}", flush=True)
        except Exception:
            import traceback

            failures += 1
            print(f"{name}: ERROR", flush=True)
            traceback.print_exc()
    print(f"FAILURES: {failures}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
