"""Driver-contract simulation: vanilla SparkSession, sf0.01, first-50
window (or DRIVE_ALL=1 for the whole registry), DuckDB oracle compare
with the conftest normalization. Expect `FAILURES: 0`."""

import hashlib
import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            out[c] = s.map(
                lambda v: v if (v is None or isinstance(v, float)) else str(v)
            )
    out = out.sort_values(
        by=list(out.columns), kind="mergesort", na_position="last"
    )
    return out.reset_index(drop=True)


def vhash(df: pd.DataFrame) -> str:
    n = normalize(df)
    return hashlib.md5(
        n.to_csv(index=False, float_format="%.10g").encode()
    ).hexdigest()


def main():
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
            f"read_parquet('{SF}/{t}.parquet')"
        )

    smoke = e.entry(spark)
    assert smoke.count() >= 0
    print("entry() smoke OK", flush=True)

    qs = e.queries()
    oracles = e.oracle_sql()
    names = list(qs) if os.environ.get("DRIVE_ALL") else list(qs)[:50]
    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF).toPandas()
            if name not in oracles:
                print(f"{name}: rows={len(sdf)} (no_oracle)", flush=True)
                continue
            odf = con.execute(oracles[name]).df()
            ok_rows = len(sdf) == len(odf)
            ok_cols = sorted(sdf.columns) == sorted(odf.columns)
            ok_hash = ok_rows and ok_cols and vhash(sdf) == vhash(odf)
            if ok_hash:
                print(f"{name}: OK rows={len(sdf)}", flush=True)
            else:
                failures += 1
                print(
                    f"{name}: FAIL rows {len(sdf)}/{len(odf)} "
                    f"cols_match={ok_cols}",
                    flush=True,
                )
        except Exception:
            failures += 1
            print(f"{name}: ERROR", flush=True)
            traceback.print_exc()
    print(f"FAILURES: {failures}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
