"""Dump .explain("formatted") for a list of registry queries to files.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX q1,q2,... [SF_DIR]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query.  Queries whose
builder executes side work (streaming sinks, index builds) still run
that work; the captured plan is the declared result DataFrame's — the
same object the bench times through the noop sink.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, names_csv = sys.argv[1], sys.argv[2], sys.argv[3]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    names = [n for n in names_csv.split(",") if n]
    os.makedirs(out_dir, exist_ok=True)

    from business_intelligence_and_data_warehouse_spark.plans.queries import (
        QUERIES,
    )
    from business_intelligence_and_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="plan-dump")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
