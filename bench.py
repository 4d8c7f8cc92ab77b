"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is timed end-to-end (plan + execute + collect). Results are
small aggregates, so collect() cost is negligible versus the scan/joins.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from business_intelligence_and_data_warehouse_spark.plans.queries import QUERIES
    from business_intelligence_and_data_warehouse_spark.session import get_spark
    from business_intelligence_and_data_warehouse_spark.sources.testdata import sf_of

    spark = get_spark(app_name="bidw-bench", cpus=cpus)

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not first-touch JIT/IO setup.
    QUERIES["q1a_yoy_growth"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Warm best-of-2 per query: the first execution includes JIT/codegen
    # compilation and parquet footer caching; the reported number is the
    # steady-state plan cost (min of two runs). Results are materialized
    # through the noop sink so the timing measures engine execution, not
    # row shipping into the Python driver.
    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        best = None
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as exc:  # keep the bench line parseable
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0
            continue
        timings[name] = round(best, 3)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "battery_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
