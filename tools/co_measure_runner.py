"""Single co-measure pass: time a query list once (best-of-R warm runs
per query) in ONE tree's engine, print a JSON timing map on stdout.

Usage: python co_measure_runner.py TREE SF_DIR Q1,Q2,... RUNS

The tree's own session helper and registry are used — its session
tuning is part of the code under measurement (the r6 forensics rule:
never compare recorded numbers across environments; run BOTH trees
today, interleaved, via tools/co_measure.py).  Timings mirror
bench.py: noop-sink materialization, per-query min over RUNS warm
executions after a warm-up query.  A query that raises reports -1.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree, sf_dir, names_csv, runs = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        int(sys.argv[4]),
    )
    # absolute BEFORE chdir: a relative sys.path entry re-resolves
    # against the new cwd and can silently import another tree's (or a
    # site-packages) copy of the package (r11 review finding)
    tree = os.path.abspath(tree)
    sys.path.insert(0, tree)
    os.chdir(tree)
    from business_intelligence_and_data_warehouse_spark.plans.queries import (  # noqa: PLC0415
        QUERIES,
    )
    from business_intelligence_and_data_warehouse_spark import session  # noqa: PLC0415

    if hasattr(session, "shuffle_partitions_for"):
        data_bytes = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _dirs, files in os.walk(sf_dir)
            for f in files
            if not f.startswith((".", "_"))
        )
        spark = session.get_spark(
            app_name="co-measure",
            cpus=32,
            shuffle_partitions=session.shuffle_partitions_for(data_bytes, 32),
        )
    else:
        spark = session.get_spark(app_name="co-measure", cpus=32)

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    try:  # JVM/JIT/footer warm-up, identical to bench.py
        _noop(QUERIES["q1a_yoy_growth"](spark, sf_dir))
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name in names_csv.split(","):
        if name not in QUERIES:
            timings[name] = -2.0  # not in this tree's registry
            continue
        best = None
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                _noop(QUERIES[name](spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as exc:
            print(f"co-measure: {name} FAILED: {exc!r}"[:500], file=sys.stderr)
            timings[name] = -1.0
    spark.stop()
    print("CO_MEASURE_JSON " + json.dumps(timings))


if __name__ == "__main__":
    main()
