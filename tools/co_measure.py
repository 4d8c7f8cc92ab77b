"""Interleaved cross-tree co-measurement (the round-6 forensics method
as a reusable tool): run the same query list in TWO trees' engines,
alternating tree passes in the same session environment, and report
per-query minima + ratios.

Usage:
    python tools/co_measure.py TREE_A TREE_B [--passes 3] [--runs 2] \
        [--sf-dir /root/testdata/sf0.1] [--queries a,b,...] [--out f.json]

Recorded bench numbers from different rounds are NOT comparable: the
VM's speed and the driver-regenerated testdata both drift (SCALE.md
round-6 table — the r01 tree run in round 6 was SLOWER than HEAD on
every probe while its recorded numbers were faster).  Only same-hour
interleaved passes — A, B, A, B — measure code, not environment.
Per-query minimum across passes×runs is the stable signal on this VM
(±20-30% IO-wait variance on single runs).

A query missing from a tree's registry reports -2, a raising query -1;
ratios are computed only where both sides are positive.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

DEFAULT_QUERIES = [
    # the 23 queries common to BENCH_r01 and the current headline set
    "analytics_mart",
    "analytics_segmentation",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "etl_dim_time",
    "etl_fact_order_lines",
    "q1a_yoy_growth",
    "q1b_seasonal_index",
    "q2a_grouping_sets",
    "q2b_rollup",
    "q3a_rank_ntile",
    "q3b_moving_cumulative",
    "q4a_multi_exists",
    "q4b_above_category_avg",
    "q5a_ltv_top20",
    "q5b_monthly_kpis",
    "scd2_merge_batch",
    "sim_ann_ivf",
    "sim_ann_lsh",
    "sim_embedding_topk",
    "stream_session_windows",
    "stream_tumbling_counts",
    "text_quality_score",
]


def run_pass(tree: str, sf_dir: str, names: list[str], runs: int) -> dict:
    runner = os.path.join(os.path.dirname(__file__), "co_measure_runner.py")
    proc = subprocess.run(
        [sys.executable, runner, tree, sf_dir, ",".join(names), str(runs)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CO_MEASURE_JSON "):
            return json.loads(line[len("CO_MEASURE_JSON "):])
    raise RuntimeError(
        f"pass in {tree} produced no timing line; stderr tail: "
        + proc.stderr[-2000:]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tree_a")
    ap.add_argument("tree_b")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--sf-dir-b",
        default=None,
        help="separate data dir for TREE_B — for old trees that need a "
        "schema-adapted copy of the SAME logical data (e.g. the r01 "
        "tree reads ts as int64 nanos; today's events.parquet stores "
        "timestamp[us])",
    )
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    names = args.queries.split(",")
    sf_dirs = {
        args.tree_a: args.sf_dir,
        args.tree_b: args.sf_dir_b or args.sf_dir,
    }

    mins: dict[str, dict[str, float]] = {
        args.tree_a: {}, args.tree_b: {}
    }
    for p in range(args.passes):
        for tree in (args.tree_a, args.tree_b):
            t = run_pass(tree, sf_dirs[tree], names, args.runs)
            for q, v in t.items():
                cur = mins[tree].get(q)
                if v >= 0:
                    mins[tree][q] = v if cur is None or cur < 0 else min(cur, v)
                elif cur is None:
                    mins[tree][q] = v
            print(
                f"pass {p + 1}/{args.passes} {tree}: "
                + json.dumps(t, sort_keys=True),
                file=sys.stderr,
            )

    a, b = mins[args.tree_a], mins[args.tree_b]
    rows = []
    for q in names:
        ra, rb = a.get(q, -2.0), b.get(q, -2.0)
        ratio = round(ra / rb, 3) if ra > 0 and rb > 0 else None
        rows.append({"query": q, "a": ra, "b": rb, "a_over_b": ratio})
    ok = [r for r in rows if r["a_over_b"] is not None]
    total_a = sum(r["a"] for r in ok)
    total_b = sum(r["b"] for r in ok)
    geo = 1.0
    for r in ok:
        geo *= r["a_over_b"]
    geo = round(geo ** (1 / len(ok)), 3) if ok else None
    result = {
        "tree_a": args.tree_a,
        "tree_b": args.tree_b,
        "sf_dir": args.sf_dir,
        "sf_dir_b": sf_dirs[args.tree_b],
        "passes": args.passes,
        "runs": args.runs,
        "rows": rows,
        "total_a_over_b": round(total_a / total_b, 3) if ok else None,
        "geomean_a_over_b": geo,
        "worst_a_over_b": max((r["a_over_b"] for r in ok), default=None),
    }
    out = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
