"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``business_intelligence_and_data_warehouse_spark``;
this module only adapts them to the driver's calling convention.
"""

from __future__ import annotations

import glob
import json
import os

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from business_intelligence_and_data_warehouse_spark.plans.queries import (
    ORACLES,
    QUERIES,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver hash-checks the first 50 entries of ``queries()`` in dict
# order; the registry is about twice that size (see README/SCALE for
# the current count), so the checked window ROTATES each round until
# every query has been driver-checked at least once, then keeps
# cycling by staleness.
#
# The window is COMPUTED from the CORRECTNESS_r{N}.json history:
#   1. the §2-family anchor sentinels below are always in (the core
#      battery stays continuously verified);
#   2. then every query with NO driver row in any past round, in
#      registry order (new operators enter the window the round after
#      they land);
#   3. remaining slots fill with the least-recently-checked queries
#      (ties in registry order) — so after full coverage the window
#      keeps rotating instead of freezing.
# Fully deterministic given the repo files; if the history files are
# unreadable the window degrades to sentinels + registry order, which
# is still a valid (if rotation-free) contract.

_WINDOW_SIZE = 50

_SENTINELS: list[str] = [
    # -- one anchor per SURVEY §2 family --
    "q1a_yoy_growth",
    "q2a_grouping_sets",
    "q4a_multi_exists",
    "q5b_monthly_kpis",
    "etl_dim_time",
    "etl_fact_order_lines",
    "etl_quality_quarantine",
    "scd1_last_wins",
    "scd2_merge_batch",
    "scd2_asof_lookup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "corpus_curation",
    "analytics_mart",
]


def _last_checked_round(repo_dir: str) -> dict[str, int]:
    """query name -> highest round with a PASSING CORRECTNESS row.

    A failed row (hash mismatch / error other than the deliberate
    rows-only ``no_oracle``) does NOT count as checked: the query
    stays in the highest-priority tier so the round that ships its
    fix re-verifies it immediately instead of LRU-aging back in.
    """
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        try:
            rnd = int(base[len("CORRECTNESS_r"):].split(".")[0])
            rows = json.load(open(path))
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            passed = isinstance(row, dict) and (
                row.get("hash_match") is True
                or row.get("err") == "no_oracle"
            )
            if passed:
                last[name] = max(last.get(name, -1), rnd)
    return last


def _build_window(
    registry: list[str], last: dict[str, int] | None = None
) -> list[str]:
    if last is None:
        repo_dir = os.path.dirname(os.path.abspath(__file__))
        try:
            last = _last_checked_round(repo_dir)
        except Exception:
            last = {}
    window = [n for n in _SENTINELS if n in registry]
    seen = set(window)
    # never driver-checked first, registry order
    for name in registry:
        if len(window) >= _WINDOW_SIZE:
            return window
        if name not in seen and name not in last:
            window.append(name)
            seen.add(name)
    # then least-recently-checked (stable on registry order)
    rest = sorted(
        (n for n in registry if n not in seen),
        key=lambda n: last.get(n, -1),
    )
    for name in rest:
        if len(window) >= _WINDOW_SIZE:
            break
        window.append(name)
        seen.add(name)
    return window


def _windowed(mapping: dict) -> dict:
    """Reorder ``mapping`` so the computed window names come first."""
    window = _build_window(list(QUERIES))
    front = {k: mapping[k] for k in window if k in mapping}
    rest = {k: v for k, v in mapping.items() if k not in front}
    return {**front, **rest}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1a_yoy_growth"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _windowed(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return _windowed(dict(ORACLES))
