"""Adversarial skew stress: MEASURE (not assert) what salting and AQE
buy on a zipf-style hot key, at a scale where stragglers are visible
on local[32].

Three experiments, each best-of-3 interleaved:

A. JOIN skew  — big(fact) x dim equi-join where one key owns `hot_frac`
   of the fact. Arms: plain shuffle join with AQE skew split ON,
   the same with AQE skew handling OFF, and the replicate-broadcast
   salted join (operators/skew.salted_broadcast_left).
B. AGG skew   — groupBy over the same hot key. Arms: plain groupBy
   (AQE cannot split a hot aggregation key) vs salted_agg.
C. crossover  — agg skew at several hot fractions to find where
   salting starts paying.

Usage: python tools/skew_stress.py [rows] [hot_frac]
Prints one JSON line per arm; summary table at the end. Results are
recorded in SCALE.md (round 7) and the winning thresholds documented
on the salted operators.
"""

from __future__ import annotations

import json
import statistics
import sys
import time


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3

    from pyspark.sql import functions as F

    from business_intelligence_and_data_warehouse_spark.operators.skew import (
        salted_agg,
        salted_broadcast_left,
    )
    from business_intelligence_and_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="skew-stress")

    n_cold_keys = 100_000
    hot_mod = max(2, int(1 / hot_frac))

    def big():
        # deterministic zipf-ish: ids with (id % hot_mod == 0) share ONE
        # key -> that key owns ~hot_frac of all rows
        return spark.range(0, rows).select(
            F.when(F.col("id") % hot_mod == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), F.col("id") % n_cold_keys))
            .alias("k"),
            (F.col("id") % 997).alias("v"),
        )

    dim = spark.range(0, n_cold_keys).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") % 7).alias("tag"),
    ).union(spark.createDataFrame([("hot", 9)], "k string, tag long"))

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def timed(name: str, build, n: int = 3) -> float:
        ts = [run(build()) for _ in range(n)]
        best = min(ts)
        print(json.dumps({"arm": name, "best": round(best, 2),
                          "median": round(statistics.median(ts), 2)}))
        return best

    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}

    # NOTE: conf must be active at EXECUTION (not just plan build), so
    # the conf is set around the timed runs, not closed over the builder
    def timed_conf(name: str, conf: dict, build, n: int = 3) -> float:
        old = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            return timed(name, build, n)
        finally:
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)

    print(f"# rows={rows} hot_frac~{1/hot_mod:.2f} cold_keys={n_cold_keys}")

    # --- A. join skew -----------------------------------------------------
    join_plain = lambda: big().join(dim, "k").groupBy("tag").count()  # noqa: E731
    timed_conf(
        "join_shuffle_aqe_skew_on",
        {**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "true"},
        join_plain,
    )
    timed_conf(
        "join_shuffle_aqe_skew_off",
        {**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "false"},
        join_plain,
    )
    timed(
        "join_salted_broadcast",
        lambda: salted_broadcast_left(big(), dim, ["k"], salt_buckets=32)
        .groupBy("tag")
        .count(),
    )
    timed("join_plain_broadcast",
          lambda: big().join(F.broadcast(dim), "k").groupBy("tag").count())

    # --- A2. join skew with AQE thresholds that actually trigger ----------
    # the default 256MB/5x thresholds ignore hot partitions smaller than
    # that; a cluster operator tunes them to the executor sweet spot
    timed_conf(
        "join_shuffle_aqe_skew_tuned",
        {
            **no_bcast,
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        },
        join_plain,
    )

    # --- B. agg skew -------------------------------------------------------
    # ALGEBRAIC aggregate: partial (map-side) aggregation already
    # collapses the hot key to one row per mapper -> salting is expected
    # pure overhead; measured to document the boundary honestly
    timed("agg_algebraic_plain", lambda: big().groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")))
    timed("agg_algebraic_salted", lambda: salted_agg(
        big(), ["k"],
        {"s": F.sum("v"), "n": F.sum(F.lit(1))}, salt_buckets=32))

    # NON-collapsible aggregate: count_distinct over a HIGH-cardinality
    # value shuffles on k alone (partial agg on (k, v) cannot compress
    # ~1M distinct v), so the hot key's distinct stream all reaches ONE
    # reducer — the case partial aggregation cannot fix and AQE does
    # not touch.  The salted twin groups on (k, salt(row)): exact,
    # because each distinct v lands in exactly one bucket (the salt
    # hashes the whole row = (k, v)).
    def big_hi():
        return spark.range(0, rows).select(
            F.when(F.col("id") % hot_mod == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), F.col("id") % n_cold_keys))
            .alias("k"),
            (F.col("id") % 999_983).alias("v"),
        )

    timed("agg_distinct_plain", lambda: big_hi().groupBy("k").agg(
        F.count_distinct("v").alias("d")))
    timed("agg_distinct_salted", lambda: salted_agg(
        big_hi(), ["k"], {"d": F.count_distinct("v")}, salt_buckets=32))

    # --- C. crossover sweep (distinct-agg) ---------------------------------
    for frac_mod in (2, 4, 10, 100, 100_000_000):
        def big_f(m=frac_mod):
            return spark.range(0, rows).select(
                F.when(F.col("id") % m == 0, F.lit("hot"))
                .otherwise(F.concat(F.lit("k"), F.col("id") % n_cold_keys))
                .alias("k"),
                (F.col("id") % 999_983).alias("v"),
            )

        p = timed(f"sweep_distinct_plain_hot{1/frac_mod:.0e}",
                  lambda: big_f().groupBy("k").agg(
                      F.count_distinct("v").alias("d")), 3)
        s = timed(f"sweep_distinct_salted_hot{1/frac_mod:.0e}",
                  lambda: salted_agg(big_f(), ["k"],
                                     {"d": F.count_distinct("v")},
                                     salt_buckets=32), 3)
        print(json.dumps({"hot_frac": 1 / frac_mod,
                          "salted_speedup": round(p / s, 2)}))

    spark.stop()


if __name__ == "__main__":
    main()
