"""Salting must move rows, never change results."""

from __future__ import annotations

from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.operators.skew import (
    salted_agg,
    salted_broadcast_left,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_agg_equals_plain_groupby(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("k"),  # 3 hot keys
        (F.col("id") * 7 % 100).alias("v"),
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"),
        F.sum(F.lit(1)).alias("n"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    salted = salted_agg(
        df,
        keys=["k"],
        aggs={
            "s": F.sum("v"),
            "n": F.sum(F.lit(1)),
            "mn": F.min("v"),
            "mx": F.max("v"),
        },
        merges={"mn": "min", "mx": "max"},
        salt_buckets=8,
    )
    cols = ["k", "s", "n", "mn", "mx"]
    assert _rows(salted, *cols) == _rows(plain, *cols)


def test_salted_broadcast_join_equals_plain_join(spark):
    big = spark.range(0, 2000).select(
        (F.col("id") % 4).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "d"), (9, "unmatched")], "k long, tag string"
    )
    plain = big.join(small, ["k"], "inner")
    salted = salted_broadcast_left(big, small, ["k"], salt_buckets=4)
    cols = ["k", "payload", "tag"]
    assert _rows(salted, *cols) == _rows(plain, *cols)
    assert salted.count() == 2000


# ---------------------------------------------------------------------------
# sketch-driven join planning (operators/planning.py)
# ---------------------------------------------------------------------------

from business_intelligence_and_data_warehouse_spark.operators.planning import (  # noqa: E402
    JoinSideStats,
    choose_join_strategy,
    side_stats_from_sketches,
)


def _stats(rows, avg_bytes=100, distinct=None, max_freq=None):
    distinct = rows if distinct is None else distinct
    max_freq = max(1, rows // max(distinct, 1)) if max_freq is None else max_freq
    return JoinSideStats(
        rows=rows,
        avg_row_bytes=avg_bytes,
        distinct_keys=distinct,
        max_key_freq=max_freq,
    )


def test_advice_flips_across_broadcast_threshold():
    small = _stats(rows=1000, avg_bytes=100)  # 100 KB
    big = _stats(rows=10_000_000, avg_bytes=100)
    assert (
        choose_join_strategy(big, small, broadcast_threshold=1 << 20).strategy
        == "broadcast_right"
    )
    assert (
        choose_join_strategy(small, big, broadcast_threshold=1 << 20).strategy
        == "broadcast_left"
    )
    # same sides, threshold below the small side -> no broadcast
    assert (
        choose_join_strategy(
            big, small, broadcast_threshold=50_000
        ).strategy
        != "broadcast_right"
    )


def test_advice_flips_across_skew_boundary():
    big = _stats(rows=10**9, distinct=10**6)  # mean freq 1000
    uniform = _stats(rows=10**9, distinct=10**6, max_freq=2000)  # ratio 2
    hot = _stats(rows=10**9, distinct=10**6, max_freq=50_000)  # ratio 50
    assert (
        choose_join_strategy(big, uniform, broadcast_threshold=1).strategy
        == "shuffle"
    )
    adv = choose_join_strategy(big, hot, broadcast_threshold=1)
    assert adv.strategy == "salted" and adv.salt_buckets >= 2
    # a broadcast-able small side beats salting even under skew
    tiny_hot = _stats(rows=100, distinct=2, max_freq=99)
    assert choose_join_strategy(big, tiny_hot).strategy.startswith(
        "broadcast"
    )


def test_salt_buckets_scale_with_hot_key_and_cap():
    def adv(max_freq):
        hot = _stats(rows=10**9, distinct=10**6, max_freq=max_freq)
        return choose_join_strategy(
            _stats(rows=10**9, distinct=10**6),
            hot,
            broadcast_threshold=1,
            target_rows_per_task=1_000_000,
        )

    assert adv(3_000_000).salt_buckets == 3
    assert adv(30_000_000).salt_buckets == 30
    assert adv(10**9).salt_buckets == 64  # capped


def test_advice_boundary_sweep_is_exactly_the_rule():
    """Property sweep: with broadcast off, strategy is salted IFF
    max/mean ratio exceeds skew_factor — no hysteresis, no gaps."""
    for factor in (4.0, 8.0, 16.0):
        for ratio in (0.5, 1.0, 3.9, 4.0, 4.1, 7.9, 8.0, 8.1, 15.9, 16.1, 100.0):
            mean = 1000
            s = _stats(
                rows=10**8,
                distinct=10**8 // mean,
                max_freq=int(ratio * mean),
            )
            got = choose_join_strategy(
                _stats(rows=10**8, distinct=10**5),
                s,
                broadcast_threshold=1,
                skew_factor=factor,
            ).strategy
            want = "salted" if ratio > factor else "shuffle"
            assert got == want, (factor, ratio, got)


def test_side_stats_from_real_sketches(spark):
    """End-to-end: CMS-derived stats are exact on the stream total,
    never under on the hot key, and drive the salt decision on a
    zipf-ish skewed column."""
    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        cms_build,
    )

    # one hot key with 500 rows + 50 singleton keys
    skewed = spark.range(0, 500).select(F.lit("hot").alias("k")).union(
        spark.range(0, 50).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    )
    cms = cms_build(skewed, "k", 4, 1024)
    stats = side_stats_from_sketches(cms, distinct_keys=51, avg_row_bytes=100)
    assert stats.rows == 550
    assert stats.max_key_freq >= 500  # upper bound, never under
    assert stats.skew_ratio > 40

    other = JoinSideStats(
        rows=10**7, avg_row_bytes=100, distinct_keys=10**6, max_key_freq=10
    )
    adv = choose_join_strategy(other, stats, broadcast_threshold=1)
    assert adv.strategy == "salted"

    # uniform column from the same machinery -> shuffle
    uniform = spark.range(0, 550).select(
        F.concat(F.lit("u"), F.col("id") % 55).alias("k")
    )
    ustats = side_stats_from_sketches(
        cms_build(uniform, "k", 4, 1024), distinct_keys=55, avg_row_bytes=100
    )
    assert ustats.rows == 550
    assert (
        choose_join_strategy(other, ustats, broadcast_threshold=1).strategy
        == "shuffle"
    )


def test_hot_key_split_join_equals_plain_join(spark):
    """Routing must not change results: split-join == plain inner join
    on a skewed table, including hot keys absent from the dim and dim
    keys absent from the data."""
    from business_intelligence_and_data_warehouse_spark.operators.skew import (
        hot_key_split_join,
    )

    big = spark.range(0, 3000).select(
        F.when(F.col("id") % 3 == 0, F.lit(7))
        .otherwise(F.col("id") % 500)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("tag")
    )
    hot = spark.createDataFrame([(7,), (11,), (999_999,)], "k long")
    plain = big.join(dim, ["k"], "inner")
    split = hot_key_split_join(big, dim, ["k"], hot)
    cols = ["k", "payload", "tag"]
    assert _rows(split, *cols) == _rows(plain, *cols)


def test_split_join_routes_hot_through_broadcast(spark):
    """The operator's point is the ROUTING: with the auto-broadcast
    threshold disabled (as at real dim scale), the hot branch must
    still be a broadcast hash join (explicit hint on the hot slice)
    while the cold branch is left to the planner."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from business_intelligence_and_data_warehouse_spark.operators.skew import (
            hot_key_split_join,
        )

        big = spark.range(0, 1000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("v")
        )
        dim = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("tag")
        )
        hot = spark.createDataFrame([(7,)], "k long")
        df = hot_key_split_join(big, dim, ["k"], hot)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        # hot slice join + 3 routing semi/anti joins are all broadcast;
        # the cold join falls back to sort-merge with broadcast off
        assert plan.count("BroadcastHashJoin") >= 4
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_advice_names_the_decisive_side():
    """The advice must be actionable without re-deriving the planner's
    comparison: broadcast names the broadcast-able side, salted names
    the SKEWED side (the one to salt/split)."""
    small = _stats(rows=100, avg_bytes=10)
    big = _stats(rows=10**9, distinct=10**6)
    hot = _stats(rows=10**9, distinct=10**6, max_freq=10**6)
    assert choose_join_strategy(big, small).side == "right"
    assert choose_join_strategy(small, big).side == "left"
    adv = choose_join_strategy(big, hot, broadcast_threshold=1)
    assert adv.strategy == "salted" and adv.side == "right"
    adv2 = choose_join_strategy(hot, big, broadcast_threshold=1)
    assert adv2.strategy == "salted" and adv2.side == "left"
    assert choose_join_strategy(big, big, broadcast_threshold=1).side == ""
