"""Semantics tests for the round-5 physical-design & sketch batch:
Bloom membership, count-min estimates, z-order layout, bounded
per-group top-k, and tombstone delete propagation."""

from __future__ import annotations

from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.operators.layout import (
    file_span_stats,
    write_zordered,
    zorder_key,
)
from business_intelligence_and_data_warehouse_spark.operators.retention import (
    propagate_deletes,
)
from business_intelligence_and_data_warehouse_spark.operators.sketches import (
    bloom_build,
    bloom_probe,
    cms_build,
    cms_estimate,
)
from business_intelligence_and_data_warehouse_spark.operators.topk import (
    topk_per_group,
)
from business_intelligence_and_data_warehouse_spark.sources.testdata import (
    load_table,
)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def test_bloom_has_no_false_negatives_and_bounded_fp(spark):
    members = spark.range(0, 500).select(
        F.concat(F.lit("member-"), F.col("id")).alias("key")
    )
    others = spark.range(0, 2000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("key")
    )
    bloom = bloom_build(members, "key")
    probed_m = bloom_probe(members, "key", bloom).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("bloom_positive").cast("long")).alias("pos"),
    ).collect()[0]
    # every member MUST test positive (no false negatives, the
    # property the exact-verify pruning in contamination_bloom uses)
    assert probed_m.pos == probed_m.n == 500
    probed_o = bloom_probe(others, "key", bloom).agg(
        F.sum(F.col("bloom_positive").cast("long")).alias("fp")
    ).collect()[0]
    # 500 keys in 2^18 bits, k=4: theoretical fp ~ (1-e^{-4*500/2^18})^4
    # ~ 3e-9; allow generous slack — anything beyond a handful of hits
    # means the hash family is broken, not unlucky
    assert probed_o.fp <= 5


def test_bloom_probe_deterministic_and_layout_independent(spark):
    keys = spark.range(0, 300).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    bloom = bloom_build(keys.filter("id % 3 = 0"), "key")
    a = sorted(
        map(tuple, bloom_probe(keys, "key", bloom).collect())
    )
    b = sorted(
        map(
            tuple,
            bloom_probe(keys.repartition(7), "key", bloom).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def test_cms_never_undercounts_and_merges(spark):
    stream = spark.range(0, 3000).select(
        (F.col("id") % 37).cast("string").alias("key")
    )
    cms = cms_build(stream, "key")
    exact = stream.groupBy("key").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(exact, "key", cms)
    rows = est.collect()
    assert len(rows) == 37
    assert all(r.est_count >= r.exact for r in rows)
    # sketch-of-union == cellwise sum of shard sketches (mergeability:
    # the property that lets 1000 executors or N stream epochs each
    # keep a bounded grid and add them)
    s1 = cms_build(stream.filter("id % 2 = 0"), "key")
    s2 = cms_build(stream.filter("id % 2 = 1"), "key")
    merged = (
        s1.unionByName(s2)
        # depth/width are constant build-parameter columns (same
        # builder params on both shards): grouping by them is a no-op
        .groupBy("row", "col", "depth", "width")
        .agg(F.sum("cnt").alias("cnt"))
    )
    a = sorted(map(tuple, cms.collect()))
    b = sorted(map(tuple, merged.select(*cms.columns).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def test_hll_rho_ladder_and_merge(spark):
    from pyspark.sql import functions as F2

    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        _rho16,
    )

    cases = spark.createDataFrame(
        [(0,), (1,), (2,), (3,), (32767,), (32768,), (65535,)], ["v"]
    ).select("v", _rho16(F2.col("v")).alias("rho"))
    got = {r.v: r.rho for r in cases.collect()}
    # rho = leading-zero rank in a 16-bit window (all-zero -> 17)
    assert got == {0: 17, 1: 16, 2: 15, 3: 15, 32767: 2, 32768: 1, 65535: 1}


def test_hll_registers_merge_by_max_and_estimate_tracks_truth(spark):
    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    keys = spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    regs = hll_registers(keys, "k")
    # shard registers merged by cellwise MAX == one-shot registers
    r1 = hll_registers(keys.filter("id % 2 = 0"), "k")
    r2 = hll_registers(keys.filter("id % 2 = 1"), "k")
    merged = (
        r1.unionByName(r2)
        # p is a constant build-parameter column: grouping by it is a
        # no-op on the merge semantics
        .groupBy("bucket", "p")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    assert sorted(map(tuple, regs.collect())) == sorted(
        map(tuple, merged.select(*regs.columns).collect())
    )
    est = hll_estimate(regs).collect()[0]
    # 4096 registers -> standard error ~1.04/sqrt(m) ~ 1.6%; allow 4σ
    assert abs(est.estimate - 5000) / 5000 < 0.07, est.estimate
    # empty key stream -> 0, not NULL (SUM-over-zero-rows is NULL;
    # the operator coalesces so linear counting yields m*ln(m/m) = 0)
    empty = hll_estimate(
        hll_registers(keys.filter("1 = 0"), "k")
    ).collect()[0]
    assert empty.n_filled == 0 and empty.estimate == 0.0


# ---------------------------------------------------------------------------
# z-order layout
# ---------------------------------------------------------------------------

def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], ["x", "y"]
    )
    out = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], 4).alias("z")
    ).collect()
    got = {(r.x, r.y): r.z for r in out}
    # bit b of x -> position 2b, of y -> 2b+1
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    # x=3 (0b11) -> z positions 0,2 ; y=5 (0b101) -> z positions 1,5
    assert got[(3, 5)] == 0b100111


def test_zorder_key_three_columns(spark):
    # bit b of column i lands at position b*n + i for ANY n, not just 2
    df = spark.createDataFrame([(1, 1, 1), (2, 0, 1)], ["x", "y", "w"])
    got = {
        (r.x, r.y, r.w): r.z
        for r in df.select(
            "x",
            "y",
            "w",
            zorder_key([F.col("x"), F.col("y"), F.col("w")], 2).alias("z"),
        ).collect()
    }
    # (1,1,1): bit0 of each -> positions 0,1,2 -> 0b111
    assert got[(1, 1, 1)] == 0b111
    # (2,0,1): x bit1 -> pos 3; w bit0 -> pos 2 -> 0b1100
    assert got[(2, 0, 1)] == 0b1100


def test_propagate_deletes_with_empty_tombstones(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cleaned, audit = propagate_deletes(
        customer,
        "customer",
        "c_custkey",
        customer.filter(F.lit(False)).select("c_custkey"),
        [("orders", orders, "customer", "c_custkey", "o_custkey")],
    )
    a = {r.table_name: r for r in audit.collect()}
    assert a["customer"].rows_deleted == 0
    assert a["orders"].rows_deleted == 0
    assert a["customer"].rows_after == customer.count()
    assert cleaned["orders"].count() == orders.count()


def test_zordered_write_prunes_second_dim_probes(spark, sf_dir, tmp_path):
    """The layout claim itself, against PHYSICAL files: for a probe on
    the SECOND clustered dimension only (cust range), every day-sorted
    file overlaps (its cust span is the whole axis — 1-dim sorting
    cannot bound the other dimension), while z-ordered files bound
    both dimensions, so at most half of them can overlap a 10% band.

    Total min/max box area is NOT the right metric — it is roughly
    layout-invariant at equal file counts; what differs is how many
    files a selective probe must touch."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("day"),
        F.col("o_custkey").cast("long").alias("cust"),
    )
    mx = base.agg(
        F.max("day").alias("md"), F.max("cust").alias("mc")
    ).collect()[0]
    scaled = base.select(
        "day",
        "cust",
        F.floor(F.col("day") * 1024 / (mx.md + 1)).alias("x"),
        F.floor(F.col("cust") * 1024 / (mx.mc + 1)).alias("y"),
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "l")
    write_zordered(scaled, zpath, ["x", "y"], bits=10, n_files=64)
    # linear comparison: same file count, day-sorted
    scaled.repartitionByRange(64, "day").sortWithinPartitions(
        "day"
    ).write.parquet(lpath)

    lo, hi = 460, 563  # centered ~10% band of the scaled cust axis

    def overlapping_files(path):
        stats = file_span_stats(spark, path, ["x", "y"]).collect()
        return (
            sum(1 for r in stats if r.max_y >= lo and r.min_y <= hi),
            len(stats),
        )

    z_hit, z_files = overlapping_files(zpath)
    l_hit, l_files = overlapping_files(lpath)
    # day-sorted: the cust-only probe prunes nothing
    assert l_hit == l_files
    # z-ordered: the same probe skips at least half the files
    assert z_hit * 2 <= z_files, (z_hit, z_files)
    # and the z-ordered dataset still holds exactly the same rows
    assert spark.read.parquet(zpath).count() == scaled.count()


# ---------------------------------------------------------------------------
# per-group top-k
# ---------------------------------------------------------------------------

def test_topk_matches_window_form(spark, sf_dir):
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("v")
    ).withColumn("g", (F.col("o_custkey") % 7).cast("int"))
    got = sorted(
        map(
            tuple,
            topk_per_group(per_cust, ["g"], "v", "o_custkey", 5)
            .select("g", "rank", "o_custkey", "v")
            .collect(),
        )
    )
    w = W.partitionBy("g").orderBy(F.desc("v"), F.asc("o_custkey"))
    want = sorted(
        map(
            tuple,
            per_cust.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("g", "rank", "o_custkey", "v")
            .collect(),
        )
    )
    assert got == want


def test_topk_handles_small_groups_and_payload(spark):
    df = spark.createDataFrame(
        [("a", 10, 1, "p1"), ("a", 20, 2, "p2"), ("b", 5, 3, "p3")],
        ["g", "v", "id", "payload"],
    )
    rows = topk_per_group(
        df, ["g"], "v", "id", 3, payload_cols=["payload"]
    ).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append((r.rank, r.v, r.id, r.payload))
    assert sorted(by_g["a"]) == [(1, 20, 2, "p2"), (2, 10, 1, "p1")]
    assert by_g["b"] == [(1, 5, 3, "p3")]


# ---------------------------------------------------------------------------
# tombstone propagation
# ---------------------------------------------------------------------------

def test_propagate_deletes_cleans_the_chain(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    tomb = customer.filter(F.col("c_custkey") % 97 == 0).select(
        "c_custkey"
    )
    cleaned, audit = propagate_deletes(
        customer,
        "customer",
        "c_custkey",
        tomb,
        [
            ("orders", orders, "customer", "c_custkey", "o_custkey"),
            ("lineitem", lineitem, "orders", "o_orderkey", "l_orderkey"),
        ],
    )
    # no tombstoned root row survives, and no orphan child rows remain
    assert (
        cleaned["customer"].filter(F.col("c_custkey") % 97 == 0).count()
        == 0
    )
    assert (
        cleaned["orders"].filter(F.col("o_custkey") % 97 == 0).count() == 0
    )
    surviving_orders = cleaned["orders"].select("o_orderkey")
    orphans = cleaned["lineitem"].join(
        surviving_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"
    )
    # every surviving lineitem's order must itself have survived —
    # UNLESS the order was absent from orders entirely (testdata has
    # no such rows; assert that precondition too)
    assert orphans.count() == 0
    a = {r.table_name: r for r in audit.collect()}
    for name, df_before, df_clean in [
        ("customer", customer, cleaned["customer"]),
        ("orders", orders, cleaned["orders"]),
        ("lineitem", lineitem, cleaned["lineitem"]),
    ]:
        assert a[name].rows_before == df_before.count()
        assert a[name].rows_after == df_clean.count()
        assert (
            a[name].rows_before - a[name].rows_deleted == a[name].rows_after
        )


# ---------------------------------------------------------------------------
# incremental join maintenance
# ---------------------------------------------------------------------------

def test_join_delta_equals_full_recompute_difference(spark, sf_dir):
    """The delta rule's defining property: old_view ∪ delta_rows ==
    new full join, with the three delta terms disjoint (insert-only
    deltas guarantee it)."""
    from business_intelligence_and_data_warehouse_spark.operators.incremental import (
        join_delta,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    d_l = F.col("o_orderkey") % 10 == 0
    d_r = F.col("custkey") % 7 == 0
    delta = join_delta(
        orders.filter(~d_l),
        orders.filter(d_l),
        customer.filter(~d_r),
        customer.filter(d_r),
        on="custkey",
    )
    old_view = orders.filter(~d_l).join(customer.filter(~d_r), "custkey")
    maintained = sorted(
        map(
            tuple,
            old_view.select("custkey", "o_orderkey")
            .unionByName(delta.select("custkey", "o_orderkey"))
            .collect(),
        )
    )
    full = sorted(
        map(tuple, orders.join(customer, "custkey").collect())
    )
    assert maintained == full
    # the three terms are disjoint: no (custkey, o_orderkey) repeats
    n = delta.count()
    assert delta.select("custkey", "o_orderkey").distinct().count() == n


# ---------------------------------------------------------------------------
# registry-level invariants of the new queries
# ---------------------------------------------------------------------------

def test_contamination_bloom_fp_accounting(spark, sf_dir):
    from business_intelligence_and_data_warehouse_spark.plans.queries import (
        QUERIES,
    )

    rows = QUERIES["contamination_bloom"](spark, sf_dir).collect()
    assert rows, "no train documents scored"
    for r in rows:
        assert r.n_true_hits <= r.n_bloom_hits <= r.n_shingles
        assert r.n_false_positives == r.n_bloom_hits - r.n_true_hits


def test_cms_stream_merge_equals_one_shot_sketch(spark, sf_dir, tmp_path):
    """The streaming sketch loop: 3 micro-batches through the
    foreachBatch merge sink must yield a sketch bit-identical to the
    one-shot batch sketch over the union — the mergeability contract
    the stream_heavy_hitters oracle leans on."""
    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        run_cms_stream,
    )

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streamed = run_cms_stream(
        stream, spark, "user_id", 4, 1024, str(tmp_path / "store")
    )
    got = sorted(map(tuple, streamed.collect()))
    want = sorted(map(tuple, cms_build(events, "user_id").collect()))
    assert got == want


def test_cms_stream_resets_on_checkpoint_lineage_change(spark, sf_dir, tmp_path):
    """Cellwise addition is not idempotent: a rebuilt checkpoint (new
    lineage, batch ids restart, source replays in full) must RESET the
    stored sketch, not add the replay onto it — otherwise every count
    doubles. The first run's sketch and the post-reset rerun's sketch
    must both equal the one-shot batch sketch."""
    import shutil

    from business_intelligence_and_data_warehouse_spark.streaming.sinks import (
        run_cms_stream,
    )

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.repartition(2).write.parquet(src)
    root = str(tmp_path / "store")

    def stream():
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    want = sorted(map(tuple, cms_build(events, "user_id").collect()))
    first = run_cms_stream(stream(), spark, "user_id", 4, 1024, root)
    assert sorted(map(tuple, first.collect())) == want
    # simulate a checkpoint reset: new lineage, full source replay
    shutil.rmtree(f"{root}/_checkpoint")
    second = run_cms_stream(stream(), spark, "user_id", 4, 1024, root)
    assert sorted(map(tuple, second.collect())) == want


def test_topk_ranks_null_order_values_last(spark):
    """NULL measures must rank after every non-null row — the window
    form's desc = NULLS LAST placement — not seize rank 1 via the
    nulls-first struct sort."""
    df = spark.createDataFrame(
        [("a", None, 1), ("a", 10, 2), ("a", 20, 3), ("b", None, 4)],
        "g string, v int, id int",
    )
    rows = {
        (r.g, r.rank): (r.v, r.id)
        for r in topk_per_group(df, ["g"], "v", "id", 2).collect()
    }
    assert rows[("a", 1)] == (20, 3)
    assert rows[("a", 2)] == (10, 2)
    # group of only-null measure: the null row still surfaces (rank 1)
    # with its NULL intact, exactly like row_number over desc
    assert rows[("b", 1)] == (None, 4)


def test_events_heavy_hitters_overcount_nonnegative(spark, sf_dir):
    from business_intelligence_and_data_warehouse_spark.plans.queries import (
        QUERIES,
    )

    rows = QUERIES["events_heavy_hitters"](spark, sf_dir).collect()
    assert rows
    assert all(r.overcount >= 0 for r in rows)
    ests = [r.est_count for r in rows]
    assert ests == sorted(ests, reverse=True)
