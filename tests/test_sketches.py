"""Bound the approximate sketches against exact answers (no cross-
engine oracle exists for HLL/KLL, so accuracy is pinned here).

The registry query now also self-validates in-row (``*_within_bounds``
columns against the sketches' published error bounds); this test pins
both those booleans and an independent out-of-band exact comparison."""

from __future__ import annotations

from pyspark.sql import functions as F

from business_intelligence_and_data_warehouse_spark.plans.coverage_queries import (
    approx_sketches,
)
from business_intelligence_and_data_warehouse_spark.sources.testdata import load_table


def test_approx_sketches_within_bounds(spark, sf_dir):
    row = approx_sketches(spark, sf_dir).first()
    lineitem = load_table(spark, sf_dir, "lineitem")
    exact = lineitem.agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        F.countDistinct("l_orderkey").alias("orders"),
    ).first()
    # HLL++ default rsd is 5%
    assert abs(row.approx_parts - exact.parts) <= 0.1 * exact.parts
    assert abs(row.approx_orders - exact.orders) <= 0.1 * exact.orders
    # KLL median within 5% of the exact interpolated median
    assert (
        abs(row.approx_median_price - exact.median_price)
        <= 0.05 * exact.median_price
    )
    # the in-row self-validation must agree
    assert row.hll_parts_within_bounds
    assert row.hll_orders_within_bounds
    assert row.kll_median_within_bounds


def test_quantile_sketch_shard_merge_equals_single_pass(spark, sf_dir):
    """The bottom-k priority sketch's merge is an exact set identity:
    merging per-shard sketches yields the SAME (priority, value) rows
    as one pass over the full table — bit-identical, not approximate."""
    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_merge,
        quantile_sketch_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_extendedprice").cast("decimal(18,4)").cast("string"),
    )
    k = 256
    single = quantile_sketch_build(li, "l_extendedprice", key, k=k)
    shards = [
        quantile_sketch_build(
            li.filter(F.col("l_orderkey") % 3 == i), "l_extendedprice", key, k=k
        )
        for i in range(3)
    ]
    merged = quantile_sketch_merge(shards, k=k)

    def rows(df):
        return sorted((r.priority, r.value) for r in df.collect())

    assert rows(merged) == rows(single)

    qs = (0.1, 0.5, 0.9)
    est_single = {r.q: r.est for r in quantile_sketch_quantiles(single, qs).collect()}
    est_merged = {r.q: r.est for r in quantile_sketch_quantiles(merged, qs).collect()}
    assert est_single == est_merged
    assert len(est_single) == len(qs)


def test_quantile_sketch_small_input_and_accuracy(spark, sf_dir):
    """k larger than the input keeps every row (n_sample = n); the
    k=1024 estimate stays within the uniform-sample rank bound of the
    exact interpolated percentile on the registry query's own output."""
    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_quantiles,
    )
    from business_intelligence_and_data_warehouse_spark.plans.physical_queries import (
        quantile_sketch_prices,
    )

    li = load_table(spark, sf_dir, "lineitem").limit(10)
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_extendedprice").cast("decimal(18,4)").cast("string"),
    )
    sk = quantile_sketch_build(li, "l_extendedprice", key, k=1024)
    est = quantile_sketch_quantiles(sk, (0.5,)).collect()
    assert len(est) == 1 and est[0].n_sample == 10

    out = quantile_sketch_prices(spark, sf_dir).collect()
    assert [r.q for r in out] == [0.25, 0.5, 0.75, 0.9, 0.99]
    for r in out:
        # uniform sample of k: rank error concentrates within
        # ~3/sqrt(k) of quantile fraction -> generous value-side bound
        assert abs(r.rel_err) < 0.25, r


def test_grouped_hll_shard_merge_equals_single_pass(spark, sf_dir):
    """Grouped registers merge by cellwise MAX within (group, bucket):
    merging per-shard register tables must reproduce the single-pass
    registers — and therefore identical per-group estimates."""
    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        hll_estimate_grouped,
        hll_registers_grouped,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "event_id"
    )
    single = hll_registers_grouped(events, ["event_type"], "user_id")
    shards = [
        hll_registers_grouped(
            events.filter(F.col("event_id") % 3 == i), ["event_type"], "user_id"
        )
        for i in range(3)
    ]
    merged = shards[0]
    for s in shards[1:]:
        merged = merged.unionByName(s)
    # p is a constant build-parameter column (same builder, same p),
    # so grouping by it is a no-op on the merge semantics
    merged = merged.groupBy("event_type", "bucket", "p").agg(
        F.max("max_rho").alias("max_rho")
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(merged.select(*single.columns)) == rows(single)
    assert rows(hll_estimate_grouped(merged, ["event_type"])) == rows(
        hll_estimate_grouped(single, ["event_type"])
    )


def test_grouped_quantile_sketch_merge_and_rank_bound(spark, sf_dir):
    """Per-group bottom-k: shard-merge (union + per-group re-rank)
    equals the single pass, and each group's sample is its k
    hash-smallest rows (recomputed independently in Python)."""
    import hashlib

    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        quantile_sketch_build_grouped,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    ).limit(2000)
    k = 32
    single = quantile_sketch_build_grouped(
        events, ["event_type"], "value", F.col("event_id"), k=k
    )
    from pyspark.sql import Window as W

    shards = [
        quantile_sketch_build_grouped(
            events.filter(F.col("event_id") % 3 == i),
            ["event_type"], "value", F.col("event_id"), k=k,
        )
        for i in range(3)
    ]
    merged = shards[0]
    for s in shards[1:]:
        merged = merged.unionByName(s)
    w = W.partitionBy("event_type").orderBy("priority")
    merged = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )

    def rows(df):
        return sorted((r.event_type, r.priority, r.value) for r in df.collect())

    got = rows(single)
    assert rows(merged) == got

    # python reference of the per-group bottom-k
    raw = events.collect()
    by_type: dict[str, list] = {}
    for r in raw:
        pri = hashlib.md5(str(r.event_id).encode()).hexdigest()
        by_type.setdefault(r.event_type, []).append((pri, float(r.value)))
    want = sorted(
        (t, pri, v)
        for t, lst in by_type.items()
        for pri, v in sorted(lst)[:k]
    )
    assert got == want


def test_cms_join_size_estimate_bounds_and_zero(spark):
    """The sketch-based join-size estimate never undercounts the true
    equi-join size, matches it exactly on collision-free data, and a
    disjoint pair estimates zero (an empty depth row proves it)."""
    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        cms_build,
        cms_join_size_estimate,
    )

    d, w = 4, 1024
    a_keys = [f"k{i}" for i in range(20) for _ in range(i % 3 + 1)]
    b_keys = [f"k{i}" for i in range(10, 30) for _ in range(2)]
    a = spark.createDataFrame([(k,) for k in a_keys], "key string")
    b = spark.createDataFrame([(k,) for k in b_keys], "key string")
    true_size = a.join(b, "key").count()
    est = cms_join_size_estimate(
        cms_build(a, "key", d, w), cms_build(b, "key", d, w), d, w
    ).first()
    assert est.est_join_size >= true_size
    # 40-ish keys in 1024 cells: collisions essentially impossible
    assert est.est_join_size == true_size

    disjoint = spark.createDataFrame([("zz1",), ("zz2",)], "key string")
    est2 = cms_join_size_estimate(
        cms_build(a, "key", d, w), cms_build(disjoint, "key", d, w), d, w
    ).first()
    assert est2.est_join_size == 0

    # param-mismatch guard
    import pytest as _pytest
    with _pytest.raises(ValueError, match="build"):
        cms_join_size_estimate(
            cms_build(a, "key", d, w), cms_build(b, "key", d, w), d, 512
        )


def test_metadata_less_sketch_probe_checks_structure(spark):
    """A sketch that lost its build metadata (parquet round-trip) still
    fails loudly on a geometry mismatch — the lazy structural check —
    while a correctly-parameterized probe of the same round-tripped
    sketch works unchanged (ADVICE r6: the persisted-sketch scenario)."""
    import pytest as _pytest

    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    d, w = 4, 1024
    keys = spark.createDataFrame([(f"k{i % 7}",) for i in range(50)], "key string")
    # Spark's own parquet writer happens to round-trip column metadata;
    # external writers / catalog registration / CSV do not — strip it
    # explicitly to model those
    persisted = cms_build(keys, "key", d, w).withMetadata("cnt", {})
    assert not persisted.schema["cnt"].metadata

    probes = keys.distinct()
    ok = cms_estimate(probes, "key", persisted, d, w).collect()
    assert all(r.est_count >= 1 for r in ok)

    # probing the 1024-wide grid as if it were 64-wide: cells with
    # col >= 64 contradict the probed geometry -> assert_true fires
    # (surfaces as Py4JJavaError or the converted SparkRuntimeException
    # depending on where codegen evaluates it — match the message)
    with _pytest.raises(Exception, match="cms_estimate"):
        cms_estimate(probes, "key", persisted, d, 64).collect()


def test_sketch_param_columns_survive_metadata_stripping_storage(spark, tmp_path):
    """Every sketch family carries its build parameters as REAL COLUMNS
    (r8, VERDICT #2): after a parquet round-trip with column metadata
    stripped (modeling non-Spark writers / catalog registration), the
    probe-side guard still validates through the parameter columns —
    matched probes work, mismatched probes fail loudly, and the
    structural tier is never needed for a shipped sketch (it cannot
    catch growth-direction or filtered-dimension mismatches)."""
    import pytest as _pytest

    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
        cms_build,
        cms_estimate,
        hll_estimate,
        hll_registers,
        quantile_sketch_build,
        quantile_sketch_merge,
    )

    keys = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(50)], "key string"
    )
    probes = keys.distinct()

    def strip_roundtrip(df, value_col, sub):
        path = str(tmp_path / sub)
        df.withMetadata(value_col, {}).write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        assert not out.schema[value_col].metadata
        return out

    # bloom: matched probe flags every true member; GROWN m_bits (the
    # mismatch the structural tier can NEVER catch) fails loudly
    bloom = strip_roundtrip(bloom_build(keys, "key", 1 << 10, 4), "bits", "b")
    assert {"m_bits", "k"} <= set(bloom.columns)
    ok = bloom_probe(probes, "key", bloom, 1 << 10, 4).collect()
    assert all(r.bloom_positive for r in ok)
    with _pytest.raises(Exception, match="bloom_probe"):
        bloom_probe(probes, "key", bloom, 1 << 11, 4).collect()

    # cms: matched estimate >= true count; grown width fails loudly
    cms = strip_roundtrip(cms_build(keys, "key", 4, 256), "cnt", "c")
    assert {"depth", "width"} <= set(cms.columns)
    assert all(
        r.est_count >= 1 for r in cms_estimate(probes, "key", cms, 4, 256).collect()
    )
    with _pytest.raises(Exception, match="cms_estimate"):
        cms_estimate(probes, "key", cms, 4, 512).collect()

    # hll: matched p estimates; mismatched p fails loudly (a filtered/
    # derived dimension no geometry check could see)
    regs = strip_roundtrip(hll_registers(keys, "key", p=12), "max_rho", "h")
    assert "p" in regs.columns
    est = hll_estimate(regs, p=12).collect()[0]
    assert 5 <= est.estimate <= 10  # 7 distinct keys
    with _pytest.raises(Exception, match="hll_estimate"):
        hll_estimate(regs, p=8).collect()

    # quantile: matched-k merge preserves the set identity; mismatched
    # k fails loudly (a set-SIZE property, invisible to any row check)
    nums = spark.createDataFrame(
        [(float(i), f"id{i}") for i in range(40)], "v double, id string"
    )
    sk = strip_roundtrip(
        quantile_sketch_build(nums, "v", F.col("id"), k=16), "priority", "q"
    )
    assert "k" in sk.columns
    merged = quantile_sketch_merge([sk, sk], k=16).collect()
    assert len(merged) <= 16
    with _pytest.raises(Exception, match="quantile_sketch_merge"):
        quantile_sketch_merge([sk, sk], k=8).collect()


def test_shuffle_partitions_for_scales_with_data():
    from business_intelligence_and_data_warehouse_spark.session import (
        shuffle_partitions_for,
    )

    # tiny data: the local file-creation floor wins
    assert shuffle_partitions_for(10 << 20, 32) == 16
    # 10 GB at 64 MB targets: 160 reducers
    assert shuffle_partitions_for(10 << 30, 32) == 160
    # huge data: capped at 8x cores (AQE owns the tail)
    assert shuffle_partitions_for(1 << 50, 32) == 256
    # floor also respects cpus//2 on big machines
    assert shuffle_partitions_for(1, 128) == 64


def test_table_cache_evicts_other_sessions(spark, sf_dir):
    """Entries keyed by a stopped session's applicationId are dropped
    on the next insert (ADVICE r6: unbounded growth across sessions)."""
    from business_intelligence_and_data_warehouse_spark.sources import testdata

    testdata.load_table(spark, sf_dir, "region")
    app = spark.sparkContext.applicationId
    dead_key = ("dead-app-123", "/nowhere", "region")
    testdata._TABLE_CACHE[dead_key] = testdata._TABLE_CACHE[
        (app, __import__("os").path.abspath(sf_dir), "region")
    ]
    testdata.load_table(spark, sf_dir, "nation")
    assert dead_key not in testdata._TABLE_CACHE
    assert all(k[0] == app for k in testdata._TABLE_CACHE)


def test_hll_merge_is_union_and_set_ops_behave(spark):
    """Merged registers must equal the union stream's registers
    exactly (max is the merge); inclusion-exclusion intersection is ~0
    on disjoint sets (clamped at 0) and ~|A| on identical sets with
    jaccard ~1."""
    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        hll_merge,
        hll_registers,
        hll_set_ops,
    )

    a = spark.range(0, 3000).select(F.concat(F.lit("a"), F.col("id")).alias("k"))
    b = spark.range(0, 2000).select(F.concat(F.lit("b"), F.col("id")).alias("k"))
    ra, rb = hll_registers(a, "k"), hll_registers(b, "k")
    merged = {r.bucket: r.max_rho for r in hll_merge(ra, rb).collect()}
    direct = {
        r.bucket: r.max_rho
        for r in hll_registers(a.unionByName(b), "k").collect()
    }
    assert merged == direct

    disj = hll_set_ops(ra, rb).first()
    # HLL error at p=12 is ~1.6%; disjoint intersection estimate must
    # be small relative to the union, and never negative
    assert disj.est_intersection >= 0.0
    assert disj.est_intersection < 0.05 * disj.est_union
    assert abs(disj.est_union - (disj.est_a + disj.est_b)) < 0.05 * disj.est_union

    same = hll_set_ops(ra, hll_registers(a, "k")).first()
    assert same.est_union == same.est_a  # identical registers
    assert abs(same.jaccard_est - 1.0) < 1e-9


def test_sketch_geometry_report_flags_out_of_range(spark):
    """Out-of-band geometry revalidation: in-range grids report ok,
    a grid probed under a smaller geometry does not (the check the
    lazy structural fallback cannot do for filtered dimensions)."""
    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        cms_build,
        sketch_geometry_report,
    )

    keys = spark.createDataFrame([(f"k{i}",) for i in range(200)], "key string")
    cms = cms_build(keys, "key", 4, 1024)
    ok = sketch_geometry_report(cms, {"row": 4, "col": 1024}).first()
    assert ok.ok and ok.max_col < 1024 and ok.min_row >= 0
    bad = sketch_geometry_report(cms, {"row": 2, "col": 1024}).first()
    assert not bad.ok  # rows 2,3 violate a depth-2 probe
    bad2 = sketch_geometry_report(cms, {"row": 4, "col": 64}).first()
    assert not bad2.ok


def test_sketch_null_key_and_partial_metadata_contracts(spark):
    """r10 review edges: NULL keys are ignored at build (the SQL
    COUNT/IN semantics the sketches approximate) instead of poisoning
    the structures; partial/unrelated column metadata falls through to
    the parameter-column validation tier instead of skipping
    validation; the geometry report flags NULL-indexed junk rows."""
    import pytest

    from business_intelligence_and_data_warehouse_spark.operators.sketches import (
        _assert_sketch_params,
        bloom_build,
        bloom_probe,
        cms_build,
        cms_estimate,
        hll_registers,
        quantile_sketch_build,
        sketch_geometry_report,
    )

    keys = spark.createDataFrame(
        [("a",), ("b",), (None,), ("a",)], "key string"
    )
    # bloom: the NULL key inserts nothing and no junk row exists
    bloom = bloom_build(keys, m_bits=1 << 10, k=3)
    assert bloom.filter(F.col("word").isNull()).count() == 0
    probed = bloom_probe(
        spark.createDataFrame([("a",), ("zz",)], "key string"),
        "key", bloom, m_bits=1 << 10, k=3,
    )
    flags = {r.key: r.bloom_positive for r in probed.collect()}
    assert flags["a"] is True  # no false negative
    # cms: no NULL cells; the real keys keep never-undercount
    cms = cms_build(keys, "key", depth=3, width=64)
    assert cms.filter(F.col("col").isNull()).count() == 0
    est = {
        r.key: r.est_count
        for r in cms_estimate(
            spark.createDataFrame([("a",), ("b",)], "key string"),
            "key", cms, depth=3, width=64,
        ).collect()
    }
    assert est["a"] >= 2 and est["b"] >= 1
    # hll: no NULL bucket, register table within the 2^p space
    regs = hll_registers(keys, "key", p=8)
    assert regs.filter(F.col("bucket").isNull()).count() == 0
    # quantile sketch: NULL keys cannot fill the sample
    vals = spark.createDataFrame(
        [(None, 1.0), ("k1", 2.0), ("k2", 3.0)], "key string, v double"
    )
    qs = quantile_sketch_build(vals, "v", F.col("key"), k=2)
    assert qs.filter(F.col("priority").isNull()).count() == 0
    assert qs.count() == 2

    # partial metadata must NOT skip validation: a sketch whose 'bits'
    # metadata lost the expected keys still fails via the parameter
    # columns when probed with the wrong geometry
    stripped = bloom.withMetadata("bits", {"note": "not-the-params"})
    checked = _assert_sketch_params(
        stripped, "bits", {"m_bits": 1 << 11, "k": 3},
        "test (wrong m_bits)",
    )
    with pytest.raises(Exception):  # lazy assert_true fires on action
        checked.collect()

    # geometry report: a NULL-indexed junk row flips ok to false
    junk = bloom.unionByName(
        spark.createDataFrame(
            [(None, 0, 1 << 10, 3)], "word long, bits long, m_bits int, k int"
        )
    )
    rep = sketch_geometry_report(junk, {"word": (1 << 10) // 32}).collect()[0]
    assert rep.ok is False
