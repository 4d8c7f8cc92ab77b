"""Hash-sketch operators — Bloom-filter membership, count-min
frequency, and HyperLogLog cardinality — all engine-portable and
broadcast/bounded-state shaped.

Reference parity: the reference (a BI warehouse —
`Python Analytics/PythonAnalysis.py`, Kettle ETL) has no sketch
surface; these belong to the LLM-data-pipeline extension mandate
(approximate membership for contamination/runtime filters, bounded
frequency state for heavy hitters, replayable cardinality); the
built-in `approx_count_distinct`/quantile sketches remain covered by
``approx_sketches`` with self-validation, where these three replay
bit-identically in a DuckDB oracle.

Determinism: every hash position is integer arithmetic over md5 hex
digits (the ``operators/split.py`` ascii-CASE family), so sketch
contents, probe outcomes, and even the *false positives* are
bit-identical across engines and partitionings — a DuckDB oracle can
replay the sketch exactly. No RNG, no JVM ``hash()``.

Scale design (100 TB):

* A Bloom filter over a benchmark/eval set is O(m_bits) — kilobytes —
  regardless of how many shingles it summarizes, so it BROADCASTS
  where the eval shingle *set* (MBs..GBs) might not. Probing is k
  broadcast hash joins on the word index (map-side, no explode, no
  added shuffle): the corpus scan is never reshuffled to test
  membership. No false negatives, so a downstream exact verify only
  has to touch the bloom-positive slice — the runtime-filter shape
  Spark itself uses for join pruning.
* A count-min sketch is a fixed d×w grid whose cells are plain SUMs —
  partial-aggregatable map-side, mergeable across shards/streams (the
  reason to prefer it over an exact per-key count at 100 TB is the
  bounded state, not speed at small SF). Point estimates are d
  broadcast joins + a least(); estimates only ever overcount.

Both probe paths stage the md5 digest's two slices as bound columns
ONCE per row (the HOF-staging rule, SCALE.md): the k/depth probe
expressions are then integer adds off those columns, not k separate
md5 evaluations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .split import _hex_val


def _hexn(h: Column, start: int, n: int) -> Column:
    """Integer value of ``n`` lowercase hex digits of ``h`` starting at
    1-based position ``start`` (ascii arithmetic; portable)."""
    v: Column | None = None
    for j in range(n):
        d = _hex_val(F.substring(h, start + j, 1))
        v = d if v is None else v * 16 + d
    assert v is not None
    return v


def _drop_null_keys(df: DataFrame, key: Column) -> DataFrame:
    """Filter NULL keys before hashing — the SQL-aggregate semantics
    every sketch approximates: COUNT(DISTINCT x) and COUNT(x) ignore
    NULLs, and ``x IN (set)`` is never TRUE for NULL.  Unfiltered,
    md5(NULL) poisons every structure (r10 review finding): bloom
    inserted nothing but probes returned NULL flags (false negatives
    after a filter), CMS wrote (row, NULL) junk cells and undercounted
    to 0, HLL grew a bucket=NULL register outside the 2^p space, and
    NULL quantile priorities sorted FIRST under Spark (LAST in DuckDB),
    evicting real sample rows and breaking oracle replay."""
    return df.filter(key.isNotNull())


def _with_hash_slices(df: DataFrame, key: Column) -> DataFrame:
    """Stage the double-hashing base ``_ha`` and odd stride ``_hb``
    (two disjoint 20-bit md5 slices) as bound columns; every probe
    position is then ``(_ha + i * _hb) % m`` — integer ops only."""
    h = F.md5(key.cast("string"))
    return df.withColumn("_hx", h).select(
        "*",
        _hexn(F.col("_hx"), 1, 5).alias("_ha"),
        (_hexn(F.col("_hx"), 6, 5) * 2 + 1).alias("_hb"),
    ).drop("_hx")


def _pos(i: int, modulus: int) -> Column:
    """i-th probe position off the staged slices, in [0, modulus)."""
    return (F.col("_ha") + F.lit(i) * F.col("_hb")) % F.lit(modulus)


def _bit_mask(pos_mod_32: Column) -> Column:
    """``1 << (pos % 32)`` as BIGINT. Column-valued shift amounts are
    expressed as ``2**n`` (pow is exact for integer exponents ≤ 31 —
    every value is a representable double), since ``F.shiftleft``
    only takes literal shift counts."""
    return F.pow(F.lit(2.0), pos_mod_32.cast("double")).cast("long")


def _assert_sketch_params(
    sketch: DataFrame,
    value_col: str,
    expected: dict,
    who: str,
    structural: Column | None = None,
) -> DataFrame:
    """Validate probe parameters against the build parameters the
    sketch carries and return the sketch to probe.  Three tiers, in
    strength order:

    1. **Column metadata** (attached by every build function): compared
       eagerly driver-side — a mismatch raises before any job runs.
       Spark's own parquet writer round-trips metadata; non-Spark
       writers and catalog registration drop it.
    2. **Real parameter columns** (ALSO emitted by every build
       function since r8 — constant per row, so they survive ANY
       storage that keeps the rows): when every expected parameter
       exists as a column, a lazy ``assert_true(param == probed)`` is
       wrapped onto the value column.  It evaluates JVM-side during
       the probe itself (no extra job) and — unlike the structural
       tier — catches growth-direction mismatches and filtered
       dimensions too, because the check is an equality on declared
       provenance, not an inference from cell geometry.  Every
       SHIPPED sketch therefore validates through tier 1 or 2; the
       structural tier remains only for foreign sketches built
       outside these builders.
    3. **Structural fallback**: a boolean condition over the sketch's
       own rows (e.g. ``col < width``).  Best-effort: catches
       shrink-direction geometry mismatches on rows the probe
       evaluates, structurally CANNOT catch growth-direction
       mismatches or dimensions the probe filters on before
       evaluation (see :func:`sketch_geometry_report` for the
       out-of-band audit)."""
    try:
        meta = sketch.schema[value_col].metadata
    except (KeyError, TypeError):
        meta = None
    # tier 1 applies only when the metadata carries EVERY expected key:
    # partial/unrelated metadata (a catalog comment, a foreign writer's
    # keys) previously short-circuited here with got == {} and returned
    # the sketch UNVALIDATED, skipping the parameter-column tier that
    # would have caught the mismatch (r10 review finding)
    if meta and all(k in meta for k in expected):
        mismatched = {
            k: (meta[k], expected[k])
            for k in expected
            if meta[k] != expected[k]
        }
        if mismatched:
            raise ValueError(
                f"{who}: probe parameters do not match the sketch's build "
                f"parameters: {{name: (built, probed)}} = {mismatched}"
            )
        return sketch
    cols = set(sketch.columns)
    if all(k in cols for k in expected):
        cond: Column | None = None
        for k, v in expected.items():
            c = F.col(k) == F.lit(v)
            cond = c if cond is None else cond & c
        assert cond is not None
        checked = F.when(
            F.assert_true(
                cond,
                F.lit(
                    f"{who}: the sketch's build-parameter columns do not "
                    f"match the probed parameters {expected} (metadata "
                    "was lost in a storage round-trip; the parameter "
                    "columns are authoritative)"
                ),
            ).isNull(),
            F.col(value_col),
        )
        return sketch.withColumn(value_col, checked)
    if structural is None:
        return sketch
    checked = F.when(
        F.assert_true(
            structural,
            F.lit(
                f"{who}: sketch rows violate the probed parameters "
                f"{expected} (metadata lost in a storage round-trip; "
                "structural check failed)"
            ),
        ).isNull(),
        F.col(value_col),
    )
    return sketch.withColumn(value_col, checked)


def sketch_geometry_report(sketch: DataFrame, bounds: dict[str, int]) -> DataFrame:
    """One-row out-of-band geometry report for a metadata-less sketch:
    per (index column -> exclusive upper bound), the observed min/max
    plus an ``ok`` flag that every index lies in [0, bound) — the
    revalidation the lazy structural fallback cannot perform for
    growth-direction or probe-filtered dimensions (see
    :func:`_assert_sketch_params`).  One tiny aggregate over the
    bounded grid (<= depth x width / m/32 rows), run once after
    loading a sketch from metadata-stripping storage::

        ok = sketch_geometry_report(cms, {"row": depth, "col": width})
        ok = sketch_geometry_report(bloom, {"word": (m_bits + 31) // 32})

    Note the growth caveat still applies at the data level: a grid
    whose maxima FIT a larger probe geometry is indistinguishable from
    one built at it; this report proves consistency, while metadata
    proves provenance."""
    aggs = []
    for col in bounds:
        aggs.append(F.min(col).alias(f"min_{col}"))
        aggs.append(F.max(col).alias(f"max_{col}"))
        # min/max IGNORE NULLs, so a junk NULL-indexed row would pass
        # the range check unseen and then NULL-poison a structural
        # probe assert — count them explicitly (r10 review finding)
        aggs.append(
            F.count(F.when(F.col(col).isNull(), 1)).alias(f"nulls_{col}")
        )
    row = sketch.agg(*aggs)
    ok: Column = F.lit(True)
    for col, ub in bounds.items():
        ok = (
            ok
            & (F.col(f"min_{col}") >= 0)
            & (F.col(f"max_{col}") < ub)
            & (F.col(f"nulls_{col}") == 0)
        )
    return row.withColumn("ok", ok)


def _cms_structural(depth: int, width: int) -> Column:
    """Row-wise geometry check for a metadata-less count-min grid."""
    return (
        (F.col("row") >= 0)
        & (F.col("row") < depth)
        & (F.col("col") >= 0)
        & (F.col("col") < width)
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    m_bits: int = 1 << 18,
    k: int = 4,
) -> DataFrame:
    """(word, bits) bitmap rows of a Bloom filter over the keys — at
    most ``m_bits / 32`` rows (32-bit words held in BIGINT, so no
    sign-bit edge at either engine).

    The build is one bounded aggregate: keys fan out k set-bit rows
    map-side, then ``bit_or`` collapses them onto the ≤ m/32 word
    space (partial aggregation does the heavy lifting before the
    exchange).
    """
    clean = _drop_null_keys(keys.select(F.col(key_col)), F.col(key_col))
    staged = _with_hash_slices(clean, F.col(key_col))
    rows = staged.select(
        F.explode(F.array(*[_pos(i, m_bits) for i in range(k)])).alias("pos")
    )
    return (
        rows.select(
            (F.col("pos") / F.lit(32)).cast("long").alias("word"),
            _bit_mask(F.col("pos") % 32).alias("mask"),
        )
        .groupBy("word")
        .agg(
            F.bit_or("mask").alias(
                # carry the build parameters WITH the sketch: probes
                # assert against this metadata, so an m_bits/k mismatch
                # (which silently breaks the no-false-negative
                # guarantee) fails loudly instead
                "bits", metadata={"m_bits": m_bits, "k": k}
            )
        )
        # ... and ALSO as real columns, so the parameters survive
        # metadata-stripping storage (non-Spark writers, catalogs) and
        # the probe-side guard never degrades to the structural tier
        .select(
            "word",
            "bits",
            F.lit(m_bits).alias("m_bits"),
            F.lit(k).alias("k"),
        )
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 18,
    k: int = 4,
    flag_col: str = "bloom_positive",
) -> DataFrame:
    """Adds ``flag_col``: whether ``key_col`` may be in the set the
    bloom summarizes (false positives possible, false negatives not).

    Plan shape: k broadcast hash joins on the word index — map-side
    only, no explode, no new shuffle of ``df``; a missing word row
    means all-zero bits (left join + coalesce).

    If ``bloom`` carries build metadata (every :func:`bloom_build`
    output does), the probe parameters must match it — a mismatched
    probe silently voids the no-false-negative guarantee downstream
    verification relies on.
    """
    n_words = (m_bits + 31) // 32
    bloom = _assert_sketch_params(
        bloom,
        "bits",
        {"m_bits": m_bits, "k": k},
        "bloom_probe",
        structural=(F.col("word") >= 0) & (F.col("word") < n_words),
    )
    out = _with_hash_slices(df, F.col(key_col))
    hit_all: Column | None = None
    for i in range(k):
        pos = _pos(i, m_bits)
        word = (pos / F.lit(32)).cast("long")
        mask = _bit_mask(pos % 32)
        b_i = F.broadcast(
            bloom.select(
                F.col("word").alias(f"_bw{i}"), F.col("bits").alias(f"_bb{i}")
            )
        )
        out = out.join(b_i, word == F.col(f"_bw{i}"), "left")
        hit_i = (
            F.coalesce(F.col(f"_bb{i}"), F.lit(0)).bitwiseAND(mask) == mask
        )
        hit_all = hit_i if hit_all is None else hit_all & hit_i
    assert hit_all is not None
    return out.withColumn(flag_col, hit_all).drop(
        "_ha", "_hb", *[c for i in range(k) for c in (f"_bw{i}", f"_bb{i}")]
    )


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(row, col, cnt) cells of a count-min sketch over the key stream
    — at most ``depth × width`` rows, one partial-aggregated shuffle.

    Each occurrence of a key increments one cell per row; cells are
    plain sums, so shard sketches merge by adding cells (the property
    that makes this the bounded-state answer for a 100 TB stream
    where per-key exact counts would be another full-size table).
    """
    clean = _drop_null_keys(df.select(F.col(key_col)), F.col(key_col))
    staged = _with_hash_slices(clean, F.col(key_col))
    cells = staged.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _pos(i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        cells.select("c.row", "c.col")
        .groupBy("row", "col")
        .agg(
            F.count(F.lit(1)).alias(
                "cnt", metadata={"depth": depth, "width": width}
            )
        )
        # build params as real columns too — survive any storage
        .select(
            "row",
            "col",
            "cnt",
            F.lit(depth).alias("depth"),
            F.lit(width).alias("width"),
        )
    )


def cms_estimate(
    keys: DataFrame,
    key_col: str,
    cms: DataFrame,
    depth: int = 4,
    width: int = 1024,
    est_col: str = "est_count",
) -> DataFrame:
    """Adds ``est_col``: the count-min point estimate (min over the
    depth cells; ≥ the true count, never under). ``depth`` broadcast
    joins on the per-row column index — the sketch is ≤ depth×width
    rows, split by row into depth single-row-indexed lookup sides.
    Probe parameters are asserted against the sketch's build metadata
    (mismatches would silently break the never-undercount bound)."""
    cms = _assert_sketch_params(
        cms,
        "cnt",
        {"depth": depth, "width": width},
        "cms_estimate",
        structural=_cms_structural(depth, width),
    )
    out = _with_hash_slices(keys, F.col(key_col))
    ests = []
    for i in range(depth):
        col_i = _pos(i, width)
        c_i = F.broadcast(
            cms.filter(F.col("row") == i).select(
                F.col("col").alias(f"_cc{i}"), F.col("cnt").alias(f"_cn{i}")
            )
        )
        out = out.join(c_i, col_i == F.col(f"_cc{i}"), "left")
        ests.append(F.coalesce(F.col(f"_cn{i}"), F.lit(0)))
    return out.withColumn(est_col, F.least(*ests)).drop(
        "_ha", "_hb", *[c for i in range(depth) for c in (f"_cc{i}", f"_cn{i}")]
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_P = 12  # 2^12 = 4096 registers


def _rho16(v: Column) -> Column:
    """Leading-zero rank of a 16-bit window: position (1-based) of the
    highest set bit from the top, 17 when the window is all zeros —
    a pure comparison ladder (no log2/bit_length), portable to any
    SQL engine bit for bit."""
    # strongest comparison FIRST: a chained when() evaluates in
    # order, so v >= 2^15 must be the outermost branch (wrapping it
    # last would make the weakest test win and pin rho at 16)
    expr: Column | None = None
    for rank, bit in enumerate(range(15, -1, -1), start=1):
        cond = v >= (1 << bit)
        expr = (
            F.when(cond, F.lit(rank))
            if expr is None
            else expr.when(cond, F.lit(rank))
        )
    assert expr is not None
    return expr.otherwise(F.lit(17))


def hll_registers(
    df: DataFrame,
    key_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """(bucket, max_rho) register table of a HyperLogLog over the key
    stream — at most 2**p rows, one partial-aggregated shuffle (MAX is
    the merge, so shard registers combine by cellwise max: the same
    bounded-state mergeability story as the count-min grid, for
    cardinality instead of frequency).

    Hash layout off md5 hex digits: bucket = first p bits (p must be
    a multiple of 4 here — hex-digit arithmetic), rho = leading-zero
    rank of the NEXT 16 bits.
    """
    return hll_registers_grouped(df, [], key_col, p)


def _hll_agg_exprs():
    """The per-register-table aggregate state (n_filled, z_filled) —
    shared by the global and grouped estimators so the dyadic
    harmonic-sum convention cannot drift between them.  COALESCE: SUM
    over zero rows is NULL, which would make an empty key stream
    estimate NULL instead of the correct 0 (empty -> z = m -> linear
    counting -> m*ln(m/m) = 0)."""
    return [
        F.count(F.lit(1)).alias("n_filled"),
        F.coalesce(
            F.sum(F.lit(1.0) / F.pow(F.lit(2.0), F.col("max_rho"))),
            F.lit(0.0),
        ).alias("z_filled"),
    ]


def _hll_correction_exprs(m: int):
    """(v_empty, est_raw, corrected) over an (n_filled, z_filled)
    aggregate — the alpha·m²/Z raw estimate and the FLOOR-snapped
    linear-counting small-range correction, shared by the global and
    grouped estimators."""
    alpha = 0.7213 / (1 + 1.079 / m)
    z = F.col("z_filled") + (F.lit(m) - F.col("n_filled"))  # empty -> 2^0
    v_empty = (F.lit(m) - F.col("n_filled")).cast("long")
    est_raw = F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) / z
    corrected = F.when(
        (est_raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.floor(F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty) * 1e6)
        / 1e6,
    ).otherwise(F.floor(est_raw * 1e6) / 1e6)
    return v_empty, est_raw, corrected


def hll_estimate(registers: DataFrame, p: int = HLL_P) -> DataFrame:
    """One-row cardinality estimate from a register table.

    (m, n_filled, v_empty, est_raw, estimate) — ``est_raw`` is the
    raw HLL estimate alpha·m²/Z (every term of Z is a dyadic rational
    2^-rho, so the harmonic sum and the estimate are bit-identical
    cross-engine); ``estimate`` applies the standard linear-counting
    small-range correction m·ln(m/V) when est_raw ≤ 2.5m and V > 0,
    snapped ``FLOOR(x·1e6)/1e6`` because ln is the one libm call that
    is NOT bit-identical across engines (the log-snap recipe).
    """
    m = 1 << p
    registers = _assert_sketch_params(
        registers, "max_rho", {"p": p}, "hll_estimate"
    )
    agg = registers.agg(*_hll_agg_exprs())
    v_empty, est_raw, corrected = _hll_correction_exprs(m)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("n_filled").cast("long").alias("n_filled"),
        v_empty.alias("v_empty"),
        est_raw.alias("est_raw"),
        corrected.alias("estimate"),
    )


# ---------------------------------------------------------------------------
# quantile sketch (hash-priority bottom-k)
# ---------------------------------------------------------------------------

def quantile_sketch_build(
    df: DataFrame,
    value_col: str,
    key: Column,
    k: int = 1024,
) -> DataFrame:
    """(priority, value) quantile sketch: the k rows whose md5
    priorities are smallest — a deterministic uniform sample without
    replacement (completing the sketch family: membership / frequency
    / cardinality / QUANTILES).

    Why bottom-k instead of a literal KLL: KLL's compactor decisions
    depend on arrival order, so its content is neither partition-
    invariant nor replayable by another engine.  Hash-priority
    bottom-k keeps the properties that matter at 100 TB — fixed O(k)
    state, one TakeOrdered pass (k-row buffers per partition, no full
    shuffle), mergeable — and makes the "compaction" deterministic:
    keep the k lexicographically-smallest digests.  Shard-merge ==
    single-pass is then an exact SET IDENTITY (the k smallest of a
    union are the k smallest overall), not an approximation, and a
    DuckDB oracle replays sketch content AND estimates bit for bit.
    Rank error is the uniform-sample bound O(n/sqrt(k)).

    ``key`` need not be row-unique, but rows sharing a key MUST carry
    equal values (fold the value into the key when the natural key can
    repeat): tied priorities with equal values make every boundary
    choice output-identical.  Lowercase-hex md5 strings sort the same
    in every engine, so no integer conversion is needed.
    """
    return (
        _drop_null_keys(df, key)
        .select(
            # carry k with the sketch (same convention as the bloom /
            # cms build metadata): merge and estimate assert against it
            F.md5(key.cast("string")).alias("priority", metadata={"k": k}),
            F.col(value_col).cast("double").alias("value"),
            # ... and as a real column (survives any storage)
            F.lit(k).alias("k"),
        )
        .orderBy("priority")
        .limit(k)
    )


def quantile_sketch_merge(sketches: list[DataFrame], k: int = 1024) -> DataFrame:
    """Merge shard sketches: union, keep the k smallest priorities —
    exactly the single-pass sketch over the concatenated inputs.

    ``k`` must equal the shards' build k (asserted against the build
    metadata): merging bottom-256 shards through limit(1024) would
    pass the union through untouched — neither the bottom-1024 nor
    the bottom-256 of the full data, silently over-weighting small
    shards."""
    if not sketches:
        raise ValueError("quantile_sketch_merge needs at least one sketch")
    # keep the guard's RETURN value: the metadata tier raises eagerly,
    # but the parameter-COLUMN tier (metadata-stripped storage) wraps a
    # lazy assert onto the priority column, which only fires if the
    # wrapped frame is the one merged.  No structural fallback exists
    # for k — a SET-size property no row can witness.
    checked = [
        _assert_sketch_params(s, "priority", {"k": k}, "quantile_sketch_merge")
        for s in sketches
    ]
    out = checked[0]
    for s in checked[1:]:
        out = out.unionByName(s)
    return out.orderBy("priority").limit(k)


def quantile_sketch_quantiles(
    sketch: DataFrame, qs: tuple[float, ...]
) -> DataFrame:
    """(q, n_sample, est) type-1 quantile estimates from the sample:
    the value at rank max(ceil(q * n_sample), 1) of the sample ordered
    by (value, priority).  All arithmetic is IEEE multiply + ceil over
    identical inputs, so estimates replay exactly cross-engine."""
    # the grouped form with no group columns IS this computation (one
    # window pass, same rank formula) — delegate so the ceil-rank /
    # n_sample logic exists exactly once (the hll_registers ->
    # hll_registers_grouped pattern)
    return quantile_sketch_quantiles_grouped(sketch, [], qs)


def hll_registers_grouped(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """(group..., bucket, max_rho) — one HLL register table PER GROUP,
    in one partial-aggregated shuffle keyed on (group, bucket): the
    grouped generalization of :func:`hll_registers` (state per group
    is ≤ 2**p rows no matter how many keys flow through it — the
    bounded-state answer to COUNT(DISTINCT) BY group at 100 TB, where
    exact per-group distinct sets are another full-size table).
    Registers merge across shards/epochs by cellwise MAX within the
    group, exactly as the global form."""
    if p % 4 != 0:
        raise ValueError(f"p must be a multiple of 4 (hex digits), got {p}")
    df = _drop_null_keys(df, F.col(key_col))
    key = F.col(key_col).cast("string")
    h = F.md5(key)
    staged = df.select(
        *group_cols,
        _hexn(h, 1, p // 4).alias("bucket"),
        _rho16(_hexn(h, p // 4 + 1, 4)).alias("rho"),
    )
    return (
        staged.groupBy(*group_cols, "bucket")
        .agg(
            # carry p with the registers (metadata + real column, the
            # bloom/cms convention): estimators assert against it — a
            # p-mismatched estimate mis-sizes m and is silently wrong
            F.max("rho").alias("max_rho", metadata={"p": p})
        )
        .select(*group_cols, "bucket", "max_rho", F.lit(p).alias("p"))
    )


def hll_estimate_grouped(
    registers: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Per-group cardinality estimates from a grouped register table —
    the same dyadic harmonic sum + linear-counting correction as
    :func:`hll_estimate`, aggregated per group (one group-keyed
    shuffle over register rows, never key rows)."""
    m = 1 << p
    registers = _assert_sketch_params(
        registers, "max_rho", {"p": p}, "hll_estimate_grouped"
    )
    agg = registers.groupBy(*group_cols).agg(*_hll_agg_exprs())
    v_empty, est_raw, corrected = _hll_correction_exprs(m)
    return agg.select(
        *group_cols,
        F.col("n_filled").cast("long").alias("n_filled"),
        v_empty.alias("v_empty"),
        corrected.alias("estimate"),
    )


def quantile_sketch_build_grouped(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key: Column,
    k: int = 256,
) -> DataFrame:
    """(group..., priority, value) — one bottom-k priority sample PER
    GROUP, the grouped generalization of :func:`quantile_sketch_build`
    (pairs with :func:`hll_registers_grouped`: bounded O(k) state per
    group for quantiles the way registers bound cardinality).  One
    shuffle on the group key; the per-group rank is a window over
    group-sized partitions.  Same key contract as the global form
    (rows sharing a key must carry equal values); the same set-
    identity merge law holds per group."""
    staged = _drop_null_keys(df, key).select(
        *group_cols,
        F.md5(key.cast("string")).alias("priority", metadata={"k": k}),
        F.col(value_col).cast("double").alias("value"),
        F.lit(k).alias("k"),  # real column: survives any storage
    )
    w = W.partitionBy(*group_cols).orderBy("priority")
    return (
        staged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def quantile_sketch_quantiles_grouped(
    sketch: DataFrame, group_cols: list[str], qs: tuple[float, ...]
) -> DataFrame:
    """(group..., q, n_sample, est) per-group type-1 quantile
    estimates — the grouped twin of :func:`quantile_sketch_quantiles`,
    one pass over the sketch (rank and n_sample from the same
    group-partitioned window projection)."""
    w = W.partitionBy(*group_cols).orderBy("value", "priority")
    w_all = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = sketch.select(
        *group_cols,
        "value",
        F.row_number().over(w).cast("long").alias("r"),
        F.count(F.lit(1)).over(w_all).alias("n_sample"),
    )
    return (
        ranked.select(
            *group_cols, "value", "r", "n_sample",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        )
        .filter(
            F.col("r")
            == F.greatest(
                F.ceil(F.col("q") * F.col("n_sample")).cast("long"),
                F.lit(1).cast("long"),
            )
        )
        .select(*group_cols, "q", "n_sample", F.col("value").alias("est"))
    )


def cms_join_size_estimate(
    cms_a: DataFrame,
    cms_b: DataFrame,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """One-row estimate of the equi-join size |A ⋈ B| from the two
    sides' count-min sketches: for each row i, Σ_j a[i,j]·b[i,j] is an
    UPPER-BIASED estimate of Σ_key cntA(key)·cntB(key) (the true join
    size — the inner product of the count vectors); the estimate takes
    the MIN over the depth rows, never below the true size.

    The AQE-adjacent use at 100 TB: both sketches are d×w regardless
    of table size and mergeable across shards, so join-size estimates
    for planning (broadcast-vs-shuffle, skew pre-checks) come from
    bounded state without scanning either table again.  All arithmetic
    is integer, so the estimate replays exactly in any engine.

    Output: one row (est_join_size, rows_used).  Cells absent from a
    sketch are zero, so the inner join on (row, col) keeps only
    co-occupied cells; a depth row with NO co-occupied cells has inner
    product 0, which forces the estimate to 0 (each row's product
    upper-bounds the true size, so any zero row proves an empty join)
    — handled via the rows_used < depth branch.
    """
    cms_a = _assert_sketch_params(
        cms_a, "cnt", {"depth": depth, "width": width},
        "cms_join_size_estimate (left)",
        structural=_cms_structural(depth, width),
    )
    cms_b = _assert_sketch_params(
        cms_b, "cnt", {"depth": depth, "width": width},
        "cms_join_size_estimate (right)",
        structural=_cms_structural(depth, width),
    )
    a = cms_a.select("row", "col", F.col("cnt").alias("_ca"))
    b = cms_b.select("row", "col", F.col("cnt").alias("_cb"))
    per_row = (
        a.join(b, ["row", "col"])
        .groupBy("row")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("ip"))
    )
    return per_row.agg(
        F.min("ip").alias("_min_ip"),
        F.count(F.lit(1)).cast("int").alias("rows_used"),
    ).select(
        F.when(F.col("rows_used") < depth, F.lit(0))
        .otherwise(F.coalesce(F.col("_min_ip"), F.lit(0)))
        .cast("long")
        .alias("est_join_size"),
        "rows_used",
    )


def hll_merge(regs_a: DataFrame, regs_b: DataFrame) -> DataFrame:
    """Cellwise-MAX merge of two HLL register tables — exactly the
    register table of the UNION of the two key streams (max is the
    merge for rank registers, as addition is for count-min cells), so
    shard/stream/set-union cardinalities all come from the same
    bounded O(2^p) state.

    Build-parameter handling: register tables built with different
    ``p`` live in different bucket spaces and must never merge — a
    metadata mismatch raises eagerly; the ``p`` columns (which survive
    any storage) are re-checked lazily per merged bucket and carried
    on the output, so downstream estimators keep their guard."""

    def _meta_p(df: DataFrame) -> int | None:
        try:
            return df.schema["max_rho"].metadata.get("p")
        except (KeyError, TypeError):
            return None

    pa, pb = _meta_p(regs_a), _meta_p(regs_b)
    if pa is not None and pb is not None and pa != pb:
        raise ValueError(
            f"hll_merge: register tables built with different p "
            f"({pa} vs {pb}) occupy different bucket spaces"
        )
    p_known = pa if pa is not None else pb
    u = regs_a.unionByName(regs_b)
    meta_kw = {"metadata": {"p": p_known}} if p_known is not None else {}
    if "p" in u.columns:
        # GLOBAL p agreement, not just per-colliding-bucket: with one-
        # sided metadata the eager check passes and mostly-disjoint
        # occupancy never collides, so a mixed 8/12-bit merge slipped
        # through stamped with the known side's p (r10 review finding).
        # The window is over the bounded register union (<= 2^(p+1)
        # rows), and the known metadata is cross-checked against the
        # column too.
        w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        gmin = F.min("p").over(w_all.orderBy(F.lit(1)))
        gmax = F.max("p").over(w_all.orderBy(F.lit(1)))
        bad = (gmin != gmax) | (
            F.lit(False)
            if p_known is None
            else (gmin != F.lit(p_known)) | (gmax != F.lit(p_known))
        )
        # the assert wraps the p column itself (a dropped helper
        # column would be pruned away with its assert_true)
        u = u.withColumn(
            "p",
            F.when(
                F.assert_true(
                    ~bad,
                    F.lit(
                        "hll_merge: register tables carry different p "
                        "parameter columns (or disagree with the "
                        "metadata) — different bucket spaces"
                    ),
                ).isNull(),
                F.col("p"),
            ),
        )
        agg = u.groupBy("bucket").agg(
            F.max("max_rho").alias("max_rho", **meta_kw),
            F.min("p").alias("_pmin"),
            F.max("p").alias("_pmax"),
        )
        p_col = F.when(
            F.assert_true(
                F.col("_pmin") == F.col("_pmax"),
                F.lit(
                    "hll_merge: register tables carry different p "
                    "parameter columns — different bucket spaces"
                ),
            ).isNull(),
            F.col("_pmin"),
        )
        return agg.select("bucket", "max_rho", p_col.alias("p"))
    return u.groupBy("bucket").agg(F.max("max_rho").alias("max_rho", **meta_kw))


def hll_set_ops(
    regs_a: DataFrame, regs_b: DataFrame, p: int = HLL_P
) -> DataFrame:
    """One row of SET analytics from two HLL register tables:
    (est_a, est_b, est_union, est_intersection, jaccard_est).

    Union is exact at the sketch level (:func:`hll_merge` — the merged
    registers ARE the union's registers); intersection falls out by
    inclusion-exclusion over the three estimates (clamped at 0 — the
    difference of estimates can go slightly negative on disjoint
    sets), and set-Jaccard is their ratio.  The 100-TB use: audience
    overlap / key-set similarity between two corpora from O(2^p)
    mergeable state per side, no join and no rescan.  Error grows for
    small intersections of large sets (the classic inclusion-exclusion
    caveat) — callers needing tight small-overlap bounds should use
    the MinHash signatures instead.

    Determinism: each estimate is the snapped HLL closed form
    (:func:`hll_estimate`); the combination is fixed-order IEEE
    arithmetic over those snapped doubles, so the whole row replays
    bit-identically in a SQL oracle.

    Empty-input edge: two empty register tables estimate 0/0/0, and
    ``jaccard_est`` = 0/0 is NULL — deliberately NOT clamped, because
    Jaccard of two empty sets is undefined and both Spark's Divide
    and DuckDB's ``/`` return NULL on a zero denominator (verified
    parity), so the oracle hash-matches.  Callers wanting 0.0 instead
    should COALESCE at the use site.
    """
    from .caching import pin

    # each register table feeds its own estimate AND the merge —
    # aliased/reshaped plans get no exchange reuse, so unpinned the
    # corpus-scale register aggregation would run twice per side
    regs_a, regs_b = pin(regs_a), pin(regs_b)
    ea = hll_estimate(regs_a, p).select(F.col("estimate").alias("est_a"))
    eb = hll_estimate(regs_b, p).select(F.col("estimate").alias("est_b"))
    eu = hll_estimate(hll_merge(regs_a, regs_b), p).select(
        F.col("estimate").alias("est_union")
    )
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0.0)
    )
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .select(
            "est_a",
            "est_b",
            "est_union",
            inter.alias("est_intersection"),
            (inter / F.col("est_union")).alias("jaccard_est"),
        )
    )
