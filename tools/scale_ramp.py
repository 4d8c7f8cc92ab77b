"""Scale-ramp audit: measure how the scale-sensitive queries ACTUALLY
scale, instead of arguing plan shape alone.

`gen M` synthesizes an M-fold testdata dir at .scaleramp/x{M}/ by
unioning /root/testdata/sf0.1 with key-shifted copies:

* every surrogate key (orderkey, custkey, partkey, suppkey, doc_id,
  vec_id, event_id, user_id) is offset per copy, and every FK offsets
  WITH its parent, so join semantics and per-key densities are
  preserved exactly — the data grows, the relationships don't change;
* region/nation stay fixed (dims that are small at every SF; nationkey
  FKs remain valid);
* document TOKENS get a per-copy suffix, so each copy's shingle/token
  vocabulary is disjoint from the others': the intra-copy near-dup
  structure replicates M times and CROSS-copy pairs are impossible —
  near-dup output grows LINEARLY, which is what a real corpus does
  (M identical copies of every document would make pair counts grow
  quadratically in M and poison the exponent with output size);
* embeddings get a deterministic per-(copy, coordinate) perturbation
  strong enough to break cross-copy cosine similarity, for the same
  reason.

`run M1,M2,...` times the representative queries (best-of-2 noop-sink
runs, same protocol as bench.py) at each multiplier and prints the
fitted scaling exponent b in t = a * M^b from the (M1, M_last) pair
plus the intermediate residual. b <= ~1.2 is the SCALE.md bar; b ~ 2
means a quadratic crept in.

Usage:
    PYTHONPATH=. python tools/scale_ramp.py gen 3
    PYTHONPATH=. python tools/scale_ramp.py gen 10
    PYTHONPATH=. python tools/scale_ramp.py run 1,3,10
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

BASE = "/root/testdata/sf0.1"
OUT_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scaleramp")

REPRESENTATIVES = [
    # reference battery + warehouse build
    "q1a_yoy_growth",
    "etl_fact_order_lines",
    "analytics_mart",
    "warehouse_bucketed_join",
    # dedup family
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_incremental",
    "dedup_clusters",
    "dedup_multi_signal",
    # similarity family
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_ivf_trained",  # r8: the production sqrt(N)-cell quantizer
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "sim_ann_ivfpq_rerank",  # r11: ADC shortlist + exact rerank
    "sim_embedding_topk",
    # corpus / tokenizer / sketches
    "corpus_curation_funnel",
    "pipeline_curate_pack",
    "corpus_pack_sequences",
    "bpe_encode_corpus",
    "events_heavy_hitters",
    "quantile_prices_production",
]


def _gen(mult: int) -> str:
    from pyspark.sql import functions as F

    from business_intelligence_and_data_warehouse_spark.session import (
        get_spark,
        shuffle_partitions_for,
    )

    out_dir = os.path.join(OUT_ROOT, f"x{mult}")
    os.makedirs(out_dir, exist_ok=True)
    base_bytes = sum(
        os.path.getsize(os.path.join(BASE, f)) for f in os.listdir(BASE)
    )
    spark = get_spark(
        app_name=f"scale-ramp-gen-x{mult}",
        shuffle_partitions=shuffle_partitions_for(base_bytes * mult, 32),
    )

    def read(name):
        return spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))

    def copies(df, shift_cols: dict, text_col: str | None = None,
               emb_col: str | None = None):
        """Union `mult` key-shifted copies of df. shift_cols maps
        column -> per-copy offset step (chosen >> the base key range)."""
        parts = []
        for c in range(mult):
            cur = df
            for col, step in shift_cols.items():
                cur = cur.withColumn(col, F.col(col) + F.lit(c * step))
            if text_col is not None and c > 0:
                # disjoint per-copy token vocabulary (see module doc)
                cur = cur.withColumn(
                    text_col,
                    F.array_join(
                        F.transform(
                            F.split(F.col(text_col), r"\s+"),
                            lambda w: F.concat(w, F.lit(f"_c{c}")),
                        ),
                        " ",
                    ),
                )
            if emb_col is not None and c > 0:
                # per-copy ORTHOGONAL transform (coordinate permutation
                # by an odd stride + deterministic sign flips): every
                # intra-copy pairwise cosine is EXACTLY the base
                # corpus's (so ANN/dedup structure replicates), while
                # cross-copy cosines decorrelate.  An additive constant
                # offset per copy — the first attempt — made all of a
                # copy's vectors point the same way, collapsing them
                # into a handful of LSH buckets / IVF cells and faking
                # a quadratic exponent (1.59 measured) that was the
                # DATA's fault, not the operator's.
                stride = 2 * c + 1  # odd -> coprime with any 2^k dim
                dim = F.size(F.col(emb_col))
                cur = cur.withColumn(
                    emb_col,
                    F.transform(
                        F.sequence(F.lit(0), dim - 1),
                        lambda i: (
                            (
                                F.pmod(F.hash(i, F.lit(c)), F.lit(2)) * 2 - 1
                            ).cast("float")
                            * F.element_at(
                                F.col(emb_col),
                                (i * stride % dim + 1).cast("int"),
                            )
                        ).cast("float"),
                    ),
                )
            parts.append(cur)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    K = 100_000_000  # key offset step: far above any base key range
    plans = {
        "region": read("region"),
        "nation": read("nation"),
        "supplier": copies(read("supplier"), {"s_suppkey": K}),
        "part": copies(read("part"), {"p_partkey": K}),
        "customer": copies(read("customer"), {"c_custkey": K}),
        "orders": copies(read("orders"), {"o_orderkey": K, "o_custkey": K}),
        "lineitem": copies(
            read("lineitem"),
            {"l_orderkey": K, "l_partkey": K, "l_suppkey": K},
        ),
        "events": copies(
            read("events"), {"event_id": K, "user_id": K}
        ),
        "documents": copies(
            read("documents"), {"doc_id": K}, text_col="text"
        ),
        "embeddings": copies(
            read("embeddings"), {"vec_id": K}, emb_col="embedding"
        ),
    }
    for name, df in plans.items():
        df.coalesce(max(1, mult)).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"wrote {name} x{mult}")
    spark.stop()
    return out_dir


def _run(mults: list[int], only: list[str] | None = None) -> None:
    from business_intelligence_and_data_warehouse_spark.plans.queries import (
        QUERIES,
    )
    from business_intelligence_and_data_warehouse_spark.session import (
        get_spark,
        shuffle_partitions_for,
    )

    dirs = {
        m: BASE if m == 1 else os.path.join(OUT_ROOT, f"x{m}") for m in mults
    }
    for m, d in dirs.items():
        if not os.path.isdir(d):
            raise SystemExit(f"missing {d}; run `gen {m}` first")
    biggest = max(mults)
    base_bytes = sum(
        os.path.getsize(os.path.join(BASE, f)) for f in os.listdir(BASE)
    )
    spark = get_spark(
        app_name="scale-ramp-run",
        shuffle_partitions=shuffle_partitions_for(base_bytes * biggest, 32),
    )
    # warm
    QUERIES["q1a_yoy_growth"](spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()

    reps = REPRESENTATIVES if only is None else only
    unknown = [n for n in reps if n not in QUERIES]
    if unknown:
        # fail loudly: a renamed query silently dropping out of the
        # audit would make the summary look complete when it isn't
        # (the repo's no-silent-caps rule)
        raise SystemExit(f"unknown representatives (renamed?): {unknown}")
    results: dict[str, dict[int, float]] = {}
    for name in reps:
        results[name] = {}
        for m in mults:
            best = None
            # SPARK_GRAFT_RAMP_REPS=1 for the longest decades (x1000
            # legs run minutes each — JIT noise is already amortized)
            reps = int(os.environ.get("SPARK_GRAFT_RAMP_REPS", "2"))
            try:
                for _ in range(reps):
                    t0 = time.perf_counter()
                    QUERIES[name](spark, dirs[m]).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
            except Exception as exc:
                print(f"{name} x{m} FAILED: {exc}", file=sys.stderr)
                best = -1.0
                break
            results[name][m] = round(best, 3)
        row = results[name]
        if len(row) == len(mults) and all(v > 0 for v in row.values()):
            m0, m1 = mults[0], mults[-1]
            # A single multiplier (or repeated endpoints) has no slope
            # to fit — skip the exponent but keep the timing rows.
            if m0 != m1:
                b = math.log(row[m1] / row[m0]) / math.log(m1 / m0)
                row["exponent"] = round(b, 2)
        print(json.dumps({"query": name, **{str(k): v for k, v in row.items()}}))
    print(json.dumps({"summary": {
        n: r.get("exponent") for n, r in results.items()}}))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "gen":
        _gen(int(sys.argv[2]))
    elif cmd == "run":
        # optional 3rd arg: comma-separated subset of representatives
        # (e.g. the dedup family alone for the x300 decade)
        only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
        _run([int(x) for x in sys.argv[2].split(",")], only)
    else:
        raise SystemExit(
            "usage: scale_ramp.py gen M | run M1,M2,... [q1,q2,...]"
        )
