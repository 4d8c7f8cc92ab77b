"""Recall@k vs nprobe across the scale ramp — the measurement behind
the trained-IVF probe budget (VERDICT r10 item 4).

The serving forms probe ceil(0.7·√N) of ~√N cells — a constant ~70%
CELL FRACTION, so ADC candidates per probe grow ~0.7·N (linear): the
structural reason `sim_ann_ivfpq_fixed`'s ramp exponent crept to 0.80.
The 0.7 fraction was recall-fit at sf0.01 (N=200, 14 cells).  This
study measures what fraction the SAME recall bar actually needs as N
grows: cells are direction-based and get angularly finer as √N grows,
so a probe's true top-k concentrates into fewer cells — if recall
holds at a decaying fraction, the budget can be sub-√N and candidate
width sub-linear.

Usage: PYTHONPATH=. python tools/nprobe_recall_study.py [mults ...]
(defaults: 1 10 30; x1 = /root/testdata/sf0.1, others .scaleramp/xM)
       PYTHONPATH=. python tools/nprobe_recall_study.py clustered [Ns ...]

The second form swaps the ramp's UNIFORM-SPHERE corpus for a seeded
CLUSTERED one (256 unit-vector centers, per-point gaussian noise) —
the structure real text/image embeddings have.  Uniform 64-dim data
is the IVF worst case: a probe's top-k cosine neighbors are barely
closer than random vectors, so they spread across ~all directions and
cell pruning has no signal at ANY cell count; clustered data
concentrates neighbors in few cells, which is where sub-√N probe
budgets hold recall.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time


def _clustered_pdf(n: int, dim: int = 64, centers: int = 256, seed: int = 7):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    c = rng.standard_normal((centers, dim))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    which = rng.integers(0, centers, n)
    pts = c[which] + 0.15 * rng.standard_normal((n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [row.astype("float32") for row in pts],
        }
    )


def main() -> None:
    clustered = len(sys.argv) > 1 and sys.argv[1] == "clustered"
    if clustered:
        sys.argv = sys.argv[1:]
    mults = [int(m) for m in sys.argv[1:]] or [1, 10, 30]
    from pyspark.sql import functions as F

    from business_intelligence_and_data_warehouse_spark.operators.caching import (
        release_pinned,
    )
    from business_intelligence_and_data_warehouse_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_trained,
    )
    from business_intelligence_and_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="nprobe-recall-study", cpus=32)
    out = []
    for mult in mults:
        if clustered:
            # mult is interpreted as N directly in clustered mode
            emb = spark.createDataFrame(_clustered_pdf(mult))
            emb = emb.localCheckpoint(eager=True)  # freeze the corpus
        else:
            d = (
                "/root/testdata/sf0.1"
                if mult == 1
                else f"/root/repo/.scaleramp/x{mult}"
            )
            emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n = emb.count()
        k0 = max(1, math.floor(math.sqrt(n)))
        probes = emb.filter((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 500))
        truth = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, probes, 10).collect()
        }
        n_true = len(truth)
        budgets = sorted(
            {
                math.ceil(0.7 * k0),          # current serving budget
                math.ceil(0.35 * k0),         # half fraction
                math.ceil(1.4 * math.sqrt(k0)),  # ~1.4·N^0.25 (decaying fraction)
                math.ceil(math.sqrt(k0)),     # ~N^0.25
                8,
                16,
            }
        )
        for nprobe in budgets:
            if nprobe > k0:
                continue
            release_pinned()
            t0 = time.perf_counter()
            got = {
                (r.query_id, r.neighbor_id)
                for r in ivf_topk_trained(
                    emb, probes, 10, nprobe=nprobe
                ).collect()
            }
            wall = time.perf_counter() - t0
            rec = {
                "mult": mult,
                "n": n,
                "cells": k0,
                "nprobe": nprobe,
                "frac": round(nprobe / k0, 3),
                "recall": round(len(got & truth) / n_true, 4),
                "wall": round(wall, 2),
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
    release_pinned()
    print("STUDY " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
