"""Connected components over near-duplicate pair graphs.

The dedup operators (`operators/dedup.py`) emit *pairs*; a curation
pipeline needs *clusters* — if A~B and B~C, then {A,B,C} is one
duplicate group and exactly one member (the canonical minimum id)
survives. That closure is a connected-components computation on the
pair graph.

Algorithm: iterative min-label propagation expressed as DataFrame
joins. Every node starts labeled with itself; each round every node
takes the minimum label among itself and its neighbors; fixpoint =
components, where each component's label is its minimum member id.

Scale design (100 TB):
* Each round is one shuffle of the (symmetrized) edge table keyed on
  node id plus a min-aggregate — fully distributed, no driver state.
* Rounds needed = graph diameter for plain min-propagation. Near-dup
  graphs are overwhelmingly tiny cliques/stars (diameter <= ~3), so
  3-5 rounds close almost any real corpus; `max_iter` bounds the
  pathological chain case. For adversarial long-path graphs
  ``method="two_phase"`` switches to alternating large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14), which contracts path length geometrically and converges in
  O(log^2 n) rounds — a 256-node chain closes in ~5 rounds instead of
  255 (covered by tests/test_graph.py's chain test).
* Lineage is truncated every round with an eager `localCheckpoint`:
  without it the plan doubles per iteration and the optimizer chokes
  long before the data does. (On a production cluster with HDFS/S3
  checkpoint dirs, `checkpoint()` also survives executor loss;
  localCheckpoint trades that durability for zero-infra tests.)
* The convergence probe is a `limit(1).count()` on changed labels —
  an O(1)-result action per round, not a data pull.

The reference has no graph operators (its dedup is single-table SQL
DISTINCT, `TASK 2A SQL Analytical Queries.sql` uses none); this is a
beyond-reference extension required by the corpus-curation goal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al. §3): every node u connects
    each STRICTLY LARGER neighbor to m(u) = min(neighbors ∪ {u}).
    Input/output are undirected edge sets (self-loops dropped). One
    shuffle on node id for the min, one to join it back."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient each edge (max, min); every node
    connects its smaller neighbors AND itself to the minimum of that
    set. Same two-shuffle plan shape as :func:`_large_star`."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    to_min = oriented.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_to_min = mins.select("u", F.col("m").alias("v"))
    return (
        to_min.unionByName(self_to_min)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _two_phase_components(
    e: DataFrame, nodes: DataFrame, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star contraction: path lengths
    shrink geometrically, so even adversarial chains close in
    O(log^2 n) rounds. Converged when a round leaves the edge set
    unchanged; at that point every edge is (node, component-min).
    Raises on non-convergence: the star extraction below is only
    correct on a converged (star-forest) edge set, and silently
    mislabeling components would look valid."""
    converged = False
    for _ in range(max_iter):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        delta = (
            new_e.exceptAll(e).limit(1).count()
            + e.exceptAll(new_e).limit(1).count()
        )
        e = new_e
        if delta == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"two-phase connected components did not converge within "
            f"{max_iter} rounds (O(log^2 n) expected — raise max_iter)"
        )
    stars = e.select(
        F.greatest("u", "v").alias("node"), F.least("u", "v").alias("comp")
    ).groupBy("node").agg(F.min("comp").alias("comp"))
    return (
        nodes.join(stars, "node", "left")
        .select("node", F.coalesce("comp", "node").alias("comp"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    method: str = "propagation",
) -> DataFrame:
    """(node, component) for every node appearing in `edges`, where
    component = minimum node id reachable. Deterministic: min over a
    total order, independent of partitioning and iteration count past
    convergence.

    ``method="propagation"`` (default) is one-shuffle-per-round min
    propagation — optimal for the tiny-diameter clusters near-dup
    graphs actually produce. ``method="two_phase"`` is the
    large-star/small-star contraction for adversarial diameters
    (O(log^2 n) rounds regardless of chain length).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Both symmetrize forms (array + struct-pair explode) require u/v
    # to share one type — unlike the old unionByName form they do NOT
    # implicitly coerce (e.g. int src vs bigint dst fails analysis).
    # Resolve the common type the way Spark itself would (coalesce's
    # coercion rule) and cast both sides up front, so mixed-width edge
    # lists keep working instead of failing at analysis time.
    types = dict(e.dtypes)
    if types["u"] != types["v"]:
        common = e.select(
            F.coalesce("u", "v").alias("_c")
        ).schema["_c"].dataType
        e = e.select(
            F.col("u").cast(common).alias("u"),
            F.col("v").cast(common).alias("v"),
        )
    if method == "two_phase":
        # node set BEFORE the self-loop filter: a (k, k)-only node is
        # still a (singleton) component and must get a label.
        # explode(array(u, v)) reads the caller's (possibly expensive)
        # pair pipeline ONCE; the union-of-two-projections form read
        # it twice (the multi_signal degree lesson, operators/dedup.py)
        nodes = (
            e.select(F.explode(F.array("u", "v")).alias("node"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        real = e.filter(F.col("u") != F.col("v")).distinct()
        return _two_phase_components(
            real.localCheckpoint(eager=True), nodes, max_iter
        )
    from .caching import pin

    # ledger-managed pin, not a raw persist: the edge table is re-read
    # every propagation round, but the blocks must be RELEASED when the
    # next registry query starts (a leaked persist distorts later
    # plans/timings — the r4 plan-gate sweep caught exactly this class)
    # symmetrize with a map-side struct explode — one read of the
    # caller's pair pipeline at pin-materialization time, not two
    e = pin(
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(
                        F.col("v").alias("u"), F.col("u").alias("v")
                    ),
                )
            ).alias("_p")
        )
        .select("_p.u", "_p.v")
        .distinct()
    )
    labels = e.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("comp")
    )
    labels = labels.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            e.join(labels, e.v == labels.node)
            .select(F.col("u").alias("node"), "comp")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        new_labels = neighbor_min.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    e.unpersist()
    if not converged:
        # labels from a non-converged propagation look valid but split
        # true components — fail loud (graph diameter > max_iter means
        # the caller should switch to method="two_phase")
        raise RuntimeError(
            f"min-label propagation did not converge within {max_iter} "
            f'rounds; diameter exceeds budget — use method="two_phase"'
        )
    return labels


def dedup_cluster_assignments(pairs: DataFrame) -> DataFrame:
    """Cluster every document appearing in a near-dup pair: output
    (doc_id, cluster_id, is_kept) where cluster_id is the minimum
    member id — the canonical survivor — and is_kept marks it."""
    comps = connected_components(pairs, src="doc_a", dst="doc_b")
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).alias("is_kept"),
    )


# ---------------------------------------------------------------------------
# PageRank (fixed-iteration, integer-exact)
# ---------------------------------------------------------------------------

PAGERANK_SCALE = 10**9


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list, computed in
    pure BIGINT arithmetic so every engine lands on identical scores.

    Scores live in ``PAGERANK_SCALE`` integer units; one step is

        s'(v) = (100-d)*SCALE DIV (100*N)  +  d * SUM_{u->v}(s(u) DIV out(u)) DIV 100

    — integer floor divisions and integer sums only, so the result is
    exact, order-independent, and reproducible in any SQL engine (the
    float formulation would accumulate engine-specific rounding in the
    per-node in-sums). The DIV flooring loses < 1 unit per edge/node —
    at SCALE=1e9 that is a 1e-9 perturbation of the rank vector,
    irrelevant to ordering in practice.

    Every node must have at least one out-edge (symmetric/undirected
    graphs satisfy this trivially); dangling nodes would need the
    standard redistribute term, deliberately out of scope.

    Scale design: each iteration is the minimal shuffle pair any
    distributed PageRank needs — join scores to edges on src, aggregate
    contributions on dst (both partial-aggregated); out-degrees are
    computed once and live on the score rows, so the iteration loop
    re-keys only (node, s). |V|+|E| rows per round, no driver state,
    fixed unrollable depth. Max magnitude: d * SUM contribs <=
    85 * SCALE * N — overflow-safe below ~1e8 nodes at SCALE=1e9;
    lower SCALE for larger graphs.

    The edge table is deliberately NOT pinned even though every
    iteration re-reads it: all consumers reach it through the same
    hashpartitioning(src) exchange, which ReuseExchange shares —
    an interleaved A/B at sf0.1 measured the pinned variant 3-5x
    SLOWER (12-25s vs ~5s; cache write + lost pipelining), the
    ledger-era persist rule again. For MANY-iteration runs (10+)
    switch to the connected-components recipe instead: materialize
    scores per round via localCheckpoint to truncate the plan, which
    grows linearly in iterations here (fine at 3).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
    nn = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))

    base_num = (100 - damping_pct) * PAGERANK_SCALE
    scores = (
        nodes.crossJoin(F.broadcast(nn))
        .select(
            F.col("src").alias("node"),
            "outdeg",
            F.expr(f"CAST({PAGERANK_SCALE} AS BIGINT) DIV n_nodes").alias("s"),
        )
    )
    for _ in range(int(iterations)):
        contribs = (
            e.join(
                scores.select("node", "outdeg", "s"),
                e.src == F.col("node"),
            )
            .select(F.col("dst"), F.expr("s DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        scores = (
            contribs.join(
                nodes, contribs.dst == nodes.src
            )
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("dst").alias("node"),
                "outdeg",
                F.expr(
                    f"CAST({base_num} AS BIGINT) DIV (100 * n_nodes)"
                    f" + ({damping_pct} * in_sum) DIV 100"
                ).alias("s"),
            )
        )
    return scores.select(
        "node",
        F.col("s").alias("score_units"),
        (F.col("s").cast("double") / F.lit(float(PAGERANK_SCALE))).alias(
            "score"
        ),
    )
