"""Graph-analytics registry queries (round 5): fixed-iteration
PageRank over the part co-purchase graph.

Complements the connected-components operator (`operators/graph.py`,
driver-checked as ``dedup_clusters``): components answer "which docs
are the same", PageRank answers "which nodes are central" — the
standard retail basket-affinity / catalog-centrality view built on
the same co-occurrence edges ``basket_pair_lift`` mines.

The Spark side generates edges MAP-SIDE from the per-order sorted
item arrays (the basket_pair_lift explode — linear in orders); the
oracle derives the same edge set through a lineitem self-join —
an independent algorithm agreeing on the result, like the asof-join
twin. Scores are pure BIGINT arithmetic (operators/graph.pagerank),
so three unrolled CTE iterations reproduce Spark's values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import PAGERANK_SCALE, pagerank
from ..sources.testdata import load_table
from .queries import query_fn

_PR_ITERS = 3
_DAMP = 85
_BASE_NUM = (100 - _DAMP) * PAGERANK_SCALE


def _o_iteration(prev: str, out: str) -> str:
    """One unrolled PageRank step (DuckDB), mirroring the integer ops
    of operators/graph.pagerank exactly."""
    return f"""
{out} AS (
  SELECT e.dst AS node, nd2.outdeg,
         CAST(CAST({_BASE_NUM} AS BIGINT) // (100 * nn.n)
              + ({_DAMP} * SUM(s.s // s.outdeg)) // 100 AS BIGINT) AS s
  FROM ed e
  JOIN {prev} s ON s.node = e.src
  JOIN nodes nd2 ON nd2.src = e.dst
  CROSS JOIN nn
  GROUP BY e.dst, nd2.outdeg, nn.n
)"""


@query_fn(
    "graph_pagerank",
    oracle=f"""
WITH ed AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
),
nodes AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM ed GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
s0 AS (
  SELECT src AS node, outdeg,
         CAST({PAGERANK_SCALE} AS BIGINT) // n AS s
  FROM nodes CROSS JOIN nn
),{_o_iteration("s0", "it1")},{_o_iteration("it1", "it2")},{_o_iteration("it2", "it3")}
SELECT node, s AS score_units, CAST(s AS DOUBLE) / 1e9 AS score
FROM it3
ORDER BY score_units DESC, node
""",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration damping-0.85 PageRank over the part co-purchase
    graph, in pure BIGINT arithmetic (integer floor divisions and
    exact integer sums — no float accumulation to drift cross-engine).
    Edges come from the map-side basket pair explode: unordered pairs
    dedup on one narrow shuffle, then fan to both directions in a
    map-side explode (never a self-union)."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("arr")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("arr"),
            lambda x, i: F.transform(
                F.slice(F.col("arr"), i + 2, F.size(F.col("arr"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    und = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .select("p.a", "p.b")
        .distinct()
    )
    edges = und.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return pagerank(edges, iterations=_PR_ITERS, damping_pct=_DAMP).orderBy(
        F.desc("score_units"), "node"
    )
