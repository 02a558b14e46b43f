"""PageRank over the co-purchase graph — iterative propagation, exact.

dedup_components demonstrates iterate-to-FIXPOINT (data-dependent
rounds); this demonstrates the other iterative class: a FIXED number of
synchronous propagation rounds (PageRank/label-spreading/belief-prop),
each round one join + one aggregate over the edge list. Product rank on
the co-purchase graph is the classic "centrality as importance" signal
(which parts anchor the catalog's co-purchase structure).

Deterministic re-expression (full DuckDB oracle — unusual for PageRank,
whose float mass sums are parallel-order-dependent): ranks live in
SCALED INTEGERS (SCALE = 1e12). Each round:

    r'(v) = (1-d)·SCALE + d · Σ_{{u→v}} (r(u) DIV deg(u))

with d = 0.85 spelled as ·17 DIV 20 — every operation is bigint
arithmetic, so partial-aggregation order cannot perturb a single bit,
and floor-division truncation loses < deg·1e-12 of mass per node per
round (quantified, not hand-waved). Three rounds, unrolled identically
in both engines.

Scale: the edge list is the (support-filtered) copurchase pair table
doubled for symmetry; each round shuffles contributions on the
destination key — uniform part keys, map-side partial sums, K rounds =
K shuffles. edges/degs/nodes are persist()ed so the pair-mining
self-join runs ONCE, not once per round (~20 scans → ~8 at K=3, and
safe if K grows); like the tpch5 scalar-subquery queries, the caller
owns cache release — ``spark.catalog.clearCache()`` after consuming
the result (bench.py and the tests do; the cached frames are
support-filtered pair tables, orders of magnitude smaller than the
fact table). The 100 TB version checkpoints every few rounds
(components.py precedent) — with K fixed at 3 the lineage is shallow
enough not to need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .basket import MIN_SUPPORT

SCALE = 1_000_000_000_000  # 1e12 — integer rank units
N_ITER = 3
# damping 0.85 as exact integer ops: contributed mass ·17 DIV 20
_BASE = SCALE * 3 // 20  # (1 - 0.85) · SCALE

_EDGES_SQL = """
  SELECT part_a AS src, part_b AS dst FROM pairs
  UNION ALL
  SELECT part_b AS src, part_a AS dst FROM pairs
"""

_PAIRS_SQL = f"""
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SUPPORT}
"""


def _iter_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT n.node,
         {_BASE} + (COALESCE(SUM(p.rank // d.deg), 0) * 17) // 20 AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN {prev} p ON p.node = e.src
  LEFT JOIN degs d ON d.node = e.src
  GROUP BY n.node
)"""


_PAGERANK_ORACLE = f"""
WITH pairs AS ({_PAIRS_SQL}),
edges AS ({_EDGES_SQL}),
nodes AS (SELECT DISTINCT src AS node FROM edges),
degs AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
r0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS rank FROM nodes),
{_iter_sql("r0", "r1")},
{_iter_sql("r1", "r2")},
{_iter_sql("r2", "r3")}
SELECT node AS part_key, CAST(rank AS BIGINT) AS rank_scaled
FROM r3
"""


@register("copurchase_pagerank", oracle=_PAGERANK_ORACLE)
def copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each co-purchased part's integer-scaled PageRank after N_ITER
    synchronous rounds over the symmetric co-purchase edge list."""
    from .basket import _baskets, _pairs_from

    pairs = _pairs_from(_baskets(spark, sf_dir)).select("part_a", "part_b")
    # persist the (small, support-filtered) graph frames: every round's
    # lineage would otherwise re-run the basket self-join — caller
    # releases via clearCache (module docstring)
    edges = pairs.selectExpr("part_a AS src", "part_b AS dst").unionAll(
        pairs.selectExpr("part_b AS src", "part_a AS dst")
    ).persist()
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    degs = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("deg"))
        .persist()
    )

    rank = nodes.withColumn("rank", F.lit(SCALE).cast("bigint"))
    for _ in range(N_ITER):
        # r12 optimization (guide §2.4/§2.3): the per-source contribution
        # ``rank div deg`` depends only on src, so compute it ONCE per node
        # on the node-sized frame (`div` = exact integral division on
        # bigints; a double `/` + cast would silently lose bits once mass
        # crosses 2^53) and attach it to edges with a single edge-sized
        # join — the old shape joined the edge list twice (rank, then
        # degs). The nodes-LEFT-join that re-attached silent nodes was
        # vacuous on this graph and is gone: edges are symmetric, so every
        # node in `nodes` (distinct src) is also some edge's dst and
        # receives ≥1 contribution — mass is never NULL and the inner
        # groupBy covers exactly the node set (same rows, bit-identical
        # integer arithmetic; oracle unchanged).
        per_src = rank.join(degs, "node").select(
            F.col("node").alias("src"), F.expr("rank div deg").alias("c")
        )
        rank = (
            edges.join(per_src, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("mass"))
            .select(
                "node",
                (F.lit(_BASE) + F.expr("(mass * 17L) div 20L")).alias("rank"),
            )
        )
    return rank.select(
        F.col("node").alias("part_key"), F.col("rank").cast("bigint").alias("rank_scaled")
    )
