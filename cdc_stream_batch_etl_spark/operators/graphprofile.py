"""Co-purchase graph topology profile — degree distribution and degree
assortativity (Newman, PRL 2002; beyond-reference, SURVEY §2.11 graph
family next to copurchase_pagerank / copurchase_triangles /
dedup_components).

Recommender and sampling decisions read the graph's SHAPE before any
algorithm choice: a heavy-tailed degree histogram means hub parts will
dominate random walks (cap or downweight them — the pagerank module's
teleport rationale); assortativity tells whether hubs link to hubs
(r > 0, robust core) or to leaves (r < 0, hub-and-spoke — removing one
hub shatters neighborhoods, and LSH-style bucketing of baskets will
concentrate). Two tables over the supported co-purchase edge set
(MIN_SUPPORT ≥ 2, the basket_rules contract):

  - copurchase_degree_histogram: (degree, n_parts) — the distribution;
  - copurchase_graph_profile: one row — nodes, edges, avg/max degree,
    density, and degree assortativity (Pearson r of endpoint degrees
    over the directed edge list, i.e. each undirected edge in both
    orientations — the standard symmetric estimator).

Determinism: degrees and counts are exact integers; assortativity's
five sufficient statistics accumulate in decimal(38,0) and the single
double read-out chain is the identical literal expression in both
engines (the four_step/burstiness playbook); zero variance → NULL via
the same CASE both sides.

Scale: the pair table is basket.py's scan-local array-pair plan (no
self-join); degrees are one hash agg over edges; the profile joins the
edge list to the node-degree frame on part keys (hash join, both sides
edge/node-sized — never the fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .basket import MIN_SUPPORT, _baskets, _pairs_from

_EDGES_CTE = f"""
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SUPPORT}
),
directed AS (
  SELECT part_a AS u, part_b AS v FROM edges
  UNION ALL SELECT part_b, part_a FROM edges
),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS degree FROM directed GROUP BY u)
"""

_HIST_ORACLE = f"""
WITH {_EDGES_CTE}
SELECT degree, CAST(count(*) AS BIGINT) AS n_parts
FROM deg GROUP BY degree ORDER BY degree
"""


@register("copurchase_degree_histogram", oracle=_HIST_ORACLE)
def copurchase_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(degree, n_parts) over the supported co-purchase graph."""
    deg = _degrees(_edges(spark, sf_dir))
    return (
        deg.groupBy("degree")
        .agg(F.count("*").cast("bigint").alias("n_parts"))
        .orderBy("degree")
    )


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supported edge set, PERSISTED: the pair table is output-bounded
    (far smaller than the fact table) and every downstream consumer —
    both degree references, the directed edge list, the node meta —
    would otherwise re-run the basket scan+shuffle per reference (8
    lineitem scans in the unpersisted profile plan). Caller-must-clear
    contract as elsewhere (vocab.py; runner.run_query / bench / driver
    clearCache between queries)."""
    return _pairs_from(_baskets(spark, sf_dir)).select("part_a", "part_b").persist()


def _directed(edges: DataFrame) -> DataFrame:
    """Both orientations of every undirected edge — the single home of
    the orientation logic (degrees and the sides table must agree)."""
    return edges.union(
        edges.select(F.col("part_b").alias("part_a"), F.col("part_a").alias("part_b"))
    )


def _degrees(edges: DataFrame) -> DataFrame:
    return _directed(edges).groupBy(F.col("part_a").alias("node")).agg(
        F.count("*").cast("bigint").alias("degree")
    )


_PROFILE_ORACLE = f"""
WITH {_EDGES_CTE},
sides AS (
  SELECT d.u, d.v, du.degree AS dj, dv.degree AS dk
  FROM directed d
  JOIN deg du ON du.node = d.u
  JOIN deg dv ON dv.node = d.v
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS m2,
         CAST(sum(CAST(dj AS DECIMAL(38,0)) * dk) AS DECIMAL(38,0)) AS s_jk,
         CAST(sum(CAST(dj AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_j,
         CAST(sum(CAST(dj AS DECIMAL(38,0)) * dj) AS DECIMAL(38,0)) AS s_jj
  FROM sides
),
meta AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(max(degree) AS BIGINT) AS max_degree,
         CAST(sum(CAST(degree AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tot_deg
  FROM deg
)
SELECT m.n_nodes,
       CAST(s.m2 / 2 AS BIGINT) AS n_edges,
       CAST(m.tot_deg AS DOUBLE) / m.n_nodes AS avg_degree,
       m.max_degree,
       CAST(s.m2 / 2 AS DOUBLE)
         / (CAST(m.n_nodes AS DOUBLE) * (m.n_nodes - 1) / 2.0e0) AS density,
       CASE WHEN CAST(s_jj AS DOUBLE) / m2
                 - (CAST(s_j AS DOUBLE) / m2) * (CAST(s_j AS DOUBLE) / m2) = 0.0e0
            THEN NULL
            ELSE (CAST(s_jk AS DOUBLE) / m2
                  - (CAST(s_j AS DOUBLE) / m2) * (CAST(s_j AS DOUBLE) / m2))
                 / (CAST(s_jj AS DOUBLE) / m2
                    - (CAST(s_j AS DOUBLE) / m2) * (CAST(s_j AS DOUBLE) / m2))
       END AS assortativity
FROM sums s CROSS JOIN meta m
"""


@register("copurchase_graph_profile", oracle=_PROFILE_ORACLE)
def copurchase_graph_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: nodes, edges, avg/max degree, density, and Newman
    degree assortativity of the supported co-purchase graph."""
    edges = _edges(spark, sf_dir)
    directed = _directed(edges).select(
        F.col("part_a").alias("u"), F.col("part_b").alias("v")
    )
    # persist: deg feeds both sides-join legs and meta (3 consumers)
    deg = _degrees(edges).persist()
    sides = (
        directed.join(
            deg.select(F.col("node").alias("u"), F.col("degree").alias("dj")), "u"
        )
        .join(deg.select(F.col("node").alias("v"), F.col("degree").alias("dk")), "v")
    )
    djd = F.col("dj").cast("decimal(38,0)")
    sums = sides.agg(
        F.count("*").cast("bigint").alias("m2"),
        F.sum(djd * F.col("dk")).cast("decimal(38,0)").alias("s_jk"),
        F.sum(djd).cast("decimal(38,0)").alias("s_j"),
        F.sum(djd * F.col("dj")).cast("decimal(38,0)").alias("s_jj"),
    )
    meta = deg.agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.max("degree").cast("bigint").alias("max_degree"),
        F.sum(F.col("degree").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("tot_deg"),
    )
    mean_j = F.col("s_j").cast("double") / F.col("m2")
    var_j = F.col("s_jj").cast("double") / F.col("m2") - mean_j * mean_j
    cov = F.col("s_jk").cast("double") / F.col("m2") - mean_j * mean_j
    return sums.crossJoin(F.broadcast(meta)).select(
        "n_nodes",
        F.expr("m2 div 2").cast("bigint").alias("n_edges"),
        (F.col("tot_deg").cast("double") / F.col("n_nodes")).alias("avg_degree"),
        "max_degree",
        (
            F.expr("cast(m2 div 2 as double)")
            / (F.col("n_nodes").cast("double") * (F.col("n_nodes") - 1) / 2.0)
        ).alias("density"),
        F.when(var_j == 0.0, F.lit(None).cast("double"))
        .otherwise(cov / var_j)
        .alias("assortativity"),
    )
