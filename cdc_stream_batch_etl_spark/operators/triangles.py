"""Triangle counting on the co-purchase graph — beyond-reference.

copurchase_pagerank measures global centrality and dedup_components
connectivity; triangles measure local COHESION — a part whose
co-purchase neighborhood closes into triangles anchors a real product
cluster, while a star hub with no closures is a cross-sell artifact.
(Clustering-coefficient features are a standard graph-quality signal in
recommendation and fraud pipelines.)

Algorithm — the degree-ordered orientation (the standard distributed
triangle count, cf. Suri & Vassilvitskii "Counting Triangles and the
Curse of the Last Reducer", WWW'11): orient each undirected edge from
its lower-(degree, id) endpoint to the higher one, then every triangle
{u,v,w} appears EXACTLY once as the wedge u→v, u→w with the closing
edge v→w — two self-joins of the oriented edge list. Orientation is
what makes this scale: out-degree under the (deg, id) order is bounded
by O(√m) for any graph, so the wedge join's fan-out per key is
√m-bounded even on a power-law graph where a raw two-hop join would
square the celebrity hub (the "last reducer" of the paper's title).

Determinism (full DuckDB oracle): pure integer joins and counts over
the same support-filtered pair table as the pagerank/basket family —
bit-exact by construction, no floats anywhere.

Scale: edges come from basket mining (one orderkey shuffle, scan-local
pair expansion — basket.py's plan); degrees are one hash-agg; the
wedge join shuffles the oriented edge list on its source key (uniform
after orientation, per the √m bound) and the closure join on the
(v, w) pair key. Output is |nodes|-sized. ``pairs`` and ``oriented``
are persist()ed — the pair table is referenced three ways (degrees,
orientation, both wedge sides + closure), and without the cache the
plan re-derives the basket mining per reference (measured: 45 scans /
133 exchanges plan-level → 2 scans + 2 cached subtrees). Same
caller-must-clear contract as copurchase_pagerank/tpch5:
``spark.catalog.clearCache()`` after consuming (bench.py and the
tests do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.materialize import materialize
from ..registry import register
from .basket import MIN_SUPPORT, _baskets, _pairs_from
from .pagerank import _PAIRS_SQL

_TRIANGLE_ORACLE = f"""
WITH pairs AS MATERIALIZED ({_PAIRS_SQL}),
deg AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT part_a AS node FROM pairs
    UNION ALL
    SELECT part_b AS node FROM pairs
  ) GROUP BY node
),
oriented AS MATERIALIZED (
  SELECT CASE WHEN (da.deg, p.part_a) < (db.deg, p.part_b)
              THEN p.part_a ELSE p.part_b END AS src,
         CASE WHEN (da.deg, p.part_a) < (db.deg, p.part_b)
              THEN p.part_b ELSE p.part_a END AS dst,
         CASE WHEN (da.deg, p.part_a) < (db.deg, p.part_b)
              THEN db.deg ELSE da.deg END AS dst_deg
  FROM pairs p
  JOIN deg da ON da.node = p.part_a
  JOIN deg db ON db.node = p.part_b
),
tri AS MATERIALIZED (
  -- wedge endpoints ordered by RANK (deg, id), not by id: the closing
  -- edge is rank-oriented, so an id-ordered wedge whose higher-id leg
  -- has the LOWER rank would look for the closure in the direction the
  -- orientation never stores and silently drop the triangle (the r12
  -- brute-force audit found 33 of 61 sf0.01 triangles missing)
  SELECT w1.src AS u, w1.dst AS v, w2.dst AS w
  FROM oriented w1
  JOIN oriented w2 ON w2.src = w1.src
   AND (w1.dst_deg, w1.dst) < (w2.dst_deg, w2.dst)
  JOIN oriented e ON e.src = w1.dst AND e.dst = w2.dst
),
members AS (
  SELECT u AS part_key FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
)
SELECT part_key, CAST(count(*) AS BIGINT) AS n_triangles
FROM members GROUP BY part_key
"""


@register("copurchase_triangles", oracle=_TRIANGLE_ORACLE)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation count in the (support ≥
    {MIN_SUPPORT}) co-purchase graph, via degree-ordered wedge closure
    (module docstring)."""
    pairs = _pairs_from(_baskets(spark, sf_dir)).select("part_a", "part_b").persist()
    deg = (
        pairs.select(F.col("part_a").alias("node"))
        .unionAll(pairs.select(F.col("part_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        # both orientation legs (da, db) consume deg — compute it once
        .transform(lambda df: materialize(df, eager=False))
    )
    da = deg.select(F.col("node").alias("part_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("part_b"), F.col("deg").alias("deg_b"))
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("part_a") < F.col("part_b"))
    )
    oriented = (
        pairs.join(da, "part_a")
        .join(db, "part_b")
        .select(
            F.when(a_first, F.col("part_a")).otherwise(F.col("part_b")).alias("src"),
            F.when(a_first, F.col("part_b")).otherwise(F.col("part_a")).alias("dst"),
            F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("dst_deg"),
        )
        .persist()
    )
    w1 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("dst_deg").alias("dv")
    )
    w2 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("w"), F.col("dst_deg").alias("dw")
    )
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = (
        w1.join(w2, "u")
        # each wedge once, ordered by RANK (deg, id) — the closing edge
        # is rank-oriented, so an id-ordered wedge can face the wrong
        # direction and drop the triangle (r12 brute-force audit)
        .filter(
            (F.col("dv") < F.col("dw"))
            | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
        )
        .join(closing, ["v", "w"])  # closure edge exists → triangle
        # lineage break (r12): the 3-leg member union below consumes tri
        # once per leg — without this the wedge join itself ran 3x
        .transform(lambda df: materialize(df, eager=False))
    )
    members = (
        tri.select(F.col("u").alias("part_key"))
        .unionAll(tri.select(F.col("v").alias("part_key")))
        .unionAll(tri.select(F.col("w").alias("part_key")))
    )
    return members.groupBy("part_key").agg(F.count("*").alias("n_triangles"))
