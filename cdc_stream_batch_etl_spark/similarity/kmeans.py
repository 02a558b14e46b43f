"""One deterministic Lloyd iteration over the embeddings table — the
k-means refinement step that upgrades IVF's stride-sampled coarse
quantizer (similarity/ivf.py) toward data-adapted centroids.

Beyond-reference operator, second member of the iterative-algorithm
class (with dedup/components.py): a production pipeline runs
assign→recompute a handful of times; ONE iteration is registered because
each iteration is the same plan and one is fully DuckDB-oracle-able
(k-means to convergence is data-dependently iterative; a fixed iteration
is a pure function of the input).

Determinism rules (shared with ivf.py / centroids.py):
- init centroids: deterministic reservoir with a CONSTANT-K stride
  (vec_id % max(32, ceil(N/256)) == 0, linalg.fixed_k_centroids) — a
  production k-means picks K from the problem, not the corpus size, so
  at scale the STRIDE grows with N and K stays capped; at fixture SFs
  the floor makes it the historical stride-32 reservoir;
- assignment: argmin squared-L2, computed as dot(v,v) - 2*dot(v,c) +
  dot(c,c) with the SAME left-fold dot both engines, ties to smaller
  centroid id via struct min;
- recomputation: per-(cell, pos) sorted-fold mean (bit-reproducible, see
  centroids.py for why plain avg() is not).

Scale shape: centroids broadcast (~sqrt(N) rows) onto one corpus scan;
assignment is a per-row argmin under whole-stage codegen (no shuffle);
the only exchange is the groupBy(cell, pos) recompute. Per iteration
that is one shuffle of (cell, pos, val) scalars — long-form, so a wider
embedding is more rows, never a wider task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.parallelism import fan_out
from ..registry import register
from .ann import _dot
from .linalg import fixed_k_centroids, fixed_k_stride_sql

_DOT = "list_dot_product({a}, {b})"

_KMEANS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), cent AS (
  SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id % {fixed_k_stride_sql("e")} = 0
), assign AS (
  SELECT vec_id, emb,
         (min(struct_pack(
            d2 := {_DOT.format(a="emb", b="emb")}
                  - 2 * {_DOT.format(a="emb", b="cemb")}
                  + {_DOT.format(a="cemb", b="cemb")},
            cid := cid))).cid AS cell
  FROM e CROSS JOIN cent
  GROUP BY vec_id, emb
), comp AS (
  SELECT cell, i AS pos, emb[i] AS val
  FROM assign, (SELECT unnest(generate_series(1, 64)) AS i) u
)
SELECT cell, pos,
       list_reduce(list_sort(list(val)), (a, b) -> a + b) / count(*)
         AS centroid_val,
       count(*) AS n_members
FROM comp
GROUP BY cell, pos
"""


@register("kmeans_refine", oracle=_KMEANS_ORACLE)
def kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    # self-dots are per-vector constants: hoist them out of the N x K
    # pair loop (one interpreted fold per pair instead of three — the
    # fold on identical arrays yields identical doubles, and the
    # ((nv - 2*dot) + nc) association order is unchanged); fan_out
    # widens the single-row-group scan so the argmin runs cluster-wide
    cent = fixed_k_centroids(e).withColumn("nc", _dot("cemb", "cemb"))
    ef = fan_out(e).withColumn("nv", _dot("emb", "emb"))
    d2 = F.col("nv") - 2 * _dot("emb", "cemb") + F.col("nc")
    assign = (
        ef.crossJoin(F.broadcast(cent))
        .groupBy("vec_id", "emb")
        .agg(F.min(F.struct(d2.alias("d2"), F.col("cid"))).alias("best"))
        .select("vec_id", "emb", F.col("best.cid").alias("cell"))
    )
    comp = assign.select(
        "cell", F.posexplode("emb").alias("pos0", "val")
    ).select("cell", (F.col("pos0") + 1).alias("pos"), "val")
    folded = F.aggregate(
        F.sort_array(F.collect_list("val")), F.lit(0.0), lambda acc, x: acc + x
    )
    return comp.groupBy("cell", "pos").agg(
        (folded / F.count("*")).alias("centroid_val"),
        F.count("*").alias("n_members"),
    )
