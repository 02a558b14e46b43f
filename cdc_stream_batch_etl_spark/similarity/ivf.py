"""IVF-style approximate nearest neighbor over the embeddings table.

Classic inverted-file search (IVF-Flat): a coarse quantizer partitions the
corpus into cells; a query only scans the cells of its nprobe nearest
centroids. Complements the hyperplane-LSH path in ann.py — IVF adapts to
the data distribution (centroids live where vectors are), LSH is
data-independent.

Determinism (and hence a full DuckDB oracle, unlike typical ANN):
- centroids are the vectors with vec_id % stride == 0, where stride is
  ADAPTIVE: max(CENTROID_STRIDE, ceil(√N)) — K ∝ √N centroids, the
  classic IVF sizing that balances assignment (N·K = N^1.5) against
  per-cell scan cost (N/K rows per cell). A constant stride makes K ∝ N
  and assignment quadratic WORK — the ×8 scaling probe caught exactly
  that on semantic_dedup (SCALING.md) before both were switched. The
  deterministic reservoir stands in for k-means (which would converge
  data-dependently; the *search* structure is identical);
- cell assignment = argmax dot(v, centroid), ties to the larger centroid
  id via lexicographic struct max — same rule both engines;
- probe list = top NPROBE centroids by dot, ties to smaller centroid id.

Scale shape: assignment is a broadcast of ~√N centroids against one
corpus scan + a vec_id-keyed argmax (one shuffle); the probe join fans
each query to NPROBE cells (cell-keyed shuffle), and exact re-ranking
touches ~NPROBE/K of the corpus — the 100 TB path where brute force
(ann_cosine_topk) is the per-cell verifier, not the global plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .ann import N_QUERIES, TOP_K, _dot

# shared, registration-free helpers live in linalg.py; re-exported here
# because pq/kmeans/tests historically import them from this module
from .linalg import CENTROID_STRIDE, adaptive_stride_sql, centroids  # noqa: F401

NPROBE = 4

_DOT = "list_dot_product({a}, {b})"


def _cos_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


_IVF_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), cent AS (
  SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id % {adaptive_stride_sql("e")} = 0
), assign AS (
  SELECT vec_id, label, emb,
         (max(struct_pack(d := {_DOT.format(a="emb", b="cemb")}, cid := cid))).cid AS cell
  FROM e CROSS JOIN cent
  GROUP BY vec_id, label, emb
), q AS (
  SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < {N_QUERIES}
), probes AS (
  SELECT query_id, qe, cid AS cell
  FROM (
    SELECT query_id, qe, cid,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY {_DOT.format(a="qe", b="cemb")} DESC, cid ASC) AS pr
    FROM q CROSS JOIN cent
  ) WHERE pr <= {NPROBE}
), cand AS (
  SELECT p.query_id, p.qe, a.vec_id AS neighbor_id, a.label, a.emb
  FROM probes p JOIN assign a ON p.cell = a.cell
  WHERE p.query_id <> a.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, label,
         {_cos_sql("qe", "emb")} AS cos_sim,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY {_cos_sql("qe", "emb")} DESC, neighbor_id ASC) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, label, CAST(rank AS BIGINT) AS rank,
       round(cos_sim, 6) AS cos_sim_r
FROM ranked WHERE rank <= {TOP_K}
"""


@register("ann_ivf_topk", oracle=_IVF_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    ).withColumn("nrm", F.sqrt(_dot("emb", "emb")))
    cent = centroids(e.select("vec_id", "emb"))

    # cell assignment: broadcast the ~√N centroids, one corpus scan,
    # argmax via lexicographic struct max (ties → larger cid, both engines)
    assign = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("d", _dot("emb", "cemb"))
        .groupBy("vec_id", "label", "emb", "nrm")
        .agg(F.max(F.struct(F.col("d"), F.col("cid"))).alias("top"))
        .select("vec_id", "label", "emb", "nrm", F.col("top.cid").alias("cell"))
    )

    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc(F.col("d")), F.asc(F.col("cid"))
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("d", _dot("qe", "cemb"))
        .withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= NPROBE)
        .select("query_id", "qe", "qnrm", F.col("cid").alias("cell"))
    )

    cand = probes.join(assign, "cell").filter(F.col("query_id") != F.col("vec_id"))
    sims = cand.withColumn("cos_sim", _dot("qe", "emb") / (F.col("qnrm") * F.col("nrm")))
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim_r"),
        )
    )
