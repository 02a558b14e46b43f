"""Simplified silhouette over the semantic-dedup cells — cluster-quality
QA for the coarse quantizer every embedding-side operator shares
(beyond-reference, SURVEY §2.11 embedding-QA family: semantic_dedup /
ann_ivf_topk / semantic_dedup_imi all hang their 100 TB story on the
stride-sampled cells being REAL clusters; this operator measures that
claim — the standard simplified silhouette (Rousseeuw 1987, centroid
form) per cell, so a collapsing or overlapping cell shows up as a low
or negative score instead of silently degrading dedup recall).

Semantics: cells and assignment are EXACTLY dedup/semantic.py's —
adaptive-stride centroid reservoir (similarity/linalg.py), assignment
by argmax dot with ties to the larger cid. Distances are cosine:
a(i) = 1 - cos(x_i, own centroid); b(i) = 1 - max cos over the OTHER
centroids; s(i) = (b - a) / max(a, b) (0 when both distances are 0).
Per cell: member count, scored count, mean/min/max s, and the count of
NEGATIVE s (members closer to a foreign centroid than their own — the
misassignment signal).

Exactness: dots are index-ordered folds (linalg.dot ==
list_dot_product); the argmax is re-expressed as row_number over
(d DESC, cid DESC) — identical to the struct-max convention including
tie direction; a, b, s are fixed IEEE chains on identical inputs; the
per-cell mean uses the sorted-fold idiom (centroids.py). min/max/count
are reorder-safe. b is NULL when only one centroid exists (degenerate
fixture); such rows are excluded from scoring but counted as members.

Scale: the N x K assignment scan is the SAME shape semantic_dedup
already pays (K ∝ √N, broadcast centroids, one vec-keyed agg); the
silhouette adds only per-row arithmetic to it and a cell-keyed agg on
K cells. The sorted-fold mean is the oracle-gate trade documented in
similarity/diversity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.parallelism import fan_out
from ..registry import register
from .linalg import adaptive_stride_sql, centroids
from .linalg import dot as _dot

_DOT = "list_dot_product({a}, {b})"

_SIL_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), cent AS (
  SELECT vec_id AS cid, emb AS cemb FROM e
  WHERE vec_id % {adaptive_stride_sql("e")} = 0
), scored AS (
  SELECT e.vec_id, cent.cid,
         {_DOT.format(a="e.emb", b="cent.cemb")} AS d,
         {_DOT.format(a="e.emb", b="cent.cemb")}
           / (sqrt({_DOT.format(a="e.emb", b="e.emb")})
              * sqrt({_DOT.format(a="cent.cemb", b="cent.cemb")})) AS cos
  FROM e CROSS JOIN cent
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid DESC)
           AS rn
  FROM scored
), per_vec AS (
  SELECT vec_id,
         max(CASE WHEN rn = 1 THEN cid END) AS cell,
         max(CASE WHEN rn = 1 THEN cos END) AS cos_own,
         max(CASE WHEN rn > 1 THEN cos END) AS cos_other
  FROM ranked GROUP BY vec_id
), sil AS (
  SELECT vec_id, cell,
         1 - cos_own AS a_dist,
         1 - cos_other AS b_dist,
         CASE WHEN cos_other IS NULL THEN NULL
              WHEN greatest(1 - cos_own, 1 - cos_other) > 0
              THEN ((1 - cos_other) - (1 - cos_own))
                   / greatest(1 - cos_own, 1 - cos_other)
              ELSE 0.0 END AS s
  FROM per_vec
)
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(count(s) AS BIGINT) AS n_scored,
       CASE WHEN count(s) > 0
            THEN list_reduce(list_sort(list(s) FILTER (s IS NOT NULL)),
                             (x, y) -> x + y) / count(s) END AS mean_s,
       min(s) AS min_s,
       max(s) AS max_s,
       CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative
FROM sil
GROUP BY cell
ORDER BY cell
"""


@register("semantic_silhouette", oracle=_SIL_ORACLE)
def semantic_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell simplified silhouette of the semantic-dedup coarse
    quantizer — mean/min/max score and the misassignment count."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    # self-dot norms are per-vector/per-centroid constants: hoist them
    # out of the N x K pair loop (one interpreted fold per pair instead
    # of three — the fold on identical arrays yields identical doubles,
    # and sqrt(nv) * sqrt(nc) is the same IEEE chain); fan_out widens
    # the single-row-group scan so the assignment runs cluster-wide
    cent = centroids(e).withColumn("snc", F.sqrt(_dot("cemb", "cemb")))
    ef = fan_out(e).withColumn("snv", F.sqrt(_dot("emb", "emb")))
    scored = (
        ef.crossJoin(F.broadcast(cent))
        .withColumn("d", _dot("emb", "cemb"))
        .withColumn("cos", F.col("d") / (F.col("snv") * F.col("snc")))
        .select("vec_id", "cid", "d", "cos")
    )
    rn = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(F.desc("d"), F.desc("cid"))
    )
    ranked = scored.withColumn("rn", rn)
    per_vec = ranked.groupBy("vec_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cid"))).alias("cell"),
        F.max(F.when(F.col("rn") == 1, F.col("cos"))).alias("cos_own"),
        F.max(F.when(F.col("rn") > 1, F.col("cos"))).alias("cos_other"),
    )
    a_dist = F.lit(1) - F.col("cos_own")
    b_dist = F.lit(1) - F.col("cos_other")
    sil = per_vec.select(
        "vec_id",
        "cell",
        F.when(F.col("cos_other").isNull(), F.lit(None).cast("double"))
        .when(
            F.greatest(a_dist, b_dist) > 0,
            (b_dist - a_dist) / F.greatest(a_dist, b_dist),
        )
        .otherwise(0.0)
        .alias("s"),
    )
    return (
        sil.groupBy(F.col("cell").cast("bigint").alias("cell"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.count("s").cast("bigint").alias("n_scored"),
            F.when(
                F.count("s") > 0,
                F.aggregate(
                    F.sort_array(F.collect_list("s")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.count("s"),
            ).alias("mean_s"),
            F.min("s").alias("min_s"),
            F.max("s").alias("max_s"),
            F.sum(F.when(F.col("s") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
        )
        .orderBy("cell")
    )
