"""Local Outlier Factor over the embedding corpus (beyond-reference,
SURVEY §2.11 embedding-QA family next to embedding_outliers: the
centroid-distance outlier score misses points that are far from
NOTHING globally but stranded locally — LOF (Breunig et al., SIGMOD
2000) scores each point by the ratio of its neighbors' local
reachability density to its own, catching exactly the
locally-stranded embeddings a centroid test declares normal).

Semantics: LOF with k = {K} over euclidean distance, on a
CONTENT-ADDRESSED fixed-size sample — the {SAMPLE} vectors with the
smallest md5(vec_id) (ties impossible: md5 of distinct ids). LOF is a
QA diagnostic, not a per-row transform: a fixed-size deterministic
sample makes its cost CONSTANT at any SF (the 100 TB posture), its
result rerun- and partition-stable, and its oracle exact. Output: the
{TOP} most anomalous sampled points by (lof desc, vec_id).

    kNN(a)   = the k nearest by (d2r, vec_id) — d2r is the squared
               distance ROUNDED to 9 decimals, so both engines pick
               identical neighbor sets even where their FP summation
               orders differ in the last ulp
    kdist(a) = max distance within kNN(a)
    reach(a,b) = max(kdist(b), d(a,b))
    lrd(a)   = k / sum_{{b in kNN(a)}} reach(a,b)
    lof(a)   = mean_{{b in kNN(a)}} lrd(b) / lrd(a)

Exactness: the only FP-order-sensitive reductions (the reach and lrd
sums over k neighbors) fold in explicit neighbor-rank order (the
centroids idiom); distances are IEEE sqrt of the 9-rounded squared
distance; exports round to 9 decimals (tfidf convention).

Scale: sampling is a size-{SAMPLE} TakeOrdered by hash (per-partition
top-k then merge — no global sort); the pair stage is SAMPLE^2 =
constant; the full-corpus alternative would be the IVF-bucketed kNN
(similarity/ivf.py's cell-probe candidates), which this sample-based
diagnostic is the exact yardstick for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

K = 10
SAMPLE = 256
TOP = 20

_LOF_ORACLE = f"""
WITH samp AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {SAMPLE}
),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         round(list_dot_product(a.e, a.e)
               - 2 * list_dot_product(a.e, b.e)
               + list_dot_product(b.e, b.e), 9) AS d2r
  FROM samp a JOIN samp b ON a.vec_id <> b.vec_id
),
knn AS (
  SELECT ia, ib, sqrt(d2r) AS d,
         row_number() OVER (PARTITION BY ia ORDER BY d2r, ib) AS rn
  FROM pairs
  QUALIFY rn <= {K}
),
kd AS (
  SELECT ia, max(d) AS kdist FROM knn GROUP BY ia
),
reach AS (
  SELECT k.ia, k.ib, k.rn,
         CASE WHEN kb.kdist > k.d THEN kb.kdist ELSE k.d END AS r
  FROM knn k JOIN kd kb ON k.ib = kb.ia
),
lrd AS (
  SELECT ia,
         {K} / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(r ORDER BY rn)), (x, y) -> x + y) AS lrd
  FROM reach GROUP BY ia
),
lof AS (
  SELECT k.ia,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(lb.lrd ORDER BY k.rn)), (x, y) -> x + y)
           / ({K} * la.lrd) AS lof
  FROM knn k
  JOIN lrd lb ON k.ib = lb.ia
  JOIN lrd la ON k.ia = la.ia
  GROUP BY k.ia, la.lrd
)
SELECT s.vec_id, s.label,
       round(kd.kdist, 9) AS kdist,
       round(l2.lrd, 9) AS lrd,
       round(lf.lof, 9) AS lof
FROM lof lf
JOIN samp s ON lf.ia = s.vec_id
JOIN kd ON kd.ia = s.vec_id
JOIN lrd l2 ON l2.ia = s.vec_id
ORDER BY lf.lof DESC, s.vec_id
LIMIT {TOP}
"""


_DOT_FOLD = "aggregate(zip_with({0}, {1}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def _d2(na: str, a: str, b: str, nb: str) -> F.Column:
    """Squared euclidean distance via the three-dot-product identity —
    the self-dots are precomputed ONCE per row (they are per-vector
    constants; the fold on identical arrays yields identical doubles),
    so each pair pays one interpreted HOF fold instead of three. The
    association order ((na - 2*dot) + nb) matches the oracle's
    list_dot_product form bit-for-bit."""
    return F.col(na) - 2 * F.expr(_DOT_FOLD.format(a, b)) + F.col(nb)


@register("embedding_lof", oracle=_LOF_ORACLE)
def embedding_lof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, kdist, lrd, lof) — top-{TOP} LOF anomalies over a
    content-addressed {SAMPLE}-vector sample, k={K}, rank-ordered
    neighbor folds, 9-decimal export."""
    emb = load_table(spark, sf_dir, "embeddings")
    # persist: the SAMPLE-row frame feeds both cross-join sides and the
    # final annotation join — without the cache the TakeOrdered sample
    # (and its md5 pass over the corpus) runs once per consumer
    samp = (
        emb.select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("e"),
            F.md5(F.col("vec_id").cast("string")).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(SAMPLE)
        .drop("h")
        .withColumn("nrm2", F.expr(_DOT_FOLD.format("e", "e")))
        .persist()
    )
    a = samp.select(
        F.col("vec_id").alias("ia"), F.col("e").alias("ea"),
        F.col("nrm2").alias("na"),
    )
    b = samp.select(
        F.col("vec_id").alias("ib"), F.col("e").alias("eb"),
        F.col("nrm2").alias("nb"),
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("ia") != F.col("ib"))
        .select("ia", "ib", F.round(_d2("na", "ea", "eb", "nb"), 9).alias("d2r"))
    )
    # persist: kd, reach and lof all consume knn — without the cache the
    # SAMPLE^2 interpreted-fold pair stage re-runs once per consumer
    knn = (
        pairs.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("ia").orderBy("d2r", "ib")),
        )
        .filter(F.col("rn") <= K)
        .select("ia", "ib", "rn", F.sqrt("d2r").alias("d"))
        .persist()
    )
    kd = knn.groupBy("ia").agg(F.max("d").alias("kdist"))
    reach = knn.join(
        kd.select(F.col("ia").alias("ib"), F.col("kdist").alias("kdist_b")),
        "ib",
    ).select(
        "ia", "ib", "rn", F.greatest("kdist_b", F.col("d")).alias("r")
    )
    rank_fold = (
        "aggregate(array_sort(collect_list(struct(rn, {v}))), 0.0D, "
        "(acc, e) -> acc + e.{v})"
    )
    lrd = reach.groupBy("ia").agg(
        (F.lit(float(K)) / F.expr(rank_fold.format(v="r"))).alias("lrd")
    )
    lof = (
        knn.join(
            lrd.select(F.col("ia").alias("ib"), F.col("lrd").alias("lrd_b")),
            "ib",
        )
        .join(lrd, "ia")
        .groupBy("ia", "lrd")
        .agg(
            (F.expr(rank_fold.format(v="lrd_b")) / (K * F.col("lrd"))).alias(
                "lof"
            )
        )
    )
    return (
        lof.join(samp.select(F.col("vec_id").alias("ia"), "label"), "ia")
        .join(kd, "ia")
        .select(
            F.col("ia").alias("vec_id"),
            "label",
            F.round("kdist", 9).alias("kdist"),
            F.round("lrd", 9).alias("lrd"),
            F.round("lof", 9).alias("lof"),
        )
        .orderBy(F.desc("lof"), "vec_id")
        .limit(TOP)
    )
