"""Dimension-truncation recall — how much nearest-neighbor quality a
prefix of the embedding retains.

Matryoshka-style representations (Kusupati et al., NeurIPS 2022) and
plain PCA-truncation both bet that the FIRST dimensions carry most of
the neighborhood structure: serving at 16 of 64 dims cuts ANN memory
and dot-product cost 4× IF recall holds. This operator measures that
bet on the corpus itself: for each benchmark query, the exact cosine
top-K under the full vector vs under the first TRUNC_DIM dimensions,
and the overlap between the two lists — recall@K of the truncated
index against the full-precision ground truth. Low-recall queries are
exactly where truncated serving would silently degrade retrieval.

Determinism: both rankings are exact double cosine with the repo's ANN
tiebreak (cos DESC, neighbor_id ASC — similarity/ann.py); the overlap
is an integer count and recall one IEEE division by the constant K.

Scale: O(Q×N) like ann_cosine_topk — Q is the bounded benchmark set
(broadcast), the corpus is scanned once per ranking with per-partition
top-K pruning available to AQE; the truncated side slices the array
BEFORE the pair stage so its dot products genuinely cost TRUNC_DIM/dim
of the full side. The 100 TB serving path pairs this report with
ann_ivf_topk (run the IVF index at the truncated width only where
recall clears the bar). No reference-repo counterpart (SURVEY §2.11
beyond-reference mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .linalg import dot as _dot

TOP_K = 5
N_QUERIES = 10  # vec_id < 10: the repo's fixed ANN benchmark query set
TRUNC_DIM = 16

_RECALL_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings
), full_rank AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY
           list_dot_product(qe, ce) / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) DESC,
           neighbor_id ASC) AS rank
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
), trunc_rank AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY
           list_dot_product(qe[1:{TRUNC_DIM}], ce[1:{TRUNC_DIM}])
             / (sqrt(list_dot_product(qe[1:{TRUNC_DIM}], qe[1:{TRUNC_DIM}]))
                * sqrt(list_dot_product(ce[1:{TRUNC_DIM}], ce[1:{TRUNC_DIM}]))) DESC,
           neighbor_id ASC) AS rank
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
)
SELECT f.query_id,
       CAST(count(t.neighbor_id) AS BIGINT) AS n_overlap,
       CAST(count(t.neighbor_id) AS DOUBLE) / {TOP_K} AS recall
FROM (SELECT * FROM full_rank WHERE rank <= {TOP_K}) f
LEFT JOIN (SELECT * FROM trunc_rank WHERE rank <= {TOP_K}) t
  ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
GROUP BY f.query_id
ORDER BY f.query_id
"""


def _topk(q: DataFrame, c: DataFrame) -> DataFrame:
    """(query_id, neighbor_id) of the exact cosine top-K under the
    given (qe, ce) vector columns, with the repo's ANN tiebreak."""
    sims = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            _dot("qe", "ce") / (F.sqrt(_dot("qe", "qe")) * F.sqrt(_dot("ce", "ce"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )


@register("embedding_truncation_recall", oracle=_RECALL_ORACLE)
def embedding_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-benchmark-query recall@K of the TRUNC_DIM-prefix cosine
    ranking against the full-width exact ranking: the go/no-go table
    for serving embeddings at a truncated width."""
    emb = load_table(spark, sf_dir, "embeddings")
    q_full = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    c_full = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("ce"),
    )
    # slice BEFORE the pair stage: the truncated dot products only read
    # TRUNC_DIM elements
    q_tr = q_full.select("query_id", F.slice("qe", 1, TRUNC_DIM).alias("qe"))
    c_tr = c_full.select("neighbor_id", F.slice("ce", 1, TRUNC_DIM).alias("ce"))
    full = _topk(F.broadcast(q_full), c_full)
    # disjoint column names on the probe side — self-joining two frames
    # derived from the same scan otherwise resolves ambiguously
    trunc = _topk(F.broadcast(q_tr), c_tr).select(
        F.col("query_id").alias("t_query"), F.col("neighbor_id").alias("t_neighbor")
    )
    return (
        full.join(
            # Q×K rows — always broadcast the overlap probe
            F.broadcast(trunc),
            (F.col("query_id") == F.col("t_query"))
            & (F.col("neighbor_id") == F.col("t_neighbor")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("t_neighbor").cast("bigint").alias("n_overlap"),
            (F.count("t_neighbor").cast("double") / TOP_K).alias("recall"),
        )
        .orderBy("query_id")
    )
