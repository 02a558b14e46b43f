"""Per-source semantic diversity — embedding-space corpus cartography.

Beyond-reference diagnostic. When mixing sources into a training
corpus, per-source token counts say nothing about REDUNDANCY: a source
can be large and semantically monotone (scraped boilerplate) or small
and diverse. The standard scalar is the trace of the per-source
embedding covariance,

    diversity(s) = E||x||^2 - ||E x||^2   (x = doc embedding in source s)

— the mean squared distance of docs from their source centroid. High =
heterogeneous source; near 0 = the docs cluster at one point (a dedup /
downweight candidate at mixture-design time). Complements
`semantic_dedup` (which acts per-document) with the source-level view,
and `corpus_datacard` (token mass) with the semantic axis.

Determinism (atol=0 oracle): three float reductions, each with a total
order shared by both engines —
  1. per-row ||x||^2: fold of v*v over the array in INDEX order;
  2. per-(source,pos) centroid component: the sorted-fold idiom
     (centroids.py — sort values, left-fold, 0.0 seed == first-element
     seed bitwise);
  3. per-source sum of mu^2 over pos: fold in POS order.
The final subtraction is a single IEEE op on identical inputs.

Scale: join on vec_id=doc_id (co-keyed 1:1), then ONE shuffle keyed
(source, pos) for the centroid pass and one source-keyed agg for the
norms — both uniform keys. The sorted-fold lists are per-(source,pos)
group; at true 100 TB swap to plain avg + tolerance as documented in
centroids.py (exactness is the oracle-gate trade, not a plan property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_DIVERSITY_ORACLE = """
WITH j AS (
  SELECT d.source, e.embedding
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
), sq AS (
  SELECT source,
         list_reduce(list_transform(embedding,
                                    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
                     (a, b) -> a + b) AS sq_norm
  FROM j
), persrc AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         list_reduce(list_sort(list(sq_norm)), (a, b) -> a + b) / count(*)
           AS mean_sq_norm
  FROM sq GROUP BY source
), comp AS (
  SELECT j.source, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
  FROM j, (SELECT unnest(generate_series(1, len(embedding))) AS i) u
), mus AS (
  SELECT source, pos,
         list_reduce(list_sort(list(val)), (a, b) -> a + b) / count(*) AS mu
  FROM comp GROUP BY source, pos
), cent AS (
  SELECT source,
         list_reduce(list(mu * mu ORDER BY pos), (a, b) -> a + b)
           AS centroid_sq_norm
  FROM mus GROUP BY source
)
SELECT p.source, p.n_docs, p.mean_sq_norm, c.centroid_sq_norm,
       p.mean_sq_norm - c.centroid_sq_norm AS diversity
FROM persrc p JOIN cent c USING (source)
"""


@register("source_semantic_diversity", oracle=_DIVERSITY_ORACLE)
def source_semantic_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trace-of-covariance semantic diversity per document source."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    j = emb.join(docs, emb["vec_id"] == docs["doc_id"]).select("source", "embedding")

    # pass 1: per-row squared norm (index-order fold), then sorted fold
    # of the row norms per source
    sq_norm = F.aggregate(
        F.transform("embedding", lambda v: v.cast("double") * v.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    persrc = (
        j.select("source", sq_norm.alias("sq_norm"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            (
                F.aggregate(
                    F.sort_array(F.collect_list("sq_norm")), F.lit(0.0), lambda a, x: a + x
                )
                / F.count("*")
            ).alias("mean_sq_norm"),
        )
    )

    # pass 2: centroid components (sorted fold per (source, pos)), then
    # pos-ordered fold of mu^2 per source
    comp = j.select(
        "source", F.posexplode("embedding").alias("pos0", "valf")
    ).select("source", (F.col("pos0") + 1).alias("pos"), F.col("valf").cast("double").alias("val"))
    mus = comp.groupBy("source", "pos").agg(
        (
            F.aggregate(F.sort_array(F.collect_list("val")), F.lit(0.0), lambda a, x: a + x)
            / F.count("*")
        ).alias("mu")
    )
    cent = mus.groupBy("source").agg(
        F.aggregate(
            F.expr("transform(array_sort(collect_list(struct(pos, mu))), s -> s.mu * s.mu)"),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("centroid_sq_norm")
    )

    return persrc.join(cent, "source").select(
        "source",
        "n_docs",
        "mean_sq_norm",
        "centroid_sq_norm",
        (F.col("mean_sq_norm") - F.col("centroid_sq_norm")).alias("diversity"),
    )
