"""IVF-PQ: coarse cells + asymmetric-distance re-rank — the composition
that makes billion-scale ANN memory- AND compute-feasible (the FAISS
IVFPQ index re-expressed as a Spark plan).

similarity/ivf.py bounds the SEARCH (scan only nprobe cells, ~NPROBE/K
of the corpus) but still stores and dots full float vectors per
candidate; similarity/pq.py bounds the MEMORY (8 bytes per vector via
ADC) but scans every code in the corpus per query. Production systems
compose them: IVF picks the cells, PQ's distance table scores only the
candidates inside them. The corpus-side join carries (cell, m, cid)
small ints — no float vector crosses an exchange after encoding, and
the per-query work is NPROBE cells × cell-size × M lookups.

Determinism (full DuckDB oracle — both rungs' conventions reused
verbatim): √N adaptive-stride IVF centroids with argmax-dot struct-max
assignment; capped-256 PQ codebooks with argmin-sq struct-min
assignment; ADC distances folded in subspace order; rank ties to the
smaller neighbor id. Recall vs the exact top-k is pytest-gated like the
other approximate paths (tests/test_similarity.py conventions).

Scale shape: encode = corpus × M against a broadcast codebook (K ≤ 256
— constant); cells = corpus × √N broadcast centroids; search = probes
(queries × NPROBE) cell-joined to codes, ADC via a broadcast distance
table, per-(query, neighbor) M-row sum, per-query top-K window. The
only corpus-sized shuffles are keyed on cell and (query, neighbor) —
uniform keys, bounded fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.parallelism import fan_out
from ..registry import register
from .ann import N_QUERIES, TOP_K, _dot
from .ivf import NPROBE
from .linalg import adaptive_stride_sql, centroids
from .pq import (
    _ASSIGN_SQL,
    _CODEBOOK_SQL,
    _SQ_SQL,
    _SUBVECS_SQL,
    _assign,
    _codebook,
    _subvecs,
)

_DOT = "list_dot_product({a}, {b})"

_IVFPQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), cent AS (
  SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id % {adaptive_stride_sql("e")} = 0
), cells AS (
  SELECT vec_id,
         (max(struct_pack(d := {_DOT.format(a="emb", b="cemb")}, cid := cid))).cid AS cell
  FROM e CROSS JOIN cent
  GROUP BY vec_id, emb
), codes AS ({_ASSIGN_SQL}),
q AS (
  SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < {N_QUERIES}
), probes AS (
  SELECT query_id, cid AS cell
  FROM (
    SELECT query_id, cid,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY {_DOT.format(a="qe", b="cemb")} DESC, cid ASC) AS pr
    FROM q CROSS JOIN cent
  ) WHERE pr <= {NPROBE}
), qtab AS (
  SELECT s.vec_id AS query_id, s.m, c.cid,
         {_SQ_SQL.format(a="s.svec", b="c.cvec")} AS d
  FROM ({_SUBVECS_SQL}) s JOIN ({_CODEBOOK_SQL}) c ON s.m = c.m
  WHERE s.vec_id < {N_QUERIES}
), cand AS (
  SELECT p.query_id, cl.vec_id AS neighbor_id
  FROM probes p JOIN cells cl ON p.cell = cl.cell
  WHERE p.query_id <> cl.vec_id
), adist AS (
  SELECT c.query_id, c.neighbor_id,
         list_reduce(list(t.d ORDER BY t.m), (x, y) -> x + y) AS adist
  FROM cand c
  JOIN codes k ON k.vec_id = c.neighbor_id
  JOIN qtab t ON t.query_id = c.query_id AND t.m = k.m AND t.cid = k.cid
  GROUP BY c.query_id, c.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, adist,
         row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC) AS rank
  FROM adist
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(adist, 6) AS adist_r
FROM ranked WHERE rank <= {TOP_K}
"""


@register("ann_ivfpq_topk", oracle=_IVFPQ_ORACLE)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by ADC distance over IVF-probed cells only: the coarse cells
    bound the candidate set, the code table bounds the bytes per
    candidate."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    cent = centroids(e)

    # fan_out: the N x sqrt(N) interpreted dot folds of the cell
    # assignment otherwise run inside the one scan task
    cells = (
        fan_out(e).crossJoin(F.broadcast(cent))
        .withColumn("d", _dot("emb", "cemb"))
        .groupBy("vec_id", "emb")
        .agg(F.max(F.struct(F.col("d"), F.col("cid"))).alias("top"))
        .select("vec_id", F.col("top.cid").alias("cell"))
    )
    codes = _assign(emb).select("vec_id", "m", "cid")

    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("d"), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("d", _dot("qe", "cemb"))
        .withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= NPROBE)
        .select("query_id", F.col("cid").alias("cell"))
    )

    sq = F.expr(
        "aggregate(zip_with(svec, cvec, (x, y) -> (x - y) * (x - y)), 0.0D, (s, t) -> s + t)"
    )
    qtab = (
        _subvecs(emb.filter(F.col("vec_id") < N_QUERIES))
        .join(F.broadcast(_codebook(emb)), "m")
        .select(F.col("vec_id").alias("query_id"), "m", "cid", sq.alias("d"))
    )

    cand = (
        probes.join(cells, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    folded = F.aggregate(
        F.expr("transform(array_sort(collect_list(struct(m, d))), s -> s.d)"),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    adist = (
        cand.join(codes, cand["neighbor_id"] == codes["vec_id"])
        .join(F.broadcast(qtab), ["query_id", "m", "cid"])
        .groupBy("query_id", "neighbor_id")
        .agg(folded.alias("adist"))
    )
    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    )
    return (
        adist.withColumn("rank", rank.cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("adist", 6).alias("adist_r"))
    )
