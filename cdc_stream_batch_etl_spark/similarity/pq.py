"""Product quantization (PQ) + asymmetric-distance search — the second
rung of the quantization ladder (after similarity/quantize.py's scalar
codes; the FAISS IVF-PQ family's core idea).

Vectors are split into M contiguous subspaces; each subspace has its own
codebook, and a vector compresses to M small code ids — here M=8 over
64 dims: 8 bytes per vector, 32× smaller than float32. Search never
decompresses the corpus: a query precomputes its distance to every
codebook centroid (the DISTANCE TABLE, M×K doubles per query), then the
approximate distance to any corpus vector is just M table lookups summed
— the asymmetric distance computation (ADC) that makes billion-scale
ANN memory-feasible.

Determinism (full DuckDB oracle, unusual for PQ): codebooks come from
the stride-sampled deterministic reservoir family (similarity/linalg.py
— standing in for k-means; the search structure is identical) with the
CONSTANT-K stride max(32, ceil(N/256)): a production PQ codebook has a
fixed K per subspace (256 for 8-bit codes) trained offline, so encode
cost is N×K with K capped — K must NOT scale with the corpus (the
hazard the ×8 scaling probe caught on constant-stride reservoirs,
SCALING.md). Assignment ties break
to the smaller centroid id via lexicographic struct-min, and every
distance folds its squared terms in index order (zip_with + 0.0-seed
fold ≡ DuckDB list comprehension + list_reduce, see centroids.py).

Scale shape:
- encoding: corpus × M rows joined to the broadcast codebook, argmin per
  (vec, subspace), re-group per vec — shuffle rows carry (vec_id, m,
  cid) triples only;
- ADC search: the distance table (queries × M × K, tiny) JOINs the
  exploded code table on (m, cid) — the corpus-side rows are 3 small
  ints each, and the per-(query, vec) sum shuffles M-row groups. No
  float vectors cross any exchange after encoding; that asymmetry is
  the whole point of PQ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.parallelism import fan_out
from ..registry import register
from .ann import N_QUERIES, TOP_K
from .linalg import fixed_k_centroids, fixed_k_stride_sql

M_SUB = 8  # subspaces
SUB_D = 8  # dims per subspace (64-dim embeddings)


def _sub_expr(src: str, m: str) -> str:
    """Spark: subvector m (0-based) of a double array column."""
    return f"slice({src}, {m} * {SUB_D} + 1, {SUB_D})"


_SQ_SPARK = "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0.0D, (s, t) -> s + t)"
_SQ_SQL = (
    "list_reduce([({a}[i] - {b}[i]) * ({a}[i] - {b}[i]) "
    f"for i in generate_series(1, {SUB_D})], (s, t) -> s + t)"
)


_CODEBOOK_SQL = f"""
  SELECT m, vec_id AS cid,
         CAST(embedding AS DOUBLE[])[m * {SUB_D} + 1 : m * {SUB_D} + {SUB_D}] AS cvec
  FROM embeddings, (SELECT unnest(range({M_SUB})) AS m) u
  WHERE vec_id % {fixed_k_stride_sql("embeddings")} = 0
"""

_SUBVECS_SQL = f"""
  SELECT vec_id, m,
         CAST(embedding AS DOUBLE[])[m * {SUB_D} + 1 : m * {SUB_D} + {SUB_D}] AS svec
  FROM embeddings, (SELECT unnest(range({M_SUB})) AS m) u
"""

_ASSIGN_SQL = f"""
  SELECT s.vec_id, s.m,
         (min(struct_pack(d := {_SQ_SQL.format(a="s.svec", b="c.cvec")}, cid := c.cid))).cid AS cid,
         (min(struct_pack(d := {_SQ_SQL.format(a="s.svec", b="c.cvec")}, cid := c.cid))).d AS dmin
  FROM ({_SUBVECS_SQL}) s JOIN ({_CODEBOOK_SQL}) c ON s.m = c.m
  GROUP BY s.vec_id, s.m
"""

_PQ_CODES_ORACLE = f"""
WITH assign AS ({_ASSIGN_SQL})
SELECT vec_id,
       array_to_string(list(cid ORDER BY m), ',') AS codes,
       list_reduce(list(dmin ORDER BY m), (a, b) -> a + b) AS quant_err
FROM assign
GROUP BY vec_id
"""


def _codebook(emb: DataFrame) -> DataFrame:
    """(m, cid, cvec) — M_SUB rows per sampled centroid vector (capped-K
    reservoir: K ≤ 256 codes per subspace no matter the corpus size)."""
    sampled = fixed_k_centroids(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    return (
        sampled.select(F.col("cid"), F.col("cemb").alias("emb"))
        .select("cid", F.explode(F.sequence(F.lit(0), F.lit(M_SUB - 1))).alias("m"), "emb")
        .select("m", "cid", F.expr(_sub_expr("emb", "m")).alias("cvec"))
    )


def _subvecs(emb: DataFrame) -> DataFrame:
    # fan_out: the M_SUB-way explode feeds the N x K interpreted
    # squared-distance folds of _assign/qtab — widen the single-row-group
    # scan so that work runs cluster-wide instead of in the one scan task
    return (
        fan_out(
            emb.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("emb")
            )
        )
        .select("vec_id", F.explode(F.sequence(F.lit(0), F.lit(M_SUB - 1))).alias("m"), "emb")
        .select("vec_id", "m", F.expr(_sub_expr("emb", "m")).alias("svec"))
    )


def _assign(emb: DataFrame) -> DataFrame:
    """(vec_id, m, cid, dmin): nearest codebook centroid per subspace,
    ties to the smaller cid (lexicographic struct-min, IVF convention)."""
    sq = F.expr(_SQ_SPARK.format(a="svec", b="cvec"))
    return (
        _subvecs(emb)
        .join(F.broadcast(_codebook(emb)), "m")
        .select("vec_id", "m", F.struct(sq.alias("d"), F.col("cid")).alias("dc"))
        .groupBy("vec_id", "m")
        .agg(F.min("dc").alias("best"))
        .select("vec_id", "m", F.col("best.cid").alias("cid"), F.col("best.d").alias("dmin"))
    )


@register("pq_codes", oracle=_PQ_CODES_ORACLE)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id → M_SUB code ids (joined string, driver convention) +
    total quantization error, folded in subspace order."""
    emb = load_table(spark, sf_dir, "embeddings")
    folded_err = F.aggregate(
        F.expr("transform(array_sort(collect_list(struct(m, dmin))), s -> s.dmin)"),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    codes = F.array_join(
        F.expr("transform(array_sort(collect_list(struct(m, cid))), s -> s.cid)"), ","
    )
    return (
        _assign(emb)
        .groupBy("vec_id")
        .agg(codes.alias("codes"), folded_err.alias("quant_err"))
    )


_PQ_TOPK_ORACLE = f"""
WITH assign AS ({_ASSIGN_SQL}),
qtab AS (
  SELECT s.vec_id AS query_id, s.m, c.cid,
         {_SQ_SQL.format(a="s.svec", b="c.cvec")} AS d
  FROM ({_SUBVECS_SQL}) s JOIN ({_CODEBOOK_SQL}) c ON s.m = c.m
  WHERE s.vec_id < {N_QUERIES}
), adist AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         list_reduce(list(q.d ORDER BY q.m), (x, y) -> x + y) AS adist
  FROM qtab q JOIN assign a ON q.m = a.m AND q.cid = a.cid
  WHERE q.query_id <> a.vec_id
  GROUP BY q.query_id, a.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, adist,
         row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC) AS rank
  FROM adist
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(adist, 6) AS adist_r
FROM ranked WHERE rank <= {TOP_K}
"""


@register("ann_pq_topk", oracle=_PQ_TOPK_ORACLE)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k: per-query distance TABLE (query × subspace × centroid)
    joined to the corpus CODES on (m, cid) — the corpus side never ships
    a float after encoding. Approx distance folds in subspace order."""
    emb = load_table(spark, sf_dir, "embeddings")
    assign = _assign(emb).select("vec_id", "m", "cid")
    sq = F.expr(_SQ_SPARK.format(a="svec", b="cvec"))
    qtab = (
        _subvecs(emb.filter(F.col("vec_id") < N_QUERIES))
        .join(F.broadcast(_codebook(emb)), "m")
        .select(F.col("vec_id").alias("query_id"), "m", "cid", sq.alias("d"))
    )
    folded = F.aggregate(
        F.expr("transform(array_sort(collect_list(struct(m, d))), s -> s.d)"),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    adist = (
        F.broadcast(qtab)
        .join(assign, ["m", "cid"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
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
