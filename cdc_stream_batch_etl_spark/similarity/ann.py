"""Similarity search over the embeddings table (array<float> column).

- `ann_cosine_topk`: brute-force exact cosine top-k — the correctness
  baseline. All arithmetic in double via built-in higher-order functions
  (zip_with/aggregate): JVM-side, no UDF.
- `ann_lsh_topk`: sign-random-projection (SimHash-for-vectors) bucketed
  variant — the 100 TB scale path: a hyperplane-signature bucket key plus
  Hamming<=1 probing bounds candidates to (N_PLANES+1)/2^N_PLANES of the
  corpus. Approximate ⇒ no SQL oracle (rows-only driver check); recall vs
  the exact baseline is asserted in tests/test_similarity.py (note: the
  test corpus is isotropic, so absolute recall is information-limited;
  the test asserts recall > candidate fraction).

Scale notes: brute force is O(Q×N) — fine for a query batch against a
partitioned corpus (broadcast the queries, scan the corpus once); the LSH
variant turns that into O(Q×bucket) with a shuffle keyed on signature.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 form the query set

_COS_SQL_DOT = "list_dot_product(qe, ce)"

_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id AS neighbor_id, label, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings
), sims AS (
  SELECT query_id, neighbor_id, label,
         {_COS_SQL_DOT} / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos_sim
  FROM q CROSS JOIN c
  WHERE query_id <> neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, label, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, label, CAST(rank AS BIGINT) AS rank, round(cos_sim, 6) AS cos_sim_r
FROM ranked WHERE rank <= {TOP_K}
"""


def _dot(a: str, b: str) -> F.Column:
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)")


@register("ann_cosine_topk", oracle=_TOPK_ORACLE)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # norms precomputed per vector: the O(Q×N) pair stage pays ONE
    # interpreted higher-order dot, not three
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qe"),
        )
        .withColumn("qnrm", F.sqrt(_dot("qe", "qe")))
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.col("embedding").cast("array<double>").alias("ce"),
    ).withColumn("cnrm", F.sqrt(_dot("ce", "ce")))
    sims = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", _dot("qe", "ce") / (F.col("qnrm") * F.col("cnrm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "label",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim_r"),
        )
    )


N_PLANES = 4
_DIM = 64


def _hyperplanes() -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5(plane|dim) — reproducible
    across sessions with no RNG state."""
    planes = []
    for p in range(N_PLANES):
        row = []
        for d in range(_DIM):
            h = hashlib.md5(f"plane{p}|{d}".encode()).digest()[0]
            row.append(1.0 if h & 1 else -1.0)
        planes.append(row)
    return planes


def _signature(col: str) -> F.Column:
    planes = _hyperplanes()
    bits = []
    for p, row in enumerate(planes):
        arr = "array(" + ",".join(f"{v}D" for v in row) + ")"
        bits.append(
            f"(CASE WHEN aggregate(zip_with({col}, {arr}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) > 0 THEN {1 << p} ELSE 0 END)"
        )
    return F.expr(" + ".join(bits)).cast("int")


@register("ann_lsh_topk")  # approximate: rows-only driver check
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: candidates share a hyperplane signature with the query
    (or differ in exactly one bit — probe radius 1), exact cosine re-rank
    within candidates."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = (
        emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))
        .withColumn("sig", _signature("e"))
        .withColumn("nrm", F.sqrt(_dot("e", "e")))
    )

    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("sig").alias("qsig"),
        F.col("nrm").alias("qnrm"),
    )
    # probe set: exact signature plus radius-1 neighbors (9 sigs per query)
    probes = q.select(
        "query_id",
        "qe",
        "qnrm",
        F.explode(
            F.array(
                F.col("qsig"), *[F.expr(f"int(qsig ^ {1 << b})") for b in range(N_PLANES)]
            )
        ).alias("sig"),
    )
    cand = probes.join(base, "sig").filter(F.col("query_id") != F.col("vec_id"))
    sims = cand.withColumn("cos_sim", _dot("qe", "e") / (F.col("qnrm") * F.col("nrm")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim_r"),
        )
    )
