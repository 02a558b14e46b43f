"""Johnson-Lindenstrauss signed-projection distortion report
(beyond-reference, SURVEY §2.11 embedding-QA family next to
embedding_truncation_recall / embedding_quantize: truncation measures
what Matryoshka-style PREFIX slicing costs, quantization what 8-bit
codes cost — this measures what a K-dim RANDOM projection costs, the
third standard compression rung and the cheapest one to apply to
arbitrary embeddings at 100 TB since it needs no calibration pass).

Semantics: Achlioptas-style +-1 signed projection (Achlioptas 2003 —
database-friendly random projections): y_j = sum_d s(d,j) * q_d for
j = 1..K (K = 16), where q = round(v * 1000) is the integer milli-grid
of the embedding and s(d,j) = +-1 derives from bit 0 of the 60-bit md5
device over "j_d" — the matrix is a CONSTANT computed once in Python
(hashlib) and inlined as literal arrays into BOTH legs, so neither
engine hashes anything per row. For evaluation pairs (the
fellegi-style md5-bucket adjacent pairing — deterministic, uniform,
n/2 pairs), E[|ya - yb|^2] = K * |qa - qb|^2, so the per-pair
distortion ratio rho = dproj2 / (K * dorig2) concentrates near 1 with
sd ~ sqrt(2/K).

Exactness: q, the projections, and both squared distances are INTEGER
(index-ordered folds; magnitudes < 2^53 by construction — |q_d| <~
5e3, dproj2 <= K * (D * 5e3 * 2)^2 ~ 7e12); rho is one exact int/int
-> double division; the +-20% band counters compare 5*dproj2 against
4*K*dorig2 / 6*K*dorig2 — pure integers, never a float. Only
mean_ratio sums doubles — with the sorted-fold idiom (centroids.py)
shared by both engines.

Scale: projection is scan-local whole-stage-codegen array math (the
sign matrix is a literal — no join, no broadcast); the pairing window
is partitioned by the md5 bucket (per-bucket sort of n/16 rows); the
report is one 1-row aggregate. The sorted-fold mean is the same
oracle-gate trade documented in similarity/diversity.py — at true
100 TB swap to plain avg + tolerance.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

K_PROJ = 16
DIMS = 64
N_BUCKETS = 16
Q_SCALE = 1000


def _sign(j: int, d: int) -> int:
    """+-1 from bit 0 of the md5 60-bit device over 'j_d'."""
    h60 = int(hashlib.md5(f"{j}_{d}".encode()).hexdigest()[:15], 16)
    return 1 - 2 * (h60 % 2)


#: K x D constant sign matrix, inlined as literals into both legs.
SIGNS: tuple[tuple[int, ...], ...] = tuple(
    tuple(_sign(j, d) for d in range(DIMS)) for j in range(K_PROJ)
)

_H60 = "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)"


def _duck_proj(j: int) -> str:
    lits = ", ".join(str(s) for s in SIGNS[j])
    return (
        f"list_sum([q[i] * ([{lits}])[i] "
        f"for i in generate_series(1, {DIMS})])"
    )


_JL_ORACLE = f"""
WITH q AS (
  SELECT vec_id,
         [CAST(round(CAST(embedding[i] AS DOUBLE) * {Q_SCALE}) AS BIGINT)
          for i in generate_series(1, {DIMS})] AS q,
         {_H60} AS h60,
         {_H60} % {N_BUCKETS} AS bucket
  FROM embeddings
),
proj AS (
  SELECT vec_id, q, h60, bucket,
         [{", ".join(_duck_proj(j) for j in range(K_PROJ))}] AS p
  FROM q
),
ranked AS (
  SELECT *,
         CAST(row_number() OVER (PARTITION BY bucket ORDER BY h60, vec_id)
              - 1 AS BIGINT) // 2 AS pair_id
  FROM proj
),
pairs AS (
  SELECT CAST(list_sum([(a.q[i] - b.q[i]) * (a.q[i] - b.q[i])
               for i in generate_series(1, {DIMS})]) AS BIGINT) AS dorig2,
         CAST(list_sum([(a.p[j] - b.p[j]) * (a.p[j] - b.p[j])
               for j in generate_series(1, {K_PROJ})]) AS BIGINT) AS dproj2
  FROM ranked a JOIN ranked b
    ON a.bucket = b.bucket AND a.pair_id = b.pair_id
   AND a.vec_id < b.vec_id
),
rated AS (
  SELECT dorig2, dproj2,
         CAST(dproj2 AS DOUBLE) / ({K_PROJ} * dorig2) AS ratio,
         5 * dproj2 >= 4 * {K_PROJ} * dorig2
           AND 5 * dproj2 <= 6 * {K_PROJ} * dorig2 AS within
  FROM pairs WHERE dorig2 > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST({K_PROJ} AS BIGINT) AS k_proj,
       CAST({DIMS} AS BIGINT) AS n_dims,
       list_reduce(list_sort(list(ratio)), (x, y) -> x + y) / count(*)
         AS mean_ratio,
       min(ratio) AS min_ratio,
       max(ratio) AS max_ratio,
       CAST(sum(CASE WHEN within THEN 1 ELSE 0 END) AS BIGINT)
         AS n_within_20pct,
       CAST(sum(CASE WHEN within THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         AS share_within_20pct
FROM rated
"""


def _spark_proj(j: int) -> F.Column:
    lits = ", ".join(str(s) for s in SIGNS[j])
    return F.expr(
        f"aggregate(zip_with(q, array({lits}), (x, y) -> x * y), "
        f"0L, (acc, v) -> acc + v)"
    )


@register("jl_projection_distortion", oracle=_JL_ORACLE)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: distortion of the K=16 signed JL projection over
    md5-paired embedding pairs — mean/min/max ratio and the +-20% band."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    h60 = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    q = e.select(
        "vec_id",
        F.expr(
            f"transform(embedding, v -> "
            f"CAST(round(CAST(v AS DOUBLE) * {Q_SCALE}) AS BIGINT))"
        ).alias("q"),
        h60.alias("h60"),
        (h60 % N_BUCKETS).alias("bucket"),
    )
    proj = q.select(
        "vec_id",
        "q",
        "h60",
        "bucket",
        F.array(*[_spark_proj(j) for j in range(K_PROJ)]).alias("p"),
    )
    ranked = proj.withColumn(
        "pair_id",
        F.expr(
            "CAST(row_number() OVER "
            "(PARTITION BY bucket ORDER BY h60, vec_id) - 1 AS BIGINT) div 2"
        ),
    )
    ra, rb = ranked.alias("a"), ranked.alias("b")
    pairs = ra.join(
        rb,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.pair_id") == F.col("b.pair_id"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.expr(
            "CAST(aggregate(zip_with(a.q, b.q, (x, y) -> (x - y) * (x - y)), "
            "0L, (acc, v) -> acc + v) AS BIGINT)"
        ).alias("dorig2"),
        F.expr(
            "CAST(aggregate(zip_with(a.p, b.p, (x, y) -> (x - y) * (x - y)), "
            "0L, (acc, v) -> acc + v) AS BIGINT)"
        ).alias("dproj2"),
    )
    rated = pairs.filter(F.col("dorig2") > 0).select(
        "dorig2",
        "dproj2",
        (F.col("dproj2").cast("double") / (K_PROJ * F.col("dorig2"))).alias(
            "ratio"
        ),
        (
            (5 * F.col("dproj2") >= 4 * K_PROJ * F.col("dorig2"))
            & (5 * F.col("dproj2") <= 6 * K_PROJ * F.col("dorig2"))
        ).alias("within"),
    )
    return rated.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.lit(K_PROJ).cast("bigint").alias("k_proj"),
        F.lit(DIMS).cast("bigint").alias("n_dims"),
        (
            F.aggregate(
                F.sort_array(F.collect_list("ratio")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.count("*")
        ).alias("mean_ratio"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
        F.sum(F.when(F.col("within"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_within_20pct"),
        (
            F.sum(F.when(F.col("within"), 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("share_within_20pct"),
    )
