"""Shared vector/centroid helpers with NO registration side effects.

Modules here are import-safe from anywhere: importing ann.py/ivf.py runs
their ``@register`` decorators, which matters because the driver's
correctness window walks the registry in registration order (see
registry.load_all) — operators that merely need a dot product or the
centroid reservoir must not drag whole query families into the order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: stride FLOOR for the adaptive reservoir; also the FIXED stride used by
#: pq/kmeans codebooks (a production PQ codebook / k-means K is a constant
#: chosen per problem, never scaled with corpus size)
CENTROID_STRIDE = 32


def dot(a: str, b: str) -> F.Column:
    """Index-ordered float fold — bitwise-identical to DuckDB's
    list_dot_product / list_reduce (see similarity/centroids.py)."""
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)")


def adaptive_stride_sql(rel: str = "e") -> str:
    """DuckDB scalar subquery: the K ∝ √N centroid stride over ``rel``."""
    return f"(SELECT greatest({CENTROID_STRIDE}, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM {rel})"


#: constant codebook/cluster count at scale: PQ codes are 8-bit (K=256 per
#: subspace) and k-means K is a modeling constant — for these, K must NOT
#: grow with the corpus, so the STRIDE scales with N instead (K capped)
K_CODEBOOK = 256


def fixed_k_stride_sql(rel: str = "e", k: int = K_CODEBOOK) -> str:
    """DuckDB scalar subquery: stride that caps the reservoir at ~k rows
    (stride ∝ N ⇒ K constant; floor keeps tiny fixtures at the default)."""
    return (
        f"(SELECT greatest({CENTROID_STRIDE}, CAST(ceil(count(*) / {k}.0) AS BIGINT)) "
        f"FROM {rel})"
    )


def fixed_k_centroids(e: DataFrame, k: int = K_CODEBOOK) -> DataFrame:
    """(cid, cemb) — reservoir capped at ~k rows (the constant-K twin of
    ``centroids``; same 1-row-broadcast stride idiom)."""
    stride = e.agg(
        F.greatest(F.lit(CENTROID_STRIDE), F.ceil(F.count("*") / F.lit(float(k))))
        .cast("bigint")
        .alias("stride")
    )
    return (
        e.crossJoin(F.broadcast(stride))
        .filter(F.col("vec_id") % F.col("stride") == 0)
        .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
    )


def centroids(e: DataFrame) -> DataFrame:
    """(cid, cemb) — adaptive-stride deterministic centroid reservoir
    over a (vec_id, emb) frame.

    K ∝ √N balances broadcast assignment (N·K = N^1.5) against per-cell
    work (N/K rows per cell); a constant stride would make K ∝ N and
    assignment quadratic (measured — SCALING.md). The stride is a 1-row
    broadcast (the exact-percentile-threshold idiom), so centroid
    selection is one corpus scan with no collect."""
    stride = e.agg(
        F.greatest(F.lit(CENTROID_STRIDE), F.ceil(F.sqrt(F.count("*"))))
        .cast("bigint")
        .alias("stride")
    )
    return (
        e.crossJoin(F.broadcast(stride))
        .filter(F.col("vec_id") % F.col("stride") == 0)
        .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
    )
