"""Dominant-direction analysis of the embedding corpus — the
"All-but-the-Top" postprocessing signal (Mu & Viswanath, ICLR 2018:
embedding sets are anisotropic, sharing a large common direction whose
removal improves downstream similarity; public paper, no reference-repo
counterpart — SURVEY §2.11 beyond-reference mandate).

Why a training-data pipeline needs it: cosine-based curation (semantic
dedup, ANN retrieval, diversity sampling — half of similarity/) silently
degrades when one direction dominates every vector; this pair of
operators measures that BEFORE the expensive passes run. The direction
itself is the top principal component of the (uncentered) Gram matrix,
estimated by TWO synchronous power-iteration rounds from a fixed probe.

Deterministic re-expression (full DuckDB oracle — unusual for an
eigen-estimate, whose float mass sums are parallel-order-dependent; the
copurchase_pagerank playbook applied to linear algebra): embeddings are
quantized ONCE to integers ``q = floor(x · 2¹⁵)`` (float×2¹⁵ is exactly
representable in double — 24+15 bits < 53 — so floor is bit-identical in
both engines), and every subsequent product and sum is EXACT integer
arithmetic (Spark decimal(38,0) / DuckDB HUGEINT), so partial-
aggregation order cannot perturb a single bit. Unrolled rounds with a
fixed alternating ±1 probe p:

    d1_i = qᵢ·p      s1 = Σᵢ d1ᵢ·qᵢ     (= AᵀA p)
    d2_i = qᵢ·s1     s2 = Σᵢ d2ᵢ·qᵢ     (= (AᵀA)² p — the direction)

Overflow ledger (|x| < 1, dim = 64): |q| < 2¹⁵, |d1| ≤ 2²¹,
|s1| ≤ N·2³⁶, |d2| ≤ 2⁶·2¹⁵·|s1|, |s2| ≤ N·2¹⁵·|d2| = N²·2⁷⁸⁺ᵉ —
decimal(38,0) ≈ 2¹²⁶ holds through N ≈ 10⁷ vectors. Past that (the
100 TB corpus), the runner materializes s1 and rescales between rounds
(the pagerank DIV-renormalization step) — the per-round plan shape is
unchanged.

The report then goes back to floats the repo's established way: the
direction is cast to double once VIA ITS DECIMAL STRING (decimal→string
is exact digits and string→double parsing is correctly rounded in both
engines, whereas Spark's direct decimal→double and DuckDB's
hugeint→double disagreed by 1 ulp above 2⁵³ — measured, not assumed),
per-vector cosine is the index-ordered fold of linalg.dot
(bitwise-identical to DuckDB's list_dot_product), and the per-label
isotropy profile aggregates only EXACT counts of banded |cos| — no
float ever crosses a parallel aggregation boundary.

Plan shape: one posexplode of the embedding table (N·dim rows, linear),
then four alternating vec_id/dim hash-aggregates with the 64-row
direction frames broadcast — no self-join, no quadratic surface; the
report is one more scan-local array pass + a |labels|-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .linalg import dot

#: quantization scale — float·2^15 is exact in double, so floor() is
#: engine-identical; 15 bits also leaves decimal(38) headroom to N≈1e7
QSCALE = 1 << 15
#: |cos| band edges for the isotropy profile
BAND_HIGH = 0.5
BAND_MID = 0.25

_Q_SPARK = f"transform(embedding, x -> cast(floor(cast(x as double) * {QSCALE}) as bigint))"


def _exploded(e: DataFrame) -> DataFrame:
    """(vec_id, dim, v) — quantized embedding components, 0-based dim."""
    return e.select(
        "vec_id", F.expr(_Q_SPARK).alias("q")
    ).select("vec_id", F.posexplode("q").alias("dim", "v"))


def _direction(e: DataFrame) -> DataFrame:
    """(dim, s2 decimal(38,0)) — two exact power-iteration rounds.

    The exploded frame feeds all four aggregates; Spark does not share
    subtrees, so without persist() the scan+explode would run 4× (the
    pagerank precedent — caller owns cache release via
    spark.catalog.clearCache(), the runner/bench clear contract)."""
    ex = _exploded(e).persist()
    d1 = ex.groupBy("vec_id").agg(
        F.sum(F.expr("v * (1 - 2 * (dim % 2))")).alias("d1")
    )
    s1 = (
        ex.join(d1, "vec_id")
        .groupBy("dim")
        .agg(F.sum(F.expr("cast(v as decimal(38,0)) * d1")).alias("s1"))
    )
    d2 = (
        ex.join(F.broadcast(s1), "dim")
        .groupBy("vec_id")
        .agg(F.sum(F.expr("s1 * v")).alias("d2"))
    )
    return (
        ex.join(d2, "vec_id")
        .groupBy("dim")
        .agg(F.sum(F.expr("d2 * v")).alias("s2"))
    )


_DIR_CTE = f"""
e AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE}) AS BIGINT)) AS q
  FROM embeddings
),
ex AS (
  SELECT vec_id, d.d - 1 AS dim, q[d.d] AS v
  FROM e, LATERAL unnest(generate_series(1, len(q))) d(d)
),
d1 AS (SELECT vec_id, SUM(v * (1 - 2 * (dim % 2))) AS d1 FROM ex GROUP BY vec_id),
s1 AS (SELECT dim, SUM(CAST(v AS HUGEINT) * d1) AS s1
       FROM ex JOIN d1 USING (vec_id) GROUP BY dim),
d2 AS (SELECT vec_id, SUM(s1 * v) AS d2 FROM ex JOIN s1 USING (dim) GROUP BY vec_id),
s2 AS (SELECT dim, SUM(d2 * v) AS s2 FROM ex JOIN d2 USING (vec_id) GROUP BY dim)
"""

# exact-integer → double goes VIA THE DECIMAL STRING in both engines:
# decimal→string is exact digits and string→double parsing is correctly
# rounded everywhere, while direct decimal→double (Spark) vs
# hugeint→double (DuckDB) casts disagreed by 1 ulp above 2^53.
_DIR_ORACLE = f"""
WITH {_DIR_CTE}
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS direction
FROM s2
ORDER BY dim
"""


@register("embedding_top_direction", oracle=_DIR_ORACLE)
def embedding_top_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus' dominant embedding direction — (AᵀA)²p from a fixed
    alternating probe, every sum exact-integer; dim rows, unnormalized
    (callers normalize per use, keeping this output hash-exact)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        _direction(e)
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            F.col("s2").cast("string").cast("double").alias("direction"),
        )
        .orderBy("dim")
    )


_ISO_ORACLE = f"""
WITH {_DIR_CTE},
dir AS (SELECT list(CAST(CAST(s2 AS VARCHAR) AS DOUBLE) ORDER BY dim) AS u FROM s2),
qe AS (
  SELECT vec_id, label, list_transform(q, x -> CAST(x AS DOUBLE)) AS qd
  FROM e
),
scored AS (
  SELECT label,
         abs(list_dot_product(qd, u)
             / (sqrt(list_dot_product(qd, qd)) * sqrt(list_dot_product(u, u))))
           AS a
  FROM qe, dir
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN a >= {BAND_HIGH} THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(sum(CASE WHEN a >= {BAND_MID} AND a < {BAND_HIGH} THEN 1 ELSE 0 END) AS BIGINT) AS n_mid,
       CAST(sum(CASE WHEN a < {BAND_MID} THEN 1 ELSE 0 END) AS BIGINT) AS n_low
FROM scored
GROUP BY label
ORDER BY label
"""


@register("embedding_isotropy_report", oracle=_ISO_ORACLE)
def embedding_isotropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label isotropy profile: how many vectors align with the
    corpus' dominant direction (|cos| banded at 0.25/0.5). A label whose
    mass sits in n_high is one the cosine-based curation passes will
    treat as near-duplicate-rich even when content differs — the
    pre-flight check for semantic_dedup / ANN thresholds."""
    e = load_table(spark, sf_dir, "embeddings")
    u = _direction(e).select(
        "dim", F.col("s2").cast("string").cast("double").alias("ud")
    )
    u_arr = u.agg(
        F.expr("transform(array_sort(collect_list(struct(dim, ud))), s -> s.ud)").alias(
            "u"
        )
    )
    qe = e.select(
        "vec_id",
        "label",
        F.expr(f"transform({_Q_SPARK}, x -> cast(x as double))").alias("qd"),
    )
    scored = qe.crossJoin(F.broadcast(u_arr)).select(
        "label",
        F.abs(
            dot("qd", "u")
            / (F.sqrt(dot("qd", "qd")) * F.sqrt(dot("u", "u")))
        ).alias("a"),
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum((F.col("a") >= BAND_HIGH).cast("bigint")).alias("n_high"),
            F.sum(
                ((F.col("a") >= BAND_MID) & (F.col("a") < BAND_HIGH)).cast("bigint")
            ).alias("n_mid"),
            F.sum((F.col("a") < BAND_MID).cast("bigint")).alias("n_low"),
        )
        .orderBy("label")
    )
