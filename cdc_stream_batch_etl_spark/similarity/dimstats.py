"""Per-dimension embedding profile — the sanity gate before any vector
operator runs at scale.

Collapsed dimensions (constant values), dead ReLU dims (all-zero or
all-negative), and scale outliers silently wreck cosine retrieval;
production embedding pipelines profile per-dimension stats on every
ingest batch. Emits one row per dimension with count, exact min/max,
the sign census, and the mean.

Float parity: min/max compare exactly; the MEAN would normally be a
cross-row float sum whose accumulation order differs per engine, so the
sum goes through DECIMAL(28,9) (the functions/money.py rule, widened
for 9-decimal components) — exact, order-free — and the single final
division to double is IEEE-identical in both engines. A float's decimal
expansion can never land on an exact half at the 9th decimal (that
would need a 5^10 factor in a binary fraction), so the float→decimal
rounding is also engine-independent.

Scale: posexplode is scan-local 1:dim fan-out; one shuffle keyed on the
dimension index (cardinality = embedding dim, so give AQE a coalesce
target); partial aggregation does the heavy lifting map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_ORACLE = """
WITH x AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
)
SELECT dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(v AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS mean_v,
       min(v) AS min_v,
       max(v) AS max_v,
       CAST(count(*) FILTER (WHERE v > 0.0) AS BIGINT) AS n_pos,
       CAST(count(*) FILTER (WHERE v = 0.0) AS BIGINT) AS n_zero
FROM x GROUP BY dim
"""


@register("embedding_dim_stats", oracle=_ORACLE)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dim, n, mean_v, min_v, max_v, n_pos, n_zero) per embedding
    dimension, 1-indexed to match SQL subscripts."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    ).select((F.col("pos") + 1).alias("dim"), "v")
    return x.groupBy("dim").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("v").cast("decimal(28,9)")).cast("double") / F.count("*")).alias(
            "mean_v"
        ),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.count(F.when(F.col("v") > 0.0, 1)).alias("n_pos"),
        F.count(F.when(F.col("v") == 0.0, 1)).alias("n_zero"),
    )
