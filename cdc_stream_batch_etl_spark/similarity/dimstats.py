"""Per-dimension embedding profile — the sanity gate before any vector
operator runs at scale.

Collapsed dimensions (constant values), dead ReLU dims (all-zero or
all-negative), and scale outliers silently wreck cosine retrieval;
production embedding pipelines profile per-dimension stats on every
ingest batch. Emits one row per dimension with count, exact min/max,
the sign census, and the mean.

Float parity: min/max compare exactly; the MEAN would normally be a
cross-row float sum whose accumulation order differs per engine, so
each value is first snapped to the integer NANO grid in the DOUBLE
domain — round(v * 1e9), one IEEE multiply plus one half-away-from-zero
round, both bit-identical across engines — and the grid integers sum in
decimal(38,0) (order-free, exact). The earlier CAST(v AS DECIMAL(28,9))
formulation was NOT engine-independent: Spark's double→decimal goes
through the shortest round-trip string (BigDecimal.valueOf) while
DuckDB scales the exact binary expansion, and the two disagree when a
float32's exact expansion sits just below a 9th-decimal .5 boundary
that its shortest representation sits on (first observed on the sf1
fresh-Gaussian embeddings, r12). The final divisions to double are
IEEE-identical in both engines.

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
       CAST(sum(CAST(round(v * 1e9) AS DECIMAL(38,0))) AS DOUBLE) / 1e9
         / count(*) AS mean_v,
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
        (
            F.sum(F.round(F.col("v") * 1e9).cast("decimal(38,0)")).cast("double")
            / 1e9
            / F.count("*")
        ).alias("mean_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.count(F.when(F.col("v") > 0.0, 1)).alias("n_pos"),
        F.count(F.when(F.col("v") == 0.0, 1)).alias("n_zero"),
    )
