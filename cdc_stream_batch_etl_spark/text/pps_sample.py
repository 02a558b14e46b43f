"""Systematic PPS sampling — token-proportional document draws.

Training-mixture builders sample documents with probability
proportional to their TOKEN COUNT (a 10k-token document contributes
10k tokens to the mix, so it should be 100x likelier to be drawn than
a 100-token one when the unit of account is tokens, not documents).
The float-free way to do that at scale is SYSTEMATIC PPS sampling
(classic survey-statistics PPS; the deterministic cousin of
Efraimidis-Spirakis A-ES, whose u^(1/w) keys would hang cross-engine
exactness on libm pow/ln — the same reason text/bm25.py is ln-free):
walk the population in a pseudo-random order, accumulate weights, and
pick every document whose cumulative weight crosses a stride boundary.
Expected picks per doc = weight/stride; docs heavier than the stride
are certainty units (always picked) — textbook PPS behavior.

Determinism (full DuckDB oracle): the walk order is the md5-prefix
permutation (text/sampling.py's established 60-bit device, doc_id
tiebreak), the accumulator is an exact BIGINT n_chars sum, and the
boundary test floor(cum/stride) > floor((cum-w)/stride) is integer
division — not one float anywhere.

Scale: one window cumsum per source partition plus a broadcast of the
per-source stride (|sources|-row frame). Per-source sequential scan is
inherent to any exact systematic draw; sources are the mixture's
strata (dozens-to-hundreds at production scale, each internally
parallel up to the cumsum — for a single pathologically dominant
source, shard the permutation space into S independent systematic
draws of budget/S each, which composes on top of this operator
without changing its contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Per-source draw size: the stride is total_chars/TARGET_PICKS, so the
#: systematic walk crosses ~TARGET_PICKS boundaries per source (exactly
#: floor or ceil of it — the systematic-sampling guarantee).
TARGET_PICKS = 10

_PERM_SQL = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

_PPS_ORACLE = f"""
WITH perm AS (
  SELECT doc_id, source, n_chars, {_PERM_SQL} AS pk FROM documents
),
tot AS (
  SELECT source, GREATEST(CAST(SUM(n_chars) // {TARGET_PICKS} AS BIGINT), 1)
           AS stride
  FROM perm GROUP BY source
),
walk AS (
  SELECT p.doc_id, p.source, p.n_chars, t.stride,
         SUM(p.n_chars) OVER (
           PARTITION BY p.source ORDER BY p.pk, p.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM perm p JOIN tot t USING (source)
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(cum // stride AS BIGINT) AS pick_idx
FROM walk
WHERE cum // stride > (cum - n_chars) // stride
"""


@register("pps_token_sample", oracle=_PPS_ORACLE)
def pps_token_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source systematic PPS draw: ~TARGET_PICKS documents picked
    with probability proportional to n_chars, one pick per stride of
    the md5-permuted cumulative-weight walk."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("pk"),
    )
    # Pure integer arithmetic end to end: `div` is Spark's exact long
    # division (floor == truncation for the all-positive operands here),
    # mirroring DuckDB's `//` — no double hop anywhere.
    stride = docs.groupBy("source").agg(
        F.greatest(
            F.expr(f"sum(n_chars) div {TARGET_PICKS}"), F.lit(1).cast("bigint")
        ).alias("stride")
    )
    cum_w = (
        Window.partitionBy("source")
        .orderBy("pk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = docs.join(F.broadcast(stride), "source").withColumn(
        "cum", F.sum("n_chars").over(cum_w)
    )
    picked = walk.filter(
        F.expr("cum div stride > (cum - n_chars) div stride")
    )
    return picked.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.expr("cum div stride").cast("bigint").alias("pick_idx"),
    )
