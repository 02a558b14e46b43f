"""Blocking-key efficiency audit for the transaction-dedup screen —
block-size distribution, candidate-pair mass, and cap losses
(Christen, "A Survey of Indexing Techniques for Scalable Record
Linkage and Deduplication", TKDE 2012 defines reduction ratio /
blocking quality; beyond-reference, SURVEY §2.11 dedup family).

duplicate_order_pairs screens double-charges by blocking on
(customer, exact cents) and capping blocks at MAX_BLOCK. Whether that
blocking is any good is an empirical question this report answers
without running the join: per block size s — the quantity that drives
everything, since a block contributes s·(s−1)/2 candidate pairs —
the number of blocks, rows, and candidate pairs, whether the size is
over the cap (those pairs are DROPPED by the screen: visible loss,
not silent), and each size's share of the total candidate mass. The
reduction-ratio numerator (Σ candidates vs N·(N−1)/2 full pairs) is
readable off the table; a blocking key whose largest sizes carry most
of the mass is too coarse, one with all singletons is too fine to
recall anything.

Determinism: sizes and pair counts are exact integers (s·(s−1)/2 in
BIGINT); the share is one IEEE division by the exact total, NULL when
the blocking yields no candidate pairs at all (the all-singleton
corpus — an explicit zero-guard in both engines, the burstiness rule).

Scale: one orders scan → (custkey, cents) hash agg sizes the blocks →
|distinct sizes| hash agg builds the histogram; the scalar total is a
1-row broadcast (the revenue_analytics zero-guard posture). The
quadratic object (the pair join itself) is never built here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .duporders import MAX_BLOCK

_BLOCKING_ORACLE = f"""
WITH o AS (
  SELECT o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
blocks AS (
  SELECT o_custkey, cents, CAST(count(*) AS BIGINT) AS block_size
  FROM o GROUP BY 1, 2
),
hist AS (
  SELECT block_size,
         CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(block_size * count(*) AS BIGINT) AS n_rows,
         CAST(block_size * (block_size - 1) / 2 * count(*) AS BIGINT)
           AS candidate_pairs
  FROM blocks GROUP BY block_size
),
tot AS (SELECT sum(candidate_pairs) AS total_pairs FROM hist)
SELECT block_size, n_blocks, n_rows, candidate_pairs,
       block_size > {MAX_BLOCK} AS capped,
       CASE WHEN tot.total_pairs = 0 THEN NULL
            ELSE CAST(candidate_pairs AS DOUBLE) / tot.total_pairs END
         AS candidate_share
FROM hist CROSS JOIN tot
ORDER BY block_size
"""


@register("blocking_efficiency_report", oracle=_BLOCKING_ORACLE)
def blocking_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(block_size, n_blocks, n_rows, candidate_pairs, capped,
    candidate_share) — the (custkey, cents) blocking-key audit."""
    orders = load_table(spark, sf_dir, "orders")
    blocks = orders.select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    ).groupBy("o_custkey", "cents").agg(
        F.count("*").cast("bigint").alias("block_size")
    )
    hist = blocks.groupBy("block_size").agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        (F.col("block_size") * F.count("*")).cast("bigint").alias("n_rows"),
        (F.col("block_size") * (F.col("block_size") - 1) / 2 * F.count("*"))
        .cast("bigint")
        .alias("candidate_pairs"),
    )
    total = hist.agg(F.sum("candidate_pairs").alias("total_pairs"))
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            "block_size",
            "n_blocks",
            "n_rows",
            "candidate_pairs",
            (F.col("block_size") > MAX_BLOCK).alias("capped"),
            F.when(F.col("total_pairs") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.col("candidate_pairs").cast("double") / F.col("total_pairs")
            )
            .alias("candidate_share"),
        )
        .orderBy("block_size")
    )
