"""Market concentration — exact-arithmetic Herfindahl index per brand.

"How concentrated is each brand's supply across suppliers?" is the
standard concentration question (procurement risk, antitrust screens).
The Herfindahl-Hirschman index is Σ share_i² — naively a float SUM over
per-supplier shares, which is parallel-order-dependent and banned by
the engine's determinism contract. The exact spelling uses the algebra
instead:

    HHI = Σ (q_i / Q)² = (Σ q_i²) / Q²

Both Σ q_i² and Q = Σ q_i are exact integer sums (order-independent);
the index is then ONE float division per output row, round 6 — the
same trick trend.py/autocorr.py use for sufficient statistics, applied
to a ratio-of-squares metric. Supplier quantities ride BIGINT; the
squared sum accumulates in decimal(38,0) so a hot supplier cannot wrap
int64 at scale (the autocorr.py lesson).

Scale: lineitem collapses to (brand, supplier, units) in one hash-agg
with map-side partials after a broadcast-or-shuffled join to part for
the brand (AQE's call — part grows with the corpus, never
hint-broadcast, the r6 rule); the HHI agg then runs on the
|brands|×|suppliers| frame. n_suppliers rides along for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_HHI_ORACLE = """
WITH bs AS (
  SELECT p.p_brand, l.l_suppkey,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(q) AS BIGINT) AS units_total,
       round(CAST(SUM(CAST(q AS HUGEINT) * q) AS DOUBLE)
             / (CAST(SUM(q) AS DOUBLE) * SUM(q)), 6) AS hhi_r
FROM bs
GROUP BY 1
ORDER BY 1
"""


@register("market_concentration_hhi", oracle=_HHI_ORACLE)
def market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand supplier-concentration HHI from exact integer
    sufficient statistics (Σq² / Q²) — no float accumulation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bs = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"))
    )
    q_dec = F.col("q").cast("decimal(38,0)")
    return (
        bs.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.sum("q").cast("bigint").alias("units_total"),
            F.round(
                F.sum(q_dec * q_dec).cast("double")
                / (
                    F.sum("q").cast("double") * F.sum("q")
                ),
                6,
            ).alias("hhi_r"),
        )
        .orderBy("p_brand")
    )
