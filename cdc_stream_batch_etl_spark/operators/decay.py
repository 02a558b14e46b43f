"""Half-life-decayed demand — time-decayed popularity with EXACT
integer arithmetic.

Recency-weighted popularity (freshness-decayed counts) is the standard
ranking signal for feeds, autocomplete, and training-data recency
mixing; the float spelling sum(qty · 0.5^age) is order-dependent once
ages span more than the 53-bit mantissa, which makes it both
nondeterministic under re-partitioning and un-oracle-able. The exact
spelling used here scales the weight to integer units of 2⁻²⁰:

    weight_scaled = 2^(CAP − min(age_weeks, CAP))   (CAP = 20)
    demand_scaled = Σ qty · weight_scaled           (pure BIGINT)

so the aggregate is an integer sum — associative, partition-order-free,
bit-identical cross-engine — and the presented double is
demand_scaled / 2²⁰, exact while demand_scaled < 2⁵³ (the sf range
here; at larger scale the BIGINT column is the authoritative one and is
also emitted). The age anchor is the corpus max ship date (the frozen-
now idiom, orders.py C10), so the query is reproducible.

power(2, k) for integer k ≤ 20 is exact in IEEE double in both engines,
so the CAST to BIGINT is safe; the weekly bucket + CAP keeps the weight
table at 21 distinct values (a decode CASE would also do — the point is
no float accumulates).

Scale: one scan; the anchor is a 1-row derived scalar (broadcast);
group-by l_partkey is a map-side-combined hash agg on a uniform key;
top-50 is a TakeOrdered, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

DECAY_CAP_WEEKS = 20
TOP_PARTS = 50
_SCALE = 1 << DECAY_CAP_WEEKS

_DECAY_ORACLE = f"""
WITH anchor AS (SELECT max(l_shipdate) AS a FROM lineitem),
w AS (
  SELECT l.l_partkey,
         CAST(l.l_quantity AS BIGINT)
           * CAST(power(2, {DECAY_CAP_WEEKS} - least(
               CAST(floor(date_diff('day', l.l_shipdate, an.a) / 7) AS BIGINT),
               {DECAY_CAP_WEEKS})) AS BIGINT) AS wq
  FROM lineitem l CROSS JOIN anchor an
)
SELECT l_partkey,
       CAST(sum(wq) AS BIGINT) AS demand_scaled,
       CAST(sum(wq) AS DOUBLE) / {_SCALE} AS demand
FROM w
GROUP BY l_partkey
ORDER BY demand_scaled DESC, l_partkey
LIMIT {TOP_PARTS}
"""


@register("half_life_popularity", oracle=_DECAY_ORACLE)
def half_life_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top parts by half-life-decayed quantity (half-life = 1 week,
    floor-capped at 20 weeks) — exact integer-scaled decay."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_shipdate"
    )
    anchor = li.agg(F.max("l_shipdate").alias("a"))
    # explicit floor on BOTH sides: DuckDB's CAST(double AS BIGINT)
    # rounds-half-even while Spark's truncates — the one cast-semantics
    # trap in this module
    age_w = F.least(
        F.floor(F.datediff(F.col("a"), F.col("l_shipdate")) / 7).cast("bigint"),
        F.lit(DECAY_CAP_WEEKS),
    )
    wq = F.col("l_quantity").cast("bigint") * F.pow(
        F.lit(2.0), (F.lit(DECAY_CAP_WEEKS) - age_w).cast("double")
    ).cast("bigint")
    return (
        li.crossJoin(F.broadcast(anchor))
        .select("l_partkey", wq.alias("wq"))
        .groupBy("l_partkey")
        .agg(F.sum("wq").cast("bigint").alias("demand_scaled"))
        .select(
            "l_partkey",
            "demand_scaled",
            (F.col("demand_scaled").cast("double") / _SCALE).alias("demand"),
        )
        .orderBy(F.desc("demand_scaled"), "l_partkey")
        .limit(TOP_PARTS)
    )
