"""Market-basket co-occurrence — the co-purchase pair graph.

Beyond-reference operator (the reference's closest shape is the
order_items FK join feeding per-product aggregates, SURVEY.md J2/A5;
it never relates products to EACH OTHER). Co-occurrence mining is the
canonical "pair explosion bounded by group size" distributed pattern —
the same shape as recommendation co-visitation, n-gram co-occurrence,
and feature-cross building in a training pipeline.

Plan: project lineitem to DISTINCT (order, part) — dedup first, so a
part ordered twice in one basket doesn't double-count — then self-join
on the ORDER key with an anti-symmetric part predicate (a < b: each
unordered pair once), then one hash-agg on the pair. The output keeps
pairs with support ≥ MIN_SUPPORT (singleton pairs are noise for any
downstream use and would dominate the result 30:1).

Scale: the self-join key is l_orderkey — fan-out per key is the BASKET
SIZE, which the schema bounds (TPC-H: ≤ 7 lineitems; measured ≤ 13
distinct parts at sf0.01), so the pair stage is O(rows × basket), not
O(rows²). A marketplace with unbounded carts would cap the basket like
dedup/minhash.py's MAX_BUCKET (drop-and-report, fail open); here the
bound is structural so no cap is wired. The pair agg shuffles on
(part_a, part_b) — uniform keys, map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

MIN_SUPPORT = 2

_COPURCHASE_ORACLE = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a,
       b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM li a
JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= {MIN_SUPPORT}
"""


@register("copurchase_pairs", oracle=_COPURCHASE_ORACLE)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered part pairs bought together in ≥ MIN_SUPPORT orders."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= MIN_SUPPORT)
    )
