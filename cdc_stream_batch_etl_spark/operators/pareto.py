"""Pareto frontier (2-D skyline) — non-dominated orders.

Skyline queries ("show the orders no other order beats on BOTH price
and recency") are a standard OLAP surface the engine lacked: an order
is on the frontier iff no other order has totalprice ≥ AND orderdate ≥
with at least one strict. The naive spelling is a quadratic NOT EXISTS
self-join; the exact linear-after-sort spelling used here is two
value-based window maxima:

  m_hi = max(orderdate) over rows with STRICTLY higher totalprice
         (ORDER BY cents DESC RANGE BETWEEN UNBOUNDED PRECEDING AND
         1 PRECEDING — see the frame-class note below)
  m_eq = max(orderdate) over rows with EQUAL totalprice
         (RANGE BETWEEN CURRENT ROW AND CURRENT ROW)

Frame-class pitfall (measured, not theoretical): the same suffix-max
spelled ascending — RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
— benched 254 s at sf0.1 because Spark's
UnboundedFollowingWindowFunctionFrame RECOMPUTES the aggregate from
the current row to the partition end for every row: O(n²). Flipping
the sort direction makes the identical quantity an
UnboundedPrecedingWindowFunctionFrame — rows only ever ENTER the
frame, the max updates incrementally, O(n) — 254 s → sub-second.
Design rule: never put an aggregate on an UNBOUNDED FOLLOWING frame
over a data-sized partition; reverse the ORDER BY instead.

keep iff (m_hi IS NULL OR m_hi < d) AND m_eq <= d — a strictly
pricier order dominates at EQUAL date (strict in one dim suffices),
while an equal-price order needs a strictly later date. Exact ties on
both dimensions survive together (neither dominates), matching the
strict skyline definition. The planted-point pytest
(tests/test_pareto.py) pins exactly these tie cases — the DuckDB
oracle alone cannot, since a mirrored off-by-one passes both engines.

Determinism: the frame bounds ride exact integer cents (decimal(18,2)
× 100 → BIGINT); RANGE frames are value-based, so rows tied on price
see identical frames in Spark and DuckDB — hash-exact cross-engine.

Scale: ONE range-partitioned global sort on cents (the window), then a
scan-local filter; output is the frontier (tiny — staircase of the
max-date envelope). For 100 TB, pre-prune per partition first: the
skyline of a union is the skyline of the per-partition skylines, so a
partition-local frontier pass (same two windows inside
repartition+sortWithinPartitions) shrinks the global sort's input by
orders of magnitude before the exact pass; the global spelling below
is already the correct final step of that plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_PARETO_ORACLE = """
WITH pts AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
         o_orderdate
  FROM orders
),
w AS (
  SELECT *,
         max(o_orderdate) OVER (ORDER BY price_cents DESC
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_hi,
         max(o_orderdate) OVER (ORDER BY price_cents
           RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS m_eq
  FROM pts
)
SELECT o_orderkey, price_cents, o_orderdate
FROM w
WHERE (m_hi IS NULL OR m_hi < o_orderdate) AND m_eq <= o_orderdate
ORDER BY price_cents DESC, o_orderkey
"""


@register("pareto_frontier_orders", oracle=_PARETO_ORACLE)
def pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders not dominated on (totalprice, orderdate) — exact 2-D
    skyline via suffix-max RANGE windows on integer cents."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
        "o_orderdate",
    )
    return skyline(o)


def skyline(o: DataFrame) -> DataFrame:
    """Core 2-D skyline over (o_orderkey, price_cents, o_orderdate) —
    split out so tests can plant dominated/tied points (real data's
    frontier shape is not hand-checkable)."""
    # SQL-text windows so the frame spelling is literally the oracle's
    # (and unambiguous under the DESC ordering)
    m_hi = F.expr(
        "max(o_orderdate) OVER (ORDER BY price_cents DESC "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    m_eq = F.expr(
        "max(o_orderdate) OVER (ORDER BY price_cents "
        "RANGE BETWEEN CURRENT ROW AND CURRENT ROW)"
    )
    return (
        o.withColumn("m_hi", m_hi)
        .withColumn("m_eq", m_eq)
        .filter(
            (F.col("m_hi").isNull() | (F.col("m_hi") < F.col("o_orderdate")))
            & (F.col("m_eq") <= F.col("o_orderdate"))
        )
        .select("o_orderkey", "price_cents", "o_orderdate")
        .orderBy(F.desc("price_cents"), "o_orderkey")
    )
