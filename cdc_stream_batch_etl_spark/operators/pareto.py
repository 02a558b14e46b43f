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

Scale: the exact global pass is ONE single-partition window (the
honest cost of a total order), so the 100 TB plan prunes FIRST: the
skyline of a union is the skyline of the per-partition skylines, so
applying the identical two-window filter per physical partition
(PARTITION BY spark_partition_id — one balanced hash exchange, then
32/1000-way parallel O(n) windows) keeps a SUPERSET of the global
frontier that is roughly |frontier|·#partitions rows, and only that
superset enters the global window. Every globally non-dominated point
is non-dominated within its own partition, so the pre-prune is exact —
asserted by tests/test_pareto.py::test_local_preprune_is_exact, and
the registered query runs WITH the prune (same oracle, same result).
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
    return skyline(o, pre_prune=True)


def _frontier_filter(df: DataFrame, partition_by: str = "") -> DataFrame:
    """The two-window skyline filter; with ``partition_by`` it runs
    per-group (the partition-local prune), without it globally (the
    exact pass). SQL-text windows so the frame spelling is literally
    the oracle's (and unambiguous under the DESC ordering)."""
    part = f"PARTITION BY {partition_by} " if partition_by else ""
    m_hi = F.expr(
        f"max(o_orderdate) OVER ({part}ORDER BY price_cents DESC "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    m_eq = F.expr(
        f"max(o_orderdate) OVER ({part}ORDER BY price_cents "
        "RANGE BETWEEN CURRENT ROW AND CURRENT ROW)"
    )
    return (
        df.withColumn("m_hi", m_hi)
        .withColumn("m_eq", m_eq)
        .filter(
            (F.col("m_hi").isNull() | (F.col("m_hi") < F.col("o_orderdate")))
            & (F.col("m_eq") <= F.col("o_orderdate"))
        )
        .select("o_orderkey", "price_cents", "o_orderdate")
    )


def skyline(o: DataFrame, pre_prune: bool = False) -> DataFrame:
    """Core 2-D skyline over (o_orderkey, price_cents, o_orderdate) —
    split out so tests can plant dominated/tied points (real data's
    frontier shape is not hand-checkable).

    pre_prune=True first drops every point dominated WITHIN its own
    physical partition (same rule, PARTITION BY spark_partition_id),
    so the exact single-partition pass only sorts the per-partition
    frontiers' union. Exact: local domination implies global
    domination never removes a global-frontier point."""
    if pre_prune:
        o = (
            _frontier_filter(
                o.withColumn("_pid", F.spark_partition_id()), "_pid"
            )
        )
    return _frontier_filter(o).orderBy(F.desc("price_cents"), "o_orderkey")
