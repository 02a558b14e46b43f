"""Set operations and pivot — the last standard-SQL families the
reference lacks.

SURVEY.md §2.7: "No INTERSECT/EXCEPT/UNION in any SQL" — the reference's
only set-flavored construct is the implicit 4-topic stream union (S3).
§2.4 likewise has no pivot (its lifecycle counters are emitted as rows
and reshaped Python-side, cdc_processor.py:86-99). Filled here:

  - repeat_customers_yoy   INTERSECT: customers active in BOTH 2000 and
                           2001 (the year-over-year retention cohort)
  - churned_customers_yoy  EXCEPT: active in 2000 but gone in 2001 (the
                           churn cohort — the batch form of the
                           reference's recency 'Inactive' label, C4)
  - order_priority_pivot   groupBy(status).pivot(priority): the wide
                           lifecycle-counter matrix as one shuffle

Scale notes: INTERSECT/EXCEPT plan as distinct + semi/anti joins over
only the key column — one exchange per side on o_custkey, with the year
predicate pushed to the parquet scan so each side reads one partition's
worth of dates. Pivot uses an EXPLICIT value list (the 5 priority
levels): Spark then plans a single partial+final hash aggregate with no
values-discovery pre-pass, and the output schema is fixed — at 100 TB a
dynamic pivot would pay one extra full scan just to learn the columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _year_custkeys(orders: DataFrame, year: int) -> DataFrame:
    return orders.filter(
        (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("date"))
    ).select("o_custkey")


_REPEAT_ORACLE = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= DATE '2000-01-01' AND o_orderdate < DATE '2001-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= DATE '2001-01-01' AND o_orderdate < DATE '2002-01-01'
"""


@register("repeat_customers_yoy", oracle=_REPEAT_ORACLE)
def repeat_customers_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who ordered in both 2000 and 2001 — INTERSECT (distinct
    set semantics, planned as distinct + left-semi on the key only)."""
    orders = load_table(spark, sf_dir, "orders")
    return _year_custkeys(orders, 2000).intersect(_year_custkeys(orders, 2001))


_CHURNED_ORACLE = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= DATE '2000-01-01' AND o_orderdate < DATE '2001-01-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= DATE '2001-01-01' AND o_orderdate < DATE '2002-01-01'
"""


@register("churned_customers_yoy", oracle=_CHURNED_ORACLE)
def churned_customers_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 2000 with no 2001 order — EXCEPT (distinct +
    left-anti); the cohort the reference labels 'Inactive' one row at a
    time (batch_processor.py:140-142)."""
    orders = load_table(spark, sf_dir, "orders")
    return _year_custkeys(orders, 2000).subtract(_year_custkeys(orders, 2001))


_PIVOT_COLS = ", ".join(
    f"""CAST(count(*) FILTER (WHERE o_orderpriority = '{p}') AS BIGINT) AS "{p}" """
    for p in _PRIORITIES
)

_PIVOT_ORACLE = f"""
SELECT o_orderstatus, {_PIVOT_COLS}
FROM orders GROUP BY o_orderstatus
"""


@register("order_priority_pivot", oracle=_PIVOT_ORACLE)
def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts by status, one column per priority — explicit-values
    pivot, a single partial+final hash aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PRIORITIES)
    )
