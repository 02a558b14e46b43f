"""Exact weighted median — quantity-weighted price medians per group.

The percentile surfaces already in the engine (price_deciles,
rolling_median_value, segment percentiles) are all UNWEIGHTED; pricing
analytics wants the quantity-weighted median ("the price at which half
the UNITS moved", not half the line items). Exact spelling, no
approx-percentile: per (returnflag, linestatus) the lower weighted
median — the smallest price v with 2·cumweight(v) ≥ totalweight.

Plan, in order:
  1. collapse to (group, price_cents) with summed weight FIRST — the
     cumulative window then runs over NDV(price) rows per group, not
     raw line items (at 100 TB: thousands of distinct cents values per
     group vs billions of rows; the collapse is a map-side partial
     agg);
  2. one cumulative ROWS window ordered by price_cents (tie-free after
     the collapse, so ROWS == RANGE semantics — deterministic);
  3. total weight via the same partition's unbounded frame;
  4. min(price) where 2·cum ≥ total.

Determinism: prices ride exact integer cents, weights exact BIGINT
quantities — pure integer arithmetic end-to-end, hash-exact vs DuckDB.

Scale: one shuffle on (group, price) for the collapse, one on group
for the window; groups are the 4-6 TPC-H flag pairs — skew-free tiny
window partitions after the collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_WMEDIAN_ORACLE = """
WITH collapsed AS (
  SELECT l_returnflag, l_linestatus,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS price_cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem
  GROUP BY 1, 2, 3
),
cum AS (
  SELECT *,
         SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus
                      ORDER BY price_cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus) AS tw
  FROM collapsed
)
SELECT l_returnflag, l_linestatus,
       CAST(MIN(tw) AS BIGINT) AS units_total,
       CAST(MIN(CASE WHEN 2 * cw >= tw THEN price_cents END) AS BIGINT)
         AS wmedian_cents
FROM cum
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("weighted_median_price", oracle=_WMEDIAN_ORACLE)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (returnflag, linestatus): exact quantity-weighted lower
    median of extendedprice, in integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    collapsed = li.groupBy(
        "l_returnflag",
        "l_linestatus",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("w"))
    grp = Window.partitionBy("l_returnflag", "l_linestatus")
    cum = collapsed.select(
        "l_returnflag",
        "l_linestatus",
        "price_cents",
        F.sum("w")
        .over(
            grp.orderBy("price_cents").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cw"),
        F.sum("w").over(grp).alias("tw"),
    )
    return (
        cum.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.min("tw").cast("bigint").alias("units_total"),
            F.min(
                F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_cents"))
            )
            .cast("bigint")
            .alias("wmedian_cents"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
