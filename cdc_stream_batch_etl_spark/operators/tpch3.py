"""Third TPC-H shape batch: Q4 / Q12 / Q16 / Q18 / Q6 analogues —
completing the canonical decision-support join/agg classes.

With tpch.py (Q3/Q5/Q10) and tpch2.py (Q14/Q2/Q22) this covers every
structurally distinct shape in the classic suite the testdata can
express: existential semi-join with a cross-table predicate (Q4),
two-way conditional classification over a fact join (Q12), distinct-
count against an excluded-set anti-join (Q16), a HAVING-gated semi-join
on an aggregate (Q18), and the selective single-scan band aggregate
(Q6). Dates/attributes are adapted to the testdata domains (no
commitdate/receiptdate/shipmode columns: lateness = shipped >60 days
after order; shipmode proxy = l_linestatus).

Plan shapes at 100 TB: the only corpus-sized operations are single
scans of lineitem/orders and one orderkey-keyed shuffle per query;
nation broadcast by hint, customer/supplier/part joins left to AQE
(they grow with SF); Q18's aggregate-gate reduces lineitem BEFORE
joining order/customer detail (never the reverse); Q6 is one scan, one
1-row aggregate, zero joins. Money sums follow functions/money.py.

Reference anchor: beyond-reference relational coverage (the reference's
four batch queries are 1-2 join plans, ref python/batch_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_Q4_ORACLE = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
"""


@register("late_order_priorities", oracle=_Q4_ORACLE)
def late_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders per priority with at least one lineitem shipped
    more than 60 days after the order date — left-semi join where the
    predicate spans both sides (equi on orderkey + the lateness bound)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o["o_orderkey"] == l["l_orderkey"])
            & (l["l_shipdate"] > F.date_add(o["o_orderdate"], 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
    )


_Q12_ORACLE = """
SELECT l.l_linestatus,
       CAST(count(*) FILTER (
         WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')) AS BIGINT)
         AS n_high_priority,
       CAST(count(*) FILTER (
         WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS BIGINT)
         AS n_low_priority
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= DATE '1996-01-01'
  AND l.l_shipdate < DATE '1997-01-01'
GROUP BY l.l_linestatus
"""


@register("priority_shipping_split", oracle=_Q12_ORACLE)
def priority_shipping_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per line status, how many shipped items belonged to
    high- vs low-priority orders — the two-way conditional census."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("n_high_priority"),
            F.count(F.when(~high, 1)).alias("n_low_priority"),
        )
    )


_Q16_ORACLE = """
SELECT p.p_brand, p.p_type,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_suppkey NOT IN (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
)
GROUP BY p.p_brand, p.p_type
"""


@register("part_supplier_variety", oracle=_Q16_ORACLE)
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier count per (brand, type), excluding
    a subquery-defined supplier set (negative balance standing in for
    Q16's complaint filter) — anti-join + exact distinct count."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        l.join(excluded, l["l_suppkey"] == excluded["s_suppkey"], "left_anti")
        .join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
    )


#: Q18 volume gate, adapted to the testdata's qty distribution
#: (per-order sum peaks ~460; 300 keeps the result selective).
BULK_QTY = 300

_Q18_ORACLE = f"""
WITH vol AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > {BULK_QTY}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, v.total_qty
FROM vol v
JOIN orders o ON v.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


@register("bulk_order_customers", oracle=_Q18_ORACLE)
def bulk_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: customers holding orders whose total quantity exceeds
    the bulk gate — the aggregate is computed and HAVING-filtered on the
    fact side FIRST, then the (tiny) surviving keys join order/customer
    detail."""
    l = load_table(spark, sf_dir, "lineitem")
    vol = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > BULK_QTY)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        vol.join(o, vol["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


_Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue_delta,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
"""


@register("forecast_revenue_change", oracle=_Q6_ORACLE)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: revenue foregone to a discount band — one scan with
    every predicate pushed to parquet, one 1-row aggregate, no joins."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return l.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue_delta"),
        F.count("*").alias("n_lineitems"),
    )
