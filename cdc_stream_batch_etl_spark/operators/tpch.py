"""Classic multi-join analytics: TPC-H Q3/Q5/Q10 shapes.

The reference's four batch queries are all one- or two-join plans
(SURVEY §2.3); a general analytics engine also has to execute the
canonical 3-6 table star joins well. These three shapes cover the
classes the parity set doesn't: selective fact-fact join with top-k
(Q3), a 6-table snowflake with an equality constraint BETWEEN two
dimension paths (Q5: the customer's nation must equal the supplier's),
and a group-by over a wide dimension row with a selective fact filter
(Q10). Dates/segments are adapted to the testdata's domains
(o_orderdate 1995-2001, segments BUILDING..., regions ASIA...).

Plan shape at 100 TB (asserted by the bench + PLANS.md profile):
scale-constant dimensions (region: 5 rows, nation: 25) carry explicit
broadcast hints; customer/supplier/part grow linearly with SF
(SF×150k/10k/200k rows — tens of GB at the 100 TB regime), so their
join strategy is left to Catalyst + AQE, which still broadcasts them
at any SF where they fit under autoBroadcastJoinThreshold and degrades
to shuffled-hash/sort-merge — never an OOM — beyond it
(tests/test_bucketing.py::test_customer_orders_join_degrades_without_broadcast).
The only unavoidable corpus-sized shuffles are the orders⋈lineitem
join keyed on orderkey and the final group-by; top-k is
TakeOrderedAndProject, never a global sort. Revenue sums follow functions/money.py (decimal(18,6) for the
discount product) so parallel aggregation order cannot perturb parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_REV_SQL = "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)"


def _rev_col() -> F.Column:
    return (
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
        )
        .cast("double")
    )


_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       {_REV_SQL} AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-03-15'
  AND l.l_shipdate > DATE '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("shipping_priority", oracle=_Q3_ORACLE)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: top-10 unshipped BUILDING-segment orders by revenue."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("date")
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_rev_col().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q5_ORACLE = f"""
SELECT n.n_name,
       {_REV_SQL} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
GROUP BY n.n_name
"""


@register("local_supplier_volume", oracle=_Q5_ORACLE)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue by nation where the supplier is LOCAL to the
    customer (the two dimension paths constrained equal) — the 6-table
    snowflake. nation/region (scale-constant) broadcast by hint;
    customer/supplier join strategy is AQE's call (they scale with SF);
    only orders⋈lineitem must shuffle corpus-sized rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (l["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(_rev_col().alias("revenue"))
    )


_Q10_ORACLE = f"""
SELECT c.c_custkey,
       c.c_name,
       {_REV_SQL} AS revenue,
       c.c_acctbal,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= DATE '1996-10-01'
  AND o.o_orderdate < DATE '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("returned_item_report", oracle=_Q10_ORACLE)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by revenue lost to returns in a
    quarter — selective fact filter, wide dimension group-by."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_col().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
