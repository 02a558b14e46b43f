"""Second TPC-H shape batch: Q14 / Q2 / Q22 analogues.

operators/tpch.py covers the fact-heavy star shapes (Q3/Q5/Q10); these
three cover the remaining canonical classes a general engine must run
well: conditional-aggregate share-of-total (Q14), per-group argmin
against a derived cost (Q2's min-cost supplier, re-expressed without a
partsupp table — the testdata links parts to suppliers through
lineitem), and anti-join + broadcast scalar subquery (Q22's "customers
with above-average balance who never ordered").

Plan shape at 100 TB: nation (25 rows, scale-constant) broadcast by
hint; part/supplier scale linearly with SF, so their join strategy is
left to Catalyst + AQE (broadcast while small, shuffled join — never
an OOM — at scale); the only
corpus-sized operations are one scan of lineitem per query plus a
single keyed shuffle (month, partkey, nationkey respectively). The Q22
scalar average is a 1-row broadcast crossJoin (the linalg stride idiom),
never a collect. Money sums follow functions/money.py decimal casting so
parallel aggregation order cannot perturb parity; ratios divide the two
exact decimal sums in IEEE double, identical in both engines.

Reference anchor: beyond-reference relational coverage (the reference's
four batch queries are 1-2 join plans, ref python/batch_queries.py);
same adaptation conventions as operators/tpch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_REV_SQL = "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)"
_PROMO_REV_SQL = (
    "CAST(sum(CASE WHEN p_type = 'PROMO' "
    "THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) "
    "ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)"
)


def _rev_col() -> F.Column:
    return F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    ).cast("double")


def _promo_rev_col() -> F.Column:
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,6)"))
    ).cast("double")


_Q14_ORACLE = f"""
SELECT date_trunc('month', l.l_shipdate) AS ship_month,
       {_PROMO_REV_SQL} AS promo_revenue,
       {_REV_SQL} AS total_revenue,
       100.0 * {_PROMO_REV_SQL} / {_REV_SQL} AS promo_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1996-01-01'
  AND l.l_shipdate < DATE '1997-01-01'
GROUP BY date_trunc('month', l.l_shipdate)
"""


@register("promo_revenue_share", oracle=_Q14_ORACLE)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: monthly share of revenue from PROMO-type parts —
    conditional aggregate over a 2-column part projection (AQE picks
    broadcast while the projection fits, shuffled join at scale)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            _promo_rev_col().alias("promo_revenue"),
            _rev_col().alias("total_revenue"),
        )
        .select(
            "ship_month",
            "promo_revenue",
            "total_revenue",
            (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
                "promo_share"
            ),
        )
    )


_Q2_ORACLE = """
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         l_extendedprice / l_quantity AS unit_cost
  FROM lineitem
), mc AS (
  SELECT l_partkey, min(unit_cost) AS unit_cost FROM unit GROUP BY 1
), best AS (
  -- two scalar aggs instead of min(struct_pack(...)): identical argmin
  -- semantics (min cost, then min suppkey among the cost ties — the
  -- tie direction struct-min encodes), but DuckDB's struct-min grew
  -- >125 GB resident at sf1 and OOM-killed two sweep runs (r12); the
  -- scalar form runs in hash-agg memory
  SELECT u.l_partkey, m.unit_cost, min(u.l_suppkey) AS s_suppkey
  FROM unit u JOIN mc m
    ON u.l_partkey = m.l_partkey AND u.unit_cost = m.unit_cost
  GROUP BY u.l_partkey, m.unit_cost
)
SELECT p.p_partkey, p.p_name, b.unit_cost, b.s_suppkey, s.s_name, n.n_name
FROM best b
JOIN part p ON b.l_partkey = p.p_partkey
JOIN supplier s ON b.s_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


@register("min_cost_supplier", oracle=_Q2_ORACLE)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: the cheapest supplier per part by observed unit price
    (extendedprice/quantity), ties broken by smallest suppkey via the
    struct-min convention (the semantic.py argmax idiom, inverted).
    One lineitem scan, one partkey-keyed shuffle; nation broadcast by
    hint, part/supplier joins left to AQE (they grow with SF)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
    )
    best = (
        l.groupBy("l_partkey")
        .agg(
            F.min(F.struct(F.col("unit_cost").alias("c"), F.col("l_suppkey").alias("sk"))).alias("t")
        )
        .select("l_partkey", F.col("t.c").alias("unit_cost"), F.col("t.sk").alias("s_suppkey"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        best.alias("b")
        .join(p, F.col("b.l_partkey") == p["p_partkey"])
        .join(s.alias("s"), F.col("b.s_suppkey") == F.col("s.s_suppkey"))
        .join(F.broadcast(n), F.col("s.s_nationkey") == n["n_nationkey"])
        .select(
            "p_partkey", "p_name", "unit_cost", "b.s_suppkey", "s_name", "n_name"
        )
    )


_Q22_ORACLE = """
WITH cavg AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
CROSS JOIN cavg
WHERE c.c_acctbal > cavg.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY n.n_name
"""


@register("customer_reach", oracle=_Q22_ORACLE)
def customer_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per nation, customers with above-average balance who
    never placed an order — broadcast 1-row scalar subquery + left-anti
    join. The anti join shuffles on custkey (or broadcasts orders' key
    projection when it fits); the average is never collect()ed."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
    )
