"""Fourth TPC-H shape batch: Q17 / Q7 / Q8 / Q13 / Q21 analogues — the
correlated-subquery and multi-existential classes.

These five complete the decision-support shapes tpch.py/tpch2.py/
tpch3.py left: a correlated per-group average threshold (Q17, spelled
as a window so the "subquery" costs one shuffle, not a rejoin), a
two-dimension-path join with year breakdown (Q7), a share-of-group
conditional ratio (Q8), a distribution-of-counts including the empty
group (Q13 — the left-join + double-aggregate idiom), and the
sole-failure multi-existential (Q21: EXISTS one peer AND NOT EXISTS
another over the same key — spelled as ONE grouped pass over the
order's items, not two correlated rejoins).

Adaptations to the testdata (no partsupp/commitdate/shipmode):
lateness = shipped >60 days after order date; cost columns derive from
lineitem prices only.

Plan shapes at 100 TB: every "correlated subquery" is a window or a
grouped aggregate on the SAME shuffle key as its consumer (one
exchange, reused); nation (scale-constant) broadcast by hint while
customer/supplier joins are left to Catalyst + AQE (they grow with
SF); nothing rejoins the fact table twice. Money sums follow functions/money.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_REV_SQL = "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)"


def _rev_col() -> F.Column:
    return F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    ).cast("double")


_Q17_ORACLE = """
WITH x AS (
  SELECT l_partkey, l_quantity, l_extendedprice,
         avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
         AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small_lots
FROM x WHERE l_quantity < 0.2 * avg_qty
"""


@register("small_lot_revenue", oracle=_Q17_ORACLE)
def small_lot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue locked in lots below 20% of the part's average
    quantity. The correlated `avg(l_quantity) WHERE same part` subquery
    is a WINDOW over the partkey partition — one shuffle, no rejoin of
    lineitem against its own aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    x = l.select(
        "l_quantity",
        "l_extendedprice",
        F.avg("l_quantity").over(w).alias("avg_qty"),
    ).filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return x.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0
        ).alias("avg_yearly"),
        F.count("*").alias("n_small_lots"),
    )


_Q7_ORACLE = f"""
SELECT n1.n_name AS cust_nation,
       n2.n_name AS supp_nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       {_REV_SQL} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(o.o_orderdate)
"""


@register("bilateral_trade_volume", oracle=_Q7_ORACLE)
def bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: cross-nation revenue by (customer nation, supplier
    nation, year) — the two-dimension-path join; both nation legs
    broadcast, one orderkey shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("nk1"))
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("nk2"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(_rev_col().alias("revenue"))
    )


#: Q8's "market nation" adapted to the testdata's nation domain.
MARKET_NATION = "NATION_7"

_Q8_ORACLE = f"""
WITH t AS (
  SELECT year(o.o_orderdate) AS order_year,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS rev,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
)
SELECT CAST(order_year AS BIGINT) AS order_year,
       CAST(sum(CASE WHEN supp_nation = '{MARKET_NATION}' THEN rev
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(sum(rev) AS DOUBLE) AS market_share,
       CAST(sum(rev) AS DOUBLE) AS total_revenue
FROM t GROUP BY order_year
"""


@register("market_share", oracle=_Q8_ORACLE)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of yearly supplier revenue — the
    conditional-numerator / unconditional-denominator ratio inside a
    single aggregation pass."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    t = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            rev.alias("rev"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    return t.groupBy("order_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == MARKET_NATION, F.col("rev")).otherwise(zero)
            ).cast("double")
            / F.sum("rev").cast("double")
        ).alias("market_share"),
        F.sum("rev").cast("double").alias("total_revenue"),
    )


_Q13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust
GROUP BY n_orders
"""


@register("customer_order_distribution", oracle=_Q13_ORACLE)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: the distribution of per-customer order counts
    INCLUDING the zero-order bucket — left join so empty groups survive,
    then the aggregate-of-aggregate histogram."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


_Q21_ORACLE = """
WITH marked AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey,
         count(*) AS n_suppliers,
         sum(is_late) AS n_late_suppliers,
         max(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_suppkey
  FROM marked GROUP BY l_orderkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(count(*) AS BIGINT) AS n_solely_late_orders
FROM per_order p
JOIN supplier s ON p.late_suppkey = s.s_suppkey
WHERE p.n_suppliers > 1 AND p.n_late_suppliers = 1
GROUP BY s.s_suppkey, s.s_name
"""


@register("sole_blame_suppliers", oracle=_Q21_ORACLE)
def sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY late supplier on finished
    multi-supplier orders. The classic spelling is EXISTS(other
    supplier) AND NOT EXISTS(other late supplier) — two correlated
    rejoins of lineitem; here both existentials collapse into ONE
    grouped pass (count suppliers / count late / argmax the late one),
    so the fact table is shuffled once on (orderkey, suppkey) and once
    on orderkey."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    marked = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60), 1
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = marked.groupBy("l_orderkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("is_late").alias("n_late_suppliers"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_suppkey"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.filter(
            (F.col("n_suppliers") > 1) & (F.col("n_late_suppliers") == 1)
        )
        .join(s, F.col("late_suppkey") == s["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_solely_late_orders"))
    )
