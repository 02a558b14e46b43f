"""Group-aware K-fold cross-validation assignment (GroupKFold — the
grouped splitter every leakage-aware eval pipeline uses, e.g.
scikit-learn's GroupKFold; beyond-reference, SURVEY §2.11 ML-eval
family, completing stratified_kfold (row-shuffled) and
time_series_cv_folds (temporal) with the GROUPED axis).

stratified_kfold assigns ROWS to folds — if one customer's orders land
in both train and test, a model memorizing that customer leaks across
the split. GroupKFold assigns the GROUP (customer) to exactly one fold
so every row of a group stays together. Assignment is content-
addressed: fold(c) = md5-hash(custkey) mod K — the repo's sampling
idiom (train_test_split, stratified_sample), so the split is
reproducible across runs, engines, partitionings, and data arrivals
(a new customer's fold never depends on who else is in the corpus).

The report row per fold carries what an eval harness balances on:
customer count, order count, exact revenue mass (decimal inside,
double at export — the tscv lesson), and the share of customers with
zero orders (fold-balance sanity for cold-start groups).

Scale: one customer scan + one orders scan; orders join customer-fold
on custkey (both sides hash-partitioned on the key); the final agg is
K=5 rows. The md5 assignment needs no global state — no window, no
sort, no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup import hash64_expr, hash64_sql
from ..registry import register

K_FOLDS = 5

_GKFOLD_ORACLE = f"""
WITH cf AS (
  SELECT c_custkey,
         {hash64_sql("CAST(c_custkey AS VARCHAR)")} % {K_FOLDS} AS fold
  FROM customer
),
per_cust AS (
  SELECT cf.fold, cf.c_custkey,
         count(o.o_orderkey) AS n_orders,
         CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DECIMAL(18,2)) AS spend
  FROM cf LEFT JOIN orders o ON o.o_custkey = cf.c_custkey
  GROUP BY 1, 2
)
SELECT fold,
       count(*) AS n_customers,
       CAST(sum(n_orders) AS BIGINT) AS n_orders,
       CAST(CAST(sum(spend) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue,
       CAST(count(*) FILTER (WHERE n_orders = 0) AS DOUBLE) / count(*) AS zero_order_share
FROM per_cust
GROUP BY fold
ORDER BY fold
"""


@register("group_kfold_assignment", oracle=_GKFOLD_ORACLE)
def group_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fold, n_customers, n_orders, total_revenue, zero_order_share) —
    K folds where each customer (group) lands in exactly one fold."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cf = customer.select(
        "c_custkey",
        (
            F.expr(hash64_expr("cast(c_custkey as string)")) % K_FOLDS
        ).alias("fold"),
    )
    per_cust = (
        cf.join(orders, cf.c_custkey == orders.o_custkey, "left")
        .groupBy("fold", "c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
            )
            .cast("decimal(18,2)")
            .alias("spend"),
        )
    )
    return (
        per_cust.groupBy("fold")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("spend")
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_revenue"),
            (
                F.count(F.when(F.col("n_orders") == 0, 1)).cast("double")
                / F.count("*")
            ).alias("zero_order_share"),
        )
        .orderBy("fold")
    )
