"""Erasure-cascade audit — sizing a right-to-be-forgotten delete before
running it.

A GDPR/CCPA erasure request names data subjects; actually erasing them
means walking the FK graph (operators/fkaudit.py's declared edges:
orders.o_custkey → customer, events.user_id → customer, lineitem via
orders) and deleting or anonymizing every dependent row. Doing that
blind on a 100 TB lake is how you discover mid-job that one subject
owns half a partition. This operator is the pre-flight: for a
deterministic 1% subject cohort (the hash-seeded stand-in for a real
request list — swap in an actual key list in production), the number
of dependent rows and distinct subjects per table, one row per table
in the cascade.

Determinism: the cohort is the md5-40-bit(c_custkey) % 100 == 0 slice
(the repo's seeded-sampling idiom — stratified_sample, ab_test_zscores);
all outputs are integer counts.

Plan: the cohort is ~1% of a dimension table — broadcast it into each
fact as a semi/inner join (no fact shuffle); lineitem reaches the
cohort through the already-filtered orders keys, also broadcast. One
scan per audited table, three tiny aggregates unioned. At 100 TB a
real request list is thousands of keys — even more broadcastable.

No reference-repo counterpart (SURVEY §2.11 beyond-reference mandate —
the governance sibling of fk_integrity_audit and k_anonymity_report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: 1-in-N deterministic subject cohort
ERASE_MOD = 100

_SUBJ_SPARK = (
    "cast(conv(substr(md5(cast(c_custkey as string)), 1, 10), 16, 10) as bigint) "
    f"% {ERASE_MOD} = 0"
)
_SUBJ_SQL = (
    "CAST(('0x' || substr(md5(c_custkey::VARCHAR), 1, 10)) AS BIGINT) "
    f"% {ERASE_MOD} = 0"
)

_ERASURE_ORACLE = f"""
WITH subjects AS (
  SELECT c_custkey FROM customer WHERE {_SUBJ_SQL}
),
o AS (
  SELECT o_orderkey, o_custkey FROM orders
  JOIN subjects ON o_custkey = c_custkey
)
SELECT * FROM (
  SELECT 'customer' AS table_name,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_subjects
  FROM subjects
  UNION ALL
  SELECT 'orders', CAST(count(*) AS BIGINT),
         CAST(count(DISTINCT o_custkey) AS BIGINT)
  FROM o
  UNION ALL
  SELECT 'lineitem', CAST(count(*) AS BIGINT),
         CAST(count(DISTINCT o.o_custkey) AS BIGINT)
  FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'events', CAST(count(*) AS BIGINT),
         CAST(count(DISTINCT user_id) AS BIGINT)
  FROM events JOIN subjects ON user_id = c_custkey
)
ORDER BY table_name
"""


@register("erasure_cascade_audit", oracle=_ERASURE_ORACLE)
def erasure_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table erasure footprint of the deterministic 1% subject
    cohort: dependent row count and distinct subjects reached, across
    the declared FK cascade (customer → orders → lineitem; customer →
    events)."""
    subjects = (
        load_table(spark, sf_dir, "customer")
        .filter(F.expr(_SUBJ_SPARK))
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    o = orders.join(
        F.broadcast(subjects), orders.o_custkey == subjects.c_custkey
    ).select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    events = load_table(spark, sf_dir, "events").select("user_id")

    def _row(name: str, df: DataFrame, subj_col: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct(subj_col).cast("bigint").alias("n_subjects"),
        )

    cust_row = subjects.agg(
        F.lit("customer").alias("table_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_subjects"),
    )
    order_row = _row("orders", o, "o_custkey")
    li_row = _row(
        "lineitem",
        lineitem.join(F.broadcast(o), lineitem.l_orderkey == o.o_orderkey),
        "o_custkey",
    )
    ev_row = _row(
        "events",
        events.join(F.broadcast(subjects), events.user_id == subjects.c_custkey),
        "user_id",
    )
    return (
        cust_row.unionByName(order_row)
        .unionByName(li_row)
        .unionByName(ev_row)
        .orderBy("table_name")
    )
