"""Duplicate-transaction detection — the dedup ladder applied to
structured rows.

The document dedup family (dedup/) finds near-duplicate TEXT; billing
and CDC replay bugs produce near-duplicate TRANSACTIONS: same
customer, same amount, days apart. The operator reports order pairs
with identical (customer, exact cents) whose dates fall within
WINDOW_DAYS — the classic double-charge / replayed-insert screen.

Plan shape is the dedup design rule (README rule 9) applied to rows:
block on the exact key (custkey, cents) with a grouped self-join —
the join key IS the block, so candidate pairs only ever form inside a
block, and blocks are naturally tiny (how many same-cent orders does
one customer place?). A MAX_BLOCK cap drops degenerate blocks the
same way minhash caps LSH buckets — a customer with hundreds of
identical-amount orders is a subscription, not a double-charge, and
would otherwise contribute O(k²) pairs.

Determinism: pure integer/date comparisons; pair order normalized by
orderkey.

Scale: one hash-agg to size blocks + one self-join keyed on the block
— no corpus-sized cross work anywhere; output is anomaly-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

WINDOW_DAYS = 7
MAX_BLOCK = 20

_DUP_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY o_custkey, cents) AS bsz FROM o
),
blocked AS (SELECT * FROM sized WHERE bsz <= {MAX_BLOCK})
SELECT a.o_custkey, a.cents,
       a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
       a.o_orderdate AS date_a, b.o_orderdate AS date_b,
       CAST(date_diff('day', a.o_orderdate, b.o_orderdate) AS BIGINT)
         AS days_apart
FROM blocked a JOIN blocked b
  ON a.o_custkey = b.o_custkey AND a.cents = b.cents
 AND a.o_orderkey < b.o_orderkey
WHERE abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= {WINDOW_DAYS}
ORDER BY a.o_custkey, a.cents, orderkey_a, orderkey_b
"""


@register("duplicate_order_pairs", oracle=_DUP_ORACLE)
def duplicate_order_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order pairs with identical (customer, exact cents) within
    {WINDOW_DAYS} days — blocked self-join with a MAX_BLOCK cap."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    blocked = o.withColumn(
        "bsz", F.count("*").over(Window.partitionBy("o_custkey", "cents"))
    ).filter(F.col("bsz") <= MAX_BLOCK)
    a = blocked.alias("a")
    b = blocked.alias("b")
    days = F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate"))
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.cents") == F.col("b.cents"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter(F.abs(days) <= WINDOW_DAYS)
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.cents").alias("cents"),
            F.col("a.o_orderkey").alias("orderkey_a"),
            F.col("b.o_orderkey").alias("orderkey_b"),
            F.col("a.o_orderdate").alias("date_a"),
            F.col("b.o_orderdate").alias("date_b"),
            days.cast("bigint").alias("days_apart"),
        )
        .orderBy("o_custkey", "cents", "orderkey_a", "orderkey_b")
    )
