"""Order-status streaks — longest same-status run per customer.

The grouped twin of orderkey_islands (operators/islands.py): instead
of contiguity in a global key space, contiguity in each customer's
ORDER SEQUENCE — "how many consecutive orders kept status F?". The
rank-difference trick again, two ranks this time: within a customer's
(o_orderdate, o_orderkey)-ordered history, ``row_number() −
row_number() per status`` is constant exactly within a same-status
run, so grouping by (customer, status, diff) materializes runs without
self-joins, and a max per (customer, status) gives the longest streak.

Determinism: the sequence order is (o_orderdate, o_orderkey) —
o_orderkey is unique, so both engines see one canonical sequence; all
outputs are integer counts.

Scale: ONE shuffle on o_custkey; both row_numbers ride the same sorted
partition (one sort, two window functions). The run grouping and the
final max are hash-aggs on frames bounded by |orders| then
|customers|×|statuses| — standard map-side-partial shapes. Per-customer
partitions are order-count-sized (skew-free for TPC-H-like data; a
pathological single-customer feed would hit the rolling.py hot-key
note, which applies unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_STREAKS_ORACLE = """
WITH seq AS (
  SELECT o_custkey, o_orderstatus,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey)
         - row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                              ORDER BY o_orderdate, o_orderkey) AS diff
  FROM orders
),
runs AS (
  SELECT o_custkey, o_orderstatus, CAST(count(*) AS BIGINT) AS run_len
  FROM seq GROUP BY o_custkey, o_orderstatus, diff
)
SELECT o_custkey, o_orderstatus,
       CAST(max(run_len) AS BIGINT) AS longest_streak,
       CAST(SUM(run_len) AS BIGINT) AS n_orders
FROM runs
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("order_status_streaks", oracle=_STREAKS_ORACLE)
def order_status_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (customer, status): longest consecutive-order streak and
    total orders, via the two-rank difference grouping."""
    o = load_table(spark, sf_dir, "orders")
    all_w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    st_w = Window.partitionBy("o_custkey", "o_orderstatus").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = o.select(
        "o_custkey",
        "o_orderstatus",
        (F.row_number().over(all_w) - F.row_number().over(st_w)).alias(
            "diff"
        ),
    )
    runs = seq.groupBy("o_custkey", "o_orderstatus", "diff").agg(
        F.count("*").cast("bigint").alias("run_len")
    )
    return (
        runs.groupBy("o_custkey", "o_orderstatus")
        .agg(
            F.max("run_len").cast("bigint").alias("longest_streak"),
            F.sum("run_len").cast("bigint").alias("n_orders"),
        )
        .orderBy("o_custkey", "o_orderstatus")
    )
