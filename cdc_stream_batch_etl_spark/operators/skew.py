"""Join-key skew diagnostics — the report you run BEFORE salting.

Every skew mitigation in this engine (AQE skew-join, the salting demo in
tests/test_salting.py, minhash's MAX_BUCKET cap) presupposes knowing
WHICH keys are hot. This operator measures it: for a join column, the
top heavy-hitter keys with their absolute counts and share of the table
— the number that decides whether a key needs salting (share ≫ 1/shuffle
partitions) or can ride the default hash partitioning.

Plan: one hash-agg on the key (map-side partial combine), a 1-row total
broadcast (the exact-percentile idiom, segments.py:93), and a global
top-K via TakeOrderedAndProject — K is a constant, so the "global sort"
is really a per-partition top-K + driver merge of K·partitions rows,
never a full ordering. Rank ties break on the key value for a total
order both engines agree on.

Beyond-reference (the reference joins blindly and relies on Postgres
indexes; a distributed engine must budget its shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

TOP_K = 20

_SKEW_ORACLE = f"""
WITH k AS (
  SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS total FROM lineitem
)
SELECT key, n_rows,
       CAST(n_rows AS DOUBLE) / t.total AS share,
       CAST(row_number() OVER (ORDER BY n_rows DESC, key) AS BIGINT) AS rank
FROM k CROSS JOIN t
ORDER BY n_rows DESC, key
LIMIT {TOP_K}
"""


@register("key_skew_report", oracle=_SKEW_ORACLE)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} heaviest l_partkey values in lineitem with their share of
    the table — the salting decision input."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    total = li.agg(F.count("*").alias("total"))
    from pyspark.sql import Window

    # top-K FIRST (TakeOrderedAndProject — per-partition top-K + driver
    # merge, never a full ordering), THEN the rank window over K rows:
    # the single-partition window only ever sees TOP_K rows, by
    # construction rather than by optimizer rule
    topk = counts.orderBy(F.col("n_rows").desc(), F.col("key")).limit(TOP_K)
    return (
        topk.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("total")).alias("share"),
        )
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("n_rows").desc(), F.col("key")))
            .cast("bigint"),
        )
    )
