"""Selective fact-fact join with runtime Bloom-filter pruning — the
100 TB shuffle-reduction pattern for joins whose build side is too big
to broadcast but whose join keys are selective.

The query itself is declarative and exact: revenue of line items
belonging to high-value orders, grouped by order priority. What makes
it a distinct operator is the EXECUTION contract: when the probe side
is large (Spark's `runtime.bloomFilter.applicationSideScanSizeThreshold`,
default 10 GB — i.e. exactly the 100 TB regime) and the build side is
filtered and under `creationSideThreshold`, Catalyst injects a runtime
Bloom filter: the filtered orders' keys are folded into a bloom
aggregate, and lineitem's scan applies `might_contain(xxhash64(key))`
BEFORE the shuffle — non-qualifying fact rows never leave the map side.
False positives only widen the pre-filter; the join itself stays exact.

At the shipped fixture scales the probe side is far below the
threshold, so the filter is (correctly) not injected in normal runs;
tests/test_plans.py::test_bloom_runtime_filter_injects lowers the
thresholds and asserts the `might_contain` pre-filter appears under the
lineitem scan — the local proof of the at-scale plan. (Broadcast stays
disabled in that assertion: with a broadcastable build side Spark
rightly prefers a broadcast join, which needs no bloom.)

This is the declarative counterpart of hand-building a bloom with
mapPartitions: zero Python in the path, and AQE can still re-plan the
join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: High-value order cut — selective enough that pre-filtering the fact
#: side pays for the bloom build.
HIGH_VALUE_CUT = 90_000

_BLOOM_ORACLE = f"""
SELECT o.o_orderpriority AS priority,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > {HIGH_VALUE_CUT}
GROUP BY o.o_orderpriority
"""


@register("bloom_pruned_revenue", oracle=_BLOOM_ORACLE)
def bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by priority over high-value orders only — the selective
    fact-fact join shape that runtime Bloom pruning accelerates at
    scale (see module docstring for the execution contract)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > HIGH_VALUE_CUT
    ).select("o_orderkey", "o_orderpriority")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
