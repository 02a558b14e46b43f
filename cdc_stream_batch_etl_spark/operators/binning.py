"""Quantile binning — exact-decile feature bucketization of order values.

The feature-engineering generalization of the reference's percentile
segmentation (batch_processor.py:118-120, SURVEY.md A9/C1: p80/p60
thresholds → Gold/Silver/Bronze): instead of 2 thresholds and 3 labels,
9 exact deciles and a 1-10 bin per row — the discretization step of a
training feature pipeline (GBDT binning, calibration buckets, price
tiers).

Two-pass plan, same as customer_segments: pass 1 computes the 9 exact
percentiles in ONE aggregate (Spark `percentile(col, array(...))` —
linear interpolation, matching DuckDB `quantile_cont` and pandas; never
percentile_approx, per the A9 oracle rule); pass 2 broadcasts the 1-row
threshold array and labels every row scan-locally. The bin is
1 + count(thresholds strictly below the value) — boundary values fall in
the LOWER bin in both engines because both compare with the identical
`>` on identical doubles.

At 100 TB: pass 1 is the cost (exact percentile = sort-based aggregate);
it parallelizes per-partition with a single merge, and the labeling pass
is embarrassingly parallel. If the gate relaxed exactness, swap in
approx_percentile and this plan drops to one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_DECILES = [i / 10 for i in range(1, 10)]

_BINNING_ORACLE = f"""
WITH thresholds AS (
  SELECT quantile_cont(o_totalprice, {_DECILES}) AS qs FROM orders
)
SELECT o.o_orderkey,
       o.o_totalprice,
       CAST(1 + (o.o_totalprice > t.qs[1])::INT + (o.o_totalprice > t.qs[2])::INT
              + (o.o_totalprice > t.qs[3])::INT + (o.o_totalprice > t.qs[4])::INT
              + (o.o_totalprice > t.qs[5])::INT + (o.o_totalprice > t.qs[6])::INT
              + (o.o_totalprice > t.qs[7])::INT + (o.o_totalprice > t.qs[8])::INT
              + (o.o_totalprice > t.qs[9])::INT AS BIGINT) AS price_decile
FROM orders o CROSS JOIN thresholds t
"""


@register("price_deciles", oracle=_BINNING_ORACLE)
def price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    thresholds = orders.agg(
        F.percentile(F.col("o_totalprice"), F.array(*[F.lit(q) for q in _DECILES])).alias("qs")
    )
    binned = orders.crossJoin(F.broadcast(thresholds))
    decile = F.lit(1)
    for i in range(1, 10):
        decile = decile + (F.col("o_totalprice") > F.element_at("qs", i)).cast("int")
    return binned.select(
        "o_orderkey",
        "o_totalprice",
        decile.cast("bigint").alias("price_decile"),
    )
