"""Difference-in-differences estimate of the PROMO part-type revenue
effect (beyond-reference, SURVEY §2.11 experimentation family next to
ab_test_zscores / ab_power_planner: those analyze a RANDOMIZED split;
DiD is the observational fallback every analytics team reaches for when
the "treatment" — here, a part being in the PROMO type — was never
randomized: difference out the common time trend by comparing the
treated group's pre->post change against the control group's).

Semantics: treatment = lineitems whose part has p_type = 'PROMO';
period = the temporal-midpoint split of l_shipdate used by ks_drift /
mann_whitney_drift (post <=> 2*epoch_us > min+max, integer arithmetic,
one global boundary). Cell metric = average net line revenue
l_extendedprice * (1 - l_discount). The estimate is
    did = (post_promo - pre_promo) - (post_other - pre_other).

Exactness: per-cell revenue accumulates as decimal(18,6) (the
discounted_revenue / tpch5.py money convention — the double product is
bit-identical in both engines, and decimal summation is
order-independent); averages and deltas take IEEE division/subtraction
on the decimal->double casts with identical expression shape, so the
exported doubles match bit-for-bit. Counts are exact bigints.

Scale: one lineitem scan with a broadcast part join (p_partkey ->
is_promo only — column-pruned to the 1-bit flag) and a broadcast
1-row bounds frame; the conditional aggregation map-side-combines to a
single row. No shuffle wider than the 4-cell partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_DID_ORACLE = """
WITH bounds AS (
  SELECT min(epoch_us(l_shipdate)) AS mn, max(epoch_us(l_shipdate)) AS mx
  FROM lineitem
),
cells AS (
  SELECT CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS promo,
         CASE WHEN 2 * epoch_us(l.l_shipdate) > b.mn + b.mx
              THEN 1 ELSE 0 END AS post,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  CROSS JOIN bounds b
),
agg AS (
  SELECT
    sum(CASE WHEN promo = 1 AND post = 0 THEN 1 ELSE 0 END) AS n_pre_promo,
    sum(CASE WHEN promo = 1 AND post = 1 THEN 1 ELSE 0 END) AS n_post_promo,
    sum(CASE WHEN promo = 0 AND post = 0 THEN 1 ELSE 0 END) AS n_pre_other,
    sum(CASE WHEN promo = 0 AND post = 1 THEN 1 ELSE 0 END) AS n_post_other,
    sum(CASE WHEN promo = 1 AND post = 0 THEN rev END) AS s_pre_promo,
    sum(CASE WHEN promo = 1 AND post = 1 THEN rev END) AS s_post_promo,
    sum(CASE WHEN promo = 0 AND post = 0 THEN rev END) AS s_pre_other,
    sum(CASE WHEN promo = 0 AND post = 1 THEN rev END) AS s_post_other
  FROM cells
),
avgs AS (
  SELECT
    CAST(n_pre_promo AS BIGINT) AS n_pre_promo,
    CAST(n_post_promo AS BIGINT) AS n_post_promo,
    CAST(n_pre_other AS BIGINT) AS n_pre_other,
    CAST(n_post_other AS BIGINT) AS n_post_other,
    CAST(s_pre_promo AS DOUBLE) / n_pre_promo AS pre_promo_avg,
    CAST(s_post_promo AS DOUBLE) / n_post_promo AS post_promo_avg,
    CAST(s_pre_other AS DOUBLE) / n_pre_other AS pre_other_avg,
    CAST(s_post_other AS DOUBLE) / n_post_other AS post_other_avg
  FROM agg
)
SELECT *,
       post_promo_avg - pre_promo_avg AS promo_delta,
       post_other_avg - pre_other_avg AS other_delta,
       (post_promo_avg - pre_promo_avg) - (post_other_avg - pre_other_avg)
         AS did
FROM avgs
"""


@register("did_promo_effect", oracle=_DID_ORACLE)
def did_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One wide row: cell counts/averages and the diff-in-diff estimate
    of the PROMO effect on average net line revenue across the
    temporal-midpoint split."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").cast("int").alias("promo")
    )
    # l_shipdate reads as TIMESTAMP_NTZ; the session TZ is pinned UTC by
    # load_table, so this cast is instant-preserving and unix_micros
    # matches DuckDB's tz-naive epoch_us exactly.
    us = F.unix_micros(F.col("l_shipdate").cast("timestamp"))
    bounds = li.agg(F.min(us).alias("mn"), F.max(us).alias("mx"))
    cells = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(bounds))
        .select(
            "promo",
            F.when(2 * us > F.col("mn") + F.col("mx"), 1)
            .otherwise(0)
            .alias("post"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .alias("rev"),
        )
    )

    def cell(p: int, t: int, what: str) -> F.Column:
        m = (F.col("promo") == p) & (F.col("post") == t)
        if what == "n":
            return F.sum(F.when(m, 1).otherwise(0))
        return F.sum(F.when(m, F.col("rev")))

    agg = cells.agg(
        cell(1, 0, "n").cast("bigint").alias("n_pre_promo"),
        cell(1, 1, "n").cast("bigint").alias("n_post_promo"),
        cell(0, 0, "n").cast("bigint").alias("n_pre_other"),
        cell(0, 1, "n").cast("bigint").alias("n_post_other"),
        (cell(1, 0, "s").cast("double") / cell(1, 0, "n")).alias("pre_promo_avg"),
        (cell(1, 1, "s").cast("double") / cell(1, 1, "n")).alias("post_promo_avg"),
        (cell(0, 0, "s").cast("double") / cell(0, 0, "n")).alias("pre_other_avg"),
        (cell(0, 1, "s").cast("double") / cell(0, 1, "n")).alias("post_other_avg"),
    )
    return agg.select(
        "*",
        (F.col("post_promo_avg") - F.col("pre_promo_avg")).alias("promo_delta"),
        (F.col("post_other_avg") - F.col("pre_other_avg")).alias("other_delta"),
        (
            (F.col("post_promo_avg") - F.col("pre_promo_avg"))
            - (F.col("post_other_avg") - F.col("pre_other_avg"))
        ).alias("did"),
    )
