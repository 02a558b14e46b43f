"""Simpson's-paradox audit: discount-vs-price association, overall and
within part brands (beyond-reference, SURVEY §2.11 stats family next to
spearman_corr_matrix / mutual_information_matrix: those measure the
STRENGTH of an association; this one audits its DIRECTION under
aggregation — the classic confounding failure where the pooled trend
contradicts every stratum, which silently corrupts any "discounts
drive revenue" dashboard built on the pooled table).

Semantics: for each lineitem, x = discount in integer percent
(round(l_discount*100), the 0..10 grid), y = extended price in WHOLE
DOLLARS (floor(l_extendedprice)). Pearson association per group:

    cov  = mean(xy) - mean(x)*mean(y)
    r    = cov / sqrt((mean(xx)-mean(x)^2) * (mean(yy)-mean(y)^2))

computed per p_brand stratum and once pooled (group 'OVERALL'). The
verdict columns: cov_sign (-1/0/+1 integer, from the exact integer
numerator n*Sxy - Sx*Sy) per stratum, and on every row the pooled sign
plus ``paradox_flag`` = true when the stratum's sign is nonzero and
opposite the pooled sign.

Exactness: cov_sign compares decimal(38,0)/HUGEINT integers — never a
float. For the exported r, the WHOLE-DOLLAR grid keeps every moment
sum under 2^53 through ~sf100 (Syy ~ rows * (10^5)^2 worst-case), so
the int→double casts are EXACT (not merely identically rounded — the
r12 lesson: DuckDB's HUGEINT→DOUBLE double-rounds above 2^53 while
Spark's Decimal→double rounds once, so identical big integers can cast
to different doubles). The five means are correctly-rounded divisions
of exact doubles and the final r is the identical IEEE expression
shape in both engines; a zero-variance stratum yields NULL r in both.

Scale: one lineitem scan feeding a map-side-combining brand hash-agg
(the part side is a broadcast — parts are dimension-sized); the pooled
row re-aggregates the 25-brand partials, not the table. Everything
after the first agg runs on a frame bounded by |brands|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_SIMPSON_ORACLE = """
WITH pts AS (
  SELECT p.p_brand AS grp,
         CAST(round(l.l_discount * 100) AS BIGINT) AS x,
         CAST(floor(l.l_extendedprice) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
moments AS (
  SELECT grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pts GROUP BY grp
),
with_overall AS (
  SELECT * FROM moments
  UNION ALL
  SELECT 'OVERALL', CAST(sum(n) AS BIGINT), CAST(sum(sx) AS BIGINT),
         CAST(sum(sy) AS BIGINT), CAST(sum(sxy) AS BIGINT),
         CAST(sum(sxx) AS BIGINT), CAST(sum(syy) AS BIGINT)
  FROM moments
),
assoc AS (
  SELECT grp, n,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cov_num,
         CAST(sxy AS DOUBLE) / n
           - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS cov_d,
         CAST(sxx AS DOUBLE) / n
           - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS varx_d,
         CAST(syy AS DOUBLE) / n
           - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS vary_d
  FROM with_overall
),
signed AS (
  SELECT grp, n AS n_rows,
         CAST(CASE WHEN cov_num > 0 THEN 1 WHEN cov_num < 0 THEN -1
              ELSE 0 END AS BIGINT) AS cov_sign,
         cov_d / sqrt(varx_d * vary_d) AS pearson_r
  FROM assoc
)
SELECT s.grp, s.n_rows, s.cov_sign, s.pearson_r,
       o.cov_sign AS overall_sign,
       s.cov_sign <> 0 AND o.cov_sign <> 0 AND s.cov_sign <> o.cov_sign
         AS paradox_flag
FROM signed s
CROSS JOIN (SELECT cov_sign FROM signed WHERE grp = 'OVERALL') o
ORDER BY s.grp
"""


@register("simpsons_paradox_audit", oracle=_SIMPSON_ORACLE)
def simpsons_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand (+ pooled) discount-price association sign and Pearson
    r, with the stratum-vs-pooled sign-reversal flag."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_discount", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("grp"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice")).cast("bigint").alias("y"),
    )
    # ONE scan for strata + pooled: rollup gives every brand plus the
    # grand-total row (grp NULL → 'OVERALL'). unionByName of a re-agg
    # would re-derive the lineitem lineage and double the table scans.
    both = (
        pts.rollup("grp")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )
        .select(
            F.coalesce(F.col("grp"), F.lit("OVERALL")).alias("grp"),
            "n",
            "sx",
            "sy",
            "sxy",
            "sxx",
            "syy",
        )
    )
    _dec = "decimal(38,0)"
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    assoc = both.select(
        "grp",
        F.col("n").alias("n_rows"),
        (
            F.col("n").cast(_dec) * F.col("sxy")
            - F.col("sx").cast(_dec) * F.col("sy")
        ).alias("cov_num"),
        (d("sxy") / F.col("n") - (d("sx") / F.col("n")) * (d("sy") / F.col("n")))
        .alias("cov_d"),
        (d("sxx") / F.col("n") - (d("sx") / F.col("n")) * (d("sx") / F.col("n")))
        .alias("varx_d"),
        (d("syy") / F.col("n") - (d("sy") / F.col("n")) * (d("sy") / F.col("n")))
        .alias("vary_d"),
    )
    signed = assoc.select(
        "grp",
        "n_rows",
        F.when(F.col("cov_num") > 0, 1)
        .when(F.col("cov_num") < 0, -1)
        .otherwise(0)
        .cast("bigint")
        .alias("cov_sign"),
        (F.col("cov_d") / F.sqrt(F.col("varx_d") * F.col("vary_d"))).alias(
            "pearson_r"
        ),
    )
    # pooled sign via a window over the |brands|+1-row agg frame (a
    # filter+join would re-derive the whole lineage a second time); the
    # single-partition window only ever sees ~26 rows.
    from pyspark.sql import Window

    overall_sign = F.max(
        F.when(F.col("grp") == "OVERALL", F.col("cov_sign"))
    ).over(Window.partitionBy())
    return (
        signed.withColumn("overall_sign", overall_sign)
        .select(
            "grp",
            "n_rows",
            "cov_sign",
            "pearson_r",
            "overall_sign",
            (
                (F.col("cov_sign") != 0)
                & (F.col("overall_sign") != 0)
                & (F.col("cov_sign") != F.col("overall_sign"))
            ).alias("paradox_flag"),
        )
        .orderBy("grp")
    )
