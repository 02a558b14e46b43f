"""Caliper-matched PROMO effect on part demand (beyond-reference,
SURVEY §2.11 experimentation family, the matching-estimator companion
to did_promo_effect: DiD differences out the TIME trend; matching
differences out the PRICE confounder — each treated (PROMO) part is
paired with the nearest non-PROMO part by retail price within a
caliper, and the effect is the mean matched-pair difference in units
sold. The pattern is propensity-score matching with the score replaced
by the observed confounder — the standard design when the confounder
is one-dimensional).

Semantics: outcome(part) = SUM(l_quantity) over lineitem (0 for never-
sold parts via a left join). Each PROMO part matches the non-PROMO
part minimizing (|price_diff_cents|, control_price_cents, control_id)
— a total order, so the argmin is unique — subject to
|price_diff_cents| <= CALIPER_CENTS; unmatched treated parts are
counted and excluded (the estimand is the ATT on matched support).
Matching is WITH replacement (a control may serve several treated
parts — the standard greedy-free formulation that keeps the estimator
order-independent and join-expressible).

The nearest control is found without an all-pairs join: in the merged
price order, the nearest non-PROMO part is either the closest control
at-or-below or the closest control above (running last_value over the
interleaved sort — the state_asof / sweep-line idiom), so the plan is
two window passes over the part frame, never part x part.

Exactness: prices land on the integer cent grid (floor(p*100)); units
are exact bigints; the only divisions are the exported means. Ties in
|price diff| break toward the LOWER control price; among same-price
controls the sweep's total order (price, treated, id) picks one row
deterministically — both engines run the identical window over the
identical unique sort, so the selection is engine-exact.

Scale: one lineitem scan (map-side partial agg to per-part units), one
part scan, two window functions over the part frame partitioned by
nothing but bounded by |part| (a dimension table), and a final
single-row agg. At 100 TB the part dimension is the only windowed
frame; lineitem is touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

CALIPER_CENTS = 200  # match only within +/- $2.00 of retail price

_CALIPER_ORACLE = f"""
WITH units AS (
  SELECT l_partkey AS pk, sum(CAST(floor(l_quantity) AS BIGINT)) AS units
  FROM lineitem GROUP BY 1
),
parts AS (
  SELECT p.p_partkey AS id,
         CAST(floor(p.p_retailprice * 100) AS BIGINT) AS price,
         CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS treated,
         COALESCE(u.units, 0) AS units
  FROM part p LEFT JOIN units u ON p.p_partkey = u.pk
),
swept AS (
  SELECT *,
         last_value(CASE WHEN treated = 0 THEN id END IGNORE NULLS)
           OVER (ORDER BY price, treated, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS below_id,
         last_value(CASE WHEN treated = 0 THEN price END IGNORE NULLS)
           OVER (ORDER BY price, treated, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS below_price,
         last_value(CASE WHEN treated = 0 THEN units END IGNORE NULLS)
           OVER (ORDER BY price, treated, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS below_units,
         last_value(CASE WHEN treated = 0 THEN id END IGNORE NULLS)
           OVER (ORDER BY price DESC, treated DESC, id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS above_id,
         last_value(CASE WHEN treated = 0 THEN price END IGNORE NULLS)
           OVER (ORDER BY price DESC, treated DESC, id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS above_price,
         last_value(CASE WHEN treated = 0 THEN units END IGNORE NULLS)
           OVER (ORDER BY price DESC, treated DESC, id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS above_units
  FROM parts
),
matched AS (
  SELECT id, price, units,
         CASE
           WHEN below_id IS NULL AND above_id IS NULL THEN NULL
           WHEN below_id IS NULL THEN above_units
           WHEN above_id IS NULL THEN below_units
           WHEN abs(price - below_price) < abs(above_price - price)
             THEN below_units
           WHEN abs(above_price - price) < abs(price - below_price)
             THEN above_units
           WHEN below_price < above_price THEN below_units
           WHEN above_price < below_price THEN above_units
           WHEN below_id <= above_id THEN below_units ELSE above_units
         END AS ctl_units,
         CASE
           WHEN below_id IS NULL AND above_id IS NULL THEN NULL
           WHEN below_id IS NULL THEN abs(above_price - price)
           WHEN above_id IS NULL THEN abs(price - below_price)
           ELSE least(abs(price - below_price), abs(above_price - price))
         END AS dist
  FROM swept WHERE treated = 1
)
SELECT CAST(count(*) AS BIGINT) AS n_treated,
       CAST(sum(CASE WHEN dist <= {CALIPER_CENTS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN dist IS NULL OR dist > {CALIPER_CENTS}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched,
       CAST(sum(CASE WHEN dist <= {CALIPER_CENTS} THEN units END) AS DOUBLE)
         / sum(CASE WHEN dist <= {CALIPER_CENTS} THEN 1 END)
         AS treated_mean_units,
       CAST(sum(CASE WHEN dist <= {CALIPER_CENTS} THEN ctl_units END)
            AS DOUBLE)
         / sum(CASE WHEN dist <= {CALIPER_CENTS} THEN 1 END)
         AS control_mean_units,
       CAST(sum(CASE WHEN dist <= {CALIPER_CENTS} THEN units - ctl_units END)
            AS DOUBLE)
         / sum(CASE WHEN dist <= {CALIPER_CENTS} THEN 1 END)
         AS att_units,
       CAST(sum(CASE WHEN dist <= {CALIPER_CENTS} THEN dist END) AS DOUBLE)
         / sum(CASE WHEN dist <= {CALIPER_CENTS} THEN 1 END)
         AS mean_match_dist_cents
FROM matched
"""


@register("caliper_matched_price_effect", oracle=_CALIPER_ORACLE)
def caliper_matched_price_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: nearest-price caliper matching of PROMO parts to
    non-PROMO controls (with replacement) and the matched-pair ATT on
    units sold."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    units = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.floor("l_quantity").cast("bigint")).alias("units")
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.floor(F.col("p_retailprice") * 100).cast("bigint").alias("price"),
        (F.col("p_type") == "PROMO").cast("int").alias("treated"),
    )
    parts = p.join(units, p["id"] == units["pk"], "left").select(
        "id", "price", "treated", F.coalesce("units", F.lit(0)).alias("units")
    )
    ctl = lambda c: F.when(F.col("treated") == 0, F.col(c))  # noqa: E731
    up = Window.orderBy("price", "treated", "id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    dn = Window.orderBy(
        F.desc("price"), F.desc("treated"), F.desc("id")
    ).rowsBetween(Window.unboundedPreceding, -1)
    swept = parts.select(
        "id",
        "price",
        "treated",
        "units",
        F.last(ctl("id"), ignorenulls=True).over(up).alias("below_id"),
        F.last(ctl("price"), ignorenulls=True).over(up).alias("below_price"),
        F.last(ctl("units"), ignorenulls=True).over(up).alias("below_units"),
        F.last(ctl("id"), ignorenulls=True).over(dn).alias("above_id"),
        F.last(ctl("price"), ignorenulls=True).over(dn).alias("above_price"),
        F.last(ctl("units"), ignorenulls=True).over(dn).alias("above_units"),
    ).filter(F.col("treated") == 1)
    dlo = F.abs(F.col("price") - F.col("below_price"))
    dhi = F.abs(F.col("above_price") - F.col("price"))
    matched = swept.select(
        "id",
        "price",
        "units",
        F.when(F.col("below_id").isNull() & F.col("above_id").isNull(), None)
        .when(F.col("below_id").isNull(), F.col("above_units"))
        .when(F.col("above_id").isNull(), F.col("below_units"))
        .when(dlo < dhi, F.col("below_units"))
        .when(dhi < dlo, F.col("above_units"))
        .when(F.col("below_price") < F.col("above_price"), F.col("below_units"))
        .when(F.col("above_price") < F.col("below_price"), F.col("above_units"))
        .when(F.col("below_id") <= F.col("above_id"), F.col("below_units"))
        .otherwise(F.col("above_units"))
        .alias("ctl_units"),
        F.when(F.col("below_id").isNull() & F.col("above_id").isNull(), None)
        .when(F.col("below_id").isNull(), dhi)
        .when(F.col("above_id").isNull(), dlo)
        .otherwise(F.least(dlo, dhi))
        .alias("dist"),
    )
    incal = F.col("dist") <= CALIPER_CENTS
    n_m = F.sum(F.when(incal, 1))
    return matched.agg(
        F.count("*").cast("bigint").alias("n_treated"),
        F.sum(F.when(incal, 1).otherwise(0)).cast("bigint").alias("n_matched"),
        F.sum(
            F.when(F.col("dist").isNull() | ~incal, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_unmatched"),
        (F.sum(F.when(incal, F.col("units"))).cast("double") / n_m).alias(
            "treated_mean_units"
        ),
        (F.sum(F.when(incal, F.col("ctl_units"))).cast("double") / n_m).alias(
            "control_mean_units"
        ),
        (
            F.sum(F.when(incal, F.col("units") - F.col("ctl_units"))).cast(
                "double"
            )
            / n_m
        ).alias("att_units"),
        (F.sum(F.when(incal, F.col("dist"))).cast("double") / n_m).alias(
            "mean_match_dist_cents"
        ),
    )
