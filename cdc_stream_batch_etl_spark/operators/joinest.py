"""Join-cardinality estimation scorecard — the optimizer-statistics
operator: how well do the textbook join-size estimators predict the
TRUE size of a many-to-many key join, measured against the exact
answer on the same data (beyond-reference, SURVEY §2.11 data-ops
family next to key_skew_report / table_stats / partition_layout_advisor:
those describe the key distribution, this scores what a cost-based
planner would DO with it — the System R uniform-NDV formula, the
heavy-hitter hybrid that fixes its skew blindness, and a hash-sample
estimate — the three estimators every CBO survey compares).

Scenario: clicks ⋈ purchases on user_id (both sides multi-row per key
— the estimation-hard case; FK joins are trivially |fact|). Methods,
one output row each:
  - exact       — sum_k a_k*b_k (ground truth; also every row's
                  denominator).
  - uniform_ndv — |A|*|B| / max(ndv_A, ndv_B): System R / Selinger
                  containment assumption.
  - hh_hybrid   — exact a_k*b_k for the top-20 A-side heavy keys
                  (rank by a_k desc, user_id tiebreak — deterministic),
                  uniform formula on the remainder: the
                  "end-biased histogram" estimator.
  - sample10    — 10% Bernoulli key-sample via the repo's 60-bit md5
                  bucket device (text/sampling.py), scaled by 1/p: the
                  sampling-based estimator (deterministic here because
                  the "random" buckets are content-addressed).

Scale: two filtered scans collapse to per-key count frames (map-side
partials); one full-outer merge on user_id gives the per-key (a_k,
b_k) frame every method reads — persist()ed, since both the heavy-key
TakeOrdered and the estimate aggregate consume it (the pagerank
convention: caller owns cache release via clearCache, which bench.py
and the tests do). Heavy keys come from a distributed ORDER BY LIMIT
20 (TakeOrdered — no global sort materialization) broadcast back;
every estimate is then ONE aggregate over the key frame. No method
ever materializes the joined pairs — that is the entire point of
estimating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

SIDE_A = "click"
SIDE_B = "purchase"
TOP_H = 20
SAMPLE_PCT = 10  # of 100 md5 buckets

_JOINEST_ORACLE = f"""
WITH a AS (
  SELECT user_id, count(*) AS ak FROM events
  WHERE event_type = '{SIDE_A}' GROUP BY 1
),
b AS (
  SELECT user_id, count(*) AS bk FROM events
  WHERE event_type = '{SIDE_B}' GROUP BY 1
),
pk AS (
  SELECT COALESCE(a.user_id, b.user_id) AS user_id,
         COALESCE(a.ak, 0) AS ak, COALESCE(b.bk, 0) AS bk,
         CAST(('0x' || substr(md5(CAST(COALESCE(a.user_id, b.user_id)
           AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
  FROM a FULL OUTER JOIN b USING (user_id)
),
hh AS (
  SELECT user_id FROM pk WHERE ak > 0
  ORDER BY ak DESC, user_id LIMIT {TOP_H}
),
s AS (
  SELECT sum(ak * bk) AS exact_size,
         sum(ak) AS na, sum(bk) AS nb,
         count(*) FILTER (WHERE ak > 0) AS ndv_a,
         count(*) FILTER (WHERE bk > 0) AS ndv_b,
         sum(ak * bk) FILTER (WHERE bucket < {SAMPLE_PCT}) AS samp,
         sum(ak * bk) FILTER (WHERE user_id IN (SELECT user_id FROM hh))
           AS hh_exact,
         sum(ak) FILTER (WHERE user_id NOT IN (SELECT user_id FROM hh))
           AS rest_a,
         sum(bk) FILTER (WHERE user_id NOT IN (SELECT user_id FROM hh))
           AS rest_b,
         count(*) FILTER (WHERE ak > 0
           AND user_id NOT IN (SELECT user_id FROM hh)) AS rest_ndv_a,
         count(*) FILTER (WHERE bk > 0
           AND user_id NOT IN (SELECT user_id FROM hh)) AS rest_ndv_b
  FROM pk
),
est AS (
  SELECT 'exact' AS method, CAST(exact_size AS DOUBLE) AS estimate,
         exact_size FROM s
  UNION ALL
  SELECT 'uniform_ndv',
         CAST(na AS DOUBLE) * nb / greatest(ndv_a, ndv_b), exact_size
  FROM s
  UNION ALL
  SELECT 'hh_hybrid',
         COALESCE(hh_exact, 0)
           + CASE WHEN greatest(rest_ndv_a, rest_ndv_b) > 0
                  THEN CAST(COALESCE(rest_a, 0) AS DOUBLE)
                       * COALESCE(rest_b, 0)
                       / greatest(rest_ndv_a, rest_ndv_b)
                  ELSE 0 END,
         exact_size
  FROM s
  UNION ALL
  SELECT 'sample10', CAST(COALESCE(samp, 0) AS DOUBLE) * 100 / {SAMPLE_PCT},
         exact_size FROM s
)
SELECT method, estimate,
       CAST(exact_size AS BIGINT) AS exact_size,
       estimate / exact_size AS q_ratio
FROM est
ORDER BY method
"""


def _md5_bucket(col):
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")
        % 100
    )


@register("join_size_estimates", oracle=_JOINEST_ORACLE)
def join_size_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(method, estimate, exact_size, q_ratio) — one row per join-size
    estimator on clicks ⋈ purchases by user_id, scored vs the exact."""
    ev = load_table(spark, sf_dir, "events")

    def side(t: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .groupBy("user_id")
            .agg(F.count("*").alias(out))
        )

    a, b = side(SIDE_A, "ak"), side(SIDE_B, "bk")
    pk = (
        a.join(b, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("ak", F.lit(0)).alias("ak"),
            F.coalesce("bk", F.lit(0)).alias("bk"),
        )
        .withColumn("bucket", _md5_bucket(F.col("user_id")))
        .persist()
    )
    hh = (
        pk.filter(F.col("ak") > 0)
        .orderBy(F.col("ak").desc(), "user_id")
        .limit(TOP_H)
        .select(F.col("user_id").alias("hh_id"))
    )
    marked = pk.join(
        F.broadcast(hh), pk.user_id == F.col("hh_id"), "left"
    ).withColumn("is_hh", F.col("hh_id").isNotNull())
    in_hh, not_hh = F.col("is_hh"), ~F.col("is_hh")
    s = marked.agg(
        F.sum(F.col("ak") * F.col("bk")).alias("exact_size"),
        F.sum("ak").alias("na"),
        F.sum("bk").alias("nb"),
        F.count(F.when(F.col("ak") > 0, 1)).alias("ndv_a"),
        F.count(F.when(F.col("bk") > 0, 1)).alias("ndv_b"),
        F.sum(F.when(F.col("bucket") < SAMPLE_PCT, F.col("ak") * F.col("bk"))).alias(
            "samp"
        ),
        F.sum(F.when(in_hh, F.col("ak") * F.col("bk"))).alias("hh_exact"),
        F.sum(F.when(not_hh, F.col("ak"))).alias("rest_a"),
        F.sum(F.when(not_hh, F.col("bk"))).alias("rest_b"),
        F.count(F.when((F.col("ak") > 0) & not_hh, 1)).alias("rest_ndv_a"),
        F.count(F.when((F.col("bk") > 0) & not_hh, 1)).alias("rest_ndv_b"),
    )
    rest_den = F.greatest("rest_ndv_a", "rest_ndv_b")
    # one row in, four rows out via stack — the aggregate (and the events
    # scans under it) evaluates ONCE; a 4-leg union would re-run it per leg
    one = s.select(
        F.col("exact_size").cast("double").alias("est_exact"),
        (
            F.coalesce("hh_exact", F.lit(0))
            + F.when(
                rest_den > 0,
                F.coalesce("rest_a", F.lit(0)).cast("double")
                * F.coalesce("rest_b", F.lit(0))
                / rest_den,
            ).otherwise(F.lit(0.0))
        ).alias("est_hh"),
        (F.coalesce("samp", F.lit(0)).cast("double") * 100 / SAMPLE_PCT).alias(
            "est_sample"
        ),
        (
            F.col("na").cast("double") * F.col("nb") / F.greatest("ndv_a", "ndv_b")
        ).alias("est_uniform"),
        F.col("exact_size").cast("bigint").alias("exact_size"),
    )
    return (
        one.select(
            F.expr(
                "stack(4, 'exact', est_exact, 'hh_hybrid', est_hh, "
                "'sample10', est_sample, 'uniform_ndv', est_uniform) "
                "AS (method, estimate)"
            ),
            "exact_size",
        )
        .select(
            "method",
            "estimate",
            "exact_size",
            (F.col("estimate") / F.col("exact_size")).alias("q_ratio"),
        )
        .orderBy("method")
    )
