"""KMV set-overlap — sketch-based audience overlap between event types.

kmv_distinct_by_type (operators/sketches.py) estimates per-group NDV;
the question it can't answer is CROSS-group: "how much do the purchase
and refund audiences overlap?". Exact distinct-intersection over all
group pairs is a corpus-sized self-join; the mergeable-sketch answer
is K-Minimum-Values: keep each group's K smallest distinct hash
values, merge two groups' sketches by re-taking the K smallest of the
union, and estimate

    |S| ≈ (K-1) · 2^60 / τ_K        (τ_K = K-th smallest 60-bit hash)
    |A∩B| ≈ |A| + |B| − |A∪B|       (inclusion-exclusion)

A group (or merged union) with fewer than K distinct hashes is its own
exact count — the sketch hasn't saturated.

Determinism: the hash is the repo's md5-derived 60-bit integer
(dedup.hash64_expr / hash64_sql — same value in both engines), so the
K smallest values, τ_K, and therefore the ESTIMATES are bit-identical
cross-engine: the oracle mirrors the estimator, not some exact truth.
min/max/count only — no float accumulation; the estimator arithmetic
is a fixed expression shape, round 6 at the end. Accuracy itself
(relative error vs exact NDV) is pytest-gated, not oracle-gated.

Scale: ONE corpus scan → distinct (group, hash) hash-agg; everything
after runs on |groups|·K sketch rows (constant per group, invariant to
corpus size — the whole point of KMV). Pair expansion is
|groups|²/2 · 2K rows; merging is a row_number window per pair. At
100 TB none of this is measurable next to the first distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup import hash64_expr, hash64_sql
from ..registry import register

K = 64
TWO60 = float(1 << 60)

_H_SPARK = hash64_expr("cast(user_id as string)")
_H_SQL = hash64_sql("CAST(user_id AS VARCHAR)")

_KMV_ORACLE = f"""
WITH uh AS (
  SELECT DISTINCT event_type, {_H_SQL} AS h FROM events
),
ndv AS (SELECT event_type, CAST(count(*) AS BIGINT) AS ndv
        FROM uh GROUP BY 1),
sk AS (
  SELECT event_type, h
  FROM (SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM uh)
  WHERE rn <= {K}
),
est_t AS (
  SELECT s.event_type, n.ndv,
         CASE WHEN n.ndv <= {K} THEN CAST(n.ndv AS DOUBLE)
              ELSE ({K} - 1) * {TWO60!r} / max(s.h) END AS est
  FROM sk s JOIN ndv n USING (event_type)
  GROUP BY s.event_type, n.ndv
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.est AS est_a, b.est AS est_b,
         a.ndv AS ndv_a, b.ndv AS ndv_b
  FROM est_t a JOIN est_t b ON a.event_type < b.event_type
),
mh AS (
  SELECT DISTINCT p.type_a, p.type_b, s.h
  FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
),
merged AS (
  SELECT type_a, type_b, h,
         row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
  FROM mh
),
uni AS (
  -- m_full counts the merged sketch BEFORE the rn<=K truncation; tau
  -- is still the K-th smallest (the truncated sketch's max)
  SELECT type_a, type_b,
         CAST(count(*) AS BIGINT) AS m_full,
         max(CASE WHEN rn <= {K} THEN h END) AS tau
  FROM merged
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       round(p.est_a, 6) AS est_a_r,
       round(p.est_b, 6) AS est_b_r,
       round(CASE WHEN greatest(p.ndv_a, p.ndv_b) <= {K}
                  THEN CAST(u.m_full AS DOUBLE)
                  ELSE ({K} - 1) * {TWO60!r} / u.tau END, 6) AS est_union_r,
       round(greatest(p.est_a + p.est_b
               - CASE WHEN greatest(p.ndv_a, p.ndv_b) <= {K}
                      THEN CAST(u.m_full AS DOUBLE)
                      ELSE ({K} - 1) * {TWO60!r} / u.tau END, 0.0e0)
             / CASE WHEN greatest(p.ndv_a, p.ndv_b) <= {K}
                    THEN CAST(u.m_full AS DOUBLE)
                    ELSE ({K} - 1) * {TWO60!r} / u.tau END, 6)
         AS jaccard_r
FROM pairs p JOIN uni u ON u.type_a = p.type_a AND u.type_b = p.type_b
ORDER BY p.type_a, p.type_b
"""


def _est_union(
    m_full: F.Column, tau: F.Column, max_side_ndv: F.Column
) -> F.Column:
    """Merged-union estimate. The union count is EXACT iff both side
    sketches are unsaturated (side NDV ≤ K): then each sketch is its
    side's COMPLETE hash set, so the pre-truncation merged distinct
    count m_full is the true union NDV — even when it exceeds K (two
    disjoint 60-user audiences union to 120 > K; the truncated count
    m would misreport 64 as "exact"). m_full is bounded by 2K rows
    per pair, so counting it costs nothing. Only when a side is
    saturated do we fall back to the τ_K estimator on the truncated
    sketch. Consistent with the per-type ndv <= K rule."""
    return F.when(max_side_ndv <= K, m_full.cast("double")).otherwise(
        F.lit((K - 1) * TWO60) / tau
    )


@register("kmv_set_overlap", oracle=_KMV_ORACLE)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience-overlap estimates between event types from
    merged K-minimum-values sketches (deterministic md5 hashes)."""
    return overlap_from_events(load_table(spark, sf_dir, "events"))


def overlap_from_events(ev: DataFrame) -> DataFrame:
    """Core sketch-merge over any (event_type, user_id) frame — split
    out so tests can plant sets larger than K with known overlap (at
    tiny SF every type holds the same users and NDV < K, so the
    saturated-estimator path needs planted data)."""
    uh = ev.select(
        "event_type", F.expr(_H_SPARK).alias("h")
    ).distinct()
    # ONE pass over the corpus-NDV frame computes both the sketch rows
    # (row_number ≤ K) and the exact per-group NDV (unbounded count on
    # the same partitioning — same exchange). The K·|groups|-row result
    # is persisted so the three downstream consumers (per-type
    # estimates, pair side A, pair side B) never re-derive the corpus
    # distinct — without it the plan re-scans events once per consumer
    # (14 scans in the first PLANS profile). Caller-must-clear persist
    # contract as elsewhere (bench/driver clearCache between queries).
    grp = Window.partitionBy("event_type")
    sk = (
        uh.select(
            "event_type",
            "h",
            F.row_number().over(grp.orderBy("h")).alias("rn"),
            F.count("*").over(grp).cast("bigint").alias("ndv"),
        )
        .filter(F.col("rn") <= K)
        .select("event_type", "h", "ndv")
        .persist()
    )
    est_t = (
        sk.groupBy("event_type")
        .agg(F.max("h").alias("tau"), F.min("ndv").alias("ndv"))
        .select(
            "event_type",
            "ndv",
            F.when(F.col("ndv") <= K, F.col("ndv").cast("double"))
            .otherwise(F.lit((K - 1) * TWO60) / F.col("tau"))
            .alias("est"),
        )
    )
    a, b = est_t.alias("a"), est_t.alias("b")
    pairs = a.join(
        b, F.col("a.event_type") < F.col("b.event_type")
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.est").alias("est_a"),
        F.col("b.est").alias("est_b"),
        F.col("a.ndv").alias("ndv_a"),
        F.col("b.ndv").alias("ndv_b"),
    )
    # per-pair union sketch: each pair pulls both sides' sketch rows,
    # dedups shared hashes, re-takes the K smallest
    ska = sk.select(F.col("event_type").alias("type_a"), "h")
    skb = sk.select(F.col("event_type").alias("type_b"), "h")
    merged = (
        pairs.select("type_a", "type_b")
        .join(ska, "type_a")
        .unionByName(pairs.select("type_a", "type_b").join(skb, "type_b"))
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("type_a", "type_b").orderBy("h")
            ),
        )
    )
    # m_full = merged distinct count BEFORE truncation (≤ 2K rows/pair);
    # tau = K-th smallest (max of the rn<=K truncated sketch)
    uni = merged.groupBy("type_a", "type_b").agg(
        F.count("*").cast("bigint").alias("m_full"),
        F.max(F.when(F.col("rn") <= K, F.col("h"))).alias("tau"),
    )
    est_u = _est_union(
        F.col("m_full"), F.col("tau"), F.greatest("ndv_a", "ndv_b")
    )
    return (
        pairs.join(uni, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            F.round("est_a", 6).alias("est_a_r"),
            F.round("est_b", 6).alias("est_b_r"),
            F.round(est_u, 6).alias("est_union_r"),
            F.round(
                F.greatest(
                    F.col("est_a") + F.col("est_b") - est_u, F.lit(0.0)
                )
                / est_u,
                6,
            ).alias("jaccard_r"),
        )
        .orderBy("type_a", "type_b")
    )
