"""Deterministic cardinality/frequency sketches — KMV and count-min.

At 100 TB, exact per-key statistics stop being free: COUNT(DISTINCT) is
an expand + double shuffle, and per-key count tables outgrow memory.
Production engines answer with SKETCHES — tiny, mergeable summaries with
bounded error (the Apache DataSketches role). Typical sketch libraries
are seeded/engine-specific and therefore unverifiable across engines;
these two are built on the repo's md5-derived integer hashes
(dedup.hash64_expr ≡ hash64_sql bit-for-bit), so the "approximate"
results are EXACTLY reproducible in DuckDB and hash-match a full oracle
— the same determinism trick as the LSH family.

1. KMV (k-minimum-values, Bar-Yossef et al. 2002): keep the K smallest
   distinct hash values of a set; the K-th smallest h_(K), normalized to
   (0,1], estimates |S| ≈ (K-1) / h_norm. Mergeable by taking the K
   smallest of a union of sketches (pytest-asserted).
2. Count-min (Cormode & Muthukrishnan 2005): D independent hash rows of
   W counters; a key's estimate = min over rows of its counter — never
   an underestimate (pytest-asserted against exact counts).

Scale shape: the KMV construction here deduplicates (group, hash) —
one uniform shuffle — then per-group sorts ONLY to pick the K smallest
(row_number ≤ K, the ranking.py per-group top-k class); a production
streaming build would carry the K-minimum set as bounded aggregation
state instead, identical math. The CMS build is one explode (×D) and
one (depth, bucket)-keyed hash-agg into exactly D×W output rows — the
sketch itself is the bounded artifact, whatever the corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup import hash64_expr, hash64_sql
from ..registry import register

KMV_K = 64
#: 60-bit hash space (15 hex digits), as in dedup.hash64_expr
HASH_SPACE = float(1 << 60)

CMS_DEPTH = 4
CMS_WIDTH = 256

_KMV_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         {hash64_sql("CAST(user_id AS VARCHAR)")} AS hv
  FROM events
), ranked AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n_exact
  FROM h
)
SELECT event_type,
       CAST(max(n_exact) AS BIGINT) AS n_distinct_exact,
       CAST(max(CASE WHEN rk = {KMV_K} THEN hv END) AS BIGINT) AS kth_hash,
       CASE WHEN max(n_exact) < {KMV_K}
            THEN CAST(max(n_exact) AS DOUBLE)
            ELSE ({KMV_K} - 1)
                 / (CAST(max(CASE WHEN rk = {KMV_K} THEN hv END) AS DOUBLE) / {HASH_SPACE})
       END AS kmv_estimate
FROM ranked
WHERE rk <= {KMV_K}
GROUP BY event_type
"""


def kmv_sketch(ev: DataFrame, k: int = KMV_K) -> DataFrame:
    """The KMV sketch frame for an events frame at sketch size ``k`` —
    parameterized so tests can shrink K below the fixture cardinality and
    force the kth-hash estimation branch (the registered query uses
    KMV_K; the sf0.01 driver gate exercises both branches at K=64)."""
    h = (
        ev.select(
            "event_type",
            F.expr(hash64_expr("cast(user_id as string)")).alias("hv"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    ranked = h.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_exact", F.count("*").over(Window.partitionBy("event_type"))
    )
    kth = F.max(F.when(F.col("rk") == k, F.col("hv")))
    n_exact = F.max("n_exact")
    return (
        ranked.filter(F.col("rk") <= k)
        .groupBy("event_type")
        .agg(
            n_exact.cast("bigint").alias("n_distinct_exact"),
            kth.cast("bigint").alias("kth_hash"),
            F.when(n_exact < k, n_exact.cast("double"))
            .otherwise((k - 1) / (kth.cast("double") / F.lit(HASH_SPACE)))
            .alias("kmv_estimate"),
        )
    )


@register("kmv_distinct_by_type", oracle=_KMV_ORACLE)
def kmv_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: exact distinct users, the K-th minimum hash, and
    the KMV cardinality estimate (exact when the set is smaller than K)."""
    return kmv_sketch(load_table(spark, sf_dir, "events"), KMV_K)


_CMS_ORACLE = f"""
WITH rows_d AS (
  SELECT e.user_id, d.d,
         {hash64_sql("CAST(d.d AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)")}
           % {CMS_WIDTH} AS bucket
  FROM events e, (SELECT unnest(range({CMS_DEPTH})) AS d) d
)
SELECT CAST(d AS BIGINT) AS depth,
       CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS counter
FROM rows_d
GROUP BY d, bucket
"""


def cms_sketch(ev: DataFrame, width: int = CMS_WIDTH) -> DataFrame:
    """The D×W count-min table for an events frame at sketch width
    ``width`` — parameterized so tests can shrink W below the key
    cardinality and force genuine bucket collisions (saturation), the
    regime the sketch exists for (the registered query uses CMS_WIDTH)."""
    return (
        ev.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"),
        )
        .select(
            "d",
            (
                F.expr(
                    hash64_expr("concat(cast(d as string), ':', cast(user_id as string))")
                )
                % width
            ).alias("bucket"),
        )
        .groupBy(
            F.col("d").cast("bigint").alias("depth"),
            F.col("bucket").cast("bigint").alias("bucket"),
        )
        .agg(F.count("*").alias("counter"))
    )


@register("countmin_sketch", oracle=_CMS_ORACLE)
def countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The D×W count-min table over per-user event counts — the bounded,
    mergeable artifact itself (point estimates read min over depths;
    never an underestimate, tests/test_sketches.py)."""
    return cms_sketch(load_table(spark, sf_dir, "events"), CMS_WIDTH)


@register("approx_distinct_native")
def approx_distinct_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: Spark's NATIVE HyperLogLog++ estimate
    (approx_count_distinct, rsd 5%) next to the exact distinct — the
    zero-code path a user should reach for before the repo's KMV/CMS
    when cross-engine determinism is not required. Registered WITHOUT
    an oracle (registry.ROWS_ONLY): HLL++ register layouts are
    engine-specific, so no SQL oracle can reproduce the estimate; the
    relative-error gate lives in tests/test_sketches.py instead.

    Scale: both aggregates are map-side partial (HLL registers and the
    exact distinct's hash set both merge); one shuffle of |groups| rows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


@register("approx_percentile_native")
def approx_percentile_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: Spark's NATIVE approximate percentiles
    (approx_percentile — Greenwald-Khanna summaries, accuracy 10000)
    next to the exact ones — completing the native-approx family
    (approx_distinct_native's HLL++ sibling for quantiles). Registered
    WITHOUT an oracle (registry.ROWS_ONLY): GK summary merge order is
    engine-specific, so no SQL oracle can reproduce the estimates; the
    rank-error gate lives in tests/test_sketches.py instead.

    Scale: GK summaries are mergeable bounded-size state — map-side
    partial, one |groups|-row shuffle; the EXACT percentile column is
    the cross-check only (it builds a per-group value buffer and is the
    thing you use approx to avoid at 100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_percentile(
                "value", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
            ).alias("approx_p50_p95"),
            F.percentile("value", F.array(F.lit(0.5), F.lit(0.95))).alias(
                "exact_p50_p95"
            ),
            F.count("*").cast("bigint").alias("n"),
        )
        .select(
            "event_type",
            F.col("approx_p50_p95")[0].alias("approx_p50"),
            F.col("approx_p50_p95")[1].alias("approx_p95"),
            F.col("exact_p50_p95")[0].alias("exact_p50"),
            F.col("exact_p50_p95")[1].alias("exact_p95"),
            "n",
        )
        .orderBy("event_type")
    )
