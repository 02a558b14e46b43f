"""Islands & gaps — contiguous ranges in a sparse key space.

TPC-H orderkeys are deliberately sparse (only 1/4 of the key space is
populated); CDC pipelines meet the same shape when replays or
retention carve holes in an id sequence. The audit question is "which
contiguous runs exist, and where are the holes?" — the classic
islands-and-gaps query, solved with the rank-difference trick: within
a sorted key stream, ``key − row_number()`` is CONSTANT inside each
contiguous run, so grouping by that difference materializes islands
without any self-join or sequence generation (the naive spellings are
respectively quadratic and key-space-sized).

Emits one row per island, ordered: start, end, length, and the gap to
the next island (NULL for the last). Top-level stats (island count,
covered fraction) are derivable downstream; keeping the per-island
grain keeps the operator composable.

Determinism: pure integer arithmetic on distinct keys.

Scale: distinct() is the corpus-sized step (hash agg, map-side
partial). The rank-difference window is SHARDED, not global: keys
hash-shuffle by ``key div SHARD`` (contiguous ranges stay together by
construction), the per-shard windows run in parallel, and only the
|islands| + #touched-shards per-shard islands reach the stitch step —
a cumulative-flag merge (new island iff start > lag(end)+1, O(n)
UNBOUNDED PRECEDING frame) that reconnects runs split at shard
boundaries. The stitch's single-partition window sees output-sized
data (fragmentation count, not corpus count), which is the honest
floor for a totally-ordered report. Exactness — sharded == global —
is pinned by tests/test_islands.py on planted runs spanning multiple
shard boundaries. SHARD=65536 exercises ~9 shards at sf0.01 already;
at 100 TB raise it so #shards stays ~1e5 (the stitch input adds at
most one split island per shard boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

SHARD = 65536

_ISLANDS_ORACLE = """
WITH k AS (SELECT DISTINCT o_orderkey AS key FROM orders),
r AS (
  SELECT key, key - row_number() OVER (ORDER BY key) AS grp
  FROM k
),
isl AS (
  SELECT min(key) AS island_start, max(key) AS island_end,
         CAST(count(*) AS BIGINT) AS island_len
  FROM r GROUP BY grp
)
SELECT island_start, island_end, island_len,
       lead(island_start) OVER (ORDER BY island_start) - island_end - 1
         AS gap_to_next
FROM isl
ORDER BY island_start
"""


@register("orderkey_islands", oracle=_ISLANDS_ORACLE)
def orderkey_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous o_orderkey runs with their lengths and the gap to the
    next run — rank-difference islands, no self-join."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key")
    ).distinct()
    return islands(o)


def islands(keys: DataFrame, shard: int = SHARD) -> DataFrame:
    """Sharded islands-and-gaps over a distinct ``key`` column — split
    out so tests can plant runs that straddle shard boundaries and
    compare against the global spelling."""
    # per-shard rank-difference: runs inside a shard group correctly;
    # a run crossing a boundary splits into per-shard pieces that the
    # stitch below re-joins
    w_shard = Window.partitionBy("_shard").orderBy("key")
    per_shard = (
        keys.withColumn("_shard", F.floor(F.col("key") / shard).cast("bigint"))
        .withColumn("grp", F.col("key") - F.row_number().over(w_shard))
        .groupBy("_shard", "grp")
        .agg(
            F.min("key").alias("island_start"),
            F.max("key").alias("island_end"),
            F.count("*").cast("bigint").alias("island_len"),
        )
    )
    # stitch: adjacent per-shard islands that touch (start == prev end
    # + 1) are one island — cumulative-count-of-breaks as the group id
    w = Window.orderBy("island_start")
    run = Window.orderBy("island_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    brk = F.when(
        F.lag("island_end").over(w).isNull()
        | (F.col("island_start") > F.lag("island_end").over(w) + 1),
        1,
    ).otherwise(0)
    stitched = (
        per_shard.withColumn("_gid", F.sum(brk).over(run))
        .groupBy("_gid")
        .agg(
            F.min("island_start").alias("island_start"),
            F.max("island_end").alias("island_end"),
            F.sum("island_len").alias("island_len"),
        )
    )
    nxt = F.lead("island_start").over(Window.orderBy("island_start"))
    return (
        stitched.select(
            "island_start",
            "island_end",
            "island_len",
            (nxt - F.col("island_end") - 1).alias("gap_to_next"),
        )
        .orderBy("island_start")
    )
