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
partial); the row_number ordering is ONE range-partitioned sort of the
distinct keys. lead() for the gap rides the same sort. Output is
|islands| rows — the data's fragmentation, not its size. The
single-partition WindowExec note from rolling.py applies: a global
row_number over NDV(orderkey) keys is the honest cost of a global
islands report; at 100 TB shard it by a key prefix and stitch the
boundary islands (the per-shard spelling is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

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
    r = o.withColumn(
        "grp", F.col("key") - F.row_number().over(Window.orderBy("key"))
    )
    isl = r.groupBy("grp").agg(
        F.min("key").alias("island_start"),
        F.max("key").alias("island_end"),
        F.count("*").cast("bigint").alias("island_len"),
    )
    nxt = F.lead("island_start").over(Window.orderBy("island_start"))
    return (
        isl.select(
            "island_start",
            "island_end",
            "island_len",
            (nxt - F.col("island_end") - 1).alias("gap_to_next"),
        )
        .orderBy("island_start")
    )
