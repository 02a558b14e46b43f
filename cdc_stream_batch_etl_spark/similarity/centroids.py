"""Per-label embedding centroids — the class-prototype computation under
IVF coarse quantization, nearest-centroid classification, and dataset
cartography.

Beyond-reference operator over the embeddings table (64-dim float32
vectors, 10 labels). Output is LONG form (label, pos, centroid_val, n):
one row per centroid component — array-free, so the result shuffles,
joins, and oracle-compares as plain scalars, and a 1M-dim centroid is
just more rows, not a wide array in one task.

Float determinism — the interesting part. A cross-row ``avg(val)`` is NOT
reproducible: IEEE addition is non-associative and Spark's partial
aggregates sum in partition order while DuckDB sums in scan order. The
fix: aggregate to a sorted list per (label, pos) and LEFT-FOLD it —
``sort_array(collect_list(v))`` + ``aggregate(.., 0.0d, (acc,x)->acc+x)``
in Spark, ``list_reduce(list_sort(list(v)), (a,b)->a+b)`` in DuckDB.
Both engines then execute the identical IEEE addition sequence (fold
from the smallest element; DuckDB's reduce seeds with x1 where Spark
seeds 0.0+x1 — bitwise-identical since 0.0+x == x), so sum and
sum/count hash-match exactly with atol=0.

Scale: one shuffle (groupBy label,pos); group size = rows-per-label,
with partial collect_lists merged by the aggregator. At true 100 TB the
sorted-fold list per group is the bottleneck — swap to plain avg and a
tolerance-based check there; exactness-vs-scalability is a stated
trade (SURVEY.md §5 determinism rules pick exactness for the oracle
gate, same as exact countDistinct in A7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_CENTROIDS_ORACLE = """
WITH comp AS (
  SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, (SELECT unnest(generate_series(1, len(embedding))) AS i) u
)
SELECT label,
       pos,
       list_reduce(list_sort(list(val)), (a, b) -> a + b) / count(*) AS centroid_val,
       count(*) AS n
FROM comp
GROUP BY label, pos
"""


@register("label_centroids", oracle=_CENTROIDS_ORACLE)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "valf")
    ).select("label", (F.col("pos0") + 1).alias("pos"), F.col("valf").cast("double").alias("val"))
    folded = F.aggregate(
        F.sort_array(F.collect_list("val")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return comp.groupBy("label", "pos").agg(
        (folded / F.count("*")).alias("centroid_val"),
        F.count("*").alias("n"),
    )
