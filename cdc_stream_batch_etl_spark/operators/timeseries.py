"""Time-series similarity search — nearest activity profiles.

PAPERS.md's retrieved corpus includes distributed time-series similarity
search (EDBT 2019 topic); the engine's version: embed each user's month
of activity as a fixed 31-day value vector and answer "which users'
activity patterns are closest to this one" by squared Euclidean distance
— the cohort-discovery / anomaly-neighbor primitive (users similar to a
known-fraudulent profile, accounts tracking each other's behavior).

Determinism (full DuckDB oracle):
- the vector is per-day DECIMAL sums cast to double (functions/money.py
  — parallel agg order cannot perturb the values), missing days exactly
  0.0;
- the day grid is a generated 1..31 join, so every vector has identical
  length and ordering in both engines;
- distances fold squared diffs in index order (the PQ/_SQ convention);
  ranks tie to the smaller neighbor id.

Scale: vector build = one (user, day) hash-agg + a per-user 31-element
array_agg (bounded per group by the calendar, not the corpus). The
query stage is queries × corpus with a BROADCAST of the ≤N_QUERIES
query vectors — linear in the corpus, the ann.py brute-force pattern
(at real scale the IVF/PQ rungs apply unchanged to these vectors; the
profile is just another embedding column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

N_DAYS = 31
N_QUERIES = 10
TOP_K = 5

_SQDIST_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0.0D, (s, t) -> s + t)"
)
_SQDIST_SQL = (
    f"list_reduce([({{a}}[i] - {{b}}[i]) * ({{a}}[i] - {{b}}[i]) "
    f"for i in generate_series(1, {N_DAYS})], (s, t) -> s + t)"
)

_TS_ORACLE = f"""
WITH users AS (
  SELECT DISTINCT user_id FROM events
), grid AS (
  SELECT u.user_id, d.day FROM users u, range(1, {N_DAYS + 1}) d(day)
), vals AS (
  SELECT user_id, date_part('day', ts) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
), vecs AS (
  SELECT g.user_id, list(COALESCE(v.v, 0.0) ORDER BY g.day) AS vec
  FROM grid g LEFT JOIN vals v ON v.user_id = g.user_id AND v.day = g.day
  GROUP BY g.user_id
), q AS (
  SELECT user_id AS query_id, vec AS qv FROM vecs WHERE user_id < {N_QUERIES}
), dists AS (
  SELECT q.query_id, c.user_id AS neighbor_id,
         {_SQDIST_SQL.format(a="q.qv", b="c.vec")} AS sq_dist
  FROM q JOIN vecs c ON q.query_id <> c.user_id
), ranked AS (
  SELECT query_id, neighbor_id, sq_dist,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sq_dist ASC, neighbor_id ASC) AS rank
  FROM dists
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(sq_dist, 6) AS sq_dist_r
FROM ranked WHERE rank <= {TOP_K}
"""


def _daily_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    days = spark.range(1, N_DAYS + 1).select(F.col("id").cast("int").alias("day"))
    vals = ev.groupBy(
        "user_id", F.dayofmonth("ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"))
    return (
        users.crossJoin(F.broadcast(days))
        .join(vals, ["user_id", "day"], "left")
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(day, v))), "
                "s -> coalesce(s.v, 0.0D))"
            ).alias("vec")
        )
    )


@register("ts_similarity_topk", oracle=_TS_ORACLE)
def ts_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} nearest 31-day activity profiles per query user, by
    index-ordered squared Euclidean distance."""
    vecs = _daily_vectors(spark, sf_dir)
    q = vecs.filter(F.col("user_id") < N_QUERIES).select(
        F.col("user_id").alias("query_id"), F.col("vec").alias("qv")
    )
    dist = F.expr(_SQDIST_SPARK.format(a="qv", b="vec"))
    ranked = (
        F.broadcast(q)
        .join(vecs, F.col("query_id") != F.col("user_id"))
        .select("query_id", F.col("user_id").alias("neighbor_id"), dist.alias("sq_dist"))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.partitionBy("query_id").orderBy(F.asc("sq_dist"), F.asc("neighbor_id")))
            .cast("bigint"),
        )
    )
    return ranked.filter(F.col("rank") <= TOP_K).select(
        "query_id", "neighbor_id", "rank", F.round("sq_dist", 6).alias("sq_dist_r")
    )
