"""Shuffle-salting plan — the actionable sequel to key_skew_report.

key_skew_report (operators/skew.py) measures WHICH keys are hot; this
operator emits the MITIGATION: for a groupBy/join keyed on
events.user_id and a target reducer count P, the per-key salt factor
``ceil(n_rows / ideal)`` that splits each hot key into enough salted
sub-keys that no single reducer task receives more than the ideal
per-task row budget. The two-stage rewrite it plans for is the classic
one: stage 1 aggregates on (key, salt) — salt drawn uniformly at write
time from [0, salt_factor) — stage 2 re-aggregates the partials on the
bare key, turning one pathological reducer into ``salt_factor`` even
ones at the cost of a second (tiny, partial-sized) shuffle.

Semantics: P = SHUFFLE_TARGET reducers (the 1000-executor-cluster
default this engine plans for, not the local test parallelism);
ideal = ceil(total / P). For the TOP_K heaviest keys (count desc, key
asc tiebreak — a total order both engines agree on):

    salt_factor   = max(1, ceil(n_rows / ideal))
    salted_max    = ceil(n_rows / salt_factor)   (residual task load)

plus the key's share of the table. salt_factor == 1 rows are the
explicit "no salting needed" verdict — the report always has TOP_K
rows, so the empty-plan and hot-plan cases are the same shape.

Exactness: every column is integer arithmetic — ceil via the
``(a + b - 1) // b`` identity in TRUE integer division (``div`` in
Spark, ``//`` in DuckDB; the bare ``/`` is float division in BOTH
engines and their double→bigint casts disagree — Spark truncates,
DuckDB rounds — exactly the int-vs-float trap scripts/driver_sim.py
documents). The only division left is the exported ``share``, an exact
int/int → double divide, IEEE-deterministic in both engines.

Scale: one hash-agg on the key (map-side combine), a 1-row total
broadcast, and a constant-K TakeOrderedAndProject — identical plan
shape to key_skew_report; never a full sort. The report itself is the
cheap probe you run BEFORE committing the expensive salted rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Planned reducer count — the cluster-shape assumption (a production
#: spark.sql.shuffle.partitions, NOT the local[32] test setting).
SHUFFLE_TARGET = 256
TOP_K = 20

_SALT_ORACLE = f"""
WITH k AS (
  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
         CAST((count(*) + {SHUFFLE_TARGET} - 1) // {SHUFFLE_TARGET} AS BIGINT)
           AS ideal
  FROM events
), topk AS (
  SELECT key, n_rows, total, ideal
  FROM k CROSS JOIN t
  ORDER BY n_rows DESC, key
  LIMIT {TOP_K}
), plan AS (
  SELECT key, n_rows, total, ideal,
         GREATEST(CAST(1 AS BIGINT), (n_rows + ideal - 1) // ideal)
           AS salt_factor
  FROM topk
)
SELECT key, n_rows,
       CAST(n_rows AS DOUBLE) / total AS share,
       ideal AS ideal_task_rows,
       salt_factor,
       (n_rows + salt_factor - 1) // salt_factor AS salted_max_rows,
       CAST(row_number() OVER (ORDER BY n_rows DESC, key) AS BIGINT) AS rank
FROM plan
ORDER BY n_rows DESC, key
"""


@register("skew_salt_plan", oracle=_SALT_ORACLE)
def skew_salt_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K heaviest events.user_id keys with the integer salt factor
    that evens each one across SHUFFLE_TARGET reducers."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    counts = ev.groupBy(F.col("user_id").alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    total = ev.agg(
        F.count("*").alias("total"),
        F.expr(
            f"CAST((count(*) + {SHUFFLE_TARGET} - 1) div {SHUFFLE_TARGET} "
            "AS BIGINT)"
        ).alias("ideal"),
    )
    # top-K FIRST (TakeOrderedAndProject), THEN the K-row rank window —
    # the single-partition window only ever sees TOP_K rows (the
    # key_skew_report idiom, operators/skew.py).
    topk = (
        counts.join(F.broadcast(total))
        .orderBy(F.desc("n_rows"), "key")
        .limit(TOP_K)
    )
    plan = topk.withColumn(
        "salt_factor",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr("(n_rows + ideal - 1) div ideal"),
        ),
    )
    return plan.select(
        "key",
        "n_rows",
        (F.col("n_rows").cast("double") / F.col("total")).alias("share"),
        F.col("ideal").alias("ideal_task_rows"),
        "salt_factor",
        F.expr("(n_rows + salt_factor - 1) div salt_factor").alias(
            "salted_max_rows"
        ),
        F.row_number()
        .over(Window.orderBy(F.desc("n_rows"), "key"))
        .cast("bigint")
        .alias("rank"),
    ).orderBy(F.desc("n_rows"), "key")
