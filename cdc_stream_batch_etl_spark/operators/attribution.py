"""Multi-touch conversion attribution — linear and position-based
credit over the event stream (standard marketing-analytics models;
beyond-reference, SURVEY §2.11: operators/asof.py attributes each event
to its most recent PRIOR purchase, this is the forward-looking
companion — every touch shares credit for the NEXT purchase).

Model: each non-purchase event ("touch") is assigned to the nearest
FOLLOWING purchase of the same user (inclusive at equal timestamps;
ties among simultaneous purchases resolve to the smallest event_id),
provided the purchase lands within LOOKBACK_DAYS. Per conversion with
n touches ordered by (ts, event_id):
  - linear credit: 1/n each;
  - position-based ("U-shaped") credit: n=1 → 1.0; n=2 → 0.5/0.5;
    n≥3 → 0.4 first, 0.4 last, 0.2/(n−2) each middle.
The report aggregates both credits per event_type — which interaction
kinds actually drive purchases, under the two standard models.

Spark spelling — the asof.py union-window pattern REVERSED, still one
hash shuffle on user_id: tag purchases, sort each user's events by
(ts, kind, event_id) DESCENDING, and carry ``last(purchase_*,
ignoreNulls)`` — the running "last seen" in a descending traversal IS
the nearest following purchase (purchases sort before touches at equal
ts, so the match is inclusive). No range join, no per-user blowup:
P+E rows per user, O(1) window state. A second window on conv_id
numbers the touches; the final agg is conversion-count-sized.

Determinism (full DuckDB oracle, spelled as an independent theta-join
+ row_number pick, NOT a window transliteration): counts are integers;
the credit sums fold exact per-(n, position-class) terms in explicit
(n, class) order via the centroids sorted-fold idiom, and the two
credit totals export rounded to 9 decimals (the tfidf convention —
1/n terms are exact IEEE divisions but their sum order matters in the
last ulp).

Scale: two hash shuffles (user_id window, conv_id window) + one
event_type hash agg — each on event rows, no join against anything
event-sized. 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: a touch only converts if its purchase lands within this many days
LOOKBACK_DAYS = 7
_LOOKBACK_US = LOOKBACK_DAYS * 86_400 * 1_000_000

_MTA_ORACLE = f"""
WITH conv AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, ts, event_id, event_type
  FROM events WHERE event_type <> 'purchase'
),
matched AS (
  SELECT t.event_type, t.ts, t.event_id, c.event_id AS conv_id,
         row_number() OVER (PARTITION BY t.event_id
                            ORDER BY c.ts, c.event_id) AS pick
  FROM touch t JOIN conv c
    ON t.user_id = c.user_id
   AND c.ts >= t.ts
   AND epoch_us(c.ts) - epoch_us(t.ts) <= {_LOOKBACK_US}
),
attributed AS (
  SELECT event_type, ts, event_id, conv_id FROM matched WHERE pick = 1
),
positioned AS (
  SELECT event_type, conv_id,
         row_number() OVER (PARTITION BY conv_id ORDER BY ts, event_id) AS pos,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM attributed
),
classed AS (
  SELECT event_type, conv_id, n,
         CASE WHEN n = 1 THEN 0
              WHEN pos = 1 THEN 1
              WHEN pos = n THEN 3
              ELSE 2 END AS cls
  FROM positioned
),
terms AS (
  SELECT event_type, n, cls,
         CAST(count(*) AS BIGINT) AS cnt,
         count(*) * (1.0e0 / n) AS lin_term,
         count(*) * (CASE WHEN cls = 0 THEN 1.0e0
                          WHEN n = 2 THEN 0.5e0
                          WHEN cls = 2 THEN 0.2e0 / (n - 2)
                          ELSE 0.4e0 END) AS pos_term
  FROM classed GROUP BY event_type, n, cls
)
SELECT event_type,
       CAST(sum(cnt) AS BIGINT) AS n_touches,
       CAST(count(*) AS BIGINT) AS n_shapes,
       CAST(sum(cnt) FILTER (WHERE cls IN (0, 1)) AS BIGINT) AS first_touches,
       CAST(sum(cnt) FILTER (WHERE cls IN (0, 3)) AS BIGINT) AS last_touches,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lin_term ORDER BY n, cls)), (a, b) -> a + b), 9)
         AS linear_credit,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(pos_term ORDER BY n, cls)), (a, b) -> a + b), 9)
         AS position_credit
FROM terms
GROUP BY event_type
ORDER BY event_type
"""


def attributed_touches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, ts, event_id, conv_id, pos, n): every touch with its
    attributed conversion, position and group size — the shared core."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    tagged = ev.withColumn(
        "kind", F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    )
    # descending traversal: running last purchase = nearest FOLLOWING
    # one; purchases first at equal ts (inclusive), min event_id wins
    # among simultaneous purchases
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("kind"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p_ts = F.last(F.when(F.col("kind") == 1, F.col("ts")), ignorenulls=True).over(w)
    p_id = F.last(
        F.when(F.col("kind") == 1, F.col("event_id")), ignorenulls=True
    ).over(w)
    touches = (
        tagged.withColumn("conv_ts", p_ts)
        .withColumn("conv_id", p_id)
        .filter(
            (F.col("kind") == 0)
            & F.col("conv_id").isNotNull()
            & (
                F.unix_micros(F.col("conv_ts")) - F.unix_micros(F.col("ts"))
                <= _LOOKBACK_US
            )
        )
    )
    wc = Window.partitionBy("conv_id")
    return touches.select(
        "event_type",
        "ts",
        "event_id",
        "conv_id",
        F.row_number().over(wc.orderBy("ts", "event_id")).alias("pos"),
        F.count("*").over(wc).alias("n"),
    )


@register("multi_touch_attribution", oracle=_MTA_ORACLE)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: touches attributed to a following purchase,
    distinct (group-size, position-class) shapes, first/last-touch
    counts, and total credit under the linear and U-shaped models."""
    touches = attributed_touches(spark, sf_dir)
    classed = touches.select(
        "event_type",
        "conv_id",
        "n",
        F.when(F.col("n") == 1, 0)
        .when(F.col("pos") == 1, 1)
        .when(F.col("pos") == F.col("n"), 3)
        .otherwise(2)
        .alias("cls"),
    )
    lin_w = F.lit(1.0) / F.col("n")
    pos_w = (
        F.when(F.col("cls") == 0, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(F.col("cls") == 2, F.lit(0.2) / (F.col("n") - 2))
        .otherwise(F.lit(0.4))
    )
    terms = classed.groupBy("event_type", "n", "cls").agg(
        F.count("*").alias("cnt"),
        (F.count("*") * lin_w).alias("lin_term"),
        (F.count("*") * pos_w).alias("pos_term"),
    )
    fold = (
        "aggregate(array_sort(collect_list(struct(n, cls, {t}))), 0.0D, "
        "(acc, e) -> acc + e.{t})"
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_touches"),
            F.count("*").cast("bigint").alias("n_shapes"),
            F.sum(F.when(F.col("cls").isin(0, 1), F.col("cnt")))
            .cast("bigint")
            .alias("first_touches"),
            F.sum(F.when(F.col("cls").isin(0, 3), F.col("cnt")))
            .cast("bigint")
            .alias("last_touches"),
            F.round(F.expr(fold.format(t="lin_term")), 9).alias("linear_credit"),
            F.round(F.expr(fold.format(t="pos_term")), 9).alias("position_credit"),
        )
        .orderBy("event_type")
    )
