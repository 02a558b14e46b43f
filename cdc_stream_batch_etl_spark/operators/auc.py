"""One-vs-rest ROC AUC separability report — how well the `value`
column alone discriminates each event type from the rest of the stream
(beyond-reference, SURVEY §2.11 ML-eval family next to ab_test_zscores
and forecast_backtest_mae: AUC is THE threshold-free ranking metric,
and the rank-sum identity AUC = (R − n(n+1)/2)/(n·m) makes it exactly
computable as a sort-free aggregate — no ROC curve ever materializes).

Semantics: values quantized to the cent grid (g = floor(value*100) —
the declared "exact-on-grid" contract shared with ks_drift /
mann_whitney_drift). Per event_type t, AUC_t is the probability that a
random event of type t out-values a random event of any OTHER type,
ties counted half — exactly the tie-averaged (midrank) Mann-Whitney
AUC. gini_separation = 2·AUC − 1 (the accuracy-ratio form; 0 = no
signal, ±1 = perfect separation either direction).

Exactness: ranks never materialize as floats — the DOUBLED global rank
sum R2_t = Σ_g cgt·(2·cumlt_g + c_g + 1) is an integer (midrank of a
tie block is a half-integer), summed in decimal(38,0) (hugeint in
DuckDB); AUC_t = (R2_t − n_t(n_t+1)) / (2·n_t·(N − n_t)) takes exactly
one IEEE division at export.

Scale: the global ECDF needs a prefix sum over the grid — the one
place a naive plan would put an unpartitioned window over a
data-cardinality frame. This plan does the classic two-level scan
instead: grid cells get a block key (b = g div 8192), the intra-block
cumsum runs in a window PARTITIONED by block (parallel, bounded
frames), block offsets come from a window over the |blocks|-row
per-block totals (bounded by value-range/8192, independent of row
count), broadcast-joined back. The DuckDB oracle computes the same
integers with a single flat window — identical values, different
physical plan, which is the point: the Spark side is the 100 TB shape.
One events scan, hash aggs with map-side partials throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Cents per prefix-sum block: the offsets frame is value-range/8192
#: rows — constant in corpus size, tiny in practice.
BLOCK = 8192

_AUC_ORACLE = """
WITH grid_t AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS g, event_type,
         count(*) AS cgt
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT g, sum(cgt) AS c FROM grid_t GROUP BY 1
),
ranked AS (
  SELECT g,
         2 * (sum(c) OVER (ORDER BY g
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - c) + c + 1 AS avg2
  FROM grid
),
per_type AS (
  SELECT event_type,
         CAST(sum(cgt) AS BIGINT) AS n_events,
         sum(CAST(cgt AS HUGEINT) * avg2) AS r2
  FROM grid_t JOIN ranked USING (g)
  GROUP BY event_type
),
tot AS (SELECT sum(n_events) AS n FROM per_type)
SELECT event_type, n_events,
       CAST(r2 - CAST(n_events AS HUGEINT) * (n_events + 1) AS DOUBLE)
         / (2.0 * CAST(n_events AS DOUBLE) * CAST(n - n_events AS DOUBLE))
         AS auc,
       2 * (CAST(r2 - CAST(n_events AS HUGEINT) * (n_events + 1) AS DOUBLE)
            / (2.0 * CAST(n_events AS DOUBLE) * CAST(n - n_events AS DOUBLE)))
         - 1 AS gini_separation
FROM per_type CROSS JOIN tot
ORDER BY event_type
"""


@register("auc_separation_report", oracle=_AUC_ORACLE)
def auc_separation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, auc, gini_separation) — exact midrank
    one-vs-rest AUC of `value` per event type, blocked prefix sum."""
    ev = load_table(spark, sf_dir, "events")
    grid_t = ev.groupBy(
        F.floor(F.col("value") * 100).cast("bigint").alias("g"),
        "event_type",
    ).agg(F.count("*").alias("cgt"))
    grid = grid_t.groupBy("g").agg(F.sum("cgt").alias("c")).withColumn(
        "b", F.expr(f"g div {BLOCK}")
    )
    # level 1: intra-block running sum — window PARTITIONED by block
    intra = grid.withColumn(
        "ic",
        F.sum("c").over(
            Window.partitionBy("b")
            .orderBy("g")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # level 2: offsets over the tiny per-block totals frame
    offsets = (
        grid.groupBy("b")
        .agg(F.sum("c").alias("bc"))
        .withColumn(
            "off",
            F.sum("bc").over(
                Window.orderBy("b").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("bc"),
        )
        .select("b", "off")
    )
    ranked = (
        intra.join(F.broadcast(offsets), "b")
        .select(
            "g",
            (
                2 * (F.col("off") + F.col("ic") - F.col("c"))
                + F.col("c")
                + 1
            ).alias("avg2"),
        )
    )
    per_type = (
        grid_t.join(ranked, "g")
        .groupBy("event_type")
        .agg(
            F.sum("cgt").cast("bigint").alias("n_events"),
            F.sum(F.col("cgt").cast("decimal(38,0)") * F.col("avg2")).alias("r2"),
        )
    )
    tot = per_type.agg(F.sum("n_events").alias("n"))
    auc = (
        F.col("r2")
        - F.col("n_events").cast("decimal(38,0)") * (F.col("n_events") + 1)
    ).cast("double") / (
        2.0
        * F.col("n_events").cast("double")
        * (F.col("n") - F.col("n_events")).cast("double")
    )
    return (
        per_type.join(F.broadcast(tot))
        .select(
            "event_type",
            "n_events",
            auc.alias("auc"),
            (2 * auc - 1).alias("gini_separation"),
        )
        .orderBy("event_type")
    )
