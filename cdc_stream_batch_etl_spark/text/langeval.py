"""Classifier evaluation over the language-ID gate — confusion matrix
and per-class precision/recall/F1 (standard supervised-eval tables;
beyond-reference, SURVEY §2.11: quality_classifier/quality_calibration
evaluate the QUALITY gate, this evaluates the LANGUAGE gate, and the
shape generalizes to any categorical router in the pipeline).

Why: a pipeline that routes documents by predicted language (per-lang
dedup, per-lang quality thresholds, temperature sampling) silently
corrupts every downstream stage when the router drifts; the confusion
matrix against the declared label is the eval a data-quality review
reads. The corpus text is synthetic, so the numbers here exercise the
eval MACHINERY (margins, one-vs-rest reductions) rather than recover
ground truth — lang_id's own module makes the same scoping note.

Two tables:
  - lang_id_confusion: per (declared, predicted) cell — count, share of
    the declared row, and the match flag; the raw matrix.
  - lang_id_class_metrics: per declared class — support, TP/FP/FN,
    precision, recall, F1 (one-vs-rest over the matrix).

Determinism: counts are integers; precision/recall are exact-integer
IEEE divisions; F1 = 2pr/(p+r) is three IEEE ops on those exact
quotients — identical in both engines (zero denominators → NULL via
explicit CASE, same both sides).

Scale: lang_id's scan (regexp counts, scan-local) + one hash agg on a
|langs|² ≤ 36-cell key; the metrics table is arithmetic over those
cells joined to two ≤ |langs|-row margins — broadcast trivially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .analysis import _LANG_ORACLE, lang_id

_CELLS_CTE = f"""
pred AS ({_LANG_ORACLE}),
cells AS (
  SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
)
"""

_CONFUSION_ORACLE = f"""
WITH {_CELLS_CTE}
SELECT lang, predicted_lang, n,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang) AS share_of_declared,
       lang = predicted_lang AS is_match
FROM cells
ORDER BY lang, predicted_lang
"""


@register("lang_id_confusion", oracle=_CONFUSION_ORACLE)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(declared lang, predicted lang, count, row share, match flag) —
    the raw confusion matrix of the language-ID heuristic."""
    cells = (
        lang_id(spark, sf_dir)
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    from pyspark.sql import Window

    wl = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "predicted_lang",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wl)).alias(
            "share_of_declared"
        ),
        (F.col("lang") == F.col("predicted_lang")).alias("is_match"),
    ).orderBy("lang", "predicted_lang")


_METRICS_ORACLE = f"""
WITH {_CELLS_CTE},
classes AS (
  SELECT lang AS cls FROM cells
  UNION SELECT predicted_lang FROM cells
),
stats AS (
  SELECT c.cls,
         CAST(COALESCE(sum(n) FILTER (WHERE lang = c.cls), 0) AS BIGINT)
           AS support,
         CAST(COALESCE(sum(n) FILTER (WHERE lang = c.cls
                                        AND predicted_lang = c.cls), 0)
              AS BIGINT) AS tp,
         CAST(COALESCE(sum(n) FILTER (WHERE lang <> c.cls
                                        AND predicted_lang = c.cls), 0)
              AS BIGINT) AS fp,
         CAST(COALESCE(sum(n) FILTER (WHERE lang = c.cls
                                        AND predicted_lang <> c.cls), 0)
              AS BIGINT) AS fn
  FROM classes c CROSS JOIN cells
  GROUP BY c.cls
)
SELECT cls, support, tp, fp, fn,
       CASE WHEN tp + fp = 0 THEN NULL
            ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
       CASE WHEN tp + fn = 0 THEN NULL
            ELSE CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
       CASE WHEN tp + fp = 0 OR tp + fn = 0 OR tp = 0 THEN NULL
            ELSE 2 * (CAST(tp AS DOUBLE) / (tp + fp))
                   * (CAST(tp AS DOUBLE) / (tp + fn))
                 / ((CAST(tp AS DOUBLE) / (tp + fp))
                    + (CAST(tp AS DOUBLE) / (tp + fn))) END AS f1
FROM stats
ORDER BY cls
"""


@register("lang_id_class_metrics", oracle=_METRICS_ORACLE)
def lang_id_class_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per class (union of declared and predicted labels): support,
    TP/FP/FN and one-vs-rest precision/recall/F1 of the language-ID
    heuristic against the declared label."""
    # persisted: a ≤ |langs|²-cell frame consumed three times (both
    # union branches of the class list + the crossJoin) — unpersisted,
    # each reference re-runs the per-document regexp scan (the persist
    # pass convention; caller-must-clear contract, vocab.py)
    cells = (
        lang_id(spark, sf_dir)
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").cast("bigint").alias("n"))
        .persist()
    )
    classes = (
        cells.select(F.col("lang").alias("cls"))
        .union(cells.select("predicted_lang"))
        .distinct()
    )
    joined = F.broadcast(classes).crossJoin(cells)
    stats = joined.groupBy("cls").agg(
        F.coalesce(
            F.sum(F.when(F.col("lang") == F.col("cls"), F.col("n"))), F.lit(0)
        )
        .cast("bigint")
        .alias("support"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("lang") == F.col("cls"))
                    & (F.col("predicted_lang") == F.col("cls")),
                    F.col("n"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("tp"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("lang") != F.col("cls"))
                    & (F.col("predicted_lang") == F.col("cls")),
                    F.col("n"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("fp"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("lang") == F.col("cls"))
                    & (F.col("predicted_lang") != F.col("cls")),
                    F.col("n"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("fn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") == 0, F.lit(None).cast("double")
    ).otherwise(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")))
    rec = F.when(
        F.col("tp") + F.col("fn") == 0, F.lit(None).cast("double")
    ).otherwise(F.col("tp").cast("double") / (F.col("tp") + F.col("fn")))
    return stats.select(
        "cls",
        "support",
        "tp",
        "fp",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            (F.col("tp") + F.col("fp") == 0)
            | (F.col("tp") + F.col("fn") == 0)
            | (F.col("tp") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(2 * prec * rec / (prec + rec))
        .alias("f1"),
    ).orderBy("cls")
