"""Precision-recall curve: the linear quality classifier scored against
the rule-based gate across a threshold grid (beyond-reference, SURVEY
§2.11 eval family next to quality_calibration / lang_id_class_metrics:
calibration asks "are the scores honest probabilities-ish", this asks
the operating question — WHERE to put the logit threshold and what
precision/recall each choice buys, the curve a corpus engineer reads
before turning the model gate on).

Semantics: score = quality_classifier's logit (text/classifier.py, the
fixed-weight linear model); reference label = doc_quality's 'high'
rule (analysis.py: n_tokens >= 50 AND stopword_ratio in [0.01, 0.3]).
For each threshold t in the fixed grid {-1.0, -0.8, ..., 4.8, 5.0}
(i/5 for i in -5..25), predicted-positive = logit >= t; the row
reports tp/fp/fn/tn, precision (NULL when nothing predicted), recall,
and F1 via the division-guard-free identity f1 = 2*tp/(pp+pos).

Exactness: the logit is classifier.py's fixed IEEE chain (identical
association order both engines); grid literals are emitted from ONE
Python tuple via repr() into both legs, so the >= comparisons see
bit-identical constants. Counts are integers; the exported ratios are
exact int/int -> double divisions.

Scale: ONE documents scan — the 31 thresholds become 62 conditional
sums inside a single map-side-combining aggregate (constant width), and
the curve materializes by unpivoting the one aggregate row driver-side.
The naive |docs| x |grid| cross join lives only in the DuckDB oracle;
the Spark plan never replicates the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.parallelism import fan_out
from ..registry import register
from .classifier import TOK_CAP, W0, W_DIGIT, W_STOP, W_TOK, W_TTR, W_WS

#: logit thresholds: i/5 for i in -5..25 — repr()'d into BOTH legs.
T_GRID: tuple[float, ...] = tuple(i / 5 for i in range(-5, 26))

_GRID_VALUES = ", ".join(f"({t!r})" for t in T_GRID)

_PR_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         CAST(least(len(string_split(text, ' ')), {TOK_CAP}) AS DOUBLE)
           AS f_tok,
         CAST(len(regexp_extract_all(text, '\\b(the|a)\\b')) AS DOUBLE)
           / len(string_split(text, ' ')) AS f_stop,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS f_ttr,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
           / length(text) AS f_digit,
         CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
           / length(text) AS f_ws,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
scored AS (
  SELECT {W0} + {W_TOK} * f_tok + {W_STOP} * f_stop + {W_TTR} * f_ttr
           + {W_DIGIT} * f_digit + {W_WS} * f_ws AS logit,
         n_tokens >= 50 AND f_stop BETWEEN 0.01 AND 0.3 AS label
  FROM f
),
grid AS (SELECT * FROM (VALUES {_GRID_VALUES}) g(threshold)),
cells AS (
  SELECT g.threshold,
         CAST(sum(CASE WHEN s.logit >= g.threshold AND s.label
                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN s.logit >= g.threshold
                  THEN 1 ELSE 0 END) AS BIGINT) AS pp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN s.label THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM scored s CROSS JOIN grid g
  GROUP BY g.threshold
)
SELECT threshold, tp,
       pp - tp AS fp,
       pos - tp AS fn,
       n - pp - pos + tp AS tn,
       CASE WHEN pp > 0 THEN CAST(tp AS DOUBLE) / pp END AS precision,
       CASE WHEN pos > 0 THEN CAST(tp AS DOUBLE) / pos END AS recall,
       CASE WHEN pp + pos > 0
            THEN 2 * CAST(tp AS DOUBLE) / (pp + pos) END AS f1
FROM cells
ORDER BY threshold
"""


@register("quality_pr_curve", oracle=_PR_ORACLE)
def quality_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """31-row PR curve: classifier logit vs the doc_quality 'high'
    rule — confusion counts, precision, recall, F1 per threshold."""
    # fan_out: the regex/split feature chain is the CPU-dominant
    # scan-local step; widen the single-row-group scan so the 62
    # conditional sums' map side runs cluster-wide (integer partial
    # aggregation — partitioning cannot change the totals)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    f_tok = F.least(n_tokens, F.lit(TOK_CAP)).cast("double")
    f_stop = (
        F.regexp_count(F.col("text"), F.lit(r"\b(the|a)\b")).cast("double")
        / n_tokens
    )
    f_ttr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    f_digit = (
        F.regexp_count(F.col("text"), F.lit("[0-9]")).cast("double")
        / F.length("text")
    )
    f_ws = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    ).cast("double") / F.length("text")
    logit = (
        F.lit(W0)
        + F.lit(W_TOK) * f_tok
        + F.lit(W_STOP) * f_stop
        + F.lit(W_TTR) * f_ttr
        + F.lit(W_DIGIT) * f_digit
        + F.lit(W_WS) * f_ws
    )
    label = (n_tokens >= 50) & f_stop.between(0.01, 0.3)
    scored = docs.select(logit.alias("logit"), label.alias("label"))

    aggs = []
    for i, t in enumerate(T_GRID):
        pred = F.col("logit") >= F.lit(t)
        aggs.append(
            F.sum(F.when(pred & F.col("label"), 1).otherwise(0))
            .cast("bigint")
            .alias(f"tp_{i}")
        )
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(f"pp_{i}")
        )
    aggs.append(F.count("*").cast("bigint").alias("n"))
    aggs.append(
        F.sum(F.when(F.col("label"), 1).otherwise(0))
        .cast("bigint")
        .alias("pos")
    )
    one = scored.agg(*aggs)

    stack_args = ", ".join(
        f"CAST({t!r} AS DOUBLE), tp_{i}, pp_{i}" for i, t in enumerate(T_GRID)
    )
    curve = one.selectExpr(
        f"stack({len(T_GRID)}, {stack_args}) AS (threshold, tp, pp)",
        "n",
        "pos",
    )
    return curve.select(
        "threshold",
        "tp",
        (F.col("pp") - F.col("tp")).alias("fp"),
        (F.col("pos") - F.col("tp")).alias("fn"),
        (F.col("n") - F.col("pp") - F.col("pos") + F.col("tp")).alias("tn"),
        F.when(
            F.col("pp") > 0, F.col("tp").cast("double") / F.col("pp")
        ).alias("precision"),
        F.when(
            F.col("pos") > 0, F.col("tp").cast("double") / F.col("pos")
        ).alias("recall"),
        F.when(
            F.col("pp") + F.col("pos") > 0,
            2 * F.col("tp").cast("double") / (F.col("pp") + F.col("pos")),
        ).alias("f1"),
    ).orderBy("threshold")
