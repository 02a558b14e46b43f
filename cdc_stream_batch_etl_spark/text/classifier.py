"""Model-based quality scoring — a fixed-weight linear classifier.

Production corpus filters (CCNet, fastText quality classifiers, the
GPT-3 "Wikipedia-like" logistic filter) score documents with a trained
linear model over cheap features, not hand-written rules. This operator
is that shape with PUBLISHED fixed weights (no training dependency): the
features are the doc_quality ratios plus length/diversity signals, the
score is one dot product, the decision one threshold — all scan-local
JVM expressions, zero Python, zero shuffles before the final scan
output.

Rule-based `doc_quality` (analysis.py) and this classifier are the two
standard generations of the same gate; `clean_corpus` composes the
rule-based one, and a caller can swap this in by filtering
``keep = true``.

Determinism (atol=0 oracle): the logit is a FIXED chain of IEEE double
multiply/adds written in the same association order in Spark and DuckDB
— bit-identical without any decimal detour (each feature is an exact
integer→double division; no ln/exp — instead of a sigmoid probability we
emit the raw logit and the boolean decision, which carry the same
information monotonically).

Scale: embarrassingly parallel single scan; the plan is one
WholeStageCodegen project over the parquet read (see PLANS.md row) — at
100 TB this runs at I/O speed, which is exactly why production pipelines
run the linear gate BEFORE any shuffle-bearing dedup stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# fixed model: intercept + weights over the 5 features, in score order
W0 = -1.25  # intercept
W_TOK = 0.02  # n_tokens (length prior, saturates via cap below)
W_STOP = 4.0  # stopword_ratio (prose-likeness)
W_TTR = 1.5  # type_token_ratio (vocabulary diversity)
W_DIGIT = -6.0  # digit_ratio (tables/serial dumps)
W_WS = -2.0  # excess_whitespace_ratio (markup/boilerplate)
TOK_CAP = 200  # length feature saturation


_CLASSIFIER_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         CAST(least(len(string_split(text, ' ')), {TOK_CAP}) AS DOUBLE) AS f_tok,
         CAST(len(regexp_extract_all(text, '\\b(the|a)\\b')) AS DOUBLE)
           / len(string_split(text, ' ')) AS f_stop,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS f_ttr,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
           / length(text) AS f_digit,
         CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
           / length(text) AS f_ws
  FROM documents
)
SELECT doc_id, f_tok, f_stop, f_ttr, f_digit, f_ws,
       {W0} + {W_TOK} * f_tok + {W_STOP} * f_stop + {W_TTR} * f_ttr
            + {W_DIGIT} * f_digit + {W_WS} * f_ws AS logit,
       ({W0} + {W_TOK} * f_tok + {W_STOP} * f_stop + {W_TTR} * f_ttr
            + {W_DIGIT} * f_digit + {W_WS} * f_ws) >= 0 AS keep
FROM f
"""


@register("quality_classifier", oracle=_CLASSIFIER_ORACLE)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality gate: per-doc features, logit, and keep decision."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    f_tok = F.least(n_tokens, F.lit(TOK_CAP)).cast("double")
    f_stop = F.regexp_count(F.col("text"), F.lit(r"\b(the|a)\b")).cast("double") / n_tokens
    f_ttr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    f_digit = F.regexp_count(F.col("text"), F.lit("[0-9]")).cast("double") / F.length("text")
    f_ws = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).cast(
            "double"
        )
        / F.length("text")
    )
    feats = docs.select(
        "doc_id",
        f_tok.alias("f_tok"),
        f_stop.alias("f_stop"),
        f_ttr.alias("f_ttr"),
        f_digit.alias("f_digit"),
        f_ws.alias("f_ws"),
    )
    # same association order as the oracle: ((((w0 + a) + b) + c) + d) + e
    logit = (
        F.lit(W0)
        + F.lit(W_TOK) * F.col("f_tok")
        + F.lit(W_STOP) * F.col("f_stop")
        + F.lit(W_TTR) * F.col("f_ttr")
        + F.lit(W_DIGIT) * F.col("f_digit")
        + F.lit(W_WS) * F.col("f_ws")
    )
    return feats.select(
        "*",
        logit.alias("logit"),
        (logit >= 0).alias("keep"),
    )
