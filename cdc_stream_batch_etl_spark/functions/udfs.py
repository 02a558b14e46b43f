"""SQL-callable UDF surface — the §2.10 passthrough.

The reference has no formal UDFs (SURVEY §2.10): its per-event Python
handlers all decomposed into built-in operators, and the engine's hot
paths are pure Catalyst expressions. This module is the *interop*
surface that section promises: a SQL user (spark.sql / the sql.py
passthrough) can call the text-analysis primitives by name.

Two tiers, deliberately:
- `quality_label(text)` / `predicted_lang(text)` are **Arrow-vectorized
  pandas UDFs** — the correct shape when Python is genuinely in the loop
  (10-100x over row-at-a-time per the Spark docs, and the only Python
  UDF style this engine permits).
- The same semantics exist as pure built-in expressions in
  text/analysis.py — THAT is the hot path. tests/test_udfs.py pins the
  two tiers to byte-identical outputs, so the UDFs can never drift from
  the oracled operators.

At 100 TB: registered UDFs are for ad-hoc SQL exploration; pipelines
should compose the DataFrame operators. Python-side regex (Python `re`)
and JVM-side regex (`regexp_count`) agree on this dialect because the
patterns stick to RE2-portable constructs (see text/scrub.py).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_STOPWORDS = re.compile(r"\b(the|a)\b")
_MARKERS = {
    "en": re.compile(r"\b(the|a|of|to|and)\b"),
    "de": re.compile(r"\b(der|die|und|das|ist)\b"),
    "fr": re.compile(r"\b(le|la|et|les|des)\b"),
    "es": re.compile(r"\b(el|los|y|las|es)\b"),
}


def _quality_label(text: pd.Series) -> pd.Series:
    """Arrow-batched twin of text/analysis.py doc_quality's label column."""

    def label(t: str) -> str:
        n_tokens = len(t.split(" "))
        n_stop = len(_STOPWORDS.findall(t))
        ratio = n_stop / n_tokens
        if n_tokens >= 50 and 0.01 <= ratio <= 0.3:
            return "high"
        if n_tokens >= 20:
            return "medium"
        return "low"

    return text.map(label)


def _predicted_lang(text: pd.Series) -> pd.Series:
    """Arrow-batched twin of text/analysis.py lang_id's marker heuristic
    (same >= tie-break order: en, de, fr, es)."""

    def guess(t: str) -> str:
        scores = {lang: len(rx.findall(t)) for lang, rx in _MARKERS.items()}
        if max(scores.values()) == 0:
            return "und"
        for lang in ("en", "de", "fr", "es"):
            if scores[lang] == max(scores.values()):
                return lang
        return "und"

    return text.map(guess)


def register_text_udfs(spark: SparkSession) -> None:
    """Make the text primitives callable from SQL:
    ``SELECT quality_label(text), predicted_lang(text) FROM documents``.

    The pandas_udf wrapping happens here (not at import) because Spark
    resolves UDF return types against the active session."""
    spark.udf.register("quality_label", pandas_udf(_quality_label, "string"))
    spark.udf.register("predicted_lang", pandas_udf(_predicted_lang, "string"))
