"""PII scrubbing / text normalization for the training-data pipeline.

Beyond-reference operator: redact email addresses, phone-like number
sequences, and long digit runs from document text, and normalize
whitespace — the standard pre-training cleanup pass. Entirely scan-local
built-in column expressions (regexp_count / regexp_replace / trim):
JVM-side, codegen'd, zero shuffles, linear over a 100 TB corpus.

Regex portability: patterns stick to the syntax subset where Java regex
(Spark) and RE2 (DuckDB) agree — character classes, bounded/unbounded
repetition, alternation; no lookarounds, no backreferences. Replacement
order is email → phone → digit-run, applied identically in both engines
(order matters: a phone match could otherwise eat an email's digits).

The redaction *counts* are computed on the ORIGINAL text (before any
replacement) so they are independent of replacement order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE = r"\+?[0-9][0-9() .-]{6,}[0-9]"
DIGITS = r"[0-9]{6,}"

_SCRUB_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL}')) AS n_emails,
       len(regexp_extract_all(text, '{PHONE}')) AS n_phones,
       trim(regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{EMAIL}', '<EMAIL>', 'g'),
             '{PHONE}', '<PHONE>', 'g'),
           '{DIGITS}', '<NUM>', 'g'),
         ' +', ' ', 'g')) AS clean_text
FROM documents
"""


@register("pii_scrub", oracle=_SCRUB_ORACLE)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    clean = F.regexp_replace(text, EMAIL, "<EMAIL>")
    clean = F.regexp_replace(clean, PHONE, "<PHONE>")
    clean = F.regexp_replace(clean, DIGITS, "<NUM>")
    clean = F.trim(F.regexp_replace(clean, " +", " "))
    return docs.select(
        "doc_id",
        F.regexp_count(text, F.lit(EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(text, F.lit(PHONE)).cast("bigint").alias("n_phones"),
        clean.alias("clean_text"),
    )
