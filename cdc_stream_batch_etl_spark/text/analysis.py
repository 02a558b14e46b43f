"""Text-analysis operators for the large-scale training-data pipeline:
token counting, quality scoring, language-ID heuristic, fingerprinting.

Beyond-reference surface (BASELINE.json north star). All operators are
pure built-in column expressions (split/regexp/md5) — JVM-side, codegen'd,
no Python UDFs — so they scale linearly over a 100 TB documents table with
zero shuffles (per-row) or one hash-agg shuffle (grouped outputs).

Determinism: tokenization splits on a single space (the corpus is
space-normalized); regex classes avoid engine-specific syntax so Java
regex (Spark) and RE2 (DuckDB) agree; hashes are md5 (identical hex in
both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_TOKEN_STATS_ORACLE = """
SELECT doc_id,
       lang,
       length(text) AS n_chars_actual,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS type_token_ratio,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / len(string_split(text, ' ')) AS avg_token_len
FROM documents
"""


@register("doc_token_stats", oracle=_TOKEN_STATS_ORACLE)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, unique tokens, type/token ratio,
    mean token length — all scan-local column expressions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_unique = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_actual"),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_unique.cast("bigint").alias("n_unique_tokens"),
        (n_unique.cast("double") / n_tokens).alias("type_token_ratio"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_tokens
        ).alias("avg_token_len"),
    )


# Quality scoring (reference-shaped: length/punct/stopword ratios).
# Stopwords chosen from the corpus vocabulary ('the', 'a').
_QUALITY_ORACLE = """
WITH q AS (
  SELECT doc_id,
         length(text) AS n_chars_actual,
         len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(text, '\\b(the|a)\\b')) AS n_stopwords,
         len(regexp_extract_all(text, '[[:punct:]]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digits
  FROM documents
)
SELECT doc_id, n_chars_actual, n_tokens,
       CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_punct AS DOUBLE) / n_chars_actual AS punct_ratio,
       CAST(n_digits AS DOUBLE) / n_chars_actual AS digit_ratio,
       CASE WHEN n_tokens >= 50 AND CAST(n_stopwords AS DOUBLE)/n_tokens BETWEEN 0.01 AND 0.3
              THEN 'high'
            WHEN n_tokens >= 20 THEN 'medium'
            ELSE 'low' END AS quality_label
FROM q
"""


@register("doc_quality", oracle=_QUALITY_ORACLE)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    n_stop = F.regexp_count(F.col("text"), F.lit(r"\b(the|a)\b"))
    n_punct = F.regexp_count(F.col("text"), F.lit(r"\p{Punct}"))
    n_digits = F.regexp_count(F.col("text"), F.lit("[0-9]"))
    stop_ratio = n_stop.cast("double") / n_tokens
    q = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        n_tokens.cast("bigint").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        (n_punct.cast("double") / F.length("text")).alias("punct_ratio"),
        (n_digits.cast("double") / F.length("text")).alias("digit_ratio"),
    )
    return q.withColumn(
        "quality_label",
        F.when(
            (F.col("n_tokens") >= 50)
            & F.col("stopword_ratio").between(0.01, 0.3),
            "high",
        )
        .when(F.col("n_tokens") >= 20, "medium")
        .otherwise("low"),
    )


# Language-ID: marker-word n-gram heuristic (public stopword markers per
# language; the corpus text is synthetic so this is a *heuristic shape*
# check, not ground-truth recovery — predicted_lang need not equal `lang`).
_MARKERS = {
    "en": r"\b(the|a|of|to|and)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|et|les|des)\b",
    "es": r"\b(el|los|y|las|es)\b",
}

_LANG_ORACLE = f"""
WITH s AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '{_MARKERS["en"]}')) AS en_score,
         len(regexp_extract_all(text, '{_MARKERS["de"]}')) AS de_score,
         len(regexp_extract_all(text, '{_MARKERS["fr"]}')) AS fr_score,
         len(regexp_extract_all(text, '{_MARKERS["es"]}')) AS es_score
  FROM documents
)
SELECT doc_id, lang, en_score, de_score, fr_score, es_score,
       CASE WHEN greatest(en_score, de_score, fr_score, es_score) = 0 THEN 'und'
            WHEN en_score >= greatest(de_score, fr_score, es_score) THEN 'en'
            WHEN de_score >= greatest(fr_score, es_score) THEN 'de'
            WHEN fr_score >= es_score THEN 'fr'
            ELSE 'es' END AS predicted_lang
FROM s
"""


@register("lang_id", oracle=_LANG_ORACLE)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scores = {
        k: F.regexp_count(F.col("text"), F.lit(p)).cast("bigint") for k, p in _MARKERS.items()
    }
    s = docs.select(
        "doc_id",
        "lang",
        scores["en"].alias("en_score"),
        scores["de"].alias("de_score"),
        scores["fr"].alias("fr_score"),
        scores["es"].alias("es_score"),
    )
    en, de, fr, es = (F.col(c) for c in ("en_score", "de_score", "fr_score", "es_score"))
    return s.withColumn(
        "predicted_lang",
        F.when(F.greatest(en, de, fr, es) == 0, "und")
        .when(en >= F.greatest(de, fr, es), "en")
        .when(de >= F.greatest(fr, es), "de")
        .when(fr >= es, "fr")
        .otherwise("es"),
    )


_FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(lower(trim(text))) AS content_md5,
       md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS prefix_md5,
       CAST(('0x' || substr(md5(lower(trim(text))), 1, 15)) AS BIGINT) AS fingerprint64
FROM documents
"""


@register("doc_fingerprint", oracle=_FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content hash (normalized), 8-word prefix
    hash (rolling-hash stand-in), and a 60-bit integer fingerprint derived
    from md5 — identical hex→int in Spark (`conv`) and DuckDB (hex cast)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    prefix = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        F.md5(prefix).alias("prefix_md5"),
        F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("bigint").alias("fingerprint64"),
    )
