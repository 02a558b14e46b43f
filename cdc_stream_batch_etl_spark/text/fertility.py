"""Tokenizer fertility audit — tokens-per-word and bytes-per-token by
language (the multilingual-tokenizer budgeting table; beyond-reference,
SURVEY §2.11 text family next to bpe_token_count).

Fertility (subword tokens per whitespace word) is THE number a
multilingual pipeline reads before fixing a token budget: a language
whose fertility is 2× pays 2× the context window for the same text, and
per-language compute/quota plans (token_quota_by_source,
lang_temperature_sample) silently misallocate if they budget in words.
This reports, per language: document and word volumes, BPE-ish token
volume under the engine's GPT-2-style pre-tokenizer (bpe.py's
_BPE_PATTERN — the same regex, so the numbers compose with
bpe_token_count's per-doc view), fertility, and bytes per BPE token
(the UTF-8 compression rate the embedding table actually pays).

Determinism: counts are exact BIGINT sums folded map-side; the three
ratios are single IEEE divisions of exact integers — no float
accumulation anywhere.

Scale: one documents scan, regexp_count + size() scan-local inside
codegen, then a |langs|-row hash agg with map-side partials. No joins,
no window, one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .bpe import _BPE_PATTERN, _BPE_PATTERN_SQL

_FERTILITY_ORACLE = f"""
WITH d AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_ws,
         len(regexp_extract_all(text, '{_BPE_PATTERN_SQL}')) AS n_bpe,
         length(text) AS n_bytes
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_ws) AS BIGINT) AS n_ws_tokens,
       CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
       CAST(sum(n_bpe) AS DOUBLE) / sum(n_ws) AS fertility,
       CAST(sum(n_bytes) AS DOUBLE) / sum(n_bpe) AS bytes_per_bpe_token,
       CAST(sum(n_bytes) AS DOUBLE) / sum(n_ws) AS bytes_per_word
FROM d
GROUP BY lang
ORDER BY lang
"""


@register("tokenizer_fertility", oracle=_FERTILITY_ORACLE)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, n_ws_tokens, n_bpe_tokens, n_bytes, fertility,
    bytes_per_bpe_token, bytes_per_word) — the per-language tokenizer
    cost table. The corpus is ASCII so length() is bytes in both
    engines (the bpe.py portability note)."""
    docs = load_table(spark, sf_dir, "documents")
    n_ws = F.size(F.split(F.col("text"), " ")).cast("bigint")
    n_bpe = F.regexp_count(F.col("text"), F.lit(_BPE_PATTERN)).cast("bigint")
    per_doc = docs.select(
        "lang",
        n_ws.alias("n_ws"),
        n_bpe.alias("n_bpe"),
        F.length("text").cast("bigint").alias("n_bytes"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_ws").alias("n_ws_tokens"),
            F.sum("n_bpe").alias("n_bpe_tokens"),
            F.sum("n_bytes").alias("n_bytes"),
        )
        .select(
            "lang",
            "n_docs",
            "n_ws_tokens",
            "n_bpe_tokens",
            "n_bytes",
            (F.col("n_bpe_tokens").cast("double") / F.col("n_ws_tokens")).alias(
                "fertility"
            ),
            (F.col("n_bytes").cast("double") / F.col("n_bpe_tokens")).alias(
                "bytes_per_bpe_token"
            ),
            (F.col("n_bytes").cast("double") / F.col("n_ws_tokens")).alias(
                "bytes_per_word"
            ),
        )
        .orderBy("lang")
    )
