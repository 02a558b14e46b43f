"""Corpus-level lexical statistics per source — vocabulary size, hapax
mass, and type-token ratio.

text/analysis.py profiles documents one at a time (scan-local); this is
the CORPUS-level companion: how large is each source's vocabulary, how
much of it is hapax legomena (words seen exactly once — the classic
proxy for OCR noise and boilerplate churn), and the aggregate
type-token ratio. Dataset cards (C4, Dolma) publish exactly these
numbers per source.

Plan shape: the canonical two-stage wordcount — explode words, partial
map-side count into a (source, word) shuffle, then a source-keyed
rollup of the word counts. The word-level aggregate is the only
corpus-sized shuffle; at 100 TB it is the same plan as every
inverted-index build (text/postings.py). TTR is a single integer/
integer division — engine-exact.

Determinism: single-space tokenization (the corpus convention,
text/analysis.py); counts are integers; the one double is a division
of two exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_ORACLE = """
WITH w AS (
  SELECT source, doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
), wc AS (
  SELECT source, word, count(*) AS cnt
  FROM w GROUP BY 1, 2
), docs AS (
  SELECT source, count(DISTINCT doc_id) AS n_docs FROM w GROUP BY 1
)
SELECT wc.source,
       d.n_docs,
       CAST(sum(wc.cnt) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(count(*) FILTER (WHERE wc.cnt = 1) AS BIGINT) AS n_hapax,
       CAST(count(*) AS DOUBLE) / sum(wc.cnt) AS type_token_ratio,
       CAST(count(*) FILTER (WHERE wc.cnt = 1) AS DOUBLE) / sum(wc.cnt)
         AS hapax_share
FROM wc JOIN docs d ON wc.source = d.source
GROUP BY wc.source, d.n_docs
"""


@register("lexical_stats", oracle=_ORACLE)
def lexical_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_tokens, n_types, n_hapax, type_token_ratio,
    hapax_share) — corpus vocabulary profile per source."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "source", "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    wc = w.groupBy("source", "word").agg(F.count("*").alias("cnt"))
    ndocs = w.groupBy("source").agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        wc.groupBy("source")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.count(F.when(F.col("cnt") == 1, 1)).alias("n_hapax"),
        )
        .join(F.broadcast(ndocs), "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_types",
            "n_hapax",
            (F.col("n_types").cast("double") / F.col("n_tokens")).alias(
                "type_token_ratio"
            ),
            (F.col("n_hapax").cast("double") / F.col("n_tokens")).alias("hapax_share"),
        )
    )
