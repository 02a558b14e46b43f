"""Corpus data card — per-(source, lang) corpus accounting.

Beyond-reference. Every curated training corpus ships a "data card":
per-shard document counts, token mass, duplication rate, and quality
flags, so composition decisions (upsample X, drop Y) are made from
numbers rather than folklore, and regressions in an upstream crawl show
up as a diff of this table.

One groupBy(source, lang) pass over the corpus — a single shuffle with
map-side partial aggregation; every metric is either an exact integer
aggregate or a ratio of exact integers (double division), so the DuckDB
oracle matches bit-for-bit. The exact-distinct of md5 digests inside each
group is the same digest the exact-dedup operator keys on
(dedup/exact.py), making dup_rate here consistent with what
`dedup_exact` would actually remove.

Scale: output cardinality is |sources| × |langs| (tiny); the shuffle
carries pre-aggregated partial states, not documents. At 100 TB this is
one of the cheapest full-corpus passes in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

SHORT_DOC_TOKENS = 20  # docs under this many words are flagged "short"


_DATACARD_ORACLE = f"""
SELECT source, lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
       min(n_tokens) AS min_tokens,
       max(n_tokens) AS max_tokens,
       count(DISTINCT digest) AS n_distinct_texts,
       1.0 - CAST(count(DISTINCT digest) AS DOUBLE) / count(*) AS dup_rate,
       CAST(sum(CASE WHEN n_tokens < {SHORT_DOC_TOKENS} THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS short_doc_pct
FROM (
  SELECT source, lang, md5(text) AS digest,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
GROUP BY source, lang
"""


@register("corpus_datacard", oracle=_DATACARD_ORACLE)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-(source, lang) data card: counts, token mass, exact-dup
    rate (on the dedup_exact digest), and short-doc share."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        F.md5("text").alias("digest"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    return base.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.countDistinct("digest").alias("n_distinct_texts"),
        (F.lit(1.0) - F.countDistinct("digest").cast("double") / F.count("*")).alias(
            "dup_rate"
        ),
        (
            F.sum(F.when(F.col("n_tokens") < SHORT_DOC_TOKENS, 1).otherwise(0)).cast(
                "double"
            )
            / F.count("*")
        ).alias("short_doc_pct"),
    )


# Oracle is an INDEPENDENT formulation (digest self-join) of what the
# Spark plan computes by grouped pair-explosion — stronger evidence than
# a transliterated query.
_OVERLAP_ORACLE = """
WITH ds AS (SELECT DISTINCT md5(text) AS digest, source FROM documents)
SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared_digests
FROM ds a JOIN ds b ON a.digest = b.digest AND a.source < b.source
GROUP BY 1, 2
"""


@register("source_overlap", oracle=_OVERLAP_ORACLE)
def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-shard duplication provenance: for every source pair, how
    many distinct content digests they share. Answers "which crawls are
    mirroring each other" before dedup throws the copies away.

    Plan: groupBy(digest) → sorted distinct source list → in-group pair
    explosion (the LSH bucket idiom) → count per pair. One digest
    shuffle; no self-join of the corpus, and a digest shared by k
    sources costs C(k,2) ≤ C(|sources|,2) rows — bounded by the source
    count, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    per_digest = (
        docs.groupBy(F.md5("text").alias("digest"))
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    pairs = per_digest.select(
        F.explode(
            F.expr(
                "flatten(transform(srcs, (x, i) -> "
                "transform(slice(srcs, i + 2, size(srcs)), "
                "y -> struct(x AS source_a, y AS source_b))))"
            )
        ).alias("p")
    ).select("p.source_a", "p.source_b")
    return pairs.groupBy("source_a", "source_b").agg(
        F.count("*").alias("shared_digests")
    )
