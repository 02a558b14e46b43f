"""Corpus gate funnel — per-stage attrition accounting for the cleaning
pipeline (the observability table curation teams actually watch).

``clean_corpus`` (text/corpus.py) answers "which documents survive";
this answers "how many did each gate remove" — the number that makes a
regressing upstream crawl or an over-aggressive gate visible as a diff
between runs. Mirrors clean_corpus's stage semantics EXACTLY (same
token floor, same marker regexes, same exact-dedup canonicalization on
md5 of normalized text), minus the LSH stage (whose removal count is
already reported by ``lsh_bucket_stats`` / ``dup_cluster_stats``).

Output: one row per stage with surviving count, removed-at-stage count,
and the exact survivor ratio — tiny (4 rows), safe to collect anywhere.

Scale: each stage count is one aggregate over the corpus with the gate
predicates fused into the scan by Catalyst; the exact-dedup stage adds
one digest-keyed distinct. The union of 4 scalar aggregates beats a
window-over-everything formulation (no giant shuffle, each leg prunes
its own columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .corpus import MIN_TOKENS

_MARKER_SQL = (
    "greatest("
    "len(regexp_extract_all(text, '\\b(the|a|of|to|and)\\b')), "
    "len(regexp_extract_all(text, '\\b(der|die|und|das|ist)\\b')), "
    "len(regexp_extract_all(text, '\\b(le|la|et|les|des)\\b')), "
    "len(regexp_extract_all(text, '\\b(el|los|y|las|es)\\b'))) > 0"
)

_FUNNEL_ORACLE = f"""
WITH total AS (SELECT count(*) AS n FROM documents),
q AS (
  SELECT count(*) AS n FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_TOKENS}
),
l AS (
  SELECT count(*) AS n FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_TOKENS} AND {_MARKER_SQL}
),
d AS (
  SELECT count(DISTINCT md5(lower(trim(text)))) AS n FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_TOKENS} AND {_MARKER_SQL}
)
SELECT stage, CAST(stage_idx AS BIGINT) AS stage_idx,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_removed AS BIGINT) AS n_removed,
       CAST(n_docs AS DOUBLE) / (SELECT n FROM total) AS survivor_ratio
FROM (
  SELECT 'ingest' AS stage, 0 AS stage_idx, (SELECT n FROM total) AS n_docs, 0 AS n_removed
  UNION ALL
  SELECT 'quality_gate', 1, (SELECT n FROM q), (SELECT n FROM total) - (SELECT n FROM q)
  UNION ALL
  SELECT 'lang_gate', 2, (SELECT n FROM l), (SELECT n FROM q) - (SELECT n FROM l)
  UNION ALL
  SELECT 'exact_dedup', 3, (SELECT n FROM d), (SELECT n FROM l) - (SELECT n FROM d)
)
"""


@register("corpus_gate_funnel", oracle=_FUNNEL_ORACLE)
def corpus_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-row attrition table: ingest → quality gate → language gate →
    exact dedup, with per-stage removed counts and exact survivor
    ratios (same gate semantics as clean_corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    marker_hits = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"\b(the|a|of|to|and)\b")),
        F.regexp_count(F.col("text"), F.lit(r"\b(der|die|und|das|ist)\b")),
        F.regexp_count(F.col("text"), F.lit(r"\b(le|la|et|les|des)\b")),
        F.regexp_count(F.col("text"), F.lit(r"\b(el|los|y|las|es)\b")),
    )
    quality = n_tokens >= MIN_TOKENS
    lang = quality & (marker_hits > 0)

    counts = docs.agg(
        F.count("*").alias("total"),
        F.sum(F.when(quality, 1).otherwise(0)).alias("q"),
        F.sum(F.when(lang, 1).otherwise(0)).alias("l"),
        F.count_distinct(
            F.when(lang, F.md5(F.lower(F.trim(F.col("text")))))
        ).alias("d"),
    )
    stages = F.array(
        F.struct(F.lit("ingest").alias("stage"), F.lit(0).alias("stage_idx"),
                 F.col("total").alias("n_docs"), F.lit(0).cast("bigint").alias("n_removed")),
        F.struct(F.lit("quality_gate").alias("stage"), F.lit(1).alias("stage_idx"),
                 F.col("q").alias("n_docs"), (F.col("total") - F.col("q")).alias("n_removed")),
        F.struct(F.lit("lang_gate").alias("stage"), F.lit(2).alias("stage_idx"),
                 F.col("l").alias("n_docs"), (F.col("q") - F.col("l")).alias("n_removed")),
        F.struct(F.lit("exact_dedup").alias("stage"), F.lit(3).alias("stage_idx"),
                 F.col("d").alias("n_docs"), (F.col("l") - F.col("d")).alias("n_removed")),
    )
    return (
        counts.select(F.col("total"), F.explode(stages).alias("s"))
        .select(
            "s.stage",
            F.col("s.stage_idx").cast("bigint").alias("stage_idx"),
            F.col("s.n_docs").cast("bigint").alias("n_docs"),
            F.col("s.n_removed").cast("bigint").alias("n_removed"),
            (F.col("s.n_docs").cast("double") / F.col("total")).alias("survivor_ratio"),
        )
    )
