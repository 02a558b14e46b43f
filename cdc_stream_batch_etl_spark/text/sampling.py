"""Deterministic corpus splitting and sampling for training pipelines.

Beyond-reference operators. A training-data pipeline needs (a) a stable
train/val/test assignment that never changes as the corpus grows or is
re-partitioned, and (b) per-stratum downsampling (e.g. re-balance an
English-heavy crawl). Both must be *content-addressed* — a function of the
row's key only — so re-runs, backfills, and cluster re-shuffles cannot
move a document across splits (the classic train/test-contamination bug
with ``rand()``-based splits; Spark's ``randomSplit`` is additionally
partition-order-dependent, so it is wrong twice at 100 TB).

Mechanism: bucket = first 60 bits of md5(doc_id) mod 100 — identical
arithmetic in Spark (``conv(substr(md5(..),1,15),16,10)``) and DuckDB
(``CAST('0x'||substr(..) AS BIGINT)``), fully scan-local (no shuffle, no
state, embarrassingly parallel), and stable under any row ordering.

Reference tie-in: the generator's ORDER BY RANDOM() LIMIT 1 sampling
(data_generator.py:157,166 — SURVEY.md O4) is the non-deterministic
ancestor; random_pick covers that shape, these operators are its
production-grade replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

TRAIN_PCT = 80
VAL_PCT = 10  # test gets the remainder

# per-language keep-rate (percent) for the stratified rebalance
RATES = {"en": 20, "de": 60, "fr": 60, "es": 60}
_DEFAULT_RATE = 100


def _bucket_spark(key: F.Column) -> F.Column:
    """60-bit md5 prefix of the key, mod 100 — the stable split bucket."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("bigint") % 100


def _bucket_sql(key: str) -> str:
    return f"CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT) % 100"


_SPLIT_ORACLE = f"""
SELECT doc_id, lang,
       {_bucket_sql("doc_id")} AS bucket,
       CASE WHEN {_bucket_sql("doc_id")} < {TRAIN_PCT} THEN 'train'
            WHEN {_bucket_sql("doc_id")} < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@register("train_test_split", oracle=_SPLIT_ORACLE)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = _bucket_spark(F.col("doc_id"))
    return docs.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


_rate_cases = " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in RATES.items())

_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_bucket_sql("doc_id")} < (CASE {_rate_cases} ELSE {_DEFAULT_RATE} END)
"""


@register("stratified_sample", oracle=_SAMPLE_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing downsample: keep RATES[lang]% of each stratum,
    content-addressed (same bucket function as the split, so sampling is
    reproducible row-by-row across runs and engines)."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in RATES.items()],
        F.lit(_DEFAULT_RATE),
    )
    return docs.filter(_bucket_spark(F.col("doc_id")) < rate).select(
        "doc_id", "lang", "n_chars"
    )


# per-source document quota for the crawl-balance sample
SOURCE_QUOTA = 15

_QUOTA_ORACLE = f"""
SELECT doc_id, source, quota_rank
FROM (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY {_bucket_sql("doc_id")} ASC, doc_id ASC) AS BIGINT) AS quota_rank
  FROM documents
)
WHERE quota_rank <= {SOURCE_QUOTA}
"""


@register("source_quota_sample", oracle=_QUOTA_ORACLE)
def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota (crawl curation: no source may dominate): keep at
    most SOURCE_QUOTA docs per source, chosen by the content-addressed
    md5 bucket (then doc_id) — so the kept set is a stable pseudo-random
    sample per source, invariant under re-runs and re-partitioning, NOT
    "first N by arrival". One shuffle on source; the window carries only
    (doc_id, source)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    rank = F.row_number().over(
        Window.partitionBy("source").orderBy(
            _bucket_spark(F.col("doc_id")).asc(), F.col("doc_id").asc()
        )
    )
    return (
        docs.select("doc_id", "source", rank.cast("bigint").alias("quota_rank"))
        .filter(F.col("quota_rank") <= SOURCE_QUOTA)
    )


# keep documents at or above this quality-score quantile
QUALITY_QUANTILE = 0.75

_TOPK_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS score
  FROM documents
), thr AS (
  SELECT quantile_cont(score, {QUALITY_QUANTILE}) AS t FROM scored
)
SELECT s.doc_id, s.lang, s.score
FROM scored s CROSS JOIN thr
WHERE s.score >= thr.t
"""


@register("quality_topk_sample", oracle=_TOPK_ORACLE)
def quality_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the top (1 - QUALITY_QUANTILE) of documents by quality score
    (type-token ratio here; any scalar scorer slots in) WITHOUT a global
    sort: pass 1 reduces to one exact-percentile threshold row, pass 2
    broadcasts it and filters scan-locally — the selection-by-learned-
    score step of a data pipeline, in the price_deciles plan shape.
    Filter-by-threshold (not LIMIT k) keeps ties deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    score = (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias("score")
    scored = docs.select("doc_id", "lang", score)
    thr = scored.agg(F.percentile(F.col("score"), F.lit(QUALITY_QUANTILE)).alias("t"))
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("score") >= F.col("t"))
        .select("doc_id", "lang", "score")
    )
