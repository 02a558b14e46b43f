"""N-gram decontamination and boilerplate detection.

Beyond-reference operators. Two corpus-hygiene audits a training pipeline
runs that exact-digest matching (text/contamination.py) cannot express:

- ngram_contamination: PARTIAL benchmark leakage — an eval document whose
  5-grams substantially overlap the train split is contaminated even if
  no train document matches it verbatim (the GPT-3/PaLM n-gram
  decontamination methodology, applied at 5-gram granularity to this
  corpus's ~50-token documents).
- boilerplate_ratio: per-document fraction of 3-grams that are corpus
  boilerplate (shared by many distinct documents) — the template/header
  detection signal quality filters consume (RefinedWeb-style).

Scale shape: both are explode→narrow-shuffle plans. Grams leave the scan
as 60-bit md5 integers (dedup/__init__.py helpers), so the shuffled rows
are (bigint, bigint) pairs — gram text never crosses an exchange. The
train-gram set and the boilerplate-gram set are DISTINCT-reduced before
their joins; at 100 TB both joins shuffle on uniform hash keys (no skew:
gram hashes are uniform by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup import hash64_expr, hash64_sql, shingles_col, shingles_sql
from ..functions.parallelism import fan_out
from ..registry import register
from .sampling import TRAIN_PCT, VAL_PCT, _bucket_spark, _bucket_sql

CONTAM_NGRAM = 5
CONTAM_THRESHOLD = 0.5

BOILER_NGRAM = 3
BOILER_MIN_DOCS = 50

_CONTAM_ORACLE = f"""
WITH tagged AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         CASE WHEN {_bucket_sql("doc_id")} < {TRAIN_PCT} THEN 'train'
              WHEN {_bucket_sql("doc_id")} < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), sh AS (
  SELECT doc_id, split, {shingles_sql(CONTAM_NGRAM)} AS shingles FROM tagged
), grams AS (
  SELECT doc_id, split, {hash64_sql("unnest(shingles)")} AS gram FROM sh
), train_grams AS (
  SELECT DISTINCT gram FROM grams WHERE split = 'train'
), eval_overlap AS (
  SELECT g.doc_id, count(*) AS n_overlap
  FROM grams g JOIN train_grams t USING (gram)
  WHERE g.split <> 'train'
  GROUP BY g.doc_id
)
SELECT s.doc_id, s.split,
       CAST(len(s.shingles) AS BIGINT) AS n_grams,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / greatest(len(s.shingles), 1)
         AS overlap_ratio,
       CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / greatest(len(s.shingles), 1)
         >= {CONTAM_THRESHOLD} AS is_contaminated
FROM sh s LEFT JOIN eval_overlap o ON s.doc_id = o.doc_id
WHERE s.split <> 'train'
"""


@register("ngram_contamination", oracle=_CONTAM_ORACLE)
def ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per eval-split document: fraction of its 5-grams that appear
    anywhere in the train split; contaminated above CONTAM_THRESHOLD."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _bucket_spark(F.col("doc_id"))
    # fan_out + persist: shingling is the CPU-dominant scan-local step
    # and sh feeds THREE consumers (train grams, eval grams, the final
    # eval-side join) — uncached it re-runs per consumer, single-task
    sh = (
        fan_out(docs)
        .select(
            "doc_id",
            F.when(bucket < TRAIN_PCT, "train")
            .when(bucket < TRAIN_PCT + VAL_PCT, "val")
            .otherwise("test")
            .alias("split"),
            shingles_col("text", CONTAM_NGRAM).alias("shingles"),
        )
        .persist()
    )
    grams = sh.select(
        "doc_id", "split", F.explode("shingles").alias("shingle")
    ).select("doc_id", "split", F.expr(hash64_expr("shingle")).alias("gram"))
    train_grams = grams.filter(F.col("split") == "train").select("gram").distinct()
    eval_overlap = (
        grams.filter(F.col("split") != "train")
        .join(train_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    ev = sh.filter(F.col("split") != "train")
    ratio = F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double") / F.greatest(
        F.size("shingles"), F.lit(1)
    )
    return ev.join(eval_overlap, "doc_id", "left").select(
        "doc_id",
        "split",
        F.size("shingles").cast("bigint").alias("n_grams"),
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
        ratio.alias("overlap_ratio"),
        (ratio >= CONTAM_THRESHOLD).alias("is_contaminated"),
    )


_BOILER_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {shingles_sql(BOILER_NGRAM)} AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
), grams AS (
  SELECT doc_id, {hash64_sql("unnest(shingles)")} AS gram FROM sh
), boiler AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING count(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
), per_doc AS (
  SELECT g.doc_id, count(*) AS n_boiler
  FROM grams g JOIN boiler b USING (gram)
  GROUP BY g.doc_id
)
SELECT s.doc_id,
       CAST(len(s.shingles) AS BIGINT) AS n_grams,
       CAST(coalesce(p.n_boiler, 0) AS BIGINT) AS n_boiler,
       CAST(coalesce(p.n_boiler, 0) AS DOUBLE) / greatest(len(s.shingles), 1)
         AS boiler_ratio
FROM sh s LEFT JOIN per_doc p ON s.doc_id = p.doc_id
"""


@register("boilerplate_ratio", oracle=_BOILER_ORACLE)
def boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: fraction of its distinct 3-grams shared by at least
    BOILER_MIN_DOCS distinct documents — the boilerplate/template signal."""
    docs = load_table(spark, sf_dir, "documents")
    # fan_out + persist: same three-consumer shingle frame as
    # ngram_contamination (boiler grams, per-doc grams, final join)
    sh = (
        fan_out(docs)
        .select("doc_id", shingles_col("text", BOILER_NGRAM).alias("shingles"))
        .persist()
    )
    grams = sh.select("doc_id", F.explode("shingles").alias("shingle")).select(
        "doc_id", F.expr(hash64_expr("shingle")).alias("gram")
    )
    # shingles are per-doc distinct already, so count(*) == distinct docs
    boiler = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= BOILER_MIN_DOCS)
        .select("gram")
    )
    per_doc = grams.join(boiler, "gram").groupBy("doc_id").agg(
        F.count("*").alias("n_boiler")
    )
    return sh.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.size("shingles").cast("bigint").alias("n_grams"),
        F.coalesce(F.col("n_boiler"), F.lit(0)).cast("bigint").alias("n_boiler"),
        (
            F.coalesce(F.col("n_boiler"), F.lit(0)).cast("double")
            / F.greatest(F.size("shingles"), F.lit(1))
        ).alias("boiler_ratio"),
    )
