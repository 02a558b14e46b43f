"""The composed curation pipeline as ONE verifiable query — what a user
actually ships: gates → dedup ladder → per-source token budget →
reproducible training order.

clean_corpus already composes the quality/lang gates with exact + LSH
dedup end-to-end; this operator carries its survivors through the two
remaining stages (README "corpus-curation run" §3-§4): the
quality-ranked TOKEN_QUOTA cut per source (text/budget.py semantics,
applied to SURVIVORS rather than the raw corpus) and the
content-addressed (shard, position) assignment (text/shuffle.py). The
output is the packaged training set manifest: one row per selected
document with its provenance and placement.

The DuckDB oracle is the same composition of the three stage oracles as
CTEs — a bug in ANY stage, or in how the stages hand off, breaks the
end-to-end hash. This is the strongest single piece of evidence that
the pipeline a user would run (not just its pieces) is correct.

Scale: no stage is new — the plan is the union of the component plans
(each audited separately in PLANS.md/SCALING.md); the stage handoffs
are doc_id-keyed uniform joins. The one addition is re-joining
survivors to documents for source/text, which rides the same doc_id
shuffle as the dedup anti-join above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .budget import TOKEN_QUOTA
from .corpus import _ORACLE as _CLEAN_ORACLE
from .corpus import clean_corpus
from .shuffle import N_SHARDS, SHUFFLE_SEED

_ORACLE = f"""
WITH survivors AS ({_CLEAN_ORACLE}),
enriched AS (
  SELECT s.doc_id, d.source, s.lang, s.n_tokens,
         CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
           / len(string_split(d.text, ' ')) AS ttr
  FROM survivors s JOIN documents d ON s.doc_id = d.doc_id
), quota AS (
  SELECT doc_id, source, lang, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY ttr DESC, doc_id
           ROWS UNBOUNDED PRECEDING
         ) AS cum_tokens
  FROM enriched
), selected AS (
  SELECT doc_id, source, lang, n_tokens
  FROM quota WHERE cum_tokens <= {TOKEN_QUOTA}
), hashed AS (
  SELECT doc_id, source, lang, n_tokens,
         md5('{SHUFFLE_SEED}' || ':' || CAST(doc_id AS VARCHAR)) AS hv
  FROM selected
)
SELECT doc_id, source, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(('0x' || substr(hv, 1, 8)) AS BIGINT) % {N_SHARDS} AS shard,
       CAST(row_number() OVER (
         PARTITION BY CAST(('0x' || substr(hv, 1, 8)) AS BIGINT) % {N_SHARDS}
         ORDER BY hv, doc_id) AS BIGINT) AS position
FROM hashed
"""


@register("curated_training_set", oracle=_ORACLE)
def curated_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shipped manifest: every gate-surviving, dedup-surviving,
    quota-selected document with its (shard, position) training order."""
    docs = load_table(spark, sf_dir, "documents")
    survivors = clean_corpus(spark, sf_dir).select("doc_id", "lang", "n_tokens")

    toks = F.split(F.col("text"), " ")
    enriched = survivors.join(
        docs.select(
            "doc_id",
            "source",
            (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ttr"),
        ),
        "doc_id",
    )
    wq = (
        Window.partitionBy("source")
        .orderBy(F.col("ttr").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    selected = (
        enriched.withColumn("cum_tokens", F.sum("n_tokens").over(wq))
        .filter(F.col("cum_tokens") <= TOKEN_QUOTA)
        .select("doc_id", "source", "lang", "n_tokens")
    )
    hv = F.md5(F.concat(F.lit(f"{SHUFFLE_SEED}:"), F.col("doc_id").cast("string")))
    hashed = selected.withColumn("hv", hv).withColumn(
        "shard", F.conv(F.substring("hv", 1, 8), 16, 10).cast("bigint") % N_SHARDS
    )
    ws = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return hashed.select(
        "doc_id",
        "source",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "shard",
        F.row_number().over(ws).cast("bigint").alias("position"),
    )
