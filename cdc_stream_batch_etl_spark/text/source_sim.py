"""Pairwise source vocabulary overlap — the mixture-design redundancy
matrix at the SOURCE level.

source_semantic_diversity (similarity/diversity.py) scores each source's
internal spread; mixture design also needs the cross-source view: which
sources are near-copies of each other (common with CommonCrawl-derived
snapshots) and can be downweighted as a group. The lexical version is
engine-exact: per-pair vocabulary intersection and Jaccard from integer
set sizes.

Plan shape — the word-pivot trick, NOT a source×source join of word
sets: distinct (source, word) pairs → group by WORD collecting the
sorted source list (bounded by n_sources, a structural cap) → scan-local
pair expansion inside each list → count per (source_a, source_b). The
corpus-sized shuffles are both keyed on the word (uniform); the pair
table is n_sources² rows at most. This is the grouped-array pair idiom
from operators/basket.py — the naive spelling (word-keyed self-join)
is the same broadcast hazard SCALING.md round 5 documents.

Reference anchor: beyond-reference; complements text/datacard.py
source_overlap (verbatim digest collisions) with distributional overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_ORACLE = """
WITH sw AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS word
  FROM documents
), vocab AS (
  SELECT source, count(*) AS n_types FROM sw GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
  FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b,
       CAST(va.n_types AS BIGINT) AS n_types_a,
       CAST(vb.n_types AS BIGINT) AS n_types_b,
       CAST(i.n_common AS BIGINT) AS n_common,
       CAST(i.n_common AS DOUBLE)
         / (va.n_types + vb.n_types - i.n_common) AS jaccard
FROM inter i
JOIN vocab va ON i.source_a = va.source
JOIN vocab vb ON i.source_b = vb.source
"""


@register("source_vocab_overlap", oracle=_ORACLE)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, vocab sizes, intersection, Jaccard) for every
    source pair — lexical redundancy between corpus sources."""
    docs = load_table(spark, sf_dir, "documents")
    sw = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    vocab = sw.groupBy("source").agg(F.count("*").alias("n_types"))
    # pivot on the word: source list per word is bounded by n_sources
    srcs = sw.groupBy("word").agg(
        F.array_sort(F.collect_set("source")).alias("srcs")
    )
    pairs = F.expr(
        "flatten(transform(srcs, (sa, i) -> "
        "transform(slice(srcs, i + 2, size(srcs)), sb -> struct(sa, sb))))"
    )
    inter = (
        srcs.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.sa").alias("source_a"), F.col("p.sb").alias("source_b"))
        .agg(F.count("*").alias("n_common"))
    )
    va = vocab.withColumnRenamed("source", "source_a").withColumnRenamed(
        "n_types", "n_types_a"
    )
    vb = vocab.withColumnRenamed("source", "source_b").withColumnRenamed(
        "n_types", "n_types_b"
    )
    return (
        inter.join(F.broadcast(va), "source_a")
        .join(F.broadcast(vb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_types_a",
            "n_types_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_types_a") + F.col("n_types_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
