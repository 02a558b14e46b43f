"""Cross-source quantile alignment — per-source distribution drift
against the corpus-global quantiles.

Heterogeneous corpus sources (web crawl vs books vs code) put the
"same" quality/length thresholds at very different absolute values; a
single global cutoff over- or under-filters every source. The standard
harmonization (quantile normalization, Bolstad et al. 2003 — ubiquitous
in cross-batch data integration; no reference-repo counterpart, SURVEY
§2.11 beyond-reference mandate) maps each source's distribution onto
the global one quantile-by-quantile. This operator emits the alignment
TABLE a pipeline applies or audits: for every source and decile, the
source's decile value, the global decile value, and the shift between
them — large |shift| rows are exactly where a global threshold
misbehaves for that source.

Determinism: both decile vectors come from ONE exact `percentile`
aggregate each (Spark `percentile` ↔ DuckDB `quantile_cont`, the
price_deciles A9 oracle rule — identical linear interpolation on
exact bigint inputs); the shift is one IEEE subtraction of identical
doubles. No windows, no RNG.

At 100 TB: two sort-based aggregates (one global, one keyed by the
~dozens-valued `source`) over a projection of two columns, then a
9-row-per-source explode joined to the broadcast 1-row global vector —
shuffle volume is per-source sufficient summaries, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_DECILES = [i / 10 for i in range(1, 10)]

_ALIGN_ORACLE = f"""
WITH gq AS (
  SELECT quantile_cont(n_chars, {_DECILES}) AS qs FROM documents
),
sq AS (
  SELECT source, quantile_cont(n_chars, {_DECILES}) AS qs
  FROM documents GROUP BY source
)
SELECT s.source,
       CAST(d.i AS BIGINT) AS decile,
       s.qs[d.i] AS source_value,
       g.qs[d.i] AS global_value,
       s.qs[d.i] - g.qs[d.i] AS shift
FROM sq s
CROSS JOIN gq g,
LATERAL unnest(generate_series(1, 9)) d(i)
ORDER BY s.source, decile
"""


@register("source_quantile_align", oracle=_ALIGN_ORACLE)
def source_quantile_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, decile) alignment of the document-length
    distribution: source decile value vs the corpus-global decile value
    and their shift — the quantile-normalization mapping table."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    qarr = F.percentile(F.col("n_chars"), F.array(*[F.lit(q) for q in _DECILES]))
    gq = docs.agg(qarr.alias("gqs"))
    sq = docs.groupBy("source").agg(qarr.alias("sqs"))
    return (
        sq.crossJoin(F.broadcast(gq))
        .select(
            "source",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("decile"),
            "sqs",
            "gqs",
        )
        .select(
            "source",
            F.col("decile").cast("bigint").alias("decile"),
            F.element_at("sqs", F.col("decile").cast("int")).alias("source_value"),
            F.element_at("gqs", F.col("decile").cast("int")).alias("global_value"),
            (
                F.element_at("sqs", F.col("decile").cast("int"))
                - F.element_at("gqs", F.col("decile").cast("int"))
            ).alias("shift"),
        )
        .orderBy("source", "decile")
    )
