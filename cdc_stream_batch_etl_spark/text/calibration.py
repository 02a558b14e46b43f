"""Per-source quality-score calibration — make heterogeneous sources
comparable before a single corpus-wide quality cut.

Why: raw quality signals (token counts, classifier scores) have
source-specific distributions — a "good" wiki page and a "good" forum
post sit at different absolute scores, so one global threshold
systematically over-prunes some sources (the known pitfall of global
quality filters on mixed crawls; text/budget.py ranks within source for
the same reason). The fix is rank calibration: map each document's raw
score to its percent-rank WITHIN its source — uniform [0, 1] per source
by construction — and cut on that.

Determinism (full DuckDB oracle): percent_rank is pure integer rank
arithmetic, (rank − 1) / (n − 1), identical in both engines including
ties — the window orders by raw_score ALONE, so equal scores share a
rank and calibrate to the SAME value (the desired semantics: two
identical-quality documents must land in the same decile), which is
also what keeps the result deterministic without a tiebreaker column
(a doc_id tiebreaker would be deterministic too, but would split ties
across deciles). A 1-row source calibrates to 0.0. The decile bucket
is floor arithmetic on that value — no ntile (whose tie assignment is
row-order-dependent), no transcendental.

Scale: ONE window pass partitioned by source ordered by raw_score.
Per-source partitions can exceed an executor at 100 TB only if a single
source dominates; the skew remedy is the two-level calibrate (percent
rank within (source, salt) then average — same result in distribution)
documented here rather than built, because key_skew_report feeds the
decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_CAL_ORACLE = """
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS raw_score
  FROM documents
)
SELECT doc_id, source, raw_score,
       percent_rank() OVER (PARTITION BY source ORDER BY raw_score)
         AS calibrated,
       CAST(least(floor(percent_rank() OVER (PARTITION BY source
                                             ORDER BY raw_score)
                        * 10), 9) AS BIGINT) AS decile
FROM scored
"""


@register("quality_calibration", oracle=_CAL_ORACLE)
def quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-rank calibration of a raw quality score within each
    source, plus the cross-source-comparable decile bucket."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("raw_score"),
    )
    w = Window.partitionBy("source").orderBy("raw_score")
    cal = F.percent_rank().over(w)
    return scored.select(
        "doc_id",
        "source",
        "raw_score",
        cal.alias("calibrated"),
        F.least(F.floor(cal * 10), F.lit(9)).cast("bigint").alias("decile"),
    )
