"""Training-mixture planning — per-source sampling rates for a target
distribution.

The last step before drawing a training mix: given each source's
available token supply and a target share per source, compute the
per-source KEEP RATE that realizes the target (clamped at 1.0 where a
source cannot supply its share — the under-supplied flag is the signal
to either upweight epochs for that source or renormalize the target).
Downstream, the rate feeds the content-addressed samplers
(text/sampling.py) — rate × 100 is exactly their md5-bucket keep
percentage, so the plan is executable as-is.

The target here is a deterministic function of the source id (weight =
numeric suffix + 1) — standing in for the externally-specified mixture
config a real run would broadcast; the arithmetic path is what matters.

Determinism (full DuckDB oracle): token supplies and target weights are
exact BIGINTs; shares and rates are single double divisions of exact
integers — identical IEEE ops both engines; expected token counts floor
back to BIGINT.

Scale: one (source) hash-agg over the corpus scan (map-side combined),
a 1-row broadcast of the two totals, then pure expressions. The corpus
is scanned once; |sources| rows flow anywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_MIX_ORACLE = """
WITH supply AS (
  SELECT source,
         CAST(substr(source, 4) AS BIGINT) + 1 AS target_w,
         sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS tokens
  FROM documents GROUP BY source
), totals AS (
  SELECT sum(target_w) AS total_w, sum(tokens) AS total_tokens FROM supply
)
SELECT s.source,
       CAST(s.tokens AS BIGINT) AS tokens,
       CAST(s.target_w AS DOUBLE) / t.total_w AS target_share,
       least(1.0, (CAST(s.target_w AS DOUBLE) / t.total_w * t.total_tokens)
                    / s.tokens) AS keep_rate,
       CAST(floor(least(1.0, (CAST(s.target_w AS DOUBLE) / t.total_w
                              * t.total_tokens) / s.tokens)
                  * s.tokens) AS BIGINT) AS expected_tokens,
       (CAST(s.target_w AS DOUBLE) / t.total_w * t.total_tokens) / s.tokens
         > 1.0 AS under_supplied
FROM supply s CROSS JOIN totals t
"""


@register("source_mix_plan", oracle=_MIX_ORACLE)
def source_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keep rates realizing the target mixture, with the
    under-supplied flag where the clamp fires."""
    docs = load_table(spark, sf_dir, "documents")
    # target_w is functionally dependent on source, so it joins the
    # group key (no second agg or first() needed)
    supply = docs.groupBy(
        "source",
        (F.substring("source", 4, 10).cast("bigint") + 1).alias("target_w"),
    ).agg(F.sum(F.size(F.split(F.col("text"), " ")).cast("bigint")).alias("tokens"))
    totals = supply.agg(
        F.sum("target_w").alias("total_w"), F.sum("tokens").alias("total_tokens")
    )
    share = F.col("target_w").cast("double") / F.col("total_w")
    raw_rate = share * F.col("total_tokens") / F.col("tokens")
    rate = F.least(F.lit(1.0), raw_rate)
    return supply.crossJoin(F.broadcast(totals)).select(
        "source",
        "tokens",
        share.alias("target_share"),
        rate.alias("keep_rate"),
        F.floor(rate * F.col("tokens")).cast("bigint").alias("expected_tokens"),
        (raw_rate > 1.0).alias("under_supplied"),
    )
