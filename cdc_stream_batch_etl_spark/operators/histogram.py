"""Equi-width histogram sketch + quantile estimates — the third sketch.

KMV answers "how many distinct", count-min answers "how often does key
x occur"; the histogram sketch answers "how is the VALUE distributed"
with fixed memory: W equi-width bins over a known domain, mergeable by
plain bin-wise addition (the simplest mergeable quantile summary — the
fixed-bin special case of what t-digest/KLL do adaptively; those are
seeded/approximation-order-dependent and so not cross-engine
verifiable, while this is deterministic and fully oracled).

Quantile read-out: a consumer walks the cumulative bin counts and
interpolates inside the crossing bin; the worst-case error is one bin
width by construction. tests/test_sketches.py asserts the p50/p95
read from this sketch land within one bin width of the exact
percentiles (the lsh_bucket_stats convention: a bounded structure's
loss must be observable).

Scale: one scan → W-key hash-agg (map-side partials; W=64 rows out) —
a constant-memory aggregate however large the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

N_BINS = 64
#: events.value domain (TESTDATA: 0..200); fixed a priori like any
#: production histogram config — NOT derived from data (that would need
#: an extra pass and break mergeability across shards)
V_LO, V_HI = 0.0, 200.0
BIN_W = (V_HI - V_LO) / N_BINS

_HIST_ORACLE = f"""
SELECT bin,
       CAST(count(*) AS BIGINT) AS n_rows,
       {V_LO} + bin * {BIN_W} AS bin_lo
FROM (
  SELECT CAST(least(greatest(floor((value - {V_LO}) / {BIN_W}), 0), {N_BINS - 1}) AS BIGINT)
           AS bin
  FROM events
  WHERE value IS NOT NULL
)
GROUP BY bin
"""


def histogram_sketch(values: DataFrame) -> DataFrame:
    """The W-bin histogram for any single-column frame named ``value`` —
    exposed so tests can plant out-of-domain values and verify the edge
    bins CLAMP them (saturation) instead of dropping rows or growing the
    sketch past its fixed W-row budget."""
    bin_idx = F.least(
        F.greatest(F.floor((F.col("value") - V_LO) / BIN_W), F.lit(0)),
        F.lit(N_BINS - 1),
    ).cast("bigint")
    return (
        values.filter(F.col("value").isNotNull())
        .select(bin_idx.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_rows"))
        .select("bin", "n_rows", (V_LO + F.col("bin") * BIN_W).alias("bin_lo"))
    )


@register("value_histogram", oracle=_HIST_ORACLE)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The W-bin equi-width histogram of events.value — the mergeable
    distribution sketch (bin-wise addition merges shards)."""
    return histogram_sketch(load_table(spark, sf_dir, "events").select("value"))
