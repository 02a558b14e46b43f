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


#: quantile read-out points for the per-type summary (and its streaming
#: twin, streaming/quantile_stream.py)
QUANTILES = (0.5, 0.95, 0.99)

_BIN_SQL = (
    f"CAST(least(greatest(floor((value - {V_LO}) / {BIN_W}), 0), {N_BINS - 1}) AS BIGINT)"
)

_TYPED_Q_ORACLE = f"""
WITH binned AS (
  SELECT event_type, {_BIN_SQL} AS bin, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS c,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM binned
)
SELECT event_type,
       CAST(max(total) AS BIGINT) AS n_rows,
       {", ".join(
         f"CAST(min(CASE WHEN c >= ceil({p} * total) THEN bin END) AS BIGINT) AS p{int(p*100)}_bin, "
         f"{V_LO} + (min(CASE WHEN c >= ceil({p} * total) THEN bin END) + 1) * {BIN_W} AS p{int(p*100)}_est"
         for p in QUANTILES
       )}
FROM cum
GROUP BY event_type
ORDER BY event_type
"""


def quantiles_by_type(events: DataFrame) -> DataFrame:
    """Per-event-type quantile read-out of the W-bin histogram sketch:
    for each p, the smallest bin whose cumulative count reaches
    ceil(p·n) and that bin's UPPER edge (the sketch's worst-case-one-
    bin-width estimate). Shared by the registered batch query and the
    streaming twin's parity tests — same bins, same read-out rule."""
    from pyspark.sql import Window

    bin_idx = F.least(
        F.greatest(F.floor((F.col("value") - V_LO) / BIN_W), F.lit(0)),
        F.lit(N_BINS - 1),
    ).cast("bigint")
    binned = (
        events.filter(F.col("value").isNotNull())
        .select("event_type", bin_idx.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("n"))
    )
    w_cum = Window.partitionBy("event_type").orderBy("bin")
    w_all = Window.partitionBy("event_type")
    cum = binned.select(
        "event_type",
        "bin",
        F.sum("n").over(w_cum).alias("c"),
        F.sum("n").over(w_all).alias("total"),
    )
    aggs = [F.max("total").cast("bigint").alias("n_rows")]
    for p in QUANTILES:
        hit = F.min(
            F.when(F.col("c") >= F.ceil(F.lit(p) * F.col("total")), F.col("bin"))
        )
        aggs.append(hit.cast("bigint").alias(f"p{int(p * 100)}_bin"))
        aggs.append((F.lit(V_LO) + (hit + 1) * BIN_W).alias(f"p{int(p * 100)}_est"))
    return cum.groupBy("event_type").agg(*aggs).orderBy("event_type")


@register("binned_quantiles_by_type", oracle=_TYPED_Q_ORACLE)
def binned_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of events.value per event type, read from the W-bin
    histogram sketch — the latency-dashboard summary whose streaming
    twin (streaming/quantile_stream.py) maintains the same bins as
    bounded per-type state."""
    return quantiles_by_type(load_table(spark, sf_dir, "events"))
