"""CMS-guided exact heavy hitters — the two-scan answer to "which keys
exceed φN?" when the key space is too large to exact-count whole.

The plain Spark answer (groupBy(key).count().filter(≥ T)) shuffles one
row per DISTINCT key; at 100 TB with billion-key domains that exchange
is the cost. The sketch answer here shuffles almost nothing:

  scan 1 — count-min table over the key (depth 4, the repo's
           deterministic md5 hashes): map-side partial collapses the
           corpus to D×W counter cells; NO per-key exchange.
  filter — per DISTINCT key, est = min over depths of its bucket
           counters; CMS never underestimates, so est ≥ T keeps EVERY
           true heavy hitter (no false negatives — the one-sided
           guarantee the design leans on).
  scan 2 — exact counts for the surviving candidates only (semi-join
           against the tiny candidate set), drop the false positives.

The output is therefore EXACTLY the SQL truth — "keys with count ≥ T"
— which is what makes this oracle-able at all: the sketch steers the
plan, never the answer. The oracle recomputes the CMS estimate column
the same way (both engines share hash64, so the estimates are
bit-identical too). A width-starved pytest plants a skewed stream and
asserts the candidate filter actually prunes (tests/test_heavyhitters.py).

Unlike Misra-Gries/SpaceSaving, the CMS route is ORDER-INDEPENDENT
(counter cells are sums), so the result is stable across partitionings
and cluster sizes — MG summaries depend on stream order and can't be
hash-compared cross-engine.

Determinism: integer counters, integer threshold; no floats.

Scale: scan 1 aggregates to D×W rows (broadcast back); candidates are
≤ (N/T) keys by Markov — at φ = 0.2 % that's ≤ 500 rows to broadcast
into scan 2's semi-join. Two corpus scans, zero corpus-sized shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup import hash64_expr, hash64_sql
from ..registry import register

HH_DEPTH = 4
#: support threshold as a fraction of total rows
HH_SUPPORT = 0.002
#: width follows the support, NOT the data: expected collision mass per
#: bucket is N/width, so the filter only prunes when N/width ≪ T =
#: support·N, i.e. width ≫ 1/support — independent of N AND of key NDV
#: (the ×64 probe with a perturbed 64× vocabulary is the regression
#: that found the fixed-1024 width degenerating to pass-everything)
HH_WIDTH = 8 * int(1 / HH_SUPPORT)

_HH_ORACLE = f"""
WITH tok AS (
  SELECT w FROM documents, unnest(string_split(text, ' ')) AS t(w)
),
n AS (SELECT count(*) AS n FROM tok),
t AS (SELECT CAST(ceil(n * {HH_SUPPORT}) AS BIGINT) AS t FROM n),
cells AS (
  SELECT d.d,
         {hash64_sql("CAST(d.d AS VARCHAR) || ':' || CAST(tok.w AS VARCHAR)")}
           % {HH_WIDTH} AS bucket,
         CAST(count(*) AS BIGINT) AS counter
  FROM tok, (SELECT unnest(range({HH_DEPTH})) AS d) d
  GROUP BY 1, 2
),
est AS (
  SELECT k.w,
         min(c.counter) AS cms_estimate
  FROM (SELECT DISTINCT w FROM tok) k
  JOIN cells c
    ON c.bucket = {hash64_sql("CAST(c.d AS VARCHAR) || ':' || CAST(k.w AS VARCHAR)")}
                  % {HH_WIDTH}
  GROUP BY 1
),
exact AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt
  FROM tok GROUP BY 1
)
SELECT e.w, e.cnt, s.cms_estimate
FROM exact e JOIN est s USING (w) CROSS JOIN t
WHERE e.cnt >= t.t
ORDER BY e.cnt DESC, e.w
"""


@register("heavy_hitters_cms", oracle=_HH_ORACLE)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokens appearing in ≥ 0.2 % of all token positions — the
    vocabulary head (stopword mining), exact counts found via the CMS
    candidate filter + exact verify. Tokens are the natural
    heavy-hitter domain here: word frequencies are Zipf (scale-
    invariant head), where the TPC-H relational keys are uniform by
    spec, making every fractional threshold degenerate on them."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    )
    return cms_heavy_hitters(tok, "w", HH_SUPPORT, HH_WIDTH)


def cms_heavy_hitters(
    df: DataFrame, key: str, support: float = HH_SUPPORT, width: int = HH_WIDTH
) -> DataFrame:
    """Core CMS-guided heavy hitters over any single-key frame — width
    parameterized so tests can starve the sketch and watch the exact
    verify absorb the extra false positives."""
    cells = (
        df.select(
            F.col(key),
            F.explode(F.sequence(F.lit(0), F.lit(HH_DEPTH - 1))).alias("d"),
        )
        .select(
            "d",
            (
                F.expr(
                    hash64_expr(f"concat(cast(d as string), ':', cast({key} as string))")
                )
                % width
            ).alias("bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").cast("bigint").alias("counter"))
        .persist()  # consumed twice: N readout + the estimate join
    )
    # N = any single depth's column sum — the sketch already counted the
    # corpus, so no separate count() scan (caller-must-clear persist
    # contract as elsewhere)
    n = cells.filter(F.col("d") == 0).agg(F.sum("counter")).first()[0] or 0
    threshold = int(math.ceil(n * support))
    keys = df.select(key).distinct()
    est = (
        keys.select(
            key,
            F.explode(F.sequence(F.lit(0), F.lit(HH_DEPTH - 1))).alias("d"),
        )
        .withColumn(
            "bucket",
            F.expr(hash64_expr(f"concat(cast(d as string), ':', cast({key} as string))"))
            % width,
        )
        .join(F.broadcast(cells), ["d", "bucket"])
        .groupBy(key)
        .agg(F.min("counter").alias("cms_estimate"))
    )
    # candidate set size is data-dependent (≤ N/T by Markov at healthy
    # width, but a starved sketch can pass far more) — no forced
    # broadcast; AQE picks broadcast vs shuffle from the actual size.
    # cells stays hinted above: D×W is a scale-CONSTANT.
    candidates = est.filter(F.col("cms_estimate") >= threshold)
    exact = (
        df.join(candidates.select(key), key, "left_semi")
        .groupBy(key)
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
    return exact.join(candidates, key).orderBy(F.desc("cnt"), key)
