"""Benford first-digit audit — fraud/quality screening on value fields.

Financial-value streams follow Benford's law (P(first digit d) =
log10(1 + 1/d)); fabricated or systematically corrupted feeds don't.
Auditors screen ledgers by comparing the observed first-significant-
digit distribution against the Benford expectation — a standard
data-quality gate for a pipeline ingesting money-like columns
(the reference's total_amount / unit_price fields).

Determinism (full DuckDB oracle): the first significant digit is
extracted WITHOUT floats — value rides DECIMAL(18,2), is scaled to
exact integer cents, and the digit is the first character of the
integer's decimal string (integer-to-string is exact and identical in
both engines; no log10, no division). The Benford expectations are
nine compile-time literals baked into both queries; the deviation is
one rounded double subtraction per digit.

Scale: one scan + one (type, digit) hash-agg; the per-type totals are
a window SUM over the ~9-rows-per-type aggregated frame, so the raw
events table is scanned exactly once (the naive groupBy-then-join
twin re-derives the scan — same double-scan class image_phash_dedup
was cured of in r6). Zero-value rows (no significant digit) are
excluded by predicate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: P(d) = log10(1 + 1/d), d = 1..9 — compile-time literals so neither
#: engine evaluates a logarithm at query time.
BENFORD = {d: round(math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}

_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN '{d}' THEN {BENFORD[d]!r}e0" for d in range(1, 10))
    + " END"
)

_BENFORD_ORACLE = f"""
WITH cents AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM events
  WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0
),
dig AS (
  SELECT event_type, substr(CAST(c AS VARCHAR), 1, 1) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM cents GROUP BY 1, 2
),
tot AS (SELECT event_type, SUM(n) AS t FROM dig GROUP BY event_type)
SELECT d.event_type, d.digit, d.n,
       round(CAST(d.n AS DOUBLE) / t.t, 6) AS share_r,
       {_BENFORD_CASE} AS benford_expected,
       round(CAST(d.n AS DOUBLE) / t.t - {_BENFORD_CASE}, 6) AS deviation_r
FROM dig d JOIN tot t USING (event_type)
ORDER BY event_type, digit
"""


@register("benford_digit_audit", oracle=_BENFORD_ORACLE)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed vs Benford first-significant-digit shares of ``value``
    per event type — digits extracted via exact integer cents."""
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c"),
    ).filter(F.col("c") > 0)
    dig = cents.groupBy(
        "event_type", F.substring(F.col("c").cast("string"), 1, 1).alias("digit")
    ).agg(F.count("*").cast("bigint").alias("n"))
    expected = F.expr(_BENFORD_CASE)
    return (
        dig.withColumn(
            "t", F.sum("n").over(Window.partitionBy("event_type"))
        )
        .select(
            "event_type",
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share_r"),
            expected.alias("benford_expected"),
            F.round(
                F.col("n").cast("double") / F.col("t") - expected, 6
            ).alias("deviation_r"),
        )
        .orderBy("event_type", "digit")
    )
