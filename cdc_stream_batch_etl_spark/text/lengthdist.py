"""Per-language document-length distribution — grouped exact percentiles.

Corpus QC: before training, you look at the length distribution of every
language slice to pick truncation/min-length cutoffs and to spot
degenerate slices (a language whose p90 is 40 chars is scraped boilerplate,
not prose). The reference's only percentile use is two GLOBAL thresholds
(batch_processor.py:118-120, SURVEY.md A9); this is the grouped
generalization: one exact percentile vector per group, computed in a
single partial+final sort-based aggregate — no two-pass, no broadcast,
because the thresholds are consumed per-group, not joined back to rows.

Oracle parity: Spark `percentile` and DuckDB `quantile_cont` both use
linear interpolation (the A9 rule — never percentile_approx), and the
p10/p50/p90/p99 are emitted as separate double columns so the driver's
column-sorted value hash sees scalars, not arrays.

At 100 TB: one exchange on `lang` (low cardinality); exact grouped
percentiles sort within each group. If a slice skews huge, the same query
with approx_percentile is the one-line relaxation — kept exact here for
the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_QS = [0.10, 0.50, 0.90, 0.99]
_NAMES = ["p10_chars", "p50_chars", "p90_chars", "p99_chars"]

_ORACLE = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS doc_count,
       {", ".join(f"quantile_cont(n_chars, {q}) AS {name}" for q, name in zip(_QS, _NAMES))}
FROM documents
GROUP BY lang
"""


@register("doc_length_by_lang", oracle=_ORACLE)
def doc_length_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p10/p50/p90/p99 of document length per language slice."""
    docs = load_table(spark, sf_dir, "documents")
    qvec = F.percentile(F.col("n_chars"), F.array(*[F.lit(q) for q in _QS]))
    agg = docs.groupBy("lang").agg(
        F.count("*").alias("doc_count"), qvec.alias("qs")
    )
    return agg.select(
        "lang",
        "doc_count",
        *[F.element_at("qs", i + 1).alias(name) for i, name in enumerate(_NAMES)],
    )
