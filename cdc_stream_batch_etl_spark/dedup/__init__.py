"""Deduplication operators (beyond-reference, BASELINE.json north star):
exact, prefix, n-gram Jaccard, MinHash+LSH, SimHash.

Shared design: shingles/hashes are computed with md5-derived integers so
Spark (`conv(substr(md5(x),1,15),16,10)`) and the DuckDB oracle
(`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`) agree bit-for-bit — no
engine-specific hash functions in any oracled path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SHINGLE_N = 3


def shingles_col(text_col: str = "text", n: int = SHINGLE_N) -> Column:
    """Distinct n-word shingles of a space-tokenized text column —
    a pure scan-local array expression (no explode, no shuffle)."""
    return F.expr(
        f"""
        array_distinct(
          CASE WHEN size(split({text_col}, ' ')) >= {n}
               THEN transform(sequence(0, size(split({text_col}, ' ')) - {n}),
                              i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {n})))
               ELSE array()
          END)
        """
    )


def shingles_sql(n: int = SHINGLE_N) -> str:
    """DuckDB spelling of the same distinct n-word shingle list."""
    return (
        f"list_distinct([array_to_string(words[i+1:i+{n}], ' ') "
        f"for i in range(greatest(len(words)-{n - 1},0))])"
    )


def hash64_expr(arg_sql: str) -> str:
    """Spark SQL: 60-bit integer from md5 (positive, fits BIGINT)."""
    return f"cast(conv(substr(md5({arg_sql}), 1, 15), 16, 10) as bigint)"


def hash64_sql(arg_sql: str) -> str:
    """DuckDB spelling of the same 60-bit md5 integer."""
    return f"CAST(('0x' || substr(md5({arg_sql}), 1, 15)) AS BIGINT)"
