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


def ngram_fold_sql(words_sql: str, n: int) -> str:
    """Spark SQL for the array of n-word grams of ``words_sql``, built as
    a fold of ``zip_with`` over n shifted slices.

    PERFORMANCE-CRITICAL SHAPE: the obvious spelling —
    ``transform(sequence(0, size(w)-n), i -> concat_ws(' ', slice(w, i+1, n)))``
    — is quadratic per document, because CollapseProject inlines the
    aliased ``split(text, ' ')`` into the lambda body and HOF lambdas are
    interpreted, so every element access re-tokenizes the document
    (measured 12-25x slower at sf0.1, see SCALING.md). zip_with's inputs
    are HOF *children*, evaluated once per row; its lambda touches only
    the paired elements, never the outer array — linear, still scan-local."""
    ln = f"greatest(size({words_sql}) - {n - 1}, 0)"
    acc = f"slice({words_sql}, {n}, {ln})"
    for k in range(n - 1, 0, -1):
        acc = f"zip_with(slice({words_sql}, {k}, {ln}), {acc}, (g{k}x, g{k}y) -> concat(g{k}x, ' ', g{k}y))"
    return acc


def shingles_col(text_col: str = "text", n: int = SHINGLE_N) -> Column:
    """Distinct n-word shingles of a space-tokenized text column —
    a pure scan-local array expression (no explode, no shuffle)."""
    words_sql = f"split({text_col}, ' ')"
    return F.expr(f"array_distinct({ngram_fold_sql(words_sql, n)})")


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
