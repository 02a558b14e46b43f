"""Content-defined chunking — boundary-shift-resistant sub-document
dedup units (the Rabin/FastCDC family: public literature, e.g. Muthitacharoen
et al., "A Low-bandwidth Network File System", SOSP 2001; Xia et al.,
"FastCDC", USENIX ATC 2016 — no reference-repo counterpart, SURVEY §2.11
beyond-reference mandate).

Fixed-stride chunking (text/chunking.py doc_chunks) breaks on insertion:
one added token shifts every later chunk boundary, so near-identical
documents share no chunks. Content-defined boundaries move WITH the
content — a position cuts iff the hash of the K-token shingle starting
there satisfies ``h % DIV == 0`` — so an edit only redraws the chunks
it touches and every untouched passage keeps its chunk hash. That is
the property that makes chunk-level dedup work across document
versions (storage dedup, incremental corpus refresh, CDC-side delta
compression of document payloads).

Parallel variant note: production FastCDC adds sequential min/max chunk
bounds and a gear-rolling hash for speed; both are stream-order-stateful
and irrelevant to WHERE the boundaries fall being content-defined. This
spelling (pure per-position predicate, md5-derived hash) keeps the
boundary-shift-resistance property, is embarrassingly parallel, and is
exactly mirrorable in the DuckDB oracle. Expected chunk length = DIV
tokens (geometric).

Plan shape: everything before the output is SCAN-LOCAL array work on
one row per document — boundary positions via a filter() lambda over
the shingle index range, chunk extents via a transform() over adjacent
cut pairs, then ONE Generate (explode) whose slices read ``words`` as a
materialized attribute (the doc_chunks projection-barrier rule). The
only exchanges are the output sort and, in chunk_dedup_report, one
hash-agg on the 60-bit chunk hash. 100 TB-safe by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup import hash64_expr, hash64_sql
from ..registry import register

#: shingle size for the boundary predicate and expected chunk length
CDC_K = 4
CDC_DIV = 16

# 40-bit boundary hash of the K-token shingle STARTING at i (1-based)
_BND_SPARK = (
    f"cast(conv(substr(md5(array_join(slice(words, i, {CDC_K}), ' ')), 1, 10), 16, 10) as bigint)"
    f" % {CDC_DIV} = 0"
)

_CHUNKS_CTE = f"""
toks AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n
  FROM documents
),
bnd AS (
  SELECT t.doc_id, b.i
  FROM toks t, LATERAL unnest(generate_series(2, greatest(t.n - {CDC_K} + 1, 1))) b(i)
  WHERE CAST(('0x' || substr(md5(array_to_string(t.words[b.i : b.i + {CDC_K - 1}], ' ')), 1, 10)) AS BIGINT)
        % {CDC_DIV} = 0
),
cuts AS (
  SELECT doc_id, i FROM bnd
  UNION ALL SELECT doc_id, 1 FROM toks
  UNION ALL SELECT doc_id, n + 1 FROM toks
),
extents AS (
  SELECT doc_id, i AS start_tok,
         lead(i) OVER (PARTITION BY doc_id ORDER BY i) AS next_cut,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS chunk_idx
  FROM cuts
),
chunks AS (
  SELECT e.doc_id, e.chunk_idx, e.start_tok,
         e.next_cut - e.start_tok AS n_tokens,
         {hash64_sql(f"array_to_string(t.words[e.start_tok : e.next_cut - 1], ' ')")} AS chunk_hash
  FROM extents e JOIN toks t USING (doc_id)
  WHERE e.next_cut IS NOT NULL
)
"""

_CDC_ORACLE = f"""
WITH {_CHUNKS_CTE}
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       chunk_hash
FROM chunks
ORDER BY doc_id, chunk_idx
"""


def _chunked(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_tokens, chunk_hash) — scan-local
    per-document content-defined chunk table."""
    # boundary cut positions i ∈ [2, n_shingles], kept iff the shingle
    # hash divides; cuts = [1] ∪ boundaries ∪ [n+1]; guarded so the
    # degenerate short-doc sequence() can't run descending
    cuts = F.expr(
        f"concat(array(1), "
        f"case when size(words) - {CDC_K} + 1 >= 2 then "
        f"filter(sequence(2, size(words) - {CDC_K} + 1), i -> {_BND_SPARK}) "
        f"else array() end, "
        f"array(size(words) + 1))"
    )
    extents = F.expr(
        "transform(sequence(1, size(cuts) - 1), "
        "j -> struct(j - 1 AS chunk_idx, element_at(cuts, j) AS start_tok, "
        "element_at(cuts, j + 1) - element_at(cuts, j) AS n_tokens))"
    )
    return (
        docs.select(
            "doc_id", F.split(F.col("text"), " ").alias("words")
        )
        .withColumn("cuts", cuts)
        # explode extents FIRST (projection barrier): the slice below
        # reads `words` as a materialized attribute — the doc_chunks
        # linearity rule
        .select("doc_id", "words", F.explode(extents).alias("e"))
        .select(
            "doc_id",
            F.col("e.chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("e.start_tok").cast("bigint").alias("start_tok"),
            F.col("e.n_tokens").cast("bigint").alias("n_tokens"),
            F.expr(hash64_expr("array_join(slice(words, e.start_tok, e.n_tokens), ' ')")).alias(
                "chunk_hash"
            ),
        )
    )


@register("content_defined_chunks", oracle=_CDC_ORACLE)
def content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content-defined chunk table (K=4 shingle boundary
    predicate, expected chunk ≈ DIV=16 tokens): chunk extents + the
    60-bit content hash that stays stable under edits elsewhere in the
    document."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _chunked(docs).orderBy("doc_id", "chunk_idx")


_DUP_ORACLE = f"""
WITH {_CHUNKS_CTE}
SELECT chunk_hash,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(max(n_tokens) AS BIGINT) AS n_tokens,
       CAST((count(*) - 1) * max(n_tokens) AS BIGINT) AS dup_tokens
FROM chunks
GROUP BY chunk_hash
HAVING count(*) >= 2
ORDER BY n_copies DESC, chunk_hash
"""


@register("chunk_dedup_report", oracle=_DUP_ORACLE)
def chunk_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus duplicated-chunk report: every chunk hash stored
    more than once, with its copy count, document reach, and the token
    mass dedup would reclaim. One hash-agg on the 60-bit chunk hash."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        _chunked(docs)
        .groupBy("chunk_hash")
        .agg(
            F.count("*").cast("bigint").alias("n_copies"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.max("n_tokens").cast("bigint").alias("n_tokens"),
            ((F.count("*") - 1) * F.max("n_tokens"))
            .cast("bigint")
            .alias("dup_tokens"),
        )
        .filter(F.col("n_copies") >= 2)
        .orderBy(F.desc("n_copies"), "chunk_hash")
    )
