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

Chunk-length bounds (r10): the pure ``h % DIV == 0`` predicate alone
has an unbounded worst case — a boundary-sparse document is ONE
whole-doc chunk (defeating sub-document dedup entirely) and a
boundary-dense run yields 1-token confetti. FastCDC (ATC'16 §3.2)
bounds both sides; its exact rule is stream-order-stateful (each kept
cut depends on the previous KEPT cut), so this module uses the
order-free variant that stays embarrassingly parallel and exactly
mirrorable in SQL:

  - MIN-suppression: a candidate cut survives iff it is ≥ CDC_MIN
    tokens after the previous ORIGINAL candidate (doc start for the
    first) — a per-candidate ``lag`` comparison, not a sequential scan.
    Runs of closely-spaced candidates merge into their neighbours.
  - MAX-split: every extent between surviving cuts longer than CDC_MAX
    tokens is split at CDC_MAX stride from the extent start — pure
    per-extent arithmetic. Split offsets are relative to the extent's
    (content-defined) start, so they realign under edits exactly like
    the content cuts do.

Every final chunk is ≤ CDC_MAX tokens, hard; chunks < CDC_MIN can
still appear only as an extent's tail remainder or a short document.
Gear-rolling hashes are a speed detail, irrelevant to WHERE boundaries
fall; the md5-derived predicate keeps both engines identical. Expected
chunk length ≈ DIV tokens (geometric, truncated to [*, MAX]).

Plan shape: everything before the output is SCAN-LOCAL array work on
one row per document — boundary positions via a filter() lambda over
the shingle index range, chunk extents via a transform() over adjacent
cut pairs, then ONE Generate (explode) whose slices read ``words`` as a
materialized attribute (the doc_chunks projection-barrier rule). The
only exchanges are the output sort and, in chunk_dedup_report, one
hash-agg on the 60-bit chunk hash. 100 TB-safe by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup import hash64_expr, hash64_sql
from ..registry import register

#: shingle size for the boundary predicate and expected chunk length
CDC_K = 4
CDC_DIV = 16
#: chunk-length bounds (FastCDC-style: MIN = avg/4, MAX = 4*avg)
CDC_MIN = 4
CDC_MAX = 64

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
kept AS (
  SELECT doc_id, i FROM (
    SELECT doc_id, i,
           lag(i, 1, 1) OVER (PARTITION BY doc_id ORDER BY i) AS prev
    FROM bnd
  ) WHERE i - prev >= {CDC_MIN}
),
cuts AS (
  SELECT doc_id, i FROM kept
  UNION ALL SELECT doc_id, 1 FROM toks
  UNION ALL SELECT doc_id, n + 1 FROM toks
),
extents AS (
  SELECT doc_id, i AS start_tok,
         lead(i) OVER (PARTITION BY doc_id ORDER BY i) AS next_cut
  FROM cuts
),
subext AS (
  SELECT e.doc_id, s.s AS start_tok,
         least({CDC_MAX}, e.next_cut - s.s) AS n_tokens
  FROM (SELECT * FROM extents WHERE next_cut IS NOT NULL) e,
       LATERAL unnest(generate_series(e.start_tok, e.next_cut - 1, {CDC_MAX})) s(s)
),
chunks AS (
  SELECT x.doc_id,
         row_number() OVER (PARTITION BY x.doc_id ORDER BY x.start_tok) - 1 AS chunk_idx,
         x.start_tok, x.n_tokens,
         {hash64_sql(f"array_to_string(t.words[x.start_tok : x.start_tok + x.n_tokens - 1], ' ')")} AS chunk_hash
  FROM subext x JOIN toks t USING (doc_id)
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


def _chunked(docs: DataFrame, passthrough: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_tokens, chunk_hash, *passthrough)
    — scan-local per-document content-defined chunk table with
    [*, CDC_MAX] bounds. ``passthrough`` columns (e.g. the event-time
    column a streaming caller needs for its watermark) ride along
    unchanged; every expression stays streaming-compatible (pure
    per-row array programs, no window/agg), so the same plan serves
    batch and readStream inputs."""
    # candidate cut positions i ∈ [2, n_shingles], kept iff the shingle
    # hash divides; guarded so the degenerate short-doc sequence()
    # can't run descending
    cand = F.expr(
        f"case when size(words) - {CDC_K} + 1 >= 2 then "
        f"filter(sequence(2, size(words) - {CDC_K} + 1), i -> {_BND_SPARK}) "
        f"else array() end"
    )
    # MIN-suppression against the previous ORIGINAL candidate (doc
    # start for the first) — indexed filter lambda, the array-side
    # spelling of the oracle's lag(i, 1, 1) comparison
    kept = F.expr(
        f"filter(cand, (x, j) -> "
        f"x - if(j = 0, 1, element_at(cand, j)) >= {CDC_MIN})"
    )
    # cuts = [1] ∪ kept ∪ [n+1]; extents between consecutive cuts, each
    # MAX-split at CDC_MAX stride from its own start — still one
    # scan-local array program
    extents = F.expr(
        f"flatten(transform(sequence(1, size(cuts) - 1), "
        f"j -> transform("
        f"sequence(element_at(cuts, j), element_at(cuts, j + 1) - 1, {CDC_MAX}), "
        f"s -> struct(s AS start_tok, "
        f"least({CDC_MAX}, element_at(cuts, j + 1) - s) AS n_tokens))))"
    )
    extra = list(passthrough)
    return (
        docs.select(
            "doc_id", *extra, F.split(F.col("text"), " ").alias("words")
        )
        .withColumn("cand", cand)
        .withColumn("kept", kept)
        .withColumn(
            "cuts",
            F.expr("concat(array(1), kept, array(size(words) + 1))"),
        )
        # posexplode extents FIRST (projection barrier): the slice below
        # reads `words` as a materialized attribute — the doc_chunks
        # linearity rule; extents are built in start order, so the
        # explode ordinal IS chunk_idx
        .select(
            "doc_id", *extra, "words", F.posexplode(extents).alias("chunk_idx", "e")
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("e.start_tok").cast("bigint").alias("start_tok"),
            F.col("e.n_tokens").cast("bigint").alias("n_tokens"),
            F.expr(hash64_expr("array_join(slice(words, e.start_tok, e.n_tokens), ' ')")).alias(
                "chunk_hash"
            ),
            *extra,
        )
    )


@register("content_defined_chunks", oracle=_CDC_ORACLE)
def content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content-defined chunk table (K=4 shingle boundary
    predicate, expected chunk ≈ DIV=16 tokens, MIN-suppressed and
    hard-capped at MAX=64): chunk extents + the 60-bit content hash
    that stays stable under edits elsewhere in the document."""
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


_LEDGER_ORACLE = f"""
WITH {_CHUNKS_CTE},
occ AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (PARTITION BY chunk_hash
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
         CAST(sum(CASE WHEN rn > 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS reclaim_tokens
  FROM occ GROUP BY doc_id
),
exact AS (
  SELECT doc_id,
         doc_id <> min(doc_id) OVER (PARTITION BY md5(lower(trim(text))))
           AS removed_exact
  FROM documents
)
SELECT p.doc_id, p.n_chunks, p.total_tokens, p.dup_chunks, p.reclaim_tokens,
       e.removed_exact,
       CAST(p.reclaim_tokens AS DOUBLE) / p.total_tokens AS reclaim_ratio
FROM per_doc p JOIN exact e USING (doc_id)
ORDER BY reclaim_tokens DESC, doc_id
"""


@register("chunk_dedup_ledger", oracle=_LEDGER_ORACLE)
def chunk_dedup_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document chunk-dedup rewrite plan — the operator a storage-
    dedup user actually runs (dedup/ledger.py's attribution pattern
    applied at sub-document granularity): chunk_dedup_report says WHAT
    is duplicated; this says WHICH documents to rewrite and what each
    rewrite saves.

    Convention: the globally first occurrence of each chunk hash (min
    (doc_id, chunk_idx)) is canonical; every later occurrence is
    reclaimable. ``removed_exact`` flags documents the exact-dup rung
    (dedup/exact.py digest convention) removes wholesale BEFORE any
    chunk rewrite — for those the reclaim numbers are attribution, not
    a rewrite plan.

    Scale: the chunk table's scan-local cost + one window on the
    near-uniform 60-bit chunk hash + one doc_id hash-agg + the exact
    rung's digest window — no new quadratic or skew surface; at 100 TB
    the chunk table would be materialized once by the runner and this
    becomes the pure post-pass (the dedup_ledger "(sourced)" pattern)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    occ = _chunked(docs).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
        ),
    )
    per_doc = occ.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum((F.col("rn") > 1).cast("bigint")).alias("dup_chunks"),
        F.sum(F.when(F.col("rn") > 1, F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("reclaim_tokens"),
    )
    exact = docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("_digest")
    ).select(
        "doc_id",
        (
            F.col("doc_id")
            != F.min("doc_id").over(Window.partitionBy("_digest"))
        ).alias("removed_exact"),
    )
    return (
        per_doc.join(exact, "doc_id")
        .select(
            "doc_id",
            "n_chunks",
            "total_tokens",
            "dup_chunks",
            "reclaim_tokens",
            "removed_exact",
            # ONE IEEE division of exact integers (the davg pattern)
            (F.col("reclaim_tokens") / F.col("total_tokens")).alias(
                "reclaim_ratio"
            ),
        )
        .orderBy(F.desc("reclaim_tokens"), "doc_id")
    )
