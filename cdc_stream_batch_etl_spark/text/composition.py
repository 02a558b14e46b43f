"""Corpus-composition operators: sequence packing and temperature
resampling — the steps between "cleaned corpus" and "training batches".

Beyond-reference operators (brief: operations a large-scale training-data
pipeline needs). After cleaning, a pipeline must (a) pack variable-length
documents into fixed token-budget training sequences, and (b) rebalance
language composition (an English-heavy crawl starves low-resource
languages; temperature sampling upweights them).

Determinism rules (driver oracle contract):
- packing is contiguous-greedy per (source, doc_id order) — a pure window
  cumsum, no bin-packing heuristic state, stable under any physical
  partitioning;
- resampling rates use ONLY correctly-rounded IEEE ops (sqrt, /, *) of
  per-language integers, so Spark and DuckDB agree bit-for-bit — no
  pow(), no cross-language float summation (order-dependent);
- the keep decision is content-addressed (md5 bucket of doc_id, as
  text/sampling.py) — re-runs and re-shards cannot move a document.

Scale shape:
- pack_sequences: one shuffle (hash by source for the window), then a
  grouped agg on the SAME partitioning — Catalyst reuses the exchange.
  Packing is per-source, NOT a global sort: sources are independent
  shards, the 100 TB layout.
- lang_temperature_sample: a tiny per-language agg broadcast back onto
  the scan — the per-doc side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .sampling import _bucket_spark, _bucket_sql

# fixed token budget per packed training sequence (2^11: fill-ratio
# division is exact in binary floating point)
PACK_BUDGET = 2048

# the largest language keeps this fraction; smaller languages keep
# min(1, BASE_RATE * sqrt(n_max / n_lang)) — temperature-style upweighting
BASE_KEEP_RATE = 0.3

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM toks
), binned AS (
  SELECT source,
         CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / {PACK_BUDGET}) AS BIGINT)
           AS bin,
         doc_id, n_tokens
  FROM cum
)
SELECT source, bin,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc_id,
       max(doc_id) AS last_doc_id,
       CAST(sum(n_tokens) AS DOUBLE) / {PACK_BUDGET} AS fill_ratio
FROM binned
GROUP BY source, bin
"""


@register("pack_sequences", oracle=_PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous greedy packing: per source, documents in doc_id order
    fill a running token budget; a document starting at running offset c
    lands in bin floor(c / PACK_BUDGET). One row per packed sequence."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    binned = cum.withColumn(
        "bin",
        F.floor(
            (F.col("cum_tokens") - F.col("n_tokens")).cast("double") / PACK_BUDGET
        ).cast("bigint"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
        (F.sum("n_tokens").cast("double") / PACK_BUDGET).alias("fill_ratio"),
    )


_TEMP_ORACLE = f"""
WITH lc AS (
  SELECT lang, count(*) AS n_lang_docs FROM documents GROUP BY lang
), mx AS (
  SELECT max(n_lang_docs) AS n_max FROM lc
), rates AS (
  SELECT lang, n_lang_docs,
         least(1.0, {BASE_KEEP_RATE} * sqrt(CAST(n_max AS DOUBLE) / n_lang_docs))
           AS keep_rate
  FROM lc CROSS JOIN mx
)
SELECT d.doc_id, d.lang, r.n_lang_docs, r.keep_rate,
       {_bucket_sql("d.doc_id")} < CAST(floor(r.keep_rate * 100) AS BIGINT)
         AS kept
FROM documents d JOIN rates r ON d.lang = r.lang
"""


@register("lang_temperature_sample", oracle=_TEMP_ORACLE)
def lang_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing keep decision: the largest language keeps
    BASE_KEEP_RATE, every other language keeps sqrt-proportionally more
    (capped at 1) — smaller languages are upweighted exactly as
    temperature sampling with T=2 would. The per-doc decision is the
    content-addressed md5 bucket, so it is stable under re-runs."""
    docs = load_table(spark, sf_dir, "documents")
    lc = docs.groupBy("lang").agg(F.count("*").alias("n_lang_docs"))
    mx = lc.agg(F.max("n_lang_docs").alias("n_max"))
    rates = lc.crossJoin(mx).select(
        "lang",
        "n_lang_docs",
        F.least(
            F.lit(1.0),
            BASE_KEEP_RATE * F.sqrt(F.col("n_max").cast("double") / F.col("n_lang_docs")),
        ).alias("keep_rate"),
    )
    return docs.join(F.broadcast(rates), "lang").select(
        "doc_id",
        "lang",
        "n_lang_docs",
        "keep_rate",
        (
            _bucket_spark(F.col("doc_id"))
            < F.floor(F.col("keep_rate") * 100).cast("bigint")
        ).alias("kept"),
    )


#: context lengths evaluated by packing_waste_curve (powers of two:
#: the usual training-sequence sizes, and exact in every division)
CTX_LENGTHS = (128, 256, 512, 1024, 2048)

_CTX_SQL = "[" + ", ".join(str(c) for c in CTX_LENGTHS) + "]"

_WASTE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
),
cum AS (
  SELECT doc_id, source, n,
         SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
           AS start
  FROM toks
),
percl AS (
  SELECT c.source, l.ctx_len, c.n, c.start
  FROM cum c, LATERAL unnest({_CTX_SQL}) l(ctx_len)
)
SELECT source,
       CAST(ctx_len AS BIGINT) AS ctx_len,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(sum((n + ctx_len - 1) // ctx_len) AS BIGINT) AS padded_seqs,
       CAST(sum((n + ctx_len - 1) // ctx_len) * ctx_len - sum(n) AS BIGINT)
         AS pad_waste,
       CAST(sum((n + ctx_len - 1) // ctx_len) * ctx_len - sum(n) AS DOUBLE)
         / (sum((n + ctx_len - 1) // ctx_len) * ctx_len) AS pad_waste_share,
       CAST(count(*) FILTER (WHERE n > ctx_len) AS BIGINT) AS trunc_docs,
       CAST(sum(greatest(n - ctx_len, 0)) AS DOUBLE) / sum(n)
         AS trunc_loss_share,
       CAST((sum(n) + ctx_len - 1) // ctx_len AS BIGINT) AS packed_seqs,
       CAST(count(*) FILTER (WHERE start // ctx_len <> (start + n - 1) // ctx_len)
            AS BIGINT) AS straddled_docs,
       CAST(count(*) FILTER (WHERE start // ctx_len <> (start + n - 1) // ctx_len)
            AS DOUBLE) / count(*) AS straddle_share
FROM percl
GROUP BY source, ctx_len
ORDER BY source, ctx_len
"""


@register("packing_waste_curve", oracle=_WASTE_ORACLE)
def packing_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length selection report: per (source, ctx_len in 128..
    2048) the cost of each sequence-construction policy — doc-per-
    sequence padding (padded_seqs, pad_waste, pad_waste_share),
    truncate-at-L (trunc_docs, trunc_loss_share), and contiguous
    concatenate-and-chop stream packing (packed_seqs, straddled_docs =
    documents crossing a boundary when the per-source token stream is
    chopped at every ctx_len tokens — NOTE: a different policy from
    pack_sequences, which assigns each document whole to the bin of its
    start offset and never splits one). The table
    a pipeline reads to pick its training context length: padding waste
    falls with L while straddle-split damage rises, and the knee is the
    answer.

    Determinism: every measure is exact BIGINT arithmetic (ceil spelled
    (n + L - 1) div L); the three shares are single IEEE divisions of
    exact integers.

    Scale: one doc-level cumsum window per source (the pack_sequences
    posture — doc-count rows, not tokens), a 5-way scan-local explode,
    one hash agg on (source, ctx_len). No token-level shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("start", F.sum("n").over(w) - F.col("n"))
    percl = cum.select(
        "source",
        "n",
        "start",
        F.explode(
            F.array(*[F.lit(c).cast("bigint") for c in CTX_LENGTHS])
        ).alias("ctx_len"),
    )
    L = F.col("ctx_len")
    padded = F.sum(F.expr("(n + ctx_len - 1) div ctx_len"))
    straddle = F.count(
        F.when(
            F.expr("start div ctx_len") != F.expr("(start + n - 1) div ctx_len"),
            1,
        )
    )
    return (
        percl.groupBy("source", "ctx_len")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
            padded.cast("bigint").alias("padded_seqs"),
            (padded * L - F.sum("n")).cast("bigint").alias("pad_waste"),
            (
                (padded * L - F.sum("n")).cast("double") / (padded * L)
            ).alias("pad_waste_share"),
            F.count(F.when(F.col("n") > L, 1)).cast("bigint").alias("trunc_docs"),
            (
                F.sum(F.greatest(F.col("n") - L, F.lit(0))).cast("double")
                / F.sum("n")
            ).alias("trunc_loss_share"),
            F.expr("(sum(n) + ctx_len - 1) div ctx_len")
            .cast("bigint")
            .alias("packed_seqs"),
            straddle.cast("bigint").alias("straddled_docs"),
            (straddle.cast("double") / F.count("*")).alias("straddle_share"),
        )
        .orderBy("source", "ctx_len")
    )
