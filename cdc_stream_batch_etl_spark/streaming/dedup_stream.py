"""Streaming exact deduplication — online ingest dedup for a training-
data pipeline (beyond-reference).

Batch dedup (dedup/exact.py) assumes the corpus is at rest. An ingest
pipeline wants duplicates dropped AS DOCUMENTS ARRIVE, before they cost
downstream storage and compute. Spark-first mapping: key every document
by its content digest and let the streaming state store remember seen
digests — `dropDuplicatesWithinWatermark` keeps a digest in state only
until the event-time watermark passes it, so state is bounded by the
dedup horizon (duplicates in real crawls cluster in time: re-crawls,
mirror bursts), not by corpus history.

Contrast with `dropDuplicates(["digest"])` (no watermark): exact forever
but state grows with distinct corpus size — at 100 TB that is the
digest set itself (~16 B × distinct docs per executor share, RocksDB
state store territory). The watermarked form is the scale default; the
unbounded form is a config away when exactness-over-all-history matters
more than memory.

The streaming graph is source-agnostic (files in CI, Kafka in
production, sources/kafka.py) and pairs with the batch twin
`dedup_exact` — stream/batch parity is asserted in
tests/test_streaming_dedup.py the same way minute_metrics does it
(SURVEY §2.9 W1 parity pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEDUP_HORIZON = "10 minutes"


def dedup_stream(docs: DataFrame, horizon: str = DEDUP_HORIZON) -> DataFrame:
    """First-seen document per content digest within the event-time
    horizon. `docs` must carry (doc_id, text, event_time); the digest is
    the same md5 the batch dedup keys on, so stream and batch agree on
    WHAT a duplicate is — only the retention window differs."""
    return (
        docs.withColumn("digest", F.md5("text"))
        .withWatermark("event_time", horizon)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def dedup_stream_exact(docs: DataFrame) -> DataFrame:
    """Unbounded-state variant: exact dedup over all history (state =
    the full distinct-digest set; use RocksDB state store at scale)."""
    return docs.withColumn("digest", F.md5("text")).dropDuplicates(["digest"])


def chunk_dedup_stream(docs: DataFrame, horizon: str = DEDUP_HORIZON) -> DataFrame:
    """Chunk-level streaming dedup — the incremental-corpus-refresh
    operator (text/cdchunk.py's module contract): whole-doc dedup drops
    nothing when a re-crawled document changed ONE sentence, but its
    content-defined chunk hashes are stable under edits elsewhere, so
    keying the stream on chunk_hash emits exactly the NOVEL chunks of
    each arriving document — what an incremental ingest actually needs
    to store or re-embed.

    Spark spelling: the batch chunker's scan-local array program runs
    unchanged on the stream (pure per-row expressions, event_time rides
    through as a passthrough column), then
    ``dropDuplicatesWithinWatermark`` on the 60-bit chunk hash keeps a
    seen-chunk set bounded by the dedup horizon. State scales with
    distinct chunks in the horizon (~tokens/DIV keys × 8 B hash), the
    RocksDB store (session.use_rocksdb_state_store) being the >heap
    path. Batch twin: chunk_dedup_report / chunk_dedup_ledger on the
    corpus at rest — parity asserted in tests/test_streaming_dedup.py.

    `docs` must carry (doc_id, text, event_time); output is one row per
    first-seen chunk: (doc_id, chunk_idx, start_tok, n_tokens,
    chunk_hash, event_time)."""
    from ..text.cdchunk import _chunked

    return (
        _chunked(docs, passthrough=("event_time",))
        .withWatermark("event_time", horizon)
        .dropDuplicatesWithinWatermark(["chunk_hash"])
    )
