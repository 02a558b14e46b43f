"""compression_gate (rows-only query): ratios must equal directly-computed
zlib golden values, and planted degenerate docs must be rejected from the
correct side of the band."""

import zlib

import pandas as pd
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.text.compression import (
    GZIP_LEVEL,
    HIGH_RATIO,
    LOW_RATIO,
    compression_gate,
)


def _golden(t: str) -> float:
    raw = t.encode("utf-8")
    return len(zlib.compress(raw, GZIP_LEVEL)) / len(raw)


def test_ratios_match_direct_zlib(spark, sf_dir):
    out = compression_gate(spark, sf_dir).orderBy("doc_id").limit(50).collect()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(50)
        .collect()
    )
    texts = {r.doc_id: r.text for r in docs}
    for r in out:
        assert r.compression_ratio == _golden(texts[r.doc_id]), r.doc_id
        assert r.byte_len == len(texts[r.doc_id].encode("utf-8"))


def test_planted_degenerates_rejected(spark, tmp_path):
    rows = [
        (1, "spam " * 400),  # highly repetitive -> ratio << LOW_RATIO
        (2, "a sensible sentence with reasonably varied words and structure " * 3),
        (3, "kQ9zX2vL8pW4mN7bT5cJ1yH6dF3gS0aR" * 2),  # incompressible-ish
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = tmp_path / "docs"
    spark.createDataFrame(pdf).write.parquet(str(path / "documents.parquet"))
    out = {r.doc_id: r for r in compression_gate(spark, str(path)).collect()}
    assert out[1].compression_ratio < LOW_RATIO and out[1].keep is False
    assert out[2].keep is True
    assert out[3].compression_ratio > LOW_RATIO  # random-ish but short: just sanity
    for r in out.values():
        assert r.compression_ratio == _golden(dict(rows)[r.doc_id])


def test_whole_corpus_mostly_kept(spark, sf_dir):
    """The fixture corpus is normal prose-ish text — the gate must not
    reject wholesale (a mis-signed band would)."""
    df = compression_gate(spark, sf_dir)
    total = df.count()
    kept = df.filter(F.col("keep")).count()
    assert kept > total * 0.5
