"""Perceptual-hash image dedup — the multimodal rung of the dedup ladder.

Text dedup keys on content digests; IMAGE dedup cannot (one re-encode
perturbs every byte), so production pipelines (LAION, DataComp) key on
a PERCEPTUAL hash of the decoded raster. This operator is the classic
aHash (average hash): decode → nearest-neighbor 8×8 downsample →
integer grayscale → mean threshold → 64 bits; identical rasters (and
near-identical ones at real-image resolution) collide, and the dedup is
then the exact-dedup shape keyed on the hash.

Everything on the Spark side is REAL: the payloads are spec-conformant
BMPs (multimodal/binaryops.py codec), the decoder parses headers and
rasters, the downsample is a genuine 2-D gather. Determinism choices
that keep the full DuckDB oracle possible:
- grayscale = (r+g+b) // 3 in integers (no float luma weights);
- threshold by cross-multiplication g*64 > total (no float mean);
- hash emitted as a 16-hex-char string (a 64-bit unsigned value can
  overflow BIGINT; strings hash-compare exactly in both engines).
The oracle never decodes a BMP — it predicts the same 64 bits from
sha256 digest arithmetic (the binaryops resize-oracle pattern), so a
bug anywhere in encode → parse → gather → threshold breaks the match.

Scale: the hash is computed in the scan-local Arrow pass (1:1, no
shuffle, bounded per-batch memory); the dedup agg is one hash-keyed
shuffle — the dedup_exact plan with phash in place of md5. At 100 TB
this is exactly how image corpora dedup: hash at ingest, group later.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import register
from .binaryops import _DIGEST_BYTES, _HEXMAP, bmp_decode, encode_bmp

GRID = 8  # aHash grid: 8×8 = 64 bits

_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.StringType()),
    ]
)


def image_ahash(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, phash): the 8×8 average hash of each decoded raster."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(GRID)
        shifts = 1 << np.arange(GRID, dtype=np.int64)
        for pdf in batches:
            hashes = []
            for payload in pdf[payload_col]:
                px = bmp_decode(bytes(payload))
                h, w, _ = px.shape
                grid = px[np.ix_((idx * h) // GRID, (idx * w) // GRID)].astype(np.int64)
                gray = grid.sum(axis=2) // 3  # (8, 8) integer grayscale
                total = int(gray.sum())
                bits = (gray * (GRID * GRID)) > total  # g*64 > sum — exact
                row_bytes = (bits * shifts).sum(axis=1)
                hashes.append("".join(f"{int(b):02x}" for b in row_bytes))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "phash": hashes}
            )

    return df.mapInPandas(fn, schema=_PHASH_SCHEMA)


# The fixture rasters tile the digest per row (every row identical), so
# gray(y, x) is independent of y: the oracle computes the 8 column grays
# from digest bytes, thresholds against 8×their sum, and repeats the row
# byte 8 times — while the Spark side must reproduce it from REAL decoded
# pixels through the general 2-D gather.
_PHASH_ORACLE = f"""
WITH hexmap AS ({_HEXMAP}),
sh AS (SELECT doc_id, lower(sha256(text)) AS h FROM documents),
bytes AS ({_DIGEST_BYTES}),
dims AS (
  SELECT doc_id,
         64 + (MAX(CASE WHEN j = 0 THEN v END) % 192) AS width
  FROM bytes GROUP BY doc_id
),
cols AS (
  SELECT d.doc_id, x.xi,
         (ba.v + bb.v + bc.v) // 3 AS g
  FROM dims d
  CROSS JOIN range({GRID}) x(xi)
  JOIN bytes ba ON ba.doc_id = d.doc_id
               AND ba.j = ((x.xi * d.width // {GRID}) * 3) % 32
  JOIN bytes bb ON bb.doc_id = d.doc_id
               AND bb.j = ((x.xi * d.width // {GRID}) * 3 + 1) % 32
  JOIN bytes bc ON bc.doc_id = d.doc_id
               AND bc.j = ((x.xi * d.width // {GRID}) * 3 + 2) % 32
),
sums AS (
  SELECT doc_id, SUM(g) AS sumg FROM cols GROUP BY doc_id
),
hashes AS (
  SELECT c.doc_id,
         repeat(printf('%02x',
           CAST(SUM(CASE WHEN c.g * {GRID} > s.sumg
                         THEN 1 << c.xi ELSE 0 END) AS INTEGER)), {GRID}) AS phash
  FROM cols c JOIN sums s USING (doc_id)
  GROUP BY c.doc_id
)
SELECT c.doc_id, c.phash,
       g.canonical_doc_id,
       g.dup_count,
       c.doc_id = g.canonical_doc_id AS is_canonical
FROM hashes c
JOIN (
  SELECT phash, min(doc_id) AS canonical_doc_id,
         CAST(count(*) AS BIGINT) AS dup_count
  FROM hashes GROUP BY phash
) g USING (phash)
"""


@register("image_phash_dedup", oracle=_PHASH_ORACLE)
def image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's decoded-raster aHash, its hash-group canonical,
    and the group multiplicity — exact dedup keyed on perceptual content.

    Plan note: the canonical/dup_count are WINDOW functions over a phash
    partition, not a groupBy+join — one scan of documents, one Arrow
    decode pass, one phash-keyed shuffle. The earlier agg+join shape
    consumed the unpersisted mapInPandas frame twice, re-running the
    whole BMP encode+decode per leg (BENCH_r05: 45.3 s vs the 2.1 s
    single-pass probe)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hashes = image_ahash(encode_bmp(docs))
    w = Window.partitionBy("phash")
    return hashes.select(
        "doc_id",
        "phash",
        F.min("doc_id").over(w).alias("canonical_doc_id"),
        F.count("*").over(w).alias("dup_count"),
    ).withColumn("is_canonical", F.col("doc_id") == F.col("canonical_doc_id"))
