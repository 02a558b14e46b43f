"""Multimodal columns: REAL binary image payloads with a real decode path.

Design per the brief: image/audio/video are opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` operators (no
shuffle — the decode pipeline is scan-local, SURVEY §2.11). The container
has no image libraries (PIL/opencv), so instead of stubbing the decode we
make the FORMAT simple enough to be real without them:

- ``encode_bmp``   — builds a genuine, spec-conformant 24-bit BMP binary
  per document (dimensions derived deterministically from the document's
  sha256 digest; pixel rows tile the digest). Any external BMP viewer
  could open these payloads.
- ``decode_bmp_features`` — a REAL decoder: parses the BITMAPFILEHEADER /
  BITMAPINFOHEADER with ``struct``, validates magic/bpp/offset, extracts
  the padded pixel raster with numpy, and computes metadata + an exact
  pixel checksum from the decoded bytes. Nothing is faked: a bug in
  either the encoder or the parser breaks the oracle hash-match.
- ``resize_bmp`` — a REAL nearest-neighbor resize: decode → 2-D numpy
  gather to 224×224 → re-encode as a fresh BMP; outputs the actual
  re-encoded byte length and the checksum of the resampled raster.
- ``multimodal_frame_sample`` — lives in aviops.py since round 9: the
  video-style 1→N frame fan-out now encodes and re-parses REAL
  MJPEG-in-AVI container bytes (RIFF walk + per-frame JPEG decode).

Every query here is fully DuckDB-oracled: the payload generator is
digest-deterministic, so the oracle independently predicts header fields
and raster checksums from ``sha256(text)`` using a 256-row hex→byte
lookup join — the Spark side must *actually* round-trip real bytes
through encode→parse to match.

Reference parity note: the reference has no multimodal surface at all
(SURVEY §2.11 — beyond-reference mandate); binary handling there is
limited to JSON bytes on the Kafka boundary (utils.py:76-100).

Scale notes (100 TB): encode/decode/resize are 1:1 row-local Pandas
iterators — no shuffle, no state; partition count = input file splits.
Per-batch memory is bounded by Arrow batch size × max raster (255×255×3
≈ 195 KB), independent of corpus size.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import register

_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS byte_len,
       sha256(text) AS payload_sha256,
       CASE WHEN octet_length(encode(text)) >= 256 THEN 'image/fake'
            ELSE 'audio/fake' END AS mime_guess
FROM documents
"""


@register("multimodal_binary_meta", oracle=_META_ORACLE)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata: byte length, content digest, mime sniff —
    all scan-local built-ins over the payload column."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("byte_len"),
        F.sha2(payload, 256).alias("payload_sha256"),
        F.when(F.octet_length(payload) >= 256, "image/fake")
        .otherwise("audio/fake")
        .alias("mime_guess"),
    )


# ---------------------------------------------------------------------------
# BMP codec (pure stdlib/numpy — real binary format, no image libraries)
# ---------------------------------------------------------------------------

_BMP_HEADER_SIZE = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def bmp_encode(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as a 24-bit uncompressed BMP.

    Rows are written bottom-up with 4-byte padding, per the BMP spec."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = pixels[::-1].reshape(h, w * 3)  # bottom-up
    body = raster.tobytes()
    file_size = _BMP_HEADER_SIZE + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, _BMP_HEADER_SIZE)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def bmp_decode(payload: bytes) -> np.ndarray:
    """Parse a 24-bit BMP into an (H, W, 3) uint8 array (top-down).

    A real parser: validates magic, bpp, and compression; honors the
    pixel-data offset and row padding from the header."""
    if len(payload) < _BMP_HEADER_SIZE:
        raise ValueError(f"truncated BMP payload: {len(payload)} bytes < {_BMP_HEADER_SIZE}")
    magic, _file_size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h, _planes, bpp, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0 or hdr_size < 40:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    if w <= 0 or h <= 0:
        # negative biHeight = spec-legal top-down raster; we only emit/accept
        # the bottom-up form, and w<=0 is corrupt either way
        raise ValueError(f"unsupported BMP dimensions: w={w} h={h}")
    stride = (w * 3 + 3) & ~3
    if offset < _BMP_HEADER_SIZE or offset + h * stride > len(payload):
        raise ValueError(
            f"BMP raster out of bounds: offset={offset} need={h * stride} have={len(payload)}"
        )
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    rows = raster.reshape(h, stride)[:, : w * 3]
    return rows.reshape(h, w, 3)[::-1]  # bottom-up → top-down


def _doc_pixels(text: str) -> np.ndarray:
    """Deterministic raster for a document: dimensions from the first two
    digest bytes (64..255), every row tiles the 32-byte digest."""
    d = hashlib.sha256(text.encode("utf-8")).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    reps = (width * 3 + len(d) - 1) // len(d)
    row = np.frombuffer((d * reps)[: width * 3], dtype=np.uint8)
    return np.broadcast_to(row, (height, width * 3)).reshape(height, width, 3)


_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def spread_for_codec(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-spread a narrow input across every core before a CPU-heavy
    Arrow codec pass.

    A small parquet file arrives as ONE split (sf0.1 documents is
    ~600 KB → one task), which serializes the per-document codec work on
    a single Python worker — measured 169 s vs ~6 s for the JPEG round
    trip at sf0.1. The exchange this adds moves only the narrow
    (id, text) projection — kilobytes — to unlock full parallelism; at
    100 TB the scan already has more splits than cores and this is a
    NO-OP (the check is on partition count, so the spread never *reduces*
    parallelism at scale)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n, key)
    return df


def encode_bmp(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """documents → (doc_id, payload: binary) of real BMP images.

    Arrow-batched, 1:1, no shuffle — the 'ingest' half of the multimodal
    pipeline. Output payloads are spec-conformant 24-bit BMPs."""
    df = spread_for_codec(df, id_col)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [bmp_encode(_doc_pixels(t)) for t in pdf[text_col]],
                }
            )

    return df.mapInPandas(fn, schema=_PAYLOAD_SCHEMA)


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("pixel_bytes", T.LongType()),
        T.StructField("pixel_checksum", T.LongType()),
    ]
)


def decode_bmp_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: parse each BMP header, extract the raster, and
    emit metadata + an exact checksum of the decoded pixel bytes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, sizes, sums = [], [], [], []
            for payload in pdf[payload_col]:
                px = bmp_decode(bytes(payload))
                h, w, _ = px.shape
                widths.append(w)
                heights.append(h)
                sizes.append(w * h * 3)
                sums.append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": widths,
                    "height": heights,
                    "n_channels": 3,
                    "pixel_bytes": sizes,
                    "pixel_checksum": sums,
                }
            )

    return df.mapInPandas(fn, schema=_FEATURES_SCHEMA)


# hex-pair → byte-value lookup: lets the oracle read digest bytes in SQL
_HEXMAP = "SELECT i AS v, printf('%02x', i) AS hx FROM range(256) t(i)"

# digest bytes 0..31 per document, as (doc_id, j, v) rows
_DIGEST_BYTES = """
  SELECT sh.doc_id, r.j, m.v
  FROM sh CROSS JOIN range(32) r(j)
  JOIN hexmap m ON m.hx = substr(sh.h, CAST(1 + 2 * r.j AS INTEGER), 2)
"""

_FEATURES_ORACLE = f"""
WITH hexmap AS ({_HEXMAP}),
sh AS (SELECT doc_id, lower(sha256(text)) AS h FROM documents),
bytes AS ({_DIGEST_BYTES}),
dims AS (
  SELECT doc_id,
         64 + (MAX(CASE WHEN j = 0 THEN v END) % 192) AS width,
         64 + (MAX(CASE WHEN j = 1 THEN v END) % 192) AS height
  FROM bytes GROUP BY doc_id
),
chk AS (
  SELECT b.doc_id,
         SUM(b.v) AS s32,
         SUM(CASE WHEN b.j < (d.width * 3) % 32 THEN b.v ELSE 0 END) AS pre
  FROM bytes b JOIN dims d USING (doc_id) GROUP BY b.doc_id
)
SELECT d.doc_id,
       CAST(d.width AS BIGINT) AS width,
       CAST(d.height AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS n_channels,
       CAST(d.width * d.height * 3 AS BIGINT) AS pixel_bytes,
       CAST(d.height * ((d.width * 3 // 32) * c.s32 + c.pre) AS BIGINT) AS pixel_checksum
FROM dims d JOIN chk c USING (doc_id)
"""


@register("multimodal_features", oracle=_FEATURES_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real encode→decode round trip: documents → BMP binaries → parsed
    header dims + raster checksum. The oracle predicts the same values
    from digest arithmetic alone, so the binary round trip is fully
    hash-verified.

    r13 (guide §4.1/§2.3): encode and decode run in ONE Arrow pass —
    the ~80 KB/doc BMP payload is built and re-parsed inside the same
    Python worker instead of crossing JVM↔Python twice between two
    chained mapInPandas nodes (only the narrow (doc_id, text) input
    crosses). Both real codec halves (bmp_encode, bmp_decode) still run
    on every row; nothing is predicted from the digest on the Spark side."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = spread_for_codec(docs)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, sizes, sums = [], [], [], []
            for text in pdf["text"]:
                px = bmp_decode(bmp_encode(_doc_pixels(text)))
                h, w, _ = px.shape
                widths.append(w)
                heights.append(h)
                sizes.append(w * h * 3)
                sums.append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": widths,
                    "height": heights,
                    "n_channels": 3,
                    "pixel_bytes": sizes,
                    "pixel_checksum": sums,
                }
            )

    return docs.mapInPandas(fn, schema=_FEATURES_SCHEMA)


RESIZE_TARGET = (224, 224)  # the usual vision-model input square

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("target_w", T.LongType()),
        T.StructField("target_h", T.LongType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resized_checksum", T.LongType()),
    ]
)

# the resampled raster: rows tile the digest, so resized pixel (x, c)
# = digest[((x * width // 224) * 3 + c) % 32], identical for all 224 rows
_RESIZE_ORACLE = f"""
WITH hexmap AS ({_HEXMAP}),
sh AS (SELECT doc_id, lower(sha256(text)) AS h FROM documents),
bytes AS ({_DIGEST_BYTES}),
dims AS (
  SELECT doc_id,
         64 + (MAX(CASE WHEN j = 0 THEN v END) % 192) AS width
  FROM bytes GROUP BY doc_id
),
samp AS (
  SELECT d.doc_id, SUM(b.v) AS row_sum
  FROM dims d
  CROSS JOIN range({RESIZE_TARGET[0]}) x(xi)
  CROSS JOIN range(3) c(ci)
  JOIN bytes b
    ON b.doc_id = d.doc_id
   AND b.j = ((x.xi * d.width // {RESIZE_TARGET[0]}) * 3 + c.ci) % 32
  GROUP BY d.doc_id
)
SELECT d.doc_id,
       CAST({RESIZE_TARGET[0]} AS BIGINT) AS target_w,
       CAST({RESIZE_TARGET[1]} AS BIGINT) AS target_h,
       CAST({_BMP_HEADER_SIZE + RESIZE_TARGET[0] * RESIZE_TARGET[1] * 3} AS BIGINT) AS resized_bytes,
       CAST({RESIZE_TARGET[1]} * s.row_sum AS BIGINT) AS resized_checksum
FROM dims d JOIN samp s USING (doc_id)
"""


def resize_bmp(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Real nearest-neighbor resize: decode → 2-D gather → re-encode.
    Emits the actual re-encoded byte length and resampled checksum."""
    tw, th = RESIZE_TARGET

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs = np.arange(tw)
        ys = np.arange(th)
        for pdf in batches:
            sizes, sums = [], []
            for payload in pdf[payload_col]:
                px = bmp_decode(bytes(payload))
                h, w, _ = px.shape
                res = px[np.ix_((ys * h) // th, (xs * w) // tw)]
                sizes.append(len(bmp_encode(res)))
                sums.append(int(res.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "target_w": tw,
                    "target_h": th,
                    "resized_bytes": sizes,
                    "resized_checksum": sums,
                }
            )

    return df.mapInPandas(fn, schema=_RESIZE_SCHEMA)


@register("multimodal_resize", oracle=_RESIZE_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize over real BMP payloads: binary-in → binary-out 1:1,
    Arrow-batched, no shuffle. 224×224×24bpp re-encode has no row padding,
    so the oracle's byte-length constant is exact.

    r13 (guide §4.1/§2.3): encode→decode→gather→re-encode fused into ONE
    Arrow pass (the multimodal_features rationale — the per-doc payload
    never transits JVM↔Python between codec stages; every codec half
    still runs for real)."""
    tw, th = RESIZE_TARGET
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = spread_for_codec(docs)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs = np.arange(tw)
        ys = np.arange(th)
        for pdf in batches:
            sizes, sums = [], []
            for text in pdf["text"]:
                px = bmp_decode(bmp_encode(_doc_pixels(text)))
                h, w, _ = px.shape
                res = px[np.ix_((ys * h) // th, (xs * w) // tw)]
                sizes.append(len(bmp_encode(res)))
                sums.append(int(res.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "target_w": tw,
                    "target_h": th,
                    "resized_bytes": sizes,
                    "resized_checksum": sums,
                }
            )

    return docs.mapInPandas(fn, schema=_RESIZE_SCHEMA)


# multimodal_frame_sample moved to aviops.py in round 9: the 1→N frame
# fan-out now encodes and RE-PARSES real MJPEG-in-AVI container bytes
# (RIFF walk + per-frame JPEG decode) instead of digest-derived
# expansion plumbing.
