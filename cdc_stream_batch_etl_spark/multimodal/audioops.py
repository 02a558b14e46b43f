"""Audio payloads: a REAL WAV (RIFF) codec path, completing the
multimodal triple next to binaryops.py's BMP images and frame sampling
(image / audio / video — SURVEY §2.11 beyond-reference mandate).

Same design rules as the BMP path (binaryops.py):
- ``wav_encode`` builds a genuine RIFF/WAVE container (44-byte canonical
  header: RIFF size, fmt chunk with PCM tag/mono/8 kHz/16-bit, data
  chunk) any audio tool could open;
- ``wav_decode`` is a REAL parser: validates the RIFF/WAVE magics and
  fmt fields with ``struct``, honors the data-chunk length, and returns
  the int16 sample array via numpy;
- the per-document waveform is digest-deterministic (samples tile the
  sha256 digest as little-endian int16 pairs), so the DuckDB oracle
  predicts the decoded sample statistics from digest arithmetic alone —
  the Spark side must actually round-trip real bytes to hash-match.
- statistics are INTEGER-exact (sum/max of |sample|, counts) — no float
  folds needed, the strongest possible oracle.

Scale: encode→decode→stats is a 1:1 row-local mapInPandas chain — no
shuffle, Arrow-batched, per-batch memory bounded by the max waveform
(256 + 8·255 samples ≈ 4.6 KB).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import register

SAMPLE_RATE = 8000
_WAV_HEADER = 44  # canonical RIFF + fmt + data-header bytes


def wav_encode(samples: np.ndarray) -> bytes:
    """Encode an int16 mono waveform as a canonical PCM WAV file."""
    body = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(body),
        b"WAVE",
        b"fmt ",
        16,  # fmt chunk size
        1,  # PCM
        1,  # mono
        SAMPLE_RATE,
        SAMPLE_RATE * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
        b"data",
        len(body),
    )
    return hdr + body


def wav_decode(payload: bytes) -> np.ndarray:
    """Parse a canonical PCM WAV into an int16 sample array.

    A real parser: validates magics, PCM tag, channel/width fields, and
    the data-chunk length against the payload size."""
    if len(payload) < _WAV_HEADER:
        raise ValueError(f"truncated WAV payload: {len(payload)} bytes < {_WAV_HEADER}")
    (riff, _size, wave, fmt, fmt_len, tag, n_ch, rate, _brate, _align, bits, data, dlen) = (
        struct.unpack_from("<4sI4s4sIHHIIHH4sI", payload, 0)
    )
    if riff != b"RIFF" or wave != b"WAVE" or fmt != b"fmt " or data != b"data":
        raise ValueError("not a canonical WAV payload")
    if tag != 1 or n_ch != 1 or bits != 16 or fmt_len != 16:
        raise ValueError(f"unsupported WAV variant: tag={tag} ch={n_ch} bits={bits}")
    if _WAV_HEADER + dlen > len(payload) or dlen % 2 != 0:
        raise ValueError(f"WAV data chunk out of bounds: dlen={dlen} have={len(payload)}")
    return np.frombuffer(payload, dtype="<i2", count=dlen // 2, offset=_WAV_HEADER)


def _doc_samples(text: str) -> np.ndarray:
    """Deterministic waveform: length from digest byte 3, samples tile
    the digest as little-endian int16 pairs (period 16)."""
    d = hashlib.sha256(text.encode("utf-8")).digest()
    n = 256 + 8 * d[3]
    tile = np.frombuffer(d, dtype="<i2")  # 16 samples
    reps = (n + len(tile) - 1) // len(tile)
    return np.tile(tile, reps)[:n]


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("max_abs", T.LongType()),
    ]
)

# Oracle: digest bytes → int16 samples (pairs 2j, 2j+1, little-endian,
# signed), tiled to n = 256 + 8·digest[3]; stats via tile arithmetic:
# 256+8k samples = (n // 16) full tiles + (n % 16) prefix samples.
_AUDIO_ORACLE = """
WITH hexmap AS (SELECT i AS v, printf('%02x', i) AS hx FROM range(256) t(i)),
sh AS (SELECT doc_id, lower(sha256(text)) AS h FROM documents),
bytes AS (
  SELECT sh.doc_id, r.j, m.v
  FROM sh CROSS JOIN range(32) r(j)
  JOIN hexmap m ON m.hx = substr(sh.h, CAST(1 + 2 * r.j AS INTEGER), 2)
),
samp AS (
  SELECT b0.doc_id, b0.j / 2 AS s,
         CASE WHEN b0.v + 256 * b1.v >= 32768
              THEN b0.v + 256 * b1.v - 65536
              ELSE b0.v + 256 * b1.v END AS val
  FROM bytes b0 JOIN bytes b1
    ON b0.doc_id = b1.doc_id AND b1.j = b0.j + 1
  WHERE b0.j % 2 = 0
),
n AS (
  SELECT doc_id, 256 + 8 * MAX(CASE WHEN j = 3 THEN v END) AS n_samples
  FROM bytes GROUP BY doc_id
),
agg AS (
  SELECT s.doc_id,
         SUM(abs(s.val)) AS tile_abs,
         MAX(abs(s.val)) AS max_abs,
         SUM(CASE WHEN s.s < (SELECT n_samples FROM n WHERE n.doc_id = s.doc_id) % 16
                  THEN abs(s.val) ELSE 0 END) AS prefix_abs
  FROM samp s GROUP BY s.doc_id
)
SELECT n.doc_id,
       CAST(n.n_samples AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(44 + 2 * n.n_samples AS BIGINT) AS byte_len,
       CAST((n.n_samples // 16) * a.tile_abs + a.prefix_abs AS BIGINT) AS sum_abs,
       CAST(a.max_abs AS BIGINT) AS max_abs
FROM n JOIN agg a USING (doc_id)
"""


@register("multimodal_audio_stats", oracle=_AUDIO_ORACLE)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV encode→decode round trip: documents → PCM WAV binaries →
    parsed header + integer-exact sample statistics. The oracle predicts
    the same numbers from digest arithmetic, so the container round trip
    is fully hash-verified."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, blens, sums, maxs = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = wav_encode(_doc_samples(text))
                samples = wav_decode(payload)
                a = np.abs(samples.astype(np.int64))
                ids.append(doc_id)
                ns.append(len(samples))
                blens.append(len(payload))
                sums.append(int(a.sum()))
                maxs.append(int(a.max()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": ns,
                    "sample_rate": SAMPLE_RATE,
                    "byte_len": blens,
                    "sum_abs": sums,
                    "max_abs": maxs,
                }
            )

    return docs.mapInPandas(fn, schema=_AUDIO_SCHEMA)
