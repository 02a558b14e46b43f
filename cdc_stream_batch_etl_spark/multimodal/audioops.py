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

# Shared oracle CTE: digest bytes → int16 samples (pairs 2j, 2j+1,
# little-endian, signed) — the 16-sample tile plus each doc's length
# n = 256 + 8·digest[3]. Reused by the stats and silence oracles.
_SAMPLES_CTE = """hexmap AS (SELECT i AS v, printf('%02x', i) AS hx FROM range(256) t(i)),
sh AS (SELECT doc_id, lower(sha256(text)) AS h FROM documents),
bytes AS (
  SELECT sh.doc_id, r.j, m.v
  FROM sh CROSS JOIN range(32) r(j)
  JOIN hexmap m ON m.hx = substr(sh.h, CAST(1 + 2 * r.j AS INTEGER), 2)
),
samp AS (
  SELECT b0.doc_id, b0.j // 2 AS s,
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
)"""

# Stats via tile arithmetic: 256+8k samples = (n // 16) full tiles +
# (n % 16) prefix samples.
_AUDIO_ORACLE = f"""
WITH {_SAMPLES_CTE},
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


#: |sample| below this is "silence". 20000/32768 ≈ 61% of uniform
#: digest samples qualify, so the synthetic waveforms carry multi-sample
#: runs — a lower cutoff makes every run length 1 and the run-merging
#: logic untestable
SILENCE_THRESH = 20000

_SILENCE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_silent", T.LongType()),
        T.StructField("n_segments", T.LongType()),
        T.StructField("longest_silence", T.LongType()),
        T.StructField("silent_share", T.DoubleType()),
    ]
)

# Oracle: materialize each doc's full sample series (tile value at
# pos % 16, positions 0..n-1) and run the canonical gaps-and-islands
# grouping (pos − row_number) over the below-threshold positions.
_SILENCE_ORACLE = f"""
WITH {_SAMPLES_CTE},
posns AS (
  SELECT n.doc_id, g.g AS pos
  FROM n, LATERAL unnest(generate_series(0, n.n_samples - 1)) g(g)
),
series AS (
  SELECT p.doc_id, p.pos, s.val
  FROM posns p JOIN samp s ON s.doc_id = p.doc_id AND s.s = p.pos % 16
),
sil AS (SELECT doc_id, pos FROM series WHERE abs(val) < {SILENCE_THRESH}),
isl AS (
  SELECT doc_id,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM sil
),
segs AS (
  SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS len
  FROM isl GROUP BY 1, 2
),
per AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_segments,
         CAST(sum(len) AS BIGINT) AS n_silent,
         CAST(max(len) AS BIGINT) AS longest_silence
  FROM segs GROUP BY doc_id
)
SELECT n.doc_id,
       CAST(n.n_samples AS BIGINT) AS n_samples,
       CAST(COALESCE(p.n_silent, 0) AS BIGINT) AS n_silent,
       CAST(COALESCE(p.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(p.longest_silence, 0) AS BIGINT) AS longest_silence,
       CAST(COALESCE(p.n_silent, 0) AS DOUBLE) / n.n_samples AS silent_share
FROM n LEFT JOIN per p USING (doc_id)
ORDER BY doc_id
"""


def silence_profile(samples: np.ndarray, thresh: int = SILENCE_THRESH) -> tuple:
    """(n_silent, n_segments, longest) over one int16 sample array —
    vectorized maximal-run detection (the VAD inner loop)."""
    idx = np.flatnonzero(np.abs(samples.astype(np.int64)) < thresh)
    if idx.size == 0:
        return 0, 0, 0
    # positions minus their rank are constant within a maximal run
    groups = idx - np.arange(idx.size)
    lens = np.unique(groups, return_counts=True)[1]
    return int(idx.size), int(lens.size), int(lens.max())


@register("audio_silence_segments", oracle=_SILENCE_ORACLE)
def audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence segmentation over REAL decoded audio — the VAD-lite
    pre-filter a speech-data pipeline runs before transcription
    (drop/shorten silent stretches, route all-silent clips out): per
    document, maximal runs of |sample| < SILENCE_THRESH in the decoded
    WAV — run count, total silent samples, longest run, silent share.

    Like multimodal_audio_stats, the Spark side must round-trip a real
    RIFF/WAVE container (encode → strict parse → numpy run detection);
    the oracle predicts every run from digest arithmetic alone, so the
    codec path and the vectorized islands logic are both hash-verified.

    Determinism: counts are integers; silent_share is one exact-integer
    IEEE division.

    Scale: 1:1 row-local mapInPandas — no shuffle; per-row cost is the
    ≤ 4.6 KB waveform. The oracle's per-sample series explode is
    oracle-side only."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, nsil, nseg, longest, share = [], [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                samples = wav_decode(wav_encode(_doc_samples(text)))
                s_cnt, s_seg, s_max = silence_profile(samples)
                ids.append(doc_id)
                ns.append(len(samples))
                nsil.append(s_cnt)
                nseg.append(s_seg)
                longest.append(s_max)
                share.append(s_cnt / len(samples))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": ns,
                    "n_silent": nsil,
                    "n_segments": nseg,
                    "longest_silence": longest,
                    "silent_share": share,
                }
            )

    return docs.mapInPandas(fn, schema=_SILENCE_SCHEMA).orderBy("doc_id")
