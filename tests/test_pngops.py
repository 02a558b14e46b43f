"""PNG codec contracts beyond the oracle: filter reconstruction for the
types the encoder doesn't emit, CRC enforcement, and framing."""

import struct
import zlib

import numpy as np
import pytest

from cdc_stream_batch_etl_spark.multimodal.binaryops import _doc_pixels
from cdc_stream_batch_etl_spark.multimodal.pngops import (
    _SIG,
    _chunk,
    _unfilter,
    png_decode,
    png_encode,
)


def test_roundtrip_identity():
    px = _doc_pixels("the quick brown fox")
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_compression_actually_compresses():
    px = _doc_pixels("some document text")
    raw = px.size
    assert len(png_encode(px)) < raw / 4  # tiled rows compress hard


def test_crc_corruption_rejected():
    payload = bytearray(png_encode(_doc_pixels("x")))
    payload[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(payload))


def test_multi_idat_streams_concatenate():
    """The spec allows IDAT split across chunks; rebuild a payload with
    the stream cut in two and decode must still reconstruct."""
    px = _doc_pixels("multi idat")
    payload = png_encode(px)
    pos = 8
    chunks = {}
    while pos < len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        chunks[tag] = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    idat = chunks[b"IDAT"]
    cut = len(idat) // 2
    rebuilt = (
        _SIG
        + _chunk(b"IHDR", chunks[b"IHDR"])
        + _chunk(b"IDAT", idat[:cut])
        + _chunk(b"IDAT", idat[cut:])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(rebuilt), px)


def test_average_and_paeth_filters_reconstruct():
    """Filters 3/4 aren't emitted by the encoder — verify them against
    directly-filtered scanlines (spec formulas applied forward)."""
    rng = np.random.default_rng(7)
    prev = rng.integers(0, 256, 30).astype(np.int32)
    orig = rng.integers(0, 256, 30).astype(np.int32)
    bpp = 3
    # forward Average filter
    avg = np.zeros(30, dtype=np.int32)
    for i in range(30):
        left = orig[i - bpp] if i >= bpp else 0
        avg[i] = (orig[i] - (left + prev[i]) // 2) % 256
    assert np.array_equal(_unfilter(3, avg.astype(np.uint8), prev, bpp), orig)
    # forward Paeth filter
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    pth = np.zeros(30, dtype=np.int32)
    for i in range(30):
        left = orig[i - bpp] if i >= bpp else 0
        ul = prev[i - bpp] if i >= bpp else 0
        pth[i] = (orig[i] - paeth(int(left), int(prev[i]), int(ul))) % 256
    assert np.array_equal(_unfilter(4, pth.astype(np.uint8), prev, bpp), orig)


def test_zlib_level_is_a_size_knob_not_a_content_knob():
    px = _doc_pixels("level test")
    a, b = png_encode(px, level=1), png_encode(px, level=9)
    assert np.array_equal(png_decode(a), png_decode(b))
