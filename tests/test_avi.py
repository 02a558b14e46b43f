"""MJPEG-in-AVI container contracts (multimodal/aviops.py).

The driver oracle hash-covers the digest-predictable columns (frame
count, decoded dims, lineage digests); everything structural or
adversarial is gated here: spec-conformant RIFF framing, real JPEG
frames inside movi, index consistency, and the rejection paths — a
malformed container must raise ValueError, never struct.error, numpy
bounds errors, or silent garbage.
"""

import struct

import numpy as np
import pytest

from cdc_stream_batch_etl_spark.multimodal.aviops import (
    _frame_dims,
    _frame_pixels,
    _n_frames,
    avi_decode,
    avi_encode,
)
from cdc_stream_batch_etl_spark.multimodal.jpegops import jpeg_encode


def _make(text="fixture", quality=90):
    w, h = _frame_dims(text)
    n = _n_frames(text)
    frames = [jpeg_encode(_frame_pixels(text, i, w, h), quality) for i in range(n)]
    return avi_encode(frames, w, h), w, h, n


def test_roundtrip_dims_count_and_content():
    blob, w, h, n = _make()
    dw, dh, frames = avi_decode(blob)
    assert (dw, dh, len(frames)) == (w, h, n)
    for i, px in enumerate(frames):
        assert px.shape == (h, w, 3) and px.dtype == np.uint8
        # frames differ (per-frame lineage digest content)
        if i:
            assert not np.array_equal(px, frames[0])


def test_container_is_spec_conformant_riff():
    blob, w, h, n = _make()
    # RIFF size field covers exactly the rest of the file
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    assert 8 + riff_size == len(blob)
    # canonical chunk sequence present
    for magic in (b"LIST", b"hdrl", b"avih", b"strl", b"strh", b"strf",
                  b"vids", b"MJPG", b"movi", b"00dc", b"idx1"):
        assert magic in blob, magic
    # every movi frame is a complete JPEG (SOI..EOI)
    pos = blob.index(b"movi") + 4
    for _ in range(n):
        assert blob[pos : pos + 4] == b"00dc"
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        frame = blob[pos + 8 : pos + 8 + size]
        assert frame[:2] == b"\xff\xd8" and frame[-2:] == b"\xff\xd9"
        pos += 8 + size + (size & 1)


def test_idx1_entries_point_at_frames():
    blob, _, _, n = _make()
    movi_fourcc = blob.index(b"movi")
    idx = blob.index(b"idx1")
    (isize,) = struct.unpack_from("<I", blob, idx + 4)
    assert isize == 16 * n
    for k in range(n):
        ckid, flags, off, ln = struct.unpack_from(
            "<4sIII", blob, idx + 8 + 16 * k
        )
        assert ckid == b"00dc" and flags == 0x10
        # offset is relative to the start of the 'movi' fourcc (first
        # chunk at offset 4); it must land on the frame's chunk header
        at = movi_fourcc + off
        assert blob[at : at + 4] == b"00dc"
        (size,) = struct.unpack_from("<I", blob, at + 4)
        assert size == ln


def test_truncated_containers_raise_valueerror():
    blob, *_ = _make("x" * 500)
    for keep in (4, 11, 40, len(blob) // 4, len(blob) // 2, len(blob) - 3):
        with pytest.raises(ValueError):
            avi_decode(blob[:keep])


def test_bad_magics_raise_valueerror():
    blob, *_ = _make()
    with pytest.raises(ValueError, match="RIFF/AVI"):
        avi_decode(b"JUNK" + blob[4:])
    with pytest.raises(ValueError, match="RIFF/AVI"):
        avi_decode(blob[:8] + b"WAVE" + blob[12:])


def test_non_mjpg_stream_rejected():
    blob, *_ = _make()
    at = blob.index(b"vids") + 4
    assert blob[at : at + 4] == b"MJPG"
    with pytest.raises(ValueError, match="MJPG only"):
        avi_decode(blob[:at] + b"H264" + blob[at + 4 :])


def test_frame_count_lie_rejected():
    blob, w, h, n = _make()
    # avih dwTotalFrames is the 5th DWORD of the avih body
    at = blob.index(b"avih") + 8 + 16
    (declared,) = struct.unpack_from("<I", blob, at)
    assert declared == n
    forged = blob[:at] + struct.pack("<I", n + 1) + blob[at + 4 :]
    with pytest.raises(ValueError, match="frame count mismatch"):
        avi_decode(forged)


def test_dimension_lie_rejected():
    blob, w, h, n = _make()
    # avih dwWidth is the 9th DWORD of the avih body
    at = blob.index(b"avih") + 8 + 32
    (declared_w,) = struct.unpack_from("<I", blob, at)
    assert declared_w == w
    forged = blob[:at] + struct.pack("<I", w + 8) + blob[at + 4 :]
    with pytest.raises(ValueError, match="header says"):
        avi_decode(forged)


def test_chunk_size_overrun_rejected():
    blob, *_ = _make()
    # inflate the first movi frame's size field past its parent
    pos = blob.index(b"movi") + 4
    assert blob[pos : pos + 4] == b"00dc"
    forged = (
        blob[: pos + 4] + struct.pack("<I", 1 << 30) + blob[pos + 8 :]
    )
    with pytest.raises(ValueError, match="overruns"):
        avi_decode(forged)
