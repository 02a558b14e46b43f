"""Baseline JPEG codec contracts (multimodal/jpegops.py).

JPEG is lossy, so the oracle hash-match covers only the digest-
predictable columns (dims/raster size — test_queries.py handles that
via the registry); everything approximate or structural is gated here:
reconstruction quality, quality-knob monotonicity, marker framing,
byte stuffing, Huffman/magnitude round trips, and the rejection paths.
No external JPEG library exists in this environment, so conformance is
asserted structurally against the spec constants (ITU T.81 Annex K)
rather than against libjpeg output.
"""

import numpy as np
import pytest

from cdc_stream_batch_etl_spark.multimodal.binaryops import _doc_pixels
from cdc_stream_batch_etl_spark.multimodal.jpegops import (
    _build_dec_table,
    _build_enc_table,
    _extend,
    _magnitude,
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    jpeg_decode,
    jpeg_encode,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_roundtrip_dimensions_and_quality_on_doc_rasters():
    for text in ["alpha", "beta beta", "x" * 300]:
        px = _doc_pixels(text)
        out = jpeg_decode(jpeg_encode(px, 90))
        assert out.shape == px.shape  # non-multiple-of-8 dims crop back exactly
        assert out.dtype == np.uint8
        assert _psnr(px, out) > 35.0  # q90 on digest-tiled rows


def test_smooth_gradient_is_near_lossless():
    """The DCT's home turf: a smooth gradient at q90 must reconstruct
    within a couple of counts per pixel — a quantizer or IDCT bug shows
    up here immediately."""
    g = np.linspace(0, 255, 128).astype(np.uint8)
    grad = np.stack([np.tile(g, (96, 1))] * 3, axis=-1)
    out = jpeg_decode(jpeg_encode(grad, 90))
    assert int(np.abs(out.astype(int) - grad.astype(int)).max()) <= 2


def test_quality_knob_trades_size_for_error():
    px = _doc_pixels("quality ladder")
    lo, hi = jpeg_encode(px, 25), jpeg_encode(px, 95)
    assert len(lo) < len(hi)  # coarser quantization → smaller payload
    assert _psnr(px, jpeg_decode(lo)) < _psnr(px, jpeg_decode(hi))
    # both stay structurally decodable
    assert jpeg_decode(lo).shape == px.shape


def test_marker_framing_is_spec_conformant():
    blob = jpeg_encode(_doc_pixels("markers"), 90)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"  # SOI/EOI
    assert blob[2:4] == b"\xff\xe0" and blob[6:11] == b"JFIF\x00"
    for marker, count in ((b"\xff\xdb", 2), (b"\xff\xc4", 4)):  # DQT, DHT
        assert blob.count(marker) >= count
    assert b"\xff\xc0" in blob and b"\xff\xda" in blob  # SOF0, SOS


def test_entropy_segment_byte_stuffing():
    """Every 0xFF inside the entropy-coded segment must be followed by a
    stuffed 0x00 (or be a marker prefix at the very end) — the decoder
    depends on it, and a writer bug here corrupts 1/256 of payloads."""
    blob = jpeg_encode(_doc_pixels("stuffing probe " * 10), 95)
    sos = blob.index(b"\xff\xda")
    (ln,) = np.frombuffer(blob[sos + 2 : sos + 4], dtype=">u2")
    ecs = blob[sos + 2 + int(ln) : -2]
    i = 0
    while i < len(ecs):
        if ecs[i] == 0xFF:
            assert ecs[i + 1] == 0x00, f"unstuffed 0xFF at ECS offset {i}"
            i += 2
        else:
            i += 1


def test_huffman_tables_are_self_inverse():
    enc = _build_enc_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dec = _build_dec_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    assert len(enc) == sum(_AC_LUMA_BITS)
    for sym, (code, length) in enc.items():
        assert dec[(length, code)] == sym
    # prefix-free: no code is a prefix of a longer one
    codes = sorted((l, c) for (c, l) in enc.values())
    for l1, c1 in codes:
        for l2, c2 in codes:
            if l2 > l1:
                assert (c2 >> (l2 - l1)) != c1 or (l1, c1) == (l2, c2)


def test_magnitude_extend_roundtrip():
    for v in list(range(-300, 301)) + [-32767, 32767]:
        size, bits = _magnitude(v)
        assert _extend(bits, size) == v
        if v:
            assert size == int(abs(v)).bit_length()


def test_decoder_rejects_corrupt_and_unsupported_payloads():
    px = _doc_pixels("reject")
    blob = jpeg_encode(px, 90)
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"BM" + blob[2:])
    with pytest.raises(ValueError):
        jpeg_decode(blob[: len(blob) // 2])  # truncated: no EOI/SOS
    # flip SOF0 → SOF2 (progressive) — must refuse, not mis-decode
    sof = blob.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg_decode(blob[:sof] + b"\xff\xc2" + blob[sof + 2 :])


def test_truncated_entropy_segment_raises_valueerror_not_indexerror():
    """Regression (r9): chopping bytes out of the MIDDLE of the
    entropy-coded segment (EOI kept, so framing parses) must raise the
    intended ValueError as soon as the bit stream over-runs — the old
    loop bounds-checked only AFTER decoding every block, so it first
    decoded zero padding and could raise IndexError (u32 index out of
    range) or fabricate garbage blocks. A multi-block image guarantees
    the truncation lands mid-stream."""
    px = _doc_pixels("x" * 900)  # several MCU rows → long segment
    blob = jpeg_encode(px, 90)
    sos = blob.index(b"\xff\xda")
    seg_start = sos + 2 + int.from_bytes(blob[sos + 2 : sos + 4], "big")
    assert blob.endswith(b"\xff\xd9")
    seg_len = len(blob) - 2 - seg_start
    assert seg_len > 200, "fixture too small to truncate mid-stream"
    for keep in (seg_len // 8, seg_len // 3, seg_len // 2):
        chopped = blob[: seg_start + keep] + b"\xff\xd9"
        with pytest.raises(ValueError):
            jpeg_decode(chopped)


def test_single_block_and_tiny_images():
    """Edge geometry: 8×8 exactly one MCU; 1×1 exercises maximal edge
    padding (7 replicated rows/cols)."""
    one = np.full((8, 8, 3), 77, dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(one, 90))
    assert out.shape == (8, 8, 3)
    assert int(np.abs(out.astype(int) - 77).max()) <= 2  # flat block ≈ DC only
    dot = np.array([[[200, 10, 30]]], dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(dot, 90))
    assert out.shape == (1, 1, 3)
    assert int(np.abs(out.astype(int) - dot.astype(int)).max()) <= 12


def test_zigzag_matches_annex_k_sequence():
    """Pin _ZIGZAG to the canonical ITU T.81 Annex K scan order. The
    encoder and decoder share the table, so a transposed table still
    round-trips internally — only this literal pin catches it (a
    transposed scan makes every external decoder render blocks
    transposed, and writes a non-spec DQT ordering)."""
    from cdc_stream_batch_etl_spark.multimodal.jpegops import _ZIGZAG

    annex_k = [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
    assert list(_ZIGZAG) == annex_k


def test_vectorized_entropy_matches_reference():
    """The vectorized entropy coder must be byte-identical to the
    per-symbol reference writer on adversarial coefficient blocks:
    sparse/dense mixes, >16 zero runs (ZRL chains), negatives, blocks
    with coefficient 63 occupied (no EOB) and all-zero AC tails."""
    from cdc_stream_batch_etl_spark.multimodal.jpegops import (
        _entropy_encode,
        _entropy_encode_ref,
    )

    rng = np.random.default_rng(7)
    for trial in range(12):
        n = int(rng.integers(1, 30))
        comps = []
        for _ in range(3):
            zz = np.zeros((n, 64), np.int32)
            mask = rng.random((n, 64)) < rng.random() * 0.4
            zz[mask] = rng.integers(-1000, 1000, int(mask.sum()))
            comps.append(zz)
        # force the edge shapes at least once per trial
        comps[0][0, :] = 0            # all-zero block (DC diff + EOB only)
        comps[1][-1, 63] = 5          # last coefficient set (no EOB)
        comps[2][0, 1] = 0
        comps[2][0, 40] = -3          # 38-zero run → 2 ZRLs + run 6
        assert _entropy_encode(comps) == _entropy_encode_ref(comps), trial
