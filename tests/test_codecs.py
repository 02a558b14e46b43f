"""Property tests for the multimodal binary codecs: encode→decode must
be the identity for arbitrary valid inputs, not just the digest-derived
payloads the registered queries happen to produce."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_stream_batch_etl_spark.multimodal.audioops import wav_decode, wav_encode
from cdc_stream_batch_etl_spark.multimodal.binaryops import bmp_decode, bmp_encode


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**32 - 1),
)
def test_bmp_roundtrip_arbitrary_rasters(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = bmp_encode(px)
    assert payload[:2] == b"BM"
    # stride padding: file size must match header arithmetic exactly
    stride = (w * 3 + 3) & ~3
    assert len(payload) == 54 + h * stride
    assert np.array_equal(bmp_decode(payload), px)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(1, 2000),
    seed=st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_arbitrary_waveforms(n, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    payload = wav_encode(samples)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert len(payload) == 44 + 2 * n
    assert np.array_equal(wav_decode(payload), samples)


def test_wav_empty_waveform():
    assert len(wav_decode(wav_encode(np.array([], dtype=np.int16)))) == 0


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_arbitrary_rasters(h, w, seed):
    from cdc_stream_batch_etl_spark.multimodal.pngops import png_decode, png_encode

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(px)), px)  # lossless


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**32 - 1),
    quality=st.integers(30, 95),
)
def test_jpeg_roundtrip_arbitrary_rasters(h, w, seed, quality):
    """JPEG is lossy, so the property is structural: decode(encode(x))
    preserves shape/dtype for ANY raster and quality — entropy coding,
    byte stuffing, padding, and crop must never corrupt framing — and
    on a CONSTANT raster (pure DC) the round trip is near-exact at any
    quality, which pins the quantizer/IDCT scaling."""
    from cdc_stream_batch_etl_spark.multimodal.jpegops import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(px, quality))
    assert out.shape == px.shape and out.dtype == np.uint8

    flat = np.full((h, w, 3), int(rng.integers(0, 256)), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(flat, quality))
    assert int(np.abs(out.astype(int) - flat.astype(int)).max()) <= 3
