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


class TestPhashNearPairs:
    """Multi-index Hamming search (multimodal/phash.py): the pigeonhole
    recall guarantee at radius 3, exact distances, and band-miss
    exclusion — on crafted rasters whose aHash bits are controlled
    cell-by-cell."""

    @staticmethod
    def _raster(bits):
        """8×8 image whose aHash IS `bits` (g*64 > total iff bit set):
        255-gray cells for 1-bits, 0 for 0-bits; any mix with at least
        one 1 and one 0 thresholds exactly."""
        import numpy as np

        px = np.zeros((8, 8, 3), dtype=np.uint8)
        for y in range(8):
            for x in range(8):
                if bits[y * 8 + x]:
                    px[y, x] = 255
        return px

    @staticmethod
    def _ahash_bits(bits):
        """The 16-hex aHash string the raster above must produce."""
        row_bytes = []
        for y in range(8):
            b = sum(1 << x for x in range(8) if bits[y * 8 + x])
            row_bytes.append(b)
        return "".join(f"{b:02x}" for b in row_bytes)

    def _pairs_for(self, spark, rasters):
        import pandas as pd
        from pyspark.sql import types as T

        from cdc_stream_batch_etl_spark.multimodal.binaryops import bmp_encode
        from cdc_stream_batch_etl_spark.multimodal.phash import (
            image_ahash,
            phash_near_pairs,
        )

        pdf = pd.DataFrame(
            {
                "doc_id": list(range(1, len(rasters) + 1)),
                "payload": [bmp_encode(r) for r in rasters],
            }
        )
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        )
        df = spark.createDataFrame(pdf, schema)
        return {
            (r.doc_a, r.doc_b): r.hamming
            for r in phash_near_pairs(image_ahash(df)).collect()
        }

    def test_planted_distances(self, spark):
        base = [1 if (y + x) % 2 == 0 else 0 for y in range(8) for x in range(8)]
        d1 = list(base)
        d1[3] ^= 1  # one bit -> hamming 1
        d4_all_bands = list(base)
        for y in (0, 2, 4, 6):  # one bit in each 2-row band
            d4_all_bands[y * 8 + 5] ^= 1
        pairs = self._pairs_for(
            spark, [self._raster(b) for b in (base, d1, d4_all_bands)]
        )
        assert pairs.get((1, 2)) == 1
        # d=4 touches every band AND exceeds the radius — absent twice over
        assert (1, 3) not in pairs
        assert (2, 3) not in pairs

    def test_pigeonhole_recall_vs_brute_force(self, spark):
        """Every pair within radius 3 of a 40-image random corpus must
        be returned with its exact distance, and nothing farther."""
        import random

        rng = random.Random(71)
        bit_lists = []
        base = [rng.randint(0, 1) for _ in range(64)]
        bit_lists.append(base)
        for _ in range(39):
            b = list(rng.choice(bit_lists))  # mutate an existing image
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(64)] ^= 1
            bit_lists.append(b)
        want = {}
        for i in range(len(bit_lists)):
            for j in range(i + 1, len(bit_lists)):
                d = sum(a != b for a, b in zip(bit_lists[i], bit_lists[j]))
                if d <= 3:
                    want[(i + 1, j + 1)] = d
        got = self._pairs_for(spark, [self._raster(b) for b in bit_lists])
        assert got == want

    def test_ahash_matches_bit_construction(self, spark):
        """The raster construction really controls the hash bit-exactly
        (guards the two tests above against a decode/threshold drift)."""
        import pandas as pd
        from pyspark.sql import types as T

        from cdc_stream_batch_etl_spark.multimodal.binaryops import bmp_encode
        from cdc_stream_batch_etl_spark.multimodal.phash import image_ahash

        bits = [1 if x < 4 else 0 for y in range(8) for x in range(8)]
        pdf = pd.DataFrame({"doc_id": [1], "payload": [bmp_encode(self._raster(bits))]})
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        )
        [row] = image_ahash(spark.createDataFrame(pdf, schema)).collect()
        assert row.phash == self._ahash_bits(bits)
