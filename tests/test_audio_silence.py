"""Vectorized silence-run detection vs a pure-Python scan, planted
edge cases, and driver-data invariants for audio_silence_segments."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_stream_batch_etl_spark.multimodal.audioops import (
    SILENCE_THRESH,
    audio_silence_segments,
    silence_profile,
)


def _reference(samples, thresh):
    n_silent = n_seg = longest = run = 0
    for v in samples:
        if abs(int(v)) < thresh:
            n_silent += 1
            run += 1
            if run == 1:
                n_seg += 1
            longest = max(longest, run)
        else:
            run = 0
    return n_silent, n_seg, longest


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_silence_profile_matches_scan(vals):
    arr = np.array(vals, dtype=np.int16)
    assert silence_profile(arr) == _reference(arr, SILENCE_THRESH)


def test_planted_edges():
    z = np.zeros(10, dtype=np.int16)
    assert silence_profile(z) == (10, 1, 10)  # all silent: one run
    loud = np.full(10, 32000, dtype=np.int16)
    assert silence_profile(loud) == (0, 0, 0)
    mixed = np.array([0, 0, 32000, 0, 32000, 0, 0, 0], dtype=np.int16)
    assert silence_profile(mixed) == (6, 3, 3)


def test_driver_data_invariants(spark, sf_dir):
    for r in audio_silence_segments(spark, sf_dir).collect():
        assert 0 <= r.n_silent <= r.n_samples
        assert r.n_segments <= r.n_silent  # each segment has >= 1 sample
        assert r.longest_silence <= r.n_silent
        assert (r.n_segments == 0) == (r.n_silent == 0)
        assert r.silent_share == r.n_silent / r.n_samples
