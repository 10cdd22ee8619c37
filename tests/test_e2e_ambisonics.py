"""Scene-based (ambisonics) end-to-end tests vs reference goldens: H2M
decode matrices, mono remap, projection demix, plus loudness normalization."""

import numpy as np
import pytest

import vectors
from test_e2e_pcm import assert_bitexact, ours_decode, ref_decode
from test_e2e_scalable import assert_close


def test_foa_to_51(tmp_path):
    stream, _ = vectors.build_ambisonics_pcm_stream(order=1, n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    assert_close(ours, ref, max_lsb=1, frac=0)


def test_foa_to_stereo(tmp_path):
    stream, _ = vectors.build_ambisonics_pcm_stream(order=1, n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="0")
    ours = ours_decode(stream, 0)
    assert_close(ours, ref, max_lsb=1, frac=0)


def test_toa_to_714(tmp_path):
    stream, _ = vectors.build_ambisonics_pcm_stream(order=3, n_frames=5)
    ref = ref_decode(stream, tmp_path, sound_system="9")
    ours = ours_decode(stream, 9)
    assert_close(ours, ref, max_lsb=1, frac=0)


def test_soa_projection_to_51(tmp_path):
    stream, _ = vectors.build_ambisonics_pcm_stream(
        order=2, n_frames=5, projection=True
    )
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    assert_close(ours, ref, max_lsb=1, frac=0)


def test_loudness_normalization(tmp_path):
    """-l flag: gain db2lin(norm - selected_loudness) applied pre-limiter."""
    stream, _ = vectors.build_pcm_51_stream(n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="1", extra=("-l", "-16"))
    ours = ours_decode(stream, 1, normalization_loudness=-16.0)
    assert_close(ours, ref, max_lsb=1, frac=0)


def test_disable_limiter(tmp_path):
    stream, _ = vectors.build_pcm_51_stream(n_frames=6, amp=0.99)
    ref = ref_decode(
        stream, tmp_path, sound_system="1", extra=("-disable_limiter",)
    )
    ours = ours_decode(stream, 1, peak_limiter_enable=False)
    assert_bitexact(ours, ref)
