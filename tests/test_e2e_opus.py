"""Opus end-to-end tests vs reference iamfplayer goldens (BASELINE config 1:
stereo simple-profile Opus -> sound system A)."""

import numpy as np
import pytest

import vectors
from test_e2e_pcm import ours_decode, ref_decode
from iamf_tpu.constants import ChannelLayout


def snr_db(ref, ours):
    n = min(len(ref), len(ours))
    assert n > 0
    e = ref[:n].astype(np.float64) - ours[:n].astype(np.float64)
    p = (ref[:n].astype(np.float64) ** 2).mean()
    return 10 * np.log10(p / ((e**2).mean() + 1e-12))


def test_opus_stereo_ss0(tmp_path):
    """Config 1: stereo Opus .iamf -> sound system A."""
    stream, _ = vectors.build_opus_layout_stream(ChannelLayout.STEREO, n_frames=12)
    ref = ref_decode(stream, tmp_path, sound_system="0")
    ours = ours_decode(stream, 0)
    assert len(ours) == len(ref), (len(ours), len(ref))
    s = snr_db(ref, ours)
    assert s > 60, f"SNR vs reference {s:.1f} dB"


def test_opus_stereo_upmix_51(tmp_path):
    stream, _ = vectors.build_opus_layout_stream(ChannelLayout.STEREO, n_frames=10)
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    assert len(ours) == len(ref)
    s = snr_db(ref, ours)
    assert s > 60, f"SNR {s:.1f} dB"


def test_opus_51_downmix(tmp_path):
    stream, _ = vectors.build_opus_layout_stream(ChannelLayout.L510, n_frames=10)
    ref = ref_decode(stream, tmp_path, sound_system="0")
    ours = ours_decode(stream, 0)
    assert len(ours) == len(ref)
    s = snr_db(ref, ours)
    assert s > 60, f"SNR {s:.1f} dB"


def test_opus_714(tmp_path):
    stream, _ = vectors.build_opus_layout_stream(ChannelLayout.L714, n_frames=8)
    ref = ref_decode(stream, tmp_path, sound_system="9")
    ours = ours_decode(stream, 9)
    assert len(ours) == len(ref)
    s = snr_db(ref, ours)
    assert s > 60, f"SNR {s:.1f} dB"
