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


def test_opus_silk_stereo_vs_reference(tmp_path):
    """SILK-mode Opus IAMF stream vs the reference player. Our SILK decode
    is bit-exact vs libopus, so the whole pipeline should agree to the PCM
    pipeline's exactness."""
    stream, _ = vectors.build_opus_layout_stream(
        ChannelLayout.STEREO, n_frames=12, bitrate=32000, mode="silk")
    ref = ref_decode(stream, tmp_path, sound_system="0")
    ours = ours_decode(stream, 0)
    n = min(len(ref), len(ours))
    assert n > 0
    diff = np.abs(ref[:n].astype(np.int64) - ours[:n].astype(np.int64))
    assert diff.max() <= 1, f"max {diff.max()}"


def test_opus_hybrid_stereo_vs_reference(tmp_path):
    stream, _ = vectors.build_opus_layout_stream(
        ChannelLayout.STEREO, n_frames=12, bitrate=48000, mode="hybrid")
    ref = ref_decode(stream, tmp_path, sound_system="0")
    ours = ours_decode(stream, 0)
    s = snr_db(ref, ours)
    assert s > 60, f"SNR {s:.1f} dB"


def test_opus_silk_batched_fallback():
    """The batched pipeline detects non-CELT TOCs and falls back to the
    host decoder; output matches the frame-serial api path."""
    from iamf_tpu.core.batch_decoder import BatchedStreamDecoder

    stream, _ = vectors.build_opus_layout_stream(
        ChannelLayout.STEREO, n_frames=9, bitrate=32000, mode="silk")
    serial = ours_decode(stream, 0)
    dec = BatchedStreamDecoder(stream, sound_system=0, batch_frames=4)
    assert all(not e.opus for e in dec.elems)
    out = dec.decode_all()
    n = min(len(serial), len(out))
    diff = np.abs(serial[:n].astype(np.int64) - out[:n].astype(np.int64))
    assert diff.max() <= 1, f"max {diff.max()}"


@pytest.mark.parametrize("bitrate", [32000, 320000])
def test_opus_bitrate_extremes(tmp_path, bitrate):
    """Bitrate sweep (round 5): low rates exercise the fold/noise-fill
    band paths heavily, high rates the deep partition splits and
    high-K PVQ leaves. Both must hold the e2e SNR bar vs the reference
    player (measured 84.8 dB across 32-320 kbps)."""
    stream, _ = vectors.build_opus_layout_stream(
        ChannelLayout.L510, n_frames=10, bitrate=bitrate)
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    assert len(ours) == len(ref)
    s = snr_db(ref, ours)
    assert s > 60, f"SNR {s:.1f} dB at {bitrate} bps"
