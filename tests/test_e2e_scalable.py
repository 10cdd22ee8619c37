"""Multi-layer scalable channel audio end-to-end tests (SURVEY §7 stage 3):
demix chains, per-frame demix-mode parameter blocks (w-index walk), recon
gain RMS smoothing — all compared against reference goldens."""

import numpy as np
import pytest

import vectors
from test_e2e_pcm import assert_bitexact, ours_decode, ref_decode


def assert_close(ours, ref, max_lsb=1, frac=1e-4):
    n = min(len(ours), len(ref))
    assert len(ours) == len(ref), f"{len(ours)} vs {len(ref)}"
    diff = np.abs(ours[:n].astype(np.int64) - ref[:n].astype(np.int64))
    bad = int((diff > max_lsb).sum())
    assert bad <= frac * diff.size, (
        f"{bad}/{diff.size} samples differ by >{max_lsb}, max {diff.max()}"
    )


def test_scalable_layer_select_stereo(tmp_path):
    """Target SS A: layer selection should pick the stereo layer (layer 0)
    and ignore the 5.1 substreams entirely -> bit-exact."""
    stream, src = vectors.build_scalable_pcm_stream(n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="0")
    ours = ours_decode(stream, 0)
    assert_bitexact(ours, ref)


def test_scalable_demix_to_51_default_mode(tmp_path):
    """Target SS B: decode both layers, demix SL5/SR5 via S3->5 chain with
    the default demix mode."""
    stream, _ = vectors.build_scalable_pcm_stream(n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    assert_close(ours, ref, max_lsb=1, frac=0)


def test_scalable_demix_mode_walk(tmp_path):
    """Per-frame demixing parameter blocks drive the mode + w-index walk."""
    stream, _ = vectors.build_scalable_pcm_stream(
        n_frames=10, demix_modes=[1, 1, 2, 4, 4, 5, 6, 0, 2, 1]
    )
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    assert_close(ours, ref, max_lsb=1, frac=0)


def test_scalable_recon_gain_smoothing(tmp_path):
    """Recon gain blocks engage the RMS EMA + hanning window smoothing."""
    stream, _ = vectors.build_scalable_pcm_stream(
        n_frames=10,
        demix_modes=[1, 2, 4, 1, 5, 1, 6, 1, 0, 2],
        recon_gains=[(230, 240), (200, 210), (255, 255), (180, 190)],
    )
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    assert_close(ours, ref, max_lsb=1, frac=0)


def test_scalable_layer_output_gain(tmp_path):
    """Layer with output_gain_is_present_flag: flagged channels are gained
    UP by the demixer (output-gain-up, demixer.c:421-430) — vs reference."""
    from test_e2e_pcm import ours_decode, ref_decode

    stream, _ = vectors.build_scalable_pcm_stream(
        n_frames=4, layer2_output_gain=(0b110000, -768))
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    assert ours.shape == ref.shape
    assert_close(ours, ref, max_lsb=1, frac=0)
