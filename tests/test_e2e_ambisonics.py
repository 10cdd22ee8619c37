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


def test_hoa_lfe_synthesis_vs_lfe_build(tmp_path):
    """H2M LFE-synthesis branch (h2m_rdr.c:1198-1238, 120 Hz biquad on W
    into the LFE slot) vs a reference player built with
    -DDISABLE_LFE_HOA=0 (/tmp/refplayer_lfe; ordinary builds default the
    branch off, ae_rdr.h:63-65)."""
    import os

    REF_LFE = "/tmp/refplayer_lfe/iamfplayer"
    if not os.path.exists(REF_LFE):
        pytest.skip("DISABLE_LFE_HOA=0 reference player not built")
    stream, _ = vectors.build_ambisonics_pcm_stream(order=1, n_frames=6)
    wav = vectors.decode_with_reference(
        REF_LFE, stream, str(tmp_path), sound_system="1")
    from iamf_tpu.utils.wav import read_wav

    ref, _, _ = read_wav(wav)
    ours = ours_decode(stream, 1, hoa_lfe_synthesis=True)
    assert_close(ours, ref, max_lsb=1, frac=0)
    # the branch must actually fire: LFE channel (5.1 index 3) non-zero
    assert np.abs(np.asarray(ours)[:, 3]).max() > 0


def test_hoa_lfe_synthesis_default_off(tmp_path):
    """Default build parity unchanged: without the flag the LFE slot is
    zero-filled (h2m_rdr.c:1140-1148)."""
    stream, _ = vectors.build_ambisonics_pcm_stream(order=1, n_frames=4)
    ours = ours_decode(stream, 1)
    assert np.abs(np.asarray(ours)[:, 3]).max() == 0
