"""Binaural output tests: matrix path vs reference goldens (-sb) and the
HRTF convolution renderer (M2B/H2B, BASELINE config 5)."""

import numpy as np
import pytest

import vectors
from test_e2e_pcm import assert_bitexact, ours_decode, ref_decode
from test_e2e_scalable import assert_close
from iamf_tpu.constants import ChannelLayout


def ours_decode_hrm(stream, binaural=True, hrm=None):
    """Decode forcing a headphones_rendering_mode on all renderers."""
    from iamf_tpu.api import IAMFDecoder

    dec = IAMFDecoder()
    dec.set_binaural()
    pos = dec.configure(stream)
    if hrm is not None:
        for r in dec.renderers:
            r.headphones_rendering_mode = hrm
    chunks = []
    while pos < len(stream):
        consumed, pcm = dec.decode(stream[pos:])
        if consumed == 0 and pcm is None:
            break
        pos += consumed
        if pcm is not None and len(pcm):
            chunks.append(pcm)
    _, pcm = dec.decode(None)
    if pcm is not None and len(pcm):
        chunks.append(pcm)
    return np.concatenate(chunks, axis=0)


def test_binaural_matrix_path_51(tmp_path):
    """Reference default (-sb, binauralizer compiled out) = M2M matrix."""
    stream, _ = vectors.build_pcm_51_stream(n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="b")
    ours = ours_decode(stream, binaural=True)
    assert_bitexact(ours, ref)


def test_binaural_matrix_path_foa(tmp_path):
    stream, _ = vectors.build_ambisonics_pcm_stream(
        order=1, n_frames=5, target_layouts=(0,)
    )
    ref = ref_decode(stream, tmp_path, sound_system="b")
    ours = ours_decode(stream, binaural=True)
    assert_close(ours, ref, max_lsb=1, frac=0)


def test_hrtf_m2b_renders():
    """HRTF conv binaural (headphones_rendering_mode=1): sane output —
    2 channels, energy present, L/R asymmetric for off-center content."""
    stream, src = vectors.build_pcm_51_stream(n_frames=6, amp=0.4)
    out = ours_decode_hrm(stream, hrm=1)
    assert out.shape[1] == 2
    e = (out.astype(np.float64) ** 2).mean(axis=0)
    assert e[0] > 0 and e[1] > 0
    # content is asymmetric multitone -> ears differ
    assert not np.array_equal(out[:, 0], out[:, 1])


def test_hrtf_h2b_renders():
    stream, _ = vectors.build_ambisonics_pcm_stream(
        order=1, n_frames=5, target_layouts=(0,)
    )
    out = ours_decode_hrm(stream, hrm=1)
    assert out.shape[1] == 2
    assert np.abs(out).max() > 0


def test_hrir_bank_properties():
    from iamf_tpu.dsp.binaural import hrir_bank, spherical_head_hrir

    bank = hrir_bank(ChannelLayout.L510)
    assert bank.shape == (2, 6, 256)
    # left-side source louder in left ear
    h = spherical_head_hrir(90.0, 0.0)
    el = (h[0] ** 2).sum()
    er = (h[1] ** 2).sum()
    assert el > 2 * er
    # ITD: left ear leads for a left-side source
    pl = np.argmax(np.abs(h[0]))
    pr = np.argmax(np.abs(h[1]))
    assert pl < pr
