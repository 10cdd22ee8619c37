"""End-to-end decode tests vs reference iamfplayer goldens (PCM paths).

These are the SURVEY.md §4 conformance harness: synthesize streams with our
muxer, decode with both the reference (SAMSUNG_TV=OFF build) and our
decoder, compare bit-exactly.
"""

import os
import subprocess

import numpy as np
import pytest

from iamf_tpu.api import IAMFDecoder
from iamf_tpu.utils.wav import read_wav

import vectors

REF_STD = "/tmp/refplayer_std/iamfplayer"


def ours_decode(stream: bytes, sound_system=0, binaural=False, **kw):
    dec = IAMFDecoder()
    if binaural:
        dec.set_binaural()
    else:
        dec.set_sound_system(sound_system)
    for k, v in kw.items():
        getattr(dec, f"set_{k}")(v)
    pos = dec.configure(stream)
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
    if not chunks:
        return np.zeros((0, dec.layout.channels), dtype=np.int32)
    return np.concatenate(chunks, axis=0)


def ref_decode(stream: bytes, tmp_path, sound_system="0", extra=()):
    if not os.path.exists(REF_STD):
        pytest.skip("reference (std) player not built")
    wav = vectors.decode_with_reference(
        REF_STD, stream, str(tmp_path), sound_system=sound_system,
        extra_args=tuple(extra),
    )
    pcm, rate, bits = read_wav(wav)
    return pcm


def assert_bitexact(ours, ref):
    n = min(len(ours), len(ref))
    assert n > 0
    assert len(ours) == len(ref), f"length {len(ours)} vs ref {len(ref)}"
    diff = np.abs(ours[:n].astype(np.int64) - ref[:n].astype(np.int64))
    bad = int((diff > 0).sum())
    assert bad == 0, f"{bad}/{diff.size} samples differ, max {diff.max()}"


def test_pcm_stereo_ss0_bitexact(tmp_path):
    stream, _ = vectors.build_pcm_stereo_stream(n_frames=8)
    ref = ref_decode(stream, tmp_path)
    ours = ours_decode(stream, 0)
    assert_bitexact(ours, ref)


def test_pcm_stereo_24bit(tmp_path):
    stream, _ = vectors.build_pcm_stereo_stream(n_frames=6, sample_size=24)
    ref = ref_decode(stream, tmp_path)
    ours = ours_decode(stream, 0)
    assert_bitexact(ours, ref)


def test_pcm_stereo_mix_gain(tmp_path):
    # -6 dB element mix gain applied via default
    stream, _ = vectors.build_pcm_stereo_stream(n_frames=6, mix_gain_q78=-6 * 256)
    ref = ref_decode(stream, tmp_path)
    ours = ours_decode(stream, 0)
    assert_bitexact(ours, ref)


def test_pcm_stereo_to_51_upmix(tmp_path):
    # stereo content rendered to sound system B (M2M matrix path)
    stream, _ = vectors.build_pcm_stereo_stream(n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    assert_bitexact(ours, ref)


def test_pcm_51_stream_to_stereo_downmix(tmp_path):
    # 5.1 content downmixed to sound system A (DMRenderer path)
    stream, _ = vectors.build_pcm_51_stream(n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="0")
    ours = ours_decode(stream, 0)
    assert_bitexact(ours, ref)


def test_pcm_51_to_ss_b_identity(tmp_path):
    stream, _ = vectors.build_pcm_51_stream(n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    assert_bitexact(ours, ref)


def test_pcm_51_loud_content_limiter(tmp_path):
    # content above -1 dBTP engages the limiter envelope
    stream, _ = vectors.build_pcm_51_stream(n_frames=6, amp=0.99)
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    n = min(len(ours), len(ref))
    assert len(ours) == len(ref)
    diff = np.abs(ours[:n].astype(np.int64) - ref[:n].astype(np.int64))
    # limiter float path: allow tiny rounding skew but demand near-exactness
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_pcm_mono_to_stereo(tmp_path):
    stream, _ = vectors.build_pcm_mono_stream(n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="0")
    ours = ours_decode(stream, 0)
    assert_bitexact(ours, ref)
