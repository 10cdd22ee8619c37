"""End-to-end CELT decode: our from-scratch decoder vs libopus on real
packets produced by the libopus encoder (forced CELT mode)."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from test_opus_entdec import ORACLE, _build
from test_opus_celt_stages import SRC, _build_shim, SHIM

OPUS_SET_FORCE_MODE_REQUEST = 11002
MODE_CELT_ONLY = 1002
OPUS_SET_BITRATE_REQUEST = 4002
OPUS_SET_COMPLEXITY_REQUEST = 4010
OPUS_SET_VBR_REQUEST = 4006


@pytest.fixture(scope="module")
def env():
    _build_shim()
    ours = ctypes.CDLL(SHIM)
    ours.iamf_opus_decoder_create.restype = ctypes.c_void_p
    ours.iamf_opus_decoder_create.argtypes = [ctypes.c_int]
    ours.iamf_opus_decode_float.restype = ctypes.c_int
    ours.iamf_opus_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    ref = ctypes.CDLL(ORACLE)
    ref.opus_encoder_create.restype = ctypes.c_void_p
    ref.opus_decoder_create.restype = ctypes.c_void_p
    ref.opus_encode_float.restype = ctypes.c_int
    ref.opus_decode_float.restype = ctypes.c_int
    return ours, ref


def encode_packets(ref, pcm, channels, frame=960, bitrate=96000,
                   force_celt=True, cbr=False):
    err = ctypes.c_int(0)
    enc = ref.opus_encoder_create(48000, channels, 2049,  # OPUS_APPLICATION_AUDIO
                                  ctypes.byref(err))
    assert enc and err.value == 0
    ref.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_BITRATE_REQUEST,
                         ctypes.c_int(bitrate))
    if force_celt:
        ref.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_FORCE_MODE_REQUEST,
                             ctypes.c_int(MODE_CELT_ONLY))
    if cbr:
        ref.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_VBR_REQUEST,
                             ctypes.c_int(0))
    packets = []
    n = len(pcm) // frame
    out = ctypes.create_string_buffer(4000)
    for i in range(n):
        chunk = np.ascontiguousarray(
            pcm[i * frame : (i + 1) * frame], dtype=np.float32
        )
        r = ref.opus_encode_float(
            ctypes.c_void_p(enc),
            chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame, out, 4000,
        )
        assert r > 0, r
        packets.append(bytes(out.raw[:r]))
    ref.opus_encoder_destroy(ctypes.c_void_p(enc))
    return packets


def decode_ref(ref, packets, channels, frame=960):
    """Reference decode via the s16 path — matching the reference IAMF
    wrapper convention (opus s16 decode then /32768,
    IAMF_opus_decoder.c:130-136)."""
    err = ctypes.c_int(0)
    dec = ref.opus_decoder_create(48000, channels, ctypes.byref(err))
    ref.opus_decode.restype = ctypes.c_int
    outs = []
    buf = np.zeros(frame * 2 * channels, dtype=np.int16)
    for pkt in packets:
        r = ref.opus_decode(
            ctypes.c_void_p(dec), pkt, len(pkt),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), frame * 2, 0,
        )
        assert r > 0
        outs.append(
            buf[: r * channels].reshape(r, channels).astype(np.float32)
            / 32768.0
        )
    ref.opus_decoder_destroy(ctypes.c_void_p(dec))
    return np.concatenate(outs)


def decode_ours(ours, packets, channels, frame=960):
    d = ours.iamf_opus_decoder_create(channels)
    outs = []
    buf = np.zeros(frame * 2 * channels, dtype=np.float32)
    for pkt in packets:
        r = ours.iamf_opus_decode_float(
            d, pkt, len(pkt),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frame * 2,
        )
        assert r > 0, f"decode failed: {r}"
        outs.append(buf[: r * channels].reshape(r, channels).copy())
    ours.iamf_opus_decoder_destroy(ctypes.c_void_p(d))
    return np.concatenate(outs)


def snr_db(ref, ours):
    n = min(len(ref), len(ours))
    e = ref[:n] - ours[:n]
    p_sig = (ref[:n] ** 2).mean()
    p_err = (e**2).mean() + 1e-30
    return 10 * np.log10(p_sig / p_err)


def _tone(n, channels, seed=5):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 48000.0
    x = np.zeros((n, channels), dtype=np.float32)
    for c in range(channels):
        for f in (220 * (c + 1), 687, 1733.3, 4801):
            x[:, c] += 0.2 * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
    return (x * 0.5).astype(np.float32)


@pytest.mark.parametrize("channels", [1, 2])
def test_celt_decode_tones(env, channels):
    ours, ref = env
    pcm = _tone(960 * 20, channels)
    packets = encode_packets(ref, pcm, channels)
    a = decode_ref(ref, packets, channels)
    b = decode_ours(ours, packets, channels)
    s = snr_db(a, b)
    assert s > 60, f"SNR {s:.1f} dB"


@pytest.mark.parametrize("channels", [1, 2])
def test_celt_decode_noise_transients(env, channels):
    ours, ref = env
    rng = np.random.RandomState(9)
    pcm = (rng.randn(960 * 20, channels) * 0.1).astype(np.float32)
    # bursts to force transients/short blocks
    for k in range(4):
        pcm[k * 4800 + 100 : k * 4800 + 200] *= 8
    packets = encode_packets(ref, pcm, channels, bitrate=128000)
    a = decode_ref(ref, packets, channels)
    b = decode_ours(ours, packets, channels)
    s = snr_db(a, b)
    assert s > 60, f"SNR {s:.1f} dB"


def test_celt_decode_low_bitrate(env):
    ours, ref = env
    pcm = _tone(960 * 15, 2)
    packets = encode_packets(ref, pcm, 2, bitrate=24000)
    a = decode_ref(ref, packets, 2)
    b = decode_ours(ours, packets, 2)
    s = snr_db(a, b)
    assert s > 60, f"SNR {s:.1f} dB"
