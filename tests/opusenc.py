"""Test-vector helper: encode PCM to Opus packets with the prebuilt libopus
encoder (BSD, from the reference's dep_codecs), forced to CELT mode so the
framework's from-scratch CELT decoder covers the content."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SHIM = "/tmp/iamf_tpu_opusref/libopusref.so"

OPUS_APPLICATION_AUDIO = 2049
OPUS_SET_BITRATE = 4002
OPUS_SET_VBR = 4006
OPUS_SET_FORCE_MODE = 11002
MODE_CELT_ONLY = 1002
OPUS_GET_LOOKAHEAD = 4027


def _lib():
    if not os.path.exists(_SHIM):
        os.makedirs(os.path.dirname(_SHIM), exist_ok=True)
        subprocess.run(
            ["g++", "-shared", "-o", _SHIM, "-Wl,--whole-archive",
             "/root/reference/dep_codecs/lib/libopus.a",
             "-Wl,--no-whole-archive", "-lm"],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(_SHIM)
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_encode_float.restype = ctypes.c_int
    return lib


MODE_SILK_ONLY = 1000
MODE_HYBRID = 1001
OPUS_SET_MAX_BANDWIDTH = 4004
OPUS_BANDWIDTH_WIDEBAND = 1103


def encode_opus_stream(
    pcm: np.ndarray,  # [n, ch] float32 in [-1, 1]
    frame_size: int = 960,
    bitrate: int = 96000,
    force_celt: bool = True,
    mode: str = None,  # "celt" | "silk" | "hybrid" (overrides force_celt)
) -> tuple[list[bytes], int]:
    """Encode -> (packets, pre_skip)."""
    lib = _lib()
    n, ch = pcm.shape
    err = ctypes.c_int(0)
    enc = lib.opus_encoder_create(48000, ch, OPUS_APPLICATION_AUDIO,
                                  ctypes.byref(err))
    assert enc and err.value == 0
    lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_BITRATE,
                         ctypes.c_int(bitrate))
    if mode is None:
        mode = "celt" if force_celt else None
    if mode == "celt":
        lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_FORCE_MODE,
                             ctypes.c_int(MODE_CELT_ONLY))
    elif mode == "silk":
        lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_FORCE_MODE,
                             ctypes.c_int(MODE_SILK_ONLY))
        lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_MAX_BANDWIDTH,
                             ctypes.c_int(OPUS_BANDWIDTH_WIDEBAND))
    elif mode == "hybrid":
        lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_SET_FORCE_MODE,
                             ctypes.c_int(MODE_HYBRID))
    look = ctypes.c_int(0)
    lib.opus_encoder_ctl(ctypes.c_void_p(enc), OPUS_GET_LOOKAHEAD,
                         ctypes.byref(look))
    packets = []
    out = ctypes.create_string_buffer(4000)
    nf = n // frame_size
    for i in range(nf):
        chunk = np.ascontiguousarray(
            pcm[i * frame_size : (i + 1) * frame_size], dtype=np.float32
        )
        r = lib.opus_encode_float(
            ctypes.c_void_p(enc),
            chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame_size, out, 4000,
        )
        assert r > 0
        packets.append(bytes(out.raw[:r]))
    lib.opus_encoder_destroy(ctypes.c_void_p(enc))
    return packets, look.value


def opus_decoder_conf(channels: int = 2, pre_skip: int = 312,
                      rate: int = 48000) -> bytes:
    """IAMF opus decoder_conf (big-endian fields)."""
    import struct

    return struct.pack(">BBHIhB", 1, channels, pre_skip, rate, 0, 0)
