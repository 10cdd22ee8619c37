"""Opus multistream decoder for IAMF substreams.

Each IAMF substream is an independent Opus stream (coupled => stereo
packets, else mono), mirroring the reference OpusMS2Decoder layout
(opus/opus_multistream2_decoder.c:77-165): coupled streams first, each
contributing 2 planar channels, then mono streams. Output convention
matches the reference wrapper: decode to s16 (with soft clip) then /32768
(IAMF_opus_decoder.c:130-136).

The frame decode itself is the framework's from-scratch native CELT
implementation (native/src/opus/, RFC 6716 §4.3) validated >60 dB SNR
against libopus packet-for-packet; SILK/hybrid modes are pending.

IAMF opus decoder_conf (big-endian, IAMF spec §"Opus Specific"):
  version(u8) channels(u8) pre_skip(u16) input_sample_rate(u32)
  output_gain(s16) mapping_family(u8)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from ...constants import Codec
from ..base import CodecDecoder, register

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "lib", "libiamf_native.so")

_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise NotImplementedError(f"native opus lib unavailable: {e}")
    _lib = ctypes.CDLL(_LIB_PATH)
    _lib.iamf_opus_decoder_create.restype = ctypes.c_void_p
    _lib.iamf_opus_decoder_create.argtypes = [ctypes.c_int]
    _lib.iamf_opus_decoder_destroy.argtypes = [ctypes.c_void_p]
    _lib.iamf_opus_decode_float.restype = ctypes.c_int
    _lib.iamf_opus_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    return _lib


@register(Codec.OPUS)
class OpusDecoder(CodecDecoder):
    def __init__(self, decoder_conf, streams, coupled_streams, frame_size):
        super().__init__(decoder_conf, streams, coupled_streams, frame_size)
        self.version = decoder_conf[0]
        self.pre_skip = int.from_bytes(decoder_conf[2:4], "big")
        self.sample_rate = int.from_bytes(decoder_conf[4:8], "big") or 48000
        lib = _load_native()
        self._decoders = []
        for i in range(streams):
            ch = 2 if i < coupled_streams else 1
            self._decoders.append((lib.iamf_opus_decoder_create(ch), ch))
        self.delay = 0  # reference reports no codec delay for opus
        self._max = frame_size * 6

    def __del__(self):
        try:
            lib = _load_native()
            for ptr, _ in getattr(self, "_decoders", []):
                lib.iamf_opus_decoder_destroy(ptr)
        except Exception:
            pass

    def decode(self, packets: Sequence[Optional[bytes]]) -> np.ndarray:
        lib = _load_native()
        outs = []
        samples = None
        for i, (ptr, ch) in enumerate(self._decoders):
            pkt = packets[i]
            if pkt is None:
                raise ValueError("missing opus sub packet")
            buf = np.zeros(self._max * ch, dtype=np.float32)
            r = lib.iamf_opus_decode_float(
                ptr, bytes(pkt), len(pkt),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self._max,
            )
            if r < 0:
                raise ValueError(f"opus decode failed ({r})")
            outs.append(buf[: r * ch].reshape(r, ch).T)  # planar
            samples = r
        return np.concatenate(outs, axis=0).astype(np.float32)
