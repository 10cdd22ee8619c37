"""Test-vector helper: encode PCM to FLAC frames using the prebuilt libFLAC
encoder from the reference's dep_codecs (BSD-licensed, linked via ctypes).

Used ONLY to synthesize test inputs; decode goldens still come from the
reference iamfplayer. Produces (metadata_blocks, [frame_bytes...]) suitable
for IAMF codec-config + audio-frame OBUs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SHIM = "/tmp/iamf_tpu_flacenc/libflacshim.so"
_AR = "/root/reference/dep_codecs/lib/libFLAC.a"

WRITE_CB = ctypes.CFUNCTYPE(
    ctypes.c_int,  # status
    ctypes.c_void_p,  # encoder
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_size_t,
    ctypes.c_uint32,  # samples
    ctypes.c_uint32,  # current_frame
    ctypes.c_void_p,  # client
)


def _build_shim():
    os.makedirs(os.path.dirname(_SHIM), exist_ok=True)
    if os.path.exists(_SHIM):
        return
    subprocess.run(
        [
            "g++", "-shared", "-o", _SHIM,
            "-Wl,--whole-archive", _AR, "-Wl,--no-whole-archive", "-lm",
        ],
        check=True, capture_output=True,
    )


def _lib():
    _build_shim()
    lib = ctypes.CDLL(_SHIM)
    lib.FLAC__stream_encoder_new.restype = ctypes.c_void_p
    lib.FLAC__stream_encoder_init_stream.argtypes = [
        ctypes.c_void_p, WRITE_CB, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    return lib


def encode_flac_stream(
    pcm: np.ndarray,  # [n, ch] int
    bits: int = 16,
    rate: int = 48000,
    block_size: int = 1024,
    compression: int = 5,
) -> tuple[bytes, list[bytes]]:
    """Encode -> (metadata_blocks_without_magic, per-frame packets)."""
    lib = _lib()
    n, ch = pcm.shape

    chunks: list[tuple[bytes, int]] = []  # (bytes, samples)

    @WRITE_CB
    def on_write(enc, buf, nbytes, samples, cur_frame, client):
        chunks.append((bytes(bytearray(buf[:nbytes])), samples))
        return 0  # OK

    enc = lib.FLAC__stream_encoder_new()
    lib.FLAC__stream_encoder_set_channels(
        ctypes.c_void_p(enc), ctypes.c_uint32(ch)
    )
    lib.FLAC__stream_encoder_set_bits_per_sample(
        ctypes.c_void_p(enc), ctypes.c_uint32(bits)
    )
    lib.FLAC__stream_encoder_set_sample_rate(
        ctypes.c_void_p(enc), ctypes.c_uint32(rate)
    )
    lib.FLAC__stream_encoder_set_blocksize(
        ctypes.c_void_p(enc), ctypes.c_uint32(block_size)
    )
    lib.FLAC__stream_encoder_set_compression_level(
        ctypes.c_void_p(enc), ctypes.c_uint32(compression)
    )
    lib.FLAC__stream_encoder_set_streamable_subset(
        ctypes.c_void_p(enc), ctypes.c_int(1)
    )
    ret = lib.FLAC__stream_encoder_init_stream(
        ctypes.c_void_p(enc), on_write, None, None, None, None
    )
    if ret != 0:
        raise RuntimeError(f"FLAC encoder init failed: {ret}")

    # interleaved int32 samples
    inter = pcm.astype(np.int32).reshape(-1)
    buf = inter.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    ok = lib.FLAC__stream_encoder_process_interleaved(
        ctypes.c_void_p(enc), buf, ctypes.c_uint32(n)
    )
    if not ok:
        raise RuntimeError("FLAC encode failed")
    lib.FLAC__stream_encoder_finish(ctypes.c_void_p(enc))
    lib.FLAC__stream_encoder_delete(ctypes.c_void_p(enc))

    # reassemble: magic + metadata chunks have samples == 0; frames have
    # samples > 0. Multiple writes may belong to one frame: group until a
    # samples>0 write closes the frame.
    stream = b"".join(c for c, _ in chunks)
    assert stream[:4] == b"fLaC"

    header = bytearray()
    frames: list[bytes] = []
    cur = bytearray()
    in_frames = False
    for data, samples in chunks:
        if not in_frames and samples == 0:
            header += data
            continue
        in_frames = True
        cur += data
        if samples > 0:
            frames.append(bytes(cur))
            cur = bytearray()
    metadata = bytes(header[4:])  # strip fLaC magic
    return metadata, frames
