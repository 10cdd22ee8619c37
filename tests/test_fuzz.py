"""Robustness: random and truncated/corrupted inputs must raise clean
errors (or decode), never crash or hang — the reference tolerates garbage
by resyncing on OBU boundaries (IAMF_OBU_split)."""

import numpy as np
import pytest

import vectors
from iamf_tpu.constants import ChannelLayout


def _try_decode(stream: bytes):
    from iamf_tpu.api import IAMFDecoder

    dec = IAMFDecoder()
    dec.set_sound_system(0)
    try:
        used = dec.configure(stream)
    except Exception:
        return None
    outs = []
    pos = used
    for _ in range(64):  # bounded: no hangs
        if pos >= len(stream):
            break
        try:
            consumed, pcm = dec.decode(stream[pos:])
        except Exception:
            break
        if consumed <= 0:
            break
        pos += consumed
        if pcm is not None:
            outs.append(pcm)
    return outs


def test_random_bytes():
    rng = np.random.default_rng(0)
    for n in (1, 7, 64, 1024, 9000):
        _try_decode(bytes(rng.integers(0, 256, n, dtype=np.uint8)))


def test_truncated_valid_stream():
    stream, _ = vectors.build_pcm_layout_stream(
        ChannelLayout.STEREO, n_frames=4)
    for cut in (1, 5, len(stream) // 3, len(stream) - 3):
        _try_decode(stream[:cut])


def test_bitflipped_stream():
    stream, _ = vectors.build_pcm_layout_stream(
        ChannelLayout.STEREO, n_frames=4)
    rng = np.random.default_rng(1)
    for _ in range(24):
        b = bytearray(stream)
        for _ in range(3):
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
        _try_decode(bytes(b))


def test_garbage_codec_packets():
    """Valid descriptors, corrupted audio payloads: codecs must error, not
    crash (exercises the native FLAC/Opus/AAC packet guards)."""
    rng = np.random.default_rng(2)
    for build, kw in [
        (vectors.build_opus_layout_stream, {}),
        (vectors.build_flac_layout_stream, {})
        if hasattr(vectors, "build_flac_layout_stream") else (None, None),
    ]:
        if build is None:
            continue
        out = build(ChannelLayout.STEREO, n_frames=4, **kw)
        stream = out[0]
        b = bytearray(stream)
        # corrupt the tail half (audio frames live after the descriptors)
        start = len(b) // 2
        for _ in range(40):
            i = int(rng.integers(start, len(b)))
            b[i] ^= 0xFF
        _try_decode(bytes(b))


def test_vlogger_fuzz_robustness():
    """The conformance vloggers must survive truncated/bit-flipped streams
    (log what parses, never crash) — the -v flag runs on untrusted input."""
    import io
    import random

    from iamf_tpu.tools.vlogger import vlog_stream
    from iamf_tpu.mp4.atoms import vlog_mp4

    stream, _ = vectors.build_scalable_pcm_stream(n_frames=3)
    mp4 = vectors.build_mp4(vectors.build_pcm_stereo_stream(n_frames=2)[0])
    rng = random.Random(99)
    for _ in range(40):
        data = bytearray(stream)
        for _ in range(rng.randint(1, 6)):
            data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
        cut = rng.randrange(len(data))
        for blob in (bytes(data), bytes(data[:cut])):
            try:
                vlog_stream(blob, io.StringIO())
            except (ValueError, IndexError, KeyError, EOFError):
                pass  # graceful parse rejection is fine; crashes are not
    for _ in range(40):
        data = bytearray(mp4)
        for _ in range(rng.randint(1, 6)):
            data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
        cut = rng.randrange(len(data))
        for blob in (bytes(data), bytes(data[:cut])):
            try:
                vlog_mp4(blob, io.StringIO())
            except (ValueError, IndexError, KeyError, EOFError):
                pass
