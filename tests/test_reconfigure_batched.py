"""Batched-path mid-stream reconfigure.

A NON-redundant Sequence Header mid-stream flips the reference decoder to
RECONFIGURE and the player re-calls configure with the remaining bytes
(IAMF_decoder.c:2918-2921, iamfplayer.c:623-626); non-redundant descriptor
re-ingest rebuilds the streams and re-inits the limiter (configure :3810)
without flushing its delay line. BatchedStreamDecoder segments its timeline
at such headers and chains follow-on decoders (batch_decoder.py).

Oracle: the serial api.IAMFDecoder driven exactly like tools/player.py's
reconfigure loop — itself pinned bit-exact against the reference player
elsewhere. The batched output must match it bit-exactly, layout change and
codec change alike, with and without the limiter.
"""

import numpy as np
import pytest

import vectors
from iamf_tpu.api import IAMFDecoder, InvalidState
from iamf_tpu.constants import ChannelLayout
from iamf_tpu.core.batch_decoder import BatchedStreamDecoder


def serial_decode(stream: bytes, sound_system: int, limiter: bool
                  ) -> np.ndarray:
    """tools/player.py bitstream loop: reconfigure on InvalidState."""
    dec = IAMFDecoder()
    dec.set_sound_system(sound_system)
    dec.set_peak_limiter_enable(limiter)
    pos = dec.configure(stream)
    chunks = []
    while pos < len(stream):
        try:
            consumed, pcm = dec.decode(stream[pos:])
        except InvalidState:
            pos += dec.configure(stream[pos:])
            continue
        if consumed == 0 and pcm is None:
            break
        pos += consumed
        if pcm is not None and len(pcm):
            chunks.append(pcm)
    _, pcm = dec.decode(None)
    if pcm is not None and len(pcm):
        chunks.append(pcm)
    return np.concatenate(chunks, axis=0)


def _diff(a: np.ndarray, b: np.ndarray) -> int:
    assert a.shape == b.shape, (a.shape, b.shape)
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())


@pytest.mark.parametrize("limiter", [False, True])
def test_batched_reconfigure_layout_change(limiter):
    """Segment A: stereo PCM; segment B: 5.1 PCM (new codec config +
    element + mix presentation, non-redundant). Bit-exact vs serial."""
    a, _ = vectors.build_pcm_layout_stream(
        ChannelLayout.STEREO, n_frames=6, amp=0.6)
    b, _ = vectors.build_pcm_51_stream(n_frames=6, amp=0.8)
    stream = a + b
    ref = serial_decode(stream, 1, limiter)
    got = BatchedStreamDecoder(stream, sound_system=1, batch_frames=4,
                               limiter=limiter).decode_all()
    assert _diff(ref, got) == 0


@pytest.mark.parametrize("limiter", [False, True])
def test_batched_reconfigure_codec_change(limiter):
    """Segment A: Opus 5.1; segment B: PCM 5.1 — the codec config changes
    mid-stream. Both paths rebuild streams at the boundary (fresh codec
    state), so outputs must stay bit-exact."""
    try:
        a, _ = vectors.build_opus_layout_stream(
            ChannelLayout.L510, n_frames=6, amp=0.4)
    except Exception as e:  # pragma: no cover - oracle encoder missing
        pytest.skip(f"opus encoder unavailable: {e}")
    b, _ = vectors.build_pcm_51_stream(n_frames=6, amp=0.8)
    stream = a + b
    ref = serial_decode(stream, 1, limiter)
    got = BatchedStreamDecoder(stream, sound_system=1, batch_frames=4,
                               limiter=limiter).decode_all()
    # opus segment: batched-vs-serial bar is <=1 LSB (device de-emphasis
    # block accumulation order, tpu_synth.py docstring); the pcm segment
    # after the boundary must stay bit-exact
    assert _diff(ref, got) <= 1
    n_a = ref.shape[0] - 6 * 960
    assert _diff(ref[n_a:], got[n_a:]) == 0


def test_batched_reconfigure_three_segments():
    """Two reconfigure points (recursive chaining)."""
    a, _ = vectors.build_pcm_layout_stream(
        ChannelLayout.STEREO, n_frames=4, amp=0.5)
    b, _ = vectors.build_pcm_51_stream(n_frames=4, amp=0.7)
    c, _ = vectors.build_pcm_layout_stream(
        ChannelLayout.STEREO, n_frames=4, amp=0.9)
    stream = a + b + c
    ref = serial_decode(stream, 1, True)
    dec = BatchedStreamDecoder(stream, sound_system=1, batch_frames=4)
    got = dec.decode_all()
    assert _diff(ref, got) == 0
    assert len(dec.stats.get("segments", [])) == 1  # child holds its own


def test_redundant_seq_header_does_not_segment():
    """A REDUNDANT mid-stream Sequence Header is skipped, not a
    reconfigure (parse_OBUs :2918 checks !obu.redundant)."""
    a, _ = vectors.build_pcm_51_stream(n_frames=6, amp=0.8)
    # craft a redundant copy of the leading sequence header OBU
    from iamf_tpu.obu import parser
    obu = parser.split_obu(a, 0)
    assert obu.type == 31
    hdr = bytearray(a[:obu.size])
    hdr[0] |= 0x04  # redundant bit (IAMF_OBU.c:102 bit layout)
    # insert after the 3rd temporal unit's bytes: find 4th audio frame
    recs = parser.split_records(a)
    frames = np.flatnonzero(recs[:, 7] >= 0)
    cut = int(recs[frames[3], 2])
    stream = a[:cut] + bytes(hdr) + a[cut:]
    dec = BatchedStreamDecoder(stream, sound_system=1, batch_frames=4)
    assert dec._next_data is None
    ref = BatchedStreamDecoder(a, sound_system=1, batch_frames=4).decode_all()
    got = dec.decode_all()
    assert _diff(ref, got) == 0
