"""MultiStreamServer: S streams in one vmapped device program must produce
bit-identical PCM to each stream's own BatchedStreamDecoder."""

import numpy as np
import pytest

import vectors
from iamf_tpu.constants import ChannelLayout
from iamf_tpu.core.batch_decoder import BatchedStreamDecoder
from iamf_tpu.core.serving import MultiStreamServer


def _per_stream(stream, **kw):
    d = BatchedStreamDecoder(stream, **kw)
    return [np.asarray(b) for b in d.decode_all(fetch=False)]


def test_multistream_pcm_distinct_content():
    """3 distinct PCM 7.1.4 streams (same config, different audio)."""
    streams = [
        vectors.build_pcm_layout_stream(
            ChannelLayout.L714, n_frames=7, frame_size=960, amp=0.2 * (s + 1),
            seed=s)[0]
        for s in range(3)
    ]
    srv = MultiStreamServer(streams, sound_system=9, batch_frames=4)
    outs = srv.decode_all()
    for s, stream in enumerate(streams):
        ref = _per_stream(stream, sound_system=9, batch_frames=4)
        assert len(outs[s]) == len(ref)
        for a, b in zip(outs[s], ref):
            np.testing.assert_array_equal(np.asarray(a), b)


def test_multistream_opus():
    """Opus 7.1.4 streams through the device CELT synthesis, vmapped."""
    streams = [
        vectors.build_opus_layout_stream(
            ChannelLayout.L714, n_frames=6, frame_size=960, amp=0.3)[0]
        for _ in range(2)
    ]
    srv = MultiStreamServer(streams, sound_system=9, batch_frames=4)
    outs = srv.decode_all()
    for s, stream in enumerate(streams):
        ref = _per_stream(stream, sound_system=9, batch_frames=4)
        for a, b in zip(outs[s], ref):
            np.testing.assert_array_equal(np.asarray(a), b)


def test_multistream_scalable_demix():
    """Scalable multi-layer content (demix chains + recon gains active)."""
    streams = [vectors.build_scalable_pcm_stream(
        n_frames=6, demix_modes=[f % 3 for f in range(6)], amp=a)[0]
        for a in (0.3, 0.4)]
    srv = MultiStreamServer(streams, sound_system=7, batch_frames=4)
    outs = srv.decode_all()
    for s, stream in enumerate(streams):
        ref = _per_stream(stream, sound_system=7, batch_frames=4)
        for a, b in zip(outs[s], ref):
            np.testing.assert_array_equal(np.asarray(a), b)


def test_multistream_binaural_hrtf():
    """Binaural HRTF-conv output config: the per-element HRIR spectra
    (complex64 device tensors) stack on the stream axis like every other
    parameter leaf."""
    streams = [
        vectors.build_pcm_layout_stream(
            ChannelLayout.L510, n_frames=6, frame_size=960, amp=0.2 + 0.1 * s,
            seed=s, hrm=1)[0]
        for s in range(2)
    ]
    srv = MultiStreamServer(streams, binaural=True, batch_frames=4)
    outs = srv.decode_all()
    for s, stream in enumerate(streams):
        ref = _per_stream(stream, binaural=True, batch_frames=4)
        for a, b in zip(outs[s], ref):
            np.testing.assert_array_equal(np.asarray(a), b)


def test_multistream_aac():
    """AAC content (host entropy + device filterbank) through the vmapped
    fleet."""
    try:
        streams = [vectors.build_aac_layout_stream(
            ChannelLayout.STEREO, n_frames=6)[0] for _ in range(2)]
    except Exception as e:
        pytest.skip(f"aac encoder unavailable: {e}")
    srv = MultiStreamServer(streams, sound_system=0, batch_frames=4)
    outs = srv.decode_all()
    for s, stream in enumerate(streams):
        ref = _per_stream(stream, sound_system=0, batch_frames=4)
        for a, b in zip(outs[s], ref):
            np.testing.assert_array_equal(np.asarray(a), b)


def test_multistream_mixed_lengths():
    """Heterogeneous fleet: same config class, different stream lengths —
    shorter members pad with neutral rows/zero batches in ONE program and
    each stream's kept output stays bit-exact."""
    lens = [7, 13, 4]
    streams = [
        vectors.build_pcm_layout_stream(
            ChannelLayout.L714, n_frames=n, frame_size=960,
            amp=0.2 + 0.1 * i, seed=i)[0]
        for i, n in enumerate(lens)
    ]
    srv = MultiStreamServer(streams, sound_system=9, batch_frames=4)
    assert srv.n_buckets == 1  # one program despite the length mix
    outs = srv.decode_all()
    for s, stream in enumerate(streams):
        ref = _per_stream(stream, sound_system=9, batch_frames=4)
        assert len(outs[s]) == len(ref)
        for a, b in zip(outs[s], ref):
            np.testing.assert_array_equal(np.asarray(a), b)


def test_multistream_mixed_codec_and_layout():
    """Fully heterogeneous fleet: pcm 7.1.4 + opus 7.1.4 + pcm stereo,
    mixed lengths — bucketed into per-program groups, every stream
    bit-exact vs its own decode."""
    try:
        opus = vectors.build_opus_layout_stream(
            ChannelLayout.L714, n_frames=9, frame_size=960, amp=0.3)[0]
    except Exception as e:
        pytest.skip(f"opus encoder unavailable: {e}")
    streams = [
        vectors.build_pcm_layout_stream(
            ChannelLayout.L714, n_frames=7, frame_size=960, amp=0.3)[0],
        opus,
        vectors.build_pcm_layout_stream(
            ChannelLayout.STEREO, n_frames=5, frame_size=960, amp=0.5)[0],
    ]
    srv = MultiStreamServer(streams, sound_system=9, batch_frames=4)
    assert srv.n_buckets == 3  # pcm-714 / opus-714 / pcm-stereo programs
    outs = srv.decode_all()
    for s, stream in enumerate(streams):
        ref = _per_stream(stream, sound_system=9, batch_frames=4)
        assert len(outs[s]) == len(ref)
        for a, b in zip(outs[s], ref):
            np.testing.assert_array_equal(np.asarray(a), b)
