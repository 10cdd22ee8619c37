"""FLAC lossless end-to-end tests vs reference goldens (BASELINE config 2:
bit-exact requirement)."""

import numpy as np
import pytest

import vectors
from test_e2e_pcm import assert_bitexact, ours_decode, ref_decode
from iamf_tpu.constants import ChannelLayout


def test_flac_stereo_bitexact(tmp_path):
    stream, _ = vectors.build_flac_layout_stream(ChannelLayout.STEREO, n_frames=8)
    ref = ref_decode(stream, tmp_path, sound_system="0")
    ours = ours_decode(stream, 0)
    assert_bitexact(ours, ref)


def test_flac_51_to_ssb_bitexact(tmp_path):
    """BASELINE config 2: FLAC lossless 5.1 -> Sound system B, bit-exact."""
    stream, _ = vectors.build_flac_layout_stream(ChannelLayout.L510, n_frames=8)
    ref = ref_decode(stream, tmp_path, sound_system="1")
    ours = ours_decode(stream, 1)
    assert_bitexact(ours, ref)


def test_flac_51_downmix_stereo(tmp_path):
    stream, _ = vectors.build_flac_layout_stream(ChannelLayout.L510, n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="0")
    ours = ours_decode(stream, 0)
    assert_bitexact(ours, ref)


def test_flac_24bit_bitexact(tmp_path):
    stream, _ = vectors.build_flac_layout_stream(
        ChannelLayout.STEREO, n_frames=6, bits=24
    )
    ref = ref_decode(stream, tmp_path, sound_system="0")
    ours = ours_decode(stream, 0, bit_depth=24)
    # reference wav is 16-bit by default; compare at 16-bit depth
    ours16 = ours_decode(stream, 0)
    assert_bitexact(ours16, ref)


def test_flac_714_bitexact(tmp_path):
    stream, _ = vectors.build_flac_layout_stream(ChannelLayout.L714, n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="9")
    ours = ours_decode(stream, 9)
    assert_bitexact(ours, ref)


def test_flac_batched_path_bitexact(tmp_path):
    """FLAC content through the BATCHED decoder: the whole-stream batched
    native decode (one GIL-free call per substream, int32 shipped and
    float-converted on device like PCM) must stay bit-exact vs the
    reference player."""
    from iamf_tpu.core.batch_decoder import BatchedStreamDecoder

    stream, _ = vectors.build_flac_layout_stream(ChannelLayout.L510,
                                                 n_frames=6)
    ref = ref_decode(stream, tmp_path, sound_system="1")
    out = np.asarray(BatchedStreamDecoder(
        stream, sound_system=1, batch_frames=4).decode_all())
    assert_bitexact(out, ref)
    dec = BatchedStreamDecoder(stream, sound_system=1, batch_frames=4)
    assert dec.stats["elements"][0]["path"] == "raw_device"


def test_flac_batched_24bit_matches_serial():
    """24-bit FLAC through the batched path vs the serial api decoder."""
    from iamf_tpu.core.batch_decoder import BatchedStreamDecoder
    from test_e2e_pcm import ours_decode

    stream, _ = vectors.build_flac_layout_stream(
        ChannelLayout.STEREO, n_frames=5, bits=24)
    serial = ours_decode(stream, 0, bit_depth=24)
    out = np.asarray(BatchedStreamDecoder(
        stream, sound_system=0, bits=24, batch_frames=3).decode_all())
    assert_bitexact(out, serial)
