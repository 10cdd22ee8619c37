"""MP4 container path tests: demux, decode, seek (-ts) vs reference -i1."""

import os
import subprocess

import numpy as np
import pytest

import vectors
from test_e2e_pcm import REF_STD, assert_bitexact
from iamf_tpu.utils.wav import read_wav


def ref_decode_mp4(mp4_bytes, tmp_path, sound_system="1", extra=()):
    if not os.path.exists(REF_STD):
        pytest.skip("reference player not built")
    path = os.path.join(str(tmp_path), "vec.mp4")
    with open(path, "wb") as f:
        f.write(mp4_bytes)
    subprocess.run(
        [REF_STD, "-i1", "-o2", f"-s{sound_system}", *extra, "vec.mp4"],
        cwd=str(tmp_path), capture_output=True, timeout=300,
    )
    wav = os.path.join(str(tmp_path), f"ss{sound_system}_vec.wav")
    if not os.path.exists(wav):
        pytest.fail("reference produced no wav from mp4")
    pcm, _, _ = read_wav(wav)
    return pcm


def ours_decode_mp4(mp4_bytes, tmp_path, sound_system=1, start=0.0):
    from iamf_tpu.api import IAMFDecoder
    from iamf_tpu.tools.player import decode_mp4

    path = os.path.join(str(tmp_path), "ours.mp4")
    with open(path, "wb") as f:
        f.write(mp4_bytes)
    dec = IAMFDecoder()
    dec.set_sound_system(sound_system)
    pcm, frames, _ = decode_mp4(dec, path, start)
    return pcm


def test_mp4_demux_structure(tmp_path):
    stream, _ = vectors.build_pcm_51_stream(n_frames=6)
    mp4 = vectors.build_mp4(stream)
    from iamf_tpu.mp4.iamf_track import MP4IAMFParser

    path = os.path.join(str(tmp_path), "t.mp4")
    open(path, "wb").write(mp4)
    p = MP4IAMFParser(path)
    assert p.timescale == 48000
    assert p.demux.n_samples == 6
    pkts = list(p.packets())
    assert len(pkts) == 6
    assert all(nd is None for _, nd in pkts)


def test_mp4_decode_matches_bitstream(tmp_path):
    stream, _ = vectors.build_pcm_51_stream(n_frames=6)
    mp4 = vectors.build_mp4(stream)
    ref = ref_decode_mp4(mp4, tmp_path, "1")
    ours = ours_decode_mp4(mp4, tmp_path, 1)
    assert_bitexact(ours, ref)


def test_mp4_sgpd_roll_distance(tmp_path):
    """The 'roll' sample-group boxes (sbgp + sgpd v1): our demuxer surfaces
    the signed roll distance, the decode is unaffected (the reference reads
    the box only under SUPPORT_VERIFIER, mp4demux.c:88,849, and takes roll
    from the Codec Config OBU — ours cross-checks both sources)."""
    stream, _ = vectors.build_pcm_51_stream(n_frames=6)
    mp4 = vectors.build_mp4(stream, roll_distance=-4)
    from iamf_tpu.mp4.demux import MP4Demuxer

    path = os.path.join(str(tmp_path), "roll.mp4")
    open(path, "wb").write(mp4)
    d = MP4Demuxer(path)
    assert d.iamf_track.roll_distance == -4
    # decode parity is unchanged by the extra stbl boxes
    ref = ref_decode_mp4(mp4, tmp_path, "1")
    ours = ours_decode_mp4(mp4, tmp_path, 1)
    assert_bitexact(ours, ref)


def test_fmp4_decode_matches_bitstream(tmp_path):
    """Fragmented input (moof/traf/tfhd/trun, incl. tfhd base-data-offset):
    decode must be bit-exact vs the reference player AND vs the same
    stream decoded from raw bitstream form."""
    stream, _ = vectors.build_pcm_51_stream(n_frames=8)
    mp4 = vectors.build_fmp4(stream, fragments=3, base_data_offset=True)
    ref = ref_decode_mp4(mp4, tmp_path, "1")
    ours = ours_decode_mp4(mp4, tmp_path, 1)
    assert_bitexact(ours, ref)


def test_mp4_seek(tmp_path):
    """-ts seek: walk sample deltas, decode from the target."""
    # reference -ts takes integer seconds (strtoul, iamfplayer.c:867)
    stream, _ = vectors.build_pcm_51_stream(n_frames=60)
    mp4 = vectors.build_mp4(stream)
    ref = ref_decode_mp4(mp4, tmp_path, "1", extra=("-ts", "1"))
    ours = ours_decode_mp4(mp4, tmp_path, 1, start=1.0)
    assert_bitexact(ours, ref)


def test_mp4_scalable_with_params(tmp_path):
    """Config 4 shape: multi-layer scalable from mp4 with demix params."""
    stream, _ = vectors.build_scalable_pcm_stream(
        n_frames=8, demix_modes=[1, 2, 4, 1, 5, 6, 0, 2]
    )
    mp4 = vectors.build_mp4(stream)
    ref = ref_decode_mp4(mp4, tmp_path, "1")
    ours = ours_decode_mp4(mp4, tmp_path, 1)
    n = min(len(ours), len(ref))
    diff = np.abs(ours[:n].astype(np.int64) - ref[:n].astype(np.int64))
    assert len(ours) == len(ref) and diff.max() <= 1


def test_atom_dump_and_mp4_vlogger(tmp_path):
    """Box-tree dump + conformance YAML logs (atom.c:294, 
    vlogging_iamfmp4_sr.c writers)."""
    import io

    from iamf_tpu.mp4.atoms import atom_dump, vlog_mp4

    stream, _ = vectors.build_pcm_stereo_stream(n_frames=4)
    mp4 = vectors.build_mp4(stream)
    out = io.StringIO()
    n = atom_dump(mp4, out)
    text = out.getvalue()
    assert n > 10
    for box in ("ftyp", "moov", "trak", "stbl", "stsd", "mdat"):
        assert box in text, box
    out = io.StringIO()
    n = vlog_mp4(mp4, out)
    text = out.getvalue()
    # reference verifier naming; byte-identical diff in test_vlogger_diff.py
    assert "iamf_" in text and "codec_id: ipcm" in text
    assert "SampleRate: 48000" in text
    assert "stts" in text and "stsz" in text


def test_batched_from_mp4_matches_serial(tmp_path):
    """MP4 input on the batched throughput path (BASELINE config 4 class):
    BatchedStreamDecoder.from_mp4 must match the serial player's mp4 loop."""
    import numpy as np
    from iamf_tpu.core.batch_decoder import BatchedStreamDecoder
    from iamf_tpu.api import IAMFDecoder
    from iamf_tpu.tools.player import decode_mp4

    stream, _ = vectors.build_pcm_51_stream(n_frames=8)
    mp4 = vectors.build_mp4(stream)
    path = str(tmp_path / "b.mp4")
    with open(path, "wb") as f:
        f.write(mp4)
    dec = IAMFDecoder()
    dec.set_sound_system(1)
    serial, _, _ = decode_mp4(dec, path)
    out = np.asarray(BatchedStreamDecoder.from_mp4(
        path, sound_system=1, batch_frames=3).decode_all())
    assert out.shape == serial.shape
    assert np.array_equal(out, serial)


def test_batched_from_mp4_seek(tmp_path):
    """-ts seek through the batched path: same packets as the serial loop
    from the same start index."""
    import numpy as np
    from iamf_tpu.core.batch_decoder import BatchedStreamDecoder
    from iamf_tpu.api import IAMFDecoder
    from iamf_tpu.tools.player import decode_mp4

    stream, _ = vectors.build_pcm_51_stream(n_frames=10)
    mp4 = vectors.build_mp4(stream)
    path = str(tmp_path / "s.mp4")
    with open(path, "wb") as f:
        f.write(mp4)
    dec = IAMFDecoder()
    dec.set_sound_system(1)
    serial, _, _ = decode_mp4(dec, path, start_sec=0.05)  # 2400 smp -> frame 2
    out = np.asarray(BatchedStreamDecoder.from_mp4(
        path, start_sec=0.05, sound_system=1, batch_frames=4).decode_all())
    assert out.shape == serial.shape
    assert np.array_equal(out, serial)
