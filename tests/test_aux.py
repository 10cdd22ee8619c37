"""Auxiliary subsystem tests: reconfigure mid-stream, vlogging, stream
taps, metadata, logging (SURVEY §5)."""

import io
import os

import numpy as np
import pytest

import vectors
from test_e2e_pcm import assert_bitexact, ref_decode
from iamf_tpu.api import IAMFDecoder, InvalidState


def test_reconfigure_mid_stream(tmp_path):
    """A non-redundant sequence header mid-stream forces reconfigure
    (IAMF_decoder.c:2918-2921, player re-configure loop iamfplayer.c:623)."""
    s1, src1 = vectors.build_pcm_stereo_stream(n_frames=4)
    s2, src2 = vectors.build_pcm_51_stream(n_frames=4)
    stream = s1 + s2
    ref = ref_decode(stream, tmp_path, sound_system="0")

    dec = IAMFDecoder()
    dec.set_sound_system(0)
    pos = dec.configure(stream)
    chunks = []
    while pos < len(stream):
        try:
            consumed, pcm = dec.decode(stream[pos:])
        except InvalidState:
            dec = IAMFDecoder()
            dec.set_sound_system(0)
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
    ours = np.concatenate(chunks, axis=0)
    # reference also decodes both segments back to back
    assert len(ours) >= len(src1), (len(ours), len(src1))
    n = min(len(ours), len(ref))
    diff = np.abs(ours[:n].astype(np.int64) - ref[:n].astype(np.int64))
    assert diff.max() == 0


def test_vlogger_yaml():
    from iamf_tpu.tools.vlogger import vlog_stream

    stream, _ = vectors.build_scalable_pcm_stream(n_frames=2)
    out = io.StringIO()
    n = vlog_stream(stream, out)
    text = out.getvalue()
    assert n > 5
    # reference verifier naming (vlogging_tool_sr.c writers); the full
    # byte-identical diff vs a SUPPORT_VERIFIER build is
    # test_vlogger_diff.py
    assert "IaSequenceHeaderOBU_0" in text
    assert "CodecConfigOBU_" in text
    assert "AudioElementOBU_" in text
    assert "MixPresentationOBU_" in text
    assert "AudioFrameOBU_" in text
    assert "scalable_channel_layout_config" in text


def test_stream_taps(tmp_path):
    stream, _ = vectors.build_pcm_51_stream(n_frames=3)
    dec = IAMFDecoder()
    dec.set_sound_system(0)
    dec.stream_log = True
    pos = dec.configure(stream)
    while pos < len(stream):
        consumed, _pcm = dec.decode(stream[pos:])
        if consumed == 0:
            break
        pos += consumed
    files = dec.write_stream_logs(str(tmp_path))
    names = sorted(os.path.basename(f) for f in files)
    assert "mix.wav" in names
    assert any(n.startswith("rec_") for n in names)
    assert any(n.startswith("ren_") for n in names)


def test_metadata_extradata():
    stream, _ = vectors.build_scalable_pcm_stream(
        n_frames=3, demix_modes=[4, 4, 4]
    )
    dec = IAMFDecoder()
    dec.set_sound_system(1)
    pos = dec.configure(stream)
    while pos < len(stream):
        consumed, _pcm = dec.decode(stream[pos:])
        if consumed == 0:
            break
        pos += consumed
    md = dec.get_last_metadata()
    assert md.output_sound_system == 1
    assert md.num_parameters == 1  # demixing parameter present
    assert md.dmixp_mode == 4


def test_stage_timer():
    from iamf_tpu.utils.logging import StageTimer

    t = StageTimer()
    t.add("decode", 0.5)
    t.add("render", 0.2)
    rep = t.report(10.0)
    assert "decode" in rep and "TOTAL" in rep and "x20" in rep


# SURVEY §2.4 parallel strategies (substream/TP, time/SP halo, stage/PP)
# are covered on the REAL decoder in tests/test_sharded_decoder.py (the
# round-1 synthetic-matrix demos in parallel/sharded_pipeline.py were
# folded into that coverage and removed).


def test_reconfigure_none_stream_reuse():
    """configure(None): re-target the output layout mid-stream with stream
    reuse (player_test_sound_system semantics + iamf_presentation_reuse_
    stream). PCM is stateless, so each segment must bit-match a fresh
    decode at that layout."""
    stream, _ = vectors.build_pcm_51_stream(n_frames=8)

    # limiter disabled: the reference re-inits the limiter on every
    # reconfigure (configure :3810), shifting each segment by its
    # look-ahead swallow — with it off, PCM frames align exactly
    def full_decode(ss):
        from test_e2e_pcm import ours_decode

        return ours_decode(stream, ss, peak_limiter_enable=False)

    golden = {ss: full_decode(ss) for ss in (0, 1, 2)}

    dec = IAMFDecoder()
    dec.set_sound_system(0)
    dec.set_peak_limiter_enable(False)
    pos = dec.configure(stream)
    schedule = [0, 0, 1, 1, 2, 2, 0, 0]
    outs = []
    f = 0
    while pos < len(stream):
        if f < len(schedule) and (f == 0 or schedule[f] != schedule[f - 1]):
            dec.set_sound_system(schedule[f])
            dec.configure(None)
        consumed, pcm = dec.decode(stream[pos:])
        if consumed == 0 and pcm is None:
            break
        pos += consumed
        if pcm is not None and len(pcm):
            outs.append((schedule[min(f, len(schedule) - 1)], pcm))
            f += 1
    # limiter restarts per reconfigure (reference re-inits it in configure)
    # so compare the mixed/rendered content: each frame must equal the
    # same frame of a continuous decode at that layout
    at = 0
    for ss, pcm in outs:
        seg = golden[ss][at: at + pcm.shape[0]]
        assert pcm.shape == seg.shape
        d = np.abs(pcm.astype(np.int64) - seg.astype(np.int64))
        assert d.max() == 0, f"frame at {at} (ss{ss}): max {d.max()}"
        at += pcm.shape[0]


def test_soak_sound_system_switches(tmp_path):
    """The player's -test_soundsystem soak runs to completion and writes
    one wav per layout segment (SURVEY §4.4)."""
    import os

    from iamf_tpu.tools.player import main as player_main

    stream, _ = vectors.build_pcm_51_stream(n_frames=60)
    path = str(tmp_path / "soak.iamf")
    with open(path, "wb") as f:
        f.write(stream)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = player_main(["-o", "2", "-s", "0",
                          "-test_soundsystem", "7", path])
    finally:
        os.chdir(cwd)
    assert rc == 0
    wavs = [p for p in os.listdir(tmp_path) if p.endswith(".wav")]
    assert len(wavs) >= 2, wavs
