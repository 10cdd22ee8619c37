"""AAC-LC end-to-end: the IAMF AAC path (DecoderConfigDescriptor parse,
per-substream ASC patching, multistream decode) backed by the reference's
own fdk-aac binary executed through the COFF loader (no Linux fdk exists in
this environment; the reference build itself has no AAC here, so goldens
are synthesized with the same binary)."""

import numpy as np
import pytest

import vectors
from iamf_tpu.constants import ChannelLayout

pytest.importorskip("iamf_tpu.codecs.aac.fdk")


def test_coff_fdk_roundtrip():
    """The COFF-loaded MSVC fdk-aac encodes and decodes on Linux."""
    from iamf_tpu.codecs.aac.fdk import FdkDecoder, FdkEncoder

    t = np.arange(1024 * 10) / 48000.0
    x = (0.35 * 32767 * (np.sin(2 * np.pi * 440 * t)
                         + 0.3 * np.sin(2 * np.pi * 997 * t)))[:, None]
    x = (x * [1.0, 0.8]).astype(np.int16)
    enc = FdkEncoder(2, 48000, 128000)
    aus = enc.encode(x)
    assert len(aus) >= 9
    dec = FdkDecoder(enc.asc, 2)
    y = np.concatenate([dec.decode(a)[0] for a in aus], 0).astype(np.float64)
    best = max(
        10 * np.log10((x[:len(y) - d].astype(np.float64) ** 2).mean()
                      / (((y[d:d + len(x)][:len(x) - 0][:len(x[:len(y) - d])]
                           - x[:len(y) - d]) ** 2).mean() + 1e-9))
        for d in range(2000, 2600, 8)
    )
    assert best > 25, f"round-trip SNR {best:.1f} dB"


def _expected_via_pcm(all_packets, layout, n_frames, sound_system):
    """Golden: decode the AUs with fdk directly, repack the s16 samples as
    an ipcm stream, and run it through the (bit-exact-vs-reference) PCM
    path — isolates the AAC plumbing under test."""
    from iamf_tpu.codecs.aac.fdk import FdkDecoder, FdkEncoder  # noqa: F401
    from iamf_tpu.codecs.aac.decoder import extract_asc, patch_asc_channels
    from test_e2e_pcm import ours_decode

    nsub = len(all_packets)
    ncoupled = vectors._layer_substreams(layout)[1]
    # re-derive ASC exactly as the stream's decoder config carries it
    enc_ref = FdkEncoder(2, 48000, 128000)
    planar = []
    delay = 0
    for s in range(nsub):
        ch = 2 if s < ncoupled else 1
        dec = FdkDecoder(patch_asc_channels(enc_ref.asc, ch), ch)
        outs = [dec.decode(a)[0] for a in all_packets[s][:n_frames]]
        delay = dec.output_delay  # fdk limiter look-ahead, trimmed by the
        planar.append(np.concatenate(outs, 0))  # [T, ch]    IAMF aac path
    pcm = np.concatenate(planar, axis=1)[delay:].astype(np.int16)
    stream, _ = vectors.build_pcm_layout_stream(
        layout, n_frames=n_frames, frame_size=1024, pcm_override=pcm
    )
    return ours_decode(stream, sound_system)


def test_aac_stereo_ss0(monkeypatch):
    """IAMF AAC plumbing, fdk backend: bit-exact vs fdk-decoded PCM repack."""
    from test_e2e_pcm import ours_decode

    monkeypatch.setenv("IAMF_AAC_BACKEND", "fdk")
    stream, _src, packets = vectors.build_aac_layout_stream(
        ChannelLayout.STEREO, n_frames=8
    )
    ours = ours_decode(stream, 0)
    exp = _expected_via_pcm(packets, ChannelLayout.STEREO, 8, 0)
    n = min(len(ours), len(exp))
    assert n > 0
    diff = np.abs(ours[:n].astype(np.int64) - exp[:n].astype(np.int64))
    assert diff.max() == 0, f"max {diff.max()}"


def test_aac_51_downmix(monkeypatch):
    from test_e2e_pcm import ours_decode

    monkeypatch.setenv("IAMF_AAC_BACKEND", "fdk")
    stream, _src, packets = vectors.build_aac_layout_stream(
        ChannelLayout.L510, n_frames=6
    )
    ours = ours_decode(stream, 0)
    exp = _expected_via_pcm(packets, ChannelLayout.L510, 6, 0)
    n = min(len(ours), len(exp))
    diff = np.abs(ours[:n].astype(np.int64) - exp[:n].astype(np.int64))
    assert diff.max() == 0, f"max {diff.max()}"


def _e2e_native_vs_fdk(layout, n_frames, sound_system, monkeypatch,
                       min_snr=60.0):
    """Decode the same IAMF stream with the from-scratch native AAC-LC
    decoder and with the fdk oracle backend. Both align at the IAMF layer
    (the fdk path discovers and trims fdk's internal limiter delay exactly
    as the reference does); equal up to fixed-point rounding."""
    from test_e2e_pcm import ours_decode

    stream, _src, _ = vectors.build_aac_layout_stream(
        layout, n_frames=n_frames)
    monkeypatch.setenv("IAMF_AAC_BACKEND", "native")
    ours = ours_decode(stream, sound_system)
    monkeypatch.setenv("IAMF_AAC_BACKEND", "fdk")
    ref = ours_decode(stream, sound_system)
    n = min(len(ours), len(ref))
    a, b = ours[:n].astype(np.float64), ref[:n].astype(np.float64)
    snr = 10 * np.log10((b ** 2).mean() / (((a - b) ** 2).mean() + 1e-12))
    assert snr > min_snr, f"SNR {snr:.1f} dB"


def test_aac_native_stereo_ss0(monkeypatch):
    _e2e_native_vs_fdk(ChannelLayout.STEREO, 10, 0, monkeypatch)


def test_aac_native_51_downmix(monkeypatch):
    _e2e_native_vs_fdk(ChannelLayout.L510, 6, 0, monkeypatch)


def test_aac_native_714_to_ss9(monkeypatch):
    _e2e_native_vs_fdk(ChannelLayout.L714, 6, 9, monkeypatch)


def test_asc_channel_patch():
    from iamf_tpu.codecs.aac.decoder import extract_asc, patch_asc_channels

    conf = vectors.aac_decoder_config(bytes([0x11, 0x90]))
    asc = extract_asc(conf)
    assert asc == bytes([0x11, 0x90])  # AAC-LC, 48 kHz, 2ch
    mono = patch_asc_channels(asc, 1)
    assert mono == bytes([0x11, 0x88])  # chan cfg 2 -> 1
    back = patch_asc_channels(mono, 2)
    assert back == asc
