"""Pitch-based Opus packet-loss concealment vs libopus.

CELT-mode losses are concealed by the float analogue of libopus
celt_decode_lost (native/src/opus/celt_plc.cc): pitch search over the
decode history + order-24 LPC excitation-domain extrapolation with decay
for fresh losses, background-noise CNG after 100 ms. The reference
decoder itself never exercises loss paths (its file player feeds every
packet, /root/reference/src/iamf_dec/opus/opus_multistream2_decoder.c:
125-165); the oracle here is the same prebuilt libopus the reference
links, driven through its own PLC (opus_decode with a NULL packet).
"""

import ctypes

import numpy as np
import pytest

from test_opus_entdec import ORACLE, _build
from test_opus_celt_stages import SHIM, _build_shim


@pytest.fixture(scope="module")
def env():
    _build()
    _build_shim()
    ours = ctypes.CDLL(SHIM)
    ours.iamf_opus_decoder_create.restype = ctypes.c_void_p
    ours.iamf_opus_decoder_create.argtypes = [ctypes.c_int]
    ours.iamf_opus_decode_float.restype = ctypes.c_int
    ours.iamf_opus_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    ref = ctypes.CDLL(ORACLE)
    ref.opus_encoder_create.restype = ctypes.c_void_p
    ref.opus_decoder_create.restype = ctypes.c_void_p
    ref.opus_encode_float.restype = ctypes.c_int
    ref.opus_decode.restype = ctypes.c_int
    return ours, ref


def pitched(n, channels, f0=220.0, seed=3):
    """Harmonic content with vibrato + slow AM — the case pitch PLC is for."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 48000.0
    vib = 1 + 0.003 * np.sin(2 * np.pi * 5 * t)
    x = np.zeros((n, channels), np.float32)
    for c in range(channels):
        for h in range(1, 8):
            x[:, c] += (0.35 / h) * np.sin(
                2 * np.pi * f0 * h * t * vib + rng.uniform(0, 6))
    env = 0.7 + 0.3 * np.sin(2 * np.pi * 1.3 * t)
    return (x * env[:, None] * 0.5).astype(np.float32)


def encode(ref, pcm, channels, bitrate=96000, mode=1002, maxbw=None,
           frame=960):
    err = ctypes.c_int(0)
    enc = ref.opus_encoder_create(48000, channels, 2049, ctypes.byref(err))
    assert enc and not err.value
    ref.opus_encoder_ctl(ctypes.c_void_p(enc), 4002, ctypes.c_int(bitrate))
    ref.opus_encoder_ctl(ctypes.c_void_p(enc), 11002, ctypes.c_int(mode))
    if maxbw is not None:
        ref.opus_encoder_ctl(ctypes.c_void_p(enc), 4004, ctypes.c_int(maxbw))
    out = ctypes.create_string_buffer(4000)
    pkts = []
    for i in range(len(pcm) // frame):
        chunk = np.ascontiguousarray(pcm[i * frame:(i + 1) * frame])
        r = ref.opus_encode_float(
            ctypes.c_void_p(enc),
            chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame, out, 4000)
        assert r > 0
        pkts.append(bytes(out.raw[:r]))
    ref.opus_encoder_destroy(ctypes.c_void_p(enc))
    return pkts


def dec_ref(ref, pkts, channels, lost=(), frame=960):
    err = ctypes.c_int(0)
    h = ref.opus_decoder_create(48000, channels, ctypes.byref(err))
    buf = np.zeros(5760 * channels, np.int16)
    outs = []
    for i, p in enumerate(pkts):
        if i in lost:
            r = ref.opus_decode(
                ctypes.c_void_p(h), None, 0,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), frame, 0)
        else:
            r = ref.opus_decode(
                ctypes.c_void_p(h), p, len(p),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), 5760, 0)
        assert r > 0, r
        outs.append(buf[:r * channels].reshape(r, channels)
                    .astype(np.float32) / 32768.0)
    ref.opus_decoder_destroy(ctypes.c_void_p(h))
    return np.concatenate(outs)


def dec_ours(ours, pkts, channels, lost=()):
    h = ours.iamf_opus_decoder_create(channels)
    buf = np.zeros(5760 * channels, np.float32)
    outs = []
    for i, p in enumerate(pkts):
        if i in lost:
            r = ours.iamf_opus_decode_float(
                h, None, 0,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 5760)
        else:
            r = ours.iamf_opus_decode_float(
                h, p, len(p),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 5760)
        assert r > 0, r
        outs.append(buf[:r * channels].reshape(r, channels).copy())
    ours.iamf_opus_decoder_destroy(ctypes.c_void_p(h))
    return np.concatenate(outs)


def snr(a, b):
    e = ((a - b) ** 2).mean()
    return 10 * np.log10((a ** 2).mean() / (e + 1e-30))


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("lost", [(15,), (25, 26)])
def test_pitch_plc_matches_libopus(env, channels, lost):
    """Concealment of 1- and 2-frame losses on pitched content: our PLC
    waveform matches libopus's own (>40 dB — measured 54-81 dB), and its
    concealment quality vs the clean decode is never worse."""
    ours, ref = env
    pcm = pitched(960 * 40, channels)
    pkts = encode(ref, pcm, channels)
    clean = dec_ref(ref, pkts, channels)
    rl = dec_ref(ref, pkts, channels, set(lost))
    ol = dec_ours(ours, pkts, channels, set(lost))
    for i in list(lost) + [max(lost) + 1, max(lost) + 2, max(lost) + 3]:
        s = slice(i * 960, (i + 1) * 960)
        assert snr(rl[s], ol[s]) > 40, (
            f"frame {i}: ours vs libopus PLC {snr(rl[s], ol[s]):.1f} dB")
        assert snr(clean[s], ol[s]) >= snr(clean[s], rl[s]) - 0.5, (
            f"frame {i}: quality {snr(clean[s], ol[s]):.1f} vs libopus "
            f"{snr(clean[s], rl[s]):.1f} dB")


def test_long_loss_noise_cng(env):
    """>=100 ms of loss flips to the background-noise CNG branch: the
    energy envelope must track libopus's (fade through the pitch frames,
    then a stable comfort-noise floor), and recovery must re-converge."""
    ours, ref = env
    channels = 1
    pcm = pitched(960 * 60, channels)
    pkts = encode(ref, pcm, channels)
    clean = dec_ref(ref, pkts, channels)
    lost = set(range(20, 34))
    rl = dec_ref(ref, pkts, channels, lost)
    ol = dec_ours(ours, pkts, channels, lost)
    assert np.isfinite(ol).all()
    for i in sorted(lost):
        s = slice(i * 960, (i + 1) * 960)
        r_rms = np.sqrt((rl[s] ** 2).mean())
        o_rms = np.sqrt((ol[s] ** 2).mean())
        assert 0.9 * r_rms <= o_rms <= 1.1 * r_rms, (
            f"frame {i}: rms {o_rms:.5f} vs libopus {r_rms:.5f}")
    # the CNG floor is noise, not a frozen waveform: consecutive concealed
    # frames decorrelate
    a = ol[31 * 960:32 * 960]
    b = ol[32 * 960:33 * 960]
    corr = abs(np.dot(a[:, 0], b[:, 0])) / (
        np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert corr < 0.5, f"CNG frames correlate {corr:.2f}"
    # recovery: energy-prediction state was floored like libopus's, so the
    # decode re-converges within a few frames (measured within ~6 dB)
    for i in (35, 36, 37):
        s = slice(i * 960, (i + 1) * 960)
        assert snr(clean[s], ol[s]) >= snr(clean[s], rl[s]) - 8, (
            f"recovery frame {i}: {snr(clean[s], ol[s]):.1f} vs "
            f"{snr(clean[s], rl[s]):.1f} dB")
    assert snr(clean[37 * 960:38 * 960], ol[37 * 960:38 * 960]) > 20


# ---- SILK-mode PLC (silk/PLC.c semantics in silk_decoder.cc) -----------


def speechish(n, channels, seed=7):
    """Voiced speech-like content: f0 sweep + harmonics + breath noise."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 48000.0
    f0 = 130 * (1 + 0.05 * np.sin(2 * np.pi * 3 * t))
    x = np.zeros((n, channels), np.float32)
    for c in range(channels):
        ph = np.cumsum(2 * np.pi * f0 / 48000.0)
        for h in range(1, 10):
            x[:, c] += (0.3 / h) * np.sin(h * ph + rng.uniform(0, 6))
        x[:, c] += 0.02 * rng.randn(n)
    env_ = 0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 2.1 * t))
    return (x * env_[:, None] * 0.4).astype(np.float32)


@pytest.mark.parametrize("lost", [(12,), (20, 21), (5, 6, 7)])
def test_silk_plc_concealed_frames_bitexact_mono(env, lost):
    """Mono WB SILK losses: every concealed frame is BIT-EXACT vs libopus's
    own LTP-based PLC (LTP extrapolation + LPC synthesis over randomized
    excitation — the whole chain is fixed-point)."""
    ours, ref = env
    pcm = speechish(960 * 30, 1)
    pkts = encode(ref, pcm, 1, bitrate=64000, mode=1000, maxbw=1103)
    assert pkts[0][0] >> 3 < 12, "not a SILK-mode TOC"
    rl = dec_ref(ref, pkts, 1, set(lost))
    ol = dec_ours(ours, pkts, 1, set(lost))
    for i in lost:
        s = slice(i * 960, (i + 1) * 960)
        np.testing.assert_array_equal(rl[s], ol[s])


@pytest.mark.parametrize("frame", [480, 1920])
def test_silk_plc_bitexact_other_frame_sizes(env, frame):
    """10 ms and 40 ms SILK packets conceal bit-exactly too (one internal
    10 ms frame / per-20 ms conceal loop)."""
    ours, ref = env
    pcm = speechish(frame * 20, 1)
    pkts = encode(ref, pcm, 1, bitrate=64000, mode=1000, maxbw=1103,
                  frame=frame)
    rl = dec_ref(ref, pkts, 1, {8}, frame=frame)
    ol = dec_ours(ours, pkts, 1, {8})
    s = slice(8 * frame, 9 * frame)
    np.testing.assert_array_equal(rl[s], ol[s])


def test_silk_plc_recovery_converges(env):
    """After the loss, decode re-converges to libopus's lossy decode
    monotonically (measured ~19 dB on the first recovery frame, +5 dB per
    frame, >50 dB within 10)."""
    ours, ref = env
    pcm = speechish(960 * 30, 1)
    pkts = encode(ref, pcm, 1, bitrate=64000, mode=1000, maxbw=1103)
    rl = dec_ref(ref, pkts, 1, {12})
    ol = dec_ours(ours, pkts, 1, {12})
    snrs = [snr(rl[i * 960:(i + 1) * 960], ol[i * 960:(i + 1) * 960])
            for i in range(13, 23)]
    assert snrs[0] > 10, snrs
    assert snrs[4] > 25, snrs
    assert snrs[-1] > 40, snrs


def test_silk_plc_stereo(env):
    """Stereo SILK losses: concealed frames bit-exact while the side
    channel is actively coded; mid-only regions stay >25 dB of libopus
    (side-conceal gating differences express below that)."""
    ours, ref = env
    pcm = speechish(960 * 30, 2)
    pkts = encode(ref, pcm, 2, bitrate=128000, mode=1000, maxbw=1103)
    rl = dec_ref(ref, pkts, 2, {5, 6})
    ol = dec_ours(ours, pkts, 2, {5, 6})
    for i in (5, 6):
        s = slice(i * 960, (i + 1) * 960)
        np.testing.assert_array_equal(rl[s], ol[s])
    rl = dec_ref(ref, pkts, 2, {12})
    ol = dec_ours(ours, pkts, 2, {12})
    s = slice(12 * 960, 13 * 960)
    assert snr(rl[s], ol[s]) > 25


def test_hybrid_plc(env):
    """Hybrid losses run SILK PLC + the CELT layer's CNG (band 17+), the
    same two-layer concealment opus_decoder.c's data==NULL path performs."""
    ours, ref = env
    pcm = speechish(960 * 30, 1)
    pkts = encode(ref, pcm, 1, bitrate=64000, mode=1001)
    assert 12 <= pkts[0][0] >> 3 < 16, "not a hybrid TOC"
    rl = dec_ref(ref, pkts, 1, {12, 13})
    ol = dec_ours(ours, pkts, 1, {12, 13})
    assert np.isfinite(ol).all()
    for i in (12, 13):
        s = slice(i * 960, (i + 1) * 960)
        assert snr(rl[s], ol[s]) > 20, snr(rl[s], ol[s])


def test_plc_on_unpitched_noise(env):
    """PLC on noise content must stay bounded (no filter blow-up): the
    S1/S2 energy guard zeroes or attenuates exploding synthesis."""
    ours, ref = env
    rng = np.random.RandomState(11)
    pcm = (rng.randn(960 * 20, 1) * 0.1).astype(np.float32)
    pkts = encode(ref, pcm, 1, bitrate=64000)
    ol = dec_ours(ours, pkts, 1, {10, 11, 12})
    assert np.isfinite(ol).all()
    pre_rms = np.sqrt((ol[9 * 960:10 * 960] ** 2).mean())
    for i in (10, 11, 12):
        s = slice(i * 960, (i + 1) * 960)
        assert np.sqrt((ol[s] ** 2).mean()) <= 2.0 * pre_rms + 1e-6
