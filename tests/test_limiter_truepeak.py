"""USE_TRUEPEAK limiter branch vs a reference-source oracle.

The reference gates a true-peak variant of the look-ahead limiter behind
``USE_TRUEPEAK`` (audio_effect_peak_limiter.h:38, hardcoded 0): with it on,
the per-channel magnitude fed into the look-ahead peak ring is
|audio_true_peak_meter_next_true_peak(x)| — a 4x-oversampled inter-sample
peak estimate — instead of |x| (audio_effect_peak_limiter.c:150-166). The
reference repo ships NO meter implementation anywhere (the include target
``audio_true_peak_meter.h`` does not exist in the tree), so the branch is
not buildable upstream; dsp/limiter.py supplies a BS.1770-4-style 48-tap
4-phase polyphase meter.

Oracle construction (the strongest diff available given the missing meter):
compile the reference's audio_effect_peak_limiter.c VERBATIM with the gate
flipped to 1 and a C meter whose coefficient table is generated from
``dsp.limiter.truepeak_filters()`` — identical constants on both sides, so
the diff pins the reference's true-peak *integration semantics* (meter on
the un-delayed input, peak ring of meter outputs, peak_pos cache, padding
swallow) against our vectorized JAX formulation.
"""

import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from iamf_tpu.dsp.limiter import (  # noqa: E402
    Limiter, LimiterConfig, emit_truepeak_c_table, truepeak_filters,
    TP_TAPS, TP_PHASES)

REF = "/root/reference/src/iamf_dec"
BUILD = "/tmp/iamf_tpu_truepeak_oracle"

METER_C = r"""
#include "audio_true_peak_meter.h"
#include <math.h>
#include <string.h>

%TABLE%

void audio_true_peak_meter_init(AudioTruePeakMeter* m) {
  memset(m->hist, 0, sizeof(m->hist));
}
void audio_true_peak_meter_deinit(AudioTruePeakMeter* m) { (void)m; }

/* hist[0] = newest sample; phase output = sum_i h[p][i] * x[n-i]; the
 * returned value's magnitude is the 4x inter-sample peak estimate (the
 * caller takes fabs, audio_effect_peak_limiter.c:163). */
float audio_true_peak_meter_next_true_peak(AudioTruePeakMeter* m, float x) {
  memmove(m->hist + 1, m->hist, (%TAPS% - 1) * sizeof(float));
  m->hist[0] = x;
  float best = 0.f;
  for (int p = 0; p < %PHASES%; ++p) {
    float acc = 0.f;
    for (int i = 0; i < %TAPS%; ++i) acc += TP_PHASES_TAB[p][i] * m->hist[i];
    if (fabsf(acc) > fabsf(best)) best = acc;
  }
  return best;
}
"""

METER_H = """
#ifndef AUDIO_TRUE_PEAK_METER_H_
#define AUDIO_TRUE_PEAK_METER_H_
typedef struct AudioTruePeakMeter { float hist[%TAPS%]; } AudioTruePeakMeter;
void audio_true_peak_meter_init(AudioTruePeakMeter* m);
void audio_true_peak_meter_deinit(AudioTruePeakMeter* m);
float audio_true_peak_meter_next_true_peak(AudioTruePeakMeter* m, float x);
#endif
"""

DRIVER_C = """
#include "audio_effect_peak_limiter.h"
/* planar [channels][frame_size] in/out, matching process_block's layout */
void* oracle_create(float thr_db, int rate, int ch, float atk, float rel,
                    int delay) {
  AudioEffectPeakLimiter* p = audio_effect_peak_limiter_create();
  audio_effect_peak_limiter_init(p, thr_db, rate, ch, atk, rel, delay);
  return p;
}
int oracle_process(void* p, float* in, float* out, int n) {
  return audio_effect_peak_limiter_process_block(
      (AudioEffectPeakLimiter*)p, in, out, n);
}
void oracle_destroy(void* p) {
  audio_effect_peak_limiter_destroy((AudioEffectPeakLimiter*)p);
}
"""

DEBUG_STUB = """
#ifndef IAMF_DEBUG_H_STUB
#define IAMF_DEBUG_H_STUB
#define ia_loge(...)
#define ia_logw(...)
#define ia_logi(...)
#define ia_logd(...)
#define ia_logt(...)
#endif
"""


@pytest.fixture(scope="module")
def oracle():
    if not os.path.exists(os.path.join(REF, "audio_effect_peak_limiter.c")):
        pytest.skip("reference tree unavailable")
    os.makedirs(BUILD, exist_ok=True)
    shutil.copy(os.path.join(REF, "audio_effect_peak_limiter.c"), BUILD)
    hdr = open(os.path.join(REF, "audio_effect_peak_limiter.h")).read()
    patched = hdr.replace("#define USE_TRUEPEAK 0", "#define USE_TRUEPEAK 1")
    assert patched != hdr, "USE_TRUEPEAK gate not found in reference header"
    open(os.path.join(BUILD, "audio_effect_peak_limiter.h"), "w").write(
        patched)
    meter = METER_C.replace("%TABLE%", emit_truepeak_c_table())
    meter = meter.replace("%TAPS%", str(TP_TAPS)).replace(
        "%PHASES%", str(TP_PHASES))
    open(os.path.join(BUILD, "audio_true_peak_meter.c"), "w").write(meter)
    open(os.path.join(BUILD, "audio_true_peak_meter.h"), "w").write(
        METER_H.replace("%TAPS%", str(TP_TAPS)))
    open(os.path.join(BUILD, "IAMF_debug.h"), "w").write(DEBUG_STUB)
    open(os.path.join(BUILD, "driver.c"), "w").write(DRIVER_C)
    so = os.path.join(BUILD, "liboracle.so")
    subprocess.run(
        ["gcc", "-O2", "-fPIC", "-shared", "-o", so,
         "audio_effect_peak_limiter.c", "audio_true_peak_meter.c",
         "driver.c", "-I.", "-I/root/reference/src/common", "-lm"],
        cwd=BUILD, check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    lib.oracle_create.restype = ctypes.c_void_p
    lib.oracle_create.argtypes = [ctypes.c_float, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_float, ctypes.c_float,
                                  ctypes.c_int]
    lib.oracle_process.restype = ctypes.c_int
    lib.oracle_process.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int]
    lib.oracle_destroy.argtypes = [ctypes.c_void_p]
    return lib


def oracle_run(lib, x: np.ndarray, thr_db=-1.0, delay=240) -> np.ndarray:
    """x: [C, N] -> concatenated oracle output [C, M] (first-call padding
    swallowed by the reference itself), processed in 960-sample blocks."""
    C, N = x.shape
    h = lib.oracle_create(thr_db, 48000, C, 0.001, 0.2, delay)
    outs = []
    fp = ctypes.POINTER(ctypes.c_float)
    for off in range(0, N, 960):
        blk = np.ascontiguousarray(x[:, off:off + 960], np.float32)
        n = blk.shape[1]
        out = np.zeros_like(blk)
        got = lib.oracle_process(h, blk.ctypes.data_as(fp),
                                 out.ctypes.data_as(fp), n)
        assert got >= 0
        # reference compacts the swallowed first call into [C, got] rows
        outs.append(out.reshape(-1)[:C * got].reshape(C, got))
    lib.oracle_destroy(h)
    return np.concatenate(outs, axis=1)


def ours_run(x: np.ndarray, thr_db=-1.0, delay=240) -> np.ndarray:
    lim = Limiter(LimiterConfig(threshold_db=thr_db, channels=x.shape[0],
                                delay_size=delay, true_peak=True))
    outs = [lim.process(x[:, off:off + 960])
            for off in range(0, x.shape[1], 960)]
    return np.concatenate(outs, axis=1)


def _signals():
    rng = np.random.default_rng(7)
    t = np.arange(48000, dtype=np.float64)
    sigs = {}
    # inter-sample peaks: fs/4 tone at 45 deg phase — samples sit at
    # +/-0.707A while the waveform crests at A (the classic case the
    # true-peak meter exists for)
    tone = 0.985 * np.sin(2 * np.pi * 12000.0 / 48000.0 * t + np.pi / 4)
    sigs["isp_tone"] = np.stack([tone, 0.7 * tone]).astype(np.float32)
    # bursts driving attack/release transitions
    burst = rng.normal(0, 0.3, (2, 48000))
    burst[:, 10000:12000] *= 4.0
    burst[:, 30000:30100] *= 6.0
    sigs["bursts"] = np.clip(burst, -1.5, 1.5).astype(np.float32)
    # below threshold everywhere: fast path, meter history still advances
    sigs["quiet"] = (0.25 * rng.normal(0, 1, (2, 20000))).astype(np.float32)
    return sigs


@pytest.mark.parametrize("name", ["isp_tone", "bursts", "quiet"])
def test_truepeak_limiter_matches_reference_oracle(oracle, name):
    x = _signals()[name]
    ref = oracle_run(oracle, x)
    got = ours_run(x)
    n = min(ref.shape[1], got.shape[1])
    assert n > 0.9 * x.shape[1]
    a, b = ref[:, :n], got[:, :n]
    # float32 accumulation-order differences only; compare at s16 LSB
    # granularity like every other e2e bar
    q = lambda v: np.clip(np.rint(v * 32768.0), -32768, 32767)
    assert np.max(np.abs(q(a) - q(b))) <= 1
    if np.mean(q(a) != q(b)) > 0:
        # fraction at exactly 1 LSB must be tiny (trigger-boundary ties)
        assert np.mean(q(a) != q(b)) < 0.02


def test_truepeak_meter_exceeds_sample_peak_on_isp_tone(oracle):
    """The meter must report inter-sample overshoot: for the near-12 kHz
    tone the 4x estimate exceeds the max sample magnitude."""
    x = _signals()["isp_tone"][:1]
    h = truepeak_filters()
    win = np.stack([np.pad(x[0], (TP_TAPS - 1, 0))[TP_TAPS - 1 - i:
                                                   TP_TAPS - 1 - i + x.shape[1]]
                    for i in range(TP_TAPS)], axis=-1)
    ph = win @ h.T
    tp = np.abs(ph).max()
    assert tp > np.abs(x).max() * 1.005
    # and the limiter consequently acts where the sample-peak one idles
    thr = 10 ** (-0.05)  # -1 dB
    assert np.abs(x).max() < thr < tp


def test_truepeak_cross_block_history_carry():
    """Block-size invariance: one 12000-sample call == 125-sample calls
    (pins the tp_hist carry)."""
    rng = np.random.default_rng(3)
    x = np.clip(rng.normal(0, 0.5, (3, 12000)), -1.4, 1.4).astype(np.float32)
    lim1 = Limiter(LimiterConfig(channels=3, true_peak=True))
    y1 = lim1.process(x)
    lim2 = Limiter(LimiterConfig(channels=3, true_peak=True))
    outs = [lim2.process(x[:, o:o + 125]) for o in range(0, 12000, 125)]
    y2 = np.concatenate(outs, axis=1)
    n = min(y1.shape[1], y2.shape[1])
    np.testing.assert_allclose(y1[:, :n], y2[:, :n], atol=2e-7)


def test_truepeak_batched_vs_serial_decode():
    """IAMF_TRUEPEAK=1 end-to-end: the batched decoder's fused limiter
    (pipeline._limiter_block + the pre-branch meter) must match the
    serial api decoder bit-exactly on content with inter-sample peaks."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import vectors
    from iamf_tpu.api import IAMFDecoder
    from iamf_tpu.constants import ChannelLayout
    from iamf_tpu.core.batch_decoder import BatchedStreamDecoder

    # fs/4 tone at 45 deg: true peaks exceed sample peaks (isp_tone class)
    t = np.arange(8 * 960)
    tone = 0.985 * np.sin(2 * np.pi * 12000.0 / 48000.0 * t + np.pi / 4)
    pcm = np.clip(np.stack([tone, 0.8 * tone], 1) * 32767, -32768,
                  32767).astype(np.int16)
    stream, _ = vectors.build_pcm_layout_stream(
        ChannelLayout.STEREO, n_frames=8, pcm_override=pcm)
    os.environ["IAMF_TRUEPEAK"] = "1"
    try:
        dec = IAMFDecoder()
        dec.set_sound_system(0)
        pos = dec.configure(stream)
        chunks = []
        while pos < len(stream):
            consumed, out = dec.decode(stream[pos:])
            if consumed == 0 and out is None:
                break
            pos += consumed
            if out is not None and len(out):
                chunks.append(out)
        _, out = dec.decode(None)
        if out is not None and len(out):
            chunks.append(out)
        serial = np.concatenate(chunks, axis=0)
        batched = BatchedStreamDecoder(stream, sound_system=0,
                                       batch_frames=4).decode_all()
    finally:
        os.environ.pop("IAMF_TRUEPEAK", None)
    n = min(len(serial), len(batched))
    d = np.abs(serial[:n].astype(np.int64) - batched[:n].astype(np.int64))
    assert d.max() <= 1, d.max()
    # and the limiter actually engaged (true peaks above -1 dBTP)
    ref = BatchedStreamDecoder(stream, sound_system=0,
                               batch_frames=4).decode_all()
    assert np.abs(ref[:n].astype(np.int64) -
                  batched[:n].astype(np.int64)).max() > 50
