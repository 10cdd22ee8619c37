"""Resampler parity vs the reference's vendored speexdsp resampler
(resample.c, quality 4), built standalone as an oracle and driven through
its public API — covers both the interpolated path (44.1k<->48k) and the
direct path (integer-ratio rates)."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

ORACLE = "/tmp/iamf_tpu_resampleref/libspeexref.so"


@pytest.fixture(scope="module")
def oracle():
    if not os.path.exists(ORACLE):
        os.makedirs(os.path.dirname(ORACLE), exist_ok=True)
        subprocess.run(
            ["gcc", "-O2", "-fPIC", "-shared",
             "-I/root/reference/src/iamf_dec",
             "-o", ORACLE, "/root/reference/src/iamf_dec/resample.c", "-lm"],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(ORACLE)
    lib.speex_resampler_init.restype = ctypes.c_void_p
    return lib


def ref_resample(lib, x, in_rate, out_rate, chunks=None, quality=4):
    """Drive the oracle like iamf_resample does (interleaved float,
    skip_zeros at open)."""
    C, T = x.shape
    err = ctypes.c_int(0)
    st = lib.speex_resampler_init(C, in_rate, out_rate, quality,
                                  ctypes.byref(err))
    assert st and err.value == 0
    lib.speex_resampler_skip_zeros(ctypes.c_void_p(st))
    outs = []
    pos = 0
    for n in chunks or [T]:
        xi = np.ascontiguousarray(x[:, pos:pos + n].T.reshape(-1))
        n_in = ctypes.c_uint(n)
        cap = n * out_rate // in_rate + 256
        buf = np.zeros(cap * C, np.float32)
        n_out = ctypes.c_uint(cap)
        lib.speex_resampler_process_interleaved_float(
            ctypes.c_void_p(st),
            xi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(n_in),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(n_out))
        assert n_in.value == n
        outs.append(buf[: n_out.value * C].reshape(-1, C).T)
        pos += n
    lib.speex_resampler_destroy(ctypes.c_void_p(st))
    return np.concatenate(outs, axis=1)


def signal(T, C=2, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(T)
    x = np.zeros((C, T), np.float32)
    for c in range(C):
        for f in (0.01, 0.037, 0.113, 0.31):
            x[c] += 0.2 * np.sin(2 * np.pi * f * t + c + f).astype(np.float32)
    x += 0.02 * rng.standard_normal((C, T)).astype(np.float32)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


def check(lib, in_rate, out_rate, chunks=None, T=20000, ulps=4.0):
    from iamf_tpu.dsp.resample import Resampler

    x = signal(T)
    ref = ref_resample(lib, x, in_rate, out_rate, chunks)
    r = Resampler(2, in_rate, out_rate)
    if chunks:
        outs, pos = [], 0
        for n in chunks:
            outs.append(r.process(x[:, pos:pos + n]))
            pos += n
        ours = np.concatenate(outs, axis=1)
    else:
        ours = r.process(x)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    # accumulation runs in float64 here vs sequential float32 in the
    # reference direct path: allow a few float32 ulps
    tol = ulps * np.float32(1.0) * 2.0 ** -23
    d = np.abs(ours - ref)
    assert d.max() <= tol, (d.max(), np.unravel_index(d.argmax(), d.shape))


def test_interpolated_441_to_48(oracle):
    check(oracle, 44100, 48000)


def test_interpolated_48_to_441(oracle):
    check(oracle, 48000, 44100)


def test_direct_upsample_32_to_48(oracle):
    check(oracle, 32000, 48000)


def test_direct_upsample_16_to_48(oracle):
    check(oracle, 16000, 48000)


def test_direct_downsample_48_to_16(oracle):
    check(oracle, 48000, 16000)


def test_chunked_streaming_matches(oracle):
    """Frame-sized chunks must hit the same state trajectory (960-sample
    frames like the decoder's per-frame resample calls)."""
    check(oracle, 44100, 48000, chunks=[960] * 12 + [480, 7])


def test_heavy_downsample_oversample_halving(oracle):
    """48k->8k triggers the oversample>>=1 branches in update_filter."""
    check(oracle, 48000, 8000)


@pytest.mark.parametrize("rates", [(44100, 48000), (48000, 44100),
                                   (32000, 48000), (16000, 48000)])
def test_device_resampler_matches_host(rates):
    """DeviceResampler (gathered-window einsum in a lax.scan with overlap-
    save carry, SURVEY §2.3.6) vs the streaming speexdsp-parity host
    Resampler: same output count, <=1e-5 absolute (float accumulation
    order only) across up/down/integer-ratio pairs."""
    import numpy as np
    from iamf_tpu.dsp.resample import DeviceResampler, Resampler

    in_rate, out_rate = rates
    rng = np.random.RandomState(11)
    C, T = 2, 7777  # deliberately not a chunk multiple
    x = (rng.randn(C, T) * 0.4).astype(np.float32)
    h = Resampler(C, in_rate, out_rate)
    parts = [h.process(x[:, i:i + 960]) for i in range(0, T, 960)]
    d = h.drain()
    if d is not None and d.shape[1]:
        parts.append(d)
    want = np.concatenate(parts, axis=1)
    dev = DeviceResampler(C, in_rate, out_rate)
    got = np.asarray(dev.resample_stream(x))
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-5
