"""Differential tests of CELT decode stages vs libopus internals.

Each stage runs on identical random entropy-coder states; outputs and
post-op coder positions must match exactly."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from test_opus_entdec import ORACLE, RefDec, _build

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = "/tmp/iamf_tpu_opustest/libentdec_shim.so"
SRC = [
    os.path.join(ROOT, "native", "src", "opus", f)
    for f in ("test_shim.cc", "celt_rate.cc", "celt_energy.cc",
              "celt_tables.cc", "celt_pvq.cc", "celt_bands.cc",
              "celt_mdct.cc", "celt_decoder.cc", "celt_plc.cc",
              "opus_dec.cc")
]


def _build_shim():
    _build()
    srcs = [s for s in SRC if os.path.exists(s)]
    newest = max(os.path.getmtime(s) for s in srcs + [
        os.path.join(ROOT, "native", "src", "opus", "entdec.h"),
        os.path.join(ROOT, "native", "src", "opus", "celt.h"),
    ])
    if not os.path.exists(SHIM) or os.path.getmtime(SHIM) < newest:
        subprocess.run(
            ["g++", "-O2", "-g", "-fPIC", "-shared", "-o", SHIM, *srcs],
            check=True, capture_output=True, text=True,
        )


@pytest.fixture(scope="module")
def env():
    _build_shim()
    ours = ctypes.CDLL(SHIM)
    ours.iamf_ec_new.restype = ctypes.c_void_p
    ours.iamf_ec_new.argtypes = [ctypes.c_char_p, ctypes.c_uint]
    ours.iamf_ec_tell.restype = ctypes.c_int
    ours.iamf_ec_tell.argtypes = [ctypes.c_void_p]
    ref = ctypes.CDLL(ORACLE)
    ref.opus_custom_mode_create.restype = ctypes.c_void_p
    err = ctypes.c_int(0)
    mode = ref.opus_custom_mode_create(48000, 960, ctypes.byref(err))
    assert mode and err.value == 0
    return ours, ref, mode


def _ref_tell(ref, ctx):
    nbits = ctypes.cast(ctypes.byref(ctx, 24),
                        ctypes.POINTER(ctypes.c_int32)).contents.value
    rng = ctypes.cast(ctypes.byref(ctx, 32),
                      ctypes.POINTER(ctypes.c_uint32)).contents.value
    return nbits - rng.bit_length()


def test_init_caps(env):
    ours, ref, mode = env
    for LM in range(4):
        for C in (1, 2):
            a = (ctypes.c_int * 21)()
            b = (ctypes.c_int * 21)()
            ours.iamf_celt_init_caps(a, LM, C)
            ref.init_caps(ctypes.c_void_p(mode), b, LM, C)
            assert list(a) == list(b), (LM, C)


def test_unquant_coarse_energy(env):
    ours, ref, mode = env
    rng = np.random.default_rng(7)
    for trial in range(60):
        n = int(rng.integers(2, 120))
        data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        C = int(rng.integers(1, 3))
        LM = int(rng.integers(0, 4))
        intra = int(rng.integers(0, 2))
        start, end = 0, 21
        oldE = rng.normal(0, 5, size=42).astype(np.float32)
        oa = (ctypes.c_float * 42)(*oldE)
        ob = (ctypes.c_float * 42)(*oldE)

        pa = ours.iamf_ec_new(data, n)
        rd = RefDec(ref, data)
        ours.iamf_celt_unquant_coarse(
            ctypes.c_void_p(pa), start, end, oa, intra, C, LM
        )
        ref.unquant_coarse_energy(
            ctypes.c_void_p(mode), start, end, ob, intra, rd.ctx, C, LM
        )
        assert np.allclose(list(oa), list(ob), atol=1e-5), trial
        assert ours.iamf_ec_tell(ctypes.c_void_p(pa)) == _ref_tell(ref, rd.ctx)


def test_compute_allocation(env):
    ours, ref, mode = env
    rng = np.random.default_rng(11)
    mismatches = 0
    for trial in range(120):
        n = int(rng.integers(4, 300))
        data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        C = int(rng.integers(1, 3))
        LM = int(rng.integers(0, 4))
        start, end = 0, 21
        trim = int(rng.integers(0, 11))
        total = int(rng.integers(0, n * 8 * 8))
        caps_a = (ctypes.c_int * 21)()
        ours.iamf_celt_init_caps(caps_a, LM, C)
        offsets = np.zeros(21, dtype=np.int32)
        nboost = int(rng.integers(0, 4))
        for _ in range(nboost):
            offsets[int(rng.integers(0, 21))] += int(rng.integers(0, 100))
        off_a = (ctypes.c_int * 21)(*offsets.tolist())

        def run(libfn, dec_obj, is_ref):
            intensity = ctypes.c_int(0)
            dual = ctypes.c_int(0)
            balance = ctypes.c_int(0)
            pulses = (ctypes.c_int * 21)()
            ebits = (ctypes.c_int * 21)()
            prio = (ctypes.c_int * 21)()
            if is_ref:
                coded = ref.clt_compute_allocation(
                    ctypes.c_void_p(mode), start, end, off_a, caps_a, trim,
                    ctypes.byref(intensity), ctypes.byref(dual), total,
                    ctypes.byref(balance), pulses, ebits, prio, C, LM,
                    dec_obj.ctx, 0, 0, 0,
                )
            else:
                coded = ours.iamf_celt_compute_allocation(
                    ctypes.c_void_p(dec_obj), start, end, off_a, caps_a, trim,
                    ctypes.byref(intensity), ctypes.byref(dual), total,
                    ctypes.byref(balance), pulses, ebits, prio, C, LM,
                )
            return (coded, intensity.value, dual.value, balance.value,
                    list(pulses), list(ebits), list(prio))

        pa = ours.iamf_ec_new(data, n)
        rd = RefDec(ref, data)
        ra = run(None, pa, False)
        rb = run(None, rd, True)
        assert ra == rb, (trial, C, LM, trim, total, ra[:4], rb[:4])
        assert ours.iamf_ec_tell(ctypes.c_void_p(pa)) == _ref_tell(ref, rd.ctx)


def test_unquant_fine_and_finalise(env):
    ours, ref, mode = env
    rng = np.random.default_rng(13)
    for trial in range(40):
        n = int(rng.integers(16, 200))
        data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        C = int(rng.integers(1, 3))
        fq = rng.integers(0, 8, size=21).astype(np.int32)
        fp = rng.integers(0, 2, size=21).astype(np.int32)
        oldE = rng.normal(0, 5, size=42).astype(np.float32)
        fq_a = (ctypes.c_int * 21)(*fq.tolist())
        fp_a = (ctypes.c_int * 21)(*fp.tolist())
        oa = (ctypes.c_float * 42)(*oldE)
        ob = (ctypes.c_float * 42)(*oldE)
        bits_left = int(rng.integers(0, 30))

        pa = ours.iamf_ec_new(data, n)
        rd = RefDec(ref, data)
        ours.iamf_celt_unquant_fine(ctypes.c_void_p(pa), 0, 21, oa, fq_a, C)
        ref.unquant_fine_energy(ctypes.c_void_p(mode), 0, 21, ob, fq_a, rd.ctx, C)
        ours.iamf_celt_unquant_finalise(
            ctypes.c_void_p(pa), 0, 21, oa, fq_a, fp_a, bits_left, C
        )
        ref.unquant_energy_finalise(
            ctypes.c_void_p(mode), 0, 21, ob, fq_a, fp_a, bits_left, rd.ctx, C
        )
        assert np.allclose(list(oa), list(ob), atol=1e-6), trial
        assert ours.iamf_ec_tell(ctypes.c_void_p(pa)) == _ref_tell(ref, rd.ctx)
