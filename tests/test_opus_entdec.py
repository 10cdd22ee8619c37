"""Differential fuzz: iamf-tpu range decoder vs the reference entropy
decoder (libopus ec_dec_* linked as an oracle), op-for-op on random data."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = "/tmp/iamf_tpu_opustest/libentdec_shim.so"
ORACLE = "/tmp/iamf_tpu_opusref/libopusref.so"


def _build():
    os.makedirs(os.path.dirname(SHIM), exist_ok=True)
    opus_dir = os.path.join(ROOT, "native", "src", "opus")
    srcs = [
        os.path.join(opus_dir, f)
        for f in os.listdir(opus_dir)
        if f.endswith(".cc")
    ]
    newest = max(
        os.path.getmtime(s)
        for s in srcs + [os.path.join(opus_dir, "entdec.h"),
                         os.path.join(opus_dir, "celt.h")]
    )
    if not os.path.exists(SHIM) or os.path.getmtime(SHIM) < newest:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-o", SHIM, *srcs],
            check=True, capture_output=True,
        )
    if not os.path.exists(ORACLE):
        subprocess.run(
            ["g++", "-shared", "-o", ORACLE, "-Wl,--whole-archive",
             "/root/reference/dep_codecs/lib/libopus.a",
             "-Wl,--no-whole-archive", "-lm"],
            check=True, capture_output=True,
        )


class RefDec:
    """ctypes view of the reference ec_dec (entcode.h ec_ctx layout)."""

    def __init__(self, lib, buf: bytes):
        self.lib = lib
        self.buf = ctypes.create_string_buffer(bytes(buf), len(buf))
        self.ctx = ctypes.create_string_buffer(128)
        lib.ec_dec_init(self.ctx, self.buf, ctypes.c_uint(len(buf)))

    def _u32(self, off):
        return ctypes.cast(
            ctypes.byref(self.ctx, off), ctypes.POINTER(ctypes.c_uint32)
        ).contents.value

    def _i32(self, off):
        return ctypes.cast(
            ctypes.byref(self.ctx, off), ctypes.POINTER(ctypes.c_int32)
        ).contents.value

    def tell(self):
        nbits_total = self._i32(24)
        rng = self._u32(32)
        return nbits_total - max(rng.bit_length(), 0)

    def decode(self, ft):
        return self.lib.ec_decode(self.ctx, ctypes.c_uint(ft))

    def decode_bin(self, b):
        return self.lib.ec_decode_bin(self.ctx, ctypes.c_uint(b))

    def update(self, fl, fh, ft):
        self.lib.ec_dec_update(self.ctx, fl, fh, ft)

    def bit_logp(self, logp):
        return self.lib.ec_dec_bit_logp(self.ctx, ctypes.c_uint(logp))

    def icdf(self, tab, ftb):
        t = (ctypes.c_ubyte * len(tab))(*tab)
        return self.lib.ec_dec_icdf(self.ctx, t, ctypes.c_uint(ftb))

    def bits(self, n):
        return self.lib.ec_dec_bits(self.ctx, ctypes.c_uint(n))

    def uint(self, ft):
        return self.lib.ec_dec_uint(self.ctx, ctypes.c_uint(ft))

    def tell_frac(self):
        return self.lib.ec_tell_frac(self.ctx)

    def laplace(self, fs, decay):
        return self.lib.ec_laplace_decode(self.ctx, ctypes.c_uint(fs), decay)


class OurDec:
    def __init__(self, lib, buf: bytes):
        self.lib = lib
        self.buf = ctypes.create_string_buffer(bytes(buf), len(buf))
        self.p = lib.iamf_ec_new(self.buf, len(buf))

    def decode(self, ft):
        return self.lib.iamf_ec_decode(self.p, ft)

    def decode_bin(self, b):
        return self.lib.iamf_ec_decode_bin(self.p, b)

    def update(self, fl, fh, ft):
        self.lib.iamf_ec_update(self.p, fl, fh, ft)

    def bit_logp(self, logp):
        return self.lib.iamf_ec_bit_logp(self.p, logp)

    def icdf(self, tab, ftb):
        return self.lib.iamf_ec_icdf(self.p, bytes(tab), ftb)

    def bits(self, n):
        return self.lib.iamf_ec_bits(self.p, n)

    def uint(self, ft):
        return self.lib.iamf_ec_uint(self.p, ft)

    def tell(self):
        return self.lib.iamf_ec_tell(self.p)

    def tell_frac(self):
        return self.lib.iamf_ec_tell_frac(self.p)

    def laplace(self, fs, decay):
        return self.lib.iamf_ec_laplace(self.p, fs, decay)


@pytest.fixture(scope="module")
def libs():
    _build()
    ours = ctypes.CDLL(SHIM)
    ours.iamf_ec_new.restype = ctypes.c_void_p
    ours.iamf_ec_new.argtypes = [ctypes.c_char_p, ctypes.c_uint]
    for f in ["iamf_ec_decode", "iamf_ec_decode_bin", "iamf_ec_bits",
              "iamf_ec_uint", "iamf_ec_tell_frac"]:
        getattr(ours, f).restype = ctypes.c_uint
    ours.iamf_ec_tell.restype = ctypes.c_int
    ours.iamf_ec_laplace.restype = ctypes.c_int
    for f in ["iamf_ec_decode", "iamf_ec_decode_bin", "iamf_ec_update",
              "iamf_ec_bit_logp", "iamf_ec_icdf", "iamf_ec_bits",
              "iamf_ec_uint", "iamf_ec_tell", "iamf_ec_tell_frac",
              "iamf_ec_laplace", "iamf_ec_free"]:
        fn = getattr(ours, f)
        fn.argtypes = [ctypes.c_void_p] + {
            "iamf_ec_decode": [ctypes.c_uint],
            "iamf_ec_decode_bin": [ctypes.c_uint],
            "iamf_ec_update": [ctypes.c_uint] * 3,
            "iamf_ec_bit_logp": [ctypes.c_uint],
            "iamf_ec_icdf": [ctypes.c_char_p, ctypes.c_uint],
            "iamf_ec_bits": [ctypes.c_int],
            "iamf_ec_uint": [ctypes.c_uint],
            "iamf_ec_laplace": [ctypes.c_uint, ctypes.c_int],
        }.get(f, [])
    ref = ctypes.CDLL(ORACLE)
    ref.ec_decode.restype = ctypes.c_uint
    ref.ec_decode_bin.restype = ctypes.c_uint
    ref.ec_dec_bits.restype = ctypes.c_uint
    ref.ec_dec_uint.restype = ctypes.c_uint
    ref.ec_tell_frac.restype = ctypes.c_uint
    ref.ec_laplace_decode.restype = ctypes.c_int
    return ours, ref


def _rand_icdf(rng, n):
    """Strictly decreasing icdf ending at 0 with ft=2^ftb implied."""
    vals = sorted(rng.integers(1, 255, size=n - 1).tolist(), reverse=True)
    return list(dict.fromkeys(vals + [0]))


def test_differential_fuzz(libs):
    ours_lib, ref_lib = libs
    rng = np.random.default_rng(42)
    for trial in range(40):
        n = int(rng.integers(4, 200))
        data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        a = OurDec(ours_lib, data)
        b = RefDec(ref_lib, data)
        for step in range(120):
            op = int(rng.integers(0, 6))
            if op == 0:
                ft = int(rng.integers(2, 1 << 15))
                sa, sb = a.decode(ft), b.decode(ft)
                assert sa == sb, (trial, step, "decode")
                w = max(1, ft // 8)
                fl = (sa // w) * w
                fh = min(ft, fl + w)
                a.update(fl, fh, ft)
                b.update(fl, fh, ft)
            elif op == 1:
                logp = int(rng.integers(1, 15))
                assert a.bit_logp(logp) == b.bit_logp(logp), (trial, step)
            elif op == 2:
                tab = _rand_icdf(rng, int(rng.integers(2, 10)))
                ftb = int(rng.integers(8, 16))
                assert a.icdf(bytes(tab), ftb) == b.icdf(bytes(tab), ftb)
            elif op == 3:
                nb = int(rng.integers(1, 25))
                assert a.bits(nb) == b.bits(nb), (trial, step, "bits")
            elif op == 4:
                ft = int(rng.integers(2, 1 << 20))
                assert a.uint(ft) == b.uint(ft), (trial, step, "uint")
            else:
                fs = int(rng.integers(1, 32000))
                decay = int(rng.integers(0, 16384))
                va, vb = a.laplace(fs, decay), b.laplace(fs, decay)
                assert va == vb, (trial, step, "laplace", va, vb)
            assert a.tell() == b.tell(), (trial, step, "tell")
            assert a.tell_frac() == b.tell_frac(), (trial, step, "tell_frac")
