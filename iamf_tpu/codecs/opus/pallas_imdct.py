"""Fused Pallas TPU kernel for the CELT synthesis filterbank.

Replaces the jnp IMDCT + TDAC-overlap stage of ``tpu_synth._imdct_overlap``
(reference behavior: celt/mdct.c clt_mdct_backward + the celt_decoder.c
window loop) with ONE kernel per frame batch.

The trick: every output sample of a frame is *linear* in (spectrum,
previous frame's raw MDCT tail) — the IMDCT, the TDAC mirror, the window
products, the short-block interleave, everything. So the whole filterbank
collapses to

    y      = freq @ A_mode.T + tail @ C_mode.T      (mode = long | short)
    tail'  = freq @ D_mode.T

with constant matrices A [960, 960], C [960, 60], D [60, 960] precomputed
once (in float64) per mode. On TPU that is two MXU matmuls per frame —
no gathers, no reversals, no cross-lane shuffles — and the sequential
frame chain (each frame overlaps with its predecessor's tail) rides the
Pallas grid: grid steps execute in order on a core, so the tail lives in
a VMEM scratch buffer that carries across steps, and the spectrum/output
blocks stream HBM->VMEM->HBM one frame at a time. XLA's version of the
same math materializes the full [B, L, 960] raw-IMDCT tensor plus both
window branches in HBM; the fused kernel writes only the final PCM.

Numerics: A/C/D are formed in float64 and rounded once to float32, so the
window*basis products differ from the jnp path (window applied after the
matmul) by <= 1 ulp; on 32768-scale CELT spectra the observed output delta
is < 2e-2 (tests/test_opus_pallas.py asserts < 0.25). That delta stacks
with the jnp path's own <=1-LSB deviation from the host decoder, so the
fused path's parity bar vs the host decoder is <=2 LSB at s16 worst case.
First use on a real TPU cross-checks fused-vs-jnp numerics on device and
falls back to the jnp path on any failure (see enabled()).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAME = 960
OVER = 60  # TDAC mirror half-overlap (celt overlap=120, mirror mixes 60)


def _basis64(n2: int) -> np.ndarray:
    """IMDCT basis in float64: t[m] = sum_k X[k] cos(2pi/N (m+N/2+.5)(k+.5))."""
    n = 2 * n2
    m = np.arange(n2)[:, None].astype(np.float64)
    k = np.arange(n2)[None, :].astype(np.float64)
    return np.cos(2.0 * np.pi / n * (m + n / 2.0 + 0.5) * (k + 0.5))


@functools.lru_cache(maxsize=None)
def _fused_mats():
    """(A_long, A_short, C_long, C_short, D_long, D_short), float32,
    transposed ready for ``dot(x, M)`` (contraction dim first)."""
    from .tpu_synth import _tables

    w = np.asarray(_tables()[0], np.float64)  # [120] celt window
    bl = _basis64(FRAME)   # [m, k] long raw IMDCT
    b120 = _basis64(120)
    # combined short basis: block j (stride-8 interleave, tpu_synth fs)
    bs = np.zeros((FRAME, FRAME), np.float64)
    for j in range(8):
        bs[j * 120:(j + 1) * 120, j::8] = b120

    i = np.arange(OVER)
    wl = w[119 - i]  # mirror window, left half
    wr = w[i]

    a_l = np.zeros((FRAME, FRAME), np.float64)
    c_l = np.zeros((FRAME, OVER), np.float64)
    # y[i]    = wl[i]*tail[i]        - wr[i]*t[59-i]
    a_l[i] = -wr[:, None] * bl[59 - i]
    c_l[i, i] = wl
    # y[60+i] = wl[59-i]*t[i]        + wr[59-i]*tail[59-i]
    a_l[60 + i] = wl[59 - i][:, None] * bl[i]
    c_l[60 + i, 59 - i] = wr[59 - i]
    # y[120:] = t[60:900]
    a_l[120 + np.arange(840)] = bl[60:900]
    d_l = bl[900:960]

    a_s = np.zeros((FRAME, FRAME), np.float64)
    c_s = np.zeros((FRAME, OVER), np.float64)
    for j in range(8):
        pj = bs[(j - 1) * 120 + 60:(j - 1) * 120 + 120] if j else None
        r0 = j * 120 + i
        a_s[r0] = -wr[:, None] * bs[j * 120 + 59 - i]
        if j:
            a_s[r0] += wl[:, None] * pj[i]
        else:
            c_s[r0, i] = wl
        r1 = j * 120 + 60 + i
        a_s[r1] = wl[59 - i][:, None] * bs[j * 120 + i]
        if j:
            a_s[r1] += wr[59 - i][:, None] * pj[59 - i]
        else:
            c_s[r1, 59 - i] = wr[59 - i]
    d_s = bs[7 * 120 + 60:7 * 120 + 120]

    t32 = lambda m: np.ascontiguousarray(m.T).astype(np.float32)
    return (t32(a_l), t32(a_s), t32(c_l), t32(c_s), t32(d_l), t32(d_s))


def _kernel(freq_ref, trans_ref, tail0_ref,
            atl_ref, ats_ref, ctl_ref, cts_ref, dtl_ref, dts_ref,
            y_ref, tail_out_ref, tail_scr):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        tail_scr[:] = tail0_ref[:]

    freq = freq_ref[0]          # [L, 960]
    trans = trans_ref[0, 0]     # [L]
    tail = tail_scr[:]          # [L, 60]
    y_l = (jnp.dot(freq, atl_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
           + jnp.dot(tail, ctl_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST))
    y_s = (jnp.dot(freq, ats_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
           + jnp.dot(tail, cts_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST))
    # insert the minor dim on the i32 vector BEFORE the bool compare:
    # Mosaic only supports non-no-op minor-dim insertion for 32-bit types
    m = trans[:, None] != 0
    y_ref[0] = jnp.where(m, y_s, y_l)
    nt = jnp.where(
        m,
        jnp.dot(freq, dts_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST),
        jnp.dot(freq, dtl_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST),
    )
    tail_scr[:] = nt
    tail_out_ref[:] = nt


def fused_imdct_overlap(freq, transient, tail0, *, interpret=False):
    """Drop-in for tpu_synth._imdct_overlap: (y [B,L,960], tail [L,60]).

    freq: [B, L, 960] denormalised spectra; transient: [B, L] bool;
    tail0: [L, 60] previous batch's raw MDCT tail carry.
    """
    B, L, _ = freq.shape
    mats = [jnp.asarray(m) for m in _fused_mats()]
    const_spec = [
        pl.BlockSpec(m.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for m in mats
    ]
    y, tail = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, FRAME), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # [B, 1, L] so the block's last-two dims (1, L) equal the
            # array's — Mosaic requires (8, 128)-divisible or full-dim
            # blocks in the minor two positions (real-TPU lowering rule;
            # the (1, L) 2-D block compiled under interpret but not on
            # hardware)
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, OVER), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + const_spec,
        out_specs=[
            pl.BlockSpec((1, L, FRAME), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, OVER), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, FRAME), jnp.float32),
            jax.ShapeDtypeStruct((L, OVER), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((L, OVER), jnp.float32)],
        interpret=interpret,
    )(freq, transient.astype(jnp.int32)[:, None, :], tail0, *mats)
    return y, tail


# VMEM ceiling: the six constant matrices are ~9.4 MB after tile padding,
# plus double-buffered [1, L, 960] freq/output blocks (2 * 2 * L * 3.75 KB).
# Past this lane count the pallas_call would exceed VMEM at compile time;
# the caller falls back to the jnp path instead.
LANE_LIMIT = 256

_runtime = {"checked": False, "ok": False}


def _runtime_check() -> bool:
    """One-time Mosaic-compile + numerics cross-check on the live backend.

    The unit tests exercise the kernel through the Pallas interpreter on
    CPU only, so a real-TPU compile failure or numeric divergence (the
    960/60 dims are not tile-aligned) would otherwise ship silently on the
    main decode path. First use runs a tiny fused-vs-jnp comparison on
    device; any exception or mismatch disables the kernel for the process
    (the jnp path is the equivalence oracle, tests/test_opus_pallas.py).
    """
    from . import tpu_synth

    try:
        rng = np.random.RandomState(0)
        freq = jnp.asarray(rng.randn(3, 2, FRAME).astype(np.float32) * 4096)
        trans = jnp.asarray(
            np.array([[0, 1], [1, 0], [0, 0]], np.bool_))
        tail0 = jnp.asarray(rng.randn(2, OVER).astype(np.float32) * 64)
        y_f, t_f = fused_imdct_overlap(freq, trans, tail0)
        y_j, t_j = tpu_synth._imdct_overlap_jnp(freq, trans, tail0)
        scale = float(jnp.max(jnp.abs(y_j)))
        tol = 1e-5 * max(scale, 1.0) + 1e-3
        ok = (float(jnp.max(jnp.abs(y_f - y_j))) <= tol
              and float(jnp.max(jnp.abs(t_f - t_j))) <= tol)
        return ok
    except Exception:
        return False


def enabled(lanes: int | None = None) -> bool:
    """Use the fused kernel on real TPU backends (opt-out via env).

    The env var is re-read on every call (it is cheap) so setting
    IAMF_PALLAS_IMDCT=0 mid-process reliably disables the kernel; the
    first enabled use cross-checks fused-vs-jnp numerics on device.
    """
    if os.environ.get("IAMF_PALLAS_IMDCT", "1") == "0":
        return False
    if lanes is not None and lanes > LANE_LIMIT:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    if not _runtime["checked"]:
        _runtime["checked"] = True  # set first: the check calls back in
        _runtime["ok"] = _runtime_check()
    return _runtime["ok"]
