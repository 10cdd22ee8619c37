"""Output quantization + interleave (reference: iamf_decoder_plane2stride_out,
IAMF_decoder.c:121-167).

FLOAT2INT16/24/32 (:102-119): scale by 2^(bits-1), clamp to the integer
range, round with lrintf (round-half-to-even) — jnp.rint matches. Planar
[C, T] float -> interleaved [T, stride] int (stride > C zero-pads, used by
the SAMSUNG_TV 12-channel output mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_interleave(x, bits: int, stride: int = 0):
    """x: [C, T] float32 -> [T, stride] int16 (bits=16) or int32 (24/32)."""
    C, T = x.shape
    stride = stride or C
    scale = jnp.float32(2.0 ** (bits - 1))
    lo = -(2 ** (bits - 1))
    hi = 2 ** (bits - 1) - 1
    v = x.astype(jnp.float32) * scale
    # clamp-then-rint == rint-then-clip for these bounds
    v = jnp.rint(jnp.clip(v, lo, hi))
    dtype = jnp.int16 if bits == 16 else jnp.int32
    v = v.astype(dtype)
    out = jnp.zeros((stride, T), dtype=dtype).at[:C].set(v)
    return out.T


def dequantize_planar(pcm, bits: int):
    """Interleaved int [T, C] -> planar float32 [C, T], scale 2^-(bits-1)."""
    scale = jnp.float32(2.0 ** -(bits - 1))
    return pcm.T.astype(jnp.float32) * scale
