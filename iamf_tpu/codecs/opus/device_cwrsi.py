"""Batched CWRS index->pulse decode on the device (the round-5 entropy
experiment, SURVEY §2.3.1 / §7 hard-part 1).

Measured on the bench content (TRACE.md round 5): the cwrsi walk — PVQ
codeword index -> pulse vector, reference loop in libopus cwrs.c, our host
port in native/src/opus/celt_pvq.cc — is ~60% of the entire Opus host
entropy wall (295 ns/leaf, 0.205 s per 30 s 7.1.4 stream), dwarfing the
range-decoder reads themselves (13%). Unlike those reads, cwrsi is NOT
entropy-coupled: the (N, K, index) triple per leaf is known the moment the
range decoder consumed the index, and nothing downstream of the pulse
values feeds back into the bit consumption. It is therefore the natural
first stage of a device-side PVQ reconstruction.

Formulation (the trick that makes it a TPU program): the per-dimension
search `while U(k', n) > i: k'--` walks a row of the CWRS table that is
THE SAME for every leaf at the same dimension n. Batching leaves and
unrolling dimensions top-down, each step needs only
  - the constant row u_n[j] = U(j, n)  ([132] u32, precomputed), and
  - per-lane compares/reductions against it ([lanes, 132] broadcast),
i.e. pure VPU work with NO gathers from the 2-D table; the two direct
row lookups (p = U(n, k+1), q = U(n, n)) read the same constant row.
Lanes with smaller N idle (masked) until the global dimension counter
drops into their range, then run the identical update; the closing n=2 /
n=1 forms are elementwise. Output pulses land in walk order and one final
gather re-aligns them per leaf.

Bit-exactness: validated against the host cwrsi on every leaf of real
bench content (tools/cwrsi_experiment.py; tests/test_device_cwrsi.py pins
a representative corpus).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U_MAX_N = 212
U_MAX_K = 132
N_MAX = 96   # largest PVQ leaf dimension at 48 kHz (celt_pvq.cc census)
K_MAX = 128


@functools.lru_cache(maxsize=None)
def u_table() -> np.ndarray:
    """U(n,k) CWRS count table, identical to celt_pvq.cc u_table():
    u64 DP saturated to u32."""
    dp = np.zeros((U_MAX_N, U_MAX_K), np.uint64)
    for n in range(1, U_MAX_N):
        dp[n, 1] = 1
        for k in range(2, U_MAX_K):
            v = dp[n - 1, k] + dp[n, k - 1] + dp[n - 1, k - 1]
            dp[n, k] = min(v, 0xFFFFFFFF)
    return dp.astype(np.uint32)


@functools.lru_cache(maxsize=None)
def u_rows() -> np.ndarray:
    """[N_MAX + 1, U_MAX_K] u32: row d holds u_d[j] = U(j, d) (symmetric
    canonicalization of the 2-D table), the per-dimension constant the
    kernel broadcasts against. Saturated (overflow) entries stay huge so
    they never win a <=i compare."""
    t = u_table()
    rows = np.empty((N_MAX + 1, U_MAX_K), np.uint32)
    for d in range(N_MAX + 1):
        for j in range(U_MAX_K):
            a, b = max(j, d), min(j, d)
            rows[d, j] = t[a, b] if a < U_MAX_N else 0xFFFFFFFF
    return rows


def _search_le(u_row, i, upper):
    """max{k' <= upper : u_row[k'] <= i} — the do{p=U(--k,n)}while(p>i)
    loop as one broadcast compare. u_row is nondecreasing, so the <=i set
    is a prefix and count-1 is its max index. u_row[0] = 0 <= i always."""
    j = jnp.arange(U_MAX_K, dtype=jnp.int32)
    mask = (u_row[None, :] <= i[:, None]) & (j[None, :] <= upper[:, None])
    return jnp.sum(mask.astype(jnp.int32), axis=1) - 1


@jax.jit
def cwrsi_batch(n, k, idx):
    """Decode a batch of PVQ leaves: (n, k, idx) int32/uint32 [L] ->
    pulses int32 [L, N_MAX] (entries beyond a leaf's n are 0).

    Mirrors celt_pvq.cc cwrsi() exactly; dimensions unroll from N_MAX down
    to 3, then the closed n==2 / n==1 forms."""
    L = n.shape[0]
    rows = jnp.asarray(u_rows())
    i = idx.astype(jnp.uint32)
    kk = k.astype(jnp.int32)
    n0 = n.astype(jnp.int32)
    outs = []

    def step(d, kk, i):
        """One dimension of the walk (C loop body for current dim d)."""
        u_d = rows[d]
        take = lambda v: jnp.take(u_d, jnp.clip(v, 0, U_MAX_K - 1))
        ge = kk >= d  # "lots of pulses" branch
        # ---- branch A (k >= n): p = U(n, k+1); s = i >= p; i -= p&s
        pA = take(kk + 1)
        sA = ge & (i >= pA)
        iA = jnp.where(sA, i - pA, i)
        q = u_d[d]  # U(n, n)
        upperA = jnp.where(q > iA, d - 1, kk)
        kA = _search_le(u_d, iA, upperA)
        pA2 = take(kA)
        iA2 = iA - jnp.where(ge, pA2, 0)
        # ---- branch B (k < n)
        p0 = take(kk)
        qB = take(kk + 1)
        zero = (~ge) & (p0 <= i) & (i < qB)
        sB = (~ge) & ~zero & (i >= qB)
        iB = jnp.where(zero, i - p0, jnp.where(sB, i - qB, i))
        kB = _search_le(u_d, iB, kk - 1)
        pB2 = take(kB)
        iB2 = jnp.where(zero, iB, iB - jnp.where(~ge, pB2, 0))
        # ---- merge
        s = jnp.where(ge, sA, sB)
        k_new = jnp.where(ge, kA, jnp.where(zero, kk, kB))
        i_new = jnp.where(ge, iA2, iB2)
        si = jnp.where(s, jnp.int32(-1), jnp.int32(0))
        y = jnp.where(zero, 0, ((kk - k_new + si) ^ si))
        # inactive lanes (their walk hasn't started / already closed)
        act = (n0 >= d)
        return (jnp.where(act, k_new, kk), jnp.where(act, i_new, i),
                jnp.where(act, y, 0))

    for d in range(N_MAX, 2, -1):
        kk, i, y = step(d, kk, i)
        outs.append(y)

    # n == 2 closing form
    p = (2 * kk.astype(jnp.uint32) + 1)
    s2 = i >= p
    i = jnp.where(s2, i - p, i)
    k0 = kk
    kk = ((i + 1) >> 1).astype(jnp.int32)
    i = jnp.where(kk > 0, i - (2 * kk.astype(jnp.uint32) - 1), i)
    si = jnp.where(s2, jnp.int32(-1), jnp.int32(0))
    outs.append((k0 - kk + si) ^ si)
    # n == 1 closing form (C: s = -(int)i — i is 0/1 in valid streams,
    # but mirror the arithmetic exactly)
    si = -(i.astype(jnp.int32))
    outs.append((kk + si) ^ si)

    walk = jnp.stack(outs, axis=0)  # [N_MAX, L] in walk (dim-desc) order
    # leaf-local coefficient j was emitted at walk step (N_MAX - n0 + j)
    j = jnp.arange(N_MAX, dtype=jnp.int32)[None, :]
    src = jnp.clip(N_MAX - n0[:, None] + j, 0, N_MAX - 1)
    y = jnp.take_along_axis(walk.T, src, axis=1)
    return jnp.where(j < n0[:, None], y, 0)


def host_reference(n, k, idx) -> np.ndarray:
    """Host cwrsi via the native lib (the oracle for the kernel)."""
    import ctypes
    import os

    lib = ctypes.CDLL(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "..", "..", "native", "lib", "libiamf_native.so"))
    cnt = len(n)
    y = np.zeros((cnt, 208), np.int32)
    lib.iamf_cwrsi_bench.restype = ctypes.c_longlong
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    lib.iamf_cwrsi_bench(
        ip(np.ascontiguousarray(n, np.int32)),
        ip(np.ascontiguousarray(k, np.int32)),
        np.ascontiguousarray(idx, np.uint32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint32)),
        int(cnt), 1, ip(y))
    return y[:, :N_MAX]
