"""Fused Pallas CELT filterbank vs the jnp reference path.

The kernel (codecs/opus/pallas_imdct.py) folds IMDCT + TDAC windowing +
short-block interleave into constant matrices; these tests check it against
tpu_synth's jnp implementation (itself validated <=1 LSB vs the native host
decoder) on CPU via the Pallas interpreter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from iamf_tpu.codecs.opus import pallas_imdct, tpu_synth


def _run_both(B, L, seed, trans_pattern):
    rng = np.random.RandomState(seed)
    # CELT spectra are denormalised so the IMDCT lands at s16 PCM scale:
    # per-bin magnitude ~32768/sqrt(960) for a full-scale signal
    freq = rng.randn(B, L, 960).astype(np.float32) * 1000.0
    tail0 = rng.randn(L, 60).astype(np.float32) * 1024.0
    trans = trans_pattern(rng, B, L)
    y_ref, tail_ref = tpu_synth._imdct_overlap(
        jnp.asarray(freq), jnp.asarray(trans), jnp.asarray(tail0))
    y_pl, tail_pl = pallas_imdct.fused_imdct_overlap(
        jnp.asarray(freq), jnp.asarray(trans), jnp.asarray(tail0),
        interpret=True)
    return (np.asarray(y_ref), np.asarray(tail_ref),
            np.asarray(y_pl), np.asarray(tail_pl))


@pytest.mark.parametrize("pattern,name", [
    (lambda rng, B, L: np.zeros((B, L), bool), "all-long"),
    (lambda rng, B, L: np.ones((B, L), bool), "all-short"),
    (lambda rng, B, L: rng.rand(B, L) < 0.4, "mixed-per-lane"),
])
def test_fused_matches_jnp(pattern, name):
    y_ref, tail_ref, y_pl, tail_pl = _run_both(6, 3, 7, pattern)
    # constant-matrix fold rounds window*basis once in f64->f32; the
    # synthesis rounds to s16 at 32768 full scale (1 LSB = 1.0), so this
    # 0.25 fused-vs-jnp bound can stack with the jnp path's own <=1-LSB
    # deviation from the host decoder: the fused path's documented parity
    # bar vs the host decoder is <=2 LSB worst case.
    assert np.abs(y_pl - y_ref).max() < 0.25, name
    assert np.abs(tail_pl - tail_ref).max() < 0.25, name


def test_tail_chains_across_frames():
    """Frame b's mirror must use frame b-1's raw tail (grid carry)."""
    y_ref, tail_ref, y_pl, tail_pl = _run_both(
        5, 2, 11, lambda rng, B, L: rng.rand(B, L) < 0.5)
    # the overlap region (first 120 samples) is where the carry shows up
    assert np.abs(y_pl[1:, :, :120] - y_ref[1:, :, :120]).max() < 0.25


def test_enabled_gate(monkeypatch):
    # env var is re-read on every call: mid-process opt-out must stick
    monkeypatch.setenv("IAMF_PALLAS_IMDCT", "0")
    assert pallas_imdct.enabled() is False
    monkeypatch.delenv("IAMF_PALLAS_IMDCT")
    # lane-count VMEM ceiling gates the kernel off regardless of backend
    assert pallas_imdct.enabled(lanes=pallas_imdct.LANE_LIMIT + 1) is False
