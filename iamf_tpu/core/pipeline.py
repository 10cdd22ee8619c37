"""Batched, fused TPU decode pipeline.

The reference decodes frame-serially (one access unit per IAMF_decoder_decode
call). TPU-natively, the pipeline is one jitted program over a *batch* of
frames per (mix presentation, output layout) specialization, with shape-
static [batch, channels, frame_size] inputs (SURVEY.md §7):

    per element:  demix chains (VPU elementwise, vmapped over the batch)
                  -> render matmul (MXU einsum, per-frame matrices)
                  -> per-sample element mix gain
    mix:          sum over elements
    output gain:  per-sample multiply
    limiter:      lax.scan over frames; per-sample gain recurrence inside,
                  with a below-threshold fast path per frame
    quantize:     round-half-even + interleave

Everything sequential-but-tiny (demix mode/w-index walk, recon-gain EMA,
mix-gain curve evaluation) runs on the host and enters as dense per-frame
tensors; the only true per-sample recurrence on device is the limiter
envelope.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.demix import DemixSpec, demix_frame
from ..dsp.limiter import LimiterConfig, _gain_step, init_state
from ..dsp.quantize import quantize_interleave


@dataclasses.dataclass(frozen=True)
class ElementSpec:
    """Static config of one element in the pipeline."""

    demix: Optional[DemixSpec]  # None => passthrough (scene-based pre-mixed)
    n_in: int  # decoded channels entering the pipeline
    n_rendered: int  # channels after demix/reorder (render matrix rows input)
    render_offset: int = 0  # DMRenderer offset split position (codec delay)
    input_scale: float = 1.0  # applied when x arrives as integers (device-
    #   side int->float conversion halves host->device transfer volume)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    frame_size: int
    out_channels: int
    bits: int
    elements: tuple[ElementSpec, ...]
    limiter: Optional[LimiterConfig]
    n_rg: int = 0  # recon-gain smoothed channel count (max over elements)


def _limiter_block(cfg: LimiterConfig, state: dict, x):
    """One frame through the limiter (shared with dsp.limiter.process_block
    but inline-able inside a scan)."""
    D = cfg.delay_size
    T = x.shape[1]
    peaks_in = jnp.max(jnp.abs(x), axis=0)

    def step(carry, inp):
        xk, pk = inp
        idx = carry["entry_index"]
        peak = jnp.max(carry["peak_data"])
        carry, gain = _gain_step(cfg, carry, peak)
        out = carry["delay_data"][:, idx] * gain
        carry = dict(
            carry,
            delay_data=carry["delay_data"].at[:, idx].set(xk),
            peak_data=carry["peak_data"].at[idx].set(pk),
            entry_index=(idx + 1) % D,
        )
        return carry, out

    def slow(state):
        new_state, ys = jax.lax.scan(step, state, (x.T, peaks_in))
        return new_state, ys.T

    def fast(state):
        idx = state["entry_index"]
        ring_order = (idx + jnp.arange(D)) % D
        seq = jnp.concatenate([state["delay_data"][:, ring_order], x], axis=1)
        y = seq[:, :T]
        new_delay = jax.lax.dynamic_slice_in_dim(seq, T, D, axis=1)
        peaks_seq = jnp.concatenate([state["peak_data"][ring_order], peaks_in])
        new_peaks = jax.lax.dynamic_slice_in_dim(peaks_seq, T, D, axis=0)
        new_idx = (idx + T) % D
        inv = (jnp.arange(D) - new_idx) % D
        new_state = dict(
            state,
            delay_data=new_delay[:, inv],
            peak_data=new_peaks[inv],
            entry_index=new_idx,
        )
        return new_state, y

    thr = jnp.float32(cfg.linear_threshold)
    can_fast = jnp.logical_and(
        state["current_tc"] == -1.0,
        jnp.logical_and(jnp.max(state["peak_data"]) <= thr, jnp.max(peaks_in) <= thr),
    )
    return jax.lax.cond(can_fast, fast, slow, state)


def _frame_compute(cfg: PipelineConfig, inputs: dict):
    """Demix + render + gains + mix for ONE frame (no limiter).

    inputs (leading element axis handled by caller):
      x_e:        list of [C_in, T] per element
      factors_e:  list of dict[str, [T]] per channel-based element
      rg_filt_e:  list of Optional [n_rg, T]
      render_prev_e / render_cur_e: [out, n_rendered] matrices per element
      offset_mask_e: [T] 1.0 where the *previous* matrix applies
      elem_gain_e: [T] per element
      out_gain:   [T]
    Returns mixed [out_channels, T] float32.
    """
    mixed = None
    for i, es in enumerate(cfg.elements):
        x = inputs["x"][i]
        if x.dtype != jnp.float32:
            x = x.astype(jnp.float32) * jnp.float32(es.input_scale)
        if es.demix is not None:
            y = demix_frame(
                x,
                es.demix,
                inputs["factors"][i],
                inputs["rg_index"][i],
                inputs["rg_filt"][i],
            )
        else:
            y = x
        # render: blend previous/current matrices across the offset split
        m_prev = inputs["render_prev"][i]
        m_cur = inputs["render_cur"][i]
        y_prev = jnp.einsum(
            "om,mt->ot", m_prev, y, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        y_cur = jnp.einsum(
            "om,mt->ot", m_cur, y, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        mask = inputs["offset_mask"][i][None, :]
        r = y_prev * mask + y_cur * (1.0 - mask)
        r = r * inputs["elem_gain"][i][None, :]
        mixed = r if mixed is None else mixed + r
    mixed = mixed * inputs["out_gain"][None, :]
    return mixed


@partial(jax.jit, static_argnums=(0,))
def decode_frames(cfg: PipelineConfig, carry: dict, batch: dict):
    """Decode a batch of frames.

    batch (B = batch axis first):
      x:           list per element of [B, C_in, T]
      factors:     list per element of dict[str, [B, T]]
      rg_filt:     list per element of [B, n_rg, T] (zeros-size ok)
      render_prev/render_cur: list per element of [B, out, n_rendered]
      offset_mask: list per element of [B, T]
      elem_gain:   list per element of [B, T]
      out_gain:    [B, T]
    carry: {'limiter': limiter state} (absent limiter -> {})
    Returns (carry, pcm int [B, T, out_channels]).
    """
    n_e = len(cfg.elements)

    def one_frame(inputs):
        return _frame_compute(cfg, inputs)

    # vmap the stateless part over the batch
    per_frame_inputs = {
        "x": [batch["x"][i] for i in range(n_e)],
        "factors": [batch["factors"][i] for i in range(n_e)],
        "rg_index": [batch["rg_index"][i] for i in range(n_e)],
        "rg_filt": [batch["rg_filt"][i] for i in range(n_e)],
        "render_prev": [batch["render_prev"][i] for i in range(n_e)],
        "render_cur": [batch["render_cur"][i] for i in range(n_e)],
        "offset_mask": [batch["offset_mask"][i] for i in range(n_e)],
        "elem_gain": [batch["elem_gain"][i] for i in range(n_e)],
        "out_gain": batch["out_gain"],
    }
    # rg_index is static per element; exclude from vmap
    static_rg = per_frame_inputs.pop("rg_index")

    def wrapped(inp):
        inp = dict(inp, rg_index=static_rg)
        return one_frame(inp)

    mixed = jax.vmap(wrapped)(per_frame_inputs)  # [B, out_ch, T]

    if cfg.limiter is not None:
        lim = cfg.limiter
        B, C, T = mixed.shape
        thr = jnp.float32(lim.linear_threshold)
        state = carry["limiter"]
        batch_peak = jnp.max(jnp.abs(mixed))

        def fast(state):
            # whole batch below threshold + idle envelope: one flattened
            # delay-line pass, no per-sample scan at all
            from ..dsp.limiter import fast_pass

            flat = mixed.transpose(1, 0, 2).reshape(C, B * T)
            peaks_in = jnp.max(jnp.abs(flat), axis=0)
            new_state, y = fast_pass(lim, state, flat, peaks_in)
            return new_state, y.reshape(C, B, T).transpose(1, 0, 2)

        def slow(state):
            def lim_step(s, frame):
                return _limiter_block(lim, s, frame)

            return jax.lax.scan(lim_step, state, mixed)

        can_fast = jnp.logical_and(
            state["current_tc"] == -1.0,
            jnp.logical_and(
                jnp.max(state["peak_data"]) <= thr, batch_peak <= thr
            ),
        )
        lim_state, limited = jax.lax.cond(can_fast, fast, slow, state)
        carry = dict(carry, limiter=lim_state)
        mixed = limited

    pcm = jax.vmap(lambda m: quantize_interleave(m, cfg.bits))(mixed)
    return carry, pcm


def init_carry(cfg: PipelineConfig) -> dict:
    carry = {}
    if cfg.limiter is not None:
        carry["limiter"] = init_state(cfg.limiter)
    return carry
