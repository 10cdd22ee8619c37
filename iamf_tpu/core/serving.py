"""Multi-stream batched serving: decode S same-configuration IAMF
streams in ONE device program.

The reference decoder is strictly single-stream (one `IAMF_DecoderHandle`
per stream, `IAMF_decoder_decode` one access unit at a time,
/root/reference/src/iamf_dec/IAMF_decoder.c:3935); serving N streams
means N independent handles on N cores. Here the decode step is vmapped
over a leading stream axis, so a fleet of streams costs ONE dispatch per
frame batch (the tunneled dispatch round-trip is ~25 ms — with S
thread-driven decoders that RTT and the per-put h2d queueing multiply by
S; stacked, they are paid once) and the device sees one big program it
can tile across the MXU/VPU.

Constraints (asserted): every stream must share the pipeline
configuration — same (cfg, kinds) static pair, same frame count — which
is exactly the production serving shape (one content config fanned out
to many sessions, or fixed-length segments of a live service).
Correctness bar: per-stream output identical to that stream's own
BatchedStreamDecoder.decode_all (test_serving.py, bit-exact)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .batch_decoder import BatchedStreamDecoder, _fused_decode_body, _HostPlan


@partial(jax.jit, static_argnums=(0, 1))
def _fused_decode_multi(cfg, kinds: tuple, carry, params, bufs):
    """The fused decode step vmapped over a leading stream axis: carry,
    params, and every input buffer are [S, ...]-stacked pytrees."""

    def step(c, p, *b):
        return _fused_decode_body(cfg, kinds, c, p, list(b))

    return jax.vmap(step)(carry, params, *bufs)


def _stack(*leaves):
    return jnp.stack(leaves)


class MultiStreamServer:
    """Decode S complete IAMF streams concurrently on one chip.

    streams: list of in-memory IAMF byte streams (same config shape).
    Decoder options (sound_system, batch_frames, ...) are shared.
    """

    def __init__(self, streams, **kw):
        self.decs = [BatchedStreamDecoder(s, **kw) for s in streams]
        d0 = self.decs[0]
        for d in self.decs[1:]:
            if d.cfg != d0.cfg:
                raise ValueError(
                    "MultiStreamServer requires identical pipeline configs "
                    "across streams (one compiled program serves the fleet)")
            if d.n_frames != d0.n_frames:
                raise ValueError("streams must have equal frame counts")
        if d0.needs_resample:
            raise ValueError("rate-mismatch streams need the host resample "
                             "tail; serve them per-stream")

    def decode_all(self):
        """Decode every stream; returns a list of per-stream device-array
        lists ([B*T, ch] int PCM batches), the same device-resident
        contract as BatchedStreamDecoder.decode_all(fetch=False)."""
        plans = [_HostPlan(d) for d in self.decs]
        p0 = plans[0]
        for p in plans[1:]:
            assert p.kinds == p0.kinds and p.total_calls == p0.total_calls
        cfg = self.decs[0].cfg
        # stack carries and whole-stream params on the stream axis (device
        # side: the per-stream puts already happened in _HostPlan)
        carry = jax.tree.map(_stack, *[p.carry for p in plans])
        params = jax.tree.map(_stack, *[p.stream_params for p in plans])

        device_outs = []
        zero_bufs = None
        for _ in range(p0.total_calls):
            per_stream = [p.next_bufs() for p in plans]
            if per_stream[0] is not None:
                # per-stream h2d puts + a device-side stack: a host
                # np.stack would copy the whole fleet's input again
                # (~12 MB/batch) before the put
                bufs = [
                    jnp.stack([jnp.asarray(nb[i]) for nb in per_stream])
                    for i in range(len(self.decs[0].elems))
                ]
                zero_bufs = [jnp.zeros(b.shape, b.dtype) for b in bufs]
            else:
                bufs = zero_bufs  # flush calls: zero input, neutral params
            carry, pcm = _fused_decode_multi(cfg, p0.kinds, carry, params,
                                             bufs)
            device_outs.append(pcm)  # [S, B*T, ch]
        for p in plans:
            p.close()
        if device_outs:
            device_outs[-1].block_until_ready()
        kept = device_outs[p0.k0:p0.k0 + p0.n_batches]
        return [[batch[s] for batch in kept] for s in range(len(self.decs))]
