"""Multi-chip SPMD decode step (SURVEY.md §2.4).

Sharding axes for a decode engine (DP/TP/PP analogues):
  - `frames`:   independent access units sharded over chips (DP). Sequential
    carries (limiter envelope, demix EMA) are handled by overlap-save warmup
    halos per shard — each shard re-decodes `halo_frames` of look-back and
    keeps only its own region (the roll-distance idiom; exact when no peak
    older than the warmup influences the envelope).
  - `elements`: audio elements of the mix presentation on different chips
    (TP). The mixer's element sum becomes a `psum` over ICI.

The step is jitted under `shard_map` over a Mesh('frames','elements'); XLA
inserts the collectives. Time/`sp` sharding (halo exchange within a frame)
and substream parallelism slot into the same mesh as further axes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.pipeline import PipelineConfig, _limiter_block, init_carry
from ..dsp.demix import demix_frame
from ..dsp.limiter import LimiterConfig, init_state
from ..dsp.quantize import quantize_interleave


def make_mesh(n_devices: int, n_elements: int = 2) -> Mesh:
    devices = np.array(jax.devices()[:n_devices])
    e = min(n_elements, n_devices)
    while n_devices % e:
        e -= 1
    f = n_devices // e
    return Mesh(devices.reshape(f, e), axis_names=("frames", "elements"))


def sharded_decode_step(mesh: Mesh, cfg: PipelineConfig):
    """Build the jitted SPMD decode step for equal-channel elements.

    Returns fn(x [E, B, C, T], render [E, out, C], elem_gain [E, B, T],
               out_gain [B, T]) -> pcm [B, T, out_channels].
    E sharded over 'elements', B over 'frames'.
    """
    es0 = cfg.elements[0]
    lim_cfg = cfg.limiter

    def local_step(x, render, elem_gain, out_gain):
        # x: [E_loc, B_loc, C, T]
        def per_element(xe, me, ge):
            def per_frame(xf, gf):
                if es0.demix is not None:
                    # single-layer reorder/demix; factors constant defaults
                    T = xf.shape[1]
                    factors = {
                        k: jnp.ones((T,), jnp.float32)
                        for k in ("alpha", "beta", "gamma", "delta", "dw")
                    }
                    y = demix_frame(xf, es0.demix, factors, (), None)
                else:
                    y = xf
                r = jnp.einsum(
                    "om,mt->ot", me, y, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return r * gf[None, :]

            return jax.vmap(per_frame)(xe, ge)

        partial_mix = jnp.sum(
            jax.vmap(per_element)(x, render, elem_gain), axis=0
        )  # [B_loc, out, T]
        # element-parallel mixer: psum over the elements axis (ICI)
        mixed = jax.lax.psum(partial_mix, axis_name="elements")
        mixed = mixed * out_gain[:, None, :]

        if lim_cfg is not None:
            # overlap-save: fresh envelope per frame shard (halo warmup is
            # prepended by the host driver; exact below threshold)
            state = init_state(lim_cfg)
            # mark the carry as device-varying over the manual mesh axes so
            # the scan carry types match under shard_map
            state = jax.tree.map(
                lambda a: jax.lax.pcast(a, ("frames",), to="varying"), state
            )

            def lim_step(s, frame):
                return _limiter_block(lim_cfg, s, frame)

            _, mixed = jax.lax.scan(lim_step, state, mixed)

        pcm = jax.vmap(lambda m: quantize_interleave(m, cfg.bits))(mixed)
        return pcm

    fn = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(
                P("elements", "frames", None, None),
                P("elements", None, None),
                P("elements", "frames", None),
                P("frames", None),
            ),
            out_specs=P("frames", None, None),
        )
    )
    return fn


def substream_parallel_render(mesh: Mesh, render_mat: np.ndarray):
    """Substream parallelism (SURVEY §2.4 'TP analogue'): the planar
    channels decoded from an element's substreams live sharded over the
    'substreams' axis; they are independent until the demix/render stage,
    which needs them all — one `all_gather` over ICI, then each chip
    computes its slice of the render matmul's output rows (tensor-parallel
    over output channels).

    fn(x [C, T], mat [out, C]) -> [out, T]; x rows and mat output rows are
    sharded over 'substreams'.
    """
    out_ch, c_in = render_mat.shape
    n = mesh.shape["substreams"]
    assert c_in % n == 0 and out_ch % n == 0

    def local(x_local, mat_local):
        # x_local: [C/n, T] -> gather all substream channels (ICI)
        x_full = jax.lax.all_gather(
            x_local, "substreams", axis=0, tiled=True)  # [C, T]
        return jnp.matmul(mat_local, x_full,
                          precision=jax.lax.Precision.HIGHEST)  # [out/n, T]

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("substreams", None), P("substreams", None)),
            out_specs=P("substreams", None),
        )
    )


def time_sharded_limiter(mesh: Mesh, cfg: LimiterConfig):
    """Sequence/time parallelism (SURVEY §2.4 'SP/CP analogue'): a long PCM
    timeline is split into per-chip chunks; the limiter's look-ahead delay
    line needs each chunk's left neighbour's last `delay_size` samples — a
    single `ppermute` halo exchange over ICI. Each shard then runs the
    look-ahead limiter locally seeded from its halo (overlap-save; exact
    whenever no gain excursion older than the halo is still releasing —
    the roll-distance idiom for the envelope recurrence).

    fn(x [C, T] sharded over T) -> [C, T] sharded over T: the limited
    signal with the limiter's usual global look-ahead latency (out[t]
    carries x[t - delay_size]·gain; the stream layer trims the head as in
    the serial path).
    """
    D = cfg.delay_size
    n = mesh.shape["time"]
    perm = [(i, i + 1) for i in range(n - 1)]

    def local(x_local):
        C, Tl = x_local.shape
        # halo: last D samples of the left neighbour (zeros for shard 0)
        tail = x_local[:, -D:]
        halo = jax.lax.ppermute(tail, "time", perm)  # shard i gets i-1's
        seq = jnp.concatenate([halo, x_local], axis=1)  # [C, D+Tl]
        from ..dsp.limiter import process_block

        state = init_state(cfg)
        state = jax.tree.map(
            lambda a: jax.lax.pcast(a, ("time",), to="varying"), state)
        _, y = process_block(cfg, state, seq)
        # process_block outputs the D-delayed signal: y[:, D:] are this
        # shard's own samples with the delay compensated
        return y[:, D:]

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, "time"),), out_specs=P(None, "time"),
        )
    )


def two_stage_pipeline(mesh: Mesh, render_mat: np.ndarray, bits: int = 16):
    """Pipeline parallelism (SURVEY §2.4 'PP analogue'): stage 0 (render
    matmul) and stage 1 (quantize+interleave) on different chips;
    microbatch activations flow stage0 -> stage1 through a `ppermute`
    inside a `lax.scan` step (software pipelining: stage 0 renders
    microbatch i while stage 1 quantizes i-1; one bubble step drains).

    fn(x [M, C, T] float in [-1,1]) -> PCM [M, T, out] int16.
    """
    mat = jnp.asarray(render_mat, jnp.float32)

    def local(x_local):
        stage = jax.lax.axis_index("stage")
        M, C, T = x_local.shape
        xpad = jnp.concatenate(
            [x_local, jnp.zeros((1, C, T), x_local.dtype)])  # drain bubble

        def step(prev_act, xm):
            rendered = jnp.matmul(
                mat, xm, precision=jax.lax.Precision.HIGHEST)  # stage-0 work
            act = jax.lax.ppermute(rendered, "stage", [(0, 1)])
            y = quantize_interleave(prev_act, bits)  # stage-1 work
            return act, y

        init = jnp.zeros((mat.shape[0], T), jnp.float32)
        init = jax.lax.pcast(init, ("stage",), to="varying")
        _, ys = jax.lax.scan(step, init, xpad)  # [M+1, T, out]
        ys = ys[1:]  # first output is the fill bubble
        return ys * jnp.where(stage == 1, 1, 0).astype(ys.dtype)

    def fn(x):
        parts = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, None, None),),
            out_specs=P("stage", None, None),
        )(x)
        return parts[x.shape[0]:]  # stage 1's partition holds the result

    return jax.jit(fn)


def dryrun(n_devices: int) -> None:
    """Compile + execute one sharded decode step on an n-device mesh with
    tiny shapes (driver validation hook)."""
    from ..constants import ChannelLayout, LAYOUT_CHANNELS_CODEC
    from ..dsp.demix import DemixSpec
    from ..dsp.render import LAYER_IDS, BS2051_IDS, m2m_matrix
    from ..constants import SoundSystem

    T = 64
    E = 2
    B = max(n_devices, 2)
    layout = ChannelLayout.L714
    chans = LAYOUT_CHANNELS_CODEC[layout]
    C = len(chans)
    spec = DemixSpec(
        layout=layout,
        channels_in=tuple(chans),
        frame_size=T,
        output_gains=(1.0,) * C,
    )
    lim = LimiterConfig(channels=12, delay_size=16)
    from ..core.pipeline import ElementSpec

    cfg = PipelineConfig(
        frame_size=T,
        out_channels=12,
        bits=16,
        elements=(ElementSpec(demix=spec, n_in=C, n_rendered=C),),
        limiter=lim,
    )
    mesh = make_mesh(n_devices, n_elements=E)
    fn = sharded_decode_step(mesh, cfg)

    mat = m2m_matrix(LAYER_IDS[layout], BS2051_IDS[SoundSystem.J]).T  # [out, in]
    x = jnp.asarray(
        np.random.RandomState(0).randn(E, B, C, T).astype(np.float32) * 0.1
    )
    render = jnp.broadcast_to(jnp.asarray(mat), (E,) + mat.shape)
    elem_gain = jnp.ones((E, B, T), jnp.float32)
    out_gain = jnp.ones((B, T), jnp.float32)
    pcm = fn(x, render, elem_gain, out_gain)
    pcm.block_until_ready()
    assert pcm.shape == (B, T, 12), pcm.shape
