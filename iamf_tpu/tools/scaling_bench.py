"""Multi-chip scaling-efficiency measurement (SURVEY §2.4 / BASELINE
north star: >=80% frames/s scaling efficiency at 2+ hosts).

Decodes one stream through ShardedStreamDecoder at 1/2/4/8 shards of the
virtual CPU mesh and reports frames/s per shard count plus the overhead
decomposition the carry-chain design implies:

- preroll %: the roll-distance re-decode prefix (1 frame per shard for
  the opus/AAC filterbank overlap) as a fraction of each shard's work —
  the only *compute* overhead frame sharding adds.
- carry bytes: the per-boundary state the ppermute chains move over ICI
  (comb history [L,1032] f32 + de-emphasis memory [L] + limiter state);
  this is the *serial* fraction — S chain steps of a few hundred KB each.
- efficiency: frames/s(k) / (k * frames/s(1)).

On real hardware the k shards are k chips and the collectives ride ICI;
on the virtual CPU mesh every "chip" shares this host's cores, so the
wall-clock efficiency here is a LOWER bound dominated by host contention
(the 2-core bench VM cannot show >2x) — the decomposition columns are the
hardware-transferable part. Run:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -m iamf_tpu.tools.scaling_bench [--content opus|pcm]
        [--frames N] [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main(argv=None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    content = "opus"
    n_frames = 64
    out_json = None
    if "--content" in argv:
        content = argv[argv.index("--content") + 1]
    if "--frames" in argv:
        n_frames = int(argv[argv.index("--frames") + 1])
    if "--json" in argv:
        out_json = argv[argv.index("--json") + 1]

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "tests"))
    import vectors
    from iamf_tpu.constants import ChannelLayout
    from iamf_tpu.parallel.sharded_decoder import ShardedStreamDecoder

    if content == "opus":
        stream, _ = vectors.build_opus_layout_stream(
            ChannelLayout.L714, n_frames=n_frames, amp=0.4)
    else:
        stream, _ = vectors.build_pcm_layout_stream(
            ChannelLayout.L714, n_frames=n_frames, amp=0.5)

    rows = []
    base_fps = None
    want = None
    for k in (1, 2, 4, 8):
        if k > len(jax.devices()):
            break
        dec = ShardedStreamDecoder(stream, n_devices=k, sound_system=9)
        # carry bytes per ppermute boundary: comb hist + demem per opus
        # element + the limiter chain state (gain envelope + delay/peak
        # windows, dsp/limiter.py)
        lanes = sum(
            sum(ch for _, ch in e.codec._decoders)
            for e in dec.base.elems if e.opus)
        comb_bytes = lanes * (1032 + 1) * 4
        lim = dec.base.cfg.limiter
        lim_bytes = 0
        if lim is not None:
            lim_bytes = 4 * (5  # gain envelope scalars
                             + lim.channels * lim.delay_size  # delay line
                             + lim.delay_size + 1)  # peak window + index
        wall = []
        for _ in range(3):
            t0 = time.perf_counter()
            got = dec.decode_all()
            wall.append(time.perf_counter() - t0)
        if want is None:
            want = got
        else:
            d = np.abs(got.astype(np.int64) - want.astype(np.int64))
            assert got.shape == want.shape and d.max() <= 1, (
                f"shards={k}: {d.max()} LSB vs single-shard")
        best = min(wall)
        fps = dec.n_frames / best
        if base_fps is None:
            base_fps = fps
        # hardware-transferable model: the redundant work frame-sharding
        # adds is the preroll re-decode (R frames per shard) and the
        # k-step carry chain (carry_bytes over ICI + a tiny chain kernel
        # per boundary — microseconds against milliseconds of batch
        # compute). model_eff = F / (F + k*R); quoted for the measured F
        # and for a 30 s production stream (F=1500).
        R = dec.preroll
        F = dec.n_frames
        rows.append({
            "shards": k,
            "wall_ms": round(best * 1e3, 1),
            "frames_per_s": round(fps, 1),
            "frames_per_shard": dec.frames_per_shard,
            "preroll_frames": R,
            "preroll_overhead_pct": round(
                100.0 * R / (dec.frames_per_shard + R), 1),
            "carry_bytes_per_boundary": comb_bytes + lim_bytes,
            "chain_steps": k,
            "measured_efficiency_pct": round(100.0 * fps / (k * base_fps),
                                             1),
            "model_efficiency_pct": round(100.0 * F / (F + k * R), 1),
            "model_efficiency_30s_pct": round(
                100.0 * 1500 / (1500 + k * R), 1),
        })
        print(f"shards={k}: {best*1e3:7.1f} ms  {fps:8.1f} frames/s  "
              f"preroll {rows[-1]['preroll_overhead_pct']}%  "
              f"carry {rows[-1]['carry_bytes_per_boundary']} B  "
              f"measured-eff {rows[-1]['measured_efficiency_pct']}%  "
              f"model-eff {rows[-1]['model_efficiency_pct']}% "
              f"(30s: {rows[-1]['model_efficiency_30s_pct']}%)",
              flush=True)

    if out_json:
        with open(out_json, "w") as f:
            json.dump({"content": content, "n_frames": n_frames,
                       "rows": rows}, f, indent=1)
        print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
