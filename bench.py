"""Benchmark: realtime-x decoding 48 kHz 7.1.4 IAMF to sound system J.

Synthesizes a 7.1.4 PCM IAMF stream, decodes it end-to-end (host OBU parse +
codec unpack + batched TPU pipeline: demix -> render matmul -> gains -> mix
-> limiter -> quantize), and reports the realtime factor.

Baseline: the reference (Samsung/iac) publishes no numbers; its implied
design point is faster-than-realtime single-core decode (BASELINE.md), so
vs_baseline is the realtime factor itself (1.0 == realtime). If the
reference iamfplayer binary is present it is also measured for context.

Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

import numpy as np

# NOTE: do not enable the persistent jax compilation cache here — with the
# axon remote-compile transport it has been observed to hang the first
# compile indefinitely. Warmup pays the compile cost instead.


def build_stream(seconds: float = 30.0, content: str = "pcm"):
    from iamf_tpu.constants import ChannelLayout
    import vectors

    frame_size = 1024 if content == "aac" else 960
    n_frames = int(seconds * 48000 / frame_size)
    if content == "opus":
        # BASELINE config-1 class content on the 7.1.4 headline layout:
        # libopus-encoded substreams, decoded with the host entropy layers
        # + device CELT synthesis (codecs/opus/tpu_synth.py)
        return vectors.build_opus_layout_stream(
            ChannelLayout.L714, n_frames=n_frames, frame_size=frame_size,
            amp=0.4
        )
    if content == "aac":
        # AAC-LC substreams through the from-scratch decoder: host
        # entropy/tools (native/src/aac) + device filterbank
        # (codecs/aac/tpu_synth.py)
        s, _src, _pkts = vectors.build_aac_layout_stream(
            ChannelLayout.L714, n_frames=n_frames, frame_size=frame_size)
        return s, _src
    return vectors.build_pcm_layout_stream(
        ChannelLayout.L714, n_frames=n_frames, frame_size=frame_size, amp=0.5
    )


def main() -> None:
    from iamf_tpu.core.batch_decoder import BatchedStreamDecoder

    seconds = float(os.environ.get("BENCH_SECONDS", "30"))
    content = os.environ.get("BENCH_CONTENT", "pcm")
    # aggregate mode is opt-in: on this tunneled single-chip host the
    # python-side packet routing serializes streams (GIL), so N-stream
    # aggregate adds no information over device_only_realtime_x
    n_streams = int(os.environ.get("BENCH_STREAMS", "0"))
    if "--content" in sys.argv:
        content = sys.argv[sys.argv.index("--content") + 1]
    if "--seconds" in sys.argv:
        seconds = float(sys.argv[sys.argv.index("--seconds") + 1])
    if "--streams" in sys.argv:
        n_streams = int(sys.argv[sys.argv.index("--streams") + 1])
    stream, _src = build_stream(seconds, content)

    sound_system = 9  # J (4+7+0)
    # warmup: compile the pipeline + first device readback
    dec = BatchedStreamDecoder(stream, sound_system=sound_system, batch_frames=128)
    n_frames = dec.n_frames
    dec.decode_all()

    # steady state: best of 3 full decodes (fresh decoder each time, i.e.
    # including host OBU routing + codec unpack, excluding stream synthesis)
    times = []
    for _ in range(3):
        d = BatchedStreamDecoder(
            stream, sound_system=sound_system, batch_frames=128
        )
        t0 = time.perf_counter()
        pcm = d.decode_all()
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    # device-only rate: same decode, PCM left on device (separates decode
    # throughput from the host<->device transfer, which on the tunneled
    # axon TPU is ~22 MB/s and dominates end-to-end wall time)
    dev_times = []
    for _ in range(2):
        d = BatchedStreamDecoder(
            stream, sound_system=sound_system, batch_frames=128
        )
        t0 = time.perf_counter()
        d.decode_all(fetch=False)
        dev_times.append(time.perf_counter() - t0)
    dev_elapsed = min(dev_times)

    audio_seconds = pcm.shape[0] / 48000.0
    rtx = audio_seconds / elapsed
    fps = n_frames / elapsed

    ref_rtx = None
    ref_bin = "/tmp/refplayer_std/iamfplayer"
    # the reference build in this environment has no AAC codec library, so
    # it cannot decode aac content — skip the bogus comparison
    if os.path.exists(ref_bin) and content != "aac":
        import tempfile

        d = tempfile.mkdtemp()
        path = os.path.join(d, "bench.iamf")
        with open(path, "wb") as f:
            f.write(stream)
        # -o2 (wav output) is required: the reference player skips decoding
        # entirely for any other output mode (iamfplayer.c:908-918)
        t0 = time.perf_counter()
        subprocess.run(
            [ref_bin, "-o2", f"-s{sound_system}", "bench.iamf"],
            cwd=d, capture_output=True, timeout=600,
        )
        ref_elapsed = time.perf_counter() - t0
        ref_rtx = audio_seconds / ref_elapsed

    # aggregate serving throughput: N independent streams decoded on one
    # chip (the production regime — the single-stream number is dominated
    # by per-dispatch latency and, on the tunneled axon device, by d2h)
    agg_rtx = None
    if n_streams > 1:
        decs = [
            BatchedStreamDecoder(stream, sound_system=sound_system,
                                 batch_frames=128)
            for _ in range(n_streams)
        ]
        import concurrent.futures as cf

        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(n_streams) as ex:
            outs = list(ex.map(
                lambda dd: dd.decode_all(fetch=False), decs))
        for o in outs:
            o[-1].block_until_ready()
        agg_elapsed = time.perf_counter() - t0
        agg_rtx = n_streams * audio_seconds / agg_elapsed

    result = {
        "metric": ("realtime_x_decode_714_to_ssJ" if content == "pcm"
                   else f"realtime_x_decode_714_{content}_to_ssJ"),
        "value": round(rtx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtx / 1.0, 2),
        "frames_per_s": round(fps, 1),
        "audio_seconds": round(audio_seconds, 2),
        "wall_seconds": round(elapsed, 3),
        "device_only_realtime_x": round(
            (pcm.shape[0] / 48000.0) / dev_elapsed, 2),
    }
    if agg_rtx is not None:
        result["aggregate_streams"] = n_streams
        result["aggregate_device_realtime_x"] = round(agg_rtx, 2)
    if ref_rtx is not None:
        result["reference_player_realtime_x"] = round(ref_rtx, 2)
        result["speedup_vs_reference"] = round(rtx / ref_rtx, 2)
        if agg_rtx is not None:
            result["aggregate_speedup_vs_reference"] = round(
                agg_rtx / ref_rtx, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
