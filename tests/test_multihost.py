"""Multi-host distributed decode: the jax.distributed fake-cluster recipe.

SURVEY §2.4's collective-backend row and §4(d): the multi-host path is
validated without a cluster by launching N processes on one machine, each
with `jax.distributed.initialize(coordinator, num_processes, process_id)`
on the CPU backend and xla_force_host_platform_device_count local virtual
devices — the standard JAX way to test N-host logic. Collectives run over
Gloo (the CPU stand-in for DCN).

The test runs 2 "hosts" x 4 devices decoding a real stream through
ShardedStreamDecoder on the 8-device GLOBAL mesh, with the ordered PCM
gather back to host 0, and byte-matches the single-process decode.
"""

import os
import subprocess
import socket
import sys

import numpy as np
import pytest

import vectors
from iamf_tpu.constants import ChannelLayout
from iamf_tpu.core.batch_decoder import BatchedStreamDecoder

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
stream_path, out_path, per_host = sys.argv[4], sys.argv[5], int(sys.argv[6])
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={per_host}").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import numpy as np
from iamf_tpu.parallel.sharded_decoder import ShardedStreamDecoder

assert len(jax.devices()) == nproc * per_host
assert len(jax.local_devices()) == per_host
data = open(stream_path, "rb").read()
sub_axis = int(sys.argv[7]) if len(sys.argv) > 7 else 1
dec = ShardedStreamDecoder(data, sound_system=9,
                           substream_axis=sub_axis)  # global 8-device mesh
pcm = dec.decode_all()  # ordered gather: every host holds the full PCM
if pid == 0:  # host 0 writes the output
    np.save(out_path, pcm)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


import pytest as _pytest


def _run_cluster(tmp_path, stream: bytes, n_proc: int, per_host: int,
                 sub_axis: int = 1):
    """Launch the fake cluster on `stream`; returns host-0's gathered PCM."""
    spath = tmp_path / "s.iamf"
    spath.write_bytes(stream)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out = tmp_path / "pcm.npy"
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         env.get("PYTHONPATH", "")])
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(n_proc), str(port),
             str(spath), str(out), str(per_host), str(sub_axis)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(n_proc)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=240)
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"
    return np.load(out)


@_pytest.mark.parametrize("sub_axis", [1, 2],
                          ids=["frames-mesh", "frames-x-substreams"])
def test_two_host_decode_matches_single_host(tmp_path, sub_axis):
    """1-D frames mesh, and the 2-D (frames, substreams) mesh whose
    lane-gather collective crosses the process (DCN/Gloo) boundary."""
    n_frames, T = 24, 960
    pcm = vectors.sine_pcm(n_frames * T, 12, 48000, amp=0.4, bits=16, seed=7)
    burst = vectors.sine_pcm(2 * T, 12, 48000, amp=1.4, bits=16, seed=8)
    pcm[11 * T:13 * T] = np.clip(burst, -32768, 32767)  # limiter live at
    # the boundary between the two hosts' shard groups
    stream, _src = vectors.build_pcm_layout_stream(
        ChannelLayout.L714, n_frames=n_frames, frame_size=T,
        pcm_override=pcm)
    want = BatchedStreamDecoder(stream, sound_system=9,
                                batch_frames=8).decode_all()
    got = _run_cluster(tmp_path, stream, 2, 4, sub_axis)
    assert got.shape == want.shape
    assert np.array_equal(got, want), (
        f"max diff {np.abs(got.astype(np.int64) - want.astype(np.int64)).max()}")


def test_two_host_opus_decode(tmp_path):
    """Opus 7.1.4 over the 2-host cluster: the device CELT synthesis runs
    sharded with the roll-distance preroll re-decode, and the comb/
    de-emphasis/limiter ppermute carry chains cross the process (Gloo)
    boundary. <=1 LSB vs the single-process batched decode."""
    stream, _ = vectors.build_opus_layout_stream(
        ChannelLayout.L714, n_frames=24, amp=0.4)
    want = BatchedStreamDecoder(stream, sound_system=9,
                                batch_frames=8).decode_all()
    got = _run_cluster(tmp_path, stream, 2, 4)
    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_three_host_uneven_shards(tmp_path):
    """3 processes x 2 devices (a >2-process topology) on a frame count
    (17) that does NOT divide the 6-shard mesh: the tail shard decodes
    padded rows that are sliced off by the ordered gather."""
    n_frames, T = 17, 960
    stream, _src = vectors.build_pcm_layout_stream(
        ChannelLayout.L714, n_frames=n_frames, frame_size=T, amp=0.5)
    want = BatchedStreamDecoder(stream, sound_system=9,
                                batch_frames=8).decode_all()
    got = _run_cluster(tmp_path, stream, 3, 2)
    assert got.shape == want.shape
    assert np.array_equal(got, want), (
        f"max diff {np.abs(got.astype(np.int64) - want.astype(np.int64)).max()}")
