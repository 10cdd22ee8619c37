"""Opus multistream decoder for IAMF substreams.

Each IAMF substream is an independent Opus stream (coupled => stereo
packets, else mono), mirroring the reference OpusMS2Decoder layout
(opus/opus_multistream2_decoder.c:77-165): coupled streams first, each
contributing 2 planar channels, then mono streams. Output convention
matches the reference wrapper: decode to s16 (with soft clip) then /32768
(IAMF_opus_decoder.c:130-136).

The frame decode itself is the framework's from-scratch native CELT
implementation (native/src/opus/, RFC 6716 §4.3) validated >60 dB SNR
against libopus packet-for-packet; SILK/hybrid modes are pending.

IAMF opus decoder_conf (big-endian, IAMF spec §"Opus Specific"):
  version(u8) channels(u8) pre_skip(u16) input_sample_rate(u32)
  output_gain(s16) mapping_family(u8)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from ...constants import Codec
from ..base import CodecDecoder, register

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "lib", "libiamf_native.so")

_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise NotImplementedError(f"native opus lib unavailable: {e}")
    _lib = ctypes.CDLL(_LIB_PATH)
    _lib.iamf_opus_decoder_create.restype = ctypes.c_void_p
    _lib.iamf_opus_decoder_create.argtypes = [ctypes.c_int]
    _lib.iamf_opus_decoder_destroy.argtypes = [ctypes.c_void_p]
    _lib.iamf_opus_decode_float.restype = ctypes.c_int
    _lib.iamf_opus_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    _lib.iamf_opus_decode_spectrum_batch2.restype = ctypes.c_int
    _lib.iamf_opus_decode_spectrum_batch2.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(SpectrumMeta),
    ]
    _lib.iamf_opus_decode_spectrum_batch3.restype = ctypes.c_int
    _lib.iamf_opus_decode_spectrum_batch3.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.POINTER(SpectrumMeta),
    ]
    _lib.iamf_opus_prof_read.restype = None
    _lib.iamf_opus_prof_read.argtypes = [
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_int]
    _lib.iamf_opus_decode_float_batch.restype = ctypes.c_int
    _lib.iamf_opus_decode_float_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    return _lib


class SpectrumMeta(ctypes.Structure):
    """Mirror of SpectrumMeta in native/src/opus/opus_dec.cc."""

    _fields_ = [
        ("samples", ctypes.c_int),
        ("transient", ctypes.c_int),
        ("pf_period_old", ctypes.c_int),
        ("pf_gain_old", ctypes.c_float),
        ("pf_tapset_old", ctypes.c_int),
        ("pf_period", ctypes.c_int),
        ("pf_gain", ctypes.c_float),
        ("pf_tapset", ctypes.c_int),
        ("pf_period_new", ctypes.c_int),
        ("pf_gain_new", ctypes.c_float),
        ("pf_tapset_new", ctypes.c_int),
    ]


# column index of each meta field in the [B, 11] int32/float32 view —
# derived from the struct so a field addition/reorder breaks loudly
# instead of silently mis-mapping gains/periods
_META_COL = {name: i for i, (name, _t) in enumerate(SpectrumMeta._fields_)}
assert ctypes.sizeof(SpectrumMeta) == 4 * len(SpectrumMeta._fields_)


@register(Codec.OPUS)
class OpusDecoder(CodecDecoder):
    def __init__(self, decoder_conf, streams, coupled_streams, frame_size):
        super().__init__(decoder_conf, streams, coupled_streams, frame_size)
        self.version = decoder_conf[0]
        self.pre_skip = int.from_bytes(decoder_conf[2:4], "big")
        self.sample_rate = int.from_bytes(decoder_conf[4:8], "big") or 48000
        lib = _load_native()
        self._decoders = []
        for i in range(streams):
            ch = 2 if i < coupled_streams else 1
            self._decoders.append((lib.iamf_opus_decoder_create(ch), ch))
        self.delay = 0  # reference reports no codec delay for opus
        self._max = frame_size * 6
        self._pool = None  # lazy per-instance substream thread pool

    def __del__(self):
        try:
            if getattr(self, "_pool", None) is not None:
                self._pool.shutdown(wait=False)
            lib = _load_native()
            for ptr, _ in getattr(self, "_decoders", []):
                lib.iamf_opus_decoder_destroy(ptr)
        except Exception:
            pass

    def decode(self, packets: Sequence[Optional[bytes]]) -> np.ndarray:
        lib = _load_native()
        outs = []
        samples = None
        for i, (ptr, ch) in enumerate(self._decoders):
            pkt = packets[i]
            buf = np.zeros(self._max * ch, dtype=np.float32)
            if pkt is None:
                # lost packet: native energy-fade concealment (repeat the
                # last frame at -6 dB/loss; the framework analogue of the
                # reference's AAC_CONCEAL_METHOD=1 fade,
                # aac_multistream_decoder.c:224)
                r = lib.iamf_opus_decode_float(
                    ptr, None, 0,
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    self._max,
                )
            else:
                r = lib.iamf_opus_decode_float(
                    ptr, bytes(pkt), len(pkt),
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    self._max,
                )
            if r < 0:
                raise ValueError(f"opus decode failed ({r})")
            outs.append(buf[: r * ch].reshape(r, ch).T)  # planar
            samples = r
        return np.concatenate(outs, axis=0).astype(np.float32)

    def classify_packets(self, packets_per_substream, frame_size):
        """Scan the TOC bytes of every packet (cheap: one byte each) and
        pick the decode split for this element:

        - ("celt", N, k): CELT-only stream (configs 16-31) at opus frame
          size N (120/240/480/960); k = frame_size // N opus frames per
          IAMF temporal unit -> device spectrum synthesis.
        - ("hybrid", N, k): hybrid (configs 12-15, N 480/960): SILK half
          host-decoded (bit-exact), CELT bands 17+ on device.
        - ("host", frame_size, 1): SILK-only (configs 0-11), mixed-mode/
          mixed-size streams (their transition redundancy needs host celt
          synthesis state), or lost packets -> full host decode (still the
          from-scratch native decoder; the device runs the pipeline).

        Mirrors the reference's single hot loop accepting any TOC
        (opus_multistream2_decoder.c:125-165) with a static split for the
        compiled device program.
        """
        modes, sizes = set(), set()
        celt_sizes = (120, 240, 480, 960)
        for pkts in packets_per_substream:
            for p in pkts:
                if p is None or len(p) == 0:
                    return ("host", frame_size, 1)
                config = bytes(p[:1])[0] >> 3
                if config >= 16:
                    modes.add("celt")
                    sizes.add(celt_sizes[config & 3])
                elif config >= 12:
                    modes.add("hybrid")
                    sizes.add(960 if config & 1 else 480)
                else:
                    return ("host", frame_size, 1)
        if len(modes) != 1 or len(sizes) != 1:
            return ("host", frame_size, 1)
        n = sizes.pop()
        if frame_size % n:
            return ("host", frame_size, 1)
        return (modes.pop(), n, frame_size // n)

    def decode_spectrum_batch(self, frames, n=960, k=1, hybrid=False):
        """Entropy-decode a batch of temporal units to spectra for the
        device synthesis path (codecs/opus/tpu_synth.py).

        frames: [B] lists of per-substream packets; each packet carries k
        opus frames of size n (classify_packets). Returns a dict whose
        `buf` is the [B*k, L, packed_width(n, hybrid)] h2d backing array
        (L = total planar channels, coupled substreams first) with the
        spectra (and hybrid SILK pcm) already in place — the caller packs
        the 13 per-frame params into columns [n:n+13] via pack_params —
        plus the param arrays, `postfilter` (bool) and `min_period` for
        the static chunk pick.
        """
        from .tpu_synth import MINPERIOD, N_PARAMS, packed_width

        lib = _load_native()
        gains_tab = _gains_table()
        B = len(frames)
        R = B * k
        L = sum(ch for _, ch in self._decoders)
        buf = np.zeros((R, L, packed_width(n, hybrid)), np.float32)
        transient = np.zeros((R, L), bool)
        t_old = np.full((R, L), MINPERIOD, np.int32)
        t_cur = np.full((R, L), MINPERIOD, np.int32)
        t_new = np.full((R, L), MINPERIOD, np.int32)
        g_old = np.zeros((R, L, 3), np.float32)
        g_cur = np.zeros((R, L, 3), np.float32)
        g_new = np.zeros((R, L, 3), np.float32)

        # One native batch call per substream: substream codec states are
        # independent, so substreams run on parallel host threads, each a
        # single GIL-free native stretch over all B packets (the per-frame
        # recurrences — energy prediction, range-coder reseed — chain
        # inside the call, in frame order).
        lanes = np.cumsum([0] + [ch for _, ch in self._decoders])

        W = buf.shape[2]
        L_total = buf.shape[1]

        def run_substream(i):
            ptr, ch = self._decoders[i]
            pkts = [frames[b][i] for b in range(B)]
            if any(p is None for p in pkts):
                raise ValueError("missing opus sub packet")
            blob = b"".join(bytes(p) for p in pkts)
            sizes = np.array([len(p) for p in pkts], np.int32)
            metas = (SpectrumMeta * R)()
            # strided export: the native decode writes each frame's spectrum
            # (and hybrid SILK pcm) straight into this substream's lane rows
            # of the packed h2d buffer — no [R][ch][960] scratch, no Python
            # scatter copy (~70 MB/stream saved on the entropy hot path)
            fbase = int(buf.ctypes.data + 4 * int(lanes[i]) * W)
            sbase = fbase + 4 * (n + N_PARAMS) if hybrid else None
            r = lib.iamf_opus_decode_spectrum_batch3(
                ptr, blob, sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                B, k, L_total * W, W, fbase, sbase, metas)
            if r < 0:
                # on error the native batch writes the failing packet index
                # into metas[0].samples and returns the bare error code
                raise ValueError(
                    f"opus spectrum decode failed ({r}) at batch packet "
                    f"{metas[0].samples} of substream {i}")
            sl = slice(lanes[i], lanes[i + 1])
            m = np.frombuffer(memoryview(metas), dtype=np.int32).reshape(
                R, len(SpectrumMeta._fields_))
            mf = m.view(np.float32)
            c = _META_COL
            transient[:, sl] = (m[:, c["transient"]] != 0)[:, None]
            t_old[:, sl] = np.maximum(
                m[:, c["pf_period_old"]], MINPERIOD)[:, None]
            t_cur[:, sl] = np.maximum(m[:, c["pf_period"]], MINPERIOD)[:, None]
            t_new[:, sl] = np.maximum(
                m[:, c["pf_period_new"]], MINPERIOD)[:, None]
            g_old[:, sl] = (mf[:, c["pf_gain_old"], None]
                            * gains_tab[m[:, c["pf_tapset_old"]]])[:, None, :]
            g_cur[:, sl] = (mf[:, c["pf_gain"], None]
                            * gains_tab[m[:, c["pf_tapset"]]])[:, None, :]
            g_new[:, sl] = (mf[:, c["pf_gain_new"], None]
                            * gains_tab[m[:, c["pf_tapset_new"]]])[:, None, :]

        if (len(self._decoders) > 1 and B > 1
                and not os.environ.get("IAMF_OPUS_SERIAL")):
            # one long-lived executor per decoder instance: creating and
            # tearing a pool down per batch adds thread spawn/join overhead
            # on the hot path (IAMF_OPUS_SERIAL=1 forces the sequential
            # path — single-threaded profiling / contention diagnosis)
            if self._pool is None:
                import concurrent.futures as _cf

                # pool sized to the host cores, not the substream count:
                # 7 threads on a 2-core box only adds context switching,
                # and in aggregate serving N streams each carry a pool
                # IAMF_OPUS_THREADS overrides for aggregate serving:
                # N concurrent decoders each carrying a cores-sized pool
                # oversubscribe the host N-fold; the bench's threaded
                # aggregate sets 1
                _n = int(os.environ.get("IAMF_OPUS_THREADS", "0"))
                self._pool = _cf.ThreadPoolExecutor(
                    _n if _n > 0 else
                    min(len(self._decoders), os.cpu_count() or 2))
            list(self._pool.map(run_substream, range(len(self._decoders))))
        else:
            for i in range(len(self._decoders)):
                run_substream(i)
        active = np.concatenate(
            [np.where(np.any(g_old != 0, -1), t_old, 1 << 30).ravel(),
             np.where(np.any(g_cur != 0, -1), t_cur, 1 << 30).ravel(),
             np.where(np.any(g_new != 0, -1), t_new, 1 << 30).ravel()])
        min_period = int(active.min()) if active.size else 1 << 30
        postfilter = min_period < (1 << 30)
        return dict(buf=buf, transient=transient,
                    t_old=t_old, t_cur=t_cur, t_new=t_new,
                    g_old=g_old, g_cur=g_cur, g_new=g_new,
                    postfilter=postfilter,
                    min_period=min_period if postfilter else 1 << 30)

    def decode_batch(self, packets_per_substream, frame_size):
        """Host decode path for the batched pipeline (SILK-only and
        mixed-mode streams): full native float decode of every packet —
        transition redundancy, PLC, soft clip included — in one GIL-free
        native stretch per substream, returning [B, L, T] planar float.
        The device still runs the whole decode pipeline (demix, render,
        mix, limiter) on the result."""
        lib = _load_native()
        B = len(packets_per_substream[0])
        L = sum(ch for _, ch in self._decoders)
        out = np.zeros((B, L, frame_size), np.float32)
        lanes = np.cumsum([0] + [ch for _, ch in self._decoders])

        def run_substream(i):
            ptr, ch = self._decoders[i]
            pkts = packets_per_substream[i]
            sl = slice(lanes[i], lanes[i + 1])
            # contiguous runs between lost packets decode in single native
            # calls; None packets conceal via the per-packet PLC entry
            b = 0
            while b < B:
                if pkts[b] is None:
                    tmp = np.zeros(frame_size * ch * 6, np.float32)
                    r = lib.iamf_opus_decode_float(
                        ptr, None, 0,
                        tmp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        frame_size * 6)
                    if r < 0:
                        raise ValueError(f"opus PLC failed ({r})")
                    out[b, sl] = tmp[:frame_size * ch].reshape(
                        frame_size, ch).T
                    b += 1
                    continue
                e = b
                while e < B and pkts[e] is not None:
                    e += 1
                blob = b"".join(bytes(p) for p in pkts[b:e])
                sizes = np.array([len(p) for p in pkts[b:e]], np.int32)
                seg = np.empty((e - b, frame_size, ch), np.float32)
                r = lib.iamf_opus_decode_float_batch(
                    ptr, blob,
                    sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                    e - b,
                    seg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    frame_size)
                if r < 0:
                    raise ValueError(f"opus decode failed ({r})")
                out[b:e, sl] = seg.transpose(0, 2, 1)
                b = e

        if len(self._decoders) > 1 and B > 1:
            if self._pool is None:
                import concurrent.futures as _cf

                # pool sized to the host cores, not the substream count:
                # 7 threads on a 2-core box only adds context switching,
                # and in aggregate serving N streams each carry a pool
                # IAMF_OPUS_THREADS overrides for aggregate serving:
                # N concurrent decoders each carrying a cores-sized pool
                # oversubscribe the host N-fold; the bench's threaded
                # aggregate sets 1
                _n = int(os.environ.get("IAMF_OPUS_THREADS", "0"))
                self._pool = _cf.ThreadPoolExecutor(
                    _n if _n > 0 else
                    min(len(self._decoders), os.cpu_count() or 2))
            list(self._pool.map(run_substream, range(len(self._decoders))))
        else:
            for i in range(len(self._decoders)):
                run_substream(i)
        return out


_GAINS = None


def _gains_table():
    """Postfilter tap gains per tapset (celt.c `gains`), rows of 3."""
    global _GAINS
    if _GAINS is None:
        z = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "data", "opus_tables.npz"))
        _GAINS = np.asarray(z["gains"], np.float32).reshape(3, 3)
    return _GAINS


class TPUOpusStream:
    """Opus multistream decode with device-side synthesis: host entropy
    layers feed spectra to one batched TPU dispatch per frame block."""

    def __init__(self, decoder_conf, streams, coupled_streams, frame_size):
        self.dec = OpusDecoder(decoder_conf, streams, coupled_streams,
                               frame_size)
        from . import tpu_synth

        self._synth = tpu_synth
        self.lanes = sum(ch for _, ch in self.dec._decoders)
        self.carry = tpu_synth.init_carry(self.lanes)

    def decode_frames(self, frames, n: int = 960, k: int = 1,
                      hybrid: bool = False) -> np.ndarray:
        """frames: [B] lists of per-substream packets -> [B*k, L, n] f32."""
        import jax.numpy as jnp

        if not frames:
            return np.zeros((0, self.lanes, n), np.float32)
        d = self.dec.decode_spectrum_batch(frames, n=n, k=k, hybrid=hybrid)
        buf = d["buf"]
        buf[..., n:n + self._synth.N_PARAMS] = self._synth.pack_params(d)
        chunk = self._synth.pick_chunk(d["min_period"])
        pcm, self.carry = self._synth.synthesize_packed(
            jnp.asarray(buf), self.carry, chunk=chunk, n=n, hybrid=hybrid)
        return np.asarray(pcm)
