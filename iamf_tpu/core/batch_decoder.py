"""Batched stream decoder: host parse/unpack feeding the fused TPU pipeline.

The throughput path: parses all OBUs up front (host, <1% of time), unpacks
codec payloads into [B, C, T] frame batches, evaluates parameter curves into
dense per-frame tensors, and drives core.pipeline.decode_frames in large
batches. Currently supports single channel-based-element presentations
(PCM/FLAC-class codecs whose host decode yields planar frames); the
per-frame api.IAMFDecoder remains the fully general path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import ChannelLayout, ElementType, LayoutType, SoundSystem
from ..codecs.base import open_decoder
from ..dsp.demix import DemixSpec
from ..dsp.limiter import LimiterConfig
from ..dsp import render as rdr
from ..dsp.downmix import can_downmix, downmix_matrix
from ..obu import parser
from .database import Database, codec_config_sampling_rate
from .pipeline import ElementSpec, PipelineConfig, decode_frames, init_carry
from .stream import SS_TO_LAYOUT, LAYOUT_CHANNELS_CODEC, Stream, OutputLayout


class BatchedStreamDecoder:
    """Decode a complete in-memory IAMF stream in frame batches."""

    def __init__(self, data: bytes, sound_system: int = 0, bits: int = 16,
                 batch_frames: int = 128, limiter: bool = True):
        self.data = data
        self.bits = bits
        self.batch_frames = batch_frames
        self.db = Database()
        self.layout = OutputLayout(
            type=LayoutType.SS_CONVENTION, sound_system=sound_system
        )

        off = parser.find_sequence_header(data)
        if off < 0:
            raise ValueError("no sequence header")
        pos = off
        self.frames_per_substream: dict[int, list[bytes]] = {}
        self.trims: list[tuple[int, int]] = []  # (start, end) per temporal unit
        first_sid = None
        for obu in parser.iter_obus(memoryview(data)[off:]):
            if obu.type == 0:
                self.db.add_codec_config(parser.parse_codec_config(obu))
            elif obu.type == 1:
                self.db.add_element(parser.parse_audio_element(obu))
            elif obu.type == 2:
                self.db.add_mix_presentation(parser.parse_mix_presentation(obu))
            elif obu.is_audio_frame:
                f = parser.parse_audio_frame(obu)
                self.frames_per_substream.setdefault(f.substream_id, []).append(
                    bytes(f.data)
                )
                if first_sid is None:
                    first_sid = f.substream_id
                if f.substream_id == first_sid:
                    self.trims.append((f.trim_start, f.trim_end))

        mp = self.db.mix_presentations[0]
        sub = mp.sub_mixes[0]
        assert len(sub.elements) == 1, "batched path: single element for now"
        item = self.db.elements[sub.elements[0].element_id]
        self.stream = Stream(item, self.layout)
        el = item.element
        cc = item.codec_config
        self.frame_size = cc.nb_samples_per_frame

        s = self.stream
        layer = s.layers[s.layer]
        self.codec = open_decoder(
            s.codec, cc.decoder_conf,
            sum(l.nb_substreams for l in s.layers[: s.layer + 1]),
            sum(l.nb_coupled_substreams for l in s.layers[: s.layer + 1]),
            self.frame_size,
        )
        self.substream_ids = list(el.substream_ids)

        order = s.channels_order[: s.selected_channels]
        self.demix_spec = DemixSpec(
            layout=s.selected_layout,
            channels_in=tuple(order),
            frame_size=self.frame_size,
            output_gains=(1.0,) * len(order),
        )
        out_ch = self.layout.channels

        # render matrix: downmix graph flattened, or M2M table
        in_layout = s.selected_layout
        tgt = SS_TO_LAYOUT.get(SoundSystem(sound_system))
        if (
            tgt is not None
            and s.dmx_default_mode >= 0
            and can_downmix(in_layout, tgt)
        ):
            mode = max(s.dmx_default_mode, 0)
            self.render_mat = downmix_matrix(
                in_layout, tgt, mode, max(s.dmx_default_w_idx, 0)
            )
        else:
            self.render_mat = rdr.m2m_matrix(
                rdr.LAYER_IDS[in_layout], self.layout.render_id
            ).T.copy()

        self.input_scale = 1.0
        self.raw_input = hasattr(self.codec, "decode_batch_raw")
        if self.raw_input:
            self.input_scale = 1.0 / float(getattr(self.codec, "scale", 1.0))
        # Opus: host entropy layers -> device synthesis (codecs/opus/tpu_synth)
        self.opus_synth = None
        if (hasattr(self.codec, "decode_spectrum_batch")
                and self.frame_size == 960):
            from ..codecs.opus import tpu_synth

            self.opus_synth = tpu_synth
        self.cfg = PipelineConfig(
            frame_size=self.frame_size,
            out_channels=out_ch,
            bits=bits,
            elements=(
                ElementSpec(
                    demix=self.demix_spec,
                    n_in=len(order),
                    n_rendered=len(order),
                    input_scale=self.input_scale,
                ),
            ),
            limiter=LimiterConfig(channels=out_ch) if limiter else None,
        )

    @property
    def n_frames(self) -> int:
        return min(
            len(self.frames_per_substream.get(sid, [])) for sid in self.substream_ids
        )

    def decode_all(self) -> np.ndarray:
        """Decode everything; returns [samples, out_channels] int PCM.

        Host unpack is a single vectorized pass; device batches are enqueued
        asynchronously (JAX dispatch) and results fetched at the end, so
        host<->device transfers overlap with compute.
        """
        B = self.batch_frames
        T = self.frame_size
        n = self.n_frames
        carry = init_carry(self.cfg)
        mat = jnp.asarray(self.render_mat)

        # one vectorized unpack for the whole stream
        packets_per_substream = [
            self.frames_per_substream[sid] for sid in self.substream_ids
        ]
        all_x = None
        syn_carry = None
        if self.opus_synth is not None:
            syn_carry = self.opus_synth.init_carry(
                sum(ch for _, ch in self.codec._decoders))
        elif self.raw_input:
            all_x, _scale = self.codec.decode_batch_raw(packets_per_substream, T)
        elif hasattr(self.codec, "decode_batch"):
            all_x = self.codec.decode_batch(packets_per_substream, T)
        else:
            all_x = np.stack(
                [
                    self.codec.decode([p[k] for p in packets_per_substream])
                    for k in range(n)
                ]
            )

        ones_bt = jnp.ones((B, T), jnp.float32)
        zeros_rg = jnp.zeros((B, 0, T), jnp.float32)
        zeros_bt = jnp.zeros((B, T), jnp.float32)
        mat_b = jnp.broadcast_to(mat, (B,) + mat.shape)
        factors = {k: ones_bt for k in ("alpha", "beta", "gamma", "delta", "dw")}

        device_outs = []
        counts = []
        for start in range(0, n, B):
            count = min(B, n - start)
            if self.opus_synth is not None:
                blk = [[p[k] for p in packets_per_substream]
                       for k in range(start, start + count)]
                d = self.codec.decode_spectrum_batch(blk)
                pad = B - count
                if pad:
                    padded = {
                        k: np.concatenate(
                            [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                        for k, v in d.items() if isinstance(v, np.ndarray)
                    }
                    padded["t_cur"] = np.maximum(padded["t_cur"], 15)
                    padded["t_new"] = np.maximum(padded["t_new"], 15)
                    d.update(padded)
                params = self.opus_synth.SynthParams(
                    freq=jnp.asarray(d["freq"]),
                    transient=jnp.asarray(d["transient"]),
                    t_cur=jnp.asarray(d["t_cur"]), t_new=jnp.asarray(d["t_new"]),
                    g_cur=jnp.asarray(d["g_cur"]), g_new=jnp.asarray(d["g_new"]))
                xs, syn_carry = self.opus_synth.synthesize(
                    params, syn_carry,
                    chunk=self.opus_synth.pick_chunk(d["min_period"]))
            else:
                xs = all_x[start : start + count]
                if count < B:
                    xs = np.concatenate(
                        [xs, np.zeros((B - count,) + xs.shape[1:], xs.dtype)]
                    )
            batch = {
                "x": [jnp.asarray(xs)],
                "factors": [factors],
                "rg_index": [()],
                "rg_filt": [zeros_rg],
                "render_prev": [mat_b],
                "render_cur": [mat_b],
                "offset_mask": [zeros_bt],
                "elem_gain": [ones_bt],
                "out_gain": ones_bt,
            }
            carry, pcm = decode_frames(self.cfg, carry, batch)
            device_outs.append(pcm)
            counts.append(count)

        outs = [
            np.asarray(pcm[:c]).reshape(c * T, -1)
            for pcm, c in zip(device_outs, counts)
        ]
        out = np.concatenate(outs, axis=0)
        # limiter look-ahead: drop the first delay samples, drain the tail
        if self.cfg.limiter is not None:
            d = self.cfg.limiter.delay_size
            out = out[d:]
        # edge trims (codec pre-skip etc.): the IAMF spec restricts trimming
        # to the stream head/tail, so the batched path applies the totals to
        # the assembled output (the per-frame api path trims pre-mix; the two
        # agree whenever the limiter is not engaged at the boundary)
        lead = sum(t[0] for t in self.trims[:n])
        tail = sum(t[1] for t in self.trims[:n])
        if lead:
            out = out[lead:]
        if tail:
            out = out[: len(out) - tail]
        return out
