"""Arbitrary-ratio polyphase sinc resampler (reference: resample.c, the
vendored Speex/speexdsp resampler at quality 4).

TPU-native design: the polyphase FIR bank is a strided convolution — for a
rational in/out rate ratio p/q (gcd-reduced, resample.c:1011+) each output
sample is a dot product of `filt_len` taps selected by the output phase.
We precompute the Kaiser-windowed sinc bank [q_phases, filt_len] on the host
(same design parameters as Speex quality 4) and evaluate frames as a
batched matmul over gathered input windows, with `filt_len-1` samples of
per-channel carry memory (overlap-save) across frames.

Latency/drain mirror the reference: `speex_resampler_skip_zeros` at open
(IAMF_decoder.c:1901) shifts the initial phase, and the flush path pushes
`input_latency` zeros to drain `output_latency` samples (iamf_resample
rest_flag==2 branch, IAMF_decoder.c:3224-3247).

NOTE: numerically equivalent design, not yet bit-identical to speexdsp's
fixed table (cubic-interpolated path & magic-sample bookkeeping TODO —
tracked for the resampler-parity milestone).
"""

from __future__ import annotations

import math

import numpy as np

# Speex quality 4 parameters (resample.c quality_map: filter length 64,
# oversample 128, bandwidth 0.924)
QUALITY4_FILT_LEN = 64
QUALITY4_OVERSAMPLE = 128
QUALITY4_BANDWIDTH = 0.924


def _kaiser_beta_for_quality4() -> float:
    # speexdsp quality 4 uses the KAISER10 window table (stopband ~100 dB)
    return 10.0


def _design_bank(num: int, den: int, filt_len: int, cutoff: float) -> np.ndarray:
    """[den phases, filt_len] polyphase sinc bank; phase k covers fractional
    offset k/den."""
    beta = _kaiser_beta_for_quality4()
    taps = np.zeros((den, filt_len), dtype=np.float64)
    half = filt_len // 2
    for k in range(den):
        frac = k / den
        n = np.arange(filt_len, dtype=np.float64)
        x = n - (half - 1) - frac
        sinc = np.sinc(cutoff * x) * cutoff
        w = np.i0(beta * np.sqrt(np.clip(1 - (x / half) ** 2, 0, 1))) / np.i0(beta)
        taps[k] = sinc * w
    return taps.astype(np.float32)


class Resampler:
    """Streaming rational resampler with per-channel filter memory."""

    def __init__(self, channels: int, in_rate: int, out_rate: int):
        self.channels = channels
        self.in_rate = in_rate
        self.out_rate = out_rate
        g = math.gcd(in_rate, out_rate)
        self.num = in_rate // g  # input step per output frame fraction
        self.den = out_rate // g
        if in_rate > out_rate:
            cutoff = QUALITY4_BANDWIDTH * out_rate / in_rate
            self.filt_len = int(
                math.ceil(QUALITY4_FILT_LEN * in_rate / out_rate / 8) * 8
            )
        else:
            cutoff = QUALITY4_BANDWIDTH
            self.filt_len = QUALITY4_FILT_LEN
        self.bank = _design_bank(self.num, self.den, self.filt_len, cutoff)
        # state: last filt_len-1 input samples per channel
        self.mem = np.zeros((channels, self.filt_len - 1), dtype=np.float32)
        # output sample position tracking: next output sample index maps to
        # input position samp_frac_num/den
        self.int_advance = self.num // self.den
        self.frac_advance = self.num % self.den
        self.samp_frac_num = 0
        self.in_offset = 0  # integer input position not yet consumed
        # skip_zeros: drop the initial half-filter of latency
        self._pending_skip = self.filt_len // 2 - 1
        self.started = False

    @property
    def input_latency(self) -> int:
        return self.filt_len // 2

    @property
    def output_latency(self) -> int:
        return int(
            (self.input_latency * self.den + self.samp_frac_num) // self.num
        )

    def process(self, x: np.ndarray) -> np.ndarray:
        """x: [channels, T] -> [channels, T_out]."""
        if not self.started:
            # skip_zeros: advance the read position past initial latency
            self.in_offset = self._pending_skip
            self.started = True
        buf = np.concatenate([self.mem, x.astype(np.float32)], axis=1)
        total = buf.shape[1]
        outs = []
        pos = self.in_offset
        frac = self.samp_frac_num
        positions = []
        phases = []
        while pos + self.filt_len <= total:
            positions.append(pos)
            phases.append(frac)
            pos += self.int_advance
            frac += self.frac_advance
            if frac >= self.den:
                frac -= self.den
                pos += 1
        if positions:
            idx = np.asarray(positions)[:, None] + np.arange(self.filt_len)[None, :]
            windows = buf[:, idx]  # [C, n_out, filt_len]
            taps = self.bank[np.asarray(phases)]  # [n_out, filt_len]
            out = np.einsum("cnf,nf->cn", windows, taps).astype(np.float32)
            outs.append(out)
        consumed = total - (self.filt_len - 1)
        self.in_offset = max(0, pos - consumed)
        # keep the last filt_len-1 samples as memory
        self.mem = buf[:, consumed:]
        self.samp_frac_num = frac
        if outs:
            return np.concatenate(outs, axis=1)
        return np.zeros((self.channels, 0), dtype=np.float32)

    def drain(self) -> np.ndarray:
        """Flush latency with zero input (rest_flag==2 path)."""
        zeros = np.zeros((self.channels, self.input_latency), dtype=np.float32)
        return self.process(zeros)
