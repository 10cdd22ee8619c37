"""AAC-LC multistream decoder for IAMF substreams.

Mirrors the reference AAC path (IAMF_aac_decoder.c:83-161,
aac_multistream_decoder.c:82-218): the IAMF decoder config is an MP4
DecoderConfigDescriptor; the AudioSpecificConfig is extracted from the
DecSpecificInfo tag and its channelConfiguration field is patched per
substream (2 for coupled pairs, 1 for mono). Each substream gets its own
decoder instance fed RAW access units.

Decode backend: the reference's own prebuilt fdk-aac binary, executed
through the COFF loader (coff.py/fdk.py) since no Linux build exists in
this environment — the same dependency model as the reference. The
from-scratch TPU AAC-LC decoder will replace this backend with fdk kept
as the differential oracle.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ...constants import Codec
from ..base import CodecDecoder, register


def extract_asc(decoder_conf: bytes) -> bytes:
    """DecoderConfigDescriptor -> AudioSpecificConfig.

    IAMF's AAC decoder_config uses FIXED-layout descriptors (no expandable
    length fields): tag 0x04, objectTypeIndication 0x40 at [1], streamType
    byte at [2], bufferSizeDB u24, maxBitrate u32, avgBitrate u32, then
    DecSpecificInfoTag 0x05 at [14] and the raw ASC from [15]
    (IAMF_aac_decoder.c:83-96 parses exactly this)."""
    d = bytes(decoder_conf)
    if len(d) < 16 or d[0] != 0x04:
        raise ValueError("bad DecoderConfigDescriptor")
    if d[1] != 0x40 or (d[2] >> 2) & 0x3F != 5 or (d[2] >> 1) & 1:
        raise ValueError("not an MPEG-4 audio stream descriptor")
    if d[14] != 0x05:
        raise ValueError("missing DecSpecificInfoTag")
    return d[15:]


def patch_asc_channels(asc: bytes, channels: int) -> bytes:
    """Set channelConfiguration in the ASC (5b AOT + 4b freq idx [+24b] +
    4b chan cfg), per aac_multistream_decoder.c:204-218."""
    b = bytearray(asc)
    if len(b) < 2:
        raise ValueError("short ASC")
    aot = b[0] >> 3
    if aot == 31:
        raise ValueError("escaped AOT unsupported")
    freq_idx = ((b[0] & 7) << 1) | (b[1] >> 7)
    bitpos = 9 + (24 if freq_idx == 0xF else 0)
    # channelConfiguration is 4 bits at bitpos
    for k in range(4):
        pos = bitpos + k
        byte, bit = divmod(pos, 8)
        mask = 0x80 >> bit
        if channels & (8 >> k):
            b[byte] |= mask
        else:
            b[byte] &= ~mask
    return bytes(b)


@register(Codec.AAC)
class AACDecoder(CodecDecoder):
    def __init__(self, decoder_conf, streams, coupled_streams, frame_size):
        super().__init__(decoder_conf, streams, coupled_streams, frame_size)
        from .fdk import FdkDecoder

        asc = extract_asc(decoder_conf)
        self._decoders = []
        for i in range(streams):
            ch = 2 if i < coupled_streams else 1
            self._decoders.append(
                (FdkDecoder(patch_asc_channels(asc, ch), ch), ch))
        self.delay = 0  # AAC-LC RAW: fdk outputDelay is 0 (no SBR)

    def decode(self, packets: Sequence[Optional[bytes]]) -> np.ndarray:
        outs = []
        for i, (dec, ch) in enumerate(self._decoders):
            pkt = packets[i]
            if pkt is None:
                raise ValueError("missing aac sub packet")
            pcm, _rate = dec.decode(bytes(pkt))
            # reference wrapper: INT_PCM (s16) -> float /32768
            # (IAMF_aac_decoder.c:140-151)
            outs.append((pcm.astype(np.float32) / 32768.0).T[:ch])
        return np.concatenate(outs, axis=0)
