"""Conformance vlogger: serialize every parsed OBU to YAML text logs.

Framework equivalent of the reference SUPPORT_VERIFIER vlogging
(vlogging_tool_sr.c:298-948 per-type writers, vlog_obu :948): the AOM
conformance tooling diffs these logs against reference encoders. Enable via
IAMFDecoder hooks or the player's -v flag.
"""

from __future__ import annotations

from typing import TextIO

from ..constants import OBUType
from ..obu import objects as o
from ..obu import parser


def _yaml(d, indent=0) -> str:
    pad = "  " * indent
    lines = []
    for k, v in d.items():
        if isinstance(v, dict):
            lines.append(f"{pad}{k}:")
            lines.append(_yaml(v, indent + 1))
        elif isinstance(v, (list, tuple)):
            if v and isinstance(v[0], dict):
                lines.append(f"{pad}{k}:")
                for item in v:
                    body = _yaml(item, indent + 2)
                    first, *rest = body.splitlines() or [""]
                    lines.append(f"{pad}  - {first.strip()}")
                    lines.extend(rest)
            else:
                lines.append(f"{pad}{k}: [{', '.join(str(x) for x in v)}]")
        else:
            lines.append(f"{pad}{k}: {v}")
    return "\n".join(lines)


class VLogger:
    def __init__(self, f: TextIO):
        self.f = f
        self._count = 0

    def log_obu(self, obu: o.OBU) -> None:
        entry = None
        t = obu.type
        if t == OBUType.SEQUENCE_HEADER:
            sh = parser.parse_sequence_header(obu)
            entry = {
                "ia_sequence_header_obu": {
                    "ia_code": int.from_bytes(sh.iamf_code, "little"),
                    "primary_profile": sh.primary_profile,
                    "additional_profile": sh.additional_profile,
                }
            }
        elif t == OBUType.CODEC_CONFIG:
            cc = parser.parse_codec_config(obu)
            entry = {
                "codec_config_obu": {
                    "codec_config_id": cc.codec_conf_id,
                    "codec_config": {
                        "codec_id": int.from_bytes(cc.codec_4cc, "little"),
                        "num_samples_per_frame": cc.nb_samples_per_frame,
                        "audio_roll_distance": cc.roll_distance,
                    },
                }
            }
        elif t == OBUType.AUDIO_ELEMENT:
            el = parser.parse_audio_element(obu)
            d = {
                "audio_element_id": el.element_id,
                "audio_element_type": el.element_type,
                "codec_config_id": el.codec_config_id,
                "num_substreams": el.nb_substreams,
                "audio_substream_ids": list(el.substream_ids),
                "num_parameters": len(el.parameters),
            }
            if el.channels_config is not None:
                d["scalable_channel_layout_config"] = {
                    "num_layers": el.channels_config.nb_layers,
                    "channel_audio_layer_configs": [
                        {
                            "loudspeaker_layout": layer.loudspeaker_layout,
                            "output_gain_is_present_flag": int(layer.output_gain_flag),
                            "recon_gain_is_present_flag": int(layer.recon_gain_flag),
                            "substream_count": layer.nb_substreams,
                            "coupled_substream_count": layer.nb_coupled_substreams,
                        }
                        for layer in el.channels_config.layers
                    ],
                }
            if el.ambisonics_config is not None:
                d["ambisonics_config"] = {
                    "ambisonics_mode": el.ambisonics_config.mode,
                    "output_channel_count": el.ambisonics_config.output_channel_count,
                    "substream_count": el.ambisonics_config.substream_count,
                }
            entry = {"audio_element_obu": d}
        elif t == OBUType.MIX_PRESENTATION:
            mp = parser.parse_mix_presentation(obu)
            sub = mp.sub_mixes[0]
            entry = {
                "mix_presentation_obu": {
                    "mix_presentation_id": mp.mix_presentation_id,
                    "count_label": mp.num_labels,
                    "language_labels": list(mp.languages),
                    "num_sub_mixes": len(mp.sub_mixes),
                    "sub_mixes": [
                        {
                            "num_audio_elements": len(sub.elements),
                            "audio_element_ids": [
                                e.element_id for e in sub.elements
                            ],
                            "num_layouts": len(sub.layouts),
                            "layouts": [
                                {
                                    "layout_type": l.type,
                                    "sound_system": l.sound_system,
                                }
                                for l in sub.layouts
                            ],
                        }
                    ],
                }
            }
        elif obu.is_audio_frame:
            f = parser.parse_audio_frame(obu)
            entry = {
                "audio_frame_obu": {
                    "audio_substream_id": f.substream_id,
                    "size": len(f.data),
                    "num_samples_to_trim_at_start": f.trim_start,
                    "num_samples_to_trim_at_end": f.trim_end,
                }
            }
        elif t == OBUType.TEMPORAL_DELIMITER:
            entry = {"temporal_delimiter_obu": {}}
        if entry is None:
            return
        self.f.write(f"#{self._count}\n")
        self.f.write(_yaml(entry))
        self.f.write("\n---\n")
        self._count += 1


def vlog_stream(data: bytes, out: TextIO) -> int:
    """Log every OBU in a bitstream; returns OBU count."""
    off = max(parser.find_sequence_header(data), 0)
    v = VLogger(out)
    n = 0
    for obu in parser.iter_obus(memoryview(data)[off:]):
        v.log_obu(obu)
        n += 1
    return n
