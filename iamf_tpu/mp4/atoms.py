"""MP4 box-tree dump + conformance YAML vlogger.

Framework equivalents of the reference verifier tooling: `atom_dump`
(test/tools/iamfplayer/src/atom.c:294+, pretty-prints the box tree) and the
MP4 YAML vlogger (vlogging_iamfmp4_sr.c:193+ `write_*_atom_log`, consumed by
the AOM conformance comparison tool). Exposed through the player's -v flag
for -i1 (mp4) inputs.
"""

from __future__ import annotations

import struct
from typing import TextIO

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"moof",
    b"traf", b"mvex", b"udta", b"dinf",
}

_FULLBOX = {
    b"mvhd", b"tkhd", b"mdhd", b"hdlr", b"elst", b"stts", b"stsc",
    b"stsz", b"stco", b"co64", b"stsd", b"sgpd", b"sbgp", b"tfhd",
    b"trun", b"tfdt", b"mehd", b"trex", b"smhd",
}


def _u(b, off, n):
    return int.from_bytes(b[off:off + n], "big")


def iter_boxes(data, start, end):
    pos = start
    while pos + 8 <= end:
        size = _u(data, pos, 4)
        btype = bytes(data[pos + 4:pos + 8])
        body = pos + 8
        if size == 1:
            size = _u(data, pos + 8, 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def atom_dump(data: bytes, out: TextIO) -> int:
    """Pretty-print the full box tree (atom.c:294 atom_dump analogue).
    Returns the box count."""
    n = 0

    def walk(start, end, depth):
        nonlocal n
        for btype, body, bend in iter_boxes(data, start, end):
            name = btype.decode("latin1")
            out.write(f"{'  ' * depth}{name} size={bend - (body - 8)}"
                      f" @{body - 8}\n")
            n += 1
            if btype in _CONTAINERS:
                walk(body, bend, depth + 1)

    walk(0, len(data), 0)
    return n


class MP4VLogger:
    """YAML per-box logs mirroring vlogging_iamfmp4_sr.c writers."""

    def __init__(self, f: TextIO):
        self.f = f
        self._count = 0

    def _emit(self, name: str, fields: dict) -> None:
        self.f.write(f"#{self._count}\n{name}:\n")
        for k, v in fields.items():
            if isinstance(v, (list, tuple)):
                self.f.write(f"  {k}: [{', '.join(str(x) for x in v)}]\n")
            else:
                self.f.write(f"  {k}: {v}\n")
        self.f.write("---\n")
        self._count += 1

    def log(self, data: bytes) -> int:
        self._walk(data, 0, len(data))
        return self._count

    def _walk(self, data, start, end):
        for btype, body, bend in iter_boxes(data, start, end):
            self._box(data, btype, body, bend)
            if btype in _CONTAINERS:
                self._walk(data, body, bend)

    def _box(self, d, t, b, e):
        if t == b"ftyp":
            brands = [d[i:i + 4].decode("latin1") for i in range(b + 8, e, 4)]
            self._emit("ftyp", {
                "major_brand": d[b:b + 4].decode("latin1"),
                "minor_version": _u(d, b + 4, 4),
                "compatible_brands": brands,
            })
        elif t == b"mvhd":
            ver = d[b]
            off = b + 4 + (16 if ver else 8)
            self._emit("mvhd", {
                "version": ver,
                "timescale": _u(d, off, 4),
                "duration": _u(d, off + 4, 8 if ver else 4),
            })
        elif t == b"mdhd":
            ver = d[b]
            off = b + 4 + (16 if ver else 8)
            self._emit("mdhd", {
                "version": ver,
                "timescale": _u(d, off, 4),
                "duration": _u(d, off + 4, 8 if ver else 4),
            })
        elif t == b"hdlr":
            self._emit("hdlr", {
                "handler_type": d[b + 8:b + 12].decode("latin1"),
            })
        elif t == b"elst":
            ver = d[b]
            cnt = _u(d, b + 4, 4)
            entries = []
            off = b + 8
            for _ in range(cnt):
                if ver:
                    dur, mt = _u(d, off, 8), _u(d, off + 8, 8)
                    off += 20
                else:
                    dur, mt = _u(d, off, 4), _u(d, off + 4, 4)
                    off += 12
                entries.append(f"(dur={dur} media_time={mt})")
            self._emit("elst", {"entry_count": cnt, "entries": entries})
        elif t == b"stsd":
            cnt = _u(d, b + 4, 4)
            fmt = d[b + 12:b + 16].decode("latin1") if e - b >= 16 else "?"
            fields = {"entry_count": cnt, "format": fmt}
            if fmt == "iamf":
                # IAMFSampleEntry: AudioSampleEntry then iacb config box
                # (mp4demux.c:512 mov_read_iamf)
                se = b + 8
                fields["channelcount"] = _u(d, se + 8 + 16, 2)
                fields["samplerate"] = _u(d, se + 8 + 24, 4) >> 16
                for bt2, b2, e2 in iter_boxes(d, se + 44, e):
                    if bt2 == b"iacb":
                        fields["configurationVersion"] = d[b2]
                        fields["configOBUs_size"] = e2 - b2 - 1
            self._emit("stsd", fields)
        elif t == b"stts":
            cnt = _u(d, b + 4, 4)
            entries = [
                f"(count={_u(d, b + 8 + i * 8, 4)}"
                f" delta={_u(d, b + 12 + i * 8, 4)})"
                for i in range(min(cnt, 8))
            ]
            self._emit("stts", {"entry_count": cnt, "entries": entries})
        elif t == b"stsc":
            self._emit("stsc", {"entry_count": _u(d, b + 4, 4)})
        elif t == b"stsz":
            self._emit("stsz", {
                "sample_size": _u(d, b + 4, 4),
                "sample_count": _u(d, b + 8, 4),
            })
        elif t in (b"stco", b"co64"):
            self._emit(t.decode(), {"entry_count": _u(d, b + 4, 4)})
        elif t == b"sgpd":
            # roll-distance sample group (mp4demux.c:88 mov_read_sgpd)
            gt = d[b + 4:b + 8].decode("latin1")
            fields = {"grouping_type": gt}
            if gt == "roll":
                cnt = _u(d, b + 12, 4)
                fields["entry_count"] = cnt
                if cnt:
                    fields["roll_distance"] = struct.unpack(
                        ">h", d[b + 16:b + 18])[0]
            self._emit("sgpd", fields)
        elif t == b"tfhd":
            self._emit("tfhd", {"track_ID": _u(d, b + 4, 4)})
        elif t == b"trun":
            self._emit("trun", {"sample_count": _u(d, b + 4, 4)})
        elif t in _CONTAINERS or t in (b"mdat", b"free", b"skip"):
            self._emit(t.decode("latin1"), {"size": e - b + 8})


def vlog_mp4(data: bytes, out: TextIO) -> int:
    """Log every recognized box; returns the log entry count."""
    return MP4VLogger(out).log(data)
