"""Extract Opus codec constant tables from the BSD-licensed libopus binary.

The Opus decoder algorithms in iamf_tpu/codecs/opus are written from the
codec specification (RFC 6716); the *numeric* constant tables they consume
(probability models, band layouts, PVQ combinatorics, FFT/MDCT twiddles,
SILK iCDF tables) are data defined by that spec. This tool reads them out of
the prebuilt libopus static library shipped with the reference
(dep_codecs/lib/libopus.a, BSD license) into an .npz consumed at runtime.

Usage: python -m iamf_tpu.tools.extract_opus_tables \
          --lib /root/reference/dep_codecs/lib/libopus.a \
          --out iamf_tpu/codecs/opus/data/opus_tables.npz
"""

from __future__ import annotations

import argparse
import io
import os
import subprocess
import tempfile

import numpy as np
from elftools.elf.elffile import ELFFile

# symbol -> (dtype, member hint). Names may carry .NNNN local suffixes.
WANTED = {
    # CELT mode data (celt/modes.c, static_modes_float.h)
    "eband5ms": np.int16,
    "band_allocation": np.uint8,
    "logN400": np.int16,
    "window120": np.float32,
    "cache_index50": np.int16,
    "cache_bits50": np.uint8,
    "cache_caps50": np.uint8,
    "fft_twiddles48000_960": np.float32,
    "fft_bitrev480": np.int16,
    "fft_bitrev240": np.int16,
    "fft_bitrev120": np.int16,
    "fft_bitrev60": np.int16,
    "mdct_twiddles960": np.float32,
    # entropy models (celt/quant_bands.c, celt/bands.c, celt/celt.c)
    "e_prob_model": np.uint8,
    "small_energy_icdf": np.uint8,
    "spread_icdf": np.uint8,
    "tapset_icdf": np.uint8,
    "trim_icdf": np.uint8,
    # PVQ combinatorics (celt/cwrs.c)
    "CELT_PVQ_U_DATA": np.uint32,
    "CELT_PVQ_U_ROW": np.uint64,  # pointers; use offsets instead
    "LOG2_FRAC_TABLE": np.uint8,
    "bit_interleave_table": np.uint8,
    "bit_deinterleave_table": np.uint8,
    "SPREAD_FACTOR": np.int32,
    "second_check": np.int32,
    "inv_table": np.uint8,
    "gains": np.float32,  # postfilter taps (celt/celt.c)
    "tf_select_table": np.int8,
    "quant_offset": np.int32,
    "eMeans": np.float32,
    "pred_coef": np.float32,
    "beta_coef": np.float32,
    "beta_intra": np.float32,
    "ordery_table": np.int32,
}

SILK_PREFIXES = ("silk_",)


def extract(lib: str) -> dict:
    tmp = tempfile.mkdtemp()
    subprocess.run(["ar", "x", os.path.abspath(lib)], cwd=tmp, check=True)
    out: dict[str, np.ndarray] = {}
    for member in sorted(os.listdir(tmp)):
        if not member.endswith(".o"):
            continue
        path = os.path.join(tmp, member)
        with open(path, "rb") as f:
            elf = ELFFile(f)
            symtab = elf.get_section_by_name(".symtab")
            if symtab is None:
                continue
            sections = list(elf.iter_sections())
            for sym in symtab.iter_symbols():
                name = sym.name
                if not name:
                    continue
                base = name.split(".")[0]
                dt = None
                if base in WANTED:
                    dt = WANTED[base]
                elif name.startswith(SILK_PREFIXES) and sym['st_info']['type'] == 'STT_OBJECT':
                    # keep all silk_* tables as raw bytes; dtype applied later
                    dt = np.uint8
                if dt is None:
                    continue
                if sym["st_info"]["type"] != "STT_OBJECT" or sym["st_size"] == 0:
                    continue
                shndx = sym["st_shndx"]
                if not isinstance(shndx, int):
                    continue
                sec = sections[shndx]
                data = sec.data()[sym["st_value"] : sym["st_value"] + sym["st_size"]]
                arr = np.frombuffer(data, dtype=dt).copy()
                key = base if base in WANTED else name
                if key in out and not np.array_equal(
                    out[key].view(np.uint8), arr.view(np.uint8)
                ):
                    key = f"{member}:{name}"
                out[key] = arr
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lib", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    tables = extract(args.lib)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **tables)
    print(f"wrote {len(tables)} tables to {args.out}")
    for k in sorted(tables):
        if not k.startswith("silk_"):
            print(f"  {k}: {tables[k].dtype}[{tables[k].size}]")


if __name__ == "__main__":
    main()
