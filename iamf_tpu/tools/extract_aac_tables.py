"""Extract AAC-LC constant tables from the fdk-aac binary.

The AAC-LC decoder algorithms in iamf_tpu/codecs/aac and native/src/aac are
written from the codec specification (ISO/IEC 14496-3 subpart 4); the
*numeric* constant tables they consume — the 11 spectral Huffman codebooks,
the scalefactor codebook, scalefactor-band offsets per sampling rate, and
TNS band limits — are data defined by that spec. This tool reads them out
of the prebuilt fdk-aac static library shipped with the reference
(dep_codecs/lib/fdk-aac_x64.lib, executed nowhere here — only its .data is
read through the COFF image), cross-validates the encoder's canonical
(codeword, length) tables against an independent walk of the decoder's
2-bit Huffman trees, and writes an .npz consumed at runtime.

Usage: python -m iamf_tpu.tools.extract_aac_tables \
          --out iamf_tpu/codecs/aac/data/aac_tables.npz
"""

from __future__ import annotations

import argparse
import ctypes

import numpy as np

# book -> (n_per_axis, dimension, signed, ctab symbol, (ltab symbol, shift))
_ENC = {
    1: (3, 4, True, "?FDKaacEnc_huff_ctab1@@3QAY2222$$CBGA",
        ("?FDKaacEnc_huff_ltab1_2@@3QAY2222$$CBKA", 16)),
    2: (3, 4, True, "?FDKaacEnc_huff_ctab2@@3QAY2222$$CBGA",
        ("?FDKaacEnc_huff_ltab1_2@@3QAY2222$$CBKA", 0)),
    3: (3, 4, False, "?FDKaacEnc_huff_ctab3@@3QAY2222$$CBGA",
        ("?FDKaacEnc_huff_ltab3_4@@3QAY2222$$CBKA", 16)),
    4: (3, 4, False, "?FDKaacEnc_huff_ctab4@@3QAY2222$$CBGA",
        ("?FDKaacEnc_huff_ltab3_4@@3QAY2222$$CBKA", 0)),
    5: (9, 2, True, "?FDKaacEnc_huff_ctab5@@3QAY08$$CBGA",
        ("?FDKaacEnc_huff_ltab5_6@@3QAY08$$CBKA", 16)),
    6: (9, 2, True, "?FDKaacEnc_huff_ctab6@@3QAY08$$CBGA",
        ("?FDKaacEnc_huff_ltab5_6@@3QAY08$$CBKA", 0)),
    7: (8, 2, False, "?FDKaacEnc_huff_ctab7@@3QAY07$$CBGA",
        ("?FDKaacEnc_huff_ltab7_8@@3QAY07$$CBKA", 16)),
    8: (8, 2, False, "?FDKaacEnc_huff_ctab8@@3QAY07$$CBGA",
        ("?FDKaacEnc_huff_ltab7_8@@3QAY07$$CBKA", 0)),
    9: (13, 2, False, "?FDKaacEnc_huff_ctab9@@3QAY0N@$$CBGA",
        ("?FDKaacEnc_huff_ltab9_10@@3QAY0N@$$CBKA", 16)),
    10: (13, 2, False, "?FDKaacEnc_huff_ctab10@@3QAY0N@$$CBGA",
         ("?FDKaacEnc_huff_ltab9_10@@3QAY0N@$$CBKA", 0)),
    11: (17, 2, False, "?FDKaacEnc_huff_ctab11@@3QAY0BB@$$CBGA",
         ("?FDKaacEnc_huff_ltab11@@3QAY0BB@$$CBEA", None)),  # u8 lens
}
_SCF_C = "?FDKaacEnc_huff_ctabscf@@3QBKB"
_SCF_L = "?FDKaacEnc_huff_ltabscf@@3QBEB"
_DEC_BOOKS = "?AACcodeBookDescriptionTable@@3QBUCodeBookDescription@@B"
_DEC_SCF = "?AACcodeBookDescriptionSCL@@3UCodeBookDescription@@B"
_SFB_OFFSETS = "?sfbOffsetTables@@3QAY0BA@$$CBUSFB_INFO@@A"
_TNS_MAX = "?tns_max_bands_tbl@@3QAY01$$CBEA"


def _rd(addr, dtype, count):
    return np.frombuffer(
        ctypes.string_at(addr, np.dtype(dtype).itemsize * count), dtype=dtype
    ).copy()


def _check_prefix_free(codes, lens):
    """Complete prefix code: Kraft sum 1 and no codeword prefixes another."""
    assert sum(2.0 ** -int(l) for l in lens) == 1.0, "Kraft sum != 1"
    pairs = sorted(zip(lens.tolist(), codes.tolist()))
    for i, (la, ca) in enumerate(pairs):
        for lb, cb in pairs[i + 1:]:
            assert not (cb >> (lb - la)) == ca, "prefix collision"


def _walk_decoder_tree(tree, dim, numbits, offset):
    """Independent reconstruction from the decoder's 2-bit-stride tree.

    Each USHORT node value v: bit0 = leaf flag, bit1 = 'second lookup bit
    unused' (push back), v>>2 = child node index or packed leaf value.
    Returns {tuple(values): (code, length)}.
    """
    out = {}

    def rec(index, code, nbits):
        assert nbits <= 20, "runaway tree"
        for b in range(4):
            v = int(tree[index][b])
            c2 = (code << 2) | b
            if v & 1:
                val, cc, nn = v >> 2, c2, nbits + 2
                if v & 2:  # leaf reached after 1 of the 2 bits
                    cc, nn = c2 >> 1, nbits + 1
                # leaf packs the FIRST spectral value in the LOW bits
                vals = tuple(
                    ((val >> (numbits * i)) & ((1 << numbits) - 1)) - offset
                    for i in range(dim)
                )
                prev = out.get(vals)
                if prev is None or nn < prev[1]:
                    out[vals] = (cc, nn)
            else:
                rec(v >> 2, c2, nbits + 2)

    rec(0, 0, 0)
    return out


def extract(out_path: str) -> dict:
    from iamf_tpu.codecs.aac.fdk import image

    img = image()
    tables = {}

    # --- spectral codebooks 1..11 from the encoder's canonical tables
    for book, (n, dim, signed, csym, (lsym, shift)) in _ENC.items():
        cnt = n ** dim
        codes = _rd(img.sym(csym), np.uint16, cnt)
        if shift is None:
            lens = _rd(img.sym(lsym), np.uint8, cnt)
        else:
            lens = ((_rd(img.sym(lsym), np.uint32, cnt) >> shift) & 0xFF).astype(
                np.uint8)
        _check_prefix_free(codes, lens)
        tables[f"book{book}_codes"] = codes
        tables[f"book{book}_lens"] = lens

    # --- scalefactor codebook (121 entries, delta index 0..120 -> -60..60)
    scf_codes = _rd(img.sym(_SCF_C), np.uint32, 121)
    scf_lens = _rd(img.sym(_SCF_L), np.uint8, 121)
    _check_prefix_free(scf_codes, scf_lens)
    tables["scf_codes"] = scf_codes
    tables["scf_lens"] = scf_lens

    # --- cross-validate against the decoder's own Huffman trees
    base = img.sym(_DEC_BOOKS)  # CodeBookDescription[13], 16-byte stride
    for book in list(range(1, 12)) + ["scf"]:
        if book == "scf":
            addr = img.sym(_DEC_SCF)
        else:
            addr = base + 16 * book
        ptr = int(_rd(addr, np.uint64, 1)[0])
        dim, numbits, offset = (int(x) for x in _rd(addr + 8, np.uint8, 3))
        tree = _rd(ptr, np.uint16, 4 * 1024).reshape(-1, 4)
        dec = _walk_decoder_tree(tree, dim, numbits, offset)
        if book == "scf":
            n, signed = 121, True  # deltas -60..60
            codes, lens = scf_codes, scf_lens
            centered = True
        else:
            n, _, signed = _ENC[book][0], _ENC[book][1], _ENC[book][2]
            codes = tables[f"book{book}_codes"]
            lens = tables[f"book{book}_lens"]
            centered = signed
        lav = (n - 1) // 2 if centered else n - 1
        it = np.ndindex(*([n] * dim)) if book != "scf" else np.ndindex(121)
        for flat, idxs in enumerate(it):
            vals = tuple(i - (lav if centered else 0) for i in idxs)
            code, length = dec[vals]
            assert code == int(codes[flat]) and length == int(lens[flat]), (
                f"book {book} entry {vals}: enc ({codes[flat]},{lens[flat]}) "
                f"!= dec ({code},{length})")

    # --- scalefactor band offsets, decoder table (SFB_INFO[13] used entries)
    base = img.sym(_SFB_OFFSETS)
    n_long = np.zeros(13, np.int32)
    n_short = np.zeros(13, np.int32)
    off_long = np.zeros((13, 52), np.int16)
    off_short = np.zeros((13, 16), np.int16)
    for i in range(13):
        pl, ps = (int(x) for x in _rd(base + 24 * i, np.uint64, 2))
        nl, ns = (int(x) for x in _rd(base + 24 * i + 16, np.uint8, 2))
        ol = _rd(pl, np.int16, nl + 1)
        os_ = _rd(ps, np.int16, ns + 1)
        assert ol[0] == 0 and ol[-1] == 1024 and np.all(np.diff(ol) > 0), ol
        assert os_[0] == 0 and os_[-1] == 128 and np.all(np.diff(os_) > 0)
        n_long[i], n_short[i] = nl, ns
        off_long[i, : nl + 1] = ol
        off_short[i, : ns + 1] = os_
    tables["sfb_n_long"] = n_long
    tables["sfb_n_short"] = n_short
    tables["sfb_off_long"] = off_long
    tables["sfb_off_short"] = off_short

    # --- TNS max bands per sampling rate index [long, short]
    tables["tns_max_bands"] = _rd(img.sym(_TNS_MAX), np.uint8, 26).reshape(
        13, 2)

    if out_path:
        np.savez_compressed(out_path, **tables)
    return tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="iamf_tpu/codecs/aac/data/aac_tables.npz")
    args = ap.parse_args()
    import os

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    t = extract(args.out)
    print(f"wrote {args.out}: {len(t)} arrays")
    print("48k sfb long:", t["sfb_off_long"][3][: t["sfb_n_long"][3] + 1])
    print("48k sfb short:", t["sfb_off_short"][3][: t["sfb_n_short"][3] + 1])
    print("tns_max_bands:", t["tns_max_bands"].tolist())


if __name__ == "__main__":
    main()
