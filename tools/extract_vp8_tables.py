#!/usr/bin/env python3
"""Extract the VP8 (lossy keyframe) constant tables VERBATIM from the
system libwebp shared object into src/main/resources/graft/vp8/.

Provenance discipline (the MP3/MP2 rule): RFC 6386's large probability /
dequant tables must be sourced verbatim offline, never reconstructed from
memory. The only on-box verbatim source is the reference implementation
itself — Debian libwebp7 1.2.4, /usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5.
This script locates each table by a structural signature (NOT by blind
offset), cross-checks the decoder and encoder copies where both exist,
and writes the bytes unmodified. The Scala decoder (graft.pipeline.Vp8)
loads them as resources; Vp8Spec then proves them end-to-end by decoding
real libwebp-encoded files pixel-exactly against libwebp's own output.

Tables extracted (names per RFC 6386 / libwebp dec/):
  coeffs_proba0.bin    [4][8][3][11] u8   default token probabilities
                       (RFC 13.5); anchor = the (t0,b1,c0) row
                       253,136,254,255,228,219,128x5, table starts 33
                       bytes earlier (t0,b0 is the unused all-128 band)
  coeffs_update.bin    [4][8][3][11] u8   token-prob update gates
                       (RFC 13.4); the unique 1056-byte run of bytes
                       >= 170 (update gates are all high probabilities)
  bmodes_proba.bin     [10][10][9]   u8   kf intra 4x4 mode probs
                       (RFC 11.5); anchor = first row
                       231,120,48,89,115,113,120,152,112
  dc_table.bin         [128]         u8   DC dequant lookup (RFC 14.1),
                       monotone 4..157, located right before kBands
  ac_table.bin         [128]         u16LE AC dequant lookup (RFC 14.1),
                       monotone 4..284
  bands.bin            [17]          u8   coefficient-position -> band
  zigzag.bin           [16]          u8   scan order

The small inline constants (kf ymode probs 145,156,163,128; uv mode
probs 142,114,183; cat1..6 extra-bit probs; idct 20091/35468; dequant
clamps 127/117, y2 rules x2 and *101581>>16 min 8) were each verified
as immediates/rows in the same binary's disassembly — see NOTES.md r17.
"""
import struct
import sys
import os

SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "resources", "graft", "vp8")


def find_all(blob, seq):
    locs, i = [], blob.find(seq)
    while i >= 0:
        locs.append(i)
        i = blob.find(seq, i + 1)
    return locs


def main():
    blob = open(SO, "rb").read()
    os.makedirs(OUT, exist_ok=True)
    out = {}

    # --- coeffs_proba0: anchor row (t0,b1,c0), table starts 33 B earlier
    anchor = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
    locs = find_all(blob, anchor)
    assert len(locs) == 2, locs  # decoder + encoder copies
    starts = [l - 33 for l in locs]
    tabs = [blob[s:s + 1056] for s in starts]
    assert tabs[0] == tabs[1], "dec/enc CoeffsProba0 copies differ"
    assert all(1 <= x <= 255 for x in tabs[0])
    assert tabs[0][:33] == bytes([128] * 33), "t0,b0 must be all-128"
    out["coeffs_proba0.bin"] = tabs[0]

    # --- coeffs_update: the only >=1056-byte runs of bytes >= 170
    runs, cur = [], 0
    for i, x in enumerate(blob):
        if x >= 170:
            cur += 1
        else:
            if cur >= 1056:
                runs.append((i - cur, cur))
            cur = 0
    assert len(runs) == 2, runs
    upd = [blob[s:s + 1056] for s, _ in runs]
    assert upd[0] == upd[1], "dec/enc CoeffsUpdateProba copies differ"
    assert upd[0][:11] == bytes([255] * 11)
    out["coeffs_update.bin"] = upd[0]

    # --- bmodes_proba: anchor = kf_bmode_prob[0][0] row
    banchor = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
    blocs = find_all(blob, banchor)
    assert len(blocs) == 2, blocs
    btabs = [blob[l:l + 900] for l in blocs]
    assert btabs[0] == btabs[1]
    assert all(1 <= x <= 255 for x in btabs[0])
    out["bmodes_proba.bin"] = btabs[0]

    # --- bands + zigzag
    bands = bytes([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7, 0])
    bl = find_all(blob, bands)
    assert len(bl) >= 1, "kBands not found"
    out["bands.bin"] = bands
    zig = bytes([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])
    assert find_all(blob, zig), "zigzag not found"
    out["zigzag.bin"] = zig

    # --- dequant tables: dc (u8, ends right before kBands), ac (u16 ramp)
    dc = blob[bl[0] - 128:bl[0]]
    assert dc[0] == 4 and dc[-1] == 157
    assert all(dc[i] <= dc[i + 1] for i in range(127))
    out["dc_table.bin"] = dc
    ramp = struct.pack("<8H", 4, 5, 6, 7, 8, 9, 10, 11)
    aclocs = [l for l in find_all(blob, ramp)]
    acs = []
    for l in aclocs:
        v = struct.unpack("<128H", blob[l:l + 256])
        if all(v[i] <= v[i + 1] for i in range(127)) and v[-1] == 284:
            acs.append(blob[l:l + 256])
    assert len(acs) == 2 and acs[0] == acs[1], len(acs)
    out["ac_table.bin"] = acs[0]

    # --- cat extra-bit probs: verify presence (embedded in Scala as the
    # RFC constants; this asserts the binary agrees)
    assert find_all(blob, bytes([254, 254, 243, 230, 196, 177, 153, 140,
                                 133, 130, 129])), "kCat6 not found"

    for name, data in out.items():
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")
    print("all tables extracted and cross-verified")


if __name__ == "__main__":
    sys.exit(main())
