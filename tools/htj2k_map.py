#!/usr/bin/env python
"""Empirical reconstruction of the HT cleanup-pass coding tables (T.814)
by black-box probing of OpenJPEG's conformant HT decoder.

See htj2k_probe.py for the oracle + codestream builder. This tool runs the
reconstruction campaign in stages and persists observations to
/tmp/ht_map/*.json so stages can be re-run incrementally:

  stage1  initial-line-pair, context 0: enumerate VLC bit prefixes on a
          single-quad (2x2) image; BFS until every completion of a prefix
          decodes identically -> the prefix is one consumed unit
          (codeword [+ u-VLC bits]); record significance pattern + values.
  stage2  MagSgn structure: for each stage-1 unit, flip MagSgn bits one at
          a time -> per-sample magnitude bit counts m_n (bit k belongs to
          the sample whose value it changes) and the v -> value map.

Conventions used in observations (OUR labels, not the spec's):
  * samples of a quad are indexed row-major: s0=(0,0) s1=(0,1) s2=(1,0)
    s3=(1,1) of the 2x2 image;
  * VLC bits are numbered in consumption order (first-consumed = bit 0);
    physically: X's high nibble LSB-first, then the previous byte
    LSB-first, and so on backward;
  * MEL bits MSB-first from the MEL segment start; bit=0 at MEL state 0
    means "next AZC quad significant".
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tools.htj2k_probe import Oracle, build_stream

OUT_DIR = "/tmp/ht_map"
PREC = 14
MM = 8  # missing MSBs: allows U_q up to 9 before the oracle rejects


class Prober:
    def __init__(self):
        self.o = Oracle()
        self.cache = {}

    def decode(self, w, h, cleanup, mm=MM, prec=PREC):
        key = (w, h, bytes(cleanup), mm, prec)
        if key in self.cache:
            return self.cache[key]
        ce = (max(2, (w - 1).bit_length()), max(2, (h - 1).bit_length()))
        comps, msgs = self.o.decode(
            build_stream(w, h, prec=prec, sgnd=True, cblk_exp=ce,
                         missing_msbs=mm, passes=[bytes(cleanup)]))
        errs = [m for l, m in msgs if l == "error"]
        out = (None if comps is None else comps[0][0].flatten().tolist(), errs)
        self.cache[key] = out
        return out


def seg(magsgn, mel, vlc_bits, pad_to=None, conformant=True):
    """Assemble a cleanup segment. vlc_bits: list of bits in consumption
    order.

    conformant=True (default) routes the bits through the codec's
    VLCWriter so the physical stream carries the standard's bit-stuffing
    (first-nibble 111 stuffing + the no-0xFF-then->0x8F byte rule) — the
    decoder then consumes exactly the logical bits. conformant=False is
    the historical flat packing (4 bits to the nibble, 8 per byte), which
    silently embeds stuffed bits inside logical offsets whenever a
    stuffing trigger is crossed — kept only to reproduce old campaigns."""
    bits = list(vlc_bits)
    if conformant:
        from lungmask_tpu.io.htj2k import VLCWriter
        w = VLCWriter()
        w.write_bits(bits)
        vlc = w.flush()  # [deepest ... nibble-byte]
        nib = vlc[-1] >> 4
        vbytes = list(reversed(vlc[:-1]))  # consumption order after nibble
    else:
        nib = 0
        for i in range(4):
            if i < len(bits) and bits[i]:
                nib |= 1 << i
        rest = bits[4:]
        vbytes = []
        while rest:
            b = 0
            for i in range(8):
                if i < len(rest) and rest[i]:
                    b |= 1 << i
            vbytes.append(b)
            rest = rest[8:]
    # layout: [magsgn][mel][vN..v1][X][L]; VLC reads backward from X's nibble
    scup = len(mel) + len(vbytes) + 2
    if pad_to is not None and scup < pad_to:
        vbytes = vbytes + [0] * (pad_to - scup)  # extra zero VLC bytes
        scup = pad_to
    assert scup <= 0xFFF
    X = ((scup & 0xF)) | ((nib) << 4)
    L = scup >> 4
    return bytes(magsgn) + bytes(mel) + bytes(reversed(vbytes)) + bytes([X, L])


def bits_from(n, width):
    return [(n >> i) & 1 for i in range(width)]


def stage1(p: Prober):
    """BFS the context-0 initial-pair code on a single-quad image."""
    MAXLEN = 14
    NPROBE = 2  # completions tested per extension step (exhaustive at leaf)
    units = {}
    frontier = [[]]
    while frontier:
        prefix = frontier.pop()
        if len(prefix) > MAXLEN:
            units["".join(map(str, prefix))] = {"status": "overflow"}
            continue
        # decode with all-zero completion and all-one completion + 2 mixed
        outs = []
        for fill in range(4):
            comp = prefix + [(fill >> (i % 2)) & 1
                             for i in range(MAXLEN + 4 - len(prefix))]
            arr, errs = p.decode(2, 2, seg([0] * 8, [0x00], comp))
            outs.append((tuple(arr) if arr else None,
                         errs[0][:50] if errs else None))
        if all(o == outs[0] for o in outs[1:]):
            arr, err = outs[0]
            units["".join(map(str, prefix))] = {
                "out": list(arr) if arr else None, "err": err}
        else:
            frontier.append(prefix + [0])
            frontier.append(prefix + [1])
    return units


def stage2(p: Prober, units):
    """Per consumed unit: which MagSgn bits affect which sample."""
    res = {}
    for cw, info in units.items():
        if info.get("out") is None:
            continue
        base_bits = [int(c) for c in cw]
        base_seg = lambda ms: seg(ms, [0x00], base_bits)
        base, _ = p.decode(2, 2, base_seg([0] * 8))
        probes = []
        for bit in range(44):
            ms = bytearray(8)
            ms[bit // 8] |= 1 << (bit % 8)
            arr, errs = p.decode(2, 2, base_seg(bytes(ms)))
            if arr is None:
                probes.append(None)
            else:
                diff = [i for i in range(4) if arr[i] != base[i]]
                probes.append({"changed": diff,
                               "vals": [arr[i] for i in diff]})
        res[cw] = {"base": base, "magsgn_bits": probes}
    return res


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    p = Prober()
    what = sys.argv[1] if len(sys.argv) > 1 else "stage1"
    if what == "stage1":
        units = stage1(p)
        with open(f"{OUT_DIR}/ctx0_initial.json", "w") as f:
            json.dump(units, f, indent=1, sort_keys=True)
        ok = {k: v for k, v in units.items() if v.get("out")}
        print(f"{len(units)} units ({len(ok)} decodable) -> "
              f"{OUT_DIR}/ctx0_initial.json")
        for k in sorted(ok, key=len):
            print(f"  {k:14s} {ok[k]['out']}")
    elif what == "stage2":
        units = json.load(open(f"{OUT_DIR}/ctx0_initial.json"))
        res = stage2(p, units)
        with open(f"{OUT_DIR}/ctx0_magsgn.json", "w") as f:
            json.dump(res, f, indent=1, sort_keys=True)
        print(f"wrote {OUT_DIR}/ctx0_magsgn.json ({len(res)} units)")


if __name__ == "__main__":
    main()
