#!/usr/bin/env python
"""Non-initial context-model campaign (r5 continuation).

Determines, by black-box probing of OpenJPEG's HT decoder, which causal
neighbors enter the NON-INITIAL quad significance context, and extracts
codeword banks for the novel classes.

Target = quad (1,1) of a 4x4 block (second of its pair, so the pair's
u-section directly follows its codeword — no mate parse in the tail).
The preamble is built BY HAND from already-validated pieces only:

  initial row    A0 (0,0), A1 (0,1): validated initial banks
  left quad      B0 (1,0): AZC when the above row is empty (validated
                 azc bank, u_off=0 entries), or the 1-bit rho-0 codeword
                 when only its N1 is significant (validated by probe)

Context inputs reachable at (1,1):
  N0=(1,2)<-A1.n1   N1=(1,3)<-A1.n3   NW=(1,1)<-A0.n3
  W = left quad B0 significance (which samples of B0 matter is itself
  probed: rho 1/2/3 = left column only, 4/8/12 = right column)

Usage: python tools/htj2k_ctx.py sweep|extract:<case>
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tools.htj2k_extract import (  # noqa: E402
    FPPATS,
    Target,
    bank_rho_tuple,
    extract,
)
from tools.htj2k_map import Prober, seg  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "lungmask_tpu", "io", "htj2k_tables.json")
OUT = "/tmp/ht_map/ctx_campaign.json"


def _tables():
    return json.load(open(ART))["banks"]


def _pick(T, bank, rho, uoff=0):
    out = sorted(
        [(cw, e) for cw, e in T[bank].items()
         if e.get("rho") == rho and e.get("u_off", 0) == uoff],
        key=lambda t: len(t[0]))
    if not out:
        raise KeyError(f"no (rho={rho},uoff={uoff}) in {bank}")
    return out[0]


V1 = None  # filled from htj2k_map constants


def build_cfg(a0, a1, b0, a2=None):
    """Hand-built preamble for target (1,1) of a 4x4 (or 4x6 when a2 is
    given, adding a third initial-row quad = the target's NE source). All
    preamble quads use mu=1 samples (u_off=0 codewords)."""
    from tools.htj2k_map import MM, PREC
    from lungmask_tpu.io.htj2k import MELEncoder

    scale = 1 << (PREC - MM)
    v1 = 3 * scale // 2
    T = _tables()
    art = json.load(open(ART))
    ctx_initial = art["ctx_initial"]
    mel_events = []
    pre = []
    expect = {}
    magbits = 0
    # initial row: quads A0, A1 [, A2]; context = f(left quad rho)
    arow = [a0, a1] + ([a2] if a2 is not None else [])
    for i, rho in enumerate(arow):
        left = arow[i - 1] if i > 0 else 0
        bank = ctx_initial[str(left)]
        if bank == "azc":
            mel_events.append(1 if rho else 0)
            if rho == 0:
                continue
            bank = ctx_initial["azc"]
        cw, e = _pick(T, bank, rho)
        pre += [int(c) for c in cw]
        magbits += bin(rho).count("1")
        for k in range(4):
            if rho >> k & 1:
                expect[(k & 1, 2 * i + (k >> 1))] = v1
    # row 1, quad B0
    b0_ctx_n1 = (a0 >> 3) & 1         # (1,1) sig -> B0's N1
    b0_ctx_n0 = (a0 >> 1) & 1         # (1,0) sig -> B0's N0
    b0_ctx_ne = (a1 >> 1) & 1         # (1,2) sig -> B0's NE
    key = (b0_ctx_n0, b0_ctx_n1 or b0_ctx_ne)
    bank = {(0, 0): None, (1, 0): "row1:above_rho2",
            (0, 1): "row1:above_rho12", (1, 1): "row1:above_rho10"}[key]
    if bank is None:  # AZC
        mel_events.append(1 if b0 else 0)
        if b0:
            cw, e = _pick(T, "row1:above_rho1", b0)
            pre += [int(c) for c in cw]
            magbits += bin(b0).count("1")
    else:
        cw, e = _pick(T, bank, b0)
        pre += [int(c) for c in cw]
        magbits += bin(b0).count("1")
    for k in range(4):
        if b0 >> k & 1:
            expect[(2 + (k & 1), (k >> 1))] = v1
    # planted MEL 'significant' event in case the target is AZC-gated
    mel_events.append(1)
    melw = MELEncoder()
    for ev in mel_events:
        melw.event(ev)
    mel = list(melw.flush()) or [0x00]
    samples = [(2, 2), (3, 2), (2, 3), (3, 3)]
    return dict(w=4 if a2 is None else 6, h=4, mel=mel, pre=pre,
                samples=samples, pre_magsgn_bits=magbits, pre_expect=expect)


CASES = {
    # sanity reproductions of the known above-only classes at this position
    "n0": (0, 2, 0), "n1": (0, 8, 0), "n01": (0, 10, 0),
    # W: which left-quad samples matter
    "w-n0": (0, 0, 1), "w-n1": (0, 0, 2), "w-n01": (0, 0, 3),
    "w-n2": (0, 0, 4), "w-n3": (0, 0, 8), "w-n23": (0, 0, 12),
    "w-all": (0, 0, 15),
    # NW
    "nw": (8, 0, 0),
    # NE (above-right quad's bottom-left sample) — 6-wide, a2 plants it
    "ne": (0, 0, 0, 2),
    "ne+n0": (0, 2, 0, 2),
    # combos for the upper classes
    "w+n0": (0, 2, 8), "w+n1": (0, 8, 8), "w+n01": (0, 10, 8),
    "nw+w": (8, 0, 8), "nw+n0": (8, 2, 0),
    "w+ne": (0, 0, 8, 2),
}


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    p = Prober()
    art = json.load(open(ART))
    known = {name: bank_rho_tuple(tbl) for name, tbl in art["banks"].items()}

    def fp_of(cfg):
        t = Target(p, cfg)
        out = []
        for pat in FPPATS:
            st, r = t.read([int(c) for c in pat] + [1] * 10)
            out.append(r[0] if st == "OK" else str(r)[:14])
        return tuple(out)

    if what == "sweep":
        for label, args in CASES.items():
            try:
                cfg = build_cfg(*args)
            except Exception as e:
                print(f"{label}: BUILD FAIL {e}", flush=True)
                continue
            fp = fp_of(cfg)
            matches = [n for n, k in known.items() if k == fp]
            print(f"{label} {args}: fp={fp} -> {matches or 'NOVEL'}",
                  flush=True)
    elif what.startswith("extract:"):
        name = what.split(":", 1)[1]
        cfg = build_cfg(*CASES[name])
        tbl = extract(Target(p, cfg), name)
        tables = json.load(open(OUT)) if os.path.exists(OUT) else {}
        tables[name] = tbl
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        json.dump(tables, open(OUT, "w"), indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
