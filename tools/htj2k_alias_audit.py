#!/usr/bin/env python
"""Audit + fix u_off-sibling aliasing in the extracted HT banks.

A trie node N whose true children are (N+'0': u_off=1, kappa all-0) and
(N+'1': u_off=0) is observationally IDENTICAL to a single codeword
(N: u_off=1, kappa all-1) at u in {1,2,3} — the extractor's probe range:
  u=1 -> '1' parses as N+'1' (u_off=0, m = U = 1)
  u=2 -> '01' parses as N+'0' + u-VLC '1'  (u=1, m = U = 2)
  u=3 -> '001b' parses as N+'0' + '01'...  (u=2, m = 3)
The parses diverge first at u=4 ('0011' -> N+'0' with u=2, m=3, not 4).

For every bank entry recorded as (u_off=1, kappa == all ones), probe
cw+uvlc(4): if the first significant sample consumes only 3 MagSgn bits,
the node is aliased — split it into its true children and measure the
u_off=1 child's e1 pattern directly (zero-MagSgn magnitudes at u=1).

Usage: python tools/htj2k_alias_audit.py [--fix]   (fix rewrites tables)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tools.htj2k_extract import Target, uvlc  # noqa: E402
from tools.htj2k_map import MM, PREC, Prober  # noqa: E402
from tools.htj2k_reextract import all_cfgs, BANK_NAME  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "lungmask_tpu", "io", "htj2k_tables.json")
SCALE = 1 << (PREC - MM)


def first_sig_sample(cfg, rho):
    for k in range(4):
        if rho >> k & 1:
            return cfg["samples"][k]
    raise ValueError


def m_of(t, bits, sample, w):
    base, _ = t.decode(bits)
    if base is None:
        return None, None
    m = 0
    lo = t.cfg.get("pre_magsgn_bits", 0)
    for bit in range(lo, lo + 12):
        ms = bytearray(24)
        ms[bit // 8] |= 1 << (bit % 8)
        arr, _ = t.decode(bits, bytes(ms))
        if arr is None:
            continue
        if arr[sample[0] * w + sample[1]] != base[sample[0] * w + sample[1]]:
            m += 1
    return m, base


def audit(fix=False):
    art = json.load(open(ART))
    p = Prober()
    cfgs = all_cfgs()
    fixed = 0
    for key, name in BANK_NAME.items():
        cfg = cfgs[key]
        t = Target(p, cfg)
        bank = art["banks"][name]
        tp = cfg.get("tail_prefix", [])
        for cw in sorted(bank):
            e = bank[cw]
            if e.get("u_off") != 1 or not e.get("kappa"):
                continue
            if any(k != 1 for k in e["kappa"]):
                continue
            rho = e["rho"]
            samp = first_sig_sample(cfg, rho)
            bits4 = [int(c) for c in cw] + tp + uvlc(4) + [1] * 6
            m4, _ = m_of(t, bits4, samp, cfg["w"])
            if m4 is None:
                print(f"{name} {cw}: u=4 probe ERR (skipped)")
                continue
            if m4 == 4:
                continue  # genuine
            if m4 != 3:
                print(f"{name} {cw}: UNEXPECTED m4={m4}")
                continue
            # aliased: split. u_off=1 child kappa all-0; measure its e1 at
            # u=1 (mu = 1 + e1*2^(U-1) with U=1 -> m=1: mu in {1,2})
            n = len(e["kappa"])
            bits_c0 = [int(c) for c in cw] + [0] + tp + uvlc(1) + [1] * 6
            base, _ = t.decode(bits_c0)  # wrong signature; use m_of
            m1, base = m_of(t, bits_c0, samp, cfg["w"])
            e1_child = []
            sig = [k for k in range(4) if rho >> k & 1]
            for k in sig:
                r, c = cfg["samples"][k]
                v = base[r * cfg["w"] + c]
                mu = (abs(v) - SCALE // 2) // SCALE
                e1_child.append(1 if mu > 1 else 0)
            print(f"{name} {cw}: ALIASED -> "
                  f"({cw}0: uoff1 k=0 e1={e1_child}) + ({cw}1: uoff0)")
            if fix:
                del bank[cw]
                bank[cw + "0"] = {"rho": rho, "u_off": 1,
                                  "kappa": [0] * n, "e1": e1_child}
                bank[cw + "1"] = {"rho": rho, "u_off": 0,
                                  "kappa": [0] * n, "e1": list(e["e1"])}
                fixed += 1
    if fix:
        json.dump(art, open(ART, "w"), indent=1, sort_keys=True)
        print(f"fixed {fixed} aliased nodes -> {ART}")


if __name__ == "__main__":
    audit(fix="--fix" in sys.argv)
