#!/usr/bin/env python
"""Direct probe of the non-initial U_q rule: U_q(E_above, u~, gamma).

Geometry 2x4: A=(0,0) initial quad rho=10 (its n1,n3 are the two samples
above the target), B=(1,0) the target (ctx3 = row1:above_rho10 bank).
A's u and MagSgn bits set the above samples' magnitudes exactly, hence
E_above; the target's codeword is a known (kappa,e1) entry and its
planted u-VLC bits are swept. Per-sample MagSgn bit-counts then measure
U_B directly:  m_n = U_B - kappa_n.

Probed codewords (from the validated ctx3 bank):
  gamma=1: "101101" rho=10 u_off=1 kappa=[0,0] e1=[0,0]  -> m_n = U_B
  gamma=0: "1111110" rho=2 u_off=1 kappa=[1]  e1=[1]     -> m   = U_B - 1

Usage: python tools/htj2k_kappa_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tools.htj2k_extract import Target, uvlc  # noqa: E402
from tools.htj2k_map import Prober, seg  # noqa: E402
from lungmask_tpu.io.htj2k import MELEncoder  # noqa: E402

# A-quad configs: (cw bits, u bits, magsgn bits, mu_n1, mu_n3, E)
#   "10000"  rho=10 uoff=0: U=1, m=1 each, mu=1          -> E=1
#   "101011" rho=10 uoff=1 kappa=[0,1] e1=[0,1]:
#     u=1: U=2: n1 m=2 mu=1+mag; n3 m=1 mu=2             -> E=2 (mag1=1)
#     u=2: U=3: n1 m=3 mu<=4 (mag=3 -> mu=4); n3 m=2 mu=3+mag -> E=3
#     u=3: U=4: n1 m=4 mu<=8 (mag=7 -> mu=8); n3 m=3 mu=5+mag=8 -> E=4
A_CFGS = {
    1: ("10000", [], [0, 0], (1, 1)),
    2: ("101011", uvlc(1), [0, 1, 0], (2, 2)),          # n1 v=(1<<1)=2, n3 v=0
    3: ("101011", uvlc(2), [1, 1, 0, 1, 0], (4, 3)),    # n1 v=6? see below
    4: ("101011", uvlc(3), [0, 1, 1, 0, 1, 1, 0], (8, 8)),
}
# MagSgn layouts (LSB-first per sample, n1 then n3):
#  E=2: n1 m=2 v=2 -> bits [0,1]; n3 m=1 v=0 -> [0]
#  E=3: n1 m=3 mag=3 v=6 -> bits [0,1,1]; n3 m=2 mag=1 v=2 -> [0,1]
#       (mu_n1 = 1+3 = 4, mu_n3 = 1+1+2 = 4)  E = bitlen(2mu-1) = 3
#  E=4: n1 m=4 mag=7 v=14 -> [0,1,1,1]; n3 m=3 mag=3 v=6 -> [0,1,1]
#       (mu_n1 = 8, mu_n3 = 1+3+4 = 8)
A_MS = {
    1: [],
    2: [0, 1, 0],
    3: [0, 1, 1, 0, 1],
    4: [0, 1, 1, 1, 0, 1, 1],
}
A_MU = {1: (1, 1), 2: (2, 2), 3: (4, 4), 4: (8, 8)}

SCALE = 64  # PREC=14, MM=8


def val(mu):
    return mu * SCALE + SCALE // 2


def probe(p, E, cw, tail_u, nsig):
    acw, au, _, _ = A_CFGS[E]
    pre = [int(c) for c in acw] + au
    ms_bits = A_MS[E]
    melw = MELEncoder()
    melw.event(1)  # A is AZC-significant
    mel = list(melw.flush()) or [0x00]
    mu1, mu3 = A_MU[E]
    cfg = dict(
        w=2, h=4, mel=mel, pre=pre,
        samples=[(2, 0), (3, 0), (2, 1), (3, 1)],
        pre_magsgn_bits=len(ms_bits),
        pre_expect={(1, 0): val(mu1), (1, 1): val(mu3)},
    )
    t = Target(p, cfg)

    # pack preamble MagSgn bits into the leading bytes the Target sends
    def decode(bits, extra_ms):
        all_bits = ms_bits + extra_ms
        ms = bytearray(24)
        for i, b in enumerate(all_bits):
            if b:
                ms[i // 8] |= 1 << (i % 8)
        return t.decode(bits, bytes(ms))

    bits = [int(c) for c in cw] + tail_u + [1] * 8
    base, errs = decode(bits, [])
    if base is None:
        return ("ERR", errs[0][:50] if errs else "?")
    # preamble check
    if base[2] != val(mu1) or base[3] != val(mu3):
        return ("PREBAD", base)
    rho = 0
    for k, (r, c) in enumerate(cfg["samples"]):
        if base[r * 2 + c]:
            rho |= 1 << k
    # count magsgn bits per target sample
    counts = [0, 0, 0, 0]
    lo = len(ms_bits)
    for bit in range(30):
        ms1 = [0] * (bit) + [1]
        arr, _ = decode(bits, ms1)
        if arr is None:
            continue
        for k, (r, c) in enumerate(cfg["samples"]):
            if arr[r * 2 + c] != base[r * 2 + c]:
                counts[k] += 1
    return ("OK", rho, counts)


def main():
    p = Prober()
    print("gamma=1 target: cw=101101 rho=10 kappa=[0,0] (m == U_B)")
    for E in (1, 2, 3, 4):
        for u in (1, 2, 3, 4, 6):
            r = probe(p, E, "101101", uvlc(u), 2)
            print(f"  E={E} u~={u}: {r}", flush=True)
    print("gamma=0 target: cw=1111110 rho=2 kappa=[1] (m == U_B - 1)")
    for E in (1, 2, 3, 4):
        for u in (1, 2, 3):
            r = probe(p, E, "1111110", uvlc(u), 1)
            print(f"  E={E} u~={u}: {r}", flush=True)


if __name__ == "__main__":
    main()


def probe_row2(p, bcw, bu, b_ms, b_expect, ccw, cu, label):
    """2x6: A initial rho10 mu=1; B row1 (ctx3) with controlled (m, e1,
    mag); C row2 target (ctx from B) — measure U_C."""
    pre = [1, 0, 0, 0, 0] + [int(c) for c in bcw] + bu
    melw = MELEncoder()
    melw.event(1)
    mel = list(melw.flush()) or [0x00]
    ms_bits = [0, 0] + b_ms  # A: m=1 per sample, v=0
    cfg = dict(
        w=2, h=6, mel=mel, pre=pre,
        samples=[(4, 0), (5, 0), (4, 1), (5, 1)],
        pre_magsgn_bits=len(ms_bits),
        pre_expect={(1, 0): val(1), (1, 1): val(1), **b_expect},
    )
    t = Target(p, cfg)

    def decode(bits, extra_ms):
        all_bits = ms_bits + extra_ms
        ms = bytearray(24)
        for i, b in enumerate(all_bits):
            if b:
                ms[i // 8] |= 1 << (i % 8)
        return t.decode(bits, bytes(ms))

    bits = [int(c) for c in ccw] + cu + [1] * 8
    base, errs = decode(bits, [])
    if base is None:
        print(f"  {label}: ERR {errs[0][:60] if errs else '?'}")
        return
    for (r, c), v in cfg["pre_expect"].items():
        if base[r * 2 + c] != v:
            print(f"  {label}: PREBAD ({r},{c})={base[r*2+c]} want {v}")
            return
    counts = [0, 0, 0, 0]
    for bit in range(30):
        arr, _ = decode(bits, [0] * bit + [1])
        if arr is None:
            continue
        for k, (r, c) in enumerate(cfg["samples"]):
            if arr[r * 2 + c] != base[r * 2 + c]:
                counts[k] += 1
    rho = 0
    for k, (r, c) in enumerate(cfg["samples"]):
        if base[r * 2 + c]:
            rho |= 1 << k
    print(f"  {label}: rho={rho} m={counts}")


def main2():
    p = Prober()
    # variant 1: B rho=10 cw=101101 (kappa 0, e1 0) at u~=3 -> m=4 per
    # sample; MagSgn v=0 -> mu=1. E(bitlen)=1 vs E(m or m+e1)=4.
    # C target cw=101101 u~=1: U_C = m_C.
    probe_row2(
        p, "101101", uvlc(3), [0] * 8,
        {(3, 0): val(1), (3, 1): val(1)},
        "101101", uvlc(1),
        "B(m=4,mu=1,e1=0)  C expects U=2 if E=bitlen | 4 if E=m/m+e1")
    # variant 2: B rho=2 cw=1111110 (kappa=[1], e1=[1]) at u~=2 ->
    # m=2, mag=0 -> mu=3. E(bitlen)=3, E(m)=2, E(m+e1)=3.
    probe_row2(
        p, "1111110", uvlc(2), [0, 0],
        {(3, 0): val(3)},
        "101101", uvlc(1),
        "B(m=2,e1=1,mu=3)  C expects U=3 if E=bitlen/m+e1 | 2 if E=m")


if __name__ == "__main__" and os.environ.get("STAGE") == "2":
    main2()
