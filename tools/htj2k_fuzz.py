#!/usr/bin/env python
"""Differential fuzz of the HT cleanup codec against OpenJPEG.

For random (mu, sign) blocks:
  1. encode with lungmask_tpu.io.htj2k.CleanupEncoder,
  2. wrap in a codestream (tools/htj2k_probe.build_stream),
  3. decode with OpenJPEG -> must equal the expected dequantized values,
  4. decode with our CleanupDecoder -> must equal (mu, sign) exactly.

Any mismatch prints a minimized repro. This loop is the arbiter for every
probed rule in docs/HTJ2K.md.

Usage: python tools/htj2k_fuzz.py [n_iters] [--wide]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from lungmask_tpu.io.htj2k import (  # noqa: E402
    CleanupDecoder,
    CleanupEncoder,
    HTTables,
)
from tools.htj2k_probe import Oracle, build_stream  # noqa: E402

PREC = 14
GB = 2
B = PREC + GB - 1
MM = 8
SCALE = 1 << (PREC - MM)  # == 2^(B-1-MM) with our QCD exponent choice


def expected_plane(mu, sg):
    v = mu * SCALE + (SCALE // 2) * (mu != 0)
    return np.where(sg == 1, -v, v).astype(np.int64)


def random_block(rng, w, h, p_sig=0.4, max_exp=5):
    mu = np.zeros((h, w), np.int64)
    sg = np.zeros((h, w), np.uint8)
    mask = rng.random((h, w)) < p_sig
    exps = rng.integers(1, max_exp + 1, (h, w))
    vals = np.minimum((1 << exps) - rng.integers(0, 1 << (max_exp - 1),
                                                 (h, w)) % (1 << exps),
                      (1 << exps))
    vals = np.maximum(vals, 1)
    mu[mask] = vals[mask]
    sg[mask] = rng.integers(0, 2, (h, w))[mask]
    sg[mu == 0] = 0
    return mu, sg


def run(n_iters=200, sizes=((2, 2), (4, 2), (2, 4), (4, 4), (8, 4), (8, 8)),
        seed=0):
    import lungmask_tpu.io.htj2k as _h
    with open(_h._TABLE_PATH) as f:
        T = HTTables(json.load(f))
    oracle = Oracle()
    rng = np.random.default_rng(seed)
    fails = 0
    for it in range(n_iters):
        w, h = sizes[it % len(sizes)]
        mu, sg = random_block(rng, w, h,
                              p_sig=float(rng.random()) * 0.9 + 0.05,
                              max_exp=int(rng.integers(1, 7)))
        enc = CleanupEncoder(T, w, h)
        try:
            seg = enc.encode(mu, sg)
        except Exception as e:
            print(f"[{it}] {w}x{h} ENCODE FAIL: {e}")
            fails += 1
            continue
        ce = (max(2, (w - 1).bit_length()), max(2, (h - 1).bit_length()))
        stream = build_stream(w, h, prec=PREC, sgnd=True, cblk_exp=ce,
                              missing_msbs=MM, guard_bits=GB, passes=[seg])
        comps, msgs = oracle.decode(stream)
        exp = expected_plane(mu, sg)
        if comps is None:
            print(f"[{it}] {w}x{h} OPJ REJECT:",
                  [m for l, m in msgs if l == "error"][:1])
            print("   mu=", mu.tolist(), "sg=", sg.tolist())
            print("   seg=", seg.hex())
            fails += 1
            continue
        got = comps[0][0].astype(np.int64)
        if not np.array_equal(got, exp):
            print(f"[{it}] {w}x{h} OPJ MISMATCH")
            print("   mu =", mu.tolist())
            print("   sg =", sg.tolist())
            print("   exp=", exp.tolist())
            print("   got=", got.tolist())
            print("   seg=", seg.hex())
            fails += 1
            continue
        dec = CleanupDecoder(T, w, h)
        try:
            mu2, sg2 = dec.decode(seg)
        except Exception as e:
            print(f"[{it}] {w}x{h} SELF-DECODE FAIL: {e}")
            fails += 1
            continue
        if not (np.array_equal(mu2, mu) and np.array_equal(
                (sg2 & (mu > 0)).astype(np.uint8), sg)):
            print(f"[{it}] {w}x{h} SELF-DECODE MISMATCH")
            print("   mu =", mu.tolist(), "->", mu2.tolist())
            fails += 1
    print(f"{n_iters} iters, {fails} failures")
    return fails


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sys.exit(1 if run(n) else 0)
