#!/usr/bin/env python
"""Re-extract every HT cleanup codeword bank with CONFORMANT bit packing.

The original campaigns packed VLC bits flat (tools/htj2k_map.seg
conformant=False), which silently embedded stuffed bits inside logical
bit offsets whenever an extraction pattern crossed a stuffing trigger
(the 111-nibble rule or the no-0xFF-then->0x8F byte rule). That produced
phantom 8-bit codewords in three banks (initial:ctx0 via the nibble,
initial:after_rho12 / row1:above_rho12 via an 0xFF preamble byte).

With seg() now routing bits through the codec's VLCWriter, the physical
stream is standard-conformant and the decoder consumes exactly the
logical bits — extraction cannot alias stuffing into table structure.

Writes /tmp/ht_map/tables3.json and, with --install, rebuilds
lungmask_tpu/io/htj2k_tables.json (bank contents only; the context maps
are kept — their keying was probed independently).

Usage: python tools/htj2k_reextract.py [--install] [bank ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import tools.htj2k_extract as X  # noqa: E402
from tools.htj2k_extract import Target, extract  # noqa: E402
from tools.htj2k_map import Prober  # noqa: E402

OUT = "/tmp/ht_map/tables3.json"
ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "lungmask_tpu", "io", "htj2k_tables.json")

# the rho13 u_off=1 preamble codeword: true 7-bit form (the 8-bit one in
# the original constant embedded the nibble stuff bit)
X.CTX0_UOFF1[13] = ("1110000", [1, 1, 1], [0, 0, 1])


def row_ctx_cfgs():
    from tools.htj2k_ctx import build_cfg
    return {
        "row1/ctx4": build_cfg(0, 0, 8),
        "row1/ctx5": build_cfg(0, 2, 8),
        "row1/ctx6": build_cfg(0, 8, 8),
        "row1/ctx7": build_cfg(0, 10, 8),
    }


def all_cfgs():
    cfgs = {"initial/ctx0": X.cfg_ctx0(), "row1/ctx0": X.cfg_row1_ctx0()}
    for rho in (1, 4, 5, 8, 10, 12, 13):
        cfgs[f"initial/after_rho{rho}"] = X.cfg_init_after(rho)
    for rho in (2, 12, 10):
        cfgs[f"row1/above_rho{rho}"] = X.cfg_row1_below(rho)
    cfgs.update(row_ctx_cfgs())
    return cfgs


BANK_NAME = {
    "initial/ctx0": "initial:ctx0",
    "initial/after_rho1": "initial:after_rho1",
    "initial/after_rho4": "initial:after_rho4",
    "initial/after_rho5": "initial:after_rho5",
    "initial/after_rho8": "initial:after_rho8",
    "initial/after_rho10": "initial:after_rho10",
    "initial/after_rho12": "initial:after_rho12",
    "initial/after_rho13": "initial:after_rho13",
    "row1/ctx0": "row1:above_rho1",
    "row1/above_rho2": "row1:above_rho2",
    "row1/above_rho12": "row1:above_rho12",
    "row1/above_rho10": "row1:above_rho10",
    "row1/ctx4": "row1:ctx4",
    "row1/ctx5": "row1:ctx5",
    "row1/ctx6": "row1:ctx6",
    "row1/ctx7": "row1:ctx7",
}


def collapse_siblings(tbl, name=""):
    """Merge sibling codewords with identical attribution into their
    parent. The trie walker never emits codewords shorter than 2 bits
    (and an under-probed region may split deeper), so a true 1-bit
    codeword like the ubiquitous rho-0 '0' extracts as the identical
    pair '00'/'01'. A real prefix code never wastes two siblings on the
    same payload, so the merge is safe; iterate to a fixpoint."""
    tbl = dict(tbl)
    changed = True
    while changed:
        changed = False
        for cw in sorted(tbl, key=len, reverse=True):
            if cw not in tbl or len(cw) < 2:
                continue
            sib = cw[:-1] + ("1" if cw.endswith("0") else "0")
            if sib in tbl and tbl[sib] == tbl[cw]:
                parent = cw[:-1]
                e = tbl[cw]
                del tbl[cw]
                del tbl[sib]
                tbl[parent] = e
                changed = True
                print(f"  {name}: collapsed {parent}0/{parent}1 -> "
                      f"{parent} ({e['rho']})")
    return tbl


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    install = "--install" in sys.argv
    p = Prober()
    cfgs = all_cfgs()
    todo = args or sorted(cfgs)
    tables = json.load(open(OUT)) if os.path.exists(OUT) else {}
    for key in todo:
        tbl = extract(Target(p, cfgs[key]), key)
        good = {k: v for k, v in tbl.items() if "rho" in v}
        kraft = sum(2.0 ** -len(k) for k in good)
        deep = [k for k in good if len(k) > 7]
        print(f"  {key}: {len(good)} cws kraft={kraft:.6f} deep={deep}",
              flush=True)
        tables[key] = tbl
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        json.dump(tables, open(OUT, "w"), indent=1, sort_keys=True)
    if install:
        art = json.load(open(ART))
        for key, name in BANK_NAME.items():
            if key not in tables:
                print(f"  MISSING {key}; artifact not fully rebuilt")
                continue
            good = {k: {f: v[f] for f in ("rho", "u_off", "kappa", "e1")}
                    for k, v in tables[key].items() if "rho" in v}
            good = collapse_siblings(good, name)
            old = art["banks"].get(name, {})
            changed = sum(1 for k, v in good.items()
                          if k not in old or any(
                              old[k].get(f) != v[f]
                              for f in ("rho", "u_off", "kappa", "e1")))
            gone = len([k for k in old if k not in good])
            art["banks"][name] = good
            print(f"  install {name}: {len(good)} cws "
                  f"({changed} new/changed, {gone} removed)")
        json.dump(art, open(ART, "w"), indent=1, sort_keys=True)
        print(f"wrote {ART}")


if __name__ == "__main__":
    main()
