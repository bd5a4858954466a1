#!/usr/bin/env python
"""Non-initial context-model campaign (r5 continuation).

Determines, by black-box probing of OpenJPEG's HT decoder, which causal
neighbors enter the NON-INITIAL quad significance context, and extracts
codeword banks for the novel classes. Bootstrapped in stages so every
preamble only relies on already-validated coding:

  stage A  target (1,0) of a 4x4: preamble is the INITIAL row only
           (validated banks). Controls N0=(1,0)<-A0.n1, N1=(1,1)<-A0.n3,
           NE=(1,2)<-A1.n1. No W/NW exist at qx=0.
  stage B  target (1,1): adds W (left quad B0's right column) and
           NW=(1,1)<-A0.n3, using the stage-A-extended encoder model for
           B0's preamble codeword.

Usage: python tools/htj2k_ctx.py A|B|extract:<case>
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
    build_wide_cfg,
    extract,
)
from tools.htj2k_map import Prober  # noqa: E402

ART = "/tmp/ht_map/htj2k_tables.json"
OUT = "/tmp/ht_map/ctx_campaign.json"


def fp_of(p, cfg):
    t = Target(p, cfg)
    out = []
    for pat in FPPATS:
        st, r = t.read([int(c) for c in pat] + [1] * 10)
        out.append(r[0] if st == "OK" else str(r)[:16])
    return tuple(out)


def stage_a(p, known):
    """Target (1,0) on 4x4: (N0, N1, NE) sweep with initial-row preambles."""
    cases = {}
    for a0, n01 in [(0, (0, 0)), (2, (1, 0)), (8, (0, 1)), (10, (1, 1))]:
        for a1, ne in [(0, 0), (2, 1)]:
            if (a0, a1) == (0, 0):
                continue  # pure AZC: known (row1 azc bank)
            lay = {}
            if a0:
                lay[(0, 0)] = a0
            if a1:
                lay[(0, 1)] = a1
            cases[f"N0={n01[0]} N1={n01[1]} NE={ne}"] = (lay, (1, 0))
    return run_cases(p, known, cases)


def run_cases(p, known, cases):
    results = {}
    for label, (lay, target) in cases.items():
        try:
            cfg = build_wide_cfg(lay, target, tables_path=ART)
        except Exception as e:
            print(f"{label}: BUILD FAIL {e}", flush=True)
            results[label] = ("BUILDFAIL", str(e))
            continue
        fp = fp_of(p, cfg)
        matches = [n for n, k in known.items() if k == fp]
        print(f"{label}: fp={fp} -> {matches or 'NOVEL'}", flush=True)
        results[label] = (fp, matches, lay, target)
    return results


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "A"
    p = Prober()
    art = json.load(open(ART))
    known = {name: bank_rho_tuple(tbl) for name, tbl in art["banks"].items()}
    if what == "A":
        res = stage_a(p, known)
        json.dump({k: [list(v[0]) if isinstance(v[0], tuple) else v[0],
                       v[1] if len(v) > 1 else None]
                   for k, v in res.items()},
                  open(OUT, "w"), indent=1)
    elif what.startswith("extract:"):
        # extract:<qy,qx=rho+qy,qx=rho...>:<ty>,<tx>:<name>
        _, lays, tgt, name = what.split(":", 3)
        lay = {}
        for part in lays.split("+"):
            if not part:
                continue
            pos, rho = part.split("=")
            qy, qx = map(int, pos.split(","))
            lay[(qy, qx)] = int(rho)
        ty, tx = map(int, tgt.split(","))
        cfg = build_wide_cfg(lay, (ty, tx), tables_path=ART)
        tbl = extract(Target(p, cfg), name)
        tables = json.load(open(OUT)) if os.path.exists(OUT) else {}
        tables[name] = tbl
        json.dump(tables, open(OUT, "w"), indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
