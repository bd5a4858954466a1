#!/usr/bin/env python
"""Assemble the HT codec table artifact from the extraction campaign.

Reads /tmp/ht_map/tables2.json (tools/htj2k_extract.py), merges configs
that agree on every common codeword (coverage differs per config because
u-overflow regions censor deep slots), and emits
/tmp/ht_map/htj2k_tables.json in the schema lungmask_tpu.io.htj2k.HTTables
loads:

    banks:       bank-name -> {cw: {rho, u_off, kappa, e1}}
    ctx_initial: {"<left rho 0..15>": bank, "azc": bank-for-MEL-sig-quads}
    ctx_row:     {"<n1><n3>": bank, "azc": ...}

Context keying is deliberately EMPIRICAL (per neighbor significance
pattern) rather than a fitted formula — the fuzz loop at wider geometries
is what validates or extends it.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict

SRC = "/tmp/ht_map/tables2.json"
DST = "/tmp/ht_map/htj2k_tables.json"


def good_entries(tbl):
    return {k: v for k, v in tbl.items() if "rho" in v}


def agree(a, b):
    common = set(a) & set(b)
    return all(str(a[c]) == str(b[c]) for c in common)


def main():
    T = {k: good_entries(t) for k, t in json.load(open(SRC)).items()}
    keys = sorted(T)
    parent = {k: k for k in keys}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            if a.split("/")[0] != b.split("/")[0]:
                continue
            if len(set(T[a]) & set(T[b])) >= 12 and agree(T[a], T[b]):
                parent[find(a)] = find(b)

    clusters = defaultdict(list)
    for k in keys:
        clusters[find(k)].append(k)

    banks = {}
    member_bank = {}
    for root, members in sorted(clusters.items(), key=lambda kv: sorted(kv[1])):
        name = sorted(members)[0].replace("/", ":")
        merged = {}
        for m in members:
            for cw, e in T[m].items():
                if cw in merged and str(merged[cw]) != str(e):
                    print(f"WARN {name}: conflict at {cw}", file=sys.stderr)
                merged[cw] = e
        # resolve prefix conflicts from depth differences between member
        # extractions: a shorter codeword that is a strict prefix of other
        # entries is the under-split view — the deeper entries carry the
        # EMB distinction its config could not observe
        drop = set()
        keys2 = sorted(merged, key=len)
        for i, a in enumerate(keys2):
            for b in keys2[i + 1:]:
                if b.startswith(a):
                    drop.add(a)
                    break
        for a in drop:
            print(f"WARN {name}: dropping under-split prefix {a} "
                  f"({merged[a]})", file=sys.stderr)
            del merged[a]
        banks[name] = merged
        for m in members:
            member_bank[m] = name
        print(f"bank {name}: {len(merged)} cws from {sorted(members)}")

    ctx_initial = {"0": "azc", "azc": member_bank["initial/ctx0"]}
    for rho in range(1, 16):
        k = f"initial/after_rho{rho}"
        if k in member_bank:
            ctx_initial[str(rho)] = member_bank[k]
    # (n1,n3) == (0,0) is always MEL-gated (no rho=0 codewords exist in
    # any 00-context table) — route it through the "azc" marker like the
    # initial map does
    ctx_row = {"azc": member_bank["row1/ctx0"], "00": "azc"}
    for rho in range(1, 16):
        k = f"row1/above_rho{rho}"
        if k not in member_bank:
            continue
        n1, n3 = (rho >> 1) & 1, (rho >> 3) & 1
        if (n1, n3) == (0, 0):
            if member_bank[k] != member_bank["row1/ctx0"]:
                print(f"WARN 00-class mismatch from {k}", file=sys.stderr)
            continue
        key = f"{n1}{n3}"
        prev = ctx_row.get(key)
        if prev and prev != member_bank[k]:
            print(f"WARN ctx_row[{key}]: {prev} vs {member_bank[k]} "
                  f"(from {k})", file=sys.stderr)
        ctx_row[key] = member_bank[k]

    out = {"banks": banks, "ctx_initial": ctx_initial, "ctx_row": ctx_row}
    json.dump(out, open(DST, "w"), indent=1, sort_keys=True)
    print(f"wrote {DST}: {len(banks)} banks")


if __name__ == "__main__":
    main()
