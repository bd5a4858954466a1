"""HT cleanup-pass codec: self-consistency + OpenJPEG differential pins.

Status (r5 final): the cleanup codec is bit-exact against OpenJPEG on
every fuzzed geometry — arbitrary block sizes, all context classes, the
full kappa/E chain (whose exponent window spans NW/N0/N1/NE, probed),
both initial u-pair joint forms, and the nibble/byte stuffing rules
(docs/HTJ2K.md). These tests pin:

  * bit-stream primitives round-trip exactly (MEL, u-VLC incl. the
    joint initial-pair form, MagSgn with 0xFF stuffing),
  * encoder->decoder self-consistency on randomized blocks (exact),
  * encoder->OpenJPEG bit-exact round-trips on pinned seeds (skipped
    when the system libopenjp2 is absent).
"""

import json
import os

import numpy as np
import pytest

from lungmask_tpu.io.htj2k import (
    CleanupDecoder,
    CleanupEncoder,
    HTTables,
    MELDecoder,
    MELEncoder,
    MagSgnReader,
    MagSgnWriter,
    VLCReader,
    VLCWriter,
    uvlc_decode,
    uvlc_decode_joint,
    uvlc_encode,
    uvlc_encode_joint,
)

TABLES = os.path.join(os.path.dirname(__file__), "..", "lungmask_tpu", "io",
                      "htj2k_tables.json")


@pytest.fixture(scope="module")
def tables():
    with open(TABLES) as f:
        return HTTables(json.load(f))


def test_mel_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        events = rng.integers(0, 2, rng.integers(1, 200)).tolist()
        enc = MELEncoder()
        for e in events:
            enc.event(e)
        data = enc.flush()
        dec = MELDecoder(data)
        got = [dec.event() for _ in events]
        assert got == events


def test_uvlc_roundtrip():
    for u in range(1, 37):
        w = VLCWriter()
        w.write_bits(uvlc_encode(u))
        r = VLCReader(w.flush() + b"\x00\x00")
        # reconstruct the segment layout the reader expects
        seg = _as_segment(w)
        assert uvlc_decode(VLCReader(seg)) == u


def _as_segment(w: VLCWriter) -> bytes:
    vb = w.flush()
    scup = len(vb) + 1
    first_nib = vb[-1] >> 4
    return vb[:-1] + bytes([(first_nib << 4) | (scup & 0xF), scup >> 4])


def test_uvlc_joint_roundtrip():
    for u0 in range(1, 12):
        for u1 in range(1, 12):
            if u0 > 2 and u1 > 2:
                continue  # that pair uses the MEL +2 path, not the joint code
            w = VLCWriter()
            w.write_bits(uvlc_encode_joint(u0, u1))
            r = VLCReader(_as_segment(w))
            assert uvlc_decode_joint(r) == (u0, u1), (u0, u1)


def test_magsgn_stuffing_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(50):
        fields = [(int(v), int(n)) for v, n in zip(
            rng.integers(0, 1 << 16, 30), rng.integers(0, 17, 30))]
        fields = [(v & ((1 << n) - 1), n) for v, n in fields]
        w = MagSgnWriter()
        for v, n in fields:
            w.write(v, n)
        r = MagSgnReader(w.flush())
        for v, n in fields:
            assert r.read(n) == v


def _random_block(rng, w, h):
    mu = np.zeros((h, w), np.int64)
    sg = np.zeros((h, w), np.uint8)
    mask = rng.random((h, w)) < rng.random() * 0.9 + 0.05
    mu[mask] = rng.integers(1, 40, int(mask.sum()))
    sg[mask] = rng.integers(0, 2, int(mask.sum()))
    return mu, sg


SIZES = ((2, 2), (4, 2), (8, 2), (16, 2), (2, 4), (2, 8), (4, 4),
         (8, 8), (16, 8))


def test_self_consistency(tables):
    rng = np.random.default_rng(7)
    bad = 0
    for it in range(120):
        w, h = SIZES[it % len(SIZES)]
        mu, sg = _random_block(rng, w, h)
        seg = CleanupEncoder(tables, w, h).encode(mu, sg)
        mu2, sg2 = CleanupDecoder(tables, w, h).decode(seg)
        ok = np.array_equal(mu2, mu) and np.array_equal(
            sg2 & (mu > 0).astype(np.uint8), sg)
        bad += not ok
    assert bad == 0, f"{bad}/120 self-decode mismatches"


@pytest.mark.slow
def test_openjpeg_differential():
    oracle_lib = "/usr/lib/x86_64-linux-gnu/libopenjp2.so.2.5.0"
    if not os.path.exists(oracle_lib):
        pytest.skip("system libopenjp2 not present")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.htj2k_fuzz import run

    fails = run(n_iters=60, sizes=SIZES, seed=11)
    assert fails == 0, f"{fails}/60 differential failures (regression)"
