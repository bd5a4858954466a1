"""HTJ2K (ITU-T T.814) HT cleanup-pass codec — pure-Python reference.

Decodes and encodes the HT block-coder cleanup pass for the DICOM HTJ2K
transfer syntaxes (1.2.840.10008.1.2.4.201/.202), which the reference
reads through ITK/GDCM (/root/reference/lungmask/utils.py:215-222).

Every coding rule and table in this module was reconstructed EMPIRICALLY by
black-box probing of OpenJPEG's conformant HT decoder (the only HT
implementation in this image) — see tools/htj2k_probe.py,
tools/htj2k_extract.py and docs/HTJ2K.md for the campaign. The tables are
therefore the published standard's tables (any conformant decoder embodies
them), obtained without copying any implementation.

Mechanism summary (probed, then verified by differential fuzzing vs
OpenJPEG in tests/test_htj2k.py):

  * A code-block's cleanup segment is [MagSgn | MEL -> | <- VLC], with
    Scup = (B[L-1]<<4) | (B[L-2] & 0xF) giving the MEL+VLC suffix length.
  * Quads (2x2, column-major samples) are scanned in line pairs, in
    horizontal pairs of quads. Per pair the VLC stream carries
    cw(q0) cw(q1) then the pair's u-VLC section.
  * A quad with all-zero causal context consults the MEL coder for its
    significance instead of carrying a rho=0 codeword.
  * u-VLC: '1'->1, '01'->2, '001'+1bit->3+b, '000'+5bits(LSB-first)->5+k;
    in the INITIAL line pair, if both quads of a pair have u_off=1 one MEL
    event e is decoded first and u_i = uvlc_i + 2e.
  * U_q = u_q + kappa_q (kappa_q = 1 in the initial line pair; see
    decode() for the non-initial rule). Per significant sample n:
    m_n = U_q - kappa_n bits are read LSB-first from MagSgn as
    v = (mag << 1) | sign, and mu_n = 1 + mag + e1_n * 2^(m_n - 1).
  * Reconstruction (cleanup-only): coeff = +/- (mu * 2^p + 2^(p-1)) with
    p = B - 1 - missing_msbs.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# bit-stream readers (semantics probed: see docs/HTJ2K.md "stream mechanics")
# ---------------------------------------------------------------------------


class MELDecoder:
    """Adaptive run-length coder: 13 states, exponents below.

    Events: 1 = "hit" (e.g. AZC quad significant / u>2). A '1' bit at state
    k codes a run of 2^E[k] zero-events; a '0' bit codes E[k] literal bits
    giving the count of zero-events before a one-event.
    """

    E = [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5]

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 7
        self.state = 0
        self.runs: List[int] = []  # pending zero-events before next 1-event
        self._queue: List[int] = []

    def _read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 1  # pad: behaves as max-run continuation
        b = (self.data[self.pos] >> self.bit) & 1
        # unstuffing: after an 0xFF byte only 7 bits of the next byte count
        limit = 0 if not (self.pos > 0 and self.data[self.pos] == 0x00) else 0
        if self.bit == 0:
            skip7 = self.data[self.pos] == 0xFF
            self.pos += 1
            self.bit = 6 if skip7 else 7
        else:
            self.bit -= 1
        return b

    def event(self) -> int:
        """Next binary event."""
        if not self._queue:
            e = MELDecoder.E[self.state]
            if self._read_bit():
                self._queue.extend([0] * (1 << e))
                self.state = min(self.state + 1, 12)
            else:
                run = 0
                for i in range(e - 1, -1, -1):
                    run |= self._read_bit() << i
                self._queue.extend([0] * run + [1])
                self.state = max(self.state - 1, 0)
        return self._queue.pop(0)


class MELEncoder:
    def __init__(self):
        self.bits: List[int] = []
        self.state = 0
        self.run = 0

    def event(self, e: int):
        if e == 0:
            self.run += 1
            if self.run == (1 << MELDecoder.E[self.state]):
                self.bits.append(1)
                self.run = 0
                self.state = min(self.state + 1, 12)
        else:
            k = MELDecoder.E[self.state]
            self.bits.append(0)
            for i in range(k - 1, -1, -1):
                self.bits.append((self.run >> i) & 1)
            self.run = 0
            self.state = max(self.state - 1, 0)

    def flush(self) -> bytes:
        bits = list(self.bits)
        if self.run:
            # terminate a pending partial run as a full-run bit: decoder
            # over-reads zero-events past the last quad harmlessly
            bits.append(1)
        out = bytearray()
        acc = 0
        n = 0
        limit = 8
        for b in bits:
            acc = (acc << 1) | b
            n += 1
            if n == limit:
                out.append(acc << (8 - limit) if limit < 8 else acc)
                limit = 7 if out[-1] == 0xFF else 8
                acc = 0
                n = 0
        if n:
            pad = limit - n
            out.append(((acc << pad) | ((1 << pad) - 1)))
        return bytes(out)


class VLCReader:
    """Backward bit reader for the VLC segment.

    Physically: bits are served LSB-first from the high nibble of
    B[Scup-2], then LSB-first from each previous byte. Unstuffing: when the
    previously-consumed (higher-address) byte is > 0x8F, the next byte
    contributes only 7 bits (its MSB is a stuffed 0).
    """

    def __init__(self, segment: bytes):
        # segment = the Scup-byte MEL+VLC region; VLC reads from the end
        self.data = segment
        self.ipos = len(segment) - 2  # byte holding the first nibble
        self.acc = (segment[self.ipos] >> 4) if len(segment) >= 2 else 0
        self.nbits = 4
        self.last = segment[-1] if segment else 0

    def _refill(self):
        while self.nbits <= 24 and self.ipos > 0:
            self.ipos -= 1
            byte = self.data[self.ipos]
            prev = self.data[self.ipos + 1]
            take = 7 if prev > 0x8F else 8
            self.acc |= (byte & ((1 << take) - 1)) << self.nbits
            self.nbits += take

    def read(self, n: int) -> int:
        if n > self.nbits:
            self._refill()
        if n > self.nbits:
            # pad with zeros beyond the stream (encoder guarantees no reads)
            self.acc |= 0
            self.nbits = n
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def peek(self, n: int) -> int:
        if n > self.nbits:
            self._refill()
        return self.acc & ((1 << n) - 1)


class VLCWriter:
    def __init__(self):
        self.bits: List[int] = []

    def write(self, value: int, n: int):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_bits(self, bitlist):
        self.bits.extend(bitlist)

    def flush(self) -> bytes:
        """Pack into the backward byte order with >0x8F unstuffing."""
        out: List[int] = []  # bytes from the END toward the start
        bits = list(self.bits)
        idx = 0
        first = True
        prev_byte: Optional[int] = None
        # first nibble lives in the high nibble of B[Scup-2]
        nib = 0
        for i in range(4):
            if idx < len(bits) and bits[idx]:
                nib |= 1 << i
            idx += 1
        out.append(nib << 4)  # low nibble patched by caller with Scup bits
        prev_byte = out[0] | 0x0F  # worst case for the stuffing decision?
        # NOTE: the stuffing rule keys on the actual byte value including
        # the Scup low nibble; the caller re-flushes once Scup is known.
        while idx < len(bits):
            take = 7 if prev_byte > 0x8F else 8
            b = 0
            for i in range(take):
                if idx < len(bits) and bits[idx]:
                    b |= 1 << i
                idx += 1
            out.append(b)
            prev_byte = b
        return bytes(reversed(out))


class MagSgnReader:
    """Forward LSB-first bit reader; after an 0xFF byte the next byte
    contributes 7 bits."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.prev_ff = False

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos < len(self.data):
                byte = self.data[self.pos]
                take = 7 if self.pos > 0 and self.data[self.pos - 1] == 0xFF else 8
                self.acc |= (byte & ((1 << take) - 1)) << self.nbits
                self.nbits += take
                self.pos += 1
            else:
                self.nbits = n  # zero-pad
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


class MagSgnWriter:
    def __init__(self):
        self.bits: List[int] = []

    def write(self, value: int, n: int):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def flush(self) -> bytes:
        out = bytearray()
        idx = 0
        while idx < len(self.bits):
            take = 7 if out and out[-1] == 0xFF else 8
            b = 0
            for i in range(take):
                if idx < len(self.bits) and self.bits[idx]:
                    b |= 1 << i
                idx += 1
            out.append(b)
        if out and out[-1] == 0xFF:
            out.append(0)
        return bytes(out)


# ---------------------------------------------------------------------------
# tables (populated from tools/htj2k_extract.py output; see docs/HTJ2K.md)
# ---------------------------------------------------------------------------

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "htj2k_tables.json")


def load_tables() -> dict:
    with open(_TABLE_PATH) as f:
        return json.load(f)


def uvlc_encode(u: int) -> List[int]:
    if u == 1:
        return [1]
    if u == 2:
        return [0, 1]
    if u in (3, 4):
        return [0, 0, 1, u - 3]
    k = u - 5
    if not 0 <= k < 32:
        raise ValueError(f"u={u} out of range")
    return [0, 0, 0] + [(k >> i) & 1 for i in range(5)]


def uvlc_decode(r: VLCReader) -> int:
    if r.read(1):
        return 1
    if r.read(1):
        return 2
    if r.read(1):
        return 3 + r.read(1)
    return 5 + r.read(5)
