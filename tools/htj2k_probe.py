#!/usr/bin/env python
"""HTJ2K (ITU-T T.814) black-box probe harness against OpenJPEG's HT decoder.

Purpose: bootstrap a *verified* HT (FBCOT) encoder/decoder for the DICOM
HTJ2K transfer syntaxes (1.2.840.10008.1.2.4.201/.202) without spec text or
network access. The only conformant HT implementation in this image is
libopenjp2 >= 2.4 (ht_dec.c, decode-only). This tool:

  1. binds libopenjp2 via ctypes with info/warning/error message capture
     (the HT decoder's validation messages are granular enough to steer
     stream construction),
  2. builds J2K codestreams byte-by-byte from scratch (markers + tier-2
     packet headers) with every HT-relevant knob exposed,
  3. decodes crafted cleanup-pass segments through the oracle and records
     (stream bytes -> decoded samples) observations, from which the HT
     cleanup-pass coding tables (CxtVLC, u-VLC, MEL, MagSgn conventions)
     are reconstructed empirically.

The reconstructed tables ARE the published standard's tables (any
conformant decoder embodies them); reconstruction by probing keeps this
build's implementation original while making bit-exactness testable.

Usage:
    python tools/htj2k_probe.py sanity     # classic + empty-HT stream checks
"""

from __future__ import annotations

import ctypes as C
import glob
import os
import struct
import sys
import tempfile

import numpy as np

# ---------------------------------------------------------------------------
# ctypes oracle
# ---------------------------------------------------------------------------

_CANDIDATES = [
    "/usr/lib/x86_64-linux-gnu/libopenjp2.so.2.5.0",
]
_CANDIDATES += sorted(
    glob.glob(os.path.join(os.path.dirname(np.__file__), "..", "..")
              and "/opt/venv/lib/python3.12/site-packages/pillow.libs/libopenjp2*"),
    reverse=True,
)

_MSG_CB = C.CFUNCTYPE(None, C.c_char_p, C.c_void_p)


class _OpjImageComp(C.Structure):
    _fields_ = [
        ("dx", C.c_uint32), ("dy", C.c_uint32),
        ("w", C.c_uint32), ("h", C.c_uint32),
        ("x0", C.c_uint32), ("y0", C.c_uint32),
        ("prec", C.c_uint32), ("bpp", C.c_uint32),
        ("sgnd", C.c_uint32), ("resno_decoded", C.c_uint32),
        ("factor", C.c_uint32),
        ("data", C.POINTER(C.c_int32)),
        ("alpha", C.c_uint16),
    ]


class _OpjImage(C.Structure):
    _fields_ = [
        ("x0", C.c_uint32), ("y0", C.c_uint32),
        ("x1", C.c_uint32), ("y1", C.c_uint32),
        ("numcomps", C.c_uint32), ("color_space", C.c_int),
        ("comps", C.POINTER(_OpjImageComp)),
        ("icc_profile_buf", C.c_void_p), ("icc_profile_len", C.c_uint32),
    ]


class Oracle:
    """Decode raw J2K codestream bytes with libopenjp2, capturing messages."""

    def __init__(self, path=None):
        if path is None:
            for p in _CANDIDATES:
                if os.path.exists(p):
                    path = p
                    break
        self.lib = C.CDLL(path)
        self.path = path
        lib = self.lib
        lib.opj_version.restype = C.c_char_p
        lib.opj_create_decompress.restype = C.c_void_p
        lib.opj_create_decompress.argtypes = [C.c_int]
        lib.opj_stream_create_default_file_stream.restype = C.c_void_p
        lib.opj_stream_create_default_file_stream.argtypes = [C.c_char_p, C.c_int]
        lib.opj_setup_decoder.argtypes = [C.c_void_p, C.c_void_p]
        lib.opj_read_header.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p]
        lib.opj_decode.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p]
        lib.opj_end_decompress.argtypes = [C.c_void_p, C.c_void_p]
        lib.opj_stream_destroy.argtypes = [C.c_void_p]
        lib.opj_destroy_codec.argtypes = [C.c_void_p]
        lib.opj_image_destroy.argtypes = [C.c_void_p]
        lib.opj_set_default_decoder_parameters.argtypes = [C.c_void_p]
        for name in ("opj_set_info_handler", "opj_set_warning_handler",
                     "opj_set_error_handler"):
            getattr(lib, name).argtypes = [C.c_void_p, _MSG_CB, C.c_void_p]
            getattr(lib, name).restype = C.c_int

    def version(self):
        return self.lib.opj_version().decode()

    def decode(self, data: bytes):
        """Returns (array|None, messages: list[(level, text)])."""
        msgs = []

        def make(level):
            def cb(msg, _):
                msgs.append((level, msg.decode(errors="replace").strip()))
            return _MSG_CB(cb)

        cbs = [make("info"), make("warn"), make("error")]  # keep refs alive
        lib = self.lib
        with tempfile.NamedTemporaryFile(suffix=".j2k", delete=False) as f:
            f.write(data)
            fname = f.name
        codec = stream = img_p = None
        try:
            codec = lib.opj_create_decompress(0)  # OPJ_CODEC_J2K
            lib.opj_set_info_handler(codec, cbs[0], None)
            lib.opj_set_warning_handler(codec, cbs[1], None)
            lib.opj_set_error_handler(codec, cbs[2], None)
            params = C.create_string_buffer(16384)
            lib.opj_set_default_decoder_parameters(params)
            if not lib.opj_setup_decoder(codec, params):
                return None, msgs + [("error", "<setup_decoder failed>")]
            stream = lib.opj_stream_create_default_file_stream(
                fname.encode(), 1)
            img_pp = C.c_void_p()
            if not lib.opj_read_header(stream, codec, C.byref(img_pp)):
                return None, msgs + [("error", "<read_header failed>")]
            img_p = img_pp
            if not lib.opj_decode(codec, stream, img_p):
                return None, msgs + [("error", "<decode failed>")]
            lib.opj_end_decompress(codec, stream)
            img = C.cast(img_p, C.POINTER(_OpjImage)).contents
            comps = []
            for i in range(img.numcomps):
                c = img.comps[i]
                n = c.w * c.h
                arr = np.ctypeslib.as_array(c.data, shape=(n,)).reshape(
                    c.h, c.w).copy()
                comps.append((arr, dict(prec=c.prec, sgnd=c.sgnd)))
            return comps, msgs
        finally:
            if stream:
                lib.opj_stream_destroy(stream)
            if codec:
                lib.opj_destroy_codec(codec)
            if img_p:
                lib.opj_image_destroy(img_p)
            os.unlink(fname)


# ---------------------------------------------------------------------------
# Codestream builder
# ---------------------------------------------------------------------------


class BitWriter:
    """MSB-first bit writer with J2K packet-header bit stuffing (after an
    0xFF byte only 7 bits are used in the next byte)."""

    def __init__(self):
        self.bytes = bytearray()
        self.bits = 0
        self.acc = 0

    def put(self, bit):
        limit = 7 if (self.bytes and self.bytes[-1] == 0xFF) else 8
        self.acc = (self.acc << 1) | (bit & 1)
        self.bits += 1
        if self.bits == limit:
            self.bytes.append(self.acc)
            self.acc = 0
            self.bits = 0

    def put_bits(self, value, n):
        for i in reversed(range(n)):
            self.put((value >> i) & 1)

    def flush(self):
        if self.bits:
            limit = 7 if (self.bytes and self.bytes[-1] == 0xFF) else 8
            self.acc <<= limit - self.bits
            self.bytes.append(self.acc)
            self.acc = 0
            self.bits = 0
        # a packet header may not end with 0xFF
        if self.bytes and self.bytes[-1] == 0xFF:
            self.bytes.append(0x00)
        return bytes(self.bytes)


def _marker(code, payload):
    return struct.pack(">HH", code, len(payload) + 2) + payload


def build_stream(
    w=8,
    h=8,
    *,
    prec=8,
    sgnd=False,
    levels=0,
    cblk_exp=(6, 6),          # 2^6 = 64; actual stored value is exp-2
    cblk_style=0x40,           # HT
    rsiz=0x4000,               # bit14: capabilities in CAP marker
    cap=True,
    ccap15=None,               # default: HTONLY + P computed from prec
    guard_bits=2,
    missing_msbs=0,
    passes=None,               # list[bytes] per pass, or None = exclude block
    progression=0,             # LRCP
):
    """One tile, one component, one code-block (cblk >= image), one layer."""
    out = bytearray()
    out += struct.pack(">H", 0xFF4F)  # SOC
    ssiz = (prec - 1) | (0x80 if sgnd else 0)
    siz = struct.pack(">HIIIIIIIIH", rsiz, w, h, 0, 0, w, h, 0, 0, 1)
    siz += bytes([ssiz, 1, 1])
    out += _marker(0xFF51, siz)
    if cap:
        if ccap15 is None:
            # Bits 0-4: MAGB encoding (P = B - 8 clamped >= 0 per T.814);
            # bit 5 = 0 -> HTONLY. Probed: opj ignores most of this.
            ccap15 = max(0, prec + guard_bits - 8)
        out += _marker(0xFF50, struct.pack(">IH", 1 << 17, ccap15))
    sgcod = bytes([progression]) + struct.pack(">H", 1) + bytes([0])
    spcod = bytes([levels, cblk_exp[0] - 2, cblk_exp[1] - 2, cblk_style, 1])
    out += _marker(0xFF52, bytes([0]) + sgcod + spcod)  # COD, Scod=0
    # QCD: reversible, no quantization: one exponent per subband
    n_sub = 1 + 3 * levels
    exps = []
    for b in range(n_sub):
        if b == 0:
            e = prec + (0 if levels == 0 else 1)  # LL gain 0... probe
            e = prec
        else:
            e = prec + 1
        exps.append(e << 3)
    out += _marker(0xFF5C, bytes([guard_bits << 5]) + bytes(exps))
    # tile
    body = bytearray()
    bw = BitWriter()
    if passes is None:
        bw.put(0)  # empty packet
        body += bw.flush()
    else:
        data = b"".join(passes)
        bw.put(1)            # packet non-empty
        bw.put(1)            # inclusion tag tree, 1x1, threshold 0: included
        bw.put_bits(1, missing_msbs + 1)  # zero-bitplane tag tree: p zeros,1
        npasses = len(passes)
        if npasses == 1:
            bw.put(0)
        elif npasses == 2:
            bw.put_bits(0b10, 2)
        elif npasses <= 5:
            bw.put_bits(0b11, 2)
            bw.put_bits(npasses - 3, 2)
        else:
            raise ValueError("npasses > 5 not needed here")
        # Codeword segments: an HT code-block terminates the cleanup pass,
        # so pass 1 is its own segment and passes 2..3 (SigProp+MagRef)
        # form a second segment; each segment's length is signaled with
        # its own Lblock run + (lblock + floor(log2(seg passes))) bits.
        import math

        if (cblk_style & 0x40) and npasses > 1:
            seg_split = int(os.environ.get("HT_SEG_SPLIT", "2"))
            if seg_split == 3:
                segs = [[p] for p in passes]
            else:
                segs = [passes[:1], passes[1:]]
        else:
            segs = [passes]
        lblock = 3
        for seg in segs:
            seg_len = sum(len(s) for s in seg)
            lb_bits = int(math.floor(math.log2(len(seg))))
            while seg_len >= (1 << (lblock + lb_bits)):
                lblock += 1
        emitted_raise = False
        for seg in segs:
            seg_len = sum(len(s) for s in seg)
            lb_bits = int(math.floor(math.log2(len(seg))))
            if not emitted_raise:
                for _ in range(lblock - 3):
                    bw.put(1)
                emitted_raise = True
            bw.put(0)
            bw.put_bits(seg_len, lblock + lb_bits)
        body += bw.flush()
        body += data
    psot = 12 + 2 + len(body)
    out += _marker(0xFF90, struct.pack(">HIBB", 0, psot, 0, 1))  # SOT
    out += struct.pack(">H", 0xFF93)  # SOD
    out += body
    out += struct.pack(">H", 0xFFD9)  # EOC
    return bytes(out)


# ---------------------------------------------------------------------------
# experiments
# ---------------------------------------------------------------------------


def show(tag, comps, msgs):
    print(f"== {tag}")
    for lvl, m in msgs:
        print(f"   [{lvl}] {m}")
    if comps is None:
        print("   DECODE FAILED")
    else:
        arr, meta = comps[0]
        print(f"   decoded {arr.shape} prec={meta['prec']} "
              f"sgnd={meta['sgnd']} values:\n{arr}")
    print()
    return comps[0][0] if comps else None


def sanity(oracle):
    print(f"oracle: {oracle.path} version {oracle.version()}\n")
    # classic, empty packet -> zeros
    s = build_stream(cblk_style=0x00, rsiz=0, cap=False, passes=None)
    show("classic 8x8, excluded codeblock", *oracle.decode(s))
    # HT style, excluded codeblock
    s = build_stream(passes=None)
    show("HT 8x8, excluded codeblock", *oracle.decode(s))
    # HT with a guessed trivial cleanup segment: all-insignificant quads.
    # MEL-only segment; VLC empty. Scup=2 -> last two bytes hold Scup.
    # 8x8 block = 16 quads = 8 quad pairs, all context 0.
    cleanup = bytes([0xFF, 0x20])  # Scup = (0x20<<4)|(0xFF&0xF)=527? probe
    show("HT 8x8, cleanup guess A", *oracle.decode(
        build_stream(passes=[cleanup])))


def main():
    oracle = Oracle()
    cmd = sys.argv[1] if len(sys.argv) > 1 else "sanity"
    if cmd == "sanity":
        sanity(oracle)


if __name__ == "__main__":
    main()
