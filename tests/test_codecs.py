"""Compressed DICOM codec tests: RLE Lossless and JPEG Lossless round-trips,
both through the codec layer directly and through full DICOM files
(reference reads these via ITK/GDCM — /root/reference/lungmask/utils.py:215)."""

import numpy as np
import pytest

from lungmask_tpu.io import codecs, dicom


@pytest.fixture(scope="module")
def ct_slice():
    rng = np.random.default_rng(11)
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.full((h, w), -1000, dtype=np.int16)
    body = ((yy - h / 2) / (h * 0.4)) ** 2 + ((xx - w / 2) / (w * 0.35)) ** 2 < 1
    arr[body] = 40
    arr += rng.integers(-100, 100, size=arr.shape).astype(np.int16)
    return arr


# ---------------------------------------------------------------------------
# RLE
# ---------------------------------------------------------------------------


def test_packbits_roundtrip_runs_and_literals():
    data = b"\x00" * 200 + bytes(range(120)) + b"\xff" * 5 + b"ab" * 3
    enc = codecs._packbits_encode(data)
    assert codecs._packbits_decode_py(enc, len(data)) == data
    assert len(enc) < len(data)  # the runs must actually compress


@pytest.mark.parametrize("use_native", [True, False])
def test_rle_frame_roundtrip_int16(ct_slice, use_native, monkeypatch):
    if use_native and codecs.get_lib() is None:
        pytest.skip("native codec core unavailable")
    if not use_native:
        monkeypatch.setattr(codecs, "get_lib", lambda: None)
    frame = codecs.rle_encode_frame(ct_slice.view(np.uint16))
    out = codecs.rle_decode_frame(frame, ct_slice.size, 2)
    np.testing.assert_array_equal(
        out.view(np.int16).reshape(ct_slice.shape), ct_slice
    )


def test_rle_frame_roundtrip_uint8(rng):
    arr = rng.integers(0, 255, size=(32, 32)).astype(np.uint8)
    frame = codecs.rle_encode_frame(arr)
    out = codecs.rle_decode_frame(frame, arr.size, 1)
    np.testing.assert_array_equal(out.reshape(arr.shape), arr)


# ---------------------------------------------------------------------------
# JPEG Lossless
# ---------------------------------------------------------------------------


def test_jpegll_roundtrip(ct_slice):
    if codecs.get_lib() is None:
        pytest.skip("native codec core unavailable")
    stream = codecs.jpegll_encode(ct_slice.view(np.uint16), precision=16)
    out = codecs.jpegll_decode(stream)
    np.testing.assert_array_equal(out.view(np.int16), ct_slice)


def test_jpegll_roundtrip_extreme_diffs():
    """Alternating min/max exercises every magnitude category incl. 16."""
    if codecs.get_lib() is None:
        pytest.skip("native codec core unavailable")
    arr = np.zeros((8, 8), dtype=np.uint16)
    arr[::2, ::2] = 0xFFFF
    arr[1::2, 1::2] = 0x8000
    stream = codecs.jpegll_encode(arr, precision=16)
    np.testing.assert_array_equal(codecs.jpegll_decode(stream), arr)


def test_jpegll_rejects_lossy():
    # A fake SOF0 (baseline DCT) stream must be refused, not misdecoded.
    bad = b"\xff\xd8\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00\xff\xd9"
    with pytest.raises(ValueError):
        codecs.jpegll_decode(bad)


# ---------------------------------------------------------------------------
# Full DICOM files
# ---------------------------------------------------------------------------
# JPEG-LS (ITU-T T.87): the from-scratch decoder is validated against the
# system CharLS reference implementation (true spec compliance, not just
# self-round-trips — CharLS encodes, we decode, outputs must be identical).
# ---------------------------------------------------------------------------

needs_jls = pytest.mark.skipif(
    codecs.get_lib() is None or codecs.charls_lib() is None,
    reason="needs the native codec core and system CharLS",
)


def _jls_image(rng, kind, bits, h=48, w=37):
    maxv = (1 << bits) - 1
    if kind == "random":
        return rng.integers(0, maxv + 1, (h, w)).astype(np.uint16)
    if kind == "runs":
        vals = rng.integers(0, maxv + 1, 3)
        img = vals[rng.integers(0, 3, (h, w))].astype(np.uint16)
        img[:, : w // 2] = vals[0]
        return img
    if kind == "flat":
        return np.full((h, w), maxv, np.uint16)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (np.sin(yy / 9.0) * np.cos(xx / 13.0) * 0.5 + 0.5) * maxv * 0.7
    img += rng.integers(0, max(2, maxv // 50), (h, w))
    body = ((yy - h / 2) / (h * 0.4)) ** 2 + ((xx - w / 2) / (w * 0.35)) ** 2 < 1
    img[~body] = 0
    return np.clip(img, 0, maxv).astype(np.uint16)


@needs_jls
@pytest.mark.parametrize("bits", [2, 8, 12, 16])
@pytest.mark.parametrize("kind", ["ct", "random", "runs", "flat"])
def test_jpegls_matches_charls_oracle(rng, bits, kind):
    img = _jls_image(rng, kind, bits)
    enc = codecs.jpegls_encode(img, precision=bits)
    mine = codecs.jpegls_decode(enc)
    np.testing.assert_array_equal(mine, img)  # lossless
    np.testing.assert_array_equal(mine, codecs.charls_decode(enc))


@needs_jls
def test_jpegls_near_lossless_matches_charls(rng):
    img = _jls_image(rng, "ct", 12, h=64, w=64)
    enc = codecs.jpegls_encode(img, precision=12, near=3)
    mine = codecs.jpegls_decode(enc)
    oracle = codecs.charls_decode(enc)
    np.testing.assert_array_equal(mine, oracle)
    assert np.abs(mine.astype(int) - img.astype(int)).max() <= 3


@needs_jls
def test_jpegls_fuzz_small_shapes(rng):
    for trial in range(60):
        h = int(rng.integers(1, 10))
        w = int(rng.integers(1, 24))
        bits = int(rng.choice([2, 4, 8, 12, 16]))
        img = _jls_image(rng, ["random", "runs", "flat"][trial % 3], bits, h, w)
        enc = codecs.jpegls_encode(img, precision=bits)
        np.testing.assert_array_equal(codecs.jpegls_decode(enc), img)


# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "syntax",
    [dicom.RLE_LOSSLESS, dicom.JPEG_LOSSLESS_SV1, dicom.JPEG_LS_LOSSLESS],
)
def test_compressed_dicom_roundtrip(tmp_path, ct_slice, syntax):
    if syntax != dicom.RLE_LOSSLESS and codecs.get_lib() is None:
        pytest.skip("native codec core unavailable")
    if syntax == dicom.JPEG_LS_LOSSLESS and codecs.charls_lib() is None:
        pytest.skip("JPEG-LS fixture encoding needs system CharLS")
    p = str(tmp_path / "c.dcm")
    dicom.write_slice(p, ct_slice, transfer_syntax=syntax)
    parsed = dicom.read_file(p)
    np.testing.assert_array_equal(parsed.pixels, ct_slice)


def test_compressed_dicom_rescale(tmp_path, ct_slice):
    """RescaleSlope/Intercept must apply after decompression."""
    raw = ((ct_slice.astype(np.int32) + 1024)).astype(np.int16)  # stored form
    p = str(tmp_path / "r.dcm")
    dicom.write_slice(
        p, raw, transfer_syntax=dicom.RLE_LOSSLESS, rescale=(1.0, -1024.0)
    )
    parsed = dicom.read_file(p)
    np.testing.assert_array_equal(parsed.pixels, ct_slice)


def test_mixed_syntax_series(tmp_path, ct_slice):
    """A series whose slices use different transfer syntaxes must assemble."""
    from lungmask_tpu.io import loader

    suid, stuid = dicom.generate_uid(), dicom.generate_uid()
    syntaxes = [dicom.EXPLICIT_VR_LE, dicom.RLE_LOSSLESS, dicom.JPEG_LOSSLESS_SV1]
    if codecs.get_lib() is None:
        syntaxes[2] = dicom.RLE_LOSSLESS
    elif codecs.charls_lib() is not None:
        syntaxes.append(dicom.JPEG_LS_LOSSLESS)
    for i, ts in enumerate(syntaxes):
        dicom.write_slice(
            str(tmp_path / f"{i}.dcm"),
            ct_slice + i,
            series_uid=suid,
            study_uid=stuid,
            position=(0.0, 0.0, float(i)),
            transfer_syntax=ts,
        )
    vols = loader.read_dicoms(str(tmp_path), disable_tqdm=True)
    assert len(vols) == 1
    arr = vols[0].array
    assert arr.shape == (len(syntaxes),) + ct_slice.shape
    for i in range(len(syntaxes)):
        np.testing.assert_array_equal(arr[i], ct_slice + i)


def test_stop_before_pixels_skips_decode(tmp_path, ct_slice):
    p = str(tmp_path / "c.dcm")
    dicom.write_slice(p, ct_slice, transfer_syntax=dicom.RLE_LOSSLESS)
    hdr = dicom.read_file(p, stop_before_pixels=True)
    assert hdr.pixels is None
    assert hdr.get("0028|0010") == str(ct_slice.shape[0])


# ---------------------------------------------------------------------------
# Multi-frame (Enhanced-CT-style: whole volume in one file — the reference
# reads these via sitk.ImageFileReader, /root/reference/lungmask/utils.py:247)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ct_frames(ct_slice):
    return np.stack([ct_slice + i for i in range(5)], axis=0)


def test_multiframe_native_roundtrip(tmp_path, ct_frames):
    p = str(tmp_path / "mf.dcm")
    dicom.write_slice(p, ct_frames, slice_thickness=2.5)
    parsed = dicom.read_file(p)
    assert parsed.pixels.shape == ct_frames.shape
    np.testing.assert_array_equal(parsed.pixels, ct_frames)
    assert parsed.get("0028|0008") == "5"


@pytest.mark.parametrize(
    "syntax", [dicom.RLE_LOSSLESS, dicom.JPEG_LOSSLESS_SV1]
)
def test_multiframe_encapsulated_roundtrip(tmp_path, ct_frames, syntax):
    """One fragment per frame + populated Basic Offset Table."""
    if syntax != dicom.RLE_LOSSLESS and codecs.get_lib() is None:
        pytest.skip("native codec core unavailable")
    p = str(tmp_path / "mfc.dcm")
    dicom.write_slice(p, ct_frames, transfer_syntax=syntax)
    parsed = dicom.read_file(p)
    np.testing.assert_array_equal(parsed.pixels, ct_frames)


def test_multiframe_loader_single_file(tmp_path, ct_frames):
    """load_input_image on a multi-frame file yields the whole volume with
    SpacingBetweenSlices as the z spacing."""
    from lungmask_tpu.io import loader

    p = str(tmp_path / "mf.dcm")
    dicom.write_slice(p, ct_frames, slice_thickness=2.5, spacing=(0.7, 0.8))
    img = loader.load_input_image(p)
    assert img.array.shape == ct_frames.shape
    np.testing.assert_array_equal(img.array, ct_frames)
    assert img.spacing[2] == pytest.approx(2.5)


def test_multiframe_mixed_series_refused(tmp_path, ct_frames, ct_slice):
    from lungmask_tpu.io import loader

    suid, stuid = dicom.generate_uid(), dicom.generate_uid()
    dicom.write_slice(
        str(tmp_path / "a.dcm"), ct_frames, series_uid=suid, study_uid=stuid,
        position=(0.0, 0.0, 0.0),
    )
    dicom.write_slice(
        str(tmp_path / "b.dcm"), ct_slice, series_uid=suid, study_uid=stuid,
        position=(0.0, 0.0, 50.0),
    )
    with pytest.raises(dicom.DicomError, match="multi-frame"):
        loader.read_dicoms(str(tmp_path), disable_tqdm=True)


def test_defined_length_encapsulated_rejected(tmp_path, ct_slice):
    """A defined-length (7FE0,0010) inside a compressed transfer syntax must
    raise instead of decoding the codestream as raw HU samples."""
    p = str(tmp_path / "bad.dcm")
    dicom.write_slice(p, ct_slice, transfer_syntax=dicom.RLE_LOSSLESS)
    data = bytearray(open(p, "rb").read())
    # Find the pixel-data element (explicit OB, undefined length) and rewrite
    # it as a defined-length element spanning the encapsulated items.
    import struct as _s

    tag = _s.pack("<HH", 0x7FE0, 0x0010)
    ix = data.find(tag)
    assert ix != -1 and data[ix + 4 : ix + 6] == b"OB"
    payload_len = len(data) - (ix + 12)
    data[ix + 8 : ix + 12] = _s.pack("<I", payload_len)
    open(p, "wb").write(bytes(data))
    with pytest.raises(dicom.DicomError, match="defined-length"):
        dicom.read_file(p)


def test_truncated_jpeg_peek_raises_valueerror():
    with pytest.raises(ValueError, match="truncated|no SOF"):
        codecs._peek_sof3_dims(bytes.fromhex("ffd8ffc3000810"))
    with pytest.raises(ValueError, match="truncated|no SOF"):
        codecs._peek_jpegls_dims(bytes.fromhex("ffd8fff7000810"))


def test_malformed_jpeg_streams_error_cleanly():
    """Truncated/malformed codestreams must return clean errors (no OOB reads
    in the native core, no uncaught low-level exceptions)."""
    if codecs.get_lib() is None:
        pytest.skip("native codec core unavailable")
    bad = [
        bytes.fromhex("ffd8ffc40004ffff"),          # DHT segment past buffer
        bytes.fromhex("ffd8ffc3000401"),            # SOF3 too short
        bytes.fromhex("ffd8ffc3000b08001000100100ffda0003"),  # SOS too short
        # DHT whose counts sum to >256 (filled with 255s)
        bytes.fromhex("ffd8ffc40115" + "00" + "ff" * 16 + "00" * 0x100),
        b"\xff\xd8" + b"\xff\xc4" + b"\x00\x13" + b"\x00" + b"\x01" * 16 + b"\x00",
    ]
    for data in bad:
        with pytest.raises(ValueError):
            codecs.jpegll_decode(data)


def test_ac_class_dht_does_not_clobber_dc_table(tmp_path, ct_slice):
    """An AC-class (Tc=1) Huffman table with the same id must not overwrite
    the DC table a lossless scan uses."""
    if codecs.get_lib() is None:
        pytest.skip("native codec core unavailable")
    stream = codecs.jpegll_encode(ct_slice.view(np.uint16), precision=16)
    assert stream[:2] == b"\xff\xd8"
    # Inject a garbage AC-class DHT (Tc=1, Th=0) right after SOI.
    counts = bytes([1] + [0] * 15)
    ac_dht = b"\xff\xc4" + (3 + 16 + 1).to_bytes(2, "big") + b"\x10" + counts + b"\x05"
    patched = stream[:2] + ac_dht + stream[2:]
    out = codecs.jpegll_decode(patched)
    np.testing.assert_array_equal(out.view(np.int16), ct_slice)


# ---------------------------------------------------------------------------
# JPEG 2000 Part 1 (lossless 5/3) — decoder validated bit-for-bit against
# OpenJPEG via Pillow (the fixture encoder and spec oracle).
# ---------------------------------------------------------------------------


def _pil_j2k(arr, **kw):
    import io as _io

    PIL = pytest.importorskip("PIL.Image")
    buf = _io.BytesIO()
    if arr.dtype == np.uint8:
        im = PIL.fromarray(arr)
    else:
        im = PIL.frombytes(
            "I;16", (arr.shape[1], arr.shape[0]), arr.astype("<u2").tobytes()
        )
    im.save(buf, "JPEG2000", irreversible=False, **kw)
    return buf.getvalue()


def _require_j2k():
    lib = codecs.get_lib()
    if lib is None or not hasattr(lib, "lm_j2k_decode"):
        pytest.skip("native J2K decoder unavailable")


def test_j2k_basic_8bit(rng):
    _require_j2k()
    a = rng.integers(0, 256, (61, 53), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.j2k_decode(_pil_j2k(a)), a)


def test_j2k_16bit_ct_like(rng):
    _require_j2k()
    ct = (
        (rng.normal(0, 300, (128, 96)) + 1024).clip(0, 4095).astype(np.uint16)
    )
    np.testing.assert_array_equal(codecs.j2k_decode(_pil_j2k(ct)), ct)


def test_j2k_odd_dims_smooth():
    _require_j2k()
    yy, xx = np.mgrid[0:211, 0:187]
    smooth = (2000 * np.exp(-((yy - 100) ** 2 + (xx - 90) ** 2) / 3000)).astype(
        np.uint16
    )
    np.testing.assert_array_equal(codecs.j2k_decode(_pil_j2k(smooth)), smooth)


@pytest.mark.parametrize(
    "kw",
    [
        {"quality_mode": "rates", "quality_layers": [20, 5, 1]},
        {"progression": "RLCP"},
        {"progression": "RPCL"},
        {"precinct_size": (64, 64), "codeblock_size": (32, 32)},
        {"num_resolutions": 1},
    ],
)
def test_j2k_codestream_features(rng, kw):
    """Multiple quality layers, RLCP/RPCL progressions, precinct and
    code-block sizes, and 0 decomposition levels — all bit-exact."""
    _require_j2k()
    a = rng.integers(0, 4096, (77, 90), dtype=np.uint16)
    np.testing.assert_array_equal(codecs.j2k_decode(_pil_j2k(a, **kw)), a)


def test_j2k_deep_decomposition(rng):
    """7 decomposition levels (needs a large enough image for OpenJPEG)."""
    _require_j2k()
    a = rng.integers(0, 4096, (200, 260), dtype=np.uint16)
    np.testing.assert_array_equal(
        codecs.j2k_decode(_pil_j2k(a, num_resolutions=8)), a
    )


def test_j2k_tiled_8bit(rng):
    """Tile grids, 8-bit: encode round-trip is exact."""
    _require_j2k()
    a = rng.integers(0, 256, (77, 90), dtype=np.uint8)
    np.testing.assert_array_equal(
        codecs.j2k_decode(_pil_j2k(a, tile_size=(32, 32))), a
    )


def test_j2k_tiled_16bit_matches_openjpeg_decode(rng):
    """Tile grids, 16-bit: Pillow's I;16 tiled ENCODE path corrupts tiles
    after the first (it cannot round-trip its own stream — verified), so the
    oracle here is decode agreement: our decoder must produce bit-for-bit
    what OpenJPEG itself decodes from the same stream."""
    import io as _io

    _require_j2k()
    PIL = pytest.importorskip("PIL.Image")
    a = rng.integers(0, 4096, (77, 90), dtype=np.uint16)
    data = _pil_j2k(a, tile_size=(32, 32))
    got = codecs.j2k_decode(data)
    ref = np.array(PIL.open(_io.BytesIO(data))).astype(np.int32)
    np.testing.assert_array_equal(got, ref)


def test_j2k_rejects_lossy(rng):
    _require_j2k()
    import io as _io

    PIL = pytest.importorskip("PIL.Image")
    buf = _io.BytesIO()
    PIL.fromarray(rng.integers(0, 256, (32, 32), dtype=np.uint8)).save(
        buf, "JPEG2000", irreversible=True
    )
    with pytest.raises(ValueError, match="9/7|LOSSY|lossy"):
        codecs.j2k_decode(buf.getvalue())


def test_j2k_jp2_container_unwrapped(rng):
    """DICOM forbids the JP2 container but some exporters embed it; the
    wrapper must find the jp2c box."""
    _require_j2k()
    a = rng.integers(0, 256, (40, 44), dtype=np.uint8)
    data = _pil_j2k(a)  # Pillow BytesIO save produces a JP2 container
    assert data[:4] != b"\xff\x4f\xff\x51"
    np.testing.assert_array_equal(codecs.j2k_decode(data), a)


@pytest.mark.parametrize("syntax", [dicom.JPEG_2000_LOSSLESS, dicom.JPEG_2000])
def test_j2k_dicom_roundtrip(tmp_path, ct_slice, syntax):
    """Encapsulated .90/.91 DICOM round-trip with signed int16 CT pixels."""
    _require_j2k()
    pytest.importorskip("PIL.Image")
    p = str(tmp_path / "j2k.dcm")
    dicom.write_slice(p, ct_slice, transfer_syntax=syntax)
    parsed = dicom.read_file(p)
    np.testing.assert_array_equal(parsed.pixels, ct_slice)


@pytest.fixture(scope="module")
def j2k_stream():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 3000, size=(64, 64), dtype=np.uint16)
    data = codecs.j2k_encode(img)
    assert np.array_equal(codecs.j2k_decode(data), img.astype(np.int32))
    return data


def test_j2k_fuzz_truncation(j2k_stream):
    """Truncated codestreams at every prefix length must decode or raise a
    clean ValueError — the native decoder (csrc/jpeg2000.cpp) parses
    untrusted bytes in-process, so anything else is a memory-safety bug."""
    n = len(j2k_stream)
    for cut in range(0, n, max(1, n // 64)):
        try:
            codecs.j2k_decode(j2k_stream[:cut])
        except ValueError:
            pass


@pytest.mark.slow
def test_j2k_fuzz_bitflips(j2k_stream):
    """Byte corruptions across the stream (markers, packet headers, EBCOT
    payload) must decode-or-ValueError, never crash or hang."""
    rng = np.random.default_rng(11)
    n = len(j2k_stream)
    offsets = sorted(set(rng.integers(0, n, size=256).tolist()))
    for off in offsets:
        data = bytearray(j2k_stream)
        data[off] ^= 0xFF
        try:
            codecs.j2k_decode(bytes(data))
        except ValueError:
            pass
    for off in offsets[:64]:
        data = bytearray(j2k_stream)
        data[off] = int(rng.integers(0, 256))
        try:
            codecs.j2k_decode(bytes(data))
        except ValueError:
            pass


def test_j2k_rejects_context_reset_style(j2k_stream):
    """SPcod code-block style 0x02 (reset context probabilities each pass) is
    not implemented by the T1; decoding anyway would desynchronize the MQ
    decoder and return silently wrong pixels — it must be refused up front."""
    data = bytearray(j2k_stream)
    i = data.find(b"\xff\x52")  # COD marker
    assert i >= 0
    data[i + 12] |= 0x02  # SPcod code-block style byte (seg + 8)
    with pytest.raises(ValueError, match="reset|bypass"):
        codecs.j2k_decode(bytes(data))


def test_j2k_rejects_main_header_coc(j2k_stream):
    """A COC in the MAIN header overrides COD (possibly selecting the 9/7
    wavelet, bypassing the lossy gate); decoding with the stale COD would be
    silently wrong, so it must be refused like the tile-part variant."""
    data = bytearray(j2k_stream)
    i = data.find(b"\xff\x52")
    assert i >= 0
    lcod = int.from_bytes(data[i + 2 : i + 4], "big")
    coc = b"\xff\x53\x00\x04\x00\x00"  # COC, Lcoc=4, comp 0, Scoc 0
    data[i + 2 + lcod : i + 2 + lcod] = coc
    with pytest.raises(ValueError, match="COC|per-component|overrides"):
        codecs.j2k_decode(bytes(data))


def test_j2k_rejects_tile_part_poc(j2k_stream):
    """A POC in a tile-part header (legal per T.800 A.6.6) changes packet
    progression mid-stream; parsing with the COD order would desync."""
    data = bytearray(j2k_stream)
    i = data.find(b"\xff\x90")  # SOT
    assert i >= 0
    # Minimal 1-component POC: RSpoc CSpoc LYEpoc(2) REpoc CEpoc Ppoc.
    poc = b"\xff\x5f\x00\x09" + bytes([0, 0, 0, 1, 6, 1, 0])
    data[i + 12 : i + 12] = poc  # right after the 12-byte SOT segment
    with pytest.raises(ValueError, match="POC"):
        codecs.j2k_decode(bytes(data))


@pytest.mark.parametrize(
    "codec", ["rle", "jpegll", "jpegls"]
)
def test_native_decoder_fuzz_corruption(codec, rng):
    """Truncations and byte corruptions of valid streams must decode or raise
    cleanly for every native decoder (csrc/dicom_codecs.cpp) — they parse
    untrusted DICOM pixel bytes in-process. (The J2K twin lives above;
    fork-isolated 600+-case sweeps per codec ran during development.)"""
    img = rng.integers(0, 3000, size=(33, 41), dtype=np.uint16)
    if codec == "rle":
        data = codecs.rle_encode_frame(img.astype(np.int16))
        decode = lambda b: codecs.rle_decode_frame(b, img.size, 2)
    elif codec == "jpegll":
        data = codecs.jpegll_encode(img, precision=16)
        decode = codecs.jpegll_decode
    else:
        data = codecs.jpegls_encode(img, precision=16)
        decode = codecs.jpegls_decode
    n = len(data)
    blobs = [data[:cut] for cut in range(0, n, max(1, n // 24))]
    for off in sorted(set(rng.integers(0, n, size=48).tolist())):
        b = bytearray(data)
        b[off] ^= 0xFF
        blobs.append(bytes(b))
    for blob in blobs:
        try:
            decode(blob)
        except ValueError:
            pass  # the decoders' one documented failure type


# ---------------------------------------------------------------------------
# JPEG sequential DCT (baseline .50 / extended .51) — lossy
# ---------------------------------------------------------------------------


def _pil_jpeg_bytes(arr_u8, quality):
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(arr_u8, "L").save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.parametrize("shape,quality", [((64, 64), 85), ((61, 47), 95),
                                           ((128, 96), 50)])
def test_jpegdct_8bit_matches_pillow_bitexact(rng, shape, quality):
    """The integer islow IDCT reproduces libjpeg's decode bit-for-bit."""
    from PIL import Image
    import io as _io

    yy, xx = np.mgrid[0:shape[0], 0:shape[1]]
    arr = (127 + 100 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
           + rng.normal(0, 6, shape)).clip(0, 255).astype(np.uint8)
    data = _pil_jpeg_bytes(arr, quality)
    ours = codecs.jpegdct_decode(data)
    pil = np.asarray(Image.open(_io.BytesIO(data)))
    assert ours.dtype == np.uint8
    np.testing.assert_array_equal(ours, pil)


def test_jpegdct_12bit_roundtrip_near_exact(rng):
    """Flat quant=1 12-bit encode→decode: only DCT rounding noise remains."""
    yy, xx = np.mgrid[0:48, 0:40]
    arr = (2048 + 1500 * np.sin(yy / 11.0) * np.cos(xx / 5.0)).astype(np.uint16)
    data = codecs.jpegdct_encode(arr, precision=12, quant=1)
    out = codecs.jpegdct_decode(data)
    assert out.dtype == np.uint16 and out.shape == arr.shape
    diff = np.abs(out.astype(int) - arr.astype(int))
    assert diff.max() <= 2, diff.max()


def test_jpegdct_12bit_constant_blocks_exact():
    """DC-only blocks survive the round trip exactly."""
    arr = np.repeat(np.repeat(
        np.array([[100, 2048], [4095, 0]], np.uint16), 8, 0), 8, 1)
    out = codecs.jpegdct_decode(codecs.jpegdct_encode(arr, precision=12))
    np.testing.assert_array_equal(out, arr)


def test_jpegdct_8bit_own_encoder_roundtrip(rng):
    arr = rng.integers(0, 256, size=(24, 24)).astype(np.uint8)
    data = codecs.jpegdct_encode(arr, precision=8, quant=1)
    out = codecs.jpegdct_decode(data)
    assert out.dtype == np.uint8
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 2


def test_jpegdct_rejects_progressive(rng):
    """Pillow progressive output must be refused, not mis-decoded."""
    import io as _io

    from PIL import Image

    arr = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(arr, "L").save(buf, "JPEG", quality=80, progressive=True)
    with pytest.raises(ValueError):
        codecs.jpegdct_decode(buf.getvalue())


def test_jpegdct_malformed_streams_error_cleanly(rng):
    arr = rng.integers(0, 4096, size=(16, 16)).astype(np.uint16)
    data = codecs.jpegdct_encode(arr, precision=12)
    for cut in range(0, len(data), max(1, len(data) // 32)):
        # Decode-or-ValueError (same contract as the other codecs' fuzz
        # tests): a cut that only drops the trailing EOI decodes fine — every
        # MCU is already present — so success is legitimate there. Cuts into
        # the entropy data or headers must raise, never crash.
        try:
            decoded = codecs.jpegdct_decode(data[:cut])
        except ValueError:
            continue
        # Success is only acceptable for cuts that preserved all MCU data.
        assert cut >= len(data) - 4, f"cut={cut} decoded from truncated data"
        assert decoded.shape == arr.shape
    for off in range(2, min(len(data), 64)):
        mut = bytearray(data)
        mut[off] ^= 0xFF
        try:
            codecs.jpegdct_decode(bytes(mut))
        except ValueError:
            pass


def test_lossy_jpeg_dicom_roundtrip_and_warning(tmp_path):
    """A .51 CT slice decodes through the DICOM layer (rescale applied) and
    logs the lossy-HU warning; .50 8-bit does the same."""
    import logging

    from lungmask_tpu.logger import logger as lmlog

    yy, xx = np.mgrid[0:32, 0:32]
    stored = (1024 + 900 * np.sin(yy / 7.0) * np.cos(xx / 4.0)).astype(np.int16)
    p = str(tmp_path / "lossy12.dcm")
    dicom.write_slice(p, stored, rescale=(1.0, -1024.0),
                      transfer_syntax=codecs.JPEG_EXTENDED)
    records = []
    h = logging.Handler()
    h.emit = lambda r: records.append(r.getMessage())
    lmlog.addHandler(h)
    try:
        f = dicom.read_file(p)
    finally:
        lmlog.removeHandler(h)
    assert any("lossy JPEG" in m for m in records)
    want = stored.astype(np.int32) - 1024
    diff = np.abs(f.pixels.astype(int) - want)
    assert diff.max() <= 2  # quant=1 fixture: only DCT rounding noise

    stored8 = np.clip(stored // 16, 0, 255).astype(np.int16)
    p8 = str(tmp_path / "lossy8.dcm")
    dicom.write_slice(p8, stored8, transfer_syntax=codecs.JPEG_BASELINE)
    f8 = dicom.read_file(p8)
    assert np.abs(f8.pixels.astype(int) - stored8.astype(int)).max() <= 2


def test_jpegls_near_lossless_reports_near(rng):
    """NEAR must surface to callers (the DICOM layer warns on lossy .81
    streams based on it) and bound the reconstruction error."""
    lib = codecs.get_lib()
    if lib is None:
        pytest.skip("native codec core unavailable")
    arr = rng.integers(0, 4096, size=(32, 40)).astype(np.uint16)
    data = codecs.jpegls_encode(arr, precision=12, near=2)
    decoded, near = codecs.jpegls_decode(data, with_near=True)
    assert near == 2
    assert np.max(np.abs(decoded.astype(np.int64) - arr)) <= 2
    lossless = codecs.jpegls_encode(arr, precision=12, near=0)
    _, near0 = codecs.jpegls_decode(lossless, with_near=True)
    assert near0 == 0


# ---------------------------------------------------------------------------
# HTJ2K (ITU-T T.814) — cleanup-pass HT block coding
# ---------------------------------------------------------------------------
# The HT block decoder (csrc/jpeg2000.cpp HTDec) is a port of the
# probe-reconstructed Python reference (lungmask_tpu/io/htj2k.py) whose
# bit-exactness against OpenJPEG is fuzz-pinned in tests/test_htj2k.py;
# these tests cover the codestream/tier-2 wrapper and the DICOM surface.
# Reference: HTJ2K DICOM is read through ITK/GDCM by the reference
# (/root/reference/lungmask/utils.py:215-222).


def test_htj2k_codestream_roundtrip(rng):
    for shape, dtype, lo, hi in [
        ((96, 128), np.int16, -1024, 3071),
        ((64, 64), np.uint16, 0, 65535),
        ((33, 77), np.uint8, 0, 255),
        ((130, 70), np.int16, -2000, 2000),
    ]:
        img = rng.integers(lo, hi + 1, size=shape).astype(dtype)
        data = codecs.htj2k_encode(img)
        dec = codecs.j2k_decode(data)
        assert np.array_equal(dec, img.astype(np.int32)), (shape, dtype)


def test_htj2k_matches_openjpeg_decode(rng):
    """Our HT streams must decode identically under OpenJPEG — the
    independent conformance oracle for the whole HT reconstruction."""
    pytest.importorskip("PIL.Image")
    import io as _io

    from PIL import Image

    img = rng.integers(0, 4096, size=(70, 90), dtype=np.uint16)
    data = codecs.htj2k_encode(img)
    try:
        pil = Image.open(_io.BytesIO(data))
        arr = np.array(pil)
    except Exception:
        pytest.skip("Pillow build cannot open raw HTJ2K codestreams")
    assert np.array_equal(arr.astype(np.int32), img.astype(np.int32))


def test_htj2k_dicom_roundtrip(tmp_path, ct_slice):
    p = str(tmp_path / "ht.dcm")
    dicom.write_slice(p, ct_slice, transfer_syntax="1.2.840.10008.1.2.4.201")
    df = dicom.read_file(p)
    assert df.pixels.dtype == np.int16
    assert np.array_equal(df.pixels, ct_slice)


def test_htj2k_dicom_multiframe_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    vol = rng.integers(-1024, 3072, size=(3, 64, 64)).astype(np.int16)
    p = str(tmp_path / "ht3.dcm")
    dicom.write_slice(p, vol, transfer_syntax="1.2.840.10008.1.2.4.201")
    df = dicom.read_file(p)
    assert np.array_equal(df.pixels, vol)


def test_htj2k_refuses_refinement_passes(rng):
    """A block declaring SigProp/MagRef passes must be refused loudly —
    decoding the cleanup alone would silently truncate HU values."""
    import json as _json
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
    from lungmask_tpu.io.htj2k import CleanupEncoder, HTTables, _TABLE_PATH
    from tools.htj2k_probe import build_stream

    T = HTTables(_json.load(open(_TABLE_PATH)))
    mu = np.zeros((4, 4), np.int64)
    mu[1, 1] = 2
    seg = CleanupEncoder(T, 4, 4).encode(mu, np.zeros((4, 4), np.uint8))
    stream = build_stream(4, 4, prec=14, sgnd=True, cblk_exp=(2, 2),
                          missing_msbs=8, guard_bits=2,
                          passes=[seg, b"\x00\x00", b"\x00"])
    with pytest.raises(ValueError, match="SigProp|refinement"):
        codecs.j2k_decode(bytes(stream))


@pytest.fixture
def htj2k_stream_bytes():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 3000, size=(64, 64), dtype=np.uint16)
    data = codecs.htj2k_encode(img)
    assert np.array_equal(codecs.j2k_decode(data), img.astype(np.int32))
    return data


def test_htj2k_fuzz_truncation(htj2k_stream_bytes):
    n = len(htj2k_stream_bytes)
    for cut in range(0, n, max(1, n // 64)):
        try:
            codecs.j2k_decode(htj2k_stream_bytes[:cut])
        except ValueError:
            pass


@pytest.mark.slow
def test_htj2k_fuzz_bitflips(htj2k_stream_bytes):
    """Corrupt HT cleanup segments must decode-or-ValueError, never crash:
    the HTDec readers are bounds-checked against hostile U/length fields."""
    rng = np.random.default_rng(13)
    n = len(htj2k_stream_bytes)
    offsets = sorted(set(rng.integers(0, n, size=256).tolist()))
    for off in offsets:
        data = bytearray(htj2k_stream_bytes)
        data[off] ^= 0xFF
        try:
            codecs.j2k_decode(bytes(data))
        except ValueError:
            pass
    for off in offsets[:64]:
        data = bytearray(htj2k_stream_bytes)
        data[off] = int(rng.integers(0, 256))
        try:
            codecs.j2k_decode(bytes(data))
        except ValueError:
            pass
