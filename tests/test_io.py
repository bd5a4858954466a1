"""I/O layer tests: DICOM parse/write/scan, NIfTI & MHA round-trips,
orientation handling, input loading (reference testdata when available)."""

import os

import numpy as np
import pytest

from lungmask_tpu.io import dicom, image, loader, mha, nifti

from conftest import REFERENCE_TESTDATA


def _phys(img, z, y, x):
    d = np.asarray(img.direction)
    s = np.asarray(img.spacing)
    return np.asarray(img.origin) + d @ (s * np.asarray([x, y, z], dtype=float))


# ---------------------------------------------------------------------------
# Orientation
# ---------------------------------------------------------------------------


def test_orientation_code_identity():
    assert image.orientation_code(np.eye(3)) == "LPS"


def test_orientation_code_flips():
    d = np.diag([-1.0, -1.0, 1.0])
    assert image.orientation_code(d) == "RAS"
    perm = np.asarray([[0, 1, 0], [1, 0, 0], [0, 0, -1.0]])
    assert image.orientation_code(perm) == "PLI"


@pytest.mark.parametrize("code", ["RAS", "PLI", "ASL", "IPR"])
def test_reorient_preserves_physical_positions(code, rng):
    arr = rng.integers(-1000, 600, size=(4, 6, 8)).astype(np.int16)
    img = image.MedicalImage(
        arr, spacing=(0.7, 0.8, 2.5), origin=(10.0, -20.0, 5.0)
    )
    out = image.reorient(img, code)
    assert out.orientation() == code
    # every voxel must sit at the same physical point with the same value
    for _ in range(20):
        z = rng.integers(0, arr.shape[0])
        y = rng.integers(0, arr.shape[1])
        x = rng.integers(0, arr.shape[2])
        p = _phys(img, z, y, x)
        # find idx in out by inverting its affine
        d = np.asarray(out.direction) * np.asarray(out.spacing)[None, :]
        idx_xyz = np.linalg.solve(d, p - np.asarray(out.origin))
        xi, yi, zi = (int(round(v)) for v in idx_xyz)
        assert out.array[zi, yi, xi] == arr[z, y, x]


def test_reorient_roundtrip(rng):
    arr = rng.integers(0, 100, size=(3, 5, 7)).astype(np.int16)
    img = image.MedicalImage(arr, direction=np.diag([-1.0, 1.0, -1.0]))
    lps = image.reorient(img, "LPS")
    back = image.reorient(lps, img.orientation())
    np.testing.assert_array_equal(back.array, arr)
    np.testing.assert_allclose(back.direction, img.direction)
    np.testing.assert_allclose(back.origin, img.origin)


# ---------------------------------------------------------------------------
# NIfTI / MHA round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
def test_nifti_roundtrip(tmp_path, ext, rng):
    arr = rng.integers(-1024, 600, size=(5, 12, 9)).astype(np.int16)
    img = image.MedicalImage(
        arr,
        spacing=(0.6, 0.7, 2.0),
        origin=(-100.0, 50.0, 30.0),
        direction=np.diag([-1.0, 1.0, 1.0]),
    )
    p = str(tmp_path / f"vol{ext}")
    nifti.write(img, p)
    back = nifti.read(p)
    np.testing.assert_array_equal(back.array, arr)
    np.testing.assert_allclose(back.spacing, img.spacing, atol=1e-5)
    np.testing.assert_allclose(back.origin, img.origin, atol=1e-4)
    np.testing.assert_allclose(back.direction, img.direction, atol=1e-5)


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
def test_nifti_read_bytes_matches_read(tmp_path, ext, rng):
    # In-memory decode (serve fast lane) must agree with the file reader on
    # voxels AND geometry, for both compressed and raw streams.
    arr = rng.integers(-1024, 600, size=(5, 12, 9)).astype(np.int16)
    img = image.MedicalImage(
        arr,
        spacing=(0.6, 0.7, 2.0),
        origin=(-100.0, 50.0, 30.0),
        direction=np.diag([-1.0, 1.0, 1.0]),
    )
    p = str(tmp_path / f"vol{ext}")
    nifti.write(img, p)
    with open(p, "rb") as f:
        data = f.read()
    ref = nifti.read(p)
    got = nifti.read_bytes(bytearray(data), name=f"vol{ext}")
    np.testing.assert_array_equal(got.array, ref.array)
    np.testing.assert_allclose(got.spacing, ref.spacing)
    np.testing.assert_allclose(got.origin, ref.origin)
    np.testing.assert_allclose(got.direction, ref.direction)
    assert got.array.flags.writeable


def test_nifti_read_bytes_truncated(tmp_path, rng):
    arr = rng.integers(0, 50, size=(3, 6, 5)).astype(np.int16)
    p = str(tmp_path / "t.nii")
    nifti.write(image.MedicalImage(arr), p)
    with open(p, "rb") as f:
        data = f.read()
    with pytest.raises(ValueError, match="truncated"):
        nifti.read_bytes(data[:-7], name="t.nii")


def test_nifti_encode_matches_write(tmp_path, rng):
    arr = rng.integers(0, 4, size=(4, 7, 6)).astype(np.uint8)
    img = image.MedicalImage(arr, spacing=(1.5, 1.5, 3.0), origin=(1.0, 2.0, 3.0))
    p = str(tmp_path / "e.nii")
    nifti.write(img, p)
    with open(p, "rb") as f:
        assert f.read() == nifti.encode(img)


def test_loader_memory_io_dispatch(rng):
    arr = rng.integers(-500, 500, size=(3, 8, 8)).astype(np.int16)
    img = image.MedicalImage(arr, spacing=(0.8, 0.8, 2.5))
    assert loader.supports_memory_io("v.nii") and loader.supports_memory_io(
        "v.nii.gz"
    )
    assert not loader.supports_memory_io("v.nrrd")
    for ext in (".nii", ".nii.gz"):
        payload = loader.encode_image_bytes(img, ext)
        back = loader.load_input_bytes(payload, f"v{ext}")
        np.testing.assert_array_equal(back.array, arr)
        np.testing.assert_allclose(back.spacing, img.spacing, atol=1e-5)
    with pytest.raises(ValueError, match="in-memory"):
        loader.load_input_bytes(b"xx", "v.nrrd")
    with pytest.raises(ValueError, match="in-memory"):
        loader.encode_image_bytes(img, ".mha")


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_nifti_dtypes(tmp_path, dtype, rng):
    arr = rng.integers(0, 100, size=(2, 4, 4)).astype(dtype)
    p = str(tmp_path / "d.nii.gz")
    nifti.write(image.MedicalImage(arr), p)
    back = nifti.read(p)
    assert back.array.dtype == dtype
    np.testing.assert_array_equal(back.array, arr)


def test_nifti_qform_fallback(tmp_path, rng):
    """A header with qform only (sform_code=0) must reconstruct geometry from
    the quaternion."""
    import struct

    arr = rng.integers(0, 50, size=(2, 4, 6)).astype(np.int16)
    p = str(tmp_path / "q.nii")
    nifti.write(image.MedicalImage(arr, spacing=(1.5, 2.0, 3.0)), p)
    with open(p, "rb") as f:
        data = bytearray(f.read())
    # identity quaternion (b=c=d=0), qoffset matching LPS->RAS of origin (0,0,0)
    struct.pack_into("<2h", data, 252, 1, 0)  # qform=1, sform=0
    struct.pack_into("<3f", data, 256, 0.0, 0.0, 0.0)
    struct.pack_into("<3f", data, 268, 0.0, 0.0, 0.0)
    with open(p, "wb") as f:
        f.write(bytes(data))
    back = nifti.read(p)
    np.testing.assert_array_equal(back.array, arr)
    np.testing.assert_allclose(back.spacing, (1.5, 2.0, 3.0))
    # RAS identity quaternion = LPS direction diag(-1,-1,1)
    np.testing.assert_allclose(back.direction, np.diag([-1.0, -1.0, 1.0]))


def test_nifti_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.nii")
    with open(p, "wb") as f:
        f.write(b"\x00" * 500)
    with pytest.raises(ValueError):
        nifti.read(p)


def _write_nifti1_be(path, arr, srow):
    """Big-endian NIfTI-1 fixture: same layout as nifti.write but all fields
    and voxels byteswapped (the reference's ITK reader accepts BE NIfTI-1,
    /root/reference/lungmask/utils.py:244-249)."""
    import struct

    nz, ny, nx = arr.shape
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, nx, ny, nz, 1, 1, 1, 1)
    code = {np.dtype(np.int16): 4, np.dtype(np.uint8): 2}[arr.dtype]
    struct.pack_into(">2h", hdr, 70, code, arr.dtype.itemsize * 8)
    struct.pack_into(">8f", hdr, 76, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into(">f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into(">2f", hdr, 112, 1.0, 0.0)  # scl
    struct.pack_into(">2h", hdr, 252, 0, 1)  # qform=0, sform=1
    struct.pack_into(">12f", hdr, 280, *srow.reshape(-1))
    hdr[344:348] = b"n+1\x00"
    with open(path, "wb") as f:
        f.write(bytes(hdr) + b"\x00" * 4 + arr.byteswap().tobytes())


def _write_nifti2(path, arr, srow, bo):
    """NIfTI-2 fixture (540-byte header, 64-bit dims/offsets, double affine)
    in the requested byte order."""
    import struct

    nz, ny, nx = arr.shape
    hdr = bytearray(540)
    struct.pack_into(f"{bo}i", hdr, 0, 540)
    hdr[4:8] = b"n+2\x00"
    hdr[8:12] = b"\r\n\x1a\n"
    code = {np.dtype(np.int16): 4, np.dtype(np.uint8): 2}[arr.dtype]
    struct.pack_into(f"{bo}2h", hdr, 12, code, arr.dtype.itemsize * 8)
    struct.pack_into(f"{bo}8q", hdr, 16, 3, nx, ny, nz, 1, 1, 1, 1)
    struct.pack_into(f"{bo}8d", hdr, 104, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into(f"{bo}q", hdr, 168, 544)  # vox_offset
    struct.pack_into(f"{bo}2d", hdr, 176, 1.0, 0.0)  # scl
    struct.pack_into(f"{bo}2i", hdr, 344, 0, 1)  # qform=0, sform=1
    struct.pack_into(f"{bo}12d", hdr, 400, *srow.reshape(-1))
    vox = arr.byteswap() if bo == ">" else arr
    with open(path, "wb") as f:
        f.write(bytes(hdr) + b"\x00" * 4 + vox.tobytes())


def test_nifti_big_endian(tmp_path, rng):
    """BE NIfTI-1 reads identically to the LE file with the same content."""
    arr = rng.integers(-1024, 600, size=(3, 7, 5)).astype(np.int16)
    img = image.MedicalImage(
        arr, spacing=(0.6, 0.7, 2.0), origin=(-100.0, 50.0, 30.0)
    )
    le = str(tmp_path / "le.nii")
    nifti.write(img, le)
    # srow of the LE file (RAS) — reuse it verbatim in the BE fixture.
    import struct

    with open(le, "rb") as f:
        srow = np.array(
            struct.unpack_from("<12f", f.read(), 280), dtype=np.float64
        ).reshape(3, 4)
    be = str(tmp_path / "be.nii")
    _write_nifti1_be(be, arr, srow.astype(np.float32))
    a, b = nifti.read(le), nifti.read(be)
    np.testing.assert_array_equal(b.array, a.array)
    assert b.array.dtype == np.int16 and b.array.dtype.isnative
    np.testing.assert_allclose(b.spacing, a.spacing, atol=1e-5)
    np.testing.assert_allclose(b.origin, a.origin, atol=1e-4)
    np.testing.assert_allclose(b.direction, a.direction, atol=1e-5)


@pytest.mark.parametrize("bo", ["<", ">"])
def test_nifti2_read(tmp_path, bo, rng):
    """NIfTI-2 (sizeof_hdr 540, magic n+2) in both byte orders."""
    arr = rng.integers(-1024, 600, size=(4, 6, 8)).astype(np.int16)
    # RAS identity affine with spacing (1.3, 0.9, 2.5), origin RAS (4, -7, 9)
    srow = np.array(
        [[1.3, 0, 0, 4.0], [0, 0.9, 0, -7.0], [0, 0, 2.5, 9.0]], np.float64
    )
    p = str(tmp_path / "v2.nii")
    _write_nifti2(p, arr, srow, bo)
    back = nifti.read(p)
    np.testing.assert_array_equal(back.array, arr)
    np.testing.assert_allclose(back.spacing, (1.3, 0.9, 2.5), atol=1e-12)
    np.testing.assert_allclose(back.origin, (-4.0, 7.0, 9.0), atol=1e-12)  # LPS
    np.testing.assert_allclose(back.direction, np.diag([-1.0, -1.0, 1.0]))


def test_nifti2_loader_dispatch(tmp_path, rng):
    """NIfTI-2 files load through the public loader path too."""
    arr = rng.integers(0, 9, size=(2, 4, 4)).astype(np.uint8)
    srow = np.diag([1.0, 1.0, 1.0]).astype(np.float64)
    srow = np.concatenate([srow, np.zeros((3, 1))], axis=1)
    p = str(tmp_path / "v2.nii")
    _write_nifti2(p, arr, srow, "<")
    back = loader.load_input_image(p)
    np.testing.assert_array_equal(back.array, arr)


def test_dicom_rejects_truncated(tmp_path):
    p = str(tmp_path / "bad.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 10)
    with pytest.raises(Exception):
        dicom.read_file(p)


def test_dicom_rejects_compressed_syntax(tmp_path, rng):
    arr = rng.integers(0, 10, size=(8, 8)).astype(np.int16)
    p = str(tmp_path / "c.dcm")
    dicom.write_slice(p, arr)
    data = bytearray(open(p, "rb").read())
    # swap the transfer syntax UID bytes for a JPEG one (same length trick:
    # overwrite in place where the explicit LE UID string sits)
    idx = data.find(b"1.2.840.10008.1.2.1")
    data[idx : idx + 19] = b"1.2.840.10008.1.2.4"
    with open(p, "wb") as f:
        f.write(bytes(data))
    with pytest.raises(dicom.DicomError, match="transfer syntax"):
        dicom.read_file(p)


@pytest.mark.parametrize(
    "uid",
    [
        "1.2.840.10008.1.2.4.201",
        "1.2.840.10008.1.2.4.202",
        "1.2.840.10008.1.2.4.203",
    ],
)
def test_dicom_htj2k_syntaxes_decode(tmp_path, uid, rng):
    """All three HTJ2K transfer syntaxes decode through the native HT
    cleanup-pass block decoder (csrc/jpeg2000.cpp HTDec). The stream is
    written as .201 then relabeled — the codestream itself is identical
    across the three UIDs; .203 additionally logs a lossy-permitted
    warning (it is the only HTJ2K syntax whose UID does not guarantee
    lossless coding)."""
    arr = rng.integers(-1024, 3072, size=(32, 48)).astype(np.int16)
    p = str(tmp_path / "ht.dcm")
    dicom.write_slice(p, arr, transfer_syntax="1.2.840.10008.1.2.4.201")
    if uid != "1.2.840.10008.1.2.4.201":
        data = bytearray(open(p, "rb").read())
        idx = data.find(b"1.2.840.10008.1.2.4.201")
        assert idx >= 0
        data[idx : idx + 23] = uid.encode()
        with open(p, "wb") as f:
            f.write(bytes(data))
    df = dicom.read_file(p)
    assert np.array_equal(df.pixels, arr)


@pytest.mark.parametrize("compressed", [False, True])
def test_nrrd_roundtrip(tmp_path, compressed, rng):
    from lungmask_tpu.io import nrrd

    arr = rng.integers(-1024, 600, size=(4, 9, 7)).astype(np.int16)
    img = image.MedicalImage(
        arr,
        spacing=(0.6, 0.7, 2.0),
        origin=(-10.0, 5.0, 3.0),
        direction=np.diag([-1.0, 1.0, 1.0]),
    )
    p = str(tmp_path / "vol.nrrd")
    nrrd.write(img, p, compressed=compressed)
    back = nrrd.read(p)
    np.testing.assert_array_equal(back.array, arr)
    np.testing.assert_allclose(back.spacing, img.spacing)
    np.testing.assert_allclose(back.origin, img.origin)
    np.testing.assert_allclose(back.direction, img.direction)


@pytest.mark.parametrize("byte_skip", [0, 7, -1])
def test_nrrd_detached_header(tmp_path, rng, byte_skip):
    """ITK writes detached .nhdr + .raw pairs; the reader must follow the
    ``data file`` field, honoring byte skip (incl. the raw-only -1 tail)."""
    from lungmask_tpu.io import loader

    arr = rng.integers(-1024, 600, size=(3, 6, 5)).astype(np.int16)
    nz, ny, nx = arr.shape
    prefix = b"\x55" * byte_skip if byte_skip > 0 else b"\x55" * 3
    (tmp_path / "vol.raw").write_bytes(
        (prefix if byte_skip != 0 else b"") + arr.tobytes()
    )
    header = "\n".join(
        [
            "NRRD0004",
            "type: int16",
            "dimension: 3",
            f"sizes: {nx} {ny} {nz}",
            "encoding: raw",
            "endian: little",
            "data file: vol.raw",
        ]
        + ([f"byte skip: {byte_skip}"] if byte_skip else [])
    )
    p = str(tmp_path / "vol.nhdr")
    # Detached headers routinely end without a blank line — no terminator.
    (tmp_path / "vol.nhdr").write_bytes(header.encode() + b"\n")
    back = loader.load_input_image(p)
    np.testing.assert_array_equal(back.array, arr)


@pytest.mark.parametrize("compressed", [False, True])
def test_nhdr_write_roundtrip(tmp_path, compressed, rng):
    """Writing a .nhdr produces a detached header + <base>.raw[.gz] pair that
    our own reader (and therefore ITK's) loads back voxel-identical."""
    from lungmask_tpu.io import nrrd

    arr = rng.integers(-1024, 600, size=(4, 6, 5)).astype(np.int16)
    img = image.MedicalImage(
        arr, spacing=(0.6, 0.7, 2.0), origin=(-10.0, 5.0, 3.0)
    )
    p = str(tmp_path / "vol.nhdr")
    nrrd.write(img, p, compressed=compressed)
    assert (tmp_path / ("vol.raw.gz" if compressed else "vol.raw")).exists()
    back = loader.load_input_image(p)
    np.testing.assert_array_equal(back.array, arr)
    np.testing.assert_allclose(back.spacing, img.spacing)
    np.testing.assert_allclose(back.origin, img.origin)


@pytest.mark.parametrize("compressed", [False, True])
def test_mhd_detached_roundtrip(tmp_path, compressed, rng):
    arr = rng.integers(-500, 500, size=(3, 6, 5)).astype(np.int16)
    img = image.MedicalImage(arr, spacing=(0.5, 0.6, 1.0), origin=(1.0, 2.0, 3.0))
    p = str(tmp_path / "vol.mhd")
    mha.write(img, p, compressed=compressed)
    assert (tmp_path / ("vol.zraw" if compressed else "vol.raw")).exists()
    back = mha.read(p)
    np.testing.assert_array_equal(back.array, arr)
    np.testing.assert_allclose(back.spacing, img.spacing)


@pytest.mark.parametrize("compressed", [False, True])
def test_mha_roundtrip(tmp_path, compressed, rng):
    arr = rng.integers(-1024, 600, size=(4, 8, 6)).astype(np.int16)
    img = image.MedicalImage(arr, spacing=(0.5, 0.5, 1.5), origin=(1.0, 2.0, 3.0))
    p = str(tmp_path / "vol.mha")
    mha.write(img, p, compressed=compressed)
    back = mha.read(p)
    np.testing.assert_array_equal(back.array, arr)
    np.testing.assert_allclose(back.spacing, img.spacing)
    np.testing.assert_allclose(back.origin, img.origin)


# ---------------------------------------------------------------------------
# DICOM
# ---------------------------------------------------------------------------


def _write_series(dirpath, rng, n_slices=3, series_uid=None, extra_per_slice=None):
    series_uid = series_uid or dicom.generate_uid()
    study_uid = dicom.generate_uid()
    arrays = []
    for i in range(n_slices):
        arr = rng.integers(-1000, 500, size=(32, 32)).astype(np.int16)
        arrays.append(arr)
        tags = dict(extra_per_slice or {})
        dicom.write_slice(
            str(dirpath / f"slice{i}.dcm"),
            arr,
            series_uid=series_uid,
            study_uid=study_uid,
            position=(0.0, 0.0, float(i) * 2.0),
            spacing=(0.7, 0.7),
            tags=tags,
        )
    return np.stack(arrays), series_uid


def test_dicom_write_read_roundtrip(tmp_path, rng):
    arr = rng.integers(-1000, 500, size=(16, 24)).astype(np.int16)
    p = str(tmp_path / "a.dcm")
    dicom.write_slice(p, arr, position=(1.0, 2.0, 3.0))
    f = dicom.read_file(p)
    np.testing.assert_array_equal(f.pixels, arr)
    assert f.position == (1.0, 2.0, 3.0)
    assert f.image_type == ["ORIGINAL", "PRIMARY", "AXIAL"]
    hdr = dicom.read_file(p, stop_before_pixels=True)
    assert hdr.pixels is None
    assert hdr.series_uid == f.series_uid


def test_dicom_deflated_roundtrip(tmp_path, rng):
    """Deflated Explicit VR LE (1.2.840.10008.1.2.1.99): the post-meta dataset
    is one raw-deflate stream (PS3.10 A.5)."""
    arr = rng.integers(-1024, 600, size=(16, 24)).astype(np.int16)
    p = str(tmp_path / "d.dcm")
    dicom.write_slice(
        p, arr, position=(1.0, 2.0, 3.0),
        transfer_syntax=dicom.DEFLATED_EXPLICIT_VR_LE,
    )
    # the on-disk dataset really is compressed: pixel bytes must not appear
    assert arr.tobytes() not in open(p, "rb").read()
    f = dicom.read_file(p)
    np.testing.assert_array_equal(f.pixels, arr)
    assert f.position == (1.0, 2.0, 3.0)
    hdr = dicom.read_file(p, stop_before_pixels=True)
    assert hdr.pixels is None and hdr.series_uid == f.series_uid


def test_dicom_deflated_corrupt_stream_raises(tmp_path, rng):
    arr = rng.integers(0, 100, size=(8, 8)).astype(np.int16)
    p = str(tmp_path / "d.dcm")
    dicom.write_slice(p, arr, transfer_syntax=dicom.DEFLATED_EXPLICIT_VR_LE)
    data = open(p, "rb").read()
    # locate the end of the file meta group: the last meta element's value is
    # the implementation-class UID; the deflate stream starts right after it
    impl_uid = f"{dicom._UID_ROOT}.1".encode()
    start = data.rfind(impl_uid) + len(impl_uid) + (len(impl_uid) % 2)
    with open(p, "wb") as f:
        # stored-block header with LEN=0, NLEN=0: NLEN fails its ones'-
        # complement check, so inflate reports an invalid stream
        f.write(data[:start] + b"\x00\x00\x00\x00\x00")
    with pytest.raises(dicom.DicomError):
        dicom.read_file(p)


def test_dicom_big_endian_roundtrip(tmp_path, rng):
    """Explicit VR Big Endian (1.2.840.10008.1.2.2, retired): tags, lengths,
    US values and pixel words are all byte-swapped."""
    arr = rng.integers(-1024, 600, size=(16, 24)).astype(np.int16)
    p = str(tmp_path / "b.dcm")
    dicom.write_slice(
        p, arr, position=(4.0, 5.0, 6.0), rescale=(1.0, -1024.0),
        transfer_syntax=dicom.EXPLICIT_VR_BE,
    )
    # stored pixel words really are big-endian
    assert arr.astype(">i2").tobytes() in open(p, "rb").read()
    f = dicom.read_file(p)
    np.testing.assert_array_equal(
        f.pixels, arr.astype(np.int32) - 1024
    )
    assert f.position == (4.0, 5.0, 6.0)
    assert f.get("0028|0010") == "16"  # byte-swapped US Rows decoded right


def test_dicom_big_endian_series_scan(tmp_path, rng):
    """A BE series groups/sorts like an LE one through the scanner."""
    uid = "7.8.9"
    for z in range(3):
        dicom.write_slice(
            str(tmp_path / f"s{z}.dcm"),
            rng.integers(0, 50, size=(8, 8)).astype(np.int16),
            series_uid=uid, study_uid="1.2.3", position=(0.0, 0.0, float(z)),
            transfer_syntax=dicom.EXPLICIT_VR_BE,
        )
    series = dicom.scan_directory(str(tmp_path), disable_tqdm=True)
    assert len(series) == 1 and len(series[0]) == 3
    assert [s.position[2] for s in series[0]] == [0.0, 1.0, 2.0]


def test_dicom_rescale_applied(tmp_path, rng):
    raw = rng.integers(0, 3000, size=(8, 8)).astype(np.int16)
    p = str(tmp_path / "r.dcm")
    dicom.write_slice(p, raw, rescale=(1.0, -1024.0))
    f = dicom.read_file(p)
    np.testing.assert_array_equal(f.pixels, raw.astype(np.int32) - 1024)
    assert f.pixels.dtype == np.int16


def test_scan_directory_grouping_and_sorting(tmp_path, rng):
    vol, uid = _write_series(tmp_path, rng, n_slices=4)
    # an unrelated localizer that must be filtered out
    dicom.write_slice(
        str(tmp_path / "loc.dcm"),
        np.zeros((8, 8), dtype=np.int16),
        image_type="ORIGINAL\\PRIMARY\\LOCALIZER",
    )
    # a non-DICOM file that must be skipped gracefully
    (tmp_path / "notes.txt").write_text("not a dicom")
    volumes = dicom.scan_directory(str(tmp_path))
    assert len(volumes) == 1
    zs = [s.position[2] for s in volumes[0]]
    assert zs == sorted(zs)
    assert len(volumes[0]) == 4


def test_scan_directory_dedupes(tmp_path, rng):
    import shutil

    _write_series(tmp_path, rng, n_slices=2)
    files = sorted(str(p) for p in tmp_path.glob("*.dcm"))
    shutil.copy(files[0], str(tmp_path / "dup_of_first.dcm"))
    volumes = dicom.scan_directory(str(tmp_path))
    assert len(volumes) == 1
    assert len(volumes[0]) == 2


def test_read_dicoms_volume_assembly(tmp_path, rng):
    vol, _ = _write_series(tmp_path, rng, n_slices=3)
    images = loader.read_dicoms(str(tmp_path), read_metadata=True)
    assert len(images) == 1
    img = images[0]
    assert img.size == (32, 32, 3)
    np.testing.assert_array_equal(img.array, vol)
    assert img.spacing == (0.7, 0.7, 2.0)
    assert img.orientation() == "LPS"
    assert "0020|000d" in img.metadata


def test_load_input_image_largest_series_wins(tmp_path, rng):
    _write_series(tmp_path, rng, n_slices=2)
    big, _ = _write_series(tmp_path, rng, n_slices=5)
    img = loader.load_input_image(str(tmp_path))
    assert img.size[2] == 5
    np.testing.assert_array_equal(img.array, big)


def test_load_input_image_file(tmp_path, rng):
    arr = rng.integers(-500, 500, size=(3, 8, 8)).astype(np.int16)
    p = str(tmp_path / "x.nii.gz")
    nifti.write(image.MedicalImage(arr), p)
    img = loader.load_input_image(p)
    np.testing.assert_array_equal(img.array, arr)


def test_write_dicom_series_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 4, size=(3, 32, 32)).astype(np.uint8)
    img = image.MedicalImage(
        arr,
        spacing=(0.7, 0.7, 2.5),
        origin=(1.0, 2.0, 3.0),
        metadata={"0010|0010": "Test^Patient", "0020|000d": "1.2.3.4"},
    )
    out = str(tmp_path / "mask.dcm")
    loader.write_image(img, out)
    files = sorted(tmp_path.glob("mask_*.dcm"))
    assert len(files) == 3
    back = loader.read_dicoms(str(tmp_path), read_metadata=True)[0]
    np.testing.assert_array_equal(back.array, arr.astype(np.int16))
    assert back.spacing == (0.7, 0.7, 2.5)
    assert back.metadata["0010|0010"] == "Test^Patient"
    assert back.metadata["0020|000d"] == "1.2.3.4"


def test_load_input_image_exits_on_empty_dir(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(SystemExit):
        loader.load_input_image(str(tmp_path / "empty"))


# ---------------------------------------------------------------------------
# Reference test data (real DICOMs from the upstream repo, when present)
# ---------------------------------------------------------------------------

needs_refdata = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_TESTDATA), reason="reference testdata not mounted"
)


@needs_refdata
def test_reference_testdata_series():
    vols = loader.read_dicoms(REFERENCE_TESTDATA, read_metadata=True)
    assert len(vols) == 1
    img = vols[0]
    assert img.size == (512, 512, 2)
    assert img.array.dtype in (np.int16, np.int32)
    # CT HU range sanity
    assert img.array.min() >= -3000 and img.array.max() < 4000
    # the 12-tag keep list must be resolvable from the metadata we expose
    present = [k for k in loader.DICOM_METADATA_TO_KEEP if k in img.metadata]
    assert "0020|000d" in img.metadata  # StudyInstanceUID at minimum


@needs_refdata
def test_reference_testdata_load_input_image():
    img = loader.load_input_image(REFERENCE_TESTDATA, read_metadata=True)
    assert img.size == (512, 512, 2)


# ---------------------------------------------------------------------------
# ADVICE round-1 regressions: headerless VR sniffing, photometric guard,
# packed-bit sign extension, CRLF NRRD headers
# ---------------------------------------------------------------------------


def _implicit_elem(group, elem, value):
    import struct

    if len(value) % 2:
        value += b"\x00"
    return struct.pack("<HHI", group, elem, len(value)) + value


def test_dicom_headerless_implicit_vr(tmp_path):
    """A file with no preamble/meta and implicit-VR body must parse via the
    VR-sniff fallback (pydicom force=True analogue)."""
    arr = np.arange(16, dtype=np.int16).reshape(4, 4)
    body = b"".join(
        [
            _implicit_elem(0x0008, 0x0008, b"ORIGINAL\\PRIMARY\\AXIAL"),
            _implicit_elem(0x0020, 0x000D, b"1.2.3"),
            _implicit_elem(0x0020, 0x000E, b"1.2.3.4"),
            _implicit_elem(0x0028, 0x0002, np.uint16(1).tobytes()),
            _implicit_elem(0x0028, 0x0010, np.uint16(4).tobytes()),
            _implicit_elem(0x0028, 0x0011, np.uint16(4).tobytes()),
            _implicit_elem(0x0028, 0x0100, np.uint16(16).tobytes()),
            _implicit_elem(0x0028, 0x0103, np.uint16(1).tobytes()),
            _implicit_elem(0x7FE0, 0x0010, arr.tobytes()),
        ]
    )
    p = str(tmp_path / "implicit_headerless.dcm")
    with open(p, "wb") as f:
        f.write(body)
    parsed = dicom.read_file(p)
    assert parsed.series_uid == "1.2.3.4"
    np.testing.assert_array_equal(parsed.pixels, arr)


def test_dicom_headerless_explicit_vr(tmp_path, rng):
    """Strip preamble + file meta off a written slice: the explicit-VR body
    must still be sniffed and parsed."""
    arr = rng.integers(-1000, 500, size=(6, 6)).astype(np.int16)
    p = str(tmp_path / "full.dcm")
    dicom.write_slice(p, arr, series_uid="9.8.7")
    data = open(p, "rb").read()
    # Body starts at the first group-0008 element after the meta group.
    import struct

    pos = 132
    while struct.unpack_from("<H", data, pos)[0] == 0x0002:
        g, e, vr, voff, vlen, _ = dicom._read_element(
            memoryview(data), pos, explicit=True
        )
        pos = voff + vlen
    p2 = str(tmp_path / "headerless.dcm")
    with open(p2, "wb") as f:
        f.write(data[pos:])
    parsed = dicom.read_file(p2)
    assert parsed.series_uid == "9.8.7"
    np.testing.assert_array_equal(parsed.pixels, arr)


def test_dicom_monochrome1_rejected(tmp_path, rng):
    arr = rng.integers(0, 100, size=(4, 4)).astype(np.int16)
    p = str(tmp_path / "mono1.dcm")
    dicom.write_slice(p, arr, tags={(0x0028, 0x0004): "MONOCHROME1"})
    with pytest.raises(dicom.DicomError, match="PhotometricInterpretation"):
        dicom.read_file(p)


def test_dicom_packed_bits_sign_extension(tmp_path):
    """12-bits-stored signed data with garbage overlay bits must sign-extend
    to the true values."""
    true_vals = np.array([[-100, -1], [0, 2047]], dtype=np.int16)
    packed = (true_vals.astype(np.uint16) & 0x0FFF) | 0xA000  # overlay garbage
    p = str(tmp_path / "packed.dcm")
    dicom.write_slice(
        p,
        packed.view(np.int16),
        tags={(0x0028, 0x0101): "12", (0x0028, 0x0102): "11"},
    )
    parsed = dicom.read_file(p)
    np.testing.assert_array_equal(parsed.pixels, true_vals)


def test_nrrd_crlf_header_with_payload_false_terminator(tmp_path):
    """CRLF-terminated header whose binary payload contains b'\\n\\n' — the
    old whole-buffer search found the payload bytes first."""
    from lungmask_tpu.io import nrrd

    arr = np.full((2, 3, 3), 0x0A0A, dtype=np.int16)  # payload bytes = \n\n...
    header = (
        "NRRD0004\r\n"
        "type: int16\r\n"
        "dimension: 3\r\n"
        "sizes: 3 3 2\r\n"
        "encoding: raw\r\n"
        "endian: little\r\n"
        "\r\n"
    )
    p = str(tmp_path / "crlf.nrrd")
    with open(p, "wb") as f:
        f.write(header.encode("ascii") + arr.tobytes())
    back = nrrd.read(p)
    np.testing.assert_array_equal(back.array, arr)


# ---------------------------------------------------------------------------
# Analyze 7.5 (.hdr/.img) and detached NIfTI pairs
# ---------------------------------------------------------------------------


def test_analyze_roundtrip(tmp_path, rng):
    from lungmask_tpu.io import analyze

    arr = rng.integers(-1024, 600, size=(3, 7, 5)).astype(np.int16)
    img = image.MedicalImage(arr, spacing=(0.7, 0.8, 2.5))
    p = str(tmp_path / "vol.hdr")
    analyze.write(img, p)
    back = analyze.read(p)
    np.testing.assert_array_equal(back.array, arr)
    np.testing.assert_allclose(back.spacing, img.spacing, rtol=1e-6)
    # Loading via the generic loader (by .img path too) must also work.
    np.testing.assert_array_equal(
        loader.load_input_image(str(tmp_path / "vol.img")).array, arr
    )


def test_analyze_gz_roundtrip(tmp_path, rng):
    """A .hdr.gz/.img.gz request gzips both halves of the pair (nibabel/ITK
    pairing convention) and round-trips through the generic loader."""
    import gzip as _gzip

    from lungmask_tpu.io import analyze

    arr = rng.integers(-1024, 600, size=(3, 5, 4)).astype(np.int16)
    img = image.MedicalImage(arr, spacing=(0.7, 0.8, 2.5))
    p = str(tmp_path / "vol.hdr.gz")
    analyze.write(img, p)
    assert (tmp_path / "vol.img.gz").exists()
    with _gzip.open(p, "rb") as f:  # really gzipped, not just named .gz
        assert len(f.read()) == 348
    back = loader.load_input_image(p)
    np.testing.assert_array_equal(back.array, arr)
    np.testing.assert_allclose(back.spacing, img.spacing, rtol=1e-6)


def test_analyze_write_ignores_stale_gz_neighbor(tmp_path, rng):
    """A stale .hdr.gz next to a plain .hdr request must not switch the
    output to gzip (the read-side existence probing must not leak in)."""
    from lungmask_tpu.io import analyze

    arr = rng.integers(0, 5, size=(2, 4, 4)).astype(np.int16)
    (tmp_path / "vol.hdr.gz").write_bytes(b"stale")
    p = str(tmp_path / "vol.hdr")
    analyze.write(image.MedicalImage(arr), p)
    with open(p, "rb") as f:
        assert len(f.read()) == 348  # plain header, not gzipped


def test_write_image_jpg_and_nhdr_dispatch(tmp_path, rng):
    """write_image dispatches the extensions the reference reaches through
    sitk.ImageFileWriter: .jpg (lossy, warned) and detached .nhdr."""
    mask = rng.integers(0, 3, size=(1, 16, 16)).astype(np.uint8)
    img = image.MedicalImage(mask)
    loader.write_image(img, str(tmp_path / "m.jpg"))
    assert (tmp_path / "m.jpg").exists()
    loader.write_image(img, str(tmp_path / "m.nhdr"))
    back = loader.load_input_image(str(tmp_path / "m.nhdr"))
    np.testing.assert_array_equal(back.array, mask)


def test_analyze_big_endian(tmp_path, rng):
    """Big-endian Analyze headers/data must be byte-swapped, not garbled."""
    from lungmask_tpu.io import analyze
    import struct

    arr = rng.integers(-500, 500, size=(2, 4, 4)).astype(np.int16)
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 4, 4, 2, 1, 1, 1, 1)
    struct.pack_into(">2h", hdr, 70, 4, 16)
    struct.pack_into(">8f", hdr, 76, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    (tmp_path / "be.hdr").write_bytes(bytes(hdr))
    (tmp_path / "be.img").write_bytes(arr.astype(">i2").tobytes())
    back = analyze.read(str(tmp_path / "be.hdr"))
    np.testing.assert_array_equal(back.array, arr)


def test_analyze_rejects_flipped_orient(tmp_path, rng):
    from lungmask_tpu.io import analyze
    import struct

    arr = np.zeros((1, 2, 2), dtype=np.int16)
    img = image.MedicalImage(arr)
    p = str(tmp_path / "f.hdr")
    analyze.write(img, p)
    data = bytearray(open(p, "rb").read())
    data[252] = 3  # coronal flipped
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="orient"):
        analyze.read(p)


def test_nifti_detached_pair(tmp_path, rng):
    """NIfTI 'ni1' magic: header in .hdr, voxels in sibling .img."""
    arr = rng.integers(-100, 100, size=(2, 6, 4)).astype(np.int16)
    img = image.MedicalImage(arr, spacing=(1.0, 1.0, 1.0))
    nii = str(tmp_path / "v.nii")
    nifti.write(img, nii)
    data = bytearray(open(nii, "rb").read())
    hdr = data[:348]
    hdr[344:348] = b"ni1\x00"
    import struct as _s
    _s.pack_into("<f", hdr, 108, 0.0)  # vox_offset 0 in the detached file
    (tmp_path / "v.hdr").write_bytes(bytes(hdr))
    (tmp_path / "v.img").write_bytes(bytes(data[352:]))
    back = loader.load_input_image(str(tmp_path / "v.hdr"))
    np.testing.assert_array_equal(back.array, arr)


def test_raster_image_input(tmp_path):
    """PNG/JPEG/BMP inputs load as single-slice volumes with raw stored
    values (reference reads them via sitk.ImageFileReader,
    /root/reference/lungmask/utils.py:247-249); 16-bit PNG keeps depth."""
    from PIL import Image

    from lungmask_tpu.io import loader

    arr8 = (np.arange(64 * 48).reshape(48, 64) % 251).astype(np.uint8)
    p8 = str(tmp_path / "s.png")
    Image.fromarray(arr8, mode="L").save(p8)
    img = loader.load_input_image(p8)
    assert img.array.shape == (1, 48, 64)
    np.testing.assert_array_equal(img.array[0], arr8)

    arr16 = (np.arange(32 * 32).reshape(32, 32) * 40).astype(np.uint16)
    p16 = str(tmp_path / "s16.png")
    Image.fromarray(arr16).save(p16)
    img16 = loader.load_input_image(p16)
    np.testing.assert_array_equal(img16.array[0], arr16.astype(img16.array.dtype))

    # round-trip a mask through the raster writer
    from lungmask_tpu.io.image import MedicalImage

    mask = (arr8 > 128).astype(np.uint8)[None]
    out = str(tmp_path / "m.png")
    loader.write_image(MedicalImage(mask), out)
    back = loader.load_input_image(out)
    np.testing.assert_array_equal(back.array, mask)

    with pytest.raises(ValueError, match="one slice"):
        loader.write_image(MedicalImage(np.zeros((2, 8, 8), np.uint8)), out)


@pytest.mark.parametrize("ext", ["vtk", "gipl"])
def test_vtk_gipl_roundtrip(tmp_path, rng, ext):
    """Legacy VTK structured points and GIPL (both ITK-supported formats)
    round-trip voxels, spacing and origin; neither carries a direction."""
    from lungmask_tpu.io import loader
    from lungmask_tpu.io.image import MedicalImage

    arr = rng.integers(-1024, 600, size=(4, 6, 5)).astype(np.int16)
    img = MedicalImage(arr, spacing=(0.7, 0.8, 2.5), origin=(1.0, -2.0, 3.0))
    p = str(tmp_path / f"v.{ext}")
    loader.write_image(img, p)
    back = loader.load_input_image(p)
    np.testing.assert_array_equal(back.array, arr)
    np.testing.assert_allclose(back.spacing, img.spacing, rtol=1e-6)
    np.testing.assert_allclose(back.origin, img.origin, rtol=1e-6)

    with pytest.raises(ValueError, match="direction"):
        loader.write_image(
            MedicalImage(arr, direction=np.diag([-1.0, 1.0, 1.0])), p
        )


def test_vtk_ascii_payload(tmp_path):
    from lungmask_tpu.io import loader

    arr = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(np.int16)
    body = " ".join(str(v) for v in arr.ravel())
    text = (
        "# vtk DataFile Version 3.0\ntitle\nASCII\n"
        "DATASET STRUCTURED_POINTS\nDIMENSIONS 4 3 2\nSPACING 1 1 2\n"
        "ORIGIN 0 0 0\nPOINT_DATA 24\nSCALARS scalars short 1\n"
        "LOOKUP_TABLE default\n" + body + "\n"
    )
    p = str(tmp_path / "a.vtk")
    with open(p, "w") as f:
        f.write(text)
    back = loader.load_input_image(p)
    np.testing.assert_array_equal(back.array, arr)
    assert back.spacing == (1.0, 1.0, 2.0)


def test_nrrd_byteskip_alt_spelling(tmp_path, rng):
    """'byteskip' (no space) is as valid as 'byte skip' — both spellings must
    honor the prefix skip and the raw-only -1 tail form."""
    from lungmask_tpu.io import loader

    arr = rng.integers(-1024, 600, size=(2, 4, 3)).astype(np.int16)
    (tmp_path / "vol.raw").write_bytes(b"\x55" * 9 + arr.tobytes())
    for spelling, value in [("byteskip", "9"), ("byteskip", "-1")]:
        header = (
            "NRRD0004\ntype: int16\ndimension: 3\nsizes: 3 4 2\n"
            f"encoding: raw\nendian: little\ndata file: vol.raw\n{spelling}: {value}\n"
        )
        (tmp_path / "vol.nhdr").write_bytes(header.encode())
        back = loader.load_input_image(str(tmp_path / "vol.nhdr"))
        np.testing.assert_array_equal(back.array, arr)


def test_vtk_missing_lookup_table(tmp_path):
    """LOOKUP_TABLE is optional in the legacy VTK spec; binary payloads with
    no newline after SCALARS must still load."""
    from lungmask_tpu.io import loader

    arr = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(np.int16)
    header = (
        "# vtk DataFile Version 3.0\nt\nBINARY\nDATASET STRUCTURED_POINTS\n"
        "DIMENSIONS 4 3 2\nSPACING 1 1 1\nORIGIN 0 0 0\nPOINT_DATA 24\n"
        "SCALARS scalars short 1\n"
    )
    p = str(tmp_path / "nolut.vtk")
    with open(p, "wb") as f:
        f.write(header.encode())
        f.write(arr.astype(">i2").tobytes())
    back = loader.load_input_image(p)
    np.testing.assert_array_equal(back.array, arr)


def test_vtk_gipl_truncated_payload_message(tmp_path):
    from lungmask_tpu.io import gipl, loader
    from lungmask_tpu.io.image import MedicalImage

    arr = np.ones((2, 3, 4), np.int16)
    p = str(tmp_path / "t.gipl")
    gipl.write(MedicalImage(arr), p)
    data = open(p, "rb").read()
    open(p, "wb").write(data[:-10])
    with pytest.raises(ValueError, match="truncated"):
        loader.load_input_image(p)


def test_mha_big_endian_and_headersize(tmp_path, rng):
    """BinaryDataByteOrderMSB=True byteswaps; HeaderSize skips a data-file
    prefix (MetaIO spec fields ITK honors)."""
    from lungmask_tpu.io import loader

    arr = rng.integers(-1024, 600, size=(2, 4, 3)).astype(np.int16)
    raw = tmp_path / "v.raw"
    raw.write_bytes(b"\x42" * 16 + arr.astype(">i2").tobytes())
    (tmp_path / "v.mhd").write_text(
        "ObjectType = Image\nNDims = 3\nDimSize = 3 4 2\n"
        "ElementType = MET_SHORT\nBinaryDataByteOrderMSB = True\n"
        "HeaderSize = 16\nElementDataFile = v.raw\n"
    )
    back = loader.load_input_image(str(tmp_path / "v.mhd"))
    np.testing.assert_array_equal(back.array, arr)


def test_nifti_scl_slope_zero_ignored(tmp_path, rng):
    """NIfTI-1: scl_slope == 0 disables scaling entirely (intercept too)."""
    from lungmask_tpu.io import loader, nifti
    from lungmask_tpu.io.image import MedicalImage

    arr = rng.integers(-1024, 600, size=(2, 4, 3)).astype(np.int16)
    p = str(tmp_path / "v.nii")
    nifti.write(MedicalImage(arr), p)
    data = bytearray(open(p, "rb").read())
    import struct as _s

    _s.pack_into("<2f", data, 112, 0.0, -1024.0)  # slope=0, inter=-1024
    open(p, "wb").write(bytes(data))
    back = loader.load_input_image(p)
    np.testing.assert_array_equal(back.array, arr)  # NOT shifted by -1024


def test_nohu_multipage_tiff_and_natural_sort(tmp_path):
    from PIL import Image

    from lungmask_tpu.io import nohu

    frames = [
        Image.fromarray(np.full((8, 8), v, np.uint8), mode="L")
        for v in (10, 20, 30)
    ]
    p = str(tmp_path / "stack.tif")
    frames[0].save(p, save_all=True, append_images=frames[1:])
    img = nohu.load_image_stack([p])
    assert img.array.shape == (3, 8, 8)

    d = tmp_path / "slices"
    d.mkdir()
    for i, v in [(1, 1), (2, 2), (10, 10), (11, 11)]:
        Image.fromarray(np.full((4, 4), v, np.uint8), mode="L").save(
            str(d / f"slice{i}.png")
        )
    vol = nohu.load_image_directory(str(d))
    # natural order 1, 2, 10, 11 — lexicographic would give 1, 10, 11, 2
    order = [int(v) for v in np.round((vol.array[:, 0, 0] + 1024) / 1624 * 255)]
    assert order == [1, 2, 10, 11]


# ---------------------------------------------------------------------------
# Malformed-tag tolerance and output-metadata hygiene (round-3 review fixes)
# ---------------------------------------------------------------------------


def test_scan_survives_malformed_image_position(tmp_path, rng):
    """One file with a non-numeric ImagePositionPatient must not crash the
    directory z-sort; it sorts with a neutral position instead."""
    _write_series(tmp_path, rng, n_slices=3)
    bad = str(tmp_path / "bad_ipp.dcm")
    dicom.write_slice(
        bad,
        np.zeros((32, 32), dtype=np.int16),
        tags={(0x0020, 0x0032): "1.0\\2.0\\abc"},
    )
    volumes = dicom.scan_directory(str(tmp_path))
    assert sum(len(v) for v in volumes) == 4  # nothing dropped, no crash
    assert dicom.read_file(bad, stop_before_pixels=True).position is None


def test_read_file_translates_value_errors(tmp_path):
    """Corrupt tag values that fail int()/float() must surface as DicomError
    (the documented one-type contract), not raw ValueError."""
    p = str(tmp_path / "zero_rows.dcm")
    dicom.write_slice(p, np.zeros((8, 8), dtype=np.int16))
    data = bytearray(open(p, "rb").read())
    # Blank out the Rows value ("8" + pad) with spaces -> int('') ValueError.
    marker = bytes.fromhex("28001000")  # (0028,0010) little-endian
    i = data.find(marker)
    assert i > 0
    vlen = int.from_bytes(data[i + 6 : i + 8], "little")
    data[i + 8 : i + 8 + vlen] = b" " * vlen
    open(p, "wb").write(bytes(data))
    with pytest.raises(dicom.DicomError):
        dicom.read_file(p)


def test_malformed_pixel_spacing_defaults(tmp_path, rng, caplog):
    """A single-valued PixelSpacing must not IndexError volume assembly."""
    _write_series(tmp_path, rng, n_slices=2, extra_per_slice={(0x0028, 0x0030): "0.7"})
    images = loader.read_dicoms(str(tmp_path))
    assert len(images) == 1
    assert images[0].spacing[:2] == (1.0, 1.0)  # fell back with a warning


def test_write_dicom_series_excludes_unsafe_metadata(tmp_path, rng):
    """Input-volume tags that write_slice recomputes (rescale, geometry,
    SOPInstanceUID, file-meta group) must not be copied into mask output —
    a copied RescaleIntercept=-1024 would corrupt every mask value."""
    vol, _ = _write_series(tmp_path, rng, n_slices=2)
    src = loader.read_dicoms(str(tmp_path), read_metadata=True)[0]

    meta = dict(src.metadata)
    # Simulate the dangerous tags a real CT input carries.
    meta["0028|1052"] = "-1024"  # RescaleIntercept: would shift mask values
    meta["0028|0100"] = "8"      # BitsAllocated: would corrupt pixel layout
    meta["0010|0010"] = "DOE^JANE"  # patient tag: MUST be carried
    mask = image.MedicalImage(
        array=(vol > 0).astype(np.int16),
        spacing=src.spacing,
        origin=src.origin,
        direction=src.direction,
        metadata=meta,
    )
    out = tmp_path / "out"
    out.mkdir()
    loader.write_dicom_series(mask, str(out / "mask.dcm"))
    back = loader.read_dicoms(str(out), read_metadata=True)[0]
    np.testing.assert_array_equal(back.array, mask.array)  # no stale rescale
    assert back.metadata.get("0010|0010") == "DOE^JANE"  # keep-tags carried
    files = sorted(out.glob("*.dcm"))
    sops = [dicom.read_file(str(f), stop_before_pixels=True).get("0008|0018")
            for f in files]
    assert len(set(sops)) == len(sops)  # SOPInstanceUID fresh per slice


def test_header_scan_prefix_fallback(tmp_path, rng):
    """A header larger than the prefix read (big private payload before the
    pixel data) must still scan completely via the full-read fallback."""
    # Short-VR elements cap at 64 KB, so several of them push the pixel-data
    # tag past the prefix window.
    n_big = dicom._HEADER_SCAN_BYTES // 60000 + 2
    big_tags = {(0x0009, i + 1): "X" * 60000 for i in range(n_big)}
    arr = rng.integers(-1000, 500, size=(16, 16)).astype(np.int16)
    p = str(tmp_path / "bighdr.dcm")
    dicom.write_slice(p, arr, tags={**big_tags, (0x0041, 0x0001): "after-the-big-one"})
    hdr = dicom.read_file(p, stop_before_pixels=True)
    assert hdr.get("0041|0001") == "after-the-big-one"
    full = dicom.read_file(p)
    np.testing.assert_array_equal(full.pixels, arr)


# ---------------------------------------------------------------------------
# Ancillary-format review fixes (round 3): NRRD line skip/spacings, MHA
# channels/latin-1, VTK whitespace, writable arrays, .hdr.gz dispatch
# ---------------------------------------------------------------------------


def test_nrrd_line_skip_honored(tmp_path, rng):
    from lungmask_tpu.io import nrrd

    arr = rng.integers(-1000, 500, size=(2, 3, 4)).astype(np.int16)
    (tmp_path / "d.raw").write_bytes(b"first line\nsecond\n" + arr.tobytes())
    (tmp_path / "v.nhdr").write_text(
        "NRRD0004\ntype: int16\ndimension: 3\nsizes: 4 3 2\n"
        "encoding: raw\nendian: little\nline skip: 2\ndata file: d.raw\n"
    )
    img = nrrd.read(str(tmp_path / "v.nhdr"))
    np.testing.assert_array_equal(img.array, arr)


def test_nrrd_spacings_and_axis_mins(tmp_path, rng):
    """teem-style per-axis `spacings`/`axis mins` (no space directions) must
    carry through instead of silently defaulting to unit geometry."""
    from lungmask_tpu.io import nrrd

    arr = rng.integers(0, 100, size=(2, 3, 4)).astype(np.int16)
    (tmp_path / "v.nrrd").write_bytes(
        b"NRRD0004\ntype: int16\ndimension: 3\nsizes: 4 3 2\n"
        b"encoding: raw\nendian: little\nspacings: 0.5 0.7 2.0\n"
        b"axis mins: 1.0 2.0 3.0\n\n" + arr.tobytes()
    )
    img = nrrd.read(str(tmp_path / "v.nrrd"))
    assert img.spacing == (0.5, 0.7, 2.0)
    assert img.origin == (1.0, 2.0, 3.0)


def test_nrrd_space_directions_any_whitespace(tmp_path, rng):
    from lungmask_tpu.io import nrrd

    arr = rng.integers(0, 100, size=(2, 3, 4)).astype(np.int16)
    (tmp_path / "v.nrrd").write_bytes(
        b"NRRD0004\ntype: int16\ndimension: 3\nsizes: 4 3 2\n"
        b"encoding: raw\nendian: little\n"
        b"space: left-posterior-superior\n"
        b"space directions: (0.7,0,0)  (0,0.7,0)\t(0,0,2.5)\n\n" + arr.tobytes()
    )
    img = nrrd.read(str(tmp_path / "v.nrrd"))
    assert img.spacing == (0.7, 0.7, 2.5)


def test_mha_multichannel_rejected(tmp_path):
    from lungmask_tpu.io import mha as mha_mod

    raw = np.zeros((2, 2, 2, 3), np.uint8).tobytes()
    (tmp_path / "rgb.mha").write_bytes(
        b"ObjectType = Image\nNDims = 3\nBinaryData = True\n"
        b"ElementNumberOfChannels = 3\nDimSize = 2 2 2\n"
        b"ElementType = MET_UCHAR\nElementDataFile = LOCAL\n" + raw
    )
    with pytest.raises(ValueError, match="multi-channel"):
        mha_mod.read(str(tmp_path / "rgb.mha"))


def test_mha_latin1_header_tolerated(tmp_path, rng):
    from lungmask_tpu.io import mha as mha_mod

    arr = rng.integers(0, 100, size=(2, 2, 2)).astype(np.int16)
    (tmp_path / "c.mha").write_bytes(
        b"ObjectType = Image\nNDims = 3\nBinaryData = True\n"
        b"Comment = M\xfcller\nDimSize = 2 2 2\n"
        b"ElementType = MET_SHORT\nElementDataFile = LOCAL\n" + arr.tobytes()
    )
    img = mha_mod.read(str(tmp_path / "c.mha"))
    np.testing.assert_array_equal(img.array, arr)


def test_vtk_tab_separated_fields(tmp_path):
    from lungmask_tpu.io import vtk as vtk_mod

    arr = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    payload = arr.tobytes()
    (tmp_path / "t.vtk").write_bytes(
        b"# vtk DataFile Version 3.0\nt\nBINARY\n"
        b"DATASET\tSTRUCTURED_POINTS\nDIMENSIONS\t4 3 2\n"
        b"SPACING\t1 1 1\nORIGIN\t0 0 0\nPOINT_DATA\t24\n"
        b"SCALARS\tscalars unsigned_char 1\nLOOKUP_TABLE default\n" + payload
    )
    img = vtk_mod.read(str(tmp_path / "t.vtk"))
    np.testing.assert_array_equal(img.array, arr)


def test_loaded_arrays_are_writable(tmp_path, rng):
    """frombuffer views over file bytes are read-only; MedicalImage must own
    a mutable array (sitk-like mental model) and not pin the file buffer."""
    from lungmask_tpu.io import nifti

    arr = rng.integers(-1000, 500, size=(2, 4, 4)).astype(np.int16)
    p = str(tmp_path / "w.nii")
    nifti.write(image.MedicalImage(arr), p)
    img = loader.load_input_image(p)
    img.array[0, 0, 0] = 42  # must not raise
    assert img.array[0, 0, 0] == 42


def test_hdr_gz_loader_dispatch(tmp_path, rng):
    """.hdr.gz detached NIfTI pairs must be loadable through the public
    loader (the nifti reader supported them; _format_of did not)."""
    import gzip

    from lungmask_tpu.io import nifti

    arr = rng.integers(-1000, 500, size=(2, 4, 4)).astype(np.int16)
    nii = str(tmp_path / "v.nii")
    nifti.write(image.MedicalImage(arr), nii)
    data = open(nii, "rb").read()
    # Split single-file NIfTI into a detached ni1 pair with gzipped header.
    hdr = bytearray(data[:348])
    hdr[344:348] = b"ni1\x00"
    hdr[108:112] = np.float32(0.0).tobytes()  # vox_offset 0 into .img
    with gzip.open(str(tmp_path / "p.hdr.gz"), "wb") as f:
        f.write(bytes(hdr))
    vox_off = int(np.frombuffer(data[108:112], np.float32)[0])
    (tmp_path / "p.img").write_bytes(data[vox_off:])
    img = loader.load_input_image(str(tmp_path / "p.hdr.gz"))
    np.testing.assert_array_equal(img.array, arr)
