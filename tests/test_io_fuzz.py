"""Robustness fuzzing for the from-scratch DICOM parser (io/dicom.py).

The reference tolerates arbitrary junk in a scanned directory by catching
per-file errors and skipping (utils.py:187-189); our parser must therefore
fail CLEANLY on malformed bytes — a controlled exception, never a crash,
hang, or silent garbage volume — and scan_directory must keep going.
"""

import os

import numpy as np
import pytest

from lungmask_tpu.io import dicom

ACCEPTABLE = (dicom.DicomError, ValueError, EOFError, KeyError, IndexError)


@pytest.fixture(scope="module")
def valid_bytes(tmp_path_factory):
    p = tmp_path_factory.mktemp("fuzz") / "s.dcm"
    rng = np.random.default_rng(5)
    arr = rng.integers(-1000, 500, size=(32, 32), dtype=np.int16)
    dicom.write_slice(
        str(p),
        arr,
        series_uid=dicom.generate_uid(),
        study_uid=dicom.generate_uid(),
        position=(0.0, 0.0, 0.0),
    )
    data = p.read_bytes()
    # Sanity: the untouched stream parses.
    df = dicom.read_file(str(p))
    assert df.pixels is not None and df.pixels.shape == (32, 32)
    return data


def _try_parse(tmp_path, name, data):
    p = tmp_path / name
    p.write_bytes(data)
    try:
        dicom.read_file(str(p))
    except ACCEPTABLE:
        pass  # clean, typed failure is the contract


def test_truncation_sweep(valid_bytes, tmp_path):
    """Every prefix length (stepped) either parses or raises cleanly."""
    n = len(valid_bytes)
    for cut in list(range(0, 200, 7)) + list(range(200, n, max(1, n // 64))):
        _try_parse(tmp_path, f"t{cut}.dcm", valid_bytes[:cut])


def test_bitflip_sweep(valid_bytes, tmp_path):
    """Single-byte corruptions across the stream fail cleanly or parse.

    Flips hit the preamble, meta header, tag/VR/length fields, and pixel
    payload; length-field corruption is the classic parser-crash vector.
    """
    rng = np.random.default_rng(11)
    n = len(valid_bytes)
    offsets = set(rng.integers(0, n, size=96).tolist())
    offsets.update(range(128, 160))  # magic + first meta elements
    for off in sorted(offsets):
        data = bytearray(valid_bytes)
        data[off] ^= 0xFF
        _try_parse(tmp_path, f"b{off}.dcm", bytes(data))


@pytest.mark.parametrize(
    "syntax", [dicom.DEFLATED_EXPLICIT_VR_LE, dicom.EXPLICIT_VR_BE,
               dicom.HTJ2K_LOSSLESS]
)
def test_truncation_and_bitflip_sweep_new_syntaxes(tmp_path, syntax):
    """Deflated and big-endian streams get the same clean-failure contract:
    corrupt deflate blocks and byte-swapped length fields are both classic
    crash vectors."""
    rng = np.random.default_rng(7)
    arr = rng.integers(-1000, 500, size=(16, 16), dtype=np.int16)
    p = tmp_path / "s.dcm"
    dicom.write_slice(str(p), arr, transfer_syntax=syntax)
    data = p.read_bytes()
    n = len(data)
    for cut in range(0, n, max(1, n // 48)):
        _try_parse(tmp_path, f"t{cut}.dcm", data[:cut])
    offsets = set(rng.integers(0, n, size=64).tolist())
    offsets.update(range(128, 160))
    for off in sorted(offsets):
        mut = bytearray(data)
        mut[off] ^= 0xFF
        _try_parse(tmp_path, f"b{off}.dcm", bytes(mut))


def test_random_garbage(tmp_path):
    rng = np.random.default_rng(23)
    for i, size in enumerate([0, 1, 131, 132, 133, 1024, 4096]):
        _try_parse(tmp_path, f"g{i}.bin", rng.bytes(size))


def test_scan_directory_survives_corruption(valid_bytes, tmp_path):
    """A directory mixing good slices with corrupted/truncated files yields
    exactly the good series — bad files are skipped with a log, not fatal."""
    suid, stuid = dicom.generate_uid(), dicom.generate_uid()
    rng = np.random.default_rng(31)
    for i in range(3):
        arr = rng.integers(-1000, 500, size=(16, 16), dtype=np.int16)
        dicom.write_slice(
            str(tmp_path / f"ok{i}.dcm"),
            arr,
            series_uid=suid,
            study_uid=stuid,
            position=(0.0, 0.0, float(i)),
        )
    (tmp_path / "trunc.dcm").write_bytes(valid_bytes[: len(valid_bytes) // 3])
    (tmp_path / "junk.dcm").write_bytes(rng.bytes(700))
    corrupted = bytearray(valid_bytes)
    corrupted[140] ^= 0xFF  # inside file-meta: group-length tag area
    (tmp_path / "flip.dcm").write_bytes(bytes(corrupted))
    os.mkdir(tmp_path / "sub")

    series = dicom.scan_directory(str(tmp_path))
    assert len(series) >= 1
    best = max(series, key=len)
    assert len(best) == 3
