"""noHU input mode tests (reconstructed capability, io/nohu.py)."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from lungmask_tpu.io import nohu


def test_to_pseudo_hu_mapping():
    x = np.asarray([[0, 128, 255]], dtype=np.uint8)
    hu = nohu.to_pseudo_hu(x[None])
    assert hu.dtype == np.int16
    assert hu[0, 0, 0] == -1024  # black → air floor
    assert hu[0, 0, 2] == 600  # white → clip ceiling
    assert -300 < hu[0, 0, 1] < -200


def test_load_image_directory(tmp_path, rng):
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    body = ((yy - 32) / 22.0) ** 2 + ((xx - 32) / 19.0) ** 2 < 1
    for i in range(3):
        sl = np.zeros((h, w), dtype=np.uint8)
        sl[body] = 170
        Image.fromarray(sl).save(tmp_path / f"slice{i:02d}.png")
    (tmp_path / "notes.txt").write_text("ignored")
    img = nohu.load_image_directory(str(tmp_path))
    assert img.array.shape == (3, 64, 64)
    assert img.array.dtype == np.int16
    assert img.array.min() == -1024
    # body intensity lands in soft-tissue-ish range
    assert 0 < img.array.max() <= 600


def test_inconsistent_shapes_raise(tmp_path):
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(tmp_path / "a.png")
    Image.fromarray(np.zeros((9, 8), np.uint8)).save(tmp_path / "b.png")
    with pytest.raises(ValueError, match="inconsistent"):
        nohu.load_image_directory(str(tmp_path))


def test_empty_directory_raises(tmp_path):
    with pytest.raises(ValueError, match="no image files"):
        nohu.load_image_directory(str(tmp_path))
