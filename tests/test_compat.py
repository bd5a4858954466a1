"""Compat layer: reference-named functions behave per the reference's own
unit-test vectors (/root/reference/tests/test_utils.py)."""

import numpy as np

from lungmask_tpu import compat


def test_bbox_3D_vector():
    m = np.zeros((10, 10, 10), dtype=np.uint8)
    m[2:8, 3:7, 4:6] = 1
    assert tuple(compat.bbox_3D(m, margin=2)) == (0, 10, 1, 9, 2, 8)


def test_simple_bodymask_vector():
    img = np.full((10, 10), -1000, dtype=np.int16)
    img[2:8, 3:7] = 1
    img[9, 9] = 1
    assert np.sum(compat.simple_bodymask(img)) == 24


def test_crop_and_resize_vector():
    img = np.full((10, 10), -1000, dtype=np.int16)
    img[2:8, 3:7] = 1
    img[9, 9] = 1
    cropped, bb = compat.crop_and_resize(img, width=20, height=20)
    assert tuple(bb) == (2, 3, 8, 7)
    assert cropped.shape == (20, 20)
    assert np.sum(cropped) == 400


def test_preprocess_vector():
    img = np.full((2, 10, 10), -1000, dtype=np.int16)
    img[:, 2:8, 3:7] = 1
    img[:, 9, 9] = 1
    cropped, bb = compat.preprocess(img, resolution=[20, 20])
    for sl, bb_ in zip(cropped, bb):
        assert tuple(bb_) == (2, 3, 8, 7)
        assert sl.shape == (20, 20)
        assert np.sum(sl) == 400


def test_reshape_mask_vector():
    msk = np.full((10, 10), 1, dtype=np.uint8)
    out = compat.reshape_mask(msk, (2, 2, 22, 22), origsize=(30, 30))
    assert out.shape == (30, 30)
    assert np.sum(out) == 400


def test_surface_complete():
    for name in compat.__all__:
        assert getattr(compat, name) is not None
