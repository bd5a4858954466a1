"""Postprocessing parity tests.

Golden vectors mirror the reference's own unit tests
(/root/reference/tests/test_utils.py:124-159 and :58-63) so the TPU build is
held to the identical contract.
"""

import numpy as np
import pytest
from scipy import ndimage

from lungmask_tpu.ops import cc_host
from lungmask_tpu.transforms.postprocess import postprocessing


def test_bbox_nd():
    m = np.zeros((10, 10, 10), dtype=np.uint8)
    m[2:8, 3:7, 4:6] = 1
    bb = cc_host.bbox_nd(m, margin=2)
    assert tuple(bb) == (0, 10, 1, 9, 2, 8)


def _label_fixture():
    label_image = np.zeros((1, 6, 6), dtype=np.uint8)
    label_image[0] = np.asarray(
        [
            [0, 0, 0, 0, 0, 0],
            [0, 1, 1, 2, 2, 0],
            [0, 2, 0, 3, 1, 0],
            [0, 4, 4, 4, 0, 0],
            [0, 4, 0, 4, 0, 0],
            [0, 4, 4, 4, 0, 0],
        ]
    )
    return np.tile(label_image, (2, 1, 1))


def test_postprocessing_golden():
    res_gt = [
        [0, 0, 0, 0, 0, 0],
        [0, 1, 1, 2, 2, 0],
        [0, 1, 0, 3, 2, 0],
        [0, 4, 4, 4, 0, 0],
        [0, 4, 0, 4, 0, 0],
        [0, 4, 4, 4, 0, 0],
    ]
    res = postprocessing(_label_fixture(), spare=[], skip_below=1)[0]
    assert np.all(res == res_gt)


def test_postprocessing_spare():
    res = postprocessing(_label_fixture(), spare=[3], skip_below=1)[0]
    assert res[2, 3] == 2


def test_postprocessing_spare_skip_below():
    res = postprocessing(_label_fixture(), spare=[3], skip_below=3)[0]
    assert res[2, 1] == 0


def test_label_scan_order_and_components(rng):
    """Labels must be 1..n in raster-scan first-occurrence order, with
    same-value full-connectivity components (skimage semantics)."""
    img = rng.integers(0, 4, size=(20, 20)).astype(np.uint8)
    lab, num = cc_host.label(img, return_num=True)
    assert lab.max() == num
    # first-occurrence order
    flat = lab.ravel()
    firsts = [np.nonzero(flat == k)[0][0] for k in range(1, num + 1)]
    assert firsts == sorted(firsts)
    # background preserved
    np.testing.assert_array_equal(lab == 0, img == 0)
    # each label's pixels all share one image value and are connected (8-conn)
    struct = ndimage.generate_binary_structure(2, 2)
    for k in range(1, num + 1):
        sel = lab == k
        vals = np.unique(img[sel])
        assert len(vals) == 1
        _, n = ndimage.label(sel, structure=struct)
        assert n == 1
    # maximality: cross-check against per-value scipy labeling
    for v in np.unique(img):
        if v == 0:
            continue
        ref, _ = ndimage.label(img == v, structure=struct)
        # bijection between ref components and our labels on this value
        pairs = {(int(r), int(l)) for r, l in zip(ref[img == v], lab[img == v])}
        assert len({p[0] for p in pairs}) == len(pairs) == len({p[1] for p in pairs})


def test_label_connectivity1(rng):
    img = (rng.random((30, 30)) < 0.4).astype(np.uint8)
    lab = cc_host.label(img, connectivity=1)
    ref, n = ndimage.label(img)  # cross structure
    assert lab.max() == n
    pairs = {(int(r), int(l)) for r, l in zip(ref[img > 0], lab[img > 0])}
    assert len(pairs) == n


def test_keep_largest_connected_component():
    m = np.zeros((10, 10), dtype=np.uint8)
    m[1:3, 1:3] = 1  # area 4
    m[5:9, 5:9] = 1  # area 16
    out = cc_host.keep_largest_connected_component(m)
    assert out.sum() == 16
    assert out[6, 6] and not out[1, 1]


def test_area_closing_binary():
    m = np.zeros((20, 20), dtype=np.uint8)
    m[2:18, 2:18] = 1
    m[5:7, 5:7] = 0  # 4-px hole → filled (<64)
    m[9:17, 9:17] = 0  # 64-px hole → kept
    out = cc_host.area_closing_binary(m, area_threshold=64)
    assert out[5, 5]
    assert not out[10, 10]


def test_regionprops_fields(rng):
    img = np.zeros((8, 8), dtype=np.uint8)
    img[1:3, 1:4] = 2
    img[5:8, 5:8] = 7
    lab = cc_host.label(img)
    regions = cc_host.regionprops(lab, img)
    assert [r.label for r in regions] == [1, 2]
    assert regions[0].area == 6 and regions[1].area == 9
    assert regions[0].max_intensity == 2.0 and regions[1].max_intensity == 7.0
    assert regions[0].bbox == (1, 1, 3, 4)
    assert regions[1].bbox == (5, 5, 8, 8)


def test_fill_holes_3d():
    m = np.zeros((8, 8, 8), dtype=bool)
    m[1:7, 1:7, 1:7] = True
    m[3:5, 3:5, 3:5] = False
    out = cc_host.fill_holes_3d(m)
    assert out[3, 3, 3]
    ref = ndimage.binary_fill_holes(m)
    np.testing.assert_array_equal(out, ref)
