"""Device preprocessing parity vs the host (scipy, float64) oracle, plus the
reference's own synthetic-array unit-test vectors
(/root/reference/tests/test_utils.py:73-99)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lungmask_tpu.ops import cc, cc_host
from lungmask_tpu.transforms import host_pipeline, preprocess


pytestmark = pytest.mark.slow  # deselect with -m "not slow" for the smoke tier

def _synthetic_body_volume(rng, n=2, h=96, w=96):
    """Body-like phantom: soft-tissue ellipse on air, plus a small separate blob."""
    vol = np.full((n, h, w), -1000, dtype=np.int16)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = h / 2, w / 2
    body = ((yy - cy) / (h * 0.35)) ** 2 + ((xx - cx) / (w * 0.3)) ** 2 < 1
    for i in range(n):
        noise = rng.integers(-80, 80, size=(h, w))
        vol[i][body] = (40 + noise[body]).astype(np.int16)
        # lungs: two air pockets inside the body
        lung = ((yy - cy) / (h * 0.18)) ** 2 + ((xx - cx * 0.7) / (w * 0.1)) ** 2 < 1
        vol[i][lung] = -850
        # small separate blob (arm) that must lose the largest-CC contest
        vol[i, 5 : 5 + 6, 3 : 3 + 6] = 100
    return vol


def test_device_label_matches_host_partition(rng):
    img = rng.integers(0, 3, size=(40, 40)).astype(np.int32)
    for conn in (1, 2):
        dev = np.asarray(cc.label(jnp.asarray(img), connectivity=conn))
        host = cc_host.label(img, connectivity=conn)
        assert np.array_equal(dev > 0, host > 0)
        pairs = {(int(a), int(b)) for a, b in zip(dev[img > 0], host[img > 0])}
        # bijection between device roots and host labels
        assert len(pairs) == len({p[0] for p in pairs}) == len({p[1] for p in pairs})
        # scan-order consistency: sorting device roots must give host order
        roots_sorted = sorted({p[0] for p in pairs})
        mapping = dict(pairs)
        assert [mapping[r] for r in roots_sorted] == list(
            range(1, len(roots_sorted) + 1)
        )


def test_device_label_binary_3d(rng):
    m = (rng.random((10, 12, 14)) < 0.35)
    dev = np.asarray(cc.label(jnp.asarray(m)))
    host = cc_host.label(m.astype(np.uint8))
    pairs = {(int(a), int(b)) for a, b in zip(dev[m], host[m])}
    assert len(pairs) == len({p[0] for p in pairs}) == len({p[1] for p in pairs})


def test_boxes_match_host_oracle(rng):
    vol = _synthetic_body_volume(rng)
    boxes_dev = preprocess.compute_boxes(vol)
    clipped = np.clip(vol, -1024, 600)
    for i in range(vol.shape[0]):
        _, box_host = host_pipeline.crop_to_body_and_resize(clipped[i], 256, 256)
        np.testing.assert_array_equal(boxes_dev[i], box_host)


def test_preprocess_matches_host_oracle(rng):
    vol = _synthetic_body_volume(rng)
    normalized, boxes = preprocess.preprocess(vol)
    normalized = np.asarray(normalized)[: vol.shape[0]]

    slices_host, boxes_host = host_pipeline.preprocess(vol, resolution=(256, 256))
    norm_host = host_pipeline.normalize_hu(slices_host)

    np.testing.assert_array_equal(boxes, np.asarray(boxes_host))
    # Integer-cast absorbs float32-vs-float64 interpolation noise except at
    # exact .5 interpolation boundaries → allow a tiny fraction of ±1-unit flips.
    diff = np.abs(normalized - norm_host)
    assert diff.max() <= (1.0 / 1624) + 1e-6
    assert (diff > 1e-6).mean() < 5e-3


def test_preprocess_traced_close_to_staged(rng):
    """The fully-traced single-dispatch path (f32 coords) tracks the exact
    staged path except at scipy's float64 edge-oob samples."""
    import jax

    vol = _synthetic_body_volume(rng)
    clipped = jnp.asarray(np.clip(vol, -1024, 600))
    normalized_t, boxes_t = jax.jit(preprocess.preprocess_traced)(clipped)
    normalized_s, boxes_s = preprocess.preprocess(vol)
    np.testing.assert_array_equal(np.asarray(boxes_t), boxes_s)
    a = np.asarray(normalized_t)
    b = np.asarray(normalized_s)[: vol.shape[0]]
    # interiors agree to within one intensity quantum
    assert np.abs(a[:, :-1, :-1] - b[:, :-1, :-1]).max() <= (1.0 / 1624) + 1e-6


def test_real_ct_device_matches_host_oracle():
    """Device preprocessing vs float64 host oracle on the reference's REAL
    512×512 CT slices (couch, FOV circle, noise — the distributions synthetic
    phantoms miss)."""
    import os

    import pytest as _pytest

    from conftest import REFERENCE_TESTDATA

    if not os.path.isdir(REFERENCE_TESTDATA):
        _pytest.skip("reference testdata not mounted")
    from lungmask_tpu.io import loader

    vol = loader.read_dicoms(REFERENCE_TESTDATA)[0].array
    assert vol.shape[1:] == (512, 512)

    boxes_dev = preprocess.compute_boxes(vol)
    for i in range(vol.shape[0]):
        _, box_host = host_pipeline.crop_to_body_and_resize(
            np.clip(vol[i], -1024, 600), 256, 256
        )
        np.testing.assert_array_equal(boxes_dev[i], box_host)

    normalized, boxes = preprocess.preprocess(vol)
    normalized = np.asarray(normalized)[: vol.shape[0]]
    slices_host, _ = host_pipeline.preprocess(vol, resolution=(256, 256))
    norm_host = host_pipeline.normalize_hu(slices_host)
    diff = np.abs(normalized - norm_host)
    assert diff.max() <= (1.0 / 1624) + 1e-6
    assert (diff > 1e-6).mean() < 5e-3


def test_reference_simple_bodymask_vector():
    """Reference test vector: 10×10 body, mask sum 24 (test_utils.py:73-78)."""
    img = np.full((10, 10), -1000, dtype=np.int16)
    img[2:8, 3:7] = 1
    img[9, 9] = 1
    mask = host_pipeline.body_mask_slice(img)
    assert np.sum(mask) == 24


def test_reference_crop_and_resize_vector():
    """Reference test vector (test_utils.py:81-88): bbox (2,3,8,7), sum 400."""
    img = np.full((10, 10), -1000, dtype=np.int16)
    img[2:8, 3:7] = 1
    img[9, 9] = 1
    cropped, bb = host_pipeline.crop_to_body_and_resize(img, width=20, height=20)
    assert tuple(bb) == (2, 3, 8, 7)
    assert cropped.shape == (20, 20)
    assert np.sum(cropped) == 400


def test_reference_preprocess_vector_device():
    """The same vector through the DEVICE box pipeline."""
    img = np.full((2, 10, 10), -1000, dtype=np.int16)
    img[:, 2:8, 3:7] = 1
    img[:, 9, 9] = 1
    boxes = preprocess.compute_boxes(img)
    for b in boxes:
        assert tuple(b) == (2, 3, 8, 7)


def test_reference_reshape_mask_vector():
    """Reference test vector (test_utils.py:102-107)."""
    msk = np.full((10, 10), 1, dtype=np.uint8)
    bb = (2, 2, 22, 22)
    out = host_pipeline.restore_mask_geometry(msk, bb, (30, 30))
    assert out.shape == (30, 30)
    assert np.sum(out) == 400
