"""Parity tests: device resampler vs scipy.ndimage.zoom (the reference's tool)."""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from lungmask_tpu.ops import resample


@pytest.mark.parametrize(
    "in_shape,out_shape",
    [
        ((512, 512), (128, 128)),
        ((512, 512), (256, 256)),
        ((128, 128), (512, 512)),
        ((10, 10), (128, 128)),
        ((128, 128), (10, 10)),
        ((37, 91), (128, 128)),
        ((128, 128), (37, 91)),
        ((6, 4), (256, 256)),
        ((1, 7), (1, 128)),
    ],
)
def test_nearest_matches_scipy(in_shape, out_shape, rng):
    img = rng.integers(-1100, 700, size=in_shape).astype(np.int16)
    zoom = np.asarray(out_shape) / np.asarray(in_shape)
    ref = ndimage.zoom(img, zoom, order=0)
    assert ref.shape == tuple(out_shape)
    got = np.asarray(resample.resize(jnp.asarray(img), out_shape, order=0))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize(
    "in_shape,out_shape",
    [
        ((512, 512), (256, 256)),
        ((100, 230), (256, 256)),
        ((256, 256), (100, 230)),
        ((6, 4), (256, 256)),
        ((303, 17), (256, 256)),
    ],
)
def test_linear_matches_scipy(in_shape, out_shape, rng):
    img = rng.normal(size=in_shape).astype(np.float32) * 500
    zoom = np.asarray(out_shape) / np.asarray(in_shape)
    ref = ndimage.zoom(img, zoom, order=1)
    assert ref.shape == tuple(out_shape)
    got = np.asarray(resample.resize(jnp.asarray(img), out_shape, order=1))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-5)


def test_zoom_output_shape_matches_scipy(rng):
    for in_shape in [(512, 512), (10, 10), (37, 91), (303, 17)]:
        img = np.zeros(in_shape, dtype=np.float32)
        for zoom in [128 / np.asarray(in_shape), [0.37, 2.11], [1.0, 0.5]]:
            ref = ndimage.zoom(img, zoom, order=0).shape
            assert resample.zoom_output_shape(in_shape, zoom) == ref


def test_bool_nearest_roundtrip(rng):
    mask = rng.random((128, 128)) > 0.5
    ref = ndimage.zoom(mask, 512 / np.asarray(mask.shape), order=0)
    got = np.asarray(resample.resize(jnp.asarray(mask), (512, 512), order=0))
    np.testing.assert_array_equal(got, ref)


_BOXES = np.asarray(
    [
        (37, 90, 411, 489),
        (0, 0, 512, 512),
        (100, 100, 356, 420),
        (3, 7, 94, 511),
        (250, 250, 251, 251),  # degenerate 1×1
    ],
    dtype=np.int32,
)


@pytest.mark.parametrize("order", [0, 1])
def test_crop_resize_plan_matches_crop_then_zoom(order, rng):
    """Exact-path oracle: reference crop-then-zoom (utils.py:107-110)."""
    imgs = (rng.normal(size=(len(_BOXES), 512, 512)) * 400).astype(np.float32)
    plan = resample.crop_resize_plan(_BOXES, (256, 256), order=order)
    got = np.asarray(resample.apply_crop_resize(jnp.asarray(imgs), plan))
    for i, box in enumerate(_BOXES):
        crop = imgs[i, box[0] : box[2], box[1] : box[3]]
        zoom = np.asarray([256, 256]) / np.asarray(crop.shape)
        ref = ndimage.zoom(crop, zoom, order=order)
        if order == 0:
            np.testing.assert_array_equal(got[i], ref)
        else:
            np.testing.assert_allclose(got[i], ref, atol=1e-3, rtol=1e-5)


def test_paste_masks_host_matches_device_plan(rng):
    masks = rng.integers(0, 4, size=(len(_BOXES), 256, 256)).astype(np.uint8)
    plan = resample.paste_plan(_BOXES, (256, 256), (512, 512))
    dev = np.asarray(resample.apply_paste(jnp.asarray(masks), plan))
    host = resample.paste_masks_host(masks, _BOXES, (512, 512))
    np.testing.assert_array_equal(host, dev)


def test_native_paste_matches_numpy_oracle(rng):
    """The native lm_paste_masks (the default finish lane since round 4) must
    be bit-identical to the numpy reference across degenerate and random box
    geometries, including empty boxes, 1-pixel boxes, and the scipy last-sample
    oob quirk surfaced by downscaling boxes."""
    from lungmask_tpu.ops import native

    if native.get_lib() is None or not hasattr(native.get_lib(), "lm_paste_masks"):
        pytest.skip("native core unavailable")
    for _ in range(50):
        n = int(rng.integers(1, 5))
        mh, mw = int(rng.integers(1, 64)), int(rng.integers(1, 64))
        h, w = int(rng.integers(1, 96)), int(rng.integers(1, 96))
        masks = rng.integers(0, 6, size=(n, mh, mw)).astype(np.uint8)
        boxes = np.stack(
            [
                (lambda r0, r1, c0, c1: np.asarray([r0, c0, r1, c1]))(
                    *sorted(rng.integers(0, h + 1, 2)),
                    *sorted(rng.integers(0, w + 1, 2)),
                )
                for _ in range(n)
            ]
        )
        got = native.paste_masks(masks, boxes, (h, w))
        assert got is not None
        np.testing.assert_array_equal(
            got, resample.paste_masks_numpy(masks, boxes, (h, w))
        )
    # Out-of-canvas boxes must be refused (caller falls back to numpy).
    bad = np.asarray([[0, 0, 10, 200]], dtype=np.int64)
    assert native.paste_masks(np.zeros((1, 8, 8), np.uint8), bad, (16, 16)) is None


def test_paste_plan_matches_reshape_mask(rng):
    """Exact-path oracle: the reference reshape_mask recipe (utils.py:114-129)."""
    masks = rng.integers(0, 4, size=(len(_BOXES), 256, 256)).astype(np.uint8)
    plan = resample.paste_plan(_BOXES, (256, 256), (512, 512))
    got = np.asarray(resample.apply_paste(jnp.asarray(masks), plan))
    for i, box in enumerate(_BOXES):
        resize_hw = [box[2] - box[0], box[3] - box[1]]
        ref = np.zeros((512, 512))
        ref[box[0] : box[2], box[1] : box[3]] = ndimage.zoom(
            masks[i], resize_hw / np.asarray(masks[i].shape), order=0
        )
        np.testing.assert_array_equal(got[i], ref.astype(np.uint8))


@pytest.mark.parametrize("order", [0, 1])
def test_traced_box_variant_matches_exact_interior(order, rng):
    """The fully-traced f32 variant may only differ at scipy's oob edge samples."""
    img = (rng.normal(size=(512, 512)) * 400).astype(np.float32)
    box = np.asarray([37, 90, 411, 489], dtype=np.int32)
    plan = resample.crop_resize_plan(box[None], (256, 256), order=order)
    exact = np.asarray(resample.apply_crop_resize(jnp.asarray(img[None]), plan))[0]
    traced = np.asarray(
        resample.resize_from_box(jnp.asarray(img), jnp.asarray(box), (256, 256), order)
    )
    # f32 coordinate rounding shifts interpolation weights by ~4e-5; on a
    # white-noise image with O(1000) pixel-to-pixel gradients that is O(0.1)
    # in value. Real CT slices are far smoother.
    np.testing.assert_allclose(traced[:-1, :-1], exact[:-1, :-1], atol=0.5, rtol=1e-4)


def test_traced_paste_matches_exact(rng):
    mask = rng.integers(0, 4, size=(256, 256)).astype(np.uint8)
    box = np.asarray([12, 40, 500, 460], dtype=np.int32)
    plan = resample.paste_plan(box[None], (256, 256), (512, 512))
    exact = np.asarray(resample.apply_paste(jnp.asarray(mask[None]), plan))[0]
    traced = np.asarray(
        resample.paste_resized_into_box(jnp.asarray(mask), jnp.asarray(box), (512, 512))
    )
    # nearest-index decisions agree except possibly at oob edge rows/cols
    assert np.mean(traced != exact) < 0.01
