"""Pallas bodymask kernel vs the XLA path (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lungmask_tpu.ops import cc
from lungmask_tpu.ops.pallas.bodymask import bodymask_labels_pallas
from lungmask_tpu.transforms import preprocess


pytestmark = pytest.mark.slow  # deselect with -m "not slow" for the smoke tier

def _slices(rng, b=3):
    out = np.full((b, 128, 128), -1000, dtype=np.float32)
    yy, xx = np.mgrid[0:128, 0:128]
    for i in range(b):
        body = ((yy - 64) / 45.0) ** 2 + ((xx - 64) / (38.0 + i)) ** 2 < 1
        out[i][body] = 40
        # ring with a hole (exercises fill), plus a small separate blob
        out[i, 20:26, 20:26] = 100
        out[i, 64 - 5 : 64 + 5, 64 - 5 : 64 + 5] = -900  # cavity inside body
    out += rng.normal(0, 20, out.shape).astype(np.float32)
    return out


def test_pallas_kernel_matches_xla_path(rng):
    slices = _slices(rng)
    labels_p, eroded_p = bodymask_labels_pallas(jnp.asarray(slices), interpret=True)

    import lungmask_tpu.ops.morphology as morphology

    for i in range(slices.shape[0]):
        small = jnp.asarray(slices[i])
        mask = small > preprocess.BODY_THRESHOLD
        mask = morphology.binary_closing(mask)
        mask = morphology.binary_fill_holes(mask, structure="full")
        mask = morphology.binary_erosion(mask, iterations=2)
        labels_x = cc.label(mask, connectivity=1)
        np.testing.assert_array_equal(np.asarray(eroded_p[i]), np.asarray(mask))
        # pure min-propagation converges to the same roots as propagation +
        # pointer jumping
        np.testing.assert_array_equal(np.asarray(labels_p[i]), np.asarray(labels_x))


def test_bodymasks_batch_pallas_matches_xla(rng):
    slices = jnp.asarray(_slices(rng, b=2))
    import unittest.mock as mock

    with mock.patch(
        "lungmask_tpu.ops.pallas.bodymask.bodymask_labels_pallas",
        lambda s: bodymask_labels_pallas(s, interpret=True),
    ):
        masks_p = np.asarray(preprocess._bodymasks_batch(slices, use_pallas=True))
    masks_x = np.asarray(preprocess._bodymasks_batch(slices, use_pallas=False))
    np.testing.assert_array_equal(masks_p, masks_x)


def test_boxes_same_with_and_without_pallas(rng):
    vol = np.full((2, 96, 96), -1000, dtype=np.int16)
    yy, xx = np.mgrid[0:96, 0:96]
    vol[:, ((yy - 48) / 33.0) ** 2 + ((xx - 48) / 29.0) ** 2 < 1] = 40
    clipped = jnp.asarray(np.clip(vol, -1024, 600))
    import unittest.mock as mock

    with mock.patch(
        "lungmask_tpu.ops.pallas.bodymask.bodymask_labels_pallas",
        lambda s: bodymask_labels_pallas(s, interpret=True),
    ):
        bp = np.asarray(preprocess._boxes_for_volume(clipped, use_pallas=True))
    bx = np.asarray(preprocess._boxes_for_volume(clipped, use_pallas=False))
    np.testing.assert_array_equal(bp, bx)
