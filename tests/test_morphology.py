"""Parity tests: device morphology vs scipy.ndimage (the reference's tool)."""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from lungmask_tpu.ops import morphology


pytestmark = pytest.mark.slow  # deselect with -m "not slow" for the smoke tier

def _rand_mask(rng, shape, p=0.5):
    return rng.random(shape) < p


@pytest.mark.parametrize("shape", [(128, 128), (37, 91), (16, 16, 16)])
def test_dilation_cross_matches_scipy(shape, rng):
    x = _rand_mask(rng, shape, 0.3)
    ref = ndimage.binary_dilation(x)
    got = np.asarray(morphology.binary_dilation(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("iterations", [1, 2, 3])
def test_dilation_iterations(iterations, rng):
    x = _rand_mask(rng, (64, 64), 0.1)
    ref = ndimage.binary_dilation(x, iterations=iterations)
    got = np.asarray(morphology.binary_dilation(jnp.asarray(x), iterations=iterations))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("shape", [(128, 128), (37, 91), (16, 16, 16)])
def test_erosion_cross_matches_scipy(shape, rng):
    x = _rand_mask(rng, shape, 0.8)
    ref = ndimage.binary_erosion(x)
    got = np.asarray(morphology.binary_erosion(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("iterations", [1, 2])
def test_erosion_iterations(iterations, rng):
    x = _rand_mask(rng, (64, 64), 0.9)
    ref = ndimage.binary_erosion(x, iterations=iterations)
    got = np.asarray(morphology.binary_erosion(jnp.asarray(x), iterations=iterations))
    np.testing.assert_array_equal(got, ref)


def test_full_structure_matches_scipy(rng):
    x = _rand_mask(rng, (64, 64), 0.3)
    struct = np.ones((3, 3), dtype=bool)
    np.testing.assert_array_equal(
        np.asarray(morphology.binary_dilation(jnp.asarray(x), structure="full")),
        ndimage.binary_dilation(x, structure=struct),
    )
    np.testing.assert_array_equal(
        np.asarray(morphology.binary_erosion(jnp.asarray(x), structure="full")),
        ndimage.binary_erosion(x, structure=struct),
    )


def test_closing_matches_scipy(rng):
    """The bodymask's binary_closing (utils.py:70): default cross structure."""
    x = _rand_mask(rng, (128, 128), 0.4)
    ref = ndimage.binary_closing(x)
    got = np.asarray(morphology.binary_closing(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("shape", [(128, 128), (33, 57)])
def test_fill_holes_full_structure(shape, rng):
    """The bodymask's fill (utils.py:71): structure=np.ones((3,3))."""
    x = _rand_mask(rng, shape, 0.55)
    ref = ndimage.binary_fill_holes(x, structure=np.ones((3, 3)))
    got = np.asarray(morphology.binary_fill_holes(jnp.asarray(x), structure="full"))
    np.testing.assert_array_equal(got, ref)


def test_fill_holes_ring(rng):
    x = np.zeros((32, 32), dtype=bool)
    x[5:25, 5:25] = True
    x[10:20, 10:20] = False  # a hole
    ref = ndimage.binary_fill_holes(x, structure=np.ones((3, 3)))
    got = np.asarray(morphology.binary_fill_holes(jnp.asarray(x), structure="full"))
    np.testing.assert_array_equal(got, ref)
    assert got[15, 15]


def test_fill_holes_3d(rng):
    x = np.zeros((12, 12, 12), dtype=bool)
    x[2:10, 2:10, 2:10] = True
    x[5:7, 5:7, 5:7] = False
    ref = ndimage.binary_fill_holes(x, structure=np.ones((3, 3, 3)))
    got = np.asarray(morphology.binary_fill_holes(jnp.asarray(x), structure="full"))
    np.testing.assert_array_equal(got, ref)


def test_fill_holes_default_matches_scipy_default(rng):
    """The default structure must be scipy's (cross): a cavity whose only
    outside connection is a diagonal gap distinguishes the two."""
    x = np.ones((7, 7), dtype=bool)
    x[3, 3] = False          # cavity
    x[2, 2] = False          # diagonal gap chain to the border
    x[1, 1] = False
    x[0, 0] = False
    ref = ndimage.binary_fill_holes(x)  # cross: cavity is sealed -> filled
    got = np.asarray(morphology.binary_fill_holes(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)
    assert got[3, 3]
    full = np.asarray(morphology.binary_fill_holes(jnp.asarray(x), structure="full"))
    assert not full[3, 3]  # full flood escapes through the diagonal
