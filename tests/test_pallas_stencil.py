"""Parity tests for the experimental Pallas stencil kernels.

These kernels are measured alternatives to XLA's reduce_window / resize
lowerings (see docs/PERF.md r5 section for the on-chip numbers). They are
NOT wired into the production forward — avg-pool stays on reduce_window
and upsampling on jax.image.resize, both of which measured faster at most
layer shapes — but the kernels are kept correct so the one shape where
Pallas wins (64²×c256 upsample: 0.44 vs 0.70 ms/chunk32) stays available.

Runs in interpret mode so the CPU test mesh exercises the exact kernel
logic without a TPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lungmask_tpu.models.unet import _avg_pool2, _bilinear_up2
from lungmask_tpu.ops.pallas.stencil import avg_pool2_pallas, bilinear_up2_pallas


@pytest.mark.parametrize("shape", [(2, 32, 16, 8), (1, 8, 8, 4), (3, 16, 64, 2)])
def test_avg_pool2_matches_reduce_window(shape):
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, shape).astype(np.float32)
    )
    ref = np.asarray(_avg_pool2(x))
    got = np.asarray(avg_pool2_pallas(x, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


@pytest.mark.parametrize("shape", [(2, 32, 16, 8), (1, 8, 8, 4), (2, 16, 4, 2)])
def test_bilinear_up2_matches_resize(shape):
    x = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, shape).astype(np.float32)
    )
    ref = np.asarray(_bilinear_up2(x))
    got = np.asarray(bilinear_up2_pallas(x, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_bilinear_up2_bf16_close():
    x = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (2, 16, 16, 8)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = np.asarray(_bilinear_up2(x).astype(jnp.float32))
    got = np.asarray(bilinear_up2_pallas(x, interpret=True).astype(jnp.float32))
    # kernel accumulates in f32 and rounds once at the end; resize rounds
    # per lerp — differences stay within one bf16 ulp of the magnitude
    assert np.abs(got - ref).max() <= 0.05
