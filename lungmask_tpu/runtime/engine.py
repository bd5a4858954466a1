"""Batched U-Net execution engine.

Replaces the reference's per-batch host↔device round-trip loop
(/root/reference/lungmask/mask.py:172-187: 20-slice chunks, per-batch
``.cpu().numpy()`` + O(n²) ``np.vstack``) with a device-resident pipeline:
slices stay on device from preprocessing through argmax; fixed batch shapes
mean exactly one compilation per (batch, resolution); outputs are concatenated
on device and fetched once per volume.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lungmask_tpu.models import unet


class UNetRunner:
    """Holds device-resident parameters and a compiled batched forward step."""

    def __init__(
        self,
        params,
        n_classes: int,
        batch_size: int = 20,
        compute_dtype=jnp.float32,
        donate: bool = False,
    ):
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.n_classes = n_classes
        self.batch_size = int(batch_size)
        self.compute_dtype = compute_dtype

        @jax.jit
        def step(params, batch):  # batch: (B, H, W) normalized f32
            x = batch[..., None]  # NHWC
            return unet.unet_argmax(params, x, compute_dtype=compute_dtype)

        self._step = step

    def run(self, slices: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W) normalized slices → (N, H, W) uint8 class map.

        N is padded up to a batch multiple (zero slices), predictions for the
        padding are discarded. All work and intermediates stay on device.
        """
        n = slices.shape[0]
        b = self.batch_size
        n_pad = ((n + b - 1) // b) * b
        if n_pad != n:
            slices = jnp.concatenate(
                [slices, jnp.zeros((n_pad - n,) + slices.shape[1:], slices.dtype)]
            )
        outs = [
            self._step(self.params, slices[i : i + b]) for i in range(0, n_pad, b)
        ]
        return jnp.concatenate(outs, axis=0)[:n]

    def run_numpy(self, slices) -> np.ndarray:
        return np.asarray(self.run(jnp.asarray(slices)))
