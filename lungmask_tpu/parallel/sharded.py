"""Sharded inference: the U-Net forward over a device mesh.

Slices shard over the ``data`` axis (and optionally the slice height over
``space``); parameters replicate. Sharding is expressed as jit in/out sharding
annotations — XLA's SPMD partitioner inserts the halo exchanges the spatially
partitioned convolutions need and keeps everything on ICI. This subsumes the
reference's only parallelism (single-device slice batching,
/root/reference/lungmask/mask.py:173-187) and is the TPU-native replacement
for a hand-written communication layer.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lungmask_tpu.models import unet
from lungmask_tpu.parallel import mesh as mesh_lib


def make_sharded_argmax(mesh: Mesh, compute_dtype=jnp.float32):
    """Compiled (params, batch(N,H,W,1)) → uint8 (N,H,W) over the mesh.

    N shards over 'data', H over 'space'; params replicated.
    """
    batch_sh = NamedSharding(mesh, P("data", "space", None, None))
    out_sh = NamedSharding(mesh, P("data", "space", None))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(rep, batch_sh),
        out_shardings=out_sh,
    )
    def step(params, batch):
        return unet.unet_argmax(params, batch, compute_dtype=compute_dtype)

    return step


class ShardedUNetRunner:
    """Mesh-parallel drop-in for runtime.engine.UNetRunner."""

    def __init__(
        self,
        params,
        n_classes: int,
        mesh: Optional[Mesh] = None,
        batch_size: int = 64,
        compute_dtype=jnp.float32,
    ):
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.params = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, params),
            NamedSharding(self.mesh, P()),
        )
        self.n_classes = n_classes
        ndata = self.mesh.devices.shape[0]
        # batch must divide evenly over the data axis
        self.batch_size = ((int(batch_size) + ndata - 1) // ndata) * ndata
        self._step = make_sharded_argmax(self.mesh, compute_dtype)

    def run(self, slices: jnp.ndarray) -> jnp.ndarray:
        n = slices.shape[0]
        b = self.batch_size
        n_pad = ((n + b - 1) // b) * b
        if n_pad != n:
            slices = jnp.concatenate(
                [slices, jnp.zeros((n_pad - n,) + slices.shape[1:], slices.dtype)]
            )
        outs = []
        for i in range(0, n_pad, b):
            batch = jax.device_put(
                slices[i : i + b, ..., None],
                NamedSharding(self.mesh, P("data", "space", None, None)),
            )
            outs.append(self._step(self.params, batch))
        import numpy as np

        return np.concatenate([jax.device_get(o) for o in outs], axis=0)[:n]
