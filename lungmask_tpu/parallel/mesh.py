"""Device-mesh management for scale-out.

The reference has no distributed layer at all (SURVEY §2.2); the TPU build's
scale axis is the CT **slice/batch dimension** sharded over ICI. The mesh here
is 2-D:

* ``data``  — slices of a volume (or volumes of a cohort) are data-parallel;
* ``space`` — optional spatial partitioning of the slice height axis for
  single-volume latency scaling (XLA's SPMD partitioner inserts the halo
  exchanges convolutions need).

XLA collectives over ICI are the communication backend — no NCCL/MPI
equivalent exists or is needed (SURVEY §5 'Distributed communication backend').
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ensure_host_devices(n: int) -> int:
    """Make sure at least ``n`` virtual CPU devices exist, even when another
    platform was already initialized (e.g. a site hook eagerly claiming an
    accelerator before test/driver code could set JAX_PLATFORMS=cpu).

    Re-points JAX at the CPU platform with ``n`` host devices by clearing the
    initialized backends — safe as long as no live arrays from the old
    backend are used afterwards. Returns the resulting device count.
    """
    if jax.default_backend() == "cpu" and len(jax.devices()) >= n:
        return len(jax.devices())
    import os

    import jax.extend.backend as jeb

    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    jeb.clear_backends()
    jax.config.update("jax_num_cpu_devices", int(n))
    return len(jax.devices())


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, space) mesh over the available devices.

    Defaults to pure data parallelism over all devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        data = n // space
    if data * space != n:
        raise ValueError(f"{data}x{space} mesh does not match {n} devices")
    mesh_devices = np.asarray(devices).reshape(data, space)
    return Mesh(mesh_devices, axis_names=("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(N, H, W[, C]) batches: N over 'data', H over 'space'."""
    return NamedSharding(mesh, P("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
