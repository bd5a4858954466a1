"""Multi-host (DCN) initialization helpers.

The reference is strictly single-process (SURVEY §2.2). For cohort-scale
serving across TPU pod slices, JAX's multi-controller runtime is the
transport: every host runs the same program, ``jax.distributed.initialize``
wires the DCN control plane, and the global mesh spans all hosts' devices
(ICI within a slice, DCN across). These helpers wrap that bring-up and the
host-local volume partitioning used by the cohort runner.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

from lungmask_tpu.logger import logger


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime when running multi-host.

    No-ops (returns False) when single-host: safe to call unconditionally.
    Arguments default to the standard JAX env vars; on a TPU backend with no
    coordinator env vars, ``jax.distributed.initialize()`` is still attempted
    so pod slices auto-discover peers via TPU metadata (a single-chip TPU
    initializes with process_count == 1, which shard_cohort handles as the
    whole-cohort case).
    """
    already = getattr(jax.distributed, "global_state", None)
    if already is not None and getattr(already, "client", None) is not None:
        return True
    env_says_multihost = (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if not env_says_multihost and num_processes in (None, 1):
        # TPU pods carry their own peer discovery — attempt the argument-free
        # bring-up there; anything else (CPU/GPU dev boxes) stays single-host.
        if jax.default_backend() != "tpu":
            return False
        try:
            jax.distributed.initialize()
            logger.info(
                "multihost initialized via TPU metadata: process "
                f"{jax.process_index()}/{jax.process_count()}"
            )
            return True
        except Exception as e:
            logger.info(f"single-host TPU run ({e})")
            return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            f"multihost initialized: process {jax.process_index()}/{jax.process_count()}"
        )
        return True
    except Exception as e:
        logger.warning(f"multihost initialization failed ({e}); running single-host")
        return False


def shard_cohort(sources: Sequence, process_id: Optional[int] = None,
                 process_count: Optional[int] = None) -> list:
    """Partition a cohort's volume list across hosts (round-robin by process).

    Each host decodes and feeds only its own shard; device-level parallelism
    within the host is handled by the mesh. Deterministic across hosts given
    the same input order.
    """
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    return [s for i, s in enumerate(sources) if i % pcount == pid]
