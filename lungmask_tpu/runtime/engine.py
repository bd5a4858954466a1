"""Batched U-Net execution engine.

Replaces the reference's per-batch host↔device round-trip loop
(/root/reference/lungmask/mask.py:172-187: 20-slice chunks, per-batch
``.cpu().numpy()`` + O(n²) ``np.vstack``) with a device-resident
single-dispatch design: the whole slice stack is processed by ONE jitted
program that ``lax.map``s over fixed-size chunks. One dispatch per volume
amortizes per-call overhead (significant on remote-attached TPUs), the chunk
size bounds activation memory exactly like the reference's batch size did,
and the only host transfer is the final uint8 mask stack.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lungmask_tpu.models import unet


def _cast_kernels(params, compute_dtype):
    """Store conv kernels pre-cast to the compute dtype.

    The forward pass casts kernels to the activation dtype anyway
    (models/unet._conv), so this is bit-identical — it just removes the
    per-dispatch f32→bf16 weight casts (and halves resident weight HBM).
    Biases and folded-BN affines stay float32 (they are applied to the float32
    conv accumulator).
    """
    if compute_dtype == jnp.float32:
        return params

    def walk(tree):
        if isinstance(tree, dict):
            return {
                k: (v.astype(compute_dtype) if k == "w" else walk(v))
                for k, v in tree.items()
            }
        if isinstance(tree, list):
            return [walk(v) for v in tree]
        return tree

    return walk(params)


@functools.partial(jax.jit, static_argnames=("chunk", "compute_dtype"))
def volume_argmax(params, vol: jnp.ndarray, chunk: int, compute_dtype) -> jnp.ndarray:
    """(M, H, W) normalized slices → (M, H, W) uint8, M % chunk == 0.

    Single XLA program: lax.map over (M/chunk) batches of the U-Net forward.
    """
    m, h, w = vol.shape
    chunks = vol.reshape(m // chunk, chunk, h, w, 1)

    def f(c):
        return unet.unet_argmax(params, c, compute_dtype=compute_dtype)

    return jax.lax.map(f, chunks).reshape(m, h, w)


@functools.partial(jax.jit, static_argnames=("chunk", "compute_dtype"))
def volume_argmax_packed(params, vol: jnp.ndarray, chunk: int, compute_dtype) -> jnp.ndarray:
    """:func:`volume_argmax` with the class map nibble-packed on device:
    two 4-bit pixels per byte along the last axis → (M, H, W/2) uint8.

    Halves the device→host mask transfer, which on remote-attached TPUs costs
    as much as the U-Net compute itself. 4 bits covers every shipped model
    (≤6 classes). Unpack with :func:`unpack_nibbles`.
    """
    dense = volume_argmax(params, vol, chunk, compute_dtype)
    m, h, w = dense.shape
    pairs = dense.reshape(m, h, w // 2, 2)
    return pairs[..., 0] | (pairs[..., 1] << 4)


def unpack_nibbles(packed: np.ndarray) -> np.ndarray:
    """(M, H, W/2) uint8 nibble pairs → (M, H, W) uint8 class map (host)."""
    lo = packed & 0x0F
    hi = packed >> 4
    return np.stack([lo, hi], axis=-1).reshape(packed.shape[:-1] + (packed.shape[-1] * 2,))


@functools.partial(jax.jit, static_argnames=("chunk", "compute_dtype"))
def volume_argmax_pair(
    params_a, params_b, vol: jnp.ndarray, chunk: int, compute_dtype
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dual-model single dispatch: both U-Nets over the same slice stack.

    The reference's fused LTRCLobes_R231 mode preprocesses and dispatches the
    volume twice (/root/reference/lungmask/mask.py:225-227); here base and
    fill models run inside ONE program sharing the resident input — one
    dispatch overhead, interleaved chunk-by-chunk so peak activation memory
    matches the single-model path.
    """
    m, h, w = vol.shape
    chunks = vol.reshape(m // chunk, chunk, h, w, 1)

    def f(c):
        a = unet.unet_argmax(params_a, c, compute_dtype=compute_dtype)
        b = unet.unet_argmax(params_b, c, compute_dtype=compute_dtype)
        return a, b

    out_a, out_b = jax.lax.map(f, chunks)
    return out_a.reshape(m, h, w), out_b.reshape(m, h, w)


class UNetRunner:
    """Holds device-resident parameters and the compiled volume forward."""

    def __init__(
        self,
        params,
        n_classes: int,
        batch_size: int = 20,
        compute_dtype=jnp.float32,
    ):
        self.params = _cast_kernels(
            jax.tree_util.tree_map(jnp.asarray, params), compute_dtype
        )
        self.n_classes = n_classes
        self.batch_size = int(batch_size)
        self.compute_dtype = compute_dtype

    def run(self, slices: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W) normalized slices → (N, H, W) uint8 class map.

        N pads up to a power-of-two number of chunks (zero slices, dropped
        after) so arbitrary volume lengths hit a handful of compiled programs
        — compilation is expensive on remote-attached TPUs, padded compute is
        ~milliseconds. One device dispatch for the whole stack.
        """
        n = slices.shape[0]
        b = self.batch_size
        n_chunks = max(1, -(-n // b))
        n_chunks = 1 << (n_chunks - 1).bit_length()  # next power of two
        n_pad = n_chunks * b
        if n_pad != n:
            slices = jnp.concatenate(
                [slices, jnp.zeros((n_pad - n,) + slices.shape[1:], slices.dtype)]
            )
        return volume_argmax(self.params, slices, b, self.compute_dtype)[:n]

    def run_numpy(self, slices) -> np.ndarray:
        """Like :func:`run` but fetches the result to the host with the
        download overlapped against compute: the (power-of-two-padded) stack
        splits into two half-size dispatches and the first half's download
        runs while the second half executes (+~25% measured on the
        tunnel-attached v5e). Halving stays within the same power-of-two shape
        family, so no extra program shapes are introduced.
        """
        slices = jnp.asarray(slices)
        n = slices.shape[0]
        b = self.batch_size
        n_chunks = max(1, -(-n // b))
        n_chunks = 1 << (n_chunks - 1).bit_length()
        n_pad = n_chunks * b
        if n_pad != n:
            slices = jnp.concatenate(
                [slices, jnp.zeros((n_pad - n,) + slices.shape[1:], slices.dtype)]
            )
        packed_ok = slices.shape[2] % 2 == 0 and self.n_classes <= 16
        fwd = volume_argmax_packed if packed_ok else volume_argmax
        if n_chunks < 2:
            out = np.asarray(fwd(self.params, slices, b, self.compute_dtype))
            return (unpack_nibbles(out) if packed_ok else out)[:n]
        half = n_pad // 2
        o1 = fwd(self.params, slices[:half], b, self.compute_dtype)
        o2 = fwd(self.params, slices[half:], b, self.compute_dtype)
        a1 = np.asarray(o1)
        a2 = np.asarray(o2)
        out = np.concatenate([a1, a2], axis=0)
        return (unpack_nibbles(out) if packed_ok else out)[:n]
