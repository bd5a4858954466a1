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


@functools.partial(jax.jit, static_argnames=("chunk", "compute_dtype"))
def volume_argmax_packed2(params, vol: jnp.ndarray, chunk: int, compute_dtype) -> jnp.ndarray:
    """:func:`volume_argmax` crumb-packed: four 2-bit pixels per byte →
    (M, H, W/4) uint8. Quarter-size mask transfer for ≤4-class models (R231
    and R231CovidWeb have 3). Unpack with :func:`unpack_crumbs`."""
    dense = volume_argmax(params, vol, chunk, compute_dtype)
    m, h, w = dense.shape
    quads = dense.reshape(m, h, w // 4, 4)
    return (
        quads[..., 0]
        | (quads[..., 1] << 2)
        | (quads[..., 2] << 4)
        | (quads[..., 3] << 6)
    )


# Byte → unpacked-pixels lookup tables: one vectorized gather per volume
# beats per-bitfield shift+stack by ~3× on the host CPU (the unpack sits on
# the single-volume latency path right after the overlapped downloads).
_NIBBLE_LUT = np.stack(
    [np.arange(256, dtype=np.uint8) & 0x0F, np.arange(256, dtype=np.uint8) >> 4],
    axis=-1,
)
_CRUMB_LUT = np.stack(
    [(np.arange(256, dtype=np.uint8) >> s) & 0x03 for s in (0, 2, 4, 6)], axis=-1
)


def unpack_nibbles(packed: np.ndarray) -> np.ndarray:
    """(M, H, W/2) uint8 nibble pairs → (M, H, W) uint8 class map (host)."""
    from lungmask_tpu.ops import native

    out = native.unpack_bits(packed, 4)
    if out is not None:
        return out
    return _NIBBLE_LUT[packed].reshape(packed.shape[:-1] + (packed.shape[-1] * 2,))


def unpack_crumbs(packed: np.ndarray) -> np.ndarray:
    """(M, H, W/4) uint8 2-bit quads → (M, H, W) uint8 class map (host)."""
    from lungmask_tpu.ops import native

    out = native.unpack_bits(packed, 2)
    if out is not None:
        return out
    return _CRUMB_LUT[packed].reshape(packed.shape[:-1] + (packed.shape[-1] * 4,))


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


def _pack_bits_device(dense: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack a uint8 class map along the last axis: 2 bits (4 px/byte) or
    4 bits (2 px/byte); 8 = passthrough."""
    if bits == 8:
        return dense
    m, h, w = dense.shape
    per = 8 // bits
    groups = dense.reshape(m, h, w // per, per)
    out = groups[..., 0]
    for i in range(1, per):
        out = out | (groups[..., i] << (bits * i))
    return out


def pack_bits_for(n_classes: int, width: int) -> int:
    """Packing width for a class count: the device-side mask transfer is the
    dominant host↔device cost on tunnel-attached TPUs, so masks travel at 2
    bits/pixel (≤4 classes), 4 (≤16), or dense."""
    if width % 4 == 0 and n_classes <= 4:
        return 2
    if width % 2 == 0 and n_classes <= 16:
        return 4
    return 8


def unpack_bits_np(packed: np.ndarray, bits: int) -> np.ndarray:
    if bits == 8:
        return np.asarray(packed)
    return unpack_crumbs(packed) if bits == 2 else unpack_nibbles(packed)


@functools.partial(
    jax.jit, static_argnames=("chunk", "compute_dtype", "bits_a", "bits_b")
)
def volume_argmax_pair_packed(
    params_a, params_b, vol: jnp.ndarray, chunk: int, compute_dtype,
    bits_a: int, bits_b: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`volume_argmax_pair` with each class map bit-packed on device by
    its own class count (LTRCLobes needs 4 bits, R231 2): the fused path's
    dense dual download (2×H×W bytes per slice) is the single biggest
    host↔device transfer in the pipeline — packing cuts it 2-4×."""
    a, b = volume_argmax_pair(params_a, params_b, vol, chunk, compute_dtype)
    return _pack_bits_device(a, bits_a), _pack_bits_device(b, bits_b)


DEFAULT_CHUNK = 32  # measured MXU sweet spot on v5e (+16% over the
# reference's batch 20 at 256²; 40/64 plateau at the same rate)


def bucket_chunks(n_chunks: int) -> int:
    """Smallest value ≥ n_chunks of the form {1,2,3,5}·2^k.

    Each distinct ``lax.map`` length is a separate XLA program (compiles cost
    tens of seconds on remote-attached TPUs), so slice counts pad up to a
    small shape family. The {1,2,3,5}·2^k family keeps the worst-case padding
    at ~33% (the gaps 3→4 and 6→8; the previous power-of-two family wasted up
    to 78% — e.g. a 192-slice volume at chunk 20 padded to 320).
    """
    n = max(1, int(n_chunks))
    best = None
    for base in (1, 2, 3, 5):
        k = 0
        while base << k < n:
            k += 1
        cand = base << k
        if best is None or cand < best:
            best = cand
    return best


def split_parts(n_chunks: int):
    """Decompose a chunk count into 2- and 3-chunk parts (one dispatch each)
    so every part's download overlaps the later parts' compute.

    Measured on the tunnel-attached v5e (320 slices, chunk 32): one dispatch
    679 slices/s, two halves 800, 2-chunk parts 886 — the download and
    dispatch tail hides behind compute once parts are small, while parts of
    ≥2 chunks keep the per-dispatch overhead (~30 ms here) amortized. Only
    three program shapes ({1,2,3} chunks) ever compile for the split path.
    """
    n = int(n_chunks)
    if n <= 3:
        return [n] if n else []
    parts = [2] * (n // 2)
    if n % 2:
        parts[-1] = 3
    return parts


class UNetRunner:
    """Holds device-resident parameters and the compiled volume forward."""

    def __init__(
        self,
        params,
        n_classes: int,
        batch_size=None,
        compute_dtype=jnp.float32,
    ):
        """``batch_size=None`` (the default) picks the TPU-tuned chunk
        (DEFAULT_CHUNK); an explicit value is honored exactly — it is the
        user's activation-memory bound, like the reference's batch size
        (/root/reference/lungmask/mask.py:79,173)."""
        # Host allocator policy matters here, not just in LMInferer: the
        # mask downloads/unpacks allocate tens-of-MB host buffers per call,
        # and glibc's default mmap-above-32MB policy re-faults every page on
        # every call — measured ~30 MB/s first-touch fault bandwidth on the
        # bench VM, which turned the k=4 stacked-volume unpack (84 MB) into
        # a 3.7 s stall. Retaining the heap makes repeat calls reuse pages.
        from lungmask_tpu.runtime import tune_host_allocator

        tune_host_allocator()
        self.params = _cast_kernels(
            jax.tree_util.tree_map(jnp.asarray, params), compute_dtype
        )
        self.n_classes = n_classes
        self.batch_size = DEFAULT_CHUNK if batch_size is None else int(batch_size)
        self.compute_dtype = compute_dtype

    def _pad(self, slices: jnp.ndarray):
        n = slices.shape[0]
        b = self.batch_size
        n_chunks = bucket_chunks(-(-n // b))
        n_pad = n_chunks * b
        if n_pad != n:
            slices = jnp.concatenate(
                [slices, jnp.zeros((n_pad - n,) + slices.shape[1:], slices.dtype)]
            )
        return slices, n, n_chunks

    def run(self, slices: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W) normalized slices → (N, H, W) uint8 class map.

        N pads up to a bucketed number of chunks (zero slices, dropped after;
        see :func:`bucket_chunks`). One device dispatch for the whole stack.
        """
        slices, n, _ = self._pad(jnp.asarray(slices))
        return volume_argmax(self.params, slices, self.batch_size, self.compute_dtype)[:n]

    def _packing(self, width: int):
        # Single source of truth for the packing policy: pack_bits_for (the
        # fused path uses it directly).
        bits = pack_bits_for(self.n_classes, width)
        if bits == 2:
            return volume_argmax_packed2, unpack_crumbs
        if bits == 4:
            return volume_argmax_packed, unpack_nibbles
        return volume_argmax, lambda x: x

    def run_numpy(self, slices) -> np.ndarray:
        """Like :func:`run` but fetches the result to the host with downloads
        overlapped against compute: the padded stack splits into 2-3-chunk
        dispatches, all enqueued up front, fetched in order — each part's
        download hides behind the later parts' compute (+30% over one
        dispatch measured on the tunnel-attached v5e, see
        :func:`split_parts`). Masks are bit-packed on device (2 bits/pixel
        for ≤4-class models, 4 bits for ≤16) — dense downloads would cost as
        much as the U-Net compute itself on this link.
        """
        slices, n, n_chunks = self._pad(jnp.asarray(slices))
        b = self.batch_size
        fwd, unpack = self._packing(slices.shape[2])
        outs = []
        start = 0
        for p in split_parts(n_chunks):
            outs.append(fwd(self.params, slices[start : start + p * b], b, self.compute_dtype))
            start += p * b
        out = np.concatenate([np.asarray(o) for o in outs], axis=0)
        return unpack(out)[:n]
