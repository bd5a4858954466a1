"""Pallas TPU kernel: the fused per-slice bodymask pipeline.

Fuses the reference's per-slice bodymask chain
(/root/reference/lungmask/utils.py:55-80: threshold > −500 HU → binary closing
→ hole fill → erosion ×2 → connected components) into ONE kernel per 128²
slice, gridded over the slice axis. The two iterative stages (border-seeded
flood fill and min-label propagation) run entirely in VMEM — under plain XLA
each ``while_loop`` iteration round-trips its 128² carries through HBM; here a
slice's working set (a few int32 128² planes ≈ 200 KB) stays on-chip for the
whole pipeline.

Mosaic-specific choices: binary masks are carried as int32 0/1 planes
(morphology = min/max over zero-filled shifts) because i1 vector
concatenates/pads are unsupported ("invalid vector register cast"); the mask
output is uint8.

Output: int32 component labels (root = raster-first linear index + 1, matching
``ops.cc.label(mask, connectivity=1)`` exactly) plus the post-erosion mask,
from which the caller computes areas / largest component / dilation with
ordinary XLA ops (segment-sum reductions don't fit the VMEM model well and
are cheap outside). Numerically identical to the XLA path — asserted in
tests/test_pallas.py via interpreter mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu is importable on non-TPU backends; guard anyway
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

BODY_THRESHOLD = -500  # HU (reference utils.py:66)
N = 128  # bodymask resolution (reference utils.py:68)


def _shift2(x, dy: int, dx: int):
    """Zero-fill shift of an (N, N) int32 block."""
    zero = jnp.zeros((), x.dtype)
    if dy:
        pad = jnp.full((abs(dy), N), zero, x.dtype)
        x = (
            jnp.concatenate([pad, x[:-dy]], 0)
            if dy > 0
            else jnp.concatenate([x[-dy:], pad], 0)
        )
    if dx:
        pad = jnp.full((N, abs(dx)), zero, x.dtype)
        x = (
            jnp.concatenate([pad, x[:, :-dx]], 1)
            if dx > 0
            else jnp.concatenate([x[:, -dx:], pad], 1)
        )
    return x


_CROSS = ((1, 0), (-1, 0), (0, 1), (0, -1))
_FULL = ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1))


def _dilate_i(m, offsets):
    out = m
    for dy, dx in offsets:
        out = jnp.maximum(out, _shift2(m, dy, dx))
    return out


def _erode_i(m, offsets):
    out = m
    for dy, dx in offsets:
        out = jnp.minimum(out, _shift2(m, dy, dx))
    return out


def _bodymask_kernel(hu_ref, labels_ref, mask_ref):
    x = hu_ref[0]  # (N, N) float32 block
    mask = (x > jnp.float32(BODY_THRESHOLD)).astype(jnp.int32)

    # binary_closing, cross structure (scipy default)
    mask = _erode_i(_dilate_i(mask, _CROSS), _CROSS)

    # binary_fill_holes, 3×3 full structure: flood the complement from the
    # border, then holes = unreached complement.
    outside = 1 - mask
    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    border = (
        (row == 0) | (row == N - 1) | (col == 0) | (col == N - 1)
    ).astype(jnp.int32)
    seed = border * outside

    def fill_cond(state):
        return state[1]

    def fill_body(state):
        reached, _ = state
        grown = _dilate_i(reached, _FULL) * outside
        return grown, jnp.any(grown != reached)

    reached, _ = lax.while_loop(fill_cond, fill_body, (seed, jnp.bool_(True)))
    mask = jnp.maximum(mask, outside * (1 - reached))

    # binary_erosion ×2, cross
    mask = _erode_i(_erode_i(mask, _CROSS), _CROSS)
    mask_ref[0] = mask.astype(jnp.uint8)

    # Connected components, 4-connectivity: min-label propagation in VMEM.
    lin = row * N + col + 1
    labels0 = lin * mask
    big = jnp.int32(2**31 - 1)

    def cc_cond(state):
        return state[1]

    def cc_body(state):
        labels, _ = state
        out = labels
        for dy, dx in _CROSS:
            shifted = _shift2(labels, dy, dx)
            cand = jnp.where(shifted > 0, shifted, big)
            out = jnp.minimum(out, cand)
        new = out * mask
        return new, jnp.any(new != labels)

    labels, _ = lax.while_loop(cc_cond, cc_body, (labels0, jnp.bool_(True)))
    labels_ref[0] = labels


def bodymask_labels_pallas(small: jnp.ndarray, interpret: bool = False):
    """(B, 128, 128) HU slices → (labels int32, eroded mask bool), fused.

    Labels are 4-connectivity components of the post-erosion mask with
    root = raster-first linear index + 1 (identical to ``cc.label(mask, 1)``).
    """
    b = small.shape[0]
    assert small.shape[1:] == (N, N)
    kwargs = {}
    mem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=8 * 1024 * 1024
        )
    labels, mask_u8 = pl.pallas_call(
        _bodymask_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, N, N), lambda i: (i, 0, 0), memory_space=mem)],
        out_specs=(
            pl.BlockSpec((1, N, N), lambda i: (i, 0, 0), memory_space=mem),
            pl.BlockSpec((1, N, N), lambda i: (i, 0, 0), memory_space=mem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, N, N), jnp.int32),
            jax.ShapeDtypeStruct((b, N, N), jnp.uint8),
        ),
        interpret=interpret,
        **kwargs,
    )(small.astype(jnp.float32))
    return labels, mask_u8.astype(jnp.bool_)
