"""Binary morphology as shift/AND/OR networks — scipy.ndimage-exact, jit-friendly.

The reference's bodymask pipeline uses scipy binary morphology
(/root/reference/lungmask/utils.py:70-80) and its postprocessing dilates 3-D
region masks (/root/reference/lungmask/utils.py:317). scipy semantics
replicated here:

* default structuring element = ``generate_binary_structure(rank, 1)`` — the
  cross (4-neighborhood in 2-D, 6 in 3-D); ``np.ones((3,3))`` = the full
  8-neighborhood.
* ``border_value=0`` for both erosion and dilation (scipy default): out-of-
  bounds neighbors read as 0, so erosion eats the border and dilation brings
  nothing in. Implemented by shifting in zeros.
* ``binary_closing`` = dilation then erosion (both border 0, same structure).
* ``binary_fill_holes`` = border-seeded flood fill of the complement
  (scipy's implementation dilates a border seed inside ``~input`` until
  convergence); here a ``lax.while_loop`` of masked dilations.

Everything is pure elementwise/shift work on bool arrays — the VPU path — and
``vmap``s over slices.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _shift(x: jnp.ndarray, axis: int, offset: int) -> jnp.ndarray:
    """Shift ``x`` along ``axis`` by ``offset``, filling with 0/False."""
    if offset == 0:
        return x
    pad = [(0, 0)] * x.ndim
    if offset > 0:
        pad[axis] = (offset, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, x.shape[axis])
    else:
        pad[axis] = (0, -offset)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(-offset, x.shape[axis] - offset)
    return lax.pad(x, jnp.zeros((), x.dtype), [(p[0], p[1], 0) for p in pad])[tuple(sl)]


def _neighbor_offsets(rank: int, structure: str):
    """Offsets (excluding center) of the structuring element."""
    if structure == "cross":
        offs = []
        for axis in range(rank):
            for d in (-1, 1):
                o = [0] * rank
                o[axis] = d
                offs.append(tuple(o))
        return offs
    if structure == "full":
        import itertools

        return [
            o
            for o in itertools.product((-1, 0, 1), repeat=rank)
            if any(v != 0 for v in o)
        ]
    raise ValueError(f"unknown structure {structure!r}")


def _apply_offsets(x: jnp.ndarray, offsets) -> jnp.ndarray:
    """OR of ``x`` shifted by each offset (plus center)."""
    out = x
    for off in offsets:
        s = x
        for axis, d in enumerate(off):
            if d:
                s = _shift(s, axis, d)
        out = out | s
    return out


def binary_dilation(
    x: jnp.ndarray, structure: str = "cross", iterations: int = 1
) -> jnp.ndarray:
    x = x.astype(jnp.bool_)
    offs = _neighbor_offsets(x.ndim, structure)
    for _ in range(iterations):
        x = _apply_offsets(x, offs)
    return x


def binary_erosion(
    x: jnp.ndarray, structure: str = "cross", iterations: int = 1
) -> jnp.ndarray:
    # Erosion(x) == ~Dilation(~x) with border_value flipped; scipy's erosion
    # border_value=0 means out-of-bounds counts as background, i.e. the
    # complement's border is foreground — shifting zeros INTO ~x achieves the
    # same as ANDing with zero-filled shifts of x directly.
    x = x.astype(jnp.bool_)
    offs = _neighbor_offsets(x.ndim, structure)
    for _ in range(iterations):
        out = x
        for off in offs:
            s = x
            for axis, d in enumerate(off):
                if d:
                    s = _shift(s, axis, d)
            out = out & s
        x = out
    return x


def binary_closing(x: jnp.ndarray, structure: str = "cross") -> jnp.ndarray:
    return binary_erosion(binary_dilation(x, structure), structure)


def binary_fill_holes(x: jnp.ndarray, structure: str = "cross") -> jnp.ndarray:
    """Fill holes not reachable from the border (scipy binary_fill_holes).

    Default is the cross structure — matching the scipy function this
    replicates, so it stays a drop-in (a "full" default would silently leave
    diagonal-gap cavities unfilled that scipy fills). All in-repo callers
    pass ``structure`` explicitly.

    The reference calls this with ``structure=np.ones((3,3))`` i.e. ``"full"``
    (/root/reference/lungmask/utils.py:71); the 3-D postprocessing hole fill
    uses the default cross structure (fill_voids semantics, utils.py:352).

    Span-flood design: each ``while_loop`` round does one structuring-element
    reachability step, then **segmented OR-scans along every axis** — if any
    voxel of a maximal background run is reached, the scan reaches the whole
    run in one pass (the device analogue of scanline flood fill, and of the
    span flood in csrc/postproc.cpp::lm_fill_holes). Rounds ≈ number of bends
    in the cavity geometry instead of O(diameter) single-voxel dilations; all
    work is dense shift/scan VPU traffic, no gathers.

    Fixpoint exactness: scans only spread reachability within background runs
    (a chain of cross-neighbors ⊆ any structure's reachability), and if any
    reachable background voxel were still unreached at fixpoint, its frontier
    neighbor would flip it in the structuring-element step.
    """
    x = x.astype(jnp.bool_)
    outside = ~x
    # Border-seeded flood fill constrained to the complement.
    seed = jnp.zeros_like(outside)
    for axis in range(x.ndim):
        idx_lo = [slice(None)] * x.ndim
        idx_lo[axis] = 0
        idx_hi = [slice(None)] * x.ndim
        idx_hi[axis] = x.shape[axis] - 1
        seed = seed.at[tuple(idx_lo)].set(True).at[tuple(idx_hi)].set(True)
    seed = seed & outside
    offs = _neighbor_offsets(x.ndim, structure)

    # Run-continuation resets per axis (fwd: from i-1, bwd: from i+1).
    resets = [
        (~(outside & _shift(outside, axis, 1)), ~(outside & _shift(outside, axis, -1)))
        for axis in range(x.ndim)
    ]

    def sweep(reached):
        from lungmask_tpu.ops.cc import _seg_scan

        for axis in range(x.ndim):
            if x.shape[axis] == 1:
                continue
            rf, rb = resets[axis]
            fwd = _seg_scan(rf, reached, jnp.logical_or, False, axis)
            bwd = _seg_scan(rb, reached, jnp.logical_or, False, axis, reverse=True)
            reached = reached | (outside & (fwd | bwd))
        return reached

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        reached, _ = state
        grown = sweep(_apply_offsets(reached, offs) & outside)
        return grown, jnp.any(grown != reached)

    reached, _ = lax.while_loop(cond, body, (sweep(seed), jnp.bool_(True)))
    return x | (outside & ~reached)
