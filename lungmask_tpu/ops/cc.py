"""Device-side connected components: neighbor min-propagation accelerated by
segmented min-scans along every axis, fully inside ``jit``/``vmap``.

Used by the per-slice bodymask pipeline (the reference labels 128² bodymasks
per slice, /root/reference/lungmask/utils.py:75-78, and an 8-connectivity pass
at full slice resolution in crop_and_resize, utils.py:102) and by the
full-volume device postprocessing (transforms/postprocess_device.py,
replacing the 3-D skimage labeling at /root/reference/lungmask/utils.py:293).

Algorithm: every foreground pixel starts with label = its linear index + 1
(so a component's final label is its raster-first pixel index + 1, giving the
same scan-order component ordering as skimage — SURVEY §7 hard part #2). Each
``lax.while_loop`` iteration does

1. a one-step neighborhood min-propagation (labels flow between same-value
   neighbors — this is the only step that crosses runs/diagonals), then
2. a **segmented min-scan along each axis** (``lax.associative_scan`` forward
   + backward over same-value runs): the run minimum reaches every voxel of
   an axis-aligned run in one pass.

The sweeps propagate a label across an entire straight run per iteration, so
convergence is ~(number of bends in the component's geodesics) iterations —
single digits for anatomical shapes — instead of O(diameter). This design is
deliberately gather-free: the previous pointer-jumping contraction
(``label[label-1]``) cost ~125 ms *per iteration* in XLA TPU gathers over a
192×256² volume (~7 s/volume total, the round-2 device-postprocess
bottleneck); scans and shifts are dense, linear-traffic VPU work. A Pallas
block-local union-find was considered and rejected: union-find is serial
pointer-chasing, the one workload shape the VPU cannot vectorize, while the
scan fixpoint maps onto it perfectly.

At fixpoint the labeling is exact: if any same-value neighbor pair disagreed,
the neighbor step would lower one of them (labels only decrease, bounded
below by the component's raster-first index).

Components are identified by *root linear index*; the segment-sum helpers below
provide the region reductions the bodymask needs (areas, largest-component
masks with skimage-compatible tie-breaking, first-region bounding boxes).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

from lungmask_tpu.ops.morphology import _neighbor_offsets, _shift


def _shift_by(x: jnp.ndarray, off) -> jnp.ndarray:
    for axis, d in enumerate(off):
        if d:
            x = _shift(x, axis, d)
    return x


def _shift_fill(x: jnp.ndarray, axis: int, offset: int, fill) -> jnp.ndarray:
    """Shift along ``axis``, filling vacated positions with ``fill``."""
    pad = [(0, 0, 0)] * x.ndim
    sl = [slice(None)] * x.ndim
    if offset > 0:
        pad[axis] = (offset, 0, 0)
        sl[axis] = slice(0, x.shape[axis])
    else:
        pad[axis] = (0, -offset, 0)
        sl[axis] = slice(-offset, x.shape[axis] - offset)
    return lax.pad(x, jnp.asarray(fill, x.dtype), pad)[tuple(sl)]


def _seg_scan(reset: jnp.ndarray, value: jnp.ndarray, combine, identity,
              axis: int, reverse: bool = False) -> jnp.ndarray:
    """Segmented inclusive scan: ``value`` combined within runs, restarting
    wherever ``reset`` is True (True = this element does NOT continue the run
    from its predecessor in scan direction).

    Hillis-Steele doubling with plain shifts — deliberately NOT
    ``lax.associative_scan``: its slice-based lowering inside a fixpoint
    ``while_loop`` ballooned the postprocessing program to a 32 MB executable
    that took minutes to (re)load over the tunnel; the doubling form is the
    same O(n log n) work in ~log2(n) shift+where pairs of tiny HLO.
    """
    step = 1 if reverse else -1  # each element absorbs its predecessor side
    n = value.shape[axis]
    f, v = reset, value
    d = 1
    while d < n:
        f_prev = _shift_fill(f, axis, -step * d, True)
        v_prev = _shift_fill(v, axis, -step * d, identity)
        v = jnp.where(f, v, combine(v, v_prev))
        f = f | f_prev
        d *= 2
    return v


def label(image: jnp.ndarray, connectivity: Optional[int] = None) -> jnp.ndarray:
    """Connected components of a (possibly multi-class) integer/bool image.

    Returns int32 labels where each foreground component's label is
    (raster-first linear index + 1); background is 0. Same partition and
    scan-order component ordering as ``skimage.measure.label`` /
    ``cc_host.label`` (label *values* differ by a monotone renumbering, which
    none of the downstream reductions depend on).
    """
    ndim = image.ndim
    if connectivity is None:
        connectivity = ndim
    if connectivity not in (1, ndim):
        raise NotImplementedError("connectivity must be 1 or ndim")
    structure = "cross" if connectivity == 1 else "full"
    offsets = _neighbor_offsets(ndim, structure)

    is_binary = image.dtype == jnp.bool_
    fg = image if is_binary else image != 0
    lin = (jnp.arange(image.size, dtype=jnp.int32) + 1).reshape(image.shape)
    labels0 = jnp.where(fg, lin, 0)
    big = jnp.int32(2**31 - 1)

    # Per axis: does element i continue the same-value run from i-1 (fwd) /
    # from i+1 (bwd)? Precomputed once — geometry does not change.
    cont = []
    for axis in range(ndim):
        prev_ok = fg & _shift(fg, axis, 1)
        next_ok = fg & _shift(fg, axis, -1)
        if not is_binary:
            prev_ok &= image == _shift_by(image, tuple(1 if a == axis else 0 for a in range(ndim)))
            next_ok &= image == _shift_by(image, tuple(-1 if a == axis else 0 for a in range(ndim)))
        cont.append((~prev_ok, ~next_ok))

    def propagate(labels):
        out = labels
        for off in offsets:
            shifted = _shift_by(labels, off)
            ok = shifted > 0
            if not is_binary:
                ok = ok & (_shift_by(image, off) == image)
            cand = jnp.where(ok, shifted, big)
            out = jnp.minimum(out, cand)
        return jnp.where(fg, out, 0)

    def sweep(labels):
        out = labels
        for axis in range(ndim):
            if image.shape[axis] == 1:
                continue
            reset_fwd, reset_bwd = cont[axis]
            masked = jnp.where(fg, out, big)
            fwd = _seg_scan(reset_fwd, masked, jnp.minimum, big, axis)
            bwd = _seg_scan(reset_bwd, masked, jnp.minimum, big, axis, reverse=True)
            out = jnp.where(fg, jnp.minimum(jnp.minimum(fwd, bwd), out), 0)
        return out

    def body(state):
        labels, _ = state
        new = sweep(propagate(labels))
        return new, jnp.any(new != labels)

    labels, _ = lax.while_loop(lambda s: s[1], body, (sweep(labels0), jnp.bool_(True)))
    return labels


def areas_by_root(labels: jnp.ndarray) -> jnp.ndarray:
    """Component areas indexed by root label (1 + linear index of first pixel).

    Shape (size+1,); index 0 counts background.
    """
    flat = labels.reshape(-1)
    return jnp.zeros(labels.size + 1, jnp.int32).at[flat].add(1)


def largest_component_mask(labels: jnp.ndarray) -> jnp.ndarray:
    """Binary mask of the largest component; area ties broken by the
    scan-order-FIRST component (smallest root label) — matching np.argmax over
    skimage regions in simple_bodymask (/root/reference/lungmask/utils.py:78).
    Empty input → all-False."""
    areas = areas_by_root(labels).at[0].set(0)
    best_root = jnp.argmax(areas)  # argmax returns the smallest index on ties
    # All-background input: every area is 0 and argmax lands on root 0, which
    # would select the whole background — mask it to the documented all-False.
    return (labels == best_root) & (best_root > 0)


def largest_component_mask_last_tie(labels: jnp.ndarray) -> jnp.ndarray:
    """As above but area ties go to the scan-order-LAST component — matching
    the reference's np.argsort(areas)[-1] in keep_largest_connected_component
    (/root/reference/lungmask/utils.py:402)."""
    areas = areas_by_root(labels).at[0].set(0)
    n = areas.shape[0]
    best_root = n - 1 - jnp.argmax(areas[::-1])
    return labels == best_root


def bbox_of_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Tight bounding box (r0, c0, r1, c1 half-open) of a 2-D bool mask, with
    full-image fallback when empty — the reference's fallback at
    /root/reference/lungmask/utils.py:103-106."""
    h, w = mask.shape
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    ridx = jnp.arange(h, dtype=jnp.int32)
    cidx = jnp.arange(w, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    r0 = jnp.min(jnp.where(rows, ridx, big))
    r1 = jnp.max(jnp.where(rows, ridx, -1)) + 1
    c0 = jnp.min(jnp.where(cols, cidx, big))
    c1 = jnp.max(jnp.where(cols, cidx, -1)) + 1
    empty = ~jnp.any(rows)
    r0 = jnp.where(empty, 0, r0)
    r1 = jnp.where(empty, h, r1)
    c0 = jnp.where(empty, 0, c0)
    c1 = jnp.where(empty, w, c1)
    return jnp.stack([r0, c0, r1, c1]).astype(jnp.int32)


def first_component_bbox(labels: jnp.ndarray) -> jnp.ndarray:
    """Bounding box of the scan-order-first component (smallest root label) —
    the reference's ``reg[0].bbox`` in crop_and_resize
    (/root/reference/lungmask/utils.py:102-104), with full-image fallback."""
    pos = jnp.where(labels > 0, labels, jnp.int32(1 << 30))
    first_root = jnp.min(pos)
    return bbox_of_mask(labels == first_root)
