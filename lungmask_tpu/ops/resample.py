"""Device-side resampling with exact ``scipy.ndimage.zoom`` semantics.

The reference's geometry transforms are all ``scipy.ndimage.zoom`` calls with
spline orders 0 (nearest) and 1 (linear):

* bodymask down/up-zoom to/from 128² — /root/reference/lungmask/utils.py:68,82
* crop→256² slice resize (order=1)   — /root/reference/lungmask/utils.py:108-110
* mask paste-back (order=0)          — /root/reference/lungmask/utils.py:127

``jax.image.resize`` uses half-pixel-center coordinates and therefore does NOT
match scipy (SURVEY §7 hard part #1). scipy's ``zoom`` with ``grid_mode=False``
maps output index ``i`` on an axis to input coordinate

    cc(i) = i * float64((in_size - 1) / (out_size - 1))    (0 when out_size == 1)

computed in float64, and — crucially — treats ``cc > in_size - 1`` as
*out of bounds*, filling with ``cval=0``. Because the float64 division can
round upward, the LAST output sample along an axis is zeroed for some shape
pairs (e.g. 128→91). This quirk is part of the reference's observable behavior
and is replicated bit-exactly here (verified against scipy over hundreds of
random shape pairs in tests/test_resample.py).

Strategy: the gather *plan* (indices, weights, out-of-bounds mask) is computed
on the host in float64 — exactly scipy's arithmetic — either at trace time
(static shapes) or per volume from concrete bounding boxes (a few hundred
int32s, a negligible transfer). The plan is applied on device as batched
gathers that XLA fuses with surrounding elementwise work. For the fully-traced
single-dispatch path (benchmarks, ``__graft_entry__``), float32 on-device
variants are provided; they can differ from scipy only at the last sample of an
axis when the float64 rounding direction disagrees, which the exact path avoids.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def zoom_output_shape(in_shape: Sequence[int], zoom_factors) -> Tuple[int, ...]:
    """Output shape of ``scipy.ndimage.zoom``: ``round(in * zoom)`` per axis,
    with Python (banker's) rounding."""
    zoom_factors = np.broadcast_to(
        np.asarray(zoom_factors, dtype=np.float64), (len(in_shape),)
    )
    return tuple(int(round(s * z)) for s, z in zip(in_shape, zoom_factors))


# ---------------------------------------------------------------------------
# Host-side exact plans (float64, scipy-identical arithmetic)
# ---------------------------------------------------------------------------


def _axis_coords_np(in_size: int, out_size: int) -> np.ndarray:
    if out_size == 1:
        return np.zeros(1, dtype=np.float64)
    zoom = np.float64(in_size - 1) / np.float64(out_size - 1)
    return np.arange(out_size, dtype=np.float64) * zoom


def _axis_plan_np(in_size: int, out_size: int, order: int):
    """Exact per-axis gather plan.

    Returns ``(idx, oob)`` for order 0 and ``(lo, hi, w, oob)`` for order 1,
    as numpy arrays. ``oob`` marks samples scipy fills with cval=0.
    """
    cc = _axis_coords_np(in_size, out_size)
    oob = (cc > in_size - 1) | (cc < 0)
    if order == 0:
        idx = np.clip(np.floor(cc + 0.5).astype(np.int32), 0, in_size - 1)
        return idx, oob
    lo = np.floor(cc).astype(np.int32)
    w = (cc - lo).astype(np.float32)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    return lo, hi, w, oob


def resize(x: jnp.ndarray, out_shape: Sequence[int], order: int) -> jnp.ndarray:
    """scipy-exact resize of all axes of ``x`` to ``out_shape`` (static shapes).

    order 0 = nearest (round half up), order 1 = separable linear. Linear
    output is float32; nearest preserves dtype. cval=0 at out-of-bounds
    samples, exactly like ``ndimage.zoom(..., mode='constant')``.
    """
    assert order in (0, 1), "only spline orders 0 and 1 are supported"
    assert len(out_shape) == x.ndim
    if order == 1 and not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    for axis, out_size in enumerate(out_shape):
        in_size = x.shape[axis]
        if in_size == out_size:
            continue
        bshape = [1] * x.ndim
        bshape[axis] = out_size
        if order == 0:
            idx, oob = _axis_plan_np(in_size, out_size, 0)
            x = jnp.take(x, jnp.asarray(idx), axis=axis)
            if oob.any():
                x = jnp.where(
                    jnp.asarray(oob).reshape(bshape), jnp.zeros((), x.dtype), x
                )
        else:
            lo, hi, w, oob = _axis_plan_np(in_size, out_size, 1)
            xl = jnp.take(x, jnp.asarray(lo), axis=axis)
            xh = jnp.take(x, jnp.asarray(hi), axis=axis)
            wj = jnp.asarray(w).reshape(bshape).astype(xl.dtype)
            x = xl * (1 - wj) + xh * wj
            if oob.any():
                x = jnp.where(
                    jnp.asarray(oob).reshape(bshape), jnp.zeros((), x.dtype), x
                )
    return x


# ---------------------------------------------------------------------------
# Per-volume batched crop-resize / paste-back plans (exact, host-planned)
# ---------------------------------------------------------------------------


def crop_resize_plan(
    boxes: np.ndarray, out_shape: Tuple[int, int], order: int = 1
) -> Dict[str, jnp.ndarray]:
    """Plan for batched ``img[r0:r1, c0:c1]`` crop + scipy-exact resize.

    Equivalent to the reference's per-slice crop-then-zoom
    (/root/reference/lungmask/utils.py:107-110) with the crop folded into the
    gather indices (absolute coordinates = box origin + within-crop plan).

    Args:
        boxes: (N, 4) int array of (r0, c0, r1, c1), half-open.
        out_shape: target (H, W), e.g. (256, 256).
    Returns:
        dict of (N, out) index/weight/oob arrays per axis, device-ready.
    """
    boxes = np.asarray(boxes, dtype=np.int64)
    n = boxes.shape[0]
    out_h, out_w = out_shape
    plan = {k: [] for k in ("rlo", "rhi", "rw", "roob", "clo", "chi", "cw", "coob")}
    for b in range(n):
        r0, c0, r1, c1 = boxes[b]
        for (start, size, out_size, pre) in (
            (r0, r1 - r0, out_h, "r"),
            (c0, c1 - c0, out_w, "c"),
        ):
            if order == 0:
                idx, oob = _axis_plan_np(int(size), out_size, 0)
                lo = hi = idx + int(start)
                w = np.zeros(out_size, dtype=np.float32)
            else:
                lo, hi, w, oob = _axis_plan_np(int(size), out_size, 1)
                lo = lo + int(start)
                hi = hi + int(start)
            plan[pre + "lo"].append(lo.astype(np.int32))
            plan[pre + "hi"].append(hi.astype(np.int32))
            plan[pre + "w"].append(w)
            plan[pre + "oob"].append(oob)
    return {k: jnp.asarray(np.stack(v)) for k, v in plan.items()}


def apply_crop_resize(imgs: jnp.ndarray, plan: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Apply a :func:`crop_resize_plan` to a (N, H, W) batch on device."""

    def one(img, rlo, rhi, rw, roob, clo, chi, cw, coob):
        imgf = img if jnp.issubdtype(img.dtype, jnp.floating) else img.astype(jnp.float32)
        top = imgf[rlo] * (1 - rw)[:, None] + imgf[rhi] * rw[:, None]
        out = top[:, clo] * (1 - cw)[None, :] + top[:, chi] * cw[None, :]
        oob = roob[:, None] | coob[None, :]
        return jnp.where(oob, 0.0, out)

    return jax.vmap(one)(
        imgs,
        plan["rlo"], plan["rhi"], plan["rw"], plan["roob"],
        plan["clo"], plan["chi"], plan["cw"], plan["coob"],
    )


def paste_plan(
    boxes: np.ndarray, mask_shape: Tuple[int, int], canvas_shape: Tuple[int, int]
) -> Dict[str, jnp.ndarray]:
    """Plan for the batched inverse: nearest-zoom each (mh, mw) mask to its box
    and paste into a zero (H, W) canvas — the reference's per-slice
    ``reshape_mask`` (/root/reference/lungmask/utils.py:114-129) as one gather.

    For canvas position y in [r0, r1): source row = order-0 plan of
    zoom((mh,) → (r1-r0,)) evaluated at y - r0; outside the box (or scipy-oob)
    the canvas is 0.
    """
    boxes = np.asarray(boxes, dtype=np.int64)
    mh, mw = mask_shape
    h, w = canvas_shape
    ridx = np.zeros((boxes.shape[0], h), dtype=np.int32)
    rval = np.zeros((boxes.shape[0], h), dtype=bool)
    cidx = np.zeros((boxes.shape[0], w), dtype=np.int32)
    cval = np.zeros((boxes.shape[0], w), dtype=bool)
    for b, (r0, c0, r1, c1) in enumerate(boxes):
        for (start, stop, src, canvas, idx_arr, val_arr) in (
            (r0, r1, mh, h, ridx, rval),
            (c0, c1, mw, w, cidx, cval),
        ):
            size = int(stop - start)
            if size <= 0:
                continue
            idx, oob = _axis_plan_np(src, size, 0)
            span = slice(int(start), int(stop))
            idx_arr[b, span] = idx
            val_arr[b, span] = ~oob
    return {
        "ridx": jnp.asarray(ridx),
        "rval": jnp.asarray(rval),
        "cidx": jnp.asarray(cidx),
        "cval": jnp.asarray(cval),
    }


def apply_paste(masks: jnp.ndarray, plan: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Apply a :func:`paste_plan` to a (N, mh, mw) mask batch on device."""

    def one(mask, ridx, rval, cidx, cval):
        gathered = mask[ridx][:, cidx]
        inside = rval[:, None] & cval[None, :]
        return jnp.where(inside, gathered, jnp.zeros((), mask.dtype))

    return jax.vmap(one)(masks, plan["ridx"], plan["rval"], plan["cidx"], plan["cval"])


def paste_masks_host(
    masks: np.ndarray, boxes: np.ndarray, canvas_shape: Tuple[int, int]
) -> np.ndarray:
    """Host-side batched reshape_mask — identical semantics to
    :func:`paste_plan` + :func:`apply_paste` but in numpy.

    The postprocessed mask stack lives on the host (postprocessing is a host
    stage), so pasting there avoids an upload + full-resolution download per
    volume; on remote-attached TPUs that round trip costs more than the
    gather itself. uint8 stacks dispatch to the native core (lm_paste_masks,
    one GIL-free pass — the numpy loop below was the e2e long pole under
    host contention); the numpy path is the differential oracle and the
    fallback for exotic dtypes.
    """
    masks = np.asarray(masks)
    if masks.dtype == np.uint8 and masks.ndim == 3:
        from lungmask_tpu.ops import native

        out = native.paste_masks(masks, boxes, canvas_shape)
        if out is not None:
            return out
    return paste_masks_numpy(masks, boxes, canvas_shape)


def paste_masks_numpy(
    masks: np.ndarray, boxes: np.ndarray, canvas_shape: Tuple[int, int]
) -> np.ndarray:
    """The numpy reference implementation of :func:`paste_masks_host` — the
    differential oracle for the native and device paste paths."""
    masks = np.asarray(masks)
    boxes = np.asarray(boxes, dtype=np.int64)
    n, mh, mw = masks.shape
    h, w = canvas_shape
    out = np.zeros((n, h, w), dtype=masks.dtype)
    for i, (r0, c0, r1, c1) in enumerate(boxes):
        bh, bw = int(r1 - r0), int(c1 - c0)
        if bh <= 0 or bw <= 0:
            continue
        ridx, roob = _axis_plan_np(mh, bh, 0)
        cidx, coob = _axis_plan_np(mw, bw, 0)
        block = masks[i][np.ix_(ridx, cidx)]
        if roob.any() or coob.any():
            block = block.copy()
            block[roob, :] = 0
            block[:, coob] = 0
        out[i, r0:r1, c0:c1] = block
    return out


# ---------------------------------------------------------------------------
# Fully-traced variants (float32 coordinates on device; used by the pure-jit
# single-dispatch path where boxes are traced values)
# ---------------------------------------------------------------------------


def _box_axis_coords(start, size, out_size: int, dtype=jnp.float32):
    i = jnp.arange(out_size, dtype=dtype)
    size = jnp.asarray(size, dtype)
    denom = jnp.maximum(jnp.asarray(out_size - 1, dtype), 1.0)
    scale = jnp.where(out_size > 1, (size - 1) / denom, 0.0)
    return i * scale, jnp.asarray(start, jnp.int32)


def resize_from_box(
    img: jnp.ndarray,
    box: jnp.ndarray,
    out_shape: Tuple[int, int],
    order: int,
) -> jnp.ndarray:
    """Fused dynamic crop + resize with traced box (float32 coordinates).

    Matches :func:`apply_crop_resize` everywhere except possibly the final
    sample of an axis when float32/float64 edge rounding disagree.
    """
    assert order in (0, 1)
    r0, c0, r1, c1 = box[0], box[1], box[2], box[3]
    out_h, out_w = out_shape
    cr, rbase = _box_axis_coords(r0, r1 - r0, out_h)
    cc, cbase = _box_axis_coords(c0, c1 - c0, out_w)
    if order == 0:
        ri = jnp.floor(cr + 0.5).astype(jnp.int32) + rbase
        ci = jnp.floor(cc + 0.5).astype(jnp.int32) + cbase
        return img[jnp.clip(ri, 0, img.shape[0] - 1)][:, jnp.clip(ci, 0, img.shape[1] - 1)]
    imgf = img if jnp.issubdtype(img.dtype, jnp.floating) else img.astype(jnp.float32)
    rlo = jnp.floor(cr).astype(jnp.int32)
    clo = jnp.floor(cc).astype(jnp.int32)
    rw = (cr - rlo.astype(cr.dtype)).astype(imgf.dtype)
    cw = (cc - clo.astype(cc.dtype)).astype(imgf.dtype)
    rlo = rlo + rbase
    clo = clo + cbase
    rhi = jnp.clip(rlo + 1, 0, img.shape[0] - 1)
    chi = jnp.clip(clo + 1, 0, img.shape[1] - 1)
    rlo = jnp.clip(rlo, 0, img.shape[0] - 1)
    clo = jnp.clip(clo, 0, img.shape[1] - 1)
    top = imgf[rlo] * (1 - rw)[:, None] + imgf[rhi] * rw[:, None]
    return top[:, clo] * (1 - cw)[None, :] + top[:, chi] * cw[None, :]


def paste_resized_into_box(
    mask: jnp.ndarray,
    box: jnp.ndarray,
    canvas_shape: Tuple[int, int],
) -> jnp.ndarray:
    """Fully-traced reshape_mask (float32 coordinates, traced box)."""
    h, w = canvas_shape
    mh, mw = mask.shape
    r0, c0, r1, c1 = box[0], box[1], box[2], box[3]
    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)

    def src_idx(pos, start, box_size, src_size):
        j = (pos - start).astype(jnp.float32)
        denom = jnp.maximum((box_size - 1).astype(jnp.float32), 1.0)
        scale = jnp.where(box_size > 1, (src_size - 1) / denom, 0.0)
        c = j * scale
        return jnp.clip(jnp.floor(c + 0.5).astype(jnp.int32), 0, src_size - 1)

    ri = src_idx(rows, r0, r1 - r0, mh)
    ci = src_idx(cols, c0, c1 - c0, mw)
    gathered = mask[ri][:, ci]
    inside = ((rows >= r0) & (rows < r1))[:, None] & ((cols >= c0) & (cols < c1))[None, :]
    return jnp.where(inside, gathered, jnp.zeros((), mask.dtype))
