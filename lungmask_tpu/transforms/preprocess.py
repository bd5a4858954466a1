"""Device-side preprocessing: bodymask → crop box → 256² normalized slices.

TPU-native re-design of the reference's per-slice CPU loop
(/root/reference/lungmask/utils.py:32-111 driven from mask.py:166-168): the
whole volume is processed as one batched device program —

1. clip HU to [−1024, 600] (utils.py:45),
2. per-slice bodymask at 128²: threshold > −500 HU, binary closing, hole fill,
   erosion ×2, largest 4-connected component, dilation ×2 (utils.py:55-82) —
   ``vmap``ped over slices, all VPU work,
3. nearest-upzoom to slice resolution, 8-connected labeling, bounding box of
   the scan-order-first region (utils.py:98-106),
4. fused crop+bilinear-resize of each slice to 256² with scipy-exact gather
   plans (utils.py:107-110), including scipy's round-half-away integer cast
   for integer inputs,
5. intensity window and scale: min(x, 600), (x + 1024) / 1624 (mask.py:167-168).

Steps 1-3 and 4-5 are two ``jit`` programs separated by the one host
round-trip that ships the (N, 4) box array up to build the exact float64
resample plan (see ops/resample.py). A fully-traced single-dispatch variant
(:func:`preprocess_traced`) exists for benchmarking/compile-checking; it uses
float32 on-device resample coordinates.

Slice counts are padded to a bucket multiple so jit programs are reused across
volumes; padded slices are −1024 everywhere and are dropped after.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lungmask_tpu.ops import cc, morphology, resample

HU_LO = -1024
HU_HI = 600
BODY_THRESHOLD = -500
SLICE_BUCKET = 16


def _round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """scipy's integer-output cast for interpolated values: trunc(x ± 0.5)."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


def _bodymask128_from_labels(labels: jnp.ndarray, eroded: jnp.ndarray) -> jnp.ndarray:
    """Largest-region keep + dilation ×2 given CC labels of the eroded mask.

    Reference keeps the eroded mask untouched if no region exists
    (utils.py:77-80 guard)."""
    has_region = jnp.any(labels > 0)
    largest = cc.largest_component_mask(labels)
    dilated = morphology.binary_dilation(largest, iterations=2)
    return jnp.where(has_region, dilated, eroded)


def _bodymask128(small: jnp.ndarray) -> jnp.ndarray:
    """Bodymask pipeline on one 128² slice (already zoomed) — XLA path."""
    mask = small > BODY_THRESHOLD
    mask = morphology.binary_closing(mask)
    mask = morphology.binary_fill_holes(mask, structure="full")
    mask = morphology.binary_erosion(mask, iterations=2)
    labels = cc.label(mask, connectivity=1)
    return _bodymask128_from_labels(labels, mask)


def _bodymasks_batch(smalls: jnp.ndarray, use_pallas: bool) -> jnp.ndarray:
    """(B, 128, 128) HU → (B, 128, 128) bool bodymasks."""
    if use_pallas:
        from lungmask_tpu.ops.pallas.bodymask import bodymask_labels_pallas

        labels, eroded = bodymask_labels_pallas(smalls)
        return jax.vmap(_bodymask128_from_labels)(labels, eroded)
    return jax.vmap(_bodymask128)(smalls)


def default_use_pallas() -> bool:
    """The fused Pallas bodymask kernel is the default on TPU backends
    (opt out with LUNGMASK_TPU_PALLAS=0; opt in elsewhere with =1)."""
    import os

    flag = os.environ.get("LUNGMASK_TPU_PALLAS")
    if flag is not None:
        return flag != "0"
    return jax.default_backend() == "tpu"


def _upzoom_box_tables(src: int, dst: int):
    """Static table for mapping a component bbox through an order-0 upzoom:
    idx[i] is the 128-grid source index of output row i, with scipy-oob rows
    (always trailing, zero-filled — see ops/resample.py) replaced by a
    sentinel so they never fall inside a box."""
    idx, oob = resample._axis_plan_np(src, dst, 0)
    idx = idx.astype(np.int32)
    idx[oob] = src  # sentinel: beyond any source row
    return jnp.asarray(idx)


def _box_from_mask(shape, mask128: jnp.ndarray) -> jnp.ndarray:
    """Crop box (r0, c0, r1, c1) of one slice given its 128² bodymask.

    The reference nearest-upzooms the bodymask to slice resolution, relabels
    at full resolution (8-conn) and takes the first region's bbox
    (utils.py:82,98-106). For upzooms, nearest resampling with monotone index
    maps preserves 8-connectivity components *bijectively* (output-adjacent
    pixels come from source pixels differing by ≤1 per axis, and every source
    row/col appears), and scan order is preserved — so the first full-res
    component is the image of the first 128² component and its bbox is the
    exact preimage-range of the source bbox. That makes the full-resolution
    connected-components pass (the most expensive device op in preprocessing)
    unnecessary: label at 128² and map the bbox through the static zoom index
    tables. Slices smaller than 128² (a downzoom, where components can merge
    or vanish) fall back to full-res labeling.
    """
    h, w = shape

    if h < 128 or w < 128:
        mask_full = resample.resize(mask128, (h, w), order=0)
        labels = cc.label(mask_full)  # 8-connectivity (ndim default)
        return cc.first_component_bbox(labels)

    labels = cc.label(mask128)  # 8-connectivity at 128²
    box128 = cc.first_component_bbox(labels)
    ridx = _upzoom_box_tables(128, h)
    cidx = _upzoom_box_tables(128, w)
    r0 = jnp.searchsorted(ridx, box128[0], side="left")
    r1 = jnp.searchsorted(ridx, box128[2] - 1, side="right")
    c0 = jnp.searchsorted(cidx, box128[1], side="left")
    c1 = jnp.searchsorted(cidx, box128[3] - 1, side="right")
    mapped = jnp.stack([r0, c0, r1, c1]).astype(jnp.int32)
    # Empty bodymask → reference falls back to the full image (utils.py:103-106).
    has_region = jnp.any(labels > 0)
    full = jnp.asarray([0, 0, h, w], jnp.int32)
    return jnp.where(has_region, mapped, full)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def _boxes_for_volume(raw: jnp.ndarray, use_pallas: bool = False) -> jnp.ndarray:
    """Crop boxes from a RAW (unclipped) HU volume — the clip runs on device
    (elementwise, fused into the resize gather) so the host never copies the
    volume for clipping."""
    clipped = jnp.clip(raw, HU_LO, HU_HI)
    shape = clipped.shape[1:]
    smalls = jax.vmap(lambda s: resample.resize(s, (128, 128), order=0))(clipped)
    masks = _bodymasks_batch(smalls, use_pallas)
    return jax.vmap(lambda m: _box_from_mask(shape, m))(masks)


def make_sharded_boxes_fn(mesh):
    """Mesh-sharded box computation: slices shard over the 'data' axis, boxes
    gather replicated. Per-slice work is independent, so XLA partitions the
    whole bodymask pipeline with zero communication until the final gather.
    (XLA path only — Pallas calls don't auto-partition under pjit.)
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(
        lambda clipped: _boxes_for_volume(clipped, use_pallas=False),
        in_shardings=NamedSharding(mesh, P("data", None, None)),
        out_shardings=NamedSharding(mesh, P()),
    )


@functools.partial(jax.jit, static_argnames=("integer_input",))
def _crop_normalize(raw: jnp.ndarray, plan, *, integer_input: bool) -> jnp.ndarray:
    clipped = jnp.clip(raw, HU_LO, HU_HI)
    slices = resample.apply_crop_resize(clipped, plan)
    if integer_input:
        slices = _round_half_away(slices)
    slices = jnp.minimum(slices, float(HU_HI))
    return (slices + 1024.0) / 1624.0


def pad_slices(n: int, bucket: int = SLICE_BUCKET) -> int:
    return ((n + bucket - 1) // bucket) * bucket


def compute_boxes(volume: np.ndarray) -> np.ndarray:
    """Crop boxes for every slice of a volume (host entry point).

    Pads the slice count to a bucket multiple to bound jit recompilation.
    Returns (N, 4) int32 boxes.
    """
    n, h, w = volume.shape
    n_pad = pad_slices(n)
    raw = volume
    if n_pad != n:
        pad = np.full((n_pad - n, h, w), HU_LO, dtype=raw.dtype)
        raw = np.concatenate([raw, pad], axis=0)
    boxes = np.asarray(
        _boxes_for_volume(jnp.asarray(raw), use_pallas=default_use_pallas())
    )
    return boxes[:n]


def preprocess(
    volume: np.ndarray, resolution: Tuple[int, int] = (256, 256)
) -> Tuple[jnp.ndarray, np.ndarray]:
    """Full device preprocessing of a (N, H, W) HU volume.

    Returns:
        normalized: (N_pad, res, res) float32 device array in [0, 1], ready for
            the U-Net (padded slices are the normalized −1024 background).
        boxes: (N, 4) int32 numpy crop boxes (for the paste-back plan).
    """
    n, h, w = volume.shape
    n_pad = pad_slices(n)
    integer_input = np.issubdtype(volume.dtype, np.integer)
    raw = volume
    if n_pad != n:
        pad = np.full((n_pad - n, h, w), HU_LO, dtype=raw.dtype)
        raw = np.concatenate([raw, pad], axis=0)
    raw_dev = jnp.asarray(raw)
    boxes = np.asarray(
        _boxes_for_volume(raw_dev, use_pallas=default_use_pallas())
    )
    plan = resample.crop_resize_plan(boxes, resolution, order=1)
    normalized = _crop_normalize(raw_dev, plan, integer_input=integer_input)
    return normalized, boxes[:n]


_SHARDED_CACHE = {}


def preprocess_sharded(
    volume: np.ndarray, mesh, resolution: Tuple[int, int] = (256, 256)
) -> Tuple[jnp.ndarray, np.ndarray]:
    """Mesh-sharded :func:`preprocess`: the slice axis shards over 'data' for
    both the bodymask/box pipeline and the crop+normalize gather. Exact same
    results as the single-device path (asserted in tests/test_parallel.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndata = int(mesh.devices.shape[0])
    integer_input = bool(np.issubdtype(volume.dtype, np.integer))
    key = (mesh, integer_input)  # Mesh is hashable
    if key not in _SHARDED_CACHE:
        boxes_fn = make_sharded_boxes_fn(mesh)
        crop_fn = jax.jit(
            lambda clipped, plan: _crop_normalize(
                clipped, plan, integer_input=integer_input
            ),
            in_shardings=(
                NamedSharding(mesh, P("data", None, None)),
                {k: NamedSharding(mesh, P("data", None)) for k in (
                    "rlo", "rhi", "rw", "roob", "clo", "chi", "cw", "coob"
                )},
            ),
            out_shardings=NamedSharding(mesh, P("data", None, None)),
        )
        _SHARDED_CACHE[key] = (boxes_fn, crop_fn)
    boxes_fn, crop_fn = _SHARDED_CACHE[key]

    n, h, w = volume.shape
    bucket = int(np.lcm(SLICE_BUCKET, ndata))
    n_pad = ((n + bucket - 1) // bucket) * bucket
    raw = volume
    if n_pad != n:
        pad = np.full((n_pad - n, h, w), HU_LO, dtype=raw.dtype)
        raw = np.concatenate([raw, pad], axis=0)
    raw_dev = jax.device_put(raw, NamedSharding(mesh, P("data", None, None)))
    boxes = np.asarray(boxes_fn(raw_dev))
    plan = resample.crop_resize_plan(boxes, resolution, order=1)
    normalized = crop_fn(raw_dev, plan)
    return normalized, boxes[:n]


def preprocess_traced(
    volume: jnp.ndarray, resolution: Tuple[int, int] = (256, 256)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fully-traced single-dispatch preprocessing (float32 box coordinates).

    Jittable end-to-end (HU clip included); used for compile checks and
    throughput benchmarks.
    """
    clipped = jnp.clip(volume, HU_LO, HU_HI)
    shape = clipped.shape[1:]
    smalls = jax.vmap(lambda s: resample.resize(s, (128, 128), order=0))(clipped)
    masks = _bodymasks_batch(smalls, use_pallas=False)
    boxes = jax.vmap(lambda m: _box_from_mask(shape, m))(masks)

    def crop_one(sl, box):
        out = resample.resize_from_box(sl, box, resolution, order=1)
        if jnp.issubdtype(clipped.dtype, jnp.integer):
            out = _round_half_away(out)
        out = jnp.minimum(out, float(HU_HI))
        return (out + 1024.0) / 1624.0

    return jax.vmap(crop_one)(clipped, boxes), boxes
