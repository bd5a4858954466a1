"""Pallas TPU kernels for the U-Net's HBM-bound stencil ops.

The r5 per-layer profile (tools/layer_bench.py, docs/layer_profile_r5.json)
measured XLA's lowering of the two weightless stencils far from the memory
bound on v5e:

  * 2×2/2 average pooling (``lax.reduce_window``): 13-37% of its
    read+write HBM bound (2.52 ms for the 256²×64 layer at chunk 32);
  * bilinear 2× upsampling (``jax.image.resize``): 9-14% of its bound
    (1.72 ms for the 128²×128 layer).

Both are pure bandwidth problems — read each input element once, write the
(4×-smaller / 4×-larger) output once — so a Pallas kernel that streams
tiles through VMEM bounds them by HBM bandwidth. jnp-level reformulations
were measured first and lost (tools/op_experiments.py: strided-slice and
reshape-sum pooling 4.25/2.77 ms, two-pass stencil upsample 7.8 ms), which
is what justifies dropping to kernels here (SURVEY §2.3 row 3: scipy/torch
pool+resize → TPU-native equivalents).

Layout discipline (learned by measurement — both failure modes reproduce):
C is the lane axis and W the sublane axis inside a block. A reshape that
splits W *inside* the kernel either relayouts with a 4-8× VMEM blowup
(20.8M scoped OOM for a 1M block) or is rejected by Mosaic ("unsupported
shape cast"). All row/column pairing here is therefore expressed as FREE
row-major reshapes OUTSIDE the kernel — (n,h,w,c) → (n,h/2,2,w/2,2c) —
so the kernel only ever indexes leading dims and slices lanes.

Numerics: accumulation in float32, output cast back to the input dtype.
The parity gates in tests/test_unet*.py pin the end-to-end tolerance vs
the reference's torch source.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_kernel(x_ref, o_ref, *, c: int):
    x = x_ref[0]  # (T, 2, Wh, 2c): rows pre-paired, columns pre-merged
    s = x[:, 0].astype(jnp.float32) + x[:, 1].astype(jnp.float32)
    s = s[:, :, :c] + s[:, :, c:]
    o_ref[0] = (s * 0.25).astype(o_ref.dtype)


def _even_rows(h: int, w: int, c: int, itemsize: int, target: int) -> int:
    rows = max(1, min(h, target // max(1, w * c * itemsize)))
    while h % rows:
        rows -= 1
    return rows


@functools.partial(jax.jit, static_argnames=("interpret",))
def avg_pool2_pallas(x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """2×2/2 average pooling, NHWC, H and W even."""
    n, h, w, c = x.shape
    xr = x.reshape(n, h // 2, 2, w // 2, 2 * c)
    rows = _even_rows(h // 2, w, c, x.dtype.itemsize, 1 << 21)
    grid = (n, (h // 2) // rows)
    return pl.pallas_call(
        functools.partial(_pool_kernel, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, 2, w // 2, 2 * c), lambda i, j: (i, j, 0, 0, 0))
        ],
        out_specs=pl.BlockSpec((1, rows, w // 2, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
        interpret=interpret,
    )(xr)


def _up2_kernel(x_hbm, o_ref, scratch, sem, *, rows: int, h: int):
    """One output tile: out rows [2·j·rows, 2·(j+1)·rows), width-paired lanes.

    Needs input rows [j·rows − 1, (j+1)·rows] with edge clamping — fetched
    by three DMAs into a (rows+2, W, C) scratch: the body, and one clamped
    halo row on each side (clamping the halo row index IS the half-pixel
    edge rule of align_corners=False bilinear resampling).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = j * rows
    body = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(r0, rows)], scratch.at[pl.ds(1, rows)], sem
    )
    body.start()
    top = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(jnp.maximum(r0 - 1, 0), 1)], scratch.at[pl.ds(0, 1)], sem
    )
    top.start()
    bot = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(jnp.minimum(r0 + rows, h - 1), 1)],
        scratch.at[pl.ds(rows + 1, 1)],
        sem,
    )
    bot.start()
    body.wait()
    top.wait()
    bot.wait()

    cur = scratch[1 : rows + 1].astype(jnp.float32)
    prev = scratch[0:rows].astype(jnp.float32)
    nxt = scratch[2 : rows + 2].astype(jnp.float32)
    even = 0.25 * prev + 0.75 * cur
    odd = 0.75 * cur + 0.25 * nxt
    # row interleave: (T, 2, W, C) -> (2T, W, C) is a free leading-dim merge
    y = jnp.stack([even, odd], axis=1)
    t, _, w, c = y.shape
    y = y.reshape(2 * t, w, c)
    # columns: same 4-tap rule along W (the sublane axis; single-sublane
    # shifts via concatenate are native)
    p = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
    nx = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
    ev = 0.25 * p + 0.75 * y
    od = 0.75 * y + 0.25 * nx
    # column interleave: emit (2T, W, 2C) lane-paired; the caller's free
    # reshape (n, 2h, w, 2c) -> (n, 2h, 2w, c) un-pairs it
    o_ref[0] = jnp.concatenate([ev, od], axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilinear_up2_pallas(x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """Bilinear 2× upsampling (half-pixel centers), NHWC."""
    n, h, w, c = x.shape
    rows = _even_rows(h, w, c, x.dtype.itemsize, 1 << 19)
    grid = (n, h // rows)
    kernel = functools.partial(_up2_kernel, rows=rows, h=h)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 2 * rows, w, 2 * c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, w, 2 * c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, w, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)
    return out.reshape(n, 2 * h, 2 * w, c)
