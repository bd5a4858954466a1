#!/usr/bin/env python
"""Measured alternatives for the slowest ops in the U-Net schedule.

layer_bench.py showed the mid-network convs at 97-100% of roofline and the
gap to the analytic 0.70-MFU ceiling concentrated in a handful of ops:

    enc0.avgpool   2.515 ms  (~15% of honest HBM bound)
    dec0.conv1     3.196 ms  (49% of MXU bound)
    enc0.conv1     0.701 ms  (1.7% — cin=1 cannot feed the MXU)
    up0.bilinear   1.724 ms  (~46% of honest read+write bound)
    up0.concat     1.518 ms
    head.1x1+argmax 1.28 ms

This tool measures one-or-more alternative formulations for each against
the production op, on the real chip, with the same slope-timing harness as
layer_bench. Winners get folded into models/unet.py; losers get recorded
in docs/PERF.md so the "no kernel choice recovers it" claim is measured,
not asserted (VERDICT r4 weak-#3).

Run: python tools/op_experiments.py [chunk] [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("LUNGMASK_TPU_LOGLEVEL", "WARNING")

import jax
import jax.numpy as jnp
from jax import lax

from lungmask_tpu.models import unet
from lungmask_tpu.runtime import enable_compile_cache
from tools.layer_bench import PEAK_BW, PEAK_FLOPS, BF16, _rng, measure

enable_compile_cache()


def run_case(name, fn, operands, flops, in_bytes, results, device):
    est = max(flops / PEAK_FLOPS, in_bytes / PEAK_BW)
    return measure(name, fn, operands, est, flops, in_bytes, results, device)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 32
    device = jax.devices()[0]
    precision = lax.Precision.DEFAULT
    results = []
    print(f"device={device.platform}  chunk={n}")

    # ---------------- avgpool 256x256 c64 ----------------
    x = jax.device_put(_rng((n, 256, 256, 64)), device)
    ib = BF16 * x.size

    def pool_reduce_window(eps, x):
        return unet._avg_pool2(x + eps.astype(x.dtype))

    def pool_strided(eps, x):
        x = x + eps.astype(x.dtype)
        s = x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]
        return s * jnp.asarray(0.25, s.dtype)

    def pool_reshape(eps, x):
        x = x + eps.astype(x.dtype)
        nn, h, w, c = x.shape
        s = x.reshape(nn, h // 2, 2, w // 2, 2, c).sum((2, 4))
        return s * jnp.asarray(0.25, s.dtype)

    run_case("pool/reduce_window (prod)", pool_reduce_window, (x,), 0, ib,
             results, device)
    run_case("pool/strided-slices", pool_strided, (x,), 0, ib, results, device)
    run_case("pool/reshape-sum", pool_reshape, (x,), 0, ib, results, device)

    # ---------------- bilinear up 128x128 c128 -> 256x256 ----------------
    xu = jax.device_put(_rng((n, 128, 128, 128)), device)
    ibu = BF16 * xu.size

    def up_resize(eps, x):
        return unet._bilinear_up2(x + eps.astype(x.dtype))

    def up_stencil(eps, x):
        x = x + eps.astype(x.dtype)
        for axis in (1, 2):
            lo = jnp.asarray(0.25, x.dtype)
            hi = jnp.asarray(0.75, x.dtype)
            prev = jnp.concatenate(
                [lax.slice_in_dim(x, 0, 1, axis=axis),
                 lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis)
            nxt = jnp.concatenate(
                [lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
                 lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                                  axis=axis)], axis)
            even = lo * prev + hi * x
            odd = hi * x + lo * nxt
            x = jnp.stack([even, odd], axis=axis + 1)
            sh = list(even.shape)
            sh[axis] *= 2
            x = x.reshape(sh)
        return x

    run_case("up2/jax.image.resize (prod)", up_resize, (xu,), 0, ibu,
             results, device)
    run_case("up2/fixed-stencil", up_stencil, (xu,), 0, ibu, results, device)

    # sanity: identical results?
    a = np.asarray(jax.jit(lambda x: unet._bilinear_up2(x))(xu), np.float32)
    b = np.asarray(jax.jit(lambda x: up_stencil(jnp.float32(0), x))(xu),
                   np.float32)
    print(f"   up2 stencil max|delta| vs resize: {np.abs(a - b).max():.3e}")

    # ---------------- enc0.conv1: 1->64, 256x256 ----------------
    x1 = jax.device_put(_rng((n, 256, 256, 1)), device)
    w1 = jax.device_put(_rng((3, 3, 1, 64), seed=1), device)
    b1 = jax.device_put(_rng((64,), seed=2), device)
    fl1 = 2.0 * n * 256 * 256 * 1 * 64 * 9
    ib1 = BF16 * (x1.size + w1.size)

    def c1_conv(eps, x, w, b):
        return jnp.maximum(
            unet._conv(x, w + eps.astype(w.dtype), b, precision=precision), 0.0
        ).astype(jnp.bfloat16)

    def c1_im2col(eps, x, w, b):
        w = w + eps.astype(w.dtype)
        xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)))
        cols = jnp.stack(
            [xp[:, dy : dy + 256, dx : dx + 256]
             for dy in range(3) for dx in range(3)], axis=-1)  # (n,256,256,9)
        y = lax.dot_general(
            cols, w.reshape(9, 64), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y + b.astype(y.dtype), 0.0).astype(jnp.bfloat16)

    run_case("enc0.conv1/xla-conv (prod)", c1_conv, (x1, w1, b1), fl1, ib1,
             results, device)
    run_case("enc0.conv1/im2col-matmul", c1_im2col, (x1, w1, b1), fl1, ib1,
             results, device)

    a = np.asarray(jax.jit(lambda x, w, b: c1_conv(jnp.float32(0), x, w, b))(
        x1, w1, b1), np.float32)
    b_ = np.asarray(jax.jit(lambda x, w, b: c1_im2col(jnp.float32(0), x, w, b))(
        x1, w1, b1), np.float32)
    print(f"   enc0.conv1 im2col max|delta|: {np.abs(a - b_).max():.3e}")

    # ---------------- dec0.conv1: 128->64 @256², and concat-fusion ---------
    xa = jax.device_put(_rng((n, 256, 256, 64), seed=5), device)
    xb = jax.device_put(_rng((n, 256, 256, 64), seed=6), device)
    wd = jax.device_put(_rng((3, 3, 128, 64), seed=7), device)
    bd = jax.device_put(_rng((64,), seed=8), device)
    fld = 2.0 * n * 256 * 256 * 128 * 64 * 9
    ibd = BF16 * (xa.size + xb.size + wd.size)

    def d_concat_conv(eps, xa, xb, w, b):
        x = jnp.concatenate([xa, xb], axis=-1)
        return jnp.maximum(
            unet._conv(x, w + eps.astype(w.dtype), b, precision=precision), 0.0
        ).astype(jnp.bfloat16)

    def d_split_conv(eps, xa, xb, w, b):
        w = w + eps.astype(w.dtype)
        ya = unet._conv(xa, w[:, :, :64], b, precision=precision)
        yb = unet._conv(xb, w[:, :, 64:], jnp.zeros_like(b),
                        precision=precision)
        return jnp.maximum(ya + yb, 0.0).astype(jnp.bfloat16)

    run_case("dec0/concat+conv (prod)", d_concat_conv, (xa, xb, wd, bd),
             fld, ibd, results, device)
    run_case("dec0/split-kernel-sum", d_split_conv, (xa, xb, wd, bd),
             fld, ibd, results, device)

    # ---------------- head 1x1 64->4 + argmax ----------------
    xh = jax.device_put(_rng((n, 256, 256, 64), seed=9), device)
    wh = jax.device_put(_rng((1, 1, 64, 4), seed=10), device)
    bh = jax.device_put(_rng((4,), seed=11), device)
    ibh = BF16 * (xh.size + wh.size)
    flh = 2.0 * n * 256 * 256 * 64 * 4

    def h_conv_argmax(eps, x, w, b):
        y = unet._conv(x + eps.astype(x.dtype), w, b, precision=precision)
        return jnp.argmax(y, axis=-1).astype(jnp.uint8)

    def h_dot_argmax(eps, x, w, b):
        x = x + eps.astype(x.dtype)
        y = lax.dot_general(x, w[0, 0], (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return jnp.argmax(y + b.astype(y.dtype), axis=-1).astype(jnp.uint8)

    run_case("head/conv+argmax (prod)", h_conv_argmax, (xh, wh, bh), flh, ibh,
             results, device)
    run_case("head/dot+argmax", h_dot_argmax, (xh, wh, bh), flh, ibh,
             results, device)

    print()
    for r in results:
        print(f"{r['op']:34s} {r['ms']:8.3f} ms")

    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as f:
            json.dump({"chunk": n, "ops": results}, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
