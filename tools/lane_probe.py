#!/usr/bin/env python
"""Decompose the single-volume U-Net lane (UNetRunner.run_numpy).

VERDICT r4 weak-#2: `single_volume_slices_per_sec` fell 845.6 (r3 capture)
to 667.7 (r4) while the streaming headline rose. This tool measures, on the
real chip, every part-split policy the engine could use for one volume plus
the stage costs around it, so the regression can be attributed and the
policy re-tuned on data:

  * split_parts variants: [2,2,2] (production), [3,3], [6], [1]*6
  * packing: 2-bit crumbs (production) vs dense uint8
  * host unpack + concat cost in isolation
  * the stream lane on the same volume count for reference

Run: python tools/lane_probe.py [n_slices]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("LUNGMASK_TPU_LOGLEVEL", "WARNING")

import jax
import jax.numpy as jnp

from lungmask_tpu.models import synthetic
from lungmask_tpu.runtime import enable_compile_cache
from lungmask_tpu.runtime.engine import (
    UNetRunner,
    unpack_crumbs,
    volume_argmax,
    volume_argmax_packed2,
)

enable_compile_cache()


def bench(label, fn, reps=5):
    fn()  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n_slices = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    chunk = 32
    device = jax.devices()[0]
    params = synthetic.threshold_params(3)
    params = jax.device_put(jax.tree_util.tree_map(jnp.asarray, params), device)
    vol = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (n_slices, 256, 256)),
            jnp.float32,
        ),
        device,
    )
    n_chunks = n_slices // chunk
    print(f"volume {n_slices} slices, chunk {chunk} -> {n_chunks} chunks")

    def split_run(parts):
        outs = []
        start = 0
        for p in parts:
            outs.append(
                volume_argmax_packed2(
                    params, vol[start : start + p * chunk], chunk, jnp.bfloat16
                )
            )
            start += p * chunk
        return np.concatenate([np.asarray(o) for o in outs], axis=0)

    for parts in ([2] * (n_chunks // 2), [3] * (n_chunks // 3), [n_chunks],
                  [1] * n_chunks):
        t = bench(f"parts={parts}", lambda parts=parts: split_run(parts))
        print(f"parts {str(parts):20s}: {t*1e3:7.1f} ms  "
              f"{n_slices/t:7.1f} slices/s")

    # unpack cost on host (included above? no — split_run skips unpack)
    packed = [np.asarray(volume_argmax_packed2(params, vol[:2 * chunk], chunk,
                                               jnp.bfloat16))]

    def unpack_all():
        return [unpack_crumbs(p) for p in packed * (n_chunks // 2)]

    t = bench("unpack", unpack_all)
    print(f"host unpack_crumbs for volume       : {t*1e3:7.1f} ms")

    # dense download for comparison
    def dense_run():
        out = volume_argmax(params, vol, chunk, jnp.bfloat16)
        return np.asarray(out)

    t = bench("dense", dense_run)
    print(f"one dispatch, dense uint8 download  : {t*1e3:7.1f} ms  "
          f"{n_slices/t:7.1f} slices/s")

    # production path end-to-end (includes pad, packing policy, unpack)
    runner = UNetRunner(params, 3, compute_dtype=jnp.bfloat16)
    t = bench("run_numpy", lambda: runner.run_numpy(vol))
    print(f"UNetRunner.run_numpy (production)   : {t*1e3:7.1f} ms  "
          f"{n_slices/t:7.1f} slices/s")

    # stream lane reference: halves over 4 volumes
    half = n_slices // 2
    streams = [vol[:half], vol[half:]] * 4

    def stream():
        outs = [volume_argmax_packed2(params, v, chunk, jnp.bfloat16)
                for v in streams]
        return [unpack_crumbs(np.asarray(o)) for o in outs]

    t = bench("stream", stream)
    print(f"stream lane (4 volumes, halves)     : {t*1e3:7.1f} ms  "
          f"{half*len(streams)/t:7.1f} slices/s")


if __name__ == "__main__":
    main()
