#!/usr/bin/env python
"""Single-dispatch lane probe: decompose run_numpy's per-volume cost.

VERDICT r4 weak-#2: the driver captured `single_volume_slices_per_sec` at
667.7 while the stream headline sat at ~948 — same XLA programs, so the gap
is host-side per-call work. This probe times each candidate component on the
real TPU:

  A. run_numpy as shipped (the regressed lane)
  B. stream-style: pre-sliced half-volumes, all dispatches enqueued, fetch
     after (the headline's timed region, per-volume)
  C. run_numpy minus device-side slicing (parts pre-sliced outside the loop)
  D. run_numpy minus unpack (fetch packed only)
  E. part-size sweep: {2,3,5,10}-chunk dispatches, pre-sliced
  F. fetch strategy: np.asarray in enqueue order vs jax.block_until_ready
     then asarray

Run:  python tools/lane_probe.py [N_SLICES]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("LUNGMASK_TPU_LOGLEVEL", "WARNING")

import jax
import jax.numpy as jnp

from lungmask_tpu.models import synthetic
from lungmask_tpu.runtime import enable_compile_cache, prefault_host_heap
from lungmask_tpu.runtime.engine import (
    DEFAULT_CHUNK,
    UNetRunner,
    unpack_crumbs,
    volume_argmax_packed2,
)

enable_compile_cache()
prefault_host_heap()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 320
CHUNK = DEFAULT_CHUNK
REPS = 5


def best_of(fn, reps=REPS):
    fn()  # warm
    best = float("inf")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        times.append(dt)
        best = min(best, dt)
    return best, times


def main():
    device = jax.devices()[0]
    params = synthetic.threshold_params(n_classes=3)
    params = jax.device_put(jax.tree_util.tree_map(jnp.asarray, params), device)
    vol = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (N, 256, 256)), jnp.float32
        ),
        device,
    )
    runner = UNetRunner(params, 3, compute_dtype=jnp.bfloat16)
    cast = runner.params  # pre-cast bf16 kernels, like run_numpy uses

    t0 = time.perf_counter()
    runner.run_numpy(vol)
    print(f"first-call (compile or cache load): {time.perf_counter() - t0:.2f}s")

    # A: shipped lane
    best, times = best_of(lambda: runner.run_numpy(vol))
    print(f"A run_numpy           : {N/best:7.1f} slices/s  best={best*1e3:6.1f}ms  times={[f'{t*1e3:.0f}' for t in times]}")

    # B: stream-style per-volume (halves pre-sliced, enqueue all, fetch)
    half = N // 2
    parts_h = [vol[:half], vol[half:]]
    parts_h = [jax.device_put(p, device) for p in parts_h]

    def stream():
        outs = [volume_argmax_packed2(cast, p, CHUNK, jnp.bfloat16) for p in parts_h]
        return [unpack_crumbs(np.asarray(o)) for o in outs]

    best, times = best_of(stream)
    print(f"B halves presliced    : {N/best:7.1f} slices/s  best={best*1e3:6.1f}ms  times={[f'{t*1e3:.0f}' for t in times]}")

    # C/E: part-size sweep, pre-sliced
    for pc in (2, 3, 5, 10):
        if (N // CHUNK) % pc:
            continue
        step = pc * CHUNK
        parts = [jax.device_put(vol[i : i + step], device) for i in range(0, N, step)]

        def presliced(parts=parts):
            outs = [volume_argmax_packed2(cast, p, CHUNK, jnp.bfloat16) for p in parts]
            return [unpack_crumbs(np.asarray(o)) for o in outs]

        best, times = best_of(presliced)
        print(f"C parts={pc:2d} presliced  : {N/best:7.1f} slices/s  best={best*1e3:6.1f}ms  times={[f'{t*1e3:.0f}' for t in times]}")

    # C2: same as run_numpy (slice on device inside loop), 2-chunk parts
    step = 2 * CHUNK

    def sliced_in_loop():
        outs = []
        for i in range(0, N, step):
            outs.append(
                volume_argmax_packed2(cast, vol[i : i + step], CHUNK, jnp.bfloat16)
            )
        return [unpack_crumbs(np.asarray(o)) for o in outs]

    best, times = best_of(sliced_in_loop)
    print(f"C2 slice-in-loop p=2  : {N/best:7.1f} slices/s  best={best*1e3:6.1f}ms  times={[f'{t*1e3:.0f}' for t in times]}")

    # D: run_numpy-style but no unpack, no concat (fetch packed parts only)
    def no_unpack():
        outs = []
        for i in range(0, N, step):
            outs.append(
                volume_argmax_packed2(cast, vol[i : i + step], CHUNK, jnp.bfloat16)
            )
        return [np.asarray(o) for o in outs]

    best, times = best_of(no_unpack)
    print(f"D no-unpack p=2       : {N/best:7.1f} slices/s  best={best*1e3:6.1f}ms  times={[f'{t*1e3:.0f}' for t in times]}")

    # F: single dispatch whole volume (kbatch k=1 shape)
    def one_dispatch():
        return unpack_crumbs(
            np.asarray(volume_argmax_packed2(cast, vol, CHUNK, jnp.bfloat16))
        )

    best, times = best_of(one_dispatch)
    print(f"F one dispatch        : {N/best:7.1f} slices/s  best={best*1e3:6.1f}ms  times={[f'{t*1e3:.0f}' for t in times]}")


if __name__ == "__main__":
    main()
