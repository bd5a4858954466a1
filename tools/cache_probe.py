"""Diagnose persistent-compile-cache behavior on this host.

The XLA persistent cache key hashes, among other things, the backend's
``platform_version`` string (jax._src.cache_key: "backend version" entry).
On a tunnel-attached TPU that string embeds the *server* build
("axon X.Y.Z; SerializedExecutable vN; compile-cache vN; Built on ..."),
so a server upgrade between sessions silently invalidates every cached
executable — a full cold recompile that looks like random slowness.

This probe prints the identity strings and the per-component cache-key
hashes for a tiny jitted program, so two runs (now vs a slow day) can be
diffed to pinpoint which key component moved. Measured 2026-08-17: keys
are bit-stable across processes within one tunnel session; a 27 s U-Net
compile was served in 0.6 s by a fresh process.

Usage: PYTHONPATH=/root/repo python tools/cache_probe.py
"""

from __future__ import annotations

import logging
import sys


def main() -> int:
    import jax

    jax.config.update(
        "jax_debug_log_modules",
        "jax._src.compiler,jax._src.cache_key,jax._src.compilation_cache",
    )
    logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)

    from lungmask_tpu.runtime import enable_compile_cache

    enable_compile_cache()

    d = jax.devices()[0]
    c = d.client
    print("platform:", c.platform)
    print("device_kind:", d.device_kind)
    print("platform_version:")
    for line in str(c.platform_version).splitlines():
        print("   ", line)
    print("jaxlib:", jax.__version__)

    import jax.numpy as jnp

    @jax.jit
    def probe(x):
        return jnp.tanh(x @ x.T).sum()

    print("--- cache-key components for jit_probe (see DEBUG log) ---")
    probe(jnp.ones((64, 64), jnp.float32)).block_until_ready()
    return 0


if __name__ == "__main__":
    sys.exit(main())
