import os

from lungmask_tpu.runtime.engine import UNetRunner, volume_argmax

_cache_enabled = False


def enable_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    XLA compiles of the depth-5 U-Net take minutes on remote-attached TPUs;
    the persistent cache drops warm-start to seconds across processes.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    import jax

    path = path or os.environ.get(
        "LUNGMASK_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "lungmask_tpu", "jax_cache"),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception:
        pass


__all__ = ["UNetRunner", "volume_argmax", "enable_compile_cache"]
