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
        # Persist EVERYTHING: on the tunnel-attached TPU even tiny
        # programs cost seconds of remote-compile RPC, but jax measures
        # compile time in a way that leaves most of them under the default
        # 1.0s persistence threshold — the r5 warm-bench capture showed 74
        # misses with only 1 cache write per run, i.e. the same programs
        # recompiled every run forever. Zero threshold fixes the leak.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        try:
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:
            pass
        _cache_enabled = True
    except Exception:
        pass


_alloc_tuned = False


def tune_host_allocator() -> bool:
    """Keep large host buffers on the heap across calls (idempotent).

    glibc malloc services allocations above ~32 MB with mmap and returns the
    pages to the kernel on free, so every inference call re-faults its
    working set (~250 MB for a full fused volume) back in — measured as
    multi-second swings between identical postprocessing calls on this host.
    ``mallopt(M_MMAP_MAX, 0)`` + a high trim threshold make the heap retain
    and reuse those pages; with volumes this size the residency cost is a
    few hundred MB. Opt out with LUNGMASK_TPU_NO_MALLOC_TUNING=1.
    """
    global _alloc_tuned
    if _alloc_tuned:
        return True
    if os.environ.get("LUNGMASK_TPU_NO_MALLOC_TUNING") == "1":
        return False
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        M_TRIM_THRESHOLD, M_MMAP_MAX = -1, -4
        ok = libc.mallopt(M_MMAP_MAX, 0) == 1
        ok &= libc.mallopt(M_TRIM_THRESHOLD, 1 << 30) == 1
        _alloc_tuned = bool(ok)
    except Exception:
        _alloc_tuned = False
    return _alloc_tuned


_prefaulted_mb = 0


def prefault_host_heap(mb: int | None = None) -> int:
    """Grow and pre-touch the process heap once so the inference working set
    never faults inside a timed stage (idempotent up to the largest request).

    On virtualized hosts with lazily-backed guest memory, the FIRST touch of
    a physical page can cost ~100 µs (host-side backing fault) — measured
    seconds per 50 MB mask canvas on the bench VM, dominating paste-back and
    unpack stages. With the heap retained (:func:`tune_host_allocator`),
    touching a pool of this size once makes every later large allocation
    recycle already-backed pages. Returns the MB actually pre-faulted.
    Sizing: peak host working set is ~4 bytes-per-voxel-ish transient buffers
    — a 512-slice 512² fused volume peaks around 700 MB; the default covers
    the common 192-320 slice volumes. Override with LUNGMASK_TPU_PREFAULT_MB
    (0 disables).
    """
    global _prefaulted_mb
    if mb is None:
        mb = int(os.environ.get("LUNGMASK_TPU_PREFAULT_MB", "384"))
    if mb <= _prefaulted_mb:
        return _prefaulted_mb
    tune_host_allocator()
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        libc.malloc.restype = ctypes.c_void_p
        libc.malloc.argtypes = [ctypes.c_size_t]
        libc.free.argtypes = [ctypes.c_void_p]
        n = mb << 20
        p = libc.malloc(n)
        if p:
            ctypes.memset(p, 0, n)
            libc.free(p)
            _prefaulted_mb = mb
    except Exception:
        pass
    return _prefaulted_mb


def start_cache_telemetry():
    """Record compile-cache hit/miss traffic (see runtime/cache_telemetry.py)."""
    from lungmask_tpu.runtime.cache_telemetry import start_cache_telemetry as _s

    return _s()


__all__ = [
    "UNetRunner",
    "volume_argmax",
    "enable_compile_cache",
    "tune_host_allocator",
    "prefault_host_heap",
    "start_cache_telemetry",
]
