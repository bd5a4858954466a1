"""Persistent-compile-cache telemetry: put hit/miss state on the record.

Round-4 verdict finding: the driver captured a 558 s ``unet_compile_s`` and
the bench recorded nothing about whether the persistent cache hit or missed,
so cold-vs-warm was undiagnosable from the artifact. This module subscribes
to JAX's monitoring events for the compilation cache and snapshots the cache
directory, so bench extras can carry the full story:

* ``requests``/``hits``/``misses`` — per-process compile-to-cache traffic
  (from ``/jax/compilation_cache/compile_requests_use_cache`` and
  ``.../cache_hits`` monitoring events).
* ``retrieval_secs`` — per-hit executable deserialization cost (a HIT on a
  tunnel-attached TPU is not free: the serialized executable is shipped to
  and rebuilt by the remote server — measured ~30 s for the 4.8 MB U-Net
  volume program).
* ``dir_entries_start`` / ``new_entries`` — cache-directory population
  before the run and entries written by it (a write IS a miss that took
  ≥ the min-compile-time threshold).
* ``key_environment`` — the identity strings the cache key hashes
  (jax version, backend platform_version). The axon platform_version embeds
  the tunnel SERVER build; a server upgrade between sessions silently
  invalidates every entry (measured twice: identical programs re-compiled
  under new keys with unchanged client code).

Diagnosis recipe: if ``unet_compile_s`` is large, look here — ``hits=0,
new_entries>0`` with a changed ``platform_version`` is a server upgrade;
``dir_entries_start=0`` is a fresh machine (every driver round starts with
an empty ``~/.cache``); ``hits>0`` with large retrieval_secs is link cost,
not compilation.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional

_REQ = "/jax/compilation_cache/compile_requests_use_cache"
_HIT = "/jax/compilation_cache/cache_hits"
_RETRIEVAL = "/jax/compilation_cache/cache_retrieval_time_sec"


@dataclass
class CacheTelemetry:
    cache_dir: Optional[str] = None
    dir_entries_start: int = 0
    requests: int = 0
    hits: int = 0
    retrieval_secs: List[float] = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def _on_event(self, event: str, **kw) -> None:
        with self._lock:
            if event == _REQ:
                self.requests += 1
            elif event == _HIT:
                self.hits += 1

    def _on_duration(self, event: str, duration_secs: float, **kw) -> None:
        if event == _RETRIEVAL:
            with self._lock:
                self.retrieval_secs.append(round(float(duration_secs), 3))

    def _dir_entries(self) -> int:
        if not self.cache_dir:
            return 0
        try:
            return sum(1 for n in os.listdir(self.cache_dir) if n.endswith("-cache"))
        except OSError:
            return 0

    def snapshot(self) -> Dict:
        """JSON-ready summary (bench extras `compile_cache`)."""
        with self._lock:
            hits, requests = self.hits, self.requests
            retrieval = list(self.retrieval_secs)
        entries_now = self._dir_entries()
        out: Dict = {
            "dir": self.cache_dir,
            "dir_entries_start": self.dir_entries_start,
            "new_entries": max(0, entries_now - self.dir_entries_start),
            "requests": requests,
            "hits": hits,
            "misses": max(0, requests - hits),
            "retrieval_secs": retrieval[:32],
        }
        try:
            import jax

            d = jax.devices()[0]
            out["key_environment"] = {
                "jax": jax.__version__,
                "platform_version": str(d.client.platform_version),
            }
        except Exception:
            pass
        return out


_active: Optional[CacheTelemetry] = None


def start_cache_telemetry() -> CacheTelemetry:
    """Begin recording compile-cache traffic for this process (idempotent).

    Call after :func:`lungmask_tpu.runtime.enable_compile_cache` and before
    the first jit execution whose cache behavior should be observed.
    """
    global _active
    if _active is not None:
        return _active
    t = CacheTelemetry()
    try:
        import jax

        t.cache_dir = jax.config.jax_compilation_cache_dir
    except Exception:
        t.cache_dir = None
    t.dir_entries_start = t._dir_entries()
    try:
        from jax._src import monitoring

        monitoring.register_event_listener(t._on_event)
        monitoring.register_event_duration_secs_listener(t._on_duration)
    except Exception:
        pass
    _active = t
    return t
