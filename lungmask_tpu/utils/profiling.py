"""Observability: per-stage timing + optional XLA profiler traces.

The reference's only observability is tqdm progress bars (SURVEY §5). The TPU
build adds:

* :class:`StageTimer` — wall-clock per pipeline stage, accumulated across
  volumes, queryable as a dict (exposed as ``LMInferer.timings``).
* :func:`trace` — a ``jax.profiler.trace`` wrapper that writes a TensorBoard-
  loadable XLA trace when ``LUNGMASK_TPU_TRACE_DIR`` is set (and is a no-op
  otherwise, so it can stay in the hot path).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        # The cohort runtime updates stages from its loader/finisher threads
        # concurrently with the main thread; '+=' on the defaultdicts is not
        # atomic, so serialize the read-modify-write.
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        with self._lock:
            return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))

    def reset(self) -> None:
        with self._lock:
            self.totals.clear()
            self.counts.clear()

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [
            f"  {name:<20s} {secs:8.3f}s ({100 * secs / total:5.1f}%)  x{self.counts[name]}"
            for name, secs in self.summary().items()
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(name: str = "lungmask_tpu") -> Iterator[None]:
    """jax.profiler trace into $LUNGMASK_TPU_TRACE_DIR (no-op when unset)."""
    trace_dir = os.environ.get("LUNGMASK_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
