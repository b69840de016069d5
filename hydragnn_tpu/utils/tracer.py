"""Region tracing / profiling.

The TPU-native replacement for the reference's pluggable tracer registry
(``hydragnn/utils/profiling_and_tracing/tracer.py:361-459``: GPTL timers,
Score-P regions, NVML/ROCm/XPU energy CSVs) and torch.profiler wrapper
(``profile.py:9-70``):

  * wall-clock region timers with per-call history and min/max/avg report
    (GPTL + ``time_utils.Timer`` semantics),
  * ``jax.profiler`` trace windows (xprof / TensorBoard, the
    torch.profiler analogue) via ``profile_window``,
  * ``named_scope`` pass-through so regions show up inside XLA traces.

CSV dumps per process mirror ``tr.save`` (``tracer.py:432-458``).
"""

from __future__ import annotations

import contextlib
import csv
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional


def _device_sync():
    """Drain the default device's in-order execution queue by
    materializing a trivial value enqueued behind all outstanding work
    (``block_until_ready`` alone does not synchronize through tunneled
    PJRT backends)."""
    import jax
    import jax.numpy as jnp

    float(jnp.zeros(()))
    del jax


class RegionTimers:
    """``HYDRAGNN_TPU_TRACE_LEVEL=1`` makes every region stop synchronize
    the device first, so wall-clock regions measure device work instead of
    dispatch (the reference's per-region sync + barrier under
    ``HYDRAGNN_TRACE_LEVEL=1``, train_validate_test.py:673-696)."""

    def __init__(self):
        self.enabled = True
        self.trace_level = int(os.environ.get("HYDRAGNN_TPU_TRACE_LEVEL", "0"))
        self._starts: Dict[str, float] = {}
        self.history: Dict[str, List[float]] = defaultdict(list)

    def enable(self):
        self.enabled = True

    def disable(self):
        self.enabled = False

    def reset(self):
        self._starts.clear()
        self.history.clear()

    def start(self, name: str):
        if self.enabled:
            self._starts[name] = time.perf_counter()

    def stop(self, name: str):
        if self.enabled and name in self._starts:
            if self.trace_level >= 1:
                try:
                    _device_sync()
                except Exception:
                    pass
            self.history[name].append(time.perf_counter() - self._starts.pop(name))

    @contextlib.contextmanager
    def region(self, name: str):
        self.start(name)
        try:
            import jax

            with jax.named_scope(name):
                yield
        finally:
            self.stop(name)

    def profile(self, name: str):
        """Decorator (reference ``@tr.profile``, tracer.py:461-476)."""

        def deco(fn):
            def wrapped(*args, **kwargs):
                self.start(name)
                try:
                    return fn(*args, **kwargs)
                finally:
                    self.stop(name)

            return wrapped

        return deco

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.history.items():
            out[name] = {
                "count": len(vals),
                "total": sum(vals),
                "avg": sum(vals) / max(len(vals), 1),
                "min": min(vals) if vals else 0.0,
                "max": max(vals) if vals else 0.0,
            }
        return out

    def save(self, directory: str, prefix: str = "trace"):
        os.makedirs(directory, exist_ok=True)
        try:
            import jax

            rank = jax.process_index()
        except Exception:
            rank = 0
        path = os.path.join(directory, f"{prefix}_rank{rank}.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["region", "count", "total_s", "avg_s", "min_s", "max_s"])
            for name, s in self.summary().items():
                w.writerow(
                    [name, s["count"], s["total"], s["avg"], s["min"], s["max"]]
                )
        return path


tracer = RegionTimers()


@contextlib.contextmanager
def profile_window(log_dir: str):
    """jax.profiler trace window -> TensorBoard/xprof (the reference
    ``Profiler``'s one-epoch window, ``profile.py:9-70``)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
