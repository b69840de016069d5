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


# ---------------------------------------------------------------------------
# energy tracing (the reference's NVML / ROCm-SMI / Intel-XPU energy CSV
# tracers, ``tracer.py:111-358``)
# ---------------------------------------------------------------------------


def _rapl_counters():
    """Host package-energy counters via Linux powercap (intel-rapl).

    Returns a list of energy_uj file paths, or [] when the platform does
    not expose powercap (containers without /sys/class/powercap, and TPU
    VMs hiding it) — the auto-detected backend then reports unavailable."""
    import glob

    return sorted(
        glob.glob("/sys/class/powercap/intel-rapl:*/energy_uj")
    )


class EnergyTracer:
    """Per-region energy accounting with pluggable counters.

    The reference samples a device energy counter at region start/stop and
    writes per-rank CSVs (NVML ``tracer.py:111-184``, ROCm :186-282, XPU
    :284-358).  TPUs expose no public per-chip energy API from inside a VM
    — the documented integration point is ``counter_fn``: any callable
    returning cumulative Joules (a fleet power-telemetry scrape, a PDU
    reading, or the host RAPL backend below).  Backends:

      * ``rapl`` — host CPU package energy from Linux powercap (functional
        wherever /sys/class/powercap exists; the right measure for the
        host-side share of data loading);
      * ``callback`` — user-supplied cumulative-Joules callable;
      * auto-detect: rapl when available, else disabled (regions record
        zero and ``available`` is False).
    """

    def __init__(self, counter_fn=None):
        self._files = []
        if counter_fn is not None:
            self._read = counter_fn
            self.backend = "callback"
        else:
            self._files = _rapl_counters()
            self._read = self._read_rapl if self._files else None
            self.backend = "rapl" if self._files else "none"
        self.available = self._read is not None
        self._starts: Dict[str, float] = {}
        self.energy_j: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def _read_rapl(self) -> float:
        total = 0.0
        for p in self._files:
            try:
                with open(p) as f:
                    total += int(f.read().strip()) / 1e6
            except OSError:
                pass
        return total

    def start(self, name: str):
        if self.available:
            self._starts[name] = self._read()

    def stop(self, name: str):
        if self.available and name in self._starts:
            d = self._read() - self._starts.pop(name)
            if d >= 0:  # counters wrap; drop the wrapped interval
                self.energy_j[name] += d
                self.counts[name] += 1

    @contextlib.contextmanager
    def region(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def save(self, directory: str, prefix: str = "energy"):
        """Per-rank CSV, mirroring the reference's ``tr.save`` layout."""
        os.makedirs(directory, exist_ok=True)
        try:
            import jax

            rank = jax.process_index()
        except Exception:
            rank = 0
        path = os.path.join(directory, f"{prefix}_rank{rank}.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["region", "count", "energy_j", "backend"])
            for name in self.energy_j:
                w.writerow(
                    [name, self.counts[name], self.energy_j[name],
                     self.backend]
                )
        return path


energy_tracer = EnergyTracer()
