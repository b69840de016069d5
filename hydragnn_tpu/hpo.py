"""Hyperparameter optimization harness.

The capability analogue of the reference's HPO integrations
(``hydragnn/utils/hpo/deephyper.py`` + ``examples/qm9_hpo/{qm9_optuna,
qm9_deephyper}.py``): a dependency-free random-search / successive-halving
driver over the JSON config space, running trials through
``run_training``.  (DeepHyper/Optuna are not vendored; the search-space
schema mirrors their dict form so external drivers can plug in.)
"""

from __future__ import annotations

import copy
import json
import math
import os
import random
from typing import Any, Callable, Dict, List, Optional, Tuple


def sample_config(space: Dict[str, Any], rng: random.Random) -> Dict[str, Any]:
    """space: dotted-key -> spec; spec is a list (categorical) or
    ("int"|"float"|"log", lo, hi)."""
    out = {}
    for key, spec in space.items():
        if isinstance(spec, (list, tuple)) and spec and isinstance(spec[0], str) and spec[0] in (
            "int",
            "float",
            "log",
        ):
            kind, lo, hi = spec
            if kind == "int":
                out[key] = rng.randint(int(lo), int(hi))
            elif kind == "float":
                out[key] = rng.uniform(lo, hi)
            else:
                out[key] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
        else:
            out[key] = rng.choice(list(spec))
    return out


def apply_overrides(config: Dict, overrides: Dict[str, Any]) -> Dict:
    cfg = copy.deepcopy(config)
    for dotted, val in overrides.items():
        node = cfg
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return cfg


def _objective_from_info(info: Dict) -> float:
    # best_val can be inf when the run is shorter than the checkpoint
    # warmup — fall back to the observed history
    val = float(info.get("best_val", float("inf")))
    if not math.isfinite(val):
        val = min(
            (float(h["val"]) for h in info.get("history", ())),
            default=float("inf"),
        )
    return val


def _run_trial_inline(cfg: Dict) -> float:
    import hydragnn_tpu

    return _objective_from_info(hydragnn_tpu.run_training(cfg))


class TrialPool:
    """Concurrent HPO trial execution: each trial is its own OS process
    (own JAX runtime), up to ``workers`` in flight — the analogue of the
    reference HPO's parallel per-trial job launches
    (``hydragnn/utils/hpo/deephyper.py:5-177``,
    ``examples/qm9_hpo/qm9_deephyper_multi.py`` srun per trial).

    Workers default to the CPU backend (a single-host pool cannot share
    one TPU chip; the reference gives each trial its own GPUs the same
    way).  Set ``env`` to override, e.g. per-worker device selection on a
    multi-chip host.
    """

    def __init__(self, workers: int = 2, env: Optional[Dict] = None,
                 pin: bool = False):
        self.workers = max(1, int(workers))
        self.env = env
        # pin=True: give each worker a DISJOINT core slice via
        # sched_setaffinity in the child (HYDRAGNN_TPU_CPUSET) — on a
        # small host concurrent XLA thread pools otherwise oversubscribe
        # and eat the parallel win (the r04 1.16x artifact; same fix as
        # bench_scaling's pinned two-process legs)
        self.pin = bool(pin)
        try:
            self._cores = sorted(os.sched_getaffinity(0))
        except (AttributeError, OSError):
            self._cores = list(range(os.cpu_count() or self.workers))
        self._live: Dict[int, Any] = {}  # id -> (Popen, outpath, tmpdir)
        self._next = 0

    def _cpuset(self, slot: int) -> Optional[str]:
        if not self.pin:
            return None
        n = len(self._cores)
        per = max(1, n // self.workers)
        cores = self._cores[(slot * per) % n : (slot * per) % n + per]
        return ",".join(map(str, cores)) if cores else None

    def _spawn(self, cfg, cpuset: Optional[str] = None):
        """``cfg`` is one trial config, or a LIST of configs the worker
        runs sequentially in one process (chunking amortizes the JAX
        startup + compile-cache warm-up per worker — without it, tiny
        trials measured SLOWER than sequential on a small host)."""
        import subprocess
        import sys
        import tempfile

        d = tempfile.mkdtemp(prefix="hpo_trial_")
        inp, out = os.path.join(d, "in.json"), os.path.join(d, "out.json")
        with open(inp, "w") as f:
            json.dump(
                cfg if isinstance(cfg, list) else [cfg], f
            )
        env = dict(os.environ)
        env.setdefault("JAX_PLATFORMS", "cpu")
        env.setdefault("JAX_PLATFORM_NAME", "cpu")
        if cpuset:
            env["HYDRAGNN_TPU_CPUSET"] = cpuset
        if self.env:
            env.update(self.env)
        p = subprocess.Popen(
            [sys.executable, "-m", "hydragnn_tpu.hpo", inp, out],
            env=env,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.STDOUT,
        )
        return p, out, d

    def submit(self, cfg: Dict, cpuset: Optional[str] = None) -> int:
        tid = self._next
        self._next += 1
        self._live[tid] = self._spawn(cfg, cpuset=cpuset)
        return tid

    def n_live(self) -> int:
        return len(self._live)

    def wait_any(self):
        """Block until some submission finishes; return (id, objectives
        list — one per config in the submission).  A crashed worker
        reports inf for every slot."""
        import time

        while True:
            for tid, (p, out, _d) in list(self._live.items()):
                if p.poll() is None:
                    continue
                del self._live[tid]
                vals = None
                try:
                    with open(out) as f:
                        vals = [
                            float(v) for v in json.load(f)["objectives"]
                        ]
                except Exception:
                    pass
                return tid, vals
            time.sleep(0.2)

    def run_chunked(self, cfgs: List[Dict]) -> Dict[int, float]:
        """Run all configs split into ``workers`` contiguous chunks, one
        persistent subprocess each; returns {config index: objective}."""
        chunks = []
        k, m = divmod(len(cfgs), self.workers)
        start = 0
        for i in range(self.workers):
            size = k + (1 if i < m else 0)
            if size:
                chunks.append(list(range(start, start + size)))
            start += size
        ids = {}
        for slot, idxs in enumerate(chunks):
            ids[
                self.submit(
                    [cfgs[i] for i in idxs], cpuset=self._cpuset(slot)
                )
            ] = idxs
        results: Dict[int, float] = {}
        while self.n_live():
            tid, vals = self.wait_any()
            idxs = ids[tid]
            if vals is None or len(vals) != len(idxs):
                vals = [float("inf")] * len(idxs)
            for i, v in zip(idxs, vals):
                results[i] = v
        return results


def random_search(
    base_config: Dict,
    space: Dict[str, Any],
    num_trials: int = 10,
    seed: int = 0,
    objective: Optional[Callable[[Dict], float]] = None,
    log_path: Optional[str] = None,
    workers: int = 1,
) -> Tuple[Dict[str, Any], float, List[Dict]]:
    """Returns (best_overrides, best_val, trial_log). Objective defaults to
    best validation loss from run_training.  ``workers > 1`` runs trials
    concurrently in subprocesses (TrialPool); results are identical to the
    sequential order (same seed stream, deterministic trials)."""
    rng = random.Random(seed)
    trial_cfgs = []
    for i in range(num_trials):
        overrides = sample_config(space, rng)
        cfg = apply_overrides(base_config, overrides)
        cfg.setdefault("Dataset", {})["name"] = (
            base_config.get("Dataset", {}).get("name", "hpo") + f"_trial{i}"
        )
        trial_cfgs.append((overrides, cfg))

    results: Dict[int, float] = {}
    if workers > 1 and objective is None:
        results = TrialPool(workers, pin=True).run_chunked(
            [cfg for _, cfg in trial_cfgs]
        )
    else:
        for i, (_, cfg) in enumerate(trial_cfgs):
            results[i] = (
                float(objective(cfg))
                if objective is not None
                else _run_trial_inline(cfg)
            )

    trials = []
    best, best_val = None, float("inf")
    for i, (overrides, _) in enumerate(trial_cfgs):
        val = results[i]
        trials.append({"trial": i, "overrides": overrides, "objective": val})
        if val < best_val:
            best, best_val = overrides, val
    if log_path:
        with open(log_path, "w") as f:
            json.dump(trials, f, indent=1)
    return best, best_val, trials


def successive_halving(
    base_config: Dict,
    space: Dict[str, Any],
    num_trials: int = 8,
    min_epochs: int = 4,
    eta: int = 2,
    seed: int = 0,
    workers: int = 1,
    objective: Optional[Callable[[Dict], float]] = None,
) -> Tuple[Dict[str, Any], float, List[Dict]]:
    """ASHA-style: train cohorts at increasing epoch budgets, keep the top
    1/eta each rung.  ``workers > 1`` runs each rung's trials concurrently
    in subprocess workers (TrialPool) — the rung promotion decisions are
    identical to the sequential run."""
    import hydragnn_tpu

    rng = random.Random(seed)
    cohort = [sample_config(space, rng) for _ in range(num_trials)]
    epochs = min_epochs
    log = []
    rung = 0
    while len(cohort) > 1:
        cfgs = []
        for i, overrides in enumerate(cohort):
            cfg = apply_overrides(base_config, overrides)
            cfg["NeuralNetwork"]["Training"]["num_epoch"] = epochs
            cfg.setdefault("Dataset", {})["name"] = (
                base_config.get("Dataset", {}).get("name", "hpo")
                + f"_r{rung}t{i}"
            )
            cfgs.append(cfg)

        vals: Dict[int, float] = {}
        if workers > 1 and objective is None:
            vals = TrialPool(workers).run_chunked(cfgs)
        else:
            for i, cfg in enumerate(cfgs):
                if objective is not None:
                    vals[i] = float(objective(cfg))
                else:
                    info = hydragnn_tpu.run_training(cfg)
                    vals[i] = float(info["history"][-1]["val"])

        scored = []
        for i, overrides in enumerate(cohort):
            scored.append((vals[i], overrides))
            log.append({"rung": rung, "overrides": overrides,
                        "objective": vals[i], "epochs": epochs})
        scored.sort(key=lambda t: t[0])
        keep = max(1, len(scored) // eta)
        cohort = [o for _, o in scored[:keep]]
        epochs *= eta
        rung += 1
    best = cohort[0]
    best_val = min(e["objective"] for e in log if e["overrides"] == best)
    return best, best_val, log


def _worker_main(argv):
    """Subprocess trial entry: ``python -m hydragnn_tpu.hpo in.json
    out.json`` — run a CHUNK of trial configs sequentially through
    run_training in this one process (shared JAX startup/compile cache)
    and write {"objectives": [...]}.  The TrialPool parent launches
    these."""
    cs = os.environ.get("HYDRAGNN_TPU_CPUSET")
    if cs:
        try:
            os.sched_setaffinity(0, {int(c) for c in cs.split(",")})
        except (AttributeError, OSError, ValueError):
            pass
    inp, out = argv[0], argv[1]
    with open(inp) as f:
        cfgs = json.load(f)
    vals = []
    for cfg in cfgs:
        if "_hpo_stub_objective" in cfg:
            # pool-mechanics hook (tests / dry runs): skip training
            vals.append(float(cfg["_hpo_stub_objective"]))
        else:
            vals.append(_run_trial_inline(cfg))
    with open(out + ".tmp", "w") as f:
        json.dump({"objectives": vals}, f)
    os.replace(out + ".tmp", out)


if __name__ == "__main__":
    import sys

    _worker_main(sys.argv[1:])
