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


def random_search(
    base_config: Dict,
    space: Dict[str, Any],
    num_trials: int = 10,
    seed: int = 0,
    objective: Optional[Callable[[Dict], float]] = None,
    log_path: Optional[str] = None,
) -> Tuple[Dict[str, Any], float, List[Dict]]:
    """Returns (best_overrides, best_val, trial_log). Objective defaults to
    best validation loss from run_training."""
    import hydragnn_tpu

    rng = random.Random(seed)
    trials = []
    best, best_val = None, float("inf")
    for i in range(num_trials):
        overrides = sample_config(space, rng)
        cfg = apply_overrides(base_config, overrides)
        cfg.setdefault("Dataset", {})["name"] = (
            base_config.get("Dataset", {}).get("name", "hpo") + f"_trial{i}"
        )
        if objective is not None:
            val = float(objective(cfg))
        else:
            info = hydragnn_tpu.run_training(cfg)
            # best_val can be inf when the run is shorter than the
            # checkpoint warmup — fall back to the observed history
            val = float(info.get("best_val", float("inf")))
            if not math.isfinite(val):
                val = min(
                    (float(h["val"]) for h in info["history"]),
                    default=float("inf"),
                )
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
) -> Tuple[Dict[str, Any], float, List[Dict]]:
    """ASHA-style: train cohorts at increasing epoch budgets, keep the top
    1/eta each rung."""
    import hydragnn_tpu

    rng = random.Random(seed)
    cohort = [sample_config(space, rng) for _ in range(num_trials)]
    epochs = min_epochs
    log = []
    scores = {}
    rung = 0
    while len(cohort) > 1:
        scored = []
        for i, overrides in enumerate(cohort):
            cfg = apply_overrides(base_config, overrides)
            cfg["NeuralNetwork"]["Training"]["num_epoch"] = epochs
            cfg.setdefault("Dataset", {})["name"] = (
                base_config.get("Dataset", {}).get("name", "hpo")
                + f"_r{rung}t{i}"
            )
            info = hydragnn_tpu.run_training(cfg)
            val = float(info["history"][-1]["val"])
            scored.append((val, overrides))
            log.append({"rung": rung, "overrides": overrides, "objective": val,
                        "epochs": epochs})
        scored.sort(key=lambda t: t[0])
        keep = max(1, len(scored) // eta)
        cohort = [o for _, o in scored[:keep]]
        epochs *= eta
        rung += 1
    best = cohort[0]
    best_val = min(e["objective"] for e in log if e["overrides"] == best)
    return best, best_val, log
