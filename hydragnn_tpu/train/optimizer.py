"""Optimizer selection (reference ``hydragnn/utils/optimizer/optimizer.py``).

Covers the reference menu -- SGD / Adam / Adadelta / Adagrad / Adamax /
AdamW / RMSprop / FusedLAMB -> optax.lamb -- with torch-matching defaults.
The learning rate is injected as a mutable hyperparameter so the host-side
ReduceLROnPlateau controller can update it without re-jitting.

ZeRO-style optimizer-state sharding (reference ZeroRedundancyOptimizer,
``optimizer.py:43-101``) is handled by parameter/opt-state sharding specs in
``parallel`` rather than a wrapper class.
"""

from __future__ import annotations

import optax


def make_optimizer(opt_config: dict) -> optax.GradientTransformation:
    kind = opt_config.get("type", "AdamW")
    lr = float(opt_config.get("learning_rate", 1e-3))

    factories = {
        "SGD": lambda learning_rate: optax.sgd(learning_rate),
        "Adam": lambda learning_rate: optax.adam(
            learning_rate, b1=0.9, b2=0.999, eps=1e-8
        ),
        "Adadelta": lambda learning_rate: optax.adadelta(
            learning_rate, rho=0.9, eps=1e-6
        ),
        "Adagrad": lambda learning_rate: optax.adagrad(learning_rate, eps=1e-10),
        "Adamax": lambda learning_rate: optax.adamax(
            learning_rate, b1=0.9, b2=0.999, eps=1e-8
        ),
        "AdamW": lambda learning_rate: optax.adamw(
            learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
        ),
        "RMSprop": lambda learning_rate: optax.rmsprop(
            learning_rate, decay=0.99, eps=1e-8
        ),
        "FusedLAMB": lambda learning_rate: optax.lamb(learning_rate),
    }
    if kind not in factories:
        raise ValueError(f"Unknown optimizer type {kind}")
    return optax.inject_hyperparams(factories[kind])(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning-rate hyperparameter."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])
