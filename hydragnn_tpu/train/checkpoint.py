"""Checkpoint / resume.

Re-derivation of reference ``hydragnn/utils/model/model.py`` semantics on
orbax: per-epoch checkpoints with a tracked latest (the reference keeps
per-epoch files + a ``name.pk`` symlink, ``model.py:160-187``), best-val
gating with warmup (``Checkpoint`` callback, :531-571), resume support
(``load_existing_model``, :212-311).  Sharded/multi-host saves come from
orbax natively (replacing FSDP full-state-dict consolidation, :119-158).
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from hydragnn_tpu.train.loop import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState, extra: Optional[dict] = None):
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if extra:
            payload["extra"] = extra
        self.mngr.save(step, args=ocp.args.StandardSave(payload))
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )


class BestValCheckpoint:
    """Best-validation-metric gate with warmup (reference ``Checkpoint``
    callback, ``model.py:531-571``)."""

    def __init__(self, manager: CheckpointManager, warmup: int = 10):
        self.manager = manager
        self.warmup = warmup
        self.best = float("inf")
        self.best_step = None

    def __call__(self, epoch: int, val_loss: float, state: TrainState) -> bool:
        if epoch < self.warmup:
            return False
        if val_loss < self.best:
            self.best = val_loss
            self.best_step = epoch
            self.manager.save(epoch, state, extra={"val_loss": float(val_loss)})
            return True
        return False


def save_model(log_dir: str, state: TrainState) -> str:
    """Single versioned final-model save (params + batch stats) — the
    reference ``save_model`` (model.py:104-187) analogue on orbax, shared
    with ``run_prediction`` (one serialization path)."""
    path = os.path.join(os.path.abspath(log_dir), "model")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {"params": state.params, "batch_stats": state.batch_stats},
        force=True,
    )
    ckptr.wait_until_finished()
    return path


def load_model(log_dir: str, state: TrainState) -> TrainState:
    """Restore a final model saved by :func:`save_model` (the reference
    ``load_existing_model``, model.py:212-311)."""
    path = os.path.join(os.path.abspath(log_dir), "model")
    template = {"params": state.params, "batch_stats": state.batch_stats}
    restored = ocp.StandardCheckpointer().restore(path, target=template)
    return state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    )
