"""Config-driven train / validate / test loop.

TPU-native analogue of the reference epoch loop
(``hydragnn/train/train_validate_test.py:185-491``): per-epoch
train -> validate -> test, ReduceLROnPlateau on the validation loss
(factor 0.5, patience 5, min_lr 1e-5 -- ``run_training.py:119-121``),
EarlyStopping, best-validation checkpointing with warmup.

The whole train step (forward, loss, backward, optimizer update, BatchNorm
stat update) is one jitted function; batches have static shapes so the
executable is compiled once per (model, padding) pair.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from hydragnn_tpu.graphs import GraphBatch
from hydragnn_tpu.models.base import ConvStack
from hydragnn_tpu.train.optimizer import (
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class Trainer:
    """Owns the jitted steps for one model + optimizer."""

    def __init__(
        self,
        model: ConvStack,
        opt_config: Dict,
        seed: int = 0,
        mlip: Optional[Dict] = None,
        precision: str = "fp32",
    ):
        self.model = model
        self.tx = make_optimizer(opt_config)
        self.seed = seed
        self.mlip = mlip
        self.precision = (precision or "fp32").lower()

        def _cast_in(tree):
            """bf16 autocast analogue (reference PRECISION_MAP,
            train_validate_test.py:43-49: fp32 master params + bf16
            compute): cast float leaves for the forward/backward."""
            if self.precision != "bf16":
                return tree
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                tree,
            )

        def _cast_grads(tree):
            if self.precision != "bf16":
                return tree
            return jax.tree.map(lambda g: g.astype(jnp.float32), tree)

        self._cast_in = _cast_in
        self._cast_grads = _cast_grads

        @jax.jit
        def _train_step(state: TrainState, batch: GraphBatch):
            rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), state.step)
            batch = _cast_in(batch)

            def loss_fn(params):
                params_c = _cast_in(params)
                if self.mlip is not None:
                    from hydragnn_tpu.models.mlip import energy_force_loss

                    tot, tasks, new_bs, _, _ = energy_force_loss(
                        self.model,
                        params_c,
                        state.batch_stats,
                        batch,
                        self.mlip,
                        train=True,
                        rng=rng,
                    )
                    return tot.astype(jnp.float32), (tasks, new_bs)
                out, mutated = self.model.apply(
                    {"params": params_c, "batch_stats": state.batch_stats},
                    batch,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                tot, tasks = self.model.loss(out, batch)
                return tot.astype(jnp.float32), (tasks, mutated["batch_stats"])

            (loss, (tasks, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            grads = _cast_grads(grads)
            new_bs = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                new_bs,
            )
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(
                lambda p, u: p + u, state.params, updates
            )
            new_state = TrainState(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
            )
            return new_state, loss, jnp.stack(tasks)

        @jax.jit
        def _eval_step(state: TrainState, batch: GraphBatch):
            batch = _cast_in(batch)
            state = state.replace(params=_cast_in(state.params))
            if self.mlip is not None:
                from hydragnn_tpu.models.mlip import energy_force_loss

                tot, tasks, _, _, _ = energy_force_loss(
                    self.model,
                    state.params,
                    state.batch_stats,
                    batch,
                    self.mlip,
                    train=False,
                )
                return tot, jnp.stack(tasks)
            out = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch,
                train=False,
            )
            tot, tasks = self.model.loss(out, batch)
            return tot, jnp.stack(tasks)

        @jax.jit
        def _predict_step(state: TrainState, batch: GraphBatch):
            return self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch,
                train=False,
            )

        self.train_step = _train_step
        self.eval_step = _eval_step
        self.predict_step = _predict_step

    def init_state(self, example: GraphBatch) -> TrainState:
        variables = self.model.init(
            {"params": jax.random.PRNGKey(self.seed), "dropout": jax.random.PRNGKey(1)},
            example,
            train=False,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )

    # -------------------------------------------------------------- epochs
    def run_epoch(self, state: TrainState, loader) -> Tuple[TrainState, float, np.ndarray]:
        total = 0.0
        tasks_total = None
        n = 0
        for ng, batch in _device_batches(loader):
            state, loss, tasks = self.train_step(state, batch)
            total += float(loss) * ng
            t = np.asarray(tasks)
            tasks_total = t * ng if tasks_total is None else tasks_total + t * ng
            n += ng
        if tasks_total is None:  # empty loader (e.g. tiny dataset + drop_last)
            return state, 0.0, np.zeros((1,))
        return state, total / max(n, 1), tasks_total / max(n, 1)

    def evaluate(self, state: TrainState, loader) -> Tuple[float, np.ndarray]:
        total = 0.0
        tasks_total = None
        n = 0
        for ng, batch in _device_batches(loader):
            loss, tasks = self.eval_step(state, batch)
            total += float(loss) * ng
            t = np.asarray(tasks)
            tasks_total = t * ng if tasks_total is None else tasks_total + t * ng
            n += ng
        if tasks_total is None:
            return 0.0, np.zeros((1,))
        return total / max(n, 1), tasks_total / max(n, 1)


def _device_batches(loader, depth: int = 2):
    """Yield ``(num_real_graphs, device_batch)`` with the host->device
    transfer issued ``depth`` batches ahead of consumption.

    ``jax.device_put`` is asynchronous, so enqueueing the NEXT batch's
    transfer before the current step runs overlaps H2D with compute — the
    device-side completion of the reference's prefetching dataloader
    (``load_data.py:94-204``; host-side collation overlap lives in
    ``data/prefetch.py``).  Profiling on the v5e showed per-step H2D of the
    numpy batch serializing with compute and dominating small steps.  The
    graph count is read on the host BEFORE the transfer so the epoch loop
    never syncs the device for bookkeeping.

    Skipped for multi-device sharded batches (loader yields already-placed
    arrays) — ``device_put`` without a sharding would gather them onto one
    device.
    """
    import jax

    max_nb = _max_num_batch()
    if jax.device_count() > 1:
        for nb, batch in enumerate(loader):
            if max_nb is not None and nb >= max_nb:
                break
            yield int(np.asarray(batch.graph_mask).sum()), batch
        return
    from collections import deque

    buf: deque = deque()
    for nb, batch in enumerate(loader):
        if max_nb is not None and nb >= max_nb:
            break
        ng = int(np.asarray(batch.graph_mask).sum())
        buf.append((ng, jax.device_put(batch)))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def _max_num_batch() -> Optional[int]:
    """Per-epoch batch cap for scaling runs (reference
    ``HYDRAGNN_MAX_NUM_BATCH``, train_validate_test.py:675)."""
    v = os.environ.get("HYDRAGNN_TPU_MAX_NUM_BATCH")
    return int(v) if v else None


def train_validate_test(
    trainer: Trainer,
    state: TrainState,
    train_loader,
    val_loader,
    test_loader,
    config: Dict,
    verbosity: int = 0,
    log_dir: Optional[str] = None,
) -> Tuple[TrainState, Dict[str, Any]]:
    training = config["NeuralNetwork"]["Training"]
    num_epoch = int(training.get("num_epoch", 1))
    patience = int(training.get("patience", 10))
    use_early_stop = bool(training.get("EarlyStopping", False))
    use_ckpt = bool(training.get("Checkpoint", False))
    warmup = int(training.get("checkpoint_warmup", 10))

    # TensorBoard scalars (reference SummaryWriter, model/model.py:193-199);
    # torch (cpu) provides the writer, guarded so it stays optional
    writer = None
    if log_dir is not None:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            writer = None
    ckpt_mngr = None
    if log_dir is not None and use_ckpt:
        try:
            from hydragnn_tpu.train.checkpoint import CheckpointManager

            ckpt_mngr = CheckpointManager(
                os.path.join(os.path.abspath(log_dir), "ckpt")
            )
        except Exception:
            ckpt_mngr = None

    # ReduceLROnPlateau state (torch semantics; reference run_training.py:
    # 119-121 hard-codes factor=0.5/patience=5/min_lr=1e-5 — here they are
    # overridable via Training.scheduler for slow-converging force fits)
    sched_cfg = training.get("scheduler", {}) or {}
    sched_factor = float(sched_cfg.get("factor", 0.5))
    sched_patience = int(sched_cfg.get("patience", 5))
    min_lr = float(sched_cfg.get("min_lr", 1e-5))
    sched_best = float("inf")
    sched_bad = 0

    best_val = float("inf")
    best_state = state
    es_best = float("inf")
    es_bad = 0

    from hydragnn_tpu.utils.tracer import tracer

    # remaining-walltime early stop (reference check_remaining,
    # distributed.py:614-639 + train_validate_test.py:430-437): stop when
    # the next epoch would not fit in the remaining budget
    import time as _time

    walltime = training.get("CheckRemainingTime")
    if isinstance(walltime, bool):
        walltime = os.environ.get("HYDRAGNN_TPU_WALLTIME") if walltime else None
    walltime = float(walltime) if walltime else None
    t_start = _time.time()
    last_epoch_dur = 0.0

    # Profile config section (reference per-epoch torch.profiler window via
    # config "Profile", train_validate_test.py:290-292 + profile.py:9-70):
    # jax.profiler trace of one training epoch -> TensorBoard/xprof
    profile_cfg = config["NeuralNetwork"].get("Profile", {}) or {}
    profile_enabled = bool(profile_cfg.get("enable", 0)) and log_dir is not None
    profile_epoch = int(profile_cfg.get("epoch", 1))

    history: List[Dict[str, float]] = []
    for epoch in range(num_epoch):
        if walltime is not None and (
            _time.time() - t_start + 1.2 * last_epoch_dur > walltime
        ):
            break
        t_epoch = _time.time()
        for loader in (train_loader, val_loader, test_loader):
            if hasattr(loader, "set_epoch"):
                loader.set_epoch(epoch)
        tracer.start("train")
        if profile_enabled and epoch == min(profile_epoch, num_epoch - 1):
            from hydragnn_tpu.utils.tracer import profile_window

            with profile_window(os.path.join(log_dir, "profile")):
                state, train_loss, train_tasks = trainer.run_epoch(
                    state, train_loader
                )
        else:
            state, train_loss, train_tasks = trainer.run_epoch(state, train_loader)
        tracer.stop("train")
        # scaling-run knob: skip per-epoch val/test entirely (reference
        # HYDRAGNN_VALTEST, train_validate_test.py:343 + SC25 job scripts)
        if os.environ.get("HYDRAGNN_TPU_VALTEST", "1") in ("0", "false"):
            val_loss, val_tasks = float("inf"), np.zeros((1,))
            test_loss, test_tasks = float("inf"), np.zeros((1,))
        else:
            tracer.start("validate")
            val_loss, val_tasks = trainer.evaluate(state, val_loader)
            tracer.stop("validate")
            test_loss, test_tasks = trainer.evaluate(state, test_loader)
        history.append(
            {
                "train": train_loss,
                "val": val_loss,
                "test": test_loss,
                "epoch": epoch,
                # per-task components (for MLIP: [energy, energy/atom, force])
                "val_tasks": [float(t) for t in np.asarray(val_tasks).ravel()],
                "test_tasks": [float(t) for t in np.asarray(test_tasks).ravel()],
            }
        )
        if writer is not None:
            writer.add_scalar("train_loss", train_loss, epoch)
            writer.add_scalar("val_loss", val_loss, epoch)
            writer.add_scalar("test_loss", test_loss, epoch)
            for i, t in enumerate(np.asarray(train_tasks)):
                writer.add_scalar(f"train_task_{i}", float(t), epoch)
        if verbosity > 0:
            lr = get_learning_rate(state.opt_state)
            print(
                f"epoch {epoch}: train {train_loss:.6f} val {val_loss:.6f} "
                f"test {test_loss:.6f} lr {lr:.2e}"
            )

        # scheduler
        if val_loss < sched_best:
            sched_best = val_loss
            sched_bad = 0
        else:
            sched_bad += 1
            if sched_bad > sched_patience:
                lr = max(get_learning_rate(state.opt_state) * sched_factor, min_lr)
                state = state.replace(
                    opt_state=set_learning_rate(state.opt_state, lr)
                )
                sched_bad = 0

        # best-val checkpoint with warmup (reference Checkpoint, model.py:531-571)
        if use_ckpt and epoch >= warmup and val_loss < best_val:
            best_val = val_loss
            best_state = state
            if ckpt_mngr is not None:
                ckpt_mngr.save(epoch, state, extra={"val_loss": float(val_loss)})

        last_epoch_dur = _time.time() - t_epoch

        # early stopping
        if use_early_stop:
            if val_loss < es_best:
                es_best = val_loss
                es_bad = 0
            else:
                es_bad += 1
                if es_bad >= patience:
                    break

    if writer is not None:
        writer.close()
    final_state = best_state if (use_ckpt and best_val < float("inf")) else state
    return final_state, {"history": history, "best_val": best_val}
