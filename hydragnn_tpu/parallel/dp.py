"""Data-parallel training over a device mesh.

The TPU-native replacement for the reference's DDP wrap + DistributedSampler
(``hydragnn/utils/distributed/distributed.py:396-481``,
``preprocess/load_data.py:252-334``): each device owns whole padded
sub-batches (stacked on a leading 'data' axis), the per-device step runs
under ``shard_map``, and gradients are reduced with ``psum`` over ICI --
no NCCL/MPI, no wrapper classes.

BatchNorm statistics are ``pmean``-ed across the data axis, subsuming the
reference's SyncBatchNorm conversion (``distributed.py:416``).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hydragnn_tpu.graphs import GraphBatch
from hydragnn_tpu.train.loop import TrainState


def make_mesh(n_data: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:n_data]
    dmesh = mesh_utils.create_device_mesh((n_data,), devices=devices)
    return Mesh(dmesh, ("data",))


def stack_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack per-device batches on a new leading axis (all must share the
    same padded shapes)."""
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *batches)


def shard_stacked_batch(stacked: GraphBatch, mesh: Mesh) -> GraphBatch:
    """Place a stacked batch with leading dim = device count (single
    process) or LOCAL device count (multi-process: each process stacks the
    sub-batches for its own addressable devices and the global array is
    assembled across processes — the data path of the reference's per-rank
    DistributedSampler, ``load_data.py:252-282``)."""
    spec = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                spec, np.asarray(x)
            ),
            stacked,
        )
    return jax.tree.map(lambda x: jax.device_put(x, spec), stacked)


def put_replicated(tree, mesh: Mesh):
    """Replicate host-identical values over every device of (a possibly
    multi-process) mesh."""
    spec = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, spec), tree)

    def _one(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, spec, lambda idx: x[idx])

    return jax.tree.map(_one, tree)


def make_dp_train_step(model, tx, mesh: Mesh):
    """Build a jitted data-parallel train step.

    Input: replicated TrainState + stacked GraphBatch (leading dim =
    mesh['data'] size). Grads/metrics are psum/pmean-ed over the axis; the
    (replicated) optimizer update runs identically on every device.
    """
    from jax import shard_map

    def per_device(state: TrainState, batch: GraphBatch):
        batch = jax.tree.map(lambda x: x[0], batch)  # local shard [1,...] -> [...]
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            tot, tasks = model.loss(out, batch)
            return tot, (tasks, mutated["batch_stats"])

        (loss, (tasks, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        tasks = jax.lax.pmean(jnp.stack(tasks), "data")
        new_bs = jax.lax.pmean(new_bs, "data")
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, loss, tasks

    batch_spec = P("data")
    smapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


# ---------------------------------------------------------------------------
# the production data-parallel trainer used by run_training
# ---------------------------------------------------------------------------


class DataParallelTrainer:
    """Drop-in for :class:`hydragnn_tpu.train.loop.Trainer` running every
    train/eval step under ``shard_map`` over a ``data`` mesh axis — the
    TPU-native analogue of the reference's automatic DDP wrap
    (``run_training.py:105`` -> ``distributed.py:396-481``).

    Per-graph-count weighting: each device's loss/grads are a mean over its
    own (masked) graphs, so reductions use psum(x*ng)/psum(ng), which makes
    an 8-device step with per-device batch B numerically equal to a
    single-device step with batch 8*B — including ragged/empty tail
    shards.  BatchNorm batch statistics are ng-weighted the same way
    (SyncBatchNorm analogue, ``distributed.py:416``).

    ZeRO-1 (``Optimizer.use_zero_redundancy``, reference
    ``ZeroRedundancyOptimizer`` at ``utils/optimizer/optimizer.py:43-101``):
    the optimizer state is stored as a FLAT vector sharded over the data
    axis — each device holds 1/D of every moment buffer, updates only its
    shard, and the parameter delta is reassembled with one tiled
    ``all_gather`` over ICI.  Params stay replicated (they are small for
    GNNs); state memory drops by ~D×.
    """

    def __init__(
        self,
        model,
        opt_config,
        mesh: Mesh,
        seed: int = 0,
        mlip=None,
        precision: str = "fp32",
    ):
        import dataclasses

        from jax import shard_map

        from hydragnn_tpu.train.loop import Trainer

        # inherit single-device steps (predict/init/evaluate fallbacks)
        self._single = Trainer(
            model, opt_config, seed=seed, mlip=mlip, precision=precision
        )
        self.model = model
        # SyncBatchNorm clone for the sharded steps: identical params/stats
        # tree, BN statistics psum'd over the data axis in-forward
        sync_model = type(model)(
            cfg=dataclasses.replace(model.cfg, bn_sync_axis="data")
        )
        model = sync_model
        self.tx = self._single.tx
        self.seed = seed
        self.mlip = mlip
        self.precision = self._single.precision
        self.mesh = mesh
        self.n_dev = mesh.shape["data"]
        self.zero1 = bool(opt_config.get("use_zero_redundancy", False))
        # FSDP / ZeRO-3 analogue (reference distributed.py:428-477,
        # HYDRAGNN_USE_FSDP): params + grads + optimizer state ALL sharded.
        # Params live as one flat vector split over the data axis; the
        # forward all-gathers it (one tiled collective), and reverse-mode AD
        # transposes that gather into the reduce-scatter of gradients, so
        # each device updates only its 1/D shard — params are never
        # materialized fully in optimizer state or updates.
        self.fsdp = bool(opt_config.get("use_fsdp", False)) or os.environ.get(
            "HYDRAGNN_TPU_USE_FSDP", ""
        ) in ("1", "true")
        if self.fsdp and self.zero1:
            self.zero1 = False  # fsdp subsumes opt-state sharding
        self._unravel = None
        self._flat_len = None
        self._shard_map = shard_map
        cast_in = self._single._cast_in
        cast_grads = self._single._cast_grads

        def loss_and_aux(params, batch_stats, batch, rng, train):
            params_c = cast_in(params)
            batch = cast_in(batch)
            if mlip is not None:
                from hydragnn_tpu.models.mlip import energy_force_loss

                tot, tasks, new_bs, _, _ = energy_force_loss(
                    model, params_c, batch_stats, batch, mlip,
                    train=train, rng=rng,
                )
                return tot.astype(jnp.float32), (jnp.stack(tasks), new_bs)
            if train:
                out, mutated = model.apply(
                    {"params": params_c, "batch_stats": batch_stats},
                    batch, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                new_bs = mutated["batch_stats"]
            else:
                out = model.apply(
                    {"params": params_c, "batch_stats": batch_stats},
                    batch, train=False,
                )
                new_bs = batch_stats
            tot, tasks = model.loss(out, batch)
            return tot.astype(jnp.float32), (jnp.stack(tasks), new_bs)

        def fsdp_full_params(p_shard):
            """All-gather this device's flat param shard and rebuild the
            pytree; reverse-mode AD transposes the tiled all_gather into
            the gradient reduce-scatter (FULL_SHARD semantics for free)."""
            full = jax.lax.all_gather(p_shard, "data", tiled=True)
            return self._unravel(full[: self._flat_len])

        def train_per_device(state, batch):
            batch = jax.tree.map(lambda x: x[0], batch)
            ng = batch.graph_mask.sum().astype(jnp.float32)
            denom = jnp.maximum(jax.lax.psum(ng, "data"), 1.0)
            rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), state.step)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

            if self.fsdp:
                def loss_flat(p_shard):
                    params = fsdp_full_params(p_shard)
                    loss, aux = loss_and_aux(
                        params, state.batch_stats, batch, rng, True
                    )
                    # weight BEFORE differentiating: the reduce-scatter in
                    # the all_gather transpose then yields exactly the
                    # ng-weighted-mean gradient shard
                    return loss * ng / denom, (loss, aux)

                (_, (loss, (tasks, new_bs))), g_shard = jax.value_and_grad(
                    loss_flat, has_aux=True
                )(state.params)
                g_shard = cast_grads(g_shard)
                loss = jax.lax.psum(loss * ng, "data") / denom
                tasks = jax.lax.psum(tasks * ng, "data") / denom
                new_bs = jax.tree.map(
                    lambda s: (
                        jax.lax.psum(s.astype(jnp.float32) * ng, "data") / denom
                    ).astype(jnp.float32)
                    if jnp.issubdtype(s.dtype, jnp.floating)
                    else jax.lax.pmax(s, "data"),
                    new_bs,
                )
                upd, new_opt = self.tx.update(
                    g_shard, state.opt_state, state.params
                )
                new_params = state.params + upd
                from hydragnn_tpu.train.loop import TrainState

                return (
                    TrainState(
                        params=new_params, batch_stats=new_bs,
                        opt_state=new_opt, step=state.step + 1,
                    ),
                    loss, tasks, denom,
                )

            (loss, (tasks, new_bs)), grads = jax.value_and_grad(
                lambda p: loss_and_aux(p, state.batch_stats, batch, rng, True),
                has_aux=True,
            )(state.params)
            grads = cast_grads(grads)
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g * ng, "data") / denom, grads
            )
            loss = jax.lax.psum(loss * ng, "data") / denom
            tasks = jax.lax.psum(tasks * ng, "data") / denom
            new_bs = jax.tree.map(
                lambda s: (
                    jax.lax.psum(
                        s.astype(jnp.float32) * ng, "data"
                    ) / denom
                ).astype(jnp.float32)
                if jnp.issubdtype(s.dtype, jnp.floating)
                else jax.lax.pmax(s, "data"),
                new_bs,
            )
            if self.zero1:
                new_params, new_opt = self._zero1_apply(state, grads)
            else:
                updates, new_opt = self.tx.update(
                    grads, state.opt_state, state.params
                )
                new_params = jax.tree.map(
                    lambda p, u: p + u, state.params, updates
                )
            from hydragnn_tpu.train.loop import TrainState

            return (
                TrainState(
                    params=new_params, batch_stats=new_bs,
                    opt_state=new_opt, step=state.step + 1,
                ),
                loss, tasks, denom,
            )

        def eval_per_device(state, batch):
            batch = jax.tree.map(lambda x: x[0], batch)
            ng = batch.graph_mask.sum().astype(jnp.float32)
            denom = jnp.maximum(jax.lax.psum(ng, "data"), 1.0)
            params = fsdp_full_params(state.params) if self.fsdp else state.params
            loss, (tasks, _) = loss_and_aux(
                params, state.batch_stats, batch, None, False,
            )
            loss = jax.lax.psum(loss * ng, "data") / denom
            tasks = jax.lax.psum(tasks * ng, "data") / denom
            return loss, tasks, denom

        self._train_fn = train_per_device
        self._eval_fn = eval_per_device
        self.__dp_train = None
        self.__dp_eval = None
        self._empty_batch = None

    # ZeRO-1 ------------------------------------------------------------------
    def _zero1_apply(self, state, grads):
        """Sharded optimizer update inside shard_map: this device's opt-state
        leaves are [L/D] slices of the flat buffers; slice the (replicated)
        grads/params likewise, update locally, all_gather the deltas."""
        from jax.flatten_util import ravel_pytree

        flat_g, _ = ravel_pytree(grads)
        flat_p, unravel = ravel_pytree(state.params)
        L0 = flat_g.size
        pad = (-L0) % self.n_dev
        flat_g = jnp.concatenate([flat_g, jnp.zeros((pad,), flat_g.dtype)])
        flat_p_pad = jnp.concatenate([flat_p, jnp.zeros((pad,), flat_p.dtype)])
        shard = flat_g.size // self.n_dev
        i = jax.lax.axis_index("data")
        g_sh = jax.lax.dynamic_slice(flat_g, (i * shard,), (shard,))
        p_sh = jax.lax.dynamic_slice(flat_p_pad, (i * shard,), (shard,))
        upd_sh, new_opt = self.tx.update(g_sh, state.opt_state, p_sh)
        upd = jax.lax.all_gather(upd_sh, "data", tiled=True)
        new_params = unravel(flat_p + upd[:L0])
        return new_params, new_opt

    def _state_specs(self, state):
        from hydragnn_tpu.train.loop import TrainState

        if self.fsdp:
            opt_specs = jax.tree.map(
                lambda x: P("data")
                if (
                    getattr(x, "ndim", 0) >= 1
                    and x.shape[0] > 0
                    and x.shape[0] % self.n_dev == 0
                )
                else P(),
                state.opt_state,
            )
            return TrainState(
                params=P("data"),  # flat vector sharded over the axis
                batch_stats=jax.tree.map(lambda _: P(), state.batch_stats),
                opt_state=opt_specs,
                step=P(),
            )
        if not self.zero1:
            return P()

        opt_specs = jax.tree.map(
            lambda x: P("data")
            if (
                getattr(x, "ndim", 0) >= 1
                and x.shape[0] > 0
                and x.shape[0] % self.n_dev == 0
            )
            else P(),
            state.opt_state,
        )
        return TrainState(
            params=jax.tree.map(lambda _: P(), state.params),
            batch_stats=jax.tree.map(lambda _: P(), state.batch_stats),
            opt_state=opt_specs,
            step=P(),
        )

    def _steps(self, state):
        if self.__dp_train is None:
            sspec = self._state_specs(state)
            self.__dp_train = jax.jit(
                self._shard_map(
                    self._train_fn, mesh=self.mesh,
                    in_specs=(sspec, P("data")),
                    out_specs=(sspec, P(), P(), P()),
                    check_vma=False,
                )
            )
            self.__dp_eval = jax.jit(
                self._shard_map(
                    self._eval_fn, mesh=self.mesh,
                    in_specs=(sspec, P("data")),
                    out_specs=(P(), P(), P()),
                    check_vma=False,
                )
            )
        return self.__dp_train, self.__dp_eval

    # single-device delegates -------------------------------------------------
    def init_state(self, example):
        state = self._single.init_state(example)
        if self.fsdp:
            from jax.flatten_util import ravel_pytree

            flat_p, unravel = ravel_pytree(state.params)
            self._unravel = unravel
            self._flat_len = int(flat_p.size)
            pad = (-flat_p.size) % self.n_dev
            flat_p = jnp.concatenate(
                [flat_p, jnp.zeros((pad,), flat_p.dtype)]
            )
            state = state.replace(
                params=flat_p, opt_state=self.tx.init(flat_p)
            )
            return self.place_state(state)
        if self.zero1:
            from jax.flatten_util import ravel_pytree

            flat_p, _ = ravel_pytree(state.params)
            pad = (-flat_p.size) % self.n_dev
            flat_p = jnp.concatenate(
                [flat_p, jnp.zeros((pad,), flat_p.dtype)]
            )
            state = state.replace(opt_state=self.tx.init(flat_p))
        return state

    def full_params(self, state):
        """Rebuild the replicated param pytree from an FSDP-sharded state
        (for prediction / final export)."""
        if not self.fsdp:
            return state.params
        flat = jax.device_get(state.params)[: self._flat_len]
        return self._unravel(jnp.asarray(flat))

    def place_state(self, state):
        """Place every leaf with its mesh sharding (replicated, or
        data-sharded opt-state under ZeRO-1).  Needed after a checkpoint
        restore: orbax hands back arrays committed to device 0, which jit
        refuses to mix with mesh-sharded batch inputs.  Multi-process:
        host-identical leaves are assembled with make_array_from_callback
        (device_put cannot target non-addressable devices)."""
        specs = self._state_specs(state)
        multi = jax.process_count() > 1

        def _put(x, s):
            sh = NamedSharding(self.mesh, s)
            if not multi:
                return jax.device_put(x, sh)
            a = np.asarray(jax.device_get(x))
            return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

        if not isinstance(specs, P):
            return jax.tree.map(lambda x, s: _put(x, s), state, specs)
        return jax.tree.map(lambda x: _put(x, P()), state)

    @property
    def predict_step(self):
        if self.fsdp:
            single = self._single.predict_step

            def step(state, batch):
                return single(
                    state.replace(params=self.full_params(state)), batch
                )

            return step
        return self._single.predict_step

    @property
    def train_step(self):
        return self._single.train_step

    @property
    def eval_step(self):
        return self._single.eval_step

    # grouping ---------------------------------------------------------------
    def _groups(self, loader):
        """Yield stacked+sharded groups of same-shape batches; with a
        BucketedBatcher upstream, batches are pooled per padded shape (one
        executable per bucket).  Ragged tails are padded with all-masked
        empty batches (ng-weighting makes them no-ops).

        Each PROCESS stacks only the sub-batches for its own addressable
        devices; the global array spans the mesh (multi-host DP).  In
        multi-process mode the local batch stream is capped at the minimum
        count across processes so every process executes the same number of
        collectives — the analogue of the reference's lockstep
        ``MPI.allreduce(nbatch, MIN)`` (train_validate_test.py:672)."""
        import numpy as _np

        n_local = max(self.n_dev // jax.process_count(), 1)

        def shape_key(batch):
            return tuple(
                _np.asarray(x).shape for x in jax.tree.leaves(batch)
            )

        def stream():
            if jax.process_count() == 1:
                yield from loader
                return
            from jax.experimental import multihost_utils

            try:
                nb_local = len(loader)
            except TypeError:
                nb_local = None
            if nb_local is None:
                yield from loader
                return
            counts = multihost_utils.process_allgather(
                np.asarray([nb_local], np.int64)
            )
            nb_min = int(np.asarray(counts).min())
            for i, batch in enumerate(loader):
                if i >= nb_min:
                    break
                yield batch

        pending = {}
        for batch in stream():
            k = shape_key(batch)
            pending.setdefault(k, []).append(batch)
            if len(pending[k]) == n_local:
                yield shard_stacked_batch(stack_batches(pending[k]), self.mesh)
                pending[k] = []
        for group in pending.values():
            if not group:
                continue
            empty = jax.tree.map(
                lambda x: _np.zeros_like(_np.asarray(x)), group[0]
            )
            group = group + [empty] * (n_local - len(group))
            yield shard_stacked_batch(stack_batches(group), self.mesh)

    def run_epoch(self, state, loader):
        total = 0.0
        tasks_total = None
        n = 0.0
        dp_train, _ = self._steps(state)
        for stacked in self._groups(loader):
            state, loss, tasks, ng = dp_train(state, stacked)
            ngf = float(ng)
            total += float(loss) * ngf
            t = np.asarray(tasks)
            tasks_total = t * ngf if tasks_total is None else tasks_total + t * ngf
            n += ngf
        if tasks_total is None:
            return state, 0.0, np.zeros((1,))
        return state, total / max(n, 1.0), tasks_total / max(n, 1.0)

    def evaluate(self, state, loader):
        total = 0.0
        tasks_total = None
        n = 0.0
        _, dp_eval = self._steps(state)
        for stacked in self._groups(loader):
            loss, tasks, ng = dp_eval(state, stacked)
            ngf = float(ng)
            total += float(loss) * ngf
            t = np.asarray(tasks)
            tasks_total = t * ngf if tasks_total is None else tasks_total + t * ngf
            n += ngf
        if tasks_total is None:
            return 0.0, np.zeros((1,))
        return total / max(n, 1.0), tasks_total / max(n, 1.0)
