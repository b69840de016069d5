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
    spec = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, spec), stacked)


def make_dp_train_step(model, tx, mesh: Mesh):
    """Build a jitted data-parallel train step.

    Input: replicated TrainState + stacked GraphBatch (leading dim =
    mesh['data'] size). Grads/metrics are psum/pmean-ed over the axis; the
    (replicated) optimizer update runs identically on every device.
    """
    from jax.experimental.shard_map import shard_map

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
        check_rep=False,
    )
    return jax.jit(smapped)
