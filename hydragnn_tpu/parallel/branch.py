"""Branch (multi-task) model parallelism over a 2-D (branch, data) mesh.

TPU-native analogue of the reference ``MultiTaskModelMP``
(``hydragnn/models/MultiTaskModelMP.py:269-490``): the shared encoder's
gradients reduce over the WHOLE mesh while each branch's decoder is
trained only by its branch's data.

Design note (why this is simpler than the reference): branch routing
already lives inside the model (`_select_branch` masks decoder outputs by
``dataset_id``), so a decoder's gradients from foreign-branch rows are
exactly zero.  A single ``psum`` over both mesh axes therefore yields the
same update as the reference's two-level process groups (encoder allreduce
over WORLD + decoder allreduce over the branch group,
``MultiTaskModelMP.py:404-484``) -- no process-group plumbing, no
DualOptimizer.  Each (branch b, data d) device feeds batches drawn from
branch b's dataset (per-branch loaders, the ``examples/multibranch``
pattern).
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


def make_branch_mesh(n_branch: int, n_data: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[: n_branch * n_data]
    dmesh = mesh_utils.create_device_mesh((n_branch, n_data), devices=devices)
    return Mesh(dmesh, ("branch", "data"))


def stack_branch_batches(per_branch: Sequence[Sequence[GraphBatch]]) -> GraphBatch:
    """per_branch[b][d] -> leaves stacked [B, D, ...]."""
    rows = [jax.tree.map(lambda *xs: np.stack(xs, 0), *row) for row in per_branch]
    return jax.tree.map(lambda *xs: np.stack(xs, 0), *rows)


def shard_branch_batch(stacked: GraphBatch, mesh: Mesh) -> GraphBatch:
    spec = NamedSharding(mesh, P("branch", "data"))
    return jax.tree.map(lambda x: jax.device_put(x, spec), stacked)


def make_branch_dp_train_step(model, tx, mesh: Mesh):
    from jax.experimental.shard_map import shard_map

    def per_device(state: TrainState, batch: GraphBatch):
        batch = jax.tree.map(lambda x: x[0, 0], batch)
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("branch"))
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
        # encoder grads: mean over every device; decoder grads of branch b
        # receive zero contributions from other branches' rows, so the same
        # global reduction implements per-branch decoder training
        grads = jax.lax.pmean(jax.lax.pmean(grads, "data"), "branch")
        loss = jax.lax.pmean(jax.lax.pmean(loss, "data"), "branch")
        tasks = jax.lax.pmean(
            jax.lax.pmean(jnp.stack(tasks), "data"), "branch"
        )
        new_bs = jax.lax.pmean(jax.lax.pmean(new_bs, "data"), "branch")
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (
            TrainState(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            loss,
            tasks,
        )

    smapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("branch", "data")),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(smapped)
