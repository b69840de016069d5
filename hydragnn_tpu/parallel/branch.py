"""Branch (multi-task) model parallelism over a 2-D (branch, data) mesh.

TPU-native analogue of the reference ``MultiTaskModelMP``
(``hydragnn/models/MultiTaskModelMP.py:269-490``): the shared encoder's
gradients reduce over the WHOLE mesh while each branch's decoder is
trained only by its branch's data.

Design note (why this is simpler than the reference): branch routing
already lives inside the model (`_select_branch` masks decoder outputs by
``dataset_id``), so a decoder's gradients from foreign-branch rows are
exactly zero.  Encoder gradients are averaged over the whole mesh (the
reference's WORLD allreduce); branch-b decoder gradients are nonzero on
only the D devices of row b, so after the global ``pmean`` (divide by
B*D) they are rescaled by B, which equals the reference's average over
the D-member head process group only (``MultiTaskModelMP.py:404-484``).
Decoder param subtrees are identified by name (``head_*`` /
``graph_shared_*``, models/base.py).  Each (branch b, data d) device
feeds batches drawn from branch b's dataset (per-branch loaders, the
``examples/multibranch`` pattern).
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


def is_decoder_param(name: str) -> bool:
    """Top-level param-tree keys of per-branch decoder modules
    (models/base.py naming: ``graph_shared_{branch}``, ``head_{i}_{branch}``
    and node-conv-head children ``head_{i}_{branch}_conv_*/_norm_*``)."""
    return name.startswith("head_") or name.startswith("graph_shared_")


def rescale_decoder_grads(grads, n_branch: int):
    """Convert a whole-mesh pmean into per-group means: decoder grads are
    nonzero on only 1/n_branch of the devices, so multiply them back by
    n_branch (reference decoder allreduce spans the head group only,
    ``MultiTaskModelMP.py:404-484``)."""
    if n_branch <= 1:
        return grads
    from jax.tree_util import tree_map_with_path

    def f(path, g):
        name = getattr(path[0], "key", None)
        if isinstance(name, str) and is_decoder_param(name):
            return g * n_branch
        return g

    return tree_map_with_path(f, grads)


def make_branch_dp_train_step(model, tx, mesh: Mesh, mlip=None):
    """Branch-parallel train step; with ``mlip`` (the energy/force weight
    dict) the loss is the MLIP energy+gradient-force objective — the
    pod-scale GFM path (BASELINE config 5: multidataset multibranch MLIP),
    grad-of-grad running under the 2-D mesh."""
    from jax import shard_map

    n_branch = mesh.shape["branch"]

    def per_device(state: TrainState, batch: GraphBatch):
        batch = jax.tree.map(lambda x: x[0, 0], batch)
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("branch"))
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def loss_fn(params):
            if mlip is not None:
                from hydragnn_tpu.models.mlip import energy_force_loss

                tot, tasks, new_bs, _, _ = energy_force_loss(
                    model, params, state.batch_stats, batch, mlip,
                    train=True, rng=rng,
                )
                return tot, (tasks, new_bs)
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
        # receive zero contributions from other branches' rows -- after the
        # global mean, rescale them by B so the effective reduction is a
        # mean over branch b's D devices only (reference head-group allreduce)
        grads = jax.lax.pmean(jax.lax.pmean(grads, "data"), "branch")
        grads = rescale_decoder_grads(grads, n_branch)
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
        check_vma=False,
    )
    return jax.jit(smapped)


# ---------------------------------------------------------------------------
# non-uniform branch allocation (VERDICT r02 item 8)
# ---------------------------------------------------------------------------


def proportional_process_list(ndata_list, world: int):
    """Device counts per branch proportional to dataset sizes — the
    reference's allocation math re-derived (``examples/multibranch/
    train.py:191-196``): ceil(n_b / total * world), then subtract the
    rounding surplus from the largest entry."""
    nd = np.asarray(ndata_list, np.float32)
    out = np.ceil(nd / nd.sum() * world).astype(np.int64)
    imax = int(np.argmax(out))
    out[imax] -= int(out.sum()) - world
    assert out.sum() == world and (out > 0).all(), out
    return out.tolist()


def make_flat_branch_mesh(world: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:world]
    return Mesh(
        mesh_utils.create_device_mesh((world,), devices=devices), ("dev",)
    )


def device_colors(process_list) -> np.ndarray:
    """Flat device -> branch id map (the reference's ``colorlist``,
    train.py:260-268): branch b owns the next process_list[b] devices."""
    return np.concatenate(
        [np.full(n, b, np.int32) for b, n in enumerate(process_list)]
    )


def rescale_decoder_grads_nonuniform(grads, branch_names, process_list):
    """Per-branch group means from a whole-mesh pmean: branch b's decoder
    grads are nonzero on its n_b devices only, so scale by world/n_b
    (the reference's per-subgroup allreduce, train.py:270-282)."""
    import re

    world = int(sum(process_list))
    scale = {
        bname: world / float(n)
        for bname, n in zip(branch_names, process_list)
    }
    from jax.tree_util import tree_map_with_path

    def branch_of(name):
        for bname in branch_names:
            e = re.escape(bname)
            if re.fullmatch(rf"graph_shared_{e}", name) or re.fullmatch(
                rf"head_\d+_{e}(_.*)?", name
            ):
                return bname
        return None

    def f(path, g):
        name = getattr(path[0], "key", None)
        if isinstance(name, str) and is_decoder_param(name):
            b = branch_of(name)
            if b is not None:
                return g * scale[b]
        return g

    return tree_map_with_path(f, grads)


def make_nonuniform_branch_step(
    model, tx, mesh: Mesh, process_list, mlip=None
):
    """Branch-parallel train step with dataset-size-proportional device
    groups over a FLAT mesh (list-of-device-lists semantics): device i
    belongs to branch ``device_colors(process_list)[i]`` and feeds batches
    from that branch's loader.  Encoder grads reduce over the whole mesh;
    branch b's decoder grads reduce over its n_b devices only — identical
    semantics to the reference's non-uniform ``dist.new_group`` path
    (train.py:260-286) without process groups."""
    from jax import shard_map

    branch_names = [
        name
        for name, _ in (model.cfg.graph_branches or model.cfg.node_branches)
    ]
    assert len(branch_names) == len(process_list)

    def per_device(state: TrainState, batch: GraphBatch):
        batch = jax.tree.map(lambda x: x[0], batch)
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dev"))

        def loss_fn(params):
            if mlip is not None:
                from hydragnn_tpu.models.mlip import energy_force_loss

                tot, tasks, new_bs, _, _ = energy_force_loss(
                    model, params, state.batch_stats, batch, mlip,
                    train=True, rng=rng,
                )
                return tot, (tasks, new_bs)
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            tot, tasks = model.loss(out, batch)
            return tot, (tasks, mutated["batch_stats"])

        (loss, (tasks, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, "dev")
        grads = rescale_decoder_grads_nonuniform(
            grads, branch_names, process_list
        )
        loss = jax.lax.pmean(loss, "dev")
        tasks = jax.lax.pmean(jnp.stack(tasks), "dev")
        new_bs = jax.lax.pmean(new_bs, "dev")
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (
            TrainState(
                params=new_params, batch_stats=new_bs,
                opt_state=new_opt, step=state.step + 1,
            ),
            loss, tasks,
        )

    smapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("dev")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)
