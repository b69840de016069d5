"""Multi-dataset multi-branch task-parallel training over a 2-D
(branch x data) device mesh -- the pod-scale flagship path (reference
``examples/multibranch/train.py:48-517`` + ``MultiTaskModelMP``).

Two synthetic datasets (different lattice statistics) are routed to their
own decoder branches via ``dataset_id``; the shared encoder trains on all
data.  Per-branch loaders feed the branch rows of the mesh; gradients
reduce with a single psum over both axes (see parallel/branch.py for why
that equals the reference's two-level process groups).

Run (single host; provisions an 8-device virtual CPU mesh in-process when
fewer than n_branch*n_data real chips are visible):
  python examples/multibranch/train.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np


def build_branch_samples(seed, n, y_scale, dataset_id):
    from hydragnn_tpu.data.pipeline import normalize_minmax, select_variables
    from hydragnn_tpu.data.radius_graph import radius_graph
    from hydragnn_tpu.data.synthetic import deterministic_graph_data

    samples = deterministic_graph_data(n, seed=seed)
    var = {"input_node_features": [0], "output_index": [0, 0], "type": ["graph", "node"]}
    normalize_minmax(samples, [1, 1, 1], [1])
    select_variables(samples, var, [1, 1, 1], [1])
    for s in samples:
        s.edge_index = radius_graph(s.pos, 2.0, 100)
        s.y_graph = s.y_graph * y_scale
        s.dataset_id = dataset_id
    return samples


def main(n_branch=2, n_data=4, epochs=5, batch=4):
    import jax

    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel.branch import (
        make_branch_dp_train_step,
        make_branch_mesh,
        shard_branch_batch,
        stack_branch_batches,
    )
    from hydragnn_tpu.train.loop import Trainer

    from hydragnn_tpu.parallel.runtime import ensure_devices

    ensure_devices(n_branch * n_data)  # virtual CPU mesh on single-chip hosts
    assert len(jax.devices()) >= n_branch * n_data

    branches = [
        build_branch_samples(seed=1, n=64, y_scale=1.0, dataset_id=0),
        build_branch_samples(seed=2, n=64, y_scale=2.0, dataset_id=1),
    ][:n_branch]
    all_samples = [s for b in branches for s in b]
    dims = compute_batch_dims(all_samples, batch)

    head = {
        "num_sharedlayers": 1,
        "dim_sharedlayers": 16,
        "num_headlayers": 2,
        "dim_headlayers": [16, 16],
    }
    node_head = {"num_headlayers": 2, "dim_headlayers": [16, 16], "type": "mlp"}
    cfg = StackConfig(
        input_dim=1,
        hidden_dim=16,
        output_dim=(1, 1),
        output_type=("graph", "node"),
        # one decoder branch per dataset (reference branch-N heads)
        graph_branches=normalize_branches(
            [
                {"type": f"branch-{b}", "architecture": head}
                for b in range(n_branch)
            ]
        ),
        node_branches=normalize_branches(
            [
                {"type": f"branch-{b}", "architecture": node_head}
                for b in range(n_branch)
            ]
        ),
        task_weights=(1.0, 1.0),
        num_conv_layers=2,
    )
    model = create_model("GIN", cfg)
    trainer = Trainer(model, {"type": "AdamW", "learning_rate": 5e-3})

    mesh = make_branch_mesh(n_branch, n_data)
    step = make_branch_dp_train_step(model, trainer.tx, mesh)

    loaders = [
        PaddedBatcher(b, batch, shuffle=True, seed=b_i, dims=dims)
        for b_i, b in enumerate(branches)
    ]
    state = trainer.init_state(next(iter(loaders[0])))

    for epoch in range(epochs):
        for ld in loaders:
            ld.set_epoch(epoch)
        iters = [iter(ld) for ld in loaders]
        losses = []
        while True:
            try:
                per_branch = [[next(iters[b]) for _ in range(n_data)]
                              for b in range(n_branch)]
            except StopIteration:
                break
            stacked = shard_branch_batch(stack_branch_batches(per_branch), mesh)
            state, loss, tasks = step(state, stacked)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.5f}")
    return float(np.mean(losses))




def main_mlip(n_branch=2, n_data=4, epochs=5, batch=4):
    """Branch-parallel MLIP with GPS global attention (BASELINE config 5:
    multidataset multibranch MLIP — one shared EGNN+GPS encoder over the
    mesh, per-dataset decoder branches, energy + gradient-force loss,
    grad-of-grad under the 2-D mesh)."""
    import jax

    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.data.lennard_jones import lennard_jones_data
    from hydragnn_tpu.data.pipeline import compute_lap_pe, sort_edges_by_receiver
    from hydragnn_tpu.data.radius_graph import radius_graph
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel.branch import (
        make_branch_dp_train_step,
        make_branch_mesh,
        shard_branch_batch,
        stack_branch_batches,
    )
    from hydragnn_tpu.train.loop import Trainer

    from hydragnn_tpu.parallel.runtime import ensure_devices

    ensure_devices(n_branch * n_data)  # virtual CPU mesh on single-chip hosts
    assert len(jax.devices()) >= n_branch * n_data

    # two corpora = two potentials (different eps/sigma), one per branch
    branches = []
    for b, (eps, sigma) in enumerate([(1.0, 1.0), (2.0, 0.9)][:n_branch]):
        corp = lennard_jones_data(
            number_configurations=48, eps=eps, sigma=sigma, seed=31 + b
        )
        for s in corp:
            s.dataset_id = b
            s.edge_index = radius_graph(s.pos, 3.0, 32)
        branches.append(corp)
    all_samples = [s for c in branches for s in c]
    sort_edges_by_receiver(all_samples)
    compute_lap_pe(all_samples, 2)
    dims = compute_batch_dims(all_samples, batch)

    node_head = {"num_headlayers": 2, "dim_headlayers": [16, 16], "type": "mlp"}
    cfg = StackConfig(
        input_dim=1,
        hidden_dim=16,
        output_dim=(1,),
        output_type=("node",),
        node_branches=normalize_branches(
            [{"type": f"branch-{b}", "architecture": node_head}
             for b in range(n_branch)]
        ),
        task_weights=(1.0,),
        num_conv_layers=2,
        equivariance=True,
        max_ell=1,
        node_max_ell=1,
        num_radial=8,
        radius=3.0,
        avg_num_neighbors=12.0,
        global_attn_engine="GPS",
        global_attn_type="multihead",
        global_attn_heads=4,
        pe_dim=2,
    )
    model = create_model("EGNN", cfg)
    w = {"energy_weight": 1.0, "energy_peratom_weight": 1.0, "force_weight": 10.0}
    trainer = Trainer(model, {"type": "AdamW", "learning_rate": 2e-3}, mlip=w)

    mesh = make_branch_mesh(n_branch, n_data)
    step = make_branch_dp_train_step(model, trainer.tx, mesh, mlip=w)

    loaders = [
        PaddedBatcher(c, batch, shuffle=True, seed=b_i, dims=dims)
        for b_i, c in enumerate(branches)
    ]
    state = trainer.init_state(next(iter(loaders[0])))
    losses = []
    for epoch in range(epochs):
        for ld in loaders:
            ld.set_epoch(epoch)
        iters = [iter(ld) for ld in loaders]
        while True:
            try:
                per_branch = [[next(iters[b]) for _ in range(n_data)]
                              for b in range(n_branch)]
            except StopIteration:
                break
            stacked = shard_branch_batch(stack_branch_batches(per_branch), mesh)
            state, loss, tasks = step(state, stacked)
            losses.append(float(loss))
        print(f"epoch {epoch}: mlip loss {np.mean(losses[-6:]):.5f}")
    return float(np.mean(losses[-6:]))


if __name__ == "__main__":
    import sys

    if "--mlip" in sys.argv:
        main_mlip()
    else:
        main()
