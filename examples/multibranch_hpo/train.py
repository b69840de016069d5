"""HPO over the branch-parallel (multibranch) training path.

TPU-native analogue of ``/root/reference/examples/multibranch_hpo/train.py``
(DeepHyper search over the MultiTaskModelMP GFM configuration,
``multibranch_GFM260.json``): each trial trains per-dataset decoder
branches over a shared encoder on the 2-D (branch x data) device mesh and
the search drives encoder width/depth/lr through the dependency-free
harness in ``hydragnn_tpu/hpo.py``.

Run (single host, virtual devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multibranch_hpo/train.py --cpu [--trials N]
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import numpy as np

SPACE = {
    "hidden_dim": ["int", 12, 32],
    "num_conv_layers": ["int", 1, 3],
    "learning_rate": ["log", 1e-3, 2e-2],
    "mpnn_type": ["GIN", "SAGE", "PNA"],
}


def build_branch_samples(seed, n, y_scale, dataset_id):
    from hydragnn_tpu.data.pipeline import normalize_minmax, select_variables
    from hydragnn_tpu.data.radius_graph import radius_graph
    from hydragnn_tpu.data.synthetic import deterministic_graph_data

    samples = deterministic_graph_data(n, seed=seed)
    var = {"input_node_features": [0], "output_index": [0], "type": ["graph"]}
    normalize_minmax(samples, [1, 1, 1], [1])
    select_variables(samples, var, [1, 1, 1], [1])
    for s in samples:
        s.edge_index = radius_graph(s.pos, 2.0, 100)
        s.y_graph = s.y_graph * y_scale
        s.dataset_id = dataset_id
    return samples


def branch_trial(hp, n_branch=2, n_data=4, epochs=4, batch=4):
    """One branch-parallel training run; returns the final mean loss."""
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
        build_branch_samples(seed=1, n=48, y_scale=1.0, dataset_id=0),
        build_branch_samples(seed=2, n=48, y_scale=2.0, dataset_id=1),
    ][:n_branch]
    dims = compute_batch_dims([s for b in branches for s in b], batch)

    head = {
        "num_sharedlayers": 1,
        "dim_sharedlayers": hp["hidden_dim"],
        "num_headlayers": 2,
        "dim_headlayers": [hp["hidden_dim"]] * 2,
    }
    cfg = StackConfig(
        input_dim=1,
        hidden_dim=hp["hidden_dim"],
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=normalize_branches(
            [{"type": f"branch-{b}", "architecture": head}
             for b in range(n_branch)]
        ),
        task_weights=(1.0,),
        num_conv_layers=hp["num_conv_layers"],
        pna_deg=np.ones(16),
    )
    model = create_model(hp["mpnn_type"], cfg)
    trainer = Trainer(
        model, {"type": "AdamW", "learning_rate": hp["learning_rate"]}
    )
    mesh = make_branch_mesh(n_branch, n_data)
    step = make_branch_dp_train_step(model, trainer.tx, mesh)

    loaders = [
        PaddedBatcher(b, batch, shuffle=True, seed=b_i, dims=dims)
        for b_i, b in enumerate(branches)
    ]
    state = trainer.init_state(next(iter(loaders[0])))
    loss = float("inf")
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
            state, l, _ = step(state, stacked)
            losses.append(float(l))
        loss = float(np.mean(losses))
    return loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hydragnn_tpu.hpo import random_search

    space = {f"hp.{k}": v for k, v in SPACE.items()}
    best, best_val, log = random_search(
        {"Dataset": {"name": "multibranch"}},
        space,
        num_trials=args.trials,
        objective=lambda cfg: branch_trial(cfg["hp"], epochs=args.epochs),
        log_path="multibranch_hpo_trials.json",
    )
    print("best overrides:", json.dumps(best))
    print(f"best loss: {best_val:.6f} over {len(log)} trials")
    return best, best_val


if __name__ == "__main__":
    main()
