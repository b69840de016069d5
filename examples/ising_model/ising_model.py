"""Ising-model example: graph-level energy regression on spin lattices.

The analogue of the reference's ``examples/ising_model``: random +-1 spin
configurations on cubic lattices, graph target = Ising energy
E = -J * sum_<ij> s_i s_j; a GIN stack learns it from per-node spins.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np


def generate_ising_samples(n=300, l=4, j_coupling=1.0, seed=5):
    from hydragnn_tpu.data.radius_graph import radius_graph
    from hydragnn_tpu.data.sample import GraphSample

    rng = np.random.default_rng(seed)
    grid = np.stack(
        np.meshgrid(*([np.arange(l)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3).astype(np.float32)
    samples = []
    for _ in range(n):
        spins = rng.choice([-1.0, 1.0], size=(grid.shape[0], 1)).astype(np.float32)
        ei = radius_graph(grid, 1.01, 6)  # nearest neighbours
        # each undirected bond appears twice in the directed edge list
        e = -j_coupling * 0.5 * float(
            (spins[ei[0], 0] * spins[ei[1], 0]).sum()
        )
        samples.append(
            GraphSample(
                x=spins,
                pos=grid.copy(),
                edge_index=ei,
                y_graph=np.asarray([e], np.float32),
            )
        )
    return samples


def main(epochs=40):
    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.data.pipeline import sort_edges_by_receiver, split_dataset
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.loop import Trainer, train_validate_test

    samples = generate_ising_samples()
    # normalize targets to [0, 1]
    ys = np.asarray([s.y_graph[0] for s in samples])
    lo, hi = ys.min(), ys.max()
    for s in samples:
        s.y_graph = (s.y_graph - lo) / (hi - lo)
    sort_edges_by_receiver(samples)
    train, val, test = split_dataset(samples, 0.7)
    cfg = StackConfig(
        input_dim=1,
        hidden_dim=32,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=normalize_branches(
            {"num_sharedlayers": 2, "dim_sharedlayers": 32,
             "num_headlayers": 2, "dim_headlayers": [32, 32]}
        ),
        task_weights=(1.0,),
        num_conv_layers=3,
        graph_pooling="add",
    )
    model = create_model("GIN", cfg)
    trainer = Trainer(model, {"type": "AdamW", "learning_rate": 3e-3})
    dims = compute_batch_dims(samples, 32)
    loaders = (
        PaddedBatcher(train, 32, shuffle=True, dims=dims),
        PaddedBatcher(val, 32, dims=dims),
        PaddedBatcher(test, 32, dims=dims),
    )
    state = trainer.init_state(next(iter(loaders[0])))
    config = {"NeuralNetwork": {"Training": {"num_epoch": epochs}}}
    state, info = train_validate_test(trainer, state, *loaders, config, verbosity=1)
    print("final:", info["history"][-1])
    return info["history"][-1]["test"]


if __name__ == "__main__":
    main()
