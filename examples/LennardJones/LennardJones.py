"""Lennard-Jones MLIP example: energy + gradient-force training.

The analogue of the reference driver ``examples/LennardJones/
LennardJones.py`` (data generation at ``LJ_data.py:192,347``): synthetic
perturbed lattices with LJ energies/forces, EGNN backbone, forces from
-dE/dpos via jax.grad through the energy head.

Usage:
  python examples/LennardJones/LennardJones.py [--preonly] [--mpnn_type EGNN]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preonly", action="store_true", help="only write the dataset")
    ap.add_argument("--mpnn_type", default="EGNN")
    ap.add_argument("--num_samples", type=int, default=200)
    ap.add_argument("--num_epoch", type=int, default=30)
    ap.add_argument("--periodic", action="store_true")
    args = ap.parse_args()

    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.data.container import (
        GraphContainerDataset,
        GraphContainerWriter,
    )
    from hydragnn_tpu.data.lennard_jones import lennard_jones_data
    from hydragnn_tpu.data.pbc import radius_graph_pbc
    from hydragnn_tpu.data.pipeline import split_dataset
    from hydragnn_tpu.data.radius_graph import radius_graph
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.loop import Trainer, train_validate_test

    data_dir = os.path.join(os.path.dirname(__file__), "dataset", "LJ_container")
    if not os.path.exists(os.path.join(data_dir, "meta.json")):
        samples = lennard_jones_data(
            number_configurations=args.num_samples, periodic=args.periodic
        )
        for s in samples:
            if args.periodic:
                s.edge_index, s.edge_shifts = radius_graph_pbc(
                    s.pos, s.cell, 3.0, 32
                )
            else:
                s.edge_index = radius_graph(s.pos, 3.0, 32)
        GraphContainerWriter(data_dir).write(samples)
        print(f"wrote {len(samples)} samples to {data_dir}")
    if args.preonly:
        return

    samples = GraphContainerDataset(data_dir).samples()
    train, val, test = split_dataset(samples, 0.8)

    cfg = StackConfig(
        input_dim=1,
        hidden_dim=64,
        output_dim=(1,),
        output_type=("node",),
        node_branches=normalize_branches(
            {"num_headlayers": 2, "dim_headlayers": [64, 64], "type": "mlp"}
        ),
        task_weights=(1.0,),
        num_conv_layers=3,
        radius=3.0,
        num_radial=8,
        equivariance=True,
        max_ell=2,
        node_max_ell=1,
        avg_num_neighbors=12.0,
    )
    model = create_model(args.mpnn_type, cfg)
    trainer = Trainer(
        model,
        {"type": "AdamW", "learning_rate": 1e-3},
        mlip={
            "energy_weight": 1.0,
            "energy_peratom_weight": 1.0,
            "force_weight": 25.0,
        },
    )
    dims = compute_batch_dims(samples, 16)
    loaders = (
        PaddedBatcher(train, 16, shuffle=True, dims=dims),
        PaddedBatcher(val, 16, dims=dims),
        PaddedBatcher(test, 16, dims=dims),
    )
    state = trainer.init_state(next(iter(loaders[0])))
    config = {
        "NeuralNetwork": {
            "Training": {"num_epoch": args.num_epoch, "EarlyStopping": False}
        }
    }
    state, info = train_validate_test(
        trainer, state, *loaders, config, verbosity=1
    )
    h = info["history"][-1]
    print(
        f"final: train {h['train']:.5f} val {h['val']:.5f} test {h['test']:.5f}"
    )
    return info


if __name__ == "__main__":
    main()
