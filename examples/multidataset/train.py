"""Multidataset MLIP training: ONE shared model over several corpora.

TPU-native analogue of ``/root/reference/examples/multidataset/train.py``
(the GFM pretraining path: ANI1x + qm7x + MPTrj + ... into one model) at
laptop scale: a Lennard-Jones lattice corpus and an MD17-schema molecular
trajectory are merged after per-dataset per-element energy-baseline
subtraction (reference ``energy_per_atom_linear_regression.py``), then a
single EGNN MLIP trains on the union with gradient forces.

Differs from examples/multibranch (per-dataset decoder branches over a 2-D
mesh): here every dataset shares one set of heads — the reference's
``gfm_energy.json`` single-branch mode.

Run:
  python examples/multidataset/train.py [--epochs N] [--frames N] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import numpy as np


def build_corpora(frames):
    from hydragnn_tpu.data.energy_regression import (
        fit_linear_energies,
        subtract_linear_energies,
    )
    from hydragnn_tpu.data.lennard_jones import lennard_jones_data
    from hydragnn_tpu.data.md17 import load_md17_npz, synthesize_md17_npz
    from hydragnn_tpu.data.radius_graph import radius_graph

    lj = lennard_jones_data(number_configurations=frames, seed=3)
    npz = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "dataset", "md17_sur.npz"
    )
    if not os.path.exists(npz):
        synthesize_md17_npz(npz, n_frames=frames, seed=1)
    md = load_md17_npz(npz, limit=frames)

    # per-dataset energy baselines, as the reference fits one regression
    # per corpus before mixing (energy_per_atom_linear_regression.py)
    for i, corpus in enumerate((lj, md)):
        subtract_linear_energies(corpus, fit_linear_energies(corpus))
        for s in corpus:
            s.dataset_id = i
            if s.edge_index is None:
                s.edge_index = radius_graph(s.pos, 4.0, 32)
    return lj + md


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.data.pipeline import sort_edges_by_receiver
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.loop import Trainer

    samples = build_corpora(args.frames)
    sort_edges_by_receiver(samples)
    rng = np.random.default_rng(0)
    order = rng.permutation(len(samples))
    samples = [samples[i] for i in order]
    n_val = max(len(samples) // 10, 1)
    val, train = samples[:n_val], samples[n_val:]

    node_head = {"num_headlayers": 2, "dim_headlayers": [64, 64], "type": "mlp"}
    cfg = StackConfig(
        input_dim=1,
        hidden_dim=64,
        output_dim=(1,),
        output_type=("node",),
        node_branches=normalize_branches(node_head),
        task_weights=(1.0,),
        num_conv_layers=3,
        equivariance=True,
        max_ell=1,
        node_max_ell=1,
        num_radial=8,
        radius=4.0,
        avg_num_neighbors=12.0,
    )
    model = create_model("EGNN", cfg)
    weights = {
        "energy_weight": 1.0,
        "energy_peratom_weight": 1.0,
        "force_weight": 10.0,
    }
    trainer = Trainer(
        model, {"type": "AdamW", "learning_rate": 2e-3}, mlip=weights
    )

    dims = compute_batch_dims(samples, args.batch)
    train_ld = PaddedBatcher(train, args.batch, shuffle=True, seed=1, dims=dims)
    val_ld = PaddedBatcher(val, args.batch, dims=dims)
    state = trainer.init_state(next(iter(train_ld)))
    for epoch in range(args.epochs):
        train_ld.set_epoch(epoch)
        state, tr_loss, _ = trainer.run_epoch(state, train_ld)
        v_loss, _ = trainer.evaluate(state, val_ld)
        print(f"epoch {epoch}: train {tr_loss:.5f} val {v_loss:.5f}")
    return v_loss


if __name__ == "__main__":
    main()
