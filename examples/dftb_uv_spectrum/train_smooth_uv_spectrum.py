"""Smooth UV-spectrum regression: a HIGH-DIMENSIONAL graph head.

TPU-native analogue of
``/root/reference/examples/dftb_uv_spectrum/train_smooth_uv_spectrum.py``:
molecular graphs (reference: PDB via rdkit; here: the same SMILES->graph
feature layout from data/smiles.py) regressing the whole smooth excitation
spectrum as ONE graph-level vector output (reference output_dim 37500; the
surrogate uses a 200-bin spectrum).

Zero-egress surrogate: random valence-valid organic molecules with a
deterministic spectrum — Gaussian peaks whose positions/heights are fixed
functions of composition (nO, nN, ring content), so the mapping is
learnable and the example verifies the vector-head path end to end.

Usage:
  python examples/dftb_uv_spectrum/train_smooth_uv_spectrum.py
      [--epochs N] [--n-mol N] [--bins N] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import numpy as np

DFTB_TYPES = {"C": 0, "F": 1, "H": 2, "N": 3, "O": 4, "S": 5}


def synth_spectrum(g, bins):
    """Deterministic smooth spectrum from composition: one Gaussian peak
    per heteroatom class + a backbone band."""
    z = g.x[:, len(DFTB_TYPES)]
    n_c = float((z == 6).sum())
    n_o = float((z == 8).sum())
    n_n = float((z == 7).sum())
    x = np.linspace(0.0, 1.0, bins, dtype=np.float32)

    def peak(center, width, height):
        return height * np.exp(-0.5 * ((x - center) / width) ** 2)

    y = (
        peak(0.2 + 0.01 * n_c, 0.05, 1.0 + 0.05 * n_c)
        + peak(0.5, 0.04, 0.8 * n_o)
        + peak(0.75, 0.06, 0.6 * n_n)
    )
    return y.astype(np.float32)


def build_molecules(n_mol, bins, seed=0):
    from hydragnn_tpu.data.smiles import (
        load_smiles_csv,
        synthesize_smiles_csv,
    )

    csv = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "dataset", "mols.csv"
    )
    if not os.path.exists(csv):
        synthesize_smiles_csv(csv, n_mol, seed=seed)
    mols = load_smiles_csv(csv, types=DFTB_TYPES, limit=n_mol)
    for g in mols:
        g.y_graph = synth_spectrum(g, bins)
    return mols


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n-mol", type=int, default=400)
    ap.add_argument("--bins", type=int, default=200)
    ap.add_argument("--batch", type=int, default=32)
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

    mols = build_molecules(args.n_mol, args.bins)
    sort_edges_by_receiver(mols)
    n_val = max(len(mols) // 10, 1)
    val, train = mols[:n_val], mols[n_val:]

    head = {
        "num_sharedlayers": 2,
        "dim_sharedlayers": 128,
        "num_headlayers": 2,
        "dim_headlayers": [256, 256],
    }
    cfg = StackConfig(
        input_dim=mols[0].x.shape[1],
        hidden_dim=64,
        output_dim=(args.bins,),   # whole spectrum = one vector head
        output_type=("graph",),
        graph_branches=normalize_branches(head),
        task_weights=(1.0,),
        num_conv_layers=4,
    )
    model = create_model("GIN", cfg)
    trainer = Trainer(model, {"type": "AdamW", "learning_rate": 2e-3})

    dims = compute_batch_dims(mols, args.batch)
    train_ld = PaddedBatcher(train, args.batch, shuffle=True, seed=1, dims=dims)
    val_ld = PaddedBatcher(val, args.batch, dims=dims)
    state = trainer.init_state(next(iter(train_ld)))
    for epoch in range(args.epochs):
        train_ld.set_epoch(epoch)
        state, tr_loss, _ = trainer.run_epoch(state, train_ld)
        v_loss, _ = trainer.evaluate(state, val_ld)
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch}: train {tr_loss:.5f} val {v_loss:.5f}")
    return v_loss


if __name__ == "__main__":
    main()
