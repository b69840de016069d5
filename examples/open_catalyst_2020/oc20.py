"""OC2020-style example: MACE MLIP with periodic boundary conditions
(BASELINE config 4).

The real Open Catalyst 2020 dataset is adsorbate+slab relaxation
trajectories with periodic cells (reference driver
``/root/reference/examples/open_catalyst_2020/train.py``). This
environment has no network egress, so the driver synthesizes catalyst-like
frames — an fcc metal slab + a small adsorbate in a periodic cell with a
vacuum gap — scores them with an analytic pair potential (exact forces),
and writes them in the standard **extxyz** on-disk format. The parse ->
PBC radius graph (integer shifts) -> MACE -> energy+gradient-force
training path is exactly what a real OC20 extxyz export would take.

Usage:
  python examples/open_catalyst_2020/oc20.py [--mpnn_type MACE]
      [--num_epoch N] [--num_samples N] [--cpu] [--preonly]
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import numpy as np

A0 = 3.6  # fcc lattice constant (Cu-like), Å


def _slab_frame(rng):
    """2x2x2-cell fcc(100) slab (Cu) + one CO-like adsorbate, periodic in
    x/y with a vacuum gap in z."""
    base = np.asarray(
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]], np.float64
    )
    cells = []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                cells.append((base + [i, j, k]) * A0)
    pos = np.concatenate(cells, 0)
    z = np.full((len(pos),), 29.0)  # Cu
    # adsorbate: C on top site + O above it
    top = pos[:, 2].max()
    site = pos[np.argmax(pos[:, 2])][:2] + rng.normal(0, 0.2, 2)
    ads_pos = np.asarray(
        [[site[0], site[1], top + 1.9], [site[0], site[1], top + 3.05]]
    )
    pos = np.concatenate([pos, ads_pos], 0)
    z = np.concatenate([z, [6.0, 8.0]])
    pos += rng.normal(0, 0.08, pos.shape)
    cell = np.diag([2 * A0, 2 * A0, 2 * A0 + 12.0])  # vacuum gap in z
    return z, pos, cell


def _pair_energy_forces(z, pos, cell, cutoff=5.0):
    """Morse-like analytic potential over PBC minimum images (exact
    gradient): the surrogate DFT."""
    n = len(pos)
    inv = np.linalg.inv(cell)
    e = 0.0
    f = np.zeros_like(pos)
    r0_of = {29: 2.55, 6: 1.9, 8: 1.15}
    shifts = [
        np.asarray(s, np.float64) @ cell
        for s in [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (0,)]
    ]
    for i in range(n):
        for j in range(i + 1, n):
            r0 = 0.5 * (r0_of[int(z[i])] + r0_of[int(z[j])])
            for sh in shifts:
                d = pos[i] - pos[j] + sh
                r = np.linalg.norm(d)
                if r > cutoff or r < 1e-6:
                    continue
                a = 1.5
                ex = np.exp(-a * (r - r0))
                e += ex * ex - 2 * ex
                de = (-2 * a * ex * ex + 2 * a * ex) * (d / r)
                f[i] -= de
                f[j] += de
    return e, f


def write_dataset(root, n, seed=0):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for t in range(n):
        z, pos, cell = _slab_frame(rng)
        e, f = _pair_energy_forces(z, pos, cell)
        lat = " ".join(f"{v:.6f}" for v in cell.reshape(-1))
        lines.append(f"{len(z)}")
        lines.append(f'Lattice="{lat}" energy={e:.8f} pbc="T T T"')
        from hydragnn_tpu.data.qm9 import _Z_TO_SYMBOL

        for zz, pp, ff in zip(z, pos, f):
            lines.append(
                f"{_Z_TO_SYMBOL[int(zz)]} {pp[0]:.6f} {pp[1]:.6f} {pp[2]:.6f} "
                f"{ff[0]:.8f} {ff[1]:.8f} {ff[2]:.8f}"
            )
    with open(os.path.join(root, "oc20_synthetic.xyz"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mpnn_type", default="MACE")
    ap.add_argument("--num_epoch", type=int, default=20)
    ap.add_argument("--num_samples", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--preonly", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "dataset", "oc20_extxyz"
    )
    if not os.path.isdir(root) or not os.listdir(root):
        print(f"[oc20] synthesizing {args.num_samples} slab frames -> {root}")
        write_dataset(root, args.num_samples)
    if args.preonly:
        return

    config = {
        "Verbosity": {"level": 1},
        "Dataset": {
            "name": "oc20_synthetic",
            "format": "extxyz",
            "path": {"total": root},
            "energy_linear_regression": True,
            "node_features": {"name": ["Z"], "dim": [1], "column_index": [0]},
            "graph_features": {"name": ["energy"], "dim": [1], "column_index": [0]},
        },
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": args.mpnn_type,
                "radius": 5.0,
                "max_neighbours": 32,
                "periodic_boundary_conditions": True,
                "hidden_dim": 64,
                "num_conv_layers": 2,
                "max_ell": 2,
                "node_max_ell": 1,
                "num_radial": 8,
                "correlation": 2,
                "avg_num_neighbors": 12.0,
                "enable_interatomic_potential": True,
                "energy_weight": 1.0,
                "energy_peratom_weight": 1.0,
                "force_weight": 50.0,
                "output_heads": {
                    "node": {
                        "num_headlayers": 2,
                        "dim_headlayers": [64, 64],
                        "type": "mlp",
                    }
                },
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["graph_energy"],
                "output_index": [0],
                "output_dim": [1],
                "type": ["node"],
            },
            "Training": {
                "num_epoch": args.num_epoch,
                "perc_train": 0.8,
                "loss_function_type": "mae",
                "batch_size": 8,
                "Optimizer": {"type": "AdamW", "learning_rate": 0.004},
            },
        },
        "Visualization": {"create_plots": False},
    }

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(
        f"oc20 {args.mpnn_type}+PBC: train {h['train']:.5f} "
        f"val {h['val']:.5f} test {h['test']:.5f}"
    )
    return info


if __name__ == "__main__":
    main()
