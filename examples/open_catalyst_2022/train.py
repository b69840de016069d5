"""OC22 (Open Catalyst 2022) example: oxide-catalyst MLIP from EXTXYZ
shards.

The reference driver globs ``**/*.extxyz`` shards recursively and trains
S2EF (``/root/reference/examples/open_catalyst_2022/train.py:185-300``).
This driver reads the same nested shard layout via
``load_xyz_directory`` (recursive, .extxyz-aware). Zero-egress fallback:
surrogate rutile-oxide slab frames (Ti/Ir + O) with analytic periodic
Morse energies/forces are written as sharded extxyz files first.

Usage:
  python examples/open_catalyst_2022/train.py [--energy] [--mpnn_type M]
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


def _oxide_slab(rng, metal):
    """Small rutile-like MO2 slab cell with an OH adsorbate."""
    a0, c0 = 4.6, 3.0
    pos = []
    z = []
    for i in range(2):
        for j in range(2):
            base = np.asarray([i * a0 / 2, j * a0 / 2, 0.0])
            pos.append(base)
            z.append(metal)
            pos.append(base + [a0 / 4, a0 / 4, c0 / 2])
            z.append(8)
            pos.append(base + [a0 / 4, -a0 / 4, c0 / 2])
            z.append(8)
    pos = np.asarray(pos, np.float64)
    # OH adsorbate above the surface
    top = pos[:, 2].max()
    site = pos[np.argmax(pos[:, 2])][:2] + rng.normal(0, 0.15, 2)
    pos = np.concatenate(
        [pos, [[site[0], site[1], top + 1.9], [site[0], site[1], top + 2.87]]]
    )
    z = np.asarray(z + [8, 1], np.float64)
    pos += rng.normal(0, 0.06, pos.shape)
    cell = np.diag([a0, a0, c0 + 14.0])
    return z, pos, cell


def write_shards(root, n, seed=0, shard_size=50):
    from hydragnn_tpu.data.mlip_corpora import periodic_energy_forces
    from hydragnn_tpu.data.qm9 import _Z_TO_SYMBOL

    rng = np.random.default_rng(seed)
    for s in range((n + shard_size - 1) // shard_size):
        shard_dir = os.path.join(root, "s2ef_train", str(s))
        os.makedirs(shard_dir, exist_ok=True)
        lines = []
        for t in range(min(shard_size, n - s * shard_size)):
            metal = (22, 77)[int(rng.integers(0, 2))]
            z, pos, cell = _oxide_slab(rng, metal)
            e, f = periodic_energy_forces(z, pos, cell, cutoff=4.0)
            lat = " ".join(f"{v:.6f}" for v in cell.reshape(-1))
            lines.append(f"{len(z)}")
            lines.append(f'Lattice="{lat}" energy={e:.8f} pbc="T T T"')
            for zz, pp, ff in zip(z, pos, f):
                lines.append(
                    f"{_Z_TO_SYMBOL[int(zz)]} {pp[0]:.6f} {pp[1]:.6f} "
                    f"{pp[2]:.6f} {ff[0]:.8f} {ff[1]:.8f} {ff[2]:.8f}"
                )
        with open(os.path.join(shard_dir, f"shard_{s:03d}.extxyz"), "w") as fh:
            fh.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--energy", action="store_true")
    ap.add_argument("--mpnn_type", default=None)
    ap.add_argument("--num_epoch", type=int, default=None)
    ap.add_argument("--num_samples", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--preonly", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    here = os.path.dirname(os.path.abspath(__file__))
    name = "open_catalyst_energy.json" if args.energy \
        else "open_catalyst_forces.json"
    with open(os.path.join(here, name)) as f:
        config = json.load(f)
    arch = config["NeuralNetwork"]["Architecture"]
    if args.mpnn_type:
        arch["mpnn_type"] = args.mpnn_type
    if args.num_epoch:
        config["NeuralNetwork"]["Training"]["num_epoch"] = args.num_epoch
    if args.num_samples:
        config["Dataset"]["num_samples"] = args.num_samples
    root = os.path.join(here, "dataset", "oc22")
    config["Dataset"]["path"]["total"] = root
    if not os.path.isdir(root) or not os.listdir(root):
        n = int(config["Dataset"].get("num_samples", 200))
        print(f"[oc22] synthesizing {n} oxide-slab frames -> {root}")
        write_shards(root, n)
    if args.preonly:
        return

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(
        f"oc22 {arch['mpnn_type']}{' energy' if args.energy else ' mlip'}: "
        f"train {h['train']:.6f} val {h['val']:.6f} test {h['test']:.6f}"
    )
    return info


if __name__ == "__main__":
    main()
