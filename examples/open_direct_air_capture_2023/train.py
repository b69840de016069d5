"""ODAC23 (Open Direct Air Capture 2023) example: sorbent MLIP.

Trains on ODAC23-style periodic sorbent frameworks with adsorption
energies/forces.

The corpus is an ASE sqlite database — the same store family the
reference reads via fairchem AseDBDataset (/root/reference/examples/open_direct_air_capture_2023/odac23.py). Zero-egress fallback: the driver
synthesizes a surrogate database (MOF-like frameworks + CO2, analytic Morse
energies/forces) in the exact ASE sqlite v9 schema
(hydragnn_tpu/data/ase_db.py) before training.

Usage:
  python examples/open_direct_air_capture_2023/train.py [--energy] [--mpnn_type M]
      [--num_epoch N] [--num_samples N] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import numpy as np


def synthesize(path, n):
    from hydragnn_tpu.data import mlip_corpora as mc
    from hydragnn_tpu.data.ase_db import write_ase_sqlite

    SPECIES = [(12, 8), (13, 8), (30, 8)]
    rng = np.random.default_rng(15)
    frames = []
    for _ in range(n):
        z, pos, cell = mc.random_crystal(rng, species=SPECIES[_ % len(SPECIES)])
        e, f = mc.periodic_energy_forces(z, pos, cell)
        frames.append(dict(z=z, pos=pos, cell=cell, pbc=(1, 1, 1),
                           energy=e, forces=f))
    write_ase_sqlite(path, frames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--energy", action="store_true",
                    help="energy-only regression (no force loss)")
    ap.add_argument("--mpnn_type", default=None)
    ap.add_argument("--num_epoch", type=int, default=None)
    ap.add_argument("--num_samples", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    name = "odac23_energy.json" if args.energy else "odac23_forces.json"
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, name)) as f:
        config = json.load(f)
    arch = config["NeuralNetwork"]["Architecture"]
    if args.mpnn_type:
        arch["mpnn_type"] = args.mpnn_type
    if args.num_epoch:
        config["NeuralNetwork"]["Training"]["num_epoch"] = args.num_epoch
    if args.num_samples:
        config["Dataset"]["num_samples"] = args.num_samples
    db = os.path.join(here, "dataset", "odac23.db")
    config["Dataset"]["path"]["total"] = db
    if not os.path.exists(db):
        print(f"[open_direct_air_capture_2023] {db!r} missing -- synthesizing surrogate "
              "ASE sqlite corpus (no network egress)")
        synthesize(db, int(config["Dataset"].get("num_samples", 200)))

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(
        f"open_direct_air_capture_2023 {arch['mpnn_type']}"
        f"{' energy' if args.energy else ' mlip'}: "
        f"train {h['train']:.6f} val {h['val']:.6f} test {h['test']:.6f}"
    )
    return info


if __name__ == "__main__":
    main()
