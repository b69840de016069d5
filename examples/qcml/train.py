"""QCML example: DFT force-field corpus MLIP training with constant
(charge, spin) graph-attr conditioning.

The reference driver streams the tfds ``qcml/dft_force_field`` split and
extracts atomic_numbers / positions / pbe0_energy / pbe0_forces per record
plus a constant graph_attr = (charge=0, spin=1) and a force-norm outlier
filter (/root/reference/examples/qcml/train.py:70-171). Here the corpus is
an HDF5 mirror of those record fields (hydragnn_tpu/data/mlip_corpora.py:
load_qcml_h5); the zero-egress fallback synthesizes surrogate molecules
with analytic Morse forces into the same schema.

Usage:
  python examples/qcml/train.py [--energy] [--mpnn_type M]
      [--num_epoch N] [--num_samples N] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)


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

    name = "qcml_energy.json" if args.energy else "qcml_forces.json"
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
    config["Dataset"]["path"]["total"] = os.path.join(
        here, "dataset", "qcml.h5"
    )

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(
        f"qcml {arch['mpnn_type']}"
        f"{' energy' if args.energy else ' mlip'}: "
        f"train {h['train']:.6f} val {h['val']:.6f} test {h['test']:.6f}"
    )
    return info


if __name__ == "__main__":
    main()
